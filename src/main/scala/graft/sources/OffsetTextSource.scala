package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2: text scan preserving the reference's record contract —
  * key = byte offset of the line start, value = the line.
  *
  * Reference semantics (cited, not copied): the split/record layer emits
  * (LongWritable byte position, Text line) — VDFSRecordReader.java:74-97,
  * LeanRecordReader.java:98-146 (2 MiB buffered byte scan, '\n' framing) —
  * and the reference's core scan capability is OVER-decomposing one huge
  * file into many splits (LeanInputFormat.java:54-64; its benchmark input
  * was a single 100 GB text file). This source does the same, Spark-first:
  * each file is planned as `ceil(len / splitSize)` byte-range
  * InputPartitions, and a reader whose range starts mid-file seeks to
  * `start − 1` and discards through the first '\n' — the classic
  * TextInputFormat rule, which assigns every line to exactly the split
  * containing its first byte (a line is emitted iff its start offset is
  * in [start, end), and may extend past `end`). Offsets stay exact
  * without cross-partition coordination because they are byte positions,
  * not line counters.
  *
  * Usage: spark.read.format("graft.sources.OffsetTextSource").load(path*)
  * → DataFrame[offset: bigint, line: string]. Both the single `path`
  * option and the multi-path `paths` option (what `load(paths*)` sets)
  * are honored; directories are listed recursively; a missing path fails
  * the scan loudly at planning time rather than yielding an empty result.
  * `splitSize` (bytes, default 32 MiB) tunes intra-file parallelism: at
  * the default a 100 GB file fans out to ~3,200 tasks.
  */
class OffsetTextSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OffsetTextSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new OffsetTextTable(OffsetTextSource.resolvePaths(properties),
      OffsetTextSource.resolveSplitSize(properties))
}

object OffsetTextSource {
  val Schema: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("line", StringType, nullable = false)))

  /** Default byte-range split size: 32 MiB. */
  val DefaultSplitSize: Long = 32L * 1024 * 1024

  private[sources] def resolveSplitSize(properties: util.Map[String, String]): Long = {
    // getTable receives the options case-SENSITIVELY; match the reader
    // API's case-insensitive option contract explicitly.
    val v = Option(new CaseInsensitiveStringMap(properties).get("splitsize"))
      .map(_.toLong).getOrElse(DefaultSplitSize)
    require(v > 0, s"OffsetTextSource: splitSize must be positive, got $v")
    v
  }

  /** Collect input paths from the DSv2 options: `path` (single) and/or
    * `paths` (JSON array — what DataFrameReader.load(paths*) passes).
    */
  private[sources] def resolvePaths(properties: util.Map[String, String]): Seq[String] = {
    val single = Option(properties.get("path")).toSeq
    val multi = Option(properties.get("paths")).toSeq.flatMap { json =>
      new com.fasterxml.jackson.databind.ObjectMapper()
        .readValue(json, classOf[Array[String]]).toSeq
    }
    val all = (single ++ multi).filter(_.nonEmpty)
    require(all.nonEmpty,
      "OffsetTextSource: no input path — pass .load(path) or option(\"path\", ...)")
    all
  }
}

private[sources] class OffsetTextTable(paths: Seq[String], splitSize: Long)
    extends Table with SupportsRead {
  override def name(): String = s"offsettext(${paths.mkString(",")})"
  override def schema(): StructType = OffsetTextSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = OffsetTextSource.Schema
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] = {
        val conf = new Configuration()
        // Recursive listing; getFileStatus throws FileNotFoundException on a
        // missing path — the fail-loud contract (no silent empty scan).
        // Hidden and writer-metadata entries ('_'/'.' prefix: _SUCCESS,
        // _temporary/, _spark_metadata/, .crc sidecars) are excluded by
        // the standard Hadoop convention — without this, scanning a
        // Spark-written directory on a filesystem that lists checksum
        // files would silently inject metadata bytes as data rows.
        def hidden(name: String): Boolean =
          name.startsWith("_") || name.startsWith(".")
        def listFiles(st: FileStatus): Seq[FileStatus] =
          if (hidden(st.getPath.getName)) Seq.empty
          else if (st.isDirectory)
            st.getPath.getFileSystem(conf).listStatus(st.getPath).toSeq.flatMap(listFiles)
          else Seq(st)
        paths.flatMap { s =>
            val p = new Path(s)
            // an explicitly named path is honored even if '_'/'.'-prefixed
            // — the convention filters directory LISTINGS, not direct
            // arguments (so the top level expands children itself)
            val st = p.getFileSystem(conf).getFileStatus(p)
            if (st.isDirectory)
              st.getPath.getFileSystem(conf).listStatus(st.getPath)
                .toSeq.flatMap(listFiles)
            else Seq(st)
          }
          .sortBy(_.getPath.toString)
          .flatMap { f =>
            // ceil(len/splitSize) byte ranges per file; empty files yield
            // no partitions. Ranges need no line alignment — the reader's
            // skip-first-partial-line rule makes any cut exact.
            val len = f.getLen
            (0L until len by splitSize).map { start =>
              OffsetTextPartition(f.getPath.toString, start,
                math.min(start + splitSize, len)): InputPartition
            }
          }
          .toArray
      }

      override def createReaderFactory(): PartitionReaderFactory =
        new PartitionReaderFactory {
          override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
            val p = partition.asInstanceOf[OffsetTextPartition]
            new OffsetTextReader(p.path, p.start, p.end)
          }
        }
    }
}

/** Byte range [start, end) of one file; lines STARTING in the range belong
  * to this partition (and may extend past `end`).
  */
private[sources] case class OffsetTextPartition(path: String, start: Long, end: Long)
    extends InputPartition

/** Buffered byte scan with '\n' framing and exact byte offsets over the
  * byte range [start, end) — the record reader. Emits every line whose
  * START offset lies in the range (such a line may extend past `end`); a
  * range starting mid-file seeks to `start − 1` and discards through the
  * first '\n', so a cut exactly on a line boundary discards zero bytes
  * and ranges compose without duplication or loss. A trailing line
  * without '\n' is still emitted. Lines are assembled by scanning the
  * buffer for '\n' and copying whole slices (a spill buffer is allocated
  * only when a line spans buffer fills); a zero-byte read() — legal on
  * some streams — is retried, not treated as EOF.
  */
private[sources] class OffsetTextReader(path: String, start: Long, end: Long)
    extends PartitionReader[InternalRow] {
  private val in = {
    val p = new Path(path)
    p.getFileSystem(new Configuration()).open(p)
  }
  private val buf = new Array[Byte](1 << 20)
  private var bufLen = 0
  private var bufPos = 0
  private var filePos = 0L        // byte offset of buf(bufPos) in the file
  private var eof = false
  private var row: InternalRow = _

  private def fill(): Boolean = {
    if (eof) return false
    var n = in.read(buf)
    while (n == 0) n = in.read(buf) // 0 means "nothing yet", not EOF
    bufPos = 0
    if (n < 0) { eof = true; bufLen = 0; false } else { bufLen = n; true }
  }

  if (start > 0) {
    // Skip-first-partial-line rule: seek one byte BACK of the range so a
    // range cut exactly on a line boundary (byte start−1 == '\n')
    // discards nothing, while a mid-line cut discards the partial line
    // that belongs to the previous range.
    in.seek(start - 1)
    filePos = start - 1
    var done = false
    while (!done) {
      if (bufPos >= bufLen && !fill()) done = true // EOF inside the skip
      else {
        var i = bufPos
        while (i < bufLen && buf(i) != '\n') i += 1
        filePos += i - bufPos
        bufPos = i
        if (i < bufLen) { filePos += 1; bufPos = i + 1; done = true }
      }
    }
  }

  override def next(): Boolean = {
    if (filePos >= end) return false // next line starts in a later range
    if (bufPos >= bufLen && !fill()) return false
    val lineStart = filePos
    var spill: java.io.ByteArrayOutputStream = null // only for buffer-spanning lines
    while (true) {
      var i = bufPos
      while (i < bufLen && buf(i) != '\n') i += 1
      val sliceLen = i - bufPos
      if (i < bufLen) { // found the newline inside the buffer
        val bytes =
          if (spill == null) util.Arrays.copyOfRange(buf, bufPos, i)
          else { spill.write(buf, bufPos, sliceLen); spill.toByteArray }
        filePos += sliceLen + 1
        bufPos = i + 1
        row = InternalRow(lineStart, UTF8String.fromBytes(bytes))
        return true
      }
      // line continues past this buffer: stash the slice and refill
      if (spill == null) spill = new java.io.ByteArrayOutputStream(sliceLen + 64)
      spill.write(buf, bufPos, sliceLen)
      filePos += sliceLen
      bufPos = i
      if (!fill()) { // EOF: emit the trailing line (no '\n')
        val bytes = spill.toByteArray
        if (bytes.isEmpty) return false
        row = InternalRow(lineStart, UTF8String.fromBytes(bytes))
        return true
      }
    }
    false // unreachable
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
