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
  * LeanRecordReader.java:98-146 (2 MiB buffered byte scan, '\n' framing).
  * `spark.read.text` drops the offset; this source keeps it, Spark-first:
  * one InputPartition per file (offsets are then exact with no
  * cross-partition coordination), Catalyst handles everything above the
  * scan. Split-within-file parallelism could be added later by emitting
  * byte-range partitions that skip the first partial line — the classic
  * TextInputFormat rule — without changing the schema or the plan shape.
  *
  * Usage: spark.read.format("graft.sources.OffsetTextSource").load(path*)
  * → DataFrame[offset: bigint, line: string]. Both the single `path`
  * option and the multi-path `paths` option (what `load(paths*)` sets)
  * are honored; directories are listed recursively; a missing path fails
  * the scan loudly at planning time rather than yielding an empty result.
  */
class OffsetTextSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OffsetTextSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new OffsetTextTable(OffsetTextSource.resolvePaths(properties))
}

object OffsetTextSource {
  val Schema: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("line", StringType, nullable = false)))

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

private[sources] class OffsetTextTable(paths: Seq[String])
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
        def listFiles(st: FileStatus): Seq[FileStatus] =
          if (st.isDirectory)
            st.getPath.getFileSystem(conf).listStatus(st.getPath).toSeq.flatMap(listFiles)
          else Seq(st)
        paths.flatMap { s =>
            val p = new Path(s)
            listFiles(p.getFileSystem(conf).getFileStatus(p))
          }
          .sortBy(_.getPath.toString)
          .map(f => OffsetTextPartition(f.getPath.toString): InputPartition)
          .toArray
      }

      override def createReaderFactory(): PartitionReaderFactory =
        new PartitionReaderFactory {
          override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
            new OffsetTextReader(partition.asInstanceOf[OffsetTextPartition].path)
        }
    }
}

private[sources] case class OffsetTextPartition(path: String) extends InputPartition

/** Buffered byte scan with '\n' framing and exact byte offsets — the
  * record reader. A trailing line without '\n' is still emitted. Lines are
  * assembled by scanning the buffer for '\n' and copying whole slices (a
  * spill buffer is allocated only when a line spans buffer fills); a
  * zero-byte read() — legal on some streams — is retried, not treated as
  * EOF.
  */
private[sources] class OffsetTextReader(path: String)
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

  override def next(): Boolean = {
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
