package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

class OffsetTextSourceSpec extends SparkSpec {

  private def readOffsets(path: String): Seq[(Long, String)] =
    spark.read.format("graft.sources.OffsetTextSource").load(path)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)

  test("offsets are exact byte positions (multibyte, empty lines, no trailing NL)") {
    val content = "alpha\nbét@\n\nlast line no newline"
    val f = Files.createTempFile("graft-otext", ".txt")
    Files.write(f, content.getBytes(StandardCharsets.UTF_8))
    val got = readOffsets(f.toString)
    // byte offsets: alpha=0; bét@ starts at 6; é is 2 bytes → next line at 6+6=12; last at 13
    assert(got === Seq((0L, "alpha"), (6L, "bét@"), (12L, ""), (13L, "last line no newline")))
    Files.delete(f)
  }

  test("directory input: one partition per file, offsets per file") {
    val d = Files.createTempDirectory("graft-otext-dir")
    Files.write(d.resolve("a.txt"), "x\nyy\n".getBytes(StandardCharsets.UTF_8))
    Files.write(d.resolve("b.txt"), "zzz\n".getBytes(StandardCharsets.UTF_8))
    val df = spark.read.format("graft.sources.OffsetTextSource").load(d.toString)
    assert(df.rdd.getNumPartitions === 2)
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows === Set((0L, "x"), (2L, "yy"), (0L, "zzz")))
  }

  test("multi-path load and nested directories are honored") {
    val d = Files.createTempDirectory("graft-otext-nest")
    Files.createDirectory(d.resolve("sub"))
    Files.write(d.resolve("a.txt"), "x\n".getBytes(StandardCharsets.UTF_8))
    Files.write(d.resolve("sub").resolve("b.txt"), "yy\n".getBytes(StandardCharsets.UTF_8))
    val f = Files.createTempFile("graft-otext-extra", ".txt")
    Files.write(f, "zzz\n".getBytes(StandardCharsets.UTF_8))
    // load(paths*) → the 'paths' JSON option; nested dir listed recursively
    val rows = spark.read.format("graft.sources.OffsetTextSource")
      .load(d.toString, f.toString)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows === Set((0L, "x"), (0L, "yy"), (0L, "zzz")))
  }

  test("missing path fails loudly instead of scanning empty") {
    val ex = intercept[Exception] {
      spark.read.format("graft.sources.OffsetTextSource")
        .load("/nonexistent/graft-otext-missing").collect()
    }
    assert(ex.toString.toLowerCase.contains("file") ||
      ex.getCause != null)
  }

  test("lines spanning buffer fills are assembled with exact offsets") {
    // > 1 MiB line forces the spill path across multiple 1 MiB buffer fills
    val big = "a" * ((1 << 20) + 12345)
    val content = s"first\n$big\nlast"
    val f = Files.createTempFile("graft-otext-big", ".txt")
    Files.write(f, content.getBytes(StandardCharsets.UTF_8))
    val got = readOffsets(f.toString)
    assert(got === Seq((0L, "first"), (6L, big), ((7L + big.length), "last")))
    Files.delete(f)
  }

  test("one file fans out to byte-range splits with exact offsets") {
    // 1000 lines "line-<i>" — with splitSize=256 the single file must plan
    // many partitions, and the union of ranges must reproduce every line
    // exactly once at its exact byte offset.
    val lines = (0 until 1000).map(i => s"line-$i")
    val content = lines.mkString("", "\n", "\n")
    val f = Files.createTempFile("graft-otext-split", ".txt")
    Files.write(f, content.getBytes(StandardCharsets.UTF_8))
    val df = spark.read.format("graft.sources.OffsetTextSource")
      .option("splitSize", "256").load(f.toString)
    assert(df.rdd.getNumPartitions ===
      (content.length + 255) / 256) // ceil(len/split) ranges for ONE file
    val got = df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      .sortBy(_._1)
    val want = lines.scanLeft(0L)((off, l) => off + l.length + 1)
      .zip(lines).map { case (off, l) => (off, l) }
    assert(got === want)
    Files.delete(f)
  }

  test("split cut exactly on a line boundary loses and duplicates nothing") {
    // "ab\ncd\nef\n" cut at 3 (a boundary) and at 4 (mid-line): every
    // split size from 1 to 10 must yield the identical row set.
    val content = "ab\ncd\nef\n"
    val f = Files.createTempFile("graft-otext-cut", ".txt")
    Files.write(f, content.getBytes(StandardCharsets.UTF_8))
    val want = Seq((0L, "ab"), (3L, "cd"), (6L, "ef"))
    for (split <- 1 to 10) {
      val got = spark.read.format("graft.sources.OffsetTextSource")
        .option("splitSize", split.toString).load(f.toString)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
      assert(got === want, s"splitSize=$split")
    }
    Files.delete(f)
  }

  test("directory listing skips hidden and writer-metadata entries") {
    val d = Files.createTempDirectory("graft-otext-hidden")
    Files.write(d.resolve("data.txt"), "keep\n".getBytes(StandardCharsets.UTF_8))
    // non-empty metadata/hidden entries that MUST NOT surface as rows
    Files.write(d.resolve("_SUCCESS"), "job marker\n".getBytes(StandardCharsets.UTF_8))
    Files.write(d.resolve(".data.txt.crc"), "crcbytes\n".getBytes(StandardCharsets.UTF_8))
    Files.createDirectory(d.resolve("_temporary"))
    Files.write(d.resolve("_temporary").resolve("part-0"),
      "partial garbage\n".getBytes(StandardCharsets.UTF_8))
    val rows = readOffsets(d.toString)
    assert(rows === Seq((0L, "keep")))
    // an explicitly named hidden FILE is still honored (direct argument)
    val direct = readOffsets(d.resolve("_SUCCESS").toString)
    assert(direct === Seq((0L, "job marker")))
  }

  test("wordcount runs over the offset-text source end-to-end") {
    val f = Files.createTempFile("graft-otext-wc", ".txt")
    Files.write(f, "a b a\nb a\n".getBytes(StandardCharsets.UTF_8))
    val df = spark.read.format("graft.sources.OffsetTextSource").load(f.toString)
    val counts = graft.ops.TextOps.wordCount(df, "line").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("a" -> 3L, "b" -> 2L))
    Files.delete(f)
  }
}
