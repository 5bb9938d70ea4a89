package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.SinkOps

class SinkOpsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft-$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/out"
  }

  test("writeParquet round-trips with hive-style partition pruning") {
    val path = tmp("parquet")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    SinkOps.writeParquet(li, path, partitionBy = Seq("l_returnflag"))
    val back = spark.read.parquet(path)
    assert(back.count() === li.count())
    // partition layout exists and pruning-compatible scan filters work
    assert(new java.io.File(path).listFiles().exists(_.getName.startsWith("l_returnflag=")))
    val one = back.filter(col("l_returnflag") === "R")
    assert(one.count() === li.filter(col("l_returnflag") === "R").count())
  }

  test("deleteWhere rewrites only affected partitions, removes emptied ones") {
    val path = tmp("gdpr")
    // Partition a: {1,2,3} (2 forgotten); b: {5,7} (untouched);
    // c: {6} (fully forgotten → must vanish).
    val src = Seq((1L, "a"), (2L, "a"), (3L, "a"), (5L, "b"), (7L, "b"),
      (6L, "c")).toDF("id", "p")
    SinkOps.writeParquet(src, path, partitionBy = Seq("p"))
    def files(part: String): Map[String, Long] =
      Option(new java.io.File(path, s"p=$part").listFiles()).toSeq.flatten
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    val aBefore = files("a")
    val bBefore = files("b")
    assert(aBefore.nonEmpty && bBefore.nonEmpty)
    SinkOps.deleteWhere(spark, path, "p", col("id") % 2 === 0)
    // Survivors exactly: odd ids. Partition c (all forgotten) is GONE.
    val back = spark.read.parquet(path)
    assert(back.select("id").collect().map(_.getLong(0)).sorted
      === Array(1L, 3L, 5L, 7L))
    assert(!new java.io.File(path, "p=c").exists())
    // Untouched partition b keeps its exact original files (no rewrite).
    assert(files("b") === bBefore)
    // Affected partition a was rewritten (fresh file set).
    assert(files("a").nonEmpty &&
      files("a").keySet.intersect(aBefore.keySet).isEmpty)
    // Session conf was never mutated (cloned-session discipline).
    assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode",
      "static") !== "dynamic")
  }

  test("zstd parquet writes .zstd.parquet part files and round-trips") {
    val path = tmp("zstd")
    val df = Seq((1L, "a", 2.5), (2L, "b", 4.0)).toDF("k", "s", "v")
    df.write.option("compression", "zstd").parquet(path)
    val parts = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(parts.nonEmpty && parts.forall(_.getName.endsWith(".zstd.parquet")),
      "every part file must carry the zstd codec infix")
    assert(spark.read.parquet(path).collect().toSet === df.collect().toSet)
  }

  test("compact rewrites a fragmented dir into the target file count") {
    val frag = tmp("compact-in"); val out = tmp("compact-out")
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    li.repartition(16).write.parquet(frag)
    def parts(p: String) = new java.io.File(p).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts(frag) === 16)
    graft.ops.SinkOps.compact(spark, frag, out, 3)
    assert(parts(out) === 3, "compaction must hit the target file count")
    assert(spark.read.parquet(out).count() === li.count())
  }

  test("writeCsv round-trips values with header") {
    val path = tmp("csv")
    val df = Seq((1L, "a", 2.5), (2L, "b", 4.0)).toDF("k", "s", "v")
    SinkOps.writeCsv(df, path)
    val back = spark.read.option("header", "true")
      .schema(df.schema).csv(path)
    assert(back.collect().toSet === df.collect().toSet)
  }

  test("writeKvText emits key<TAB>value lines (TextOutputFormat contract)") {
    val path = tmp("kvtext")
    val df = Seq(("alpha", 3L), ("beta", 5L)).toDF("word", "cnt")
    SinkOps.writeKvText(df, path)
    val lines = spark.read.text(path).as[String].collect().toSet
    assert(lines === Set("alpha\t3", "beta\t5"))
  }

  test("writeJsonlGz compresses (files end .json.gz) and round-trips") {
    val path = tmp("jsonlgz")
    val df = Seq((1L, "hello \"quoted\"\ttext"), (2L, "plain"))
      .toDF("doc_id", "text")
    SinkOps.writeJsonlGz(df, path)
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(files.nonEmpty && files.forall(_.getName.endsWith(".json.gz")))
    val back = spark.read.schema(df.schema).json(path)
    assert(back.collect().toSet === df.collect().toSet)
  }

  test("bucketed tables sort-merge join with NO shuffle exchange") {
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    val l = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    // A fresh in-memory catalog can't overwrite a location left by a
    // previous JVM — drop the table AND the orphan directory.
    for (t <- Seq("t_orders_b", "t_li_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      if (dir.exists()) rm(dir)
    }
    SinkOps.writeBucketed(o, "t_orders_b", "o_orderkey", 4)
    SinkOps.writeBucketed(l, "t_li_b", "l_orderkey", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("t_orders_b").join(spark.table("t_li_b"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(j.count() === l.count()) // fk integrity: one match per lineitem
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
