package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import graft.ops.SinkOps

/** Round-15 specs: `readStream.format("graft")` — version-number
  * offsets, initial snapshot + incremental manifest-delta batches,
  * append-only refusals, rate limiting, exactly-once restart.
  */
class Round15StreamSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val p = new java.io.File(System.getProperty("java.io.tmpdir"), name)
    val hp = new org.apache.hadoop.fs.Path(p.getPath)
    hp.getFileSystem(spark.sessionState.newHadoopConf()).delete(hp, true)
    p.getPath
  }

  import spark.implicits._

  test("graft stream: first batch is the snapshot, later batches are " +
      "the manifest deltas — streamed total ≡ batch head read") {
    val path = tmp("r15_stream_basic")
    SinkOps.commitVersion(Seq((1L, "a"), (2L, "b")).toDF("id", "s"),
      path)
    SinkOps.commitVersion(Seq((3L, "c")).toDF("id", "s"), path)
    val q = spark.readStream.format("graft").load(path)
      .writeStream.format("memory").queryName("r15_gs_basic")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("r15_gs_basic").count() == 3,
        "initial snapshot batch wrong")
      SinkOps.commitVersion(Seq((4L, "d"), (5L, "e")).toDF("id", "s"),
        path)
      q.processAllAvailable()
      val got = spark.table("r15_gs_basic")
        .select("id").collect().map(_.getLong(0)).sorted
      assert(got.sameElements(Array(1L, 2L, 3L, 4L, 5L)),
        s"streamed ≠ batch: ${got.mkString(",")}")
      // Streamed total ≡ the batch head read, the cross-surface pin.
      val batch = SinkOps.readVersion(spark, path)
        .select("id").collect().map(_.getLong(0)).sorted
      assert(got.sameElements(batch))
    } finally q.stop()
  }

  test("graft stream refuses a delete/DV commit in a window (append-" +
      "only contract) — loudly, not silently wrong") {
    val path = tmp("r15_stream_dv")
    SinkOps.commitVersion((1L to 6L).map(i => (i, s"s$i"))
      .toDF("id", "s"), path, carryForward = true)
    val q = spark.readStream.format("graft").load(path)
      .writeStream.format("memory").queryName("r15_gs_dv")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("r15_gs_dv").count() == 6)
      SinkOps.deleteVersionKeys(Seq(2L).toDF("id"), path, "id")
      val e = intercept[StreamingQueryException] {
        q.processAllAvailable()
      }
      val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
      assert(msg != null && msg.contains("append-only"),
        s"wrong refusal: $msg")
    } finally q.stop()
  }

  test("graft stream maxVersionsPerTrigger bounds each micro-batch " +
      "to N commits; backfill still delivers everything exactly once") {
    val path = tmp("r15_stream_rate")
    (1 to 4).foreach { i =>
      SinkOps.commitVersion(Seq((i.toLong, s"s$i")).toDF("id", "s"),
        path, carryForward = true); ()
    }
    val q = spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "1").load(path)
      .writeStream.format("memory").queryName("r15_gs_rate")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("r15_gs_rate")
        .select("id").collect().map(_.getLong(0)).sorted
      assert(got.sameElements(Array(1L, 2L, 3L, 4L)))
      // 4 commits at 1 version per trigger = at least 4 micro-batches
      // (the first is the v1 snapshot, then three deltas).
      assert(q.recentProgress.count(_.numInputRows > 0) >= 4,
        s"rate limit not applied: ${q.recentProgress.length} batches")
    } finally q.stop()
  }

  test("graft stream restart from checkpoint resumes at the recorded " +
      "version offset — no duplicates, no gaps (exactly-once to a " +
      "file sink)") {
    val path = tmp("r15_stream_restart")
    val out = tmp("r15_stream_restart_out")
    val ckpt = tmp("r15_stream_restart_ckpt")
    SinkOps.commitVersion(Seq((1L, "a"), (2L, "b")).toDF("id", "s"),
      path, carryForward = true)
    def start() = spark.readStream.format("graft").load(path)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    SinkOps.commitVersion(Seq((3L, "c")).toDF("id", "s"), path,
      carryForward = true)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(out)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(Array(1L, 2L, 3L)),
      s"restart broke exactly-once: ${got.mkString(",")}")
  }

  test("graft stream pins schema at start and a startingVersion " +
      "stream skips the already-consumed prefix") {
    val path = tmp("r15_stream_startv")
    SinkOps.commitVersion(Seq((1L, "a")).toDF("id", "s"), path,
      carryForward = true)
    SinkOps.commitVersion(Seq((2L, "b")).toDF("id", "s"), path,
      carryForward = true)
    // startingVersion=1 (exclusive): only v2's delta arrives.
    val q = spark.readStream.format("graft")
      .option("startingVersion", "1").load(path)
      .writeStream.format("memory").queryName("r15_gs_startv")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("r15_gs_startv")
        .select("id").collect().map(_.getLong(0)).sorted
      assert(got.sameElements(Array(2L)),
        s"startingVersion not honored: ${got.mkString(",")}")
    } finally q.stop()
  }
}
