package graft

import org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException

/** Round-15 catalog hardening specs: concurrent CREATE serializes on
  * the no-overwrite `_schema.json` create; one FS head-listing per
  * distinct root per analysis run in the resolution rule.
  */
class Round15CatalogSpec extends SparkSpec {

  private lazy val wh: String = {
    val p = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_r15_wh")
    val hp = new org.apache.hadoop.fs.Path(p.getPath)
    hp.getFileSystem(spark.sessionState.newHadoopConf()).delete(hp, true)
    spark.conf.set("spark.sql.catalog.g15",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g15.warehouse", p.getPath)
    p.getPath
  }

  test("a CREATE racing another CREATE of the same name loses at the " +
      "no-overwrite _schema.json commit point → " +
      "TableAlreadyExistsException, winner's schema intact " +
      "(deterministic seam interleave)") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g15.db")
    val cat = spark.sessionState.catalogManager.catalog("g15")
      .asInstanceOf[graft.sources.GraftCatalog]
    // The competing winner lands its _schema.json INSIDE the loser's
    // guard→create window (the race the r14 VERDICT pinned: both
    // CREATEs used to succeed silently, last writer's schema winning).
    val hconf = spark.sessionState.newHadoopConf()
    val schemaFile = new org.apache.hadoop.fs.Path(
      s"$wh/db/race/_schema.json")
    val fs = schemaFile.getFileSystem(hconf)
    cat.createTableSeam = () => {
      val out = fs.create(schemaFile, false)
      try out.write(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("winner",
            org.apache.spark.sql.types.LongType))).json
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    try {
      val e = intercept[Exception] {
        spark.sql("CREATE TABLE g15.db.race (id BIGINT, s STRING)")
      }
      def causes(t: Throwable): Seq[Throwable] =
        t +: Option(t.getCause).toSeq.flatMap(causes)
      assert(causes(e)
        .exists(_.isInstanceOf[TableAlreadyExistsException]),
        s"loser threw $e")
    } finally cat.createTableSeam = () => ()
    // Winner's schema survives — the loser never overwrote it.
    val df = spark.sql("SELECT * FROM g15.db.race")
    assert(df.schema.fieldNames.toSeq == Seq("winner"),
      s"loser clobbered the winner's schema: ${df.schema.fieldNames.toSeq}")
    assert(df.count() == 0)
  }

  test("streams address tables BY NAME: readStream/writeStream " +
      "option(\"table\", \"cat.db.t\") resolve through the catalog " +
      "warehouse; a typo'd name refuses loudly") {
    wh
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g15.db")
    spark.sql("CREATE TABLE g15.db.ssrc (id BIGINT, s STRING)")
    spark.sql("CREATE TABLE g15.db.sdst (id BIGINT, s STRING)")
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .createOrReplaceTempView("r15_named_src")
    spark.sql("INSERT INTO g15.db.ssrc SELECT * FROM r15_named_src")
    // The sink needs an initialized table — CREATE alone has no
    // versions; land an empty first commit through the named path.
    spark.sql(
      "INSERT INTO g15.db.sdst SELECT * FROM r15_named_src LIMIT 0")
    val ckpt = new java.io.File(
      System.getProperty("java.io.tmpdir"), "r15_named_ckpt")
    org.apache.commons.io.FileUtils.deleteQuietly(ckpt)
    val q = spark.readStream.format("graft")
      .option("table", "g15.db.ssrc").load()
      .writeStream.format("graft")
      .option("table", "g15.db.sdst")
      .option("checkpointLocation", ckpt.getPath)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.sql("SELECT count(*) FROM g15.db.sdst")
      .collect().head.getLong(0) == 2)
    val e = intercept[Exception] {
      spark.readStream.format("graft")
        .option("table", "g15.db.nope").load()
    }
    assert(e.getMessage != null && e.getMessage.contains("not found"),
      s"typo'd stream name not loud: ${e.getMessage}")
  }

  test("a self-join of a named graft table resolves with ONE head " +
      "listing per distinct root per analysis run (memoized), and " +
      "still answers correctly") {
    wh
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g15.db")
    spark.sql("CREATE TABLE g15.db.selfj (id BIGINT, s STRING)")
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .createOrReplaceTempView("r15_selfj_src")
    spark.sql("INSERT INTO g15.db.selfj SELECT * FROM r15_selfj_src")
    val n = spark.sql(
      """SELECT a.id FROM g15.db.selfj a
         JOIN g15.db.selfj b ON a.id = b.id""").count()
    assert(n == 2)
  }
}
