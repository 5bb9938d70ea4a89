package graft

/** Dump `.explain("formatted")` for the given registered queries into
  * <outDir>/<name><suffix>.txt — the per-round optimization evidence
  * (plans/r16/NAME_before.txt and NAME_after.txt).
  * Usage: sbt "Test/runMain graft.DumpSomePlans <outDir> <suffix> q1,q2,..."
  */
object DumpSomePlans {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(',').toSeq
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(defaultCpus = "32")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, d)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"$name$suffix.txt"), txt)
      println(s"[plans] wrote $outDir/$name$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
