package graft

/** Scratch timing harness: time one registered query N times at a given
  * sf dir (default sf0.1), warmup once. Usage:
  *   sbt "Test/runMain graft.TimeOne q_pagerank_conv [n]"
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val n = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(defaultCpus = "32")
    names.foreach { name =>
      def run(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache() // cold-cache, JIT-warm — mirrors Bench
        dt
      }
      run() // warmup
      val ts = (1 to n).map(_ => run())
      println(f"TIMEONE $name min=${ts.min}%.2f med=${ts.sorted.apply(n / 2)}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
