package graft

import org.apache.spark.sql.functions._
import graft.ops.{CurationOps, SimilarityOps}

/** Specs for the round-11 additions: hybrid dense+sparse retrieval and
  * the shared-truth multi-ranker evaluation.
  */
class Round11OpsSpec extends SparkSpec {

  private def tmp(name: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"), name).getPath

  private val HQ = Seq((1L, "hash join"), (2L, "fast scan filter"),
    (3L, "window agg"), (4L, "customer order query"),
    (5L, "slow merge sort"))

  private def qvecs(emb: org.apache.spark.sql.DataFrame) =
    emb.filter(col("vec_id").between(1L, 5L))
      .select(col("vec_id"),
        concat(array(lit(0.0f)),
          slice(col("embedding"), 2, SimilarityOps.Dims - 1))
          .as("embedding"))

  // ---- hybridTopK ----

  test("hybridTopK is exactly the RRF merge of the two artifact-served " +
      "lists: membership is the union and every rrf score recomputes " +
      "from the member ranks") {
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val bmPath = tmp("r11_hyb_bm25")
    val ivfPath = tmp("r11_hyb_ivf")
    CurationOps.writeBm25Index(docs, bmPath)
    SimilarityOps.writeIvfIndex(emb, ivfPath, trainIters = 0)
    val sparse = CurationOps.bm25TopKIndexed(spark, bmPath, HQ, 20)
      .select("q_id", "doc_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val dense = SimilarityOps
      .ivfProbeIncremental(qvecs(emb), ivfPath, 20)
      .select(col("q_id"), col("vec_id"), col("rnk")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val fused = CurationOps.hybridTopK(spark, bmPath, ivfPath, HQ,
      qvecs(emb)).collect()
    assert(fused.nonEmpty)
    fused.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      val (ra, rb) = (r.getLong(2), r.getLong(3))
      assert(ra == sparse.getOrElse(key, 0L),
        s"$key sparse rank mismatch")
      assert(rb == dense.getOrElse(key, 0L),
        s"$key dense rank mismatch")
      assert(ra > 0L || rb > 0L, s"$key in neither input list")
      def c(rk: Long) = if (rk == 0L) 0L else 1000000000L / (60L + rk)
      assert(r.getLong(4) == c(ra) + c(rb), s"$key rrf mismatch")
    }
    // Both modalities actually contribute members to the fused top-10
    // (fusion that degenerates to one ranker would pass the row checks).
    assert(fused.exists(r => r.getLong(2) > 0L && r.getLong(3) == 0L) ||
      fused.exists(r => r.getLong(3) > 0L && r.getLong(2) == 0L),
      "fused list identical to both inputs — fusion not exercised")
  }

  // ---- rankEvalMulti ----

  test("rankEvalMulti shares ONE truth set: n_rel per q_id is identical " +
      "across rankers, metrics stay in [0, 10^6], and the single-tag " +
      "form round-trips rankEval") {
    val docs = Tables.documents(spark, sfDir)
    val base = CurationOps.bm25TopK(docs, HQ, 10)
      .select("q_id", "doc_id", "rnk")
    val tagged = base.withColumn("ranker", lit("a"))
      .unionByName(base.withColumn("ranker", lit("b")))
    val out = CurationOps.rankEvalMulti(docs, HQ, tagged, 10).collect()
    assert(out.length == 2 * HQ.length)
    val byQ = out.groupBy(_.getLong(1))
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getLong(2)).distinct.length == 1,
        s"q=$q n_rel differs across rankers")
    }
    out.foreach { r =>
      Seq(5, 6, 7, 8).foreach { i =>
        val v = r.getLong(i)
        assert(v >= 0L && v <= 1000000L, s"metric $i out of ppm range: $v")
      }
    }
    // identical lists under two tags score identically
    val a = out.filter(_.getString(0) == "a").map(r =>
      (r.getLong(1), r.getLong(3), r.getLong(5), r.getLong(8))).sorted
    val b = out.filter(_.getString(0) == "b").map(r =>
      (r.getLong(1), r.getLong(3), r.getLong(5), r.getLong(8))).sorted
    assert(a.sameElements(b))
    // and the single-ranker wrapper agrees with the multi path
    val single = CurationOps.rankEval(docs, HQ, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).sorted
    val multiA = out.filter(_.getString(0) == "a")
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(5))).sorted
    assert(single.sameElements(multiA))
  }
}
