package graft

import org.apache.spark.sql.functions._

/** Contract invariants for the round-8 registered-query tier, executed
  * against the tiny fixture — the Round6InvariantSpec discipline:
  * properties of the REGISTERED queries (the artifact the driver gate
  * runs), scale-free by construction so sf0.001 exercises the same
  * contract the gate checks at sf0.01.
  */
class Round8InvariantSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q_communities labels every graph node with another node's id") {
    val rows = run("q_communities").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val nodes = rows.map(_._1).toSet
    val edges = graft.ops.GraphOps.edgesFromLineitem(
      Tables.lineitem(spark, sfDir), 9973)
    val expected = edges.select(col("src")).union(edges.select(col("dst")))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(nodes === expected)
    // every community label is itself a labeled node
    assert(rows.map(_._2).toSet.subsetOf(nodes))
    spark.catalog.clearCache()
  }

  test("q_modularity conserves nodes, degrees, and keeps Q in range") {
    val rows = run("q_modularity").collect()
    val edges = graft.ops.GraphOps.edgesFromLineitem(
      Tables.lineitem(spark, sfDir), 9973)
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b")).distinct()
    val m = und.count()
    val nV = und.select(col("a")).union(und.select(col("b")))
      .distinct().count()
    assert(rows.map(_.getLong(1)).sum === nV)          // Σ n_nodes = |V|
    assert(rows.map(_.getLong(3)).sum === 2 * m)       // Σ deg_sum = 2m
    assert(rows.map(_.getLong(2)).sum <= m)            // intra ≤ m
    val q = rows.map(_.getDouble(4)).sum
    assert(q >= -0.5 && q <= 1.0)
    spark.catalog.clearCache()
  }

  test("q_kmeans: full centroid grid, members partition the corpus, " +
      "inertia nonnegative") {
    val rows = run("q_kmeans").collect()
    assert(rows.length === 16 * 64)
    val perC = rows.map(r => r.getLong(0) ->
      ((r.getLong(3), r.getLong(4)))).distinct
    assert(perC.length === 16)
    val nVec = graft.ops.SimilarityOps
      .withQuant(Tables.embeddings(spark, sfDir))
      .filter(col("n2") > 0).count()
    assert(perC.map(_._2._1).sum === nVec)
    assert(perC.forall(_._2._2 >= 0L))
    // empty cluster ⇔ zero inertia contribution
    perC.filter(_._2._1 == 0L).foreach(c => assert(c._2._2 === 0L))
    spark.catalog.clearCache()
  }

  test("q_bpe_train emits one strictly-improving row per round") {
    val rows = run("q_bpe_train").collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq === (1L to 8L))
    assert(rows.forall(_.getLong(2) > 0L))
    rows.map(_.getLong(4)).sliding(2).foreach {
      case Array(a, b) => assert(b < a)
      case _ =>
    }
  }

  test("q_bpe_tokenize totals are bounded by words below and chars above") {
    val rows = run("q_bpe_tokenize").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1L)
      assert(r.getLong(3) >= r.getLong(1)) // tokens ≥ words
      assert(r.getLong(3) <= r.getLong(2)) // tokens ≤ chars
    }
  }

  test("q_dedup_minhash_incr: every exact-twin arrival is caught by digest") {
    val rows = run("q_dedup_minhash_incr").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3))))
    val exactTwins = rows.filter { case (id, _) =>
      id >= 1000000L && id < 2000000L }
    assert(exactTwins.nonEmpty)
    exactTwins.foreach { case (id, (ex, _, kept)) =>
      assert(ex === 1L, s"arrival $id")
      assert(kept === 0L, s"arrival $id")
    }
  }

  test("q_dedup_index_update and q_stream_dedup_index: no exact twin of " +
      "an indexed-or-admitted doc survives") {
    // Exact twins (+1M of odds; +4M of evens in the batch variant) can
    // never be kept: if the original was admitted its digest is in the
    // index; if the original was itself an exact dup, the twin shares
    // the even's digest; if it was a near-dup-only drop, the twin has
    // the IDENTICAL signature and collides with the same index doc.
    for (q <- Seq("q_dedup_index_update", "q_stream_dedup_index")) {
      val rows = run(q).collect()
        .map(r => r.getLong(0) -> r.getLong(3))
      val twins = rows.filter { case (id, _) =>
        (id >= 1000000L && id < 1500000L) || id >= 4000000L }
      assert(twins.nonEmpty, q)
      twins.foreach { case (id, kept) => assert(kept === 0L, s"$q $id") }
    }
  }

  test("q_image_rgb fingerprints are 64-bit with consistent popcounts") {
    val rows = run("q_image_rgb").collect()
    assert(rows.length ===
      Tables.documents(spark, sfDir).count().toInt)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1L && r.getLong(1) <= 16L)
      assert(r.getLong(2) >= 1L && r.getLong(2) <= 16L)
      for (base <- Seq(4, 7, 10)) {
        val bits = r.getString(base)
        assert(bits.length === 64 && bits.forall(c => c == '0' || c == '1'))
        assert(bits.count(_ == '1').toLong === r.getLong(base + 1))
      }
    }
  }
}
