package graft

import org.apache.spark.sql.functions._

/** Contract invariants for the round-9 registered-query tier, executed
  * against the tiny fixture — the Round6/Round8InvariantSpec
  * discipline: properties of the REGISTERED queries (the artifact the
  * driver gate runs), scale-free by construction so sf0.001 exercises
  * the same contract the gate checks at sf0.01.
  */
class Round9InvariantSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def nonzeroNormIds(slices: (Long, Int)*): Set[Long] = {
    val v = graft.ops.SimilarityOps
      .withQuant(Tables.embeddings(spark, sfDir))
      .filter(col("n2") > 0).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    slices.flatMap { case (off, r) =>
      v.filter(id => id % 3 == r).map(_ + off) }.toSet
  }

  test("q_dedup_embed_incr: verdict covers every arrival once; kept " +
      "iff no neighbor; exact twins always caught") {
    val rows = run("q_dedup_embed_incr").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // one verdict row per nonzero-norm arrival, no extras
    // (arrival slices share the base's quantized norms: the +1M slice
    // is vector-identical, +3M is a permutation; +2M zeroes the first
    // component — on this fixture no vector's norm collapses to 0)
    assert(rows.keySet ===
      nonzeroNormIds((1000000L, 0), (2000000L, 1), (3000000L, 2)))
    rows.foreach { case (id, (n, kept)) =>
      assert(kept === (if (n == 0L) 1L else 0L), s"arrival $id") }
    // exact twins: identical vector -> always caught
    rows.filter(_._1 < 2000000L).foreach { case (id, (n, kept)) =>
      assert(n >= 1L && kept === 0L, s"exact twin $id") }
    spark.catalog.clearCache()
  }

  test("q_embed_index_update: evens' twins caught by the base index, " +
      "odds' twins caught through the in-batch append") {
    val rows = run("q_embed_index_update").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val exactOdds = rows.keys.filter(id => id >= 1000000L && id < 2000000L)
    val evenTwins = rows.keys.filter(_ >= 4000000L)
    assert(exactOdds.nonEmpty && evenTwins.nonEmpty)
    // +1M exact twins of odds: caught either through the appended
    // batch-1 survivors or (for non-admitted odds) the base index.
    exactOdds.foreach { id =>
      assert(rows(id)._1 >= 1L && rows(id)._2 === 0L, s"odd twin $id") }
    // +4M exact twins of the evens: caught by the base index alone.
    evenTwins.foreach { id =>
      assert(rows(id)._1 >= 1L && rows(id)._2 === 0L, s"even twin $id") }
    spark.catalog.clearCache()
  }

  test("q_simsearch_incr: contiguous ranks; rank 1 is the perturbed " +
      "query's base twin at high cosine") {
    val byQ = run("q_simsearch_incr").collect().groupBy(_.getLong(0))
    assert(byQ.keySet === (0L until 5L).map(_ + 1000000L).toSet)
    byQ.foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq === (1L to rows.length))
      val cs = sorted.map(_.getDouble(2))
      cs.zip(cs.tail).foreach { case (a, b) => assert(a >= b) }
      // the zeroed-first-component query still sits ~cos 0.99+ from its
      // base twin — far above this fixture's ~0.45 background
      assert(sorted.head.getLong(1) === qid - 1000000L, s"query $qid")
      assert(sorted.head.getDouble(2) > 0.9)
    }
    spark.catalog.clearCache()
  }

  test("q_embed_cluster_incr: exact copies join their base cluster, " +
      "reversed arrivals are singletons") {
    val rows = run("q_embed_cluster_incr").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val exact = rows.keys.filter(id => id >= 3000000L && id < 4000000L)
    val fresh = rows.keys.filter(_ >= 4000000L)
    assert(exact.nonEmpty && fresh.nonEmpty)
    // +3M exact copy of base b always matches b itself; the assigned
    // cluster is b whether or not the (b, b+1M) pair made the map.
    exact.foreach { id =>
      assert(rows(id)._1 === id - 3000000L, s"exact $id")
      assert(rows(id)._2 >= 1L) }
    fresh.foreach { id =>
      assert(rows(id) === ((id, 0L)), s"fresh $id") }
    spark.catalog.clearCache()
  }

  test("q_stream_embed_index: batch-1 exact twins caught via the " +
      "in-stream append; verdicts kept-consistent") {
    val rows = run("q_stream_embed_index").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    rows.foreach { case (id, (n, kept)) =>
      assert(kept === (if (n == 0L) 1L else 0L), s"arrival $id") }
    val exactTwins = rows.keys.filter(id => id >= 1000000L && id < 1500000L)
    assert(exactTwins.nonEmpty)
    exactTwins.foreach { id =>
      assert(rows(id)._1 >= 1L && rows(id)._2 === 0L, s"twin $id") }
    spark.catalog.clearCache()
  }

  test("q_image_neardup: pairs ordered, within the two slices, " +
      "Hamming within threshold") {
    val rows = run("q_image_neardup").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, h) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(a < b)
      assert(a < 256L || (a >= 1000000L && a < 1000256L))
      assert(b < 256L || (b >= 1000000L && b < 1000256L))
      assert(h >= 0L && h <= 3L)
    }
    spark.catalog.clearCache()
  }

  test("q_image_dedup_incr: full arrival coverage; exact-copy slice " +
      "always caught") {
    val nBase = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 256).count()
    val rows = run("q_image_dedup_incr").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.size === nBase)
    rows.filter(_._1 < 2000000L).foreach { case (id, (n, kept)) =>
      assert(n >= 1L && kept === 0L, s"exact copy $id") }
    rows.foreach { case (id, (n, kept)) =>
      assert(kept === (if (n == 0L) 1L else 0L), s"arrival $id") }
    spark.catalog.clearCache()
  }

  test("q_bpe_apply: the planted OOV word is counted in every doc; " +
      "token counts bounded by chars and words") {
    val rows = run("q_bpe_apply").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(4) >= 1L, s"doc ${r.getLong(0)} lost its OOV word")
      assert(r.getLong(3) >= r.getLong(1)) // tokens >= words
      assert(r.getLong(3) <= r.getLong(2)) // tokens <= chars
    }
    spark.catalog.clearCache()
  }

  test("q_html_extract: no markup survives, chrome text framed, " +
      "counts exact") {
    val rows = run("q_html_extract").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getString(1)
      assert(!t.contains("<") && !t.contains(">"))
      assert(!t.contains("not text") && !t.contains("margin"))
      assert(t.startsWith("Doc ") && t.endsWith(" fin"))
      assert(r.getLong(3) === t.length.toLong)
      assert(r.getLong(2) === t.split(" ").length.toLong)
    }
    spark.catalog.clearCache()
  }

  test("q_calibration: decile accounting and monotone score bands") {
    val rows = run("q_calibration").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === (0L to 9L).toSeq)
    // decile sizes differ by at most 1; bands tile the score axis
    val sizes = rows.map(_._2)
    assert(sizes.max - sizes.min <= 1)
    rows.sliding(2).filter(_.length == 2).foreach { w =>
      assert(w(0)._6 <= w(1)._5, "score bands overlap out of order") }
    rows.foreach { r =>
      assert(r._3 <= r._2 && r._4 <= r._2)
      assert(r._7 === r._3 * 1000000L / r._2)
    }
    // positive rate rises with score decile overall
    assert(rows.last._3 * rows.head._2 >= rows.head._3 * rows.last._2)
    spark.catalog.clearCache()
  }

  test("q_survival: KM accounting identities hold") {
    val rows = run("q_survival").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(rows.nonEmpty)
    // n_risk is the reverse cumulative of (d + c): strictly decreasing
    // down the table, and each step removes exactly that t's subjects
    rows.sliding(2).filter(_.length == 2).foreach { w =>
      val (a, b) = (w(0), w(1))
      assert(a._2 === b._2 + a._3 + a._4,
        s"risk-set step broken at t=${a._1}")
    }
    // largest duration: everyone remaining leaves here
    val last = rows.last
    assert(last._2 === last._3 + last._4)
    // total subjects = distinct (user, type) streams
    val subjects = Tables.events(spark, sfDir)
      .select("user_id", "event_type").distinct().count()
    assert(rows.head._2 === subjects)
    rows.foreach { r =>
      assert(r._5 === r._3 * 1000000L / r._2, s"hazard at t=${r._1}") }
    spark.catalog.clearCache()
  }

  test("q_embed_rp: JL ratios concentrate near 1 on the fixture") {
    val ratios = run("q_embed_rp").collect().map(_.getDouble(4))
    assert(ratios.nonEmpty)
    ratios.foreach(r => assert(r > 0.0))
    // ±1 JL with m = 16: individual pairs wander, but the mean ratio
    // over hundreds of pairs must sit near 1 — a sign-matrix or
    // normalization bug shifts it far outside this band.
    val mean = ratios.sum / ratios.length
    assert(mean > 0.7 && mean < 1.3, s"mean JL ratio $mean")
    spark.catalog.clearCache()
  }

  test("q_spearman: histogram-path rho equals a window-rank " +
      "recomputation; rho in [-1, 1]") {
    val row = run("q_spearman").head
    val (n, rho) = (row.getLong(0), row.getDouble(2))
    assert(rho >= -1.0 && rho <= 1.0)
    // Independent implementation: doubled average rank per ROW via two
    // global window passes (rank + per-value tie count), then the same
    // Pearson combine — a different plan shape over the raw rows must
    // agree exactly with the registered histogram derivation.
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_quantity").cast("long").as("x"),
        col("l_linenumber").cast("long").as("y"))
    def r2(c: String) = {
      val w = Window.orderBy(col(c))
      rank().over(w) * 2 + count(lit(1)).over(
        Window.partitionBy(col(c))) - 1
    }
    val m = li.select(r2("x").as("rx2"), r2("y").as("ry2"))
      .agg(count(lit(1)).as("n"), sum("rx2").as("sx"), sum("ry2").as("sy"),
        sum(col("rx2") * col("rx2")).as("sxx"),
        sum(col("ry2") * col("ry2")).as("syy"),
        sum(col("rx2") * col("ry2")).as("sxy"))
      .selectExpr("n",
        """(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
            CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
           sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
                 CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
                (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
                 CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS rho""")
      .head
    assert(m.getLong(0) === n)
    assert(m.getDouble(1) === rho)
    spark.catalog.clearCache()
  }

  test("q_ldiversity: distinct-bucket counts match a two-phase " +
      "recomputation; flags consistent") {
    val rows = run("q_ldiversity").collect()
    assert(rows.nonEmpty)
    val twin = Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("b"))
      .distinct()
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("l")).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    rows.foreach { r =>
      val (l, nGrp) = (r.getLong(3), r.getLong(2))
      assert(l >= 1L && l <= nGrp)
      assert(r.getInt(4) === (if (l >= 3L) 1 else 0))
      assert(twin((r.getInt(0), r.getString(1))) === l)
    }
    spark.catalog.clearCache()
  }
}
