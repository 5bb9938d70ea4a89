package graft

import org.apache.spark.sql.functions._

/** Contract invariants for the round-6 inline query tier, executed
  * against the tiny fixture: these queries are compositions registered
  * directly in SparkEntry (not ops functions), so their behavioral
  * contracts are pinned here as properties of the REGISTERED query —
  * the same artifact the driver gate runs — rather than of a private
  * helper. Every invariant is scale-free (holds at any SF by
  * construction), so sf0.001 exercises the same contract the gate
  * checks at sf0.01.
  */
class Round6InvariantSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q_kanon conserves totals and never emits an identifiable small group") {
    val rows = run("q_kanon").collect()
    val (supp, kept) = rows.partition(_.getString(0) == "*")
    // every kept (identifiable) group clears the k threshold
    assert(kept.forall(_.getLong(3) >= 10L))
    // at most one suppressed bucket, and it only exists when nonempty
    assert(supp.length <= 1)
    supp.foreach(r => assert(r.getLong(3) >= 1L))
    // suppression redistributes, never drops: group sizes re-sum to the
    // table row count
    val total = rows.map(_.getLong(3)).sum
    assert(total === Tables.orders(spark, sfDir).count())
  }

  test("q_binning partitions all rows into ordered non-overlapping deciles") {
    val rows = run("q_binning").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._2).sum === Tables.lineitem(spark, sfDir).count())
    assert(rows.forall { case (b, _, lo, hi) => b >= 0 && b <= 9 && lo <= hi })
    // value ranges of successive buckets never overlap
    rows.sliding(2).foreach {
      case Array((_, _, _, hi1), (_, _, lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
  }

  test("q_markov rows are conditional distributions in ppm") {
    val rows = run("q_markov").collect()
    assert(rows.forall(r => r.getLong(3) >= 0L && r.getLong(3) <= 1000000L))
    // floor-division ppm per from_type sums to 1e6 minus at most the
    // number of outgoing transitions (each floor loses < 1 ppm)
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      val s = g.map(_.getLong(3)).sum
      assert(s <= 1000000L && s > 1000000L - g.length)
    }
  }

  test("q_benford covers digits 1-9 with ppm shares that sum to ~1e6") {
    val rows = run("q_benford").collect()
    assert(rows.map(_.getString(0)).toSet.subsetOf(('1' to '9').map(_.toString).toSet))
    val s = rows.map(_.getLong(2)).sum
    assert(s <= 1000000L && s > 1000000L - rows.length)
  }

  test("q_mannwhitney statistic stays inside its algebraic bounds") {
    val r = run("q_mannwhitney").head()
    val (na, nb, u2) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(na > 0 && nb > 0)
    assert(u2 >= 0L && u2 <= 2L * na * nb) // 0 <= U <= nA*nB
    assert(!r.getDouble(3).isNaN)
  }

  test("q_gini is a valid inequality index over a nonempty corpus") {
    val r = run("q_gini").head()
    val g = r.getDouble(3)
    assert(r.getLong(0) > 0L && g >= 0.0 && g < 1.0)
  }

  test("q_kendall tau-b and pair counts respect the total-pair bound") {
    val r = run("q_kendall").head()
    val n = r.getLong(0)
    val pairs = n * (n - 1) / 2
    assert(r.getLong(1) + r.getLong(2) <= pairs) // P + Q <= n0
    val tau = r.getDouble(5)
    assert(tau >= -1.0 && tau <= 1.0)
  }

  test("q_class_balance cuts every class to exactly the same size") {
    val sizes = run("q_class_balance").collect().map(_.getLong(1)).toSet
    assert(sizes.size === 1 && sizes.head >= 1L)
  }

  test("q_quantile_norm maps every row into (0, 1e6] and keeps all rows") {
    val out = run("q_quantile_norm")
    assert(out.count() === Tables.events(spark, sfDir).count())
    assert(out.filter(col("cdf_ppm") <= 0 || col("cdf_ppm") > 1000000).count() === 0L)
    // the maximum value must sit at exactly ppm 1e6 (inclusive CDF)
    assert(out.agg(max("cdf_ppm")).head().getLong(0) === 1000000L)
  }

  test("q_bpe_step merge shrinks the corpus by the applied-merge count") {
    val r = run("q_bpe_step").head()
    val (pair, cnt) = (r.getString(0), r.getLong(1))
    assert(pair.length === 2 && cnt >= 1L)
    val (before, after) = (r.getLong(3), r.getLong(4))
    // each applied merge removes exactly one symbol; applied merges
    // (non-overlapping) never exceed counted pairs (overlapping)
    assert(after < before && before - after <= cnt)
  }

  test("q_attribution buckets are the declared recency classes") {
    val rows = run("q_attribution").collect()
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("1d", "3d", "7d")))
    assert(rows.forall(_.getLong(1) > 0L))
  }

  test("q_bitset_agg masks agree with their popcount cardinality") {
    val bad = run("q_bitset_agg")
      .filter(expr("CAST(bit_count(type_mask) AS INT) <> n_types or type_mask = 0"))
    assert(bad.count() === 0L)
  }

  test("q_auc / q_ks_test / q_drift_tvd statistics live in their unit ranges") {
    val auc = run("q_auc").head()
    assert(auc.getDouble(3) >= 0.0 && auc.getDouble(3) <= 1.0)
    assert(auc.getLong(2) <= 2L * auc.getLong(0) * auc.getLong(1)) // 2U bound
    val ks = run("q_ks_test").head()
    assert(ks.getDouble(3) >= 0.0 && ks.getDouble(3) <= 1.0)
    assert(ks.getLong(2) <= ks.getLong(0) * ks.getLong(1))
    val tvd = run("q_drift_tvd").head()
    assert(tvd.getDouble(2) >= 0.0 && tvd.getDouble(2) <= 1.0)
  }

  test("q_confusion conserves the population and keeps ppm ratios in range") {
    val r = run("q_confusion").head()
    val total = r.getLong(0) + r.getLong(1) + r.getLong(2) + r.getLong(3)
    val expected = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "view")).count()
    assert(total === expected)
    assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000000L)
    assert(r.getLong(5) >= 0L && r.getLong(5) <= 1000000L)
  }

  test("q_lift_curve capture is monotone toward ppm 1e6 at the last decile") {
    val rows = run("q_lift_curve").collect()
      .map(r => (r.getLong(0), r.getLong(3))).sortBy(-_._1)
    rows.sliding(2).foreach {
      case Array((_, c1), (_, c2)) => assert(c2 >= c1)
      case _ =>
    }
    assert(rows.last._2 === 1000000L) // lowest decile captures everything
  }

  test("q_median_ci brackets the median; q_winsorize mean sits inside fences") {
    val ci = run("q_median_ci").head()
    assert(ci.getLong(2) <= ci.getLong(1) && ci.getLong(1) <= ci.getLong(3))
    val wz = run("q_winsorize").head()
    assert(wz.getLong(1) <= wz.getLong(2)) // p01 <= p99
    val mean = wz.getDouble(4)
    assert(mean >= wz.getLong(1).toDouble && mean <= wz.getLong(2).toDouble)
  }

  test("q_jackknife variance is nonnegative over the full 32-bucket panel") {
    val r = run("q_jackknife").head()
    assert(r.getLong(1) === 32L)
    assert(r.getDouble(4) >= 0.0)
  }

  test("q_assortativity is a correlation; q_sssp roots the source at 0") {
    val a = run("q_assortativity").head()
    assert(a.getDouble(1) >= -1.0 && a.getDouble(1) <= 1.0)
    val dists = run("q_sssp").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dists(1L) === 0L) // BfsSource
    assert(dists.values.forall(_ >= 0L))
  }

  test("q_quantile_norm plans a broadcast join, never a shuffled one") {
    val plan = SparkEntry.queries("q_quantile_norm")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "CDF map must broadcast onto the fact table")
    assert(!plan.contains("SortMergeJoin"),
      "the fact table must not shuffle for the CDF attach")
  }
}
