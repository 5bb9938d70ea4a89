package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Specs for the relational operator families (agg/sort/join/set/window).
  * Cross-checks each op against an independent Spark SQL formulation on
  * the sf0.001 fixtures — the DuckDB oracle is the external gate; these
  * catch regressions fast.
  */
class RelOpsSpec extends SparkSpec {
  import spark.implicits._

  lazy val li = Tables.lineitem(spark, sfDir).cache()
  lazy val orders = Tables.orders(spark, sfDir).cache()

  test("exactSum matches decimal-exact SQL sum and is order-independent") {
    val a = li.agg(AggOps.exactSum(col("l_extendedprice"))).as[Double].head()
    val b = li.repartition(13).agg(AggOps.exactSum(col("l_extendedprice")))
      .as[Double].head()
    assert(a == b)
    val sql = li.agg(sum(col("l_extendedprice").cast("decimal(28,4)")).cast("double"))
      .as[Double].head()
    assert(a == sql)
  }

  test("valueAggregate computes all families in one pass") {
    val r = AggOps.valueAggregate(li, Seq("l_returnflag"), "l_quantity")
    assert(r.columns.toSeq == Seq("l_returnflag", "sum_v", "max_v", "min_v", "cnt"))
    val totalCnt = r.agg(sum("cnt")).as[Long].head()
    assert(totalCnt == li.count())
  }

  test("uniqCount matches countDistinct") {
    val r = AggOps.uniqCount(orders, "o_orderpriority", "o_custkey")
    val direct = orders.groupBy("o_orderpriority")
      .agg(countDistinct("o_custkey").as("u"))
    val joined = r.join(direct, "o_orderpriority")
      .filter(col("uniq_v") =!= col("u")).count()
    assert(joined == 0)
  }

  test("totalSort produces globally ordered output") {
    val sorted = SortOps.totalSort(li.select("l_partkey"), col("l_partkey"))
      .as[Long].collect()
    assert(sorted.sameElements(sorted.sorted))
  }

  test("topK equals sort-then-take") {
    val a = SortOps.topK(orders.select("o_orderkey", "o_totalprice"), 10,
      col("o_totalprice").desc, col("o_orderkey"))
      .as[(Long, Double)].collect().toSeq
    val b = orders.select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .as[(Long, Double)].take(10).toSeq
    assert(a == b)
  }

  test("semi + anti partition the left side") {
    val l = li.filter(col("l_quantity") > 45)
    val nSemi = JoinOps.semi(orders, l, orders("o_orderkey") === l("l_orderkey")).count()
    val nAnti = JoinOps.anti(orders, l, orders("o_orderkey") === l("l_orderkey")).count()
    assert(nSemi + nAnti == orders.count())
  }

  test("asofJoin picks the latest right row at-or-before, with tiebreak") {
    import spark.implicits._
    val l = Seq((1L, 100L), (2L, 50L), (3L, 5L)).toDF("id", "t")
      .withColumn("k", lit("u"))
    val r = Seq((10L, 40L), (11L, 90L), (12L, 90L), (13L, 200L))
      .toDF("rid", "rt").withColumn("k", lit("u"))
    val out = JoinOps.asofJoin(l, r, "k", "t", "rt", "rid").collect()
      .map(row => row.getAs[Long]("id") -> row.getAs[Long]("rid")).toMap
    assert(out === Map(1L -> 12L, 2L -> 10L)) // id 3: nothing ≤ 5 → absent
  }

  test("asofJoinForward and asofJoinNearest: directions, ties, inclusivity") {
    import spark.implicits._
    val l = Seq((1L, 100L), (2L, 50L), (3L, 5L), (4L, 90L)).toDF("id", "t")
      .withColumn("k", lit("u"))
    val r = Seq((10L, 40L), (11L, 90L), (12L, 90L), (13L, 200L))
      .toDF("rid", "rt").withColumn("k", lit("u"))
    // Forward: earliest rt >= t; equal-time right rows eligible (id 4
    // at t=90 takes rid 11, the min tiebreak); id 1 (t=100) skips to
    // 200; nothing follows no one here, id 3 takes rid 10.
    val fwd = JoinOps.asofJoinForward(l, r, "k", "t", "rt", "rid")
      .collect().map(x => x.getAs[Long]("id") -> x.getAs[Long]("rid")).toMap
    assert(fwd === Map(1L -> 13L, 2L -> 11L, 3L -> 10L, 4L -> 11L))
    // Nearest: id 1 (t=100) has backward dist 10 (rt=90) vs forward
    // dist 100 (rt=200) -> backward rid 12 (max tiebreak); id 2 (t=50)
    // dist 10 both ways (40 vs 90... backward 10, forward 40) -> rid 10;
    // id 3 (t=5): only forward (dist 35) -> rid 10; id 4 (t=90): dist 0
    // both directions -> backward preference, rid 12.
    val near = JoinOps.asofJoinNearest(l, r, "k", "t", "rt", "rid")
      .collect().map(x => x.getAs[Long]("id") -> x.getAs[Long]("rid")).toMap
    assert(near === Map(1L -> 12L, 2L -> 10L, 3L -> 10L, 4L -> 12L))
  }

  test("asofJoinNearest matches a per-row scan model on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val keys = Seq("a", "b", "c")
    val left = (1 to 60).map(i =>
      (i.toLong, keys(rnd.nextInt(3)), rnd.nextInt(50).toLong))
    val right = (1 to 40).map(i =>
      (keys(rnd.nextInt(3)), (100 + i).toLong, rnd.nextInt(50).toLong))
    val got = JoinOps.asofJoinNearest(
      left.toDF("event_id", "k", "t"), right.toDF("k", "rid", "rt"),
      "k", "t", "rt", "rid").collect()
      .map(x => x.getLong(0) -> (x.getLong(3), x.getLong(4))).toMap
    val want = left.flatMap { case (id, k, t) =>
      val c = right.filter(_._1 == k)
      if (c.isEmpty) None
      else {
        val back = c.filter(_._3 <= t)
        val fwd = c.filter(_._3 >= t)
        val b = if (back.isEmpty) None else Some(back.maxBy(x => (x._3, x._2)))
        val f = if (fwd.isEmpty) None else Some(fwd.minBy(x => (x._3, x._2)))
        (b, f) match {
          case (None, None) => None
          case (Some(x), None) => Some(id -> (x._2, x._3))
          case (None, Some(x)) => Some(id -> (x._2, x._3))
          case (Some(x), Some(y)) =>
            val pick = if (y._3 - t < t - x._3) y else x
            Some(id -> (pick._2, pick._3))
        }
      }
    }.toMap
    assert(got === want)
  }

  test("zorderValue matches a bit-interleave model; layout sorts by it") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (1 to 50).map(_ => (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    def model(a: Long, b: Long): Long =
      (0 until 16).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum
    val df = rows.toDF("a", "b")
    val got = df.select(col("a"), col("b"),
        SortOps.zorderValue(col("a"), col("b")).as("z")).collect()
    got.foreach(r => assert(r.getLong(2) === model(r.getLong(0), r.getLong(1))))
    // locality property: interleaving bounds each dimension by the z-range
    assert(model(3, 3) < model(0, 4)) // (3,3) packs below any b>=4 point
    val plan = SortOps.zorderLayout(df, col("a"), col("b"))
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"), plan)
    assert(plan.contains("Sort"), plan)
  }

  test("asofJoin matches a per-row scan model on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val keys = Seq("a", "b", "c")
    val left = (1 to 60).map(i =>
      (i.toLong, keys(rnd.nextInt(3)), rnd.nextInt(50).toLong))
    val right = (1 to 40).map(i =>
      (keys(rnd.nextInt(3)), (100 + i).toLong, rnd.nextInt(50).toLong))
    val l = left.toDF("event_id", "k", "t")
    val r = right.toDF("k", "rid", "rt")
    val got = JoinOps.asofJoin(l, r, "k", "t", "rt", "rid").collect()
      .map(x => x.getLong(0) -> (x.getLong(3), x.getLong(4))).toMap
    // Model: latest right row with rt <= t, ties by max rid.
    val want = left.flatMap { case (id, k, t) =>
      val c = right.filter(x => x._1 == k && x._3 <= t)
      if (c.isEmpty) None
      else {
        val best = c.maxBy(x => (x._3, x._2))
        Some(id -> (best._2, best._3))
      }
    }.toMap
    assert(got === want)
  }

  test("intervalOverlapJoin: boundary touch counts once, same key never") {
    import spark.implicits._
    // Bucket width 100. Pairs: (a1, b1) overlap crossing a bucket
    // boundary (shares buckets 0 and 1 -> must emit ONCE); (a1, c1)
    // touch exactly at t=150 (inclusive endpoints -> overlap 0);
    // (a2, b1) disjoint; (a1, a2) same key -> excluded even though the
    // intervals overlap.
    val iv = Seq(
      ("a", 1L, 50L, 150L), ("a", 2L, 140L, 160L),
      ("b", 1L, 90L, 145L), ("c", 1L, 150L, 250L)
    ).toDF("k", "id", "s", "e")
    val got = JoinOps.intervalOverlapJoin(iv, "k", "id", "s", "e", 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3)) -> r.getLong(4)).toMap
    assert(got === Map(
      ("a", 1L, "b", 1L) -> 55L,   // [90,145] within [50,150]
      ("a", 2L, "b", 1L) -> 5L,    // [140,145]
      ("a", 1L, "c", 1L) -> 0L,    // boundary touch at 150
      ("a", 2L, "c", 1L) -> 10L))  // [150,160]
  }

  test("rangeSelfJoin finds in-width pairs across bucket boundaries, once") {
    import spark.implicits._
    // width 100: pairs (1,2) dt=30 same bucket, (2,3) dt=90 crosses the
    // bucket-100 boundary, (1,3) dt=120 out of width, (4,*) other key.
    val df = Seq((1L, 60L, "a"), (2L, 90L, "a"), (3L, 180L, "a"), (4L, 95L, "b"))
      .toDF("id", "t", "k")
    val out = JoinOps.rangeSelfJoin(df, "k", "t", "id", 100L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSet === Set(("a", 1L, 2L, 30L), ("a", 2L, 3L, 90L)))
    assert(out.length === 2) // no duplicate emission from the band fan-out
  }

  test("dimJoin plans a broadcast join") {
    val n = Tables.nation(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val plan = JoinOps.dimJoin(c, n, c("c_nationkey") === n("n_nationkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("inner join row count matches lineitem (fk integrity)") {
    val j = JoinOps.inner(orders, li, orders("o_orderkey") === li("l_orderkey"))
    assert(j.count() == li.count())
  }

  test("saltedJoin equals the plain join on every bucket count") {
    import org.apache.spark.sql.functions.col
    val l = li.select(col("l_orderkey").as("k"), col("l_linenumber"))
    val o = orders.select(col("o_orderkey").as("k"), col("o_orderpriority"))
    val plain = l.join(o, "k").collect().map(_.toSeq).toSet
    for (b <- Seq(1, 3, 8)) {
      val salted = JoinOps.saltedJoin(l, o, "k", col("l_linenumber"), b)
        .select("k", "l_linenumber", "o_orderpriority")
        .collect().map(_.toSeq).toSet
      assert(salted === plain, s"buckets=$b")
    }
  }

  test("tfidf ranks rare terms above common ones") {
    import spark.implicits._
    import graft.ops.TextStatsOps
    // 'rare' appears in one doc, 'common' in all three; equal tf within
    // doc 1 → rare must outrank common.
    val docs = Seq((1L, "rare common x"), (2L, "common y q"), (3L, "common z p"))
      .toDF("doc_id", "text")
    val top = TextStatsOps.tfidfTopTerms(docs, 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top(1L) === "rare")
    val all = TextStatsOps.tfidfTopTerms(docs, 3)
      .filter($"doc_id" === 1L).collect()
      .map(r => (r.getString(1), r.getDouble(4))).toMap
    // weight = tf*1e6*N/df: rare 3e6, common 1e6.
    assert(all("rare") === 3000000.0 && all("common") === 1000000.0)
  }

  test("mergeApply: latest wins, D drops, I inserts, untouched rows pass") {
    import spark.implicits._
    import graft.ops.CdcOps
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "v")
    val changes = Seq(
      (2L, "b-old", "U", 1L), (2L, "b-new", "U", 2L), // latest must win
      (3L, "c", "D", 1L),                             // delete
      (5L, "e", "I", 1L)                              // insert
    ).toDF("k", "v", "op", "seq")
    val got = CdcOps.mergeApply(base, changes, "k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "a"), (2L, "b-new"), (4L, "d"), (5L, "e")))
  }

  test("histogramQuantiles interpolates within exact-count buckets") {
    import spark.implicits._
    import graft.ops.AggOps
    val df = (1 to 10).map(v => ("a", v.toDouble)).toDF("g", "v")
    val r = AggOps.histogramQuantiles(df, "g", "v", 2.0).head()
    // buckets of width 2 over 1..10; targets ceil(n*p/100) = 3, 5, 8
    assert(r.getString(0) === "a")
    assert(r.getDouble(1) === 4.0) // p25: bucket 1 (cum 3), rem 2/2
    assert(r.getDouble(2) === 6.0) // p50: bucket 2 (cum 5), rem 2/2
    assert(r.getDouble(3) === 9.0) // p75: bucket 4 (cum 9), rem 1/2
  }

  test("skewReport ranks heavy hitters with exact ppm shares") {
    import spark.implicits._
    import graft.ops.AggOps
    val df = (Seq.fill(6)(7L) ++ Seq.fill(3)(8L) ++ Seq(9L)).toDF("k")
    val got = AggOps.skewReport(df, "k", k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === Seq(
      (7L, 6L, 10L, 3L, 600000L),
      (8L, 3L, 10L, 3L, 300000L)))
  }

  test("profile computes per-column stats in one pass") {
    import spark.implicits._
    import graft.ops.AggOps
    val df = Seq(
      (1L, Some(2.5), "x"), (2L, None, "y"), (3L, Some(2.5), "y")
    ).toDF("k", "v", "s")
    val got = AggOps.profile(df, Seq("k", "v", "s")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), Option(r.get(5)), Option(r.get(6)))).toMap
    assert(got("k") === ((3L, 3L, 0L, 3L, Some(1.0), Some(3.0))))
    assert(got("v") === ((3L, 2L, 1L, 1L, Some(2.5), Some(2.5))))
    assert(got("s") === ((3L, 3L, 0L, 2L, None, None)))
  }

  test("tableDigest is layout-independent and detects any row change") {
    import spark.implicits._
    import graft.ops.AggOps
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val d1 = AggOps.tableDigest(df, "t", Seq("k", "v")).head()
    val d2 = AggOps.tableDigest(df.repartition(7), "t", Seq("k", "v")).head()
    assert(d1 === d2)
    assert(d1.getLong(1) === 3L)
    val changed = AggOps.tableDigest(
      Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("k", "v"), "t",
      Seq("k", "v")).head()
    assert(changed.getLong(2) !== d1.getLong(2))
    // XOR self-check: hash of the changed row in/out
    val h = graft.ops.DedupOps.hash60Local("2|b") ^
      graft.ops.DedupOps.hash60Local("2|B")
    assert((changed.getLong(2) ^ d1.getLong(2)) === h)
  }

  test("pitLookup returns each seq's exact snapshot from one history") {
    import spark.implicits._
    import graft.ops.CdcOps
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (2L, "b2", "U", 1L), (2L, "b3", "U", 2L),
      (3L, "c", "D", 1L), (5L, "e", "I", 1L)
    ).toDF("k", "v", "op", "seq")
    val hist = CdcOps.scd2(base, changes, "k")
    def snap(t: Long) = CdcOps.pitLookup(hist, t).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(snap(0L) === Set(1L -> "a", 2L -> "b", 3L -> "c"))
    assert(snap(1L) === Set(1L -> "a", 2L -> "b2", 5L -> "e"))
    assert(snap(2L) === Set(1L -> "a", 2L -> "b3", 5L -> "e"))
  }

  test("tableDiff classifies added/removed/changed/unchanged with null-safety") {
    import spark.implicits._
    import graft.ops.CdcOps
    val a = Seq((1L, Option("x")), (2L, Option("y")),
      (3L, Option.empty[String]), (4L, Option("z"))).toDF("k", "v")
    val b = Seq((1L, Option("x")), (2L, Option("Y")),
      (3L, Option.empty[String]), (5L, Option("w"))).toDF("k", "v")
    // null == null payloads (key 3) must be UNCHANGED, not changed.
    val got = CdcOps.tableDiff(a, b, "k").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      "unchanged" -> ((2L, 4L)),  // keys 1, 3
      "changed" -> ((1L, 2L)),
      "removed" -> ((1L, 4L)),
      "added" -> ((1L, 5L))))
  }

  test("QualityOps.check counts each planted violation class exactly") {
    import spark.implicits._
    import graft.ops.QualityOps._
    val t = Seq(
      (1L, "F", 10.0, 100L), (2L, "O", -5.0, 100L), // range violation (id 2)
      (3L, "X", 20.0, 100L),                        // in_set violation
      (4L, null.asInstanceOf[String], 30.0, 100L),  // not_null violation
      (5L, "F", 40.0, 100L), (5L, "F", 40.0, 100L), // duplicate key 5
      (6L, "O", 50.0, 999L)                         // dangling FK
    ).toDF("k", "status", "price", "fk")
    val dim = Seq(100L).toDF("dk")
    val got = check(t, "k", Seq(
      NotNull("status"), InRange("price", 0.0, 100.0),
      InSet("status", Seq("F", "O")), Unique("k"),
      ForeignKey("fk", dim, "dk")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(got("not_null(status)") === ((1L, 4L)))
    assert(got("range(price)") === ((1L, 2L)))
    assert(got("in_set(status)") === ((1L, 3L)))
    assert(got("unique(k)") === ((1L, 5L)))
    assert(got("foreign_key(fk)") === ((1L, 6L)))
    // A clean table reports all-zero violations, not missing rows.
    val clean = Seq((1L, "F", 10.0, 100L)).toDF("k", "status", "price", "fk")
    val zeros = check(clean, "k", Seq(NotNull("status"), Unique("k"),
      ForeignKey("fk", dim, "dk")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(zeros.values.forall(_ == 0L) && zeros.size === 3)
  }

  test("groupedRegression recovers a planted line exactly") {
    import spark.implicits._
    // y = 3x + 7, two groups with different noise-free lines.
    val rows = (1L to 20L).map(x => ("a", x, 3.0 * x + 7.0)) ++
      (1L to 20L).map(x => ("b", x, -2.0 * x + 100.0))
    val got = AggOps.groupedRegression(
      rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val (sa, ia, ra) = got("a")
    val (sb, ib, rb) = got("b")
    assert(math.abs(sa - 3.0) < 1e-9 && math.abs(ia - 7.0) < 1e-9)
    assert(math.abs(sb + 2.0) < 1e-9 && math.abs(ib - 100.0) < 1e-9)
    assert(math.abs(ra - 1.0) < 1e-9 && math.abs(rb - 1.0) < 1e-9)
  }

  test("zscoreOutliers flags exactly the planted extremes") {
    import spark.implicits._
    // 100 values at 10.0 +- 0.5 plus two wild points; sigma is tiny so
    // only the planted ids cross 3 sigma.
    val base = (1L to 100L).map(i => ("t", i, 10.0 + (i % 2) * 0.5))
    val wild = Seq(("t", 998L, 500.0), ("t", 999L, -500.0))
    val got = AggOps.zscoreOutliers((base ++ wild).toDF("g", "id", "v"),
      "g", "v", "id").collect()
    assert(got.length === 1)
    val r = got(0)
    assert(r.getLong(1) === 2L && r.getLong(2) === 998L + 999L)
    assert(r.getDouble(3) === -500.0 && r.getDouble(4) === 500.0)
  }

  test("modeOf elects the most frequent value, ties toward the smallest") {
    import spark.implicits._
    // g=a: 3 is strictly most frequent. g=b: 1 and 7 tie at 2 — the
    // smaller value must win on any engine / partition layout.
    val df = Seq(("a", 3.0), ("a", 3.0), ("a", 5.0),
      ("b", 7.0), ("b", 7.0), ("b", 1.0), ("b", 1.0), ("b", 9.0))
      .toDF("g", "v")
    val got = AggOps.modeOf(df, "g", "v").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got === Map("a" -> ((3.0, 2L)), "b" -> ((1.0, 2L))))
    val shuffled = AggOps.modeOf(df.repartition(7), "g", "v").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(shuffled === got)
  }

  test("chiSquare is exactly zero on an independent table, positive otherwise") {
    import spark.implicits._
    // Perfectly independent 2x2: every cell count = ra*cb/n exactly.
    val indep = Seq.tabulate(40)(i => (s"a${i % 2}", s"b${(i / 2) % 2}"))
      .toDF("x", "y")
    val r0 = AggOps.chiSquare(indep, "x", "y").head()
    assert(r0.getDouble(0) === 0.0 && r0.getLong(1) === 1L)
    // Perfectly dependent: x determines y -> chi2 = n on a 2x2.
    val dep = Seq.tabulate(40)(i => (s"a${i % 2}", s"b${i % 2}")).toDF("x", "y")
    val r1 = AggOps.chiSquare(dep, "x", "y").head()
    assert(r1.getDouble(0) === 40.0 && r1.getLong(1) === 1L)
  }

  test("heavyHitters matches the exact groupBy-HAVING answer under forced eviction") {
    import spark.implicits._
    // k=2 -> cap=16 counters per partition, but 100 distinct cold keys
    // force Misra-Gries decrement sweeps; the planted hot key holds 60% of
    // rows. The exact verify phase must reproduce the ground truth
    // regardless of which candidates the sketch emitted.
    val rows = (1L to 150L).map(i => if (i <= 90) 7L else i) // 90x key 7
    val df = rows.toDF("k").repartition(5)
    val got = AggOps.heavyHitters(df, "k", 2).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((7L, 90L)))
  }

  test("domainGuard: in-bound passes unchanged, over-bound fails loudly, fixtures fit") {
    import spark.implicits._
    val h = (1L to 100L).map(v => (v, v)).toDF("v", "cnt")
    // In-bound: the guard must be a no-op on the data.
    val ok = AggOps.domainGuard(h, 100L, "t").collect()
    assert(ok.length === 100)
    // Over-bound: the job must fail with the operator's message — this
    // also proves the optimizer did not prune the assert from the plan.
    def msgs(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage} | ${msgs(t.getCause)}"
    val e = intercept[Throwable] {
      AggOps.domainGuard(h, 99L, "t").collect()
    }
    assert(msgs(e).contains("compressed value domain"), msgs(e))
    // Fixture contract behind the guarded operators (q_quantile_norm,
    // q_gini, q_winsorize, q_binning): compression columns stay far
    // under the 2^20 bound.
    val cents = Tables.events(spark, sfDir)
      .select(floor(col("value") * 100).cast("long").as("c"))
      .distinct().count()
    assert(cents < (1L << 20))
    val qty = Tables.lineitem(spark, sfDir)
      .select(col("l_quantity").cast("long").as("v")).distinct().count()
    assert(qty < (1L << 20))
  }

  test("heavyHitters candidate cover survives extreme partition skew") {
    import spark.implicits._
    // The Misra-Gries absent-key bound is per-partition (≤ N_p/(cap+1))
    // and sums to n/(cap+1) over ANY layout — so even a layout where one
    // partition holds ~100× the others' rows must not drop a global
    // 1/k-heavy key. Partition by a routing tag that funnels the cold
    // mass (4000 unique keys, forcing constant decrement sweeps) plus
    // HALF the hot key's rows into one giant partition, spreading the
    // rest thinly — the skewed-partition trap the old scaladoc excluded.
    val k = 5
    // 1100 of 5100 rows ≈ 21.6% > 1/5; hot rows spread thinly (~137 per
    // partition) while ALL cold mass lands in routing tag 0 — the giant
    // partition holds ~4137 rows vs ~137 elsewhere.
    val hot = (1 to 1100).map(i => (99999L, i % 8))
    val cold = (1L to 4000L).map(i => (i, 0))
    val df = (hot ++ cold).toDF("k", "tag")
      .repartition(8, col("tag"))
      .drop("tag")
    val got = AggOps.heavyHitters(df, "k", k).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((99999L, 1100L)))
  }

  test("skyline2D keeps exactly the Pareto frontier, ties included") {
    import spark.implicits._
    // Maximize x, minimize y. Frontier: (12,9); (10,5); the duplicate
    // (8,3) pair BOTH survive; (3,1). (10,7) falls to the tied-x
    // stricter-y rule; (6,4) falls to (8,3). bucketWidth=4 forces the
    // phase-1 prune to actually fire (it must drop (6,4) map-side).
    val pts = Seq((1L, 10L, 5L), (2L, 10L, 7L), (3L, 8L, 3L), (4L, 8L, 3L),
      (5L, 6L, 4L), (6L, 12L, 9L), (7L, 3L, 1L)).toDF("id", "x", "y")
    val got = graft.ops.SortOps.skyline2D(pts, "x", "y", bucketWidth = 4L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 3L, 4L, 6L, 7L))
    // empty input -> empty frontier, no window errors
    val empty = Seq.empty[(Long, Long, Long)].toDF("id", "x", "y")
    assert(graft.ops.SortOps.skyline2D(empty, "x", "y").count() === 0L)
  }

  test("coOccurrence counts unordered pair support across baskets") {
    import spark.implicits._
    // Basket 1 holds {10,20,30} (with a duplicate 10-line that must not
    // double-count); baskets 2 and 3 hold {10,20} -> only (10,20)
    // reaches support 3; every other pair has support 1 < minSupport.
    val df = Seq((1L, 10L), (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L), (3L, 10L), (3L, 20L)).toDF("bk", "p")
    val got = AggOps.coOccurrence(df, "bk", "p", minSupport = 2, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((10L, 20L, 3L)))
  }

  test("sketchRollup monthly estimates land within 5% of exact distinct") {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val est = AggOps.sketchRollup(ev, "ts", "user_id").collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val exact = ev.select(date_trunc("month",
        timestamp_micros(EventOps.microsOf(ev, "ts"))).as("m"), col("user_id"))
      .distinct().groupBy("m").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet && est.nonEmpty)
    exact.foreach { case (m, n) =>
      assert(math.abs(est(m).toDouble - n) / n < 0.05,
        s"month $m: est ${est(m)} vs exact $n")
    }
  }

  test("forwardFill carries last non-null per key; leading nulls stay") {
    import spark.implicits._
    val df = Seq(
      ("u", 1L, 1L, Option.empty[Double]), // leading null stays
      ("u", 2L, 2L, Option(5.0)),
      ("u", 3L, 3L, Option.empty[Double]), // -> 5.0
      ("u", 4L, 4L, Option(9.0)),
      ("v", 1L, 5L, Option.empty[Double])  // other key: stays null
    ).toDF("k", "t", "id", "v")
    val got = EventOps.forwardFill(df, "k", "t", "id", "v")
      .collect().map(r => (r.getString(0), r.getLong(2)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got === Map(("u", 1L) -> None, ("u", 2L) -> Some(5.0),
      ("u", 3L) -> Some(5.0), ("u", 4L) -> Some(9.0), ("v", 5L) -> None))
  }

  test("welchTTest matches the closed form on a hand-computed fixture") {
    import spark.implicits._
    // A = {1,2,3}: mean 2, var 1.  B = {2,4}: mean 3, var 2.
    // se2 = 1/3 + 1 = 4/3; t = -1/sqrt(4/3); dof = (4/3)^2/((1/3)^2/2 + 1).
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 2.0), ("B", 4.0),
      ("C", 99.0)).toDF("g", "v") // C must be excluded
    val r = AggOps.welchTTest(df, "g", "v", "A", "B").head()
    assert(r.getLong(0) === 3L && r.getLong(1) === 2L)
    assert(math.abs(r.getDouble(2) - 2.0) < 1e-12)
    assert(math.abs(r.getDouble(3) - 3.0) < 1e-12)
    assert(math.abs(r.getDouble(4) - (-1.0 / math.sqrt(4.0 / 3.0))) < 1e-12)
    val dof = (4.0 / 3.0) * (4.0 / 3.0) / ((1.0 / 9.0) / 2.0 + 1.0)
    assert(math.abs(r.getDouble(5) - dof) < 1e-12)
  }

  test("intervalMerge: overlapping and touching intervals fuse, gaps split") {
    import spark.implicits._
    // user 1, dur=30: starts 0,10,40 chain into one island ([0,30) overlaps
    // [10,40); [40,70) TOUCHES the running max end 40 and must fuse);
    // start 100 clears the max end 70 -> second island.
    val df = Seq((1L, 1L, 0L), (1L, 2L, 10L), (1L, 3L, 40L), (1L, 4L, 100L),
        (2L, 5L, 5L))
      .toDF("user_id", "event_id", "m")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("m")).as("ts"))
    val got = EventOps.intervalMerge(df, durUs = 30L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got === Map(
      (1L, 1L) -> (3L, 0L, 70L, 70L),
      (1L, 2L) -> (1L, 100L, 130L, 30L),
      (2L, 1L) -> (1L, 5L, 35L, 30L)))
  }

  test("cumulativeDistinct counts each user once, at its first-seen day") {
    import spark.implicits._
    val df = Seq((100L, 1L, 3L), (200L, 2L, 12L), (100L, 3L, 25L),
        (300L, 4L, 25L))
      .toDF("user_id", "event_id", "m")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("m")).as("ts"))
    val got = EventOps.cumulativeDistinct(df, bucketUs = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(_._1)
    // user 100's second event (day 20) must not re-count it.
    assert(got === Seq((0L, 1L, 1L), (10L, 1L, 2L), (20L, 1L, 3L)))
  }

  test("weightedMovingAvg: power-of-two weights, partial windows shrink den") {
    import spark.implicits._
    val df = Seq((1L, 1L, 1L, 1.0), (1L, 2L, 2L, 2.0), (1L, 3L, 3L, 3.0),
        (2L, 4L, 1L, 4.0))
      .toDF("user_id", "event_id", "m", "value")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("m")).as("ts"), col("value"))
    val got = EventOps.weightedMovingAvg(df, k = 2)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    // k=2 weights (2,1) over cents: first rows have no lag -> den 2.
    assert(got === Map(1L -> (200L, 2L), 2L -> (500L, 3L),
      3L -> (800L, 3L), 4L -> (800L, 2L)))
  }

  test("scd2 builds validity intervals; tombstones close but never emit") {
    import spark.implicits._
    import graft.ops.CdcOps
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (2L, "b2", "U", 1L), (2L, "b3", "U", 2L), // two versions of key 2
      (3L, "c", "D", 1L),                       // delete closes version 0
      (5L, "e", "I", 1L)                        // late insert, no base row
    ).toDF("k", "v", "op", "seq")
    val got = CdcOps.scd2(base, changes, "k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4))).toSet
    assert(got === Set(
      (1L, "a", 0L, None, 1L),          // untouched, current
      (2L, "b", 0L, Some(1L), 0L),      // closed by first update
      (2L, "b2", 1L, Some(2L), 0L),
      (2L, "b3", 2L, None, 1L),         // latest, current
      (3L, "c", 0L, Some(1L), 0L),      // closed by tombstone, not current
      (5L, "e", 1L, None, 1L)))
  }

  test("mergeUpsertDemo matches a driver-side replica of the change rules") {
    import graft.ops.CdcOps
    val orders = Tables.orders(spark, sfDir)
    val got = CdcOps.mergeUpsertDemo(orders).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val base = orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = base.flatMap { case (k, c, p) =>
      k % 10 match {
        case 0 => Nil                        // deleted
        case 1 => Seq(k -> (c, p * 2.0))     // latest update wins
        case 2 => Seq(k -> (c, p), (k + 1000000000L) -> (c, p)) // + insert
        case _ => Seq(k -> (c, p))
      }
    }.toMap
    assert(got === want)
    assert(got.nonEmpty)
  }
}
