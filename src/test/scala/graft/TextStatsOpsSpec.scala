package graft

import org.apache.spark.sql.functions._
import graft.ops.{EventOps, TextStatsOps}

class TextStatsOpsSpec extends SparkSpec {
  import spark.implicits._

  test("shingleArr matches a plain Scala sliding-window model") {
    import graft.ops.DedupOps
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "bb", "ccc", "dd", "e")
    val docs = (0 until 60).map { i =>
      val n = rnd.nextInt(7) // 0..6 words — covers the too-short cases
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    for (k <- Seq(2, 3)) {
      val got = df.select(col("doc_id"),
          DedupOps.shingleArr(col("text"), k).as("sh")).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
      val want = docs.map { case (id, text) =>
        val w = text.split("\\s+").filter(_.nonEmpty).toList
        id -> (if (w.length >= k) w.sliding(k).map(_.mkString(" ")).toList
               else Nil)
      }.toMap
      assert(got === want, s"k=$k")
    }
  }

  test("scrub counts and redacts emails, urls and digit runs in order") {
    val df = Seq((1L, "write to bob1@mail.co or see http://x.y/z page 42 and 7"))
      .toDF("doc_id", "text")
    val r = TextStatsOps.scrub(df).head()
    assert(r.getAs[Long]("n_email") === 1L)
    assert(r.getAs[Long]("n_url") === 1L)
    assert(r.getAs[Long]("n_num") === 2L)   // 42 and 7; email digits excluded
    val cleaned = "write to <EMAIL> or see <URL> page <NUM> and <NUM>"
    assert(r.getAs[Long]("n_chars_clean") === cleaned.length.toLong)
  }

  test("dirtyCorpus appends deterministic scrub targets") {
    val df = Seq((7L, "base")).toDF("doc_id", "text")
    val t = TextStatsOps.dirtyCorpus(df).head().getString(1)
    assert(t === "base contact u7@ex.com http://site/p7 id " + 7 * 7919)
  }

  test("textStats computes exact counts on a known document") {
    val df = Seq((1L, "the cat and the hat")).toDF("doc_id", "text")
    val r = TextStatsOps.textStats(df).head()
    assert(r.getAs[Long]("n_chars_c") === 19L)
    assert(r.getAs[Long]("n_tokens") === 5L)
    assert(r.getAs[Long]("n_distinct") === 4L)   // 'the' twice
    assert(r.getAs[Double]("avg_tok_len") === 15.0 / 5)
    assert(r.getAs[Double]("stop_ratio") === 3.0 / 5) // the, and, the
    val q = 5.0 / 100 * 0.4 + 3.0 / 5 * 0.3 + 4.0 / 5 * 0.3
    assert(r.getAs[Double]("quality") === q)
  }

  test("langId predicts via stopword hits with deterministic ties") {
    val df = Seq(
      (1L, "xx", "the cat and the dog is here"), // en hits
      (2L, "xx", "der hund ist und das"),        // de hits
      (3L, "xx", "qqq www zzz")                  // no hits anywhere
    ).toDF("doc_id", "lang", "text")
    val out = TextStatsOps.langId(df).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getLong(3))).toMap
    assert(out(1L)._1 === "en" && out(1L)._2 === 4L)
    assert(out(2L)._1 === "de" && out(2L)._2 === 4L)
    assert(out(3L) === ("und", 0L))
  }

  test("tokenCounts: BPE-ish pre-tokenizer splits runs and punctuation") {
    val df = Seq((1L, "ab12 cd! x")).toDF("doc_id", "text")
    val r = TextStatsOps.tokenCounts(df).head()
    assert(r.getAs[Long]("n_ws") === 3L)
    // ab | 12 | cd | ! | x
    assert(r.getAs[Long]("n_bpe") === 5L)
  }

  test("fingerprint: gram count and partition-layout determinism") {
    val docs = Tables.documents(spark, sfDir)
    val fp = TextStatsOps.fingerprint(docs)
    val r = fp.join(docs.select(col("doc_id"), length(col("text")).as("n")), "doc_id")
    assert(r.filter(col("n_grams") =!= col("n") - 7).count() === 0)
    val a = TextStatsOps.fingerprint(docs).collect().toSet
    val b = TextStatsOps.fingerprint(docs.repartition(7)).collect().toSet
    assert(a === b)
  }

  test("corpusReport aggregates exact int64 profiles per (source, lang)") {
    val docs = Seq(
      (1L, "a bb ccc", "en", "s1"),
      (2L, "dd ee", "en", "s1"),
      (3L, "f", "fr", "s1"),
      (4L, null.asInstanceOf[String], "en", "s2") // null text excluded
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextStatsOps.corpusReport(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(out === Map(
      ("s1", "en") -> ((2L, 5L, 2L, 3L, 13L)),
      ("s1", "fr") -> ((1L, 1L, 1L, 1L, 1L))))
  }

  test("repetitionStats scores looped text high and varied text low") {
    val docs = Seq(
      (1L, "spam spam spam spam spam"),      // 4 bigrams, all "spam spam"
      (2L, "the quick brown fox jumps"),     // 4 distinct bigrams
      (3L, "one"),                           // too short: no bigrams
      (4L, "a b a b a b")                    // "a b"×3, "b a"×2
    ).toDF("doc_id", "text")
    val out = TextStatsOps.repetitionStats(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.keySet === Set(1L, 2L, 4L))
    assert(out(1L) === ((4L, 1L, 1.0, 0.25)))
    assert(out(2L) === ((4L, 4L, 0.25, 1.0)))
    assert(out(4L) === ((5L, 2L, 0.6, 0.4)))
  }

  test("sessionize splits on gaps > 30min and aggregates per session") {
    val base = 1700000000000000L // epoch micros
    val df = Seq(
      // user 1: two events 10 min apart, then a 2h gap, then one more
      (1L, base, 10L, 1.0),
      (2L, base + 600L * 1000000, 10L, 2.0),
      (3L, base + 7800L * 1000000, 10L, 4.0),
      // user 2: single event
      (4L, base, 20L, 8.0)
    ).toDF("event_id", "tus_us", "user_id", "value")
      .select(col("event_id"), (col("tus_us") * 1000).as("ts"), // nanos-long path
        col("user_id"), col("value"))
    val out = EventOps.sessionize(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(out.keySet === Set((10L, 1L), (10L, 2L), (20L, 1L)))
    assert(out((10L, 1L)) === ((2L, base, base + 600L * 1000000, 3.0)))
    assert(out((10L, 2L)) === ((1L, base + 7800L * 1000000, base + 7800L * 1000000, 4.0)))
    assert(out((20L, 1L)) === ((1L, base, base, 8.0)))
  }

  test("gapFill carries the last observation through empty buckets") {
    val b = 21600L * 1000000L // 6h buckets
    val base = (1700000000000000L / b) * b // bucket-aligned epoch micros
    val df = Seq(
      // user 10: bucket 0 has two events (latest wins), buckets 1-2
      // empty (forward-filled), bucket 3 occupied
      (1L, base + 1000L, 10L, 1.0),
      (2L, base + 2000L, 10L, 7.0),
      (3L, base + 3 * b + 5L, 10L, 9.0),
      // user 20: single event → single-bucket grid
      (4L, base + b + 1L, 20L, 4.0)
    ).toDF("event_id", "tus_us", "user_id", "value")
      .select(col("event_id"), (col("tus_us") * 1000).as("ts"), // nanos-long path
        col("user_id"), col("value"))
    val out = EventOps.gapFill(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.keySet === Set((10L, base), (10L, base + b), (10L, base + 2 * b),
      (10L, base + 3 * b), (20L, base + b)))
    assert(out((10L, base)) === ((7.0, 2L, 0L)))          // latest of 2 events
    assert(out((10L, base + b)) === ((7.0, 0L, 1L)))      // filled
    assert(out((10L, base + 2 * b)) === ((7.0, 0L, 1L)))  // filled
    assert(out((10L, base + 3 * b)) === ((9.0, 1L, 0L)))
    assert(out((20L, base + b)) === ((4.0, 1L, 0L)))
  }

  test("funnel completes steps only in order, inclusive at ties") {
    val base = 1700000000000000L
    def ev(id: Long, off: Long, u: Long, t: String) =
      (id, (base + off * 1000000L) * 1000, u, t) // nanos-long ts path
    val df = Seq(
      // user 1: full funnel in order
      ev(1, 0, 1L, "signup"), ev(2, 10, 1L, "view"), ev(3, 20, 1L, "click"),
      // user 2: click BEFORE its view → depth 2 (click at 5 < view at 10)
      ev(4, 0, 2L, "signup"), ev(5, 5, 2L, "click"), ev(6, 10, 2L, "view"),
      // user 3: view before signup doesn't count; later view does
      ev(7, 5, 3L, "signup"), ev(8, 0, 3L, "view"), ev(9, 30, 3L, "view"),
      // user 4: no signup → absent
      ev(10, 0, 4L, "view"),
      // user 5: simultaneous signup+view at t0 → tie satisfies order
      ev(11, 0, 5L, "signup"), ev(12, 0, 5L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0))
    val got = EventOps.funnel(df).collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), r.getLong(4))).toMap
    def us(off: Long) = Some(base + off * 1000000L)
    assert(got.keySet === Set(1L, 2L, 3L, 5L))
    assert(got(1L) === ((us(0), us(10), us(20), 3L)))
    assert(got(2L) === ((us(0), us(10), None, 2L)))
    assert(got(3L) === ((us(5), us(30), None, 2L)))
    assert(got(5L) === ((us(0), us(0), None, 2L)))
  }

  test("jsonStats extracts numeric props per event_type") {
    val df = Seq(
      (1L, "click", """{"k": 10}"""),
      (2L, "click", """{"k": 32}"""),
      (3L, "view", """{"k": 7}""")
    ).toDF("event_id", "event_type", "props")
    val out = EventOps.jsonStats(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("click") === ((2L, 42L, 21.0)))
    assert(out("view") === ((1L, 7L, 7.0)))
  }

  test("tolerantParse drops malformed lines and keeps exact sums") {
    val docs = Seq((1L, "alpha beta 7x")).toDF("doc_id", "text")
    val li = Seq(1.5, 2.25).toDF("l_quantity")
    val ord = Seq(101L).toDF("o_orderkey")
    val r = EventOps.tolerantParse(docs, li, ord).head()
    assert(r.getAs[Long]("n_lines") === 6L)
    assert(r.getAs[Long]("n_parsed") === 2L)
    assert(r.getAs[Long]("n_dropped") === 4L)
    assert(r.getAs[Double]("sum_parsed") === 3.75)
  }

  test("lmScore matches hand-computed ppm bigram probabilities") {
    import spark.implicits._
    // corpus bigram counts: "a b"→3, "b a"→1, "b c"→1; prefix counts:
    // a→3, b→2. p_ppm: "a b"=1000000, "b a"=500000, "b c"=500000.
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = TextStatsOps.lmScore(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // doc 1: bigrams (a b)x2, (b a)x1 → sum 2.5e6, avg 2500000 div 3
    assert(got(1L) === ((3L, 2500000L, 833333L)))
    // doc 2: (a b), (b c) → sum 1.5e6, avg 750000
    assert(got(2L) === ((2L, 1500000L, 750000L)))
    // 1-token doc has no bigram evidence
    assert(!got.contains(3L))
  }

  test("lmScore ranks natural text above shuffled text") {
    import spark.implicits._
    val nat = (1 to 20).map(i => (i.toLong, "the cat sat on the mat"))
    val shuf = Seq((100L, "mat the on sat cat the"))
    val got = TextStatsOps.lmScore((nat ++ shuf).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(1L) > got(100L))
  }
}
