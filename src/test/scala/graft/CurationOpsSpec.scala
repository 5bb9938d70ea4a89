package graft

import org.apache.spark.sql.functions._
import graft.ops.{CurationOps, DedupOps}

class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("htmlExtract strips blocks with content, decodes entities in " +
      "order, collapses whitespace") {
    val pages = Seq(
      // script content (markup-looking) must vanish entirely
      (1L, "<p>keep</p><script>var s = \"<b>leak</b>\";</script><p>tail</p>"),
      // style with a literal '>' in a selector; case-insensitive tags
      (2L, "<STYLE>p > a { x }</STYLE><DIV>body text</DIV>"),
      // entity order: &amp;lt; single-decodes to "&lt;", never to "<"
      (3L, "<p>a &amp;lt; b &lt; c &amp; d&nbsp;e &#39;f&#39; &quot;g&quot;</p>"),
      // multi-line block spans (DOTALL) + whitespace collapse
      (4L, "<script>\nline1\nline2\n</script>  one \n\t two  "),
      // empty after extraction
      (5L, "<script>only code</script><style>only css</style>")
    ).toDF("doc_id", "html")
    val got = CurationOps.htmlExtract(pages).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === (("keep tail", 2L, 9L)))
    assert(got(2L) === (("body text", 2L, 9L)))
    assert(got(3L) === (("a &lt; b < c & d e 'f' \"g\"", 10L, 26L)))
    assert(got(4L) === (("one two", 2L, 7L)))
    assert(got(5L) === (("", 0L, 0L)))
  }

  test("htmlWrap + htmlExtract recovers the document text surrounded " +
      "by the fixed chrome") {
    val docs = Seq((7L, "alpha beta"), (8L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = CurationOps.htmlExtract(CurationOps.htmlWrap(docs)).collect()
    assert(out.length === 1) // null text dropped
    val main = out.head.getString(1)
    assert(main === "Doc 7 Home About Doc 7 alpha beta " +
      "tail & more text 'quoted' fin")
    // the planted script string must never leak
    assert(!main.contains("not text") && !main.contains("margin"))
  }

  test("urlNormalize: case, default ports, trailing slashes, tracking " +
      "params, and fragments canonicalize; real params keep order") {
    val urls = Seq(
      (1L, "HTTP://WWW.Example.COM:80/Path/?utm_source=x&b=2&a=1#frag"),
      (2L, "https://example.com:443/p"),
      (3L, "https://example.com:8443/p"),         // non-default port kept
      (4L, "http://example.com/"),                // bare slash collapses
      (5L, "http://example.com/CaseKept?fbclid=z&utm_medium=m"),
      (6L, "http://sub.www.example.com/x")        // only LEADING www. strips
    ).toDF("doc_id", "url")
    val got = CurationOps.urlNormalize(urls).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getString(3)))).toMap
    assert(got(1L) === (("http://www.example.com/Path?b=2&a=1",
      "example.com")))
    assert(got(2L) === (("https://example.com/p", "example.com")))
    assert(got(3L) === (("https://example.com:8443/p", "example.com")))
    assert(got(4L) === (("http://example.com", "example.com")))
    assert(got(5L) === (("http://example.com/CaseKept", "example.com")))
    assert(got(6L) === (("http://sub.www.example.com/x",
      "sub.www.example.com")))
  }

  test("domainStats: canonical collapse counts recrawls once") {
    val urls = Seq(
      (1L, "http://a.example.com/x?utm_source=1"),
      (2L, "HTTP://A.example.com/x#two"),        // same canonical as 1
      (3L, "http://a.example.com/y"),
      (4L, "https://b.example.com/x/")
    ).toDF("doc_id", "url")
    val got = CurationOps.domainStats(CurationOps.urlNormalize(urls))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("a.example.com") === ((3L, 2L, 2L)))
    assert(got("b.example.com") === ((1L, 1L, 1L)))
  }

  test("decontaminate flags docs sharing an 8-gram with the benchmark") {
    val bench = Seq((100L, "b1 b2 b3 b4 b5 b6 b7 b8")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "x b1 b2 b3 b4 b5 b6 b7 b8 y"), // contains the benchmark 8-gram
      (2L, "b1 b2 b3 b4 b5 b6 b7 other"),  // only 7 shared words in a row
      (3L, "totally unrelated words here today now see eight nine")
    ).toDF("doc_id", "text")
    val out = CurationOps.decontaminate(train, bench)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L))
    // The too-big-to-broadcast fallback joins the same result.
    val shuffled = CurationOps.decontaminate(train, bench,
      broadcastBench = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shuffled === out)
  }

  test("decontaminate counts distinct contaminated grams once") {
    val bench = Seq((100L, "a b c d e f g h i")).toDF("doc_id", "text") // 2 grams
    val train = Seq(
      // Contains both benchmark 8-grams, one of them twice.
      (1L, "a b c d e f g h i z a b c d e f g h")
    ).toDF("doc_id", "text")
    val out = CurationOps.decontaminate(train, bench).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
  }

  test("chunkOverlap emits stride-advanced windows with exact text md5s") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e"),     // 5 tokens: starts 0, 2, 4 at stride 2
      (1L, "x y"),           // shorter than one window: one chunk
      (2L, ""),              // empty: no chunks
      (3L, "  p   q  r ")    // whitespace runs collapse
    ).toDF("doc_id", "text")
    val got = CurationOps.chunkOverlap(docs, window = 3, stride = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got === Set(
      (0L, 0L, 0L, 3L, m("a b c")),
      (0L, 1L, 2L, 3L, m("c d e")),
      (0L, 2L, 4L, 1L, m("e")),
      (1L, 0L, 0L, 2L, m("x y")),
      (3L, 0L, 0L, 3L, m("p q r")),
      (3L, 1L, 2L, 1L, m("r"))))
    // overlap invariant: consecutive chunks share window - stride tokens
    val plan = CurationOps.chunkOverlap(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan) // map-only, no shuffle
  }

  test("invertedIndex caps postings but reports true df") {
    import spark.implicits._
    val docs = Seq(
      (3L, "b a"), (1L, "a a b"), (2L, "a c"), (4L, "")
    ).toDF("doc_id", "text")
    val got = CurationOps.invertedIndex(docs, cap = 2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    // 'a' occurs in docs 1,2,3 (distinct within doc); cap 2 keeps 1,2
    assert(got("a") === ((3L, "1,2")))
    assert(got("b") === ((2L, "1,3")))
    assert(got("c") === ((1L, "2")))
    assert(got.size === 3)
  }

  test("packLayout assigns contiguous windows from the token prefix sum") {
    val docs = Seq(
      (1L, "a b c"),    // n_tok 3, start 0
      (2L, "d e f g"),  // n_tok 4, start 3 — straddles windows 0 and 1
      (3L, "h"),        // n_tok 1, start 7
      (4L, "")          // n_tok 0, start 8 — pinned to its start window
    ).toDF("doc_id", "text")
    val out = CurationOps.packLayout(docs, budget = 5L).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out(1L) === ((3L, 0L, 0L, 0L, 1L)))
    assert(out(2L) === ((4L, 3L, 0L, 1L, 2L)))
    assert(out(3L) === ((1L, 7L, 1L, 1L, 1L)))
    assert(out(4L) === ((0L, 8L, 1L, 1L, 1L)))
  }

  test("packLayout bucketed prefix sum matches the single-bucket layout") {
    // Deterministic subset (limit() may pick a different 200 per plan).
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 200)
    val one = CurationOps.packLayout(docs, 64L, bucketSpan = 1L << 40)
      .collect().map(_.toSeq).toSet
    val many = CurationOps.packLayout(docs, 64L, bucketSpan = 16L)
      .collect().map(_.toSeq).toSet
    assert(one === many)
  }

  test("packLayout is stable under repartitioning") {
    val docs = Tables.documents(spark, sfDir)
    val a = CurationOps.packLayout(docs).collect().map(_.toSeq).toSet
    val b = CurationOps.packLayout(docs.repartition(7)).collect()
      .map(_.toSeq).toSet
    assert(a === b)
    // Offsets are dense: total span equals the token sum.
    val total = docs.select(sum(size(filter(split(col("text"), "\\s+"),
      x => x =!= "")).cast("long"))).head.getLong(0)
    val last = CurationOps.packLayout(docs)
      .select(max(col("start_off") + col("n_tok"))).head.getLong(0)
    assert(last === total)
  }

  test("vocabCoverage scores OOV fractions against the top-k vocab") {
    val docs = Seq(
      (1L, "a a a b b c"), // a:3 b:2 c:1 corpus-wide with doc 2
      (2L, "a b z"),       // z is rare
      (3L, "q r s t")      // fully OOV at vocabSize=2
    ).toDF("doc_id", "text")
    // counts: a=4 b=3 c=1 z=1 q=r=s=t=1 → vocab(2) = {a, b}
    val out = CurationOps.vocabCoverage(docs, vocabSize = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(1L) === ((6L, 5L, 1.0 / 6)))
    assert(out(2L) === ((3L, 2L, 1.0 / 3)))
    assert(out(3L) === ((4L, 0L, 1.0)))
  }

  test("vocabCoverage tie-break is deterministic (word ascending)") {
    val docs = Seq((1L, "b a"), (2L, "a b"), (3L, "c")).toDF("doc_id", "text")
    // a=2 b=2 c=1; vocabSize=1 must pick "a" (count tie, word asc).
    val out = CurationOps.vocabCoverage(docs, vocabSize = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 0L))
  }

  test("bm25TopK ranks the term-dense shorter document first") {
    import spark.implicits._
    // Same corpus-frequency term 'a': doc 1 is denser (3/4 tokens) than
    // doc 2 (1/4); doc 3 never matches. Higher tf and equal dl -> doc 1
    // must outrank doc 2; non-matching docs must not appear.
    val docs = Seq((1L, "a a a b"), (2L, "a b b b"), (3L, "c c c c"))
      .toDF("doc_id", "text")
    val got = CurationOps.bm25TopK(docs, Seq((7L, "a")), k = 10)
      .collect().sortBy(_.getLong(3))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(got.toSeq === Seq((7L, 1L, 1L), (7L, 2L, 2L)))
  }

  test("weightedSample keep set matches a driver-side replica") {
    val docs = (1L to 50L).map(i => (i, i * 40000L)).toDF("doc_id", "w")
    val got = CurationOps.weightedSample(docs, col("w"))
      .collect().map(_.getLong(0)).toSet
    val expect = (1L to 50L).filter { i =>
      DedupOps.hash60Local(s"wsamp-$i") % 1000000L <
        math.min(1000000L, i * 40000L)
    }.toSet
    assert(got === expect)
    assert(got.nonEmpty && got.size < 50) // caps and misses both exercised
    // Rows at/above the cap (w ≥ 10^6, i.e. id ≥ 25) are always kept.
    assert((25L to 50L).forall(got.contains))
  }

  test("mixResample thresholds match a driver-side replica") {
    val docs = Seq(
      (1L, "en"), (2L, "en"), (3L, "en"), (4L, "en"),
      (5L, "fr"), (6L, "fr")
    ).toDF("doc_id", "lang").withColumn("text", lit("t"))
    val pct = when(col("lang") === "en", 50).otherwise(100)
    val out = CurationOps.mixResample(docs, "lang", pct).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // thr_en = min(1e6, 50*6*10000/4) = 750000; thr_fr = capped 1e6 (all).
    def kept(ids: Seq[Long], thr: Long): Seq[Long] =
      ids.filter(id => DedupOps.hash60Local(s"mix-$id") % 1000000L < thr)
    val en = kept(Seq(1L, 2L, 3L, 4L), 750000L)
    assert(out("en") === ((4L, 750000L, en.size.toLong, en.sum)))
    assert(out("fr") === ((2L, 1000000L, 2L, 11L)))
  }

  test("assocRules: hand-computed support, confidence, and lift") {
    // 4 baskets; supDiv=2 → min_sup = 4 div 2 = 2.
    // item counts: a=3, b=2, c=2, d=1 (d infrequent → pruned pre-pair).
    // frequent pairs: (a,b) in baskets 1,2 → n_pair=2; (a,c) only in
    // basket 3 → below min_sup, dropped. Duplicate (1,a) collapses.
    val pairs = Seq(
      (1L, "a"), (1L, "a"), (1L, "b"), (1L, "d"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"),
      (4L, "c")
    ).toDF("basket", "item")
    val got = CurationOps.assocRules(pairs, "basket", "item", supDiv = 2L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6))))
      .toMap
    // conf(a→b) = 2/3, conf(b→a) = 2/2; lift = 2·4/(3·2) both ways.
    assert(got === Map(
      ("a", "b") -> ((2L, 3L, 2L, 2.0 / 3.0, 8.0 / 6.0)),
      ("b", "a") -> ((2L, 2L, 3L, 1.0, 8.0 / 6.0))))
  }

  test("assocRules: adversarial all-frequent mega-basket expansion is capped") {
    // 20 items, each frequent (appears in both baskets 1 and 2 → count 2
    // ≥ min_sup = 2 div 1 = 2). Basket 1 holds the whole catalog — with
    // maxBasketItems = 5 it expands to choose-2(5) = 10 pairs, not
    // choose-2(20) = 190. All item supports tie at 2, so the
    // deterministic (support desc, item asc) rank keeps i00..i04.
    val items = (0 until 20).map(i => f"i$i%02d")
    val pairs = (items.map(1L -> _) ++ items.map(2L -> _))
      .toDF("basket", "item")
    val got = CurationOps.assocRules(pairs, "basket", "item",
      supDiv = 1L, maxBasketItems = 5)
    // Both baskets truncate to the same top-5 → every kept pair occurs
    // in both baskets (n_pair=2); 10 unordered pairs → 20 directed rules.
    val rules = got.collect()
    assert(rules.length === 20)
    val kept = rules.map(_.getString(0)).toSet
    assert(kept === Set("i00", "i01", "i02", "i03", "i04"))
    assert(rules.forall(_.getLong(2) === 2L))
  }
}
