package graft

import org.apache.spark.sql.functions._
import graft.functions.{ArrayDotProduct, MinHashAgg}
import graft.ops.{DedupOps, SimilarityOps, TextOps}

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("ArrayDotProduct matches the zip_with fold on fixture embeddings") {
    val v = SimilarityOps.withQuant(Tables.embeddings(spark, sfDir))
    val diff = v.select(
        ArrayDotProduct(col("qv"), col("qv")).as("native"),
        SimilarityOps.dotLFold(col("qv"), col("qv")).as("fold"))
      .filter(col("native") =!= col("fold"))
    assert(diff.count() === 0)
  }

  test("ArrayDotProduct basic values and null propagation") {
    val df = Seq(
      (Some(Seq(1L, 2L, 3L)), Some(Seq(4L, 5L, 6L))),
      (Some(Seq(2L, 2L)), Some(Seq(3L, 3L, 99L))), // overlap only
      (None, Some(Seq(1L)))
    ).toDF("a", "b")
    val out = df.select(ArrayDotProduct(col("a"), col("b"))).collect()
    assert(out(0).getLong(0) === 32L)
    assert(out(1).getLong(0) === 12L)
    assert(out(2).isNullAt(0))
  }

  test("ArrayDotProduct participates in whole-stage codegen") {
    val v = SimilarityOps.withQuant(Tables.embeddings(spark, sfDir))
      .select(ArrayDotProduct(col("qv"), col("qv")).as("d"))
    val plan = v.queryExecution.executedPlan.toString
    // '*(n)' marks operators inside a WholeStageCodegen stage.
    assert(plan.split("\n").exists(l => l.contains("array_dot_l") && l.contains("*(")))
    assert(v.agg(min("d")).head().getLong(0) >= 0L)
  }

  test("array_dot_l and hash60 are callable from SQL after registration") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT array_dot_l(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
    assert(r.head().getLong(0) === 32L)
    val h = spark.sql("SELECT hash60('mh-a-0') AS h")
    assert(h.head().getLong(0) === graft.ops.DedupOps.hash60Local("mh-a-0"))
    // extension hook applies cleanly to a fresh extensions container
    new graft.functions.GraftExtensions()
      .apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("native Hash60Expr equals the built-in md5 composition") {
    val docs = Tables.documents(spark, sfDir)
    val toks = docs.select(explode(split(col("text"), "\\s+")).as("w"))
      .union(Seq("", "é¿ unicode", "x").toDF("w")) // incl. empty + multibyte
    val diff = toks.select(
        TextOps.hash60(col("w")).as("native"),
        TextOps.hash60Builtin(col("w")).as("builtin"))
      .filter(col("native") =!= col("builtin"))
    assert(diff.count() === 0)
    // driver-side constant derivation agrees too
    assert(spark.range(1).select(TextOps.hash60(lit("mh-a-0"))).head().getLong(0)
      === graft.ops.DedupOps.hash60Local("mh-a-0"))
  }

  test("kgram_hash60 is callable from SQL after registration") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT kgram_hash60('a b c', 2) AS hs").head.getSeq[Long](0)
    assert(r.length === 2)
    assert(r(0) === DedupOps.hash60Local("a b"))
    assert(r(1) === DedupOps.hash60Local("b c"))
  }

  test("KGramHash60 equals the shingleArr+hash60 composition, all edge shapes") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "  leading and   multiple   spaces  ",
      "tabs\tand\nnewlines\rmixed\fwhitespacehere ok",
      "one",
      "two words",
      "",
      "   ",
      "unicode tökens żółć 中文 mixed in stream",
      "a b c d e f g h i j k l m n o p"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for (k <- Seq(1, 2, 3, 8)) {
      val diff = docs.select(
          graft.functions.KGramHash60(col("text"), k).as("native"),
          transform(DedupOps.shingleArr(col("text"), k),
            g => TextOps.hash60(g)).as("composed"))
        .filter(not(col("native") <=> col("composed")))
      assert(diff.count() === 0, s"k=$k mismatch")
    }
  }

  test("CharGramHash60 equals the substring+hash60 composition, all edge shapes") {
    val docs = Seq(
      "the quick brown fox",
      "short",
      "exactly8",
      "sevench",
      "",
      "   spaces count as chars   ",
      "unicode żółć 中文 mixed",
      "astral 😀 pair 𝕏 inside", // 4-byte UTF-8 code points
      "tabs\tand\nnewlines kept verbatim"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for (k <- Seq(1, 3, 8)) {
      val diff = docs.select(
          graft.functions.CharGramHash60(col("text"), k).as("native"),
          when(length(col("text")) >= k,
            transform(sequence(lit(1), length(col("text")) - (k - 1)),
              j => TextOps.hash60(expr("text").substr(j, lit(k)))))
            .otherwise(array().cast("array<bigint>")).as("composed"))
        .filter(not(col("native") <=> col("composed")))
      assert(diff.count() === 0, s"k=$k mismatch")
    }
  }

  test("CharGramHash60 null propagation and sub-k emptiness") {
    val df = Seq(Some("abcdefgh"), Some("abc"), None).toDF("text")
    val out = df.select(graft.functions.CharGramHash60(col("text"), 8)).collect()
    assert(out(0).getSeq[Long](0).length === 1)
    assert(out(1).getSeq[Long](0).isEmpty)
    assert(out(2).isNullAt(0))
  }

  test("KGramHash60 null propagation and codegen participation") {
    val df = Seq(Some("a b c"), None).toDF("text")
    val out = df.select(graft.functions.KGramHash60(col("text"), 2)).collect()
    assert(out(0).getSeq[Long](0).length === 2)
    assert(out(1).isNullAt(0))
    // Codegen participation needs a non-local scan (LocalTableScan folds
    // the projection eagerly with no codegen stage to inspect).
    val plan = Tables.documents(spark, sfDir)
      .select(graft.functions.KGramHash60(col("text"), 2))
      .queryExecution.executedPlan.toString
    // The "*(n)" prefix marks operators fused into a WholeStageCodegen
    // stage in the compact tree rendering (stage number unpinned).
    assert(plan.contains("kgram_hash60") && plan.contains("*("), plan)
  }

  test("MinHashAgg UDAF equals the expression-path signature") {
    val corpus = DedupOps.dupCorpus(Tables.documents(spark, sfDir))
    val hashed = DedupOps.shingles3(corpus)
      .withColumn("h", TextOps.hash60(col("sh")) % DedupOps.P)
    val viaUdaf = hashed.groupBy("doc_id")
      .agg(MinHashAgg.minhashSig(col("h")).as("ms"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val viaExpr = DedupOps.minhashSigArr(corpus)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(viaUdaf === viaExpr)
  }

  test("MinHashAgg merge is order-independent (partial-agg safe)") {
    val agg = new MinHashAgg
    val hs = Seq(5L, 999999L, 42L, 7777777L)
    val all = hs.foldLeft(agg.zero)(agg.reduce)
    val (l, r) = hs.splitAt(2)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(all.toSeq === merged.toSeq)
  }

  test("SimHashAgg equals the 60-expression bit-sum twin on the fixture") {
    val corpus = graft.ops.DedupOps.dupCorpus(Tables.documents(spark, sfDir))
    val fast = graft.ops.DedupOps.simhash(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val twin = graft.ops.DedupOps.simhashExprTwin(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === twin)
    assert(fast.nonEmpty)
  }

  test("SimHashAgg merge is order-independent (partial-agg safe)") {
    val agg = new graft.functions.SimHashAgg
    val ins = Seq((0xF0F0F0F0F0L, 3L), (0x0F0F0F0F0FL, 2L), (123456789L, 1L))
    val all = ins.foldLeft(agg.zero)(agg.reduce)
    val (l, r) = ins.splitAt(1)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(all.toSeq === merged.toSeq)
    // ties (counter == 0) leave the bit clear
    val tie = agg.merge(
      agg.reduce(agg.zero, (1L, 1L)), agg.reduce(agg.zero, (0L, 1L)))
    assert(agg.finish(tie) === 0L)
  }

  test("CmsAgg: estimates upper-bound exact counts; merge is order-independent") {
    import graft.functions.CmsAgg
    val agg = new CmsAgg
    val keys = (0L until 500L).flatMap(k => Seq.fill((k % 7).toInt + 1)(k))
    val grid = keys.foldLeft(agg.zero)(agg.reduce)
    def est(k: Long): Long = (0 until CmsAgg.Depth)
      .map(d => grid(d * CmsAgg.Width + CmsAgg.cell(d, k))).min
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong)
    // CMS never under-counts — collisions only add.
    exact.foreach { case (k, n) => assert(est(k) >= n, s"key $k") }
    // Order-independence: any split + merge gives the same grid.
    val (a, b) = scala.util.Random.shuffle(keys).splitAt(keys.size / 3)
    val merged = agg.merge(
      a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
    assert(merged.toSeq === grid.toSeq)
  }

  test("CmsAgg cell matches the hash60 SQL expression (cross-engine contract)") {
    import graft.functions.CmsAgg
    // The UDAF's Scala-side hash must equal the hash60 Catalyst
    // expression over the same "cms<d>-<key>" string — the contract the
    // DuckDB oracle grid relies on.
    val df = spark.range(0, 100).select(col("id"))
    val got = df.select(col("id"),
      pmod(graft.ops.TextOps.hash60(concat(lit("cms2-"),
        col("id").cast("string"))), lit(CmsAgg.Width)).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 100L).foreach { k =>
      assert(got(k) === CmsAgg.cell(2, k).toLong, s"key $k")
    }
  }

  test("UnicodeNorm: NFC composes, stripAccents drops marks, ASCII is identity") {
    import graft.functions.{NfcNormalizeExpr, StripAccentsExpr}
    val df = Seq(
      ("cafe\u0301", "caf\u00e9", "cafe"),   // decomposed -> composed -> stripped
      ("nai\u0308ve", "na\u00efve", "naive"),
      ("plain ascii", "plain ascii", "plain ascii"),
      ("\u00e9\u0301", "\u00e9\u0301", "e")  // composed e-acute + extra acute: NFC keeps, strip drops both marks
    ).toDF("raw", "want_nfc", "want_stripped")
    val got = df.select(
      NfcNormalizeExpr(col("raw")).as("nfc"),
      StripAccentsExpr(col("raw")).as("stripped"),
      col("want_nfc"), col("want_stripped")).collect()
    got.foreach { r =>
      assert(r.getString(0) === r.getString(2))
      assert(r.getString(1) === r.getString(3))
    }
    // Null propagation.
    val n = Seq(Option.empty[String]).toDF("raw")
      .select(NfcNormalizeExpr(col("raw")), StripAccentsExpr(col("raw")))
      .collect()(0)
    assert(n.isNullAt(0) && n.isNullAt(1))
  }

  test("nfc_normalize and strip_accents are callable from SQL") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT nfc_normalize('cafe\u0301') AS a, strip_accents('cafe\u0301') AS b")
      .collect()(0)
    assert(r.getString(0) === "caf\u00e9")
    assert(r.getString(1) === "cafe")
  }

  test("UnicodeNorm passes non-BMP text (surrogate pairs) through intact") {
    import graft.functions.{NfcNormalizeExpr, StripAccentsExpr}
    // Emoji + Gothic letter live outside the BMP (UTF-16 surrogate
    // pairs); neither transform may mangle them, and combining marks
    // AFTER a non-BMP base must still strip without corrupting the pair.
    val emoji = new String(Character.toChars(0x1F600))
    val gothic = new String(Character.toChars(0x10330))
    val mixed = emoji + "e\u0301" + gothic
    val got = Seq((emoji, gothic, mixed)).toDF("a", "b", "m")
      .select(NfcNormalizeExpr(col("a")), StripAccentsExpr(col("a")),
        NfcNormalizeExpr(col("b")), StripAccentsExpr(col("b")),
        NfcNormalizeExpr(col("m")), StripAccentsExpr(col("m")))
      .collect()(0)
    assert(got.getString(0) === emoji)
    assert(got.getString(1) === emoji)
    assert(got.getString(2) === gothic)
    assert(got.getString(3) === gothic)
    assert(got.getString(4) === emoji + "\u00e9" + gothic)
    assert(got.getString(5) === emoji + "e" + gothic)
  }
}
