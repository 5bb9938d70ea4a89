package graft

import org.apache.spark.sql.functions._
import graft.ops.BpeOps

class BpeOpsSpec extends SparkSpec {
  import spark.implicits._

  test("train: greedy left-to-right non-overlapping merge (the aaaa case)") {
    // Corpus of one word "aaaa" (f=1): round 1 elects (a,a) with count 3
    // (overlapping adjacencies all count — classic get_stats), and the
    // rewrite must produce |aa||aa| (4 → 2 symbols), NOT |aa||a||a|.
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val r1 = BpeOps.train(docs, 1).collect()
    assert(r1.length === 1)
    val row = r1.head
    assert(row.getLong(0) === 1L)
    assert(row.getString(1) === "|a||a|")
    assert(row.getLong(2) === 3L)
    assert(row.getLong(3) === 1L)      // vocab_words
    assert(row.getLong(4) === 2L)      // symbols_after: [aa, aa]
  }

  test("train: merged symbols pair in later rounds; frequency weighting holds") {
    // "ab ab cd" per doc over 3 docs: round 1 elects (a,b) count 6
    // (two "ab" words x 3 docs... vocab is DISTINCT words with freq:
    // ab f=6, cd f=3). Round 2: "ab" is now one symbol |ab|; remaining
    // pairs: (c,d) f=3 -> elected.
    val docs = (1L to 3L).map(i => (i, "ab ab cd")).toDF("doc_id", "text")
    val rows = BpeOps.train(docs, 2).collect().sortBy(_.getLong(0))
    assert(rows(0).getString(1) === "|a||b|")
    assert(rows(0).getLong(2) === 6L)
    assert(rows(1).getString(1) === "|c||d|")
    assert(rows(1).getLong(2) === 3L)
    // After round 2 every word is a single symbol: symbols_after = 9
    // word instances... vocab-weighted: f(ab)=6 + f(cd)=3 = 9 symbols.
    assert(rows(1).getLong(4) === 9L)
  }

  test("round 1 of the training loop IS the q_bpe_step election") {
    // Same corpus, same restriction (^[a-z]+$, len >= 2): the step
    // query's elected 2-char pair and count must equal round 1's —
    // the step's "ab" pair string is the train loop's "|a||b|" key.
    val docs = Tables.documents(spark, sfDir)
    val step = SparkEntry.queries("q_bpe_step")(spark, sfDir).collect().head
    val r1 = BpeOps.train(docs, 1).collect().head
    val stepPair = step.getString(0)
    assert(r1.getString(1) ===
      s"|${stepPair.charAt(0)}||${stepPair.charAt(1)}|")
    assert(r1.getLong(2) === step.getLong(1))
  }

  test("tokenizeTrained: per-doc token counts reflect the trained merges") {
    // Docs of "ab ab cd": after 2 merges (a,b) and (c,d) every word is
    // one token — n_tokens = n_words, n_chars = 2 per word.
    val docs = (1L to 3L).map(i => (i, "ab ab cd")).toDF("doc_id", "text")
    val got = BpeOps.tokenizeTrained(docs, 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    for (i <- 1L to 3L) assert(got(i) === ((3L, 6L, 3L)))
    // With only 1 merge (a,b), "cd" stays 2 tokens: 1+1+2 = 4.
    val one = BpeOps.tokenizeTrained(docs, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    for (i <- 1L to 3L) assert(one(i) === 4L)
    // Corpus-wide: tokens never exceed chars and never undercut words.
    val real = BpeOps.tokenizeTrained(Tables.documents(spark, sfDir), 5)
      .collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2) && r.getLong(3) >= r.getLong(1))
    }
  }

  test("tokenizeWithVocab over the persisted artifact equals the " +
      "inline-trained apply; OOV words char-fallback and are counted") {
    val docs = Tables.documents(spark, sfDir)
    val path = java.nio.file.Files
      .createTempDirectory("graft_bpe_vocab_spec").toString
    BpeOps.trainWriteVocab(docs, 5, path)
    // apply ≡ inline train on the SAME corpus: identical totals, no OOV
    val applied = BpeOps.tokenizeWithVocab(docs, path).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val inline = BpeOps.tokenizeTrained(docs, 5).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(applied.keySet === inline.keySet)
    applied.foreach { case (id, (w, c, t, oov)) =>
      assert((w, c, t) === inline(id), s"doc $id")
      assert(oov === 0L, s"doc $id")
    }
    // OOV fallback: an unseen word tokenizes char-level (length(w)
    // tokens) and is counted; trained words still use their merges.
    val oovDocs = Seq((9000L, "ab qqqzzz")).toDF("doc_id", "text")
    val tinyPath = java.nio.file.Files
      .createTempDirectory("graft_bpe_vocab_spec2").toString
    BpeOps.trainWriteVocab(
      (1L to 3L).map(i => (i, "ab ab cd")).toDF("doc_id", "text"),
      2, tinyPath)
    val Array(row) = BpeOps.tokenizeWithVocab(oovDocs, tinyPath).collect()
    // "ab" → 1 merged token; "qqqzzz" → 6 char tokens, 1 OOV word.
    assert((row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
      === ((2L, 8L, 7L, 1L)))
    // The apply plan reads ONLY the persisted artifact — no retraining:
    // with in-memory docs, every file scan must hit the vocab path.
    val memDocs = Seq((1L, "ab cd")).toDF("doc_id", "text")
      .localCheckpoint(true)
    val plan = BpeOps.tokenizeWithVocab(memDocs, tinyPath)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.filter(_.contains("FileScan")).toSeq
    assert(scans.nonEmpty)
    scans.foreach(s => assert(s.contains("graft_bpe_vocab_spec2"),
      s"non-artifact file scan in plan: $s"))
  }

  test("symbols_after decreases monotonically across merge rounds") {
    val docs = Tables.documents(spark, sfDir)
    val rows = BpeOps.train(docs, 5).collect().sortBy(_.getLong(0))
    assert(rows.length === 5)
    val totals = rows.map(_.getLong(4))
    totals.sliding(2).foreach { case Array(a, b) => assert(b < a) }
    // Each round's elected count is positive and the election is
    // deterministic: re-running yields the identical merge table.
    assert(rows.forall(_.getLong(2) > 0L))
    val again = BpeOps.train(docs, 5).collect().sortBy(_.getLong(0))
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }
}
