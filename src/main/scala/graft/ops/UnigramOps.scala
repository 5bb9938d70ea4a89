package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer training — the OTHER
  * production tokenizer family beside BPE ([[BpeOps]]): instead of
  * greedily merging pairs, start from a substring piece inventory and
  * run fixed-round hard-EM (Kudo 2018's EM with Viterbi E-steps): each
  * round segments every vocab word optimally under the current piece
  * scores, then re-estimates scores from segmentation usage. Hard
  * (Viterbi) EM is the no-libm member of the family — the soft E-step's
  * forward-backward needs log-space float sums, while the Viterbi
  * objective here is fully integer and therefore DuckDB-oracle-exact.
  *
  * Objective (the no-libm discipline of q_lm_score): a segmentation is
  * scored lexicographically — FEWEST pieces first, then HIGHEST total
  * piece score (scores are ppm unigram probabilities, floor-division).
  * Encoded as one int64 key per DP state: key = n_pieces·10^8 − Σ sc
  * (Σ sc < 16·10^6 < 10^8, so the encoding is a true lexicographic
  * order), minimized. Ties across piece lengths break toward the
  * LONGER piece — fixed in both the DP fill and the backtrack, so the
  * chosen segmentation is deterministic and engine-portable.
  *
  * Contract caps (part of the tokenizer definition, identical in the
  * oracle): words are lowercase `^[a-z]+$` of length 2..[[MaxWordLen]];
  * pieces are substrings of length 1..[[MaxPieceLen]]; the seed
  * inventory keeps every single character plus the top [[SeedPieces]]
  * multi-char substrings by occurrence-weighted count. Single-character
  * pieces are NEVER pruned (the coverage floor: every in-alphabet word
  * stays segmentable), mirroring SentencePiece's required-character
  * set.
  *
  * Scale shape (the BpeOps discipline): the corpus is scanned once into
  * the compressed word-frequency vocab; every EM round runs on
  * |distinct words| rows. The Viterbi DP is ONE higher-order-function
  * expression per round (aggregate over ≤ MaxWordLen positions with a
  * per-word broadcast piece map of ≤ 4·MaxWordLen entries) — no driver
  * loop, no UDF, no shuffle beyond the piece-count aggregations.
  */
object UnigramOps {

  val MaxWordLen = 12
  val MaxPieceLen = 4
  val SeedPieces = 64
  val EmRounds = 2

  /** Unreachable/missing-piece key floor. Legit keys are < 16·10^8;
    * any path through a missing piece lands ≥ ~10^14, so reachability
    * is a magnitude test and min() never prefers a fake path when a
    * real one exists. Worst-case accumulated key ≤ MaxWordLen·(10^14 +
    * 10^8) ≈ 1.2·10^15 — far from int64 overflow even under ANSI.
    */
  private val Big = 100000000000000L

  /** OOV threshold for [[tokenizeWithPieces]]: a final DP key at or
    * above this means the word was not segmentable from the stored
    * pieces (some character missing). Legit keys stay < 16·10^8.
    */
  private val OovKey = 1000000000000L

  /** Compressed trainable vocab (w, f). */
  def wordFreq(docs: DataFrame): DataFrame =
    docs.select(explode(split(lower(col("text")), TextOps.WsRegex)).as("w"))
      .filter(col("w").rlike("^[a-z]+$") &&
        length(col("w")).between(2, MaxWordLen))
      .groupBy("w").agg(count(lit(1)).as("f"))

  /** All substring OCCURRENCES of each word, length 1..MaxPieceLen —
    * the piece-candidate multiset (weighted by f downstream).
    */
  private def occurrences(wf: DataFrame): DataFrame =
    wf.select(col("w"), col("f"), explode(expr(
      s"""flatten(transform(sequence(1, length(w)), s ->
            filter(transform(sequence(1, $MaxPieceLen), l ->
              if(s + l - 1 <= length(w), substring(w, s, l),
                 cast(null as string))),
              x -> x is not null)))""")).as("p"))

  /** Seed piece inventory with ppm scores: every single character plus
    * the top [[SeedPieces]] multi-char substrings by (occurrence-
    * weighted count desc, piece asc). Output (p, cnt, sc).
    */
  def seedPieces(wf: DataFrame): DataFrame = {
    val cnt = occurrences(wf).groupBy("p").agg(sum("f").as("cnt"))
    withPpm(cnt.filter(length(col("p")) === 1).unionByName(
      cnt.filter(length(col("p")) > 1)
        .orderBy(col("cnt").desc, col("p").asc).limit(SeedPieces)))
  }

  /** sc = cnt·10^6 div Σcnt — the ppm unigram probability, floored. */
  private def withPpm(kept: DataFrame): DataFrame =
    kept.crossJoin(broadcast(kept.agg(sum("cnt").as("t"))))
      .select(col("p"), col("cnt"), expr("cnt * 1000000 div t").as("sc"))

  /** One DP-fill candidate: extend the best prefix of length (j−l)
    * with the piece covering (j−l, j]. Missing piece ⇒ ≥ Big key.
    */
  private def cand(pos: String, l: Int): String =
    s"""if($pos >= $l,
          element_at(st, $pos - $l + 1) + 100000000L
            - coalesce(try_element_at(pm, substring(w, $pos - $l + 1, $l)),
                       ${-Big}L),
          9000000000000000L)"""

  /** `if(c4<=c3.., 4, ..)` — argmin over lengths with LONGER-piece
    * tie-break (the first candidate ≤ all others wins, evaluated
    * longest first), matching the oracle's `ORDER BY cand, l DESC`.
    */
  private def bestLen(pos: String): String = {
    def c(l: Int) = cand(pos, l)
    s"""if(${c(4)} <= ${c(3)} and ${c(4)} <= ${c(2)} and ${c(4)} <= ${c(1)}, 4,
        if(${c(3)} <= ${c(2)} and ${c(3)} <= ${c(1)}, 3,
        if(${c(2)} <= ${c(1)}, 2, 1)))"""
  }

  /** Forward Viterbi fill: st[j] (0-based j = prefix length) = minimal
    * key over the four extension lengths. st[0] = 0; unreached = Big.
    */
  private def dpExpr: String =
    s"""aggregate(
          sequence(1, length(w)),
          concat(array(0L), transform(sequence(1, length(w)), x -> ${Big}L)),
          (st, j) -> transform(st, (v, i) ->
            if(i = j, least(${cand("j", 4)}, ${cand("j", 3)},
                            ${cand("j", 2)}, ${cand("j", 1)}), v)))"""

  /** Backtrack: walk from pos = len choosing the argmin length each
    * step (ties to the longer piece — the dpExpr rule), emitting the
    * covering piece. At most len steps; finished words idle.
    */
  private def btExpr: String = {
    val bl = bestLen("acc.pos")
    s"""aggregate(
          sequence(1, length(w)),
          named_struct('pos', length(w),
                       'toks', cast(array() as array<string>)),
          (acc, z) -> if(acc.pos <= 0, acc,
            named_struct(
              'pos', acc.pos - $bl,
              'toks', concat(acc.toks,
                array(substring(w, acc.pos - $bl + 1, $bl))))),
          acc -> acc.toks)"""
  }

  /** Segment each distinct word of `words` (column w) against the
    * piece table (p, sc): per-word piece map (its own scored
    * substrings, ≤ 4·MaxWordLen entries) feeds the one-expression DP.
    * Output (w, key, toks); key ≥ [[OovKey]] marks unsegmentable.
    */
  /** Attach each distinct word's piece map (its own scored substrings
    * present in `pieces`, ≤ 4·MaxWordLen entries) as column `pm` —
    * the shared front half of the Viterbi and greedy segmenters.
    */
  private def withPieceMap(words: DataFrame,
                           pieces: DataFrame): DataFrame = {
    val subs = words.select(col("w"), explode(expr(
      s"""array_distinct(flatten(transform(sequence(1, length(w)), s ->
            filter(transform(sequence(1, $MaxPieceLen), l ->
              if(s + l - 1 <= length(w), substring(w, s, l),
                 cast(null as string))),
              x -> x is not null))))""")).as("p"))
    val pm = subs.join(pieces.select("p", "sc"), "p")
      .groupBy("w")
      .agg(map_from_entries(collect_set(struct(col("p"), col("sc"))))
        .as("pm"))
    words.join(pm, Seq("w"), "left")
      .withColumn("pm",
        coalesce(col("pm"), expr("cast(map() as map<string,bigint>)")))
  }

  private[graft] def segmentWords(words: DataFrame,
                           pieces: DataFrame): DataFrame = {
    withPieceMap(words, pieces)
      .withColumn("st", expr(dpExpr))
      .withColumn("toks", expr(btExpr))
      .select(col("w"),
        expr("element_at(st, length(w) + 1)").as("key"), col("toks"))
  }

  /** M-step: piece scores from segmentation usage — multi-char pieces
    * survive iff used (cnt ≥ 1); single chars ALWAYS survive (coverage
    * floor), with their observed usage (0 if the EM routed around
    * them). Scores re-normalized to ppm of the kept total.
    */
  private def usageCounts(seg: DataFrame, wf: DataFrame,
                          chars: DataFrame): DataFrame = {
    val usage = seg.join(wf, "w")
      .select(col("f"), explode(col("toks")).as("p"))
      .groupBy("p").agg(sum("f").as("cnt"))
    withPpm(usage.filter(length(col("p")) > 1).unionByName(
      chars.join(usage.filter(length(col("p")) === 1), Seq("p"), "left")
        .select(col("p"), coalesce(col("cnt"), lit(0L)).as("cnt"))))
  }

  /** [[EmRounds]] hard-EM rounds to the final piece table
    * (piece, n_used, sc_ppm) — the q_unigram_train surface.
    */
  def trainPieces(docs: DataFrame): DataFrame = {
    val wf = wordFreq(docs).localCheckpoint(true)
    var pieces = seedPieces(wf).localCheckpoint(true)
    val chars = pieces.filter(length(col("p")) === 1).select("p")
      .localCheckpoint(true)
    (1 to EmRounds).foreach { _ =>
      val seg = segmentWords(wf.select("w"), pieces)
      pieces = usageCounts(seg, wf, chars).localCheckpoint(true)
    }
    pieces.select(col("p").as("piece"), col("cnt").as("n_used"),
      col("sc").as("sc_ppm"))
  }

  /** Train and persist the piece table — the artifact half
    * ([[BpeOps.trainWriteVocab]] discipline): trained once per corpus
    * snapshot, every later tokenization reads the artifact.
    */
  def trainWritePieces(docs: DataFrame, path: String): Unit =
    trainPieces(docs).write.mode("overwrite").parquet(path + "/pieces")

  /** Tokenize against the PERSISTED pieces ([[trainWritePieces]]) —
    * apply without retraining: distinct words segment once against the
    * stored scores, instances join back by word. A word that cannot be
    * segmented from the stored pieces (a character outside the
    * training alphabet) falls back to character-level counting —
    * length(w) tokens — and increments n_oov, mirroring
    * [[BpeOps.tokenizeWithVocab]]'s fallback. Output (doc_id, n_words,
    * n_chars, n_tokens, n_oov).
    */
  def tokenizeWithPieces(docs: DataFrame, path: String): DataFrame = {
    val pieces = docs.sparkSession.read.parquet(path + "/pieces")
      .select(col("piece").as("p"), col("sc_ppm").as("sc"))
    val inst = docs.select(col("doc_id"),
        explode(split(lower(col("text")), TextOps.WsRegex)).as("w"))
      .filter(col("w").rlike("^[a-z]+$") &&
        length(col("w")).between(2, MaxWordLen))
    val seg = segmentWords(inst.select("w").distinct(), pieces)
      .select(col("w"), (col("key") >= OovKey).as("oov"), col("toks"))
    inst.join(seg, "w")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_words"),
        sum(length(col("w"))).cast("long").as("n_chars"),
        sum(when(col("oov"), length(col("w")).cast("long"))
          .otherwise(size(col("toks")).cast("long"))).as("n_tokens"),
        sum(when(col("oov"), 1L).otherwise(0L)).as("n_oov"))
  }

  /** Per-document unigram tokenize over the training corpus itself
    * (no OOV by construction) — the [[BpeOps.tokenizeTrained]] twin
    * feeding the cross-family comparison.
    */
  def tokenizeTrained(docs: DataFrame): DataFrame = {
    val pieces = trainPieces(docs)
      .select(col("piece").as("p"), col("sc_ppm").as("sc"))
    val inst = docs.select(col("doc_id"),
        explode(split(lower(col("text")), TextOps.WsRegex)).as("w"))
      .filter(col("w").rlike("^[a-z]+$") &&
        length(col("w")).between(2, MaxWordLen))
    inst.join(segmentWords(inst.select("w").distinct(), pieces), "w")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_words"),
        sum(length(col("w"))).cast("long").as("n_chars"),
        sum(size(col("toks")).cast("long")).as("n_tokens"))
  }

  /** BPE-vs-unigram FERTILITY comparison — the cross-family readout a
    * tokenizer bake-off produces: corpus-total words/tokens and
    * fertility (tokens per word, exact floor ppm) per family, one row
    * each. Both tokenizers run over the lowercase `^[a-z]+$` word
    * universe; the unigram side's MaxWordLen cap is part of its
    * contract (no fixture word exceeds it — at corpora where some do,
    * the universes diverge by exactly those words and the BPE row
    * counts them).
    */
  // ---- WordPiece-style greedy apply (longest-match-first) ----

  /** Greedy match length at `pos`: the LONGEST piece (≤ MaxPieceLen)
    * of the word's piece map starting there; 0 = nothing matches, i.e.
    * the character at `pos` is outside the piece alphabet (single
    * chars are never pruned, so an in-alphabet position always admits
    * at least l=1).
    */
  private def greedyLen(pos: String): String = {
    def ok(l: Int) =
      s"""($pos + $l - 1 <= length(w)
           and try_element_at(pm, substring(w, $pos, $l)) is not null)"""
    s"if(${ok(4)}, 4, if(${ok(3)}, 3, if(${ok(2)}, 2, if(${ok(1)}, 1, 0))))"
  }

  /** One left-to-right greedy pass as a single aggregate expression
    * (≤ MaxWordLen steps; finished or OOV-stuck words idle): state
    * (pos, n, oov) — the BERT WordPiece inference algorithm, O(len)
    * lookups per word vs Viterbi's O(len·P) DP.
    */
  private def greedyExpr: String = {
    val gl = greedyLen("acc.pos")
    s"""aggregate(
          sequence(1, length(w)),
          named_struct('pos', 1, 'n', cast(0 as bigint), 'oov', false),
          (acc, z) -> if(acc.oov or acc.pos > length(w), acc,
            if($gl = 0,
               named_struct('pos', acc.pos, 'n', acc.n, 'oov', true),
               named_struct('pos', cast(acc.pos + $gl as int),
                 'n', acc.n + 1L, 'oov', false))),
          acc -> named_struct('n', acc.n, 'oov', acc.oov))"""
  }

  /** Greedy-segment each distinct word against the piece table:
    * (w, n_greedy, oov). A word goes OOV iff some character is outside
    * the piece alphabet — the SAME condition under which the Viterbi
    * DP is unreachable (no trained piece can cover a missing char, and
    * greedy always advances on in-alphabet positions via l=1), so the
    * two segmenters agree on the OOV set by construction and differ
    * only in token counts.
    */
  private[graft] def greedySegment(words: DataFrame,
                                   pieces: DataFrame): DataFrame =
    withPieceMap(words, pieces)
      .withColumn("g", expr(greedyExpr))
      .select(col("w"), col("g.n").as("n_greedy"), col("g.oov").as("oov"))

  /** WORDPIECE-STYLE APPLY from the persisted pieces
    * ([[trainWritePieces]]) — the THIRD tokenizer-family
    * representative: BPE merges pairs, unigram-LM segments optimally
    * (Viterbi), WordPiece-at-inference matches greedily
    * longest-first. Same artifact, same OOV char-fallback contract as
    * [[tokenizeWithPieces]]; output (doc_id, n_words, n_chars,
    * n_tokens, n_oov).
    */
  def wordpieceWithPieces(docs: DataFrame, path: String): DataFrame = {
    val pieces = docs.sparkSession.read.parquet(path + "/pieces")
      .select(col("piece").as("p"), col("sc_ppm").as("sc"))
    val inst = docs.select(col("doc_id"),
        explode(split(lower(col("text")), TextOps.WsRegex)).as("w"))
      .filter(col("w").rlike("^[a-z]+$") &&
        length(col("w")).between(2, MaxWordLen))
    val seg = greedySegment(inst.select("w").distinct(), pieces)
    inst.join(seg, "w")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_words"),
        sum(length(col("w"))).cast("long").as("n_chars"),
        sum(when(col("oov"), length(col("w")).cast("long"))
          .otherwise(col("n_greedy"))).as("n_tokens"),
        sum(when(col("oov"), 1L).otherwise(0L)).as("n_oov"))
  }

  /** Greedy-vs-Viterbi fertility over the SAME pieces — the price of
    * O(len) inference: greedy can only use MORE pieces than the
    * optimal segmentation (per-word n_greedy ≥ n_viterbi, spec-pinned),
    * and the corpus-level excess in exact floor ppm is the readout a
    * tokenizer deployment weighs against the DP cost. Training corpus
    * universe (no OOV by construction).
    */
  def wordpieceCompare(docs: DataFrame): DataFrame = {
    val pieces = trainPieces(docs)
      .select(col("piece").as("p"), col("sc_ppm").as("sc"))
    val wf = wordFreq(docs)
    val dw = wf.select("w")
    val vit = segmentWords(dw, pieces)
      .select(col("w"), size(col("toks")).cast("long").as("n_vit"))
    val gr = greedySegment(dw, pieces)
    wf.join(vit, "w").join(gr, "w")
      .agg(sum("f").as("n_words"),
        sum(col("f") * col("n_greedy")).as("n_tok_greedy"),
        sum(col("f") * col("n_vit")).as("n_tok_viterbi"))
      .select(col("n_words"), col("n_tok_greedy"), col("n_tok_viterbi"),
        expr("(n_tok_greedy - n_tok_viterbi) * 1000000" +
          " div n_tok_viterbi").as("greedy_excess_ppm"))
  }

  def tokenizerCompare(docs: DataFrame, bpeMerges: Int): DataFrame = {
    def roll(tag: String, t: DataFrame) =
      t.agg(sum("n_words").as("n_words"), sum("n_tokens").as("n_tokens"))
        .select(lit(tag).as("tokenizer"), col("n_words"), col("n_tokens"),
          expr("n_tokens * 1000000 div n_words").as("fertility_ppm"))
    roll("bpe", BpeOps.tokenizeTrained(docs, bpeMerges))
      .unionByName(roll("unigram", tokenizeTrained(docs)))
  }
}
