package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the composition a user of this
  * library actually runs over a raw document corpus —
  *
  *   language-ID filter → quality threshold → repetition filter
  *   (Gopher duplicate-bigram) → exact dedup (keep first)
  *   → deterministic hash sample
  *
  * Every stage is one of the already-verified primitives; this operator
  * exists to prove they compose into one Catalyst plan (no staging, no
  * driver round-trips — the reference needed a chained MapReduce job per
  * stage). Output: the surviving documents with their audit columns.
  *
  * Repetition semantics: documents with fewer than two words have no
  * bigram row and are dropped by the repetition stage (too short to
  * curate — consistent with the quality gate's intent).
  */
object PipelineOps {

  def curate(docs: DataFrame, minQuality: Double = 0.4,
             lang: String = "en", samplePct: Int = 50,
             maxTopFrac: Double = 0.04): DataFrame = {
    val stats = TextStatsOps.textStats(docs).select("doc_id", "quality")
    val pred = TextStatsOps.langId(docs).select("doc_id", "pred_lang")
    val rep = TextStatsOps.repetitionStats(docs).select("doc_id", "top_frac")
    // The digest and kept-length are projected at the scan and the text
    // column dropped immediately: every exchange in this plan carries
    // (doc_id, 16-byte digest, small ints) — document bodies never
    // shuffle ("text never shuffles", DedupOps design rule). The earlier
    // formulation (row_number over a md5-partitioned window) moved every
    // surviving text through a digest-keyed exchange. The three audit
    // inputs (quality, pred_lang, top_frac) are all doc_id-keyed
    // aggregates, so their joins share one partitioning.
    val kept = docs.select(col("doc_id"), col("lang"),
        md5(col("text")).as("text_md5"),
        length(col("text")).cast("long").as("n_chars_kept"))
      .join(stats, "doc_id").join(pred, "doc_id").join(rep, "doc_id")
      .filter(col("pred_lang") === lang && col("quality") >= minQuality &&
        col("top_frac") <= maxTopFrac)
    // exact dedup keeping the smallest doc_id per identical text: keeper
    // ids via a digest-keyed aggregation (map-side partial min), joined
    // back on the SAME digest key — both join branches are the identical
    // kept-subplan partitioned by text_md5, so Catalyst reuses one
    // exchange (a doc_id-keyed semi-join would add a second shuffle).
    val keepers = kept.groupBy("text_md5").agg(min("doc_id").as("keep_id"))
    kept.join(keepers, "text_md5")
      .filter(col("doc_id") === col("keep_id"))
      .filter(TextOps.hash60(concat(lit("cur-"), col("doc_id"))) % 100 < samplePct)
      .select(col("doc_id"), col("lang"), col("pred_lang"), col("quality"),
        col("top_frac"), col("n_chars_kept"))
  }

  /** The crawl-to-curation composition — the full web-pipeline front
    * half fused onto [[curate]]: raw HTML pages are stripped to main
    * text ([[graft.ops.CurationOps.htmlExtract]], pure projection — it
    * fuses into each scan branch) and the extracted text becomes the
    * curation input, `lang` RIDING the projection (never a rejoin —
    * the first cut joined lang back by doc_id and doubled every scan
    * branch). Still ONE Catalyst plan from page bytes to curated
    * survivors, with exactly [[curate]]'s exchange count
    * (plan-asserted in PlanAuditSpec).
    */
  def crawlCurate(docs: DataFrame, minQuality: Double = 0.4,
                  lang: String = "en", samplePct: Int = 50,
                  maxTopFrac: Double = 0.04): DataFrame = {
    val extracted = CurationOps.htmlExtract(
        CurationOps.htmlWrap(docs, Seq("lang")), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("main_text").as("text"))
    curate(extracted, minQuality, lang, samplePct, maxTopFrac)
  }

  /** Funnel-attrition report over [[curate]] — the per-stage ledger a
    * pipeline owner reads before anything else ("which gate ate my
    * corpus?"): documents and chars surviving each prefix of the
    * curate chain (input → scored → lang → quality → repetition →
    * dedup-keeper → sample). [[curate]] emits survivors; this emits
    * the attrition BETWEEN stages, with the same gate predicates.
    *
    * Scale shape: the three audit inputs join LEFT (nothing drops
    * silently — un-scorable docs are stage-1 attrition, not absent
    * rows), every gate is a 0/1 indicator column, and the whole ladder
    * reduces in ONE map-side-combined aggregate to a single row that
    * `stack`s to 7 stage rows. The only additions over curate's plan
    * are the indicator arithmetic (codegen) and the digest-keyed
    * keeper join (both branches partition by text_md5 — curate's
    * exchange-reuse shape); no corpus re-scan per stage — the naive
    * formulation (one count() action per gate) runs the plan 7×.
    */
  def curateFunnel(docs: DataFrame, minQuality: Double = 0.4,
                   lang: String = "en", samplePct: Int = 50,
                   maxTopFrac: Double = 0.04): DataFrame = {
    val stats = TextStatsOps.textStats(docs).select("doc_id", "quality")
    val pred = TextStatsOps.langId(docs).select("doc_id", "pred_lang")
    val rep = TextStatsOps.repetitionStats(docs).select("doc_id", "top_frac")
    val base = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), md5(col("text")).as("text_md5"),
        length(col("text")).cast("long").as("n_chars"))
      .join(stats, Seq("doc_id"), "left")
      .join(pred, Seq("doc_id"), "left")
      .join(rep, Seq("doc_id"), "left")
      .withColumn("f1", (col("quality").isNotNull &&
        col("pred_lang").isNotNull && col("top_frac").isNotNull)
        .cast("long"))
      .withColumn("f2", (col("f1") === 1L &&
        col("pred_lang") === lang).cast("long"))
      .withColumn("f3", (col("f2") === 1L &&
        col("quality") >= minQuality).cast("long"))
      .withColumn("f4", (col("f3") === 1L &&
        col("top_frac") <= maxTopFrac).cast("long"))
    val keepers = base.filter(col("f4") === 1L)
      .groupBy("text_md5").agg(min("doc_id").as("keep_id"))
    val g = base.join(keepers, Seq("text_md5"), "left")
      .withColumn("f5", (col("f4") === 1L &&
        col("doc_id") === col("keep_id")).cast("long"))
      .withColumn("f6", (col("f5") === 1L &&
        TextOps.hash60(concat(lit("cur-"), col("doc_id"))) % 100 <
          samplePct).cast("long"))
    g.agg(
        count(lit(1)).as("c0"), sum("n_chars").as("h0"),
        sum("f1").as("c1"), sum(col("f1") * col("n_chars")).as("h1"),
        sum("f2").as("c2"), sum(col("f2") * col("n_chars")).as("h2"),
        sum("f3").as("c3"), sum(col("f3") * col("n_chars")).as("h3"),
        sum("f4").as("c4"), sum(col("f4") * col("n_chars")).as("h4"),
        sum("f5").as("c5"), sum(col("f5") * col("n_chars")).as("h5"),
        sum("f6").as("c6"), sum(col("f6") * col("n_chars")).as("h6"))
      .selectExpr(
        """stack(7,
             '00_input',      c0, h0,
             '01_scored',     c1, h1,
             '02_lang',       c2, h2,
             '03_quality',    c3, h3,
             '04_repetition', c4, h4,
             '05_dedup',      c5, h5,
             '06_sample',     c6, h6) AS (stage, n_docs, n_chars)""")
  }
}
