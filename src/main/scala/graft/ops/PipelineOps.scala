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
}
