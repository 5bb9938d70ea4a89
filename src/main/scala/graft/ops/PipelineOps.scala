package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the composition a user of this
  * library actually runs over a raw document corpus —
  *
  *   language-ID filter → quality threshold → exact dedup (keep first)
  *   → deterministic hash sample
  *
  * Every stage is one of the already-verified primitives; this operator
  * exists to prove they compose into one Catalyst plan (no staging, no
  * driver round-trips — the reference needed a chained MapReduce job per
  * stage). Output: the surviving documents with their audit columns.
  */
object PipelineOps {

  def curate(docs: DataFrame, minQuality: Double = 0.4,
             lang: String = "en", samplePct: Int = 50): DataFrame = {
    val stats = TextStatsOps.textStats(docs).select("doc_id", "quality")
    val pred = TextStatsOps.langId(docs).select("doc_id", "pred_lang")
    val kept = docs.select("doc_id", "text", "lang")
      .join(stats, "doc_id").join(pred, "doc_id")
      .filter(col("pred_lang") === lang && col("quality") >= minQuality)
    // exact dedup keeping the smallest doc_id per identical text
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    kept.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .filter(TextOps.hash60(concat(lit("cur-"), col("doc_id"))) % 100 < samplePct)
      .select(col("doc_id"), col("lang"), col("pred_lang"), col("quality"),
        length(col("text")).cast("long").as("n_chars_kept"))
  }
}
