package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines (north-star tier
  * beyond the reference surface — BASELINE.json): exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard near-dup detection over a document corpus.
  *
  * Design rules, all aimed at 100 TB:
  *  - Everything is relational (joins + groupBy on document/shingle keys) —
  *    no collect, no cross join. Candidate generation is always *bucketed*
  *    (LSH bands / simhash byte-bands / inverted shingle index), so the
  *    pair space is linear-ish in data size, never O(n²).
  *  - All hashes are the portable md5-prefix `TextOps.hash60`, so the
  *    DuckDB oracle recomputes identical signatures — and results are
  *    bit-identical across partition layouts (integer math only; the only
  *    doubles are final exact-dyadic divisions).
  */
object DedupOps {

  /** MinHash modulus: the Mersenne prime 2^31-1. */
  val P: Long = 2147483647L

  /** Signature length (k) and LSH banding shape (4 bands × 4 rows). */
  val K = 16
  val Bands = 4
  val RowsPerBand = 4

  /** Deterministic portable hash of a string → nonnegative Long (< 2^60):
    * same formula as `TextOps.hash60`, computed driver-side for constants.
    */
  def hash60Local(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Universal-hash coefficients (i, a, b, band, w31): h_i(x) = (a·x+b) mod P.
    * Derived from the portable hash, not an RNG — the oracle SQL embeds the
    * same literals. w31 = 31^(i mod rows) is the in-band polynomial weight
    * used to fold a band's signature rows into one int64 band key.
    */
  val MinhashCoef: IndexedSeq[(Int, Long, Long, Int, Long)] =
    (0 until K).map { i =>
      val a = hash60Local(s"mh-a-$i") % (P - 1) + 1
      val b = hash60Local(s"mh-b-$i") % P
      val w31 = math.pow(31, i % RowsPerBand).toLong
      (i, a, b, i / RowsPerBand, w31)
    }

  /** Near-dup test corpus derived deterministically from `documents`:
    * original ∪ exact copy (id+1_000_000) ∪ near copy (id+2_000_000, first
    * token dropped). The fixture corpus is all-distinct; this gives the
    * dedup operators real duplicates to find, reproducibly in both engines.
    */
  def dupCorpus(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"))
    base
      .union(base.select(col("doc_id") + 1000000L, col("text")))
      .union(base.select(col("doc_id") + 2000000L,
        regexp_replace(col("text"), "^\\S+\\s*", "").as("text")))
  }

  /** Exact dedup: group identical texts by md5, keep the smallest doc_id.
    * Returns only groups with duplicates. One hash-shuffle on the digest —
    * the canonical 100 TB exact-dedup plan (shuffle carries (digest, id),
    * never the text).
    */
  def exactDedup(corpus: DataFrame): DataFrame =
    corpus.groupBy(md5(col("text")).as("text_md5"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("dup_cnt"))
      .filter(col("dup_cnt") >= 2)

  /** Distinct word 3-shingles per document: (doc_id, sh). */
  def shingles3(corpus: DataFrame): DataFrame = {
    val w = filter(split(col("text"), "\\s+"), x => x =!= "")
    val sh = when(size(w) >= 3,
      transform(sequence(lit(1), size(w) - 2), j =>
        concat(element_at(w, j), lit(" "),
          element_at(w, j + 1), lit(" "), element_at(w, j + 2))))
      .otherwise(array().cast("array<string>"))
    corpus.select(col("doc_id"), explode(sh).as("sh")).distinct()
  }

  /** MinHash signature rows (doc_id, i, m): m = min over shingles of
    * (a_i·h31(sh)+b_i) mod P. Fully relational: shingle rows × broadcast
    * coefficient table → min-aggregate keyed on (doc_id, i).
    */
  def minhashSignatures(corpus: DataFrame): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val coef = broadcast(
      MinhashCoef.map { case (i, a, b, _, _) => (i, a, b) }.toDF("i", "a", "b"))
    shingles3(corpus)
      .withColumn("h", TextOps.hash60(col("sh")) % P)
      .join(coef)
      .groupBy("doc_id", "i")
      .agg(min((col("a") * col("h") + col("b")) % P).as("m"))
  }

  /** MinHash LSH near-dup pairs: band the signature (4 bands × 4 rows,
    * in-band rows folded to one int64 key by the 31-polynomial), bucket-join
    * on (band, key), then estimate Jaccard as the fraction of matching
    * signature positions. Output: (doc_a, doc_b, est_jaccard) with
    * est ≥ minEst. No O(n²) stage: candidates come only from band buckets.
    */
  def minhashPairs(corpus: DataFrame, minEst: Double = 0.5): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sig = minhashSignatures(corpus)
    val bandsDf = broadcast(
      MinhashCoef.map { case (i, _, _, band, w31) => (i, band, w31) }
        .toDF("i", "band", "w31"))
    val bk = sig.join(bandsDf, "i")
      .groupBy("doc_id", "band")
      .agg(sum(col("m") * col("w31")).as("bk"))
    val cand = bk.as("x").join(bk.as("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val sa = sig.select(col("doc_id").as("doc_a"), col("i"), col("m").as("ma"))
    val sb = sig.select(col("doc_id").as("doc_b"), col("i"), col("m").as("mb"))
    cand.join(sa, "doc_a").join(sb, Seq("doc_b", "i"))
      .groupBy("doc_a", "doc_b")
      .agg((sum(when(col("ma") === col("mb"), 1).otherwise(0)) / K.toDouble)
        .as("est_jaccard"))
      .filter(col("est_jaccard") >= minEst)
  }

  /** SimHash bits: 32, banded as 4 bytes for candidate generation. By
    * pigeonhole the byte-bands are exhaustive for Hamming distance ≤ 3;
    * above that they are the standard high-recall heuristic. Deterministic
    * either way, so the oracle (same banding) agrees by construction.
    */
  val SimhashBits = 32

  /** 32-bit SimHash per doc over term-frequency-weighted tokens:
    * bit_i = [ Σ_tokens cnt·(2·bit_i(h60(token))−1) > 0 ].
    * Bit extraction is nonneg floor-div ((h div 2^i) mod 2), identical in
    * DuckDB. Returns (doc_id, simhash).
    */
  def simhash(corpus: DataFrame): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val toks = corpus
      .select(col("doc_id"),
        explode(filter(split(col("text"), "\\s+"), x => x =!= "")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
      .withColumn("h", TextOps.hash60(col("w")))
    val bits = broadcast(
      (0 until SimhashBits).map(i => (i, 1L << i)).toDF("i", "p2"))
    toks.join(bits)
      .groupBy("doc_id", "i", "p2")
      // (h div p2) is integer division — `/` would be double division and
      // silently lose bits beyond 2^53 on the 60-bit hash.
      .agg(sum(col("cnt") * (expr("(h div p2) % 2") * 2 - 1)).as("s"))
      .groupBy("doc_id")
      .agg(sum(when(col("s") > 0, col("p2")).otherwise(0L)).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, candidates
    * bucketed by the 4 simhash bytes. Output (doc_a, doc_b, hamming).
    */
  def simhashPairs(corpus: DataFrame, maxHamming: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sh = simhash(corpus)
    val bytes = broadcast(
      (0 until 4).map(j => (j, 1L << (8 * j))).toDF("j", "d"))
    val bands = sh.join(bytes)
      .select(col("doc_id"), col("simhash"), col("j"),
        expr("(simhash div d) % 256").as("key"))
    bands.as("x").join(bands.as("y"),
        col("x.j") === col("y.j") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
          .cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram (word bigram) Jaccard over an inverted shingle index.
    * Ultra-common shingles (document frequency > maxDf) are dropped before
    * pairing — the standard skew guard that keeps the inverted index from
    * exploding on stop-phrases at 100 TB; similarity is then defined over
    * the rare-shingle space (a pair with no rare shingles yields no row).
    * Output: (doc_a, doc_b, inter, jacc) with jacc ≥ minJaccard.
    */
  def ngramJaccardPairs(corpus: DataFrame, maxDf: Int = 100,
                        minJaccard: Double = 0.6): DataFrame = {
    val w = filter(split(col("text"), "\\s+"), x => x =!= "")
    val sh2 = when(size(w) >= 2,
      transform(sequence(lit(1), size(w) - 1), j =>
        concat(element_at(w, j), lit(" "), element_at(w, j + 1))))
      .otherwise(array().cast("array<string>"))
    val s = corpus.select(col("doc_id"), explode(sh2).as("sh")).distinct()
    val rare = s.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("sh")
    val sr = s.join(rare, "sh")
    val sizes = sr.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sr.as("x").join(sr.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("inter"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("jacc"))
      .filter(col("jacc") >= minJaccard)
  }
}
