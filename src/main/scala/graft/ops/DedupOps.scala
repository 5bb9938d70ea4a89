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

  /** Incremental exact dedup — the ingestion-time variant: drop incoming
    * documents whose text digest already exists in the known corpus.
    * One digest-keyed anti join; at 100 TB the known side is a compact
    * (digest) table — text never ships, and the join shuffles 16-byte
    * digests only. Returns the surviving incoming rows.
    *
    * NULL text is dropped on BOTH sides up front: a NULL digest never
    * matches an anti-join key (every NULL row would "survive"), and SQL
    * NOT-IN oracles treat it as no-row — filtering explicitly keeps the
    * semantics well-defined and engine-identical.
    */
  def dedupAgainst(incoming: DataFrame, known: DataFrame): DataFrame = {
    val knownDigests = known.filter(col("text").isNotNull)
      .select(md5(col("text")).as("text_md5")).distinct()
    incoming.filter(col("text").isNotNull)
      .withColumn("text_md5", md5(col("text")))
      .join(knownDigests, Seq("text_md5"), "left_anti")
      .drop("text_md5")
  }

  /** k-word shingle array from a text column, built with zip_with over
    * pre-sliced arrays so every lambda body references ONLY its lambda
    * variables. Spark re-evaluates captured outer expressions inside a
    * higher-order-function lambda once PER ELEMENT (no subexpression
    * cache), so the naive `transform(sequence(…), j → element_at(w, j)…)`
    * formulation re-ran the regex split ~3× per shingle — 10× slower.
    * zip_with's null padding marks the short tail; the final filter drops
    * it, leaving exactly max(n-k+1, 0) shingles.
    */
  def shingleArr(textCol: Column, k: Int): Column = {
    val w = filter(split(textCol, TextOps.WsRegex), x => x =!= "")
    val joined = (2 to k).foldLeft(w) { (acc, i) =>
      zip_with(acc, slice(w, lit(i), size(w)), (x, y) => concat(x, lit(" "), y))
    }
    filter(joined, x => x.isNotNull)
  }

  /** Distinct word 3-shingles per document: (doc_id, sh). */
  def shingles3(corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id"), explode(shingleArr(col("text"), 3)).as("sh"))
      .distinct()

  /** MinHash signature rows (doc_id, i, m) — row layout kept for tests;
    * the query path uses the array form below.
    */
  def minhashSignatures(corpus: DataFrame): DataFrame =
    minhashSigArr(corpus).select(col("doc_id"),
      posexplode(col("ms")).as(Seq("i", "m")))

  /** MinHash signature per doc as ONE aggregation: the k min-hashes are k
    * generated agg expressions with literal coefficients (whole-stage
    * codegen, map-side partial agg), so the whole signature build is a
    * single shuffle keyed on doc_id — the 100 TB shape. Output
    * (doc_id, ms: array<long>[k], bk0..bk3: int64 band keys).
    */
  def minhashSigArr(corpus: DataFrame): DataFrame = {
    // No distinct(): min-aggregation is duplicate-insensitive, so repeated
    // shingles cannot change any signature value — and skipping the
    // per-shingle dedup removes an entire string-keyed shuffle. Shingle
    // hashes come from the native KGramHash60 (bit-identical to the
    // shingleArr+hash60 composition, no gram strings materialized).
    val sh = corpus.select(col("doc_id"),
        explode(graft.functions.KGramHash60(col("text"), 3)).as("sh"))
      .withColumn("h", col("sh") % P)
    val aggs = MinhashCoef.map { case (i, a, b, _, _) =>
      min((lit(a) * col("h") + lit(b)) % P).as(s"m$i")
    }
    val bandKeys = (0 until Bands).map { j =>
      (0 until RowsPerBand).map { r =>
        val (_, _, _, _, w31) = MinhashCoef(j * RowsPerBand + r)
        col(s"m${j * RowsPerBand + r}") * lit(w31)
      }.reduce(_ + _).as(s"bk$j")
    }
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id") +:
        array((0 until K).map(i => col(s"m$i")): _*).as("ms") +: bandKeys: _*)
  }

  /** MinHash LSH near-dup pairs: band the signature (4 bands × 4 rows,
    * in-band rows folded to one int64 key by the 31-polynomial), bucket-join
    * on (band, key), then estimate Jaccard as the fraction of matching
    * signature positions (array zip, no extra shuffle). Output:
    * (doc_a, doc_b, est_jaccard) with est ≥ minEst. No O(n²) stage:
    * candidates come only from band buckets; the signature subplan ends in
    * one exchange that Spark reuses across all four references.
    */
  def minhashPairs(corpus: DataFrame, minEst: Double = 0.5): DataFrame = {
    // The signature arrays ride along through the band join
    // (bandRowsOf): both join branches are the IDENTICAL subplan (same
    // projection), so Spark computes the signature exchange once and
    // reuses it — with separate pair→signature lookup joins, per-branch
    // column pruning made each branch unique and the signature build
    // ran once per reference.
    pairsFromBandRows(bandRowsOf(corpus), minEst)
  }

  /** The [[minhashPairs]] tail over an arbitrary band-row set — shared
    * with the cluster-map snapshot rebuild, which feeds PERSISTED band
    * rows back in instead of re-signing the corpus.
    */
  private def pairsFromBandRows(bandRows: DataFrame,
                                minEst: Double): DataFrame =
    bandRows.as("x").join(bandRows.as("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.ms").as("ma"), col("y.ms").as("mb"))
      .distinct()
      .select(col("doc_a"), col("doc_b"),
        (aggregate(zip_with(col("ma"), col("mb"),
            (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (acc, x) => acc + x) / K.toDouble).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEst)

  /** (doc_id, ms, band, bk) band rows of a corpus — the signature
    * subplan exploded to one row per LSH band, signatures riding along
    * (the [[minhashPairs]] discipline: candidates found by a band join
    * carry both sides' signatures, no second lookup join).
    */
  private def bandRowsOf(corpus: DataFrame): DataFrame = {
    val sig = minhashSigArr(corpus)
    sig.select(col("doc_id"), col("ms"), explode(array(
      (0 until Bands).map(j =>
        struct(lit(j).as("band"), col(s"bk$j").as("bk"))): _*)).as("b"))
      .select(col("doc_id"), col("ms"), col("b.band").as("band"),
        col("b.bk").as("bk"))
  }

  /** Persist the near-dup INDEX of a known corpus: MinHash band-bucket
    * rows (with signatures) under `path`/bands and exact text digests
    * under `path`/digests. Built ONCE per corpus snapshot; every
    * arrivals batch then dedups against these tables without
    * re-mining the corpus — the operation that turns the O(corpus)
    * full-remine family into an O(arrivals) daily increment.
    *
    * Scale notes: the band table is 4 rows × ~150 B per document —
    * parquet-compressed far below the text it summarizes; at 100 TB
    * partition it by `band` and bucket by `bk` so the arrivals probe
    * co-locates without shuffling the index. The digest table is one
    * 16-byte md5 per distinct text.
    */
  def writeMinhashIndex(known: DataFrame, path: String): Unit = {
    val k = known.filter(col("text").isNotNull)
    bandRowsOf(k).write.mode("overwrite").parquet(path + "/bands")
    k.select(md5(col("text")).as("text_md5")).distinct()
      .write.mode("overwrite").parquet(path + "/digests")
  }

  /** Persist the known corpus's near-dup CLUSTER MAP alongside the
    * index: MinHash pairs → connected components → (doc_id, cluster)
    * parquet under `path`/clusters. Built once per snapshot (this is
    * the intended full-mine moment); every arrivals batch then joins
    * existing clusters without re-clustering the corpus
    * ([[assignClustersIncremental]]). Docs in no near-dup pair have no
    * row — they are their own singleton cluster by convention, which
    * the read path restores with a coalesce.
    */
  def writeMinhashClusterMap(known: DataFrame, path: String,
                             minEst: Double = 0.5): Unit = {
    // Pairs are mined from the JUST-WRITTEN index artifact (the
    // [[writeMinhashIndex]] band rows under `path`/bands, which carry
    // the signatures) rather than re-signing the corpus: the signature
    // build — 16 min-hash aggregates over every 3-gram shingle — is
    // the dominant map cost and the index write already paid it. Same
    // pairs by construction on a fresh snapshot (spec-pinned against
    // the direct [[minhashPairs]] re-mine); `known` identifies the
    // session and documents the call-after-write contract.
    val spark = known.sparkSession
    GraphOps.connectedComponents(
        pairsFromBandRows(spark.read.parquet(path + "/bands"), minEst)
          .select(col("doc_a").as("a"), col("doc_b").as("b")))
      .select(col("node").as("doc_id"), col("cluster"))
      .write.mode("overwrite").parquet(path + "/clusters")
  }

  /** Incremental cluster ASSIGNMENT — the O(arrivals) companion to
    * [[writeMinhashClusterMap]]: each arrival joins the persisted
    * cluster of its near-dup index matches (min over
    * coalesce(cluster(match), match) — singleton matches contribute
    * their own id) and unmatched arrivals become their own singleton.
    * Output: (doc_id, cluster, n_near).
    *
    * ASSIGNMENT-ONLY contract, stated plainly: an arrival bridging TWO
    * existing clusters is assigned the smaller label but does NOT merge
    * them — exact merge requires re-running the connected-components
    * closure, which a daily pipeline schedules as the periodic full
    * rebuild of the cluster map (the same snapshot moment that rebuilds
    * the index). Deterministic, so the oracle replays the identical
    * assignment.
    */
  def assignClustersIncremental(arrivals: DataFrame, indexPath: String,
                                minEst: Double = 0.5): DataFrame = {
    val spark = arrivals.sparkSession
    val idxBands = spark.read.parquet(indexPath + "/bands")
    val clusters = spark.read.parquet(indexPath + "/clusters")
      .withColumnRenamed("doc_id", "idx_id")
    val arr = arrivals.filter(col("text").isNotNull)
    val assigned = nearIndexMatches(arr, idxBands, minEst)
      .join(clusters, Seq("idx_id"), "left")
      .groupBy("doc_id").agg(
        min(coalesce(col("cluster"), col("idx_id"))).as("matched_cluster"),
        count(lit(1)).as("n_near"))
    arr.select("doc_id")
      .join(assigned, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("matched_cluster"), col("doc_id")).as("cluster"),
        coalesce(col("n_near"), lit(0L)).as("n_near"))
  }

  /** Index MAINTENANCE — the other half of the daily loop: append an
    * admitted batch's band rows and digests to the persisted index, so
    * the NEXT batch's twins of these documents are caught. Appends are
    * O(batch) parquet writes — the index never rewrites; duplicate
    * digests across appends are tolerated by the read path's distinct
    * ([[dedupMinhashIncremental]]), and duplicate band rows collapse in
    * its candidate distinct. On a real lake this is the same
    * append-only discipline as a streaming file sink; compaction is
    * [[SinkOps]]' existing small-file job.
    */
  def appendToMinhashIndex(admitted: DataFrame, path: String): Unit = {
    val a = admitted.filter(col("text").isNotNull)
    bandRowsOf(a).write.mode("append").parquet(path + "/bands")
    a.select(md5(col("text")).as("text_md5")).distinct()
      .write.mode("append").parquet(path + "/digests")
  }

  /** Index COMPACTION — the periodic maintenance that closes the
    * append-only loop (write → probe → append → COMPACT): replayed
    * appends (task retries, at-least-once foreachBatch re-deliveries)
    * and re-admitted digests accumulate duplicate rows across many
    * small files, which the read path tolerates by distinct-ing but
    * pays for on every probe. Compaction rewrites each index table as
    * its DISTINCT row set in one generation swap: write the distinct
    * rows beside the live table, then delete-and-rename through the
    * Hadoop FileSystem API (correct on HDFS/object stores, not just
    * local disk — the `java.io.File` recursion this repo already
    * retired from its CTAS cleanup would silently no-op there).
    *
    * Probe semantics are unchanged BY CONSTRUCTION:
    * [[dedupMinhashIncremental]]'s candidate distinct and digest
    * distinct already collapse duplicates, so
    * probe(compact(idx)) ≡ probe(idx) — the equivalence
    * q_dedup_index_compact's oracle pins by matching the
    * UN-compacted update query's verdict bit-for-bit. Cost is one
    * linear distinct per table, scheduled at the same cadence as the
    * cluster-map snapshot rebuild; between compactions appends stay
    * O(batch).
    */
  def compactMinhashIndex(path: String, targetFiles: Int = 0): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    for (sub <- Seq("bands", "digests")) {
      val live = s"$path/$sub"
      val tmp = s"$path/_${sub}_compact_tmp"
      // targetFiles sizes the compacted generation; 0 (the default)
      // derives it from table bytes / 512 MB, so a 1 B-row index
      // rewrites across as many tasks as it has data. repartition,
      // not coalesce — coalesce would glue the distinct's output into
      // few partitions and cap the write's parallelism.
      val n = if (targetFiles >= 1) targetFiles
              else graft.ops.SinkOps.derivedFileCount(spark, live)
      spark.read.parquet(live).distinct().repartition(n)
        .write.mode("overwrite").parquet(tmp)
      val liveP = new org.apache.hadoop.fs.Path(live)
      val fs = liveP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(liveP, true)
      if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), liveP))
        throw new IllegalStateException(
          s"compactMinhashIndex: rename $tmp -> $live failed")
    }
  }

  /** Distinct (arrival doc_id, index doc_id) pairs whose signature
    * estimate clears `minEst` — the band-bucket probe into a persisted
    * index's band table, shared by the dedup verdict and the cluster
    * assignment paths.
    */
  private def nearIndexMatches(arr: DataFrame, idxBands: DataFrame,
                               minEst: Double): DataFrame =
    bandRowsOf(arr).as("x").join(idxBands.as("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk"))
      .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("idx_id"),
        col("x.ms").as("ma"), col("y.ms").as("mb"))
      .distinct()
      .select(col("doc_id"), col("idx_id"),
        (aggregate(zip_with(col("ma"), col("mb"),
            (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (acc, x) => acc + x) / K.toDouble).as("est"))
      .filter(col("est") >= minEst)

  /** Incremental near-dup dedup against a PERSISTED index
    * ([[writeMinhashIndex]]): every arrival is judged by (a) exact
    * digest membership in the index digest table and (b) MinHash LSH
    * banding against the index band table — signatures are built for
    * the ARRIVALS ONLY; the known corpus contributes pre-computed
    * index rows, so per-batch cost is O(|arrivals|) + one keyed join
    * into the index, never a corpus re-mine. Candidates come solely
    * from band-bucket collisions (no all-pairs path), and the
    * estimate is the usual matching-position fraction over the two
    * signature arrays riding the band join.
    *
    * Output, one row per non-null-text arrival:
    * (doc_id, exact_dup 0/1, n_near = #index docs with est ≥ minEst,
    * kept 0/1 — the survivors a pipeline would admit). All counts
    * exact int64; deterministic in any engine/layout.
    */
  def dedupMinhashIncremental(arrivals: DataFrame, indexPath: String,
                              minEst: Double = 0.5): DataFrame = {
    val spark = arrivals.sparkSession
    val idxBands = spark.read.parquet(indexPath + "/bands")
    val idxDigests = spark.read.parquet(indexPath + "/digests")
    val arr = arrivals.filter(col("text").isNotNull)
    val near = nearIndexMatches(arr, idxBands, minEst)
      .groupBy("doc_id").agg(count(lit(1)).as("n_near"))
    // Distinct on the digest read: appends ([[appendToMinhashIndex]])
    // may land the same digest twice across batches, and a duplicated
    // join key would duplicate arrival rows.
    arr.withColumn("text_md5", md5(col("text")))
      .join(idxDigests.select("text_md5").distinct()
          .withColumn("exact_dup", lit(1L)),
        Seq("text_md5"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("exact_dup"), lit(0L)).as("exact_dup"),
        coalesce(col("n_near"), lit(0L)).as("n_near"),
        when(coalesce(col("exact_dup"), lit(0L)) === 0L &&
            coalesce(col("n_near"), lit(0L)) === 0L, 1L)
          .otherwise(0L).as("kept"))
  }

  /** Cross-corpus near-dup pairs — benchmark decontamination at the
    * NEAR-dup level (the 8-gram exact decontam's blind spot: a
    * paraphrased or lightly-edited eval item shares no 8-gram but
    * minhash-collides). `corpus` carries BOTH sides with ids below /
    * at-or-above `boundary` (train / eval); the LSH band join emits
    * only cross-boundary candidates, so within-side duplicates never
    * pair — same signatures, same bands, same estimate as
    * [[minhashPairs]], one extra predicate. Scale identical to the
    * within-corpus path: bands are the sole pair generator.
    */
  def minhashCrossPairs(corpus: DataFrame, boundary: Long,
                        minEst: Double = 0.5): DataFrame = {
    val bandRows = bandRowsOf(corpus)
    bandRows.as("x").join(bandRows.as("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
          col("x.doc_id") < boundary && col("y.doc_id") >= boundary)
      .select(col("x.doc_id").as("train_id"), col("y.doc_id").as("eval_id"),
        col("x.ms").as("ma"), col("y.ms").as("mb"))
      .distinct()
      .select(col("train_id"), col("eval_id"),
        (aggregate(zip_with(col("ma"), col("mb"),
            (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (acc, x) => acc + x) / K.toDouble).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEst)
  }

  /** SimHash bits: 60 — the full entropy of the portable hash60 (a 64-bit
    * simhash would leave bits 60-63 of every token hash constant-zero,
    * i.e. 4 dead signature bits and a crippled 4th band). Banded as
    * 4 × 15 bits for candidate generation: by pigeonhole the bands are
    * exhaustive for Hamming distance ≤ 3; above that they are the
    * standard high-recall heuristic. Deterministic either way, so the
    * oracle (same banding) agrees by construction.
    *
    * Scale: each band keys 2^15 = 32,768 buckets, so bucket occupancy is
    * ~n/32,768 per band and the candidate self-join stays linear-ish at
    * billion-doc corpora. (The previous 32-bit/4-byte-band shape had a
    * fixed 256-bucket domain per band — O((n/256)²) pair generation, a
    * scale-killer flagged in round 3.) The simhash value itself stays a
    * nonnegative int64 < 2^60, so every derived quantity — band keys via
    * nonneg floor-div, bit_count(xor) Hamming — is in the integer dialect
    * both engines evaluate identically.
    */
  val SimhashBits = 60
  val SimhashBands = 4
  val SimhashBandBits = 15

  /** 60-bit SimHash per doc over term-frequency-weighted tokens:
    * bit_i = [ Σ_tokens cnt·(2·bit_i(h60(token))−1) > 0 ].
    * Bit extraction is nonneg floor-div ((h div 2^i) mod 2), identical in
    * DuckDB. Returns (doc_id, simhash).
    */
  def simhash(corpus: DataFrame): DataFrame = {
    // TF pre-agg per (doc, word), hash once per distinct pair, then ONE
    // doc_id aggregation with 32 generated bit-sum expressions. The
    // alternative (hash per token instance, no pre-agg — valid because
    // Σ_w cnt_w·f(h(w)) ≡ Σ_instances f(h) even under collisions) was
    // re-measured at the harness bench config (local[32], sf0.1,
    // full-suite run): instance-hash 5.5-5.7 s vs pre-agg 3.3-3.8 s —
    // the pre-agg wins because ~40% fewer rows go through the
    // 32-expression aggregation, which dominates this CPU-bound query.
    // Note for a real cluster: the map-side partial agg already shrinks
    // BOTH variants' exchanges to near-identical bytes, so the pre-agg's
    // extra (doc, word) shuffle is the only cluster-side cost — re-measure
    // there before assuming either way.
    // (h div 2^i) is integer division — `/` would be double division and
    // silently lose bits beyond 2^53 on the 60-bit hash.
    val toks = corpus
      .select(col("doc_id"),
        explode(filter(split(col("text"), TextOps.WsRegex), x => x =!= "")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
      .withColumn("h", TextOps.hash60(col("w")))
    toks.groupBy("doc_id")
      .agg(graft.functions.SimHashAgg.simhashOf(col("h"), col("cnt"))
        .as("simhash"))
  }

  /** The 60-generated-sum-expressions formulation of [[simhash]] — the
    * previous hot path, kept as the cross-check twin for the typed
    * [[graft.functions.SimHashAgg]] (spec asserts bit-identical output;
    * the UDAF folds all 60 counters in one primitive-loop update and
    * measured faster on the CPU-bound aggregation).
    */
  def simhashExprTwin(corpus: DataFrame): DataFrame = {
    val toks = corpus
      .select(col("doc_id"),
        explode(filter(split(col("text"), TextOps.WsRegex), x => x =!= "")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
      .withColumn("h", TextOps.hash60(col("w")))
    val bitSums = (0 until SimhashBits).map(i =>
      sum(col("cnt") * (expr(s"(h div ${1L << i}) % 2") * 2 - 1)).as(s"s$i"))
    toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until SimhashBits).map(i =>
          when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, candidates
    * bucketed by the 4 × 15-bit simhash bands (32,768 buckets per band).
    * Output (doc_a, doc_b, hamming).
    */
  def simhashPairs(corpus: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = simhash(corpus)
    val bands = sh.select(col("doc_id"), col("simhash"), explode(array(
        (0 until SimhashBands).map(j => struct(lit(j).as("j"),
          expr(s"(simhash div ${1L << (SimhashBandBits * j)}) % ${1 << SimhashBandBits}")
            .as("key"))): _*)).as("b"))
      .select(col("doc_id"), col("simhash"),
        col("b.j").as("j"), col("b.key").as("key"))
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
    * Shingles travel as 60-bit portable hashes, never strings: every
    * shuffle/join in the pipeline carries (int64, int64) rows. The oracle
    * hashes with the same formula, so even a hash collision (≈2^-60) would
    * affect both engines identically. Output: (doc_a, doc_b, inter, jacc)
    * with jacc ≥ minJaccard.
    */
  def ngramJaccardPairs(corpus: DataFrame, maxDf: Int = 100,
                        minJaccard: Double = 0.6): DataFrame = {
    val s = corpus.select(col("doc_id"),
        explode(graft.functions.KGramHash60(col("text"), 2)).as("sh"))
      .distinct()
    val rare = s.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("sh")
    // Per-doc rare-shingle count rides along via a window, so the inverted
    // self-join below has two IDENTICAL branches (one exchange, reused)
    // instead of separate size-lookup joins that each recompute the index.
    val srn = s.join(rare, "sh").withColumn("n",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id")))
    srn.as("x").join(srn.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.n").as("na"), col("y.n").as("nb"))
      .agg(count(lit(1)).as("inter"))
      .select(col("doc_a"), col("doc_b"), col("inter"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("jacc"))
      .filter(col("jacc") >= minJaccard)
  }

  /** Fixed-size word-chunk "paragraphs": (doc_id, paras array<string>),
    * each paragraph `words` whitespace tokens (last one shorter). The
    * fixture corpus is single-line, so this is its paragraph proxy; a
    * production corpus splits on '\n\n' instead and feeds the same
    * `paragraphDedup`. The word array is projected to a bound attribute
    * BEFORE the transform lambda references it — a lambda that captured
    * the split expression itself would re-run it once per element (the
    * shingleArr pitfall).
    */
  def chunkedParas(corpus: DataFrame, words: Int): DataFrame =
    corpus.filter(col("text").isNotNull)
      .select(col("doc_id"),
        filter(split(col("text"), TextOps.WsRegex), x => x =!= "").as("w"))
      .select(col("doc_id"),
        when(size(col("w")) > 0,
          transform(
            sequence(lit(0),
              floor((size(col("w")) + lit(words - 1)) / lit(words))
                .cast("int") - lit(1)),
            i => array_join(
              slice(col("w"), i * lit(words) + lit(1), lit(words)), " ")))
          .otherwise(typedLit(Seq.empty[String])).as("paras"))

  /** Paragraph-level exact dedup (the C4/RefinedWeb formulation): every
    * repeated paragraph occurrence corpus-wide is dropped except the
    * lexicographically smallest (doc_id, idx), then each document is
    * reassembled from its surviving paragraphs in order. Input:
    * (doc_id, paras array<string>). Output: (doc_id, n_kept, text_kept) —
    * documents whose every paragraph lost are absent.
    *
    * Scale shape: keeper election groups (md5, doc_id, idx) — the wide
    * digest-keyed exchange carries 48-byte rows, never text. Paragraph
    * text moves only on document-keyed exchanges (the semi-join probe on
    * (doc_id, idx) and the reassembly agg on doc_id), i.e. the minimum
    * any reassembling dedup must move.
    */
  def paragraphDedup(paras: DataFrame, cacheOccurrences: Boolean = true): DataFrame = {
    // The occurrence table feeds two branches (keeper election + probe);
    // persist stops the chunk/explode pipeline running twice. MEMORY_AND_
    // DISK with spill is the standard trade at scale: re-deriving would
    // instead re-scan the corpus per branch. Cache contract: the result is
    // lazy, so the entry cannot be unpersisted here (unlike GraphOps'
    // loops, which act inside the op) — the caller frees it after its
    // action (`spark.catalog.clearCache()`, as Verify/Bench already do
    // between queries). Long-lived sessions composing many curation ops
    // can pass cacheOccurrences=false to trade the double derivation for
    // zero pinned entries (same escape hatch as dedupBloomPrefilter's
    // persistIncoming).
    val occ0 = paras.select(col("doc_id"),
      posexplode(col("paras")).as(Seq("idx", "para")))
    val occ = if (cacheOccurrences) occ0.persist() else occ0
    val keepers = occ
      .select(md5(col("para")).as("h"), col("doc_id"), col("idx"))
      .groupBy("h").agg(min(struct(col("doc_id"), col("idx"))).as("k"))
      .select(col("k.doc_id").as("doc_id"), col("k.idx").as("idx"))
    occ.join(keepers, Seq("doc_id", "idx"), "left_semi")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("idx"), col("para")))),
            x => x.getField("para")), " ").as("text_kept"))
  }

  /** Distributed bloom sketch of the known corpus' text hashes — one
    * aggregation job, returns the serialized filter (~1 MB at the default
    * shape; a driver-side SCALAR, not collected rows). In an ingestion
    * pipeline this sketch is built once per known snapshot and reused
    * across incoming batches. Null when the known side is empty.
    *
    * Sizing at scale: a useful sketch needs ~10 bits/known digest (≈1% FP
    * → 1% of incoming reaches the anti join). Spark caps the catalyst
    * bloom aggregate via `spark.sql.optimizer.runtime.bloomFilter
    * .maxNumItems` (4M) and `.maxNumBits` (2^26) — a 10^9-digest known
    * corpus needs those confs raised (the sketch is then ~1.2 GB: still a
    * scalar, but size the driver/executor overhead accordingly, or shard
    * the known corpus into multiple sketches).
    */
  def buildKnownBloom(known: DataFrame, expectedItems: Long = 1L << 20,
                      numBits: Long = 1L << 23): Array[Byte] = {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.catalyst.expressions.{Literal => CatLit}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val aggCol = GraftSqlBridge.column(
      new BloomFilterAggregate(
        GraftSqlBridge.expression(xxhash64(col("text"))),
        CatLit(expectedItems), CatLit(numBits)).toAggregateExpression())
    val row = known.filter(col("text").isNotNull).agg(aggCol.as("bf")).head()
    if (row.isNullAt(0)) null else row.getAs[Array[Byte]](0)
  }

  /** Incremental exact dedup with a bloom prefilter — same contract and
    * exact same result as `dedupAgainst`, different 100 TB shape: rows
    * whose text hash misses the known-corpus bloom sketch are provably
    * new and bypass the join entirely, so the digest anti join shuffles
    * only the (true duplicate + false positive) sliver instead of the
    * whole incoming batch. False positives cost a join probe, never a
    * wrong answer. The sketch rides the plan as a foldable literal
    * (`BloomFilterMightContain` requires a constant or scalar subquery),
    * evaluated once per partition.
    */
  def dedupBloomPrefilter(incoming: DataFrame, known: DataFrame,
                          expectedItems: Long = 1L << 20,
                          numBits: Long = 1L << 23,
                          persistIncoming: Boolean = true): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal => CatLit}
    val in = incoming.filter(col("text").isNotNull)
    val bf = buildKnownBloom(known, expectedItems, numBits)
    if (bf == null) in // empty known corpus: nothing can be a duplicate
    else {
      val maybe = GraftSqlBridge.column(BloomFilterMightContain(
        CatLit(bf), GraftSqlBridge.expression(xxhash64(col("text")))))
      // Persisted for the same two-branch reason as paragraphDedup (and
      // under the same caller-frees cache contract): without it, both
      // union children re-derive the full incoming pipeline + bloom probe.
      // This pins the batch (text included) until the caller frees it — a
      // looping ingester that already holds the batch materialized should
      // pass persistIncoming=false and accept the double derivation of
      // its (cheap, materialized) scan instead.
      val tagged0 = in.withColumn("maybe", maybe)
      val tagged = if (persistIncoming) tagged0.persist() else tagged0
      tagged.filter(!col("maybe")).drop("maybe")
        .union(dedupAgainst(tagged.filter(col("maybe")).drop("maybe"), known))
    }
  }

  /** Fuzzy canonicalization (entity resolution): map each distinct value
    * of `nameCol` to the most frequent value within `maxDist` edit
    * distance of it, ties broken lexicographically. The everyday
    * data-cleaning op ("Jon Smith" → "John Smith") the sketch-based
    * dedupers above are too coarse for.
    *
    * 100 TB shape: levenshtein is O(len²) per pair, so the pair space is
    * the whole cost — candidates are generated ONLY inside blocking
    * buckets, with MULTI-PASS blocking (a name blocks on BOTH its first
    * and last whitespace token, pairs deduped across passes) so a typo
    * in either token still finds its mate — the standard record-linkage
    * answer to single-key blocking's blind spot. The triangle-inequality
    * prune |len(a)−len(b)| ≤ maxDist sits in the join condition next to
    * the distance itself, so both apply during the join, not after.
    * Distinct-value counts, not rows, flow into the self-join: the join
    * input is |distinct names|, which a name-shaped column keeps far
    * below |rows|. Election is a row_number window per name —
    * deterministic via the full (cnt DESC, name ASC) tie-break.
    *
    * Output: (nm, canonical, dist, cnt) — every distinct name, its
    * elected canonical form, the edit distance between them, and the
    * name's own occurrence count.
    *
    * Null-name rows are EXCLUDED by explicit contract (the filter
    * below), not as a join side effect: a null has no tokens to block
    * on and no edit distance to anything, so it can never elect or be
    * a canonical form — callers wanting a policy for null names apply
    * it upstream (e.g. coalesce to a sentinel before calling).
    */
  def fuzzyCanonicalize(df: DataFrame, nameCol: String,
                        maxDist: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.select(col(nameCol).as("nm"))
      .filter(col("nm").isNotNull)
      .groupBy("nm").agg(count(lit(1)).as("cnt"))
      .withColumn("len", length(col("nm")))
    // Multi-pass blocking: one (nm, blk) row per distinct blocking key
    // (first token, last token — identical for one-token names).
    val keyed = counts.select(col("nm"), col("cnt"), col("len"),
      explode(array_distinct(array(
        element_at(split(col("nm"), " "), 1),
        element_at(split(col("nm"), " "), -1)))).as("blk"))
    val cand = keyed.join(
      keyed.select(col("nm").as("nm2"), col("cnt").as("cnt2"),
        col("blk").as("blk2"), col("len").as("len2")),
      col("blk") === col("blk2") &&
        abs(col("len") - col("len2")) <= maxDist &&
        levenshtein(col("nm"), col("nm2")) <= maxDist)
      // A pair found by both passes (shared first AND last token) must
      // count once in the election.
      .select("nm", "cnt", "nm2", "cnt2").distinct()
    val w = Window.partitionBy("nm")
      .orderBy(col("cnt2").desc, col("nm2").asc)
    cand.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("nm"), col("nm2").as("canonical"),
        levenshtein(col("nm"), col("nm2")).as("dist"), col("cnt"))
  }

  /** PRECISION audit completing the MinHash P/R pair (recall:
    * q_dedup_minhash_recall): every [[minhashPairs]] candidate is
    * re-judged against the EXACT shingle-set Jaccard — n_inter/n_union
    * over the distinct word-3-shingle sets, in exact int64 ppm — and
    * marked true/false positive at tau. This is the verify stage every
    * LSH deployment pays on its candidate set: a banding shape that
    * over-generates shows up as a falling true_pos fraction, the twin
    * failure mode to recall loss. Output per estimated pair:
    * (doc_a, doc_b, est_jaccard, n_inter, n_union, true_ppm,
    * true_pos).
    *
    * Scale shape: candidates are already banding-bounded; the exact
    * re-check joins ONLY pair members' shingle sets (pairs ×
    * shingles/doc, keyed on the shingle string) — the candidate-verify
    * cost, never a corpus-wide pass beyond the shingling the pair
    * mining already pays.
    */
  def minhashPrecisionAudit(corpus: DataFrame, minEst: Double = 0.5,
                            tauPpm: Long = 500000L): DataFrame = {
    val c = corpus.filter(col("text").isNotNull)
    val pairs = minhashPairs(c, minEst)
    val sh = shingles3(c)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    val inter = pairs.select("doc_a", "doc_b")
      .join(sh.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh")),
        Seq("doc_b", "sh"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    pairs
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .join(sizes.select(col("doc_id").as("doc_a"), col("nsh").as("na")),
        "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("nsh").as("nb")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"),
        coalesce(col("n_inter"), lit(0L)).as("n_inter"),
        (col("na") + col("nb") - coalesce(col("n_inter"), lit(0L)))
          .as("n_union"))
      .withColumn("true_ppm", expr("(n_inter * 1000000) div n_union"))
      .withColumn("true_pos",
        when(col("true_ppm") >= tauPpm, 1L).otherwise(0L))
  }

  /** Content-defined chunking (CDC) dedup statistics — the blob-level
    * dedup mechanism rsync/LBFS-style storage dedup made standard,
    * relationally: a chunk boundary is declared wherever the rolling
    * 8-char-gram hash ≡ 0 (mod `divisor`), so boundaries move WITH the
    * content — a span shared by two documents at DIFFERENT offsets
    * still cuts into identical chunks, where fixed-size blocks would
    * misalign after one inserted byte (the misalignment CDC exists to
    * solve; mean chunk length ≈ divisor chars). Chunks are md5-keyed;
    * a chunk digest appearing in ≥ 2 distinct documents counts as
    * shared. Output per document of ≥ k chars (shorter docs have no
    * gram positions and are excluded, the [[graft.ops.TextStatsOps]]
    * fingerprint contract): (doc_id, n_chunks, n_shared, shared_ppm).
    *
    * Scale shape: boundary detection is the native one-pass char-gram
    * hasher (map-only codegen); chunk digests need one doc-keyed
    * lead() window + per-row substring; sharing is one digest-keyed
    * aggregate — document text never shuffles, only 16-byte digests.
    * Run over [[quoteCorpus]] (q_dedup_cdc), the planted SHIFTED
    * shared spans verify the offset-independence property itself, not
    * just exact-copy collapse.
    */
  def cdcChunkStats(docs: DataFrame, k: Int = 8,
                    divisor: Long = 64L): DataFrame = {
    val chunks = cdcChunks(docs, k, divisor)
      .select(col("doc_id"), md5(col("chunk")).as("dg"))
    val share = chunks.select("dg", "doc_id").distinct()
      .groupBy("dg").agg(count(lit(1)).as("ndocs"))
    chunks.join(share, "dg")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("ndocs") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .select(col("doc_id"), col("n_chunks"), col("n_shared"),
        expr("(n_shared * 1000000) div n_chunks").as("shared_ppm"))
  }

  /** (doc_id, j, chunk) rows of the content-defined chunking — the
    * shared derivation under [[cdcChunkStats]] and [[cdcSavings]],
    * exposed for the partition property test: chunks concatenated in
    * j order MUST reassemble the exact original text (boundaries cut,
    * they never drop or duplicate a character).
    */
  private[graft] def cdcChunks(docs: DataFrame, k: Int,
                               divisor: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs.filter(col("text").isNotNull)
    val pos = d.select(col("doc_id"), col("text"),
      posexplode(graft.functions.CharGramHash60(col("text"), k))
        .as(Seq("j", "h")))
    val starts = pos.filter(col("j") === 0 || col("h") % divisor === 0)
    val w = Window.partitionBy("doc_id").orderBy("j")
    starts.withColumn("nxt", lead(col("j"), 1).over(w))
      .select(col("doc_id"), col("j"),
        expr("substring(text, j + 1, coalesce(nxt, length(text)) - j)")
          .as("chunk"))
  }

  /** Corpus-level CDC storage-savings report — what a dedup store
    * planner reads before committing to chunked storage: total chunk
    * instances vs distinct chunk digests, total text chars vs chars a
    * store keeping ONE copy per distinct chunk would hold, and the
    * savings in ppm. Same boundary/digest derivation as
    * [[cdcChunkStats]] (chars, not bytes: the synthetic corpus is
    * ASCII so they coincide; a byte-accurate store planner would swap
    * in octet_length — stated plainly). One row out at any scale; the
    * only additions over the per-doc pass are two tiny aggregates.
    */
  def cdcSavings(docs: DataFrame, k: Int = 8,
                 divisor: Long = 64L): DataFrame = {
    val chunks = cdcChunks(docs, k, divisor)
      .select(md5(col("chunk")).as("dg"),
        length(col("chunk")).cast("long").as("clen"))
    val totals = chunks.agg(count(lit(1)).as("n_chunks"),
      sum("clen").as("total_chars"))
    val distincts = chunks.groupBy("dg").agg(max("clen").as("clen"))
      .agg(count(lit(1)).as("n_distinct"),
        sum("clen").as("distinct_chars"))
    // No chunks → no report row (an all-null/zero row would make the
    // empty corpus look like a measured zero-savings corpus).
    totals.crossJoin(distincts).filter(col("n_chunks") > 0)
      .select(col("n_chunks"), col("n_distinct"),
        col("total_chars"), col("distinct_chars"),
        expr("((total_chars - distinct_chars) * 1000000) div total_chars")
          .as("savings_ppm"))
  }

  /** Partial-overlap corpus for [[substringDupStats]] — the quote/
    * syndication shape real span-level dedup exists for: every third
    * document spawns a "quoting" twin (id+1_000_000) that embeds words
    * 3..14 of the original between unique framing text. Unlike
    * [[dupCorpus]] (whole-document copies — every gram would be
    * duplicated, a degenerate fixture for span detection), only the
    * quoted window's interior k-grams are shared, so dup_ppm and
    * max_run take real intermediate values. Closed-form, shared with
    * the DuckDB oracle.
    */
  def quoteCorpus(docs: DataFrame): DataFrame = {
    val base = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    val w = filter(split(col("text"), graft.ops.TextOps.WsRegex),
      x => x =!= "")
    val quoted = base.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), array_join(slice(w, 3, 12), " ").as("span"))
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("quoteopen"), col("doc_id"),
          lit(" begins here now "), col("span"),
          lit(" quoteclose"), col("doc_id")).as("text"))
    base.union(quoted)
  }

  /** Exact duplicated-substring detection (the span-level dedup family
    * member, after document-level exact and paragraph-level dedup): mark
    * every word k-gram that occurs in 2+ DISTINCT documents corpus-wide,
    * then report per document how much of it is duplicated span —
    * (doc_id, n_grams, n_dup, dup_ppm, max_run), where `max_run` is the
    * longest consecutive run of duplicated k-gram positions (a run of r
    * duplicated k-grams witnesses a shared substring of r+k-1 words).
    * Documents under k words have no k-grams and are absent (both
    * engines drop them at the explode).
    *
    * Scale shape: grams travel as (int64 pos, int64 hash60) — text never
    * shuffles. One gram-keyed exchange builds the document frequency
    * (two-phase distinct-doc count), one gram-keyed join marks
    * positions, and per-doc work (the run window + final agg) is
    * doc-keyed. Everything is linear in corpus gram count; no pair
    * space is ever materialized, which is what lets span-level dedup
    * run where pairwise near-dup would not (cf. suffix-array substring
    * dedup in the literature — this is its relational k-gram
    * formulation). Internal repetition within one document does NOT
    * count as duplication (frequency is per distinct doc).
    */
  def substringDupStats(corpus: DataFrame, k: Int = 8,
                        minDf: Int = 2): DataFrame = {
    val grams = gramPositions(corpus, k)
    val df = grams.groupBy("sh")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDf).select("sh")
    dupSpanTail(grams, df)
  }

  /** CONTAINMENT near-dup pairs (asymmetric Jaccard) — the quote
    * detector symmetric Jaccard is blind to: a 12-word quote inside a
    * 60-word original shares ~all of ITS grams but a small fraction of
    * the original's, so inter/|A∪B| stays low while inter/|quote| is
    * high. Same inverted-index shape as [[ngramJaccardPairs]]: word
    * k-gram sets (distinct, as native hashes), candidates only from
    * grams with df ≤ `maxDf` (ubiquitous grams carry no quote signal —
    * the cap is also what keeps the inverted self-join linear-ish at
    * corpus scale), per-doc set sizes riding via a window so both join
    * branches stay identical (one exchange, reused). Containment is
    * computed over the rare-gram sets, both directions, exact ppm;
    * pairs kept when either direction ≥ `minContPpm`.
    */
  def containmentPairs(corpus: DataFrame, k: Int = 8, maxDf: Int = 100,
                       minContPpm: Long = 300000L): DataFrame = {
    val s = corpus.filter(col("text").isNotNull).select(col("doc_id"),
        explode(graft.functions.KGramHash60(col("text"), k)).as("sh"))
      .distinct()
    val rare = s.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("sh")
    val srn = s.join(rare, "sh").withColumn("n",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id")))
    srn.as("x").join(srn.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.n").as("na"), col("y.n").as("nb"))
      .agg(count(lit(1)).as("inter"))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("na"),
        col("nb"),
        expr("inter * 1000000 div na").as("cont_a_ppm"),
        expr("inter * 1000000 div nb").as("cont_b_ppm"))
      .filter(greatest(col("cont_a_ppm"), col("cont_b_ppm"))
        >= minContPpm)
  }

  /** Per-document NOVELTY scoring — the marginal-contribution signal
    * data-curation loops rank ingest candidates by: a doc's distinct
    * word k-grams are "novel" iff no LOWER-id document contains them
    * (first occurrence under the deterministic doc_id total order —
    * the ingestion-order proxy). Output per doc (≥ k words): distinct
    * gram count, novel count, novelty ppm. A full-copy doc scores 0;
    * the corpus's first doc scores 10^6. Two keyed exchanges: the
    * gram-keyed min-doc aggregate (the join back is co-partitioned on
    * the same key) and the doc-keyed rollup; text never ships — grams
    * ride as native 60-bit hashes.
    */
  def noveltyStats(corpus: DataFrame, k: Int = 8): DataFrame = {
    val grams = corpus.filter(col("text").isNotNull).select(col("doc_id"),
        explode(graft.functions.KGramHash60(col("text"), k)).as("sh"))
      .distinct()
    val firsts = grams.groupBy("sh").agg(min("doc_id").as("first_doc"))
    grams.join(firsts, "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_distinct"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("doc_id"), col("n_distinct"), col("n_novel"),
        expr("n_novel * 1000000 div n_distinct").as("novelty_ppm"))
  }

  /** (doc_id, pos, sh) word k-gram position rows (native hasher). */
  private def gramPositions(corpus: DataFrame, k: Int): DataFrame =
    corpus.filter(col("text").isNotNull).select(col("doc_id"),
      posexplode(graft.functions.KGramHash60(col("text"), k))
        .as(Seq("pos", "sh")))

  /** Shared tail of the span-dedup family: mark each gram position
    * against the duplicated-gram set `dupSh(sh)`, then per-doc stats +
    * the gaps-and-islands longest duplicated run.
    */
  private def dupSpanTail(grams: DataFrame, dupSh: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Left-mark: a gram with no row in `dupSh` is unique corpus-wide.
    val marked = grams
      .join(dupSh.withColumn("is_dup", lit(1L)), Seq("sh"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("is_dup"), lit(0L)).as("is_dup"))
    // Gaps-and-islands over duplicated positions only: consecutive pos
    // values share (pos - row_number), so each island is one shared span.
    val dupRuns = marked.filter(col("is_dup") === 1L)
      .withColumn("isl", col("pos") -
        row_number().over(Window.partitionBy("doc_id").orderBy("pos")))
      .groupBy("doc_id", "isl").agg(count(lit(1)).as("run"))
      .groupBy("doc_id").agg(max(col("run")).as("max_run"))
    marked.groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), sum(col("is_dup")).as("n_dup"))
      .join(dupRuns, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"), col("n_dup"),
        expr("n_dup * 1000000 div n_grams").as("dup_ppm"),
        coalesce(col("max_run"), lit(0L)).as("max_run"))
  }

  /** Planted-pair recall audit of the MinHash/LSH near-dup path — the
    * text twin of SimilarityOps.plantedPairRecall: ground truth is the
    * [[dupCorpus]] construction itself ((id, id+1M) exact copies for
    * shingleable docs, (id, id+2M) first-token-dropped near copies for
    * docs of ≥ 4 words), the found set is [[minhashPairs]]. Output per
    * pair class: exact truth/found counts and recall ppm — the search-
    * quality number the banding-shape claims rest on, pinned as driver-
    * checked integers. Identical-shingle-set copies hash to identical
    * signatures, so exact-copy recall is 100% by construction (the
    * audit would catch a banding regression that broke even that);
    * near-copy recall measures the real LSH trade.
    */
  def minhashPlantedRecall(docs: DataFrame,
                           minEst: Double = 0.5): DataFrame = {
    val base = docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        size(filter(split(col("text"), TextOps.WsRegex), x => x =!= ""))
          .as("n"))
    val truth = base.filter(col("n") >= 3)
      .select(col("doc_id").as("doc_a"),
        (col("doc_id") + 1000000L).as("doc_b"),
        lit("exact").as("pair_class"))
      .union(base.filter(col("n") >= 4)
        .select(col("doc_id").as("doc_a"),
          (col("doc_id") + 2000000L).as("doc_b"),
          lit("near").as("pair_class")))
    val found = minhashPairs(dupCorpus(docs), minEst)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("hit"))
    truth.join(found, Seq("doc_a", "doc_b"), "left")
      .groupBy("pair_class").agg(count(lit(1)).as("n_truth"),
        sum(coalesce(col("hit"), lit(0L))).as("n_found"))
      .select(col("pair_class"), col("n_truth"), col("n_found"),
        expr("n_found * 1000000 div n_truth").as("recall_ppm"))
  }

  /** Persist the span-dedup gram index: per-gram distinct-doc frequency
    * (sh, df) over the snapshot corpus — the substring twin of
    * [[writeMinhashIndex]]. Built once per snapshot; arrivals probe it
    * in O(arrival grams).
    */
  def writeGramIndex(known: DataFrame, path: String, k: Int = 8): Unit =
    gramPositions(known, k)
      .groupBy("sh").agg(countDistinct(col("doc_id")).as("df"))
      .write.mode("overwrite").parquet(path + "/grams")

  /** Incremental span-level dedup against the persisted gram index:
    * arrivals compute THEIR OWN k-gram positions only and left-join the
    * snapshot's gram set — a gram present in the index is a duplicated
    * span position (the snapshot already contains it). Same output and
    * islands tail as [[substringDupStats]], semantics restricted to
    * cross-boundary duplication (arrival-vs-snapshot; arrival-vs-
    * arrival duplication waits for the periodic snapshot re-mine, the
    * same contract as [[dedupMinhashIncremental]]).
    *
    * Scale shape: O(arrival grams) — one gram-keyed join against the
    * index (bucket the index by sh to make the probe co-located) plus
    * the doc-keyed islands window. The snapshot corpus is never
    * re-scanned; that is the point of persisting.
    */
  def substringDupIncremental(arrivals: DataFrame, path: String,
                              k: Int = 8): DataFrame = {
    val idx = arrivals.sparkSession.read.parquet(path + "/grams")
    dupSpanTail(gramPositions(arrivals, k), idx.select("sh"))
  }

  /** Persist the canonical LEDGER next to a minhash index — the
    * incremental half's incumbent table: one row per cluster of the
    * known corpus (clustered docs elect the [[dedupCanonical]] winner;
    * singletons are their own canonical), `(cluster, canon_id,
    * tok_kept)`. Written once per snapshot, probed by
    * [[canonicalIncremental]] every batch.
    */
  def writeCanonicalLedger(known: DataFrame, path: String): Unit = {
    // Same call-after-write contract as [[writeMinhashClusterMap]]: the
    // clusters are read from the JUST-WRITTEN `path`/clusters artifact
    // rather than re-mined — the signature build and the CC loop were
    // already paid by the map write; re-running both here doubled the
    // snapshot-mine cost for byte-identical clusters.
    val toks = known.filter(col("text").isNotNull)
      .select(col("doc_id"),
        size(filter(split(col("text"), TextOps.WsRegex), x => x =!= ""))
          .cast("long").as("n_tok"))
    val clusters = known.sparkSession.read.parquet(path + "/clusters")
      .select(col("doc_id").as("node"), col("cluster"))
    val elected = clusters.join(toks, clusters("node") === toks("doc_id"))
      .groupBy("cluster")
      .agg(max(struct(col("n_tok"), (-col("node")).as("neg"),
        col("node").as("node"))).as("best"))
      .select(col("cluster"), col("best.node").as("canon_id"),
        col("best.n_tok").as("tok_kept"))
    val singles = toks
      .join(clusters, toks("doc_id") === clusters("node"), "left_anti")
      .select(col("doc_id").as("cluster"), col("doc_id").as("canon_id"),
        col("n_tok").as("tok_kept"))
    elected.union(singles).write.mode("overwrite")
      .parquet(path + "/canonicals")
  }

  /** Incremental canonical MAINTENANCE — the daily-batch decision the
    * ledger exists for: each arrival is assigned its cluster
    * (O(arrivals) index probe, [[assignClustersIncremental]]) and then
    * judged against the incumbent canonical — `dethrones` if it brings
    * more tokens (ties to the smaller id, the same total order the
    * snapshot election uses), `kept_existing` if the incumbent stands,
    * `new_cluster` if nothing in the index is near.
    *
    * Upsert contract: each row's `new_canon_id` is judged against the
    * PRE-batch incumbent only, so when several same-batch arrivals
    * land in one cluster, multiple rows can claim `dethrones` with
    * different winners — the ledger consumer MUST take the per-cluster
    * (n_tok desc, doc_id asc) argmax of this output before upserting
    * (a naive row-order upsert could leave a weaker arrival as
    * canonical). [[graft.streaming.StreamOps]]'s canonical ingest
    * replay does exactly that re-election (bestArr per cluster) before
    * touching the ledger.
    *
    * Scale shape: one broadcast-eligible ledger join on top of the
    * O(arrivals) assignment probe; the known corpus is never
    * re-scanned. Same assignment-only contract as the cluster probe
    * (bridges between existing clusters wait for the periodic snapshot
    * rebuild).
    */
  def canonicalIncremental(arrivals: DataFrame,
                           indexPath: String): DataFrame = {
    val led = arrivals.sparkSession.read.parquet(indexPath + "/canonicals")
    val arrTok = arrivals.filter(col("text").isNotNull)
      .select(col("doc_id"),
        size(filter(split(col("text"), TextOps.WsRegex), x => x =!= ""))
          .cast("long").as("n_tok"))
    val wins = col("canon_id").isNull || col("n_tok") > col("tok_kept") ||
      (col("n_tok") === col("tok_kept") && col("doc_id") < col("canon_id"))
    assignClustersIncremental(arrivals, indexPath)
      .join(arrTok, "doc_id")
      .join(led, Seq("cluster"), "left")
      .select(col("doc_id"), col("cluster"), col("n_near"), col("n_tok"),
        when(col("canon_id").isNull, lit("new_cluster"))
          .when(wins, lit("dethrones"))
          .otherwise(lit("kept_existing")).as("verdict"),
        when(wins, col("doc_id")).otherwise(col("canon_id"))
          .as("new_canon_id"))
  }

  /** Canonical-copy selection over near-dup clusters — the decision the
    * cluster map exists FOR: within each connected component of the
    * MinHash pair graph, keep the copy with the MOST tokens (production
    * near-dup policy: the longest variant usually subsumes its trims),
    * ties to the smallest doc id. Per cluster: the canonical id, member
    * count, tokens kept, and tokens the dedup drop reclaims — the
    * storage-savings ledger of the dedup stage.
    *
    * Scale shape: clusters come from [[GraphOps.connectedComponents]]
    * (min-label propagation, no all-pairs path); the election is ONE
    * cluster-keyed `max(struct(n_tok, −node, node))` aggregate — the
    * repo's deterministic argmax idiom (no window sort, map-side
    * combined). Token counts ride the same join that tags members with
    * their cluster; text never shuffles.
    */
  def dedupCanonical(corpus: DataFrame): DataFrame = {
    val clusters = GraphOps.connectedComponents(
      minhashPairs(corpus).select(col("doc_a").as("a"), col("doc_b").as("b")))
    val toks = corpus.filter(col("text").isNotNull)
      .select(col("doc_id"),
        size(filter(split(col("text"), TextOps.WsRegex), x => x =!= ""))
          .cast("long").as("n_tok"))
    clusters.join(toks, clusters("node") === toks("doc_id"))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sum_tok"),
        max(struct(col("n_tok"), (-col("node")).as("neg"),
          col("node").as("node"))).as("best"))
      .select(col("cluster"), col("best.node").as("canon_id"),
        col("n_docs"), col("best.n_tok").as("tok_kept"),
        (col("sum_tok") - col("best.n_tok")).as("tok_dropped"))
  }
}
