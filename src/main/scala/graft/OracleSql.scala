package graft

import graft.ops.{DedupOps, EventOps, SimilarityOps, TextStatsOps}

/** DuckDB oracle-SQL builders for the LLM-pipeline queries.
  *
  * These mirror the graft operators formula-for-formula, sharing the same
  * literal constants (minhash coefficients, banding shape, corpus
  * derivation), so Spark and DuckDB produce bit-identical results: all
  * intermediate math is integer (portable md5-prefix hash, exact int64
  * sums); the only doubles are final divisions of exactly-representable
  * integers, which IEEE 754 defines identically in both engines.
  *
  * DuckDB dialect notes: `//` = floor division (nonneg operands only here,
  * so it equals Spark's `div`); `CAST('0x…' AS BIGINT)` parses hex —
  * the twin of Spark's `conv(hex, 16, 10)`; SUM(int) is HUGEINT, so sums
  * feeding int64 ops are cast back to BIGINT.
  */
object OracleSql {

  /** Portable 60-bit hash — DuckDB twin of TextOps.hash60. */
  def hash60(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 15)) AS BIGINT)"

  /** Whitespace tokenizer class — RE2 twin of TextOps.WsRegex. Spelled
    * as the six explicit code points because RE2's `\s` excludes U+000B
    * while Java's includes it; the explicit class makes both engines
    * split identically by construction.
    */
  val Ws: String = """[ \t\n\x0B\f\r]+"""

  /** Near-dup corpus CTEs — DuckDB twin of DedupOps.dupCorpus. */
  val corpusCte: String =
    """base AS (SELECT doc_id, text FROM documents),
       corpus AS (
         SELECT doc_id, text FROM base
         UNION ALL SELECT doc_id + 1000000, text FROM base
         UNION ALL SELECT doc_id + 2000000,
           regexp_replace(text, '^\S+\s*', '') AS text FROM base)"""

  /** Distinct word 3-shingle CTEs over `src` — one source of truth for
    * the shingling used by the minhash oracle paths.
    */
  def shingle3CteOver(src: String): String =
    s"""words AS (SELECT doc_id,
         list_filter(string_split_regex(text, '$Ws'), x -> x <> '') AS w
       FROM $src),
       sh AS (SELECT DISTINCT doc_id, sh FROM (
         SELECT doc_id, unnest(CASE WHEN len(w) >= 3
           THEN list_transform(range(1, len(w) - 1),
                  j -> w[j] || ' ' || w[j+1] || ' ' || w[j+2])
           ELSE CAST([] AS VARCHAR[]) END) AS sh
         FROM words))"""

  val shingle3Cte: String = shingle3CteOver("corpus")

  def dedupExactSql: String =
    s"""WITH $corpusCte
        SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_id,
               COUNT(*) AS dup_cnt
        FROM corpus GROUP BY md5(text) HAVING COUNT(*) >= 2"""

  /** CTE chain ending in `mh_pairs(doc_a, doc_b, est_jaccard)` — the
    * MinHash LSH pipeline (corpus → shingles → signatures → band keys →
    * bucketed candidates → estimate ≥ 0.5), shared by the pair query and
    * the cluster query.
    */
  private def minhashPairsCtes: String = {
    val coefValues = DedupOps.MinhashCoef
      .map { case (i, a, b, band, w31) => s"($i, $a, $b, $band, $w31)" }
      .mkString(", ")
    val p = DedupOps.P
    s"""$corpusCte,
        $shingle3Cte,
        hh AS (SELECT doc_id, ${hash60("sh")} % $p AS h FROM sh),
        coef AS (SELECT * FROM (VALUES $coefValues) t(i, a, b, band, w31)),
        sig AS (SELECT doc_id, i, MIN((a * h + b) % $p) AS m
                FROM hh CROSS JOIN coef GROUP BY doc_id, i),
        bk AS (SELECT doc_id, band, CAST(SUM(m * w31) AS BIGINT) AS bk
               FROM sig JOIN coef USING (i) GROUP BY doc_id, band),
        cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                 FROM bk x JOIN bk y
                 ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id),
        mh_pairs AS (
          SELECT c.doc_a, c.doc_b,
                 SUM(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END) / ${DedupOps.K}.0
                   AS est_jaccard
          FROM cand c
          JOIN sig sa ON sa.doc_id = c.doc_a
          JOIN sig sb ON sb.doc_id = c.doc_b AND sb.i = sa.i
          GROUP BY c.doc_a, c.doc_b
          HAVING SUM(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END) / ${DedupOps.K}.0 >= 0.5)"""
  }

  def dedupMinhashSql: String =
    s"""WITH $minhashPairsCtes
        SELECT doc_a, doc_b, est_jaccard FROM mh_pairs"""

  /** Precision-audit twin (DedupOps.minhashPrecisionAudit): every
    * mh_pairs candidate re-judged by exact shingle-set Jaccard in
    * int64 ppm, true-positive at 0.5.
    */
  def dedupMinhashPrecisionSql: String =
    s"""WITH $minhashPairsCtes,
        sizes AS (SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY doc_id),
        inter AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter
                  FROM mh_pairs p
                  JOIN sh a ON a.doc_id = p.doc_a
                  JOIN sh b ON b.doc_id = p.doc_b AND b.sh = a.sh
                  GROUP BY p.doc_a, p.doc_b),
        j AS (SELECT p.doc_a, p.doc_b, p.est_jaccard,
                CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS n_inter,
                CAST(sa.nsh + sb.nsh - COALESCE(i.n_inter, 0) AS BIGINT)
                  AS n_union
              FROM mh_pairs p
              LEFT JOIN inter i
                ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
              JOIN sizes sa ON sa.doc_id = p.doc_a
              JOIN sizes sb ON sb.doc_id = p.doc_b)
        SELECT doc_a, doc_b, est_jaccard, n_inter, n_union,
               (n_inter * 1000000) // n_union AS true_ppm,
               CAST(CASE WHEN (n_inter * 1000000) // n_union >= 500000
                 THEN 1 ELSE 0 END AS BIGINT) AS true_pos
        FROM j"""

  /** Planted-pair recall twin of the text MinHash path: truth from the
    * dupCorpus construction, found from the shared mh_pairs chain.
    */
  def dedupMinhashRecallSql: String =
    s"""WITH $minhashPairsCtes,
        wc AS (SELECT doc_id,
                 len(list_filter(string_split_regex(text, '$Ws'),
                                 x -> x <> '')) AS n
               FROM documents WHERE text IS NOT NULL),
        truth AS (
          SELECT doc_id AS doc_a, doc_id + 1000000 AS doc_b,
                 'exact' AS pair_class
          FROM wc WHERE n >= 3
          UNION ALL
          SELECT doc_id, doc_id + 2000000, 'near' FROM wc WHERE n >= 4),
        j AS (SELECT t.pair_class,
                     CASE WHEN p.doc_a IS NULL THEN 0 ELSE 1 END AS hit
              FROM truth t LEFT JOIN mh_pairs p
                ON p.doc_a = t.doc_a AND p.doc_b = t.doc_b),
        g AS (SELECT pair_class, COUNT(*) AS n_truth,
                     CAST(SUM(hit) AS BIGINT) AS n_found
              FROM j GROUP BY pair_class)
        SELECT pair_class, n_truth, n_found,
               n_found * 1000000 // n_truth AS recall_ppm
        FROM g"""

  /** Temperature-mix twin: the same exact integer sqrt (IEEE sqrt with
    * the ±1 correction) and int64 share/allocation ratios.
    */
  def temperatureMixSql: String =
    s"""WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents
                   WHERE lang IS NOT NULL GROUP BY lang),
        f AS (SELECT lang, n_docs,
                CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS f0
              FROM c),
        w AS (SELECT lang, n_docs,
                CASE WHEN (f0 + 1) * (f0 + 1) <= n_docs THEN f0 + 1
                     WHEN f0 * f0 > n_docs THEN f0 - 1
                     ELSE f0 END AS isqrt
              FROM f),
        t AS (SELECT CAST(SUM(isqrt) AS BIGINT) AS tot_w,
                     CAST(SUM(n_docs) AS BIGINT) AS tot_docs
              FROM w)
        SELECT lang, n_docs, isqrt AS w_sqrt,
               n_docs * 1000000 // tot_docs AS nat_ppm,
               isqrt * 1000000 // tot_w AS temp_ppm,
               (tot_docs // 2) * isqrt // tot_w AS alloc_docs
        FROM w, t"""

  /** Incremental-index twin: replays the engine's persisted-index path
    * end-to-end from the base table — known-corpus signatures/band keys
    * and digests (what writeMinhashIndex materialized) plus arrivals
    * signatures, the cross-only band probe, the est ≥ 0.5 neighbor
    * count, and the digest hit — via the shared hash60/coefficient
    * literals, so the verdict table matches bit-for-bit.
    */
  def dedupMinhashIncrSql: String = {
    val coefValues = DedupOps.MinhashCoef
      .map { case (i, a, b, band, w31) => s"($i, $a, $b, $band, $w31)" }
      .mkString(", ")
    val p = DedupOps.P
    s"""WITH base AS (SELECT doc_id, text FROM documents),
        arrivals AS (
          SELECT doc_id + 1000000 AS doc_id, text FROM base
          WHERE doc_id % 3 = 0
          UNION ALL SELECT doc_id + 2000000,
            regexp_replace(text, '^\\S+\\s*', '') FROM base
          WHERE doc_id % 3 = 1
          UNION ALL SELECT doc_id + 3000000, reverse(text) FROM base
          WHERE doc_id % 3 = 2),
        corpus AS (SELECT doc_id, text FROM base WHERE text IS NOT NULL
                   UNION ALL
                   SELECT doc_id, text FROM arrivals WHERE text IS NOT NULL),
        ${shingle3CteOver("corpus")},
        hh AS (SELECT doc_id, ${hash60("sh")} % $p AS h FROM sh),
        coef AS (SELECT * FROM (VALUES $coefValues) t(i, a, b, band, w31)),
        sig AS (SELECT doc_id, i, MIN((a * h + b) % $p) AS m
                FROM hh CROSS JOIN coef GROUP BY doc_id, i),
        bk AS (SELECT doc_id, band, CAST(SUM(m * w31) AS BIGINT) AS bk
               FROM sig JOIN coef USING (i) GROUP BY doc_id, band),
        cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS k_id
                 FROM bk x JOIN bk y
                 ON x.band = y.band AND x.bk = y.bk
                AND x.doc_id >= 1000000 AND y.doc_id < 1000000),
        est AS (SELECT c.a_id, c.k_id
                FROM cand c
                JOIN sig sa ON sa.doc_id = c.a_id
                JOIN sig sb ON sb.doc_id = c.k_id AND sb.i = sa.i
                GROUP BY c.a_id, c.k_id
                HAVING SUM(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END)
                         / ${DedupOps.K}.0 >= 0.5),
        near AS (SELECT a_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_near
                 FROM est GROUP BY a_id),
        dig AS (SELECT DISTINCT md5(text) AS text_md5 FROM base
                WHERE text IS NOT NULL)
        SELECT a.doc_id,
               CAST(CASE WHEN d.text_md5 IS NOT NULL THEN 1 ELSE 0 END
                 AS BIGINT) AS exact_dup,
               COALESCE(n.n_near, 0) AS n_near,
               CAST(CASE WHEN d.text_md5 IS NULL AND n.n_near IS NULL
                 THEN 1 ELSE 0 END AS BIGINT) AS kept
        FROM arrivals a
        LEFT JOIN dig d ON md5(a.text) = d.text_md5
        LEFT JOIN near n ON n.doc_id = a.doc_id
        WHERE a.text IS NOT NULL"""
  }

  /** Index-update twin: replays BOTH daily cycles — the evens-built
    * index, batch-1 (odds) judgment, the survivor append, and the
    * batch-2 judgment against the UPDATED index (membership = evens ∪
    * batch-1 survivors) — all from the base table via the shared
    * signature chain. The +1M/+2M twins of surviving odds must be
    * caught, which only happens if the append semantics are replayed.
    */
  def dedupIndexUpdateSql: String = {
    val coefValues = DedupOps.MinhashCoef
      .map { case (i, a, b, band, w31) => s"($i, $a, $b, $band, $w31)" }
      .mkString(", ")
    val p = DedupOps.P
    s"""WITH base AS (SELECT doc_id, text FROM documents),
        evens AS (SELECT doc_id, text FROM base
                  WHERE doc_id % 2 = 0 AND text IS NOT NULL),
        odds AS (SELECT doc_id, text FROM base
                 WHERE doc_id % 2 = 1 AND text IS NOT NULL),
        b2 AS (SELECT doc_id + 1000000 AS doc_id, text FROM odds
               UNION ALL SELECT doc_id + 2000000,
                 regexp_replace(text, '^\\S+\\s*', '') FROM odds
               UNION ALL SELECT doc_id + 4000000, text FROM evens),
        corpus AS (SELECT doc_id, text FROM evens
                   UNION ALL SELECT doc_id, text FROM odds
                   UNION ALL SELECT doc_id, text FROM b2
                   WHERE text IS NOT NULL),
        ${shingle3CteOver("corpus")},
        hh AS (SELECT doc_id, ${hash60("sh")} % $p AS h FROM sh),
        coef AS (SELECT * FROM (VALUES $coefValues) t(i, a, b, band, w31)),
        sig AS (SELECT doc_id, i, MIN((a * h + b) % $p) AS m
                FROM hh CROSS JOIN coef GROUP BY doc_id, i),
        bk AS (SELECT doc_id, band, CAST(SUM(m * w31) AS BIGINT) AS bk
               FROM sig JOIN coef USING (i) GROUP BY doc_id, band),
        c1 AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS k_id
               FROM bk x JOIN bk y ON x.band = y.band AND x.bk = y.bk
               AND x.doc_id < 1000000 AND x.doc_id % 2 = 1
               AND y.doc_id < 1000000 AND y.doc_id % 2 = 0),
        e1 AS (SELECT c.a_id, c.k_id FROM c1 c
               JOIN sig sa ON sa.doc_id = c.a_id
               JOIN sig sb ON sb.doc_id = c.k_id AND sb.i = sa.i
               GROUP BY c.a_id, c.k_id
               HAVING SUM(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END)
                        / ${DedupOps.K}.0 >= 0.5),
        dige AS (SELECT DISTINCT md5(text) AS text_md5 FROM evens),
        surv AS (SELECT o.doc_id, o.text FROM odds o
                 LEFT JOIN dige d ON md5(o.text) = d.text_md5
                 LEFT JOIN (SELECT DISTINCT a_id FROM e1) n
                   ON n.a_id = o.doc_id
                 WHERE d.text_md5 IS NULL AND n.a_id IS NULL),
        idx2 AS (SELECT doc_id FROM evens
                 UNION ALL SELECT doc_id FROM surv),
        dig2 AS (SELECT text_md5 FROM dige
                 UNION SELECT DISTINCT md5(text) FROM surv),
        c2 AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS k_id
               FROM bk x JOIN bk y ON x.band = y.band AND x.bk = y.bk
               JOIN idx2 i ON i.doc_id = y.doc_id
               WHERE x.doc_id >= 1000000),
        e2 AS (SELECT c.a_id, c.k_id FROM c2 c
               JOIN sig sa ON sa.doc_id = c.a_id
               JOIN sig sb ON sb.doc_id = c.k_id AND sb.i = sa.i
               GROUP BY c.a_id, c.k_id
               HAVING SUM(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END)
                        / ${DedupOps.K}.0 >= 0.5),
        near2 AS (SELECT a_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_near
                  FROM e2 GROUP BY a_id)
        SELECT a.doc_id,
               CAST(CASE WHEN d.text_md5 IS NOT NULL THEN 1 ELSE 0 END
                 AS BIGINT) AS exact_dup,
               COALESCE(n.n_near, 0) AS n_near,
               CAST(CASE WHEN d.text_md5 IS NULL AND n.n_near IS NULL
                 THEN 1 ELSE 0 END AS BIGINT) AS kept
        FROM b2 a
        LEFT JOIN dig2 d ON md5(a.text) = d.text_md5
        LEFT JOIN near2 n ON n.doc_id = a.doc_id
        WHERE a.text IS NOT NULL"""
  }

  /** Incremental cluster-assignment twin: the known dup-corpus's
    * within-known pairs close into clusters via the recursive CTE (the
    * [[dedupClusterSql]] fixpoint), then every arrival takes the min
    * existing cluster over its cross matches — singleton matches
    * contribute their own id, unmatched arrivals their own — exactly
    * the assignment-only contract of
    * DedupOps.assignClustersIncremental.
    */
  def dedupClusterIncrSql: String =
    s"""WITH RECURSIVE $clusterIncrCtes
        SELECT doc_id, cluster, n_near FROM assigned"""

  /** Incremental canonical-maintenance twin: [[dedupClusterIncrSql]]'s
    * assignment CTEs, plus the incumbent ledger (clustered knowns elect
    * max-token/min-id via a windowed rank; singletons are their own
    * canonical) and the per-arrival dethrones / kept_existing /
    * new_cluster judgment with the post-batch canonical.
    */
  def dedupCanonicalIncrSql: String =
    s"""WITH RECURSIVE $clusterIncrCtes,
        ktoks AS (SELECT doc_id,
            CAST(len(list_filter(string_split_regex(text, '$Ws'),
              x -> x <> '')) AS BIGINT) AS n_tok
          FROM known WHERE text IS NOT NULL),
        atoks AS (SELECT doc_id,
            CAST(len(list_filter(string_split_regex(text, '$Ws'),
              x -> x <> '')) AS BIGINT) AS n_tok
          FROM arrivals WHERE text IS NOT NULL),
        elected AS (SELECT cluster, node AS canon_id, n_tok AS tok_kept
          FROM (SELECT kc.cluster, kc.node, kt.n_tok,
                  row_number() OVER (PARTITION BY kc.cluster
                    ORDER BY kt.n_tok DESC, kc.node ASC) AS rn
                FROM kclusters kc JOIN ktoks kt ON kt.doc_id = kc.node)
          WHERE rn = 1),
        singles AS (SELECT kt.doc_id AS cluster, kt.doc_id AS canon_id,
                           kt.n_tok AS tok_kept
          FROM ktoks kt LEFT JOIN kclusters kc ON kc.node = kt.doc_id
          WHERE kc.node IS NULL),
        ledger AS (SELECT * FROM elected
                   UNION ALL SELECT * FROM singles)
        SELECT s.doc_id, s.cluster, s.n_near, t.n_tok,
               CASE WHEN l.canon_id IS NULL THEN 'new_cluster'
                    WHEN t.n_tok > l.tok_kept
                      OR (t.n_tok = l.tok_kept AND s.doc_id < l.canon_id)
                      THEN 'dethrones'
                    ELSE 'kept_existing' END AS verdict,
               CASE WHEN l.canon_id IS NULL OR t.n_tok > l.tok_kept
                      OR (t.n_tok = l.tok_kept AND s.doc_id < l.canon_id)
                      THEN s.doc_id ELSE l.canon_id END AS new_canon_id
        FROM assigned s JOIN atoks t USING (doc_id)
        LEFT JOIN ledger l ON l.cluster = s.cluster"""

  /** Streaming canonical-maintenance twin: a TWO-PHASE replay. Phase 1
    * judges batch 1 against the evens-built index/map/ledger; the
    * ledger then upserts (per touched cluster, the better of old
    * incumbent and best batch-1 arrival) and the cluster map gains
    * batch 1's assignments — so phase 2 judges batch 2 against the
    * UPDATED state, exactly the in-stream maintenance
    * StreamOps.canonicalIngestReplay performs per micro-batch.
    */
  def canonicalStreamSql: String = {
    val coefValues = DedupOps.MinhashCoef
      .map { case (i, a, b, band, w31) => s"($i, $a, $b, $band, $w31)" }
      .mkString(", ")
    val p = DedupOps.P
    def verdict(assigned: String, ledger: String) =
      s"""SELECT s.doc_id, s.cluster, s.n_near, t.n_tok,
               CASE WHEN l.canon_id IS NULL THEN 'new_cluster'
                    WHEN t.n_tok > l.tok_kept
                      OR (t.n_tok = l.tok_kept AND s.doc_id < l.canon_id)
                      THEN 'dethrones'
                    ELSE 'kept_existing' END AS verdict,
               CASE WHEN l.canon_id IS NULL OR t.n_tok > l.tok_kept
                      OR (t.n_tok = l.tok_kept AND s.doc_id < l.canon_id)
                      THEN s.doc_id ELSE l.canon_id END AS new_canon_id
        FROM $assigned s JOIN toks t USING (doc_id)
        LEFT JOIN $ledger l ON l.cluster = s.cluster"""
    s"""WITH RECURSIVE base AS (SELECT doc_id, text FROM documents),
        known AS (SELECT doc_id, text FROM base
                  WHERE doc_id % 2 = 0 AND text IS NOT NULL),
        b1 AS (SELECT doc_id + 1000000 AS doc_id, text || ' zzz' AS text
               FROM base WHERE doc_id % 4 = 0 AND text IS NOT NULL
               UNION ALL SELECT doc_id + 1500000, text FROM base
               WHERE doc_id % 4 = 1 AND text IS NOT NULL),
        b2 AS (SELECT doc_id + 2000000 AS doc_id, text || ' zzz' AS text
               FROM base WHERE doc_id % 4 = 0 AND text IS NOT NULL
               UNION ALL SELECT doc_id + 2500000, text FROM base
               WHERE doc_id % 4 = 1 AND text IS NOT NULL),
        corpus AS (SELECT * FROM known UNION ALL SELECT * FROM b1
                   UNION ALL SELECT * FROM b2),
        ${shingle3CteOver("corpus")},
        hh AS (SELECT doc_id, ${hash60("sh")} % $p AS h FROM sh),
        coef AS (SELECT * FROM (VALUES $coefValues) t(i, a, b, band, w31)),
        sig AS (SELECT doc_id, i, MIN((a * h + b) % $p) AS m
                FROM hh CROSS JOIN coef GROUP BY doc_id, i),
        bk AS (SELECT doc_id, band, CAST(SUM(m * w31) AS BIGINT) AS bk
               FROM sig JOIN coef USING (i) GROUP BY doc_id, band),
        toks AS (SELECT doc_id,
            CAST(len(list_filter(string_split_regex(text, '$Ws'),
              x -> x <> '')) AS BIGINT) AS n_tok
          FROM corpus),
        kcand AS (SELECT DISTINCT x.doc_id AS u, y.doc_id AS v
                  FROM bk x JOIN bk y ON x.band = y.band AND x.bk = y.bk
                  AND x.doc_id < y.doc_id AND y.doc_id < 1000000),
        kpairs AS (SELECT c.u, c.v FROM kcand c
                   JOIN sig sa ON sa.doc_id = c.u
                   JOIN sig sb ON sb.doc_id = c.v AND sb.i = sa.i
                   GROUP BY c.u, c.v
                   HAVING SUM(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END)
                            / ${DedupOps.K}.0 >= 0.5),
        und AS (SELECT u, v FROM kpairs UNION ALL SELECT v, u FROM kpairs),
        reach(node, lbl) AS (
          SELECT u, u FROM und
          UNION
          SELECT e.v, r.lbl FROM und e JOIN reach r ON r.node = e.u),
        kclusters AS (SELECT node, MIN(lbl) AS cluster
                      FROM reach GROUP BY node),
        elected0 AS (SELECT cluster, node AS canon_id, n_tok AS tok_kept
          FROM (SELECT kc.cluster, kc.node, t.n_tok,
                  row_number() OVER (PARTITION BY kc.cluster
                    ORDER BY t.n_tok DESC, kc.node ASC) AS rn
                FROM kclusters kc JOIN toks t ON t.doc_id = kc.node)
          WHERE rn = 1),
        singles0 AS (SELECT k.doc_id AS cluster, k.doc_id AS canon_id,
                            t.n_tok AS tok_kept
          FROM known k JOIN toks t ON t.doc_id = k.doc_id
          LEFT JOIN kclusters kc ON kc.node = k.doc_id
          WHERE kc.node IS NULL),
        ledger0 AS (SELECT * FROM elected0
                    UNION ALL SELECT * FROM singles0),
        xm1c AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS k_id
                 FROM bk x JOIN bk y ON x.band = y.band AND x.bk = y.bk
                 WHERE x.doc_id >= 1000000 AND x.doc_id < 2000000
                   AND y.doc_id < 1000000),
        xm1 AS (SELECT c.a_id, c.k_id FROM xm1c c
                JOIN sig sa ON sa.doc_id = c.a_id
                JOIN sig sb ON sb.doc_id = c.k_id AND sb.i = sa.i
                GROUP BY c.a_id, c.k_id
                HAVING SUM(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END)
                         / ${DedupOps.K}.0 >= 0.5),
        assigned1 AS (SELECT a.doc_id,
               COALESCE(MIN(COALESCE(kc.cluster, m.k_id)), a.doc_id)
                 AS cluster,
               CAST(COUNT(m.k_id) AS BIGINT) AS n_near
          FROM b1 a
          LEFT JOIN xm1 m ON m.a_id = a.doc_id
          LEFT JOIN kclusters kc ON kc.node = m.k_id
          GROUP BY a.doc_id),
        v1 AS (${verdict("assigned1", "ledger0")}),
        bestArr1 AS (SELECT cluster, node AS a_id, a_tok
          FROM (SELECT s.cluster, s.doc_id AS node, t.n_tok AS a_tok,
                  row_number() OVER (PARTITION BY s.cluster
                    ORDER BY t.n_tok DESC, s.doc_id ASC) AS rn
                FROM assigned1 s JOIN toks t USING (doc_id))
          WHERE rn = 1),
        ledger1 AS (SELECT COALESCE(l.cluster, b.cluster) AS cluster,
               CASE WHEN b.a_id IS NULL THEN l.canon_id
                    WHEN l.canon_id IS NULL OR b.a_tok > l.tok_kept
                      OR (b.a_tok = l.tok_kept AND b.a_id < l.canon_id)
                      THEN b.a_id
                    ELSE l.canon_id END AS canon_id,
               CASE WHEN b.a_id IS NULL THEN l.tok_kept
                    WHEN l.canon_id IS NULL OR b.a_tok > l.tok_kept
                      OR (b.a_tok = l.tok_kept AND b.a_id < l.canon_id)
                      THEN b.a_tok
                    ELSE l.tok_kept END AS tok_kept
          FROM ledger0 l FULL JOIN bestArr1 b ON b.cluster = l.cluster),
        map1 AS (SELECT node, cluster FROM kclusters
                 UNION ALL SELECT doc_id AS node, cluster FROM assigned1),
        xm2c AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS k_id
                 FROM bk x JOIN bk y ON x.band = y.band AND x.bk = y.bk
                 WHERE x.doc_id >= 2000000 AND y.doc_id < 2000000),
        xm2 AS (SELECT c.a_id, c.k_id FROM xm2c c
                JOIN sig sa ON sa.doc_id = c.a_id
                JOIN sig sb ON sb.doc_id = c.k_id AND sb.i = sa.i
                GROUP BY c.a_id, c.k_id
                HAVING SUM(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END)
                         / ${DedupOps.K}.0 >= 0.5),
        assigned2 AS (SELECT a.doc_id,
               COALESCE(MIN(COALESCE(m1.cluster, m.k_id)), a.doc_id)
                 AS cluster,
               CAST(COUNT(m.k_id) AS BIGINT) AS n_near
          FROM b2 a
          LEFT JOIN xm2 m ON m.a_id = a.doc_id
          LEFT JOIN map1 m1 ON m1.node = m.k_id
          GROUP BY a.doc_id),
        v2 AS (${verdict("assigned2", "ledger1")})
        SELECT * FROM v1 UNION ALL SELECT * FROM v2"""
  }

  /** The shared known/arrivals minhash CTE chain ending at `assigned`
    * (per-arrival cluster + near count) — one source of truth for
    * [[dedupClusterIncrSql]] and [[dedupCanonicalIncrSql]].
    */
  private def clusterIncrCtes: String = {
    val coefValues = DedupOps.MinhashCoef
      .map { case (i, a, b, band, w31) => s"($i, $a, $b, $band, $w31)" }
      .mkString(", ")
    val p = DedupOps.P
    s"""base AS (SELECT doc_id, text FROM documents),
        known AS (
          SELECT doc_id, text FROM base
          UNION ALL SELECT doc_id + 1000000, text FROM base
          UNION ALL SELECT doc_id + 2000000,
            regexp_replace(text, '^\\S+\\s*', '') FROM base),
        arrivals AS (
          SELECT doc_id + 3000000 AS doc_id,
                 regexp_replace(text, '\\s*\\S+$$', '') AS text
          FROM base WHERE doc_id % 3 = 0
          UNION ALL SELECT doc_id + 4000000, text FROM base
          WHERE doc_id % 3 = 1
          UNION ALL SELECT doc_id + 5000000, reverse(text) FROM base
          WHERE doc_id % 3 = 2),
        corpus AS (SELECT doc_id, text FROM known WHERE text IS NOT NULL
                   UNION ALL
                   SELECT doc_id, text FROM arrivals WHERE text IS NOT NULL),
        ${shingle3CteOver("corpus")},
        hh AS (SELECT doc_id, ${hash60("sh")} % $p AS h FROM sh),
        coef AS (SELECT * FROM (VALUES $coefValues) t(i, a, b, band, w31)),
        sig AS (SELECT doc_id, i, MIN((a * h + b) % $p) AS m
                FROM hh CROSS JOIN coef GROUP BY doc_id, i),
        bk AS (SELECT doc_id, band, CAST(SUM(m * w31) AS BIGINT) AS bk
               FROM sig JOIN coef USING (i) GROUP BY doc_id, band),
        kcand AS (SELECT DISTINCT x.doc_id AS u, y.doc_id AS v
                  FROM bk x JOIN bk y ON x.band = y.band AND x.bk = y.bk
                  AND x.doc_id < y.doc_id AND y.doc_id < 3000000),
        kpairs AS (SELECT c.u, c.v FROM kcand c
                   JOIN sig sa ON sa.doc_id = c.u
                   JOIN sig sb ON sb.doc_id = c.v AND sb.i = sa.i
                   GROUP BY c.u, c.v
                   HAVING SUM(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END)
                            / ${DedupOps.K}.0 >= 0.5),
        und AS (SELECT u, v FROM kpairs UNION ALL SELECT v, u FROM kpairs),
        reach(node, lbl) AS (
          SELECT u, u FROM und
          UNION
          SELECT e.v, r.lbl FROM und e JOIN reach r ON r.node = e.u),
        kclusters AS (SELECT node, MIN(lbl) AS cluster
                      FROM reach GROUP BY node),
        xcand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS k_id
                  FROM bk x JOIN bk y ON x.band = y.band AND x.bk = y.bk
                  AND x.doc_id >= 3000000 AND y.doc_id < 3000000),
        xm AS (SELECT c.a_id, c.k_id FROM xcand c
               JOIN sig sa ON sa.doc_id = c.a_id
               JOIN sig sb ON sb.doc_id = c.k_id AND sb.i = sa.i
               GROUP BY c.a_id, c.k_id
               HAVING SUM(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END)
                        / ${DedupOps.K}.0 >= 0.5),
        assigned AS (SELECT a.doc_id,
               COALESCE(MIN(COALESCE(kc.cluster, m.k_id)), a.doc_id)
                 AS cluster,
               CAST(COUNT(m.k_id) AS BIGINT) AS n_near
        FROM arrivals a
        LEFT JOIN xm m ON m.a_id = a.doc_id
        LEFT JOIN kclusters kc ON kc.node = m.k_id
        WHERE a.text IS NOT NULL
        GROUP BY a.doc_id)"""
  }

  /** Streaming index-ingest twin: the [[dedupIndexUpdateSql]] two-phase
    * replay with the stream's batch composition — batch 0 verdicts (the
    * odds vs the evens index) are PART OF THE OUTPUT, and batch 1 (the
    * +1M exact / +1.5M near twins of those odds) is judged against
    * evens ∪ batch-0 survivors, i.e. the in-stream index update.
    */
  def dedupStreamIngestSql: String = {
    val coefValues = DedupOps.MinhashCoef
      .map { case (i, a, b, band, w31) => s"($i, $a, $b, $band, $w31)" }
      .mkString(", ")
    val p = DedupOps.P
    s"""WITH base AS (SELECT doc_id, text FROM documents),
        evens AS (SELECT doc_id, text FROM base
                  WHERE doc_id % 2 = 0 AND text IS NOT NULL),
        odds AS (SELECT doc_id, text FROM base
                 WHERE doc_id % 2 = 1 AND text IS NOT NULL),
        b2 AS (SELECT doc_id + 1000000 AS doc_id, text FROM odds
               UNION ALL SELECT doc_id + 1500000,
                 regexp_replace(text, '^\\S+\\s*', '') FROM odds),
        corpus AS (SELECT doc_id, text FROM evens
                   UNION ALL SELECT doc_id, text FROM odds
                   UNION ALL SELECT doc_id, text FROM b2
                   WHERE text IS NOT NULL),
        ${shingle3CteOver("corpus")},
        hh AS (SELECT doc_id, ${hash60("sh")} % $p AS h FROM sh),
        coef AS (SELECT * FROM (VALUES $coefValues) t(i, a, b, band, w31)),
        sig AS (SELECT doc_id, i, MIN((a * h + b) % $p) AS m
                FROM hh CROSS JOIN coef GROUP BY doc_id, i),
        bk AS (SELECT doc_id, band, CAST(SUM(m * w31) AS BIGINT) AS bk
               FROM sig JOIN coef USING (i) GROUP BY doc_id, band),
        c1 AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS k_id
               FROM bk x JOIN bk y ON x.band = y.band AND x.bk = y.bk
               AND x.doc_id < 1000000 AND x.doc_id % 2 = 1
               AND y.doc_id < 1000000 AND y.doc_id % 2 = 0),
        e1 AS (SELECT c.a_id, c.k_id FROM c1 c
               JOIN sig sa ON sa.doc_id = c.a_id
               JOIN sig sb ON sb.doc_id = c.k_id AND sb.i = sa.i
               GROUP BY c.a_id, c.k_id
               HAVING SUM(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END)
                        / ${DedupOps.K}.0 >= 0.5),
        near1 AS (SELECT a_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_near
                  FROM e1 GROUP BY a_id),
        dige AS (SELECT DISTINCT md5(text) AS text_md5 FROM evens),
        v1 AS (SELECT o.doc_id,
                 CAST(CASE WHEN d.text_md5 IS NOT NULL THEN 1 ELSE 0 END
                   AS BIGINT) AS exact_dup,
                 COALESCE(n.n_near, 0) AS n_near,
                 CAST(CASE WHEN d.text_md5 IS NULL AND n.n_near IS NULL
                   THEN 1 ELSE 0 END AS BIGINT) AS kept
               FROM odds o
               LEFT JOIN dige d ON md5(o.text) = d.text_md5
               LEFT JOIN near1 n ON n.doc_id = o.doc_id),
        surv AS (SELECT o.doc_id, o.text FROM odds o
                 JOIN v1 ON v1.doc_id = o.doc_id AND v1.kept = 1),
        idx2 AS (SELECT doc_id FROM evens
                 UNION ALL SELECT doc_id FROM surv),
        dig2 AS (SELECT text_md5 FROM dige
                 UNION SELECT DISTINCT md5(text) FROM surv),
        c2 AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS k_id
               FROM bk x JOIN bk y ON x.band = y.band AND x.bk = y.bk
               JOIN idx2 i ON i.doc_id = y.doc_id
               WHERE x.doc_id >= 1000000),
        e2 AS (SELECT c.a_id, c.k_id FROM c2 c
               JOIN sig sa ON sa.doc_id = c.a_id
               JOIN sig sb ON sb.doc_id = c.k_id AND sb.i = sa.i
               GROUP BY c.a_id, c.k_id
               HAVING SUM(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END)
                        / ${DedupOps.K}.0 >= 0.5),
        near2 AS (SELECT a_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_near
                  FROM e2 GROUP BY a_id),
        v2 AS (SELECT a.doc_id,
                 CAST(CASE WHEN d.text_md5 IS NOT NULL THEN 1 ELSE 0 END
                   AS BIGINT) AS exact_dup,
                 COALESCE(n.n_near, 0) AS n_near,
                 CAST(CASE WHEN d.text_md5 IS NULL AND n.n_near IS NULL
                   THEN 1 ELSE 0 END AS BIGINT) AS kept
               FROM b2 a
               LEFT JOIN dig2 d ON md5(a.text) = d.text_md5
               LEFT JOIN near2 n ON n.doc_id = a.doc_id
               WHERE a.text IS NOT NULL)
        SELECT * FROM v1 UNION ALL SELECT * FROM v2"""
  }

  /** Cross-corpus near-dup decontamination twin: the identical
    * shingle → signature → band chain as [[dedupMinhashSql]], over the
    * train/eval/planted cross corpus, with the candidate join
    * restricted to cross-boundary pairs (train id < 5e6 ≤ eval id).
    */
  def decontamNearSql: String = {
    val coefValues = DedupOps.MinhashCoef
      .map { case (i, a, b, band, w31) => s"($i, $a, $b, $band, $w31)" }
      .mkString(", ")
    val p = DedupOps.P
    s"""WITH base AS (SELECT doc_id, text,
             CAST(substr(source, 4, 10) AS INT) AS si FROM documents),
        corpus AS (
          SELECT doc_id, text FROM base WHERE si < 10
          UNION ALL SELECT doc_id + 5000000, text FROM base WHERE si >= 10
          UNION ALL SELECT doc_id + 6000000,
            regexp_replace(text, '^\\S+\\s*', '') AS text
          FROM base WHERE si < 10 AND doc_id % 37 = 0),
        $shingle3Cte,
        hh AS (SELECT doc_id, ${hash60("sh")} % $p AS h FROM sh),
        coef AS (SELECT * FROM (VALUES $coefValues) t(i, a, b, band, w31)),
        sig AS (SELECT doc_id, i, MIN((a * h + b) % $p) AS m
                FROM hh CROSS JOIN coef GROUP BY doc_id, i),
        bk AS (SELECT doc_id, band, CAST(SUM(m * w31) AS BIGINT) AS bk
               FROM sig JOIN coef USING (i) GROUP BY doc_id, band),
        cand AS (SELECT DISTINCT x.doc_id AS train_id, y.doc_id AS eval_id
                 FROM bk x JOIN bk y
                 ON x.band = y.band AND x.bk = y.bk
                AND x.doc_id < 5000000 AND y.doc_id >= 5000000),
        mh_pairs AS (
          SELECT c.train_id, c.eval_id,
                 SUM(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END) / ${DedupOps.K}.0
                   AS est_jaccard
          FROM cand c
          JOIN sig sa ON sa.doc_id = c.train_id
          JOIN sig sb ON sb.doc_id = c.eval_id AND sb.i = sa.i
          GROUP BY c.train_id, c.eval_id
          HAVING SUM(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END) / ${DedupOps.K}.0 >= 0.5)
        SELECT train_id, eval_id, est_jaccard FROM mh_pairs"""
  }

  /** Dedup-cluster twin: transitive closure of the near-dup pairs via a
    * recursive CTE (UNION set semantics terminates on cycles); each
    * node's cluster is the minimum reachable doc id — the same fixed
    * point GraphOps.connectedComponents converges to.
    */
  def dedupClusterSql: String =
    s"""WITH RECURSIVE $minhashPairsCtes,
        und AS (SELECT doc_a AS u, doc_b AS v FROM mh_pairs
                UNION ALL SELECT doc_b, doc_a FROM mh_pairs),
        reach(node, lbl) AS (
          SELECT u, u FROM und
          UNION
          SELECT e.v, r.lbl FROM und e JOIN reach r ON r.node = e.u)
        SELECT node, MIN(lbl) AS cluster FROM reach GROUP BY node"""

  /** Canonical-copy twin: the cluster fixpoint of [[dedupClusterSql]],
    * then per cluster the member with the most tokens (ties → smallest
    * id) via a windowed rank — the same election DedupOps.dedupCanonical
    * takes with its max(struct) argmax.
    */
  def dedupCanonicalSql: String =
    s"""WITH RECURSIVE $minhashPairsCtes,
        und AS (SELECT doc_a AS u, doc_b AS v FROM mh_pairs
                UNION ALL SELECT doc_b, doc_a FROM mh_pairs),
        reach(node, lbl) AS (
          SELECT u, u FROM und
          UNION
          SELECT e.v, r.lbl FROM und e JOIN reach r ON r.node = e.u),
        cl AS (SELECT node, MIN(lbl) AS cluster FROM reach GROUP BY node),
        toks AS (SELECT doc_id,
          CAST(len(list_filter(string_split_regex(text, '$Ws'),
            x -> x <> '')) AS BIGINT) AS n_tok
          FROM corpus WHERE text IS NOT NULL),
        j AS (SELECT cl.cluster, cl.node, t.n_tok
              FROM cl JOIN toks t ON t.doc_id = cl.node),
        rk AS (SELECT cluster, node, n_tok,
                 row_number() OVER (PARTITION BY cluster
                   ORDER BY n_tok DESC, node ASC) AS rn,
                 CAST(SUM(n_tok) OVER (PARTITION BY cluster) AS BIGINT)
                   AS sum_tok,
                 COUNT(*) OVER (PARTITION BY cluster) AS n_docs
               FROM j)
        SELECT cluster, node AS canon_id, n_docs, n_tok AS tok_kept,
               sum_tok - n_tok AS tok_dropped
        FROM rk WHERE rn = 1"""

  def dedupSimhashSql: String = {
    val bitsValues =
      (0 until DedupOps.SimhashBits).map(i => s"($i, ${1L << i})").mkString(", ")
    val bandMod = 1 << DedupOps.SimhashBandBits
    val byteValues = (0 until DedupOps.SimhashBands)
      .map(j => s"($j, ${1L << (DedupOps.SimhashBandBits * j)})").mkString(", ")
    s"""WITH $corpusCte,
        toks AS (SELECT doc_id, w, COUNT(*) AS cnt FROM (
                   SELECT doc_id, unnest(
                     list_filter(string_split_regex(text, '$Ws'), x -> x <> ''))
                     AS w FROM corpus)
                 GROUP BY doc_id, w),
        th AS (SELECT doc_id, cnt, ${hash60("w")} AS h FROM toks),
        bits AS (SELECT * FROM (VALUES $bitsValues) t(i, p2)),
        sb AS (SELECT doc_id, i, p2,
                      CAST(SUM(cnt * (((h // p2) % 2) * 2 - 1)) AS BIGINT) AS s
               FROM th CROSS JOIN bits GROUP BY doc_id, i, p2),
        sh AS (SELECT doc_id,
                      CAST(SUM(CASE WHEN s > 0 THEN p2 ELSE 0 END) AS BIGINT)
                        AS simhash
               FROM sb GROUP BY doc_id),
        bytes AS (SELECT * FROM (VALUES $byteValues) t(j, d)),
        bands AS (SELECT doc_id, simhash, j, (simhash // d) % $bandMod AS key
                  FROM sh CROSS JOIN bytes),
        pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
                         CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT)
                           AS hamming
                  FROM bands x JOIN bands y
                  ON x.j = y.j AND x.key = y.key AND x.doc_id < y.doc_id)
        SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 3"""
  }

  def dedupNgramSql: String =
    s"""WITH $corpusCte,
        words AS (SELECT doc_id,
          list_filter(string_split_regex(text, '$Ws'), x -> x <> '') AS w
        FROM corpus),
        s AS (SELECT DISTINCT doc_id, ${hash60("g")} AS sh FROM (
          SELECT doc_id, unnest(CASE WHEN len(w) >= 2
            THEN list_transform(range(1, len(w)), j -> w[j] || ' ' || w[j+1])
            ELSE CAST([] AS VARCHAR[]) END) AS g
          FROM words)),
        rare AS (SELECT sh FROM (SELECT sh, COUNT(*) AS df FROM s GROUP BY sh)
                 WHERE df <= 100),
        sr AS (SELECT s.doc_id, s.sh FROM s JOIN rare USING (sh)),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sr GROUP BY doc_id),
        inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
                         COUNT(*) AS inter
                  FROM sr x JOIN sr y
                  ON x.sh = y.sh AND x.doc_id < y.doc_id
                  GROUP BY x.doc_id, y.doc_id)
        SELECT i.doc_a, i.doc_b, i.inter,
               CAST(i.inter AS DOUBLE) / (a.n + b.n - i.inter) AS jacc
        FROM inter i
        JOIN sizes a ON a.doc_id = i.doc_a
        JOIN sizes b ON b.doc_id = i.doc_b
        WHERE CAST(i.inter AS DOUBLE) / (a.n + b.n - i.inter) >= 0.6"""

  /** Paragraph-dedup twin: 10-word chunk paragraphs over the dup corpus,
    * keeper = first (doc_id, idx) per md5 via a window, reassembly via
    * ordered list aggregation. Parallel unnest of two same-length lists
    * zips in DuckDB, giving (idx, para) aligned pairs.
    */
  def dedupParagraphSql: String =
    s"""WITH $corpusCte,
        words AS (SELECT doc_id,
          list_filter(string_split_regex(text, '$Ws'), x -> x <> '') AS w
        FROM corpus WHERE text IS NOT NULL),
        nz AS (SELECT doc_id, w, (len(w) + 9) // 10 AS nc
               FROM words WHERE len(w) > 0),
        p AS (SELECT doc_id,
                unnest(range(nc)) AS idx,
                unnest(list_transform(range(nc),
                  i -> array_to_string(list_slice(w, i*10 + 1, i*10 + 10), ' ')))
                  AS para
              FROM nz),
        k AS (SELECT doc_id, idx, para,
                row_number() OVER (PARTITION BY md5(para)
                                   ORDER BY doc_id, idx) AS rn
              FROM p)
        SELECT doc_id, COUNT(*) AS n_kept,
               array_to_string(list(para ORDER BY idx), ' ') AS text_kept
        FROM k WHERE rn = 1 GROUP BY doc_id"""

  /** Incremental-dedup twin (also the bloom-prefilter oracle — the bloom
    * is a prefilter, not a semantics change, so the exact result is the
    * same digest anti join).
    */
  def dedupIncrementalSql: String =
    s"""WITH $corpusCte,
        known AS (SELECT DISTINCT md5(text) AS text_md5 FROM documents
                  WHERE doc_id < 250 AND text IS NOT NULL)
        SELECT doc_id FROM corpus
        WHERE text IS NOT NULL
          AND md5(text) NOT IN (SELECT text_md5 FROM known)"""

  /** Decontamination twin: word 8-grams, benchmark = doc_id % 50 = 0 over
    * plain documents, train = the dup corpus. range(1, len-6) is empty
    * whenever the doc has fewer than 8 words, so no CASE guard is needed.
    */
  def decontamSql: String = {
    val gram = (0 until 8).map(o => s"w[j+$o]").mkString(" || ' ' || ")
    s"""WITH $corpusCte,
        bw AS (SELECT list_filter(string_split_regex(text, '$Ws'),
                 x -> x <> '') AS w
               FROM documents WHERE doc_id % 50 = 0 AND text IS NOT NULL),
        bs AS (SELECT DISTINCT ${hash60("g")} AS h FROM (
                SELECT unnest(list_transform(range(1, len(w) - 6),
                  j -> $gram)) AS g
                FROM bw)),
        tw AS (SELECT doc_id, list_filter(string_split_regex(text, '$Ws'),
                 x -> x <> '') AS w
               FROM corpus WHERE text IS NOT NULL),
        ts AS (SELECT doc_id, ${hash60("g")} AS h FROM (
                SELECT doc_id, unnest(list_transform(range(1, len(w) - 6),
                  j -> $gram)) AS g
                FROM tw))
        SELECT doc_id, COUNT(DISTINCT h) AS n_hits
        FROM ts JOIN bs USING (h) GROUP BY doc_id"""
  }

  /** Pack-layout twin: prefix sum over doc_id order, integer window
    * arithmetic. DuckDB SUM over BIGINT yields HUGEINT — cast back so //
    * stays in int64 like Spark's `div`.
    */
  def packSql: String =
    s"""WITH t AS (SELECT doc_id,
          CAST(len(list_filter(string_split_regex(text, '$Ws'),
            x -> x <> '')) AS BIGINT) AS n_tok
        FROM documents WHERE text IS NOT NULL),
        s AS (SELECT doc_id, n_tok,
          CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS start_off
        FROM t)
        SELECT doc_id, n_tok, start_off,
               (start_off // 256) AS chunk_first,
               (greatest(start_off, start_off + n_tok - 1) // 256)
                 AS chunk_last,
               (greatest(start_off, start_off + n_tok - 1) // 256)
                 - (start_off // 256) + 1 AS n_chunks
        FROM s"""

  /** Apportionment twin: the temperatureMix integer-sqrt weights, then
    * Hamilton largest-remainder — floor shares plus one extra to the
    * top integer remainders (ties lang ascending).
    */
  def mixApportionSql: String =
    s"""WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents
                   WHERE lang IS NOT NULL GROUP BY lang),
        w AS (SELECT lang, n_docs,
                CASE WHEN (f0 + 1) * (f0 + 1) <= n_docs THEN f0 + 1
                     WHEN f0 * f0 > n_docs THEN f0 - 1
                     ELSE f0 END AS w_sqrt
              FROM (SELECT lang, n_docs,
                      CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT)
                        AS f0 FROM c)),
        tot AS (SELECT CAST(SUM(w_sqrt) AS BIGINT) AS tot_w,
                       CAST(SUM(n_docs) AS BIGINT) AS tot_docs FROM w),
        s AS (SELECT lang, n_docs, w_sqrt,
                tot_docs // 2 AS budget,
                (tot_docs // 2) * w_sqrt // tot_w AS alloc_base,
                (tot_docs // 2) * w_sqrt % tot_w AS rem
              FROM w, tot),
        sh AS (SELECT CAST(budget - SUM(alloc_base) AS BIGINT) AS n_extra
               FROM s GROUP BY budget),
        r AS (SELECT s.*, CAST(row_number() OVER
                (ORDER BY rem DESC, lang ASC) AS BIGINT) AS rk FROM s)
        SELECT lang, n_docs, w_sqrt, alloc_base,
               CAST(CASE WHEN rk <= n_extra THEN 1 ELSE 0 END AS BIGINT)
                 AS extra,
               alloc_base +
                 CAST(CASE WHEN rk <= n_extra THEN 1 ELSE 0 END AS BIGINT)
                 AS alloc_docs
        FROM r, sh"""

  /** Shard-balance twin: global token-desc rank via one window (the
    * oracle may sort globally; the engine's bucket trick produces the
    * identical total order), serpentine deal, per-shard rollup.
    */
  def shardBalanceSql: String =
    s"""WITH t AS (SELECT doc_id,
          CAST(len(list_filter(string_split_regex(text, '$Ws'),
            x -> x <> '')) AS BIGINT) AS n_tok
        FROM documents WHERE text IS NOT NULL),
        tp AS (SELECT * FROM t WHERE n_tok > 0),
        r AS (SELECT doc_id, n_tok,
                CAST(row_number() OVER (ORDER BY n_tok DESC, doc_id ASC)
                  AS BIGINT) - 1 AS rk
              FROM tp),
        a AS (SELECT n_tok,
                CASE WHEN (rk // 8) % 2 = 0 THEN rk % 8
                     ELSE 7 - rk % 8 END AS shard
              FROM r),
        tot AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS tot_tok FROM a)
        SELECT shard, COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
               MAX(n_tok) AS max_tok,
               CAST(SUM(n_tok) AS BIGINT) * 8 * 1000000 // tot_tok
                 AS bal_ppm
        FROM a, tot GROUP BY shard, tot_tok"""

  /** Span-mask twin: every mask decision re-derived from the shared
    * md5-prefix hash of "<doc_id>:<position>" — start iff hash%100 < 15,
    * masked iff any of positions t, t−1, t−2 started.
    */
  def spanMaskSql: String = {
    def h(e: String) =
      s"${hash60(s"CAST(doc_id AS VARCHAR) || ':' || CAST($e AS VARCHAR)")} % 100 < 15"
    s"""WITH t AS (SELECT doc_id,
          CAST(len(list_filter(string_split_regex(text, '$Ws'),
            x -> x <> '')) AS BIGINT) AS n_tok
        FROM documents WHERE text IS NOT NULL),
        tp AS (SELECT * FROM t WHERE n_tok > 0),
        pos AS (SELECT doc_id, n_tok, unnest(range(0, n_tok)) AS t
                FROM tp),
        f AS (SELECT doc_id, n_tok,
                CASE WHEN ${h("t")} THEN 1 ELSE 0 END AS is_start,
                CASE WHEN ${h("t")}
                       OR (t >= 1 AND ${h("t - 1")})
                       OR (t >= 2 AND ${h("t - 2")})
                     THEN 1 ELSE 0 END AS is_masked
              FROM pos)
        SELECT doc_id, MAX(n_tok) AS n_tok,
               CAST(SUM(is_start) AS BIGINT) AS n_spans,
               CAST(SUM(is_masked) AS BIGINT) AS n_masked,
               CAST(SUM(is_masked) AS BIGINT) * 1000000 // MAX(n_tok)
                 AS mask_ppm
        FROM f GROUP BY doc_id"""
  }

  /** Vocab-coverage twin: top-10 corpus vocabulary (count desc, word asc —
    * the deterministic tie-break both engines share), per-doc OOV fraction.
    */
  def vocabCoverageSql: String =
    s"""WITH toks AS (SELECT doc_id,
          unnest(list_filter(string_split_regex(text, '$Ws'),
            x -> x <> '')) AS w
        FROM documents WHERE text IS NOT NULL),
        vocab AS (SELECT w FROM (
          SELECT w, COUNT(*) AS cnt FROM toks GROUP BY w
          ORDER BY cnt DESC, w ASC LIMIT 10)),
        a AS (SELECT t.doc_id, COUNT(*) AS n_tok,
                CAST(SUM(CASE WHEN v.w IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_in_vocab
              FROM toks t LEFT JOIN vocab v USING (w)
              GROUP BY t.doc_id)
        SELECT doc_id, n_tok, n_in_vocab,
               CAST(n_tok - n_in_vocab AS DOUBLE) / n_tok AS oov_frac
        FROM a"""

  /** Weighted-sample twin: keep prob ∝ n_chars (capped), hash-keyed. */
  def sampleWeightedSql: String =
    s"""SELECT doc_id, n_chars FROM documents
        WHERE ${hash60("'wsamp-' || CAST(doc_id AS VARCHAR)")} % 1000000
          < LEAST(1000000, n_chars * 2500)"""

  /** Corpus-report twin: all-int64 per-(source, lang) profile. */
  def corpusReportSql: String =
    s"""WITH t AS (SELECT source, lang,
          CAST(len(list_filter(string_split_regex(text, '$Ws'),
            x -> x <> '')) AS BIGINT) AS n_tok,
          CAST(length(text) AS BIGINT) AS n_chars
        FROM documents WHERE text IS NOT NULL)
        SELECT source, lang, COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
               MIN(n_tok) AS min_tokens, MAX(n_tok) AS max_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM t GROUP BY source, lang"""

  /** Mix-resample twin: per-lang target percents, all-int64 threshold,
    * hash-keyed keep decision. CAST(SUM AS BIGINT) keeps id_sum int64.
    */
  def mixResampleSql: String =
    s"""WITH c AS (SELECT lang, COUNT(*) AS n_g FROM documents GROUP BY lang),
        t AS (SELECT COUNT(*) AS n_tot FROM documents),
        thr AS (SELECT lang, n_g,
          CAST(LEAST(1000000,
            ((CASE lang WHEN 'en' THEN 40 WHEN 'zh' THEN 25
                        WHEN 'de' THEN 15 ELSE 10 END)
             * n_tot * 10000) // n_g) AS BIGINT) AS thr
          FROM c, t)
        SELECT d.lang AS lang, th.n_g AS n_orig, th.thr AS thr,
               COUNT(*) AS n_kept, CAST(SUM(d.doc_id) AS BIGINT) AS id_sum
        FROM documents d JOIN thr th USING (lang)
        WHERE ${hash60("'mix-' || CAST(d.doc_id AS VARCHAR)")} % 1000000
          < th.thr
        GROUP BY d.lang, th.n_g, th.thr"""

  /** MinHash-UDAF twin: the same k generated MIN((a·h+b) mod P) aggregate
    * expressions as DedupOps.MinhashCoef, over plain `documents` shingles
    * (no dup corpus — this query exercises the Aggregator surface, not
    * near-dup pairing). Column names m0..m15 match the flattened UDAF
    * output.
    */
  def minhashUdafSql: String = {
    val p = DedupOps.P
    val mins = DedupOps.MinhashCoef
      .map { case (i, a, b, _, _) => s"MIN(($a * h + $b) % $p) AS m$i" }
      .mkString(",\n               ")
    s"""WITH ${shingle3CteOver("documents")},
        hh AS (SELECT doc_id, ${hash60("sh")} % $p AS h FROM sh)
        SELECT doc_id, $mins
        FROM hh GROUP BY doc_id"""
  }

  // ---- similarity search (SimilarityOps twins) ----

  /** Quantize + exact-norm CTEs over a relation with (vec_id, embedding).
    * Zero-norm vectors dropped, mirroring SimilarityOps.withQuant + filter.
    */
  private def quantCte(src: String): String =
    s"""qv AS (SELECT vec_id, list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE) * ${SimilarityOps.QScale}) AS BIGINT)) AS v
        FROM $src),
        n AS (SELECT * FROM (
          SELECT vec_id, v,
                 CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS n2
          FROM qv) WHERE n2 > 0)"""

  /** Hyperplane + bucket CTEs over `n` — twin of SimilarityOps.buckets
    * for the given (tables, planes) shape. Plane weights recomputed from
    * the same portable hash formula as SimilarityOps.weight, so both
    * engines use identical hyperplanes.
    */
  private def bucketCteFor(tables: Int, planes: Int): String = {
    val h = hash60("'hp-' || CAST(t.range AS VARCHAR) || '-' || " +
      "CAST(p.range AS VARCHAR) || '-' || CAST(i.range AS VARCHAR)")
    s"""hp AS (SELECT t.range AS t, p.range AS p, i.range AS i,
               $h % 2001 - 1000 AS w
             FROM range(0, $tables) t,
                  range(0, $planes) p,
                  range(0, ${SimilarityOps.Dims}) i),
        sigs AS (SELECT n.vec_id, hp.t, hp.p, SUM(hp.w * n.v[hp.i + 1]) AS s
                 FROM n CROSS JOIN hp GROUP BY n.vec_id, hp.t, hp.p),
        bkt AS (SELECT vec_id, t,
                       CAST(SUM(CASE WHEN s >= 0 THEN (1 << p) ELSE 0 END) AS BIGINT)
                         AS bucket
                FROM sigs GROUP BY vec_id, t)"""
  }

  /** Query-path bucket CTEs (2 tables × 6 planes). */
  private val bucketCte: String =
    bucketCteFor(SimilarityOps.LshTables, SimilarityOps.LshPlanes)

  /** Exact-int dot + IEEE cosine over projected columns qvv/vv/qn2/n2. */
  private val cosExpr: String =
    """CAST(CAST(list_sum(list_transform(range(1, len(qvv) + 1),
         i -> qvv[i] * vv[i])) AS BIGINT) AS DOUBLE)
       / (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE)))"""

  /** Truncated-dimension recall twin: full brute ranking from the
    * quantized vectors, prefix ranking from their 16-element slices
    * (truncate-then-quantize ≡ quantize-then-truncate), per-query
    * overlap as exact ppm.
    */
  def truncDimRecallSql: String =
    s"""WITH ${quantCte("embeddings")},
        q AS (SELECT vec_id AS q_id, v AS qvv, n2 AS qn2 FROM n
              WHERE vec_id < 5),
        bc AS (SELECT q.q_id, n.vec_id, q.qvv, q.qn2, n.v AS vv, n.n2
               FROM q, n WHERE n.vec_id <> q.q_id),
        bs AS (SELECT q_id, vec_id, $cosExpr AS cos_sim FROM bc),
        br AS (SELECT q_id, vec_id,
                      ROW_NUMBER() OVER (PARTITION BY q_id
                                         ORDER BY cos_sim DESC, vec_id) AS rnk
               FROM bs),
        brute AS (SELECT q_id, vec_id FROM br WHERE rnk <= 10),
        tn AS (SELECT * FROM (
                 SELECT vec_id, v[1:16] AS v,
                        CAST(list_sum(list_transform(v[1:16],
                          x -> x * x)) AS BIGINT) AS n2
                 FROM qv) WHERE n2 > 0),
        tq AS (SELECT vec_id AS q_id, v AS qvv, n2 AS qn2 FROM tn
               WHERE vec_id < 5),
        tc AS (SELECT t.q_id, tn.vec_id, t.qvv, t.qn2, tn.v AS vv, tn.n2
               FROM tq t, tn WHERE tn.vec_id <> t.q_id),
        ts AS (SELECT q_id, vec_id, $cosExpr AS cos_sim FROM tc),
        trk AS (SELECT q_id, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY q_id
                                          ORDER BY cos_sim DESC, vec_id) AS rnk
                FROM ts),
        tkept AS (SELECT q_id, vec_id FROM trk WHERE rnk <= 10),
        hits AS (SELECT b.q_id, COUNT(*) AS hits
                 FROM brute b JOIN tkept t
                 ON t.q_id = b.q_id AND t.vec_id = b.vec_id
                 GROUP BY b.q_id)
        SELECT qs.q_id, CAST(COALESCE(h.hits, 0) AS BIGINT) AS n_hits,
               CAST(COALESCE(h.hits, 0) AS BIGINT) * 1000000 // 10
                 AS recall_ppm
        FROM (SELECT DISTINCT q_id FROM brute) qs
        LEFT JOIN hits h USING (q_id)"""

  def simsearchSql: String =
    s"""WITH ${quantCte("embeddings")},
        q AS (SELECT vec_id AS q_id, v AS qvv, n2 AS qn2 FROM n WHERE vec_id < 5),
        c AS (SELECT q.q_id, n.vec_id, q.qvv, q.qn2, n.v AS vv, n.n2
              FROM q, n WHERE n.vec_id <> q.q_id),
        s AS (SELECT q_id, vec_id, $cosExpr AS cos_sim FROM c),
        r AS (SELECT q_id, vec_id, cos_sim,
                     ROW_NUMBER() OVER (PARTITION BY q_id
                                        ORDER BY cos_sim DESC, vec_id) AS rnk
              FROM s)
        SELECT q_id, vec_id, cos_sim, rnk FROM r WHERE rnk <= 10"""

  def simsearchLshSql: String =
    s"""WITH ${quantCte("embeddings")},
        $bucketCte,
        qb AS (SELECT vec_id AS q_id, t, bucket FROM bkt WHERE vec_id < 5),
        cand AS (SELECT DISTINCT qb.q_id, b.vec_id
                 FROM qb JOIN bkt b ON qb.t = b.t AND qb.bucket = b.bucket
                 WHERE b.vec_id <> qb.q_id),
        pd AS (SELECT c.q_id, c.vec_id, qn.v AS qvv, qn.n2 AS qn2,
                      vn.v AS vv, vn.n2 AS n2
               FROM cand c
               JOIN n qn ON qn.vec_id = c.q_id
               JOIN n vn ON vn.vec_id = c.vec_id),
        s AS (SELECT q_id, vec_id, $cosExpr AS cos_sim FROM pd),
        r AS (SELECT q_id, vec_id, cos_sim,
                     ROW_NUMBER() OVER (PARTITION BY q_id
                                        ORDER BY cos_sim DESC, vec_id) AS rnk
              FROM s)
        SELECT q_id, vec_id, cos_sim, rnk FROM r WHERE rnk <= 10"""

  def simsearchIvfSql: String =
    s"""WITH ${quantCte("embeddings")},
        cent AS (SELECT vec_id AS c_id, v AS cv, n2 AS cn2 FROM n
                 WHERE vec_id < ${SimilarityOps.IvfCentroids}),
        pr AS (SELECT n.vec_id, c.c_id, n.n2, c.cn2, n.v AS vv, c.cv AS cvv
               FROM n CROSS JOIN cent c),
        asg AS (SELECT vec_id, c_id,
                  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY
                    (n2 + cn2 - 2 * CAST(list_sum(list_transform(
                       range(1, len(vv) + 1), i -> vv[i] * cvv[i])) AS BIGINT))
                    ASC, c_id ASC) AS rc
                FROM pr),
        assign AS (SELECT vec_id, c_id FROM asg WHERE rc = 1),
        probes AS (SELECT vec_id AS q_id, c_id FROM asg
                   WHERE vec_id < 5 AND rc <= ${SimilarityOps.IvfProbes}),
        cand AS (SELECT DISTINCT p.q_id, a.vec_id
                 FROM probes p JOIN assign a USING (c_id)
                 WHERE a.vec_id <> p.q_id),
        pd AS (SELECT c.q_id, c.vec_id, qn.v AS qvv, qn.n2 AS qn2,
                      vn.v AS vv, vn.n2 AS n2
               FROM cand c
               JOIN n qn ON qn.vec_id = c.q_id
               JOIN n vn ON vn.vec_id = c.vec_id),
        s AS (SELECT q_id, vec_id, $cosExpr AS cos_sim FROM pd),
        r AS (SELECT q_id, vec_id, cos_sim,
                     ROW_NUMBER() OVER (PARTITION BY q_id
                                        ORDER BY cos_sim DESC, vec_id) AS rnk
              FROM s)
        SELECT q_id, vec_id, cos_sim, rnk FROM r WHERE rnk <= 10"""

  /** k-means IVF twin: the integer-lattice Lloyd training unrolled as
    * one CTE block per iteration (assignment rank → per-dim exact sums →
    * floor-snap rebuild → empty-cluster carry), then the same IVF probe
    * over the trained centroids. floor(double-div of exact ints) is the
    * engine-identical mean snap — see SimilarityOps.kmeansCentroids.
    */
  private def kmeansRankCte(centRel: String, out: String): String =
    s"""$out AS (SELECT vec_id, c_id, d2, rc FROM (
          SELECT n.vec_id, c.c_id,
                 (n.n2 + c.cn2 - 2 * CAST(list_sum(list_transform(
                    range(1, len(n.v) + 1), ii -> n.v[ii] * c.cv[ii]))
                    AS BIGINT)) AS d2,
                 ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
                   (n.n2 + c.cn2 - 2 * CAST(list_sum(list_transform(
                      range(1, len(n.v) + 1), ii -> n.v[ii] * c.cv[ii]))
                      AS BIGINT)) ASC, c.c_id ASC) AS rc
          FROM n CROSS JOIN $centRel c))"""

  /** cent0 → cent`iters` integer-lattice Lloyd CTE rounds (assignment
    * rank → per-dim exact sums → floor-snap rebuild → empty-cluster
    * carry) — shared by the IVF-kmeans probe twin and the general
    * kmeans-fixpoint oracle.
    */
  private def kmeansTrainCtes(iters: Int): String =
    (1 to iters).map { i =>
      s"""${kmeansRankCte(s"cent${i - 1}", s"kasg$i")},
          ksum$i AS (SELECT a.c_id, r.range AS dim,
                       CAST(floor(CAST(SUM(n.v[r.range + 1]) AS DOUBLE)
                         / COUNT(*)) AS BIGINT) AS c
                     FROM n
                     JOIN (SELECT vec_id, c_id FROM kasg$i WHERE rc = 1) a
                       USING (vec_id),
                     range(0, ${SimilarityOps.Dims}) r
                     GROUP BY a.c_id, r.range),
          kreb$i AS (SELECT c_id, list(c ORDER BY dim) AS cv
                     FROM ksum$i GROUP BY c_id),
          cent$i AS MATERIALIZED (SELECT p.c_id, COALESCE(r.cv, p.cv) AS cv,
                       COALESCE(CAST(list_sum(list_transform(r.cv,
                         x -> x * x)) AS BIGINT), p.cn2) AS cn2
                     FROM cent${i - 1} p LEFT JOIN kreb$i r USING (c_id))"""
    }.mkString(",\n")

  /** General k-means fixpoint oracle: `iters` unrolled Lloyd rounds
    * (≥ the engine's convergence round; rounds past the fixed point
    * are no-ops), final centroids unnested to (c_id, dim, c) rows plus
    * the final-assignment member counts — the
    * SimilarityOps.kmeansFixpoint contract.
    */
  def kmeansSql(iters: Int): String =
    s"""WITH ${quantCte("embeddings")},
        cent0 AS (SELECT vec_id AS c_id, v AS cv, n2 AS cn2 FROM n
                  WHERE vec_id < ${SimilarityOps.IvfCentroids}),
        ${kmeansTrainCtes(iters)},
        ${kmeansRankCte(s"cent$iters", "fasg")},
        memb AS (SELECT c_id, COUNT(*) AS n_members,
                        CAST(SUM(d2) AS BIGINT) AS inertia
                 FROM fasg WHERE rc = 1 GROUP BY c_id)
        SELECT c.c_id, CAST(r.range AS BIGINT) AS dim,
               CAST(c.cv[r.range + 1] AS BIGINT) AS c,
               CAST(COALESCE(m.n_members, 0) AS BIGINT) AS n_members,
               CAST(COALESCE(m.inertia, 0) AS BIGINT) AS inertia
        FROM cent$iters c
        LEFT JOIN memb m USING (c_id), range(0, ${SimilarityOps.Dims}) r"""

  def simsearchIvfKmeansSql(iters: Int = 2): String = {
    s"""WITH ${quantCte("embeddings")},
        cent0 AS (SELECT vec_id AS c_id, v AS cv, n2 AS cn2 FROM n
                  WHERE vec_id < ${SimilarityOps.IvfCentroids}),
        ${kmeansTrainCtes(iters)},
        ${kmeansRankCte(s"cent$iters", "asg")},
        assign AS (SELECT vec_id, c_id FROM asg WHERE rc = 1),
        probes AS (SELECT vec_id AS q_id, c_id FROM asg
                   WHERE vec_id < 5 AND rc <= ${SimilarityOps.IvfProbes}),
        cand AS (SELECT DISTINCT p.q_id, a.vec_id
                 FROM probes p JOIN assign a USING (c_id)
                 WHERE a.vec_id <> p.q_id),
        pd AS (SELECT c.q_id, c.vec_id, qn.v AS qvv, qn.n2 AS qn2,
                      vn.v AS vv, vn.n2 AS n2
               FROM cand c
               JOIN n qn ON qn.vec_id = c.q_id
               JOIN n vn ON vn.vec_id = c.vec_id),
        s AS (SELECT q_id, vec_id, $cosExpr AS cos_sim FROM pd),
        r AS (SELECT q_id, vec_id, cos_sim,
                     ROW_NUMBER() OVER (PARTITION BY q_id
                                        ORDER BY cos_sim DESC, vec_id) AS rnk
              FROM s)
        SELECT q_id, vec_id, cos_sim, rnk FROM r WHERE rnk <= 10"""
  }

  /** Quantize + norm CTEs for the perturbed +1M query slice shared by
    * the incremental-serving twins (first 5 vectors, first component
    * zeroed): qn(vec_id, v, n2), zero-norm dropped.
    */
  private val queryQuantCte: String =
    s"""qsrc AS (SELECT vec_id + 1000000 AS vec_id,
            list_concat([CAST(0.0 AS FLOAT)], embedding[2:]) AS embedding
          FROM embeddings WHERE vec_id < 5),
        qq AS (SELECT vec_id, list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * ${SimilarityOps.QScale})
                   AS BIGINT)) AS v
          FROM qsrc),
        qn AS (SELECT * FROM (
          SELECT vec_id, v,
                 CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS n2
          FROM qq) WHERE n2 > 0)"""

  /** Incremental-IVF serving twin: the same `iters` training rounds
    * (the persisted centroids ARE cent`iters`), the corpus assignment
    * (the persisted inverted file), then the EXTERNAL query slice
    * ranks centroids, probes, and re-ranks exact cosine — mirroring
    * SimilarityOps.ivfProbeIncremental over writeIvfIndex's artifact.
    */
  def simsearchIvfIncrSql(iters: Int = 2): String =
    s"""WITH ${quantCte("embeddings")},
        $queryQuantCte,
        cent0 AS (SELECT vec_id AS c_id, v AS cv, n2 AS cn2 FROM n
                  WHERE vec_id < ${SimilarityOps.IvfCentroids}),
        ${kmeansTrainCtes(iters)},
        ${kmeansRankCte(s"cent$iters", "asg")},
        assign AS (SELECT vec_id, c_id FROM asg WHERE rc = 1),
        qasg AS (SELECT vec_id, c_id, rc FROM (
          SELECT q.vec_id, c.c_id,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                   (q.n2 + c.cn2 - 2 * CAST(list_sum(list_transform(
                      range(1, len(q.v) + 1), ii -> q.v[ii] * c.cv[ii]))
                      AS BIGINT)) ASC, c.c_id ASC) AS rc
          FROM qn q CROSS JOIN cent$iters c)),
        probes AS (SELECT vec_id AS q_id, c_id FROM qasg
                   WHERE rc <= ${SimilarityOps.IvfProbes}),
        cand AS (SELECT DISTINCT p.q_id, a.vec_id
                 FROM probes p JOIN assign a USING (c_id)),
        pd AS (SELECT c.q_id, c.vec_id, q.v AS qvv, q.n2 AS qn2,
                      vn.v AS vv, vn.n2 AS n2
               FROM cand c
               JOIN qn q ON q.vec_id = c.q_id
               JOIN n vn ON vn.vec_id = c.vec_id),
        s AS (SELECT q_id, vec_id, $cosExpr AS cos_sim FROM pd),
        r AS (SELECT q_id, vec_id, cos_sim,
                     ROW_NUMBER() OVER (PARTITION BY q_id
                                        ORDER BY cos_sim DESC, vec_id) AS rnk
              FROM s)
        SELECT q_id, vec_id, cos_sim, rnk FROM r WHERE rnk <= 10"""

  /** Incremental-PQ serving twin: corpus codebooks + argmin codes (the
    * persisted artifact), then the external query slice's distance
    * tables ADC-scan the codes — mirroring
    * SimilarityOps.pqProbeIncremental over writePqIndex's artifact.
    */
  def simsearchPqIncrSql: String = {
    val sd = SimilarityOps.PqSubDim
    s"""WITH ${quantCte("embeddings")},
        $queryQuantCte,
        sub AS (SELECT vec_id, r.range AS m,
                       v[r.range * $sd + 1 : r.range * $sd + $sd] AS sv
                FROM n, range(0, ${SimilarityOps.PqSub}) r),
        subn AS (SELECT vec_id, m, sv,
                        CAST(list_sum(list_transform(sv, x -> x * x))
                          AS BIGINT) AS svn2
                 FROM sub),
        cb AS (SELECT m, vec_id AS kc, sv AS cw, svn2 AS cwn2
               FROM subn WHERE vec_id < ${SimilarityOps.PqCodes}),
        encd AS (SELECT s.vec_id, s.m, c.kc,
                        s.svn2 + c.cwn2 - 2 * CAST(list_sum(list_transform(
                          range(1, $sd + 1), ii -> s.sv[ii] * c.cw[ii]))
                          AS BIGINT) AS d2
                 FROM subn s JOIN cb c USING (m)),
        enc AS (SELECT vec_id, m, kc AS code FROM (
                  SELECT vec_id, m, kc,
                         ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                            ORDER BY d2 ASC, kc ASC) AS rc
                  FROM encd) WHERE rc = 1),
        qsub AS (SELECT vec_id, r.range AS m,
                        v[r.range * $sd + 1 : r.range * $sd + $sd] AS sv
                 FROM qn, range(0, ${SimilarityOps.PqSub}) r),
        qsubn AS (SELECT vec_id, m, sv,
                         CAST(list_sum(list_transform(sv, x -> x * x))
                           AS BIGINT) AS svn2
                  FROM qsub),
        qdt AS (SELECT s.vec_id AS q_id, s.m, c.kc AS code,
                       s.svn2 + c.cwn2 - 2 * CAST(list_sum(list_transform(
                         range(1, $sd + 1), ii -> s.sv[ii] * c.cw[ii]))
                         AS BIGINT) AS d2q
                FROM qsubn s JOIN cb c USING (m)),
        adc AS (SELECT q.q_id, e.vec_id, CAST(SUM(q.d2q) AS BIGINT) AS adc_d2
                FROM enc e JOIN qdt q ON q.m = e.m AND q.code = e.code
                GROUP BY q.q_id, e.vec_id),
        r AS (SELECT q_id, vec_id, adc_d2,
                     ROW_NUMBER() OVER (PARTITION BY q_id
                                        ORDER BY adc_d2 ASC, vec_id) AS rnk
              FROM adc)
        SELECT q_id, vec_id, adc_d2, rnk FROM r WHERE rnk <= 10"""
  }

  /** PQ-ADC twin: same subspace split (1-based inclusive slices),
    * codebook seed, argmin encoding, and integer ADC sums as
    * SimilarityOps.pqTopK.
    */
  def simsearchPqSql: String = {
    val sd = SimilarityOps.PqSubDim
    s"""WITH ${quantCte("embeddings")},
        sub AS (SELECT vec_id, r.range AS m,
                       v[r.range * $sd + 1 : r.range * $sd + $sd] AS sv
                FROM n, range(0, ${SimilarityOps.PqSub}) r),
        subn AS (SELECT vec_id, m, sv,
                        CAST(list_sum(list_transform(sv, x -> x * x))
                          AS BIGINT) AS svn2
                 FROM sub),
        cb AS (SELECT m, vec_id AS kc, sv AS cw, svn2 AS cwn2
               FROM subn WHERE vec_id < ${SimilarityOps.PqCodes}),
        encd AS (SELECT s.vec_id, s.m, c.kc,
                        s.svn2 + c.cwn2 - 2 * CAST(list_sum(list_transform(
                          range(1, $sd + 1), ii -> s.sv[ii] * c.cw[ii]))
                          AS BIGINT) AS d2
                 FROM subn s JOIN cb c USING (m)),
        enc AS (SELECT vec_id, m, kc AS code FROM (
                  SELECT vec_id, m, kc,
                         ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                            ORDER BY d2 ASC, kc ASC) AS rc
                  FROM encd) WHERE rc = 1),
        qdt AS (SELECT vec_id AS q_id, m, kc AS code, d2 AS d2q
                FROM encd WHERE vec_id < 5),
        adc AS (SELECT q.q_id, e.vec_id, CAST(SUM(q.d2q) AS BIGINT) AS adc_d2
                FROM enc e JOIN qdt q ON q.m = e.m AND q.code = e.code
                WHERE e.vec_id <> q.q_id
                GROUP BY q.q_id, e.vec_id),
        r AS (SELECT q_id, vec_id, adc_d2,
                     ROW_NUMBER() OVER (PARTITION BY q_id
                                        ORDER BY adc_d2 ASC, vec_id) AS rnk
              FROM adc)
        SELECT q_id, vec_id, adc_d2, rnk FROM r WHERE rnk <= 10"""
  }

  /** BPE training twin: `merges` unrolled merge rounds over the wrapped-
    * symbol vocab encoding (`"|h||e||l||l||o|"` — see ops/BpeOps). Each
    * round: adjacent wrapped-pair counts weighted by word frequency, the
    * (count desc, pair asc) deterministic argmax, and the greedy
    * left-to-right non-overlapping rewrite — `replace` substitutes
    * occurrences in the identical order in both engines, and the wrapped
    * blocks make cross-symbol false matches impossible.
    */
  private val BpeSymsOf = "list_filter(string_split(sym, '|'), x -> x <> '')"

  /** The per-round merge CTEs (p/b/v/o for rounds 1..merges) over a
    * `v0(w, f, sym)` vocab — shared by the train and tokenize twins.
    */
  private def bpeRoundCtes(merges: Int): String =
    (1 to merges).map { i =>
      s"""p$i AS (SELECT pk, CAST(SUM(f) AS BIGINT) AS cnt FROM (
              SELECT f, '|' || s[ii] || '||' || s[ii + 1] || '|' AS pk
              FROM (SELECT f, $BpeSymsOf AS s FROM v${i - 1}) q$i,
                   unnest(range(1, len(s))) t$i(ii)) e$i
            GROUP BY pk),
          b$i AS (SELECT pk, cnt FROM p$i ORDER BY cnt DESC, pk ASC LIMIT 1),
          v$i AS MATERIALIZED (SELECT w, f,
                 replace(sym, b.pk, replace(b.pk, '||', '')) AS sym
               FROM v${i - 1}, b$i b),
          o$i AS (SELECT CAST($i AS BIGINT) AS round, b.pk AS merge_pair,
                    b.cnt AS pair_count, s.vocab_words, s.symbols_after
                  FROM b$i b, (SELECT CAST(COUNT(*) AS BIGINT) AS vocab_words,
                         CAST(SUM(f * len($BpeSymsOf)) AS BIGINT)
                           AS symbols_after
                       FROM v$i) s)"""
    }.mkString(",\n")

  /** Trainable word instances WITH doc ids + the v0 vocab over them —
    * the same multiset the train prologue aggregates.
    */
  private val BpeInstanceCtes: String =
    s"""wi AS (SELECT doc_id,
            unnest(string_split_regex(lower(text), '$Ws')) AS w
          FROM documents),
        ti AS (SELECT doc_id, w FROM wi
               WHERE regexp_full_match(w, '[a-z]+') AND length(w) >= 2),
        v0 AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS f,
               regexp_replace(w, '(.)', '|\\1|', 'g') AS sym
             FROM ti GROUP BY w)"""

  def bpeTrainSql(merges: Int): String = {
    val sel = (1 to merges).map(i => s"SELECT * FROM o$i")
      .mkString("\nUNION ALL\n")
    s"""WITH $BpeInstanceCtes,
        ${bpeRoundCtes(merges)}
        $sel"""
  }

  /** Tokenize-with-trained-vocab twin: the same `merges` training
    * rounds, then every trainable word instance joins its merged
    * symbol sequence and per-document exact totals come out — the
    * apply half of the loop.
    */
  def bpeTokenizeSql(merges: Int): String =
    s"""WITH $BpeInstanceCtes,
        ${bpeRoundCtes(merges)}
        SELECT t.doc_id, COUNT(*) AS n_words,
               CAST(SUM(length(t.w)) AS BIGINT) AS n_chars,
               CAST(SUM(len($BpeSymsOf)) AS BIGINT) AS n_tokens
        FROM ti t JOIN v$merges v USING (w)
        GROUP BY t.doc_id"""

  /** Fertility twin: [[bpeTokenizeSql]]'s per-doc rollup, re-grouped by
    * the corpus lang tag with floor-ppm ratios.
    */
  def bpeFertilitySql(merges: Int): String =
    s"""WITH $BpeInstanceCtes,
        ${bpeRoundCtes(merges)},
        pd AS (SELECT t.doc_id, COUNT(*) AS n_words,
                 CAST(SUM(length(t.w)) AS BIGINT) AS n_chars,
                 CAST(SUM(len($BpeSymsOf)) AS BIGINT) AS n_tokens
               FROM ti t JOIN v$merges v USING (w)
               GROUP BY t.doc_id)
        SELECT d.lang, COUNT(*) AS n_docs,
               CAST(SUM(pd.n_words) AS BIGINT) AS n_words,
               CAST(SUM(pd.n_tokens) AS BIGINT) AS n_tokens,
               CAST(SUM(pd.n_tokens) AS BIGINT) * 1000000
                 // CAST(SUM(pd.n_words) AS BIGINT) AS fertility_ppm,
               CAST(SUM(pd.n_chars) AS BIGINT) * 1000000
                 // CAST(SUM(pd.n_tokens) AS BIGINT) AS chars_per_tok_ppm
        FROM pd JOIN documents d USING (doc_id)
        GROUP BY d.lang"""

  /** Persisted-vocab apply twin: the same training rounds (the
    * persisted vocab IS v`merges`), then word instances of the
    * OOV-augmented corpus LEFT-join the vocab; misses fall back to the
    * character-level initial encoding and are counted. Mirrors
    * BpeOps.tokenizeWithVocab over trainWriteVocab's artifact.
    */
  def bpeApplySql(merges: Int): String =
    s"""WITH $BpeInstanceCtes,
        ${bpeRoundCtes(merges)},
        wi2 AS (SELECT doc_id,
              unnest(string_split_regex(lower(text || ' qzjxvw'), '$Ws')) AS w
            FROM documents),
        ti2 AS (SELECT doc_id, w FROM wi2
                WHERE regexp_full_match(w, '[a-z]+') AND length(w) >= 2),
        ap AS (SELECT t.doc_id, t.w,
                 CASE WHEN v.sym IS NULL THEN 1 ELSE 0 END AS oov,
                 COALESCE(v.sym,
                   regexp_replace(t.w, '(.)', '|\\1|', 'g')) AS sym
               FROM ti2 t LEFT JOIN v$merges v USING (w))
        SELECT doc_id, COUNT(*) AS n_words,
               CAST(SUM(length(w)) AS BIGINT) AS n_chars,
               CAST(SUM(len($BpeSymsOf)) AS BIGINT) AS n_tokens,
               CAST(SUM(oov) AS BIGINT) AS n_oov
        FROM ap GROUP BY doc_id"""

  // ---- unigram-LM tokenizer (UnigramOps twins) ----

  /** Shared head of the unigram oracles: trainable word frequencies,
    * substring occurrences (length 1..MaxPieceLen), seed inventory
    * (all single chars + top-SeedPieces multi-char by weighted count)
    * with floor-ppm scores — UnigramOps.wordFreq/seedPieces twins.
    */
  private def unigramHeadCtes: String = {
    val L = graft.ops.UnigramOps.MaxWordLen
    val P = graft.ops.UnigramOps.MaxPieceLen
    s"""uw AS MATERIALIZED (SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM (
          SELECT unnest(list_filter(string_split_regex(lower(text), '$Ws'),
            x -> x <> '' AND regexp_full_match(x, '[a-z]+')
              AND len(x) BETWEEN 2 AND $L)) AS w
          FROM documents) GROUP BY w),
        uwords AS (SELECT DISTINCT w FROM uw),
        usub AS MATERIALIZED (SELECT uw.w, uw.f,
               substr(uw.w, s.range, l.range) AS p
             FROM uw, range(1, ${L + 1}) s, range(1, ${P + 1}) l
             WHERE s.range + l.range - 1 <= len(uw.w)),
        ucnt0 AS (SELECT p, CAST(SUM(f) AS BIGINT) AS cnt
                  FROM usub GROUP BY p),
        uchars AS (SELECT p FROM ucnt0 WHERE len(p) = 1),
        useed AS MATERIALIZED (SELECT p, cnt FROM (
                    SELECT p, cnt,
                           ROW_NUMBER() OVER (ORDER BY cnt DESC, p) AS rn
                    FROM ucnt0 WHERE len(p) > 1)
                  WHERE rn <= ${graft.ops.UnigramOps.SeedPieces}
                  UNION ALL
                  SELECT p, cnt FROM ucnt0 WHERE len(p) = 1),
        up0 AS MATERIALIZED (SELECT p, cnt,
               CAST(cnt * 1000000 // t AS BIGINT) AS sc
             FROM useed,
                  (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM useed))"""
  }

  /** One Viterbi segmentation, unrolled: forward DP CTEs f<tag>_0..L
    * (state key = n_pieces·10^8 − Σ sc, minimized; unreachable states
    * ABSENT), the flattened state table, and backtrack CTEs emitting
    * one piece per step with the (key asc, longer-piece) tie rule —
    * UnigramOps.segmentWords' exact integer objective. `subs` must
    * provide (w, p) substring pairs for `words`; `pieces` (p, sc).
    * Emits utoks<tag> (w, tok).
    */
  private def unigramDpCtes(tag: String, words: String, subs: String,
                            pieces: String): String = {
    val L = graft.ops.UnigramOps.MaxWordLen
    val P = graft.ops.UnigramOps.MaxPieceLen
    def fwd(j: Int): String = {
      val branches = (1 to math.min(P, j)).map { l =>
        s"""SELECT f.w, f.key + 100000000 - wp.sc AS key
            FROM f${tag}_${j - l} f JOIN wp$tag wp
              ON wp.w = f.w AND wp.p = substr(f.w, ${j - l + 1}, $l)
            WHERE len(f.w) >= $j"""
      }.mkString(" UNION ALL ")
      s"""f${tag}_$j AS MATERIALIZED (SELECT w, CAST(MIN(key) AS BIGINT)
            AS key
          FROM ($branches) GROUP BY w)"""
    }
    def bt(i: Int): String =
      s"""bt${tag}_$i AS MATERIALIZED (
          SELECT w, pos - l AS pos, substr(w, pos - l + 1, l) AS tok
          FROM (
            SELECT b.w, b.pos, rl.range AS l,
                   ROW_NUMBER() OVER (PARTITION BY b.w
                     ORDER BY fa.key + 100000000 - wp.sc ASC,
                              rl.range DESC) AS rn
            FROM bt${tag}_${i - 1} b, range(1, ${P + 1}) rl,
                 fall$tag fa, wp$tag wp
            WHERE b.pos > 0 AND rl.range <= b.pos
              AND fa.w = b.w AND fa.pos = b.pos - rl.range
              AND wp.w = b.w
              AND wp.p = substr(b.w, b.pos - rl.range + 1, rl.range))
          WHERE rn = 1)"""
    s"""wp$tag AS MATERIALIZED (SELECT DISTINCT s.w, s.p, pp.sc
            FROM $subs s JOIN $pieces pp USING (p)),
        f${tag}_0 AS MATERIALIZED (SELECT w, CAST(0 AS BIGINT) AS key
          FROM $words),
        ${(1 to L).map(fwd).mkString(",\n")},
        fall$tag AS MATERIALIZED (${
          (0 to L).map(j =>
            s"SELECT w, $j AS pos, key FROM f${tag}_$j")
            .mkString(" UNION ALL ")}),
        bt${tag}_0 AS MATERIALIZED (SELECT w, len(w) AS pos FROM $words),
        ${(1 to L).map(bt).mkString(",\n")},
        utoks$tag AS (${
          (1 to L).map(i => s"SELECT w, tok FROM bt${tag}_$i")
            .mkString(" UNION ALL ")})"""
  }

  /** One hard-EM round r: segment against up(r−1), usage counts,
    * keep used multi-char pieces + ALL single chars (coverage floor),
    * re-normalize to ppm — the UnigramOps.usageCounts twin.
    */
  private def unigramRoundCtes(r: Int): String =
    s"""${unigramDpCtes(r.toString, "uwords", "usub", s"up${r - 1}")},
        uusage$r AS (SELECT t.tok AS p, CAST(SUM(uw.f) AS BIGINT) AS cnt
                     FROM utoks$r t JOIN uw USING (w) GROUP BY t.tok),
        ukept$r AS MATERIALIZED (SELECT p, cnt FROM uusage$r
                      WHERE len(p) > 1
                    UNION ALL
                    SELECT c.p, CAST(COALESCE(u.cnt, 0) AS BIGINT) AS cnt
                    FROM uchars c LEFT JOIN
                      (SELECT p, cnt FROM uusage$r WHERE len(p) = 1) u
                      USING (p)),
        up$r AS MATERIALIZED (SELECT p, cnt,
               CAST(cnt * 1000000 // t AS BIGINT) AS sc
             FROM ukept$r,
                  (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM ukept$r))"""

  private def unigramTrainCtes: String =
    s"""${unigramHeadCtes},
        ${(1 to graft.ops.UnigramOps.EmRounds)
          .map(unigramRoundCtes).mkString(",\n")}"""

  /** q_unigram_train twin: the full unrolled hard-EM, final pieces. */
  def unigramTrainSql: String = {
    val R = graft.ops.UnigramOps.EmRounds
    s"""WITH $unigramTrainCtes
        SELECT p AS piece, cnt AS n_used, sc AS sc_ppm FROM up$R"""
  }

  /** q_unigram_apply twin: train (the persisted pieces ARE up·R), then
    * segment the OOV-augmented corpus's distinct words against them; a
    * word with NO backtrack tokens was unsegmentable (a char outside
    * the training alphabet) — char-fallback counted, mirroring
    * UnigramOps.tokenizeWithPieces.
    */
  def unigramApplySql: String = {
    val L = graft.ops.UnigramOps.MaxWordLen
    val P = graft.ops.UnigramOps.MaxPieceLen
    val R = graft.ops.UnigramOps.EmRounds
    s"""WITH $unigramTrainCtes,
        aw AS MATERIALIZED (SELECT doc_id, w FROM (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(
                       lower(text || ' qzjxvw'), '$Ws'),
                       x -> x <> '' AND regexp_full_match(x, '[a-z]+')
                         AND len(x) BETWEEN 2 AND $L)) AS w
              FROM documents)),
        awords AS MATERIALIZED (SELECT DISTINCT w FROM aw),
        asub AS MATERIALIZED (SELECT DISTINCT aw2.w,
                   substr(aw2.w, s.range, l.range) AS p
                 FROM awords aw2, range(1, ${L + 1}) s, range(1, ${P + 1}) l
                 WHERE s.range + l.range - 1 <= len(aw2.w)),
        ${unigramDpCtes("a", "awords", "asub", s"up$R")},
        antok AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_tok
                  FROM utoksa GROUP BY w),
        aseg AS (SELECT a.w,
                   CAST(COALESCE(n.n_tok, len(a.w)) AS BIGINT) AS n_tok,
                   CASE WHEN n.n_tok IS NULL THEN 1 ELSE 0 END AS oov
                 FROM awords a LEFT JOIN antok n USING (w))
        SELECT aw.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(len(aw.w)) AS BIGINT) AS n_chars,
               CAST(SUM(s.n_tok) AS BIGINT) AS n_tokens,
               CAST(SUM(s.oov) AS BIGINT) AS n_oov
        FROM aw JOIN aseg s USING (w)
        GROUP BY aw.doc_id"""
  }

  /** Greedy longest-match-first segmentation, set-based: glen<tag>
    * precomputes each (word, pos)'s longest matching piece length,
    * the recursive CTE walks left-to-right, and gdone<tag> keeps the
    * terminal state (pos ran past the word) — a word stuck mid-walk
    * (char outside the piece alphabet) never reaches a terminal row
    * and is read back as OOV via the left join.
    */
  private def greedyCtes(tag: String, words: String,
                         pieces: String): String = {
    val L = graft.ops.UnigramOps.MaxWordLen
    val P = graft.ops.UnigramOps.MaxPieceLen
    s"""glen$tag AS MATERIALIZED (
          SELECT ww.w, s.range AS pos, MAX(l.range) AS gl
          FROM $words ww, range(1, ${L + 1}) s, range(1, ${P + 1}) l
          WHERE s.range + l.range - 1 <= len(ww.w)
            AND substr(ww.w, s.range, l.range)
                  IN (SELECT p FROM $pieces)
          GROUP BY ww.w, s.range),
        greedy$tag AS (
          SELECT w, CAST(1 AS BIGINT) AS pos, 0 AS n FROM $words
          UNION ALL
          SELECT g.w, g.pos + gl.gl, g.n + 1
          FROM greedy$tag g JOIN glen$tag gl
            ON gl.w = g.w AND gl.pos = g.pos
          WHERE g.pos <= len(g.w)),
        gdone$tag AS (SELECT w, CAST(MAX(n) AS BIGINT) AS n_tok
                      FROM greedy$tag WHERE pos > len(w) GROUP BY w)"""
  }

  /** q_wordpiece_apply twin: train (pieces = up·R), then greedy
    * longest-match over the OOV-augmented corpus's distinct words;
    * char-fallback for words without a terminal greedy row — the
    * unigramApplySql shape with the DP swapped for the greedy walk.
    */
  def wordpieceApplySql: String = {
    val L = graft.ops.UnigramOps.MaxWordLen
    val R = graft.ops.UnigramOps.EmRounds
    s"""WITH RECURSIVE $unigramTrainCtes,
        aw AS MATERIALIZED (SELECT doc_id, w FROM (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(
                       lower(text || ' qzjxvw'), '$Ws'),
                       x -> x <> '' AND regexp_full_match(x, '[a-z]+')
                         AND len(x) BETWEEN 2 AND $L)) AS w
              FROM documents)),
        awords AS MATERIALIZED (SELECT DISTINCT w FROM aw),
        ${greedyCtes("a", "awords", s"up$R")},
        aseg AS (SELECT a.w,
                   CAST(COALESCE(n.n_tok, len(a.w)) AS BIGINT) AS n_tok,
                   CASE WHEN n.n_tok IS NULL THEN 1 ELSE 0 END AS oov
                 FROM awords a LEFT JOIN gdonea n USING (w))
        SELECT aw.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(len(aw.w)) AS BIGINT) AS n_chars,
               CAST(SUM(s.n_tok) AS BIGINT) AS n_tokens,
               CAST(SUM(s.oov) AS BIGINT) AS n_oov
        FROM aw JOIN aseg s USING (w)
        GROUP BY aw.doc_id"""
  }

  /** q_wordpiece_fertility twin: greedy and Viterbi over the SAME
    * trained pieces and the SAME training-corpus word universe (no
    * OOV by construction), instance-weighted totals and the exact
    * floor-ppm greedy excess.
    */
  def wordpieceCompareSql: String = {
    val R = graft.ops.UnigramOps.EmRounds
    s"""WITH RECURSIVE $unigramTrainCtes,
        ${unigramDpCtes("c", "uwords", "usub", s"up$R")},
        ${greedyCtes("u", "uwords", s"up$R")},
        vcnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_tok
                 FROM utoksc GROUP BY w),
        tot AS (SELECT CAST(SUM(uw.f) AS BIGINT) AS n_words,
                  CAST(SUM(uw.f * g.n_tok) AS BIGINT) AS n_tok_greedy,
                  CAST(SUM(uw.f * v.n_tok) AS BIGINT) AS n_tok_viterbi
                FROM uw JOIN gdoneu g USING (w) JOIN vcnt v USING (w))
        SELECT n_words, n_tok_greedy, n_tok_viterbi,
               CAST((n_tok_greedy - n_tok_viterbi) * 1000000
                 // n_tok_viterbi AS BIGINT) AS greedy_excess_ppm
        FROM tot"""
  }

  /** q_unigram_fertility twin: the BPE unrolled-merge chain and the
    * unigram unrolled-EM chain side by side (disjoint CTE namespaces),
    * one corpus-total fertility row per family.
    */
  def unigramCompareSql(merges: Int): String = {
    val R = graft.ops.UnigramOps.EmRounds
    s"""WITH $BpeInstanceCtes,
        ${bpeRoundCtes(merges)},
        $unigramTrainCtes,
        ${unigramDpCtes("c", "uwords", "usub", s"up$R")},
        btot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
                   CAST(SUM(len($BpeSymsOf)) AS BIGINT) AS n_tokens
                 FROM ti t JOIN v$merges v USING (w)),
        ucnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_tok
                 FROM utoksc GROUP BY w),
        utot AS (SELECT CAST(SUM(uw.f) AS BIGINT) AS n_words,
                   CAST(SUM(uw.f * c.n_tok) AS BIGINT) AS n_tokens
                 FROM uw JOIN ucnt c USING (w))
        SELECT 'bpe' AS tokenizer, n_words, n_tokens,
               CAST(n_tokens * 1000000 // n_words AS BIGINT)
                 AS fertility_ppm
        FROM btot
        UNION ALL
        SELECT 'unigram' AS tokenizer, n_words, n_tokens,
               CAST(n_tokens * 1000000 // n_words AS BIGINT)
                 AS fertility_ppm
        FROM utot"""
  }

  /** HTML-extraction twin: rebuilds the synthetic page closed-form
    * (CurationOps.htmlWrap's exact literal), then replays the strip
    * pipeline — script/style blocks with content, tags to spaces,
    * entity decode with &amp; last, whitespace collapse. RE2 handles
    * the lazy spans and inline (?is) flags identically to Java regex
    * on this pattern class.
    */
  /** The htmlWrap-fixture + strip-pipeline CTE chain, ending in
    * s5(doc_id, main_text) — shared by the extraction oracle and the
    * crawl-pipeline composition.
    */
  private val htmlStripCtes: String =
    """pages AS (SELECT doc_id,
           '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
           '</title><style>body { margin: 0; } p > a { color: #00f; }' ||
           '</style></head><body><script type="text/javascript">var x = 1;' ||
           ' if (x &lt; 2 && x &gt; 0) { emit("<p>not text</p>"); }' ||
           '</script><nav><ul><li>Home</li><li>About</li></ul></nav>' ||
           '<div id="main"><h1>Doc ' || CAST(doc_id AS VARCHAR) ||
           '</h1><p>' || text ||
           '</p><p>tail &amp; more&nbsp;text &#39;quoted&#39;</p></div>' ||
           '<footer>fin</footer></body></html>' AS html
         FROM documents WHERE text IS NOT NULL),
       s1 AS (SELECT doc_id, regexp_replace(html,
                '(?is)<script\b[^>]*>.*?</script>', ' ', 'g') AS t
              FROM pages),
       s2 AS (SELECT doc_id, regexp_replace(t,
                '(?is)<style\b[^>]*>.*?</style>', ' ', 'g') AS t FROM s1),
       s3 AS (SELECT doc_id, regexp_replace(t, '(?s)<[^>]*>', ' ', 'g') AS t
              FROM s2),
       s4 AS (SELECT doc_id, replace(replace(replace(replace(replace(
                replace(t, '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                '&quot;', '"'), '&#39;', ''''), '&amp;', '&') AS t FROM s3),
       s5 AS (SELECT doc_id, trim(regexp_replace(t, '\s+', ' ', 'g'))
                AS main_text FROM s4)"""

  def htmlExtractSql: String =
    s"""WITH $htmlStripCtes
       SELECT doc_id, main_text,
              CAST(CASE WHEN length(main_text) = 0 THEN 0
                   ELSE len(string_split(main_text, ' ')) END AS BIGINT)
                AS n_words,
              CAST(length(main_text) AS BIGINT) AS n_chars
       FROM s5"""

  /** Shared line-structured page fixture CTE (CurationOps.lineWrap
    * twin): the word-soup corpus refolded into 8-word lines with
    * congruence-keyed decorations (bullets mod 5, javascript/brace
    * boilerplate mod 11/13, lorem-ipsum marker mod 97, terminal-
    * punctuation cycle mod 7/3/2). Ends with CTE `pg` (doc_id, page).
    */
  private val lineWrapCtes: String =
    s"""wsplit AS (SELECT doc_id, string_split_regex(text, '$Ws') AS w
          FROM documents WHERE text IS NOT NULL),
        pg AS (SELECT doc_id, array_to_string(list_transform(
            range(0, (len(w) + 7) // 8),
            j -> concat(
              if((doc_id + j) % 5 = 0, '- ', ''),
              array_to_string(w[(j*8+1):(j*8+8)], ' '),
              if((doc_id + j) % 11 = 0, ' javascript void', ''),
              if((doc_id + j) % 13 = 0, ' {x}', ''),
              if(j = 0 AND doc_id % 97 = 0, ' lorem ipsum', ''),
              CASE WHEN (doc_id + j) % 7 = 0 THEN '...'
                   WHEN (doc_id + j) % 3 = 0 THEN '.'
                   WHEN (doc_id + j) % 2 = 0 THEN '!'
                   ELSE '' END)), chr(10)) AS page
          FROM wsplit)"""

  /** Gopher doc-quality rules — CurationOps.gopherRules twin. */
  def gopherRulesSql: String =
    s"""WITH $lineWrapCtes,
        m AS (SELECT doc_id,
            list_filter(string_split_regex(page, '$Ws'), x -> x <> '')
              AS wds,
            string_split(page, chr(10)) AS lines
          FROM pg),
        t AS (SELECT doc_id,
            CAST(len(wds) AS BIGINT) AS n_words,
            CAST(coalesce(list_sum(list_transform(wds, x -> length(x))),
              0) AS BIGINT) AS tot_chars,
            CAST(len(list_filter(lines, l -> starts_with(l, '- ')))
              AS BIGINT) AS n_bullet,
            CAST(len(list_filter(lines, l -> ends_with(l, '...')))
              AS BIGINT) AS n_ellipsis,
            CAST(len(lines) AS BIGINT) AS n_lines,
            CAST(len(list_filter(wds, x -> x = 'the' OR x = 'a'
              OR x = 'of' OR x = 'to' OR x = 'and' OR x = 'in'))
              AS BIGINT) AS stop_hits,
            CAST(len(list_filter(wds, x -> regexp_matches(x, '[a-z]')))
              AS BIGINT) AS n_alpha
          FROM m),
        g AS (SELECT doc_id, n_words,
            CAST((1000 * tot_chars) // greatest(n_words, 1) AS BIGINT)
              AS mean_wlen_milli,
            CAST((1000000 * n_bullet) // n_lines AS BIGINT) AS bullet_ppm,
            CAST((1000000 * n_ellipsis) // n_lines AS BIGINT)
              AS ellipsis_ppm,
            stop_hits,
            CAST((1000000 * n_alpha) // greatest(n_words, 1) AS BIGINT)
              AS alpha_ppm
          FROM t)
       SELECT doc_id, n_words, mean_wlen_milli, bullet_ppm, ellipsis_ppm,
              stop_hits, alpha_ppm,
              CAST(n_words >= 50 AND n_words <= 100000
                AND mean_wlen_milli >= 3000 AND mean_wlen_milli <= 10000
                AND bullet_ppm <= 900000 AND ellipsis_ppm <= 300000
                AND stop_hits >= 2 AND alpha_ppm >= 800000 AS INTEGER)
                AS keep
       FROM g"""

  /** C4 line-level filter — CurationOps.c4LineFilter twin. */
  def c4FilterSql: String =
    s"""WITH $lineWrapCtes,
        t AS (SELECT doc_id, page, string_split(page, chr(10)) AS lines
          FROM pg),
        k AS (SELECT doc_id, page,
            CAST(len(lines) AS BIGINT) AS n_lines,
            list_filter(lines, l ->
              (ends_with(l, '.') OR ends_with(l, '!')
                OR ends_with(l, '?'))
              AND len(string_split(l, ' ')) >= 5
              AND NOT contains(l, 'javascript')
              AND NOT contains(l, '{')) AS kept
          FROM t)
       SELECT doc_id, n_lines, CAST(len(kept) AS BIGINT) AS kept_lines,
              CAST(coalesce(list_sum(list_transform(kept,
                l -> len(string_split(l, ' ')))), 0) AS BIGINT)
                AS kept_words,
              CAST(coalesce(list_sum(list_transform(kept,
                l -> length(l))), 0) AS BIGINT) AS kept_chars,
              CAST(len(kept) >= 3
                AND NOT contains(page, 'lorem ipsum') AS INTEGER) AS keep
       FROM k"""

  /** Shared URL-fixture + normalization CTEs (CurationOps.urlWrap /
    * urlNormalize twins): closed-form URL per doc, then the same parse
    * → lowercase scheme+host → default-port strip → trailing-slash
    * strip → tracking-param filter pipeline. Ends with CTE `u`
    * (doc_id, url, url_norm, domain).
    */
  private val urlNormCtes: String =
    """pages AS (SELECT doc_id,
         (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'HTTPS' END) ||
         '://WWW.Site' || CAST(doc_id % 7 AS VARCHAR) || '.Example.COM' ||
         (CASE WHEN doc_id % 3 = 0 THEN
                 (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END)
               WHEN doc_id % 5 = 0 THEN ':8080' ELSE '' END) ||
         '/A/b' || CAST(doc_id % 5 AS VARCHAR) ||
         (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END) ||
         '?utm_source=feed&page=' || CAST(doc_id % 3 AS VARCHAR) ||
         '&fbclid=zzz&sort=asc#sec' || CAST(doc_id % 2 AS VARCHAR) AS url
       FROM documents),
       parts AS (SELECT doc_id, url,
         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
           AS scheme,
         lower(regexp_extract(url, '^[^:]+://([^/?#]*)', 1)) AS auth,
         regexp_extract(url, '^[^:]+://[^/?#]*([^?#]*)', 1) AS path0,
         regexp_extract(url, '\?([^#]*)', 1) AS query
       FROM pages),
       hostp AS (SELECT *,
         CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$', '')
              WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
              ELSE auth END AS host
       FROM parts),
       np AS (SELECT *, regexp_replace(path0, '/+$', '') AS path,
         array_to_string(list_filter(string_split(query, '&'),
           p -> NOT regexp_matches(p, '^(utm_[^=]*|fbclid)=')
                AND p <> ''), '&') AS keptq
       FROM hostp),
       u AS (SELECT doc_id, url,
         scheme || '://' || host || path ||
           (CASE WHEN keptq = '' THEN '' ELSE '?' || keptq END) AS url_norm,
         regexp_replace(regexp_replace(host, ':[0-9]+$', ''),
           '^www\.', '') AS domain
       FROM np)"""

  def urlNormalizeSql: String =
    s"""WITH $urlNormCtes
        SELECT doc_id, url, url_norm, domain FROM u"""

  def domainStatsSql: String =
    s"""WITH $urlNormCtes
        SELECT domain, COUNT(*) AS n_pages,
               CAST(COUNT(DISTINCT url_norm) AS BIGINT) AS n_canonical,
               CAST(COUNT(DISTINCT regexp_extract(url_norm,
                 '^[^:]+://[^/?#]*([^?#]*)', 1)) AS BIGINT) AS n_paths
        FROM u GROUP BY domain"""

  /** RGB decode twin: per-channel closed-form raster replay — one
    * (mean, aHash-bits) CTE pair per channel over the shared dims, so
    * a decoder that swapped or gray-fused bands diverges on at least
    * one channel. Pixel formulas and planted (0,0) overrides mirror
    * MultimodalOps.syntheticRgbImage; the 8×8 grid and floor mean
    * mirror the gray q_image_ahash oracle.
    */
  def imageRgbSql: String = {
    // (suffix, id coefficient, x coefficient, y coefficient, planted
    // (0,0) id multiplier) per channel.
    val chans = Seq(("r", 1L, 31L, 7L), ("g", 1L, 13L, 17L), ("b", 3L, 5L, 11L))
    val planted = Map("r" -> 1L, "g" -> 7L, "b" -> 13L)
    val per = chans.map { case (c, ai, bx, by) =>
      val p = s"(${planted(c)} * doc_id) % 256"
      val pix =
        s"($ai * doc_id + $bx * (i.range % w) + $by * (i.range // w)) % 256"
      val pixK = s"($ai * doc_id + $bx * ((k.range % 8) * w // 8) " +
        s"+ $by * ((k.range // 8) * h // 8)) % 256"
      s"""m$c AS (SELECT doc_id, w, h,
            CAST(SUM(CASE WHEN i.range = 0 THEN $p ELSE $pix END)
              AS BIGINT) // (w * h) AS mean_px
          FROM dims, range(0, 256) i WHERE i.range < w * h
          GROUP BY doc_id, w, h),
        b$c AS (SELECT doc_id,
            string_agg(CAST(bit AS VARCHAR), '' ORDER BY k) AS ahash,
            CAST(SUM(bit) AS BIGINT) AS n_set
          FROM (SELECT doc_id, k.range AS k,
                  CASE WHEN (CASE WHEN (k.range % 8) * w // 8 = 0
                                   AND (k.range // 8) * h // 8 = 0
                                  THEN $p ELSE $pixK END) > mean_px
                       THEN 1 ELSE 0 END AS bit
                FROM m$c, range(0, 64) k) t$c
          GROUP BY doc_id)"""
    }.mkString(",\n")
    s"""WITH dims AS (SELECT doc_id, CAST(1 + doc_id % 16 AS BIGINT) AS w,
                             CAST(1 + (doc_id // 16) % 16 AS BIGINT) AS h
                      FROM documents),
        $per
        SELECT d.doc_id AS asset_id, d.w, d.h,
               mr.mean_px AS mean_r, br.ahash AS ahash_r, br.n_set AS nset_r,
               mg.mean_px AS mean_g, bg.ahash AS ahash_g, bg.n_set AS nset_g,
               mb.mean_px AS mean_b, bb.ahash AS ahash_b, bb.n_set AS nset_b
        FROM dims d
        JOIN mr ON mr.doc_id = d.doc_id JOIN br ON br.doc_id = d.doc_id
        JOIN mg ON mg.doc_id = d.doc_id JOIN bg ON bg.doc_id = d.doc_id
        JOIN mb ON mb.doc_id = d.doc_id JOIN bb ON bb.doc_id = d.doc_id"""
  }

  /** Chunk-overlap twin: 1-based inclusive list slices mirror Spark's
    * slice(w, start+1, window); range(0, n, stride) mirrors the sequence
    * starts; md5 of the space-rejoined window pins the exact text.
    */
  def chunkOverlapSql(window: Int, stride: Int): String =
    s"""WITH wd AS (SELECT doc_id,
          list_filter(string_split_regex(text, '$Ws'), x -> x <> '') AS w
        FROM documents WHERE text IS NOT NULL),
        st AS (SELECT doc_id, w, unnest(range(0, len(w), $stride)) AS start
               FROM wd WHERE len(w) > 0)
        SELECT doc_id,
               CAST(start // $stride AS BIGINT) AS chunk_idx,
               CAST(start AS BIGINT) AS start_tok,
               CAST(len(w[start + 1 : start + $window]) AS BIGINT) AS n_tok,
               md5(array_to_string(w[start + 1 : start + $window], ' '))
                 AS chunk_md5
        FROM st"""

  /** Recall twin: brute/LSH/IVF top-k recomputed (CTEs disambiguated),
    * then per-query hit counts of each approximate set against brute.
    */
  def simsearchRecallSql: String =
    s"""WITH ${quantCte("embeddings")},
        q AS (SELECT vec_id AS q_id, v AS qvv, n2 AS qn2 FROM n WHERE vec_id < 5),
        bc AS (SELECT q.q_id, n.vec_id, q.qvv, q.qn2, n.v AS vv, n.n2
               FROM q, n WHERE n.vec_id <> q.q_id),
        bs AS (SELECT q_id, vec_id, $cosExpr AS cos_sim FROM bc),
        br AS (SELECT q_id, vec_id,
                      ROW_NUMBER() OVER (PARTITION BY q_id
                                         ORDER BY cos_sim DESC, vec_id) AS rnk
               FROM bs),
        brute AS (SELECT q_id, vec_id FROM br WHERE rnk <= 10),
        $bucketCte,
        qb AS (SELECT vec_id AS q_id, t, bucket FROM bkt WHERE vec_id < 5),
        lcand AS (SELECT DISTINCT qb.q_id, b.vec_id
                  FROM qb JOIN bkt b ON qb.t = b.t AND qb.bucket = b.bucket
                  WHERE b.vec_id <> qb.q_id),
        lpd AS (SELECT c.q_id, c.vec_id, qn.v AS qvv, qn.n2 AS qn2,
                       vn.v AS vv, vn.n2 AS n2
                FROM lcand c
                JOIN n qn ON qn.vec_id = c.q_id
                JOIN n vn ON vn.vec_id = c.vec_id),
        ls AS (SELECT q_id, vec_id, $cosExpr AS cos_sim FROM lpd),
        lr AS (SELECT q_id, vec_id,
                      ROW_NUMBER() OVER (PARTITION BY q_id
                                         ORDER BY cos_sim DESC, vec_id) AS rnk
               FROM ls),
        lsh AS (SELECT q_id, vec_id FROM lr WHERE rnk <= 10),
        cent AS (SELECT vec_id AS c_id, v AS cv, n2 AS cn2 FROM n
                 WHERE vec_id < ${SimilarityOps.IvfCentroids}),
        pr AS (SELECT n.vec_id, c.c_id, n.n2, c.cn2, n.v AS vv, c.cv AS cvv
               FROM n CROSS JOIN cent c),
        asg AS (SELECT vec_id, c_id,
                  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY
                    (n2 + cn2 - 2 * CAST(list_sum(list_transform(
                       range(1, len(vv) + 1), i -> vv[i] * cvv[i])) AS BIGINT))
                    ASC, c_id ASC) AS rc
                FROM pr),
        assign AS (SELECT vec_id, c_id FROM asg WHERE rc = 1),
        probes AS (SELECT vec_id AS q_id, c_id FROM asg
                   WHERE vec_id < 5 AND rc <= ${SimilarityOps.IvfProbes}),
        icand AS (SELECT DISTINCT p.q_id, a.vec_id
                  FROM probes p JOIN assign a USING (c_id)
                  WHERE a.vec_id <> p.q_id),
        ipd AS (SELECT c.q_id, c.vec_id, qn.v AS qvv, qn.n2 AS qn2,
                       vn.v AS vv, vn.n2 AS n2
                FROM icand c
                JOIN n qn ON qn.vec_id = c.q_id
                JOIN n vn ON vn.vec_id = c.vec_id),
        isc AS (SELECT q_id, vec_id, $cosExpr AS cos_sim FROM ipd),
        ir AS (SELECT q_id, vec_id,
                      ROW_NUMBER() OVER (PARTITION BY q_id
                                         ORDER BY cos_sim DESC, vec_id) AS rnk
               FROM isc),
        ivf AS (SELECT q_id, vec_id FROM ir WHERE rnk <= 10),
        psub AS (SELECT vec_id, r.range AS m,
                        v[r.range * ${SimilarityOps.PqSubDim} + 1 :
                          r.range * ${SimilarityOps.PqSubDim} +
                          ${SimilarityOps.PqSubDim}] AS sv
                 FROM n, range(0, ${SimilarityOps.PqSub}) r),
        psubn AS (SELECT vec_id, m, sv,
                         CAST(list_sum(list_transform(sv, x -> x * x))
                           AS BIGINT) AS svn2
                  FROM psub),
        pcb AS (SELECT m, vec_id AS kc, sv AS cw, svn2 AS cwn2
                FROM psubn WHERE vec_id < ${SimilarityOps.PqCodes}),
        pencd AS (SELECT s.vec_id, s.m, c.kc,
                         s.svn2 + c.cwn2 - 2 * CAST(list_sum(list_transform(
                           range(1, ${SimilarityOps.PqSubDim} + 1),
                           ii -> s.sv[ii] * c.cw[ii])) AS BIGINT) AS d2
                  FROM psubn s JOIN pcb c USING (m)),
        penc AS (SELECT vec_id, m, kc AS code FROM (
                   SELECT vec_id, m, kc,
                          ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                             ORDER BY d2 ASC, kc ASC) AS rc
                   FROM pencd) WHERE rc = 1),
        pqdt AS (SELECT vec_id AS q_id, m, kc AS code, d2 AS d2q
                 FROM pencd WHERE vec_id < 5),
        padc AS (SELECT q.q_id, e.vec_id,
                        CAST(SUM(q.d2q) AS BIGINT) AS adc_d2
                 FROM penc e JOIN pqdt q ON q.m = e.m AND q.code = e.code
                 WHERE e.vec_id <> q.q_id
                 GROUP BY q.q_id, e.vec_id),
        prk AS (SELECT q_id, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY q_id
                                          ORDER BY adc_d2 ASC, vec_id) AS rnk
                FROM padc),
        pq AS (SELECT q_id, vec_id FROM prk WHERE rnk <= 10)
        SELECT b.q_id AS q_id, COUNT(*) AS n_true,
               CAST(SUM(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS lsh_hits,
               CAST(SUM(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS ivf_hits,
               CAST(SUM(CASE WHEN p.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS pq_hits
        FROM brute b
        LEFT JOIN lsh l ON b.q_id = l.q_id AND b.vec_id = l.vec_id
        LEFT JOIN ivf i ON b.q_id = i.q_id AND b.vec_id = i.vec_id
        LEFT JOIN pq p ON b.q_id = p.q_id AND b.vec_id = p.vec_id
        GROUP BY b.q_id"""

  def aggSaltedSql: String =
    """SELECT l_returnflag,
              CAST(sum(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_v,
              count(*) AS cnt
       FROM lineitem GROUP BY l_returnflag"""

  def dedupEmbedSql: String =
    s"""WITH ecorpus AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 1000000,
                 list_concat([CAST(0.0 AS FLOAT)], embedding[2:]) AS embedding
          FROM embeddings),
        ${quantCte("ecorpus")},
        ${bucketCteFor(SimilarityOps.PairTables, SimilarityOps.PairPlanes)},
        bo AS (SELECT vec_id, t, bucket FROM (
                 SELECT vec_id, t, bucket,
                        COUNT(*) OVER (PARTITION BY t, bucket) AS occ
                 FROM bkt)
               WHERE occ <= 100000),
        pairs AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
                  FROM bo x JOIN bo y
                  ON x.t = y.t AND x.bucket = y.bucket AND x.vec_id < y.vec_id),
        pd AS (SELECT p.vec_a, p.vec_b, a.v AS qvv, a.n2 AS qn2,
                      b.v AS vv, b.n2 AS n2
               FROM pairs p
               JOIN n a ON a.vec_id = p.vec_a
               JOIN n b ON b.vec_id = p.vec_b),
        s AS (SELECT vec_a, vec_b, $cosExpr AS cos_sim FROM pd)
        SELECT vec_a, vec_b, cos_sim FROM s WHERE cos_sim >= 0.95"""

  /** Semantic-decontam twin: the dedupEmbedSql bucket discipline
    * crossed between the train slice (< 10^6) and the bench slice
    * (held-out +10^6 ∪ planted leaked +2·10^6), occupancy guard on the
    * train side only, exact cosine verify, per-train-vector rollup.
    */
  def decontamEmbedSql: String =
    s"""WITH ecorpus AS (
          SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 0
          UNION ALL
          SELECT vec_id + 1000000, embedding FROM embeddings
          WHERE vec_id % 10 = 0
          UNION ALL
          SELECT vec_id + 2000000, embedding FROM embeddings
          WHERE vec_id % 10 <> 0 AND vec_id % 7 = 0),
        ${quantCte("ecorpus")},
        ${bucketCteFor(SimilarityOps.PairTables, SimilarityOps.PairPlanes)},
        tb AS (SELECT vec_id, t, bucket FROM (
                 SELECT vec_id, t, bucket,
                        COUNT(*) OVER (PARTITION BY t, bucket) AS occ
                 FROM (SELECT * FROM bkt WHERE vec_id < 1000000))
               WHERE occ <= 100000),
        bb AS (SELECT vec_id AS bench_id, t, bucket FROM bkt
               WHERE vec_id >= 1000000),
        cand AS (SELECT DISTINCT tb.vec_id, bb.bench_id
                 FROM tb JOIN bb ON tb.t = bb.t AND tb.bucket = bb.bucket),
        pd AS (SELECT c.vec_id, c.bench_id, a.v AS qvv, a.n2 AS qn2,
                      b.v AS vv, b.n2 AS n2
               FROM cand c
               JOIN n a ON a.vec_id = c.vec_id
               JOIN n b ON b.vec_id = c.bench_id),
        s AS (SELECT vec_id, bench_id, $cosExpr AS cos_sim FROM pd)
        SELECT vec_id, COUNT(*) AS n_bench_hits,
               MIN(bench_id) AS first_bench_id
        FROM s WHERE cos_sim >= 0.95 GROUP BY vec_id"""

  /** Planted-pair recall twin: ground truth by direct (v, v+10^6) id
    * join, found set by the same bucket-join pipeline as dedupEmbedSql.
    */
  def dedupEmbedRecallSql: String =
    s"""WITH ecorpus AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 1000000,
                 list_concat([CAST(0.0 AS FLOAT)], embedding[2:]) AS embedding
          FROM embeddings),
        ${quantCte("ecorpus")},
        ${bucketCteFor(SimilarityOps.PairTables, SimilarityOps.PairPlanes)},
        bo AS (SELECT vec_id, t, bucket FROM (
                 SELECT vec_id, t, bucket,
                        COUNT(*) OVER (PARTITION BY t, bucket) AS occ
                 FROM bkt)
               WHERE occ <= 100000),
        pairs AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
                  FROM bo x JOIN bo y
                  ON x.t = y.t AND x.bucket = y.bucket AND x.vec_id < y.vec_id),
        pd AS (SELECT p.vec_a, p.vec_b, a.v AS qvv, a.n2 AS qn2,
                      b.v AS vv, b.n2 AS n2
               FROM pairs p
               JOIN n a ON a.vec_id = p.vec_a
               JOIN n b ON b.vec_id = p.vec_b),
        s AS (SELECT vec_a, vec_b, $cosExpr AS cos_sim FROM pd),
        found AS (SELECT vec_a, vec_b FROM s WHERE cos_sim >= 0.95),
        pl0 AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                       a.v AS qvv, a.n2 AS qn2, b.v AS vv, b.n2 AS n2
                FROM n a JOIN n b ON b.vec_id = a.vec_id + 1000000
                WHERE a.vec_id < 1000000),
        planted AS (SELECT vec_a, vec_b FROM (
                      SELECT vec_a, vec_b, $cosExpr AS cos_sim FROM pl0)
                    WHERE cos_sim >= 0.95)
        SELECT COUNT(*) AS n_planted,
               CAST(SUM(CASE WHEN f.vec_b IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_found
        FROM planted p
        LEFT JOIN found f ON p.vec_a = f.vec_a AND p.vec_b = f.vec_b"""

  /** Incremental embed near-dup twin (SimilarityOps
    * .embedNearDupIncremental): the persisted index's bucket rows and
    * quantized vectors are pure per-vector functions, so the oracle
    * replays the whole build by bucketing the base∪arrivals union and
    * keeping only cross-boundary (arrival ≥ 1M, index < 1M) candidate
    * pairs — the same candidates the Spark probe's keyed joins
    * generate. Verdict: exact-cosine recheck ≥ 0.95, per-arrival
    * counts, kept flag.
    */
  def dedupEmbedIncrSql: String =
    s"""WITH ecorpus AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 1000000 AS vec_id, embedding
          FROM embeddings WHERE vec_id % 3 = 0
          UNION ALL
          SELECT vec_id + 2000000 AS vec_id,
                 list_concat([CAST(0.0 AS FLOAT)], embedding[2:]) AS embedding
          FROM embeddings WHERE vec_id % 3 = 1
          UNION ALL
          SELECT vec_id + 3000000 AS vec_id,
                 list_reverse(embedding) AS embedding
          FROM embeddings WHERE vec_id % 3 = 2),
        ${quantCte("ecorpus")},
        ${bucketCteFor(SimilarityOps.PairTables, SimilarityOps.PairPlanes)},
        cand AS (SELECT DISTINCT a.vec_id, b.vec_id AS idx_id
                 FROM bkt a JOIN bkt b
                 ON a.t = b.t AND a.bucket = b.bucket
                 WHERE a.vec_id >= 1000000 AND b.vec_id < 1000000),
        pd AS (SELECT c.vec_id, an.v AS qvv, an.n2 AS qn2,
                      bn.v AS vv, bn.n2 AS n2
               FROM cand c
               JOIN n an ON an.vec_id = c.vec_id
               JOIN n bn ON bn.vec_id = c.idx_id),
        near AS (SELECT vec_id, COUNT(*) AS n_near FROM pd
                 WHERE $cosExpr >= 0.95 GROUP BY vec_id)
        SELECT a.vec_id, CAST(COALESCE(nr.n_near, 0) AS BIGINT) AS n_near,
               CAST(CASE WHEN COALESCE(nr.n_near, 0) = 0 THEN 1 ELSE 0 END
                 AS BIGINT) AS kept
        FROM (SELECT vec_id FROM n WHERE vec_id >= 1000000) a
        LEFT JOIN near nr USING (vec_id)"""

  /** Embed-index maintenance twin (two judge-append cycles): batch-1
    * admission (odds with no ≥0.95 neighbor among evens) is replayed
    * in SQL, the batch-2 index side is evens ∪ admitted odds, and the
    * final verdict counts batch-2 arrivals' neighbors in that side —
    * exactly what the appended parquet index contains.
    */
  def embedIndexUpdateSql: String =
    s"""WITH ecorpus AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 1000000 AS vec_id, embedding
          FROM embeddings WHERE vec_id % 2 = 1
          UNION ALL
          SELECT vec_id + 2000000 AS vec_id,
                 list_reverse(embedding) AS embedding
          FROM embeddings WHERE vec_id % 2 = 1
          UNION ALL
          SELECT vec_id + 4000000 AS vec_id, embedding
          FROM embeddings WHERE vec_id % 2 = 0),
        ${quantCte("ecorpus")},
        ${bucketCteFor(SimilarityOps.PairTables, SimilarityOps.PairPlanes)},
        cand1 AS (SELECT DISTINCT a.vec_id, b.vec_id AS idx_id
                  FROM bkt a JOIN bkt b
                  ON a.t = b.t AND a.bucket = b.bucket
                  WHERE a.vec_id < 1000000 AND a.vec_id % 2 = 1
                    AND b.vec_id < 1000000 AND b.vec_id % 2 = 0),
        pd1 AS (SELECT c.vec_id, an.v AS qvv, an.n2 AS qn2,
                       bn.v AS vv, bn.n2 AS n2
                FROM cand1 c
                JOIN n an ON an.vec_id = c.vec_id
                JOIN n bn ON bn.vec_id = c.idx_id),
        near1 AS (SELECT DISTINCT vec_id FROM pd1 WHERE $cosExpr >= 0.95),
        idx2 AS (SELECT vec_id FROM n
                 WHERE vec_id < 1000000 AND vec_id % 2 = 0
                 UNION ALL
                 SELECT vec_id FROM n
                 WHERE vec_id < 1000000 AND vec_id % 2 = 1
                   AND vec_id NOT IN (SELECT vec_id FROM near1)),
        cand2 AS (SELECT DISTINCT a.vec_id, b.vec_id AS idx_id
                  FROM bkt a JOIN bkt b
                  ON a.t = b.t AND a.bucket = b.bucket
                  JOIN idx2 i ON i.vec_id = b.vec_id
                  WHERE a.vec_id >= 1000000),
        pd2 AS (SELECT c.vec_id, an.v AS qvv, an.n2 AS qn2,
                       bn.v AS vv, bn.n2 AS n2
                FROM cand2 c
                JOIN n an ON an.vec_id = c.vec_id
                JOIN n bn ON bn.vec_id = c.idx_id),
        near2 AS (SELECT vec_id, COUNT(*) AS n_near FROM pd2
                  WHERE $cosExpr >= 0.95 GROUP BY vec_id)
        SELECT a.vec_id, CAST(COALESCE(nr.n_near, 0) AS BIGINT) AS n_near,
               CAST(CASE WHEN COALESCE(nr.n_near, 0) = 0 THEN 1 ELSE 0 END
                 AS BIGINT) AS kept
        FROM (SELECT vec_id FROM n WHERE vec_id >= 1000000) a
        LEFT JOIN near2 nr USING (vec_id)"""

  /** Incremental embed cluster-assignment twin: known corpus
    * (base ∪ +1M zeroed-first twins) pairs via the bucket pipeline →
    * recursive-CTE connected components (min-label closure) → arrivals
    * (≥ 2M) take MIN(COALESCE(cluster(match), match)) over their
    * cosine-verified index matches, unmatched become singletons.
    */
  def embedClusterIncrSql: String =
    s"""WITH RECURSIVE ecorpus AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 1000000,
                 list_concat([CAST(0.0 AS FLOAT)], embedding[2:])
          FROM embeddings
          UNION ALL
          SELECT vec_id + 2000000,
                 list_concat([CAST(0.0 AS FLOAT)], embedding[2:])
          FROM embeddings WHERE vec_id % 3 = 0
          UNION ALL
          SELECT vec_id + 3000000, embedding
          FROM embeddings WHERE vec_id % 3 = 1
          UNION ALL
          SELECT vec_id + 4000000, list_reverse(embedding)
          FROM embeddings WHERE vec_id % 3 = 2),
        ${quantCte("ecorpus")},
        ${bucketCteFor(SimilarityOps.PairTables, SimilarityOps.PairPlanes)},
        kcand AS (SELECT DISTINCT x.vec_id AS u, y.vec_id AS v
                  FROM bkt x JOIN bkt y
                  ON x.t = y.t AND x.bucket = y.bucket
                  AND x.vec_id < y.vec_id AND y.vec_id < 2000000),
        kpd AS (SELECT c.u, c.v, a.v AS qvv, a.n2 AS qn2,
                       b.v AS vv, b.n2 AS n2
                FROM kcand c
                JOIN n a ON a.vec_id = c.u
                JOIN n b ON b.vec_id = c.v),
        kpairs AS (SELECT u, v FROM kpd WHERE $cosExpr >= 0.95),
        und AS (SELECT u, v FROM kpairs UNION ALL SELECT v, u FROM kpairs),
        reach(node, lbl) AS (
          SELECT u, u FROM und
          UNION
          SELECT e.v, r.lbl FROM und e JOIN reach r ON r.node = e.u),
        kclusters AS (SELECT node, MIN(lbl) AS cluster
                      FROM reach GROUP BY node),
        xcand AS (SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS k_id
                  FROM bkt x JOIN bkt y
                  ON x.t = y.t AND x.bucket = y.bucket
                  AND x.vec_id >= 2000000 AND y.vec_id < 2000000),
        xpd AS (SELECT c.a_id, c.k_id, a.v AS qvv, a.n2 AS qn2,
                       b.v AS vv, b.n2 AS n2
                FROM xcand c
                JOIN n a ON a.vec_id = c.a_id
                JOIN n b ON b.vec_id = c.k_id),
        xm AS (SELECT a_id, k_id FROM xpd WHERE $cosExpr >= 0.95)
        SELECT a.vec_id,
               COALESCE(MIN(COALESCE(kc.cluster, m.k_id)), a.vec_id)
                 AS cluster,
               CAST(COUNT(m.k_id) AS BIGINT) AS n_near
        FROM (SELECT vec_id FROM n WHERE vec_id >= 2000000) a
        LEFT JOIN xm m ON m.a_id = a.vec_id
        LEFT JOIN kclusters kc ON kc.node = m.k_id
        GROUP BY a.vec_id"""

  /** Streaming embed-index ingest twin: batch-0 verdicts (odds vs the
    * evens index) are PART OF THE OUTPUT, and batch 1 (+1M exact /
    * +1.5M near twins of those odds) is judged against evens ∪ batch-0
    * survivors — the in-stream index update, replayed in SQL.
    */
  def embedStreamIngestSql: String =
    s"""WITH ecorpus AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 1000000, embedding
          FROM embeddings WHERE vec_id % 2 = 1
          UNION ALL
          SELECT vec_id + 1500000,
                 list_concat([CAST(0.0 AS FLOAT)], embedding[2:])
          FROM embeddings WHERE vec_id % 2 = 1),
        ${quantCte("ecorpus")},
        ${bucketCteFor(SimilarityOps.PairTables, SimilarityOps.PairPlanes)},
        cand1 AS (SELECT DISTINCT a.vec_id, b.vec_id AS idx_id
                  FROM bkt a JOIN bkt b
                  ON a.t = b.t AND a.bucket = b.bucket
                  WHERE a.vec_id < 1000000 AND a.vec_id % 2 = 1
                    AND b.vec_id < 1000000 AND b.vec_id % 2 = 0),
        pd1 AS (SELECT c.vec_id, c.idx_id, an.v AS qvv, an.n2 AS qn2,
                       bn.v AS vv, bn.n2 AS n2
                FROM cand1 c
                JOIN n an ON an.vec_id = c.vec_id
                JOIN n bn ON bn.vec_id = c.idx_id),
        xm1 AS (SELECT vec_id, idx_id FROM pd1 WHERE $cosExpr >= 0.95),
        b0 AS (SELECT a.vec_id,
                 CAST(COUNT(m.idx_id) AS BIGINT) AS n_near,
                 CAST(CASE WHEN COUNT(m.idx_id) = 0 THEN 1 ELSE 0 END
                   AS BIGINT) AS kept
               FROM (SELECT vec_id FROM n
                     WHERE vec_id < 1000000 AND vec_id % 2 = 1) a
               LEFT JOIN xm1 m ON m.vec_id = a.vec_id
               GROUP BY a.vec_id),
        idx2 AS (SELECT vec_id FROM n
                 WHERE vec_id < 1000000 AND vec_id % 2 = 0
                 UNION ALL
                 SELECT vec_id FROM b0 WHERE kept = 1),
        cand2 AS (SELECT DISTINCT a.vec_id, b.vec_id AS idx_id
                  FROM bkt a JOIN bkt b
                  ON a.t = b.t AND a.bucket = b.bucket
                  JOIN idx2 i ON i.vec_id = b.vec_id
                  WHERE a.vec_id >= 1000000),
        pd2 AS (SELECT c.vec_id, c.idx_id, an.v AS qvv, an.n2 AS qn2,
                       bn.v AS vv, bn.n2 AS n2
                FROM cand2 c
                JOIN n an ON an.vec_id = c.vec_id
                JOIN n bn ON bn.vec_id = c.idx_id),
        xm2 AS (SELECT vec_id, idx_id FROM pd2 WHERE $cosExpr >= 0.95),
        b1 AS (SELECT a.vec_id,
                 CAST(COUNT(m.idx_id) AS BIGINT) AS n_near,
                 CAST(CASE WHEN COUNT(m.idx_id) = 0 THEN 1 ELSE 0 END
                   AS BIGINT) AS kept
               FROM (SELECT vec_id FROM n WHERE vec_id >= 1000000) a
               LEFT JOIN xm2 m ON m.vec_id = a.vec_id
               GROUP BY a.vec_id)
        SELECT vec_id, n_near, kept FROM b0
        UNION ALL
        SELECT vec_id, n_near, kept FROM b1"""

  /** Incremental top-k serving twin: simsearchLshSql with the query set
    * replaced by the five perturbed +1M arrivals probing the base
    * corpus as the persisted index side.
    */
  def simsearchIncrSql: String =
    s"""WITH ecorpus AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 1000000 AS vec_id,
                 list_concat([CAST(0.0 AS FLOAT)], embedding[2:]) AS embedding
          FROM embeddings WHERE vec_id < 5),
        ${quantCte("ecorpus")},
        $bucketCte,
        qb AS (SELECT vec_id AS q_id, t, bucket FROM bkt
               WHERE vec_id >= 1000000),
        cand AS (SELECT DISTINCT qb.q_id, b.vec_id
                 FROM qb JOIN bkt b ON qb.t = b.t AND qb.bucket = b.bucket
                 WHERE b.vec_id < 1000000),
        pd AS (SELECT c.q_id, c.vec_id, qn.v AS qvv, qn.n2 AS qn2,
                      vn.v AS vv, vn.n2 AS n2
               FROM cand c
               JOIN n qn ON qn.vec_id = c.q_id
               JOIN n vn ON vn.vec_id = c.vec_id),
        s AS (SELECT q_id, vec_id, $cosExpr AS cos_sim FROM pd),
        r AS (SELECT q_id, vec_id, cos_sim,
                     ROW_NUMBER() OVER (PARTITION BY q_id
                                        ORDER BY cos_sim DESC, vec_id) AS rnk
              FROM s)
        SELECT q_id, vec_id, cos_sim, rnk FROM r WHERE rnk <= 10"""

  /** Per-dimension embedding stats twin — quantized exact moments, dims
    * indexed by a range cross join (DuckDB's unnest has no ordinality).
    */
  def dimStatsSql: String =
    s"""WITH qv AS (SELECT list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE) * ${SimilarityOps.QScale}) AS BIGINT)) AS v
        FROM embeddings),
        d AS (SELECT r.range AS dim, v[r.range + 1] AS q
              FROM qv, range(0, ${SimilarityOps.Dims}) r)
        SELECT dim, count(*) AS n, CAST(SUM(q) AS BIGINT) AS sum_q,
               CAST(SUM(q * q) AS BIGINT) AS sum_q2,
               MIN(q) AS min_q, MAX(q) AS max_q,
               CAST(CAST(SUM(q) AS BIGINT) AS DOUBLE) / count(*) AS mean_q
        FROM d GROUP BY dim"""

  /** Random-projection distortion twin — SimilarityOps.rpDistortion:
    * same quantization, hash-derived ±1 sign matrix, exact int64
    * projections and squared distances, final IEEE ratio.
    */
  def rpDistortionSql: String =
    s"""WITH qv AS (SELECT vec_id, list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE) * ${SimilarityOps.QScale})
            AS BIGINT)) AS v
        FROM embeddings),
        sm AS (SELECT j.range AS j, i.range AS i,
            CASE WHEN ${hash60("'rp-' || j.range || '-' || i.range")} % 2 = 0
                 THEN 1 ELSE -1 END AS s
          FROM range(0, ${SimilarityOps.RpDims}) j,
               range(0, ${SimilarityOps.Dims}) i),
        proj AS (SELECT q.vec_id, s.j,
            CAST(SUM(q.v[s.i + 1] * s.s) AS BIGINT) AS p
          FROM qv q, sm s GROUP BY q.vec_id, s.j),
        od AS (SELECT a.vec_id AS a, b.vec_id AS b,
            CAST(list_sum(list_transform(range(1, ${SimilarityOps.Dims + 1}),
              i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i]))) AS BIGINT)
              AS d2_orig
          FROM qv a JOIN qv b ON b.vec_id = a.vec_id + 1),
        pd AS (SELECT pa.vec_id AS a,
            CAST(SUM((pa.p - pb.p) * (pa.p - pb.p)) AS BIGINT) AS d2_proj
          FROM proj pa JOIN proj pb
            ON pb.vec_id = pa.vec_id + 1 AND pb.j = pa.j
          GROUP BY pa.vec_id)
        SELECT od.a, od.b, od.d2_orig, pd.d2_proj,
               CAST(pd.d2_proj AS DOUBLE) /
                 (${SimilarityOps.RpDims}.0 * CAST(od.d2_orig AS DOUBLE))
                 AS ratio
        FROM od JOIN pd ON pd.a = od.a WHERE od.d2_orig > 0"""

  /** Scrub twin: identical dirty-corpus derivation and redaction order
    * (emails → URLs → digit runs); DuckDB regexp_replace needs the 'g'
    * flag to match Spark's replace-all default.
    */
  def scrubSql: String = {
    val email = "[a-z0-9]+@[a-z0-9.]+"
    val url = "http://[^ ]+"
    s"""WITH dirty AS (SELECT doc_id,
          text || ' contact u' || CAST(doc_id AS VARCHAR) || '@ex.com' ||
          ' http://site/p' || CAST(doc_id AS VARCHAR) ||
          ' id ' || CAST(doc_id * 7919 AS VARCHAR) AS text
        FROM documents),
        c AS (SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(text,
            '$email', '<EMAIL>', 'g'), '$url', '<URL>', 'g'),
            '[0-9]+', '<NUM>', 'g') AS cleaned,
          CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_email,
          CAST(len(regexp_extract_all(
            regexp_replace(text, '$email', '', 'g'), '$url')) AS BIGINT) AS n_url,
          CAST(len(regexp_extract_all(regexp_replace(
            regexp_replace(text, '$email', '', 'g'), '$url', '', 'g'),
            '[0-9]+')) AS BIGINT) AS n_num
        FROM dirty)
        SELECT doc_id, n_email, n_url, n_num,
               CAST(len(cleaned) AS BIGINT) AS n_chars_clean,
               md5(cleaned) AS clean_md5
        FROM c"""
  }

  /** Stratified-sample twin: per-class deterministic hash thresholds. */
  def sampleStratifiedSql: String =
    s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
        WHERE ${hash60("'str-' || CAST(o_orderkey AS VARCHAR)")} % 100 <
          CASE o_orderstatus WHEN 'F' THEN 20 WHEN 'O' THEN 5 ELSE 50 END"""

  // ---- text analysis (TextStatsOps twins) ----

  private val toksCte: String =
    s"""toks AS (SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '$Ws'), x -> x <> '')) AS w
       FROM documents)"""

  def textStatsSql: String = {
    val en = TextStatsOps.Stopwords.filter(_._1 == "en")
      .map(w => s"'${w._2}'").mkString(", ")
    s"""WITH $toksCte,
        agg AS (SELECT doc_id, COUNT(*) AS n_tokens,
                       COUNT(DISTINCT w) AS n_distinct,
                       CAST(SUM(len(w)) AS BIGINT) AS tok_chars,
                       CAST(SUM(CASE WHEN w IN ($en) THEN 1 ELSE 0 END)
                            AS BIGINT) AS stop_cnt
                FROM toks GROUP BY doc_id)
        SELECT d.doc_id, CAST(len(d.text) AS BIGINT) AS n_chars_c,
               a.n_tokens, a.n_distinct,
               CAST(a.tok_chars AS DOUBLE) / a.n_tokens AS avg_tok_len,
               CAST(a.stop_cnt AS DOUBLE) / a.n_tokens AS stop_ratio,
               CAST(least(a.n_tokens, 100) AS DOUBLE) / 100.0 * 0.4
                 + CAST(a.stop_cnt AS DOUBLE) / a.n_tokens * 0.3
                 + CAST(a.n_distinct AS DOUBLE) / a.n_tokens * 0.3 AS quality
        FROM documents d JOIN agg a USING (doc_id)"""
  }

  def langIdSql: String = {
    val stop = TextStatsOps.Stopwords
      .map { case (l, w) => s"('$l', '$w')" }.mkString(", ")
    s"""WITH stop AS (SELECT * FROM (VALUES $stop) t(cand, w)),
        $toksCte,
        hits AS (SELECT doc_id, cand, COUNT(*) AS hits
                 FROM toks JOIN stop USING (w) GROUP BY doc_id, cand),
        best AS (SELECT doc_id, cand, hits FROM (
                   SELECT doc_id, cand, hits,
                          ROW_NUMBER() OVER (PARTITION BY doc_id
                                             ORDER BY hits DESC, cand ASC) AS rn
                   FROM hits) WHERE rn = 1)
        SELECT d.doc_id, d.lang, COALESCE(b.cand, 'und') AS pred_lang,
               COALESCE(b.hits, 0) AS hits
        FROM documents d LEFT JOIN best b USING (doc_id)"""
  }

  /** TF-IDF twin — same toks tokenization as the other text oracles and
    * the identical left-to-right double weight expression.
    */
  def tfidfSql: String =
    s"""WITH $toksCte,
        tf AS (SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY doc_id, w),
        df AS (SELECT w, count(*) AS df FROM
                 (SELECT DISTINCT doc_id, w FROM toks) GROUP BY w),
        n AS (SELECT count(*) AS nd FROM documents),
        s AS (SELECT tf.doc_id, tf.w, tf.tf, df.df,
                     CAST(tf.tf AS DOUBLE) * 1000000.0 * n.nd / df.df AS weight
              FROM tf JOIN df USING (w) CROSS JOIN n),
        r AS (SELECT doc_id, w, tf, df, weight,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY weight DESC, w ASC) AS rn
              FROM s)
        SELECT doc_id, w, tf, df, weight, rn FROM r WHERE rn <= 3"""

  /** BM25 ranked-retrieval twin: same toks tokenization, the identical
    * left-to-right double term expression (constants written as the
    * literal doubles 1.2/0.75/2.2, never computed), per-term DECIMAL
    * sum. The query list is inlined as a VALUES table with explicit
    * BIGINT ids.
    */
  def bm25Sql(queries: Seq[(Long, String)], k: Int): String =
    bm25SqlFrom("documents", "", queries, k)

  /** BM25 over the base + (+1M, first-word-stripped) arrival corpus —
    * the oracle for the persisted-index append path: replay the union
    * corpus through the same scoring, which must equal serving the
    * base index plus the appended partials.
    */
  def bm25IncrSql(queries: Seq[(Long, String)], k: Int): String =
    bm25SqlFrom("corpus",
      """corpus AS (SELECT doc_id, text FROM documents
         UNION ALL SELECT doc_id + 1000000,
           regexp_replace(text, '^\S+\s*', '') FROM documents),
      """, queries, k)

  private def bm25SqlFrom(src: String, lead: String,
                          queries: Seq[(Long, String)], k: Int): String =
    s"""WITH ${bm25Ctes(src, lead, queries)}
        SELECT q_id, doc_id, score, rnk FROM ranked WHERE rnk <= $k"""

  /** The BM25 CTE chain (toks → tf/dl/df/stats → qterms → scored →
    * ranked) without a terminal SELECT — shared by [[bm25SqlFrom]] and
    * the RRF fusion oracle.
    */
  private def bm25Ctes(src: String, lead: String,
                       queries: Seq[(Long, String)]): String = {
    val vals = queries
      .map { case (id, q) => s"(CAST($id AS BIGINT), '$q')" }.mkString(", ")
    s"""${lead}toks AS (SELECT doc_id,
          unnest(list_filter(string_split_regex(text, '$Ws'), x -> x <> ''))
            AS w
        FROM $src),
        tf AS (SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY doc_id, w),
        dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        df AS (SELECT w, count(*) AS df FROM
                 (SELECT DISTINCT doc_id, w FROM toks) GROUP BY w),
        stats AS (SELECT (SELECT count(*) FROM $src) AS nd,
                         CAST((SELECT count(*) FROM toks) AS DOUBLE)
                           / CAST((SELECT count(DISTINCT doc_id) FROM toks)
                                  AS DOUBLE) AS avgdl),
        qs AS (SELECT * FROM (VALUES $vals) v(q_id, qtext)),
        qterms AS (SELECT DISTINCT q_id,
                     unnest(list_filter(string_split_regex(qtext, '$Ws'),
                                        x -> x <> '')) AS w
                   FROM qs),
        terms AS (SELECT q.q_id, tf.doc_id,
                    CAST(1000000.0 * CAST(s.nd AS DOUBLE) / CAST(df.df AS DOUBLE)
                         * (CAST(tf.tf AS DOUBLE) * 2.2)
                         / (CAST(tf.tf AS DOUBLE)
                            + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl.dl AS DOUBLE) / s.avgdl))
                         AS DECIMAL(28,6)) AS t
                  FROM tf JOIN qterms q USING (w) JOIN df USING (w)
                    JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s),
        scored AS (SELECT q_id, doc_id, CAST(sum(t) AS DOUBLE) AS score
                   FROM terms GROUP BY q_id, doc_id),
        ranked AS (SELECT q_id, doc_id, score,
                     row_number() OVER (PARTITION BY q_id
                                        ORDER BY score DESC, doc_id) AS rnk
                   FROM scored)"""
  }

  /** Portable-HLL increment twin (AggOps.hllMergeIncremental): replay
    * both slices' register tables from orders via the shared hash60 —
    * bucket = h mod 64, rho = 33 − a comparison-indicator sum (no
    * libm) — and the per-bucket max merge. Registers are exact int64s,
    * so the full artifact (not just an estimate) hash-matches.
    */
  def hllIncrSql(boundary: String): String = {
    val h = hash60("concat('hll-', CAST(o_custkey AS VARCHAR))")
    val ind = (0 until 32)
      .map(i => s"CASE WHEN rest >= ${1L << i} THEN 1 ELSE 0 END")
      .mkString(" + ")
    def regs(src: String) =
      s"""(SELECT bucket, CAST(MAX(33 - ($ind)) AS BIGINT) AS reg
           FROM (SELECT h % 64 AS bucket, (h // 64) % 4294967296 AS rest
                 FROM (SELECT $h AS h FROM $src
                       WHERE o_custkey IS NOT NULL))
           GROUP BY bucket)"""
    s"""WITH base AS (SELECT o_custkey FROM orders
                      WHERE CAST(o_orderdate AS DATE) < DATE '$boundary'),
        arr AS (SELECT o_custkey FROM orders
                WHERE CAST(o_orderdate AS DATE) >= DATE '$boundary'),
        hb AS ${regs("base")},
        ha AS ${regs("arr")}
        SELECT COALESCE(hb.bucket, ha.bucket) AS bucket,
               COALESCE(hb.reg, 0) AS reg_base,
               COALESCE(ha.reg, 0) AS reg_arrivals,
               GREATEST(COALESCE(hb.reg, 0), COALESCE(ha.reg, 0))
                 AS reg_merged
        FROM hb FULL JOIN ha ON hb.bucket = ha.bucket"""
  }

  /** Portable sketch-rollup twin (AggOps.portableSketchRollup): daily
    * register tables rolled to monthly by per-bucket max, months as
    * epoch micros.
    */
  def portableSketchRollupSql: String = {
    val h = hash60("concat('hll-', CAST(user_id AS VARCHAR))")
    val ind = (0 until 32)
      .map(i => s"CASE WHEN rest >= ${1L << i} THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH e AS (SELECT epoch_us(date_trunc('month', ts)) AS m_us,
                          epoch_us(date_trunc('day', ts)) AS d_us, user_id
                   FROM events WHERE user_id IS NOT NULL),
        hh AS (SELECT m_us, d_us, $h AS h FROM e),
        b AS (SELECT m_us, d_us, h % 64 AS bucket,
                     (h // 64) % 4294967296 AS rest
              FROM hh),
        daily AS (SELECT m_us, d_us, bucket, MAX(33 - ($ind)) AS reg
                  FROM b GROUP BY 1, 2, 3)
        SELECT m_us, CAST(bucket AS BIGINT) AS bucket,
               CAST(MAX(reg) AS BIGINT) AS reg
        FROM daily GROUP BY 1, 2"""
  }

  /** Streaming windowed-HLL twin: epoch-aligned tumbling windows, the
    * same hash60-derived bucket/rho as [[hllIncrSql]], max per
    * (window, bucket).
    */
  def streamHllSql: String = {
    val h = hash60("concat('hll-', CAST(user_id AS VARCHAR))")
    val ind = (0 until 32)
      .map(i => s"CASE WHEN rest >= ${1L << i} THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH e AS (SELECT epoch_us(ts) AS tus, user_id FROM events
                   WHERE user_id IS NOT NULL),
        hh AS (SELECT (tus // 600000000) * 600000000 AS w_start_us,
                      $h AS h
               FROM e),
        b AS (SELECT w_start_us, h % 64 AS bucket,
                     (h // 64) % 4294967296 AS rest
              FROM hh)
        SELECT w_start_us, CAST(bucket AS BIGINT) AS bucket,
               CAST(MAX(33 - ($ind)) AS BIGINT) AS reg
        FROM b GROUP BY 1, 2"""
  }

  /** Retrieval-eval twin (CurationOps.rankEval): the BM25 CTE chain
    * feeds the ranked list; ground truth is conjunctive term matching
    * (relevant ⇔ doc contains EVERY query term); MRR / P@k / recall /
    * AP are the same ppm floor divisions — every metric an exact int64.
    */
  def rankEvalSql(queries: Seq[(Long, String)], k: Int): String =
    s"""WITH ${bm25Ctes("documents", "", queries)},
        topk AS (SELECT q_id, doc_id, rnk FROM ranked WHERE rnk <= $k),
        dw AS (SELECT DISTINCT doc_id, w FROM toks),
        nq AS (SELECT q_id, COUNT(*) AS n_qt FROM qterms GROUP BY q_id),
        mt AS (SELECT q.q_id, d.doc_id, COUNT(*) AS n_match
               FROM dw d JOIN qterms q USING (w) GROUP BY q.q_id, d.doc_id),
        relv AS (SELECT m.q_id, m.doc_id FROM mt m JOIN nq USING (q_id)
                 WHERE m.n_match = nq.n_qt),
        nrel AS (SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_rel
                 FROM relv GROUP BY q_id),
        mk AS (SELECT t.q_id, t.rnk,
                 CASE WHEN r.doc_id IS NULL THEN 0 ELSE 1 END AS is_rel
               FROM topk t LEFT JOIN relv r
                 ON r.q_id = t.q_id AND r.doc_id = t.doc_id),
        cm AS (SELECT q_id, rnk, is_rel,
                 SUM(is_rel) OVER (PARTITION BY q_id ORDER BY rnk)
                   AS cum_hits
               FROM mk),
        pq AS (SELECT q_id, CAST(SUM(is_rel) AS BIGINT) AS hits_k,
                 MIN(CASE WHEN is_rel = 1 THEN rnk END) AS fr,
                 CAST(SUM(CASE WHEN is_rel = 1
                   THEN (cum_hits * 1000000) // rnk ELSE 0 END) AS BIGINT)
                   AS ap_num
               FROM cm GROUP BY q_id),
        base AS (SELECT qi.q_id,
                   COALESCE(n.n_rel, 0) AS n_rel,
                   COALESCE(p.hits_k, 0) AS hits_k,
                   CAST(COALESCE(p.fr, 0) AS BIGINT) AS first_rel,
                   COALESCE(p.ap_num, 0) AS ap_num
                 FROM (SELECT DISTINCT q_id FROM qterms) qi
                 LEFT JOIN pq p ON p.q_id = qi.q_id
                 LEFT JOIN nrel n ON n.q_id = qi.q_id)
        SELECT q_id, n_rel, hits_k, first_rel,
               CAST(CASE WHEN first_rel > 0 THEN 1000000 // first_rel
                 ELSE 0 END AS BIGINT) AS mrr_ppm,
               (hits_k * 1000000) // $k AS p_at_k_ppm,
               (hits_k * 1000000) // greatest(n_rel, 1) AS recall_ppm,
               ap_num // greatest(least(n_rel, $k), 1) AS ap_ppm
        FROM base"""

  /** Reciprocal-rank-fusion oracle — CurationOps.rrfFuse twin over the
    * BM25 and term-count rankers: both top-`depth` lists, contribution
    * floor(10^9/(60+rank)) in integer micro-units (exact in both
    * engines — no float sum-order hazard), full-outer merge, top-`k`.
    */
  def rrfSql(queries: Seq[(Long, String)], depth: Int, k: Int): String =
    s"""WITH ${bm25Ctes("documents", "", queries)},
        list_a AS (SELECT q_id, doc_id, rnk FROM ranked
                   WHERE rnk <= $depth),
        tcnt AS (SELECT q.q_id, t.doc_id, count(*) AS cnt
                 FROM toks t JOIN qterms q USING (w)
                 GROUP BY q.q_id, t.doc_id),
        list_b AS (SELECT q_id, doc_id, rnk FROM (
                     SELECT q_id, doc_id,
                       row_number() OVER (PARTITION BY q_id
                         ORDER BY cnt DESC, doc_id) AS rnk
                     FROM tcnt) WHERE rnk <= $depth),
        fused AS (SELECT COALESCE(a.q_id, b.q_id) AS q_id,
                    COALESCE(a.doc_id, b.doc_id) AS doc_id,
                    CAST(COALESCE(a.rnk, 0) AS BIGINT) AS rnk_a,
                    CAST(COALESCE(b.rnk, 0) AS BIGINT) AS rnk_b,
                    CAST(COALESCE(1000000000 // (60 + a.rnk), 0)
                       + COALESCE(1000000000 // (60 + b.rnk), 0)
                       AS BIGINT) AS rrf
                  FROM list_a a FULL OUTER JOIN list_b b
                    ON a.q_id = b.q_id AND a.doc_id = b.doc_id)
        SELECT q_id, doc_id, rnk_a, rnk_b, rrf, rnk FROM (
          SELECT f.*, row_number() OVER (PARTITION BY q_id
                        ORDER BY rrf DESC, doc_id) AS rnk
          FROM fused f) WHERE rnk <= $k"""

  /** Dense-ranker CTE chain for the hybrid tier: perturbed (id-kept)
    * query embeddings for vec_id 1..5, seed centroids (first
    * [[SimilarityOps.IvfCentroids]] corpus vectors — writeIvfIndex
    * trainIters = 0), corpus inverted-file assignment, query probes of
    * the [[SimilarityOps.IvfProbes]] nearest lists, exact-cosine
    * re-rank. Requires [[quantCte]]("embeddings") upstream; emits `hr`
    * = (q_id, vec_id, rnk). h-prefixed names to coexist with
    * [[bm25Ctes]] in one WITH block.
    */
  private def hybridDenseCtes: String =
    s"""hqsrc AS (SELECT vec_id,
            list_concat([CAST(0.0 AS FLOAT)], embedding[2:]) AS embedding
          FROM embeddings WHERE vec_id BETWEEN 1 AND 5),
        hqq AS (SELECT vec_id, list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * ${SimilarityOps.QScale})
                   AS BIGINT)) AS v
          FROM hqsrc),
        hqn AS (SELECT * FROM (
          SELECT vec_id, v,
                 CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS n2
          FROM hqq) WHERE n2 > 0),
        cent0 AS (SELECT vec_id AS c_id, v AS cv, n2 AS cn2 FROM n
                  WHERE vec_id < ${SimilarityOps.IvfCentroids}),
        hasg AS (SELECT n.vec_id, c.c_id,
                   ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
                     (n.n2 + c.cn2 - 2 * CAST(list_sum(list_transform(
                        range(1, len(n.v) + 1), ii -> n.v[ii] * c.cv[ii]))
                        AS BIGINT)) ASC, c.c_id ASC) AS rc
                 FROM n CROSS JOIN cent0 c),
        hassign AS (SELECT vec_id, c_id FROM hasg WHERE rc = 1),
        hqasg AS (SELECT vec_id, c_id, rc FROM (
          SELECT q.vec_id, c.c_id,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                   (q.n2 + c.cn2 - 2 * CAST(list_sum(list_transform(
                      range(1, len(q.v) + 1), ii -> q.v[ii] * c.cv[ii]))
                      AS BIGINT)) ASC, c.c_id ASC) AS rc
          FROM hqn q CROSS JOIN cent0 c)),
        hprobes AS (SELECT vec_id AS q_id, c_id FROM hqasg
                    WHERE rc <= ${SimilarityOps.IvfProbes}),
        hcand AS (SELECT DISTINCT p.q_id, a.vec_id
                  FROM hprobes p JOIN hassign a USING (c_id)),
        hpd AS (SELECT c.q_id, c.vec_id, q.v AS qvv, q.n2 AS qn2,
                       vn.v AS vv, vn.n2 AS n2
                FROM hcand c
                JOIN hqn q ON q.vec_id = c.q_id
                JOIN n vn ON vn.vec_id = c.vec_id),
        hs AS (SELECT q_id, vec_id, $cosExpr AS cos_sim FROM hpd),
        hr AS (SELECT q_id, vec_id,
                      ROW_NUMBER() OVER (PARTITION BY q_id
                                         ORDER BY cos_sim DESC, vec_id) AS rnk
               FROM hs)"""

  /** Hybrid dense+sparse retrieval twin — CurationOps.hybridTopK:
    * BM25 top-`depth` (corpus replay ≡ the persisted-index serve, the
    * q_bm25_persist equality) RRF-fused with the seed-centroid IVF
    * probe top-`depth`, integer micro-unit contributions, top-`k`.
    */
  def hybridSql(queries: Seq[(Long, String)], depth: Int, k: Int): String =
    s"""WITH ${bm25Ctes("documents", "", queries)},
        ${quantCte("embeddings")},
        $hybridDenseCtes,
        list_a AS (SELECT q_id, doc_id, rnk FROM ranked
                   WHERE rnk <= $depth),
        list_b AS (SELECT q_id, vec_id AS doc_id, rnk FROM hr
                   WHERE rnk <= $depth),
        fused AS (SELECT COALESCE(a.q_id, b.q_id) AS q_id,
                    COALESCE(a.doc_id, b.doc_id) AS doc_id,
                    CAST(COALESCE(a.rnk, 0) AS BIGINT) AS rnk_a,
                    CAST(COALESCE(b.rnk, 0) AS BIGINT) AS rnk_b,
                    CAST(COALESCE(1000000000 // (60 + a.rnk), 0)
                       + COALESCE(1000000000 // (60 + b.rnk), 0)
                       AS BIGINT) AS rrf
                  FROM list_a a FULL OUTER JOIN list_b b
                    ON a.q_id = b.q_id AND a.doc_id = b.doc_id)
        SELECT q_id, doc_id, rnk_a, rnk_b, rrf, rnk FROM (
          SELECT f.*, row_number() OVER (PARTITION BY q_id
                        ORDER BY rrf DESC, doc_id) AS rnk
          FROM fused f) WHERE rnk <= $k"""

  /** One ranker's metric block over the shared truth CTEs (relv /
    * nrel / qterms) — suffix-parameterized so three rankers coexist in
    * the hybrid-eval WITH chain.
    */
  private def evalBlockCtes(listCte: String, sfx: String, tag: String,
                            k: Int): String =
    s"""mk$sfx AS (SELECT t.q_id, t.rnk,
                 CASE WHEN r.doc_id IS NULL THEN 0 ELSE 1 END AS is_rel
               FROM $listCte t LEFT JOIN relv r
                 ON r.q_id = t.q_id AND r.doc_id = t.doc_id),
        cm$sfx AS (SELECT q_id, rnk, is_rel,
                 SUM(is_rel) OVER (PARTITION BY q_id ORDER BY rnk)
                   AS cum_hits
               FROM mk$sfx),
        pq$sfx AS (SELECT q_id, CAST(SUM(is_rel) AS BIGINT) AS hits_k,
                 MIN(CASE WHEN is_rel = 1 THEN rnk END) AS fr,
                 CAST(SUM(CASE WHEN is_rel = 1
                   THEN (cum_hits * 1000000) // rnk ELSE 0 END) AS BIGINT)
                   AS ap_num
               FROM cm$sfx GROUP BY q_id),
        out$sfx AS (SELECT '$tag' AS ranker, qi.q_id,
                   COALESCE(n.n_rel, 0) AS n_rel,
                   COALESCE(p.hits_k, 0) AS hits_k,
                   CAST(COALESCE(p.fr, 0) AS BIGINT) AS first_rel,
                   COALESCE(p.ap_num, 0) AS ap_num
                 FROM (SELECT DISTINCT q_id FROM qterms) qi
                 LEFT JOIN pq$sfx p ON p.q_id = qi.q_id
                 LEFT JOIN nrel n ON n.q_id = qi.q_id)"""

  /** Hybrid side-by-side eval twin — CurationOps.rankEvalMulti over
    * sparse@`k`, dense@`k`, and hybrid@`k` (fused from the two
    * `depth`-deep lists): one conjunctive truth set, one metric block
    * per ranker, UNION ALL.
    */
  def hybridEvalSql(queries: Seq[(Long, String)], depth: Int,
                    k: Int): String = {
    def metrics(src: String) =
      s"""SELECT ranker, q_id, n_rel, hits_k, first_rel,
               CAST(CASE WHEN first_rel > 0 THEN 1000000 // first_rel
                 ELSE 0 END AS BIGINT) AS mrr_ppm,
               (hits_k * 1000000) // $k AS p_at_k_ppm,
               (hits_k * 1000000) // greatest(n_rel, 1) AS recall_ppm,
               ap_num // greatest(least(n_rel, $k), 1) AS ap_ppm
          FROM $src"""
    s"""WITH ${bm25Ctes("documents", "", queries)},
        ${quantCte("embeddings")},
        $hybridDenseCtes,
        list_a AS (SELECT q_id, doc_id, rnk FROM ranked
                   WHERE rnk <= $depth),
        list_b AS (SELECT q_id, vec_id AS doc_id, rnk FROM hr
                   WHERE rnk <= $depth),
        fused AS (SELECT COALESCE(a.q_id, b.q_id) AS q_id,
                    COALESCE(a.doc_id, b.doc_id) AS doc_id,
                    CAST(COALESCE(1000000000 // (60 + a.rnk), 0)
                       + COALESCE(1000000000 // (60 + b.rnk), 0)
                       AS BIGINT) AS rrf
                  FROM list_a a FULL OUTER JOIN list_b b
                    ON a.q_id = b.q_id AND a.doc_id = b.doc_id),
        list_h AS (SELECT q_id, doc_id, rnk FROM (
                     SELECT f.*, row_number() OVER (PARTITION BY q_id
                       ORDER BY rrf DESC, doc_id) AS rnk
                     FROM fused f) WHERE rnk <= $k),
        list_s AS (SELECT q_id, doc_id, rnk FROM list_a WHERE rnk <= $k),
        list_d AS (SELECT q_id, doc_id, rnk FROM list_b WHERE rnk <= $k),
        dw AS (SELECT DISTINCT doc_id, w FROM toks),
        nq AS (SELECT q_id, COUNT(*) AS n_qt FROM qterms GROUP BY q_id),
        mt AS (SELECT q.q_id, d.doc_id, COUNT(*) AS n_match
               FROM dw d JOIN qterms q USING (w) GROUP BY q.q_id, d.doc_id),
        relv AS (SELECT m.q_id, m.doc_id FROM mt m JOIN nq USING (q_id)
                 WHERE m.n_match = nq.n_qt),
        nrel AS (SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_rel
                 FROM relv GROUP BY q_id),
        ${evalBlockCtes("list_s", "_s", "sparse", k)},
        ${evalBlockCtes("list_d", "_d", "dense", k)},
        ${evalBlockCtes("list_h", "_h", "hybrid", k)}
        ${metrics("out_s")} UNION ALL
        ${metrics("out_d")} UNION ALL
        ${metrics("out_h")}"""
  }

  /** Repetition-signal twin: same word-bigram derivation as the ngram
    * oracle (non-distinct — occurrence counts are the signal).
    */
  def repetitionSql: String =
    s"""WITH words AS (SELECT doc_id,
          list_filter(string_split_regex(text, '$Ws'), x -> x <> '') AS w
        FROM documents),
        g AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 2
            THEN list_transform(range(1, len(w)), j -> w[j] || ' ' || w[j+1])
            ELSE CAST([] AS VARCHAR[]) END) AS g
          FROM words),
        c AS (SELECT doc_id, g, COUNT(*) AS cnt FROM g GROUP BY doc_id, g),
        a AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
                     COUNT(*) AS n_distinct, CAST(MAX(cnt) AS BIGINT) AS top_cnt
              FROM c GROUP BY doc_id)
        SELECT doc_id, n_bigrams, n_distinct,
               CAST(top_cnt AS DOUBLE) / n_bigrams AS top_frac,
               CAST(n_distinct AS DOUBLE) / n_bigrams AS distinct_frac
        FROM a"""

  def tokenCountSql: String =
    s"""SELECT doc_id,
          CAST(len(list_filter(string_split_regex(text, '$Ws'), x -> x <> ''))
               AS BIGINT) AS n_ws,
          CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
               AS BIGINT) AS n_bpe
        FROM documents"""

  def fingerprintSql: String =
    s"""WITH g AS (SELECT doc_id, ${hash60("substr(text, j, 8)")} AS g FROM (
          SELECT doc_id, text,
                 unnest(range(1, greatest(len(text) - 6, 1))) AS j
          FROM documents))
        SELECT doc_id, COUNT(*) AS n_grams, MIN(g) AS fp_min,
               CAST(bit_xor(g) AS BIGINT) AS fp_xor
        FROM g GROUP BY doc_id"""

  /** Curation pipeline twin: langId + textStats-quality + md5 dedup +
    * hash sample, composed in SQL exactly like PipelineOps.curate.
    */
  def pipelineSql: String = pipelineBodyOver("documents", "WITH ")

  /** Crawl-to-curation composition twin: html strip CTEs produce the
    * extracted text, the lang column rejoins from the source table,
    * and the whole curate pipeline runs over that relation — mirroring
    * PipelineOps.crawlCurate's single fused plan.
    */
  def crawlPipelineSql: String = pipelineBodyOver("xdocs",
    s"""WITH $htmlStripCtes,
        xdocs AS (SELECT s5.doc_id, s5.main_text AS text, d.lang
                  FROM s5 JOIN documents d USING (doc_id)),
        """)

  /** The curate-pipeline CTE body over a (doc_id, text, lang) relation
    * `src`; `prefix` supplies the WITH header (plus any CTEs that
    * define `src`).
    */
  private def pipelineBodyOver(src: String, prefix: String): String =
    s"""${curateScoreCtes(src, prefix)},
        kept AS (SELECT d.doc_id, d.text, d.lang, b.pred_lang, q.quality,
                        r.top_frac
                 FROM $src d
                 JOIN q USING (doc_id) JOIN best b USING (doc_id)
                 JOIN rep r USING (doc_id)
                 WHERE b.pred_lang = 'en' AND q.quality >= 0.4
                   AND r.top_frac <= 0.04),
        dedup AS (SELECT * FROM (
                    SELECT kept.*, ROW_NUMBER() OVER (PARTITION BY md5(text)
                                                      ORDER BY doc_id) AS rn
                    FROM kept) WHERE rn = 1)
        SELECT doc_id, lang, pred_lang, quality, top_frac,
               CAST(len(text) AS BIGINT) AS n_chars_kept
        FROM dedup
        WHERE ${hash60("'cur-' || CAST(doc_id AS VARCHAR)")} % 100 < 50"""

  /** The shared curation scoring CTE chain over a (doc_id, text)
    * relation `src`, ending at `q` (quality), `best` (pred_lang) and
    * `rep` (top_frac) — one source of truth for [[pipelineSql]],
    * [[crawlPipelineSql]] and [[pipelineFunnelSql]].
    */
  private def curateScoreCtes(src: String, prefix: String): String = {
    val en = TextStatsOps.Stopwords.filter(_._1 == "en")
      .map(w => s"'${w._2}'").mkString(", ")
    val stop = TextStatsOps.Stopwords
      .map { case (l, w) => s"('$l', '$w')" }.mkString(", ")
    s"""${prefix}toks AS (SELECT doc_id,
          unnest(list_filter(string_split_regex(text, '$Ws'), x -> x <> ''))
            AS w
        FROM $src),
        agg AS (SELECT doc_id, COUNT(*) AS n_tokens,
                       COUNT(DISTINCT w) AS n_distinct,
                       CAST(SUM(CASE WHEN w IN ($en) THEN 1 ELSE 0 END)
                            AS BIGINT) AS stop_cnt
                FROM toks GROUP BY doc_id),
        q AS (SELECT doc_id,
                     CAST(least(n_tokens, 100) AS DOUBLE) / 100.0 * 0.4
                       + CAST(stop_cnt AS DOUBLE) / n_tokens * 0.3
                       + CAST(n_distinct AS DOUBLE) / n_tokens * 0.3 AS quality
              FROM agg),
        stop AS (SELECT * FROM (VALUES $stop) t(cand, w)),
        hits AS (SELECT doc_id, cand, COUNT(*) AS hits
                 FROM toks JOIN stop USING (w) GROUP BY doc_id, cand),
        best AS (SELECT doc_id, cand AS pred_lang FROM (
                   SELECT doc_id, cand,
                          ROW_NUMBER() OVER (PARTITION BY doc_id
                                             ORDER BY hits DESC, cand ASC) AS rn
                   FROM hits) WHERE rn = 1),
        big AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 2
                  THEN list_transform(range(1, len(w)), j -> w[j] || ' ' || w[j+1])
                  ELSE CAST([] AS VARCHAR[]) END) AS g
                FROM (SELECT doc_id,
                        list_filter(string_split_regex(text, '$Ws'),
                          x -> x <> '') AS w
                      FROM $src)),
        bc AS (SELECT doc_id, g, COUNT(*) AS cnt FROM big GROUP BY doc_id, g),
        rep AS (SELECT doc_id,
                  CAST(MAX(cnt) AS DOUBLE) / SUM(cnt) AS top_frac
                FROM bc GROUP BY doc_id)"""
  }

  /** Funnel-attrition twin: the same scoring CTEs, but every gate
    * becomes a 0/1 flag over LEFT joins (so nothing drops silently) and
    * the report is one aggregated row unpivoted to a stage ladder —
    * docs and chars surviving each prefix of the curate pipeline.
    */
  def pipelineFunnelSql: String =
    s"""${curateScoreCtes("documents", "WITH ")},
        b AS (SELECT d.doc_id, md5(d.text) AS m,
                     CAST(len(d.text) AS BIGINT) AS n_chars,
                     q.quality, COALESCE(bst.pred_lang, 'und') AS pred_lang,
                     r.top_frac
              FROM documents d
              LEFT JOIN q USING (doc_id)
              LEFT JOIN best bst USING (doc_id)
              LEFT JOIN rep r USING (doc_id)
              WHERE d.text IS NOT NULL),
        f AS (SELECT *,
                CASE WHEN quality IS NOT NULL
                          AND top_frac IS NOT NULL THEN 1 ELSE 0 END AS f1,
                CASE WHEN quality IS NOT NULL AND top_frac IS NOT NULL
                          AND pred_lang = 'en' THEN 1 ELSE 0 END AS f2,
                CASE WHEN top_frac IS NOT NULL AND pred_lang = 'en'
                          AND quality >= 0.4 THEN 1 ELSE 0 END AS f3,
                CASE WHEN pred_lang = 'en' AND quality >= 0.4
                          AND top_frac <= 0.04 THEN 1 ELSE 0 END AS f4
              FROM b),
        keep AS (SELECT m, MIN(doc_id) AS keep_id FROM f
                 WHERE f4 = 1 GROUP BY m),
        g AS (SELECT f.*,
                CASE WHEN f.f4 = 1 AND f.doc_id = k.keep_id
                     THEN 1 ELSE 0 END AS f5
              FROM f LEFT JOIN keep k ON f.m = k.m),
        g2 AS (SELECT *,
                CASE WHEN f5 = 1 AND
                  ${hash60("'cur-' || CAST(doc_id AS VARCHAR)")} % 100 < 50
                     THEN 1 ELSE 0 END AS f6
               FROM g),
        a AS (SELECT COUNT(*) AS c0, CAST(SUM(n_chars) AS BIGINT) AS h0,
                     CAST(SUM(f1) AS BIGINT) AS c1,
                     CAST(SUM(f1 * n_chars) AS BIGINT) AS h1,
                     CAST(SUM(f2) AS BIGINT) AS c2,
                     CAST(SUM(f2 * n_chars) AS BIGINT) AS h2,
                     CAST(SUM(f3) AS BIGINT) AS c3,
                     CAST(SUM(f3 * n_chars) AS BIGINT) AS h3,
                     CAST(SUM(f4) AS BIGINT) AS c4,
                     CAST(SUM(f4 * n_chars) AS BIGINT) AS h4,
                     CAST(SUM(f5) AS BIGINT) AS c5,
                     CAST(SUM(f5 * n_chars) AS BIGINT) AS h5,
                     CAST(SUM(f6) AS BIGINT) AS c6,
                     CAST(SUM(f6 * n_chars) AS BIGINT) AS h6
              FROM g2)
        SELECT '00_input' AS stage, c0 AS n_docs, h0 AS n_chars FROM a
        UNION ALL SELECT '01_scored', c1, h1 FROM a
        UNION ALL SELECT '02_lang', c2, h2 FROM a
        UNION ALL SELECT '03_quality', c3, h3 FROM a
        UNION ALL SELECT '04_repetition', c4, h4 FROM a
        UNION ALL SELECT '05_dedup', c5, h5 FROM a
        UNION ALL SELECT '06_sample', c6, h6 FROM a"""

  // ---- events (EventOps twins) ----

  def sessionizeSql: String =
    s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus, value
                   FROM events),
        f AS (SELECT user_id, event_id, tus, value,
                CASE WHEN lag(tus) OVER w IS NULL
                       OR tus - lag(tus) OVER w > ${EventOps.GapUs}
                     THEN 1 ELSE 0 END AS new_sess
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        s AS (SELECT user_id, tus, value,
                CAST(SUM(new_sess) OVER (PARTITION BY user_id
                                         ORDER BY tus, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  AS sess_idx
              FROM f)
        SELECT user_id, sess_idx, COUNT(*) AS n_events,
               MIN(tus) AS start_us, MAX(tus) AS end_us,
               CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
        FROM s GROUP BY user_id, sess_idx"""

  /** Interval-merge twin: same running-max gaps-and-islands derivation
    * (new island exactly when an interval's start exceeds the max end
    * seen so far), all int64 micros.
    */
  def intervalMergeSql(durUs: Long): String =
    s"""WITH iv AS (SELECT user_id, event_id, epoch_us(ts) AS s,
                           epoch_us(ts) + $durUs AS e
                    FROM events),
        f AS (SELECT user_id, event_id, s, e,
                CASE WHEN max(e) OVER pw IS NULL OR s > max(e) OVER pw
                     THEN 1 ELSE 0 END AS new_isl
              FROM iv WINDOW pw AS (PARTITION BY user_id ORDER BY s, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        g AS (SELECT user_id, s, e,
                CAST(SUM(new_isl) OVER (PARTITION BY user_id
                  ORDER BY s, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  AS isl
              FROM f)
        SELECT user_id, isl, COUNT(*) AS n_events,
               MIN(s) AS start_us, MAX(e) AS end_us,
               MAX(e) - MIN(s) AS covered_us
        FROM g GROUP BY user_id, isl"""

  /** Cumulative-distinct twin: first-seen day per user, per-day counts,
    * running sum over the per-day rollup. `//` floor-div vs Spark's
    * truncating `div` agree because epoch micros are nonnegative.
    */
  def cumulativeDistinctSql(bucketUs: Long): String =
    s"""WITH fs AS (SELECT user_id,
                      MIN((epoch_us(ts) // $bucketUs) * $bucketUs) AS day_us
                    FROM events GROUP BY user_id),
        pd AS (SELECT day_us, COUNT(*) AS new_users FROM fs GROUP BY day_us)
        SELECT day_us, new_users,
               CAST(SUM(new_users) OVER (ORDER BY day_us
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        FROM pd"""

  /** Weighted-moving-average twin: the same k lag terms with
    * power-of-two weights over floor-cents values; j = 0 is the bare
    * current-row column on both engines (no lag-0 edge semantics).
    */
  def wmaSql(k: Int): String = {
    def lagE(j: Int) = if (j == 0) "cents" else s"lag(cents, $j) OVER w"
    val num = (0 until k).map { j =>
      val w = 1L << (k - 1 - j)
      s"CASE WHEN ${lagE(j)} IS NOT NULL THEN ${lagE(j)} * $w ELSE 0 END"
    }.mkString(" + ")
    val den = (0 until k).map { j =>
      val w = 1L << (k - 1 - j)
      s"CASE WHEN ${lagE(j)} IS NOT NULL THEN $w ELSE 0 END"
    }.mkString(" + ")
    s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
                          CAST(floor(value * 100) AS BIGINT) AS cents
                   FROM events)
        SELECT user_id, event_id,
               CAST($num AS BIGINT) AS wma_num,
               CAST($den AS BIGINT) AS wma_den
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)"""
  }

  /** Inverted-index twin: same tokenization, distinct postings, list
    * agg ordered by doc_id, 1-based inclusive cap slice, CSV join.
    */
  def invertedIndexSql(cap: Int): String =
    s"""WITH t0 AS (SELECT doc_id,
          unnest(list_filter(string_split_regex(text, '$Ws'), x -> x <> ''))
            AS term
        FROM documents WHERE text IS NOT NULL),
        toks AS (SELECT DISTINCT doc_id, term FROM t0)
        SELECT term, COUNT(*) AS df,
               array_to_string(list_transform(
                 (list(doc_id ORDER BY doc_id))[1:$cap],
                 x -> CAST(x AS VARCHAR)), ',') AS postings
        FROM toks GROUP BY term"""

  /** Column-profiler twin: one UNION ALL branch per column replicating
    * the single-pass stats (numeric ranges as doubles, exact casts).
    */
  def profileSql(table: String, cols: Seq[(String, Boolean)]): String =
    cols.map { case (c, isNum) =>
      val mn = if (isNum) s"CAST(MIN($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val mx = if (isNum) s"CAST(MAX($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
            COUNT($c) AS n_non_null, COUNT(*) - COUNT($c) AS n_null,
            COUNT(DISTINCT $c) AS n_distinct,
            $mn AS min_num, $mx AS max_num
          FROM $table"""
    }.mkString("\nUNION ALL\n")

  /** Table-digest twin: same `|`-joined canonical string, portable
    * 60-bit hash, and XOR fold per table.
    */
  def tableDigestSql(tables: Seq[(String, Seq[String])]): String =
    tables.map { case (t, cols) =>
      val cc = "concat_ws('|', " +
        cols.map(c => s"CAST($c AS VARCHAR)").mkString(", ") + ")"
      s"""SELECT '$t' AS tbl, COUNT(*) AS n_rows,
            bit_xor(${hash60(cc)}) AS xor_digest FROM $t"""
    }.mkString("\nUNION ALL\n")

  /** Funnel twin: one conditional-min CTE per ordered step (inclusive
    * at-or-after), left joins accumulate depth.
    */
  def funnelSql(steps: Seq[String]): String = {
    val head = steps.head
    val ctes = steps.zipWithIndex.tail.map { case (st, i) =>
      s"""s${i + 1} AS (SELECT e.user_id, MIN(e.tus) AS t${i + 1}_us
            FROM e JOIN s$i ON e.user_id = s$i.user_id
            WHERE e.event_type = '$st' AND e.tus >= s$i.t${i}_us
            GROUP BY e.user_id)"""
    }.mkString(",\n")
    val joins = steps.indices.tail
      .map(i => s"LEFT JOIN s${i + 1} ON s1.user_id = s${i + 1}.user_id")
      .mkString("\n")
    val tcols = steps.indices.map(i => s"t${i + 1}_us").mkString(", ")
    val depth = steps.indices
      .map(i => s"CASE WHEN t${i + 1}_us IS NULL THEN 0 ELSE 1 END")
      .mkString(" + ")
    s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus
                   FROM events),
        s1 AS (SELECT user_id, MIN(tus) AS t1_us FROM e
               WHERE event_type = '$head' GROUP BY user_id),
        $ctes
        SELECT s1.user_id, $tcols, CAST($depth AS BIGINT) AS depth
        FROM s1
        $joins"""
  }

  /** Gap-fill twin: same bucket floor-div, latest-event election via a
    * DESC row_number (Spark's max_by over the unique (tus, event_id)
    * order), dense range grid, and IGNORE NULLS carry-forward.
    */
  def gapFillSql(bucketUs: Long): String =
    s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus, value
                   FROM events),
        eb AS (SELECT user_id, event_id, tus, value,
                      (tus // $bucketUs) * $bucketUs AS bucket_us FROM e),
        pb AS (SELECT user_id, bucket_us, value AS v, n_events FROM (
                 SELECT user_id, bucket_us, value,
                        ROW_NUMBER() OVER (PARTITION BY user_id, bucket_us
                                           ORDER BY tus DESC, event_id DESC)
                          AS rn,
                        COUNT(*) OVER (PARTITION BY user_id, bucket_us)
                          AS n_events
                 FROM eb) WHERE rn = 1),
        grid AS (SELECT user_id,
                        unnest(range(b0, b1 + $bucketUs, $bucketUs))
                          AS bucket_us
                 FROM (SELECT user_id, MIN(bucket_us) AS b0,
                              MAX(bucket_us) AS b1
                       FROM eb GROUP BY user_id)),
        j AS (SELECT g.user_id, g.bucket_us, p.v,
                     COALESCE(p.n_events, 0) AS n_events
              FROM grid g LEFT JOIN pb p USING (user_id, bucket_us))
        SELECT user_id, bucket_us,
               last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
                 ORDER BY bucket_us ROWS UNBOUNDED PRECEDING) AS value_ff,
               CAST(n_events AS BIGINT) AS n_events,
               CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS BIGINT) AS filled
        FROM j"""

  /** Bigram-LM score twin: same bigram derivation as repetitionSql, ppm
    * probabilities as exact integer floor-divs (`//` = Spark's `div` on
    * nonnegative operands), HUGEINT sums cast back to BIGINT.
    */
  def lmScoreSql: String =
    s"""WITH words AS (SELECT doc_id,
          list_filter(string_split_regex(text, '$Ws'), x -> x <> '') AS w
        FROM documents),
        g AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 2
            THEN list_transform(range(1, len(w)), j -> w[j] || ' ' || w[j+1])
            ELSE CAST([] AS VARCHAR[]) END) AS g
          FROM words),
        db AS (SELECT doc_id, g, split_part(g, ' ', 1) AS w1,
                      COUNT(*) AS cnt
               FROM g GROUP BY 1, 2, 3),
        cb AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS cb FROM db GROUP BY g),
        cp AS (SELECT w1, CAST(SUM(cnt) AS BIGINT) AS cp
               FROM db GROUP BY w1),
        s AS (SELECT db.doc_id, db.cnt, (cb.cb * 1000000) // cp.cp AS p_ppm
              FROM db JOIN cb USING (g) JOIN cp USING (w1))
        SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
               CAST(SUM(cnt * p_ppm) AS BIGINT) AS lm_sum,
               CAST(CAST(SUM(cnt * p_ppm) AS BIGINT)
                    // CAST(SUM(cnt) AS BIGINT) AS BIGINT) AS lm_avg_ppm
        FROM s GROUP BY doc_id"""

  /** Persisted-LM lifecycle twin — TextStatsOps.trainWriteLm +
    * scoreWithLm: bigram model trained on the doc_id%10≠0 slice (same
    * integer-ppm conditional as lmScoreSql), held-out slice scored via
    * LEFT JOIN with unseen bigrams at 0 feeding the n_oov counter.
    */
  def lmPersistSql: String =
    s"""WITH words AS (SELECT doc_id,
          list_filter(string_split_regex(text, '$Ws'), x -> x <> '') AS w
        FROM documents),
        g AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 2
            THEN list_transform(range(1, len(w)), j -> w[j] || ' ' || w[j+1])
            ELSE CAST([] AS VARCHAR[]) END) AS g
          FROM words),
        cb AS (SELECT g, COUNT(*) AS cb, split_part(g, ' ', 1) AS w1
               FROM g WHERE doc_id % 10 <> 0 GROUP BY g),
        cp AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS cp
               FROM cb GROUP BY w1),
        model AS (SELECT g, (cb * 1000000) // cp AS p_ppm
                  FROM cb JOIN cp USING (w1)),
        sc AS (SELECT doc_id, g, COUNT(*) AS cnt FROM g
               WHERE doc_id % 10 = 0 GROUP BY 1, 2),
        j AS (SELECT sc.doc_id, sc.cnt, model.p_ppm
              FROM sc LEFT JOIN model USING (g))
        SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
               CAST(SUM(CASE WHEN p_ppm IS NULL THEN cnt ELSE 0 END)
                 AS BIGINT) AS n_oov,
               CAST(SUM(cnt * COALESCE(p_ppm, 0)) AS BIGINT) AS lm_sum,
               CAST(CAST(SUM(cnt * COALESCE(p_ppm, 0)) AS BIGINT)
                    // CAST(SUM(cnt) AS BIGINT) AS BIGINT) AS lm_avg_ppm
        FROM j GROUP BY doc_id"""

  /** Code-vs-prose router twin — TextStatsOps.codeDetect over the
    * planted corpus (doc_id%7≡0 docs get an appended code block):
    * symbol/indent shares in exact ppm ints, fence count, thresholded
    * verdict.
    */
  def codeDetectSql(symPpmThr: Long, indentPpmThr: Long): String =
    s"""WITH planted AS (SELECT doc_id,
          CASE WHEN doc_id % 7 = 0 THEN text || chr(10) ||
            '    if (x) { y[0] = z; }' || chr(10) || '``' || '`' ||
            chr(10) || 'return a;' || chr(10) || '``' || '`'
          ELSE text END AS text
        FROM documents WHERE text IS NOT NULL),
        m AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
          CAST(length(text) - length(regexp_replace(text,
            '[{}();=<>#\\[\\]]', '', 'g')) AS BIGINT) AS n_sym,
          CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
          CAST(len(list_filter(string_split(text, chr(10)),
            l -> regexp_matches(l, '^(    |\\t)'))) AS BIGINT) AS n_indent,
          CAST(len(regexp_extract_all(text, '``' || '`')) AS BIGINT)
            AS n_fences
        FROM planted)
        SELECT doc_id, n_chars, n_sym,
               n_sym * 1000000 // GREATEST(n_chars, 1) AS sym_ppm,
               n_lines, n_indent,
               n_indent * 1000000 // GREATEST(n_lines, 1) AS indent_ppm,
               n_fences,
               CASE WHEN n_sym * 1000000 // GREATEST(n_chars, 1)
                        >= $symPpmThr
                      OR n_indent * 1000000 // GREATEST(n_lines, 1)
                        >= $indentPpmThr
                      OR n_fences > 0
                 THEN 'code' ELSE 'prose' END AS verdict
        FROM m"""

  /** Positional phrase-search twin — CurationOps.phraseSearch: the same
    * offset-trick candidate join (start = position − term index) and
    * slot-count filter over the VALUES-inlined phrase-term table.
    */
  def phraseSearchSql(phrases: Seq[String]): String = {
    val values = phrases.flatMap { ph =>
      val ws = ph.split(" ")
      ws.zipWithIndex.map { case (w, i) =>
        s"('$ph', $i, '$w', ${ws.length})"
      }
    }.mkString(", ")
    s"""WITH words AS (SELECT doc_id,
          list_filter(string_split_regex(text, '$Ws'), x -> x <> '') AS w
        FROM documents WHERE text IS NOT NULL),
        toks AS (SELECT doc_id, unnest(range(0, len(w))) AS p,
                        unnest(w) AS term
                 FROM words),
        ph AS (SELECT * FROM (VALUES $values) AS t(phrase, ti, term, plen)),
        cand AS (SELECT toks.doc_id, ph.phrase, ph.plen,
                        toks.p - ph.ti AS s
                 FROM toks JOIN ph USING (term)),
        occ AS (SELECT doc_id, phrase, plen, s, COUNT(*) AS c
                FROM cand GROUP BY 1, 2, 3, 4)
        SELECT phrase, COUNT(DISTINCT doc_id) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_occ
        FROM occ WHERE c = plen GROUP BY phrase"""
  }

  /** Persisted min-max scaler twin — SimilarityOps.fitWriteScaler +
    * applyScaler: per-dim min/max fitted on the vec_id%10≠0 slice,
    * held-out slice clamped into the fitted range and scaled to
    * [0, 10^6] by integer floor division.
    */
  def scalerApplySql: String =
    s"""WITH qv AS (SELECT vec_id, list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE) * ${SimilarityOps.QScale})
            AS BIGINT)) AS v
        FROM embeddings),
        d AS (SELECT vec_id, r.range AS dim, v[r.range + 1] AS q
              FROM qv, range(0, ${SimilarityOps.Dims}) r),
        fit AS (SELECT dim, MIN(q) AS min_q, MAX(q) AS max_q
                FROM d WHERE vec_id % 10 <> 0 GROUP BY dim),
        ap AS (SELECT d.vec_id,
                 (LEAST(GREATEST(q, min_q), max_q) - min_q) * 1000000
                   // GREATEST(max_q - min_q, 1) AS scaled,
                 CASE WHEN q < min_q OR q > max_q THEN 1 ELSE 0 END
                   AS clamped
               FROM d JOIN fit USING (dim) WHERE vec_id % 10 = 0)
        SELECT vec_id, COUNT(*) AS n_dims,
               CAST(SUM(scaled) AS BIGINT) AS sum_scaled,
               MIN(scaled) AS min_scaled, MAX(scaled) AS max_scaled,
               CAST(SUM(clamped) AS BIGINT) AS n_clamped
        FROM ap GROUP BY vec_id"""

  /** The CDC demo change stream (delete ≡0, two update versions ≡1 —
    * latest wins, insert ≡2 at key+10^9), shared by the merge and SCD2
    * twins. Payload arithmetic is single IEEE ops on parquet-read
    * doubles — engine-identical.
    */
  private val cdcDemoCtes: String =
    s"""b AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  epoch_us(o_orderdate) AS ord_us, o_orderpriority FROM orders),
        ch AS (
          SELECT o_orderkey, o_custkey, o_orderstatus,
                 o_totalprice + 1000.0 AS o_totalprice, ord_us,
                 o_orderpriority, 'U' AS op, 1 AS seq
          FROM b WHERE o_orderkey % 10 = 1
          UNION ALL
          SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 2.0,
                 ord_us, o_orderpriority, 'U', 2
          FROM b WHERE o_orderkey % 10 = 1
          UNION ALL
          SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, ord_us,
                 o_orderpriority, 'D', 1
          FROM b WHERE o_orderkey % 10 = 0
          UNION ALL
          SELECT o_orderkey + 1000000000, o_custkey, o_orderstatus,
                 o_totalprice, ord_us, o_orderpriority, 'I', 1
          FROM b WHERE o_orderkey % 10 = 2)"""

  /** CDC merge twin: latest election via row_number, application via
    * full join.
    */
  def mergeUpsertSql: String =
    s"""WITH $cdcDemoCtes,
        l AS (SELECT * FROM (SELECT ch.*, row_number() OVER
                (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn FROM ch)
              WHERE rn = 1)
        SELECT COALESCE(l.o_orderkey, b.o_orderkey) AS o_orderkey,
               CASE WHEN l.op IS NOT NULL THEN l.o_custkey
                    ELSE b.o_custkey END AS o_custkey,
               CASE WHEN l.op IS NOT NULL THEN l.o_orderstatus
                    ELSE b.o_orderstatus END AS o_orderstatus,
               CASE WHEN l.op IS NOT NULL THEN l.o_totalprice
                    ELSE b.o_totalprice END AS o_totalprice,
               CASE WHEN l.op IS NOT NULL THEN l.ord_us
                    ELSE b.ord_us END AS ord_us,
               CASE WHEN l.op IS NOT NULL THEN l.o_orderpriority
                    ELSE b.o_orderpriority END AS o_orderpriority
        FROM b FULL JOIN l ON b.o_orderkey = l.o_orderkey
        WHERE l.op IS NULL OR l.op <> 'D'"""

  /** SCD2 twin: base snapshot as version seq=0, one lead() window per
    * key for the validity intervals, D tombstones close but never emit.
    */
  def scd2Sql: String =
    s"""WITH $cdcDemoCtes,
        v AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                     ord_us, o_orderpriority, 'I' AS op, 0 AS seq FROM b
              UNION ALL
              SELECT * FROM ch),
        w AS (SELECT *, lead(seq) OVER (PARTITION BY o_orderkey
                                        ORDER BY seq) AS vto
              FROM v)
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, ord_us,
               o_orderpriority,
               CAST(seq AS BIGINT) AS valid_from_seq,
               CAST(vto AS BIGINT) AS valid_to_seq,
               CAST(CASE WHEN vto IS NULL THEN 1 ELSE 0 END AS BIGINT)
                 AS is_current
        FROM w WHERE op <> 'D'"""

  /** Point-in-time twin: replay changes with seq ≤ atSeq, last writer
    * wins — an INDEPENDENT reconstruction of the snapshot the SCD2
    * interval filter claims for that seq.
    */
  def pitLookupSql(atSeq: Long): String =
    s"""WITH $cdcDemoCtes,
        l AS (SELECT * FROM (SELECT ch.*, row_number() OVER
                (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
              FROM ch WHERE seq <= $atSeq)
              WHERE rn = 1)
        SELECT COALESCE(l.o_orderkey, b.o_orderkey) AS o_orderkey,
               CASE WHEN l.op IS NOT NULL THEN l.o_custkey
                    ELSE b.o_custkey END AS o_custkey,
               CASE WHEN l.op IS NOT NULL THEN l.o_orderstatus
                    ELSE b.o_orderstatus END AS o_orderstatus,
               CASE WHEN l.op IS NOT NULL THEN l.o_totalprice
                    ELSE b.o_totalprice END AS o_totalprice,
               CASE WHEN l.op IS NOT NULL THEN l.ord_us
                    ELSE b.ord_us END AS ord_us,
               CASE WHEN l.op IS NOT NULL THEN l.o_orderpriority
                    ELSE b.o_orderpriority END AS o_orderpriority
        FROM b FULL JOIN l ON b.o_orderkey = l.o_orderkey
        WHERE l.op IS NULL OR l.op <> 'D'"""

  /** Table-diff twin: rebuild the merged snapshot, then classify keys
    * with a full join + column-wise IS DISTINCT FROM.
    */
  def tableDiffSql: String =
    s"""WITH $cdcDemoCtes,
        l AS (SELECT * FROM (SELECT ch.*, row_number() OVER
                (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn FROM ch)
              WHERE rn = 1),
        m AS (SELECT COALESCE(l.o_orderkey, b.o_orderkey) AS o_orderkey,
               CASE WHEN l.op IS NOT NULL THEN l.o_custkey
                    ELSE b.o_custkey END AS o_custkey,
               CASE WHEN l.op IS NOT NULL THEN l.o_orderstatus
                    ELSE b.o_orderstatus END AS o_orderstatus,
               CASE WHEN l.op IS NOT NULL THEN l.o_totalprice
                    ELSE b.o_totalprice END AS o_totalprice,
               CASE WHEN l.op IS NOT NULL THEN l.ord_us
                    ELSE b.ord_us END AS ord_us,
               CASE WHEN l.op IS NOT NULL THEN l.o_orderpriority
                    ELSE b.o_orderpriority END AS o_orderpriority
              FROM b FULL JOIN l ON b.o_orderkey = l.o_orderkey
              WHERE l.op IS NULL OR l.op <> 'D'),
        d AS (SELECT COALESCE(b.o_orderkey, m.o_orderkey) AS k,
               CASE WHEN b.o_orderkey IS NULL THEN 'added'
                    WHEN m.o_orderkey IS NULL THEN 'removed'
                    WHEN (b.o_custkey IS DISTINCT FROM m.o_custkey)
                      OR (b.o_orderstatus IS DISTINCT FROM m.o_orderstatus)
                      OR (b.o_totalprice IS DISTINCT FROM m.o_totalprice)
                      OR (b.ord_us IS DISTINCT FROM m.ord_us)
                      OR (b.o_orderpriority IS DISTINCT FROM m.o_orderpriority)
                    THEN 'changed' ELSE 'unchanged' END AS status
              FROM b FULL JOIN m ON b.o_orderkey = m.o_orderkey)
        SELECT status, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_key
        FROM d GROUP BY status"""

  /** Stream-stream interval-join twin: the batch view→click attribution
    * join the streamed self-join must reproduce exactly — all-int64
    * micros arithmetic on both engines, boundaries inclusive.
    */
  def streamJoinSql(maxLagUs: Long): String =
    s"""SELECT a.event_id AS view_id, b.event_id AS click_id, a.user_id,
               epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND a.event_type = 'view' AND b.event_type = 'click'
         AND epoch_us(b.ts) >= epoch_us(a.ts)
         AND epoch_us(b.ts) <= epoch_us(a.ts) + $maxLagUs"""

  /** Left-outer twin of [[streamJoinSql]]: unmatched views keep null
    * click columns — the watermark-eviction rows of the streaming
    * replay.
    */
  def streamJoinOuterSql(maxLagUs: Long): String =
    s"""WITH v AS (SELECT event_id, user_id, epoch_us(ts) AS t
                   FROM events WHERE event_type = 'view'),
             c AS (SELECT event_id, user_id, epoch_us(ts) AS t
                   FROM events WHERE event_type = 'click')
        SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id,
               c.t - v.t AS dt_us
        FROM v LEFT JOIN c
          ON v.user_id = c.user_id
         AND c.t >= v.t AND c.t <= v.t + $maxLagUs"""

  /** Full-outer twin: unmatched rows on EITHER side survive with the
    * other side null — the two-sided watermark-eviction contract.
    */
  def streamJoinFullSql(maxLagUs: Long): String =
    s"""WITH v AS (SELECT event_id, user_id, epoch_us(ts) AS t
                   FROM events WHERE event_type = 'view'),
             c AS (SELECT event_id, user_id, epoch_us(ts) AS t
                   FROM events WHERE event_type = 'click')
        SELECT v.event_id AS view_id, c.event_id AS click_id,
               coalesce(v.user_id, c.user_id) AS user_id,
               c.t - v.t AS dt_us
        FROM v FULL JOIN c
          ON v.user_id = c.user_id
         AND c.t >= v.t AND c.t <= v.t + $maxLagUs"""

  /** Replay twin: the same gap-session derivation as sessionizeSql, with
    * the session index grouped away — the shape StreamOps.sessionizeReplay
    * projects the session_window result onto.
    */
  def sessionizeReplaySql: String =
    s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus, value
                   FROM events),
        f AS (SELECT user_id, event_id, tus, value,
                CASE WHEN lag(tus) OVER w IS NULL
                       OR tus - lag(tus) OVER w > ${EventOps.GapUs}
                     THEN 1 ELSE 0 END AS new_sess
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        s AS (SELECT user_id, tus, value,
                CAST(SUM(new_sess) OVER (PARTITION BY user_id
                                         ORDER BY tus, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  AS sess_idx
              FROM f)
        SELECT user_id, MIN(tus) AS start_us, MAX(tus) AS end_us,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
        FROM s GROUP BY user_id, sess_idx"""

  def jsonStatsSql: String =
    s"""SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(json_extract(props, '$$.k') AS BIGINT)) AS BIGINT)
                 AS sum_k,
               CAST(SUM(CAST(json_extract(props, '$$.k') AS BIGINT)) AS DOUBLE)
                 / COUNT(*) AS avg_k
        FROM events GROUP BY event_type"""

  def multimodalSql: String =
    s"""SELECT CASE (doc_id % 3) WHEN 0 THEN 'png' WHEN 1 THEN 'jpg'
                 ELSE 'wav' END AS fmt,
               COUNT(*) AS n_assets,
               CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
               CAST(SUM(octet_length(encode(text))) AS DOUBLE) / COUNT(*)
                 AS avg_bytes
        FROM documents GROUP BY 1"""

  /** Frame-sample twin in closed form: with C = 256-byte chunks and every
    * 2nd sampled, n_frames = (nchunks−1)//2 + 1 and the byte total is
    * full chunks except when the (partial) last chunk is sampled.
    */
  def frameSampleSql: String =
    s"""WITH a AS (SELECT doc_id AS asset_id,
                          octet_length(encode(text)) AS len FROM documents),
        c AS (SELECT asset_id, len,
                     CAST(ceil(len / 256.0) AS BIGINT) AS nchunks
              FROM a WHERE len > 0),
        s AS (SELECT asset_id, len, nchunks,
                     (nchunks - 1) // 2 + 1 AS n_frames,
                     ((nchunks - 1) // 2) * 2 AS max_idx
              FROM c)
        SELECT asset_id, n_frames,
               CASE WHEN max_idx = nchunks - 1
                    THEN 256 * (n_frames - 1) + (len - 256 * (nchunks - 1))
                    ELSE 256 * n_frames END AS sampled_bytes
        FROM s"""

  def parseTolerantSql: String =
    s"""WITH lines AS (
          SELECT unnest(list_filter(string_split_regex(text, '$Ws'),
                                    x -> x <> '')) AS line FROM documents
          UNION ALL SELECT CAST(l_quantity AS VARCHAR) FROM lineitem
          UNION ALL SELECT '#' || CAST(o_orderkey AS VARCHAR) FROM orders),
        p AS (SELECT TRY_CAST(line AS DOUBLE) AS v FROM lines)
        SELECT COUNT(*) AS n_lines, COUNT(v) AS n_parsed,
               COUNT(*) - COUNT(v) AS n_dropped,
               CAST(SUM(CAST(COALESCE(v, 0.0) AS DECIMAL(28,4))) AS DOUBLE)
                 AS sum_parsed
        FROM p"""

  // ---- round-9 additions: span dedup, classifier apply, budget select,
  //      PII report, int8 quantization, SemDeDup, URL prefix filter ----

  /** Duplicated-substring twin: quote corpus (DedupOps.quoteCorpus —
    * every third doc spawns a +1M twin embedding words 3..14 between
    * unique framing), word 8-grams hashed with the shared portable
    * formula, df ≥ 2 marks, gaps-and-islands longest run.
    */
  /** Novelty twin — DedupOps.noveltyStats over the dup corpus: same
    * distinct-8-gram derivation, first occurrence by min doc_id.
    */
  def noveltySql: String =
    s"""WITH $corpusCte,
        words AS (SELECT doc_id,
            list_filter(string_split_regex(text, '$Ws'), x -> x <> '') AS w
          FROM corpus WHERE text IS NOT NULL),
        g AS (SELECT DISTINCT doc_id,
            unnest(list_transform(range(1, len(w) - 6),
              j -> ${hash60("array_to_string(list_slice(w, j, j + 7), ' ')")}))
              AS sh
          FROM words WHERE len(w) >= 8),
        f AS (SELECT sh, min(doc_id) AS first_doc FROM g GROUP BY sh)
        SELECT g.doc_id, count(*) AS n_distinct,
               CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_novel,
               CAST((CAST(sum(CASE WHEN f.first_doc = g.doc_id
                   THEN 1 ELSE 0 END) AS BIGINT) * 1000000) // count(*)
                 AS BIGINT) AS novelty_ppm
        FROM g JOIN f USING (sh) GROUP BY g.doc_id"""

  /** Containment twin — DedupOps.containmentPairs over the quote
    * corpus: same distinct-8-gram sets, df ≤ 100 rare filter, exact
    * two-direction containment ppm.
    */
  def dedupContainmentSql: String =
    s"""WITH qdocs AS (SELECT doc_id, text FROM documents
                       WHERE text IS NOT NULL),
        qw AS (SELECT doc_id,
                 list_filter(string_split_regex(text, '$Ws'), x -> x <> '')
                   AS w
               FROM qdocs),
        corpus2 AS (
          SELECT doc_id, text FROM qdocs
          UNION ALL
          SELECT doc_id + 1000000,
                 'quoteopen' || CAST(doc_id AS VARCHAR) ||
                 ' begins here now ' ||
                 array_to_string(list_slice(w, 3, 14), ' ') ||
                 ' quoteclose' || CAST(doc_id AS VARCHAR) AS text
          FROM qw WHERE doc_id % 3 = 0),
        words AS (SELECT doc_id,
                    list_filter(string_split_regex(text, '$Ws'),
                                x -> x <> '') AS w
                  FROM corpus2),
        g AS (SELECT DISTINCT doc_id,
                unnest(list_transform(range(1, len(w) - 6),
                  j -> ${hash60("array_to_string(list_slice(w, j, j + 7), ' ')")}))
                  AS sh
              FROM words WHERE len(w) >= 8),
        rare AS (SELECT sh FROM (SELECT sh, count(*) AS c FROM g
                                 GROUP BY sh) WHERE c <= 100),
        gr AS (SELECT g.doc_id, g.sh,
                 count(*) OVER (PARTITION BY g.doc_id) AS n
               FROM g JOIN rare USING (sh)),
        p AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
                CAST(x.n AS BIGINT) AS na, CAST(y.n AS BIGINT) AS nb,
                count(*) AS inter
              FROM gr x JOIN gr y
                ON x.sh = y.sh AND x.doc_id < y.doc_id
              GROUP BY 1, 2, 3, 4)
        SELECT doc_a, doc_b, inter, na, nb,
               CAST((inter * 1000000) // na AS BIGINT) AS cont_a_ppm,
               CAST((inter * 1000000) // nb AS BIGINT) AS cont_b_ppm
        FROM p
        WHERE greatest((inter * 1000000) // na,
                       (inter * 1000000) // nb) >= 300000"""

  /** CDC chunking twin — DedupOps.cdcChunkStats over the quote corpus:
    * 1-based gram positions (the fingerprintSql indexing), boundary at
    * j = 1 or hash ≡ 0 (mod 64), chunk = substring to the next
    * boundary, md5-keyed sharing across distinct docs.
    */
  def dedupCdcSql: String =
    s"""WITH qdocs AS (SELECT doc_id, text FROM documents
                       WHERE text IS NOT NULL),
        qw AS (SELECT doc_id,
                 list_filter(string_split_regex(text, '$Ws'), x -> x <> '')
                   AS w
               FROM qdocs),
        corpus2 AS (
          SELECT doc_id, text FROM qdocs
          UNION ALL
          SELECT doc_id + 1000000,
                 'quoteopen' || CAST(doc_id AS VARCHAR) ||
                 ' begins here now ' ||
                 array_to_string(list_slice(w, 3, 14), ' ') ||
                 ' quoteclose' || CAST(doc_id AS VARCHAR) AS text
          FROM qw WHERE doc_id % 3 = 0),
        pos AS (SELECT doc_id, text,
                  unnest(range(1, greatest(len(text) - 6, 1))) AS j
                FROM corpus2),
        hh AS (SELECT doc_id, text, j, ${hash60("substr(text, j, 8)")} AS h
               FROM pos),
        starts AS (SELECT doc_id, text, j FROM hh
                   WHERE j = 1 OR h % 64 = 0),
        ch AS (SELECT doc_id, md5(substring(text, j,
                 coalesce(lead(j) OVER (PARTITION BY doc_id ORDER BY j),
                          len(text) + 1) - j)) AS dg
               FROM starts),
        share AS (SELECT dg, COUNT(*) AS ndocs
                  FROM (SELECT DISTINCT dg, doc_id FROM ch) GROUP BY dg)
        SELECT c.doc_id, COUNT(*) AS n_chunks,
               CAST(SUM(CASE WHEN s.ndocs >= 2 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_shared,
               CAST(SUM(CASE WHEN s.ndocs >= 2 THEN 1 ELSE 0 END)
                 AS BIGINT) * 1000000 // COUNT(*) AS shared_ppm
        FROM ch c JOIN share s USING (dg) GROUP BY c.doc_id"""

  /** CDC savings twin: the [[dedupCdcSql]] chunk derivation reduced to
    * the one-row store-planner report (instances vs distinct digests,
    * chars held vs chars a single-copy store would hold).
    */
  def dedupCdcSavingsSql: String =
    s"""WITH qdocs AS (SELECT doc_id, text FROM documents
                       WHERE text IS NOT NULL),
        qw AS (SELECT doc_id,
                 list_filter(string_split_regex(text, '$Ws'), x -> x <> '')
                   AS w
               FROM qdocs),
        corpus2 AS (
          SELECT doc_id, text FROM qdocs
          UNION ALL
          SELECT doc_id + 1000000,
                 'quoteopen' || CAST(doc_id AS VARCHAR) ||
                 ' begins here now ' ||
                 array_to_string(list_slice(w, 3, 14), ' ') ||
                 ' quoteclose' || CAST(doc_id AS VARCHAR) AS text
          FROM qw WHERE doc_id % 3 = 0),
        pos AS (SELECT doc_id, text,
                  unnest(range(1, greatest(len(text) - 6, 1))) AS j
                FROM corpus2),
        hh AS (SELECT doc_id, text, j, ${hash60("substr(text, j, 8)")} AS h
               FROM pos),
        starts AS (SELECT doc_id, text, j FROM hh
                   WHERE j = 1 OR h % 64 = 0),
        ch AS (SELECT doc_id, substring(text, j,
                 coalesce(lead(j) OVER (PARTITION BY doc_id ORDER BY j),
                          len(text) + 1) - j) AS chunk
               FROM starts),
        cd AS (SELECT md5(chunk) AS dg, CAST(len(chunk) AS BIGINT) AS clen
               FROM ch),
        t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_chunks,
                     CAST(SUM(clen) AS BIGINT) AS total_chars FROM cd),
        u AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct,
                     CAST(SUM(clen) AS BIGINT) AS distinct_chars
              FROM (SELECT dg, MAX(clen) AS clen FROM cd GROUP BY dg))
        SELECT n_chunks, n_distinct, total_chars, distinct_chars,
               ((total_chars - distinct_chars) * 1000000) // total_chars
                 AS savings_ppm
        FROM t, u WHERE n_chunks > 0"""

  def dedupSubstringSql: String =
    s"""WITH qdocs AS (SELECT doc_id, text FROM documents
                       WHERE text IS NOT NULL),
        qw AS (SELECT doc_id,
                 list_filter(string_split_regex(text, '$Ws'), x -> x <> '')
                   AS w
               FROM qdocs),
        corpus2 AS (
          SELECT doc_id, text FROM qdocs
          UNION ALL
          SELECT doc_id + 1000000,
                 'quoteopen' || CAST(doc_id AS VARCHAR) ||
                 ' begins here now ' ||
                 array_to_string(list_slice(w, 3, 14), ' ') ||
                 ' quoteclose' || CAST(doc_id AS VARCHAR) AS text
          FROM qw WHERE doc_id % 3 = 0),
        words AS (SELECT doc_id,
                    list_filter(string_split_regex(text, '$Ws'),
                                x -> x <> '') AS w
                  FROM corpus2),
        g AS (SELECT doc_id,
                unnest(range(1, len(w) - 6)) AS pos,
                unnest(list_transform(range(1, len(w) - 6),
                  j -> ${hash60("array_to_string(list_slice(w, j, j + 7), ' ')")}))
                  AS sh
              FROM words WHERE len(w) >= 8),
        d AS (SELECT sh FROM (SELECT sh, COUNT(DISTINCT doc_id) AS df
                              FROM g GROUP BY sh) WHERE df >= 2),
        m AS (SELECT g.doc_id, g.pos,
                     CASE WHEN d.sh IS NULL THEN 0 ELSE 1 END AS is_dup
              FROM g LEFT JOIN d ON g.sh = d.sh),
        runs AS (SELECT doc_id,
                   pos - ROW_NUMBER() OVER (PARTITION BY doc_id
                                            ORDER BY pos) AS isl
                 FROM m WHERE is_dup = 1),
        mr AS (SELECT doc_id, MAX(c) AS max_run FROM (
                 SELECT doc_id, isl, COUNT(*) AS c FROM runs
                 GROUP BY doc_id, isl) GROUP BY doc_id),
        st AS (SELECT doc_id, COUNT(*) AS n_grams,
                      CAST(SUM(is_dup) AS BIGINT) AS n_dup
               FROM m GROUP BY doc_id)
        SELECT st.doc_id, st.n_grams, st.n_dup,
               st.n_dup * 1000000 // st.n_grams AS dup_ppm,
               COALESCE(mr.max_run, 0) AS max_run
        FROM st LEFT JOIN mr ON st.doc_id = mr.doc_id"""

  /** Classifier-weight CTE chain ending in `wts(w, wt)` + the training
    * token stream `tk2` — twin of TextStatsOps.classifierWeights.
    */
  private val classifierWtsCtes: String =
    s"""tk AS (SELECT doc_id, lang,
                 unnest(string_split_regex(lower(text), '$Ws')) AS w
               FROM documents),
        tk2 AS (SELECT * FROM tk WHERE regexp_full_match(w, '[a-z]+')),
        cnt AS (SELECT w,
                 CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                   AS BIGINT) AS cpos,
                 CAST(SUM(CASE WHEN lang IS NOT NULL AND lang <> 'en'
                          THEN 1 ELSE 0 END) AS BIGINT) AS cneg
               FROM tk2 GROUP BY w),
        tot AS (SELECT CAST(SUM(cpos) AS BIGINT) AS tpos,
                       CAST(SUM(cneg) AS BIGINT) AS tneg,
                       COUNT(*) AS vocab
                FROM cnt),
        wts AS (SELECT w,
                  CAST(((cpos + 1) * 1000000) // (tpos + vocab)
                    - ((cneg + 1) * 1000000) // (tneg + vocab) AS BIGINT)
                    AS wt
                FROM cnt, tot)"""

  /** Linear-classifier twin: identical smoothed ppm-difference weights
    * and int64 document sums (TextStatsOps.linearClassifierApply).
    */
  def classifierApplySql: String =
    s"""WITH $classifierWtsCtes,
        sc AS (SELECT doc_id, lang, CAST(SUM(wt) AS BIGINT) AS score
               FROM tk2 JOIN wts USING (w) GROUP BY doc_id, lang)
        SELECT lang,
               CASE WHEN score > 0 THEN 'en' ELSE 'other' END AS pred,
               COUNT(*) AS n_docs, CAST(SUM(score) AS BIGINT) AS sum_score
        FROM sc GROUP BY lang, pred"""

  /** Persisted-classifier twin: the same trained weights (persisted ≡
    * trained), applied to the corpus with one appended OOV token per
    * doc via a LEFT join (OOV weight 0, counted).
    */
  /** Calibration twin — same trained weights, in-sample scoring, rank
    * deciles under the (score, doc_id) total order.
    */
  def calibrationSql: String =
    s"""WITH $classifierWtsCtes,
        sc AS (SELECT a.doc_id, a.lang,
                 CAST(SUM(COALESCE(ww.wt, 0)) AS BIGINT) AS score
               FROM tk2 a LEFT JOIN wts ww ON a.w = ww.w
               GROUP BY a.doc_id, a.lang),
        nn AS (SELECT count(*) AS n_all FROM sc),
        r AS (SELECT lang, score,
                row_number() OVER (ORDER BY score, doc_id) AS rn
              FROM sc),
        dcl AS (SELECT lang, score, ((rn - 1) * 10) // n_all AS decile
                FROM r, nn)
        SELECT decile, count(*) AS n,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_pos,
               CAST(sum(CASE WHEN score > 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_predpos,
               CAST(min(score) AS BIGINT) AS min_score,
               CAST(max(score) AS BIGINT) AS max_score,
               CAST((sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                 * 1000000) // count(*) AS BIGINT) AS pos_rate_ppm
        FROM dcl GROUP BY decile"""

  def classifierPersistSql: String =
    s"""WITH $classifierWtsCtes,
        adocs AS (SELECT doc_id, lang, text || ' qzjxvw' AS text
                  FROM documents WHERE text IS NOT NULL),
        atk AS (SELECT doc_id, lang,
                  unnest(string_split_regex(lower(text), '$Ws')) AS w
                FROM adocs),
        atk2 AS (SELECT * FROM atk WHERE regexp_full_match(w, '[a-z]+')),
        sc AS (SELECT a.doc_id, a.lang, COUNT(*) AS n_toks,
                 CAST(SUM(CASE WHEN ww.wt IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_oov,
                 CAST(SUM(COALESCE(ww.wt, 0)) AS BIGINT) AS score
               FROM atk2 a LEFT JOIN wts ww ON a.w = ww.w
               GROUP BY a.doc_id, a.lang)
        SELECT doc_id, lang, n_toks, n_oov, score,
               CASE WHEN score > 0 THEN 'en' ELSE 'other' END AS pred
        FROM sc"""

  /** Streaming-classifier twin: stateless inference means streaming ≡
    * batch, so the oracle scores both arrival slices (base + drifted
    * +1M twin) in one pass with the same trained weights.
    */
  def classifierStreamSql: String =
    s"""WITH $classifierWtsCtes,
        adocs AS (
          SELECT doc_id, lang, text || ' qzjxvw' AS text
          FROM documents WHERE text IS NOT NULL
          UNION ALL
          SELECT doc_id + 1000000, lang,
                 text || ' qzjxvw zzdrift qqdrift' AS text
          FROM documents WHERE text IS NOT NULL),
        atk AS (SELECT doc_id, lang,
                  unnest(string_split_regex(lower(text), '$Ws')) AS w
                FROM adocs),
        atk2 AS (SELECT * FROM atk WHERE regexp_full_match(w, '[a-z]+')),
        sc AS (SELECT a.doc_id, a.lang, COUNT(*) AS n_toks,
                 CAST(SUM(CASE WHEN ww.wt IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_oov,
                 CAST(SUM(COALESCE(ww.wt, 0)) AS BIGINT) AS score
               FROM atk2 a LEFT JOIN wts ww ON a.w = ww.w
               GROUP BY a.doc_id, a.lang)
        SELECT doc_id, lang, n_toks, n_oov, score,
               CASE WHEN score > 0 THEN 'en' ELSE 'other' END AS pred
        FROM sc"""

  /** Hard-negative twin: brute cosine ranking restricted to
    * different-label candidates (null labels never pair).
    */
  def hardNegativesSql: String =
    s"""WITH lqv AS (SELECT vec_id, label, list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE) * ${SimilarityOps.QScale})
                 AS BIGINT)) AS v
        FROM embeddings),
        ln AS (SELECT * FROM (
          SELECT vec_id, label, v,
                 CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT)
                   AS n2
          FROM lqv) WHERE n2 > 0),
        q AS (SELECT vec_id AS q_id, label AS q_label, v AS qvv,
                     n2 AS qn2
              FROM ln WHERE vec_id < 5),
        c AS (SELECT q.q_id, ln.vec_id, q.qvv, q.qn2, ln.v AS vv, ln.n2
              FROM q JOIN ln ON ln.label <> q.q_label),
        s AS (SELECT q_id, vec_id, $cosExpr AS cos_sim FROM c),
        r AS (SELECT q_id, vec_id, cos_sim,
                     ROW_NUMBER() OVER (PARTITION BY q_id
                                        ORDER BY cos_sim DESC, vec_id)
                       AS rnk
              FROM s)
        SELECT q_id, vec_id, cos_sim, rnk FROM r WHERE rnk <= 10"""

  /** Length-bucket twin: identical next-power-of-two bit math. */
  def lengthBucketsSql: String =
    s"""WITH t AS (SELECT CAST(len(list_filter(
             string_split_regex(text, '$Ws'), x -> x <> '')) AS BIGINT)
             AS n_tok
           FROM documents WHERE text IS NOT NULL),
        t2 AS (SELECT n_tok FROM t WHERE n_tok > 0),
        b AS (SELECT n_tok,
                CASE WHEN n_tok = 1 THEN 1
                     ELSE CAST(1 AS BIGINT) << length(bin(n_tok - 1))
                END AS cap
              FROM t2),
        g AS (SELECT cap, COUNT(*) AS n_docs,
                     CAST(SUM(n_tok) AS BIGINT) AS sum_tok
              FROM b GROUP BY cap)
        SELECT cap, n_docs, sum_tok, cap * n_docs AS padded_tok,
               (cap * n_docs - sum_tok) * 1000000 // (cap * n_docs)
                 AS waste_ppm
        FROM g"""

  /** Incremental span-dedup twin: the snapshot's distinct gram set is
    * the persisted index; arrival (quote-twin) gram positions LEFT-join
    * it, then the shared islands tail.
    */
  def dedupSubstringIncrSql: String =
    s"""WITH qdocs AS (SELECT doc_id, text FROM documents
                       WHERE text IS NOT NULL),
        qw AS (SELECT doc_id,
                 list_filter(string_split_regex(text, '$Ws'), x -> x <> '')
                   AS w
               FROM qdocs),
        ig AS (SELECT DISTINCT
                 unnest(list_transform(range(1, len(w) - 6),
                   j -> ${hash60("array_to_string(list_slice(w, j, j + 7), ' ')")}))
                   AS sh
               FROM qw WHERE len(w) >= 8),
        arr AS (SELECT doc_id + 1000000 AS doc_id,
                 'quoteopen' || CAST(doc_id AS VARCHAR) ||
                 ' begins here now ' ||
                 array_to_string(list_slice(w, 3, 14), ' ') ||
                 ' quoteclose' || CAST(doc_id AS VARCHAR) AS text
               FROM qw WHERE doc_id % 3 = 0),
        aw AS (SELECT doc_id,
                 list_filter(string_split_regex(text, '$Ws'), x -> x <> '')
                   AS w
               FROM arr),
        ag AS (SELECT doc_id,
                 unnest(range(1, len(w) - 6)) AS pos,
                 unnest(list_transform(range(1, len(w) - 6),
                   j -> ${hash60("array_to_string(list_slice(w, j, j + 7), ' ')")}))
                   AS sh
               FROM aw WHERE len(w) >= 8),
        m AS (SELECT ag.doc_id, ag.pos,
                     CASE WHEN ig.sh IS NULL THEN 0 ELSE 1 END AS is_dup
              FROM ag LEFT JOIN ig ON ag.sh = ig.sh),
        runs AS (SELECT doc_id,
                   pos - ROW_NUMBER() OVER (PARTITION BY doc_id
                                            ORDER BY pos) AS isl
                 FROM m WHERE is_dup = 1),
        mr AS (SELECT doc_id, MAX(c) AS max_run FROM (
                 SELECT doc_id, isl, COUNT(*) AS c FROM runs
                 GROUP BY doc_id, isl) GROUP BY doc_id),
        st AS (SELECT doc_id, COUNT(*) AS n_grams,
                      CAST(SUM(is_dup) AS BIGINT) AS n_dup
               FROM m GROUP BY doc_id)
        SELECT st.doc_id, st.n_grams, st.n_dup,
               st.n_dup * 1000000 // st.n_grams AS dup_ppm,
               COALESCE(mr.max_run, 0) AS max_run
        FROM st LEFT JOIN mr ON st.doc_id = mr.doc_id"""

  /** Budget-select twin: one global window prefix sum ORDER BY
    * (score_ppm DESC, doc_id) — the engine's bucketed two-phase prefix
    * sum computes the identical total order.
    */
  def budgetSelectSql: String =
    s"""WITH w0 AS (SELECT doc_id,
                 list_filter(string_split_regex(text, '$Ws'), x -> x <> '')
                   AS w
               FROM documents WHERE text IS NOT NULL),
        st AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tok,
                      CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq
               FROM w0 WHERE len(w) > 0),
        sc AS (SELECT doc_id, n_tok,
                      n_uniq * 1000000 // n_tok AS score_ppm
               FROM st),
        bud AS (SELECT CAST(SUM(n_tok) // 4 AS BIGINT) AS budget FROM sc),
        cum AS (SELECT doc_id, n_tok, score_ppm,
                  CAST(SUM(n_tok) OVER (ORDER BY score_ppm DESC, doc_id ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_tok
                FROM sc)
        SELECT doc_id, n_tok, score_ppm, cum_tok
        FROM cum, bud WHERE cum_tok <= budget"""

  /** PII-report twin: identical closed-form dirty fixture and per-class
    * regex counts on the RAW text (classes never mask each other).
    */
  def piiReportSql: String = {
    val classes = Seq(
      "email" -> "[a-z0-9]+@[a-z0-9.]+",
      "phone" -> """\+[0-9]+-[0-9]{3}-[0-9]{4}""",
      "ipv4" -> """[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}""",
      "card" -> "[0-9]{4} [0-9]{4} [0-9]{4} [0-9]{4}")
    val perCols = classes.map { case (nm, re) =>
      s"len(regexp_extract_all(text, '$re')) AS n_$nm"
    }.mkString(",\n               ")
    val aggCols = classes.map { case (nm, _) =>
      s"""CAST(SUM(n_$nm) AS BIGINT) AS m_$nm,
          CAST(SUM(CASE WHEN n_$nm > 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS d_$nm"""
    }.mkString(",\n          ")
    val arms = classes.map { case (nm, _) =>
      s"""SELECT lang, '$nm' AS pii_type, m_$nm AS n_matches,
             d_$nm AS n_docs_hit, d_$nm * 1000000 // n_docs AS hit_ppm
          FROM r"""
    }.mkString("\n        UNION ALL\n        ")
    s"""WITH p AS (SELECT doc_id, lang,
             text || ' call +1-555-' ||
               lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
               ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
               CAST(doc_id % 100 AS VARCHAR) ||
               ' card 4111 2222 3333 ' ||
               lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
               ' mail u' || CAST(doc_id AS VARCHAR) || '@ex.org' AS text
           FROM documents WHERE text IS NOT NULL),
        per AS (SELECT lang,
               $perCols
             FROM p),
        r AS (SELECT lang, COUNT(*) AS n_docs,
          $aggCols
          FROM per GROUP BY lang)
        $arms"""
  }

  /** Int8 quantization-audit twin: the identical fixed IEEE-754
    * expression tree per element (widen, one multiply, one divide, one
    * add, floor) — no float reductions, so bit-equality holds.
    */
  def embedQuantizeSql: String =
    s"""WITH v0 AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
        a AS (SELECT * FROM (
                SELECT vec_id, v,
                       list_max(list_transform(v, x -> abs(x))) AS amax
                FROM v0) WHERE amax > 0),
        c AS (SELECT vec_id, v, amax,
                list_transform(v,
                  x -> CAST(floor(x * 127.0 / amax + 0.5) AS BIGINT))
                  AS code
              FROM a),
        e AS (SELECT vec_id, v, amax, code,
                list_max(list_transform(range(1, len(v) + 1),
                  i -> abs(v[i] - CAST(code[i] AS DOUBLE) * amax / 127.0)))
                  AS max_err
              FROM c)
        SELECT vec_id, CAST(len(v) AS BIGINT) AS n_dims,
               CAST(list_sum(code) AS BIGINT) AS sum_code,
               CAST(list_sum(list_transform(code, x -> abs(x))) AS BIGINT)
                 AS sum_abs_code,
               CAST(len(list_filter(code, x -> abs(x) = 127)) AS BIGINT)
                 AS n_sat,
               CAST(floor(max_err * 1000000.0 / amax) AS BIGINT) AS err_ppm
        FROM e"""

  /** SemDeDup twin: the embedDupCorpus planted near-dups, the SAME
    * fixed-round integer-lattice Lloyd prefix as the IVF trainer, exact
    * within-cluster cosine pairs, min-id survivor drop — rolled up per
    * cluster.
    */
  def dedupSemanticSql(iters: Int = 2, minCos: Double = 0.9): String =
    s"""WITH ecorpus AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 1000000,
                 list_concat([CAST(0.0 AS FLOAT)], embedding[2:]) AS embedding
          FROM embeddings),
        ${quantCte("ecorpus")},
        cent0 AS (SELECT vec_id AS c_id, v AS cv, n2 AS cn2 FROM n
                  WHERE vec_id < ${SimilarityOps.IvfCentroids}),
        ${kmeansTrainCtes(iters)},
        ${kmeansRankCte(s"cent$iters", "fasg")},
        mm AS (SELECT a.c_id, n.vec_id, n.v, n.n2
               FROM (SELECT vec_id, c_id FROM fasg WHERE rc = 1) a
               JOIN n USING (vec_id)),
        pr AS (SELECT x.c_id, x.vec_id AS vec_a, y.vec_id AS vec_b,
                 CAST(CAST(list_sum(list_transform(range(1, len(x.v) + 1),
                   i -> x.v[i] * y.v[i])) AS BIGINT) AS DOUBLE)
                 / (sqrt(CAST(x.n2 AS DOUBLE)) * sqrt(CAST(y.n2 AS DOUBLE)))
                   AS cos_sim
               FROM mm x JOIN mm y
                 ON x.c_id = y.c_id AND x.vec_id < y.vec_id),
        prf AS (SELECT * FROM pr WHERE cos_sim >= $minCos),
        drp AS (SELECT c_id, COUNT(*) AS n_dropped FROM (
                  SELECT DISTINCT c_id, vec_b FROM prf) GROUP BY c_id),
        np AS (SELECT c_id, COUNT(*) AS n_pairs FROM prf GROUP BY c_id),
        memb AS (SELECT c_id, COUNT(*) AS n_members FROM mm GROUP BY c_id)
        SELECT m.c_id, m.n_members,
               COALESCE(np.n_pairs, 0) AS n_pairs,
               COALESCE(d.n_dropped, 0) AS n_dropped
        FROM memb m
        LEFT JOIN np USING (c_id)
        LEFT JOIN drp d USING (c_id)"""

  /** Link-graph twin: identical closed-form linked-page fixture, anchor
    * extraction by the same regex (the `<link href>` tripwire must not
    * match), host-to-host rollup.
    */
  private val linkPageCtes: String =
    """pg AS (SELECT doc_id,
             'site' || CAST(doc_id % 7 AS VARCHAR) || '.example.com'
               AS src_domain,
             '<html><head><link href="http://cdn.example.com/x.css">' ||
             '</head><body><p>' || text ||
             '</p><a href="http://site' ||
             CAST((doc_id + 1) % 7 AS VARCHAR) ||
             '.example.com/p' || CAST(doc_id % 5 AS VARCHAR) ||
             '">l1</a><a href="http://site' ||
             CAST((doc_id * 2 + 3) % 7 AS VARCHAR) ||
             '.example.com/p' || CAST((doc_id + 1) % 5 AS VARCHAR) ||
             '">l2</a></body></html>' AS html
           FROM documents WHERE text IS NOT NULL),
        l AS (SELECT doc_id, src_domain,
                unnest(regexp_extract_all(html, '<a href="([^"]+)"', 1))
                  AS href
              FROM pg),
        e AS (SELECT doc_id, src_domain,
                regexp_extract(href, '^[^:]+://([^/]+)', 1) AS dst_domain
              FROM l)"""

  def linkGraphSql: String =
    s"""WITH $linkPageCtes
        SELECT src_domain, dst_domain, COUNT(*) AS n_links,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_pages
        FROM e GROUP BY src_domain, dst_domain"""

  /** Crawl-rank twin: the link-graph fixture reduced to weighted domain
    * edges (w = n_links), then the weighted-PageRank integer fixed-point
    * unroll (share = (rank_fp·w) // wdeg, damping 85/100, scale 10^12)
    * over STRING node keys — same arithmetic as the
    * q_pagerank_weighted oracle.
    */
  def crawlRankSql(iters: Int): String = {
    val ctes = (1 to iters).map { i =>
      s"""r$i AS (
           SELECT n.node,
                  CAST(150000000000 + (85 * COALESCE(s.c, 0)) // 100
                    AS BIGINT) AS rank_fp
           FROM nodes n LEFT JOIN (
             SELECT ed.dst, CAST(SUM((r.rank_fp * ed.w) // o.wdeg)
               AS BIGINT) AS c
             FROM edges ed
             JOIN r${i - 1} r ON r.node = ed.src
             JOIN outdeg o ON o.src = ed.src
             GROUP BY ed.dst) s ON s.dst = n.node)"""
    }.mkString(",\n")
    s"""WITH $linkPageCtes,
        edges AS (SELECT src_domain AS src, dst_domain AS dst,
                         COUNT(*) AS w
                  FROM e GROUP BY src_domain, dst_domain),
        nodes AS (SELECT src AS node FROM edges
                  UNION SELECT dst FROM edges),
        outdeg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wdeg
                   FROM edges GROUP BY src),
        r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS rank_fp
               FROM nodes),
        $ctes
        SELECT node, rank_fp, CAST(rank_fp AS DOUBLE) / 1e12 AS rank
        FROM r$iters"""
  }

  /** URL prefix-filter twin: the same VALUES rule table, LIKE-prefix
    * candidate match, longest-rule (deny-wins) election per URL.
    */
  def urlFilterSql: String = {
    val rules = graft.ops.CurationOps.UrlRules
      .map { case (d, p, dec) => s"('$d', '$p', '$dec')" }.mkString(", ")
    s"""WITH $urlNormCtes,
        rules(r_domain, r_path, r_decision) AS (SELECT * FROM (VALUES $rules)),
        wp AS (SELECT doc_id, url_norm, domain,
                 regexp_extract(url_norm, '^[^:]+://[^/?#]*([^?#]*)', 1)
                   AS path
               FROM u),
        mt AS (SELECT wp.doc_id, wp.url_norm, wp.domain,
                      r.r_path, r.r_decision
               FROM wp LEFT JOIN rules r
                 ON wp.domain = r.r_domain
                AND wp.path LIKE r.r_path || '%'),
        el AS (SELECT doc_id, url_norm, domain, r_path, r_decision,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY length(r_path) DESC, r_decision DESC,
                            r_path ASC) AS rk
               FROM mt)
        SELECT doc_id, url_norm, domain,
               COALESCE(r_path, '') AS rule_path,
               COALESCE(r_decision, 'allow') AS decision
        FROM el WHERE rk = 1"""
  }
}
