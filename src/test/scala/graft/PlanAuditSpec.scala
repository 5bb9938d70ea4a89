package graft

import org.apache.spark.sql.functions._

/** Plan-shape audits: assert the queries compile to the plans the 100 TB
  * design intends — pushdown reaching the scan, map-side partial
  * aggregation, sampled range partitioning for total order, and no
  * accidental cartesian products anywhere in the registered surface.
  */
class PlanAuditSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    // Other suites may cache fixture tables; audits must see the real
    // scans (InMemoryTableScan hides PushedFilters/ReadSchema).
    spark.catalog.clearCache()
  }

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  /** Traversable physical plan: `executedPlan` under AQE is an
    * `AdaptiveSparkPlanExec` LEAF (its `collect` visits one node and no
    * children — an audit over it passes vacuously), so unwrap to the
    * input plan the adaptive wrapper will execute.
    */
  private def physicalOf(name: String): org.apache.spark.sql.execution.SparkPlan =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case p => p
    }

  test("no registered query plans a CartesianProduct") {
    // q_stream_* replay rows are excluded: building their DataFrame RUNS
    // a full staged streaming query whose returned plan is just a
    // memory-sink scan — nothing auditable, minutes of cost. Their
    // streaming transforms are equivalence-tested in MultimodalStreamSpec
    // and oracle-checked by the driver.
    SparkEntry.queries.keys.filterNot(_.startsWith("q_stream_")).foreach { name =>
      assert(!planOf(name).contains("CartesianProduct"),
        s"$name plans a cartesian product")
    }
  }

  test("hybrid retrieval serves BOTH rankers from artifacts: the fused " +
      "plan never scans the documents corpus") {
    // q_hybrid_retrieval builds the BM25 + IVF indexes (actions inside
    // the entry), then returns the serve plan: every file scan must be
    // an index artifact or the 5-row query-vector slice — a documents
    // scan would mean a ranker fell back to the corpus.
    val p = planOf("q_hybrid_retrieval")
    assert(!p.contains("documents.parquet"),
      s"corpus scan inside the hybrid serve plan:\n$p")
    assert(p.contains("graft_hyb_bm25") && p.contains("graft_hyb_ivf"),
      s"expected both index artifacts in the serve plan:\n$p")
  }

  test("predicate pushdown reaches the parquet scan (semi-join filter)") {
    val p = planOf("q_join_semi")
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(l_quantity"))
  }

  test("catalog-named reads are transparent to Catalyst: a filter on " +
      "SELECT ... FROM graft.db.t pushes into the spliced snapshot's " +
      "parquet scan, and the named plan has no DSv2 relation left") {
    spark.conf.set("spark.sql.catalog.gaudit",
      classOf[graft.sources.GraftCatalog].getName)
    val wh = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_r14_wh_audit")
    val hp = new org.apache.hadoop.fs.Path(wh.getPath)
    hp.getFileSystem(spark.sessionState.newHadoopConf()).delete(hp, true)
    spark.conf.set("spark.sql.catalog.gaudit.warehouse", wh.getPath)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gaudit.audit")
    graft.ops.SinkOps.commitVersion(
      Tables.events(spark, sfDir), s"${wh.getPath}/audit/ev")
    val df = spark.sql(
      "SELECT event_id, user_id FROM gaudit.audit.ev WHERE event_id > 900")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThan(event_id,900)"),
      s"filter did not reach the scan through the named read:\n$p")
    // Column pruning reached the scan too (props/value/ts not read).
    assert(p.contains("ReadSchema") && !p.contains("props"),
      "column pruning did not reach the scan through the named read")
    // Nothing DSv2 survives resolution: the relation was spliced.
    assert(!df.queryExecution.optimizedPlan.toString
      .contains("RelationV2"),
      "a DSv2 relation leaked past GraftTableResolutionRule")
  }

  test("wordcount aggregates partially before the exchange (combiner)") {
    val p = planOf("q_wordcount")
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"no partial aggregation in:\n$p")
  }

  test("total-order sort uses sampled range partitioning") {
    val p = planOf("q_sort_total")
    assert(p.toLowerCase.contains("rangepartitioning"))
  }

  test("top-k plans TakeOrderedAndProject, not a full sort") {
    assert(planOf("q_topk").contains("TakeOrderedAndProject"))
  }

  test("column pruning: agg query reads only needed columns") {
    val p = planOf("q_agg_max")
    assert(p.contains("ReadSchema"))
    // lineitem has 11 columns; the aggregate needs exactly 3.
    assert(!p.contains("l_shipdate") && !p.contains("l_partkey"))
  }

  test("pagerank broadcasts the rank vector into the edge join") {
    assert(planOf("q_pagerank").contains("BroadcastHashJoin"))
  }

  test("sessionize reuses one user_id exchange for windows and final agg") {
    val p = planOf("q_sessionize")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1, s"expected a single exchange:\n$p")
  }

  test("minhash builds the signature subplan once (exchange reuse)") {
    val p = planOf("q_dedup_minhash")
    val md5Count = "md5".r.findAllIn(p).length
    // one hashing site per self-join branch at most; pruning regressions
    // previously produced four full copies of the signature pipeline.
    assert(md5Count <= 2, s"signature subplan duplicated $md5Count times")
  }

  test("per-group top-k plans WindowGroupLimit (partial top-k pre-shuffle)") {
    assert(planOf("q_window_topk").contains("WindowGroupLimit"))
  }

  test("lag/lead and rank windows share one key exchange") {
    val p = planOf("q_window_lag")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1, s"expected a single o_custkey exchange:\n$p")
  }

  test("stratified sample pushes nothing to the driver (pure filter scan)") {
    val p = planOf("q_sample_stratified")
    assert(!p.toLowerCase.contains("exchange"), s"unexpected shuffle:\n$p")
  }

  test("embedding dim-stats is a single aggregation exchange") {
    val p = planOf("q_embed_dimstats")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1, s"expected one dim-keyed exchange:\n$p")
    assert(p.contains("partial_"), "expected map-side partial aggregation")
  }

  test("crawl pipeline fuses HTML extraction at zero added exchanges") {
    val base = "Exchange".r.findAllIn(planOf("q_pipeline")).length
    val crawl = "Exchange".r.findAllIn(planOf("q_crawl_pipeline")).length
    assert(crawl === base,
      s"extraction must fuse into the scan branches: $base vs $crawl")
  }

  test("html extraction and url normalization are shuffle-free " +
      "expression work") {
    assert(!planOf("q_html_extract").toLowerCase.contains("exchange"))
    assert(!planOf("q_url_normalize").toLowerCase.contains("exchange"))
  }

  test("scrub is shuffle-free per-row expression work") {
    val p = planOf("q_scrub")
    assert(!p.toLowerCase.contains("exchange"), s"unexpected shuffle:\n$p")
  }

  test("curation pipeline never moves document text through an exchange") {
    import org.apache.spark.sql.execution.exchange.Exchange
    val plan = physicalOf("q_pipeline")
    val offenders = plan.collect {
      case e: Exchange if e.output.exists(_.name == "text") => e.nodeName
    }
    assert(offenders.isEmpty,
      s"exchanges carrying the text column: $offenders\n$plan")
  }

  test("decontamination broadcasts the benchmark gram set (corpus never shuffles)") {
    val p = planOf("q_decontam")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus-side shuffle join:\n$p")
  }

  test("paragraph dedup: keeper election exchange carries hashes, not text") {
    import org.apache.spark.sql.execution.exchange.Exchange
    val plan = physicalOf("q_dedup_paragraph")
    // Text-bearing exchanges must be doc-keyed (join probe / reassembly);
    // the md5-keyed keeper election must move only (h, doc_id, idx).
    val offenders = plan.collect {
      case e: Exchange if e.output.exists(_.name == "h") &&
        e.output.exists(a => a.name == "para" || a.name == "text") => e.nodeName
    }
    assert(offenders.isEmpty,
      s"keeper-election exchange carrying paragraph text: $offenders\n$plan")
  }

  test("bloom dedup embeds the sketch as a literal prefilter") {
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val plan = physicalOf("q_dedup_bloom")
    assert(plan.toString.contains("might_contain"),
      s"expected bloom prefilter:\n$plan")
    // The whole plan holds exactly ONE join — the anti join on the
    // bloom-positive sliver. The bloom-negative union branch is provably
    // join-free, or this count would be higher.
    val joins = plan.collect { case j: BaseJoinExec => j }
    assert(joins.map(_.joinType.toString) === Seq("LeftAnti"),
      s"expected exactly one LeftAnti join:\n$plan")
  }

  test("pack layout: no single-partition exchange ever carries doc rows") {
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    import org.apache.spark.sql.execution.exchange.{Exchange, ShuffleExchangeExec}
    val plan = physicalOf("q_pack")
    // Text never shuffles...
    val textOff = plan.collect {
      case e: Exchange if e.output.exists(_.name == "text") => e.nodeName
    }
    assert(textOff.isEmpty, s"exchanges carrying text: $textOff\n$plan")
    // ...and the only AllTuples work is the tiny bucket-offset cumsum:
    // per-doc rows reach windows through hash/range partitioning only.
    val singleDoc = plan.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition &&
        e.output.exists(_.name == "doc_id") => e.nodeName
    }
    assert(singleDoc.isEmpty,
      s"single-partition exchange carrying doc rows: $singleDoc\n$plan")
  }

  test("mix resample plans broadcast thresholds, no shuffle join on docs") {
    val p = planOf("q_mix_resample")
    assert(!p.contains("SortMergeJoin"), s"doc-side shuffle join:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
  }

  test("CDC merge elects the latest change with an agg, not a window sort") {
    val p = planOf("q_merge_upsert")
    assert(p.contains("max_by"), s"no max_by election:\n$p")
    assert(!p.contains("Window"), s"window sort crept into the election:\n$p")
  }

  test("triangle counting broadcasts the degree attach (edges never shuffle for it)") {
    val p = planOf("q_triangle")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast degree attach:\n$p")
  }

  test("clustering coefficient reuses the triangle kernel's cached tables " +
      "(one distinct + one degree agg total)") {
    // The composition must NOT rebuild the undirected edge set or the
    // degree table the kernel already persisted: every Deduplicate and
    // the degree aggregation live INSIDE the kernel's cached relations,
    // so the outer optimized plan shows InMemoryRelation leaves and no
    // Deduplicate of its own.
    spark.catalog.clearCache()
    try {
      val qe = SparkEntry.queries("q_clustering_coef")(spark, sfDir)
        .queryExecution
      val opt = qe.optimizedPlan.toString
      assert(opt.contains("InMemoryRelation"),
        s"kernel tables not reused via cache:\n$opt")
      assert(!opt.contains("Deduplicate"),
        s"composition rebuilds a distinct the kernel already computed:\n$opt")
    } finally spark.catalog.clearCache()
  }

  test("chunk overlap is a map-only plan (zero exchanges)") {
    val p = planOf("q_chunk_overlap")
    assert(!p.contains("Exchange"), s"chunking should never shuffle:\n$p")
  }

  test("funnel never shuffles on anything but user_id") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = physicalOf("q_funnel")
    // at sf0.001 the single-partition source satisfies every
    // distribution with ZERO exchanges (the ideal); any shuffle that
    // does appear at scale must key on user_id
    val offKey = plan.collect {
      case e: ShuffleExchangeExec
        if !e.outputPartitioning.toString.contains("user_id") => e.nodeName
    }
    assert(offKey.isEmpty, s"non-user_id shuffles: $offKey")
  }

  test("gap fill plans no cartesian and no single-partition grid") {
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = physicalOf("q_gap_fill")
    val single = plan.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition =>
        e.nodeName
    }
    assert(single.isEmpty, s"single-partition exchange in gap fill: $single")
  }

  test("table digest partially aggregates before its one exchange") {
    val p = planOf("q_table_digest")
    assert(p.contains("partial_count") || p.contains("partial count") ||
      p.contains("partial_bit_xor") || p.contains("partial bit_xor"),
      s"no map-side combine in digest:\n$p")
  }

  test("AQE splits a skewed join partition with salting OFF (SURVEY §4.2 claim)") {
    // The load-bearing replacement for the reference's hand-tuned
    // reducer counts: on a deliberately skewed key (~90% of rows on one
    // key), AQE's OptimizeSkewedJoin must split the hot partition at
    // runtime — no manual salt. Thresholds are lowered to make fixture-
    // scale partitions eligible; broadcast is disabled so the join
    // actually shuffles (the skew path only applies to SMJ/SHJ).
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // sf0.01 + a pre-repartition: AQE splits a skewed partition at
      // MAPPER granularity, so the join's shuffle needs several mappers
      // (one small parquet file = one map task = unsplittable) and
      // enough hot bytes per mapper to cross the advisory size.
      val sf01 = "/root/testdata/sf0.01"
      val l = Tables.lineitem(spark, sf01).repartition(8)
        .select(when(col("l_orderkey") % 10 < 9, lit(0L))
            .otherwise(col("l_orderkey")).as("k"),
          col("l_quantity"), col("l_partkey"))
      val r = Tables.orders(spark, sf01).repartition(8)
        .select(when(col("o_orderkey") % 10 < 9, lit(0L))
            .otherwise(col("o_orderkey")).as("k"),
          col("o_orderpriority"))
      // Global (not same-key) aggregate downstream: OptimizeSkewedJoin
      // reverts itself if the split would introduce an extra shuffle,
      // which a groupBy on the join key after the join would.
      val j = l.join(r, "k")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("s"))
      j.collect() // run to finalize the adaptive plan
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("isSkewJoin=true") ||
        plan.contains("skewed"),
        s"AQE did not split the skewed partition:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE coalesces undersized shuffle partitions (no fixed reducer count)") {
    // The other half of the reducer-count story (skew-split is above):
    // the reference pins reducer counts per job; Spark plans at
    // spark.sql.shuffle.partitions and then MERGES undersized outputs
    // at runtime from actual map sizes. A 3-group aggregate must
    // execute its final stage on coalesced AQEShuffleRead partitions,
    // not the static 32.
    val j = Tables.lineitem(spark, sfDir).groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("s"))
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
      s"AQE did not coalesce the shuffle read:\n$plan")
  }

  test("runtime bloom filter injects into the probe side of a selective join") {
    // The reference hand-tunes semi-join reductions; Spark's runtime
    // bloom filter is the subsuming mechanism: a selective dim filter
    // spawns a bloom aggregate whose might_contain probe prunes the
    // fact scan BEFORE the shuffle. Thresholds lowered so fixture-scale
    // tables qualify (production defaults: 10 MB creation / 10 GB
    // application); broadcast disabled because the rewrite targets
    // shuffle joins.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      spark.catalog.clearCache()
      val o = Tables.orders(spark, sfDir)
        .filter(col("o_totalprice") > 400000.0) // selective creation side
      val l = Tables.lineitem(spark, sfDir)
      val j = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom_filter"),
        s"no runtime bloom filter in:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("dynamic partition pruning injects a runtime dim filter into the fact scan") {
    // Static pruning (below) handles literal predicates; DPP is the
    // runtime twin — the dim-side join filter prunes fact PARTITIONS
    // before the scan, the mechanism that makes star-join date/region
    // filters free on a partitioned 100 TB fact table. The dim filter
    // is on a NON-join column, so only DPP (not static pruning) can
    // narrow the fact side.
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_returnflag")
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    val fact = spark.read.parquet(out)
    // The dim must be FILE-backed: a local Seq folds its filter into
    // the LocalRelation during optimization, leaving no selective
    // Filter node for the PartitionPruning rule to extract (observed).
    val dimDir = java.nio.file.Files.createTempDirectory("graft_dppdim").toString
    Seq(("A", 1L), ("N", 2L), ("R", 3L)).toDF("rf", "attr")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val j = fact.join(dim.filter(col("attr") === lit(1L)),
        col("l_returnflag") === col("rf"))
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("s"))
    j.collect()
    val plan = j.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("dynamicpruningexpression"),
      s"no dynamic partition pruning in:\n$plan")
  }

  test("hive-layout re-scan prunes partitions (PartitionFilters, not a full scan)") {
    // q_sink_partitioned writes l_returnflag=... hive layout; SURVEY
    // claims "prune for free" — assert the filtered re-scan plans a
    // PartitionFilters entry and reads fewer files than the full scan.
    val src = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_returnflag")
    val out = java.nio.file.Files.createTempDirectory("graft_prune").toString
    src.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    val scan = spark.read.parquet(out).filter(col("l_returnflag") === "A")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.replaceAll("\\s", "").contains("PartitionFilters:[isnotnull(l_returnflag"),
      s"no partition pruning in:\n$plan")
    // Pruning must be real, not cosmetic: the pruned scan touches only
    // the one matching partition's files.
    import org.apache.spark.sql.execution.FileSourceScanExec
    def scanOf(df: org.apache.spark.sql.DataFrame) = {
      val p = df.queryExecution.executedPlan
      val root = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.inputPlan
        case o => o
      }
      root.collectFirst { case f: FileSourceScanExec => f }.get
    }
    val pruned = scanOf(scan).selectedPartitions.partitionCount
    val full = scanOf(spark.read.parquet(out)).selectedPartitions.partitionCount
    assert(pruned === 1 && full === 3,
      s"expected 1 of 3 partitions scanned, got $pruned of $full")
  }

  test("urlFilter broadcasts the policy-rule table") {
    val p = planOf("q_url_filter")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"rule table must broadcast:\n$p")
  }

  test("hardNegatives broadcasts the query set (corpus never shuffles " +
      "for scoring)") {
    val p = planOf("q_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      s"query side must broadcast:\n$p")
  }

  test("budgetSelect: the only single-partition exchange feeds the " +
      "tiny bucket-offset window, corpus windows are bucket-partitioned") {
    val p = planOf("q_budget_select")
    // Exactly two SinglePartition exchanges are expected and both are
    // tiny by construction: the ≤101-row bucket-offset window and the
    // 1-row global budget aggregate. The corpus-sized data must only
    // ever cross bkt-hashed exchanges.
    val singles = "Exchange SinglePartition".r.findAllIn(p).length
    assert(singles <= 2, s"unexpected single-partition exchange:\n$p")
    assert(p.contains("hashpartitioning(bkt"),
      s"per-bucket window must partition by bkt:\n$p")
  }

  test("substringDupStats aggregates gram frequency with a map-side " +
      "partial (grams travel as int64, combined before the exchange)") {
    val p = planOf("q_dedup_substring")
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"no partial aggregation in gram df:\n$p")
  }

  test("gopher and c4 quality filters are shuffle-free expression work") {
    assert(!planOf("q_gopher_rules").toLowerCase.contains("exchange"))
    assert(!planOf("q_c4_filter").toLowerCase.contains("exchange"))
  }

  test("served BM25 prunes the postings scan to the query's term set " +
      "(IN pushdown at the parquet reader)") {
    val docs = Tables.documents(spark, sfDir)
    val path = java.nio.file.Files
      .createTempDirectory("bm25audit").toString
    graft.ops.CurationOps.writeBm25Index(docs, path)
    val p = graft.ops.CurationOps.bm25TopKIndexed(spark, path,
      Seq((1L, "hash join"))).queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [In(w, [hash,join]")
        || p.contains("PushedFilters: [In(w, [join,hash]"),
      s"postings scan not term-pruned:\n$p")
  }

  test("random projection is map-only up to the audit pair join " +
      "(sign matrix as literals — no matrix join, one keyed exchange)") {
    val p = physicalOf("q_embed_rp")
    val exchanges = p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // at most the two audit-join sides shuffle (keyed on the pair id);
    // the projection itself adds no exchange
    assert(exchanges.length <= 2, s"unexpected exchanges:\n$p")
    assert(!p.toString.toLowerCase.contains("cartesianproduct"))
    assert(!p.toString.contains("BroadcastNestedLoopJoin"))
  }

  test("link prediction wedge join is keyed (no cartesian, no " +
      "nested-loop fallback)") {
    val p = planOf("q_link_predict")
    assert(!p.toLowerCase.contains("cartesianproduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("metadata chunk walks are exchange-free map work") {
    // The scan-cheap tier's whole value is that it costs one pass and
    // no shuffle; an Exchange here would mean the header parse moved
    // data it never needed to.
    for (q <- Seq("q_image_meta", "q_audio_meta")) {
      val phys = physicalOf(q).toString
      assert(!phys.contains("Exchange"),
        s"$q must be map-only, found an exchange:\n${phys.take(2000)}")
    }
  }

  test("HLL registers aggregate map-side before the one keyed exchange") {
    val p = planOf("q_hll_incr")
    assert(p.contains("partial_max"),
      s"register max must combine map-side:\n${p.take(2000)}")
  }

  test("rankEval broadcasts the query-term set into the truth join") {
    val p = planOf("q_rank_eval")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("approx profiler plans no Expand (exact-NDV twin does)") {
    // Exact multi-countDistinct forces one Expand multiplying scan rows
    // ×(N+1) — the ANALYZE killer at 100 TB. The HLL++ twin must plan a
    // plain partial/final sketch agg with no Expand.
    assert(!planOf("q_profile_approx").contains("Expand"),
      "q_profile_approx must not plan an Expand")
    assert(planOf("q_profile").contains("Expand"),
      "exact q_profile is expected to plan the multi-distinct Expand " +
        "(if Catalyst stops doing so, update profile()'s scaladoc)")
  }

  test("IVM refresh joins every delta term by broadcast — base " +
      "relations never shuffle into a sort-merge join") {
    val p = planOf("q_ivm_join")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "a base-relation shuffle join crept into the IVM refresh")
  }

  test("hot/cold join plans BOTH a broadcast (hot) and a sort-merge " +
      "(cold) path") {
    val p = planOf("q_join_hotcold")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("SortMergeJoin"), p.take(2000))
  }

  test("scaler apply broadcasts the Dims-row artifact — the batch " +
      "never shuffles raw vectors") {
    val p = planOf("q_scaler_apply")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("phrase search broadcasts the phrase-term table and drops " +
      "non-query tokens before any exchange") {
    val p = planOf("q_phrase_search")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("LM scoring joins the persisted model, not the training corpus " +
      "(one parquet scan of the artifact)") {
    val p = planOf("q_lm_persist")
    assert(p.contains("graft_lm"),
      "scoring plan must read the persisted bigram artifact")
  }

  test("shard balance ranks under a bucket-partitioned window — the " +
      "corpus branch exchanges by tb, never through one partition") {
    val p = planOf("q_shard_balance")
    assert(p.contains("hashpartitioning(tb"), p.take(3000))
    assert(p.contains("row_number"), p.take(3000))
  }

  test("span mask is one doc-keyed aggregation with map-side combine") {
    val p = planOf("q_span_mask")
    assert(p.contains("partial_sum") || p.contains("partial sum"),
      p.take(3000))
    assert(!p.contains("Window"), "span mask needs no window")
  }

  test("canonical election is an aggregate argmax — no window rank in " +
      "the plan") {
    val p = planOf("q_dedup_canonical")
    assert(!p.contains("Window"), "election must be max(struct), not " +
      "a window rank")
  }

  test("curate funnel reduces map-side to one row (indicator sums, " +
      "not one action per stage)") {
    val p = planOf("q_curate_funnel")
    assert(p.contains("partial_sum") || p.contains("partial sum"),
      p.take(3000))
  }
}
