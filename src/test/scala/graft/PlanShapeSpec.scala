package graft

import graft.queries.QueryRegistry
import org.apache.spark.sql.DataFrame

/** Plan-shape regression harness: the physical-plan properties each
  * headline query RELIES on for 100 TB viability, asserted so a future
  * refactor that silently degrades a plan (lost pushdown, surprise
  * cartesian, extra shuffle) fails loudly here rather than at scale.
  */
class PlanShapeSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    QueryRegistry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  private def exchanges(p: String): Int = "Exchange".r.findAllIn(p).length

  /** Exchange count robust to cached shared frames: an InMemoryRelation
    * prints its full lineage inside EVERY consumer subtree, so a text
    * count double-counts the exchanges under a frame that is cached
    * precisely so it executes once. Distinct plan_ids count each
    * physical exchange node once however often it is printed. */
  private def distinctExchanges(p: String): Int =
    "Exchange[^\\n]*?plan_id=(\\d+)".r.findAllMatchIn(p).map(_.group(1)).toSet.size

  test("no query plans a CartesianProduct") {
    // every registered query — a cartesian anywhere is a scale bug.
    // Failures ACCUMULATE: one query that breaks analysis (as the r7
    // NTZ fixture regression did) must not mask plan signals for the
    // other ~170 — the sweep reports every offender at once.
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, fn) <- QueryRegistry.queries) {
      try {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        if (p.contains("CartesianProduct")) failures += s"$name plans a CartesianProduct"
      } catch {
        case e: Throwable =>
          failures += s"$name failed to plan: ${Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.take(1).mkString}"
      }
    }
    assert(failures.isEmpty, s"${failures.size} queries failed the cartesian sweep:\n  " +
      failures.mkString("\n  "))
  }

  test("q1_agg: filter pushed to scan, partial aggregation, single shuffle") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(p.contains("partial_sum"))
    assert(exchanges(p) == 1)
  }

  test("s9_partition_pruning: the event_type predicate prunes at listing time (PartitionFilters)") {
    val p = plan("s9_partition_pruning")
    assert(p.contains("PartitionFilters: [") && p.contains("event_type"),
      s"partition predicate not pushed to listing:\n${p.take(2000)}")
    // the predicate must NOT degrade into a data filter over all partitions
    assert(p.contains("in(event_type") || p.contains("event_type#"),
      s"unexpected plan:\n${p.take(2000)}")
  }

  test("q3_join_topk: TakeOrderedAndProject, never a global sort") {
    val p = plan("q3_join_topk")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("GlobalSort"))
  }

  test("q19: per-table Or-disjunctions pushed into both scans") {
    val p = plan("q19_or_of_ands")
    val pushedOr = p.split("\n").filter(l => l.contains("PushedFilters") && l.contains("Or("))
    assert(pushedOr.length == 2, s"expected Or pushed to 2 scans, got ${pushedOr.length}")
  }

  test("subquery shapes lower to semi/anti joins") {
    assert(plan("q4_exists_semi").contains("LeftSemi"))
    assert(plan("q22_scalar_antijoin").contains("LeftAnti"))
    assert(plan("j_semi_anti").contains("LeftSemi"))
    assert(plan("j_semi_anti").contains("LeftAnti"))
  }

  test("x24_json_access: scan reads only the two needed columns") {
    val p = plan("x24_json_access")
    val read = p.split("\n").find(_.contains("ReadSchema")).get
    assert(read.contains("event_type") && read.contains("props"))
    assert(!read.contains("user_id") && !read.contains("value"))
  }

  test("j5_lsh_bucketed: bucket equi-join, no nested-loop join") {
    val p = plan("j5_lsh_bucketed")
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("s1_dsv2_connector: pushed range reaches the V2 scan") {
    val p = plan("s1_dsv2_connector")
    assert(p.contains("TelemetryScan[1000,4000)"))
  }

  test("s1_dsv2_agg_pushdown: the aggregate is answered BY the source (complete pushdown)") {
    val p = plan("s1_dsv2_agg_pushdown")
    assert(p.contains("TelemetryAggScan[1000,50000)"),
      s"aggregate not pushed into the V2 source:\n${p.take(1500)}")
    // complete pushdown: no partial_count/partial_min over generated rows
    assert(!p.contains("partial_count"), "source should answer the agg, not feed a partial agg")
  }

  test("a10_neardup_minhash: bounded shuffle count (banded join, no blowup)") {
    val p = plan("a10_neardup_minhash")
    assert(exchanges(p) <= 12, s"shuffle count grew: ${exchanges(p)}")
  }

  test("a10_jaccard_ngram / a10_embed_neardup: candidates via hash equi-join, no nested loop") {
    for (name <- Seq("a10_jaccard_ngram", "a10_embed_neardup")) {
      val p = plan(name)
      assert(!p.contains("NestedLoopJoin"), s"$name plans a nested-loop join")
    }
  }

  test("j6_asof: the as-of join plans NO join operator — union + one window pass") {
    val p = plan("j6_asof")
    assert(!p.contains("Join"), "as-of join degraded to a real join (range-join blowup risk)")
    assert(p.contains("Window"), "expected the carry-forward window")
    // build-side dedup aggregate + the window's key shuffle, nothing else
    assert(exchanges(p) <= 2, s"as-of join gained shuffles: ${exchanges(p)}")
  }

  test("q6_forecast_revenue: every predicate reaches the scan") {
    val p = plan("q6_forecast_revenue")
    // (toString truncates the PushedFilters list; the date bound is
    // visible, the quantity cap was verified via explain("formatted"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), "date window not pushed to the scan")
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_shipdate"), "scan reads more than the 4 needed columns")
  }

  test("j7_interval_overlap: binning makes the range join a hash join (no nested loop)") {
    val p = plan("j7_interval_overlap")
    assert(!p.contains("NestedLoopJoin") && !p.contains("CartesianProduct"),
      "overlap join degraded to a quadratic plan")
  }

  test("q13_order_distribution: the zero bucket survives (outer join not degraded to inner)") {
    val p = plan("q13_order_distribution")
    assert(p.contains("LeftOuter"), "left outer join was degraded — zero bucket lost")
  }

  test("u4_merge_upsert: the CDC apply stays one full-outer join on the key") {
    val p = plan("u4_merge_upsert")
    assert(p.contains("FullOuter"), "merge degraded — the insert or carry-over leg was lost")
    assert(!p.contains("CartesianProduct"))
  }

  test("j9_spatial_neighbors: candidates come from a cell equi-join, never a quadratic plan") {
    val p = plan("j9_spatial_neighbors")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "grid join degraded to all-pairs")
  }

  test("j5_pq_adc: LUT side broadcasts, code scan never nested-loops against raw vectors") {
    val p = plan("j5_pq_adc")
    assert(!p.contains("CartesianProduct"), "PQ-ADC degraded to a cartesian")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      "expected the per-query LUT to broadcast")
  }

  test("a10_semdedup: only the centroid broadcast nested-loops; cell pairs are equi-joins") {
    val p = plan("a10_semdedup")
    assert(!p.contains("CartesianProduct"), "SemDeDup degraded to a cartesian")
    // the vectors × 16-centroid assignment is a legitimate broadcast
    // nested loop (tiny codebook side) but it lives INSIDE the cached
    // assignment; walking the executed tree (which does not descend into
    // cached relations) must find zero nested-loop joins — i.e. the
    // |cell|² pairwise stage and the census joins are all equi-joins
    val exec = QueryRegistry.queries("a10_semdedup")(spark, dir)
      .queryExecution.executedPlan
    val nl = exec.collect {
      case j if j.nodeName.contains("BroadcastNestedLoopJoin") => j
    }
    assert(nl.isEmpty, s"pairwise/census stage degraded to nested loop:\n${nl.headOption}")
    assert(p.contains("InMemoryTableScan"), "cell assignment should be cached")
  }

  test("a10_sample_weighted: no unpartitioned window over a corpus-proportional table") {
    val df = QueryRegistry.queries("a10_sample_weighted")(spark, dir)
    // walk the optimized logical plan: every Window with an empty
    // partitionSpec must sit above the super-shard aggregate (grouping on
    // `super`), never above the shard table or the documents scan
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val wins = df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(wins.nonEmpty, "expected the super-shard running total window")
    for (w <- wins) {
      val aggsBelow = w.collect { case a: Aggregate => a }
      assert(aggsBelow.exists(_.groupingExpressions.exists(_.toString.contains("super"))),
        s"global window not confined to the super-shard rollup:\n$w")
    }
  }

  test("j5_ivf_probe: codebook pass is cached (index build); probe joins are hash joins") {
    val p = plan("j5_ivf_probe")
    // the 16-row codebook broadcast may print once per cached-plan mention,
    // but the rerank/probe joins must never be nested-loop
    assert(p.contains("InMemoryTableScan"), "IVF assignment should be cached as the index")
    val nl = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(nl <= 2, s"expected only the codebook broadcast (index build), found $nl nested-loop joins")
  }

  test("e2e_result_cache: cache probe and carry-over are key joins, never quadratic") {
    val df = QueryRegistry.queries("e2e_result_cache")(spark, dir)
    df.collect() // finalize AQE — exchange reuse is inserted at runtime
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "cache probe degraded to all-pairs")
    // request dedup is computed once and reused by the probe legs —
    // either via AQE exchange reuse or (since the ResultCache
    // intermediates became explicit .cache()s, which also survive
    // ACROSS the serve step's jobs) via an in-memory table scan
    assert(p.contains("ReusedExchange") || p.contains("InMemoryTableScan"),
      "per-batch request dedup should be reused, not recomputed")
  }

  test("s9_compaction_plan: the planning window is partitioned by the table " +
    "partition key, never global") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = QueryRegistry.queries("s9_compaction_plan")(spark, dir)
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty, "expected the prefix-sum planning window")
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "compaction prefix sum must partition by event_type — a global window " +
        "would serialize the file-stats pass")
  }

  test("s9_bucketed_join: the fact-to-fact join itself plans with ZERO exchange") {
    // broadcast off so the tiny sf cannot hide the shuffle question —
    // at 100 TB neither side of lineitem ⋈ orders broadcasts
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("s9_bucketed_join")
      assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n${p.take(2000)}")
      val shuffles = exchanges(p)
      assert(shuffles == 1,
        s"expected only the final 3-group census shuffle, found $shuffles:\n${p.take(3000)}")
      assert(p.contains("Bucketed: true"),
        s"scan did not use the bucketed layout:\n${p.take(3000)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }

  test("j5_pq_refine: the exact re-rank fetches candidates via broadcast hash joins") {
    val p = plan("j5_pq_refine")
    // the |Q|*16 shortlist and the 10 query vectors broadcast against the
    // corpus — the raw-vector fetch must never degrade to a nested loop
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "candidate fetch degraded to a nested loop")
    assert(p.contains("BroadcastHashJoin"),
      s"expected the shortlist to broadcast:\n${p.take(2000)}")
  }

  test("j5_hamming_topk: packed scan ends in TakeOrdered; the only nested loop is the 1-row probe") {
    val p = plan("j5_hamming_topk")
    assert(p.contains("TakeOrderedAndProject"),
      "Hamming top-k must plan as TakeOrdered, not a global sort")
    // the probe is a broadcast single-row aggregate — exactly one
    // nested-loop join is the accepted 1-row-crossJoin shape
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 1,
      s"expected only the 1-row probe broadcast:\n${p.take(2000)}")
    // r12: the sign pack became a row-local array fold inside the scan
    // projection — the stronger property replaces the old map-side-
    // combine pin: the ranking scan has NO aggregate and NO exchange at
    // all (the old posexplode + re-aggregate shape had one of each)
    assert(!p.contains("SortAggregate") && !p.contains("HashAggregate"),
      "the sign pack must stay a per-row fold, not an explode + re-aggregate")
    assert(!p.contains("Exchange hashpartitioning"),
      "the packed ranking scan must be exchange-free")
  }

  test("w10_attribution: the lookback window joins hash-partitioned, never nested-loop") {
    val p = plan("w10_attribution")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the 1h range join degraded to all-pairs — the time-bin equi key is load-bearing")
    // bin joins + the SHARED p_id window exchange (rn and n partition
    // alike) + distinct-rewritten census + anti-join dedup + final order.
    // r13: `cand` is cached (it feeds the windows AND the anti-join), so
    // the TEXT count double-prints the bin-join exchanges per consumer —
    // count distinct exchange nodes instead; same bound.
    val shuffles = distinctExchanges(p)
    assert(shuffles <= 9,
      s"attribution should need only bin-join + window + census exchanges, found $shuffles")
  }

  test("m6_cdc_native: boundary detection runs the native expression, not per-window md5") {
    val df = QueryRegistry.queries("m6_cdc_native")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("cdc_boundaries"),
      "plan lost the native rolling-hash expression")
    // md5 appears ONLY in chunk fingerprinting (one call per chunk), never
    // in boundary detection (one call per position in the relational form)
    import org.apache.spark.sql.catalyst.plans.logical.Generate
    val gens = df.queryExecution.optimizedPlan.collect { case g: Generate => g }
    assert(gens.nonEmpty && gens.forall(!_.generator.toString.contains("sequence")),
      "native form must explode the boundary ARRAY, not a per-position sequence")
  }

  test("a13_trending_terms: unbounded token domain still ends in TakeOrdered, not a global sort") {
    val p = plan("a13_trending_terms")
    assert(p.contains("TakeOrderedAndProject"),
      "trending terms must plan as TakeOrdered — a full order over the token domain is a scale bug")
    assert(p.contains("partial_"), "token census lost its map-side combine")
  }

  test("w3_hopping: the 4-window fan-out is an Expand with map-side partial aggregation") {
    val p = plan("w3_hopping")
    assert(p.contains("Expand"),
      "hopping windows must plan the multi-window membership as Expand, not a join")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "window cells must partial-aggregate before the shuffle — otherwise 4x corpus shuffles")
  }

  test("u7_matview_refresh: partials merge via hash aggregates; the only nested loop is the 1-row cutoff") {
    val p = plan("u7_matview_refresh")
    val nl = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(nl <= 1, s"expected only the broadcast cutoff scalar, found $nl nested-loop joins")
    assert(!p.contains("SortMergeJoin"),
      "the view/delta merge must be the tagged-union re-aggregate, never a row join")
    assert(p.contains("partial_sum"), "refresh partials lost their map-side combine")
  }

  test("u8_time_travel: the version diff is a keyed equi-join over two snapshot scans") {
    val p = plan("u8_time_travel")
    assert("Scan parquet".r.findAllIn(p).length >= 2,
      "time travel must READ both version snapshots back from disk")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the v0/v1 diff must stay a user_id equi-join")
  }

  test("s9_schema_evolution: the merged scan stays columnar with the evolved column in ReadSchema") {
    val p = plan("s9_schema_evolution")
    assert(p.contains("cents"), "evolved column missing from the merged read schema")
    assert(exchanges(p) <= 2, s"generation census should need one shuffle (+AQE read), got:\n${p.take(1500)}")
  }

  test("a13_auc_score: the rank accumulation windows only the bounded value domain") {
    val df = QueryRegistry.queries("a13_auc_score")(spark, dir)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val wins = df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(wins.nonEmpty, "expected the cumulative-negatives window")
    for (w <- wins) {
      val aggsBelow = w.collect { case a: Aggregate => a }
      assert(aggsBelow.exists(_.groupingExpressions.exists(_.toString.contains("n_chars"))),
        s"the AUC window must sit above the per-value census, not corpus rows:\n$w")
    }
  }

  test("a10_length_buckets: every batching window is shard-partitioned, never corpus-global") {
    val df = QueryRegistry.queries("a10_length_buckets")(spark, dir)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty, "expected the per-shard row_number windows")
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "an unpartitioned batching window would serialize the corpus through one task")
  }

  test("a12_association_rules: top-20 is a bounded TakeOrdered, never a global sort") {
    val p = plan("a12_association_rules")
    assert(p.contains("TakeOrderedAndProject"),
      "the rule top-20 must plan as TakeOrdered (bounded heap), not sort-all")
    assert(!p.contains("CartesianProduct"),
      "pair expansion must stay row-local over the capped baskets")
  }

  test("a11_equidepth_bins: no ntile window — boundary agg + broadcast comparison sum") {
    val df = QueryRegistry.queries("a11_equidepth_bins")(spark, dir)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.isEmpty,
      "equi-depth binning must be the two-pass boundary broadcast, never a global ntile window")
    val p = df.queryExecution.executedPlan.toString
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 1,
      "only the 1-row boundary broadcast may nested-loop")
  }

  test("a13_calibration_bins: the ECE windows run over the bounded bin domain only") {
    val df = QueryRegistry.queries("a13_calibration_bins")(spark, dir)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val wins = df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(wins.nonEmpty, "expected the ECE total windows")
    for (w <- wins) {
      val aggsBelow = w.collect { case a: Aggregate => a }
      assert(aggsBelow.exists(_.groupingExpressions.exists(_.toString.contains("bin"))),
        s"the ECE window must sit above the 10-row bin census, not corpus rows:\n$w")
    }
  }

  test("f12_contract_checks: FK checks are anti-joins; uniqueness is count-distinct, not a self-join") {
    val p = plan("f12_contract_checks")
    assert(p.contains("LeftAnti"), "referential-integrity checks must plan as anti-joins")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin(joinType=Inner"),
      "the gate must never self-join a fact table")
  }

  test("j5_matryoshka_probe: one corpus pass — both rank windows share the q_id partitioning") {
    val df = QueryRegistry.queries("j5_matryoshka_probe")(spark, dir)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.size == 2, s"expected the full-dim and prefix-dim rank windows, got ${wins.size}")
    assert(wins.forall(_.partitionSpec.nonEmpty), "rank windows must partition by q_id")
    val p = df.queryExecution.executedPlan.toString
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length == 1,
      "exactly one broadcast probe-vs-corpus join; a second would mean a second corpus scan")
  }

  test("j7_interval_union: every island window is user-partitioned — no global sort, no self-join") {
    val df = QueryRegistry.queries("j7_interval_union")(spark, dir)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty, "expected the running-max and island-sum windows")
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "an unpartitioned island window would serialize the corpus through one task")
    assert(!df.queryExecution.executedPlan.toString.contains("Join"),
      "gaps-and-islands must not plan any join")
  }

  test("a11_join_size_sketch: the x5 sketch explode sits ABOVE the key census, never on corpus rows") {
    val df = QueryRegistry.queries("a11_join_size_sketch")(spark, dir)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate}
    val gens = df.queryExecution.optimizedPlan.collect { case g: Generate => g }
    assert(gens.nonEmpty, "expected the sequence(0,4) explode")
    for (g <- gens)
      assert(g.collect { case a: Aggregate => a }.nonEmpty,
        "the explode must expand the per-key census (bounded), not raw lineitem rows")
    val p = df.queryExecution.executedPlan.toString
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 1,
      "only the 1-row truth frame may nested-loop")
  }

  test("x28_vocab_growth: the cumulative window runs over the bounded chunk census") {
    val df = QueryRegistry.queries("x28_vocab_growth")(spark, dir)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val wins = df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(wins.nonEmpty, "expected the cumulative-types window")
    for (w <- wins)
      assert(w.collect { case a: Aggregate => a }.nonEmpty,
        "the Heaps curve window must sit above the 20-row chunk census, not token rows")
  }

  test("x28_url_normalize: pure map-stage regexp chain — no join, no window before the census") {
    val df = QueryRegistry.queries("x28_url_normalize")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), "URL canonicalization must not plan a join")
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    assert(df.queryExecution.optimizedPlan.collect { case w: LWindow => w }.isEmpty,
      "URL canonicalization must not plan a window")
  }

  test("a10_entity_resolution: candidate pairs come from the blocking equi-join, never all-pairs") {
    val df = QueryRegistry.queries("a10_entity_resolution")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      "ER must block before pairing — an all-pairs compare is the scale bug ER exists to avoid")
    assert(p.contains("blk"), "the pair join must key on the blocking column")
    spark.catalog.clearCache() // recs/CC caches are query-local
  }

  test("j6_leakage_audit: one user-keyed equi-join, label/feature legs from one scan family") {
    val p = plan("j6_leakage_audit")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the naive-join audit must itself stay a user_id equi-join")
  }

  test("a10_feature_hashing: stateless hash featurization — no join in the census") {
    val p = plan("a10_feature_hashing")
    assert(!p.contains("Join"), "the hashing trick must not materialize a feature table join")
    spark.catalog.clearCache()
  }

  test("u9_conflict_detect: conflict classification is two keyed left joins, nothing quadratic") {
    val p = plan("u9_conflict_detect")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "OCC conflict detection must stay doc_id equi-joins")
  }

  test("x28_tfidf_sim: posting-list equi-join with a TakeOrdered top-20, never all-pairs or sort-all") {
    val p = plan("x28_tfidf_sim")
    assert(p.contains("TakeOrderedAndProject"), "top-20 must plan as a bounded heap")
    assert(!p.contains("CartesianProduct"),
      "doc pairs must come from the shared-term posting join only")
    spark.catalog.clearCache()
  }

  test("a13_slo_burn_rate: burn windows run over the bounded time-bucket census") {
    val df = QueryRegistry.queries("a13_slo_burn_rate")(spark, dir)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val wins = df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(wins.nonEmpty, "expected the trailing-window burn sums")
    for (w <- wins)
      assert(w.collect { case a: Aggregate => a }.nonEmpty,
        "burn windows must sit above the 30-min bucket census, not event rows")
  }

  test("a10_group_split: both split policies ride one scan; censuses are keyed aggregates") {
    val p = plan("a10_group_split")
    assert(!p.contains("CartesianProduct"))
    assert("Scan parquet".r.findAllIn(p).length <= 4,
      s"split comparison should reuse the documents scan, not fan out:\n${p.take(800)}")
  }

  test("s9_orc_roundtrip: the ORC scan keeps columnar pruning and the pushed quantity filter") {
    val p = plan("s9_orc_roundtrip")
    assert(p.contains("Scan orc"), "round-trip must read back through the native ORC source")
    assert(p.contains("PushedFilters: [") && p.contains("l_quantity"),
      s"quantity predicate not pushed into the ORC scan:\n${p.take(1200)}")
  }

  test("a11_quantile_sketch: the rank check broadcasts the 9 sketch answers, never sorts the corpus") {
    val df = QueryRegistry.queries("a11_quantile_sketch")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    import org.apache.spark.sql.catalyst.plans.logical.{Sort => LSort}
    assert(df.queryExecution.optimizedPlan.collect { case s: LSort => s }.isEmpty,
      "sketch certification must not plan a global sort")
    spark.catalog.clearCache()
  }

  test("w12_markov_transitions: the lag window is user-partitioned; normalization windows the bounded matrix") {
    val df = QueryRegistry.queries("w12_markov_transitions")(spark, dir)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.size == 2, s"expected the lag + row-total windows, got ${wins.size}")
    assert(wins.forall(_.partitionSpec.nonEmpty), "both windows must be partitioned")
    // the row-total window must sit above the 25-cell census, not event rows
    val rowTotal = wins.find(_.partitionSpec.exists(_.toString.contains("prev_type"))).get
    assert(rowTotal.collect { case a: Aggregate => a }.nonEmpty,
      "normalization must window the transition-cell census")
  }

  test("a10_overlap_estimate: exact side is one per-user aggregate; sketch side joins as a 1-row broadcast") {
    val p = plan("a10_overlap_estimate")
    assert(!p.contains("CartesianProduct"))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 1,
      "only the 1-row sketch frame may nested-loop against the exact census")
    assert(p.contains("approx_count_distinct") || p.contains("HyperLogLog"),
      "the sketch leg must plan the HLL aggregate")
  }

  test("a12_label_propagation: a round is exchange-free — broadcast join + one mode aggregate") {
    // The registered query checkpoints each round, so its FINAL plan is
    // just an RDD scan; rebuild one round from the same building blocks
    // and pin the shape the scaladoc claims: edges cached with hash(src)
    // partitioning (the ONE layout both LabelProp modes share), neighbor
    // labels broadcast in on dst, and the whole relabel ONE
    // deterministic-mode aggregate (r13) partition-local on the src
    // clustering — never a sort, never a shuffle.
    import org.apache.spark.sql.functions._
    val t = Tables(spark, dir)
    val items = t.lineitem
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val keep = items.groupBy("o").agg(count(lit(1)).as("n"))
      .filter(col("n").between(2, 6)).select("o")
    val kept = items.join(keep, "o")
    val edges = kept.select(col("o"), col("p").as("src"))
      .join(kept.select(col("o"), col("p").as("dst")), Seq("o"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct()
      .repartition(col("src")).cache()
    edges.count() // materialize so AQE sees the cached partitioning
    val lbl = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl")).localCheckpoint()
    val round = graft.ops.LabelProp.round(edges, lbl, broadcastLabels = true)
    round.count() // finalize the adaptive plan
    val p = round.queryExecution.executedPlan.toString
    // strip the cached-edge subtree (its build legitimately exchanges):
    // everything ABOVE the InMemoryTableScan must be exchange-free
    val above = p.split("InMemoryTableScan").head
    assert(!above.contains("Exchange hashpartitioning"),
      s"an LPA round must not shuffle:\n$above")
    assert(!above.contains("SortAggregate"),
      "the mode relabel must stay a hash-style aggregate")
    assert(above.contains("partial_mode"),
      "the relabel must be the single mode aggregate with map-side partials")
    assert(above.contains("BroadcastHashJoin"),
      "the label table must broadcast into the round join")
    spark.catalog.clearCache()
  }

  test("a11_countmin_sketch: exact top-10 is a bounded heap; the probe joins the tiny sketch") {
    val p = plan("a11_countmin_sketch")
    assert(p.contains("TakeOrderedAndProject"),
      "the exact top-10 must plan as a bounded heap, not a global sort")
    assert(!p.contains("CartesianProduct"))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 1,
      "only the 1-row total-N frame may nested-loop; the sketch probe is an equi-join")
  }

  test("a10_containment / x28_keyphrases: gram and word joins stay hash equi-joins") {
    for (name <- Seq("a10_containment", "x28_keyphrases")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name plans a nested loop")
    }
    spark.catalog.clearCache()
  }
}
