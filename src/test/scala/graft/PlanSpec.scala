package graft

import graft.registry.Registry

/** Physical-plan hygiene for the whole query registry — the 100 TB
  * guarantees that don't show up in row-level correctness checks:
  *
  *  - no accidental CartesianProduct / BroadcastNestedLoopJoin anywhere
  *    (quadratic at scale); the only sanctioned nested-loop sites are the
  *    two ANN map-side expansions that are cross products BY DEFINITION;
  *  - literal predicates reach the parquet scan (PushedFilters);
  *  - scans read only the projected columns (ReadSchema pruning);
  *  - the hot aggregation path stays inside WholeStageCodegen;
  *  - small dimension joins broadcast.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Queries whose run() performs side effects (writes, stream starts) —
    * covered by their own specs; planning them here would re-execute them.
    */
  private val effectful = Set(
    "streaming_windowed_agg", "streaming_session_window", "streaming_dedup",
    "streaming_interval_join", "streaming_upsert_serve", "streaming_asof_enrich",
    "snk_parquet_partitioned", "snk_range_clustered",
    "src_jsonl_roundtrip", "src_csv_roundtrip", "src_schema_evolution",
    // the paged-connector rows materialize their server-side fixture pages
    // in run(); plan hygiene for the scan side lives in PagedSpec
    "src_sql_http_paginated", "src_graphql_block_snapshot",
    "src_graphql_keyset_paginated", "src_graphql_keyset_resume",
    "src_graphql_address_filtered", "streaming_paged_ingest",
    "snk_upsert_keyed", "snk_upsert_bucketed", "snk_upsert_versioned", "snk_upsert_serve",
    "snk_docstore_upsert",
    "snk_ctas_full_refresh", "layout_bucketed_join", "layout_zorder",
    // r11: ORC roundtrip / hilbert sink / agg-state fold / the two real
    // drains all write in run(); their hygiene lives in their own specs
    "src_orc_roundtrip", "layout_hilbert", "snk_agg_incremental",
    "streaming_sequence_match", "streaming_cms_ingest", "streaming_aggstate_ingest",
    // r16: the foreachBatch dedup/serve loops run availableNow streams and
    // write state + serve tables in run(); their plan hygiene (per-batch
    // shapes, replay safety) lives in StreamsSpec
    "streaming_lsh_dedup", "streaming_pixel_dedup", "streaming_jpeg_dedup",
    "streaming_webp_dedup", "streaming_audio_dedup", "pipeline_streaming_serve")

  /** Sanctioned nested-loop sites: exact brute-force top-k is a cross
    * product by definition, and the quantized two-phase variant scans the
    * same product, just 4x narrower int8 rows — both are correctness
    * baselines, as is the standalone PQ-ADC pass (same pairing over
    * (id, codes) rows; its scale form runs the identical ADC scoring
    * inside IVF cells). Every IVF/kmeans path now inlines centroids as
    * literals (Similarity.CentroidLits), so `sim_ivf_topk` plans keyed
    * joins only and left this set in round 6.
    */
  private val intentionallyUnkeyed =
    Set("sim_bruteforce_topk", "sim_quantized_topk", "sim_pq_topk",
      // hybrid fusion's semantic list IS bruteForceTopK (the correctness
      // baseline); the production swap-in is any keyed ANN top-k
      "text_hybrid_retrieve",
      // recall evaluation NEEDS the exact brute-force ground truth — at
      // scale it runs over a sampled probe set, still exact per probe
      "eval_ann_recall",
      // r11: hard-negative mining and the label-noise audit both ride the
      // same exact brute-force baseline; production feeds the audit any
      // keyed ANN top-k frame instead (labelNoiseFromTopK is retriever-
      // agnostic by construction)
      "sim_hard_negatives", "eval_label_noise",
      // r12: nDCG grades against the same exact ground truth as
      // eval_ann_recall (ndcgAtK itself is keyed joins only)
      "eval_retrieval_ndcg")

  test("no registry query plans a CartesianProduct or an unsanctioned BroadcastNestedLoopJoin") {
    graft.sources.Tables.configure(spark)
    val offenders = Registry.all
      .filterNot(q => effectful(q.name) || intentionallyUnkeyed(q.name))
      .flatMap { q =>
        // queries whose run() crosses a materialization boundary expose the
        // SAME program fully lazy via planView — a localCheckpoint/persist
        // must never hide a quadratic join from this sweep
        val plan = q.planView.getOrElse(q.run)(spark, sf)
          .queryExecution.executedPlan.toString
        val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin").filter(plan.contains)
        if (bad.nonEmpty) Some(s"${q.name}: ${bad.mkString(", ")}") else None
      }
    assert(offenders.isEmpty, s"quadratic joins found:\n${offenders.mkString("\n")}")
  }

  test("planView is present exactly where run() crosses a boundary (derived, not hand-listed)") {
    graft.sources.Tables.configure(spark)
    // DERIVED contract (r15 verdict #5): Boundary.Local/AtPath count
    // their materializations, so the set of boundary-crossing queries is
    // OBSERVED per run() — a new family that routes a boundary without a
    // planView fails here with a pointed message, and no hand list can
    // go stale. Effectful queries (writes/streams) are covered by their
    // own specs and skipped, as in the cartesian sweep above.
    val offenders = Registry.all.filterNot(q => effectful(q.name)).flatMap { q =>
      val before = graft.operators.Boundary.crossings.get()
      q.run(spark, sf)
      val crossed = graft.operators.Boundary.crossings.get() > before
      if (crossed && q.planView.isEmpty)
        Some(s"${q.name}: run() crosses a materialization boundary but exposes no " +
          "planView — plan-hygiene sweeps cannot see through a checkpoint; add a " +
          "Boundary.None twin")
      else if (!crossed && q.planView.isDefined)
        Some(s"${q.name}: declares a planView but run() never crossed a boundary — " +
          "drop the twin or route the boundary")
      else None
    }
    // free the ~40 boundary queries' checkpoint blocks before later tests
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    assert(offenders.isEmpty, s"planView contract violations:\n${offenders.mkString("\n")}")
  }

  test("moving-sum window reuses the aggregation's exchange — one shuffle total") {
    graft.sources.Tables.configure(spark)
    val plan = Registry.byName("window_moving_sum_7d").run(spark, sf)
      .queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n == 1,
      s"daily agg + both windows must share the user_id exchange, found $n:\n$plan")
  }

  test("single-exchange contracts: scd2, ewma, winsorize reuse one key exchange") {
    graft.sources.Tables.configure(spark)
    // each groups/windows/joins exclusively on its key, so Catalyst must
    // satisfy every stage from ONE hash exchange — a second exchange here
    // is a silent 2x shuffle regression at corpus scale
    for (name <- Seq("scd2_build_intervals", "ts_ewma", "analytics_winsorize")) {
      val plan = Registry.byName(name).run(spark, sf)
        .queryExecution.executedPlan.toString
      val n = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(n == 1, s"$name: expected 1 exchange, found $n:\n$plan")
    }
  }

  test("minhash signature plans as a pure projection — zero shuffles") {
    graft.sources.Tables.configure(spark)
    val plan = Registry.byName("dedup_minhash_signature").run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"the per-row native signature must not shuffle:\n$plan")
  }

  test("event-type predicate pushes down to the parquet scan in the enrich pipeline") {
    graft.sources.Tables.configure(spark)
    // feature_assembly (run in the sweep above) persists the events frame;
    // drop it so this plan shows the real parquet scan, not the cache
    spark.sharedState.cacheManager.clearCache()
    val plan = Registry.byName("analytics_enrich_events").run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]"),
      s"expected event_type pushdown:\n$plan")
  }

  test("scans prune to the referenced columns (no props in q1_agg's ReadSchema)") {
    graft.sources.Tables.configure(spark)
    val plan = Registry.byName("q1_agg").run(spark, sf)
      .queryExecution.executedPlan.toString
    val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema:")).toSeq
    assert(readSchemas.nonEmpty)
    assert(!readSchemas.exists(_.contains("props")),
      s"q1_agg should not read the wide props column:\n${readSchemas.mkString("\n")}")
  }

  test("q1_agg's aggregation runs inside WholeStageCodegen") {
    graft.sources.Tables.configure(spark)
    val df = Registry.byName("q1_agg").run(spark, sf)
    df.collect() // AQE only materializes codegen stages in the FINAL plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen stage marker in final plan:\n$plan")
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("HashAggregate")),
      s"aggregation fell out of codegen:\n$plan")
  }

  test("multimodal_decode plans through Catalyst: no RDD barrier, codegen'd, pruned scan") {
    graft.sources.Tables.configure(spark)
    val df = Registry.byName("multimodal_decode").run(spark, sf)
    df.collect() // AQE materializes codegen stages in the final plan
    val plan = df.queryExecution.executedPlan.toString
    // the r6 form routed decodeStub's rdd.mapPartitions + createDataFrame,
    // which planned as a Scan ExistingRDD barrier: no pruning above it, no
    // codegen through the decode. The native-expression form must not.
    assert(!plan.contains("ExistingRDD"), s"RDD barrier is back:\n$plan")
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("graft_decode_stats")),
      s"decode expression fell out of codegen:\n$plan")
    val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema:")).toSeq
    assert(readSchemas.nonEmpty && !readSchemas.exists(_.contains("props")),
      s"decode should prune documents to id+text:\n${readSchemas.mkString("\n")}")
  }

  test("the enrich pipeline's metadata and blocklist joins broadcast") {
    graft.sources.Tables.configure(spark)
    val plan = Registry.byName("analytics_enrich_events").run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast dims:\n$plan")
  }

  test("contamination joins the benchmark postings as the broadcast build side") {
    graft.sources.Tables.configure(spark)
    val plan = Registry.byName("dedup_contamination").run(spark, sf)
      .queryExecution.executedPlan.toString
    // the 100 TB train side must stream map-side against the broadcast
    // benchmark — a shuffled postings join here is the scale bug
    assert(plan.contains("BroadcastHashJoin"), s"bench side must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"train postings must not shuffle-join:\n$plan")
  }

  test("bloom-filtered join probes scan-adjacent, under the join, above the probe scan") {
    graft.sources.Tables.configure(spark)
    val wrapped = Registry.byName("join_bloom_filtered").run(spark, sf)
      .queryExecution.executedPlan
    val exec = wrapped match { // AQE wrapper hides the inner tree from collect
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val plan = exec.toString
    assert(plan.contains("graft_bloom_probe"), s"probe filter missing:\n$plan")
    // the probe must sit BELOW the join (filtering before any exchange /
    // build), i.e. inside the same leaf stage as the lineitem scan: find
    // a Filter whose condition carries the probe and whose subtree is the
    // probe-side scan with no join beneath it
    val probeFilters = exec.collect {
      case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.toString.contains("graft_bloom_probe") => f
    }
    assert(probeFilters.nonEmpty, s"no FilterExec carries the bloom probe:\n$plan")
    assert(probeFilters.exists(f => f.child.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty), s"bloom probe must filter before the join, not after:\n$plan")
  }

  test("surprisal broadcasts the vocabulary into the scoring join") {
    graft.sources.Tables.configure(spark)
    val plan = Registry.byName("text_unigram_surprisal").run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"vocab must broadcast:\n$plan")
  }

  test("bm25 broadcasts vocabulary AND probe queries; posting lists never shuffle-join") {
    graft.sources.Tables.configure(spark)
    val plan = Registry.byName("text_bm25_retrieve").planView.get(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"df/query sides must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the inverted index must stream map-side against broadcast state:\n$plan")
  }

  test("stratified sample semi-joins the picked ids as a broadcast, corpus unshuffled") {
    graft.sources.Tables.configure(spark)
    val plan = Registry.byName("sel_stratified_sample").run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"picked-id set must broadcast semi-join:\n$plan")
  }

  test("health-factor views stay sub-plan-deduplicated (scan-count ceilings)") {
    // r8 regression gate: transcribing the reference's per-protocol CTE
    // structure literally multiplied whole sub-plans —
    // view_current_health_factor planned 52 FileScans / 122 aggregates for
    // 150 rows before the single-pass restructure (now 7/16). Ceilings are
    // ~2x the measured post-fix counts so planner drift doesn't flake, but
    // a reintroduced CTE multiplication (tens of scans) fails loudly.
    graft.sources.Tables.configure(spark)
    val ceilings = Seq(
      "view_current_health_factor" -> 14,
      "view_historical_health_risk" -> 8,
      "agg_count_distinct_blocks_below_threshold" -> 8,
      "feature_assembly" -> 60) // lazy planView; executed form persists 4 stages
    val bad = ceilings.flatMap { case (name, cap) =>
      val q = Registry.byName(name)
      val plan = q.planView.getOrElse(q.run)(spark, sf)
        .queryExecution.executedPlan.toString
      val scans = "FileScan".r.findAllIn(plan).length
      if (scans > cap) Some(s"$name: $scans scans > cap $cap") else None
    }
    assert(bad.isEmpty, s"sub-plan multiplication regressed:\n${bad.mkString("\n")}")
  }

  test("EXECUTED scan counts of the 44-lazy-scan DAGs stay bounded (boundaries actually deduplicate I/O)") {
    // the lazy census reads these two programs as 44 FileScans because
    // every derivation re-states the source scan; Boundary materialization
    // means execution reads the lake far fewer times. This pins the
    // EXECUTED number (AQE-final plans of every SQL action, reused
    // exchanges and cache HITS counted zero, cache BUILDS counted once) so
    // a dropped boundary can't silently turn 44 lazy scans into 44 real
    // ones. Caps are ~2x the measured counts (lsh: 8, assembly: 5 at
    // sf0.001) to absorb planner drift, an order below the lazy number.
    graft.sources.Tables.configure(spark)
    import org.apache.spark.sql.graftnative.PlanProbe
    val caps = Seq("dedup_minhash_lsh" -> 16, "feature_assembly" -> 12)
    val bad = caps.flatMap { case (name, cap) =>
      val q = Registry.byName(name)
      val (_, _, scans) = PlanProbe.measure(spark) {
        q.run(spark, sf).write.format("noop").mode("overwrite").save()
      }
      if (scans > cap) Some(s"$name: $scans executed scans > cap $cap") else None
    }
    assert(bad.isEmpty, s"executed-scan regression:\n${bad.mkString("\n")}")
  }
}
