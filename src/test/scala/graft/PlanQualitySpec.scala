package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality regression guard — pins the 100×-scale posture the plan
  * audits in BASELINE.md describe, so a refactor can't silently regress it:
  *
  *  - NO CartesianProduct anywhere in any guarded query's physical plan;
  *  - BroadcastNestedLoopJoin only where it is the DESIGN (knn_ivf probes
  *    ≤ nCells centroid rows; 1-row scalar cross joins);
  *  - dimension joins in the TPC-H-style queries broadcast;
  *  - filters reach the parquet scan (`PushedFilters`), and projection
  *    prunes the read schema.
  *
  * Checks run on the pre-adaptive physical plan (`sparkPlan`) — no
  * execution needed; AQE only narrows join strategies further at runtime
  * (a sort-merge join can become broadcast, never the reverse), so a clean
  * pre-AQE plan is the conservative bound. Queries whose CONSTRUCTION runs
  * driver-side passes (graphs, iterate) are exercised by their own specs
  * and excluded here. */
class PlanQualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val sfDir = SparkTestBase.sfDir

  /** Queries safe to PLAN without triggering execution during construction,
    * i.e. purely declarative builders. */
  private val guarded = Seq(
    "q1_agg", "q3_shipping", "q5_local_supplier",
    "join_inner", "join_left", "join_outer", "filter_rows", "select_project",
    "groupby_reduce", "ix_lookup", "concat", "difference", "intersect",
    "update_cells", "update_rows", "sort_prev_next", "ordered_diff",
    "window_tumbling", "window_sliding", "window_session", "intervals_over",
    "interval_join", "interval_join_left", "interval_join_right",
    "interval_join_full", "asof_backward", "asof_forward", "asof_nearest",
    "asof_full",
    "window_join", "window_join_sliding", "window_join_session",
    "intervals_over_inner", "interpolate", "sync_group_cut", "inactivity_detect",
    "sample_group_cap_hot",
    "text_tokens", "text_quality", "text_gopher", "text_c4", "text_langid",
    "text_fingerprint", "text_pii", "text_url_filter",
    "dedup_exact", "dedup_spans",
    "decontaminate", "decontaminate_fuzzy", "sample_weighted",
    "sample_stratified", "sample_group_cap", "split_train_test",
    "doc_pack", "doc_split_chunks", "doc_parse", "expr_str", "expr_num",
    "expr_cond", "matmul_block", "reduce_countmin",
    "expr_str_py", "expr_json", "expr_dt", "reduce_distinct_fold",
    "pagerank_ref", "window_behavior", "snapshot_diff", "upsert_session",
    // r17 widening: every remaining purely-declarative board row
    "error_handling", "error_table", "sql_bridge", "sql_dialect",
    "bm25_per_term", "rrf_fusion", "changelog_agg", "stream_upsert",
    "unpack_col", "majority", "argmax_rows", "ndarray_sum",
    "reduce_min_max", "reduce_argminmax", "reduce_unique_any",
    "reduce_sorted_tuple", "reduce_tuple_ordered", "reduce_stats",
    "reduce_stateful_sumsq", "reduce_earliest_latest",
    "reduce_approx_distinct", "reduce_misra_gries", "reduce_topk_freq",
    "text_boilerplate", "text_lm_score", "cast_rename", "apply_udf",
    "error_propagate_reduce", "error_skip_reduce", "expr_dt_round",
    "expr_tuple", "dedup_acceptor", "asof_now_join",
    // r18: changelog UDF storage (one groupByKey shuffle, no execution at
    // plan time; doc_store_hybrid is excluded — its builder materializes
    // the store eagerly by design)
    "udf_changelog",
    // r18: DSIR selection — bucket-count shuffles + a broadcast ratio join;
    // the corpus gram totals are broadcast 1-row cross joins inside ONE
    // declarative plan (no driver scalars), never a corpus x corpus join
    "dsir_select",
    // r18: mixture planner — one groupBy(source) count + G-row broadcast
    // joins (the T* scalar is a broadcast 1-row cross join)
    "mixture_plan")
  // select_and_curate / dedup_semantic are excluded like doc_store_hybrid:
  // their builders materialize eagerly by design (minhashCore's sig.count /
  // the cluster-assignment persist), so a plan-only sweep would execute
  // them; their component stages (dsir_select, mixture_plan,
  // sample_stratified, dedup_minhash_lsh, decontaminate, doc_pack) are all
  // individually guarded above.

  /** BroadcastNestedLoopJoin is legitimate ONLY for designed tiny sides:
    * 1-row scalar cross joins (ignore_late-style max-ts broadcast;
    * sync_group_cut / inactivity_detect broadcast a 1-row frontier). */
  private val bnljAllowed =
    Set("ignore_late", "sync_group_cut", "inactivity_detect", "window_behavior",
      // text_lm_score: crossJoin(broadcast(vocab)) where vocab is the ONE-ROW
      // countDistinct aggregate; rrf_fusion: its knn inputs broadcast the
      // tiny (3-row) query set — both designed scalar/tiny-side broadcasts
      "text_lm_score", "rrf_fusion",
      // mixture_plan: crossJoin(broadcast(tstar)) where tstar is the ONE-ROW
      // min(cap/w) aggregate — a designed scalar broadcast; dsir_select:
      // the two ONE-ROW gram-total aggregates ride the same pattern
      "mixture_plan", "dsir_select")

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.sparkPlan.toString
  }

  test("Persistence.unitDiff plans one count-aggregate shuffle over the " +
      "union — no join, no second exchange (r17)") {
    // built directly (persist_diff's construction writes parquet state, so
    // it can't sit in `guarded`): the changelog between two generations
    // must stay a union -> partial agg -> ONE hash exchange -> final agg
    import org.apache.spark.sql.functions.col
    val base = graft.sources.Tables.orders(spark, sfDir).toDf
      .select("o_orderkey", "o_orderstatus")
    val diff = graft.streaming.Persistence.unitDiff(
      base.filter(col("o_orderkey") % 2 === 0),
      base.filter(col("o_orderkey") % 3 =!= 0))
    // executedPlan: EnsureRequirements has inserted the exchanges by now
    // (sparkPlan is pre-placement and shows none)
    val p = diff.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"unitDiff must not plan a join:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly one shuffle:\n$p")
    assert(p.contains("HashAggregate"), "expected hash aggregation")
    assert(p.contains("partial_sum"), "expected map-side partial aggregation")
  }

  test("no guarded query plans a CartesianProduct or stray nested-loop join") {
    val offenders = guarded.flatMap { name =>
      val p = plan(name)
      val cartesian = p.contains("CartesianProduct")
      val bnlj = p.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name)
      if (cartesian || bnlj)
        Some(s"$name: ${if (cartesian) "CartesianProduct " else ""}${if (bnlj) "BNLJ" else ""}")
      else None
    }
    assert(offenders.isEmpty, s"unbounded join shapes: $offenders")
  }

  test("q3_shipping: both dimension sides broadcast, all scans carry pushed filters") {
    val p = plan("q3_shipping")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "expected >= 2 broadcast dim joins")
    assert("PushedFilters: \\[[^\\]]".r.findAllIn(p).nonEmpty,
      "expected non-empty PushedFilters on at least one scan")
  }

  test("filter_rows: predicate reaches the parquet scan") {
    val p = plan("filter_rows")
    assert("PushedFilters: \\[[^\\]]".r.findAllIn(p).nonEmpty, s"no pushdown in:\n$p")
  }

  test("select_project: read schema is pruned to referenced columns") {
    val p = plan("select_project")
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    // the customer table has 8 columns; the projection touches a few
    assert(readSchema.split(",").length <= 5, s"unpruned scan: $readSchema")
  }

  test("q1_agg: aggregation is two-phase (map-side partial before the shuffle)") {
    val p = plan("q1_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial + final HashAggregate pair")
  }

  test("sample_stratified: mixture table broadcasts, corpus side never shuffles") {
    val p = plan("sample_stratified")
    assert(p.contains("BroadcastHashJoin"), s"rates join not broadcast in:\n$p")
    assert(!p.contains("SortMergeJoin"), "mixture join must not shuffle the corpus")
  }
}
