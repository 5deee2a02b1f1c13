"""Physical-plan assertions — the 100 TB scale posture, checked in CI:
pushdown reaches the scan, projections prune columns, small dims broadcast,
top-K avoids a global sort, aggregation is partial before the exchange.
These encode SURVEY.md §4.2's 'Spark disposition' column as tests."""

from __future__ import annotations

import contextlib
import io

from url_counter_mapreduce_spark import QUERIES


def _plan(spark, sf_dir, name: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES[name](spark, sf_dir).explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "filter_shipdate")
    assert "PushedFilters" in plan
    assert "l_discount" in plan.split("PushedFilters")[1][:300]


def test_projection_prunes_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "project_columns")
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "l_extendedprice" in read_schema
    assert "l_shipdate" not in read_schema  # unused column must not be read


def test_dimension_joins_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_customer_nation")
    assert plan.count("BroadcastHashJoin") >= 2  # nation and region both broadcast
    assert "SortMergeJoin" not in plan


def test_topk_avoids_global_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "url_topk")
    assert "TakeOrderedAndProject" in plan


def test_count_has_partial_aggregation(spark, sf_dir):
    """The map-side combine the reference lacks (common_map.go:33-37) —
    partial_count before the exchange, final count after."""
    plan = _plan(spark, sf_dir, "url_count")
    assert "partial_count" in plan
    assert "Exchange" in plan


def test_agg_stays_jvm_side(spark, sf_dir):
    """TPC-H Q1 shape must be pure codegen'd HashAggregate — partial+final,
    no Python evaluation anywhere in the plan. (AQE's pre-execution
    'formatted' output hides WholeStageCodegen spans, so assert on the
    operator mix instead.)"""
    plan = _plan(spark, sf_dir, "agg_pricing_summary")
    assert plan.count("HashAggregate") >= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_spread_is_gated_on_input_splits(spark, sf_dir):
    """spread() must be a no-op when the input already has enough splits —
    at 100 TB an unconditional repartition() would be a full extra exchange
    of the raw corpus (VERDICT r01 finding #1)."""
    from url_counter_mapreduce_spark.tables import spread

    par = spark.sparkContext.defaultParallelism
    well_split = spark.range(0, 1000, 1, numPartitions=par * 2)
    assert spread(well_split) is well_split  # untouched: no Exchange injected
    under_split = spark.range(0, 1000, 1, numPartitions=1)
    assert spread(under_split).rdd.getNumPartitions() == par


def test_ivf_query_path_has_no_bnl_and_no_corpus_window(spark, sf_dir):
    """The per-query IVF path must be: broadcast probe table → hash equi-join
    on cell → rank. Assignment is a literal-centroid projection, so no
    BroadcastNestedLoopJoin may appear anywhere (VERDICT r01 finding #3)."""
    plan = _plan(spark, sf_dir, "similarity_ivf")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Both sides bucketed+sorted by the join key → the sort-merge join must
    read bucket i vs bucket i directly: no Exchange anywhere in the plan
    (the co-located-join posture for repeated joins at 100 TB)."""
    plan = _plan(spark, sf_dir, "bucketed_join")
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan


def test_partitioned_sink_reread_prunes_partitions(spark, sf_dir):
    """The read-back of the lang-partitioned dataset with a lang filter must
    prune at the directory level: PartitionFilters on lang in the scan (at
    100 TB this is the difference between reading one partition and all)."""
    plan = _plan(spark, sf_dir, "sink_partitioned_parquet")
    pf = plan.split("PartitionFilters")[1][:200] if "PartitionFilters" in plan else ""
    assert "lang" in pf, f"no partition pruning on lang:\n{plan[:800]}"


def test_no_accidental_cartesian_products(spark, sf_dir):
    """Blanket scale guard: no batch query may plan a CartesianProduct.
    Broadcast nested-loop joins are allowed only where deliberate (the
    similarity brute-force scorers broadcast a tiny query/centroid set
    against the corpus — O(|Q|·N) by design)."""
    from url_counter_mapreduce_spark import QUERIES, ORACLES

    # similarity_topk is the ONLY deliberate corpus-sized BNL (exact
    # brute-force baseline); similarity_ivf's literal-centroid rework
    # removed its BNL entirely. the recall harnesses embed the brute-force
    # side as ground truth, so their plans legitimately contain that same
    # single BNL.
    from url_counter_mapreduce_spark.plans.bnl_allowance import BNL_ALLOWANCE

    # single source of truth shared with tools/plan_audit.py — see that
    # module's docstring for the two legitimate BNL categories
    bnl_allowed = BNL_ALLOWANCE
    streaming = {n for n in QUERIES if n.startswith("stream_")}
    for name in QUERIES:
        if name in streaming:
            continue  # streaming queries execute on build; plan asserted via their batch twins
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
        n_bnl = plan.count("BroadcastNestedLoopJoin")
        # 'formatted' explain lists each operator twice (tree + details)
        assert n_bnl <= 2 * bnl_allowed.get(name, 0), (
            f"{name}: {n_bnl} BroadcastNestedLoopJoin occurrences in plan, "
            f"allowance {bnl_allowed.get(name, 0)} joins"
        )


def test_prefix_scan_ops_avoid_single_partition_window(spark, sf_dir):
    """The order-dependent passes (token-budget sampling, epoch shuffle)
    must NOT plan an unpartitioned Window — that is Exchange
    SinglePartition, the one-task collapse the two-phase bucketed prefix
    scan exists to avoid. Their offset tables must come in via broadcast."""
    for name in ("sample_token_budget", "corpus_shuffle"):
        plan = _plan(spark, sf_dir, name)
        assert "Exchange SinglePartition" not in plan, f"{name} collapses to one task"
        assert "BroadcastHashJoin" in plan, f"{name} should broadcast its offset table"


def test_training_export_gate_not_pushed_below_spread(spark, sf_dir):
    """VERDICT r13 item 5: the export gate's classifier aggregate must be
    evaluated exactly ONCE, in a projection ABOVE the spread exchange —
    Catalyst's filter pushdown would otherwise inline the whole
    tokenize+classifier expression below the RoundRobin repartition and
    re-run it single-threaded on the one-split scan side (guide §4.4's
    duplicated-evaluation trap), and even an above-exchange pushdown
    substitution evaluates it twice (Filter + Project). The guard is the
    nondeterministic-zero tag on the projected columns (pipeline.
    _export_base); this pins that a Spark upgrade or an innocent
    'simplify 0.0*rand to 0.0' refactor can't silently undo it."""
    from url_counter_mapreduce_spark.operators.pipeline import (
        _export_base,
        _export_gated,
    )
    from url_counter_mapreduce_spark.tables import load_table, spread

    gated = _export_gated(_export_base(spread(load_table(spark, sf_dir, "documents"))))
    plan = gated._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    (xchg_i,) = [
        i for i, l in enumerate(lines) if "Exchange RoundRobinPartitioning" in l
    ]
    # nothing below the exchange (scan side) evaluates the classifier
    below = "\n".join(lines[xchg_i:])
    assert "qw:" not in below and "rand(" not in below
    # the classifier aggregate ('qw:' is its salt) is evaluated exactly once,
    # in the Project — the Filter compares the projected ATTRIBUTE instead
    # of re-inlining the expression
    assert plan.count("qw:") == 1
    (filter_line,) = [l for l in lines if "+- Filter " in l]
    assert "qw:" not in filter_line and "sum_w#" in filter_line


def test_quality_classifier_is_scan_only(spark, sf_dir):
    """fastText-style inference is a pure map: the plan must contain no
    Exchange at all (per-row folds over the token array, no explode, no
    shuffle)."""
    plan = _plan(spark, sf_dir, "quality_classifier_score")
    assert "Exchange" not in plan


def test_dynamic_partition_pruning_injected(spark, sf_dir):
    """join_partition_pruned's fact scan must carry a runtime
    dynamicpruningexpression in its PartitionFilters — the dimension's
    surviving keys decide which lang partitions are read, with no pruning
    literal anywhere in the query."""
    plan = _plan(spark, sf_dir, "join_partition_pruned")
    assert "dynamicpruning" in plan.lower(), plan[:800]


def test_bloom_filter_join_injects_might_contain(spark, sf_dir):
    """join_bloom_filtered's fact side must carry the planner-injected
    bloom probe (might_contain over the dim keys) so non-matching rows die
    at the scan, before the join shuffle. Asserted on the lazy frame under
    the operator's conf overrides — the registered query returns the
    checkpointed result, whose plan is a scan."""
    import contextlib
    import io

    from url_counter_mapreduce_spark.operators import advanced

    saved = {k: spark.conf.get(k, None) for k in advanced._BLOOM_CONFS}
    for k, v in advanced._BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        frame = advanced._bloom_join_frame(spark, sf_dir)
        plan = frame._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            spark.conf.unset(k) if v is None else spark.conf.set(k, v)
    assert "might_contain" in plan, plan[:800]
    assert "bloom_filter_agg" in plan, plan[:800]


def test_cdc_snapshot_diff_has_no_exchange(spark, sf_dir):
    """cdc_changes full-outer-diffs two snapshots bucketed on the key:
    the executed plan must contain no Exchange — the diff is scan + merge."""
    plan = _plan(spark, sf_dir, "cdc_changes")
    assert "Exchange" not in plan, plan[:1200]


def test_udf_iter_is_arrow_batched_not_row_python(spark, sf_dir):
    """The SCALAR_ITER UDF must plan as ArrowEvalPython (vectorized batch
    transfer), never BatchEvalPython (row-at-a-time pickling)."""
    plan = _plan(spark, sf_dir, "udf_iter_surface")
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_pcm_decode_is_shuffle_free(spark, sf_dir):
    """multimodal_wav_pcm is synth → decode → projection, all mapInPandas
    over the scan partitioning: the plan must contain NO Exchange (a
    per-blob decode that shuffles is wrong at any scale)."""
    plan = _plan(spark, sf_dir, "multimodal_wav_pcm")
    assert "Exchange" not in plan


def test_lead_time_scans_are_pruned(spark, sf_dir):
    """orders_lead_time reads 2 of 11 lineitem columns and 3 of 6 orders
    columns — the fact-scan pruning that decides its cost at 100 TB."""
    plan = _plan(spark, sf_dir, "orders_lead_time")
    import re

    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, plan
    for s in schemas:
        cols = {c.split(":")[0] for c in s.split(",") if c}
        assert cols <= {"l_orderkey", "l_shipdate", "o_orderkey", "o_orderdate", "o_orderpriority"}, cols


def test_repetition_and_gates_have_partial_aggregation(spark, sf_dir):
    """The corpus-linear session-7 gates must show map-side combine
    (partial HashAggregate) so the n-gram/bigram shuffles carry aggregated
    keys, not raw occurrences."""
    for name in ("quality_repetition", "lm_perplexity_gate", "token_entropy_rate"):
        plan = _plan(spark, sf_dir, name)
        assert "partial" in plan.lower(), f"{name} lacks partial aggregation"


def test_market_basket_uses_topk_operator(spark, sf_dir):
    """orders_market_basket's top-50 must plan as TakeOrderedAndProject
    (per-partition heaps), not a global sort."""
    plan = _plan(spark, sf_dir, "orders_market_basket")
    assert "TakeOrderedAndProject" in plan
