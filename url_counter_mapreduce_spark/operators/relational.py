"""Relational extension surface (SURVEY.md §2.3 X1–X10) over the TPC-H-ish
testdata. The reference has none of these (SURVEY.md §2.2: no joins, filters,
windows, grouping sets, set ops, or scalar functions) — they are required by
the driver's north star (BASELINE.json) and are all pure Catalyst built-ins:
pushdown, pruning, broadcast, partial aggregation and AQE come free.

Cross-engine determinism rules used throughout (oracle = DuckDB):
  - every aggregate over doubles is round()ed (4dp) in BOTH engines so
    summation-order ULP noise can't flip the driver's value-hash;
  - per-row double arithmetic is left raw (IEEE ops are bit-identical);
  - functions where DuckDB returns BIGINT but Spark returns INT (year(),
    length(), …) are cast to long on the Spark side so schemas align;
  - midnight-timestamp date columns are cast to DATE on both sides;
  - window/top-k orderings always carry a unique tiebreak key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from ..tables import load_table


def filter_shipdate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 filter with parquet predicate pushdown: recent, discounted line
    items. .explain shows PushedFilters on l_shipdate/l_discount."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp")) & (F.col("l_discount") > 0.05))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            # ISO string, not DATE: keeps the collected Python type identical
            # across Spark (datetime.date) and DuckDB (Timestamp) so any
            # driver-side value normalization agrees
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
        )
    )


def project_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 projection + column pruning: ReadSchema must show only the four
    referenced columns. revenue is per-row double math (bit-identical across
    engines, no rounding needed)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("revenue"),
    )


def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 grouped multi-aggregate — TPC-H Q1 shape on lineitem.

    Partial aggregation (map-side combine) + 4-group final aggregate; the
    whole plan is one exchange. Aggregates rounded 4dp both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(charge), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def join_customer_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 equi-join with explicit broadcast of the small dimensions.

    customer (fact side) keeps its partitioning; nation (25 rows) and region
    (5 rows) ship to every executor — zero shuffle of the big side. At 100 TB
    the same plan holds for any dim under the broadcast threshold.
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(broadcast(nation), cust.c_nationkey == nation.n_nationkey, "inner")
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey, "inner")
        .select("c_custkey", "c_name", F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
    )


def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 left-semi + left-anti join: customers with vs without a big order,
    tagged and unioned. Catalyst plans BroadcastHashJoin(LeftSemi/LeftAnti)
    when the filtered orders side is small; at scale it falls back to
    shuffle-hash with AQE deciding."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000.0).select("o_custkey")
    with_big = cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").withColumn(
        "kind", F.lit("has_big_order")
    )
    without = cust.join(big, cust.c_custkey == big.o_custkey, "left_anti").withColumn(
        "kind", F.lit("no_big_order")
    )
    return with_big.unionByName(without)


def distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 distinct: unique (user_id, event_type) pairs — a hash aggregate
    with partial dedup before the exchange."""
    return load_table(spark, sf_dir, "events").select("user_id", "event_type").distinct()


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6b approx distinct as an ACCURACY GATE: HyperLogLog++ (rsd 0.01)
    per-type user counts, shipped as (exact count, estimate-within-bound
    flag). The raw HLL estimate is engine-specific (DuckDB cannot replay
    Spark's HLL++ registers), but the gate row is fully deterministic:
    Spark's approx_count_distinct is a pure function of the input set, so
    whether |est − exact| ≤ max(2, ⌈5%·exact⌉) is a reproducible fact the
    DuckDB oracle asserts as the expected contract (the same recipe that
    made dedup_mllib_minhash exact). The exact countDistinct here is the
    gate's measuring stick — at 100 TB you'd ship the sketch alone (see
    hll_sketch_rollup for the mergeable-pre-aggregate posture) and run
    this gate on a sampled slice."""
    # distinct-first (optimization r14): countDistinct beside another
    # aggregate plans an Expand that doubles every event row and runs the
    # HLL++ partial update over the raw-row copy; pre-distincting the
    # (type, user) pairs removes the Expand and feeds both aggregates the
    # already-deduplicated set. Value-identical: HLL++ is a pure function
    # of the SET of values (duplicate updates hit the same register), and
    # count over distinct pairs IS countDistinct. Measured 2.56 → 0.84 s
    # at sf0.1 (5-sample medians, same session).
    pairs = (
        load_table(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    )
    agg = pairs.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.count("user_id").cast("long").alias("exact_users"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.greatest(F.lit(2).cast("long"), F.ceil(F.col("exact_users") * 0.05))
        ).alias("approx_within_5pct"),
    )


def approx_distinct_users_sketch(
    spark: SparkSession, sf_dir: str, gate: bool = True
) -> DataFrame:
    """X6c the 100 TB SHIP PATH for approx-distinct: the HLL++ estimate
    ALONE — one pass, map-side partial sketches, a tiny merge, no exact
    countDistinct anywhere in the plan (that exact count is precisely what
    the sketch exists to avoid; at scale it would re-shuffle every
    distinct (type, user) pair). The estimate is engine-specific so the
    oracle is rows-only BY DESIGN; accuracy is pinned by the exact-green
    gate twin `approx_distinct_users` (exact + within-bound flag, run as a
    correctness artifact) and independently re-derived + bounded in
    tests/test_properties.py::test_approx_distinct_within_bounds. This is
    the variant a deployment benches and ships; it must be strictly
    cheaper than exact `distinct_users`.

    The sketch is Apache DataSketches HLL (hll_sketch_agg, lgK=12 →
    4096 registers, rsd ≈ 1.6%), not approx_count_distinct's HLL++:
    measured per-row update cost at sf0.1 is 0.10 s vs 0.24 s for
    HLL++ at comparable accuracy (rsd 0.02) and vs 0.12 s for the exact
    distinct — DataSketches is the only variant strictly cheaper than
    exact at THIS corpus size (at 10⁹ users the exact path explodes and
    any sketch wins; the local crossover is the honest bench). Measured
    max error: 0% at sf0.001/0.01, 1.33% at sf0.1 — 3.7× inside the 5%
    gate bound. Bonus: the same sketch family as hll_sketch_rollup, so
    at scale this flat estimate is derivable by merging the STORED
    daily rollup sketches instead of rescanning raw events.

    ``gate`` (default, the REGISTERED form since round 11 — VERDICT r10
    item 4): ship the deterministic invariant instead of the raw
    engine-specific estimate — (event_type, exact_users, bound,
    sketch_within_bound), where the flag is |DataSketches est − exact| ≤
    max(2, ⌈5%·exact⌉), a pure function of the input set the DuckDB
    oracle asserts as TRUE. That upgrades the gate verdict from rows-only
    to a checked accuracy contract. ``gate=False`` keeps the pure
    one-pass estimate-only plan (no exact countDistinct anywhere) for the
    bench/plan evidence (tools/bench_variants.py section 6,
    tests/test_properties.py)."""
    est = F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias(
        "approx_users"
    )
    ev = load_table(spark, sf_dir, "events")
    if not gate:
        return ev.groupBy("event_type").agg(est)
    # distinct-first, same rationale and value-identity as
    # approx_distinct_users (DataSketches HLL updates are idempotent per
    # value); the gate=False ship path above stays strictly one-pass
    agg = (
        ev.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(est, F.count("user_id").cast("long").alias("exact_users"))
    )
    return agg.select(
        "event_type",
        "exact_users",
        F.greatest(
            F.lit(2).cast("long"), F.ceil(F.col("exact_users") * 0.05)
        ).alias("bound"),
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.greatest(F.lit(2).cast("long"), F.ceil(F.col("exact_users") * 0.05))
        ).alias("sketch_within_bound"),
    )


def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 window functions: top-3 events by value per event_type with
    row_number + lag, deterministic via the unique event_id tiebreak."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id").asc())
    return (
        ev.select(
            "event_type",
            "event_id",
            "value",
            F.row_number().over(w).alias("rn"),
            F.lag("value", 1).over(w).alias("prev_value"),
        )
        .filter(F.col("rn") <= 3)
    )


def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 rollup: order counts + totals at (status, priority), (status), ()
    grain. NULL grouping markers match ANSI ROLLUP in both engines."""
    od = load_table(spark, sf_dir, "orders")
    return (
        od.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 4).alias("total_price"))
    )


def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8b cube: all 4 grouping sets over (status, priority)."""
    od = load_table(spark, sf_dir, "orders")
    return (
        od.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.avg("o_totalprice"), 4).alias("avg_price"))
    )


def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 set operators: INTERSECT (distinct) and EXCEPT (distinct) between
    big-spender custkeys (orders) and positive-balance custkeys (customer),
    tagged and unioned."""
    big_spenders = (
        load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000.0).select(F.col("o_custkey").alias("custkey"))
    )
    positive = (
        load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0.0).select(F.col("c_custkey").alias("custkey"))
    )
    both = big_spenders.intersect(positive).withColumn("tag", F.lit("both"))
    only_orders = big_spenders.subtract(positive).withColumn("tag", F.lit("only_orders"))
    return both.unionByName(only_orders)


def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 scalar function library: string / JSON / math / date built-ins over
    events. Every function stays JVM-side (whole-stage codegen). Columns where
    DuckDB's return type is BIGINT (length, date parts) are cast to long."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.upper(F.col("event_type")).alias("type_upper"),
        F.substring(F.col("event_type"), 1, 3).alias("type_prefix"),
        F.length(F.col("props")).cast("long").alias("props_len"),
        F.get_json_object(F.col("props"), "$.k").cast("long").alias("k_val"),
        F.abs(F.col("value")).alias("abs_value"),
        F.round(F.sqrt(F.abs(F.col("value"))), 4).alias("sqrt_value"),
        F.year("ts").cast("long").alias("ev_year"),
        F.month("ts").cast("long").alias("ev_month"),
        F.dayofmonth("ts").cast("long").alias("ev_day"),
        F.when(F.col("value") >= 100.0, F.lit("high")).otherwise(F.lit("low")).alias("value_band"),
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("ok")).alias("non_error_type"),
    )


def window_tumbling_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming query (X14): events per hour per type via
    date_trunc — identical semantics to the Structured Streaming tumbling
    window, SQL-expressible so it gets a full oracle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


def unpivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (`DataFrame.unpivot`): the three lineitem amount
    columns melted into (metric, amount) rows, then aggregated per
    (returnflag, metric) — the normalization step feeding any generic
    per-metric monitoring/quality sink. Unpivot is a zero-shuffle map-side
    expand (Catalyst `Expand`, same machinery as rollup); the only
    exchange is the final partial-aggregated groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    up = li.unpivot(
        ids=["l_returnflag"],
        values=["l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="amount",
    )
    return up.groupBy("l_returnflag", "metric").agg(
        F.round(F.sum("amount"), 4).alias("sum_amount"),
        F.count(F.lit(1)).alias("n"),
    )


def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining SQL:2003 rank-family window functions in one pass:
    ntile(4) quartile, percent_rank, cume_dist, and the lag() balance gap,
    per customer within nation, ordered by (acctbal DESC, custkey) — the
    unique tiebreak makes every rank value deterministic (peers never
    exist, so rank-family peer semantics can't diverge cross-engine).
    One shuffle on nationkey; all four functions share the single sorted
    window pass. percent_rank/cume_dist are rationals of exact integer
    ranks -> stable_round.

    Reference parity: the reference sorts once globally (doSort in
    src/main/master_splitmerge.go); rank analytics are the declarative
    upgrade of that sorted pass."""
    from ..functions.vector import stable_round

    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        cust.select("c_nationkey", "c_custkey", "c_acctbal")
        .withColumn("quartile", F.ntile(4).over(w).cast("long"))
        .withColumn("pct_rank_raw", F.percent_rank().over(w))
        .withColumn("cume_raw", F.cume_dist().over(w))
        .withColumn("bal_gap_raw", F.lag("c_acctbal").over(w) - F.col("c_acctbal"))
        .select(
            "c_nationkey",
            "c_custkey",
            F.col("c_acctbal").alias("acctbal"),
            "quartile",
            F.expr(stable_round("pct_rank_raw", 6)).alias("pct_rank"),
            F.expr(stable_round("cume_raw", 6)).alias("cume"),
            F.expr(stable_round("bal_gap_raw", 4)).alias("bal_gap"),
        )
    )


def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equi-join (`<=>` / IS NOT DISTINCT FROM): per-user view
    and purchase counts joined full-outer on the NULL-safe user key, so
    the anonymous-traffic bucket (user_id NULL) matches ITSELF instead of
    silently dropping — the exact defect class ADVICE r06 found in
    ab_test_zscore's oracle, promoted to a first-class operator surface.
    A plain equi-join loses every NULL-keyed row on both sides; `<=>`
    treats NULL = NULL as true while remaining hash-partitionable
    (NULL-safe equality is still an equality predicate — Catalyst plans a
    regular shuffled hash/sort-merge join, no BNL).

    Plan shape at 100 TB: two user-keyed partial aggregates + one
    null-safe full-outer SMJ on the same key."""
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_views"))
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    joined = views.alias("v").join(
        purch.alias("p"),
        F.col("v.user_id").eqNullSafe(F.col("p.user_id")),
        "full_outer",
    )
    return joined.select(
        F.coalesce(F.col("v.user_id"), F.col("p.user_id")).alias("user_id"),
        F.coalesce("n_views", F.lit(0)).alias("n_views"),
        F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
    )
