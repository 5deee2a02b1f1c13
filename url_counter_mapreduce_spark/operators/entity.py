"""Entity resolution / record linkage: blocking → multi-attribute match
scoring → duplicate-cluster resolution → survivorship (golden record).

This is the structured-data twin of the document dedup family: where
``dedup_minhash_pairs``/``dedup_groups`` resolve near-duplicate *text*,
these operators resolve near-duplicate *records* (the catalog/CRM/master-
data problem every 100 TB ingestion pipeline hits before joining sources).
The reference's pipeline has no ER stage (its one record type is an
opaque line, main.go:24-26); this extends the §2.4 pipeline surface with
the classic Fellegi–Sunter-shaped flow: candidate generation by blocking,
deterministic pairwise scoring, transitive-closure clustering (reusing
``graph.connected_components`` — driver union-find under the measured
edge gate, pointer-halved label propagation above it), and survivorship
rules that pick one golden record per entity.

Two blocking strategies, each a registered query:

- ``er_golden_record`` — standard (equality) blocking on the normalized
  name key. The match rule REQUIRES name-token-set equality, so the
  blocking is exactly recall-1 by construction (no pair outside a block
  can match) while the DuckDB oracle brute-forces ALL pairs and proves
  it. Scale: one equi-join shuffle keyed by the blocking key; work is
  quadratic only WITHIN a block (the ``block_cap`` knob prunes
  boilerplate-key blocks, same contract as the LSH ``bucket_cap``).
- ``er_sorted_neighborhood`` — Sorted Neighborhood Method (Hernández &
  Stolfo, SIGMOD 1995): order records by a permuted key (noun-first, so
  same-noun records are adjacent regardless of adjective), slide a
  window of ``SNM_WINDOW`` records, score every in-window pair. Rank
  assignment is the two-phase distributed global rank (range partition →
  per-partition row_number + driver offsets — the ``vocab_build``
  decomposition, NOT a single-partition global window); the window join
  is an equi-join on exploded neighbor ranks (shuffle ∝ N·(w−1)).

All match/score arithmetic is integer-exact (score scaled by 1e6 with
integer division), so both engines agree bit-for-bit and the oracles are
exact hash-match, not tolerance checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table
from .graph import connected_components

# Sorted-neighborhood window: each record is compared with the following
# SNM_WINDOW-1 records in sort order. 5 is the classic small default; the
# method's recall is *defined* by the window (pairs farther apart in sort
# order are non-candidates), so the oracle replays the same window.
SNM_WINDOW = 5

# er_golden_record block-size guard (default off — the oracle is exact):
# a boilerplate name key at corpus scale ("unknown unknown") would make
# one block quadratic; capping drops blocks LARGER than the cap entirely
# (the standard blocking-key frequency prune), trading recall on
# degenerate keys for a bounded per-block cost.
ER_BLOCK_CAP: int | None = None


def _part_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized record frame: sorted distinct name tokens (the entity's
    primary identifier), plus the secondary attributes the score weighs."""
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.array_sort(F.array_distinct(F.split(F.col("p_name"), " "))).alias("toks"),
        "p_name",
        "p_brand",
        "p_type",
        "p_size",
        "p_retailprice",
    )


def _secondary_score(a: str, b: str):
    """Integer secondary-attribute agreement score, ×1000:
    500·[brand equal] + 300·[type equal] + 20·(10 − min(10, |Δsize|)).
    Max 1000; the er_golden_record match threshold is 700, reachable only
    as brand+type (800+), brand+size-equal (700), or better — brand
    disagreement can never match (≤ 500). Pure integer arithmetic ⇒ both
    engines agree exactly."""
    m = F.least(F.lit(10), F.abs(F.col(f"{a}.p_size") - F.col(f"{b}.p_size")))
    return (
        F.when(F.col(f"{a}.p_brand") == F.col(f"{b}.p_brand"), F.lit(500)).otherwise(F.lit(0))
        + F.when(F.col(f"{a}.p_type") == F.col(f"{b}.p_type"), F.lit(300)).otherwise(F.lit(0))
        + (F.lit(10) - m) * 2
    )


def er_match_edges(
    spark: SparkSession, sf_dir: str, block_cap: int | None = ER_BLOCK_CAP
) -> DataFrame:
    """Matched record pairs (doc_a, doc_b) under the golden-record rule:
    identical name token set AND secondary score ≥ 700. Candidate
    generation is equality blocking on the name key — provably recall-1
    because the match rule itself requires name-set equality."""
    rec = _part_records(spark, sf_dir).withColumn(
        "name_key", F.concat_ws(" ", F.col("toks"))
    )
    if block_cap is not None:
        sizes = rec.groupBy("name_key").agg(F.count(F.lit(1)).alias("_bn"))
        rec = rec.join(
            F.broadcast(sizes.filter(F.col("_bn") <= block_cap).select("name_key")),
            "name_key",
        )
    a, b = rec.alias("a"), rec.alias("b")
    return (
        a.join(
            b,
            (F.col("a.name_key") == F.col("b.name_key"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .filter(_secondary_score("a", "b") >= 700)
        .select(
            F.col("a.p_partkey").alias("doc_a"),
            F.col("b.p_partkey").alias("doc_b"),
        )
    )


def er_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden records: every part resolved to an entity (transitive closure
    of the match rule; entity_id = min member partkey — singletons keep
    their own key), then one survivor per entity by deterministic
    survivorship: highest retail price wins, partkey breaks ties (the
    "most complete/most valuable record" rule of MDM survivorship, made
    reproducible). price_spread measures intra-entity conflict — the
    quantity a downstream steward reviews.

    Scale: blocking equi-join + CC over the (sparse) match edges + one
    window partitioned BY ENTITY (never global). The oracle brute-forces
    all C(n,2) pairs in DuckDB and must land on identical entities —
    an independent proof the blocking lost nothing."""
    rec = _part_records(spark, sf_dir)
    edges = er_match_edges(spark, sf_dir)
    labels = connected_components(
        rec.select(F.col("p_partkey").alias("doc_id")), edges
    ).select(F.col("doc_id").alias("p_partkey"), F.col("group_id").alias("entity_id"))
    members = rec.join(labels, "p_partkey")
    w = Window.partitionBy("entity_id").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    ranked = members.withColumn("_rn", F.row_number().over(w))
    stats = members.groupBy("entity_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        # floor(x·100 + 0.5)/100 instead of round(): both engines floor the
        # SAME IEEE double, so the result is bit-identical (repo-wide
        # stable-rounding idiom)
        (F.floor((F.max("p_retailprice") - F.min("p_retailprice")) * 100 + F.lit(0.5)) / 100)
        .alias("price_spread"),
    )
    return (
        ranked.filter(F.col("_rn") == 1)
        .select(
            "entity_id",
            F.col("p_partkey").alias("golden_partkey"),
            F.col("p_name").alias("golden_name"),
            F.col("p_brand").alias("golden_brand"),
            F.col("p_retailprice").alias("golden_price"),
        )
        .join(stats, "entity_id")
        .select(
            "entity_id",
            "n_members",
            "golden_partkey",
            "golden_name",
            "golden_brand",
            "golden_price",
            "price_spread",
        )
    )


def _global_rank(df: DataFrame, order_cols: list) -> DataFrame:
    """Two-phase distributed global rank (1-based ``rank`` column added):
    range-partition by the sort key, count per partition on the driver
    (one tiny row per partition), rank locally, add the offset. Identical
    decomposition to vocab_build (pipeline.py:92-142) — a partitionBy-less
    row_number window would single-partition the sort at scale."""
    ranged = (
        df.repartitionByRange(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    sizes = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    if not offsets:
        return ranged.select(df.columns).withColumn("rank", F.lit(0).cast("long"))
    off_map = F.map_from_arrays(
        F.array(*[F.lit(int(p)) for p in offsets]),
        F.array(*[F.lit(int(o)) for o in offsets.values()]),
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        ranged.withColumn("_lr", F.row_number().over(w))
        .withColumn(
            "rank", (F.element_at(off_map, F.col("_pid")) + F.col("_lr")).cast("long")
        )
        .drop("_pid", "_lr")
    )


def er_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted Neighborhood candidate pairs with their full weighted match
    score. Sort key is the NOUN-FIRST permuted name ("small ring" sorts as
    "ring small"), so records naming the same object are adjacent even
    when the leading adjective differs — the key-permutation trick that is
    the whole point of SNM. Every pair within the sliding window of
    SNM_WINDOW records is scored:

        score = 0.4·J(name tokens) + 0.25·[brand =] + 0.2·[type =]
              + 0.15·(10 − min(10, |Δsize|))/10

    emitted (×1e6, integer floor division ⇒ engine-exact) for pairs with
    score_e6 ≥ 600000. Unlike er_golden_record this surfaces CROSS-NAME
    candidates (J = 1/3 pairs sharing the noun) — the human-review queue,
    not the auto-merge set. The window join is an equi-join on exploded
    neighbor ranks: shuffle ∝ N·(w−1), never quadratic; recall is by
    definition the window's (the oracle replays rank + window exactly)."""
    rec = _part_records(spark, sf_dir).withColumn(
        "snm_key", F.concat_ws(" ", F.reverse(F.split(F.col("p_name"), " ")))
    )
    ranked = _global_rank(
        rec, [F.col("snm_key").asc(), F.col("p_partkey").asc()]
    ).select("p_partkey", "toks", "p_brand", "p_type", "p_size", "rank")
    left = ranked.select(
        F.col("p_partkey").alias("pk_a"),
        F.col("toks").alias("toks_a"),
        F.col("p_brand").alias("brand_a"),
        F.col("p_type").alias("type_a"),
        F.col("p_size").alias("size_a"),
        F.explode(
            F.sequence(F.col("rank") + 1, F.col("rank") + (SNM_WINDOW - 1))
        ).alias("nbr_rank"),
    )
    cand = left.join(ranked, left.nbr_rank == ranked.rank)
    i = F.size(F.array_intersect(F.col("toks_a"), F.col("toks")))
    u = F.size(F.array_union(F.col("toks_a"), F.col("toks")))
    m = F.least(F.lit(10), F.abs(F.col("size_a") - F.col("p_size")))
    score = (
        F.expr("400000 * i div u")
        + F.when(F.col("brand_a") == F.col("p_brand"), F.lit(250000)).otherwise(F.lit(0))
        + F.when(F.col("type_a") == F.col("p_type"), F.lit(200000)).otherwise(F.lit(0))
        + (F.lit(10) - m) * 15000
    )
    return (
        cand.withColumn("i", i.cast("long"))
        .withColumn("u", u.cast("long"))
        .withColumn("score_e6", score.cast("long"))
        .filter(F.col("score_e6") >= 600000)
        .select(
            F.col("pk_a").alias("partkey_a"),
            F.col("p_partkey").alias("partkey_b"),
            "score_e6",
        )
    )
