#!/usr/bin/env python
"""Scaling probe for the round-9 entity-resolution and audience-overlap
operators (SCALE.md §11.9): replicate the record/event tables K× in the
growth mode each operator actually faces and time the full queries.

Two `part` replication modes (the §11.7-vs-§11.8 distinction applied to
records):
- growth: replica r>0 prefixes the name's first token with a replica tag
  → new name keys, so BLOCK COUNT grows K× while block sizes stay fixed —
  genuine catalog growth; expectation: ~linear.
- clone: replicas keep identical names → every name-key block is K× deep,
  intra-block candidate pairs grow K², matched edges grow ~K² inside
  clusters — the boilerplate-key stress case the ``block_cap`` knob
  guards; the probe also times the capped run and reports edge recall
  under the cap.
- hotspot (round 11, VERDICT r10 item 8): the §11.9 domain condition made
  concrete — every base name is uniquified (singleton blocks, zero edges)
  and K×500 placeholder records share ONE boilerplate name key. This is
  the catalog where ``block_cap="auto"`` IS right: the quadratic fan-out
  is entirely junk-key skew, not the operator's definition, so the cost
  trigger engages, bounds the hotspot at cap² pairs, and leaves every
  real (singleton) block untouched. The probe reports uncapped vs auto
  wall time, whether auto engaged, and the recall wholly attributable to
  the placeholder block.

`events` replicate along the user dimension (scale_smoke.replicated_dir):
K× users, per-user profiles fixed — audience_overlap's exact self-join and
the sketch ship path both face K× members.

Usage: [ER_FACTORS=1,4,16] [ER_BLOCK_CAP=8] python tools/er_scale_probe.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from pyspark.sql import functions as F  # noqa: E402

from url_counter_mapreduce_spark import QUERIES, get_spark  # noqa: E402
from url_counter_mapreduce_spark.operators.entity import (  # noqa: E402
    er_golden_record,
    er_match_edges,
)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = [int(f) for f in os.environ.get("ER_FACTORS", "1,4,16").split(",")]
CAP = int(os.environ.get("ER_BLOCK_CAP", "8"))


def _part_dir(spark, factor: int, mode: str) -> str:
    """Directory with a K×-replicated part table (mode: growth|clone) and
    symlinks to the source for every other table."""
    import hashlib

    uid = os.getuid() if hasattr(os, "getuid") else 0
    tag = hashlib.md5(f"{SRC}|{mode}".encode()).hexdigest()[:8]
    d = os.path.join(tempfile.gettempdir(), f"spark_graft_er_{uid}_{tag}_{factor}x")
    # own done-marker written AFTER the symlink loop: the parquet _SUCCESS
    # alone could pass while a crash between write and symlinks left the
    # sibling-table links missing, breaking every later run until cleaned
    done = os.path.join(d, "_GRAFT_DONE")
    if os.path.exists(done):
        return d
    marker = os.path.join(d, "part.parquet", "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        part = spark.read.parquet(os.path.join(SRC, "part.parquet"))
        if mode == "hotspot":
            # singleton blocks everywhere (names uniquified by partkey)
            # + ONE boilerplate name key holding factor×500 placeholder
            # records with agreeing secondary attributes
            uniq = part.withColumn(
                "p_name",
                F.concat(F.col("p_name"), F.lit(" uq"), F.col("p_partkey")),
            )
            base_max = part.agg(F.max("p_partkey")).collect()[0][0]
            hot = (
                spark.range(factor * 500)
                .select(
                    (F.col("id") + base_max + 1).alias("p_partkey"),
                    F.lit("unknown placeholder record").alias("p_name"),
                    F.lit("Brand#00").alias("p_brand"),
                    F.lit("PLACEHOLDER TYPE").alias("p_type"),
                    F.lit(1).cast("int").alias("p_size"),
                    F.lit(1.0).alias("p_retailprice"),
                )
            )
            rep = uniq.select(
                "p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"
            ).unionByName(hot)
        else:
            rep = part.withColumn(
                "replica", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
            ).withColumn("p_partkey", F.col("p_partkey") * factor + F.col("replica"))
            if mode == "growth":
                rep = rep.withColumn(
                    "p_name",
                    F.when(F.col("replica") == 0, F.col("p_name")).otherwise(
                        F.concat(F.lit("r"), F.col("replica").cast("string"), F.lit("_"), F.col("p_name"))
                    ),
                )
            rep = rep.drop("replica")
        rep.repartition(32).write.mode("overwrite").parquet(
            os.path.join(d, "part.parquet")
        )
    # (re)create symlinks even when the parquet marker exists — a crash
    # between the write and this loop must not leave a half-built dir
    for t in (
        "region nation customer supplier orders lineitem events documents embeddings"
    ).split():
        link = os.path.join(d, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), link)
    with open(done, "w") as fh:
        fh.write("ok\n")
    return d


def _time(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    import scale_smoke  # tools/ sibling: user-dimension events replicas

    spark = get_spark("er-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup
    QUERIES["url_count"](spark, SRC).write.format("noop").mode("overwrite").save()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    print(f"factors={FACTORS} src={SRC} block_cap={CAP}")
    for factor in FACTORS:
        dg = _part_dir(spark, factor, "growth")
        t_growth = _time(lambda: noop(er_golden_record(spark, dg)))
        dc = _part_dir(spark, factor, "clone")
        t_clone = _time(lambda: noop(er_golden_record(spark, dc)))
        t_capped = _time(lambda: noop(er_golden_record(spark, dc, block_cap=CAP)))
        full_edges = er_match_edges(spark, dc).count()
        kept_edges = er_match_edges(spark, dc, block_cap=CAP).count()
        recall = kept_edges / full_edges if full_edges else float("nan")
        de = scale_smoke.replicated_dir(spark, factor)
        t_overlap = _time(lambda: noop(QUERIES["audience_overlap"](spark, de)))
        t_sketch = _time(lambda: noop(QUERIES["audience_overlap_sketch"](spark, de)))
        snm = _time(lambda: noop(QUERIES["er_sorted_neighborhood"](spark, dg)))
        print(
            f"{factor:>3}x  er_growth={t_growth:.2f}s  er_clone={t_clone:.2f}s "
            f"er_clone_cap{CAP}={t_capped:.2f}s edge_recall={recall:.4f} "
            f"({kept_edges}/{full_edges})  snm_growth={snm:.2f}s  "
            f"audience_overlap={t_overlap:.2f}s  overlap_sketch={t_sketch:.2f}s"
        )
        # the hotspot leg: the catalog where "auto" IS the right ER
        # default (VERDICT r10 item 8) — one boilerplate key, singleton
        # blocks everywhere else
        from url_counter_mapreduce_spark.operators import skew_guard

        dh = _part_dir(spark, factor, "hotspot")
        t_hot_off = _time(lambda: noop(er_match_edges(spark, dh, block_cap=None)))
        skew_guard.pop_decisions()
        t_hot_auto = _time(lambda: noop(er_match_edges(spark, dh, block_cap="auto")))
        engaged = any(d["engaged"] for d in skew_guard.pop_decisions())
        hot_full = er_match_edges(spark, dh, block_cap=None).count()
        hot_auto = er_match_edges(spark, dh, block_cap="auto").count()
        print(
            f"     hotspot(1 key x {factor * 500}): uncapped={t_hot_off:.2f}s "
            f"auto={t_hot_auto:.2f}s engaged={engaged} "
            f"edges={hot_auto}/{hot_full} (lost edges are all inside the "
            f"placeholder block)"
        )


if __name__ == "__main__":
    main()
