"""Steady-state marginal drain cost for the stateful streams (VERDICT r12
item 8).

docs/SCALE.md §11.15 proved the expensive stream bench rows are ~all
per-drain FIXED cost (stream_stream_join: 6.6 s intercept, ~0 slope): a
deployed stream starts once — or, in the nightly-batch shape, resumes a
persistent checkpoint and processes only the delta — so the headline
"drain latency" rows overstate deployment cost the same way the sketch
contract rows overstated sketch cost before the `*_ship` rows. These
`*_steady` variants measure the deployment number:

1. PRIME (absorbed by the bench warmup): a private copy-on-symlink source
   directory is seeded with the full fixture table, and one AvailableNow
   drain runs against a PERSISTENT checkpoint — the "stream has been
   running for a while" state.
2. Each timed sample appends one small delta file (DELTA_ROWS rows) to
   the source directory and drains again with the SAME checkpoint: the
   file source's offset log skips every already-processed file, so the
   timed work is exactly checkpoint resume + one-delta processing — the
   marginal drain a nightly AvailableNow job pays.

The sink is ``foreachBatch`` with a noop-format materialization: memory
sinks refuse checkpoint recovery and file sinks refuse update mode, while
foreachBatch supports both recovery and every output mode. Each call
returns a one-row stats frame (drain number, micro-batches, input rows) —
the input-row count is the incrementality PROOF (tested: drain 2 reads
the delta only, never the seed corpus).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from . import stream_shuffle_partitions

DELTA_ROWS = 256


def _seed_dir(base: str, sf_dir: str, table: str) -> str:
    """base/sf/<table>.parquet seeded with symlinks to the fixture's data
    file(s) — the mutable source directory deltas are appended to."""
    sf = os.path.join(base, "sf")
    tdir = os.path.join(sf, f"{table}.parquet")
    os.makedirs(tdir, exist_ok=True)
    target = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isdir(target):
        parts = [
            os.path.join(target, f)
            for f in os.listdir(target)
            if not f.startswith(("_", ".")) and f.endswith(".parquet")
        ]
    else:
        parts = [target]
    for i, p in enumerate(parts):
        link = os.path.join(tdir, f"seed_{i:04d}.parquet")
        if not os.path.lexists(link):
            os.symlink(p, link)
    return sf


def _append_delta(
    spark: SparkSession, base: str, sf_dir: str, table: str, n: int
) -> None:
    """Write DELTA_ROWS rows (re-read raw from the fixture, preserving the
    file's own column physical types so mixed seed+delta scans unify) as
    one new file in the mutable source dir."""
    tmp = os.path.join(base, "_delta_tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    (
        spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
        .limit(DELTA_ROWS)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    dst = os.path.join(base, "sf", f"{table}.parquet", f"delta_{n:04d}.parquet")
    shutil.move(part, dst)
    shutil.rmtree(tmp, ignore_errors=True)


def _drain(
    spark: SparkSession,
    stream: DataFrame,
    ckpt: str,
    mode: str,
    name: str,
    drain_no: int,
) -> DataFrame:
    def _materialize(df: DataFrame, _bid: int) -> None:
        df.write.format("noop").mode("overwrite").save()

    with stream_shuffle_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(_materialize)
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    progress = list(q.recentProgress)
    rows = sum(int(p["numInputRows"]) for p in progress)
    return spark.createDataFrame(
        [(name, drain_no, len(progress), rows)],
        "query string, drain int, batches int, input_rows long",
    )


def steady_variants() -> dict:
    """Bench callables `{name}_steady` (bench.py hooks them beside the
    `*_sketch_ship` rows; outside the registry — there is nothing for an
    oracle to check beyond the incrementality contract, which
    tests/test_streaming_steady.py pins)."""
    from .join import joined_stream
    from .stateful import sessionized_stream
    from .stateful_v2 import dedup_stream

    specs = {
        "stream_stream_join_steady": ("events", joined_stream, "append"),
        "stream_sessionize_steady": ("events", sessionized_stream, "append"),
        "stream_dedup_stateful_steady": ("documents", dedup_stream, "update"),
    }

    def make(name: str, table: str, builder, mode: str):
        state = {"primed_for": None, "n": 0}

        def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
            from ..tables import tmp_scratch_dir

            base = tmp_scratch_dir(f"steady_{name}", sf_dir)
            ckpt = os.path.join(base, "ckpt")
            if state["primed_for"] != sf_dir:
                shutil.rmtree(base, ignore_errors=True)
                sf = _seed_dir(base, sf_dir, table)
                _drain(spark, builder(spark, sf), ckpt, mode, name, 0)
                state["primed_for"], state["n"] = sf_dir, 0
            sf = os.path.join(base, "sf")
            state["n"] += 1
            _append_delta(spark, base, sf_dir, table, state["n"])
            return _drain(spark, builder(spark, sf), ckpt, mode, name, state["n"])

        return fn

    return {
        name: make(name, table, builder, mode)
        for name, (table, builder, mode) in specs.items()
    }
