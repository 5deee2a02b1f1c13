"""Streaming sketch maintenance: per-type distinct-user HLL sketches kept
as STREAMING AGGREGATION STATE — the pattern behind every live "uniques
right now" dashboard at 100 TB/day: the stream folds each micro-batch
into fixed-size mergeable sketch registers (DataSketches HLL, lgK=12 —
4 KB per group regardless of user count), and any reader gets the
current estimate without touching raw events. The batch twin of this
state shape is hll_sketch_rollup's stored pre-aggregate.

Verification follows the round-9 streaming contract (complete mode +
Trigger.AvailableNow ⇒ the drained result is a pure function of the
bounded input): HLL register state is insertion-order-insensitive (max
per register), so the drained streaming sketch must estimate EXACTLY
what a batch sketch over the same rows estimates — asserted as a flag —
and the registered output is the deterministic accuracy gate (exact
distinct + within-bound flags), DuckDB-oracled like the other gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from .event_count import _events_stream


def stream_hll_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type, maintained as streaming HLL sketch
    state and gated against the exact batch answer: emits per type the
    exact distinct count plus two reproducible flags — stream_matches_batch
    (drained stream sketch estimate ≡ batch sketch estimate over the same
    rows; true by register-state order-insensitivity) and est_within_5pct
    (|est − exact| ≤ 5%·exact + 1; lgK=12 ⇒ rsd ≈ 1.3%)."""
    sk = (
        _events_stream(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
    )
    sink = "stream_hll_uniques_sink"
    q = (
        sk.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream_est = spark.table(sink).select(
        "event_type", F.hll_sketch_estimate("sk").alias("est_stream")
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias(
                "est_batch"
            ),
        )
    )
    return batch.join(stream_est, "event_type").select(
        "event_type",
        "n_users",
        (F.col("est_stream") == F.col("est_batch")).alias("stream_matches_batch"),
        (
            F.abs(F.col("est_stream") - F.col("n_users"))
            <= F.col("n_users") * 0.05 + 1
        ).alias("est_within_5pct"),
    )
