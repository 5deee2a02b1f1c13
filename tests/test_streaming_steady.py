"""Steady-state marginal-drain harness (streaming/steady.py, VERDICT r12
item 8): the timed samples must be INCREMENTAL — checkpoint resume + one
delta file — never a re-drain of the seed corpus."""

from __future__ import annotations

import os

from tests.conftest import SF_SMOKE
from url_counter_mapreduce_spark.streaming.steady import (
    DELTA_ROWS,
    steady_variants,
)


def test_steady_drains_are_incremental(spark):
    """For each variant: drain 1 (post-prime) and drain 2 read ONLY the
    injected delta — input_rows equals DELTA_ROWS (2× for the join, whose
    two sides each read the events dir), proving the persistent
    checkpoint skipped the seed files."""
    variants = steady_variants()
    sides = {"stream_stream_join_steady": 2}
    for name, fn in variants.items():
        r1 = fn(spark, SF_SMOKE).collect()[0]
        r2 = fn(spark, SF_SMOKE).collect()[0]
        want = DELTA_ROWS * sides.get(name, 1)
        assert r1["input_rows"] == want, (name, r1)
        assert r2["input_rows"] == want, (name, r2)
        assert r2["drain"] == r1["drain"] + 1
        assert r1["batches"] >= 1


def test_steady_reprime_on_sf_change(spark, tmp_path):
    """Switching the source corpus re-primes (fresh checkpoint + seed) —
    the closure must not serve one corpus's checkpoint to another."""
    import shutil

    alt = tmp_path / "sfAlt"
    alt.mkdir()
    for t in ("documents",):
        src = os.path.join(SF_SMOKE, f"{t}.parquet")
        shutil.copyfile(src, alt / f"{t}.parquet")
    fn = steady_variants()["stream_dedup_stateful_steady"]
    a = fn(spark, SF_SMOKE).collect()[0]
    b = fn(spark, str(alt)).collect()[0]
    assert a["input_rows"] == DELTA_ROWS
    assert b["input_rows"] == DELTA_ROWS  # re-primed, then one delta
    assert b["drain"] == 1  # counter reset proves the re-prime
