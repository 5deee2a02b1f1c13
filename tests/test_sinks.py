"""Sink round-trips (O10 generalized): the reference writes text lines
(master_splitmerge.go:40-49) and JSON-lines intermediates (common_map.go:
35-36); the engine's sinks are parquet/json/csv writers. Write each format,
read it back, and require exact round-trip of the flagship counts —
including a partitioned parquet layout (the 100 TB output shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from url_counter_mapreduce_spark import QUERIES


def _counts(spark, sf_dir):
    return QUERIES["url_count"](spark, sf_dir)


def _as_set(df):
    return {(r.token, int(r.cnt)) for r in df.collect()}


def test_parquet_partitioned_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "counts_parquet")
    df = _counts(spark, sf_dir).withColumn("bucket", F.substring("token", 1, 1))
    df.write.partitionBy("bucket").mode("overwrite").parquet(out)
    back = spark.read.parquet(out).select("token", "cnt")
    assert _as_set(back) == _as_set(_counts(spark, sf_dir))


def test_json_lines_roundtrip(spark, sf_dir, tmp_path):
    """JSON-lines — the reference's intermediate encoding (one JSON object
    per record, common_map.go:35-36)."""
    out = str(tmp_path / "counts_json")
    _counts(spark, sf_dir).write.mode("overwrite").json(out)
    back = spark.read.json(out).select("token", F.col("cnt").cast("long").alias("cnt"))
    assert _as_set(back) == _as_set(_counts(spark, sf_dir))


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "counts_csv")
    _counts(spark, sf_dir).write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.option("header", True).csv(out).select(
        "token", F.col("cnt").cast("long").alias("cnt")
    )
    assert _as_set(back) == _as_set(_counts(spark, sf_dir))


def test_text_sink_format(spark, sf_dir, tmp_path):
    """O10's exact output shape: '<key>: <value>' text lines."""
    out = str(tmp_path / "lines_text")
    QUERIES["sink_rows"](spark, sf_dir).write.mode("overwrite").text(out)
    lines = {r.value for r in spark.read.text(out).collect()}
    expect = {f"{t}: {c}" for t, c in _as_set(_counts(spark, sf_dir))}
    assert lines == expect


def test_compaction_collapses_files_and_preserves_content(spark, sf_dir, tmp_path):
    """Small-file compaction: 64 shards in, ~target-byte files out, zero
    content drift (row count + per-row signature set identical)."""
    from url_counter_mapreduce_spark.sources.compact import (
        _dir_bytes_and_files,
        compact_dataset,
    )
    from url_counter_mapreduce_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    src = str(tmp_path / "shattered")
    dst = str(tmp_path / "compacted")
    docs.repartition(64).write.mode("overwrite").parquet(src)
    _bytes, n_before = _dir_bytes_and_files(src)
    n_out = compact_dataset(spark, src, dst, target_bytes=4 * 1024 * 1024)
    _bytes2, n_after = _dir_bytes_and_files(dst)
    assert n_before == 64
    assert n_after == n_out < n_before
    before = {tuple(r) for r in spark.read.parquet(src).collect()}
    after = {tuple(r) for r in spark.read.parquet(dst).collect()}
    assert before == after
