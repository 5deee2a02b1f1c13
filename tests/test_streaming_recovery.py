"""Streaming restart/recovery semantics (SURVEY.md §5; reference
src/mapreduce/test_test.go:173-227): the reference's fault-injection tests
kill workers mid-job and assert the final output is still exactly correct —
its guarantee comes from idempotent task retry. Structured Streaming's
analog is the CHECKPOINT: a restarted query must resume from the recorded
source offsets and produce each input record's effect exactly once, never
reprocessing what a previous incarnation already committed.

The test drives two incarnations of the same file-source query against the
same checkpoint: incarnation 1 sees batch A and terminates (AvailableNow —
a clean stand-in for "the driver died after committing"); batch B arrives;
incarnation 2 starts from the same checkpoint and must emit ONLY B's rows.
Output is a parquet file sink (also offset-tracked), so double-processing
would be visible as duplicate rows.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F


def _write_batch(spark, path: str, lo: int, hi: int) -> None:
    (
        spark.range(lo, hi)
        .select(F.col("id"), (F.col("id") * 10).alias("value"))
        .coalesce(1)
        .write.mode("append")
        .parquet(path)
    )


def _run_incarnation(spark, src: str, sink: str, chk: str) -> None:
    stream = (
        spark.readStream.schema("id long, value long")
        .parquet(src)
        .withColumn("doubled", F.col("value") * 2)
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_checkpoint_resume_is_exactly_once(spark):
    base = tempfile.mkdtemp(prefix="spark_graft_recovery_")
    src, sink, chk = (os.path.join(base, d) for d in ("src", "sink", "chk"))
    os.makedirs(src)
    try:
        _write_batch(spark, src, 0, 100)
        _run_incarnation(spark, src, sink, chk)
        first = spark.read.parquet(sink)
        assert first.count() == 100

        _write_batch(spark, src, 100, 150)
        _run_incarnation(spark, src, sink, chk)  # same checkpoint: resumes
        out = spark.read.parquet(sink)
        # exactly once: 150 distinct ids, no reprocessed duplicates of A
        assert out.count() == 150
        assert out.select("id").distinct().count() == 150
        assert out.agg(F.sum("doubled")).collect()[0][0] == sum(i * 20 for i in range(150))
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_fresh_checkpoint_reprocesses_everything(spark):
    """Control: withOUT the old checkpoint the same query re-reads the full
    directory — proving the exactly-once behavior above comes from the
    checkpoint, not from the file source ignoring old files. (Fresh sink
    as well: the parquet sink's own _spark_metadata transaction log is
    checkpoint-scoped, so two incarnations with different checkpoints
    must not share a sink directory — itself a recovery-semantics fact
    worth pinning.)"""
    base = tempfile.mkdtemp(prefix="spark_graft_recovery2_")
    src, sink1, sink2, chk1, chk2 = (
        os.path.join(base, d) for d in ("src", "sink1", "sink2", "chk1", "chk2")
    )
    os.makedirs(src)
    try:
        _write_batch(spark, src, 0, 40)
        _run_incarnation(spark, src, sink1, chk1)
        assert spark.read.parquet(sink1).count() == 40
        _write_batch(spark, src, 40, 60)
        _run_incarnation(spark, src, sink2, chk2)  # FRESH checkpoint + sink
        out = spark.read.parquet(sink2)
        assert out.count() == 60  # the fresh incarnation re-reads everything
        assert out.filter(F.col("id") < 40).count() == 40
    finally:
        shutil.rmtree(base, ignore_errors=True)
