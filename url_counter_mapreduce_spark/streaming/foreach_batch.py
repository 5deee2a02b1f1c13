"""foreachBatch streaming sink: the escape hatch for sinks Structured
Streaming doesn't ship natively (upserts, dedup stores, multi-table
writes). Completes the repo's streaming-sink coverage (memory sink:
event_count/url_count; stateful: stateful.py; stream-static join:
enrich.py).

The job streams the documents table and, per micro-batch, folds new
content fingerprints into a parquet dedup store — the incremental-crawl
'have we seen this content before' pattern. Under Trigger.AvailableNow
with a single input file the source yields ONE batch, so the drained
store equals the batch groupBy — giving this streaming query an EXACT
DuckDB oracle (rare for streaming; the driver's rows-only fallback is not
needed here).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import tmp_scratch_dir
from .event_count import _stream_dir_for
from . import stream_shuffle_partitions


def _store_dir(sf_dir: str) -> str:
    return tmp_scratch_dir("fbstore", sf_dir)


def stream_foreachbatch_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream documents → foreachBatch: fingerprint, keep min doc_id per
    fingerprint within the batch, append to the parquet store. Store and
    checkpoint are recreated per call so the query is idempotent."""
    store = _store_dir(sf_dir)
    chk = store + "_chk"
    for d in (store, chk):
        shutil.rmtree(d, ignore_errors=True)

    batch_schema = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).schema
    src = (
        spark.readStream.schema(batch_schema)
        .format("parquet")
        .load(_stream_dir_for(sf_dir, "documents"))
    )

    def fold_batch(batch: DataFrame, batch_id: int) -> None:
        (
            batch.withColumn(
                "fp", F.md5(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
            )
            .groupBy("fp")
            .agg(F.min("doc_id").alias("keeper_id"), F.count(F.lit(1)).alias("copies"))
            .write.mode("append")
            .parquet(store)
        )

    with stream_shuffle_partitions(spark):
        q = (
            src.writeStream.foreachBatch(fold_batch)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(store)
