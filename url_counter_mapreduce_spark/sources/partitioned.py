"""Partitioned parquet sink + partition-pruned re-read.

Hive-style directory partitioning is THE layout decision at 100 TB: a query
filtered on the partition column must read only the matching directories
(PartitionFilters in the scan), not the whole dataset. This operator writes
the documents table partitioned by lang, reads it back with a lang filter,
and aggregates — correctness via a DuckDB oracle over the original parquet,
the pruning itself asserted on the physical plan in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table, tmp_scratch_dir


def _part_dir(sf_dir: str) -> str:
    return tmp_scratch_dir("part", sf_dir)


def sink_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → parquet partitioned by lang → filtered re-read → per-source
    summary of the 'en' partition. The write is the distributed dynamic-
    partition writer (one directory per lang); the read-back filter becomes
    a PartitionFilter, so only lang=en files are opened."""
    docs = load_table(spark, sf_dir, "documents")
    path = _part_dir(sf_dir)
    docs.write.mode("overwrite").partitionBy("lang").parquet(path)
    back = spark.read.parquet(path).filter(F.col("lang") == "en")
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum(F.length("text")).alias("sum_text_len"),
    )
