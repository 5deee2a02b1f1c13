"""Table loading for the driver testdata (TESTDATA.md / FIXTURES.md §B).

One parquet file per table per scale factor under
``/root/testdata/sf{0.001,0.01,0.1}``. Loads are plain ``spark.read.parquet``
so Catalyst gets full predicate pushdown + column pruning on every query
(verify with ``plans.explain_str`` — scans must show PushedFilters/ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) (FIXTURES.md), which Spark's
        # TimestampType (micros) cannot read natively ([PARQUET_TYPE_ILLEGAL]).
        # Read the raw int64 nanos and truncate to micros — exactly what
        # DuckDB (the oracle) does when it maps NANOS → TIMESTAMP(us).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def spread(df: DataFrame) -> DataFrame:
    """Repartition a compute-dense-per-byte input to full parallelism.

    A small parquet file arrives as ONE input split (≤128 MB ⇒ 1 task), so
    hash/shingle/vector pipelines would run single-threaded regardless of
    core count. One cheap round-robin shuffle of the raw rows buys N-way
    parallelism for everything downstream. At 100 TB the scan has plenty of
    splits, but hash-heavy stages still benefit from decoupling compute
    parallelism from the 128 MB input-split granularity."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works too."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
