"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``url_counter_mapreduce_spark`` package
(see SURVEY.md for the blueprint); this module just re-exports its
query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from url_counter_mapreduce_spark import QUERIES, ORACLES  # noqa: E402
from url_counter_mapreduce_spark.operators import core  # noqa: E402
from url_counter_mapreduce_spark.session import prep  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's raison d'être — top-100 most frequent
    tokens (reference: URLs) with deterministic tie order — on sf0.001.

    scan → split/explode → groupBy count (partial agg + exchange) →
    TakeOrderedAndProject. SURVEY.md §3.4.
    """
    prep(spark)
    return core.url_topk(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted keys → rows-only check."""
    return {name: sql for name, sql in ORACLES.items() if sql is not None}
