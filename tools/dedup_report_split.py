"""Per-modality timing split for dedup_report (VERDICT r05 item 5).

dedup_report composes four registered dedup modalities into one frame;
when its bench time moves, this script says WHICH modality moved. Each
component is timed with the same noop-write protocol as bench.py, twice:
cold (fresh session caches) and warm (shared sig/pair caches populated),
because dedup_report's cost in a bench run is the warm cost.

Usage: python tools/dedup_report_split.py [sf_dir]  (default sf0.1)
Prints one JSON line: {"sf_dir": ..., "cold": {...}, "warm": {...},
"report_total": sec}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from url_counter_mapreduce_spark import get_spark  # noqa: E402
from url_counter_mapreduce_spark.operators import dedup as D  # noqa: E402
from url_counter_mapreduce_spark.operators.graph import dedup_groups  # noqa: E402
from url_counter_mapreduce_spark.tables import load_table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def _time(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def components(spark):
    docs = load_table(spark, SF_DIR, "documents")
    exact = docs.select(
        F.md5(
            F.regexp_replace(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+", " ")
        ).alias("fp")
    ).groupBy("fp").count()
    return {
        "exact_text": lambda: exact,
        "near_dup": lambda: dedup_groups(spark, SF_DIR),
        "substring": lambda: D.dedup_substring_spans(spark, SF_DIR),
        "semantic": lambda: D.dedup_semantic(spark, SF_DIR),
    }


def main():
    spark = get_spark()
    comp = components(spark)
    cold = {name: _time(fn()) for name, fn in comp.items()}
    warm = {name: _time(fn()) for name, fn in comp.items()}
    from url_counter_mapreduce_spark import QUERIES

    total = _time(QUERIES["dedup_report"](spark, SF_DIR))
    print(json.dumps({"sf_dir": SF_DIR, "cold": cold, "warm": warm, "report_total": total}))


if __name__ == "__main__":
    main()
