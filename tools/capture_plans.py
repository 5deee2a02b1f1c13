#!/usr/bin/env python
"""Capture .explain("formatted") for named registry queries into
plans/<tag>/<query>_<suffix>.txt (optimization-round deliverable: the
judge checks plan claims against these files).

Usage:
    python tools/capture_plans.py <tag> <suffix> <query> [...]
    e.g. python tools/capture_plans.py r13 before training_export dedup_prefix_filter
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, suffix, *names = sys.argv[1:]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)

    from url_counter_mapreduce_spark import QUERIES, get_spark
    from url_counter_mapreduce_spark.session import prep

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    prep(spark)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
