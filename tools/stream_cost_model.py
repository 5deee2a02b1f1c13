#!/usr/bin/env python
"""Fixed vs variable cost of the stateful streaming queries (VERDICT r11
item 6): stream_stream_join (6.5 s at sf0.1) and stream_dedup_stateful
(2.2 s) look expensive in the headline bench, but an AvailableNow drain
pays a scale-INDEPENDENT state-store/python-worker startup tax plus a
scale-DEPENDENT per-row cost — conflating them overstates the 100 TB
cost. This tool separates them: drain each query at sf0.01 / sf0.1 / the
sf1.0 leg (tools/gen_scale_leg.py), least-squares-fit

    t_drain = intercept + slope * n_events

and print intercept (the fixed tax, amortized to ~0 on a long-running
cluster where the query starts once) and per-1M-row slope (the cost that
actually scales). Each (query, provider) combination drains twice and
keeps the second time: the first drain absorbs one-time session costs
(python worker pool, codegen) that are neither intercept nor slope.

Also measures both state-store providers — the default HDFS-backed heap
store vs RocksDB (spark.sql.streaming.stateStore.providerClass; OSS
Spark 4 ships both) — so the provider choice in docs/SCALE.md is a
measured decision, not a default. Every drain uses a FRESH ephemeral
checkpoint (none of these queries pin checkpointLocation), which is what
makes switching providers between runs legal — a resumed checkpoint must
keep its provider.

Usage: python tools/stream_cost_model.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from url_counter_mapreduce_spark import QUERIES, get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALES = [
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1.0", os.path.join(REPO, ".scaledata", "sf1.0")),
]
PROVIDERS = {
    "hdfs": "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    "rocksdb": "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
}
DEFAULT = ["stream_stream_join", "stream_dedup_stateful", "stream_sessionize"]


def _fit(xs: list[float], ys: list[float]) -> tuple[float, float]:
    """Ordinary least squares y = a + b*x over the (3) scale points."""
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    b = sxy / sxx if sxx else 0.0
    return my - b * mx, b


def main() -> None:
    queries = sys.argv[1:] or DEFAULT
    leg = SCALES[-1][1]
    if not os.path.exists(os.path.join(leg, "events.parquet")):
        print(f"{leg} missing — run tools/gen_scale_leg.py first", file=sys.stderr)
        sys.exit(1)
    spark = get_spark("stream-cost-model")
    spark.sparkContext.setLogLevel("ERROR")
    n_rows = {
        tag: spark.read.parquet(os.path.join(d, "events.parquet")).count()
        for tag, d in SCALES
    }
    print(json.dumps({"n_events": n_rows}), flush=True)

    results: dict[str, dict] = {}
    for name in queries:
        results[name] = {}
        for ptag, pcls in PROVIDERS.items():
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", pcls)
            times = {}
            for tag, d in SCALES:
                QUERIES[name](spark, d)  # discard: one-time session costs
                t0 = time.perf_counter()
                QUERIES[name](spark, d).write.format("noop").mode("overwrite").save()
                times[tag] = round(time.perf_counter() - t0, 3)
            xs = [n_rows[t] for t, _ in SCALES]
            ys = [times[t] for t, _ in SCALES]
            a, b = _fit(xs, ys)
            results[name][ptag] = {
                "times": times,
                "intercept_s": round(a, 3),
                "slope_s_per_1m_rows": round(b * 1_000_000, 3),
            }
            print(json.dumps({"query": name, "provider": ptag, **results[name][ptag]}), flush=True)

    print("\n| query | provider | sf0.01 | sf0.1 | sf1.0 | intercept | s / 1M rows |")
    print("| --- | --- | --- | --- | --- | --- | --- |")
    for name, provs in results.items():
        for ptag, r in provs.items():
            t = r["times"]
            print(
                f"| {name} | {ptag} | {t['sf0.01']} s | {t['sf0.1']} s | {t['sf1.0']} s "
                f"| {r['intercept_s']} s | {r['slope_s_per_1m_rows']} s |"
            )
    spark.stop()


if __name__ == "__main__":
    main()
