#!/usr/bin/env python
"""Measure the skew guards on a boilerplate-heavy corpus (docs/SCALE.md §4;
VERDICT r06 item 6): the LSH bucket cap (dedup_minhash_pairs bucket_cap)
and the decontamination hot-shingle cap (decontaminate df_cap) exist for
corpora where a shared template puts a large fraction of documents into
the same band bucket / 5-gram posting. The property tests prove recall
survives on a 20×-dup corpus; this probe MEASURES the candidate-count
collapse and the recall cost on a corpus built to trigger the guards:

  - base: sf0.01 documents replicated REPLICAS× (per-replica ' repN'
    suffix → true near-dup groups of REPLICAS, Jaccard ≈ 1);
  - boilerplate: every doc with doc_id % 3 == 0 is prefixed with the same
    200-token template — ~1/3 of the corpus shares ~198 3-gram shingles
    (and ~196 5-grams), the hot-bucket / hot-posting shape.

Outputs one JSON line per leg: candidates and verified pairs capped vs
uncapped, recall of true (same-base) pairs under the cap, and wall times.

Usage: python tools/skew_guard_probe.py
       SKEW_REPLICAS=16 SKEW_SRC=/root/testdata/sf0.01 python tools/skew_guard_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from url_counter_mapreduce_spark import get_spark  # noqa: E402
from url_counter_mapreduce_spark.operators.dedup import (  # noqa: E402
    _pairs_rejoin,
    _signatures_with_shingles,
    _verified_pairs_from_sigs,
)
from url_counter_mapreduce_spark.operators.pipeline import decontaminate_frame  # noqa: E402

SRC = os.environ.get("SKEW_SRC", "/root/testdata/sf0.01")
REPLICAS = int(os.environ.get("SKEW_REPLICAS", "16"))
BUCKET_CAP = int(os.environ.get("SKEW_BUCKET_CAP", "64"))
DF_CAP = int(os.environ.get("SKEW_DF_CAP", "32"))
BOILER = " ".join(f"boiler{i}" for i in range(200))


def boilerplate_corpus(spark):
    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    return (
        docs.withColumn("replica", F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))))
        .withColumn("doc_id", F.col("doc_id") * REPLICAS + F.col("replica"))
        .withColumn("text", F.concat("text", F.lit(" rep"), F.col("replica").cast("string")))
        .withColumn(
            "text",
            F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit(BOILER + " "), F.col("text")))
            .otherwise(F.col("text")),
        )
        .drop("replica")
        .repartition(32)
    )


def minhash_leg(spark, docs) -> dict:
    sigs = _signatures_with_shingles(docs).persist()
    sigs.count()
    out: dict = {"leg": "minhash_bucket_cap", "replicas": REPLICAS, "cap": BUCKET_CAP}
    for tag, cap in (("uncapped", None), ("capped", BUCKET_CAP)):
        t0 = time.perf_counter()
        cand = _pairs_rejoin(sigs, bucket_cap=cap).count()
        t_cand = time.perf_counter() - t0
        t0 = time.perf_counter()
        ver = _verified_pairs_from_sigs(sigs, 0.5, bucket_cap=cap).persist()
        n_ver = ver.count()
        t_ver = time.perf_counter() - t0
        # true pairs = same replica group (doc_id // REPLICAS equal): the
        # injected near-dups whose recall the cap must not destroy
        n_true = ver.filter(
            F.expr(f"CAST(doc_a / {REPLICAS} AS BIGINT) = CAST(doc_b / {REPLICAS} AS BIGINT)")
        ).count()
        ver.unpersist()
        out[tag] = {
            "candidates": cand,
            "verified": n_ver,
            "true_pairs": n_true,
            "cand_sec": round(t_cand, 2),
            "verify_sec": round(t_ver, 2),
        }
    out["true_pair_recall_capped"] = round(
        out["capped"]["true_pairs"] / max(out["uncapped"]["true_pairs"], 1), 4
    )
    out["candidate_collapse"] = round(
        out["uncapped"]["candidates"] / max(out["capped"]["candidates"], 1), 1
    )
    sigs.unpersist()
    return out


def decontaminate_leg(spark, docs) -> dict:
    out: dict = {"leg": "decontaminate_df_cap", "replicas": REPLICAS, "cap": DF_CAP}
    flagged = {}
    for tag, cap in (("uncapped", None), ("capped", DF_CAP)):
        t0 = time.perf_counter()
        res = decontaminate_frame(docs, df_cap=cap).persist()
        n_rows = res.count()
        wall = time.perf_counter() - t0
        n_flagged = res.filter(F.col("n_shared_shingles") > 0).count()
        flagged[tag] = n_flagged
        res.unpersist()
        out[tag] = {"rows": n_rows, "flagged_docs": n_flagged, "sec": round(wall, 2)}
    out["flagged_recall_capped"] = round(flagged["capped"] / max(flagged["uncapped"], 1), 4)
    return out


def main() -> None:
    spark = get_spark("skew-guard-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = boilerplate_corpus(spark).persist()
    n = docs.count()
    n_boiler = docs.filter(F.col("doc_id") % 3 == 0).count()
    print(json.dumps({"corpus_docs": n, "boilerplate_docs": n_boiler}))
    print(json.dumps(minhash_leg(spark, docs)))
    print(json.dumps(decontaminate_leg(spark, docs)))
    spark.stop()


if __name__ == "__main__":
    main()
