"""Candidate vs verified-pair counters for the near-linear sf1.0 rows
(VERDICT r12 item 7): `dedup_report` (0.945× of linear) and
`dedup_video_pairs` (0.852×) track candidate volume — this census makes
that volume a MEASURED column per scale leg, so the next leg can
distinguish "true dup mass grew" (verified pairs track candidates) from
"banding degraded" (candidates outgrow verified pairs).

Per scale (sf0.1 and the 10×-bytes .scaledata/sf1.0 leg), per modality:

* minhash   — candidates = Σ C(s,2) over MinHash (band, key) buckets (the
              band-join shuffle volume behind dedup_minhash_pairs /
              dedup_groups / dedup_report's near_dup modality);
              verified = dedup_minhash_pairs rows.
* video     — candidates = Σ C(s,2) over distinct (fp_hi, fp_lo)
              keyframe-hash buckets (the equi-join behind
              dedup_video_pairs); verified = dedup_video_pairs rows.
* substring — candidates = Σ C(s,2) over positional-window hash buckets
              (dedup_report's substring modality); verified = distinct
              duplicated window hashes (the span-mining survivor count).

Usage: python tools/dedup_candidate_census.py [sf_dir ...]
Prints one JSON line per (scale, modality) plus a §11.14-style table.
"""

from __future__ import annotations

import json
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from url_counter_mapreduce_spark import QUERIES, get_spark  # noqa: E402
from url_counter_mapreduce_spark.operators import dedup  # noqa: E402
from url_counter_mapreduce_spark.operators.multimodal import (  # noqa: E402
    video_keyframe_dhash,
)
from url_counter_mapreduce_spark.tables import load_table  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_SCALES = ["/root/testdata/sf0.1", os.path.join(REPO, ".scaledata", "sf1.0")]


def _bucket_candidates(df, keys: list[str]) -> int:
    """Σ C(s,2) over the given bucket keys — the pair volume the equi-join
    on those keys emits before any verification filter."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("s"))
        .agg(F.sum(F.expr("s * (s - 1) / 2")).cast("long").alias("c"))
        .collect()[0]["c"]
        or 0
    )


def main() -> None:
    scales = sys.argv[1:] or DEFAULT_SCALES
    spark = get_spark("dedup-candidate-census")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for sf_dir in scales:
        if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
            print(f"skip {sf_dir} (missing)", file=sys.stderr)
            continue
        docs = load_table(spark, sf_dir, "documents")

        mh_bands = dedup._band_keys(dedup._signatures_with_shingles(docs), carry=[])
        rows.append(
            {
                "sf_dir": sf_dir,
                "modality": "minhash",
                "candidates": _bucket_candidates(mh_bands, ["band", "key"]),
                "verified": QUERIES["dedup_minhash_pairs"](spark, sf_dir).count(),
            }
        )

        vfp = video_keyframe_dhash(spark, sf_dir).select(
            "doc_id", "fp_hi", "fp_lo"
        ).distinct()
        rows.append(
            {
                "sf_dir": sf_dir,
                "modality": "video",
                "candidates": _bucket_candidates(vfp, ["fp_hi", "fp_lo"]),
                "verified": QUERIES["dedup_video_pairs"](spark, sf_dir).count(),
            }
        )

        wins = dedup._substring_windows_for(spark, sf_dir)
        dup_spans = (
            wins.groupBy("h")
            .agg(F.countDistinct("doc_id").alias("nd"))
            .filter(F.col("nd") >= 2)
            .count()
        )
        rows.append(
            {
                "sf_dir": sf_dir,
                "modality": "substring",
                "candidates": _bucket_candidates(wins, ["h"]),
                "verified": dup_spans,
            }
        )
        for r in rows[-3:]:
            print(json.dumps(r), flush=True)

    print("\n| scale | modality | candidates (Σ C(s,2) per join key) | verified |")
    print("| --- | --- | --- | --- |")
    for r in rows:
        tag = os.path.basename(r["sf_dir"].rstrip("/"))
        print(f"| {tag} | {r['modality']} | {r['candidates']:,} | {r['verified']:,} |")
    spark.stop()


if __name__ == "__main__":
    main()
