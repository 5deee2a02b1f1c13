"""Band-bucket census for the SimHash layouts (VERDICT r12 item 1 "done"
criterion): per layout, the distinct-key count, max bucket size, and the
band-join candidate volume Σ C(bucket, 2) — the quantity that actually
hits the shuffle. Run at two SFs to see the growth exponent.

Layouts compared on the SAME corpus:
  old32x8  — round-12 scheme: 32-bit signature, 4 bands × 8 bits
             (constant 1,024-key space; reconstructed inline here since
             the shipped code moved on)
  new64x16 — round-13 scheme: 64-bit signature, 4 bands × 16 bits
             (Manku/Jain/Das Sarma WWW 2007), as shipped in
             operators/dedup.simhash_signatures / dedup_simhash_pairs.

Usage: python tools/simhash_band_probe.py [sf_dir ...]
Prints one JSON line per (sf_dir, layout).
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import DataFrame, functions as F

sys.path.insert(0, ".")

from url_counter_mapreduce_spark import get_spark  # noqa: E402
from url_counter_mapreduce_spark.operators import dedup  # noqa: E402
from url_counter_mapreduce_spark.operators.dedup import (  # noqa: E402
    _tokens_expr,
    spread,
)
from url_counter_mapreduce_spark.tables import load_table  # noqa: E402


def _simhash32(docs: DataFrame) -> DataFrame:
    """The retired round-12 signature, reconstructed for the comparison:
    first 32 md5 bits per token, 32 bit-sums, bits 0..31."""
    tok = spread(docs).select("doc_id", F.explode(F.expr(_tokens_expr())).alias("t"))
    h = tok.select(
        "doc_id",
        F.expr("CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT)").alias("h"),
    )
    g = h.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.expr(f"shiftright(h, {j}) & 1")).alias(f"s{j}") for j in range(32)],
    )
    assemble = " + ".join(f"IF(2 * s{j} > n, shiftleft(1L, {j}), 0L)" for j in range(32))
    sigs = g.select("doc_id", F.expr(assemble).alias("simhash"))
    return (
        docs.select("doc_id")
        .join(sigs, "doc_id", "left")
        .select("doc_id", F.coalesce("simhash", F.lit(0)).alias("simhash"))
    )


def _band_census(sigs: DataFrame, n_bands: int, bits: int) -> dict:
    mask = (1 << bits) - 1
    bands = sigs.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(f"shiftright(simhash, {bits * b}) & {mask}").alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("bk.band", "bk.key")
    stats = (
        bands.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("s"))
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("s").alias("max_bucket"),
            F.sum(F.expr("s * (s - 1) / 2")).cast("long").alias("cand_pairs"),
        )
        .collect()[0]
    )
    return {
        "n_buckets": stats["n_buckets"],
        "max_bucket": stats["max_bucket"],
        "cand_pairs": stats["cand_pairs"],
        "key_space": n_bands * (mask + 1),
    }


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = get_spark("simhash-band-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in sf_dirs:
        docs = load_table(spark, sf_dir, "documents")
        n_docs = docs.count()
        for layout, sigs, bands, bits in (
            ("old32x8", _simhash32(docs), 4, 8),
            ("new64x16", dedup.simhash_signatures(docs), 4, 16),
            # what the shipped round-13 join actually shuffles: bands over
            # DISTINCT signatures (clone families collapse to one row)
            (
                "new64x16-distinct",
                dedup.simhash_signatures(docs).select("simhash").distinct()
                # _band_census only reads `simhash`
                ,
                4,
                16,
            ),
        ):
            row = _band_census(sigs, bands, bits)
            row.update({"sf_dir": sf_dir, "layout": layout, "n_docs": n_docs})
            print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
