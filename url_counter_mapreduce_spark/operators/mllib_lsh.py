"""MLlib-backed near-dup detection (SURVEY.md §2.3 X12's MLlib primitive):
HashingTF token vectors → MinHashLSH → approxSimilarityJoin.

This is the library path beside operators/dedup.py's expression-built
MinHash: same operator semantics, different machinery. MLlib's hash family
is seeded-random (fixed seed → deterministic within a Spark version) but
not reproducible in DuckDB → rows-only driver check; tests validate recall
against the exact-Jaccard oracle pipeline on injected duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table, spread

SEED = 42
NUM_HASH_TABLES = 4
JACCARD_DISTANCE_MAX = 0.5  # = Jaccard similarity >= 0.5, matching dedup_minhash_pairs


def mllib_minhash_pairs(docs: DataFrame, distance_threshold: float = JACCARD_DISTANCE_MAX) -> DataFrame:
    from pyspark.ml.feature import HashingTF, MinHashLSH

    # 3-gram shingles, the same dedup unit as dedup_minhash_pairs: unigram
    # token SETS over a small shared vocabulary make most doc pairs exceed
    # Jaccard 0.5 (measured 74% on the fixture corpus), so the pair output
    # — and approxSimilarityJoin's exact-distance stage — would be O(N²)
    # regardless of how good the LSH pruning is; shingling restores the
    # sparse near-dup semantics the operator exists for.
    toks = spread(docs).withColumn(
        "t", F.expr("filter(split(coalesce(text, '') , ' '), x -> x != '')")
    ).withColumn(
        "toks",
        F.expr(
            "array_distinct(CASE WHEN size(t) < 3 THEN t ELSE "
            "transform(sequence(0, size(t) - 3), i -> concat_ws(' ', t[i], t[i+1], t[i+2])) END)"
        ),
    )
    toks = toks.filter(F.size("toks") > 0)  # MinHashLSH requires ≥1 nonzero entry
    tf = HashingTF(inputCol="toks", outputCol="features", numFeatures=1 << 18)
    feats = tf.transform(toks).select("doc_id", "features")
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=NUM_HASH_TABLES, seed=SEED)
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, distance_threshold, distCol="jaccard_dist")
    return (
        joined.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(F.lit(1.0) - F.col("jaccard_dist"), 6).alias("jaccard"),
        )
    )


def dedup_mllib_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs (3-gram-shingle Jaccard ≥ 0.5) via MLlib
    MinHashLSH — the library counterpart of dedup_minhash_pairs, same
    dedup unit (3-gram shingles) so the two paths are comparable; the
    hash family is MLlib's seeded-random one, so the driver check is
    rows-only and tests compare recall on injected duplicates."""
    return mllib_minhash_pairs(load_table(spark, sf_dir, "documents"))
