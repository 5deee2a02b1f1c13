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

    toks = spread(docs).withColumn("toks", F.expr("array_distinct(filter(split(text, ' '), x -> x != ''))"))
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
    """Near-dup pairs (token-set Jaccard ≥ 0.5) via MLlib MinHashLSH —
    the library counterpart of dedup_minhash_pairs. Note the unit differs
    deliberately: MLlib hashes the unigram token set (HashingTF input),
    while dedup_minhash_pairs shingles 3-grams; tests compare recall on
    injected duplicates, not row-for-row equality."""
    return mllib_minhash_pairs(load_table(spark, sf_dir, "documents"))
