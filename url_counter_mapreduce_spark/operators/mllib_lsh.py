"""MLlib-backed near-dup detection (SURVEY.md §2.3 X12's MLlib primitive):
shingle-set vectors → MinHashLSH → approxSimilarityJoin, evaluated as a
PARITY COMPARISON against the expression-built exact-recall path.

This is the library path beside operators/dedup.py's expression-built
MinHash: same operator semantics, different machinery. MLlib's hash family
is seeded-random (fixed seed → deterministic within a Spark version) and
not reproducible in DuckDB — so instead of emitting raw MLlib pairs
(rows-only forever), the registered query emits the ann_recall-style
comparison row against dedup_prefix_filter's pair set, whose recall at the
threshold is EXACTLY 1 by the PPJoin pigeonhole argument. That makes the
expected comparison row fully DuckDB-replayable: the oracle replays the
exact side and asserts set equality (n_missed = n_extra = 0,
precision = recall = 1). A genuine MLlib regression (band miss, semantic
drift across Spark versions) fails the gate loudly instead of hiding in a
rows-only check.

Why set equality is the deterministic expectation and not a hope:

- Features are CountVectorizer vocabulary vectors over the SAME distinct
  shingle sets the expression path uses (shared session signature index),
  so approxSimilarityJoin's post-LSH distance stage computes the EXACT
  shingle Jaccard — no HashingTF collisions (the pre-round-8 HashingTF
  variant hashed shingles into 2^18 bins, where a collision could
  perturb Jaccard near the threshold). Hence MLlib pairs ⊆ exact pairs
  ALWAYS: precision is 1 by construction.
- Misses are LSH band misses only: P(miss) = (1 − J)^numHashTables ≤
  0.5^24 ≈ 6e-8 per threshold pair. Tested pinned at three scale factors.
- approxSimilarityJoin keeps dist < threshold STRICTLY; the expression
  path keeps J ≥ t (dist ≤ t). The epsilon on JACCARD_DISTANCE_MAX covers
  the boundary: a Jaccard value strictly inside (0.5, 0.5 + 1e-9) would
  need a shingle union above 10^9 elements, far past any per-doc set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
NUM_HASH_TABLES = 24  # P(band miss at J = 0.5) = 0.5^24 ~ 6e-8 per pair
JACCARD_DISTANCE_MAX = 0.5  # = Jaccard similarity >= 0.5, matching dedup_minhash_pairs
# approxSimilarityJoin filters dist < threshold (strict); +1e-9 turns that
# into dist <= 0.5 for every realizable rational Jaccard (see module doc)
_BOUNDARY_EPS = 1e-9


def _pairs_from_shingles(sh: DataFrame, distance_threshold: float) -> DataFrame:
    """(doc_a < doc_b, jaccard) via CountVectorizer → MinHashLSH →
    approxSimilarityJoin over a (doc_id, shingles) frame. The vocabulary
    index permutation is irrelevant to the reported Jaccard (set
    membership is index-agnostic); it only perturbs WHICH minhash values
    collide, and numHashTables makes a miss vanishingly unlikely."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    clean = sh.select(
        "doc_id", F.expr("filter(shingles, x -> x IS NOT NULL)").alias("shingles")
    ).filter(F.size("shingles") > 0)  # MinHashLSH requires >= 1 nonzero entry
    cv = CountVectorizer(
        inputCol="shingles", outputCol="features", vocabSize=1 << 22, minDF=1.0
    )
    model = cv.fit(clean)
    # CountVectorizer silently TRUNCATES the vocabulary once the corpus
    # exceeds vocabSize distinct shingles; dropped shingles perturb the
    # post-LSH Jaccard and would break the precision-1 set-equality
    # contract the parity oracle asserts. A full vocabulary is the
    # binding signature (== vocabSize), so fail loudly instead of
    # letting the gate degrade silently on larger corpora.
    if len(model.vocabulary) >= (1 << 22):
        raise ValueError(
            "mllib_lsh: CountVectorizer vocabSize cap (1<<22) reached — "
            "vocabulary truncated; raise vocabSize or pre-prune shingles"
        )
    feats = model.transform(clean).select("doc_id", "features")
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=NUM_HASH_TABLES, seed=SEED
    )
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(
        feats, feats, distance_threshold + _BOUNDARY_EPS, distCol="jaccard_dist"
    )
    return (
        joined.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(F.lit(1.0) - F.col("jaccard_dist"), 6).alias("jaccard"),
        )
    )


def mllib_minhash_pairs(
    docs: DataFrame, distance_threshold: float = JACCARD_DISTANCE_MAX
) -> DataFrame:
    """Near-dup pairs over a docs frame, shingled exactly like the
    expression path (dedup._shingles: distinct word 3-grams, whole-text
    fallback under 3 tokens) so the two machineries stay comparable on
    the same dedup unit."""
    from .dedup import _shingles

    return _pairs_from_shingles(
        _shingles(docs).select("doc_id", "shingles"), distance_threshold
    )


def dedup_mllib_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib MinHashLSH parity gate: one row comparing the MLlib pair set
    (3-gram-shingle Jaccard >= 0.5 via CountVectorizer + MinHashLSH +
    approxSimilarityJoin) against dedup_prefix_filter's pair set, whose
    recall at the threshold is exactly 1 (PPJoin pigeonhole) — the
    ann_recall recipe applied to library parity. Output: n_exact,
    n_mllib, n_common, n_missed, n_extra, pair_precision, pair_recall.

    The DuckDB oracle replays the exact side and asserts set equality
    (see module docstring for why equality is the deterministic
    expectation); both shingle consumers share the per-session signature
    index, so the corpus is shingled once."""
    from ..functions.vector import stable_round
    from .dedup import _signatures_for, dedup_prefix_filter

    exact = dedup_prefix_filter(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("in_exact")
    )
    ml = _pairs_from_shingles(
        _signatures_for(spark, sf_dir).select("doc_id", "shingles"),
        JACCARD_DISTANCE_MAX,
    ).select("doc_a", "doc_b", F.lit(1).alias("in_ml"))
    both = exact.join(ml, ["doc_a", "doc_b"], "full_outer")
    return both.agg(
        F.sum(F.coalesce("in_exact", F.lit(0))).cast("long").alias("n_exact"),
        F.sum(F.coalesce("in_ml", F.lit(0))).cast("long").alias("n_mllib"),
        F.sum(F.expr("coalesce(in_exact, 0) * coalesce(in_ml, 0)"))
        .cast("long")
        .alias("n_common"),
        F.sum(F.expr("coalesce(in_exact, 0) * IF(in_ml IS NULL, 1, 0)"))
        .cast("long")
        .alias("n_missed"),
        F.sum(F.expr("coalesce(in_ml, 0) * IF(in_exact IS NULL, 1, 0)"))
        .cast("long")
        .alias("n_extra"),
    ).select(
        "n_exact",
        "n_mllib",
        "n_common",
        "n_missed",
        "n_extra",
        F.expr(
            "CASE WHEN n_mllib = 0 THEN NULL ELSE "
            + stable_round("CAST(n_common AS DOUBLE) / n_mllib", 6)
            + " END"
        ).alias("pair_precision"),
        F.expr(
            "CASE WHEN n_exact = 0 THEN NULL ELSE "
            + stable_round("CAST(n_common AS DOUBLE) / n_exact", 6)
            + " END"
        ).alias("pair_recall"),
    )
