"""Similarity search over embedding columns (SURVEY.md §2.3 X12 + north
star): brute-force cosine top-k as the exact baseline, and a sign-bit-LSH
bucketed variant as the scale path.

Shapes are chosen for a 100 TB corpus:
  - brute force broadcasts the (small) query set against the full corpus —
    a BroadcastNestedLoopJoin where the corpus side streams through one
    projection + TakeOrdered per query; exact, O(|Q|·N), the right baseline
    when |Q| is small;
  - the LSH variant equi-joins on a bucket key, reducing the candidate set
    by ~2^bits; recall is tunable via the number of sign bits (and, in a
    multi-probe extension, by also probing neighboring buckets).

All vector math is JVM-side Catalyst expressions (functions/vector.py) —
an Arrow-batched pandas_udf alternative is benchmarked in tests but the
expression form wins by staying inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from ..functions.vector import cosine_expr, finite_norm_pred, sign_bucket_expr
from ..tables import load_table, spread

N_QUERIES = 8  # vec_id < 8 are the query vectors
TOP_K = 5


def _scored_pairs(emb: DataFrame, queries: DataFrame) -> DataFrame:
    return (
        broadcast(queries.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")))
        .join(spread(emb).select(F.col("vec_id").alias("vid"), F.col("embedding").alias("v_emb")))
        .filter(F.col("qid") != F.col("vid"))
        .select(
            "qid",
            "vid",
            F.round(F.expr(cosine_expr("q_emb", "v_emb")), 6).alias("cosine"),
        )
    )


def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force ANN baseline: top-5 nearest neighbors by cosine for
    each of the 8 query vectors. Ranking uses the *rounded* cosine with a
    vec_id tiebreak so Spark and the DuckDB oracle rank identically."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.expr(finite_norm_pred("embedding")))
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vid").asc())
    return (
        _scored_pairs(emb, queries)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "vid", "cosine", "rank")
    )


def similarity_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path ANN: candidates restricted to the query's sign-bit LSH
    bucket (8 hyperplane bits → ~2^8 bucket reduction), then exact cosine +
    top-3 within the bucket. At 100 TB the bucket join replaces the full
    scan; recall < 1 by design (measured against brute force in tests)."""
    emb = (
        spread(load_table(spark, sf_dir, "embeddings"))
        .filter(F.expr(finite_norm_pred("embedding")))
        .withColumn("bucket", F.expr(sign_bucket_expr("embedding", 8)))
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb"), F.col("bucket").alias("q_bucket")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vid").asc())
    return (
        broadcast(queries)
        .join(
            emb.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("v_emb"), "bucket"),
            F.col("q_bucket") == F.col("bucket"),
        )
        .filter(F.col("qid") != F.col("vid"))
        .select("qid", "vid", F.round(F.expr(cosine_expr("q_emb", "v_emb")), 6).alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("qid", "vid", "cosine", "rank")
    )


def similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse quantizer = per-label mean embedding (the
    label column stands in for learned k-means centroids — deterministic
    and data-derived); each query searches only its nearest centroid's
    cell. Two broadcast joins (centroid table is tiny), corpus scanned
    once; the drop-in for learned centroids is replacing the centroid
    DataFrame. Engine-internal ranking semantics (centroid assignment
    feeds top-k) are not SQL-expressible compactly → rows-only check;
    recall vs brute force is measured in tests."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).filter(
        F.expr(finite_norm_pred("embedding"))
    )
    # per-dimension mean per label, reassembled into a centroid vector
    dims = emb.select("label", F.posexplode("embedding").alias("pos", "x"))
    centroids = (
        dims.groupBy("label", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("label")
        .agg(F.expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)").alias("centroid"))
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    # assign each query to its nearest centroid (broadcast: |labels| rows)
    q_cent = (
        queries.join(F.broadcast(centroids))
        .select(
            "qid",
            "q_emb",
            "label",
            F.expr(cosine_expr("q_emb", "centroid")).alias("c_sim"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.col("c_sim").desc(), F.col("label").asc())
            ),
        )
        .filter(F.col("rn") == 1)
        .select("qid", "q_emb", F.col("label").alias("cell"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vid").asc())
    return (
        F.broadcast(q_cent)
        .join(
            emb.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("v_emb"), "label"),
            F.col("cell") == F.col("label"),
        )
        .filter(F.col("qid") != F.col("vid"))
        .select("qid", "vid", F.round(F.expr(cosine_expr("q_emb", "v_emb")), 6).alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("qid", "vid", "cosine", "rank")
    )
