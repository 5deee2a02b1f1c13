"""Deduplication operators for LLM training-data pipelines (SURVEY.md §2.3
X11 + driver north-star extensions): exact, MinHash+LSH, SimHash, n-gram
Jaccard, and embedding-cosine near-dup.

Design for cross-engine verifiability: every hash is derived from md5 (the
one hash function Spark and DuckDB compute identically), so even the MinHash
and SimHash *signatures* get exact DuckDB oracles — not just rows-only
checks. No randomness anywhere: hash-family member j is the md5 of
``"<j>:<value>"``.

Scale posture (100 TB): all pair generation is LSH-blocked — candidate pairs
come from equi-joins on band/bucket keys (shuffle on small keys), never from
a cross join. The verify step (true Jaccard / cosine) runs only on
candidates. Skewed buckets (a band key shared by many docs) are the known
hazard; AQE skew-join handles moderate skew, and the band width is the tuning
knob (more bands → smaller buckets → fewer false candidates).

All higher-order expressions are JVM-side Catalyst expressions (transform /
aggregate / array_*) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table, spread

# number of minhash functions and band layout (4 bands x 2 rows)
MINHASH_K = 8
MINHASH_BANDS = 4


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X11 exact dedup: one representative (min doc_id) per distinct text,
    with the duplicate count. Expressed as groupBy — unlike dropDuplicates,
    the representative is deterministic, so the DuckDB oracle matches."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("keeper_id"),
        F.count(F.lit(1)).alias("copies"),
    )


def _tokens_expr() -> str:
    """Distinct non-empty space-split tokens (reference tokenizer semantics,
    main.go:24-26) as a Catalyst expression."""
    return "array_distinct(filter(split(text, ' '), x -> x != ''))"


def _shingles(df: DataFrame) -> DataFrame:
    """Distinct 3-token shingles per doc (word 3-grams). Docs with <3 tokens
    fall back to the whole text as one shingle.

    ``toks`` is computed BEFORE the spread() exchange on purpose: the
    shuffle materializes the token array, so the shingle transform's three
    ``toks[i]`` references read a stored column. Projected on the same side,
    CollapseProject would inline the filter+split expression into every
    reference — re-tokenizing the whole text once per shingle element
    (measured 4–5× slowdown)."""
    toks = df.select("doc_id", "lang", "source", "text").withColumn(
        "toks", F.expr("filter(split(text, ' '), x -> x != '')")
    )
    return spread(toks).withColumn(
        "shingles",
        F.expr(
            """
            CASE WHEN size(toks) < 3 THEN array(text)
                 ELSE array_distinct(transform(sequence(0, size(toks) - 3),
                          i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
            END
            """
        ),
    )


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """MinHash signature: mh_j = min over shingles of the first 16 hex chars
    of md5("<j>:<shingle>") — a lexicographic min over a 64-bit hash space,
    identical in Spark and DuckDB.

    Formulated as explode → groupBy with K min-aggregates rather than
    array_min(transform(...)): higher-order lambdas evaluate interpreted,
    while explode + min is whole-stage-codegen'd with map-side partial
    aggregation (measured ~5× faster; the shuffle carries one K-column row
    per doc per partition, negligible at any scale)."""
    exploded = _shingles(docs).select("doc_id", F.explode("shingles").alias("s"))
    return exploded.groupBy("doc_id").agg(
        *[
            F.min(F.expr(f"substring(md5(concat('{j}:', s)), 1, 16)")).alias(f"mh{j}")
            for j in range(MINHASH_K)
        ]
    )


def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature table (doc_id, mh0..mh7) — the verifiable
    intermediate of the near-dup pipeline. E[fraction of equal minhashes]
    = Jaccard(shingle sets)."""
    return minhash_signatures(load_table(spark, sf_dir, "documents"))


def _signatures_with_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, mh0..mh7, shingles) in ONE aggregation pass: the minhash
    mins and a collect_set rebuild of the shingle set share the same
    explode + groupBy, so the verify step needs no extra join against a
    recomputed shingle table (which would re-scan and re-hash everything)."""
    exploded = _shingles(docs).select("doc_id", F.explode("shingles").alias("s"))
    return exploded.groupBy("doc_id").agg(
        *[
            F.min(F.expr(f"substring(md5(concat('{j}:', s)), 1, 16)")).alias(f"mh{j}")
            for j in range(MINHASH_K)
        ],
        F.collect_set("s").alias("shingles"),
    )


def _band_keys(sigs: DataFrame, carry: list[str]) -> DataFrame:
    bands = sigs.select(
        "doc_id",
        *carry,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(F.concat_ws("|", F.col(f"mh{2*b}"), F.col(f"mh{2*b+1}"))).alias("key"),
                    )
                    for b in range(MINHASH_BANDS)
                ]
            )
        ).alias("bk"),
    )
    return bands.select("doc_id", *carry, "bk.band", "bk.key")


def minhash_candidate_pairs(docs: DataFrame) -> DataFrame:
    """LSH banding: 4 bands of 2 minhashes; docs sharing any band key are
    candidates. Returns distinct (doc_a, doc_b) with doc_a < doc_b.

    The band join is an equi-join on (band, key) — at 100 TB this is a
    shuffle on short hash keys, never a cross join.
    """
    bands = _band_keys(minhash_signatures(docs), carry=[])
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def verified_jaccard_pairs(docs: DataFrame, threshold: float) -> DataFrame:
    """Exact shingle-set Jaccard on LSH candidates only.

    Shingle arrays ride along through the band join (space for time: the
    banded shuffle carries ~4× the shingle payload, but signatures and
    shingles are computed exactly once and no verify-side re-join exists).
    Duplicate candidates from multiple band collisions are dropped on the
    pair key alone — every copy carries identical arrays."""
    bands = _band_keys(_signatures_with_shingles(docs), carry=["shingles"])
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn(
            "jaccard",
            F.expr(
                "floor(CAST(size(array_intersect(sh_a, sh_b)) AS DOUBLE)"
                " / size(array_union(sh_a, sh_b)) * 1e6 + 0.5) / 1e6"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs: MinHash-LSH candidates verified by exact
    3-gram-shingle Jaccard ≥ 0.5. (May be empty on dup-free corpora — the
    oracle agrees on emptiness; recall is exercised in tests with injected
    duplicates.)"""
    return verified_jaccard_pairs(load_table(spark, sf_dir, "documents"), 0.5)


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash_signatures(docs: DataFrame) -> DataFrame:
    """32-bit SimHash. Token hash = first 32 bits of md5 — reproducible in
    DuckDB via the same substring (registry oracle mirrors both stages).

    Formulation: explode distinct tokens → 32 conditional bit-sums in one
    codegen'd partial-aggregated groupBy → bit assembly. Per bit j the
    +1/-1 weight sum is positive iff 2·Σbit_j > n_tokens. Measured ~9×
    faster than the nested higher-order-aggregate form (interpreted lambdas)
    and shuffle-light at scale: partial aggregation reduces each doc to one
    33-column row per map partition before the exchange."""
    tok = spread(docs).select("doc_id", F.explode(F.expr(_tokens_expr())).alias("t"))
    h = tok.select("doc_id", F.expr("CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT)").alias("h"))
    g = h.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.expr(f"shiftright(h, {j}) & 1")).alias(f"s{j}") for j in range(32)],
    )
    assemble = " + ".join(f"IF(2 * s{j} > n, shiftleft(1L, {j}), 0L)" for j in range(32))
    sigs = g.select("doc_id", F.expr(assemble).alias("simhash"))
    # explode drops token-less docs; the signature of an empty token set is
    # 0 (every bit-weight sum is 0, not > 0) — restore those rows so the
    # output covers every input doc, matching the oracle.
    return (
        docs.select("doc_id")
        .join(sigs, "doc_id", "left")
        .select("doc_id", F.coalesce("simhash", F.lit(0)).alias("simhash"))
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signature table (doc_id, simhash): near-identical token sets
    differ in few bits. Fully deterministic → exact DuckDB oracle."""
    return simhash_signatures(load_table(spark, sf_dir, "documents"))


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: block on any equal byte of the signature
    (4 bands x 8 bits), verify Hamming distance ≤ 3 of the full 32 bits.
    The threshold equals the blocking guarantee (pigeonhole: ≤3 flipped bits
    can't touch all 4 bytes), so recall within the threshold is exactly 1.
    """
    sigs = simhash_signatures(load_table(spark, sf_dir, "documents"))
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("band"), F.expr(f"shiftright(simhash, {8*b}) & 255").alias("key")) for b in range(4)])
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.key")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 3)
    )


# --------------------------------------------------------------------------
# Blocked n-gram Jaccard (always-nonempty "most similar pairs" report)
# --------------------------------------------------------------------------


def dedup_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most similar doc pairs by 3-gram-shingle Jaccard, blocked by
    (lang, source) — a deterministic blocked pairwise similarity report.
    Blocking keeps the join an equi-join (no cross product); at 100 TB the
    block key would be an LSH band instead (see dedup_minhash_pairs)."""
    sh = _shingles(load_table(spark, sf_dir, "documents")).select("doc_id", "lang", "source", "shingles")
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, (F.col("a.lang") == F.col("b.lang")) & (F.col("a.source") == F.col("b.source")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr(
                "floor(CAST(size(array_intersect(a.shingles, b.shingles)) AS DOUBLE)"
                " / size(array_union(a.shingles, b.shingles)) * 1e6 + 0.5) / 1e6"
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), F.col("doc_a").asc(), F.col("doc_b").asc())
        .limit(20)
    )


# --------------------------------------------------------------------------
# Embedding-cosine near-dup
# --------------------------------------------------------------------------


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup report: the 20 most-similar vector pairs among
    LSH candidates — blocked by the 8-bit sign pattern of the first 8
    dimensions (axis-aligned hyperplane LSH — vectors with cosine→1 agree
    on almost all sign bits). Equi-join on the bucket key; exact cosine on
    candidates only. A production dedup pass would apply a threshold
    filter instead of top-K; top-K keeps the report informative on
    dup-free corpora (and the oracle comparison non-vacuous)."""
    from ..functions.vector import cosine_expr, finite_norm_pred, sign_bucket_expr

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.expr(finite_norm_pred("embedding")))
        .withColumn("bucket", F.expr(sign_bucket_expr("embedding", 8)))
    )
    a, b = emb.alias("a"), emb.alias("b")
    return (
        a.join(b, F.col("a.bucket") == F.col("b.bucket"))
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(F.expr(cosine_expr("a.embedding", "b.embedding")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_a").asc(), F.col("vec_b").asc())
        .limit(20)
    )


def incremental_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot incremental dedup: which docs of the 'new' snapshot
    (doc_id % 3 = 0 — a deterministic stand-in for today's crawl) carry
    content not present in the 'previous' snapshot (the rest)? Anti-join on
    the normalized-content fingerprint — the 100 TB shape for 'only process
    documents we have never seen', where the previous side is a persisted
    fingerprint table, not a scan."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "fp", F.md5(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    )
    cur = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id", "fp")
    prev = docs.filter(F.col("doc_id") % 3 != 0).select("fp")
    return cur.join(prev, "fp", "left_anti").select("doc_id", "fp")
