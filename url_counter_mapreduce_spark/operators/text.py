"""Text analysis for LLM-data pipelines (SURVEY.md §2.3 X13 + north star):
token statistics, language-ID heuristic, quality scoring, regex ("BPE-ish")
token counting, and document fingerprinting.

Everything is built-in pyspark.sql.functions / higher-order expressions —
JVM-side, whole-stage-codegen'd, with exact DuckDB oracles. The reference's
only text operation is the space-split tokenizer (main.go:24-26); these
generalize it into the analysis battery a 100 TB corpus curation pass needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

_TOKS = "filter(split(text, ' '), x -> x != '')"

# tiny per-language stopword lists for the n-gram/stopword-hit heuristic.
# Deliberately minimal: the heuristic's mechanics (score → argmax with a
# deterministic preference order) are what the operator demonstrates.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "y", "que"),
    "de": ("der", "die", "das", "und", "zu"),
}


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics: counts, distinct counts, average token
    length — one projection, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(f"CAST(size({_TOKS}) AS BIGINT)").alias("n_tokens"),
        F.expr(f"CAST(size(array_distinct({_TOKS})) AS BIGINT)").alias("n_uniq_tokens"),
        F.expr(
            f"floor(CAST(aggregate({_TOKS}, 0L, (acc, t) -> acc + length(t)) AS DOUBLE)"
            f" / size({_TOKS}) * 1e6 + 0.5) / 1e6"
        ).alias("avg_token_len"),
        F.col("n_chars"),
    )


def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-hit counts per candidate language,
    argmax with deterministic preference order (en > es > de > unknown).
    A real pipeline would use char-n-gram profiles; the operator shape —
    per-doc scoring against K profiles, argmax — is identical."""
    docs = load_table(spark, sf_dir, "documents")
    scores = docs.select(
        "doc_id",
        *[
            F.expr(
                "CAST(size(array_intersect(array_distinct(%s), array(%s))) AS BIGINT)"
                % (_TOKS, ", ".join(f"'{w}'" for w in words))
            ).alias(f"score_{lang}")
            for lang, words in STOPWORDS.items()
        ],
    )
    return scores.select(
        "doc_id",
        "score_en",
        "score_es",
        "score_de",
        F.expr(
            """
            CASE WHEN score_en = 0 AND score_es = 0 AND score_de = 0 THEN 'unknown'
                 WHEN score_en >= score_es AND score_en >= score_de THEN 'en'
                 WHEN score_es >= score_de THEN 'es'
                 ELSE 'de' END
            """
        ).alias("lang_guess"),
    )


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: length, mean word length, stopword ratio,
    and a blended 0–1 score — the standard cheap pre-filter before expensive
    model-based curation."""
    docs = load_table(spark, sf_dir, "documents")
    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    return (
        docs.select(
            "doc_id",
            "n_chars",
            F.expr(f"CAST(size({_TOKS}) AS BIGINT)").alias("n_tokens"),
            F.expr(
                f"round(CAST(aggregate({_TOKS}, 0L, (acc, t) -> acc + length(t)) AS DOUBLE)"
                f" / size({_TOKS}), 6)"
            ).alias("mean_word_len"),
            F.expr(
                f"floor(CAST(size(filter({_TOKS}, t -> array_contains(array({en}), t))) AS DOUBLE)"
                f" / size({_TOKS}) * 1e6 + 0.5) / 1e6"
            ).alias("stopword_ratio"),
        )
        .withColumn(
            "quality",
            F.expr(
                """
                floor((least(1.0, n_tokens / 100.0) * 0.5
                       + least(1.0, greatest(0.0, (mean_word_len - 2.0) / 5.0)) * 0.3
                       + least(1.0, stopword_ratio * 5.0) * 0.2) * 1e6 + 0.5) / 1e6
                """
            ),
        )
    )


def token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: word-or-punctuation pieces via regex — the
    cheap proxy for tokenizer-cost estimation over a corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(r"CAST(size(regexp_extract_all(text, '\\w+|[^\\w\\s]', 0)) AS BIGINT)").alias(
            "n_pieces"
        ),
        F.expr(f"CAST(size({_TOKS}) AS BIGINT)").alias("n_words"),
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: md5 over whitespace-normalized lowercase text +
    length — the join key for cross-snapshot exact dedup at scale."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")).alias("fingerprint"),
        F.length("text").cast("long").alias("text_len"),
    )


HASH_DIMS = 16


def text_hashing_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction via the hashing trick: token occurrence counts
    folded into HASH_DIMS buckets by the md5-derived 32-bit token hash —
    the deterministic, vocabulary-free vectorizer used to featurize text at
    corpus scale (one explode + one pivot-style aggregate, no vocabulary
    broadcast, no Python). Emitted as f0..f15 columns (not an array) so the
    DuckDB oracle compares plain integer columns."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.expr("filter(split(text, ' '), x -> x != '')")).alias("t")
    )
    dim = tok.withColumn(
        "dim", F.expr("pmod(CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT), %d)" % HASH_DIMS)
    )
    counts = dim.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("dim") == d, 1).otherwise(0)).cast("long").alias(f"f{d}")
            for d in range(HASH_DIMS)
        ]
    )
    # docs whose text has no tokens would drop out of the aggregate
    return (
        docs.select("doc_id")
        .join(counts, "doc_id", "left")
        .na.fill(0, [f"f{d}" for d in range(HASH_DIMS)])
    )


def bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram language-model statistics: top-50 token bigrams by count —
    the flagship count over a derived 2-gram key (explode of a windowed
    zip, partial agg, TakeOrdered)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.withColumn("toks", F.expr(_TOKS))
    bigrams = toks.select(
        F.explode(
            F.expr(
                "CASE WHEN size(toks) < 2 THEN array() "
                "ELSE transform(sequence(0, size(toks) - 2), i -> concat_ws(' ', toks[i], toks[i+1])) END"
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("bigram").asc())
        .limit(50)
    )


def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone composition — a realistic corpus-curation pass as ONE
    Catalyst plan: quality gate (≥20 tokens and mean word length ≥2) →
    exact dedup on normalized fingerprint (keep min doc_id) → tokenize the
    survivors → top-50 tokens. Four pipeline stages, two shuffles total
    (dedup group + count group); the filters fuse into the scan projection.
    The oracle replays the identical pipeline in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "text",
        F.expr(f"CAST(size({_TOKS}) AS BIGINT)").alias("n_tokens"),
        F.expr(
            f"CAST(aggregate({_TOKS}, 0L, (acc, t) -> acc + length(t)) AS DOUBLE)"
            f" / size({_TOKS})"
        ).alias("mwl"),
        F.md5(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")).alias("fp"),
    ).filter((F.col("n_tokens") >= 20) & (F.col("mwl") >= 2.0))
    keepers = scored.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    survivors = keepers.join(scored.select("doc_id", "text"), "doc_id")
    return (
        survivors.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(50)
    )
