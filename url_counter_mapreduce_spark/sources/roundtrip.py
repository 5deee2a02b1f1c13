"""Interchange-format sources/sinks: JSONL and CSV round-trips.

The reference reads exactly one format (whitespace-URL text files,
src/main/common_map.go:19-22); a corpus engine must also move data through
the interchange formats crawls and labeling vendors actually deliver. Each
round-trip query WRITES the documents table in the format (Spark
distributed writer, one file per partition), READS it back with an explicit
schema, and aggregates the result — verified against a DuckDB oracle that
reads the original parquet, so any lossy escaping/quoting/encoding in
either direction breaks the value hash.

Write target is a per-(uid, sf_dir) /tmp directory, mode=overwrite, so
repeat calls are idempotent and read-only testdata is never touched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table, tmp_scratch_dir


def _rt_dir(kind: str, sf_dir: str) -> str:
    return tmp_scratch_dir("rt", f"{kind}:{sf_dir}")


def _doc_summary(back: DataFrame) -> DataFrame:
    """Aggregate sensitive to every field surviving the round-trip: counts,
    n_chars sum, recomputed text lengths, and an order-insensitive md5 XOR
    over (doc_id, text, lang, source) — one flipped byte anywhere changes
    the digest."""
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum(F.length("text")).alias("sum_text_len"),
        F.expr(
            "CAST(bit_xor(CAST(conv(substring(md5(concat_ws('|', CAST(doc_id AS STRING), text, source)), 1, 15), 16, 10) AS BIGINT)) AS BIGINT)"
        ).alias("content_sig"),
    )


def source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → JSON Lines → back → per-lang summary. JSONL is the
    de-facto crawl interchange format; Spark's json writer/reader is the
    distributed path (one task per partition both ways)."""
    docs = load_table(spark, sf_dir, "documents")
    path = _rt_dir("jsonl", sf_dir)
    docs.write.mode("overwrite").json(path)
    back = spark.read.schema(docs.schema).json(path)
    return _doc_summary(back)


def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → ORC → back → per-lang summary. ORC is the other columnar
    interchange format warehouse exports arrive in (Hive/Trino lineage);
    Spark's writer/reader is native JVM (no extra package), with the same
    predicate-pushdown/column-pruning surface as parquet."""
    docs = load_table(spark, sf_dir, "documents")
    path = _rt_dir("orc", sf_dir)
    docs.write.mode("overwrite").orc(path)
    back = spark.read.schema(docs.schema).orc(path)
    return _doc_summary(back)


def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → CSV (RFC-4180 double-quote escaping) → back → per-lang
    summary. Free text with commas/quotes is exactly what breaks naive CSV
    handling; escape='\"' on both sides makes the writer and reader agree on
    the standard convention (Spark's default escape is backslash, which
    round-trips with itself but is not what other tools emit)."""
    docs = load_table(spark, sf_dir, "documents")
    path = _rt_dir("csv", sf_dir)
    docs.write.mode("overwrite").option("header", "true").option("quote", '"').option(
        "escape", '"'
    ).csv(path)
    back = (
        spark.read.schema(docs.schema)
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", "true")
        .csv(path)
    )
    return _doc_summary(back)
