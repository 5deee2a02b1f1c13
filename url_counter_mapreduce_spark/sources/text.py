"""Whitespace-URL text-file source — the reference's actual input format
(O1: whole-file read at common_map.go:19-22; files of space-separated URL
tokens like src/main/data0..7.txt, ≤128 MB each per README.md:19-20).

Spark replaces whole-file materialization with streamed line reading
(FileScan text); spark.sql.files.maxPartitionBytes defaults to the same
128 MB constant the reference adopts, so the task granularity matches the
reference's one-task-per-file design without its whole-file memory cost
(SURVEY.md §4.2 P2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_url_text(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """O1: scan text file(s) to one row per line, column ``value``.

    ``input_file_name()`` is available if per-file attribution is needed;
    the reference's mapF ignores its filename argument (main.go:17-19).
    """
    return spark.read.text(paths)


def tokenize_urls(lines: DataFrame) -> DataFrame:
    """O2 on raw text (main.go:22-33): split each line on the space
    character, drop empty tokens (strings.FieldsFunc semantics), one ``url``
    per row. The reference splits whole files; splitting per line is
    equivalent because newlines terminate tokens in its fixtures."""
    return (
        lines.select(F.explode(F.split(F.col("value"), " ")).alias("url"))
        .filter(F.col("url") != "")
    )


def url_topk_from_text(spark: SparkSession, paths: str | list[str], k: int = 100) -> DataFrame:
    """The reference's complete user-facing query (main.sh:2-3) from its
    native input format: scan → tokenize → count → top-K, returning
    (url, cnt) with deterministic tie order."""
    return (
        tokenize_urls(read_url_text(spark, paths))
        .groupBy("url")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("url").asc())
        .limit(k)
    )
