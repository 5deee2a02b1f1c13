"""Streaming curation gate: the Gopher rule battery applied to a document
STREAM — the shape of an ingest-time quality filter (drop junk before it
ever lands in the corpus) as opposed to the batch report
(operators/text.quality_gopher) that audits a corpus at rest.

The metrics are the map-only array-expression formulation
(text.gopher_maponly_metrics), so the plan is a stateless per-row
projection + filter: append output mode, no watermark, no state store —
at scale this runs at source parallelism with zero shuffle, and the SAME
column definitions power the batch path (equivalence of the map-only and
aggregate formulations is tested; the driver oracle re-derives the
map-only form in DuckDB list lambdas).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.text import gopher_maponly_metrics
from .url_count import _documents_stream


def stream_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents stream → per-row Gopher metrics → keep-filter → sink.
    Returns the kept documents with their repetition metrics; exact oracle
    (deterministic stateless filter over bounded input)."""
    gated = (
        gopher_maponly_metrics(_documents_stream(spark, sf_dir))
        .filter("keep")
        .select(
            "doc_id", "n_words", "top_bigram_char_frac", "dup_trigram_char_frac"
        )
    )
    sink = "stream_quality_gate_sink"
    q = (
        gated.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)
