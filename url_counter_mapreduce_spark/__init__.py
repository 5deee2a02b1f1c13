"""spark-graft: a PySpark-native analytics engine with the capability surface
of tabVersion/URL_counter_mapreduce (see SURVEY.md).

The reference is a ~520-LoC Go MapReduce pipeline whose single query is
"count every URL across many text files, report the top-100". This package
re-expresses that capability — and a much wider relational + LLM-data-pipeline
surface — as idiomatic Spark DataFrame plans, letting Catalyst/Tungsten own
scheduling, shuffle, spill and codegen (the ~80% of the reference's code that
Spark subsumes; SURVEY.md §3.4, §4.2).

Public API:
    from url_counter_mapreduce_spark import get_spark, load_table, QUERIES, ORACLES
"""

from .session import get_spark
from .tables import TABLES, load_table, register_views
from .registry import QUERIES, ORACLES


def clear_caches() -> None:
    """Release every persisted per-(session, corpus) artifact the package
    memoizes (MinHash signature index, verified dup-pair table, substring
    window table, CDC chunk index, IVF assignment tables). Long-lived sessions that sweep
    many corpora should call this between corpora; the caches are also
    bounded internally (FIFO, oldest unpersisted)."""
    from .operators.dedup import (
        clear_chunk_cache,
        clear_pairs_cache,
        clear_signature_cache,
        clear_wins_cache,
    )
    from .operators.similarity import clear_ivf_cache

    clear_chunk_cache()
    clear_pairs_cache()
    clear_signature_cache()
    clear_wins_cache()
    clear_ivf_cache()


__all__ = [
    "get_spark",
    "TABLES",
    "load_table",
    "register_views",
    "clear_caches",
    "QUERIES",
    "ORACLES",
]

__version__ = "0.1.0"
