"""Degenerate-input robustness: every document/event/embedding operator
must survive a corpus of NULL texts, empty strings, single tokens, NULL
metadata, zero vectors, and NaN components — the inputs a real 100 TB
crawl is full of and the small synthetic fixtures never contain. This is
the battery that would have caught the round-5 latent NULL crash in the
fixture writers (ADVICE r05 item 2) before an advisor did.

Crash-robustness only: results on the degenerate corpus are asserted for
basic sanity (non-negative counts, no exceptions), not oracle parity —
the oracle gate runs on the standard fixtures.
"""

from __future__ import annotations

import math
import os
import tempfile

import pytest

NULLISH_QUERIES = [
    # reference + text surface
    "url_count",
    "url_topk",
    "text_token_stats",
    "quality_score",
    "quality_gopher",
    "quality_char_entropy",
    "quality_compression_ratio",
    "lm_bigram_quality",
    "lm_trigram_backoff",
    "vocab_drift_chi2",
    "batch_padding_efficiency",
    "doc_fingerprint",
    "doc_chunks",
    "sql_udf_surface",
    "sql_scripting_surface",
    "context_pack",
    "pii_scrub",
    "lang_id_heuristic",
    "token_count_regex",
    "bigram_lift_topk",
    "skyline_docs",
    "quality_readability",
    "events_markov_transitions",
    "events_path_topk",
    "ab_test_zscore",
    "dedup_containment",
    "text_keyphrase_rake",
    "events_autocorr",
    "drift_ks_value",
    "dedup_minhash_bbit",
    "events_heatmap_dow_hour",
    "events_changepoint",
    "events_survival_km",
    "user_rfm_scores",
    "embedding_random_projection",
    "token_gini",
    "source_token_diversity",
    "sample_priority_weighted",
    "embedding_dim_stats",
    # dedup battery
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_minhash_collision",
    "dedup_simhash_pairs",
    "dedup_groups",
    "dedup_substring_spans",
    "multimodal_meta",
    "multimodal_dedup",
    "multimodal_framesample",
    "multimodal_jpeg_meta",
    # sources that materialize the corpus as files (NULL text must write)
    "source_python_datasource",
    "source_warc_scan",
    "source_jsonl_roundtrip",
    # sampling / split
    "train_test_split",
    "sample_importance",
    # embeddings: zero vectors and NaN components must be filtered, not crash
    "similarity_topk",
    "similarity_matryoshka",
    "dedup_embedding_cosine",
    "dedup_semantic",
    "dedup_semantic_trained",
    "dedup_prefix_filter",
    "decontaminate_semantic",
    "join_null_safe",
    "bootstrap_mean_ci",
    "events_cooccurrence_lift",
    "dup_quality_report",
    "events_seasonal_decompose",
    "host_kcore",
    "vocab_oov_rate",
    "funnel_latency_quantiles",
    "mix_temperature",
    "tokenizer_fertility",
    "events_burstiness",
    "host_communities_lpa",
    "multimodal_mp4_meta",
    "embedding_pca_power",
    "token_zipf_fit",
    "vocab_heaps_fit",
    "quality_repetition",
    "host_clustering_coeff",
    "sql_recursive_surface",
    "multimodal_wav_pcm",
    "lm_perplexity_gate",
    "token_entropy_rate",
    "source_overlap_matrix",
    "host_hits",
    "dedup_editdistance_pairs",
    "events_user_stickiness",
    "events_trend_forecast",
    "events_attribution",
    "dedup_rate_curve",
    "udf_iter_surface",
    "embedding_covariance",
    "embedding_quantize",
    # events with NULL value / props / event_type
    "events_anomaly_mad",
    "events_ewma",
    "host_khop",
    "quantiles_value",
    "json_struct_extract",
    "variant_events",
    # round-8 additions
    "dedup_containment_pairs",
    "dedup_cdc_chunks",
    # round-10 perceptual family (fingerprints synthesize from doc_id, so
    # the degenerate risk is the 8-doc corpus itself: partial groups,
    # group 1 ending mid-pattern, empty pair sets downstream) + privacy
    "image_dhash",
    "dedup_image_dhash_pairs",
    "image_dedup_groups",
    "audio_fingerprint",
    "dedup_audio_pairs",
    "video_keyframe_dhash",
    "dedup_video_pairs",
    "multimodal_dup_consensus",
    "privacy_k_anonymity",
    "privacy_suppress_export",
    "audio_dedup_groups",
    "video_dedup_groups",
    # round-11 additions: embeddings-based mining/eval (zero/NaN vectors
    # must filter), the gated sketch invariants on degenerate events
    # (all-NULL values, NaN), and the chi2 drift monitor's empty-bucket
    # handling; sketch flags may legitimately be NULL/False here — the
    # battery asserts crash-robustness only
    "hard_negative_mining",
    "retrieval_mrr",
    "approx_distinct_users_sketch",
    "approx_quantiles_sketch",
    "hll_rollup_sketch",
    "audience_overlap_sketch",
    "incremental_minhash_pairs",
]


@pytest.fixture(scope="module")
def nullish_dir(spark):
    d = os.path.join(tempfile.gettempdir(), "spark_graft_nullish_fixture")
    docs = [
        (0, None, "en", "src0", None),  # NULL text and n_chars
        (1, "", "en", "src0", 0),  # empty text
        (2, "one", None, "src1", 3),  # single token, NULL lang
        (3, "a b c d e f g h i j", "de", None, 19),  # NULL source
        (4, "dup dup dup dup dup dup dup dup", "en", "src1", 31),
        (5, "dup dup dup dup dup dup dup dup", "en", "src1", 31),  # exact dup
        (6, " ".join(f"t{i % 13}" for i in range(400)), "en", "src0", 1200),
        (7, "   ", "en", "src0", 3),  # whitespace only
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    import datetime

    ts = datetime.datetime(2024, 1, 1)
    events = [
        (0, ts, 1, None, None, None),  # NULL type/value/props
        (1, ts, 1, "click", 1.5, '{"k": 1}'),
        (2, ts, 2, "click", float("nan"), "{}"),  # NaN value
        (3, ts, None, "view", 2.0, "not json"),  # NULL user, junk props
        (4, ts, 3, "view", 0.0, None),
    ] + [(10 + i, ts, 5, "steady", 1.0 + i % 3, "{}") for i in range(20)]
    spark.createDataFrame(
        events,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))

    cust = [
        (0, "c0", 1, None, "BUILDING"),  # NULL balance → NULL bucket key
        (1, "c1", 1, -999.99, None),  # negative balance, NULL sensitive
        (2, "c2", None, 0.0, "MACHINERY"),  # NULL nation (NULL QI key)
        (3, "c3", 2, 1000.0, "MACHINERY"),  # exact bucket boundary
        (4, "c4", 2, 999.99, "AUTOMOBILE"),
    ]
    spark.createDataFrame(
        cust,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ).write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))

    embs = [
        (0, [0.0] * 64, "a"),  # zero vector → finite filter must drop
        (1, [float("nan")] + [0.1] * 63, "a"),  # NaN component → drop
        (2, [0.1 * ((i % 7) - 3) for i in range(64)], "b"),
        (3, [0.2 * ((i % 5) - 2) for i in range(64)], "b"),
        (4, [0.2 * ((i % 5) - 2) for i in range(64)], "a"),  # dup of 3
        (5, [1.0] + [0.0] * 63, "c"),
        (6, [0.5] + [0.0] * 63, "c"),
        (7, [-1.0] + [0.0] * 63, "c"),
        (8, [0.0, 1.0] + [0.0] * 62, "c"),
        (9, [0.3] * 64, "c"),
    ]
    spark.createDataFrame(
        embs, "vec_id long, embedding array<float>, label string"
    ).write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    return d


@pytest.mark.parametrize("name", NULLISH_QUERIES)
def test_query_survives_degenerate_corpus(spark, nullish_dir, name):
    from url_counter_mapreduce_spark import QUERIES

    rows = QUERIES[name](spark, nullish_dir).collect()
    # sanity: count-like columns are non-negative and NaN-free; row objects
    # are sound (signed columns — quantized values, simhash, z-scores — are
    # legitimately negative, so only count-named columns are range-checked)
    for r in rows:
        for k, v in r.asDict().items():
            if not (k.startswith("n_") or k.startswith("cnt") or k.endswith("_count")):
                continue
            if isinstance(v, int):
                assert v >= 0, (name, k, v)
            if isinstance(v, float):
                assert not math.isnan(v) and v >= 0, (name, k, v)
