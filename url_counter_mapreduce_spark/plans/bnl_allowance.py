"""The ONE source of truth for BroadcastNestedLoopJoin allowances —
imported by both tests/test_plans.py (the pytest scale guard) and
tools/plan_audit.py (the reviewable artifact), so the two can never
drift (the r7 audit refresh caught exactly that: four scalar_join
queries allowed in the test but red-flagged by the tool's stale copy).

Two legitimate BNL categories, allowance = COUNT of joins (not a blanket
exemption — an extra corpus-sized BNL sneaking into an allowed plan
still trips the guard):

1. Deliberate brute-force scorers: the exact similarity baseline
   broadcasts a tiny query set against the corpus — O(|Q|·N) by design,
   and the ground-truth side of every recall harness.
2. tables.scalar_join: a ONE-ROW aggregate (bounds/totals) attached to
   every row — scalar-subquery data movement; Catalyst constant-folds a
   constant-key equi-join to a BNL-with-1-row-build, shuffle-free and
   safe at any scale.

3. Per-group-key pairings: both sides are per-event-type pre-aggregates
   (≤ |event types| rows — a fixed catalog cardinality, independent of
   data volume) joined pairwise on `type_a < type_b`, which has no
   equi-key by construction. The build side is bounded by the key
   catalog, so the BNL is safe at any corpus scale.
"""

BNL_ALLOWANCE = {
    # category 1: brute-force baselines + recall harnesses embedding them
    "similarity_topk": 1,
    "ann_recall": 1,
    "ann_recall_multiprobe": 1,
    "similarity_matryoshka": 1,
    "matryoshka_recall": 2,
    # category 2: scalar_join one-row statistic broadcasts
    "host_triangles": 2,
    "funnel_conversion": 1,
    "layout_zorder": 1,
    "dedup_minhash_recall": 1,
    "user_rfm_scores": 1,
    "chi2_independence": 1,
    "host_reciprocity": 1,
    "events_survival_km": 1,
    "events_cooccurrence_lift": 1,
    "embedding_pca_power": 1,
    "host_clustering_coeff": 1,
    "token_entropy_rate": 1,
    "lm_perplexity_gate": 1,
    "orders_market_basket": 1,
    # category 3: pairwise `<` joins over per-event-type pre-aggregates
    "audience_overlap": 2,
    "audience_overlap_sketch": 1,
    # category 1 continued (round 11): hard-negative mining broadcasts the
    # anchor set against the corpus (the similarity_topk skeleton);
    # retrieval_mrr embeds the brute-force TRUTH side (its approx side is
    # the LSH equi-join)
    "hard_negative_mining": 1,
    "retrieval_mrr": 1,
    # category 3 continued: stream_drift_chi2 completes the (windows ×
    # reference-buckets) grid — both sides are tiny aggregates (days ×
    # ten buckets), bounded by calendar and bucket catalog, not data
    "stream_drift_chi2": 1,
}
