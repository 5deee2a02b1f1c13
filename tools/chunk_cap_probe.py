#!/usr/bin/env python
"""Measure the dedup_chunk_reuse posting-cap guard on the clone-heavy
corpus that motivates it (SCALE.md §11.8): the 16×-replicated sf0.1
documents table makes every interior chunk's posting 16 docs deep, so the
uncapped self-join fans out 16² rows per hash and the TRUE pair output
grows quadratically within clone groups. The cap keeps the posting_cap
lowest doc_ids per hash — this probe records the wall collapse and the
pair recall under the cap (the §11.5 LSH-bucket-cap scorecard, applied to
the chunk family).

Usage: [CHUNK_CAP=8] [CHUNK_FACTOR=16] python tools/chunk_cap_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from url_counter_mapreduce_spark import get_spark  # noqa: E402
from url_counter_mapreduce_spark.operators.dedup import dedup_chunk_reuse  # noqa: E402

CAP = int(os.environ.get("CHUNK_CAP", "8"))
FACTOR = int(os.environ.get("CHUNK_FACTOR", "16"))
# CHUNK_SKIP_FULL=1: measure the capped run only (at factors where the
# uncapped join is the quadratic wall itself — the probe's 64x finding —
# recall/coverage vs uncapped are not computable and are reported as n/a)
SKIP_FULL = os.environ.get("CHUNK_SKIP_FULL") == "1"
# CHUNK_CONFIRM=0: drop the shingle-containment audit leg, measuring the
# chunk-join path the posting cap actually guards
CONFIRM = os.environ.get("CHUNK_CONFIRM", "1") == "1"


def main() -> None:
    import scale_smoke  # tools/ sibling: reuses its replicated corpus builder

    spark = get_spark("chunk-cap-probe")
    spark.sparkContext.setLogLevel("ERROR")
    d = scale_smoke.replicated_dir(spark, FACTOR)

    full: set = set()
    t_full = 0.0
    if not SKIP_FULL:
        t0 = time.perf_counter()
        # posting_cap=None is now explicit: the operator default is "auto",
        # which on THIS corpus engages the cap — the very behavior the
        # auto leg below measures
        full = {
            (r.doc_src, r.doc_dst)
            for r in dedup_chunk_reuse(
                spark, d, posting_cap=None, confirm=CONFIRM
            ).collect()
        }
        t_full = time.perf_counter() - t0

    # auto leg: no hand-set knob — the skew guard's cost trigger must
    # engage on the clone corpus and reproduce the AUTO_POSTING_CAP result
    from url_counter_mapreduce_spark.operators.skew_guard import AUTO_POSTING_CAP

    t0 = time.perf_counter()
    auto = {
        (r.doc_src, r.doc_dst)
        for r in dedup_chunk_reuse(spark, d, confirm=CONFIRM).collect()
    }
    t_auto = time.perf_counter() - t0
    print(
        f"factor={FACTOR}x AUTO: {len(auto)} pairs {t_auto:.1f}s "
        f"(engaged cap {AUTO_POSTING_CAP}; trigger probe included in wall)"
    )

    t0 = time.perf_counter()
    capped = {
        (r.doc_src, r.doc_dst)
        for r in dedup_chunk_reuse(spark, d, posting_cap=CAP, confirm=CONFIRM).collect()
    }
    t_cap = time.perf_counter() - t0

    if SKIP_FULL:
        print(
            f"factor={FACTOR}x cap={CAP}: capped {len(capped)} pairs "
            f"{t_cap:.1f}s (uncapped skipped — see SCALE.md S11.8)"
        )
        if CAP == AUTO_POSTING_CAP:
            agree = "IDENTICAL" if auto == capped else "DIFFERENT"
            print(f"  auto-vs-hand-set: {agree}")
        return

    kept = len(full & capped)
    recall = kept / len(full) if full else 1.0
    extra = len(capped - full)
    # pair recall is the wrong lens on a clone corpus (the cap keeps the
    # cap-lowest members of every K-clique, so pairs drop ~(cap/K)²);
    # what dedup needs is DOC COVERAGE — does a duplicated doc retain at
    # least one pair (evidence it is a duplicate)?
    docs_full = {d for p in full for d in p}
    docs_capped = {d for p in capped for d in p}
    coverage = len(docs_full & docs_capped) / len(docs_full) if docs_full else 1.0
    print(
        f"factor={FACTOR}x cap={CAP}: uncapped {len(full)} pairs {t_full:.1f}s; "
        f"capped {len(capped)} pairs {t_cap:.1f}s "
        f"({t_full / max(t_cap, 1e-9):.1f}x wall collapse); "
        f"pair recall {recall:.3f}; doc coverage {coverage:.3f}; "
        f"spurious extras {extra}"
    )
    if CAP == AUTO_POSTING_CAP:
        agree = "IDENTICAL" if auto == capped else "DIFFERENT"
        print(f"  auto-vs-hand-set: {agree}")


if __name__ == "__main__":
    main()
