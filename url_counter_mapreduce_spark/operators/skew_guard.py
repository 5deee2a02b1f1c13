"""Auto-engaging skew cap for the posting-join family (LSH band buckets,
chunk postings, ER blocks).

Every posting-style self-join in this package fans a key shared by P rows
out to ~P²/2 candidate pairs. The measured cap knobs (``bucket_cap``,
``posting_cap``, ``block_cap`` — docs/SCALE.md §11.5/§11.8/§11.9) bound
that fan-out, but as manual knobs someone at 100 TB must know to turn them
on. This module promotes them to a *measured trigger*: pass ``cap="auto"``
and the operator probes the actual join cost and engages the documented
cap only when the corpus needs it.

Why the trigger is COST-based, not skew-ratio-based
---------------------------------------------------
The obvious heuristic — engage when ``max posting length > K × median`` —
misfires in both directions on real corpora:

* the exact-oracle fixtures already have max/median = 184/1 at sf0.1
  (median posting length is 1 in ANY mostly-unique corpus), so a ratio
  trigger would engage at oracle scale and break exactness;
* a K-clone corpus multiplies EVERY posting by K, so max/median is
  *invariant* under exactly the pathology the cap exists for — the clone
  legs in docs/SCALE.md §11.8 would never trip a ratio trigger.

What actually separates healthy from pathological corpora is the absolute
quadratic fan-out of the join relative to its linear input:
``est_pairs = Σ_key n·(n−1)/2`` versus ``rows = Σ_key n``. Measured:

===============================  ==========  =========
corpus                            est_pairs/rows  verdict
===============================  ==========  =========
fixture sf0.01 minhash bands           0.05   healthy
fixture sf0.1 minhash bands            0.08   healthy
fixture sf0.01 chunk postings          0.92   healthy
fixture sf0.1 chunk postings           9.9    healthy
16-clone chunk postings (§11.8)     ~250      pathological
64-clone chunk postings (§11.8)    ~4000      pathological
===============================  ==========  =========

``SKEW_COST_BUDGET = 64`` sits a decade above the worst fixture and a
half-decade below the mildest clone leg. Both aggregates are exact
integer sums over deterministic counts, so the decision itself is fully
deterministic — no percentile sketches, no sampling.

Cost of the probe: one aggregation over the posting-size frame plus a
1-row collect — O(input) with map-side partial aggregation, executed once
per (session, corpus) because every call site sits inside a
SessionFrameCache build. At 100 TB that is one cheap linear pass bought
against a potential P²-row shuffle.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

# engage the cap when Σ n·(n−1)/2 exceeds this multiple of Σ n — see the
# measured table in the module docstring for where 64 sits
SKEW_COST_BUDGET = 64

# the measured engaged-cap values (the knobs' documented sweet spots):
# LSH bucket cap 64 → 72.9× candidate collapse at 95.7% recall (SCALE.md
# §11.5); chunk posting cap 8 → 110× wall collapse on the 64-clone leg
# (§11.8); ER block cap 8 → cap² per-block bound (§11.9)
AUTO_BUCKET_CAP = 64
AUTO_POSTING_CAP = 8
AUTO_BLOCK_CAP = 8

# type alias for the knob: None (off), int (manual), or "auto"
CapSpec = int | str | None


def resolve_cap(
    cap: CapSpec,
    sizes: DataFrame,
    n_col: str,
    engaged_cap: int,
    *,
    name: str,
    budget: int = SKEW_COST_BUDGET,
) -> int | None:
    """Resolve a cap knob: passthrough for ``None``/int, probe-and-decide
    for ``"auto"``.

    ``sizes`` must hold one row per join key with the key's row count in
    ``n_col``. Returns the cap to apply (``engaged_cap`` when the measured
    fan-out ``Σ n·(n−1)/2 > budget × Σ n``) or ``None``. Engagement is
    logged with the measured numbers so a production run records WHY its
    output is capped.
    """
    if cap != "auto":
        return cap  # None or a hand-set int
    row = sizes.agg(
        F.sum(F.expr(f"CAST({n_col} AS BIGINT) * ({n_col} - 1) / 2")).alias("pairs"),
        F.sum(n_col).cast("long").alias("rows"),
    ).collect()[0]
    pairs = int(row["pairs"] or 0)
    rows = int(row["rows"] or 0)
    if rows == 0 or pairs <= budget * rows:
        log.info(
            "skew guard %s: fan-out %d pairs / %d rows (budget %d×) — cap stays off",
            name, pairs, rows, budget,
        )
        return None
    log.warning(
        "skew guard %s ENGAGED: est. candidate fan-out %d pairs from %d posting "
        "rows exceeds the %dx budget — capping postings at %d rows/key "
        "(deterministic lowest-id keep; recall tradeoff measured in "
        "docs/SCALE.md)",
        name, pairs, rows, budget, engaged_cap,
    )
    return engaged_cap
