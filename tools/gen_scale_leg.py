#!/usr/bin/env python
"""Generate the sf1.0-equivalent scale leg (10x bytes of sf0.1) under
.scaledata/sf1.0/ — VERDICT r07 item 5.

The driver ships sf{0.001,0.01,0.1} only and its generator formulas are
not published, so a byte-true sf1.0 cannot be reproduced. What CAN be
made real — and what the synthetic-replication curves in SCALE.md §11
deliberately do not model — is DISTRIBUTION GROWTH: a real 10x corpus
grows its vocabulary (Heaps' law), its host graph, and its user/key
spaces; replica-token replication instead freezes the key spaces and
multiplies every posting list 10x, which overstates join/agg key reuse.

Generation rules (all Spark-side, all deterministic via md5 on
(replica, key) — no RNG state, so any partitioning produces identical
bytes):

- documents: 10 replicas. Replica 0 is sf0.1 verbatim. In replica r>0, a
  token occurrence is REPLACED with a fresh replica-local type when
  md5(r ':' prev_token ':' token) lands under MUT_PPM (~25% of
  occurrences). Keying on the (replica, bigram) CONTENT — not the
  position — is what makes the growth realistic in both directions:
  shared spans between two docs in the same replica mutate identically,
  so the within-replica near-dup structure of sf0.1 is preserved (true
  pairs grow ~linearly with replicas), while across replicas a 25%
  token churn drops 3-gram-shingle Jaccard to ~(0.75^3)/(2-0.75^3) ~
  0.27 — far enough below every 0.5-family threshold that replicas do
  NOT become a quadratic wall of spurious near-dup pairs (the failure
  mode of naive replication). Vocabulary grows per replica (fresh
  types), token-count/doc-length distributions are preserved exactly,
  and URL-shaped tokens mutate into fresh hosts, growing the host graph
  the same way.
- embeddings: 10 replicas; replica r applies the deterministic
  per-dimension sign pattern md5(r:dim) (an orthogonal transform:
  within-replica pairwise cosines are preserved, cross-replica
  similarities are scrambled), so true near-dup pairs grow linearly,
  not quadratically — the real-corpus posture.
- orders/lineitem/events: 10 replicas with key offsets (orderkey,
  custkey, event_id, user_id shifted per replica) — fact key spaces
  grow 10x; value/date/price distributions are preserved exactly.
- region/nation/customer/supplier/part: copied verbatim (dimensions are
  catalog-bounded in production; a 10x fact load does not grow them).

Usage: python tools/gen_scale_leg.py [--force]
Output: /root/repo/.scaledata/sf1.0/*.parquet (gitignored; ~10x sf0.1)
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from url_counter_mapreduce_spark import get_spark  # noqa: E402
from url_counter_mapreduce_spark.tables import load_table  # noqa: E402

SRC = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, ".scaledata", "sf1.0")
REPLICAS = 10
MUT_PPM = 250_000  # ~25% of token occurrences mutate per nonzero replica

_COPY = ["region", "nation", "customer", "supplier", "part"]


def _replicate(df, n=REPLICAS):
    """Cross-join with a replica index 0..n-1 (explode of a literal array:
    no shuffle, scales the scan linearly)."""
    return df.withColumn(
        "_r", F.explode(F.expr(f"sequence(0, {n - 1})"))
    )


def _mutate_text_expr() -> str:
    """Per-occurrence deterministic mutation for replica _r > 0, keyed on
    the (replica, prev_token, token) CONTENT (see module doc for why
    content-keying preserves within-replica dup structure while breaking
    cross-replica similarity). URL-shaped tokens become fresh hosts so
    the host graph grows too. Pure expression — JVM-side, codegen'd."""
    key = (
        "concat(CAST(_r AS STRING), ':', CASE WHEN i = 0 THEN '^' ELSE ts[i - 1] END,"
        " ':', ts[i])"
    )
    sel = f"CAST(conv(substring(md5({key}), 1, 8), 16, 10) AS BIGINT) % 1000000"
    return (
        "concat_ws(' ', transform(sequence(0, size(ts) - 1),"
        f" i -> CASE WHEN _r = 0 OR {sel} >= {MUT_PPM} THEN ts[i]"
        f" WHEN ts[i] LIKE 'http%' THEN concat('https://',"
        f" substring(md5({key}), 1, 6), '.com')"
        f" ELSE concat('w', substring(md5({key}), 1, 10))"
        " END))"
    )


def _sign_flip_expr() -> str:
    """Replica-keyed per-dimension sign pattern (orthogonal transform)."""
    return (
        "transform(embedding, (v, i) -> CASE WHEN _r = 0 THEN v"
        " WHEN conv(substring(md5(concat(CAST(_r AS STRING), ':', CAST(i AS STRING))), 1, 8),"
        " 16, 10) % 2 = 0 THEN v ELSE -v END)"
    )


def main() -> None:
    force = "--force" in sys.argv
    if os.path.exists(os.path.join(OUT, "documents.parquet")) and not force:
        print(f"{OUT} exists; --force to regenerate", file=sys.stderr)
        return
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("gen-scale-leg")
    spark.sparkContext.setLogLevel("ERROR")

    for t in _COPY:
        load_table(spark, SRC, t).write.mode("overwrite").parquet(f"{OUT}/{t}.parquet")

    docs = load_table(spark, SRC, "documents")
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    out_docs = (
        _replicate(docs)
        .withColumn("ts", F.expr("filter(split(coalesce(text, ''), ' '), x -> x != '')"))
        .select(
            (F.col("_r") * F.lit(n_docs) + F.col("doc_id")).alias("doc_id"),
            F.expr(_mutate_text_expr()).alias("text"),
            "lang",
            "source",
            "_r",
        )
        .withColumn("n_chars", F.length("text").cast("long"))
        .drop("_r")
    )
    out_docs.write.mode("overwrite").parquet(f"{OUT}/documents.parquet")

    emb = load_table(spark, SRC, "embeddings")
    n_vec = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    (
        _replicate(emb)
        .select(
            (F.col("_r") * F.lit(n_vec) + F.col("vec_id")).alias("vec_id"),
            F.expr(_sign_flip_expr()).alias("embedding"),
            "label",
        )
        .write.mode("overwrite")
        .parquet(f"{OUT}/embeddings.parquet")
    )

    orders = load_table(spark, SRC, "orders")
    n_ord = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    n_cust = orders.agg(F.max("o_custkey")).collect()[0][0] + 1
    (
        _replicate(orders)
        .select(
            (F.col("_r") * F.lit(n_ord) + F.col("o_orderkey")).alias("o_orderkey"),
            (F.col("_r") * F.lit(n_cust) + F.col("o_custkey")).alias("o_custkey"),
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
        .write.mode("overwrite")
        .parquet(f"{OUT}/orders.parquet")
    )

    li = load_table(spark, SRC, "lineitem")
    (
        _replicate(li)
        .select(
            (F.col("_r") * F.lit(n_ord) + F.col("l_orderkey")).alias("l_orderkey"),
            *[c for c in li.columns if c != "l_orderkey"],
        )
        .drop("_r")
        .write.mode("overwrite")
        .parquet(f"{OUT}/lineitem.parquet")
    )

    ev = load_table(spark, SRC, "events")
    n_ev = ev.agg(F.max("event_id")).collect()[0][0] + 1
    n_user = ev.agg(F.max("user_id")).collect()[0][0] + 1
    (
        _replicate(ev)
        .select(
            (F.col("_r") * F.lit(n_ev) + F.col("event_id")).alias("event_id"),
            "ts",
            (F.col("_r") * F.lit(n_user) + F.col("user_id")).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .write.mode("overwrite")
        .parquet(f"{OUT}/events.parquet")
    )

    for t in ["documents", "embeddings", "orders", "lineitem", "events"] + _COPY:
        n = spark.read.parquet(f"{OUT}/{t}.parquet").count()
        print(f"{t}: {n} rows", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
