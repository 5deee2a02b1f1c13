"""Table loading for the driver testdata (TESTDATA.md / FIXTURES.md §B).

One parquet file per table per scale factor under
``/root/testdata/sf{0.001,0.01,0.1}``. Loads are plain ``spark.read.parquet``
so Catalyst gets full predicate pushdown + column pruning on every query
(verify with ``plans.explain_str`` — scans must show PushedFilters/ReadSchema).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def file_fingerprint(path: str) -> str:
    """Content fingerprint of a source file or directory of part files
    (sorted name:size:mtime_ns triples). Folded into scratch/artifact keys
    so regenerated fixture data at the same path never resumes a stale
    checkpoint or reads a stale stored index (ADVICE r11)."""
    files = (
        sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if not f.startswith(("_", "."))
        )
        if os.path.isdir(path)
        else [path]
    )
    parts = []
    for f in files:
        st = os.stat(f)
        parts.append(f"{os.path.basename(f)}:{st.st_size}:{st.st_mtime_ns}")
    return ";".join(parts)


def scratch_base_dir() -> str:
    """Base directory for every scratch/stored artifact (VERDICT r12 item
    4). Resolution order:

    1. ``SPARK_GRAFT_SCRATCH_DIR`` environment variable;
    2. ``spark.graft.scratchDir`` on the active SparkSession, if any;
    3. the system temp dir (the historical default).

    On local[*] the default is fine; on a real cluster this MUST point at
    a shared filesystem mount (NFS/FUSE-mounted object store) — the SCC
    parquet barrier, the stored minhash index, sinks, and stream
    checkpoints all live under it, and executors re-read what the driver
    wrote. The value is a directory path as seen by every node."""
    env = os.environ.get("SPARK_GRAFT_SCRATCH_DIR")
    if env:
        return env
    try:
        from pyspark.sql import SparkSession

        active = SparkSession.getActiveSession()
        if active is not None:
            conf = active.conf.get("spark.graft.scratchDir", None)
            if conf:
                return conf
    except Exception:
        pass
    return tempfile.gettempdir()


def tmp_scratch_dir(prefix: str, key: str) -> str:
    """Deterministic per-(user, key) scratch directory under
    :func:`scratch_base_dir` — the single helper behind every
    sink/roundtrip/stream/index scratch location. The uid keeps fixed
    paths from colliding across users of a shared base; the md5 tag keys
    the directory to its logical content (e.g. the source sf_dir) so
    different inputs never share a path."""
    uid = os.getuid() if hasattr(os, "getuid") else 0
    tag = hashlib.md5(key.encode()).hexdigest()[:8]
    return os.path.join(scratch_base_dir(), f"spark_graft_{prefix}_{uid}_{tag}")


# (session → {(sf_dir, name, fingerprint) → base DataFrame}). Plan cache,
# NOT data cache: the stored object is the lazy parquet relation (plus the
# events ts normalization), so every query still scans parquet at execution
# time — what's skipped on repeat calls is spark.read.parquet's schema
# inference, which launches a ~100 ms single-task footer-read job per call
# (measured 96-185 ms at sf0.1; a 283-query gate/bench pays it 300+ times).
# Keyed weakly on the session object (a dropped session frees its slot,
# and sibling sessions never share), and on the file's content fingerprint
# (a regenerated fixture at the same path can never serve a stale schema).
_TABLE_RELATIONS = None  # set lazily: weakref.WeakKeyDictionary


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    global _TABLE_RELATIONS
    if _TABLE_RELATIONS is None:
        import weakref

        _TABLE_RELATIONS = weakref.WeakKeyDictionary()
    per_session = _TABLE_RELATIONS.setdefault(spark, {})
    key = (sf_dir, name, file_fingerprint(path) if os.path.exists(path) else None)
    cached = per_session.get(key)
    if cached is not None:
        return cached
    df = _load_table_uncached(spark, path, name)
    per_session[key] = df
    return df


def _load_table_uncached(spark: SparkSession, path: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) (FIXTURES.md). How Spark
        # surfaces that column depends on the runtime: Spark >= 4.1 reads it
        # natively as TIMESTAMP_NTZ truncated to micros (verified identical
        # to DuckDB's NANOS → TIMESTAMP(us) truncation); older runtimes — or
        # any externally-created session with the static
        # spark.sql.legacy.parquet.nanosAsLong conf — surface the raw int64
        # nanos. Branch on the OBSERVED dtype rather than on session conf so
        # every caller (driver harness included) gets the same TimestampType
        # (LTZ; session tz is pinned UTC) whatever its session settings.
        from pyspark.sql.types import LongType, TimestampNTZType

        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if isinstance(ts_type, TimestampNTZType):
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def spread(df: DataFrame) -> DataFrame:
    """Repartition a compute-dense-per-byte input to full parallelism —
    ONLY when the input is under-split.

    A small parquet file arrives as ONE input split (≤128 MB ⇒ 1 task), so
    hash/shingle/vector pipelines would run single-threaded regardless of
    core count; there a round-robin shuffle of the raw rows buys N-way
    parallelism for everything downstream. At 100 TB the scan already has
    ~820k splits and an unconditional ``repartition()`` would be a full
    extra exchange of the raw corpus — so the shuffle is gated on the
    actual split count: with >= defaultParallelism input partitions the
    DataFrame is returned untouched (no Exchange in the plan; asserted in
    tests/test_plans.py)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


# SparkSession → sf_dir whose views are currently registered; re-reading
# and re-analyzing 10 parquet footers per spark.sql query call is pure
# constant overhead once the views exist. Keyed on the SESSION OBJECT
# (weakly, so a dropped session frees its slot): temp views are
# session-scoped, and sibling sessions from spark.newSession() share an
# applicationId but NOT a view catalog, so an appId key would silently
# skip registration for them.
_VIEWS_REGISTERED: "weakref.WeakKeyDictionary" = None  # set below


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works too.
    Idempotent per (session, sf_dir); switching sf_dir re-registers."""
    global _VIEWS_REGISTERED
    if _VIEWS_REGISTERED is None:
        import weakref

        _VIEWS_REGISTERED = weakref.WeakKeyDictionary()
    if _VIEWS_REGISTERED.get(spark) == sf_dir:
        return
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    _VIEWS_REGISTERED[spark] = sf_dir


def _sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return repr(v) + "D"
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    raise TypeError(f"unsupported literal type for local_rows_df: {type(v)}")


def _split_schema(schema: str) -> list[tuple[str, str]]:
    """Split 'name type, name type' respecting parens (decimal(38,0))."""
    cols, depth, cur = [], 0, []
    for ch in schema:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            cols.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    cols.append("".join(cur))
    return [tuple(c.strip().split(None, 1)) for c in cols]


# past this row count a VALUES literal stops being "small driver state"
# and SQL-parsing cost overtakes the task savings — fall back to the
# regular distributed createDataFrame path
LOCAL_ROWS_MAX = 20_000


def local_rows_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Build a DataFrame from a SMALL driver-side row list as a
    LocalRelation (SQL ``VALUES`` literal) instead of
    ``spark.createDataFrame`` (guide §4: eliminate the Python boundary).

    Classic PySpark's ``createDataFrame(list)`` always parallelizes the
    rows into ``defaultParallelism`` pickled-RDD slices, so materializing
    a few hundred integers costs a 32-task job whose every task is a
    Python-worker round trip (measured ~240 ms/task, ~0.3 s wall per
    call on local[32]) — and a ``broadcast()`` over it runs that whole
    job before the build. A ``VALUES`` literal plans as a LocalRelation:
    zero tasks, and broadcast builds driver-side. Falls back to
    ``createDataFrame`` for empty input (VALUES needs ≥1 row) and for
    row counts past LOCAL_ROWS_MAX (the literal's parse cost grows with
    text size; bounded offset/label tables never get there).

    ``schema`` is the usual DDL string (values are cast per column, so
    int/str/bool/float/None literals land with exactly the types
    ``createDataFrame`` would have inferred against that schema), or a
    bare list of column names, in which case each column's type is
    inferred from its first non-None value the way ``createDataFrame``
    would (int→long, str→string, bool→boolean, float→double; a column
    with no non-None value falls back to the distributed path)."""
    rows = list(rows)
    if not rows or len(rows) > LOCAL_ROWS_MAX:
        return spark.createDataFrame(rows, schema)
    if isinstance(schema, (list, tuple)):
        py2sql = {bool: "boolean", int: "long", float: "double", str: "string"}
        types = []
        for i, name in enumerate(schema):
            sample = next((r[i] for r in rows if r[i] is not None), None)
            t = py2sql.get(type(sample))
            if t is None:  # all-NULL or exotic type: let createDataFrame decide
                return spark.createDataFrame(rows, list(schema))
            types.append(t)
        schema = ", ".join(f"{n} {t}" for n, t in zip(schema, types))
    cols = _split_schema(schema)
    vals = ",".join(
        "(" + ",".join(_sql_literal(v) for v in row) + ")" for row in rows
    )
    names = ",".join(f"c{i}" for i in range(len(cols)))
    proj = ", ".join(
        f"CAST(c{i} AS {typ}) AS {name}" for i, (name, typ) in enumerate(cols)
    )
    return spark.sql(f"SELECT {proj} FROM (VALUES {vals}) AS _local_rows({names})")


def scalar_join(df: DataFrame, scalar_df: DataFrame) -> DataFrame:
    """Attach a single-row statistics frame (bounds, totals, zmax …) to
    every row of ``df``. Plans as a BroadcastNestedLoopJoin with a 1-row
    build side — the exact data movement of a scalar subquery (broadcast
    one row, no shuffle), safe at any scale; the plan guard
    (tests/test_plans.py) allowlists the ops that use this helper under
    that justification. (A constant-key equi-join does NOT avoid the BNL:
    Catalyst constant-folds the condition to true.)"""
    return df.crossJoin(F.broadcast(scalar_df))
