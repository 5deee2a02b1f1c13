"""Local replica of the driver's oracle gate (SURVEY.md §5): run each
Spark query and its DuckDB oracle SQL on the same parquet tables, then
compare row count, column names, and order-insensitive values.

Comparison is slightly *stricter* than a tolerance check where possible:
non-float columns must match exactly after canonical sorting; float columns
must match to 1e-9 relative (queries pre-round aggregates so engines agree).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from url_counter_mapreduce_spark.tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    # retry EMFILE-class flakes: transient host fd pressure (e.g. a heavy
    # sibling JVM tearing down) has been observed to fail the very first
    # parquet open with "Too many open files" and clear within a second
    last: Exception | None = None
    for _ in range(3):
        con = None
        try:
            con = duckdb.connect()
            for t in TABLES:
                con.execute(
                    f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
                )
            return con
        except duckdb.IOException as ex:  # pragma: no cover - host-dependent
            last = ex
            if con is not None:
                # close the half-initialized connection before sleeping —
                # leaking it would worsen the fd pressure being retried around
                con.close()
            import time

            time.sleep(1.0)
    raise last


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical row order: stringified row tuple
    if len(df) > 0:
        key = df.astype(str).agg("|".join, axis=1)
        df = df.iloc[key.argsort(kind="stable")].reset_index(drop=True)
    return df


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} (spark) != {len(oracle_pdf)} (duckdb)"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(oracle_pdf.columns)}"
    )
    s = _canon(spark_pdf)
    o = _canon(oracle_pdf)
    for col in s.columns:
        sv, ov = s[col], o[col]
        # dtype-class drift (e.g. DuckDB HUGEINT → float64 vs Spark int64)
        # breaks the driver's value hash even when values agree numerically
        assert pd.api.types.is_float_dtype(sv) == pd.api.types.is_float_dtype(ov), (
            f"{name}.{col}: dtype class mismatch {sv.dtype} (spark) vs {ov.dtype} (duckdb)"
        )
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            for i, (a, b) in enumerate(zip(sv.astype(float), ov.astype(float))):
                na, nb = pd.isna(a), pd.isna(b)
                assert na == nb, f"{name}.{col}[{i}]: NaN mismatch {a!r} vs {b!r}"
                if not na:
                    assert math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9), (
                        f"{name}.{col}[{i}]: {a!r} != {b!r}"
                    )
        else:
            sa, oa = sv.astype(str), ov.astype(str)
            mism = (sa != oa)
            if mism.any():
                i = int(mism.idxmax())
                raise AssertionError(f"{name}.{col}[{i}]: {sa[i]!r} != {oa[i]!r}")
