"""Vector math as Catalyst expressions over array<float> columns.

Everything here is JVM-side (zip_with/aggregate → whole-stage codegen), no
Python UDFs. Floats are cast to DOUBLE *before* multiplication and the fold
is left-to-right — DuckDB's list_transform/list_sum does the same, so the
oracle computes bit-comparable values (both sides additionally round).
"""

from __future__ import annotations


def dot_expr(a: str, b: str) -> str:
    """Double-accumulated dot product of two array<float> columns."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"0.0D, (acc, v) -> acc + v)"
    )


def norm_expr(a: str) -> str:
    return f"sqrt({dot_expr(a, a)})"


def cosine_expr(a: str, b: str) -> str:
    return f"({dot_expr(a, b)} / ({norm_expr(a)} * {norm_expr(b)}))"


def finite_norm_pred(a: str) -> str:
    """Guard for degenerate vectors: zero-norm → division by zero (NULL in
    Spark, ±inf in DuckDB) and NaN components sort differently across
    engines — exclude both up front, identically on both sides."""
    n2 = dot_expr(a, a)
    return f"({n2} > 0.0 AND NOT isnan({n2}))"


def sign_bucket_expr(a: str, bits: int) -> str:
    """Axis-aligned hyperplane LSH bucket: integer whose bit i is the sign of
    dimension i (first `bits` dims). Vectors at small angles agree on most
    sign bits → same bucket with high probability."""
    return (
        f"aggregate(sequence(0, {bits - 1}), 0L, "
        f"(acc, i) -> acc + IF({a}[i] >= 0.0, shiftleft(1L, i), 0L))"
    )


def stable_round(x: str, n: int) -> str:
    """Cross-engine-stable rounding for PER-ROW-deterministic doubles:
    floor(x·10ⁿ + 0.5)/10ⁿ — pure IEEE ops that evaluate identically in
    Spark and DuckDB, unlike round(), whose half-way tie handling differs
    (observed: round(0.5040625, 6) → .504063 Spark, .504062 DuckDB).
    Only for values computed identically on both sides (per-row arithmetic,
    in-order list folds); group aggregates keep round() since their inputs
    already differ in the last ulp.

    NB the scale constant is written 1eN, not N-zeros-point-0: Spark parses
    `1000000.0` as DECIMAL(8,1) and bigint/decimal division yields DECIMAL
    (→ pandas object dtype, driver hash mismatch); `1e6` is DOUBLE."""
    return f"(floor(({x}) * 1e{n} + 0.5) / 1e{n})"
