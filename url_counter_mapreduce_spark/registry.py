"""Query registry: name → (Spark builder, DuckDB oracle SQL).

This is the single source of truth re-exported by ``__spark_entry__.py``.
Every operator claimed in SURVEY.md §2 appears here; SQL-expressible ones
carry a DuckDB oracle with IDENTICAL column names and aligned types
(the driver sorts columns by name and value-hashes — see the contract in
``__spark_entry__.py``). Non-SQL-expressible ops (streaming, LSH internals)
have ``None`` oracles → driver records a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import core, relational
from .session import prep

QueryFn = Callable[[SparkSession, str], DataFrame]

# name -> spark builder
QUERIES: dict[str, QueryFn] = {}
# name -> DuckDB SQL (None = rows-only check)
ORACLES: dict[str, str | None] = {}


def _register(name: str, fn: QueryFn, sql: str | None) -> None:
    def wrapped(spark: SparkSession, sf_dir: str, _fn: QueryFn = fn) -> DataFrame:
        prep(spark)
        return _fn(spark, sf_dir)

    wrapped.__name__ = name
    wrapped.__doc__ = fn.__doc__
    QUERIES[name] = wrapped
    ORACLES[name] = sql


# --------------------------------------------------------------------------
# Reference surface (SURVEY.md §2.1). The DuckDB twin of the reference's
# tokenizer (main.go:24-26: split on ' ', drop empties) is
# string_split(text,' ') + a <> '' filter — string_split keeps empties.
# --------------------------------------------------------------------------

_TOKENS_CTE = """
WITH tokens AS (
    SELECT t.token
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
    WHERE t.token <> ''
)
"""

_COUNTS_CTE = _TOKENS_CTE + """
, counts AS (
    SELECT token, COUNT(*) AS cnt FROM tokens GROUP BY token
)
"""

_register(
    "scan_text",
    core.scan_text,
    "SELECT doc_id, text FROM documents",
)

_register(
    "tokenize_explode",
    core.tokenize_explode,
    _TOKENS_CTE + "SELECT token FROM tokens",
)

_register(
    "url_count",
    core.url_count,
    _COUNTS_CTE + "SELECT token, cnt FROM counts",
)

_register(
    "sort_by_key",
    core.sort_by_key,
    _COUNTS_CTE + "SELECT token, cnt FROM counts ORDER BY token",
)

_register(
    "url_topk",
    core.url_topk,
    _COUNTS_CTE + "SELECT token, cnt FROM counts ORDER BY cnt DESC, token ASC LIMIT 100",
)

_register(
    "union_parts",
    core.union_parts,
    """
    SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
    """,
)

_register(
    "udf_surface",
    core.udf_surface,
    """
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS n_tokens
    FROM documents
    """,
)

_register(
    "sink_rows",
    core.sink_rows,
    _COUNTS_CTE + "SELECT token || ': ' || CAST(cnt AS VARCHAR) AS line FROM counts",
)

# --------------------------------------------------------------------------
# Relational extension surface (SURVEY.md §2.3 X1–X10)
# --------------------------------------------------------------------------

_register(
    "filter_shipdate",
    relational.filter_shipdate,
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_date
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_discount > 0.05
    """,
)

_register(
    "project_columns",
    relational.project_columns,
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1.0 - l_discount) AS revenue
    FROM lineitem
    """,
)

_register(
    "agg_pricing_summary",
    relational.agg_pricing_summary,
    """
    SELECT l_returnflag, l_linestatus,
           round(SUM(l_quantity), 4)                                       AS sum_qty,
           round(SUM(l_extendedprice), 4)                                  AS sum_base_price,
           round(SUM(l_extendedprice * (1 - l_discount)), 4)               AS sum_disc_price,
           round(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           round(AVG(l_quantity), 4)                                       AS avg_qty,
           round(AVG(l_extendedprice), 4)                                  AS avg_price,
           round(AVG(l_discount), 4)                                       AS avg_disc,
           COUNT(*)                                                        AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)

_register(
    "join_customer_nation",
    relational.join_customer_nation,
    """
    SELECT c_custkey, c_name, n_name AS nation, r_name AS region
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
)

_register(
    "join_semi_anti",
    relational.join_semi_anti,
    """
    SELECT c_custkey, c_name, 'has_big_order' AS kind FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)
    UNION ALL
    SELECT c_custkey, c_name, 'no_big_order' AS kind FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)
    """,
)

_register(
    "distinct_users",
    relational.distinct_users,
    "SELECT DISTINCT user_id, event_type FROM events",
)

# HLL sketch values are engine-specific → rows-only check; bounds asserted in tests.
_register("approx_distinct_users", relational.approx_distinct_users, None)

_register(
    "window_topn_per_group",
    relational.window_topn_per_group,
    """
    SELECT event_type, event_id, value, rn, prev_value FROM (
        SELECT event_type, event_id, value,
               row_number() OVER w AS rn,
               lag(value, 1) OVER w AS prev_value
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id ASC)
    ) WHERE rn <= 3
    """,
)

_register(
    "rollup_orders",
    relational.rollup_orders,
    """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders, round(SUM(o_totalprice), 4) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)

_register(
    "cube_orders",
    relational.cube_orders,
    """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders, round(AVG(o_totalprice), 4) AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)

_register(
    "set_ops",
    relational.set_ops,
    """
    WITH big_spenders AS (
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000.0
    ), positive AS (
        SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0.0
    )
    SELECT custkey, 'both' AS tag FROM (SELECT custkey FROM big_spenders INTERSECT SELECT custkey FROM positive)
    UNION ALL
    SELECT custkey, 'only_orders' AS tag FROM (SELECT custkey FROM big_spenders EXCEPT SELECT custkey FROM positive)
    """,
)

_register(
    "scalar_functions",
    relational.scalar_functions,
    """
    SELECT event_id,
           upper(event_type)                                   AS type_upper,
           substring(event_type, 1, 3)                         AS type_prefix,
           length(props)::BIGINT                               AS props_len,
           CAST(json_extract_string(props, '$.k') AS BIGINT)   AS k_val,
           abs(value)                                          AS abs_value,
           round(sqrt(abs(value)), 4)                          AS sqrt_value,
           year(ts)::BIGINT                                    AS ev_year,
           month(ts)::BIGINT                                   AS ev_month,
           day(ts)::BIGINT                                     AS ev_day,
           CASE WHEN value >= 100.0 THEN 'high' ELSE 'low' END AS value_band,
           coalesce(nullif(event_type, 'error'), 'ok')         AS non_error_type
    FROM events
    """,
)

_register(
    "window_tumbling_count",
    relational.window_tumbling_count,
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
           COUNT(*) AS n_events, round(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
