"""Modern-SQL surface: correlated LATERAL subqueries and recursive
CTEs — both supported by Spark 4 SQL and DuckDB with compatible
semantics, so the oracle runs (nearly) the same text. Extension rows
for SURVEY.md §2.B (anchor: reference processing hook KDS:43-51).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from direct_kafka_stream_spark.exprs import dsum_sql
from direct_kafka_stream_spark.io import load_tables
from direct_kafka_stream_spark.registry import query

_LATERAL_SQL = """
    SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
"""


@query("q_lateral_topk", oracle=_LATERAL_SQL, tags=("subquery", "lateral"))
def q_lateral_topk(spark: SparkSession, d: str):
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT —
    top-2 orders per customer in join position. Catalyst rewrites the
    lateral into a ranked window over a single orders shuffle (same
    physical plan family as q_topk_group), never a per-customer query
    execution. Ties are impossible: o_orderkey is unique and last in
    the sort. Same SQL text runs on both engines."""
    load_tables(spark, d, ("customer", "orders"))
    return spark.sql(_LATERAL_SQL)


def _calendar_sql(fmt_expr: str) -> str:
    return f"""
    WITH RECURSIVE months(m) AS (
        SELECT DATE '1995-01-01'
        UNION ALL
        SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
        WHERE m < DATE '2001-07-01'
    )
    SELECT {fmt_expr} AS ym,
           CAST(COALESCE(COUNT(o.o_orderkey), 0) AS BIGINT) AS n_orders,
           COALESCE({dsum_sql('o.o_totalprice')}, 0.0) AS revenue
    FROM months
    LEFT JOIN orders o ON date_trunc('month', o.o_orderdate) = m
    GROUP BY m
"""


@query(
    "q_recursive_calendar",
    oracle=_calendar_sql("strftime(m, '%Y-%m')"),
    tags=("subquery", "recursive"),
)
def q_recursive_calendar(spark: SparkSession, d: str):
    """Recursive CTE generating a month calendar, LEFT-joined to
    per-month order revenue — the gap-filled time series (months with
    zero orders still appear) every reporting rollup needs. The
    recursion materializes 79 driver-side rows and broadcasts; the
    fact table aggregates once. COUNT over the outer join counts
    matches only; the decimal-exact revenue coalesces to 0.0 on gap
    months in both engines."""
    load_tables(spark, d, ("orders",))
    return spark.sql(_calendar_sql("date_format(m, 'yyyy-MM')"))
