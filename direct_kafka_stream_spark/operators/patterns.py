"""Classic relational patterns round 3: gaps-and-islands detection,
period-over-period growth, and URL parsing (the provenance-handling
step of a web-scraped corpus pipeline).

Reference anchor: EXT operators per SURVEY.md §2 (the reference's
processing hook is KafkaDirectStream.scala:43-51).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.window import Window

from direct_kafka_stream_spark.exprs import bounded_window_key
from direct_kafka_stream_spark.io import load_table
from direct_kafka_stream_spark.registry import query


@query(
    "q_islands",
    oracle="""
    WITH keys AS (
        SELECT DISTINCT o_orderkey AS k FROM orders
    ),
    grp AS (
        SELECT k, k - ROW_NUMBER() OVER (ORDER BY k) AS island
        FROM keys
    )
    SELECT MIN(k) AS island_start,
           MAX(k) AS island_end,
           COUNT(*) AS island_len
    FROM grp GROUP BY island
    ORDER BY island_start
    """,
    tags=("pattern", "window"),
)
def q_islands(spark: SparkSession, d: str):
    """Gaps-and-islands: maximal runs of consecutive key values (the
    missing-data / sequence-integrity report — 'which id ranges are
    contiguous, where are the holes?'). The classic k − row_number()
    grouping trick: consecutive keys share a constant difference.

    Scale note: the global ROW_NUMBER is a single-partition sort over
    the DISTINCT key set — fine when keys fit one executor (ids of a
    dimension), and the distinct itself is map-side-combined. For a
    100 TB fact the same report is computed per partition-range and
    islands are stitched at the boundaries (a partitions-sized merge)
    — REGISTERED as q_islands_ranged (operators/scale_variants.py),
    oracle-checked against this exact global-window form; this
    operator is the exact-semantics anchor for that."""
    return islands_report(load_table(spark, d, "orders"))


def islands_report(orders):
    """Composable form over any orders-shaped frame — also the
    foreachBatch streaming twin's per-batch transform
    (tests/test_streaming.py)."""
    o = orders.select(
        F.col("o_orderkey").alias("k")
    ).distinct()
    w = Window.partitionBy(bounded_window_key("k")).orderBy("k")
    grp = o.select("k", (F.col("k") - F.row_number().over(w)).alias("island"))
    return (
        grp.groupBy("island")
        .agg(
            F.min("k").alias("island_start"),
            F.max("k").alias("island_end"),
            F.count(F.lit(1)).alias("island_len"),
        )
        .drop("island")
        .orderBy("island_start")
    )


@query(
    "q_mom_growth",
    oracle="""
    WITH monthly AS (
        SELECT date_trunc('month', o_orderdate) AS month,
               round(SUM(o_totalprice), 2) AS revenue,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT strftime(month, '%Y-%m') AS month,
           revenue,
           n_orders,
           round(revenue - LAG(revenue) OVER (ORDER BY month), 2) AS delta,
           round((revenue - LAG(revenue) OVER (ORDER BY month))
                 / LAG(revenue) OVER (ORDER BY month) * 100, 4) AS pct
    FROM monthly
    """,
    tags=("pattern", "window"),
)
def q_mom_growth(spark: SparkSession, d: str):
    """Month-over-month growth: aggregate to monthly revenue, then
    LAG for absolute and percent deltas — the period-over-period
    report every metrics pipeline ships.

    The expensive part (fact aggregation) is one map-side-combined
    groupBy to ~months rows; the window then runs on that tiny table
    (its single-partition sort is months-sized, irrelevant)."""
    return mom_growth_report(load_table(spark, d, "orders"))


def mom_growth_report(o):
    """Composable form over any orders-shaped frame — also the
    foreachBatch streaming twin's per-batch transform
    (tests/test_streaming.py)."""
    monthly = (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    w = Window.partitionBy(bounded_window_key("month")).orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        F.date_format("month", "yyyy-MM").alias("month"),
        "revenue",
        "n_orders",
        F.round(F.col("revenue") - prev, 2).alias("delta"),
        F.round((F.col("revenue") - prev) / prev * 100, 4).alias("pct"),
    )


@query(
    "q_url_parse",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://' || source || '.example.com/docs/' ||
                   CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
        FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^https?://([^/]+)', 1) AS host,
           regexp_extract(url, '^https?://[^/]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query_string,
           regexp_extract(url, 'lang=([^&]*)', 1) AS lang_param,
           regexp_extract(regexp_extract(url, '^https?://([^/]+)', 1),
                          '([^.]+)\\.[^.]+\\.[^.]+$', 1) AS subdomain
    FROM u
    """,
    tags=("pattern", "text"),
)
def q_url_parse(spark: SparkSession, d: str):
    """URL decomposition — host / path / query / parameter / subdomain
    extraction, the provenance step of a web-corpus pipeline (domain
    allowlists, per-site dedup keys, URL-based quality priors all key
    off these). Spark side uses the built-in parse_url Catalyst
    expression (JVM, codegen); the oracle replays it with regexes.
    URLs are synthesized deterministically from fixture columns since
    the corpus stores logical source ids."""
    docs = load_table(spark, d, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    u = docs.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query_string"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.regexp_extract(
            F.parse_url("url", F.lit("HOST")), r"([^.]+)\.[^.]+\.[^.]+$", 1
        ).alias("subdomain"),
    )
