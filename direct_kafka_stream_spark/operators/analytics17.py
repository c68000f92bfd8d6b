"""Round-4 incremental-view-maintenance exhibit: maintain a grouped
aggregate under a CDC delta (inserts, deletes, updates) and prove the
merged result equals a full recompute.

Reference anchor: EXT operators per SURVEY.md §2 (the reference's
processing hook is KafkaDirectStream.scala:43-51); the delta-merge
algebra here is what a foreachBatch sink (streaming/pipeline.py)
applies per micro-batch to keep a materialized aggregate fresh.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from direct_kafka_stream_spark.exprs import DEC
from direct_kafka_stream_spark.io import load_table
from direct_kafka_stream_spark.registry import query

# Snapshot predicates shared with q_snapshot_diff: old drops key%97=3
# and perturbs key%13=0 prices; new drops key%89=7.
_OLD_PRED = "o_orderkey % 97 <> 3"
_NEW_PRED = "o_orderkey % 89 <> 7"
_OLD_PRICE = (
    "CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 10.0"
    " ELSE o_totalprice END"
)


@query(
    "q_ivm_delta",
    oracle=f"""
    WITH old AS (
        SELECT o_orderkey AS k, o_orderstatus AS status,
               {_OLD_PRICE} AS price
        FROM orders WHERE {_OLD_PRED}
    ),
    new AS (
        SELECT o_orderkey AS k, o_orderstatus AS status,
               o_totalprice AS price
        FROM orders WHERE {_NEW_PRED}
    ),
    view_old AS (
        SELECT status, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(price AS DECIMAL(38,10))) AS rev
        FROM old GROUP BY status
    ),
    delta AS (
        SELECT COALESCE(new.status, old.status) AS status,
               CASE WHEN old.k IS NULL THEN 1
                    WHEN new.k IS NULL THEN -1
                    ELSE 0 END AS dn,
               CAST(COALESCE(new.price, 0) AS DECIMAL(38,10))
                 - CAST(COALESCE(old.price, 0) AS DECIMAL(38,10)) AS dprice
        FROM old FULL OUTER JOIN new ON old.k = new.k
    ),
    delta_agg AS (
        SELECT status, CAST(SUM(dn) AS BIGINT) AS dn, SUM(dprice) AS drev
        FROM delta GROUP BY status
    )
    SELECT COALESCE(v.status, d.status) AS status,
           CAST(COALESCE(v.n, 0) + COALESCE(d.dn, 0) AS BIGINT) AS n,
           CAST(ROUND(COALESCE(v.rev, 0) + COALESCE(d.drev, 0), 4) AS DOUBLE)
               AS revenue
    FROM view_old v FULL OUTER JOIN delta_agg d ON d.status = v.status
    ORDER BY status
    """,
    tags=("cdc", "ivm"),
)
def q_ivm_delta(spark: SparkSession, d: str):
    """Incremental view maintenance with retractions: a per-status
    (count, revenue) view maintained from the OLD snapshot plus a CDC
    delta (insert +1/+price, delete -1/-price, update +price-change)
    — the Materialize/Flink retraction-stream algebra, and exactly
    what a foreachBatch sink applies per micro-batch to keep an
    aggregate table fresh without recomputing it.

    The ORACLE recomputes the view from scratch over the NEW snapshot
    — so a green hash here PROVES the delta-merge algebra exact, the
    same way q_partial_merge proves the partition-merge algebra.
    Exactness requires merging UNROUNDED decimal sums (round once at
    the end): round(old) + round(delta) != round(new) in general.
    Scale shape: the delta is a key-keyed full-outer join; the view
    and delta aggregates are status-sized; the merge is a tiny
    full-outer join of two bounded tables."""
    o = load_table(spark, d, "orders")
    old = o.filter(F.expr(_OLD_PRED)).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.expr(_OLD_PRICE).alias("price"),
    )
    new = o.filter(F.expr(_NEW_PRED)).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    view_old = old.groupBy("status").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("price").cast(DEC)).alias("rev"),
    )
    joined = old.alias("old").join(
        new.alias("new"), F.col("old.k") == F.col("new.k"), "full_outer"
    )
    delta = joined.select(
        F.coalesce(F.col("new.status"), F.col("old.status")).alias("status"),
        F.when(F.col("old.k").isNull(), 1)
        .when(F.col("new.k").isNull(), -1)
        .otherwise(0)
        .alias("dn"),
        (
            F.coalesce(F.col("new.price"), F.lit(0.0)).cast(DEC)
            - F.coalesce(F.col("old.price"), F.lit(0.0)).cast(DEC)
        ).alias("dprice"),
    )
    delta_agg = delta.groupBy("status").agg(
        F.sum("dn").cast("bigint").alias("dn"),
        F.sum("dprice").alias("drev"),
    )
    v, da = view_old.alias("v"), delta_agg.alias("da")
    merged = v.join(da, F.col("v.status") == F.col("da.status"), "full_outer")
    zero = F.lit(0).cast(DEC)
    return merged.select(
        F.coalesce(F.col("v.status"), F.col("da.status")).alias("status"),
        (
            F.coalesce(F.col("v.n"), F.lit(0))
            + F.coalesce(F.col("da.dn"), F.lit(0))
        )
        .cast("bigint")
        .alias("n"),
        F.round(
            F.coalesce(F.col("v.rev"), zero)
            + F.coalesce(F.col("da.drev"), zero),
            4,
        )
        .cast("double")
        .alias("revenue"),
    ).orderBy("status")
