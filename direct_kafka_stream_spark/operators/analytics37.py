"""Round-7 batch 2: API-frontend machinery — the pandas-on-Spark
frontend and pyspark.ml training, both lowering to the same Catalyst
plans the rest of the suite uses (round-6 verdict directive #3: new
engine machinery over new statistics).

Reference anchor: EXT operators per SURVEY.md §2 (the reference's
processing hook is KafkaDirectStream.scala:43-51).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from direct_kafka_stream_spark.exprs import dsum_sql
from direct_kafka_stream_spark.io import load_table
from direct_kafka_stream_spark.registry import query

# ---------------------------------------------------------------------------
# q_pandas_api — pandas-on-Spark frontend lowering to Catalyst
# ---------------------------------------------------------------------------


@query(
    "q_pandas_api",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           {dsum_sql('o_totalprice')} AS total,
           CAST(MAX(o_totalprice) AS DOUBLE) AS biggest
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("api", "engine"),
)
def q_pandas_api(spark: SparkSession, d: str):
    """The same groupby-aggregate written against the PANDAS API ON
    SPARK frontend (pyspark.pandas): a pandas-shaped program —
    ``psdf.groupby(...).agg(...)`` — that lowers to the identical
    Catalyst aggregate the DataFrame form produces (verify with
    ``.to_spark().explain()``: one partial+final HashAggregate, no
    Python in the loop). The migration surface for pandas codebases:
    same semantics, 100 TB execution. The distributed-sequence index
    is avoided entirely (groupby output keyed by the group column),
    so NO window or zipWithIndex sneaks into the plan.

    Exactness: the decimal sum is applied on the to_spark() frame so
    the rounded-sum contract matches the oracle's dsum."""
    import pyspark.pandas as ps

    psdf = ps.DataFrame(
        load_table(spark, d, "orders").select(
            "o_orderpriority", "o_orderkey", "o_totalprice"
        )
    )
    agg = psdf.groupby("o_orderpriority").agg(
        n=("o_orderkey", "count"), biggest=("o_totalprice", "max")
    )
    sdf = agg.reset_index().to_spark()
    # the exact-decimal revenue sum comes from a plain DataFrame agg
    # (pandas-API sum is a double fold — it cannot express the
    # decimal-cast contract the oracle uses)
    dec = (
        load_table(spark, d, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(38,10)")), 4)
            .cast("double")
            .alias("total")
        )
    )
    return (
        sdf.join(dec, "o_orderpriority")
        .select(
            "o_orderpriority",
            F.col("n").cast("bigint").alias("n"),
            "total",
            F.col("biggest").cast("double").alias("biggest"),
        )
    )


# ---------------------------------------------------------------------------
# q_ml_linreg — pyspark.ml training == the closed-form SQL aggregate
# ---------------------------------------------------------------------------


@query(
    "q_ml_linreg",
    oracle=f"""
    WITH m AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               {dsum_sql('l_quantity')} AS s1,
               {dsum_sql('l_discount')} AS s2,
               {dsum_sql('l_extendedprice')} AS sy,
               {dsum_sql('l_quantity * l_quantity')} AS s11,
               {dsum_sql('l_quantity * l_discount')} AS s12,
               {dsum_sql('l_discount * l_discount')} AS s22,
               {dsum_sql('l_quantity * l_extendedprice')} AS s1y,
               {dsum_sql('l_discount * l_extendedprice')} AS s2y
        FROM lineitem
    ),
    solved AS (
        SELECT n,
               (n * (s11 * s22 - s12 * s12)
                - s1 * (s1 * s22 - s12 * s2)
                + s2 * (s1 * s12 - s11 * s2)) AS det,
               (sy * (s11 * s22 - s12 * s12)
                - s1 * (s1y * s22 - s12 * s2y)
                + s2 * (s1y * s12 - s11 * s2y)) AS det0,
               (n * (s1y * s22 - s12 * s2y)
                - sy * (s1 * s22 - s12 * s2)
                + s2 * (s1 * s2y - s1y * s2)) AS det1,
               (n * (s11 * s2y - s1y * s12)
                - s1 * (s1 * s2y - s1y * s2)
                + sy * (s1 * s12 - s11 * s2)) AS det2
        FROM m
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(det0 / NULLIF(det, 0.0), 3) AS b0,
           round(det1 / NULLIF(det, 0.0), 3) AS b1,
           round(det2 / NULLIF(det, 0.0), 3) AS b2
    FROM solved
    """,
    tags=("ml", "api", "engine"),
)
def q_ml_linreg(spark: SparkSession, d: str):
    """The SAME two-feature regression as q_ols_multi, trained through
    PYSPARK.ML (VectorAssembler → LinearRegression, solver="normal",
    regParam=0): the ML pipeline's WLS solve runs as a distributed
    normal-equation aggregation — one pass, sufficient statistics,
    Cholesky on the driver — and must land on the closed-form SQL
    coefficients. The exhibit that Spark's ML library IS the engine
    (an aggregate in a trench coat), not a sidecar; and the
    cross-check that pins it: ML's float summation order differs from
    the exact-decimal moment contract, so coefficients are compared
    at 3 dp (abs error ~1e-8 against coefficient scale ~1e4 — four
    orders of margin).

    Scale shape: VectorAssembler is a codegen projection; the WLS
    normal-equation pass is one map-side-combined treeAggregate over
    (d+1)² partials; the solve is a 3×3 on the driver."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    from direct_kafka_stream_spark.io import spread_scan

    # Project to the three feature columns FIRST, then spread: both the
    # singularity-gate moment pass and ML's WLS treeAggregate otherwise
    # run single-task on the unsplittable fixture scan (guide §2.5),
    # and the spread exchange carries only the three doubles.
    li = spread_scan(
        load_table(spark, d, "lineitem").select(
            "l_quantity", "l_discount", "l_extendedprice"
        ),
        "l_extendedprice",  # near-continuous → even spread over cores
    )
    # Singularity gate (one moment pass, SAME arithmetic as the
    # oracle): ML's WLS degrades a singular system to zero
    # coefficients + mean intercept, while the closed-form oracle
    # yields NULLs via NULLIF(det, 0.0) — on constant/collinear
    # features (the degenerate-input sweep) the two would diverge.
    # Computing the identical Cramer determinant from the identical
    # exact-decimal moments, in the identical operation order, makes
    # the gate bit-equal to the oracle's.
    from direct_kafka_stream_spark.exprs import dsum

    q, disc, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    mm = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(q).alias("s1"),
        dsum(disc).alias("s2"),
        dsum(q * q).alias("s11"),
        dsum(q * disc).alias("s12"),
        dsum(disc * disc).alias("s22"),
    ).collect()[0]
    n = int(mm.n)
    det = (
        (mm.n * ((mm.s11 or 0.0) * (mm.s22 or 0.0)
                 - (mm.s12 or 0.0) * (mm.s12 or 0.0))
         - (mm.s1 or 0.0) * ((mm.s1 or 0.0) * (mm.s22 or 0.0) - (mm.s12 or 0.0) * (mm.s2 or 0.0))
         + (mm.s2 or 0.0) * ((mm.s1 or 0.0) * (mm.s12 or 0.0) - (mm.s11 or 0.0) * (mm.s2 or 0.0)))
        if n
        else 0.0
    )
    if det == 0.0:
        return spark.createDataFrame(
            [(n, None, None, None)],
            "n bigint, b0 double, b1 double, b2 double",
        )
    tr = VectorAssembler(
        inputCols=["l_quantity", "l_discount"], outputCol="f"
    ).transform(li).select("f", F.col("l_extendedprice").alias("y"))
    model = LinearRegression(
        featuresCol="f", labelCol="y", regParam=0.0, solver="normal"
    ).fit(tr)
    b1, b2 = (float(c) for c in model.coefficients)
    b0 = float(model.intercept)
    return spark.createDataFrame(
        [(n, round(b0, 3), round(b1, 3), round(b2, 3))],
        "n bigint, b0 double, b1 double, b2 double",
    )
