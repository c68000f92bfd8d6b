"""Round-4 ML-training/experimentation additions: decision-stump
training (best single split by Gini gain) and per-segment uplift
(heterogeneous treatment effects).

Reference anchor: EXT operators per SURVEY.md §2 (the reference's
processing hook is KafkaDirectStream.scala:43-51).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from direct_kafka_stream_spark.exprs import dsum, dsum_sql
from direct_kafka_stream_spark.io import load_table
from direct_kafka_stream_spark.registry import query

_STUMP_CUTS = 9  # interior equi-width thresholds


@query(
    "q_decision_stump",
    oracle=f"""
    WITH labeled AS (
        SELECT n_chars,
               CASE WHEN text LIKE '%the%' THEN 1 ELSE 0 END AS y
        FROM documents
    ),
    rng AS (SELECT MIN(n_chars) AS lo, MAX(n_chars) AS hi FROM labeled),
    cuts AS (
        SELECT lo + k * (hi - lo) / {_STUMP_CUTS + 1}.0 AS t
        FROM rng, UNNEST(generate_series(1, {_STUMP_CUTS})) AS g(k)
    ),
    split_stats AS (
        SELECT c.t,
               CAST(COUNT(*) FILTER (WHERE n_chars <= c.t) AS BIGINT) AS nl,
               CAST(SUM(y) FILTER (WHERE n_chars <= c.t) AS BIGINT) AS pl,
               CAST(COUNT(*) FILTER (WHERE n_chars > c.t) AS BIGINT) AS nr,
               CAST(SUM(y) FILTER (WHERE n_chars > c.t) AS BIGINT) AS pr,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS p
        FROM cuts c CROSS JOIN labeled
        GROUP BY c.t
    ),
    scored AS (
        SELECT t, nl, nr, n,
               round(1.0 - (CAST(p AS DOUBLE) / n) * (CAST(p AS DOUBLE) / n)
                     - (1.0 - CAST(p AS DOUBLE) / n)
                       * (1.0 - CAST(p AS DOUBLE) / n), 6) AS parent_gini,
               round((nl * (1.0 - (CAST(pl AS DOUBLE) / nl) * (CAST(pl AS DOUBLE) / nl)
                            - (1.0 - CAST(pl AS DOUBLE) / nl)
                              * (1.0 - CAST(pl AS DOUBLE) / nl))
                      + nr * (1.0 - (CAST(pr AS DOUBLE) / nr) * (CAST(pr AS DOUBLE) / nr)
                              - (1.0 - CAST(pr AS DOUBLE) / nr)
                                * (1.0 - CAST(pr AS DOUBLE) / nr)))
                     / n, 6) AS split_gini
        FROM split_stats
        WHERE nl > 0 AND nr > 0
    )
    SELECT round(t, 6) AS threshold, nl AS n_left, nr AS n_right,
           parent_gini, split_gini,
           round(parent_gini - split_gini, 6) AS gain
    FROM scored
    ORDER BY split_gini, t
    LIMIT 1
    """,
    tags=("ml", "training"),
)
def q_decision_stump(spark: SparkSession, d: str):
    """Decision-stump training: the best single split of n_chars for
    predicting the 'contains-the' label by weighted Gini impurity over
    nine candidate equi-width thresholds — the node-splitting inner
    loop of every tree/GBDT trainer, expressed as one conditional
    aggregation (CART, public).

    Scale shape: the nine-threshold candidate table broadcasts onto
    ONE corpus scan (9 conditional count/sum pairs fused into a
    single grouped aggregate — no per-threshold re-scan); the argmin
    is a 9-row TakeOrdered on the ROUNDED impurity with threshold
    tie-break (ALIGNMENT ranking rule). All impurities are ratios of
    exact integer counts."""
    docs = load_table(spark, d, "documents")
    labeled = docs.select(
        "n_chars",
        F.when(F.col("text").like("%the%"), 1).otherwise(0).alias("y"),
    )
    rng = labeled.agg(F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi"))
    ks = spark.range(1, _STUMP_CUTS + 1).select(F.col("id").alias("k"))
    cuts = ks.crossJoin(F.broadcast(rng)).select(
        (
            F.col("lo")
            + F.col("k") * (F.col("hi") - F.col("lo")) / float(_STUMP_CUTS + 1)
        ).alias("t")
    )
    left = F.col("n_chars") <= F.col("t")
    ss = (
        F.broadcast(cuts)
        .crossJoin(labeled)
        .groupBy("t")
        .agg(
            F.count(F.when(left, 1)).alias("nl"),
            F.sum(F.when(left, F.col("y")).otherwise(0)).alias("pl"),
            F.count(F.when(~left, 1)).alias("nr"),
            F.sum(F.when(~left, F.col("y")).otherwise(0)).alias("pr"),
            F.count(F.lit(1)).alias("n"),
            F.sum("y").alias("p"),
        )
        .filter((F.col("nl") > 0) & (F.col("nr") > 0))
    )

    def gini(pos, n):
        share = pos.cast("double") / n
        return 1.0 - share * share - (1.0 - share) * (1.0 - share)

    scored = ss.select(
        "t",
        F.col("nl").cast("bigint").alias("n_left"),
        F.col("nr").cast("bigint").alias("n_right"),
        F.round(gini(F.col("p"), F.col("n")), 6).alias("parent_gini"),
        F.round(
            (
                F.col("nl") * gini(F.col("pl"), F.col("nl"))
                + F.col("nr") * gini(F.col("pr"), F.col("nr"))
            )
            / F.col("n"),
            6,
        ).alias("split_gini"),
    )
    return (
        scored.orderBy("split_gini", "t")
        .limit(1)
        .select(
            F.round("t", 6).alias("threshold"),
            "n_left",
            "n_right",
            "parent_gini",
            "split_gini",
            F.round(F.col("parent_gini") - F.col("split_gini"), 6).alias(
                "gain"
            ),
        )
    )


@query(
    "q_uplift_segments",
    oracle=f"""
    WITH tagged AS (
        SELECT event_type AS segment,
               CAST(CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 2))
                    AS BIGINT) % 2 AS INT) AS arm,
               value
        FROM events
    ),
    cells AS (
        SELECT segment, arm,
               CAST(COUNT(*) AS BIGINT) AS n,
               {dsum_sql('value')} AS s,
               {dsum_sql('value * value')} AS ss
        FROM tagged GROUP BY segment, arm
    ),
    wide AS (
        SELECT segment,
               MAX(CASE WHEN arm = 0 THEN n END) AS n0,
               MAX(CASE WHEN arm = 0 THEN s END) AS s0,
               MAX(CASE WHEN arm = 0 THEN ss END) AS ss0,
               MAX(CASE WHEN arm = 1 THEN n END) AS n1,
               MAX(CASE WHEN arm = 1 THEN s END) AS s1,
               MAX(CASE WHEN arm = 1 THEN ss END) AS ss1
        FROM cells GROUP BY segment
    )
    SELECT segment, n0, n1,
           round(s1 / n1 - s0 / n0, 6) AS uplift,
           round((s1 / n1 - s0 / n0)
                 / NULLIF(sqrt((ss0 / n0 - (s0 / n0) * (s0 / n0)) / n0
                        + (ss1 / n1 - (s1 / n1) * (s1 / n1)) / n1), 0.0), 6)
               AS z_score
    FROM wide
    ORDER BY segment
    """,
    tags=("ml", "experimentation"),
)
def q_uplift_segments(spark: SparkSession, d: str):
    """Per-segment uplift (heterogeneous treatment effect): the
    md5-hashed experiment arms of q_ab_test, broken out per event
    type, each with its own Welch z — the segment-level readout that
    finds WHERE a treatment works when the global test is flat.

    One grouped aggregation produces the (segment, arm) sufficient
    statistics (count, exact-decimal sum, sum of squares); the pivot
    to wide and the Welch arithmetic run on a 2x|segments| table.
    Identical operation order on both engines; rounded 6dp."""
    e = load_table(spark, d, "events")
    arm = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 2), 16, 10)
        .cast("long")
        % 2
    ).cast("int")
    tagged = e.select(
        F.col("event_type").alias("segment"), arm.alias("arm"), "value"
    )
    cells = tagged.groupBy("segment", "arm").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value").alias("s"),
        dsum(F.col("value") * F.col("value")).alias("ss"),
    )
    wide = cells.groupBy("segment").agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("s"))).alias("s0"),
        F.max(F.when(F.col("arm") == 0, F.col("ss"))).alias("ss0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("s"))).alias("s1"),
        F.max(F.when(F.col("arm") == 1, F.col("ss"))).alias("ss1"),
    )
    m0 = F.col("s0") / F.col("n0")
    m1 = F.col("s1") / F.col("n1")
    v0 = F.col("ss0") / F.col("n0") - m0 * m0
    v1 = F.col("ss1") / F.col("n1") - m1 * m1
    return wide.select(
        "segment",
        F.col("n0").cast("bigint").alias("n0"),
        F.col("n1").cast("bigint").alias("n1"),
        F.round(m1 - m0, 6).alias("uplift"),
        # NULLIF: two zero-variance arms -> NULL z, not an ANSI abort
        F.round(
            (m1 - m0)
            / F.nullif(
                F.sqrt(v0 / F.col("n0") + v1 / F.col("n1")), F.lit(0.0)
            ),
            6,
        ).alias("z_score"),
    ).orderBy("segment")
