"""Round-4 streaming-operations analytics: event-time lateness
profiling for watermark sizing — how out-of-order the stream really
is, measured exactly with a block-stitched running max (no global
single-partition window).

Reference anchor: the reference's entire reason to exist is ordered
Kafka consumption (KafkaDirectStream.scala:57-109); this operator
measures the disorder a real deployment of it would face, which is
what sizes `withWatermark` in the Structured Streaming successor
(streaming/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.window import Window

from direct_kafka_stream_spark.exprs import bounded_window_key, epoch_s, epoch_s_sql
from direct_kafka_stream_spark.io import load_table
from direct_kafka_stream_spark.registry import query

_LATE_BLOCK = 1000  # arrival-order block size for the stitched runmax
_LATE_TAU = 300  # "late" threshold (seconds) for the census


@query(
    "q_lateness_watermark",
    oracle=f"""
    WITH arr AS (
        SELECT event_id, event_type, {epoch_s_sql('ts')} AS es
        FROM events
    ),
    runmax AS (
        SELECT event_id, event_type, es,
               MAX(es) OVER (ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS high_before
        FROM arr
    ),
    lat AS (
        SELECT event_type,
               GREATEST(COALESCE(high_before - es, 0), 0) AS late_s
        FROM runmax
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) FILTER (WHERE late_s > {_LATE_TAU}) AS BIGINT)
               AS n_late,
           round(quantile_cont(late_s, 0.5), 6) AS p50_late_s,
           round(quantile_cont(late_s, 0.95), 6) AS p95_late_s,
           CAST(MAX(late_s) AS BIGINT) AS max_late_s
    FROM lat
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("streaming", "monitoring"),
)
def q_lateness_watermark(spark: SparkSession, d: str):
    """Event-time lateness profile: for each event (in arrival order =
    event_id), how far behind the highest event time seen so far it
    arrives — the exact distribution that sizes `withWatermark` (p95
    lateness is the watermark that keeps 95% of late data; max is the
    loss-free bound). The measurement the reference's ordered-Kafka
    deployment would need before setting any state timeout.

    The naive form is a running max over GLOBAL arrival order — a
    single-partition window. The scale-safe form used here stitches
    it exactly from bounded pieces (the q_islands_ranged pattern):
    (1) within each {_LATE_BLOCK}-event arrival block, a block-local
    running max (windows partitioned BY BLOCK); (2) per-block maxima
    — a blocks-sized table — get a running max over blocks (bounded
    window); (3) each event's global high-water mark is
    max(local_runmax, previous blocks' high) via one broadcast join.
    Identical output to the oracle's global window, no unbounded
    partition anywhere."""
    return lateness_profile(load_table(spark, d, "events"))


def lateness_profile(e, block: int = _LATE_BLOCK):
    """Composable form over any events-shaped frame — also the
    property-test entry point (brute-force global running max on
    arbitrary arrival orders and small blocks,
    tests/test_properties.py)."""
    arr = e.select(
        "event_id",
        "event_type",
        epoch_s("ts").alias("es"),
        F.floor(F.col("event_id") / block).alias("blk"),
    )
    w_local = (
        Window.partitionBy("blk")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = arr.withColumn("local_high", F.max("es").over(w_local))
    blk_max = arr.groupBy("blk").agg(F.max("es").alias("bmax"))
    w_blocks = Window.partitionBy(bounded_window_key("blk")).orderBy("blk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prev_high = blk_max.select(
        "blk", F.max("bmax").over(w_blocks).alias("prev_high")
    )
    lat = (
        local.join(F.broadcast(prev_high), "blk")
        .select(
            "event_type",
            # greatest() skips NULLs on both engines; the very first
            # event (no local or previous high) coalesces to 0 late.
            F.greatest(
                F.coalesce(
                    F.greatest(F.col("local_high"), F.col("prev_high"))
                    - F.col("es"),
                    F.lit(0),
                ),
                F.lit(0),
            ).alias("late_s"),
        )
    )
    return (
        lat.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("late_s") > _LATE_TAU, 1)).alias("n_late"),
            F.round(F.percentile("late_s", F.lit(0.5)), 6).alias(
                "p50_late_s"
            ),
            F.round(F.percentile("late_s", F.lit(0.95)), 6).alias(
                "p95_late_s"
            ),
            F.max("late_s").cast("bigint").alias("max_late_s"),
        )
        .orderBy("event_type")
    )
