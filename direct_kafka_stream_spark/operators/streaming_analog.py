"""Batch analogs of the streaming operators (SURVEY.md §2.C).

DuckDB can't run a stream, so each streaming transform is verified on
its batch shape here (identical logical plan — Structured Streaming
incrementalizes the same plan), and exercised as a real stream in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from direct_kafka_stream_spark.exprs import dsum_sql
from direct_kafka_stream_spark.io import load_table
from direct_kafka_stream_spark.registry import query
from direct_kafka_stream_spark.streaming import transforms

_EPOCH_MIN = "CAST(epoch(date_trunc('second', {e})) AS BIGINT)"


@query(
    "q_win_tumbling",
    oracle=f"""
    SELECT CAST(epoch(time_bucket(INTERVAL 10 MINUTE, ts)) AS BIGINT) AS win_start,
           CAST(epoch(time_bucket(INTERVAL 10 MINUTE, ts) + INTERVAL 10 MINUTE) AS BIGINT) AS win_end,
           event_type,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    tags=("streaming",),
)
def q_win_tumbling(spark: SparkSession, d: str):
    """Tumbling 10-minute event-time windows per event_type."""
    return transforms.tumbling_counts(load_table(spark, d, "events"))


@query(
    "q_win_sliding",
    oracle=f"""
    WITH slid AS (
        SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS ws, * FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL 5 MINUTE, ts) - INTERVAL 5 MINUTE AS ws, * FROM events
    )
    SELECT CAST(epoch(ws) AS BIGINT) AS win_start,
           CAST(epoch(ws + INTERVAL 10 MINUTE) AS BIGINT) AS win_end,
           event_type,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS sum_value
    FROM slid
    GROUP BY 1, 2, 3
    """,
    tags=("streaming",),
)
def q_win_sliding(spark: SparkSession, d: str):
    """Sliding windows (10 min width / 5 min slide): every event falls
    in exactly two windows — the oracle materializes both via UNION ALL
    of the two candidate window starts."""
    return transforms.sliding_counts(load_table(spark, d, "events"))


@query(
    "q_win_session",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
    )
    SELECT {_EPOCH_MIN.format(e='MIN(ts)')} AS session_start,
           user_id,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS sum_value
    FROM sess GROUP BY user_id, sid
    """,
    tags=("streaming",),
)
def q_win_session(spark: SparkSession, d: str):
    """Gap-based session windows (5 min gap) per user. Oracle is the
    classic gaps-and-islands rewrite: break where gap ≥ 5 min,
    cumulative-sum the breaks into session ids."""
    return transforms.session_counts(load_table(spark, d, "events"))


@query(
    "q_dedup",
    oracle="""
    SELECT user_id, event_type, event_id, ts, value FROM (
        SELECT user_id, event_type, event_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    tags=("streaming",),
)
def q_dedup(spark: SparkSession, d: str):
    """Keep-first dedup per (user_id, event_type) — the deterministic
    batch shape of streaming ``dropDuplicates`` + watermark."""
    return transforms.dedup_keep_first(load_table(spark, d, "events"))


_FUNNEL_SQL = """
    WITH su AS (
        SELECT user_id, MIN(ts) AS signup_ts
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
        SELECT DISTINCT s.user_id
        FROM su s JOIN events e
          ON e.user_id = s.user_id AND e.event_type = 'purchase'
         AND e.ts > s.signup_ts
         AND e.ts <= s.signup_ts + INTERVAL 1 HOUR
    )
    SELECT CAST((SELECT COUNT(*) FROM su) AS BIGINT)   AS n_signup,
           CAST((SELECT COUNT(*) FROM conv) AS BIGINT) AS n_converted
"""


@query("q_funnel", oracle=_FUNNEL_SQL, tags=("streaming", "analytics"))
def q_funnel(spark: SparkSession, d: str):
    """Conversion funnel: users who purchased within one hour of their
    first signup. The earliest-signup aggregate is user-sized and
    broadcasts into an event-time range join — the batch analog of a
    stream-stream interval join keyed the same way (state bounded by
    the 1-hour window, exactly like the streaming watermark bound).
    Same SQL text runs on both engines."""
    load_table(spark, d, "events").createOrReplaceTempView("events")
    return spark.sql(_FUNNEL_SQL)


@query(
    "q_retention",
    oracle="""
    WITH uw AS (
        SELECT DISTINCT user_id,
               CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 604800 AS wk
        FROM events
    )
    SELECT a.wk,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS active,
           CAST(COUNT(DISTINCT b.user_id) AS BIGINT) AS retained
    FROM uw a LEFT JOIN uw b
      ON b.user_id = a.user_id AND b.wk = a.wk + 1
    GROUP BY a.wk
    """,
    tags=("streaming", "analytics"),
)
def q_retention(spark: SparkSession, d: str):
    """Week-over-week cohort retention: of the users active in epoch
    week w, how many return in w+1. Distinct (user, week) pairs are
    tiny relative to raw events — the self-join runs post-aggregation,
    so the fact table is scanned once and the join input is bounded by
    users × weeks."""
    from pyspark.sql import functions as F

    e = load_table(spark, d, "events")
    uw = e.select(
        "user_id", F.expr("CAST(ts AS LONG) DIV 604800").alias("wk")
    ).distinct()
    a = uw.alias("a")
    b = uw.alias("b")
    return (
        a.join(
            b,
            (F.col("b.user_id") == F.col("a.user_id"))
            & (F.col("b.wk") == F.col("a.wk") + 1),
            "left",
        )
        .groupBy(F.col("a.wk").alias("wk"))
        .agg(
            F.countDistinct(F.col("a.user_id")).alias("active"),
            F.countDistinct(F.col("b.user_id")).alias("retained"),
        )
    )
