"""Round-4 classic-operator and event-behavior additions: skyline
(Pareto frontier), MATCH_RECOGNIZE-style sequence patterns, burst/bot
detection, time-proximity event debouncing, and funnel conversion
latency.

Reference anchor: EXT operators per SURVEY.md §2 (the reference's
processing hook is KafkaDirectStream.scala:43-51).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.window import Window

from direct_kafka_stream_spark.io import load_table
from direct_kafka_stream_spark.registry import query


@query(
    "q_skyline",
    oracle="""
    WITH per_size AS (
        SELECT p_size, MIN(p_retailprice) AS minp
        FROM part GROUP BY p_size
    ),
    pref AS (
        SELECT p_size, minp,
               MIN(minp) OVER (ORDER BY p_size DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS better_minp
        FROM per_size
    )
    SELECT p.p_partkey, p.p_size, p.p_retailprice
    FROM part p
    JOIN pref ON p.p_size = pref.p_size
    WHERE p.p_retailprice = pref.minp
      AND (pref.better_minp IS NULL OR p.p_retailprice < pref.better_minp)
    """,
    tags=("classic", "skyline"),
)
def q_skyline(spark: SparkSession, d: str):
    """Skyline (Pareto frontier) over parts: maximize p_size, minimize
    p_retailprice. A part is dominated if some other part has size >=
    and price <= with at least one strict; the skyline keeps the
    non-dominated set.

    The naive formulation is an O(n^2) dominance anti-join. The
    scale-safe rewrite used here exploits the bounded objective
    domain: aggregate to per-size min price (distinct-size-bounded,
    50 rows here, broadcastable at any corpus scale), take the
    running strict-prefix min over sizes sorted descending (distinct
    sizes -> a ROWS 1 PRECEDING frame is exactly "all strictly larger
    sizes"), then broadcast that bounded frontier table back onto the
    one fact scan. A part survives iff it is the cheapest at its size
    AND strictly cheaper than every larger size's cheapest. One
    fact shuffle (the per-size aggregate), one bounded window, one
    broadcast join."""
    part = load_table(spark, d, "part")
    per_size = part.groupBy("p_size").agg(F.min("p_retailprice").alias("minp"))
    w = Window.orderBy(F.col("p_size").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    pref = per_size.select(
        "p_size", "minp", F.min("minp").over(w).alias("better_minp")
    )
    return (
        part.join(F.broadcast(pref), "p_size")
        .filter(
            (F.col("p_retailprice") == F.col("minp"))
            & (
                F.col("better_minp").isNull()
                | (F.col("p_retailprice") < F.col("better_minp"))
            )
        )
        .select("p_partkey", "p_size", "p_retailprice")
    )


# Ordered event-sequence regular expressions (MATCH_RECOGNIZE-style
# row-pattern queries, evaluated over each user's full event path).
_SEQ_PATTERNS = (
    "signup.*purchase",
    "view.*click.*purchase",
    "error.*error.*error",
)


@query(
    "q_seq_pattern",
    oracle=f"""
    WITH paths AS (
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM events GROUP BY user_id
    )
    SELECT p.pattern, COUNT(*) AS n_users
    FROM paths, (VALUES {", ".join(f"('{p}')" for p in _SEQ_PATTERNS)}) AS p(pattern)
    WHERE regexp_matches(paths.path, p.pattern)
    GROUP BY p.pattern
    """,
    tags=("events", "pattern"),
)
def q_seq_pattern(spark: SparkSession, d: str):
    """MATCH_RECOGNIZE-style row-pattern matching: each user's events
    are ordered into a single path string ('view>click>...'), then
    regular expressions over the path count users exhibiting each
    behavioural motif (signup-then-purchase, full browse funnel,
    triple error). This is the declarative core of SQL:2016 row
    pattern recognition, re-expressed as ordered aggregation + regex
    — the form that actually distributes (one user-keyed exchange,
    per-user paths bounded by per-user activity).

    Ordering inside the path is made deterministic without a window
    by array_sort over (ts, event_id, type) structs — groupBy
    collect_list order is not guaranteed across partitions, sorting
    the collected structs is. The pattern table is a literal
    inline VALUES (3 rows, broadcast trivially)."""
    e = load_table(spark, d, "events")
    path = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda s: s.event_type,
        ),
        ">",
    )
    paths = e.groupBy("user_id").agg(path.alias("path"))
    pats = F.explode(
        F.array(*[F.lit(p) for p in _SEQ_PATTERNS])
    ).alias("pattern")
    return (
        paths.select("path", pats)
        .filter(F.regexp_like(F.col("path"), F.col("pattern")))
        .groupBy("pattern")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# Burst detection: max events per sliding minute that flags a user.
_BURST_WINDOW_S = 60
_BURST_THRESHOLD = 5


@query(
    "q_bot_burst",
    oracle=f"""
    WITH sec AS (
        SELECT user_id, event_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        FROM events
    ),
    windowed AS (
        SELECT user_id,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY ts_s
                              RANGE BETWEEN {_BURST_WINDOW_S - 1} PRECEDING
                              AND CURRENT ROW) AS in_window
        FROM sec
    ),
    per_user AS (
        SELECT user_id, MAX(in_window) AS max_per_min
        FROM windowed GROUP BY user_id
    ),
    totals AS (
        SELECT user_id, COUNT(*) AS n_events,
               CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS span_s
        FROM events GROUP BY user_id
    )
    SELECT t.user_id, t.n_events, t.span_s, p.max_per_min,
           p.max_per_min >= {_BURST_THRESHOLD} AS burst_flag
    FROM totals t JOIN per_user p ON t.user_id = p.user_id
    """,
    tags=("events", "quality"),
)
def q_bot_burst(spark: SparkSession, d: str):
    """Burst/bot detection: for each user, the maximum number of
    events falling in any sliding 60-second window, via a RANGE frame
    over integer epoch seconds — the standard automated-traffic
    screen a clickstream pipeline runs before analytics (and an LLM
    corpus pipeline runs on scraped interaction logs).

    The RANGE window and the per-user rollup share one user-keyed
    exchange; per-user frames are bounded by per-user activity, so no
    global order exists anywhere. Epoch math is integer seconds on
    both engines (Spark unix_timestamp truncates, the oracle floors
    epoch() explicitly)."""
    e = load_table(spark, d, "events")
    sec = e.select(
        "user_id",
        F.unix_timestamp("ts").alias("ts_s"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s")
        .rangeBetween(-(_BURST_WINDOW_S - 1), Window.currentRow)
    )
    per_user = (
        sec.select("user_id", F.count(F.lit(1)).over(w).alias("in_window"))
        .groupBy("user_id")
        .agg(F.max("in_window").alias("max_per_min"))
    )
    totals = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
        .cast("long")
        .alias("span_s"),
    )
    return totals.join(per_user, "user_id").select(
        "user_id",
        "n_events",
        "span_s",
        "max_per_min",
        (F.col("max_per_min") >= _BURST_THRESHOLD).alias("burst_flag"),
    )


# Debounce gap: a repeat of the same (user, event_type) within this
# many seconds of the previous occurrence is collapsed.
_DEBOUNCE_S = 300


@query(
    "q_event_debounce",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type, event_id, ts,
               LAG(ts) OVER (PARTITION BY user_id, event_type
                             ORDER BY ts, event_id) AS prev_ts
        FROM events
    )
    SELECT event_id, user_id, event_type
    FROM seq
    WHERE prev_ts IS NULL
       OR date_diff('second', prev_ts, ts) > {_DEBOUNCE_S}
    """,
    tags=("events", "dedup"),
)
def q_event_debounce(spark: SparkSession, d: str):
    """Time-proximity debouncing: collapse repeats of the same
    (user, event_type) arriving within 5 minutes of the previous
    occurrence — double-click / retry / refresh noise removal, the
    temporal cousin of exact dedup (q_dedup drops identical ids,
    this drops near-in-time semantic repeats).

    One (user, type)-keyed window — frames bounded per key, one
    exchange, no global order. The lag comparison is against the
    previous RAW event (simple debounce), which is a pure window
    expression on both engines; chain-collapse semantics (compare
    against the previous KEPT event) is inherently sequential and
    would go through applyInPandasWithState on the streaming path."""
    e = load_table(spark, d, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap_s = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    return (
        e.select("event_id", "user_id", "event_type", gap_s.alias("gap_s"))
        .filter(F.col("gap_s").isNull() | (F.col("gap_s") > _DEBOUNCE_S))
        .drop("gap_s")
    )


@query(
    "q_funnel_latency",
    oracle="""
    WITH s AS (
        SELECT user_id, MIN(ts) AS signup_ts
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
        SELECT s.user_id,
               MIN(date_diff('second', s.signup_ts, e.ts)) AS latency_s
        FROM s JOIN events e
          ON e.user_id = s.user_id
         AND e.event_type = 'purchase'
         AND e.ts >= s.signup_ts
        GROUP BY s.user_id
    )
    SELECT (SELECT COUNT(*) FROM s) AS n_signup,
           COUNT(*) AS n_converted,
           round(COUNT(*) * 1.0 / (SELECT COUNT(*) FROM s), 6) AS conv_rate,
           round(quantile_cont(latency_s, 0.5), 6) AS p50_latency_s,
           round(quantile_cont(latency_s, 0.9), 6) AS p90_latency_s
    FROM conv
    """,
    tags=("events", "funnel"),
)
def q_funnel_latency(spark: SparkSession, d: str):
    """Funnel conversion latency: among users who signed up, the share
    who later purchased and the p50/p90 seconds from first signup to
    first subsequent purchase — the time-to-convert report that
    accompanies every funnel count (q_funnel tells how many, this
    tells how fast).

    Both anchor tables are user-keyed aggregates of one filtered
    fact scan each (filters pushed to the parquet scan); the join is
    user-keyed; the final percentile runs over the converted-users
    table (bounded by the user domain, orders of magnitude under the
    fact). Latency is integer seconds on both engines; percentiles
    are exact interpolated (both engines linear-interpolate), rounded
    to 6dp."""
    e = load_table(spark, d, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    conv = (
        s.join(p, "user_id")
        .filter(F.col("p_ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.unix_timestamp("p_ts") - F.unix_timestamp("signup_ts")
            ).alias("latency_s")
        )
    )
    n_signup = s.agg(F.count(F.lit(1)).alias("n_signup"))
    return (
        conv.agg(
            F.count(F.lit(1)).alias("n_converted"),
            F.round(F.percentile("latency_s", F.lit(0.5)), 6).alias(
                "p50_latency_s"
            ),
            F.round(F.percentile("latency_s", F.lit(0.9)), 6).alias(
                "p90_latency_s"
            ),
        )
        .crossJoin(F.broadcast(n_signup))
        .select(
            "n_signup",
            "n_converted",
            F.round(F.col("n_converted") / F.col("n_signup"), 6).alias(
                "conv_rate"
            ),
            "p50_latency_s",
            "p90_latency_s",
        )
    )
