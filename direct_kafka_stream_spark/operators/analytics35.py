"""Round-6 batch 6: the Friedman repeated-measures rank test over
day-blocks and propensity-score stratification — the within-subject
hypothesis test and the observational-causal adjustment that complete
the experimentation kit (between-subject: ANOVA/Kruskal-Wallis;
causal: DiD/CUPED/uplift).

Reference anchor: EXT operators per SURVEY.md §2 (the reference's
processing hook is KafkaDirectStream.scala:43-51).

Parity conventions: cell statistics are exact-decimal means; ranks
come from counts (never a global sort); every fractional constant in
shared SQL is CAST(n AS DOUBLE)/m per docs/ALIGNMENT.md's
decimal-literal rule.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.window import Window

from direct_kafka_stream_spark.exprs import davg_sql
from direct_kafka_stream_spark.io import load_table
from direct_kafka_stream_spark.registry import query

# ---------------------------------------------------------------------------
# q_friedman — repeated-measures rank test across event types, day blocks
# ---------------------------------------------------------------------------

_FR_K = 5  # complete blocks must carry all five event types


@query(
    "q_friedman",
    oracle=f"""
    WITH cell AS (
        SELECT CAST(ts AS DATE) AS day, event_type,
               {davg_sql('value')} AS m
        FROM events GROUP BY 1, 2
    ),
    complete AS (
        SELECT day FROM cell GROUP BY day HAVING COUNT(*) = {_FR_K}
    ),
    ranked AS (
        SELECT c.day, c.event_type,
               (SELECT COUNT(*) FROM cell c2
                WHERE c2.day = c.day AND c2.m < c.m)
               + (1.0 + (SELECT COUNT(*) FROM cell c3
                         WHERE c3.day = c.day AND c3.m = c.m)) / 2.0
                   AS r
        FROM cell c JOIN complete USING (day)
    ),
    per_t AS (
        SELECT event_type, SUM(r) AS rsum, COUNT(*) AS n
        FROM ranked GROUP BY event_type
    ),
    tot AS (SELECT MAX(n) AS n, CAST(COUNT(*) AS BIGINT) AS k FROM per_t)
    SELECT t.n AS n_blocks, t.k, t.k - 1 AS df,
           round(CAST(12 AS DOUBLE) / (t.n * t.k * (t.k + 1))
                 * (SELECT SUM(rsum * rsum) FROM per_t)
                 - 3.0 * t.n * (t.k + 1), 6) AS q_stat
    FROM tot t
    """,
    tags=("stats", "hypothesis-test"),
)
def q_friedman(spark: SparkSession, d: str):
    """Friedman repeated-measures rank test: treating each day as a
    block and the five event types as treatments, rank the per-(day,
    type) mean values WITHIN each complete block (mid-ranks on ties)
    and test whether any treatment consistently ranks higher — the
    within-subject complement of q_kruskal_wallis (which pools), for
    the 'did type X run hot on the same days?' question. Q is
    χ²_{{k-1}} under the null.

    Scale shape: the fact collapses to the (days × 5)-bounded cell
    table in one exact-decimal aggregate; ranks come from counts
    joined within blocks (the oracle's correlated form decorrelates to
    a day-keyed self-join on Spark — ≤ k² rows per block); everything
    after is a 5-row rollup. The only window-free rank computation in
    the suite: blocks are tiny, so count-joins beat windows."""
    return friedman_stat(load_table(spark, d, "events"))


def friedman_stat(events):
    """Composable form over any events-shaped frame — also the
    foreachBatch streaming twin's per-batch transform
    (tests/test_streaming.py)."""
    cell = events.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(
        (
            F.round(F.sum(F.col("value").cast("decimal(38,10)")), 4).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("m")
    )
    cell = cell.persist()
    complete = (
        cell.groupBy("day")
        .agg(F.count(F.lit(1)).alias("kk"))
        .filter(F.col("kk") == _FR_K)
        .select("day")
    )
    c = cell.join(complete, "day")
    a, b = c.alias("a"), c.alias("b")
    pairs = a.join(b, F.col("a.day") == F.col("b.day")).groupBy(
        F.col("a.day").alias("day"),
        F.col("a.event_type").alias("event_type"),
    ).agg(
        F.sum(F.when(F.col("b.m") < F.col("a.m"), 1).otherwise(0)).alias(
            "less"
        ),
        F.sum(F.when(F.col("b.m") == F.col("a.m"), 1).otherwise(0)).alias(
            "ties"
        ),
    )
    ranked = pairs.select(
        "day",
        "event_type",
        (F.col("less") + (1.0 + F.col("ties")) / 2.0).alias("r"),
    )
    per_t = ranked.groupBy("event_type").agg(
        F.sum("r").alias("rsum"), F.count(F.lit(1)).alias("n")
    )
    tot = per_t.agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.col("rsum") * F.col("rsum")).alias("ss"),
    )
    nn = F.col("n").cast("double")
    kk = F.col("k").cast("double")
    return tot.select(
        F.col("n").alias("n_blocks"),
        F.col("k"),
        (F.col("k") - 1).alias("df"),
        F.round(
            F.lit(12.0) / (nn * kk * (kk + 1.0)) * F.col("ss")
            - 3.0 * nn * (kk + 1.0),
            6,
        ).alias("q_stat"),
    )


# ---------------------------------------------------------------------------
# q_propensity_strata — stratified adjustment for an observational effect
# ---------------------------------------------------------------------------

_PS_STRATA = 5


def _ps_oracle() -> str:
    return f"""
    WITH u AS (
        SELECT user_id,
               CAST(MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS INT) AS treated,
               CAST(COUNT(*) FILTER (WHERE event_type = 'click')
                    AS BIGINT) AS clicks,
               {davg_sql("CASE WHEN event_type = 'purchase'"
                         " THEN value ELSE 0 END")} AS y
        FROM events GROUP BY user_id
    ),
    by_clicks AS (
        SELECT clicks, COUNT(*) AS cnt FROM u GROUP BY clicks
    ),
    sweep AS (
        SELECT clicks,
               COALESCE(SUM(cnt) OVER (ORDER BY clicks
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS prior,
               (SELECT CAST(SUM(cnt) AS DOUBLE) FROM by_clicks) AS nn
        FROM by_clicks
    ),
    strat AS (
        SELECT u.user_id, u.treated, u.y,
               LEAST(CAST(floor(s.prior * {_PS_STRATA} / s.nn) AS BIGINT),
                     {_PS_STRATA - 1}) AS stratum
        FROM u JOIN sweep s ON s.clicks = u.clicks
    ),
    cells AS (
        SELECT stratum, treated, COUNT(*) AS n,
               {davg_sql('y')} AS ybar
        FROM strat GROUP BY stratum, treated
    ),
    wide AS (
        SELECT stratum,
               MAX(CASE WHEN treated = 1 THEN ybar END) AS y1,
               MAX(CASE WHEN treated = 0 THEN ybar END) AS y0,
               CAST(SUM(n) AS BIGINT) AS n
        FROM cells GROUP BY stratum
    ),
    tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS nn FROM wide
            WHERE y1 IS NOT NULL AND y0 IS NOT NULL)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
           CAST(SUM(w.n) AS BIGINT) AS n_users,
           round(SUM((w.y1 - w.y0) * w.n / t.nn), 6) AS ate_adjusted
    FROM wide w CROSS JOIN tot t
    WHERE w.y1 IS NOT NULL AND w.y0 IS NOT NULL
    """


@query(
    "q_propensity_strata",
    oracle=_ps_oracle(),
    tags=("experiment", "causal"),
)
def q_propensity_strata(spark: SparkSession, d: str):
    """Propensity-score stratification: estimate the effect of
    'experienced an error' on per-user purchase value by slicing users
    into five strata of their activity propensity proxy (click count,
    assigned on the bounded distinct-count sweep — never a global
    NTILE), then averaging the within-stratum treated-vs-control gaps
    weighted by stratum size. Strata missing either arm drop out
    (standard practice). The observational-causal complement of q_did
    (needs no pre-period) and q_cuped (needs no covariate linearity).

    Scale shape: one user-keyed aggregate, then a prefix sweep over
    the BOUNDED distinct-click-count table (non-foldable
    bounded_window_key, the q_weighted_median pattern), strata×2
    cells, and a 5-row rollup — the fact is touched exactly once."""
    return propensity_strata(load_table(spark, d, "events"))


def propensity_strata(events):
    """Composable form over any events-shaped frame — also the
    foreachBatch streaming twin's per-batch transform
    (tests/test_streaming.py)."""
    from direct_kafka_stream_spark.exprs import bounded_window_key

    u = events.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("treated"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
        (
            F.round(
                F.sum(
                    F.when(F.col("event_type") == "purchase", F.col("value"))
                    .otherwise(0.0)
                    .cast("decimal(38,10)")
                ),
                4,
            ).cast("double")
            / F.count(F.lit(1))
        ).alias("y"),
    )
    u = u.persist()
    by_clicks = u.groupBy("clicks").agg(F.count(F.lit(1)).alias("cnt"))
    wsweep = (
        Window.partitionBy(bounded_window_key("clicks"))
        .orderBy("clicks")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tot_users = by_clicks.agg(F.sum("cnt").cast("double").alias("nn"))
    sweep = by_clicks.select(
        "clicks", F.coalesce(F.sum("cnt").over(wsweep), F.lit(0)).alias("prior")
    ).crossJoin(F.broadcast(tot_users))
    strat = u.join(sweep, "clicks").select(
        "treated",
        "y",
        F.least(
            F.floor(F.col("prior") * _PS_STRATA / F.col("nn")).cast("bigint"),
            F.lit(_PS_STRATA - 1),
        ).alias("stratum"),
    )
    cells = strat.groupBy("stratum", "treated").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.round(F.sum(F.col("y").cast("decimal(38,10)")), 4).cast("double")
            / F.count(F.lit(1))
        ).alias("ybar"),
    )
    wide = cells.groupBy("stratum").agg(
        F.max(F.when(F.col("treated") == 1, F.col("ybar"))).alias("y1"),
        F.max(F.when(F.col("treated") == 0, F.col("ybar"))).alias("y0"),
        F.sum("n").cast("bigint").alias("n"),
    ).filter(F.col("y1").isNotNull() & F.col("y0").isNotNull())
    tot = wide.agg(F.sum("n").cast("double").alias("nn"))
    return wide.crossJoin(F.broadcast(tot)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum("n").cast("bigint").alias("n_users"),
        F.round(
            F.sum((F.col("y1") - F.col("y0")) * F.col("n") / F.col("nn")), 6
        ).alias("ate_adjusted"),
    )
