"""Round-6 batch 5: Shapley-value channel attribution (the
cooperative-game credit split over touchpoint coalitions) and Neyman
optimal stratified-sample allocation — the attribution-modeling and
survey-design analyses on top of the events surface.

Reference anchor: EXT operators per SURVEY.md §2 (the reference's
processing hook is KafkaDirectStream.scala:43-51).

Parity conventions: both operators run the SAME SQL string on Spark
and DuckDB (the q_tpch_q4 pattern), so every arithmetic step is
structurally identical by construction; weights are written as exact
double literals (6.0/24.0), sums of money-like measures go through
the exact-decimal contract.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from direct_kafka_stream_spark.exprs import dsum_sql
from direct_kafka_stream_spark.io import load_table
from direct_kafka_stream_spark.registry import query

# ---------------------------------------------------------------------------
# q_shapley_attribution — exact Shapley credit over 4 touch channels
# ---------------------------------------------------------------------------

_SH_CHANNELS = [("view", 1), ("click", 2), ("signup", 4), ("error", 8)]
_SH_N = len(_SH_CHANNELS)

# Shapley weight |S|!(n-1-|S|)!/n! for a coalition S of the OTHER
# n-1 = 3 channels. CAST to DOUBLE before dividing: a bare 2.0/24.0
# literal is DECIMAL division in Spark SQL (scale-truncated to
# 0.083333), not the intended double 1/12.
_SH_W = {
    0: "CAST(6 AS DOUBLE) / 24",
    1: "CAST(2 AS DOUBLE) / 24",
    2: "CAST(2 AS DOUBLE) / 24",
    3: "CAST(6 AS DOUBLE) / 24",
}

_SH_SUBSETS = ", ".join(f"({s}, {bin(s).count('1')})" for s in range(2**_SH_N))
_SH_CHANNEL_VALUES = ", ".join(
    f"('{name}', {bit})" for name, bit in _SH_CHANNELS
)
_SH_TOUCH_BITS = ",\n               ".join(
    f"MAX(CASE WHEN event_type = '{name}' THEN {bit} ELSE 0 END) AS b{i}"
    for i, (name, bit) in enumerate(_SH_CHANNELS)
)
_SH_WEIGHT_CASE = (
    "CASE v1.pc "
    + " ".join(f"WHEN {pc} THEN {lit}" for pc, lit in _SH_W.items())
    + " END"
)


def _shapley_sql(tbl: str) -> str:
    return f"""
    WITH touch AS (
        SELECT user_id,
               {_SH_TOUCH_BITS},
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
        FROM {tbl} GROUP BY user_id
    ),
    rmask AS (
        SELECT b0 + b1 + b2 + b3 AS r,
               CAST(SUM(conv) AS BIGINT) AS conv
        FROM touch GROUP BY 1
    ),
    subsets AS (SELECT * FROM (VALUES {_SH_SUBSETS}) AS t(s, pc)),
    v AS (
        SELECT t.s, t.pc,
               COALESCE(SUM(r.conv) FILTER (WHERE (r.r & t.s) = r.r),
                        CAST(0 AS BIGINT)) AS v
        FROM subsets t CROSS JOIN rmask r
        GROUP BY t.s, t.pc
    ),
    channels AS (
        SELECT * FROM (VALUES {_SH_CHANNEL_VALUES}) AS c(name, bit)
    )
    SELECT c.name AS channel,
           round(SUM(({_SH_WEIGHT_CASE})
                     * (CAST(v2.v AS DOUBLE) - CAST(v1.v AS DOUBLE))), 6)
               AS shapley,
           CAST(MAX(v1.v) FILTER (WHERE v1.s = 0) AS BIGINT) AS v_empty
    FROM channels c
    JOIN v v1 ON (v1.s & c.bit) = 0
    JOIN v v2 ON v2.s = v1.s + c.bit
    GROUP BY c.name
    """


@query(
    "q_shapley_attribution",
    oracle=_shapley_sql("events"),
    tags=("events", "attribution", "experiment"),
)
def q_shapley_attribution(spark: SparkSession, d: str):
    """Exact Shapley-value attribution over the four non-conversion
    touch channels: each user's touch set is a 4-bit coalition mask,
    the characteristic function v(S) counts conversions (users who
    reached 'purchase') whose touches fit inside S, and every
    channel's credit is the exact Shapley sum Σ w(|S|)·(v(S∪{i})−v(S))
    over the 8 coalitions excluding it — the game-theoretic split that
    first/last-touch (q_attribution) heuristics approximate. The
    efficiency axiom (Σ credit = v(full) − v(∅)) is pinned by a
    property test.

    Scale shape: the corpus collapses user-first (one user-keyed
    aggregate), then to a ≤16-row exact-mask table; all coalition
    algebra runs on 16×16 bounded joins of VALUES literals. Shapley's
    exponential blowup is capped by the channel count, never the data.
    Same SQL runs on both engines; weights are exact double
    literals."""
    load_table(spark, d, "events").createOrReplaceTempView("events")
    return spark.sql(_shapley_sql("events"))


def shapley_attribution(events):
    """Composable form over any events-shaped frame — also the
    foreachBatch streaming twin's per-batch transform
    (tests/test_streaming.py)."""
    events.createOrReplaceTempView("shapley_events_staged")
    return events.sparkSession.sql(_shapley_sql("shapley_events_staged"))


# ---------------------------------------------------------------------------
# q_neyman_alloc — optimal stratified-sample allocation
# ---------------------------------------------------------------------------

_NEY_BUDGET = 1000


def _neyman_sql(tbl: str) -> str:
    return f"""
    WITH m AS (
        SELECT event_type, COUNT(*) AS n,
               {dsum_sql('value')} AS sx,
               {dsum_sql('value * value')} AS sxx
        FROM {tbl} GROUP BY event_type
    ),
    sd AS (
        SELECT event_type, n,
               sqrt(GREATEST((sxx - sx * sx / n) / NULLIF(n - 1.0, 0.0),
                             0.0)) AS s
        FROM m
    ),
    tot AS (SELECT SUM(n * s) AS w FROM sd)
    SELECT sd.event_type,
           CAST(sd.n AS BIGINT) AS n_h,
           round(sd.s, 6) AS sd_h,
           round(sd.n * sd.s / NULLIF(t.w, 0.0), 6) AS alloc_share,
           CAST(round({_NEY_BUDGET} * sd.n * sd.s / NULLIF(t.w, 0.0), 0)
                AS BIGINT) AS alloc_n
    FROM sd CROSS JOIN tot t
    """


@query(
    "q_neyman_alloc",
    oracle=_neyman_sql("events"),
    tags=("stats", "sampling"),
)
def q_neyman_alloc(spark: SparkSession, d: str):
    """Neyman optimal allocation of a 1000-unit sampling budget across
    event-type strata: n_h ∝ N_h·σ_h, the design that minimizes the
    stratified mean's variance at fixed budget — what q_sample_stratified
    should be parameterized WITH when strata differ in spread (the
    survey-design complement of q_mde_power's sizing).

    One map-side-combined moment aggregate to |types| rows; σ_h comes
    from the exact-decimal (n, Σx, Σx²) triple with the variance
    clamped at 0 (GREATEST) before sqrt and NULLIF-guarded normalizer
    — the degenerate-data contract. Same SQL on both engines."""
    load_table(spark, d, "events").createOrReplaceTempView("events")
    return spark.sql(_neyman_sql("events"))


def neyman_alloc(events):
    """Composable form over any events-shaped frame — also the
    foreachBatch streaming twin's per-batch transform
    (tests/test_streaming.py)."""
    events.createOrReplaceTempView("neyman_events_staged")
    return events.sparkSession.sql(_neyman_sql("neyman_events_staged"))
