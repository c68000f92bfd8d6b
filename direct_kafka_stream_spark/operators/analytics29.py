"""Round-5 batch 4: the multiple-testing / privacy / resampling kit a
large experimentation platform runs on top of the engine's hypothesis
tests — Benjamini–Hochberg FDR control over a segment screen, Fisher's
combined-probability method, a deterministic differentially-private
Laplace histogram, and the Poisson bootstrap (the single-pass bootstrap
that actually works at 100 TB).

Reference anchor: EXT operators per SURVEY.md §2 (the reference's
processing hook is KafkaDirectStream.scala:43-51).

Engine-parity notes shared by this module:

* p-values use the logistic approximation of the normal tail,
  p = 2 / (1 + exp(1.702·|z|)) — erf is in neither engine's builtin
  set, and the approximation (max abs error < 0.01 in Φ) is byte-exact
  portable because it is one exp over a 6 dp-rounded z. The BH / Fisher
  machinery on top is exactly the textbook procedure; only the p-value
  source is approximate, identically on both engines.
* All decimal sums here are over magnitude-bounded terms (≤ ~1e7), so
  they round at scale 6–9 instead of exprs._OUT_SCALE=4: the scaled
  integer stays far below 2^53, keeping the DECIMAL→DOUBLE cast exact
  on both engines while preserving the precision the downstream
  variance algebra needs.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, SparkSession, functions as F
from pyspark.sql.window import Window

from direct_kafka_stream_spark.exprs import (
    DEC,
    bounded_window_key,
    dsum,
    dsum_sql,
    u01,
    u01_sql,
)
from direct_kafka_stream_spark.io import load_table, spread_scan
from direct_kafka_stream_spark.registry import query


def _dsum_n(col, scale: int) -> Column:
    """Exact decimal sum rounded at `scale` — only for sums whose
    magnitude × 10^scale provably stays under 2^53 (see module doc)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)), scale).cast("double")


def _dsum_n_sql(expr: str, scale: int) -> str:
    return (
        f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(38,10))), {scale})"
        " AS DOUBLE)"
    )


# ---------------------------------------------------------------------------
# q_bh_fdr — Benjamini–Hochberg step-up over a 100-segment mean screen
# ---------------------------------------------------------------------------

_BH_ALPHA = 0.10


@query(
    "q_bh_fdr",
    oracle=f"""
    WITH seg AS (
        SELECT CAST(json_extract(props, '$.k') AS INTEGER) AS seg, value
        FROM events
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS gn,
               {dsum_sql('value')} AS gs,
               {dsum_sql('value * value')} AS gss
        FROM seg
    ),
    g AS (
        SELECT seg, CAST(COUNT(*) AS BIGINT) AS n, {dsum_sql('value')} AS s
        FROM seg GROUP BY seg
    ),
    z AS (
        SELECT seg, n,
               round(COALESCE(
                   (round(s / n, 9) - round(gs / gn, 9))
                   / NULLIF(round(sqrt(GREATEST(
                                gss / gn - (gs / gn) * (gs / gn), 0.0)), 9)
                            / sqrt(CAST(n AS DOUBLE)), 0.0),
                   0.0), 6) AS z
        FROM g, tot
    ),
    p AS (
        SELECT seg, n, z,
               round(2.0 / (1.0 + exp(1.702 * abs(z))), 6) AS p_raw,
               CAST(COUNT(*) OVER () AS DOUBLE) AS m,
               ROW_NUMBER() OVER (ORDER BY
                   round(2.0 / (1.0 + exp(1.702 * abs(z))), 6),
                   seg NULLS LAST) AS i
        FROM z
    ),
    adj AS (
        SELECT seg, n, z, p_raw,
               round(LEAST(1.0,
                   MIN(m * p_raw / i) OVER (
                       ORDER BY p_raw DESC, seg DESC NULLS LAST
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
                   6) AS p_bh
        FROM p
    )
    SELECT seg, n, z, p_raw, p_bh, p_bh <= {_BH_ALPHA!r} AS rejected
    FROM adj ORDER BY seg
    """,
    tags=("stats", "multiple-testing"),
)
def q_bh_fdr(spark: SparkSession, d: str):
    """Benjamini–Hochberg FDR-controlled segment screen: test each of
    the ~100 props.k segments for a mean(value) shift vs the global
    mean, then step-up adjust the p-values so the expected fraction of
    false discoveries among the rejections stays below α=0.10. The
    correction every "scan 10k segments for movers" dashboard needs —
    uncorrected, 5% of segments look significant by luck alone.

    Scale shape: one map-side-combined pass reduces the fact table to
    |segments| sufficient-statistic rows plus a 1-row global-moments
    broadcast; the rank / reverse-running-min windows then run on the
    segments-sized frame only (bounded_window_key keeps the
    single-partition plan intentional and the WindowExec logger quiet).
    The p-value source is the logistic normal-tail approximation (see
    module doc); the BH step-up itself — p(i)·m/i, reverse cumulative
    min, clamp at 1 — is textbook-exact."""
    return bh_fdr_table(load_table(spark, d, "events"))


def bh_fdr_table(e):
    """Composable form over any events-shaped frame — also the
    foreachBatch streaming twin's per-batch transform
    (tests/test_streaming.py)."""
    seg = e.select(
        F.get_json_object("props", "$.k").cast("int").alias("seg"), "value"
    )
    tot = seg.agg(
        F.count(F.lit(1)).cast("double").alias("gn"),
        dsum("value").alias("gs"),
        dsum(F.col("value") * F.col("value")).alias("gss"),
    )
    g = seg.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"), dsum("value").alias("s")
    )
    mean = F.round(F.col("s") / F.col("n"), 9)
    gmean = F.round(F.col("gs") / F.col("gn"), 9)
    gsd = F.round(
        F.sqrt(
            F.greatest(
                F.col("gss") / F.col("gn")
                - (F.col("gs") / F.col("gn")) * (F.col("gs") / F.col("gn")),
                F.lit(0.0),
            )
        ),
        9,
    )
    z = g.crossJoin(F.broadcast(tot)).select(
        "seg",
        "n",
        F.round(
            F.coalesce(
                (mean - gmean)
                / F.nullif(
                    gsd / F.sqrt(F.col("n").cast("double")), F.lit(0.0)
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("z"),
    )
    p_raw = F.round(
        F.lit(2.0) / (F.lit(1.0) + F.exp(F.lit(1.702) * F.abs(F.col("z")))), 6
    )
    wpart = Window.partitionBy(bounded_window_key(F.col("seg")))
    p = z.select(
        "seg",
        "n",
        "z",
        p_raw.alias("p_raw"),
        F.count(F.lit(1)).over(wpart).cast("double").alias("m"),
        F.row_number()
        .over(wpart.orderBy(p_raw.asc(), F.col("seg").asc_nulls_last()))
        .alias("i"),
    )
    wrev = wpart.orderBy(
        F.col("p_raw").desc(), F.col("seg").desc_nulls_last()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    adj = p.select(
        "seg",
        "n",
        "z",
        "p_raw",
        F.round(
            F.least(
                F.lit(1.0),
                F.min(F.col("m") * F.col("p_raw") / F.col("i")).over(wrev),
            ),
            6,
        ).alias("p_bh"),
    )
    return adj.select(
        "seg",
        "n",
        "z",
        "p_raw",
        "p_bh",
        (F.col("p_bh") <= F.lit(_BH_ALPHA)).alias("rejected"),
    ).orderBy("seg")


# ---------------------------------------------------------------------------
# q_fisher_method — combine per-segment p-values within each event type
# ---------------------------------------------------------------------------

# ln() floor: a 6 dp-rounded p can round to exactly 0.0 for |z| ≳ 8.5;
# DuckDB ln(0) is -inf while Spark log(0) is NULL — clamp identically.
_P_FLOOR = 1e-09


@query(
    "q_fisher_method",
    oracle=f"""
    WITH seg AS (
        SELECT event_type,
               CAST(json_extract(props, '$.k') AS INTEGER) AS seg, value
        FROM events
    ),
    tot AS (
        SELECT event_type,
               CAST(COUNT(*) AS DOUBLE) AS gn,
               {dsum_sql('value')} AS gs,
               {dsum_sql('value * value')} AS gss
        FROM seg GROUP BY event_type
    ),
    g AS (
        SELECT event_type, seg,
               CAST(COUNT(*) AS BIGINT) AS n, {dsum_sql('value')} AS s
        FROM seg GROUP BY event_type, seg
    ),
    z AS (
        SELECT g.event_type,
               round(COALESCE(
                   (round(s / n, 9) - round(gs / gn, 9))
                   / NULLIF(round(sqrt(GREATEST(
                                gss / gn - (gs / gn) * (gs / gn), 0.0)), 9)
                            / sqrt(CAST(n AS DOUBLE)), 0.0),
                   0.0), 6) AS z
        FROM g JOIN tot ON tot.event_type = g.event_type
    ),
    terms AS (
        SELECT event_type,
               round(ln(GREATEST(
                   round(2.0 / (1.0 + exp(1.702 * abs(z))), 6),
                   {_P_FLOOR!r})), 9) AS term
        FROM z
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_tests,
           round(-2.0 * {_dsum_n_sql('term', 6)}, 6) AS x_stat,
           CAST(2 * COUNT(*) AS BIGINT) AS df
    FROM terms GROUP BY event_type ORDER BY event_type
    """,
    tags=("stats", "multiple-testing"),
)
def q_fisher_method(spark: SparkSession, d: str):
    """Fisher's combined-probability method: within each event type,
    combine the per-segment p-values (same logistic-tail z screen as
    q_bh_fdr, but centered on the event type's own mean) into one
    X = −2·Σ ln p statistic with 2k degrees of freedom — the meta-test
    for "is there ANY segment effect in this stream", complementary to
    BH's per-segment verdicts.

    Scale shape: one map-side-combined aggregation to |types|×|segments|
    cells, a broadcast of the |types|-row moment table onto it, then a
    second aggregation down to |types| rows. No windows, no shuffles
    beyond the two group-bys. ln terms are 9 dp-rounded and decimal-
    summed (|term| ≤ 20.7, bounded — scale-6 sum stays exact)."""
    return fisher_method_stat(load_table(spark, d, "events"))


def fisher_method_stat(e):
    """Composable form over any events-shaped frame — also the
    foreachBatch streaming twin's per-batch transform
    (tests/test_streaming.py)."""
    seg = e.select(
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("seg"),
        "value",
    )
    tot = seg.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("gn"),
        dsum("value").alias("gs"),
        dsum(F.col("value") * F.col("value")).alias("gss"),
    )
    g = seg.groupBy("event_type", "seg").agg(
        F.count(F.lit(1)).alias("n"), dsum("value").alias("s")
    )
    mean = F.round(F.col("s") / F.col("n"), 9)
    gmean = F.round(F.col("gs") / F.col("gn"), 9)
    gsd = F.round(
        F.sqrt(
            F.greatest(
                F.col("gss") / F.col("gn")
                - (F.col("gs") / F.col("gn")) * (F.col("gs") / F.col("gn")),
                F.lit(0.0),
            )
        ),
        9,
    )
    z = g.join(F.broadcast(tot), "event_type").select(
        "event_type",
        F.round(
            F.coalesce(
                (mean - gmean)
                / F.nullif(
                    gsd / F.sqrt(F.col("n").cast("double")), F.lit(0.0)
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("z"),
    )
    p = F.round(
        F.lit(2.0) / (F.lit(1.0) + F.exp(F.lit(1.702) * F.abs(F.col("z")))), 6
    )
    terms = z.select(
        "event_type",
        F.round(F.log(F.greatest(p, F.lit(_P_FLOOR))), 9).alias("term"),
    )
    return (
        terms.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_tests"),
            F.round(F.lit(-2.0) * _dsum_n("term", 6), 6).alias("x_stat"),
            (F.lit(2) * F.count(F.lit(1))).cast("bigint").alias("df"),
        )
        .select("event_type", "n_tests", "x_stat", "df")
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q_dp_laplace — deterministic differentially-private histogram
# ---------------------------------------------------------------------------

_DP_EPS = 1.0


@query(
    "q_dp_laplace",
    oracle=f"""
    WITH g AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY event_type
    ),
    noised AS (
        SELECT event_type, cnt,
               {u01_sql("'dp:' || event_type")} - 0.5 AS c
        FROM g
    )
    SELECT event_type,
           {_DP_EPS!r} AS epsilon,
           GREATEST(0.0, round(
               CAST(cnt AS DOUBLE)
               + round(-(CAST(sign(c) AS DOUBLE))
                       * ln(GREATEST(1.0 - 2.0 * abs(c), 1e-12))
                       / {_DP_EPS!r}, 6), 6)) AS noised_count
    FROM noised ORDER BY event_type
    """,
    tags=("privacy", "aggregation"),
)
def q_dp_laplace(spark: SparkSession, d: str):
    """Deterministic SIMULATION of the Laplace mechanism for an
    event-type count histogram: true counts plus a Laplace(Δf/ε)-shaped
    perturbation (Δf=1, ε=1) drawn by inverse-CDF from the engine's
    md5-uniform keyed on the event type. Because the noise is
    recomputable from the output row's own key, this provides NO actual
    differential privacy — anyone can subtract the noise. It exists to
    exercise the noise-injection plan shape (and its cross-engine
    byte-exactness) for benchmark/parity purposes; a real deployment
    would key the draw with a secret salt held outside the release.

    Scale shape: the DP mechanism is a scalar post-map on the
    |types|-row aggregate — the distributed work is the one map-side-
    combined count; noise costs nothing at any scale. The inverse CDF
    X = −b·sgn(u−½)·ln(1−2|u−½|) is clamped at 1e-12 before the ln so a
    pathological u≈0 draw degrades to a large-but-finite noise instead
    of ±inf (and ln(0) NULL-vs-inf engine divergence)."""
    return dp_laplace_histogram(load_table(spark, d, "events"))


def dp_laplace_histogram(e):
    """Composable form over any events-shaped frame — also the
    foreachBatch streaming twin's per-batch transform
    (tests/test_streaming.py)."""
    g = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    c = (u01(F.concat(F.lit("dp:"), F.col("event_type"))) - F.lit(0.5)).alias(
        "c"
    )
    noised = g.select("event_type", "cnt", c)
    noise = F.round(
        -(F.signum(F.col("c")).cast("double"))
        * F.log(
            F.greatest(
                F.lit(1.0) - F.lit(2.0) * F.abs(F.col("c")), F.lit(1e-12)
            )
        )
        / F.lit(_DP_EPS),
        6,
    )
    return noised.select(
        "event_type",
        F.lit(_DP_EPS).alias("epsilon"),
        F.greatest(
            F.lit(0.0),
            F.round(F.col("cnt").cast("double") + noise, 6),
        ).alias("noised_count"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q_bootstrap_poisson — single-pass Poisson bootstrap CI for group means
# ---------------------------------------------------------------------------

_B_REPS = 32
# Cumulative Poisson(1) CDF at k = 0..6: P(X ≤ k) = e⁻¹·Σ 1/j!.
# Identical literals are injected into both engines' expressions.
_POIS_CDF = tuple(
    sum(math.exp(-1) / math.factorial(j) for j in range(k + 1))
    for k in range(7)
)


def _pois_w_sql(u: str) -> str:
    clauses = " ".join(
        f"WHEN {u} < {c!r} THEN {k}" for k, c in enumerate(_POIS_CDF)
    )
    return f"CASE {clauses} ELSE {len(_POIS_CDF)} END"


def _pois_w_col(u: Column) -> Column:
    expr = F.when(u < F.lit(_POIS_CDF[0]), F.lit(0))
    for k, c in enumerate(_POIS_CDF[1:], start=1):
        expr = expr.when(u < F.lit(c), F.lit(k))
    return expr.otherwise(F.lit(len(_POIS_CDF)))


@query(
    "q_bootstrap_poisson",
    oracle=f"""
    WITH rep AS (
        SELECT e.event_type, e.value, t.r,
               {_pois_w_sql(u01_sql(
                   "CAST(event_id AS VARCHAR) || ':' || CAST(r AS VARCHAR)"
               ))} AS w
        FROM events e, range(0, {_B_REPS}) t(r)
    ),
    means AS (
        SELECT event_type,
               round({_dsum_n_sql('w * value', 6)}
                     / NULLIF(CAST(SUM(w) AS DOUBLE), 0.0), 9) AS mean_r
        FROM rep GROUP BY event_type, r
    ),
    agg AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS b_replicates,
               {_dsum_n_sql('mean_r', 6)} AS sm,
               {_dsum_n_sql('mean_r * mean_r', 6)} AS ssm
        FROM means WHERE mean_r IS NOT NULL GROUP BY event_type
    ),
    fin AS (
        SELECT event_type, b_replicates,
               round(sm / b_replicates, 6) AS boot_mean,
               round(sqrt(GREATEST(COALESCE(
                   (ssm - sm * sm / b_replicates)
                   / NULLIF(CAST(b_replicates AS DOUBLE) - 1.0, 0.0),
                   0.0), 0.0)), 6) AS boot_se
        FROM agg
    )
    SELECT event_type, b_replicates, boot_mean, boot_se,
           round(boot_mean - 1.96 * boot_se, 6) AS ci_lo,
           round(boot_mean + 1.96 * boot_se, 6) AS ci_hi
    FROM fin ORDER BY event_type
    """,
    tags=("stats", "resampling"),
)
def q_bootstrap_poisson(spark: SparkSession, d: str):
    """Poisson bootstrap of each event type's mean(value): every row
    contributes a deterministic Poisson(1) weight to each of B=32
    replicates (md5-keyed inverse-CDF draw on event_id:replicate), and
    the spread of the replicate means gives the normal-interval
    standard error and 95% CI. This is THE bootstrap that works at
    100 TB: classical resampling needs B shuffled copies of the data,
    while the Poisson approximation needs ONE pass — weights are
    generated inline per (row, replicate), map-side combine reduces
    each task's contribution to |types|×B partial rows, and the only
    shuffle carries |types|×B sufficient statistics. Ties to
    q_jackknife / q_median_ci as the third resampling primitive.

    Exactness: Poisson(1) CDF constants are module literals injected
    into both engines' CASE ladders; replicate means are 9 dp-rounded
    quotients of scale-6 decimal sums (bounded magnitudes — see module
    doc), and the replicate-variance algebra (ssm − sm²/B)/(B−1) is
    written with identical operation order on both sides. COALESCE
    before GREATEST keeps the degenerate B=1 case (a 1-row group where
    most replicates draw weight 0 and are dropped) at se=0 on both
    engines rather than relying on engine-specific NULL handling in
    GREATEST."""
    return bootstrap_poisson_table(
        spread_scan(load_table(spark, d, "events"), "event_id")
    )


def bootstrap_poisson_table(events):
    """Composable form over any events-shaped frame — also the
    foreachBatch streaming twin's per-batch transform
    (tests/test_streaming.py)."""
    e = events.select(
        "event_type", "event_id", "value"
    )
    rep = e.withColumn(
        "r", F.explode(F.sequence(F.lit(0), F.lit(_B_REPS - 1)))
    )
    u = u01(
        F.concat(
            F.col("event_id").cast("string"),
            F.lit(":"),
            F.col("r").cast("string"),
        )
    )
    rep = rep.select(
        "event_type", "value", "r", _pois_w_col(u).alias("w")
    )
    means = (
        rep.groupBy("event_type", "r")
        .agg(
            _dsum_n(F.col("w") * F.col("value"), 6).alias("swx"),
            F.sum("w").alias("sw"),
        )
        .select(
            "event_type",
            F.round(
                F.col("swx")
                / F.nullif(F.col("sw").cast("double"), F.lit(0.0)),
                9,
            ).alias("mean_r"),
        )
    )
    agg = (
        means.filter(F.col("mean_r").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("b_replicates"),
            _dsum_n("mean_r", 6).alias("sm"),
            _dsum_n(F.col("mean_r") * F.col("mean_r"), 6).alias("ssm"),
        )
    )
    var = (
        F.col("ssm") - F.col("sm") * F.col("sm") / F.col("b_replicates")
    ) / F.nullif(F.col("b_replicates").cast("double") - F.lit(1.0), F.lit(0.0))
    fin = agg.select(
        "event_type",
        "b_replicates",
        F.round(F.col("sm") / F.col("b_replicates"), 6).alias("boot_mean"),
        F.round(
            F.sqrt(F.greatest(F.coalesce(var, F.lit(0.0)), F.lit(0.0))), 6
        ).alias("boot_se"),
    )
    return fin.select(
        "event_type",
        "b_replicates",
        "boot_mean",
        "boot_se",
        F.round(
            F.col("boot_mean") - F.lit(1.96) * F.col("boot_se"), 6
        ).alias("ci_lo"),
        F.round(
            F.col("boot_mean") + F.lit(1.96) * F.col("boot_se"), 6
        ).alias("ci_hi"),
    ).orderBy("event_type")
