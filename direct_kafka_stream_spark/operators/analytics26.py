"""Round-5 statistics / concentration sweep: one-way ANOVA, Kendall's
tau-b from the joint frequency grid, CUSUM change detection via the
prefix-min identity, the Grubbs outlier statistic, ridge regression in
closed form, the binned-Lorenz Gini (the scale variant q_gini's
docstring names), robust IQR scaling, a Hill power-law tail estimator,
and hour-of-day event-mix entropy.

Reference anchor: EXT operators per SURVEY.md §2 (the reference's
processing hook is KafkaDirectStream.scala:43-51).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.window import Window

from direct_kafka_stream_spark.exprs import (
    DEC,
    bounded_window_key,
    dsum,
    dsum_sql,
)
from direct_kafka_stream_spark.io import load_table, spread_scan
from direct_kafka_stream_spark.registry import query


@query(
    "q_anova",
    oracle=f"""
    WITH g AS (
        SELECT event_type,
               CAST(COUNT(*) AS DOUBLE) AS cnt,
               {dsum_sql('value')} AS s,
               {dsum_sql('value * value')} AS ss
        FROM events GROUP BY event_type
    ),
    tot AS (
        SELECT CAST(SUM(cnt) AS DOUBLE) AS n,
               CAST(COUNT(*) AS DOUBLE) AS k,
               CAST(ROUND(SUM(CAST(s AS DECIMAL(38,10))), 4) AS DOUBLE) AS gs
        FROM g
    ),
    terms AS (
        SELECT t.n, t.k,
               round(g.cnt * (g.s / g.cnt - t.gs / t.n)
                           * (g.s / g.cnt - t.gs / t.n), 9) AS tb,
               round(g.ss - g.s * g.s / g.cnt, 9) AS tw
        FROM g, tot t
    )
    SELECT CAST(MAX(k) AS BIGINT) AS k,
           CAST(MAX(n) AS BIGINT) AS n,
           round(CAST(ROUND(SUM(CAST(tb AS DECIMAL(38,10))), 6) AS DOUBLE), 6)
               AS ss_between,
           round(CAST(ROUND(SUM(CAST(tw AS DECIMAL(38,10))), 6) AS DOUBLE), 6)
               AS ss_within,
           round((CAST(ROUND(SUM(CAST(tb AS DECIMAL(38,10))), 6) AS DOUBLE)
                      / NULLIF(MAX(k) - 1, 0))
                 / NULLIF(CAST(ROUND(SUM(CAST(tw AS DECIMAL(38,10))), 6)
                              AS DOUBLE)
                          / NULLIF(MAX(n) - MAX(k), 0), 0), 6) AS f_stat
    FROM terms
    """,
    tags=("stats", "hypothesis-test"),
)
def q_anova(spark: SparkSession, d: str):
    """One-way ANOVA F-test of events.value across event types — does
    the mean differ by group more than within-group noise explains?
    The default screen before slicing any metric by a categorical.

    Scale shape: ONE map-side-combined aggregation reduces the corpus
    to |types| sufficient-statistic rows (count, Σx, Σx²); SSB/SSW and
    F are scalar arithmetic on that bounded table against the one-row
    broadcast grand totals. Exactness: moments use the exact-decimal
    contract, the per-group SSB/SSW terms are computed with identical
    operation order on both engines and rounded 9 dp before an exact
    decimal sum, F rounded 6 dp."""
    return anova_stat(load_table(spark, d, "events"))


def anova_stat(events):
    """Composable form over any events-shaped frame — also the
    foreachBatch streaming twin's per-batch transform
    (tests/test_streaming.py)."""
    g = (
        events
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("double").alias("cnt"),
            dsum("value").alias("s"),
            dsum(F.col("value") * F.col("value")).alias("ss"),
        )
    )
    tot = g.agg(
        F.sum("cnt").alias("n"),
        F.count(F.lit(1)).cast("double").alias("k"),
        F.round(F.sum(F.col("s").cast(DEC)), 4).cast("double").alias("gs"),
    )
    mean_g = F.col("s") / F.col("cnt")
    mean = F.col("gs") / F.col("n")
    terms = g.crossJoin(F.broadcast(tot)).select(
        "n",
        "k",
        F.round(F.col("cnt") * (mean_g - mean) * (mean_g - mean), 9).alias("tb"),
        F.round(F.col("ss") - F.col("s") * F.col("s") / F.col("cnt"), 9).alias(
            "tw"
        ),
    )
    ssb = F.round(F.sum(F.col("tb").cast(DEC)), 6).cast("double")
    ssw = F.round(F.sum(F.col("tw").cast(DEC)), 6).cast("double")
    return terms.agg(
        F.max("k").cast("bigint").alias("k"),
        F.max("n").cast("bigint").alias("n"),
        F.round(ssb, 6).alias("ss_between"),
        F.round(ssw, 6).alias("ss_within"),
        F.round(
            (ssb / F.nullif(F.max("k") - 1, F.lit(0.0)))
            / F.nullif(ssw / F.nullif(F.max("n") - F.max("k"), F.lit(0.0)), F.lit(0.0)),
            6,
        ).alias("f_stat"),
    )


@query(
    "q_kendall_grid",
    oracle="""
    WITH grid AS (
        SELECT l_quantity AS q, l_discount AS dd, COUNT(*) AS c
        FROM lineitem GROUP BY l_quantity, l_discount
    ),
    tx AS (SELECT q, SUM(c) AS cx FROM grid GROUP BY q),
    ty AS (SELECT dd, SUM(c) AS cy FROM grid GROUP BY dd),
    tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(c) AS BIGINT) * (CAST(SUM(c) AS BIGINT) - 1) / 2 AS n0
        FROM grid
    ),
    t1 AS (SELECT CAST(SUM(cx * (cx - 1) / 2) AS BIGINT) AS n1 FROM tx),
    t2 AS (SELECT CAST(SUM(cy * (cy - 1) / 2) AS BIGINT) AS n2 FROM ty),
    cd AS (
        SELECT
            CAST(COALESCE(SUM(CASE WHEN a.dd < b.dd THEN a.c * b.c END), 0)
                AS BIGINT) AS conc,
            CAST(COALESCE(SUM(CASE WHEN a.dd > b.dd THEN a.c * b.c END), 0)
                AS BIGINT) AS disc
        FROM grid a JOIN grid b ON a.q < b.q
    )
    SELECT tot.n,
           cd.conc AS concordant,
           cd.disc AS discordant,
           round(CAST(cd.conc - cd.disc AS DOUBLE)
                 / NULLIF(sqrt(CAST(tot.n0 - t1.n1 AS DOUBLE)
                        * CAST(tot.n0 - t2.n2 AS DOUBLE)), 0.0), 6) AS tau_b
    FROM tot, t1, t2, cd
    """,
    tags=("stats", "correlation", "scale"),
)
def q_kendall_grid(spark: SparkSession, d: str):
    """Kendall's tau-b rank correlation of quantity vs discount,
    computed ENTIRELY from the joint frequency grid — the robust,
    outlier-immune complement of q_spearman for discrete-domain pairs.

    The textbook form compares all n² row pairs. Both columns have
    bounded value domains (quantity ≤ 50 distinct, discount ≤ 11), so
    the corpus reduces to a ≤550-cell grid in ONE map-side-combined
    aggregation; concordant/discordant pair mass then comes from a
    grid×grid nested-loop join (cells², corpus-size-independent,
    broadcast — never a row-pair join), and tie corrections from the
    two marginal tables. All counts are exact integers; the only
    doubles are the final ratio's operands, cast in the same order on
    both engines. Long arithmetic bounds the exact path to n ≲ 4·10⁹
    rows (n₀ fits int64); past that the grid counts would move to the
    hi/lo split of q_pca_power."""
    li = load_table(spark, d, "lineitem")
    grid = (
        li.groupBy(F.col("l_quantity").alias("q"), F.col("l_discount").alias("dd"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tx = grid.groupBy("q").agg(F.sum("c").alias("cx"))
    ty = grid.groupBy("dd").agg(F.sum("c").alias("cy"))
    tot = grid.agg(
        F.sum("c").cast("bigint").alias("n"),
        (F.sum("c").cast("bigint") * (F.sum("c").cast("bigint") - 1) / 2)
        .cast("bigint")
        .alias("n0"),
    )
    t1 = tx.agg(
        F.sum((F.col("cx") * (F.col("cx") - 1) / 2).cast("bigint"))
        .cast("bigint")
        .alias("n1")
    )
    t2 = ty.agg(
        F.sum((F.col("cy") * (F.col("cy") - 1) / 2).cast("bigint"))
        .cast("bigint")
        .alias("n2")
    )
    a = grid.select(
        F.col("q").alias("qa"), F.col("dd").alias("da"), F.col("c").alias("ca")
    )
    b = grid.select(
        F.col("q").alias("qb"), F.col("dd").alias("db"), F.col("c").alias("cb")
    )
    cd = (
        a.join(F.broadcast(b), F.col("qa") < F.col("qb"))
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("da") < F.col("db"), F.col("ca") * F.col("cb"))
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("conc"),
            F.coalesce(
                F.sum(
                    F.when(F.col("da") > F.col("db"), F.col("ca") * F.col("cb"))
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("disc"),
        )
    )
    return (
        tot.crossJoin(F.broadcast(t1))
        .crossJoin(F.broadcast(t2))
        .crossJoin(F.broadcast(cd))
        .select(
            "n",
            F.col("conc").alias("concordant"),
            F.col("disc").alias("discordant"),
            # NULLIF: a single-valued column has zero untied pairs —
            # tau is undefined (NULL both engines), not a div-by-zero
            F.round(
                (F.col("conc") - F.col("disc")).cast("double")
                / F.nullif(
                    F.sqrt(
                        (F.col("n0") - F.col("n1")).cast("double")
                        * (F.col("n0") - F.col("n2")).cast("double")
                    ),
                    F.lit(0.0),
                ),
                6,
            ).alias("tau_b"),
        )
    )


# CUSUM drift threshold: flag when the one-sided CUSUM exceeds this
# many sample standard deviations of the daily series.
_CUSUM_H = 2.0


@query(
    "q_cusum",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               {dsum_sql('o_totalprice')} AS s
        FROM orders GROUP BY 1
    ),
    st AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS nd,
               CAST(ROUND(SUM(CAST(s AS DECIMAL(38,10))), 4) AS DOUBLE) AS gs,
               {dsum_sql('s * s')} AS ssq
        FROM daily
    ),
    pre AS (
        SELECT d.day, d.s, st.nd, st.gs, st.ssq,
               CAST(ROUND(SUM(CAST(d.s - st.gs / st.nd AS DECIMAL(38,10)))
                   OVER (ORDER BY d.day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   4) AS DOUBLE) AS p
        FROM daily d, st
    ),
    cs AS (
        SELECT day, nd, gs, ssq,
               round(p - LEAST(MIN(p) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0),
                   6) AS cusum
        FROM pre
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, cusum,
           CASE WHEN cusum > round({_CUSUM_H!r}
                    * sqrt((ssq - gs * gs / nd) / NULLIF(nd - 1, 0.0)), 6)
                THEN 1 ELSE 0 END AS flag
    FROM cs
    """,
    tags=("timeseries", "monitoring", "scale"),
)
def q_cusum(spark: SparkSession, d: str):
    """One-sided CUSUM change detection over the daily revenue series:
    S_t = max(0, S_{t−1} + (x_t − μ)), flagged when S_t exceeds
    2·(sample sd). The sequential drift detector that catches slow
    mean shifts a fixed threshold misses.

    The recursion is NOT a prefix sum — but the closed form
    S_t = P_t − min(0, min_{j≤t} P_j) (P = running sum of deviations)
    IS: two bounded windows over the days-sized series replace the
    sequential loop entirely. The corpus reduces to per-day exact
    decimal sums first (one map-side-combined aggregation); everything
    after runs on the calendar-bounded table. Deviations are decimal-
    summed (order-independent), the prefix min is exact double, and
    the flag compares two 6 dp-rounded values (round-before-compare,
    ALIGNMENT)."""
    return cusum_report(load_table(spark, d, "orders"))


def cusum_report(orders):
    """Composable form over any orders-shaped frame — also the
    foreachBatch streaming twin's per-batch transform
    (tests/test_streaming.py)."""
    daily = (
        orders
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(dsum("o_totalprice").alias("s"))
    )
    st = daily.agg(
        F.count(F.lit(1)).cast("double").alias("nd"),
        F.round(F.sum(F.col("s").cast(DEC)), 4).cast("double").alias("gs"),
        dsum(F.col("s") * F.col("s")).alias("ssq"),
    )
    # key on the numeric nd column (constant per row after the cross
    # join) — bounded_window_key needs an arithmetic type, day is DATE
    wp = Window.partitionBy(bounded_window_key("nd")).orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pre = daily.crossJoin(F.broadcast(st)).select(
        "day",
        "nd",
        "gs",
        "ssq",
        F.round(
            F.sum((F.col("s") - F.col("gs") / F.col("nd")).cast(DEC)).over(wp), 4
        )
        .cast("double")
        .alias("p"),
    )
    cs = pre.select(
        "day",
        "nd",
        "gs",
        "ssq",
        F.round(
            F.col("p") - F.least(F.min("p").over(wp), F.lit(0.0)), 6
        ).alias("cusum"),
    )
    # NULLIF: a one-day series has no sample sd — the comparison is
    # NULL (flag 0) identically on both engines
    thresh = F.round(
        _CUSUM_H
        * F.sqrt(
            (F.col("ssq") - F.col("gs") * F.col("gs") / F.col("nd"))
            / F.nullif(F.col("nd") - 1, F.lit(0.0))
        ),
        6,
    )
    return cs.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "cusum",
        F.when(F.col("cusum") > thresh, 1).otherwise(0).alias("flag"),
    )


@query(
    "q_grubbs",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               {dsum_sql('o_totalprice')} AS s
        FROM orders GROUP BY 1
    ),
    st AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS nd,
               CAST(ROUND(SUM(CAST(s AS DECIMAL(38,10))), 4) AS DOUBLE) AS gs,
               {dsum_sql('s * s')} AS ssq
        FROM daily
    ),
    dev AS (
        SELECT d.day, d.s,
               round(abs(d.s - st.gs / st.nd), 6) AS adev,
               st.nd, st.gs, st.ssq
        FROM daily d, st
    ),
    pick AS (
        SELECT * FROM dev ORDER BY adev DESC, day ASC LIMIT 1
    )
    SELECT CAST(nd AS BIGINT) AS n_days,
           strftime(day, '%Y-%m-%d') AS peak_day,
           s AS peak_value,
           round(adev / NULLIF(sqrt((ssq - gs * gs / nd)
                                    / NULLIF(nd - 1, 0.0)), 0.0), 6) AS g_stat
    FROM pick
    """,
    tags=("stats", "outlier"),
)
def q_grubbs(spark: SparkSession, d: str):
    """Grubbs outlier statistic for the daily revenue series:
    G = max|x − mean| / sd with the offending day — the single-worst-
    point test that complements the per-row MAD gate (q_anomaly_mad)
    with a series-level answer to "is the worst day abnormal?".

    One aggregation reduces the corpus to the calendar-bounded daily
    table; moments and the argmax run on that bounded series (the
    argmax is a min-of-struct with (−|dev|, day) ordering — exactly
    the oracle's ORDER BY adev DESC, day ASC). |dev| is rounded 6 dp
    BEFORE the comparison so float noise cannot flip the chosen day."""
    return grubbs_report(load_table(spark, d, "orders"))


def grubbs_report(orders):
    """Composable form over any orders-shaped frame — also the
    foreachBatch streaming twin's per-batch transform
    (tests/test_streaming.py)."""
    daily = (
        orders
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(dsum("o_totalprice").alias("s"))
    )
    st = daily.agg(
        F.count(F.lit(1)).cast("double").alias("nd"),
        F.round(F.sum(F.col("s").cast(DEC)), 4).cast("double").alias("gs"),
        dsum(F.col("s") * F.col("s")).alias("ssq"),
    )
    dev = daily.crossJoin(F.broadcast(st)).select(
        "day",
        "s",
        F.round(F.abs(F.col("s") - F.col("gs") / F.col("nd")), 6).alias("adev"),
        "nd",
        "gs",
        "ssq",
    )
    picked = dev.agg(
        F.min(
            F.struct(
                (-F.col("adev")).alias("na"),
                F.col("day").alias("day"),
                F.col("s").alias("s"),
                F.col("adev").alias("adev"),
                F.col("nd").alias("nd"),
                F.col("gs").alias("gs"),
                F.col("ssq").alias("ssq"),
            )
        ).alias("p")
    )
    # NULLIF twice: a one-day series has no sample sd, a constant
    # series has sd 0 — G is undefined (NULL) identically on both
    # engines (Spark runs ANSI: an unguarded /0 would THROW)
    sd = F.sqrt(
        (F.col("p.ssq") - F.col("p.gs") * F.col("p.gs") / F.col("p.nd"))
        / F.nullif(F.col("p.nd") - 1, F.lit(0.0))
    )
    return picked.select(
        F.col("p.nd").cast("bigint").alias("n_days"),
        F.date_format("p.day", "yyyy-MM-dd").alias("peak_day"),
        F.col("p.s").alias("peak_value"),
        F.round(
            F.col("p.adev") / F.nullif(sd, F.lit(0.0)), 6
        ).alias("g_stat"),
    )


# Ridge penalty — shared literal on both engines (not a tuned value;
# the point is the closed-form solve with a regularized diagonal).
_RIDGE_L = 10.0


@query(
    "q_ridge_closed",
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
        SELECT n, sy, s1y, s2y,
               (n * ((s11 + {_RIDGE_L!r}) * (s22 + {_RIDGE_L!r}) - s12 * s12)
                - s1 * (s1 * (s22 + {_RIDGE_L!r}) - s12 * s2)
                + s2 * (s1 * s12 - (s11 + {_RIDGE_L!r}) * s2)) AS det,
               (sy * ((s11 + {_RIDGE_L!r}) * (s22 + {_RIDGE_L!r}) - s12 * s12)
                - s1 * (s1y * (s22 + {_RIDGE_L!r}) - s12 * s2y)
                + s2 * (s1y * s12 - (s11 + {_RIDGE_L!r}) * s2y)) AS det0,
               (n * (s1y * (s22 + {_RIDGE_L!r}) - s12 * s2y)
                - sy * (s1 * (s22 + {_RIDGE_L!r}) - s12 * s2)
                + s2 * (s1 * s2y - s1y * s2)) AS det1,
               (n * ((s11 + {_RIDGE_L!r}) * s2y - s1y * s12)
                - s1 * (s1 * s2y - s1y * s2)
                + sy * (s1 * s12 - (s11 + {_RIDGE_L!r}) * s2)) AS det2
        FROM m
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(det0 / det, 6) AS b0,
           round(det1 / det, 6) AS b1,
           round(det2 / det, 6) AS b2
    FROM solved
    """,
    tags=("ml", "regression"),
)
def q_ridge_closed(spark: SparkSession, d: str):
    """Ridge regression (L2-regularized least squares) trained in one
    SQL pass: l_extendedprice ~ quantity + discount with λ = 10 added
    to the feature diagonal of the normal equations — the
    numerically-stabilized sibling of q_ols_multi (same nine sufficient
    moments, regularized 3×3 Cramer solve; the intercept row is NOT
    penalized, the standard convention).

    Scale shape identical to q_ols_multi: one map-side-combined moment
    aggregation, then scalar arithmetic on one row. The determinant
    expressions share operation order verbatim with the oracle so IEEE
    arithmetic is bit-identical; coefficients rounded 6 dp."""
    li = spread_scan(load_table(spark, d, "lineitem"), "l_orderkey")
    q, disc, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    m = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(q).alias("s1"),
        dsum(disc).alias("s2"),
        dsum(y).alias("sy"),
        dsum(q * q).alias("s11"),
        dsum(q * disc).alias("s12"),
        dsum(disc * disc).alias("s22"),
        dsum(q * y).alias("s1y"),
        dsum(disc * y).alias("s2y"),
    )
    n, s1, s2, sy = F.col("n"), F.col("s1"), F.col("s2"), F.col("sy")
    s11, s12, s22 = F.col("s11") , F.col("s12"), F.col("s22")
    s1y, s2y = F.col("s1y"), F.col("s2y")
    L = F.lit(_RIDGE_L)
    det = (
        n * ((s11 + L) * (s22 + L) - s12 * s12)
        - s1 * (s1 * (s22 + L) - s12 * s2)
        + s2 * (s1 * s12 - (s11 + L) * s2)
    )
    det0 = (
        sy * ((s11 + L) * (s22 + L) - s12 * s12)
        - s1 * (s1y * (s22 + L) - s12 * s2y)
        + s2 * (s1y * s12 - (s11 + L) * s2y)
    )
    det1 = (
        n * (s1y * (s22 + L) - s12 * s2y)
        - sy * (s1 * (s22 + L) - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    )
    det2 = (
        n * ((s11 + L) * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - (s11 + L) * s2)
    )
    return m.select(
        n.cast("bigint").alias("n"),
        F.round(det0 / det, 6).alias("b0"),
        F.round(det1 / det, 6).alias("b1"),
        F.round(det2 / det, 6).alias("b2"),
    )


# Binned-Lorenz revenue bin width (per-customer revenue totals).
_GB_W = 10000.0


@query(
    "q_gini_binned",
    oracle=f"""
    WITH rev AS (
        SELECT o_custkey, {dsum_sql('o_totalprice')} AS r
        FROM orders GROUP BY o_custkey
    ),
    binned AS (
        SELECT n.n_name,
               CAST(FLOOR(rev.r / {_GB_W!r}) AS BIGINT) AS bin,
               COUNT(*) AS c,
               {dsum_sql('rev.r')} AS m
        FROM rev
        JOIN customer c ON c.c_custkey = rev.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name, 2
    ),
    cum AS (
        SELECT n_name, bin, c, m,
               SUM(c) OVER (PARTITION BY n_name) AS cnt,
               CAST(ROUND(SUM(CAST(m AS DECIMAL(38,10)))
                   OVER (PARTITION BY n_name), 4) AS DOUBLE) AS tot,
               CAST(ROUND(SUM(CAST(m AS DECIMAL(38,10)))
                   OVER (PARTITION BY n_name ORDER BY bin
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   4) AS DOUBLE) AS cumm
        FROM binned
    ),
    terms AS (
        SELECT n_name, cnt,
               round((CAST(c AS DOUBLE) * (2.0 * cumm - m))
                     / (CAST(cnt AS DOUBLE) * tot), 10) AS term
        FROM cum
    )
    SELECT n_name,
           CAST(MAX(cnt) AS BIGINT) AS n_cust,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           round(1.0 - CAST(ROUND(SUM(CAST(term AS DECIMAL(38,12))), 8)
                            AS DOUBLE), 6) AS gini_binned
    FROM terms
    GROUP BY n_name
    """,
    tags=("stats", "scale-variant"),
)
def q_gini_binned(spark: SparkSession, d: str):
    """Binned-Lorenz Gini coefficient per nation — the 100 TB form
    q_gini's docstring names: instead of ranking every customer
    (per-nation window over the full customer set), revenues
    accumulate into fixed-width bins and the Gini integrates the
    discrete Lorenz curve over the BOUNDED bins table
    (G = 1 − Σ_b p_b·(L_b + L_{b−1}), trapezoidal rule; equivalently
    1 − Σ c·(2·cumM − m)/(n·tot)).

    The only corpus-sized exchange is the customer-keyed revenue
    reduce (same as exact q_gini); binning replaces the rank window
    with a bins-keyed aggregate plus nation-partitioned prefix sums
    over ≤ (max revenue / width) rows. Approximation error is bounded
    by within-bin ordering only — tests/test_analytics26.py proves
    closeness to the exact q_gini on the fixture. Bin masses use the
    exact-decimal contract; per-bin Lorenz terms share operation order
    with the oracle, rounded 10 dp, then exact-decimal summed."""
    orders = load_table(spark, d, "orders")
    cust = load_table(spark, d, "customer")
    nation = load_table(spark, d, "nation")
    rev = orders.groupBy("o_custkey").agg(dsum("o_totalprice").alias("r"))
    binned = (
        rev.join(cust, rev.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.floor(F.col("r") / _GB_W).cast("bigint").alias("bin"))
        .agg(F.count(F.lit(1)).alias("c"), dsum("r").alias("m"))
    )
    wn = Window.partitionBy("n_name")
    wb = wn.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = binned.select(
        "n_name",
        "bin",
        "c",
        "m",
        F.sum("c").over(wn).alias("cnt"),
        F.round(F.sum(F.col("m").cast(DEC)).over(wn), 4)
        .cast("double")
        .alias("tot"),
        F.round(F.sum(F.col("m").cast(DEC)).over(wb), 4)
        .cast("double")
        .alias("cumm"),
    )
    terms = cum.select(
        "n_name",
        "cnt",
        F.round(
            (F.col("c").cast("double") * (2.0 * F.col("cumm") - F.col("m")))
            / (F.col("cnt").cast("double") * F.col("tot")),
            10,
        ).alias("term"),
    )
    return terms.groupBy("n_name").agg(
        F.max("cnt").cast("bigint").alias("n_cust"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.round(
            1.0
            - F.round(F.sum(F.col("term").cast("decimal(38,12)")), 8).cast(
                "double"
            ),
            6,
        ).alias("gini_binned"),
    )


# Robust-scaling outlier multiplier (Tukey-style fence on the
# median/IQR scale) — shared literal.
_RS_K = 1.5


@query(
    "q_robust_scale",
    oracle=f"""
    WITH pct AS (
        SELECT event_type,
               quantile_cont(value, 0.25) AS q1,
               quantile_cont(value, 0.50) AS med,
               quantile_cont(value, 0.75) AS q3
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(MIN(p.med), 6) AS median_,
           round(MIN(p.q3 - p.q1), 6) AS iqr,
           CAST(COUNT(*) FILTER (
               WHERE round(abs(e.value - p.med), 6)
                     > round({_RS_K!r} * (p.q3 - p.q1), 6)) AS BIGINT)
               AS n_outliers,
           round(CAST(COUNT(*) FILTER (
               WHERE round(abs(e.value - p.med), 6)
                     > round({_RS_K!r} * (p.q3 - p.q1), 6)) AS DOUBLE)
               / COUNT(*), 6) AS outlier_rate
    FROM events e JOIN pct p ON p.event_type = e.event_type
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
    tags=("stats", "cleaning"),
)
def q_robust_scale(spark: SparkSession, d: str):
    """Robust (median/IQR) scaling report per event type: exact
    interpolated quartiles, and the count of rows whose |x − median|
    exceeds 1.5·IQR — the quartile-based fence that complements the
    MAD gate (q_anomaly_mad) and the p05/p95 clip (q_winsorize) as the
    third standard robust-preprocessing primitive.

    The quartile table is one grouped aggregation to |types| rows,
    broadcast back onto a single fact scan; both sides of the fence
    comparison are rounded 6 dp first (round-before-compare,
    ALIGNMENT) so a last-ulp difference can never flip a count."""
    return robust_scale_report(load_table(spark, d, "events"))


def robust_scale_report(e):
    """Composable form over any events-shaped frame — also the
    foreachBatch streaming twin's per-batch transform
    (tests/test_streaming.py)."""
    pct = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.50)).alias("med"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
    )
    out = F.round(F.abs(F.col("value") - F.col("med")), 6) > F.round(
        _RS_K * (F.col("q3") - F.col("q1")), 6
    )
    return (
        e.join(F.broadcast(pct), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("med"), 6).alias("median_"),
            F.round(F.min(F.col("q3") - F.col("q1")), 6).alias("iqr"),
            F.sum(out.cast("long")).alias("n_outliers"),
            F.round(
                F.sum(out.cast("long")).cast("double") / F.count(F.lit(1)), 6
            ).alias("outlier_rate"),
        )
        .orderBy("event_type")
    )


# Hill-estimator tail threshold for events.value — shared literal.
_PL_XMIN = 100.0


@query(
    "q_power_law_alpha",
    oracle=f"""
    WITH tail AS (
        SELECT round(ln(value / {_PL_XMIN!r}), 9) AS lt
        FROM events WHERE value > {_PL_XMIN!r}
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_tail,
           round(1.0 + CAST(COUNT(*) AS DOUBLE)
                 / NULLIF(CAST(ROUND(SUM(CAST(lt AS DECIMAL(38,10))), 6)
                               AS DOUBLE), 0.0),
                 6) AS alpha
    FROM tail
    """,
    tags=("stats", "distribution"),
)
def q_power_law_alpha(spark: SparkSession, d: str):
    """Hill maximum-likelihood estimate of the power-law tail exponent
    of events.value above x_min = 100: α = 1 + n / Σ ln(x/x_min) — the
    heavy-tail diagnostic behind degree distributions, document-length
    tails, and revenue concentration (α ≤ 2 means an infinite-variance
    tail where mean-based monitoring is meaningless).

    One filtered scan, one map-side-combined aggregate. The ln terms
    are rounded 9 dp per element before the exact decimal sum (the
    q_psi transcendental discipline), so both engines sum identical
    values in any order."""
    e = load_table(spark, d, "events").filter(F.col("value") > _PL_XMIN)
    lt = F.round(F.log(F.col("value") / _PL_XMIN), 9)
    return e.select(lt.alias("lt")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tail"),
        # NULLIF: ANSI Spark throws on /0 — a tail sitting entirely at
        # x_min (rounded-ln sum 0) must yield NULL, not a crash
        F.round(
            1.0
            + F.count(F.lit(1)).cast("double")
            / F.nullif(
                F.round(F.sum(F.col("lt").cast(DEC)), 6).cast("double"),
                F.lit(0.0),
            ),
            6,
        ).alias("alpha"),
    )


@query(
    "q_entropy_hour",
    oracle="""
    WITH cells AS (
        SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour_of_day,
               event_type, COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ),
    terms AS (
        SELECT hour_of_day, c,
               SUM(c) OVER (PARTITION BY hour_of_day) AS tot,
               round((CAST(c AS DOUBLE)
                      / SUM(c) OVER (PARTITION BY hour_of_day))
                     * ln(CAST(c AS DOUBLE)
                          / SUM(c) OVER (PARTITION BY hour_of_day)), 9)
                   AS term
        FROM cells
    )
    SELECT hour_of_day,
           CAST(MAX(tot) AS BIGINT) AS n,
           round(-CAST(ROUND(SUM(CAST(term AS DECIMAL(38,10))), 6)
                       AS DOUBLE), 6) AS entropy
    FROM terms
    GROUP BY hour_of_day
    """,
    tags=("events", "profiling"),
)
def q_entropy_hour(spark: SparkSession, d: str):
    """Shannon entropy of the event-type mix per hour of day — when is
    traffic most behaviorally diverse? The load-profile diagnostic
    that separates "volume peaks" from "behavior shifts" (an hour can
    double its events while the mix entropy stays flat — or keep its
    volume while the mix collapses to one type, the bot signature).

    One grid-keyed aggregate (≤ 24·|types| cells), entropy terms on
    the bounded grid with the share window partitioned per hour. The
    p·ln p terms are rounded 9 dp before the exact decimal sum (q_psi
    discipline); p is a ratio of exact counts."""
    return entropy_hour_grid(load_table(spark, d, "events"))


def entropy_hour_grid(ev):
    """Composable form over any events-shaped frame — also the
    foreachBatch streaming twin's per-batch transform
    (tests/test_streaming.py)."""
    cells = (
        ev
        .groupBy(
            F.hour("ts").cast("bigint").alias("hour_of_day"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wh = Window.partitionBy("hour_of_day")
    p = F.col("c").cast("double") / F.sum("c").over(wh)
    terms = cells.select(
        "hour_of_day",
        F.sum("c").over(wh).alias("tot"),
        F.round(p * F.log(p), 9).alias("term"),
    )
    return terms.groupBy("hour_of_day").agg(
        F.max("tot").cast("bigint").alias("n"),
        F.round(
            -F.round(F.sum(F.col("term").cast(DEC)), 6).cast("double"), 6
        ).alias("entropy"),
    )
