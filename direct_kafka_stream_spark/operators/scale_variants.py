"""Scale-safe variants of operators whose exact forms need a global
total order (single-partition window) — the two `weak`-list items from
the round-3 audit, converted to bounded-window equivalents:

  * q_drift_ks_binned — two-sample KS over an equi-width binned ECDF
    (q_hist_equi's shape): the running window shrinks from
    |distinct values| rows (~all rows for a double column) to ≤ ~1000
    bin rows, a driver-trivial second pass at any corpus size.
  * q_islands_ranged — gaps-and-islands computed per key-range bucket
    (all buckets in parallel) with islands touching bucket edges
    stitched in a buckets-sized second pass.

Each exact-form operator (q_drift_ks, q_islands) remains registered as
the semantics anchor; these are the forms you run at 100 TB.

Reference anchor: EXT operators per SURVEY.md §2 (the reference's
processing hook is KafkaDirectStream.scala:43-51).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.window import Window

from direct_kafka_stream_spark.exprs import bounded_window_key
from direct_kafka_stream_spark.io import load_table
from direct_kafka_stream_spark.registry import query

# Fixed bin width for the binned KS ECDF (events.value spans ~0-350 in
# the fixture → ~700 bins; a fixed width keeps the bin id a pure
# per-row expression, no global min/max pre-pass — q_hist_equi's
# contract).
_KSB_W = 0.5


@query(
    "q_drift_ks_binned",
    oracle=f"""
    WITH a AS (SELECT value AS v FROM events WHERE event_type = 'view'),
    b AS (SELECT value AS v FROM events WHERE event_type = 'error'),
    pooled AS (
        SELECT CAST(FLOOR(v / {_KSB_W}) AS BIGINT) AS bin,
               1 AS in_a, 0 AS in_b FROM a
        UNION ALL
        SELECT CAST(FLOOR(v / {_KSB_W}) AS BIGINT), 0, 1 FROM b
    ),
    perb AS (
        SELECT bin, SUM(in_a) AS ca, SUM(in_b) AS cb
        FROM pooled GROUP BY bin
    ),
    cdf AS (
        SELECT SUM(ca) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) * 1.0
                   / (SELECT NULLIF(COUNT(*), 0) FROM a) AS fa,
               SUM(cb) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) * 1.0
                   / (SELECT NULLIF(COUNT(*), 0) FROM b) AS fb
        FROM perb
    )
    SELECT round(MAX(ABS(fa - fb)), 6) AS ks_binned,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS n_a,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS n_b,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM perb) AS n_bins
    FROM cdf
    """,
    tags=("features", "drift", "scale-variant"),
)
def q_drift_ks_binned(spark: SparkSession, d: str):
    """Binned-ECDF two-sample KS drift statistic — the 100 TB form of
    q_drift_ks named in its docstring. Values bin to
    floor(v / _KSB_W) (equi-width, pure per-row expression), per-bin
    counts aggregate map-side-combined, and the running-CDF window runs
    over ≤ ~1000 BIN rows instead of the distinct pooled value domain —
    the engine's only unbounded single-partition window becomes a
    bounded one. KS over the binned CDFs equals the exact KS evaluated
    at bin right-edges: a conservative estimate within max bin
    probability mass of exact, the standard monitoring trade
    (histogram-sketch KS). Same operator tree as q_drift_ks otherwise;
    both CDF denominators carry the NULLIF empty-sample guard."""
    e = load_table(spark, d, "events")
    a = e.filter(F.col("event_type") == "view").select(
        F.col("value").alias("v"),
        F.lit(1).alias("in_a"),
        F.lit(0).alias("in_b"),
    )
    b = e.filter(F.col("event_type") == "error").select(
        F.col("value").alias("v"),
        F.lit(0).alias("in_a"),
        F.lit(1).alias("in_b"),
    )
    na = a.agg(F.count(F.lit(1)).alias("n_a"))
    nb = b.agg(F.count(F.lit(1)).alias("n_b"))
    perb = (
        a.unionAll(b)
        .select(
            F.floor(F.col("v") / _KSB_W).cast("long").alias("bin"),
            "in_a",
            "in_b",
        )
        .groupBy("bin")
        .agg(F.sum("in_a").alias("ca"), F.sum("in_b").alias("cb"))
    )
    nbins = perb.agg(F.count(F.lit(1)).cast("long").alias("n_bins"))
    # literal key: bins-sized frame, one-partition window intended
    w = Window.partitionBy(bounded_window_key("bin")).orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cdf = (
        perb.crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select(
            "n_a",
            "n_b",
            (F.sum("ca").over(w) / F.nullif(F.col("n_a"), F.lit(0))).alias("fa"),
            (F.sum("cb").over(w) / F.nullif(F.col("n_b"), F.lit(0))).alias("fb"),
        )
    )
    return (
        cdf.agg(
            F.round(F.max(F.abs(F.col("fa") - F.col("fb"))), 6).alias("ks_binned"),
            F.coalesce(F.first("n_a"), F.lit(0).cast("long")).alias("n_a"),
            F.coalesce(F.first("n_b"), F.lit(0).cast("long")).alias("n_b"),
        )
        .crossJoin(F.broadcast(nbins))
    )


# Key-range bucket width for ranged islands. Small enough that the
# sf0.001 fixture (keys 0-1499) spans many buckets and islands cross
# bucket edges — the stitch pass is genuinely exercised, not a no-op.
_ISL_BUCKET = 128


@query(
    "q_islands_ranged",
    oracle="""
    WITH keys AS (
        SELECT DISTINCT o_orderkey AS k FROM orders
        WHERE o_orderstatus = 'O'
    ),
    grp AS (
        SELECT k, k - ROW_NUMBER() OVER (ORDER BY k) AS island
        FROM keys
    )
    SELECT MIN(k) AS island_start,
           MAX(k) AS island_end,
           COUNT(*) AS island_len
    FROM grp GROUP BY island
    ORDER BY island_start
    """,
    tags=("pattern", "window", "scale-variant"),
)
def q_islands_ranged(spark: SparkSession, d: str):
    """Partition-range gaps-and-islands — the 100 TB form of q_islands
    named in its docstring, over the gappy key set of open orders
    (status 'O'; the full orderkey domain is dense in the fixture,
    which would make stitching trivial).

    Phase 1: bucket keys by floor(k / _ISL_BUCKET) and run the
    k − row_number() island trick WITHIN each bucket — the window is
    partitioned by bucket, so every executor sorts only its own
    bounded key range; no global sort, no single-partition exchange
    over the fact key set.

    Phase 2 (the buckets-sized merge): local islands are disjoint and
    sorted by start; an island continues its predecessor iff
    start = prev_end + 1 (only possible at bucket edges). The classic
    flag + running-sum grouping merges chains that span any number of
    buckets. This window runs over the LOCAL ISLAND list — bounded by
    (#true islands + #buckets) rows, not keys — the 'partitions-sized
    second pass' of the exact operator's scale note.

    The oracle is the exact global-window SQL over the same key set:
    the correctness check IS 'ranged+stitched ≡ exact'."""
    keys = (
        load_table(spark, d, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    return ranged_islands(keys)


def ranged_islands(keys, bucket_width: int = _ISL_BUCKET):
    """Composable form of q_islands_ranged over any distinct-key
    DataFrame with a single long column ``k`` — also driven by the
    adversarial stitch tests (islands spanning several buckets,
    edge-aligned islands, singletons) in tests/test_features.py."""
    w_local = Window.partitionBy("bucket").orderBy("k")
    local = (
        keys.select("k", F.floor(F.col("k") / bucket_width).alias("bucket"))
        .select(
            "bucket",
            "k",
            (F.col("k") - F.row_number().over(w_local)).alias("grp"),
        )
        .groupBy("bucket", "grp")
        .agg(
            F.min("k").alias("s"),
            F.max("k").alias("e"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    w_g = Window.partitionBy(bounded_window_key("s")).orderBy("s")
    flagged = local.select(
        "s",
        "e",
        "n",
        F.when(F.col("s") == F.lag("e").over(w_g) + 1, 0)
        .otherwise(1)
        .alias("new_grp"),
    )
    w_cum = Window.partitionBy(bounded_window_key("s")).orderBy("s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    grouped = flagged.select(
        "s", "e", "n", F.sum("new_grp").over(w_cum).alias("gid")
    )
    return (
        grouped.groupBy("gid")
        .agg(
            F.min("s").alias("island_start"),
            F.max("e").alias("island_end"),
            F.sum("n").alias("island_len"),
        )
        .drop("gid")
        .orderBy("island_start")
    )


# Decile boundaries for the scale-safe quantile binning.
_QB_PCTS = tuple(round(0.1 * i, 1) for i in range(1, 10))


def _qb_oracle() -> str:
    bounds = ", ".join(
        f"quantile_cont(o_totalprice, {p}) AS b{i + 1}"
        for i, p in enumerate(_QB_PCTS)
    )
    binexpr = " + ".join(
        f"(CASE WHEN o_totalprice > b{i + 1} THEN 1 ELSE 0 END)"
        for i in range(len(_QB_PCTS))
    )
    return f"""
    WITH bs AS (SELECT {bounds} FROM orders)
    SELECT 1 + {binexpr} AS bin,
           COUNT(*) AS n,
           round(MIN(o_totalprice), 2) AS lo,
           round(MAX(o_totalprice), 2) AS hi
    FROM orders, bs
    GROUP BY bin
    ORDER BY bin
    """


@query(
    "q_quantile_bins_scaled",
    oracle=_qb_oracle(),
    tags=("profiling", "histogram", "scale-variant"),
)
def q_quantile_bins_scaled(spark: SparkSession, d: str):
    """Boundary-based decile binning — the 100 TB form named in
    q_quantile_bins' docstring: compute 9 decile BOUNDARIES once
    (here the exact interpolating percentile, which is bit-identical
    to DuckDB's quantile_cont per ALIGNMENT.md; at 100 TB swap in the
    one-pass approx_percentile sketch), broadcast the 9 doubles, and
    assign each row's bin with a pure per-row comparison — no global
    NTILE sort over the fact table, so the per-row transform
    map-side-combines like any histogram.

    Semantics note: boundary binning puts boundary-equal values in the
    LOWER bin (v > b strictly advances), so counts differ from NTILE's
    exact equal-splits at ties — that is the documented trade of the
    scale path, and both engines apply the identical rule to identical
    boundary doubles."""
    o = load_table(spark, d, "orders")
    pcts = F.array(*[F.lit(p) for p in _QB_PCTS])
    bs = o.agg(F.percentile("o_totalprice", pcts).alias("bs")).select(
        *[
            F.element_at("bs", i + 1).alias(f"b{i + 1}")
            for i in range(len(_QB_PCTS))
        ]
    )
    bin_col = F.lit(1)
    for i in range(len(_QB_PCTS)):
        bin_col = bin_col + F.when(
            F.col("o_totalprice") > F.col(f"b{i + 1}"), 1
        ).otherwise(0)
    return (
        o.crossJoin(F.broadcast(bs))
        .select("o_totalprice", bin_col.alias("bin"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bin")
    )
