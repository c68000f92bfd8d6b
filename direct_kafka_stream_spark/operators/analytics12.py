"""Round-4 linear-algebra ML primitives: multi-feature OLS via the
normal equations (Cramer's rule — regression TRAINING as pure SQL)
and the corpus's top principal component via Gram-matrix power
iteration (the q_kmeans_train / q_markov_stationary driver-loop
pattern).

Reference anchor: EXT operators per SURVEY.md §2 (the reference's
processing hook is KafkaDirectStream.scala:43-51).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from direct_kafka_stream_spark.exprs import dsum, dsum_sql
from direct_kafka_stream_spark.io import load_table, spread_scan
from direct_kafka_stream_spark.registry import query


@query(
    "q_ols_multi",
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
        SELECT n, s1, s2, sy, s1y, s2y,
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
           round(det0 / NULLIF(det, 0.0), 6) AS b0,
           round(det1 / NULLIF(det, 0.0), 6) AS b1,
           round(det2 / NULLIF(det, 0.0), 6) AS b2
    FROM solved
    """,
    tags=("ml", "regression"),
)
def q_ols_multi(spark: SparkSession, d: str):
    """Two-feature linear regression trained in one SQL pass:
    l_extendedprice ~ b0 + b1*l_quantity + b2*l_discount via the
    normal equations, with the 3x3 system solved by Cramer's rule on
    the moment sums — multi-feature regression TRAINING as a
    distributed aggregation (the engine-native regr_slope surface in
    q_agg_regression is single-feature only).

    Scale shape: ONE map-side-combined aggregation produces the nine
    sufficient moments; everything after is scalar arithmetic on one
    row. Exactness: every moment goes through the exact-decimal
    contract (identical rounded inputs on both engines), and the
    determinant expressions are written in the SAME operation order
    on both sides, so the IEEE arithmetic is bit-identical; final
    coefficients rounded 6dp."""
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
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    sy, s11, s12 = F.col("sy"), F.col("s11"), F.col("s12")
    s22, s1y, s2y = F.col("s22"), F.col("s1y"), F.col("s2y")
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    det0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1 * (s1y * s22 - s12 * s2y)
        + s2 * (s1y * s12 - s11 * s2y)
    )
    det1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    )
    det2 = (
        n * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2)
    )
    # NULLIF: constant features make the normal equations singular —
    # coefficients are undefined (NULL), not an ANSI abort
    detg = F.nullif(det, F.lit(0.0))
    return m.select(
        n.cast("bigint").alias("n"),
        F.round(det0 / detg, 6).alias("b0"),
        F.round(det1 / detg, 6).alias("b1"),
        F.round(det2 / detg, 6).alias("b2"),
    )


_PCA_ITERS = 30


def _gram_sql() -> str:
    """(i, j, g) Gram matrix of the embedding table, 0-indexed dims —
    the DEFINED G on both engines: elements are quantized ONCE to 6 dp
    (exact decimal cast — one cast per element, not per term), entries
    are exact integer sums of the scaled products, and g converts back
    via integer half-away-from-zero rounding to scale 4 then one exact
    double division. Fully order-independent, and the hot path is pure
    64-bit integer arithmetic instead of per-term BigDecimal."""
    return """
        WITH eq AS (
            SELECT vec_id, i - 1 AS dim,
                   CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6))
                        * 1000000 AS BIGINT) AS q
            FROM (SELECT vec_id, unnest(embedding) AS x,
                         generate_subscripts(embedding, 1) AS i
                  FROM embeddings)
        ),
        tot AS (
            SELECT a.dim AS i, b.dim AS j, SUM(a.q * b.q) AS total
            FROM eq a JOIN eq b ON b.vec_id = a.vec_id
            GROUP BY a.dim, b.dim
        )
        SELECT i, j,
               CAST((CASE WHEN total < 0 THEN -1 ELSE 1 END)
                    * (abs(total) // 100000000
                       + CASE WHEN abs(total) % 100000000 >= 50000000
                              THEN 1 ELSE 0 END)
                  AS DOUBLE) / 10000.0 AS g
        FROM tot
    """


def _pca_oracle() -> str:
    stages = [
        """
    dims AS MATERIALIZED (SELECT DISTINCT i AS dim FROM G),
    v0 AS MATERIALIZED (SELECT dim, 1.0 AS x FROM dims)"""
    ]
    for k in range(_PCA_ITERS):
        stages.append(
            f"""
    w{k} AS MATERIALIZED (
        SELECT G.i AS dim, SUM(G.g * v{k}.x) AS x
        FROM G JOIN v{k} ON v{k}.dim = G.j
        GROUP BY G.i
    ),
    v{k + 1} AS MATERIALIZED (
        SELECT dim, x / (SELECT MAX(ABS(x)) FROM w{k}) AS x FROM w{k}
    )"""
        )
    return (
        f"WITH G AS MATERIALIZED ({_gram_sql()}),"
        + ",".join(stages)
        + f"""
    , pick AS (
        SELECT dim FROM v{_PCA_ITERS} ORDER BY ABS(x) DESC, dim LIMIT 1
    ),
    sgn AS (
        SELECT CASE WHEN v.x < 0 THEN -1.0 ELSE 1.0 END AS s
        FROM v{_PCA_ITERS} v JOIN pick ON pick.dim = v.dim
    )
    SELECT CAST(v.dim AS BIGINT) AS dim, round(v.x * sgn.s, 6) AS loading
    FROM v{_PCA_ITERS} v CROSS JOIN sgn
    ORDER BY dim
    """
    )


@query(
    "q_pca_power",
    oracle=_pca_oracle(),
    tags=("ml", "iterative"),
)
def q_pca_power(spark: SparkSession, d: str):
    """Top principal direction of the embedding corpus via power
    iteration on the Gram matrix — the dimensionality-reduction
    primitive behind whitening, spectral outlier detection, and the
    "dominant drift direction" diagnostic for embedding spaces.

    Scale shape: the distributed work is ONE pass — the Gram matrix
    G = XᵀX built WITHOUT any join: each embedding is quantized ONCE
    to 6 dp (exact decimal cast per ELEMENT — n·d casts, not n·d²),
    then each row generates its own upper-triangle (i, j, q_i·q_j)
    integer terms inline (two nested posexplodes, the second over the
    i-suffix slice of the same quantized array). Map-side partial
    aggregation reduces every task to ≤ d(d+1)/2 groups before the
    single (i,j)-keyed shuffle, and the per-group sums are plain
    64-bit longs split hi/lo at 2^30 so neither partial can overflow
    below ~2^33 rows per group (q ≤ 1e6·|x|max, product ≤ ~1e12 ⇒
    hi ≤ ~2^12 — the hi sum is safe to ~2^50 rows). The exact scaled
    totals are reconstructed in arbitrary-precision Python from the
    collected triangle (d²-bounded, the q_kmeans_train pattern), the
    symmetric half mirrored (q_i·q_j ≡ q_j·q_i in ℤ), and 30
    max-normalized power iterations run driver-side. Iterating
    distributedly would cost 30 tiny jobs for a matrix that fits in
    L2 cache. Exactness: G is DEFINED identically on both engines
    (quantize → integer sum → half-away round to scale 4 → one exact
    double division); iteration drift is contracted by convergence
    (q_markov_stationary precedent) and the result is
    sign-canonicalized (largest-|loading| dim positive) and rounded
    6dp."""
    emb = load_table(spark, d, "embeddings")
    eq = emb.select(
        F.transform(
            F.col("embedding"),
            lambda x: (
                x.cast("double").cast("decimal(18,6)") * F.lit(1000000)
            ).cast("long"),
        ).alias("eq")
    )
    up = (
        eq.select(F.posexplode("eq").alias("i", "qa"), F.col("eq"))
        .select(
            "i",
            "qa",
            F.posexplode(F.expr("slice(eq, i + 1, size(eq))")).alias(
                "p", "qb"
            ),
        )
        .select(
            "i",
            (F.col("i") + F.col("p")).alias("j"),
            (F.col("qa") * F.col("qb")).alias("ts"),
        )
    )
    hi = F.shiftright(F.col("ts"), 30)
    gram = (
        up.select(
            "i",
            "j",
            hi.alias("hi"),
            (F.col("ts") - F.shiftleft(hi, 30)).alias("lo"),
        )
        .groupBy("i", "j")
        .agg(F.sum("hi").alias("sh"), F.sum("lo").alias("sl"))
    )
    g_rows = gram.collect()  # triangle-bounded: d(d+1)/2 = 2080 for d=64
    dims = sorted({r["i"] for r in g_rows})
    if not dims:  # empty corpus: no direction to report
        return spark.createDataFrame([], "dim bigint, loading double")

    def _g_val(sh: int, sl: int) -> float:
        # exact: total = Σ q_i·q_j (scale 1e12); half-away-from-zero
        # round to scale 4, then ONE correctly-rounded double division
        total = sh * (1 << 30) + sl
        q8, rem = divmod(abs(total), 10**8)
        r = q8 + (1 if rem >= 5 * 10**7 else 0)
        return (-r if total < 0 else r) / 10000.0

    g = {}
    for row in g_rows:
        val = _g_val(row["sh"], row["sl"])
        g[(row["i"], row["j"])] = val
        g[(row["j"], row["i"])] = val
    v = {i: 1.0 for i in dims}
    for _ in range(_PCA_ITERS):
        w = {
            i: sum(g.get((i, j), 0.0) * v[j] for j in dims) for i in dims
        }
        m = max(abs(x) for x in w.values())
        v = {i: x / m for i, x in w.items()}
    pick = max(dims, key=lambda i: (abs(v[i]), -i))
    sgn = -1.0 if v[pick] < 0 else 1.0
    import math

    rows = [
        (i, math.floor(v[i] * sgn * 1e6 + 0.5) / 1e6
         if v[i] * sgn >= 0
         else -(math.floor(-v[i] * sgn * 1e6 + 0.5) / 1e6))
        for i in dims
    ]
    return spark.createDataFrame(rows, "dim bigint, loading double")
