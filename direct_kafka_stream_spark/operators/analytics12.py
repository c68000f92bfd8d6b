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
from direct_kafka_stream_spark.io import load_table
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
           round(det0 / det, 6) AS b0,
           round(det1 / det, 6) AS b1,
           round(det2 / det, 6) AS b2
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
    li = load_table(spark, d, "lineitem")
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
    return m.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(det0 / det, 6).alias("b0"),
        F.round(det1 / det, 6).alias("b1"),
        F.round(det2 / det, 6).alias("b2"),
    )


_PCA_ITERS = 30


def _gram_sql() -> str:
    """(i, j, g) Gram matrix of the embedding table, 0-indexed dims,
    exact-decimal entry sums (the DEFINED G on both engines)."""
    return f"""
        SELECT a.dim AS i, b.dim AS j, {dsum_sql('a.x * b.x')} AS g
        FROM (SELECT vec_id, i - 1 AS dim, CAST(x AS DOUBLE) AS x
              FROM (SELECT vec_id, unnest(embedding) AS x,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings)) a
        JOIN (SELECT vec_id, i - 1 AS dim, CAST(x AS DOUBLE) AS x
              FROM (SELECT vec_id, unnest(embedding) AS x,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings)) b
          ON b.vec_id = a.vec_id
        GROUP BY a.dim, b.dim
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
    G = XᵀX built by a vec-keyed dim-pair self-join (d²-bounded
    output: 4096 rows for d=64, at ANY corpus size; per-vector
    fan-out is d², the standard covariance construction). G is then
    collected (d²-bounded, the q_kmeans_train pattern) and 30
    max-normalized power iterations run driver-side. Iterating
    distributedly would cost 30 tiny jobs for a matrix that fits in
    L2 cache. Exactness: G's entries use the exact-decimal contract
    (identical on both engines); iteration drift is contracted by
    convergence (q_markov_stationary precedent) and the result is
    sign-canonicalized (largest-|loading| dim positive) and rounded
    6dp."""
    emb = load_table(spark, d, "embeddings")
    ev = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "xf")
    ).select("vec_id", "dim", F.col("xf").cast("double").alias("x"))
    a = ev.select(
        F.col("vec_id"), F.col("dim").alias("i"), F.col("x").alias("xa")
    )
    b = ev.select(
        F.col("vec_id"), F.col("dim").alias("j"), F.col("x").alias("xb")
    )
    gram = (
        a.join(b, "vec_id")
        .groupBy("i", "j")
        .agg(dsum(F.col("xa") * F.col("xb")).alias("g"))
    )
    g_rows = gram.collect()  # d²-bounded: 4096 rows for d=64
    dims = sorted({r["i"] for r in g_rows})
    if not dims:  # empty corpus: no direction to report
        return spark.createDataFrame([], "dim bigint, loading double")
    g = {(r["i"], r["j"]): r["g"] for r in g_rows}
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
