"""Degenerate-but-valid data robustness: constant numeric columns and
coincident embeddings must degrade statistics to NULL, never abort.

Spark 4 runs ANSI mode — an unguarded double division by zero THROWS
(`DIVIDE_BY_ZERO`), so a zero-variance slice would kill a whole
1000-executor job at the final aggregate. A full-registry sweep found
ten operators with reachable unguarded divisions (corr-family
aggregates included: the BUILT-IN `corr` throws under ANSI on a
constant column); all now carry NULLIF guards mirrored in their
oracles. This suite pins every formerly-crashing operator on the
degenerate fixture plus spot-checks that defined sub-results survive.
"""

from __future__ import annotations

import duckdb
import pytest

from direct_kafka_stream_spark import QUERIES, TABLES, load_table

from tests.conftest import SF_DIR

# Operators the ANSI sweep found crashing on constant data, with the
# columns expected NULL (undefined statistic) on the degenerate input.
_FORMERLY_CRASHING = [
    ("q_agg_stats", ("corr_pq",)),
    ("q_ab_test", ("z_score",)),
    ("q_corr_matrix", ("r",)),
    ("q_psi", ()),
    ("q_ols_multi", ("b0", "b1", "b2")),
    ("q_uplift_segments", ("z_score",)),
    ("q_lof_bucketed", ()),
    ("q_mann_whitney", ("z",)),
    ("q_welch_ttest", ("t", "df")),
    ("q_spearman", ("rho",)),
    # round-6 additions: all divisions NULLIF-guarded at birth (never
    # crashed) — listed here so the constant fixture keeps pinning them
    ("q_cuped", ()),
    ("q_mde_power", ()),
    ("q_permutation_test", ()),
    ("q_durbin_watson", ()),
    ("q_qq_plot", ()),
    ("q_auc_pr", ()),
    ("q_ece", ()),
    ("q_lift_gain", ()),
    ("q_wilson_ci", ()),
    ("q_cochran_armitage", ()),
    ("q_mcnemar", ()),
    ("q_nelson_aalen", ()),
    ("q_silhouette_approx", ()),
    ("q_embed_diversity", ()),
    ("q_kcenter_coreset", ()),
    # all-tied values: the tie-correction denominator 1 - Σ(t³-t)/(N³-N)
    # is exactly 0, so the corrected statistic must degrade to NULL
    ("q_kruskal_wallis", ("h_corrected",)),
    ("q_brier", ()),
    ("q_join_bloom", ()),
    ("q_ivm_join", ()),
    ("q_l_diversity", ()),
    ("q_shapley_attribution", ()),
    # constant values: every stratum's sd is 0, the Neyman normalizer
    # Σ N_h σ_h is 0, so every share must degrade to NULL
    ("q_neyman_alloc", ("alloc_share", "alloc_n")),
    ("q_textrank", ()),
    ("q_holt_linear", ()),
    ("q_friedman", ()),
    ("q_propensity_strata", ()),
    ("q_logrank", ()),
    # constant value 5.0: no event clears the high-value threshold, so
    # every column-1 margin is 0 — chi2 variance and the MH odds ratio
    # must degrade to NULL
    ("q_cmh", ("chi2_cmh", "odds_ratio_mh")),
    # round-7: constant features make the normal equations singular —
    # the ML path must gate on the SAME Cramer determinant the oracle
    # NULLIFs, not on ML's zero-coefficient degradation
    ("q_ml_linreg", ("b0", "b1", "b2")),
]


@pytest.fixture(scope="module")
def degen_dir(tmp_path_factory):
    """Constant numeric measures everywhere; every embedding equal."""
    d = tmp_path_factory.mktemp("degen_sf")
    duckdb.sql(
        f"COPY (SELECT event_id, ts, user_id, event_type, "
        f"CAST(5.0 AS DOUBLE) AS value, props "
        f"FROM '{SF_DIR}/events.parquet') "
        f"TO '{d}/events.parquet' (FORMAT PARQUET)"
    )
    duckdb.sql(
        f"COPY (SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, "
        f"CAST(7.0 AS DOUBLE) AS l_quantity, "
        f"CAST(100.0 AS DOUBLE) AS l_extendedprice, "
        f"CAST(0.05 AS DOUBLE) AS l_discount, "
        f"CAST(0.01 AS DOUBLE) AS l_tax, "
        f"l_returnflag, l_linestatus, l_shipdate "
        f"FROM '{SF_DIR}/lineitem.parquet') "
        f"TO '{d}/lineitem.parquet' (FORMAT PARQUET)"
    )
    duckdb.sql(
        f"COPY (SELECT o_orderkey, o_custkey, o_orderstatus, "
        f"CAST(1000.0 AS DOUBLE) AS o_totalprice, o_orderdate, "
        f"o_orderpriority FROM '{SF_DIR}/orders.parquet') "
        f"TO '{d}/orders.parquet' (FORMAT PARQUET)"
    )
    duckdb.sql(
        f"COPY (SELECT vec_id, (SELECT embedding FROM "
        f"'{SF_DIR}/embeddings.parquet' WHERE vec_id = 0) AS embedding, "
        f"label FROM '{SF_DIR}/embeddings.parquet') "
        f"TO '{d}/embeddings.parquet' (FORMAT PARQUET)"
    )
    for t in ("region", "nation", "customer", "supplier", "part", "documents"):
        duckdb.sql(
            f"COPY (SELECT * FROM '{SF_DIR}/{t}.parquet') "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(d)


@pytest.mark.parametrize("name, null_cols", _FORMERLY_CRASHING)
def test_degenerate_data_degrades_to_null(spark, degen_dir, name, null_cols):
    rows = QUERIES[name].spark(spark, degen_dir).collect()  # must not raise
    for col in null_cols:
        vals = [getattr(r, col) for r in rows]
        assert vals, f"{name}: no rows to check"
        assert all(v is None for v in vals), f"{name}.{col}: {vals[:5]}"
    # defined sub-results (counts, means of constants) stay non-NULL
    if name == "q_welch_ttest":
        r = rows[0]
        assert r.mean_a == 5.0 and r.mean_b == 5.0
    if name == "q_ols_multi":
        assert rows[0].n > 0


# On constant data the population-variance expression gss/gn - (gs/gn)²
# evaluates to a tiny NEGATIVE float (≈ -1.7e-18), so an unclamped sqrt
# throws OutOfRangeException in DuckDB while Spark silently yields NaN —
# a both-engine divergence. Both queries clamp with GREATEST(·, 0.0) on
# BOTH sides; this pins the clamp by running Spark AND the oracle on
# the constant-value fixture.
@pytest.mark.parametrize("name", ["q_bh_fdr", "q_fisher_method"])
def test_variance_clamp_survives_constant_data(spark, degen_dir, name):
    q = QUERIES[name]
    rows = q.spark(spark, degen_dir).collect()  # must not raise
    assert rows
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{degen_dir}/{t}.parquet'"
        )
    orows = con.sql(q.oracle).fetchall()  # must not raise either
    assert len(orows) == len(rows)
    if name == "q_bh_fdr":
        # zero variance ⇒ z coalesced to 0 ⇒ p_raw = 1 ⇒ nothing rejected
        assert all(r.z == 0.0 and not r.rejected for r in rows)
