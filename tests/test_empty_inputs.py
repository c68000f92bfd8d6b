"""Empty-input robustness: every operator must return an empty (or
well-defined) result on zero-row tables rather than crash — at scale,
empty partitions, empty date ranges, and freshly-created tables are
routine, and a driver-side error on one of them kills the whole job.
Covers the operator families with the most assumptions baked in
(iterative loop seeds, query-vector lookups, ratio denominators,
global windows)."""

from __future__ import annotations

import pytest

from direct_kafka_stream_spark import QUERIES, TABLES, load_table

from tests.conftest import SF_DIR

_REPRESENTATIVE = [
    "q_join_multiway",    # star join + agg
    "q_tpch_q8",          # ratio with empty denominator groups
    "q_text_tfidf",       # broadcast of empty dims
    "q_text_winnow",      # higher-order array ops on no rows
    "q_dedup_near",       # persisted intermediates, self-join
    "q_dedup_components", # iterative loop must converge on no edges
    "q_text_chunk",       # explode over empty
    "q_text_pack",        # global window over empty
    "q_sim_cosine",       # query-vector lookup finds nothing
    "q_rag_retrieve",     # composite with top-k over empty
    "q_funnel",           # scalar subqueries over empty
    "q_retention",        # self-join over empty
    "q_scd2",             # lead window over empty
    "q_upsert_merge",     # full outer of two empties
    "q_recursive_calendar",  # recursion independent of data; LEFT JOIN empty
    "q_decontaminate",    # broadcast of an empty eval-gram set
    "q_mix_domains",      # totals over zero domains
    "q_mix_sample",       # rate join over empty corpus
    "q_sim_ann_bucket",   # query-row bucket lookup finds nothing
    "q_kmeans_train",     # trainer seeds missing from empty corpus
    "q_tpch_q17",         # per-part average over empty fact
    "q_tpch_q22",         # anti join + scalar threshold over empty
    # round-3 families
    "q_profile_table",    # global agg + distinct counts over empty
    "q_skew_diagnose",    # share ratio with zero total
    "q_constraint_check", # conditional aggs + anti join over empty
    "q_anomaly_mad",      # grouped medians over empty
    "q_dup_cluster_stats",  # components + histogram over empty
    "q_transition_matrix",  # lag window + normalization over empty
    "q_funnel3",          # chained stage joins over empty
    "q_vocab_coverage",   # top-K vocab from empty corpus
    "q_drift_ks",         # pooled CDF with zero-count denominators
    "q_collocations",     # PMI log of empty counts
    "q_quality_classifier",  # doc-keyed agg over empty token stream
    "q_shard_plan",       # shard histogram over empty corpus
    "q_xml_roundtrip",    # codec round-trip over no rows
    "q_retention_matrix",  # cohort triangle over empty
    "q_dedup_keep_best",  # components + argmax over empty
    "q_embed_outliers",   # centroid distances over empty
    "q_changepoint",      # CUSUM over empty daily series
    "q_ab_test",          # arm rollup with missing arms
    "q_knn_classify",     # probe vector missing from empty corpus
    "q_cohort_ltv",       # purchase join over empty
    "q_audience_overlap", # type self-join over empty
    # round-4 additions
    "q_drift_ks_binned",  # binned CDF with zero-count denominators
    "q_islands_ranged",   # stitch pass over zero local islands
    "q_quantile_bins_scaled",  # NULL percentile boundaries over empty
    "q_rag_bm25",         # NULL avgdl, empty tf table
    "q_boilerplate_ngrams",  # gram df join over empty
    "q_mix_temperature",  # zero-source normalizer
    "q_path_topk",        # user-keyed rank window over empty
    "q_sessionize",       # lag/running-sum windows over empty
    "q_ngram_novelty",    # gram first-owner join over empty
    "q_skyline",          # bounded frontier window over empty
    "q_seq_pattern",      # path aggregation over empty
    "q_bot_burst",        # RANGE frame over empty
    "q_event_debounce",   # lag window over empty
    "q_funnel_latency",   # ungrouped agg + 0/0 rate over empty
    "q_compress_ratio",   # gram explode over empty
    "q_tokenizer_fertility",  # per-lang ratio with zero denominators
    "q_ann_recall",       # probe set missing from empty corpus
    "q_markov_stationary",  # driver loop with an empty state space
    "q_partial_merge",    # merge of zero partials
    "q_triangle_count",   # wedge join over zero edges
    "q_pagerank_step",    # zero-vertex graph
    "q_zonemap_prune",    # zone map of an empty table
    "q_benford",          # digit census with zero total
    "q_gini",             # per-nation rank windows over empty
    "q_funnel_windowed",  # deadline joins over empty anchors
    "q_sax_symbols",      # z-normalization of an empty series
    # round-4 statistics / time-series sweep
    "q_ewma",             # weighted self-join over an empty daily series
    "q_acf",              # corr over zero lag pairs
    "q_cross_corr",       # corr over zero shifted pairs
    "q_corr_matrix",      # one-row corr aggregate over empty (NULL r)
    "q_chi2",             # contingency grid of zero cells
    "q_inter_event",      # lag window over empty
    "q_concurrent_peak",  # sweep-line over zero endpoints
    "q_snapshot_diff",    # full outer of two empty snapshots
    "q_dedup_fuzzy",      # block self-join over empty
    "q_degree_dist",      # degree count with zero vertices
    "q_assoc_rules",      # basket self-join over empty
    "q_winsorize",        # percentile clip over empty groups
    "q_impute",           # median fill over empty groups
    "q_sample_weighted",  # top-k heap over empty corpus
    "q_km_survival",      # risk-set windows over zero durations
    "q_embed_quantize",   # per-dim scales over zero vectors
    "q_user_lifecycle",   # lifecycle windows over zero user-weeks
    "q_dau_mau",          # coverage explode over empty
    "q_rolling_median",   # rolling self-join over an empty series
    "q_seasonal_index",   # dow rollup with NULL overall mean
    "q_pivot_multi_agg",  # explicit-values pivot over empty
    "q_hll_manual",       # all-zero registers, linear-counting branch
    "q_cms_heavy_hitters",  # empty sketch, zero heavy hitters
    "q_bloom_manual",     # zero-bit filter, zero probes
    "q_interval_overlap",  # bucket join over zero intervals
    "q_psi",              # bin shares with NULL totals
    "q_jsd",              # divergence over an empty vocab
    "q_dedup_cross_source",  # rare-gram blocking over empty
    "q_compaction_plan",  # packing plan for zero shards
    "q_win_nav",          # navigation windows over empty
    "q_bpe_merge_step",   # pair census over an empty vocab
    "q_textcat_profiles",  # profiles + argmax over zero docs
    "q_dup_threshold_curve",  # threshold counts over zero pairs
    "q_gopher_rules",     # rule census with 0/0 pass rate
    "q_sample_consistent",  # 0/0 join-sample ratio
    "q_train_test_split",  # split census over zero docs
    "q_zorder_key",       # interleave census over empty
    "q_roc_curve",        # operating points with 0/0 rates
    "q_calibration_bins",  # bins with NULL range width
    "q_ols_multi",        # NULL moments, NULL coefficients
    "q_pca_power",        # empty Gram matrix, no direction
    "q_join_pit",         # LOCF over an empty union stream
    "q_theil_sen",        # median of zero pairwise slopes
    "q_runs_test",        # runs over an empty sign sequence
    "q_lateness_watermark",  # stitched runmax over zero blocks
    "q_decision_stump",   # no valid split on empty
    "q_uplift_segments",  # empty segment cells
    "q_ab_proportions",   # both arms absent, NULL everything
    "q_seasonal_anomaly",  # MAD gate over an empty residual series
    "q_target_encode",    # encoding with NULL prior
    "q_ivm_delta",        # merge of empty view and empty delta
    "q_rrf_fusion",       # fusion of two empty top-k lists
    "q_bfs_hops",         # seed frontier with zero edges, empty nation dim
    "q_interpolate_linear",  # neighbor windows over empty
    "q_did",              # 2x2 cells all empty, NULL estimate
    "q_weighted_median",  # bin CDF over zero bins
    "q_setsim_prefix",    # prefix join over zero shingles
    "q_lof_bucketed",     # kNN graph over zero points
    "q_geo_cell_knn",     # probe neighborhoods over zero points
    "q_item_cf",          # basket self-join over zero baskets
    "q_golden_record",    # survivorship over zero clusters
    "q_bitemporal",       # version windows over an empty ledger
    "q_ndcg",             # per-order ranking windows over empty
    "q_mann_whitney",     # ungrouped rank-sum rollup over empty
    "q_class_metrics",    # centroid argmin over zero vectors
    "q_table_checksum",   # partition fingerprints of an empty table
    "q_bollinger",        # full-frame filter drops every row
    "q_kcore",            # peel loop over zero edges
    "q_mutual_best",      # reciprocity self-join over zero candidates
    "q_welch_ttest",      # moment rollups over two empty samples
    "q_hist2d",           # grid aggregate over empty
    "q_mutual_info",      # top-k vocabulary from an empty corpus
    "q_epoch_shuffle",    # shard windows over zero documents
    "q_sentence_stats",   # higher-order array ops on no rows
    "q_spearman",         # rank moments over an empty table
    "q_link_predict",     # wedge join over zero edges
    "q_cohens_kappa",     # agreement cells over zero documents
    "q_jackknife",        # replicate table over zero buckets
    "q_modularity",       # label propagation over zero edges
    "q_containment_dedup",  # candidate-verify over zero shingles
    "q_median_ci",        # order-stat targets from n = 0
    "q_lag_features",     # lag windows over empty
    "q_hhi",              # share-of-total over zero segments
    # round-5 statistics sweep
    "q_anova",            # group moments over zero groups
    "q_kendall_grid",     # grid pair join over an empty grid
    "q_cusum",            # prefix-min windows over an empty series
    "q_grubbs",           # argmax struct over an empty series
    "q_ridge_closed",     # regularized solve with zero moments
    "q_gini_binned",      # Lorenz bins over zero customers
    "q_robust_scale",     # quartile table over zero groups
    "q_power_law_alpha",  # tail filter drops every row
    "q_entropy_hour",     # mix entropy over an empty grid
    "q_mrr",              # probe set empty, rank windows over empty
    "q_tfidf_cosine",     # inverted index over zero terms
    "q_naive_bayes",      # vocabulary and priors from zero docs
    "q_readability",      # regex censuses over no rows
    "q_dataset_card",     # per-source card over zero sources
    "q_date_gaps",        # generated spine from NULL bounds
    "q_pareto_share",     # running shares over zero customers
    "q_whiten_embed",     # per-dim moments over zero vectors
    "q_levene",           # group medians over zero groups
    "q_cohens_d",         # two-sample moments both empty
    "q_cramers_v",        # contingency marginals over zero cells
    "q_ctfidf_terms",     # class term grid over zero classes
    "q_hapax",            # vocabulary census over zero tokens
    "q_heaps_law",        # growth checkpoints over zero buckets
    "q_burstiness",       # daily counts over zero days
    "q_rake_keywords",    # phrase split over no rows
    "q_logistic_step",    # Newton step with zero moments
    # round-6 additions
    "q_cuped",            # pooled theta over zero users
    "q_sprt",             # LLR prefix over zero days
    "q_mde_power",        # per-type moments over zero types
    "q_permutation_test", # replicate explode over zero rows
    "q_durbin_watson",    # OLS fit from zero days
    "q_qq_plot",          # quantile ranks against n = 0
    "q_auc_pr",           # score sweep over zero thresholds
    "q_ece",              # calibration bins over zero docs
    "q_mix_token_budget", # budget from a NULL corpus total
    "q_kcenter_coreset",  # selection loop over zero vectors
    "q_embed_diversity",  # per-label moments over zero vectors
    "q_silhouette_approx",# centroid grid over zero labels
    "q_domain_stats",     # scorecard over zero sources
    "q_cv_folds",         # folds over zero docs
    "q_lift_gain",        # deciles over zero scores
    "q_wilson_ci",        # intervals over zero groups
    "q_cochran_armitage", # trend over zero dose groups
    "q_mcnemar",          # paired cells over zero users
    "q_k_anonymity",      # census over zero classes
    "q_nelson_aalen",     # hazard over zero durations
    "q_join_bloom",       # bloom built from an empty dim (empty map)
    "q_ivm_join",         # bilinear delta over four empty sides
    "q_kruskal_wallis",   # rank stitch + N(N+1) ratios over zero rows
    "q_brier",            # decomposition with NULL global means
    "q_l_diversity",      # census over zero QI classes
    "q_tpch_q1",          # grouped decimal aggregate over zero lines
    "q_shapley_attribution",  # coalition algebra over zero users
    "q_neyman_alloc",     # allocation with a NULL normalizer
    "q_textrank",         # graph supersteps over zero documents
    "q_holt_linear",      # grouped-map recursion over zero days
    "q_friedman",         # rank blocks over zero complete days
    "q_propensity_strata", # strata with a NULL size normalizer
    "q_logrank",          # risk sets over zero durations
    "q_cmh",              # pooled 2x2 over zero strata
    # round-7 additions
    "q_map_in_arrow",     # Arrow kernels over zero record batches
    "q_cogroup_asof",     # cogrouped UDF with both sides empty
    "q_bucket_join",      # bucketed write + join of zero rows
    "q_partition_prune",  # partitioned write of zero rows (no dirs)
    "q_exchange_reuse",   # reused aggregate over zero months
    "q_sql_pipe",         # pipe aggregate over zero lines
    "q_sql_udf",          # SQL-UDF rollup over zero orders
    "q_pandas_api",       # pandas-on-Spark groupby over zero rows
    "q_ml_linreg",        # normal-equation fit over zero rows
    # round-8 additions
    "q_stream_rocksdb",   # availableNow stream of zero rows, RocksDB state
    "q_stream_listener",  # progress ledger over zero-input batches
    "q_stream_pyds_write",  # Python sink commits zero-row batches
    "q_stream_state_reader",  # state store of a zero-key aggregation
    "q_stream_offset_log",  # ledger of a single zero-row batch
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        load_table(spark, SF_DIR, t).limit(0).write.mode("overwrite").parquet(
            str(d / f"{t}.parquet")
        )
    return str(d)


@pytest.mark.parametrize("name", _REPRESENTATIVE)
def test_runs_on_empty_tables(spark, empty_sf_dir, name):
    rows = QUERIES[name].spark(spark, empty_sf_dir).collect()
    if name == "q_recursive_calendar":
        # the calendar is generated, not scanned: 79 months, all empty
        assert len(rows) == 79
        assert all(r.n_orders == 0 for r in rows)
    elif name == "q_funnel":
        # ungrouped aggregates yield exactly one zero-count row on
        # empty input — ANSI semantics, not a bug
        assert [(r.n_signup, r.n_converted) for r in rows] == [(0, 0)]
    elif name == "q_tpch_q17":
        # ungrouped SUM over empty input: one row, NULL total (ANSI)
        assert [r.avg_yearly for r in rows] == [None]
    elif name == "q_profile_table":
        # profile of an empty table: one row per column, all-zero
        # counts, NULL min/max (nothing to take extremes of)
        assert len(rows) == 6
        for r in rows:
            assert (r.n_rows, r.n_nulls, r.n_distinct) == (0, 0, 0)
            assert r.min_val is None and r.max_val is None
    elif name == "q_constraint_check":
        # an empty table passes the gate: zero violations, not NULL
        r = rows[0]
        assert (r.n_rows, r.n_null_key, r.n_bad_price, r.n_bad_status,
                r.n_orphan) == (0, 0, 0, 0, 0)
    elif name == "q_funnel3":
        assert [(r.n_view, r.n_view_click, r.n_view_click_purchase)
                for r in rows] == [(0, 0, 0)]
    elif name == "q_drift_ks":
        # no samples: undefined KS (NULL), zero counts
        assert [(r.ks, r.n_a, r.n_b) for r in rows] == [(None, 0, 0)]
    elif name == "q_drift_ks_binned":
        # same contract as the exact form, plus an empty bin table
        assert [
            (r.ks_binned, r.n_a, r.n_b, r.n_bins) for r in rows
        ] == [(None, 0, 0, 0)]
    elif name == "q_ab_test":
        # no users: both arms absent, every statistic undefined (the
        # ungrouped final rollup still emits its one row, all NULL)
        assert [
            (r.n0, r.n1, r.mean0, r.mean1, r.z_score) for r in rows
        ] == [(None, None, None, None, None)]
    elif name == "q_funnel_latency":
        # ungrouped rollup: one row, zero counts, NULL rate (0/0) and
        # NULL percentiles (nothing to interpolate)
        assert [
            (r.n_signup, r.n_converted, r.conv_rate,
             r.p50_latency_s, r.p90_latency_s)
            for r in rows
        ] == [(0, 0, None, None, None)]
    elif name == "q_funnel_windowed":
        assert [(r.n_view, r.n_view_click, r.n_view_click_purchase)
                for r in rows] == [(0, 0, 0)]
    elif name == "q_triangle_count":
        # zero edges -> zero wedges -> zero triangles, one row
        assert [(r.n_edges, r.n_triangles) for r in rows] == [(0, 0)]
    elif name == "q_corr_matrix":
        # the one-row aggregate still emits: 6 pairs, undefined corr
        assert len(rows) == 6
        assert all(r.r is None for r in rows)
    elif name == "q_ab_proportions":
        # ungrouped wide rollup over empty: one row, all NULL
        assert len(rows) == 1 and rows[0].z_score is None
    elif name == "q_theil_sen":
        # scalar rollup over empty: zero counts, NULL medians
        assert [(r.n_days, r.n_pairs, r.slope, r.intercept)
                for r in rows] == [(0, 0, None, None)]
    elif name == "q_runs_test":
        # ungrouped stats over empty: one row, NULL z
        assert [(r.n_up, r.n_down, r.n_runs, r.z_score)
                for r in rows] == [(None, None, None, None)]
    elif name == "q_ols_multi":
        # ungrouped moment rollup over empty: one row, NULL betas
        assert [(r.n, r.b0, r.b1, r.b2) for r in rows] == [(0, None, None, None)]
    elif name == "q_sample_consistent":
        # four scalar counts and a 0/0 ratio: one row, NULL ratio
        r = rows[0]
        assert (r.n_orders_sampled, r.n_join_sampled, r.n_join_full,
                r.join_sample_ratio) == (0, 0, 0, None)
    elif name == "q_gopher_rules":
        # ungrouped census over empty: zero counts, NULL 0/0 pass rate
        r = rows[0]
        assert (r.n_docs, r.n_pass_all, r.pass_rate) == (0, 0, None)
    elif name in ("q_psi", "q_jsd"):
        # ungrouped divergence rollup over an empty bin/vocab table:
        # one row, all statistics undefined (ANSI)
        assert len(rows) == 1
        assert rows[0][-1] is None
    elif name == "q_hll_manual":
        # empty stream: all 256 registers zero -> linear counting of
        # V=m empty buckets estimates exactly 0 distinct
        r = rows[0]
        assert (r.n_exact, r.m, r.v_empty, r.estimate) == (0, 256, 256, 0.0)
    elif name == "q_bloom_manual":
        # no keys, no probes: the ungrouped rollup emits one row with
        # zero counts and NULL member-sum/fp-rate (ANSI)
        r = rows[0]
        assert (r.n_probes, r.n_true_members, r.n_bloom_positive,
                r.n_false_positive, r.fp_rate) == (0, None, 0, 0, None)
    elif name == "q_did":
        # ungrouped 2x2 rollup over empty: one row, every cell mean
        # NULL (0-count division), NULL estimate
        r = rows[0]
        assert (r.mean_ctrl_pre, r.mean_ctrl_post, r.mean_treat_pre,
                r.mean_treat_post, r.did) == (None,) * 5
    elif name == "q_chi2":
        # empty contingency grid: undefined N and statistic; dof is
        # (0-1)*(0-1) from the empty marginals — documented artifact
        assert [(r.n, r.chi2) for r in rows] == [(None, None)]
    elif name == "q_median_ci":
        # no rows hit any target rank: the ungrouped rollup still
        # emits one row, every order statistic NULL
        assert [(r.n, r.median, r.ci_lo, r.ci_hi) for r in rows] == [(None,) * 4]
    elif name == "q_cohens_kappa":
        # ungrouped agreement cells over empty: zero n, NULL rates
        assert [(r.n, r.po, r.pe, r.kappa) for r in rows] == [(0, None, None, None)]
    elif name == "q_jackknife":
        # replicate rollup over an empty bucket table: one row, all NULL
        assert [(r.n, r.k, r.mean_value, r.jk_se) for r in rows] == [(None,) * 4]
    elif name == "q_modularity":
        # zero edges: no components, undefined Q, zero-count rollup row
        assert [(r.n_edges, r.n_components, r.modularity) for r in rows] == [
            (None, 0, None)
        ]
    elif name == "q_spearman":
        # ungrouped moment rollup over empty: zero n, NULL rho
        assert [(r.n, r.rho) for r in rows] == [(0, None)]
    elif name == "q_welch_ttest":
        # two empty moment triples crossed: one row, zero counts,
        # NULL means and statistics (0-count division)
        assert [(r.n_a, r.n_b, r.mean_a, r.mean_b, r.t, r.df)
                for r in rows] == [(0, 0, None, None, None, None)]
    elif name == "q_levene":
        assert [tuple(r) for r in rows] == [(None,) * 3]
    elif name == "q_cohens_d":
        assert [tuple(r) for r in rows] == [(None,) * 4]
    elif name == "q_cramers_v":
        assert [tuple(r) for r in rows] == [(None,) * 5]
    elif name == "q_heaps_law":
        assert [(r.n_points, r.beta, r.ln_k) for r in rows] == [(0, None, None)]
    elif name == "q_logistic_step":
        assert [(r.n, r.b0, r.b1) for r in rows] == [(0, None, None)]
    elif name == "q_mrr":
        # zero probes: one zero-count row, undefined metrics
        assert [(r.n_probes, r.mrr, r.precision_at_k) for r in rows] == [
            (0, None, None)
        ]
    elif name == "q_anova":
        # ungrouped rollup over zero groups: one all-NULL row (ANSI)
        assert [tuple(r) for r in rows] == [(None,) * 5]
    elif name == "q_kendall_grid":
        # COALESCE'd pair masses are 0; n and tau undefined
        assert [(r.n, r.concordant, r.discordant, r.tau_b) for r in rows] == [
            (None, 0, 0, None)
        ]
    elif name == "q_grubbs":
        # argmax struct over an empty series: one all-NULL row
        assert [tuple(r) for r in rows] == [(None,) * 4]
    elif name == "q_ridge_closed":
        # zero moments: count 0, coefficients undefined
        assert [(r.n, r.b0, r.b1, r.b2) for r in rows] == [(0, None, None, None)]
    elif name == "q_power_law_alpha":
        # empty tail: zero count, undefined exponent
        assert [(r.n_tail, r.alpha) for r in rows] == [(0, None)]
    elif name == "q_mann_whitney":
        # ungrouped rank rollup over empty: one row, all NULL (ANSI)
        assert [(r.n_a, r.n_b, r.u2, r.z) for r in rows] == [(None,) * 4]
    elif name == "q_cuped":
        # pooled theta and both arms undefined: one all-NULL row
        assert [tuple(r) for r in rows] == [(None,) * 7]
    elif name == "q_permutation_test":
        # zero replicates survive the non-empty-group filter; the
        # add-one p-value is exactly 1 (1+0)/(0+1)
        assert [(r.obs_diff, r.n_reps, r.n_extreme, r.p_value)
                for r in rows] == [(None, 0, 0, 1.0)]
    elif name == "q_durbin_watson":
        assert [tuple(r) for r in rows] == [(None,) * 4]
    elif name in ("q_auc_pr", "q_ece"):
        # zero thresholds / bins: zero count, undefined metrics
        assert [tuple(r) for r in rows] == [(0, None, None)]
    elif name == "q_kcenter_coreset":
        # the synthetic seed row survives (matching the oracle's
        # VALUES CTE); no further center can be selected
        assert [(r.step, r.vec_id, r.sel_d2) for r in rows] == [(0, 0, None)]
    elif name == "q_cochran_armitage":
        assert [tuple(r) for r in rows] == [(None,) * 3]
    elif name == "q_mcnemar":
        # all four cells zero; chi2 on zero discordant pairs undefined
        assert [tuple(r) for r in rows] == [(0, 0, 0, 0, None)]
    elif name == "q_k_anonymity":
        # zero classes: k and the violation fraction undefined
        assert [tuple(r) for r in rows] == [(0, None, None, 0, None)]
    elif name == "q_l_diversity":
        # same contract as q_k_anonymity's census rollup
        assert [tuple(r) for r in rows] == [(0, None, None, 0, None)]
    elif name == "q_kruskal_wallis":
        # zero groups: df = k-1 = -1 (consistent on both engines),
        # every rank statistic undefined
        assert [tuple(r) for r in rows] == [(-1, None, None, None)]
    elif name == "q_brier":
        # zero bins: zero count, every decomposition term undefined
        assert [tuple(r) for r in rows] == [(0, None, None, None, None, None)]
    elif name == "q_friedman":
        # zero complete blocks: k = 0, df = -1, Q undefined
        assert [tuple(r) for r in rows] == [(None, 0, -1, None)]
    elif name == "q_propensity_strata":
        # no two-armed strata: zero strata, ATE undefined
        assert [tuple(r) for r in rows] == [(0, None, None)]
    elif name == "q_logrank":
        # zero event times: O, E and chi2 undefined; df is structural
        assert [tuple(r) for r in rows] == [(None, None, None, 1)]
    elif name == "q_cmh":
        assert [tuple(r) for r in rows] == [(0, None, None)]
    elif name == "q_ml_linreg":
        # zero rows: singular normal equations, NULL coefficients
        assert [tuple(r) for r in rows] == [(0, None, None, None)]
    elif name == "q_stream_listener":
        # the ledger row always emits: zero rows observed, zero groups
        assert [tuple(r) for r in rows] == [(0, 0)]
    elif name == "q_stream_offset_log":
        # an empty DataFrame stages as ONE empty parquet file, so the
        # ledger records exactly one zero-row batch, fully committed
        assert [tuple(r) for r in rows] == [(1, 1, 1, 0)]
    else:
        assert rows == []
