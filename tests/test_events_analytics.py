"""Invariant tests for event-sequence analytics
(operators/events_analytics.py); value-level correctness is oracle-
checked, these pin distribution and monotonicity properties."""

from __future__ import annotations

from direct_kafka_stream_spark import QUERIES

from tests.conftest import SF_DIR


def test_transition_matrix_rows_are_distributions(spark):
    """P(next | prev) must sum to 1 per prev_type (within rounding),
    and counts must be positive."""
    rows = QUERIES["q_transition_matrix"].spark(spark, SF_DIR).collect()
    assert rows
    by_prev: dict[str, float] = {}
    for r in rows:
        assert r.n > 0
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.p
    for prev, total in by_prev.items():
        assert abs(total - 1.0) < 1e-4, (prev, total)


def test_funnel3_is_monotone(spark):
    """Each funnel stage can only lose users."""
    row = QUERIES["q_funnel3"].spark(spark, SF_DIR).collect()[0]
    assert row.n_view >= row.n_view_click >= row.n_view_click_purchase
    assert row.n_view > 0


def test_cohort_ltv_is_cumulative_and_monotone(spark):
    rows = QUERIES["q_cohort_ltv"].spark(spark, SF_DIR).collect()
    assert rows
    by_cohort: dict[str, list] = {}
    for r in rows:
        by_cohort.setdefault(r.cohort, []).append(r)
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r.month_offset)
        running = 0.0
        for r in rs:
            assert r.revenue >= 0
            running += r.revenue
            assert abs(r.cum_revenue - round(running, 4)) < 1e-6
        # cumulative never decreases
        cums = [r.cum_revenue for r in rs]
        assert cums == sorted(cums)


def test_seasonality_covers_all_events(spark):
    from direct_kafka_stream_spark import load_table

    rows = QUERIES["q_seasonality"].spark(spark, SF_DIR).collect()
    n = load_table(spark, SF_DIR, "events").count()
    assert sum(r.n_events for r in rows) == n
    for r in rows:
        assert 0 <= r.dow <= 6 and 0 <= r.hod <= 23


def test_audience_overlap_is_symmetric_jaccard(spark):
    rows = QUERIES["q_audience_overlap"].spark(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.type_a < r.type_b  # canonical pair order, no dupes
        assert 0 < r.n_both <= min(r.n_a, r.n_b)
        expected = r.n_both / (r.n_a + r.n_b - r.n_both)
        assert abs(r.jaccard - round(expected, 6)) < 1e-9
        assert 0.0 < r.jaccard <= 1.0


def test_changepoint_cusum_ends_near_zero(spark):
    """CUSUM of deviations from the global mean telescopes to ~0 at
    the last day — recompute the full series in pandas and check the
    operator surfaces the true top-|CUSUM| day."""
    import numpy as np

    from direct_kafka_stream_spark import load_table
    from pyspark.sql import functions as F

    daily = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.round(F.sum(F.col("value").cast("decimal(38,10)")), 4)
             .cast("double").alias("x"))
        .orderBy("day")
        .collect()
    )
    xs = np.array([r.x for r in daily])
    cusum = np.cumsum(xs - xs.mean())
    top_expected = round(float(np.max(np.abs(cusum))), 4)
    rows = QUERIES["q_changepoint"].spark(spark, SF_DIR).collect()
    assert len(rows) == 5
    assert abs(rows[0].abs_cusum - top_expected) < 1e-3
    assert rows[0].abs_cusum >= rows[-1].abs_cusum


def test_ab_test_arms_partition_events(spark):
    from direct_kafka_stream_spark import load_table

    row = QUERIES["q_ab_test"].spark(spark, SF_DIR).collect()[0]
    n = load_table(spark, SF_DIR, "events").count()
    assert row.n0 + row.n1 == n
    assert row.n0 > 0 and row.n1 > 0
    import math
    assert math.isfinite(row.z_score)


def test_retention_matrix_starts_at_full_retention(spark):
    rows = QUERIES["q_retention_matrix"].spark(spark, SF_DIR).collect()
    assert rows
    by_cohort: dict[str, dict] = {}
    for r in rows:
        by_cohort.setdefault(r.cohort, {})[r.week_offset] = r
    for cohort, offs in by_cohort.items():
        assert 0 in offs  # every cohort is active in its own week
        assert offs[0].retention == 1.0  # by definition of the cohort
        for r in offs.values():
            assert 0 < r.n_active <= r.n_users
            assert 0.0 < r.retention <= 1.0
