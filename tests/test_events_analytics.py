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
