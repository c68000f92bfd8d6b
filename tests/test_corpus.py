"""Invariant and plan-shape tests for the corpus-hygiene operators
(operators/corpus.py)."""

from __future__ import annotations

from direct_kafka_stream_spark import QUERIES, load_table
from direct_kafka_stream_spark.plans import inspect

from tests.conftest import SF_DIR


def test_dedup_url_partitions_corpus(spark):
    """Every document lands in exactly one canonical-URL group, and
    keep_doc is a member (the minimum) of its group."""
    rows = QUERIES["q_dedup_url"].spark(spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r.n_dups for r in rows) == n_docs
    # synthesized URLs collide via doc_id % 100 → real dup groups exist
    assert any(r.n_dups > 1 for r in rows)


def test_vocab_coverage_broadcasts_vocab(spark):
    """The token stream must not shuffle by word for the coverage
    join: the K-row vocab broadcasts."""
    df = QUERIES["q_vocab_coverage"].spark(spark, SF_DIR)
    assert inspect.plan_contains(df, "BroadcastHashJoin")
    rows = df.collect()
    for r in rows:
        assert 0 <= r.n_in_vocab <= r.n_tokens
        assert 0.0 <= r.coverage <= 1.0
    # a corpus-derived top-100 vocab must cover a sane fraction overall
    tot = sum(r.n_tokens for r in rows)
    cov = sum(r.n_in_vocab for r in rows)
    assert cov / tot > 0.2


def test_embed_norm_stats_bounds(spark):
    rows = QUERIES["q_embed_norm_stats"].spark(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.min_norm <= r.mean_norm <= r.max_norm
        assert 0 <= r.n_unnormalized <= r.n


def test_format_detect_counts_bounded_by_docs(spark):
    rows = QUERIES["q_format_detect"].spark(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        for c in (r.n_codeish, r.n_numeric, r.n_prose, r.n_allcaps):
            assert 0 <= c <= r.n_docs


def test_decontaminate_frac_brackets_binary_flag(spark):
    """Same contaminated-doc set as q_decontaminate, containment in
    (0, 1], and n_shared never exceeds the doc's distinct gram count."""
    frac = {
        r.doc_id: r
        for r in QUERIES["q_decontaminate_frac"].spark(spark, SF_DIR).collect()
    }
    binary = {
        r.doc_id: r.n_shared
        for r in QUERIES["q_decontaminate"].spark(spark, SF_DIR).collect()
    }
    assert set(frac) == set(binary)
    for doc_id, r in frac.items():
        assert 0 < r.n_shared <= r.n_grams
        assert r.n_shared == binary[doc_id]
        assert 0.0 < r.containment <= 1.0


def test_zipf_slope_is_negative_powerlaw(spark):
    row = QUERIES["q_zipf_slope"].spark(spark, SF_DIR).collect()[0]
    # top-100 cap; the smoke fixture's synthetic vocab is smaller
    assert 0 < row.n_words <= 100
    assert row.zipf_slope < 0  # frequency falls with rank
    assert 0.0 <= row.r2 <= 1.0


def test_langid_confusion_rows_are_distributions(spark):
    rows = QUERIES["q_langid_confusion"].spark(spark, SF_DIR).collect()
    assert rows
    by_actual: dict[str, float] = {}
    for r in rows:
        assert r.predicted in ("en", "unknown")
        assert r.n > 0
        by_actual[r.actual] = by_actual.get(r.actual, 0.0) + r.frac_of_actual
    for actual, total in by_actual.items():
        assert abs(total - 1.0) < 1e-4, (actual, total)
