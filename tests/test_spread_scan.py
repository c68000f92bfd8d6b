"""Round-12 optimization: io.spread_scan — the size-gated repartition
that parallelizes single-row-group fixture scans without pessimizing a
scan that is already wide enough to feed every core (guide §2.5 "input
skew: one huge unsplittable file")."""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from direct_kafka_stream_spark import io as dks_io
from direct_kafka_stream_spark.io import load_table, spread_scan
from direct_kafka_stream_spark.session import default_parallelism

SF_DIR = "/root/testdata/sf0.001"


def _n_partitions(df) -> int:
    return df.rdd.getNumPartitions()


def test_small_scan_is_spread_to_core_count(spark):
    df = load_table(spark, SF_DIR, "documents")
    out = spread_scan(df, "doc_id")
    assert _n_partitions(out) == default_parallelism()
    # and it is a repartition of the SAME rows — nothing gained or lost
    assert out.count() == df.count()


def test_wide_scan_is_left_alone(spark, monkeypatch):
    # Simulate the 100 TB case: input bytes at/above cores x split size
    # must short-circuit to the identical DataFrame (no extra Exchange).
    monkeypatch.setattr(dks_io, "_SPREAD_BYTES_PER_CORE", 0)
    df = load_table(spark, SF_DIR, "documents")
    out = spread_scan(df, "doc_id")
    assert out is df


def test_unknown_input_bytes_is_left_alone(spark):
    # A frame with no file scan behind it (inputFiles() empty) must not
    # be repartitioned: the gate treats 'unknown' as 'do not touch'.
    df = spark.range(10)
    assert dks_io._local_input_bytes(df) is None
    assert spread_scan(df, "id") is df


def test_input_bytes_matches_filesystem(spark):
    df = load_table(spark, SF_DIR, "lineitem")
    expected = pathlib.Path(f"{SF_DIR}/lineitem.parquet").stat().st_size
    assert dks_io._local_input_bytes(df) == expected
