"""Round-12 optimization: the session-scoped table-plan cache in
io.load_table — catalog-style metadata reuse (the analyzed scan
DataFrame), never data or results. Every query still scans parquet."""

from __future__ import annotations

import os
import pathlib
import shutil
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from direct_kafka_stream_spark import io as dks_io
from direct_kafka_stream_spark.io import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_repeat_load_returns_same_plan_object(spark):
    a = load_table(spark, SF_DIR, "orders")
    b = load_table(spark, SF_DIR, "orders")
    assert a is b  # one catalog entry per (session, dir, table)


def test_cache_invalidates_when_file_changes(spark, tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/nation.parquet", d / "nation.parquet")
    a = load_table(spark, str(d), "nation")
    os.utime(d / "nation.parquet")  # new mtime stamp → stale entry
    b = load_table(spark, str(d), "nation")
    assert a is not b
    assert a.count() == b.count()


def test_uncacheable_path_still_loads_fresh(spark, monkeypatch):
    monkeypatch.setattr(dks_io, "_path_stamp", lambda p: None)
    a = load_table(spark, SF_DIR, "nation")
    b = load_table(spark, SF_DIR, "nation")
    assert a is not b  # no stamp → never cached, plain read path


def test_cached_frame_rescans_current_bytes(spark, tmp_path):
    """The cache holds METADATA only: a re-executed count re-reads the
    parquet bytes (same file → same rows twice, no memoized result)."""
    df = load_table(spark, SF_DIR, "supplier")
    n1 = df.count()
    n2 = load_table(spark, SF_DIR, "supplier").count()
    assert n1 == n2 > 0
