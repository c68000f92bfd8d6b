"""Round-8 streaming machinery: RocksDB-backed stateful query at
registry level, the StreamingQueryListener ledger, and the Python
DataSource V2 streaming writer's two-phase commit protocol.

The registry queries themselves are differentially checked against
DuckDB (scripts/check_oracle.py); these tests pin the PROTOCOL
properties the oracle can't see — staged-but-uncommitted output stays
invisible, manifests account for every published row, abort cleans
the staging area, and the provider conf is restored after the run.
"""

from __future__ import annotations

import json
import pathlib

import pytest

from tests.conftest import SF_DIR


def test_stream_pyds_write_two_phase_commit(spark):
    """End-to-end through the registry entry, then inspect the sink
    dir: per-batch manifests sum to the published row count, staging
    is empty after commit, and ≥2 batchIds actually committed
    (maxFilesPerTrigger=1 over a 2-file source)."""
    from direct_kafka_stream_spark.operators.analytics38 import (
        q_stream_pyds_write,
    )

    out = q_stream_pyds_write(spark, SF_DIR)
    got = {r.event_type: (r.n, r.id_sum) for r in out.collect()}

    from direct_kafka_stream_spark.io import load_table
    from pyspark.sql import functions as F

    want = {
        r.event_type: (r.n, r.id_sum)
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("event_id").cast("bigint").alias("id_sum"),
        )
        .collect()
    }
    assert got == want

    # newest pysink scratch dir = the one this invocation just wrote
    root = pathlib.Path("/tmp/dks_spark_scratch")
    sink = max(
        (p / "out" for p in root.glob("pysink_*") if (p / "out").is_dir()),
        key=lambda p: p.stat().st_mtime,
    )
    manifests = [json.loads(p.read_text()) for p in sink.glob("_commit-*.json")]
    published = list(sink.glob("batch-*.jsonl"))
    assert len(manifests) >= 2, "expected one commit per micro-batch"
    assert sorted(m["batchId"] for m in manifests) == list(range(len(manifests)))
    n_lines = sum(
        sum(1 for _ in p.open()) for p in published
    )
    assert n_lines == sum(m["rows"] for m in manifests) == sum(
        n for n, _ in want.values()
    )
    assert not list((sink / "_staging").glob("*")), "staging must drain on commit"


def test_pyds_writer_abort_discards_staging(tmp_path):
    """The abort() hook (called by the engine on batch failure) must
    remove staged temp files so a retried batch can't double-publish."""
    from direct_kafka_stream_spark.sources.pyds import (
        JsonlStreamWriter,
        _StagedFile,
    )

    w = JsonlStreamWriter({"path": str(tmp_path)})
    staged = tmp_path / "_staging" / "x.jsonl"
    staged.parent.mkdir()
    staged.write_text('{"event_id": 1}\n')
    w.abort([_StagedFile(str(staged), 1), None], batchId=0)
    assert not staged.exists()
    # and commit skips empty partitions without publishing files
    empty = tmp_path / "_staging" / "empty.jsonl"
    empty.write_text("")
    w.commit([_StagedFile(str(empty), 0)], batchId=7)
    assert not empty.exists()
    assert not list(tmp_path.glob("batch-7-*.jsonl"))
    assert json.loads((tmp_path / "_commit-7.json").read_text())["rows"] == 0


def test_stream_listener_ledger_accounts_every_row(spark):
    from direct_kafka_stream_spark.io import load_table
    from direct_kafka_stream_spark.operators.analytics38 import (
        q_stream_listener,
    )

    row = q_stream_listener(spark, SF_DIR).collect()[0]
    ev = load_table(spark, SF_DIR, "events")
    assert row.input_rows == ev.count()
    assert row.n_groups == ev.select("event_type").distinct().count()
    # the listener must not leak into the session
    assert not spark.streams.active


def test_stream_rocksdb_restores_provider_conf(spark):
    from direct_kafka_stream_spark.operators.analytics38 import (
        _PROVIDER_CONF,
        q_stream_rocksdb,
    )

    before = spark.conf.get(_PROVIDER_CONF, None)
    out = q_stream_rocksdb(spark, SF_DIR)
    assert out.count() > 0
    assert spark.conf.get(_PROVIDER_CONF, None) == before
    # memory-sink temp view dropped: repeated invocations don't accumulate
    assert not [
        t.name for t in spark.catalog.listTables() if t.name.startswith("dks_rocks_")
    ]
