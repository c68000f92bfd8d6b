#!/usr/bin/env python3
"""Streaming state-shape probe (round-9 verdict directive #4): measure
the checkpoint STATE STORE footprint and per-batch sink-serialization
slope of the streaming-machinery class as events scale 1× → 100×.

For each scale dir this stages the events fixture, runs the same
stateful availableNow aggregation the q_stream_rocksdb exhibit runs
(groupBy event_type — |keys|-bounded state by design), on BOTH state
store providers, and reports:

  - wall seconds for the drained stream,
  - number of micro-batches (offset log entries),
  - on-disk state directory bytes (du over ckpt/state) and
    bytes-per-batch,
  - input rows (the linear part: staging + source scan),
  - sink rows (must stay |event_types| at every scale — the claim
    under test: state and sink are key-bounded, only the scan is
    row-linear).

Usage: python scripts/stream_state_probe.py SFDIR [SFDIR...]
Prints one JSON line per (dir, provider). Results tracked in SCALE.md.
"""

from __future__ import annotations

import json
import pathlib
import sys
import tempfile
import time
import uuid

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from direct_kafka_stream_spark import get_session
from direct_kafka_stream_spark.exprs import dsum
from direct_kafka_stream_spark.io import load_table
from direct_kafka_stream_spark.sources.files import (
    PROVIDER_CONF as _PROVIDER_CONF,
    ROCKSDB_PROVIDER as _ROCKSDB,
    events_schema,
    file_stream,
)


def _du(path: pathlib.Path) -> int:
    return sum(p.stat().st_size for p in path.rglob("*") if p.is_file())


def probe(spark, sf_dir: str, provider: str, n_files: int = 4) -> dict:
    scratch = pathlib.Path(tempfile.mkdtemp(prefix="dks_stateprobe_"))
    src = str(scratch / "src")
    events = load_table(spark, sf_dir, "events")
    n_rows = events.count()
    events.repartition(n_files).write.mode("overwrite").parquet(src)

    old = spark.conf.get(_PROVIDER_CONF, None)
    if provider == "rocksdb":
        spark.conf.set(_PROVIDER_CONF, _ROCKSDB)
    name = f"stateprobe_{uuid.uuid4().hex[:10]}"
    ckpt = scratch / "ckpt"
    try:
        agg = (
            # one file per micro-batch → a real multi-batch state history
            file_stream(spark, src, events_schema(), max_files_per_trigger=1)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("total"))
        )
        t0 = time.perf_counter()
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("stream did not drain in 600 s")
        wall = round(time.perf_counter() - t0, 2)
        sink_rows = spark.table(name).count()
        # digit-named files only: checksum filesystems add .crc/.tmp
        # siblings that would inflate the batch count (and deflate
        # state_bytes_per_batch)
        n_batches = len(
            [p for p in (ckpt / "offsets").iterdir() if p.name.isdigit()]
        )
        state_bytes = _du(ckpt / "state")
        return {
            "sf_dir": sf_dir,
            "provider": provider,
            "input_rows": n_rows,
            "n_batches": n_batches,
            "wall_s": wall,
            "state_bytes": state_bytes,
            "state_bytes_per_batch": round(state_bytes / max(n_batches, 1)),
            "sink_rows": sink_rows,
        }
    finally:
        if old is None:
            spark.conf.unset(_PROVIDER_CONF)
        else:
            spark.conf.set(_PROVIDER_CONF, old)
        try:
            spark.catalog.dropTempView(name)
        except Exception:
            pass
        import shutil

        shutil.rmtree(scratch, ignore_errors=True)


def main() -> None:
    spark = get_session("stream-state-probe")
    for sf_dir in sys.argv[1:]:
        for provider in ("hdfs", "rocksdb"):
            print(json.dumps(probe(spark, sf_dir, provider)), flush=True)


if __name__ == "__main__":
    main()
