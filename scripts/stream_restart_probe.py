#!/usr/bin/env python3
"""Restart-recovery capstone at scale (round-10 verdict directive #5).

The restart path — stop a stateful stream, append new input, resume
from the SAME checkpoint — was only ever exercised at test scale
(tests/test_stream_machinery.py::test_restarted_stream_ledger_and_state
_stay_consistent). This probe runs the identical acceptance narrative
over a scale-dir events fixture (e.g. the 100x materialization,
10 M rows) and records recovery wall-time and ledger size:

  1. stage the events fixture as n_a + n_b parquet files;
  2. phase A: availableNow stateful agg (groupBy event_type ->
     count + sum, one file per micro-batch) over the first n_a files;
  3. phase B: add the remaining n_b files, RESTART from the same
     checkpoint, time the resumed drain;
  4. audit the combined checkpoint with the same three invariants as
     the test, all of which raise on violation:
       - offset/commit ledger accepts (contiguous, fully committed),
         phase-A files mapped to batches < n_a, phase-B files to
         batches >= n_a, nothing reprocessed;
       - LIVE state (statestore read) == batch aggregate of A UNION B;
       - time-traveled state at batchId = n_a - 1 == batch aggregate
         of phase A alone.

Usage: python scripts/stream_restart_probe.py SFDIR [n_a n_b]
Prints one JSON line. Results tracked in SCALE.md.
"""

from __future__ import annotations

import json
import pathlib
import shutil
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from direct_kafka_stream_spark import get_session
from direct_kafka_stream_spark.io import load_table
from direct_kafka_stream_spark.sources.files import events_schema, file_stream


def _du(path: pathlib.Path) -> int:
    return sum(p.stat().st_size for p in path.rglob("*") if p.is_file())


def _run_phase(spark, src: str, ckpt: str) -> float:
    """One availableNow drain of the stateful agg from ckpt; returns
    wall seconds (includes recovery when the checkpoint pre-exists)."""
    agg = (
        file_stream(spark, src, events_schema(), max_files_per_trigger=1)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
    )
    t0 = time.perf_counter()
    q = (
        agg.writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(1800):
        q.stop()
        raise TimeoutError("stream did not drain in 1800 s")
    return round(time.perf_counter() - t0, 2)


def _batch_agg(spark, paths: list[str]) -> dict[str, tuple[int, float]]:
    df = spark.read.schema(events_schema()).parquet(*paths)
    return {
        r.event_type: (r.n, round(r.s, 6))
        for r in df.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }


def _state_at(spark, ckpt: str, batch_id: int | None) -> dict:
    r = spark.read.format("statestore")
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    # buffer fields are named for the aggregate FUNCTIONS (count, sum),
    # not the query's output aliases — the ALIGNMENT.md rule
    return {
        row["key"]["event_type"]: (
            row["value"]["count"],
            round(row["value"]["sum"], 6),
        )
        for row in r.load(ckpt).collect()
    }


def probe(spark, sf_dir: str, n_a: int = 4, n_b: int = 4) -> dict:
    from direct_kafka_stream_spark.operators.analytics39 import (
        read_stream_ledger,
    )

    scratch = pathlib.Path(tempfile.mkdtemp(prefix="dks_restartprobe_"))
    try:
        # stage n_a + n_b files once (µs timestamps via load_table),
        # then reveal them to the source in two phases
        staged = scratch / "staged"
        events = load_table(spark, sf_dir, "events")
        n_rows = events.count()
        events.repartition(n_a + n_b).write.mode("overwrite").parquet(str(staged))
        files = sorted(staged.glob("part-*.parquet"))
        assert len(files) == n_a + n_b, files
        src = scratch / "src"
        src.mkdir()
        ckpt = str(scratch / "ckpt")

        for f in files[:n_a]:
            shutil.copy(f, src / f.name)
        wall_a = _run_phase(spark, str(src), ckpt)
        for f in files[n_a:]:
            shutil.copy(f, src / f.name)
        wall_resume = _run_phase(spark, str(src), ckpt)

        # --- audit 1: offset/commit ledger (raises on any violation) ---
        ledger = read_stream_ledger(ckpt)
        n_batches = len(ledger["batches"])
        if ledger["batches"] != list(range(n_batches)):
            raise RuntimeError(f"non-contiguous batches: {ledger['batches']}")
        by_file = {p.rsplit("/", 1)[-1]: b for p, b in ledger["files"].items()}
        a_names = {f.name for f in files[:n_a]}
        for fname, batch in by_file.items():
            ok = batch < n_a if fname in a_names else batch >= n_a
            if not ok:
                raise RuntimeError(
                    f"{fname} in batch {batch} crosses the restart boundary"
                )
        if len(by_file) != n_a + n_b:
            raise RuntimeError(f"ledger files {len(by_file)} != {n_a + n_b}")

        # --- audit 2: live state == batch aggregate of A ∪ B ---
        live = _state_at(spark, ckpt, None)
        full = _batch_agg(spark, [str(src)])
        if live != full:
            raise RuntimeError(f"live state != batch agg: {live} vs {full}")

        # --- audit 3: time-traveled state at the pre-restart batch ---
        at_a = _state_at(spark, ckpt, n_a - 1)
        only_a = _batch_agg(spark, [str(src / f.name) for f in files[:n_a]])
        if at_a != only_a:
            raise RuntimeError(
                f"batch {n_a - 1} state != phase-A agg: {at_a} vs {only_a}"
            )

        return {
            "sf_dir": sf_dir,
            "input_rows": n_rows,
            "n_files": [n_a, n_b],
            "n_batches": n_batches,
            "wall_a_s": wall_a,
            "wall_resume_s": wall_resume,
            "ledger_entries": n_batches,
            "ledger_bytes": _du(pathlib.Path(ckpt) / "offsets")
            + _du(pathlib.Path(ckpt) / "commits"),
            "state_bytes": _du(pathlib.Path(ckpt) / "state"),
            "n_state_keys": len(live),
            "audits": "ledger+live-state+time-travel all green",
        }
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def main() -> None:
    spark = get_session("stream-restart-probe")
    sf_dir = sys.argv[1]
    n_a = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_b = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    print(json.dumps(probe(spark, sf_dir, n_a, n_b)), flush=True)


if __name__ == "__main__":
    main()
