#!/usr/bin/env python3
"""SIGKILL-mid-batch restart capstone (round-11 verdict directive #2).

The graceful capstone (scripts/stream_restart_probe.py) proves
stop→resume; the reference's README war story (reference
README.md:160-176) is an OUTAGE — the driver dies with a batch in
flight and the job must resume from its persisted offsets without
reprocessing or losing anything (the exact failure the reference's
ZK begin-offset ledger, KafkaDirectStream.scala:96-105, existed to
bound — at-least-once there; exactly-once here via the checkpoint
offset/commit WAL).

Narrative (all of it real — a separate driver process is killed with
SIGKILL, no shutdown hooks, JVM included):

  1. stage the events fixture as N parquet files in a source dir;
  2. spawn a WORKER process (own Python driver + JVM, new process
     group) running the stateful availableNow drain — groupBy
     event_type -> count + sum, one file per micro-batch;
  3. the parent polls the checkpoint's offset/commit logs; the moment
     the offset WAL is AHEAD of the commit log with at least one
     batch already committed (intent written, completion not — a
     batch genuinely in flight, not the first), SIGKILL the worker's
     whole process group;
  4. snapshot the in-flight batch's offsets/<N> WAL entry bytes;
  5. RESTART from the same checkpoint in the parent's own (fresh)
     session and drain to completion;
  6. audits, each raising on violation:
       - the killed batch's WAL entry is byte-identical after the
         resumed run — the engine REPLAYED the planned batch rather
         than re-planning under a new id;
       - `read_stream_ledger` accepts the combined checkpoint:
         contiguous batch ids, every offsets intent committed (the
         in-flight batch included), every file in exactly one batch —
         exactly-once despite the outage;
       - LIVE state (statestore reader) == batch aggregate over the
         full staged input, and the state row-count recount equals
         the input row count.

If the worker drains before a kill window is caught (tiny inputs),
the attempt is discarded and retried with a fresh checkpoint (up to
--attempts, recorded in the output row).

--rocksdb runs the identical narrative on the RocksDB state store
provider with changelog checkpointing enabled (worker, resume, and
state-reader sessions all carry the provider confs) — the
provider×outage cell of the round-11 directive #5 matrix.

Usage:
  python scripts/stream_kill_probe.py SFDIR [n_files] [--rocksdb]
  python scripts/stream_kill_probe.py worker SRC CKPT [--rocksdb]

Prints one JSON line. Results tracked in SCALE.md.
"""

from __future__ import annotations

import json
import os
import pathlib
import re
import shutil
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from direct_kafka_stream_spark import get_session
from direct_kafka_stream_spark.io import load_table
from direct_kafka_stream_spark.sources.files import (
    PROVIDER_CONF,
    ROCKSDB_PROVIDER,
    events_schema,
    file_stream,
)

CHANGELOG_CONF = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)

_ID = re.compile(r"^\d+$")


def _log_ids(d: str) -> list[int]:
    p = pathlib.Path(d)
    if not p.is_dir():
        return []
    return sorted(int(f.name) for f in p.iterdir() if _ID.match(f.name))


def _du(path: pathlib.Path) -> int:
    return sum(p.stat().st_size for p in path.rglob("*") if p.is_file())


def _apply_rocksdb(spark) -> None:
    spark.conf.set(PROVIDER_CONF, ROCKSDB_PROVIDER)
    spark.conf.set(CHANGELOG_CONF, "true")


def _agg_stream(spark, src: str):
    return (
        file_stream(spark, src, events_schema(), max_files_per_trigger=1)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
    )


def worker_main(src: str, ckpt: str, rocksdb: bool) -> None:
    """The victim driver: runs the drain until killed (or done)."""
    spark = get_session("stream-kill-worker")
    if rocksdb:
        _apply_rocksdb(spark)
    q = (
        _agg_stream(spark, src)
        .writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(1800)
    # a worker that reaches here drained before the parent could kill
    # it — the parent detects the exit and retries with a fresh ckpt
    print("WORKER_DRAINED", flush=True)


def _spawn_worker(src: str, ckpt: str, rocksdb: bool) -> subprocess.Popen:
    cmd = [sys.executable, os.path.abspath(__file__), "worker", src, ckpt]
    if rocksdb:
        cmd.append("--rocksdb")
    # new session => new process group, so killpg takes the JVM down
    # with the Python driver — a real outage, no shutdown hooks
    return subprocess.Popen(
        cmd,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        start_new_session=True,
        cwd=str(pathlib.Path(__file__).resolve().parent.parent),
    )


def _kill_mid_batch(
    proc: subprocess.Popen, ckpt: str, timeout_s: float
) -> dict | None:
    """Poll the WALs; SIGKILL the worker's process group the moment a
    batch is in flight (offsets ahead of commits) with >=1 batch
    already committed. Returns the at-kill snapshot, or None if the
    worker exited (drained) before a window was caught."""
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if proc.poll() is not None:
            return None
        offs = _log_ids(f"{ckpt}/offsets")
        coms = _log_ids(f"{ckpt}/commits")
        # intent ahead of completion, with >=1 batch already committed:
        # a batch genuinely in flight, and not the very first one
        if offs and coms and offs[-1] > coms[-1]:
            in_flight = offs[-1]
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                return None  # drained and exited between poll and kill
            proc.wait(timeout=30)
            # post-mortem: HDFSMetadataLog writes via temp+rename, so
            # the visible entry is complete; snapshot it for the
            # byte-identical replay audit
            wal = pathlib.Path(ckpt, "offsets", str(in_flight)).read_bytes()
            return {
                "killed_batch": in_flight,
                "n_offsets_at_kill": len(_log_ids(f"{ckpt}/offsets")),
                "n_commits_at_kill": len(_log_ids(f"{ckpt}/commits")),
                "wal_bytes": wal,
            }
        time.sleep(0.002)
    os.killpg(proc.pid, signal.SIGKILL)
    proc.wait(timeout=30)
    raise TimeoutError(f"worker neither drained nor opened a window in {timeout_s}s")


def probe(
    spark, sf_dir: str, n_files: int = 8, rocksdb: bool = False, attempts: int = 5
) -> dict:
    scratch = pathlib.Path(tempfile.mkdtemp(prefix="dks_killprobe_"))
    try:
        src = scratch / "src"
        events = load_table(spark, sf_dir, "events")
        n_rows = events.count()
        events.repartition(n_files).write.mode("overwrite").parquet(str(src))
        n_parts = len(list(src.glob("part-*.parquet")))
        assert n_parts == n_files, n_parts

        kill = None
        attempt = 0
        ckpt = ""
        wall_kill = 0.0
        for attempt in range(1, attempts + 1):
            ckpt = str(scratch / f"ckpt{attempt}")
            t0 = time.perf_counter()
            proc = _spawn_worker(str(src), ckpt, rocksdb)
            kill = _kill_mid_batch(proc, ckpt, timeout_s=600.0)
            wall_kill = round(time.perf_counter() - t0, 2)
            if kill is not None:
                break
        if kill is None:
            raise RuntimeError(
                f"worker drained before any kill window in {attempts} attempts"
            )

        # resume from the same checkpoint in THIS (fresh) driver
        old: dict[str, str | None] = {}
        if rocksdb:
            old = {
                PROVIDER_CONF: spark.conf.get(PROVIDER_CONF, None),
                CHANGELOG_CONF: spark.conf.get(CHANGELOG_CONF, None),
            }
            _apply_rocksdb(spark)
        try:
            return _resume_and_audit(
                spark, src, ckpt, kill, n_files, n_rows, sf_dir,
                rocksdb, attempt, wall_kill,
            )
        finally:
            for k, v in old.items():
                if v is None:
                    try:
                        spark.conf.unset(k)
                    except Exception:
                        pass
                else:
                    spark.conf.set(k, v)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def _resume_and_audit(
    spark, src, ckpt, kill, n_files, n_rows, sf_dir, rocksdb, attempt, wall_kill
) -> dict:
    from direct_kafka_stream_spark.operators.analytics39 import (
        read_stream_ledger,
    )

    t0 = time.perf_counter()
    q = (
        _agg_stream(spark, str(src))
        .writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(1800):
        q.stop()
        raise TimeoutError("resumed stream did not drain in 1800 s")
    wall_resume = round(time.perf_counter() - t0, 2)

    # --- audit 1: the killed batch was REPLAYED, not re-planned ---
    wal_after = pathlib.Path(
        ckpt, "offsets", str(kill["killed_batch"])
    ).read_bytes()
    if wal_after != kill["wal_bytes"]:
        raise RuntimeError(
            f"offsets/{kill['killed_batch']} rewritten across the restart"
        )

    # --- audit 2: full exactly-once ledger (raises on violation) ---
    ledger = read_stream_ledger(ckpt)
    n_batches = len(ledger["batches"])
    if ledger["batches"] != list(range(n_batches)):
        raise RuntimeError(f"non-contiguous batches: {ledger['batches']}")
    if kill["killed_batch"] not in ledger["commits"]:
        raise RuntimeError(
            f"killed batch {kill['killed_batch']} never committed"
        )
    if len(ledger["files"]) != n_files:
        raise RuntimeError(
            f"ledger maps {len(ledger['files'])} files, staged {n_files}"
        )

    # --- audit 3: live state == batch aggregate, full recount ---
    reader = spark.read.format("statestore")
    live = {
        row["key"]["event_type"]: (
            row["value"]["count"],
            round(row["value"]["sum"], 6),
        )
        for row in reader.load(ckpt).collect()
    }
    batch = {
        r.event_type: (r.n, round(r.s, 6))
        for r in spark.read.schema(events_schema())
        .parquet(str(src))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    if live != batch:
        raise RuntimeError(f"live state != batch agg: {live} vs {batch}")
    if sum(n for n, _ in live.values()) != n_rows:
        raise RuntimeError("state recount != input rows")

    # --- audit 4: the requested provider actually held the state ---
    # RocksDB-with-changelog checkpoints .changelog files; the default
    # HDFS-backed provider checkpoints .delta files. Without this the
    # --rocksdb claim would rest on a session conf nobody verified.
    exts = {
        p.suffix
        for p in pathlib.Path(ckpt, "state").rglob("*")
        if p.is_file() and p.suffix in (".delta", ".changelog")
    }
    want, reject = (
        (".changelog", ".delta") if rocksdb else (".delta", ".changelog")
    )
    if want not in exts or reject in exts:
        raise RuntimeError(
            f"state layout {sorted(exts)} does not match provider "
            f"{'rocksdb' if rocksdb else 'default'}"
        )

    return {
        "sf_dir": sf_dir,
        "input_rows": n_rows,
        "n_files": n_files,
        "provider": "rocksdb+changelog" if rocksdb else "hdfs(default)",
        "attempts": attempt,
        "killed_batch": kill["killed_batch"],
        "n_offsets_at_kill": kill["n_offsets_at_kill"],
        "n_commits_at_kill": kill["n_commits_at_kill"],
        "n_batches": n_batches,
        "wall_to_kill_s": wall_kill,
        "wall_resume_s": wall_resume,
        "state_bytes": _du(pathlib.Path(ckpt) / "state"),
        "n_state_keys": len(live),
        "audits": "wal-replay+ledger+live-state+recount+provider-layout all green",
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--rocksdb"]
    rocksdb = "--rocksdb" in sys.argv[1:]
    if args and args[0] == "worker":
        worker_main(args[1], args[2], rocksdb)
        return
    spark = get_session("stream-kill-probe")
    sf_dir = args[0]
    n_files = int(args[1]) if len(args) > 1 else 8
    print(json.dumps(probe(spark, sf_dir, n_files, rocksdb=rocksdb)), flush=True)


if __name__ == "__main__":
    main()
