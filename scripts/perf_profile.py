#!/usr/bin/env python3
"""Round-12 optimization profiler: per-query wall time + per-stage
breakdown (executor run time vs result size vs task count) for a named
subset of registered queries, via the UI REST status API.

Usage:
    SPARK_GRAFT_UI=1 python scripts/perf_profile.py q_a q_b ...
    SPARK_GRAFT_UI=1 python scripts/perf_profile.py --top 40
    ... --plans plans/r12 --suffix before   # also dump explain() files

Methodology matches bench.py (noop sink, min-of-2 back-to-back), plus a
stage delta read from /api/v1/.../stages between start and end of the
FIRST run, so the breakdown reflects a cold-plan execution.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time
import urllib.request

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from direct_kafka_stream_spark import QUERIES, get_session


def stages_snapshot(spark):
    sc = spark.sparkContext
    url = (
        f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
        "/stages?details=false"
    )
    stages = json.load(urllib.request.urlopen(url, timeout=10))
    return {(s["stageId"], s["attemptId"]): s for s in stages}


def materialize(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    args = [a for a in sys.argv[1:]]
    plans_dir = None
    suffix = "before"
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--plans":
            plans_dir = pathlib.Path(args[i + 1]); i += 2
        elif a == "--suffix":
            suffix = args[i + 1]; i += 2
        elif a == "--top":
            k = int(args[i + 1]); i += 2
            full = json.load(open(pathlib.Path(__file__).parent.parent / "BENCH_FULL_r12.json"))
            names += [n for n, _ in sorted(full["queries"].items(), key=lambda kv: -kv[1])[:k]]
        else:
            names.append(a); i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("perf-profile")
    materialize(QUERIES["q_scan"].spark(spark, sf_dir).limit(1))
    # warm python workers (same as bench.py)
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("double")
    def _warm(s):
        return s * 1.0

    materialize(spark.range(0, 1024, 1, 32).select(_warm(F.col("id").cast("double")).alias("x")))

    out = {}
    for name in names:
        q = QUERIES[name]
        before = stages_snapshot(spark)
        t0 = time.perf_counter()
        df = q.spark(spark, sf_dir)
        t_build = time.perf_counter() - t0
        materialize(df)
        t1 = time.perf_counter() - t0
        after = stages_snapshot(spark)
        # second run for the min
        t2 = time.perf_counter()
        materialize(q.spark(spark, sf_dir))
        t_run2 = time.perf_counter() - t2
        new = [s for k, s in after.items() if k not in before and s["status"] != "SKIPPED"]
        new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        rows = []
        for s in new[:8]:
            rows.append({
                "stage": s["stageId"],
                "tasks": s.get("numCompleteTasks"),
                "runMs": s.get("executorRunTime"),
                "cpuMs": round((s.get("executorCpuTime") or 0) / 1e6),
                "inRec": s.get("inputRecords"),
                "shufWriteB": s.get("shuffleWriteBytes"),
                "shufReadB": s.get("shuffleReadBytes"),
                "name": (s.get("name") or "")[:60],
            })
        out[name] = {
            "t_cold": round(t1, 3),
            "t_build": round(t_build, 3),
            "t_warm": round(t_run2, 3),
            "n_stages": len(new),
            "total_task_runMs": sum(s.get("executorRunTime") or 0 for s in new),
            "stages": rows,
        }
        print(json.dumps({name: out[name]}), flush=True)
        if plans_dir:
            plans_dir.mkdir(parents=True, exist_ok=True)
            try:
                plan = q.spark(spark, sf_dir)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                )
            except Exception:
                import io as _io
                import contextlib
                buf = _io.StringIO()
                with contextlib.redirect_stdout(buf):
                    q.spark(spark, sf_dir).explain("formatted")
                plan = buf.getvalue()
            (plans_dir / f"{name}_{suffix}.txt").write_text(plan)

    summary_path = pathlib.Path("/tmp") / f"perf_profile_{suffix}.json"
    summary_path.write_text(json.dumps(out, indent=1))
    print(f"# wrote {summary_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
