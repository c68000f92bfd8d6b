"""Physical-plan inspection helpers — the engine's own guardrails that
queries compile to the plans we designed for (SURVEY.md §4): filters
reach the parquet scan, small dims broadcast, scans prune columns,
whole-stage codegen covers the hot path. Used by tests/test_plans.py.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def plan_contains(df: DataFrame, *needles: str) -> bool:
    plan = physical_plan(df)
    return all(n in plan for n in needles)


def has_broadcast_join(df: DataFrame) -> bool:
    return plan_contains(df, "BroadcastHashJoin") or plan_contains(
        df, "BroadcastNestedLoopJoin"
    )


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters: [...] section(s) of the scan nodes."""
    plan = physical_plan(df)
    return "\n".join(l.strip() for l in plan.splitlines() if "PushedFilters" in l)


def read_schema(df: DataFrame) -> str:
    plan = physical_plan(df)
    return "\n".join(l.strip() for l in plan.splitlines() if "ReadSchema" in l)


def codegen_stage_count(df: DataFrame, execute: bool = True) -> int:
    """Number of whole-stage-codegen spans. With AQE the final plan only
    exists after execution, so by default run the query first and read
    the executed plan."""
    if execute:
        # collect() executes THIS QueryExecution so its AQE plan
        # finalizes (a write would spawn a separate execution).
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
    else:
        plan = physical_plan(df)
    import re

    ids = set()
    for line in plan.splitlines():
        if "codegen id :" in line:
            ids.add(line.split("codegen id :")[1].split("]")[0].strip())
        elif "WholeStageCodegen (" in line:
            ids.add(line.split("WholeStageCodegen (")[1].split(")")[0])
        else:
            # executedPlan.toString marks codegen spans as "*(n) Op"
            ids.update(re.findall(r"\*\((\d+)\)", line))
    return len(ids)


def unpartitioned_windows(plan: str) -> list[str]:
    """Window node lines of an OPTIMIZED-plan string whose
    partitionSpec is empty — each one executes single-partition and
    logs WindowExec's "No Partition Defined" warning. Bounded
    (bins-sized) frames must route through
    ``exprs.bounded_window_key`` so the intended one-partition plan
    keeps a non-foldable key and this detector stays silent; anything
    it flags is either a real scale bug or a key that Catalyst folded
    away.

    Node format: ``Window [functions], [partitionSpec], [orderSpec]``,
    with empty specs omitted — 3 top-level bracket groups when both
    are present, 2 when exactly one is. The orderSpec is the group
    whose entries carry ASC/DESC; a 2-group node whose last group has
    no ordering marker is partition-only (no warning). Bracket groups
    never nest ``], [`` internally, so a top-level split is exact."""
    bad = []
    for raw in plan.splitlines():
        line = raw.strip()
        m = re.search(r"\bWindow (\[.*)$", line)
        if not m:
            continue
        groups = m.group(1).split("], [")
        if len(groups) >= 3:
            continue
        last = groups[-1]
        order_only = " ASC" in last or " DESC" in last
        if len(groups) == 1 or order_only:
            bad.append(line[:200])
    return bad


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes in the physical plan (broadcast
    exchanges excluded) — the scale-critical number: each one is a full
    re-partition of its input across the cluster."""
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple"
    )
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
