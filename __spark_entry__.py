"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``direct_kafka_stream_spark.registry`` — every
implemented operator from SURVEY.md §2 is a named Query there with a
Spark callable and (where SQL-expressible) a DuckDB oracle string.
"""

from __future__ import annotations

import json
import pathlib
import sys
from collections.abc import Callable

_HERE = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(_HERE))

from pyspark.sql import DataFrame, SparkSession

from direct_kafka_stream_spark import QUERIES, flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q_join_multiway, TPC-H-Q5 shape) on sf0.001."""
    return flagship(spark, "/root/testdata/sf0.001")


def _newest_green_round() -> dict[str, int]:
    """For each query name, the NEWEST round whose CORRECTNESS_r*.json
    shows it green (hash_match, or a declared no-oracle rows-only check
    that ran). Never-checked or never-green names are absent."""
    newest: dict[str, int] = {}
    for p in sorted(_HERE.glob("CORRECTNESS_r*.json")):
        stem = p.stem.split("_r")[-1]
        if not stem.isdigit():
            continue
        rnd = int(stem)
        try:
            rows = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") is True or (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            ):
                newest[name] = max(rnd, newest.get(name, 0))
    return newest


def _ordered_names() -> list[str]:
    """Registry order, rotated LEAST-RECENTLY-VERIFIED first: the
    correctness driver checks a bounded prefix of this dict per round.
    Names with no green row from any prior round sort to the very
    front (round 0); after that, the names whose newest green row is
    oldest — so once the ledger is closed, the driver re-validates the
    whole registry on a rolling ~8-round cycle instead of re-checking
    the same registry-order prefix forever."""
    newest = _newest_green_round()
    names = list(QUERIES)
    return sorted(names, key=lambda n: (newest.get(n, 0), names.index(n)))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Callables are session-safe but not mutually concurrent: SQL-form
    queries register fixture temp views by bare table name (matching
    the oracle's view names), so run queries sequentially within one
    SparkSession — which is the driver's execution model."""
    return {name: QUERIES[name].spark for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query — since
    round 10 that is ALL of them (the two approx sketches carry
    bounded-error `within_bound` oracles; the rows-only fallback clause
    below is kept for the driver contract but currently unused)."""
    return {
        name: QUERIES[name].oracle for name in _ordered_names() if QUERIES[name].oracle
    }
