"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``direct_kafka_stream_spark.registry`` — every
implemented operator from SURVEY.md §2 is a named Query there with a
Spark callable and (where SQL-expressible) a DuckDB oracle string.
"""

from __future__ import annotations

import pathlib
import sys
from collections.abc import Callable

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession

from direct_kafka_stream_spark import QUERIES, flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q_join_multiway, TPC-H-Q5 shape) on sf0.001."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Callables are session-safe but not mutually concurrent: SQL-form
    queries register fixture temp views by bare table name (matching
    the oracle's view names), so run queries sequentially within one
    SparkSession — which is the driver's execution model."""
    return {name: q.spark for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query; queries
    without an entry (approx sketches) get the rows-only check."""
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle}
