"""Batch table IO over the fixture star schema.

Tables are columnar Parquet; ``spark.read.parquet`` gives Catalyst the
scan it can push filters into and prune columns from (check with
``df.explain`` → ``PushedFilters`` / ``ReadSchema``). At 100 TB these
would be partitioned/bucketed tables behind a catalog; the loader shape
(name → DataFrame + temp view) is the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale
# (region/nation are bounded by geography; part/supplier/customer grow
# with SF but stay orders of magnitude under the fact tables).
BROADCAST_SAFE = ("region", "nation")


# Columns stored as parquet TIMESTAMP(NANOS), which Spark 4 cannot read
# natively: with spark.sql.legacy.parquet.nanosAsLong=true they arrive
# as int64 nanos and are converted to TimestampType (µs) here. The
# fixture's ns values are µs-aligned so the DIV is lossless.
_NANOS_TS_COLS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLS.get(name, ()):
        if isinstance(df.schema[col].dataType, LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    return df


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    names=TABLES,
    register: bool = True,
) -> dict[str, DataFrame]:
    """Load fixture tables; optionally register each as a temp view so
    SQL-form queries can reference them by bare name (matching the
    DuckDB oracle's pre-registered views)."""
    out: dict[str, DataFrame] = {}
    for n in names:
        df = load_table(spark, sf_dir, n)
        if register:
            df.createOrReplaceTempView(n)
        out[n] = df
    return out
