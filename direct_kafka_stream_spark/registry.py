"""Central query registry: every operator the engine implements is a
named ``Query`` with (a) a Spark callable ``(spark, sf_dir) -> DataFrame``
and (b) an equivalent DuckDB oracle SQL string (or ``None`` for ops that
are not SQL-expressible — those get a weaker rows-only check).

This is the engine's coverage ledger for SURVEY.md §2: the verify
driver, the pytest suite, and bench.py all iterate this one dict.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from direct_kafka_stream_spark.caching import clear_materialized
from direct_kafka_stream_spark.session import scale_flag_set, tune_session


@dataclass(frozen=True)
class Query:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over the fixture views, or None
    doc: str = ""
    tags: tuple[str, ...] = field(default=())
    # Probe-passed session confs this query needs AT SCALE (SCALE.md /
    # docs/TUNING.md): applied only when the scale flag is set
    # (SPARK_GRAFT_SCALE env, or scripts/scale_probe.py `run`), NEVER on
    # the sf0.1 bench/correctness path. Runtime-settable confs only.
    scale_confs: tuple[tuple[str, str], ...] = field(default=())


QUERIES: dict[str, Query] = {}


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    scale_confs: dict[str, str] | None = None,
):
    """Decorator registering a query implementation.

    The wrapped callable receives (spark, sf_dir); we defensively apply
    runtime session tuning first so results don't depend on the caller's
    session configuration (timezone, Arrow, NTZ inference).

    ``scale_confs`` ships a query's probe-passed 100x session knobs with
    the query itself, so a cluster job gets the working plan without
    reading SCALE.md: when the scale flag is set (SPARK_GRAFT_SCALE),
    the wrapper applies them before building the plan. They persist on
    the session for the rest of the job — the per-job model of a real
    cluster submit; scripts/scale_probe.py snapshots and restores them
    around each probed query so multi-query probes don't cross-tune.
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            if scale_confs and scale_flag_set():
                for k, v in scale_confs.items():
                    spark.conf.set(k, v)
            # Free the previous query's persisted intermediates (the
            # sequential-execution contract: by the time this query is
            # invoked, the previous query's result has been consumed).
            clear_materialized()
            return fn(spark, sf_dir)

        wrapped.__name__ = name
        wrapped.__doc__ = fn.__doc__
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = Query(
            name=name,
            spark=wrapped,
            oracle=oracle.strip() if oracle else None,
            doc=(fn.__doc__ or "").strip(),
            tags=tuple(tags),
            scale_confs=tuple(sorted((scale_confs or {}).items())),
        )
        return wrapped

    return deco
