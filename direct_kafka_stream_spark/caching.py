"""Session-wide ledger of eagerly-persisted query intermediates.

Operators persist an intermediate when the downstream DAG references it
more than once (see ``operators.llm._materialized``) — but the cache
must outlive the query callable, because callers collect AFTER the
callable returns. So nothing can unpersist inside the query itself.
Instead every persist is tracked here, and the registry wrapper frees
the PREVIOUS query's caches when the NEXT query starts: in the
sequential execution model of the verify driver, bench.py, and the test
suite, at most one query's intermediates are ever pinned, instead of
accumulating across a 150+-query sweep until LRU eviction kicks in.

Long-running services embedding the registry should call
``clear_materialized()`` whenever a query's results have been fully
consumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Record an already-persisted DataFrame for later cleanup."""
    _LIVE.append(df)
    return df


def clear_materialized() -> int:
    """Unpersist every tracked cache; returns how many were freed.
    Safe to call at any time — unpersisting a DataFrame whose session
    is gone is swallowed."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
