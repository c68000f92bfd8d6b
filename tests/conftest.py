from __future__ import annotations

import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from direct_kafka_stream_spark import get_session

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_session("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def sim_graph():
    """(edges, sims): the bucketed similarity graph replicated in pure
    Python with Spark's exact fold order (sequential double adds) —
    the independent reference for every graph operator test."""
    import collections
    import math

    import duckdb

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet'"
    ).fetchall()
    vecs = {vid: [float(x) for x in emb] for vid, emb in rows}
    bucket = {
        vid: (v[0] > 0) * 8 + (v[1] > 0) * 4 + (v[2] > 0) * 2 + (v[3] > 0)
        for vid, v in vecs.items()
    }
    norms = {}
    for vid, v in vecs.items():
        acc = 0.0
        for x in v:
            acc += x * x
        norms[vid] = acc
    by_bucket = collections.defaultdict(list)
    for vid in sorted(vecs):
        by_bucket[bucket[vid]].append(vid)

    from decimal import ROUND_HALF_UP, Decimal

    def r6(x: float) -> float:
        return float(
            Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        )

    sims = {}
    for ids in by_bucket.values():
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                acc = 0.0
                for x, y in zip(vecs[a], vecs[b]):
                    acc += x * y
                sims[(a, b)] = r6(
                    acc / (math.sqrt(norms[a]) * math.sqrt(norms[b]))
                )
    edges = {p for p, c in sims.items() if c >= 0.2}
    return edges, sims
