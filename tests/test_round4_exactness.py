"""Brute-force equivalence checks for the round-4 filtered/bucketed
operators whose correctness rests on a pruning argument (SURVEY.md §5.2
#4): the prefix filter must be lossless vs all-pairs Jaccard, the
bin-then-refine weighted median must equal the naive total-order form,
and the superstep BFS must equal a reference BFS — each proved against
an independent implementation at sf0.001, not just against the oracle
SQL (which intentionally mirrors the same pruning)."""

from __future__ import annotations

import collections
import itertools

import duckdb

from direct_kafka_stream_spark import QUERIES

from tests.conftest import SF_DIR


def test_setsim_prefix_filter_is_lossless(spark):
    """q_setsim_prefix must return EXACTLY the pairs an all-pairs scan
    finds at Jaccard >= 0.6 — the prefix filter is a pure optimization
    and may not drop (or add) a single pair."""
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in QUERIES["q_setsim_prefix"].spark(spark, SF_DIR).collect()
    }

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    docs = con.sql("SELECT doc_id, text FROM documents").fetchall()
    sets = {}
    for doc_id, text in docs:
        words = [w for w in text.split(" ") if w != ""]
        sets[doc_id] = {
            " ".join(words[i : i + 3]) for i in range(len(words) - 2)
        }
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        ix = len(sets[a] & sets[b])
        un = len(sets[a] | sets[b])
        if un and round(ix / un, 6) >= 0.6:
            want[(a, b)] = round(ix / un, 6)
    assert got == want
    assert want, "fixture should contain at least one qualifying pair"


def test_weighted_median_equals_naive_total_order(spark):
    """Bin-then-refine must equal the naive cumulative-window weighted
    median computed over the full per-segment total order."""
    got = {
        r.seg: (r.wmedian, r.total_w)
        for r in QUERIES["q_weighted_median"].spark(spark, SF_DIR).collect()
    }

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW customer AS SELECT * FROM '{SF_DIR}/customer.parquet'"
    )
    rows = con.sql(
        "SELECT c_mktsegment, c_acctbal, c_custkey,"
        " c_custkey % 7 + 1 FROM customer"
        " ORDER BY c_mktsegment, c_acctbal, c_custkey"
    ).fetchall()
    by_seg = collections.defaultdict(list)
    for seg, bal, key, w in rows:
        by_seg[seg].append((bal, w))
    want = {}
    for seg, vals in by_seg.items():
        tot = sum(w for _, w in vals)
        cum = 0
        for bal, w in vals:
            cum += w
            if 2 * cum >= tot:
                want[seg] = (bal, tot)
                break
    assert got == want


def test_bfs_hops_equal_reference_bfs(spark):
    """Superstep BFS must equal a textbook queue BFS over the same
    sparsified edge set."""
    got = {
        r.n_name: r.hops
        for r in QUERIES["q_bfs_hops"].spark(spark, SF_DIR).collect()
    }

    con = duckdb.connect()
    for t in ("lineitem", "supplier", "orders", "customer", "nation"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    e0 = con.sql(
        """
        SELECT s.s_nationkey AS src, c.c_nationkey AS dst, COUNT(*) AS w
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY src, dst
        """
    ).fetchall()
    names = dict(con.sql("SELECT n_nationkey, n_name FROM nation").fetchall())

    outw = collections.defaultdict(int)
    by_src = collections.defaultdict(list)
    for src, dst, w in e0:
        outw[src] += w
        if src != dst:
            by_src[src].append((-w, dst))
    seed = min(outw, key=lambda s: (-outw[s], s))
    adj = {
        src: [dst for _, dst in sorted(lanes)[:2]]
        for src, lanes in by_src.items()
    }

    hops = {seed: 0}
    frontier = [seed]
    for depth in range(1, 4):
        nxt = []
        for node in frontier:
            for dst in adj.get(node, ()):  # top-2 out-edges only
                if dst not in hops:
                    hops[dst] = depth
                    nxt.append(dst)
        frontier = nxt
    want = {names[node]: h for node, h in hops.items()}
    assert got == want
    # sf0.001's sparsified graph only reaches hop 1; sf0.01+ reaches
    # hop 3 (verified by the oracle differential) — here just require
    # a non-degenerate frontier beyond the seed.
    assert max(want.values()) >= 1, "seed should reach at least one node"
