#!/usr/bin/env python3
"""Maintain ORACLE_LEDGER.json: for every registered query, the sha256
(12-hex) of its CURRENT oracle text and the round that text took
effect ("since_round").

Why this exists (round-11 directive): the correctness driver samples a
bounded prefix of `queries()` ordered least-recently-verified, keyed on
the NEWEST green round in CORRECTNESS_r*.json. But a green row earned
under an OLD oracle text does not verify the current gate — round 10
rewrote q_agg_approx / q_agg_approx_pct from rows-only to bounded-error
oracles, and their stale rows-only greens would have kept them out of
the driver sample for ~7 rounds. The ledger records when each oracle
text appeared, so `__spark_entry__._ordered_names` can demote
changed-since-green queries to never-verified (front of the rotation).

Usage:
    python scripts/update_oracle_ledger.py            # bump changed hashes
    python scripts/update_oracle_ledger.py --check    # exit 1 if stale
    python scripts/update_oracle_ledger.py --round N  # override round stamp

The round stamp defaults to (newest CORRECTNESS_r*.json round) + 1 —
the round currently being built. Run this after ANY oracle edit;
tests/test_rotation.py fails until the ledger is re-synced.

Bootstrap provenance (round 11): the initial since_round values were
derived from git ground truth, not guesswork — oracle hashes were
extracted at every end-of-round snapshot commit (r1 6b5762e … r10
f03bcd9 via `git archive` + registry import per round in a clean
subprocess) and since_round = 1 + the last round whose hash differs
from the current text (first-appearance rounds fall out of the same
rule). That sweep found FOUR queries whose newest driver green
predates their current oracle text: the two round-10 bounded-error
rewrites the judge named (q_agg_approx, q_agg_approx_pct) plus
q_item_cf (r10 textual alignment of the cap form, green r6) and
q_ab_test (r5 edit, green r4) — all four now front the rotation.
From here the ledger is maintained incrementally by this script.
"""

from __future__ import annotations

import json
import pathlib
import sys

_HERE = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_HERE))

LEDGER = _HERE / "ORACLE_LEDGER.json"


def current_round() -> int:
    rounds = [
        int(p.stem.split("_r")[-1])
        for p in _HERE.glob("CORRECTNESS_r*.json")
        if p.stem.split("_r")[-1].isdigit()
    ]
    return max(rounds, default=0) + 1


def main() -> None:
    import __spark_entry__ as entry  # noqa: F401 — registers QUERIES

    from direct_kafka_stream_spark import QUERIES
    from __spark_entry__ import _oracle_hash

    args = sys.argv[1:]
    check_only = "--check" in args
    rnd = current_round()
    if "--round" in args:
        try:
            rnd = int(args[args.index("--round") + 1])
        except (IndexError, ValueError):
            raise SystemExit("--round expects an integer round number")

    ledger: dict[str, dict] = {}
    if LEDGER.exists():
        ledger = json.loads(LEDGER.read_text()).get("queries", {})

    changed, removed = [], []
    for name, q in QUERIES.items():
        h = _oracle_hash(q.oracle)
        ent = ledger.get(name)
        if ent is None or ent.get("hash") != h:
            changed.append(name)
            if not check_only:
                ledger[name] = {"hash": h, "since_round": rnd}
    for name in [n for n in ledger if n not in QUERIES]:
        removed.append(name)
        if not check_only:
            del ledger[name]

    if check_only:
        print(
            json.dumps(
                {"stale": changed, "orphaned": removed, "round": rnd}
            )
        )
        sys.exit(1 if (changed or removed) else 0)

    LEDGER.write_text(
        json.dumps(
            {
                "_doc": (
                    "Oracle-text ledger for the LRV correctness rotation: "
                    "hash = sha256[:12] of the registered DuckDB oracle, "
                    "since_round = the round that text took effect. A green "
                    "CORRECTNESS row OLDER than since_round does not count "
                    "as verified (the oracle changed underneath it). "
                    "Maintained by scripts/update_oracle_ledger.py; "
                    "tests/test_rotation.py pins it in sync."
                ),
                "queries": dict(sorted(ledger.items())),
            },
            indent=1,
        )
        + "\n"
    )
    print(
        json.dumps(
            {
                "updated": LEDGER.name,
                "round_stamp": rnd,
                "changed": changed,
                "removed": removed,
                "n": len(ledger),
            }
        )
    )


if __name__ == "__main__":
    main()
