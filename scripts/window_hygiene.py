#!/usr/bin/env python3
"""Window-partition hygiene scanner: flag every registered query whose
OPTIMIZED plan contains a Window node with an empty partitionSpec.

Such nodes execute single-partition and make WindowExec log
"No Partition Defined for Window operation!" — at 100 TB an
unpartitioned window over detail rows serializes the whole stage
through one task, and the warning noise hides the real regressions.
Bounded (bins/segments-sized) frames must go through
exprs.bounded_window_key, which keeps the intended one-partition plan
but gives the spec a non-foldable key so the logger stays quiet and
this scanner stays green.

Plan-only: builds each DataFrame and reads optimizedPlan().toString();
nothing is executed, so the full registry scans in ~1-2 min.

Usage: python scripts/window_hygiene.py [query ...]
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from direct_kafka_stream_spark import QUERIES, get_session
from direct_kafka_stream_spark.plans.inspect import unpartitioned_windows

_SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_session("window-hygiene")
    names = sys.argv[1:] or list(QUERIES)
    flagged: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    for name in names:
        try:
            df = QUERIES[name].spark(spark, _SF)
            plan = df._jdf.queryExecution().optimizedPlan().toString()
        except Exception as e:  # plan-build failure is its own finding
            errors[name] = f"{type(e).__name__}: {e}"
            continue
        bad = unpartitioned_windows(plan)
        if bad:
            flagged[name] = bad
    for name, bad in sorted(flagged.items()):
        print(f"{name}: {len(bad)} unpartitioned window node(s)")
        for b in bad:
            print(f"    {b}")
    for name, err in sorted(errors.items()):
        print(f"{name}: PLAN ERROR {err}")
    print(
        f"\n{len(flagged)} flagged / {len(errors)} errors "
        f"/ {len(names)} scanned"
    )
    sys.exit(1 if (flagged or errors) else 0)


if __name__ == "__main__":
    main()
