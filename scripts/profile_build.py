#!/usr/bin/env python
"""Per-builder plan-construction timing (no execution): calls every
registered query builder, times the DataFrame construction only, and
prints the top offenders plus the suite total — the feedback loop for
the plan-build attack (VERDICT r7 #5: ~70% of build wall is Py4J
round-trips; the win is fewer JVM calls per builder, so this ranks
builders by exactly that cost).

Usage:
  python scripts/profile_build.py                # 3 passes, sf0.1 dir
  python scripts/profile_build.py --passes 2 --top 30
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polybot_data_etl_spark.session import build_session
from __spark_entry__ import queries


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    spark = build_session()
    qs = queries()
    per_pass: list[dict[str, float]] = []
    for p in range(args.passes):
        times: dict[str, float] = {}
        t_pass = time.perf_counter()
        for name, fn in qs.items():
            t0 = time.perf_counter()
            fn(spark, args.sf_dir)
            times[name] = time.perf_counter() - t0
        wall = time.perf_counter() - t_pass
        per_pass.append(times)
        print(
            f"pass {p}: build wall {wall:.1f}s "
            f"({'cold' if p == 0 else 'warm'})",
            file=sys.stderr,
        )
    warm = per_pass[-1]
    ranked = sorted(warm.items(), key=lambda kv: -kv[1])
    print(f"\n== warm pass total: {sum(warm.values()):.1f}s ==", file=sys.stderr)
    for name, sec in ranked[: args.top]:
        print(f"{sec:7.3f}s  {name}", file=sys.stderr)
    print(
        json.dumps(
            {
                "warm_total_sec": round(sum(warm.values()), 1),
                "cold_total_sec": round(sum(per_pass[0].values()), 1),
                "loadavg": [round(x, 2) for x in os.getloadavg()],
                "top": {n: round(s, 3) for n, s in ranked[: args.top]},
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
