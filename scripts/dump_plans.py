#!/usr/bin/env python
"""Dump `.explain("formatted")` for named queries into plans/<round>/.

The judge checks optimization claims (Exchange counts, join strategy,
PushedFilters, Python-eval nodes) against these committed files, so
every query touched in a round gets a `<name>_before.txt` /
`<name>_after.txt` pair.

Usage:
  python scripts/dump_plans.py --out plans/r13 --suffix before q_a q_b
  python scripts/dump_plans.py --out plans/r13 --suffix after  q_a q_b
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polybot_data_etl_spark.session import build_session
from __spark_entry__ import queries


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--out", default="plans/r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    spark = build_session()
    qs = queries()
    os.makedirs(args.out, exist_ok=True)
    for name in args.names:
        df = qs[name](spark, args.sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())


