#!/usr/bin/env python
"""Negative-zero audit (round 8): run every registered ORACLE in DuckDB
and flag any float cell that is IEEE −0.0.

Why: a DuckDB −0.0 is a LATENT hash divergence even when the current
sweep is green — Spark's unsafe-row path folds −0.0 → +0.0 but its
Arrow/pandas paths do not, so a cell where both engines emit −0.0 today
(hash match) can flip red if the Spark plan's emit path changes.  The
emit-side convention (SURVEY §2.1.13: `round(...) + 0.0` on both
engines) removes the class; this audit finds every query that still
needs it, without running Spark at all.

Usage:
  python scripts/audit_negzero.py                 # sf0.001 + sf0.01
  python scripts/audit_negzero.py --sf 0.1        # one scale
"""

from __future__ import annotations

import argparse
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polybot_data_etl_spark.catalog import TABLES
from __spark_entry__ import oracle_sql


def audit_scale(sf: str) -> dict[str, list[str]]:
    sf_dir = f"/root/testdata/sf{sf}"
    con = duckdb.connect()
    con.execute("SET threads TO 8")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{t}.parquet')"
        )
    flagged: dict[str, list[str]] = {}
    for name, sql in oracle_sql().items():
        try:
            df = con.execute(sql).df()
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            flagged[name] = [f"ORACLE ERROR: {exc}"]
            continue
        cols = []
        for col in df.columns:
            if df[col].dtype.kind != "f":
                continue
            vals = df[col].to_numpy()
            # −0.0 detection: v == 0 and signbit — NaNs excluded
            neg = [
                v
                for v in vals
                if v == 0.0 and math.copysign(1.0, v) < 0
            ]
            if neg:
                cols.append(col)
        if cols:
            flagged[name] = cols
    con.close()
    return flagged


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", action="append", default=None)
    args = ap.parse_args()
    scales = args.sf or ["0.001", "0.01"]
    bad: dict[str, set[str]] = {}
    for sf in scales:
        flagged = audit_scale(sf)
        print(f"== sf{sf}: {len(flagged)} queries emit -0.0 ==")
        for name, cols in sorted(flagged.items()):
            print(f"  {name}: {cols}")
            bad.setdefault(name, set()).update(cols)
    print(
        f"\n== negzero audit: {len(bad)} queries need the"
        " +0.0 emit normalizer (SURVEY 2.1.13) =="
    )
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
