#!/usr/bin/env python
"""SURVEY.md §2 ↔ registry parity report.

Parses every row of the §2 operator inventory (the judge's contract),
checks each `q_*` key against the live registry (registered? oracle?),
and cross-checks the other direction (registered queries missing from
SURVEY).  Prints one JSON document; exits non-zero on any mismatch so
it can gate CI / the pre-snapshot checklist.  The pytest twin is
tests/test_coverage.py.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

_ROW = re.compile(r"^\|\s*(\d+)\s*\|\s*(`q_\w+`|—)\s*\|")


def survey_rows(survey_path: str) -> list[dict]:
    rows = []
    for line in open(survey_path):
        m = _ROW.match(line)
        if not m:
            continue
        key = m.group(2).strip("`")
        rows.append(
            {
                "row": int(m.group(1)),
                "key": None if key == "—" else key,
                "gate": "hash" if "| hash |" in line
                else "rows" if "| rows" in line
                else "test",
            }
        )
    return rows


def build_report(survey_path: str) -> dict:
    from polybot_data_etl_spark.registry import oracles, queries

    qs, oq = set(queries()), set(oracles())
    rows = survey_rows(survey_path)
    surveyed = {r["key"] for r in rows if r["key"]}
    problems = []
    for r in rows:
        if r["key"] is None:
            continue
        if r["key"] not in qs:
            problems.append(f"SURVEY row {r['row']}: {r['key']} not registered")
        elif r["gate"] == "hash" and r["key"] not in oq:
            problems.append(
                f"SURVEY row {r['row']}: {r['key']} claims hash gate but has"
                " no oracle"
            )
    for q in sorted(qs - surveyed):
        problems.append(f"registered query {q} missing from SURVEY §2")
    return {
        "survey_rows": len(rows),
        "survey_queries": len(surveyed),
        "registered_queries": len(qs),
        "with_oracle": len(oq),
        "rows_only": sorted(qs - oq),
        "problems": problems,
    }


def main() -> int:
    survey_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SURVEY.md",
    )
    report = build_report(survey_path)
    print(json.dumps(report, indent=2))
    return 1 if report["problems"] else 0


if __name__ == "__main__":
    sys.exit(main())
