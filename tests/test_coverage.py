"""SURVEY §2 ↔ registry parity: every `q_*` row in the contract table
must be registered (with an oracle when it claims the hash gate), and
every registered query must appear in the contract — the drift net
between the documented surface and the implemented one."""

from __future__ import annotations

import os

from scripts.coverage_report import build_report

_SURVEY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SURVEY.md"
)


def test_survey_and_registry_agree():
    report = build_report(_SURVEY)
    assert report["problems"] == [], "\n".join(report["problems"])
    assert report["survey_queries"] == report["registered_queries"]
    # the only rows-only query is the declared approximate one
    assert report["rows_only"] == ["q_agg_approx"]
