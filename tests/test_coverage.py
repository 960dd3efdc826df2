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


def test_driver_window_priority_invariants():
    """The driver records only the first ~50 enumeration-order queries
    per round: never-recorded queries must enumerate first (so they get
    driver evidence), cheap before expensive within each group, and the
    fresh set must fit the window."""
    from polybot_data_etl_spark import registry

    names = list(registry.queries())
    fresh = [n for n in names if n not in registry._RECORDED]
    recorded = [n for n in names if n in registry._RECORDED]
    assert names == fresh + recorded, "fresh queries must enumerate first"
    assert len(fresh) <= 50, (
        f"{len(fresh)} never-recorded queries exceed the driver's ~50-row "
        "recording window; update _R*_RECORDED with the latest round's "
        "greens before adding more"
    )
    # cheap-before-expensive within the fresh block
    costs = [registry._cost_class(n) for n in fresh]
    assert costs == sorted(costs)
