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
    # the only rows-only queries are the declared approximate ones
    # (HLL estimates are sketch-library-specific on both engines)
    assert report["rows_only"] == ["q_agg_approx", "q_agg_hll_merge"]


def test_driver_window_priority_invariants():
    """The driver records only the first ~50 enumeration-order queries
    per round.  Three tiers: (0) the 58-query never-driver-recorded
    evidence debt (VERDICT r3 §Next-round #1) must enumerate first;
    (1) queries newly registered this round yield to them; (2) already-
    recorded queries go last.  Cheap before expensive within each tier
    so a time-capped driver run records the maximum number of rows."""
    from polybot_data_etl_spark import registry

    names = list(registry.queries())
    tiers = [registry._tier(n) for n in names]
    assert tiers == sorted(tiers), "tier order must be monotonic"
    tier0 = [n for n in names if registry._tier(n) == 0]
    # 58 never-recorded queries after folding in CORRECTNESS_r03; the
    # ~8 that spill past the 50-row window must lead round 5's window —
    # nothing new may be registered ahead of them (keep _NEW_THIS_ROUND
    # up to date for any round-4 additions).
    assert len(tier0) == 58, (
        f"tier-0 evidence-debt set changed size ({len(tier0)}); update "
        "_R*_RECORDED with the latest round's greens and re-pin"
    )
    for n in names:
        if registry._tier(n) == 0:
            assert n not in registry._NEW_THIS_ROUND
    # cheap-before-expensive within each tier
    for t in (0, 1, 2):
        costs = [registry._cost_class(n) for n in names if registry._tier(n) == t]
        assert costs == sorted(costs)
