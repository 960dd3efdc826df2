"""Local mirror of the driver's t2 differential gate (SURVEY.md §5.2):
every registered hash-checked query vs its DuckDB oracle at sf0.001.
"""

from __future__ import annotations

import pytest

from polybot_data_etl_spark import registry
from polybot_data_etl_spark.testing import frames_match

ALL_QUERIES = sorted(registry.queries())
ORACLES = registry.oracles()


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    sdf = registry.queries()[name](spark, sf_dir)
    spark_pd = sdf.toPandas()
    if name not in ORACLES:
        # rows-only contract: runs, stable schema, deterministic re-run
        assert len(spark_pd) >= 0
        again = registry.queries()[name](spark, sf_dir).toPandas()
        ok, why = frames_match(spark_pd, again)
        assert ok, f"{name} not deterministic: {why}"
        return
    duck_pd = duck.execute(ORACLES[name]).fetchdf()
    ok, why = frames_match(spark_pd, duck_pd)
    assert ok, f"{name}: {why}"


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(registry.queries())


def test_hll_merge_estimate_within_5pct(spark, duck, sf_dir):
    """The merged-sketch estimate (rows-only at the driver) must land
    within 5% of exact distinct truth per event type."""
    est = {
        r["event_type"]: r["approx_users"]
        for r in registry.queries()["q_agg_hll_merge"](spark, sf_dir).collect()
    }
    truth = dict(
        duck.execute(
            "SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    )
    assert set(est) == set(truth)
    for k, exact in truth.items():
        assert abs(est[k] - exact) <= max(1, 0.05 * exact), (
            k, est[k], exact
        )


def test_entry_smoke(spark):
    import __spark_entry__ as se

    rows = se.entry(spark).collect()
    assert len(rows) > 0
