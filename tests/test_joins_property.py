"""Join-operator property tests beyond the oracle gate:

* as-of determinism on inputs WITH duplicate (user_id, ts) rows — the
  fixture has none, so the oracle check can't exercise the tiebreak
  (joins.py asof_match: highest build event_id wins at a tied ts).
* time-bucketed range join ≡ plain range join on the same input.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from polybot_data_etl_spark import registry
from polybot_data_etl_spark.operators.joins import asof_match


def _events(spark, rows):
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


TS = dt.datetime(2024, 1, 1, 12, 0, 0)


def test_asof_duplicate_build_ts_resolves_to_max_event_id(spark):
    """Two build events tied at the matched timestamp: the match must be
    the higher event_id, on every run and partitioning."""
    build = _events(
        spark,
        [
            (101, TS, 1),
            (102, TS, 1),  # same (user_id, ts) as 101
            (50, TS - dt.timedelta(hours=1), 1),
        ],
    )
    probe = _events(spark, [(900, TS + dt.timedelta(minutes=5), 1)])
    for _ in range(3):
        got = asof_match(probe, build).collect()
        assert len(got) == 1
        assert got[0]["match_id"] == 102


def test_asof_tie_at_probe_ts_is_inclusive(spark):
    """A build event exactly AT the probe ts matches (at-or-before)."""
    build = _events(spark, [(7, TS, 3), (6, TS - dt.timedelta(hours=2), 3)])
    probe = _events(spark, [(800, TS, 3)])
    got = asof_match(probe, build).collect()
    assert len(got) == 1 and got[0]["match_id"] == 7


def test_asof_no_earlier_build_drops_probe(spark):
    build = _events(spark, [(7, TS, 1)])
    probe = _events(spark, [(800, TS - dt.timedelta(hours=1), 1)])
    assert asof_match(probe, build).count() == 0


def test_asof_duplicate_probe_ts_each_probe_matches(spark):
    """Duplicate probe timestamps: every probe row gets its own match."""
    build = _events(spark, [(5, TS - dt.timedelta(minutes=1), 2)])
    probe = _events(spark, [(801, TS, 2), (802, TS, 2)])
    got = {r["probe_id"]: r["match_id"] for r in asof_match(probe, build).collect()}
    assert got == {801: 5, 802: 5}


def test_range_bucketed_equals_plain_range(spark, sf_dir):
    qs = registry.queries()
    plain = qs["q_join_range"](spark, sf_dir).toPandas()
    bucketed = qs["q_join_range_bucketed"](spark, sf_dir).toPandas()
    key = ["a_id", "b_id", "user_id"]
    a = plain.sort_values(key).reset_index(drop=True)
    b = bucketed.sort_values(key).reset_index(drop=True)[a.columns.tolist()]
    assert a.equals(b)


def test_asof_fwd_duplicate_build_ts_resolves_to_min_event_id(spark):
    """Forward mirror: two build events tied at the matched timestamp —
    the match must be the LOWER event_id, on every run."""
    from polybot_data_etl_spark.operators.joins import asof_match_forward

    build = _events(
        spark,
        [
            (101, TS, 1),
            (102, TS, 1),  # same (user_id, ts) as 101
            (200, TS + dt.timedelta(hours=1), 1),
        ],
    )
    probe = _events(spark, [(900, TS - dt.timedelta(minutes=5), 1)])
    for _ in range(3):
        got = asof_match_forward(probe, build).collect()
        assert len(got) == 1
        assert got[0]["match_id"] == 101


def test_asof_fwd_tie_at_probe_ts_is_inclusive(spark):
    """A build event exactly AT the probe ts matches (at-or-after)."""
    from polybot_data_etl_spark.operators.joins import asof_match_forward

    build = _events(spark, [(7, TS, 3), (8, TS + dt.timedelta(hours=2), 3)])
    probe = _events(spark, [(800, TS, 3)])
    got = asof_match_forward(probe, build).collect()
    assert len(got) == 1 and got[0]["match_id"] == 7


def test_asof_fwd_no_later_build_drops_probe(spark):
    from polybot_data_etl_spark.operators.joins import asof_match_forward

    build = _events(spark, [(7, TS, 1)])
    probe = _events(spark, [(800, TS + dt.timedelta(hours=1), 1)])
    assert asof_match_forward(probe, build).count() == 0
