"""Property tests for the spatial and skyline operators: the bucketed
formulations must equal their brute-force definitions on sf0.001."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table
from polybot_data_etl_spark.operators.geo import (
    _BAND_LAT,
    _BAND_LON,
    _RADIUS_KM,
    coords,
    q_geo_join,
)
from polybot_data_etl_spark.operators.windows import q_win_skyline
from polybot_data_etl_spark.operators.timeseries import q_ts_m4


def _hav(a, b):
    la1, lo1, la2, lo2 = map(
        math.radians, (a[0], a[1], b[0], b[1])
    )
    x = (
        math.sin((la2 - la1) / 2) ** 2
        + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
    )
    return 2 * 6371.0 * math.asin(math.sqrt(x))


def test_grid_radius_join_equals_bruteforce(spark, sf_dir):
    """The 3×3 neighbor covering must lose NO pair inside the band —
    the recall-exactness claim of the grid spatial join."""
    pts = {
        r.c_custkey: (r.lat, r.lon)
        for r in coords(spark, sf_dir).collect()
        if abs(r.lat) < _BAND_LAT and abs(r.lon) < _BAND_LON
    }
    ids = sorted(pts)
    expect = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if round(_hav(pts[a], pts[b]), 2) <= _RADIUS_KM:
                expect.add((a, b))
    got = {(r.a_id, r.b_id) for r in q_geo_join(spark, sf_dir).collect()}
    assert got == expect


def test_skyline_equals_dominance_definition(spark, sf_dir):
    """Frontier rows = rows with NO same-segment dominator
    (date ≤, price ≥, one strict) — checked against the O(n²) scan."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    rows = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderdate", "o_totalprice")
        .collect()
    )
    by_seg: dict = {}
    for r in rows:
        by_seg.setdefault(r.c_mktsegment, []).append(
            (r.o_orderdate, r.o_totalprice)
        )
    expect = set()
    for seg, pts in by_seg.items():
        for d, p in pts:
            dominated = any(
                d2 <= d and p2 >= p and (d2 < d or p2 > p)
                for d2, p2 in pts
            )
            if not dominated:
                expect.add((seg, d, round(p, 2)))
    got = {
        (r.seg, r.o_orderdate, r.o_totalprice)
        for r in q_win_skyline(spark, sf_dir).collect()
    }
    assert got == expect


def test_m4_matches_recomputed_extremes(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    ).collect()
    buckets: dict = {}
    for r in ev:
        b = r.ts.replace(minute=0, second=0, microsecond=0)
        buckets.setdefault((r.event_type, b), []).append(
            (r.ts, r.event_id, r.value)
        )
    got = {
        (r.event_type, r.bucket): r
        for r in q_ts_m4(spark, sf_dir).collect()
    }
    assert set(got) == set(buckets)
    for k, pts in buckets.items():
        vals = [v for _, _, v in pts]
        first = min(pts)[2]
        last = max(pts)[2]
        r = got[k]
        assert r.n == len(pts)
        assert r.v_min == round(min(vals), 2)
        assert r.v_max == round(max(vals), 2)
        assert r.v_first == round(first, 2)
        assert r.v_last == round(last, 2)
