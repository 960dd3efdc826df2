"""Round-9 pins.

The link-prediction degree-cap knob (VERDICT r8 #6): the registered
`q_graph_link_predict` keeps its fixed cap-64 contract, and
`link_predict_topk(deg_cap=...)` is the deployment knob — pinned
exactly equal at the default cap, and pinned as a monotone lower
bound when the cap tightens (dropping a wedge center can only remove
positive 1/ln(d) terms from a pair's Adamic-Adar sum)."""

from __future__ import annotations

from polybot_data_etl_spark.operators import graph


def _score_map(rows):
    return {(r["a"], r["b"]): (r["cn"], r["aa"]) for r in rows}


def _all_candidates(spark, sf_dir, deg_cap):
    """Every non-edge candidate with its wedge count + raw AA score at
    the given center cap — the knob's frame before top-k truncation."""
    return (
        graph.link_predict_topk(spark, sf_dir, deg_cap=deg_cap, topk=None)
        .select("a", "b", "common_neighbors", "adamic_adar")
        .withColumnRenamed("common_neighbors", "cn")
        .withColumnRenamed("adamic_adar", "aa")
        .collect()
    )


def test_link_predict_knob_default_equals_registered(spark, sf_dir):
    reg = graph.q_graph_link_predict(spark, sf_dir).collect()
    knob = graph.link_predict_topk(spark, sf_dir).collect()
    assert [r.asDict() for r in reg] == [r.asDict() for r in knob]
    assert len(reg) > 0  # the pin is vacuous on an empty result


def test_link_predict_tighter_cap_is_monotone_lower_bound(spark, sf_dir):
    full = _score_map(_all_candidates(spark, sf_dir, deg_cap=graph._LP_DEG_CAP))
    capped = _score_map(_all_candidates(spark, sf_dir, deg_cap=16))
    assert full, "fixture graph produced no candidates at the default cap"
    assert capped, "cap=16 dropped every candidate — not a useful knob pin"
    # tightening the cap only DROPS wedge centers: no new pairs appear,
    # and every surviving pair loses (never gains) witnesses and score
    assert set(capped) <= set(full)
    for pair, (cn_c, aa_c) in capped.items():
        cn_f, aa_f = full[pair]
        assert cn_c <= cn_f, pair
        # 4-dp emit rounding on both sides → half-ulp slack
        assert aa_c <= aa_f + 5e-5, (pair, aa_c, aa_f)


def test_link_predict_loose_cap_is_superset_of_default(spark, sf_dir):
    """Raising the cap beyond the registered 64 only ADDS wedge
    centers — the registered result's pairs all survive with
    equal-or-higher scores (cap→∞ is the exact Adamic-Adar)."""
    full = _score_map(_all_candidates(spark, sf_dir, deg_cap=graph._LP_DEG_CAP))
    uncapped = _score_map(_all_candidates(spark, sf_dir, deg_cap=2**31 - 1))
    assert set(full) <= set(uncapped)
    for pair, (cn_f, aa_f) in full.items():
        cn_u, aa_u = uncapped[pair]
        assert cn_f <= cn_u, pair
        assert aa_f <= aa_u + 5e-5, (pair, aa_f, aa_u)
