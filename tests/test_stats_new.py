"""Property tests for the round-5 operator families: statistics
(t-test / chi-square / OLS), corpus filters (Gopher / readability),
k-means, SemDeDup, interval-overlap join, and Holt smoothing — each
verified against an independent pure-Python recomputation on the
sf0.001 fixtures (the oracle gate checks DuckDB parity; these check
the MATH)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table
from polybot_data_etl_spark.functions.stats import q_stats_ttest
from polybot_data_etl_spark.functions.vectors import q_embed_kmeans
from polybot_data_etl_spark.functions.dedup import q_dedup_semantic
from polybot_data_etl_spark.functions.quality import q_text_gopher
from polybot_data_etl_spark.operators.joins import (
    _OVERLAP_MIN_MINUTES,
    q_join_overlap,
)
from polybot_data_etl_spark.operators.timeseries import q_ts_holt


def test_ttest_matches_python_welch(spark, sf_dir):
    rows = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select("event_type", "value")
        .collect()
    )
    groups: dict[str, list[float]] = {"click": [], "view": []}
    for r in rows:
        groups[r.event_type].append(r.value)

    def stats(xs):
        n = len(xs)
        m = sum(xs) / n
        v = (sum(x * x for x in xs) - sum(xs) ** 2 / n) / (n - 1)
        return n, m, v

    na, ma, va = stats(groups["click"])
    nb, mb, vb = stats(groups["view"])
    t = (ma - mb) / math.sqrt(va / na + vb / nb)
    got = q_stats_ttest(spark, sf_dir).collect()[0]
    assert got.n_click == na and got.n_view == nb
    assert abs(got.t_stat - round(t, 4)) < 1e-9
    # Welch dof must lie between min(n)-1 and n_a+n_b-2
    assert min(na, nb) - 1 <= got.dof_welch <= na + nb - 2


def test_kmeans_partitions_all_vectors(spark, sf_dir):
    total = table(spark, sf_dir, "embeddings").count()
    rows = q_embed_kmeans(spark, sf_dir).collect()
    assert sum(r.n_members for r in rows) == total
    assert {r.cluster for r in rows} <= {0, 1, 2, 3}
    # scores are dot − ½|c|²; with unit vectors and near-mean centroids
    # they are bounded well inside (−1, 1)
    assert all(-1.0 < r.mean_score < 1.0 for r in rows)


def test_semantic_dedup_matches_bruteforce(spark, sf_dir):
    emb = {
        r.vec_id: (r.label, r.embedding)
        for r in table(spark, sf_dir, "embeddings").collect()
    }
    expect = set()
    ids = sorted(emb)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if emb[a][0] != emb[b][0]:
                continue
            dot = 0.0
            for x, y in zip(emb[a][1], emb[b][1]):
                dot += float(x) * float(y)
            if round(dot, 4) >= 0.30:
                expect.add((a, b))
    got = {
        (r.kept_id, r.dup_id)
        for r in q_dedup_semantic(spark, sf_dir).collect()
    }
    assert got == expect
    assert all(a < b for a, b in got)


def test_gopher_keep_is_conjunction(spark, sf_dir):
    for r in q_text_gopher(spark, sf_dir).collect():
        assert r.keep == (r.ok_len and r.ok_wlen and r.ok_stop and r.ok_uniq)
        assert r.mean_wlen > 0 and 0 < r.uniq_frac <= 1


def test_overlap_join_matches_bruteforce(spark, sf_dir):
    iv = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
        .collect()
    )
    by_day: dict = {}
    for r in iv:
        by_day.setdefault(r.day, []).append((r.user_id, r.s, r.e))
    expect: dict = {}
    for day, users in by_day.items():
        for u, s, e in users:
            if u >= 5:
                continue
            hits = []
            for v, s2, e2 in users:
                if v == u:
                    continue
                lo, hi = max(s, s2), min(e, e2)
                if hi <= lo:
                    continue
                mins = math.floor((hi - lo).total_seconds() / 60.0)
                if mins >= _OVERLAP_MIN_MINUTES:
                    hits.append(mins)
            if hits:
                expect[(day, u)] = (len(hits), max(hits))
    got = {
        (r.day, r.probe_id): (r.n_overlapping, r.max_overlap_min)
        for r in q_join_overlap(spark, sf_dir).collect()
    }
    assert got == expect


def test_holt_matches_python_recursion(spark, sf_dir):
    daily = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("y"))
        .orderBy("day")
        .collect()
    )
    ys = [float(r.y) for r in daily]
    l, b = ys[1], ys[1] - ys[0]
    for y in ys[2:]:
        nl = 0.5 * y + 0.5 * (l + b)
        b = 0.3 * (nl - l) + 0.7 * b
        l = nl
    got = {
        r.event_type: r for r in q_ts_holt(spark, sf_dir).collect()
    }["click"]
    assert got.n_days == len(ys)
    assert abs(got.level - round(l, 4)) < 1e-9
    assert abs(got.trend - round(b, 4)) < 1e-9
    assert abs(got.fc_2 - round(l + 2 * b, 4)) < 1e-9
