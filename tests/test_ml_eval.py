"""Property tests for the model-evaluation family (confusion matrix /
ROC AUC / calibration) plus the MAD robust-spread and calendar-heatmap
operators — each verified against an independent pure-Python
recomputation on the sf0.001 fixtures (the oracle gate checks DuckDB
parity; these check the MATH)."""

from __future__ import annotations

import math
import statistics

from polybot_data_etl_spark.catalog import table
from polybot_data_etl_spark.functions.ml import (
    q_ml_auc,
    q_ml_calibration,
    q_ml_confusion,
)
from polybot_data_etl_spark.functions.stats import q_stats_mad
from polybot_data_etl_spark.operators.timeseries import q_ts_calendar


def _python_scores(spark, sf_dir):
    """Recompute the fused logistic head exactly as the operator does:
    4-dp rounding BEFORE any thresholding/ranking."""
    out = []
    for r in table(spark, sf_dir, "embeddings").collect():
        e = r.embedding
        z = 2.0 * float(e[0]) + 1.5 * float(e[1]) + float(e[2]) - 0.1
        score = round(1.0 / (1.0 + math.exp(-z)) + 1e-9, 4)
        out.append((score, r.label % 2 == 1))
    return out


def test_confusion_matches_python(spark, sf_dir):
    scores = _python_scores(spark, sf_dir)
    tp = sum(1 for s, t in scores if s >= 0.5 and t)
    fp = sum(1 for s, t in scores if s >= 0.5 and not t)
    fn = sum(1 for s, t in scores if s < 0.5 and t)
    tn = sum(1 for s, t in scores if s < 0.5 and not t)
    got = q_ml_confusion(spark, sf_dir).collect()[0]
    assert (got.tp, got.fp, got.fn, got.tn) == (tp, fp, fn, tn)
    assert got.tp + got.fp + got.fn + got.tn == len(scores)
    if tp + fp:
        assert abs(got.precision_ - round(tp / (tp + fp) + 1e-9, 4)) < 1e-9
    if tp + fn:
        assert abs(got.recall_ - round(tp / (tp + fn) + 1e-9, 4)) < 1e-9
    # F1 = 2tp/(pred_pos + actual_pos) — the single-ratio form
    if (tp + fp) + (tp + fn):
        f1 = 2.0 * tp / ((tp + fp) + (tp + fn))
        assert abs(got.f1 - round(f1 + 1e-9, 4)) < 1e-9


def test_auc_matches_python_ranksum(spark, sf_dir):
    scores = _python_scores(spark, sf_dir)
    # tie-averaged ranks over ascending score
    by_score: dict[float, list[bool]] = {}
    for s, t in scores:
        by_score.setdefault(s, []).append(t)
    rank_pos_sum, cum = 0.0, 0
    n_pos = sum(1 for _, t in scores if t)
    n_neg = len(scores) - n_pos
    for s in sorted(by_score):
        grp = by_score[s]
        avg_rank = cum + (len(grp) + 1) / 2.0
        rank_pos_sum += avg_rank * sum(grp)
        cum += len(grp)
    auc = (rank_pos_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    got = q_ml_auc(spark, sf_dir).collect()[0]
    assert got.n_pos == n_pos and got.n_neg == n_neg
    assert abs(got.auc - round(auc + 1e-9, 4)) < 1e-9
    assert 0.0 <= got.auc <= 1.0


def test_calibration_partitions_corpus(spark, sf_dir):
    scores = _python_scores(spark, sf_dir)
    rows = q_ml_calibration(spark, sf_dir).collect()
    assert sum(r.n for r in rows) == len(scores)
    assert all(0 <= r.bucket <= 9 for r in rows)
    assert all(0.0 <= r.pos_rate <= 1.0 for r in rows)
    # per-bucket mean prediction must sit inside the bucket's score span
    for r in rows:
        in_bucket = [
            s for s, _ in scores if min(int(s * 10), 9) == r.bucket
        ]
        assert r.n == len(in_bucket)
        lo, hi = min(in_bucket), max(in_bucket)
        assert lo - 1e-9 <= r.mean_score <= hi + 1e-9


def test_mad_matches_python(spark, sf_dir):
    vals: dict[str, list[float]] = {}
    for r in table(spark, sf_dir, "events").collect():
        vals.setdefault(r.event_type, []).append(r.value)
    got = {r.event_type: r for r in q_stats_mad(spark, sf_dir).collect()}
    assert set(got) == set(vals)
    for et, xs in vals.items():
        med = statistics.median(xs)
        mad = statistics.median(abs(x - med) for x in xs)
        assert got[et].n == len(xs)
        assert abs(got[et].median_ - round(med, 4)) < 1e-9
        assert abs(got[et].mad - round(mad, 4)) < 1e-9
        assert (
            abs(got[et].mad_sigma - round(1.4826 * mad + 1e-9, 4)) < 1e-9
        )


def test_calendar_grid_partitions_events(spark, sf_dir):
    total = table(spark, sf_dir, "events").count()
    rows = q_ts_calendar(spark, sf_dir).collect()
    assert sum(r.n_events for r in rows) == total
    assert all(0 <= r.dow <= 6 for r in rows)
    assert all(0 <= r.hr <= 23 for r in rows)
    assert len(rows) <= 7 * 24
