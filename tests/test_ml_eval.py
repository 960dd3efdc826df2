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


def _avg_ranks(xs):
    """Tie-averaged ranks (1-based) for a list, by value."""
    order = sorted(range(len(xs)), key=lambda i: xs[i])
    ranks = [0.0] * len(xs)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and xs[order[j]] == xs[order[i]]:
            j += 1
        avg = (i + 1 + j) / 2.0
        for k in range(i, j):
            ranks[order[k]] = avg
        i = j
    return ranks


def test_spearman_matches_python(spark, sf_dir):
    docs: dict[str, list[tuple[int, int]]] = {}
    for r in table(spark, sf_dir, "documents").collect():
        docs.setdefault(r.lang, []).append(
            (r.n_chars, len(r.text.split(" ")))
        )
    from polybot_data_etl_spark.functions.stats import q_stats_spearman

    got = {r.lang: r for r in q_stats_spearman(spark, sf_dir).collect()}
    assert set(got) == set(docs)
    for lang, pairs in docs.items():
        rx = _avg_ranks([p[0] for p in pairs])
        ry = _avg_ranks([p[1] for p in pairs])
        c = len(pairs)
        sx, sy = sum(rx), sum(ry)
        sxy = sum(a * b for a, b in zip(rx, ry))
        sxx = sum(a * a for a in rx)
        syy = sum(b * b for b in ry)
        rho = (c * sxy - sx * sy) / math.sqrt(
            (c * sxx - sx * sx) * (c * syy - sy * sy)
        )
        assert got[lang].n_docs == c
        assert abs(got[lang].rho - round(rho + 1e-9, 4)) < 1e-9
        assert -1.0 <= got[lang].rho <= 1.0


def test_ndcg_matches_python(spark, sf_dir):
    from polybot_data_etl_spark.functions.ml import q_ml_ndcg

    users: dict[int, list[tuple[float, int, bool]]] = {}
    for r in table(spark, sf_dir, "events").collect():
        users.setdefault(r.user_id, []).append(
            (r.value, r.event_id, r.event_type == "click")
        )
    ndcgs = []
    for evs in users.values():
        evs.sort(key=lambda t: (-t[0], t[1]))
        n_rel = sum(1 for e in evs if e[2])
        if n_rel == 0:
            continue
        dcg = sum(
            1.0 / math.log2(pos + 2)
            for pos, e in enumerate(evs[:10])
            if e[2]
        )
        idcg = 0.0
        for i in range(1, min(n_rel, 10) + 1):
            idcg += 1.0 / math.log2(i + 1)
        ndcgs.append(dcg / idcg)
    got = q_ml_ndcg(spark, sf_dir).collect()[0]
    assert got.n_users == len(ndcgs)
    mean = sum(ndcgs) / len(ndcgs)
    assert abs(got.mean_ndcg - round(mean + 1e-9, 4)) < 2e-4
    assert got.n_perfect == sum(1 for x in ndcgs if x >= 0.999999)


def test_reservoir_deterministic_and_sized(spark, sf_dir):
    import hashlib

    from polybot_data_etl_spark.operators.relational_ext import (
        q_sample_reservoir,
    )

    docs: dict[str, list[int]] = {}
    for r in table(spark, sf_dir, "documents").collect():
        docs.setdefault(r.lang, []).append(r.doc_id)
    rows = q_sample_reservoir(spark, sf_dir).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    assert set(by_lang) == set(docs)
    for lang, ids in docs.items():
        expect = sorted(
            ids,
            key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d),
        )[:20]
        got = sorted(by_lang[lang], key=lambda r: r.pos)
        assert [r.doc_id for r in got] == expect
        assert [r.pos for r in got] == list(range(1, len(expect) + 1))


def test_embed_cov_matches_numpy(spark, sf_dir):
    import numpy as np

    from polybot_data_etl_spark.functions.vectors import q_embed_cov

    X = np.array(
        [
            [float(v) for v in r.embedding[:8]]
            for r in table(spark, sf_dir, "embeddings").collect()
        ]
    )
    cov = np.cov(X, rowvar=False, ddof=1)
    corr = np.corrcoef(X, rowvar=False)
    rows = q_embed_cov(spark, sf_dir).collect()
    assert len(rows) == 8 * 9 // 2
    for r in rows:
        assert r.n == X.shape[0]
        assert abs(r.cov - cov[r.i][r.j]) < 1e-5
        assert abs(r.corr - corr[r.i][r.j]) < 1e-3
        if r.i == r.j:
            assert abs(r.corr - 1.0) < 1e-9


def test_kruskal_matches_python(spark, sf_dir):
    from polybot_data_etl_spark.functions.stats import q_stats_kruskal

    vals, groups = [], []
    for r in table(spark, sf_dir, "events").collect():
        vals.append(r.value)
        groups.append(r.event_type)
    ranks = _avg_ranks(vals)
    by_g: dict[str, list[float]] = {}
    for g, rk in zip(groups, ranks):
        by_g.setdefault(g, []).append(rk)
    n = len(vals)
    rsq = sum(sum(rs) ** 2 / len(rs) for rs in by_g.values())
    h = 12.0 / (n * (n + 1)) * rsq - 3 * (n + 1)
    # tie correction
    from collections import Counter

    ties = sum(t**3 - t for t in Counter(vals).values())
    h /= 1 - ties / (n**3 - n)
    got = q_stats_kruskal(spark, sf_dir).collect()[0]
    assert got.k_groups == len(by_g)
    assert got.n == n
    assert abs(got.h_stat - round(h + 1e-9, 4)) < 1e-6


def test_pr_curve_monotone_and_consistent(spark, sf_dir):
    from polybot_data_etl_spark.functions.ml import q_ml_pr_curve

    scores = _python_scores(spark, sf_dir)
    ap = sum(1 for _, t in scores if t)
    rows = sorted(
        q_ml_pr_curve(spark, sf_dir).collect(), key=lambda r: r.threshold
    )
    prev_pp = None
    for r in rows:
        tp = sum(1 for s, t in scores if s >= r.threshold and t)
        pp = sum(1 for s, _ in scores if s >= r.threshold)
        assert (r.tp, r.pred_pos) == (tp, pp)
        assert abs(r.recall_ - round(tp / ap + 1e-9, 4)) < 1e-9
        # pred_pos shrinks (recall falls) as the threshold rises
        if prev_pp is not None:
            assert pp <= prev_pp
        prev_pp = pp


def test_novelty_matches_python(spark, sf_dir):
    from polybot_data_etl_spark.functions.text import q_text_novelty

    def py_shingles(text):
        words = text.lower().split(" ")
        if len(words) < 3:
            return {" ".join(words)}
        return {
            " ".join(words[i : i + 3]) for i in range(len(words) - 2)
        }

    docs = table(spark, sf_dir, "documents").collect()
    first: dict[str, int] = {}
    for r in sorted(docs, key=lambda r: r.doc_id):
        for s in py_shingles(r.text):
            first.setdefault(s, r.doc_id)
    per_lang: dict[str, list[tuple[int, int]]] = {}
    for r in docs:
        sh = py_shingles(r.text)
        novel = sum(1 for s in sh if first[s] == r.doc_id)
        per_lang.setdefault(r.lang, []).append((novel, len(sh)))
    got = {r.lang: r for r in q_text_novelty(spark, sf_dir).collect()}
    assert set(got) == set(per_lang)
    for lang, pairs in per_lang.items():
        assert got[lang].n_docs == len(pairs)
        assert got[lang].novel_shingles == sum(p[0] for p in pairs)
        mean = sum(p[0] / p[1] for p in pairs) / len(pairs)
        assert abs(got[lang].mean_novelty - round(mean + 1e-9, 4)) < 1e-8
        assert got[lang].n_fully_seen == sum(
            1 for p in pairs if p[0] == 0
        )


def test_mann_kendall_matches_python(spark, sf_dir):
    from collections import Counter

    from polybot_data_etl_spark.operators.behavior import q_ts_trend

    daily: dict[str, dict] = {}
    for r in table(spark, sf_dir, "events").collect():
        d = r.ts.date()
        daily.setdefault(r.event_type, {}).setdefault(d, 0)
        daily[r.event_type][d] += 1
    got = {r.event_type: r for r in q_ts_trend(spark, sf_dir).collect()}
    assert set(got) == set(daily)
    for et, by_day in daily.items():
        xs = [by_day[d] for d in sorted(by_day)]
        n = len(xs)
        s = sum(
            (0 if xs[j] == xs[i] else (1 if xs[j] > xs[i] else -1))
            for i in range(n)
            for j in range(i + 1, n)
        )
        tie = sum(
            t * (t - 1) * (2 * t + 5) for t in Counter(xs).values()
        )
        var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
        cc = 1 if s > 0 else (-1 if s < 0 else 0)
        z = (s - cc) / math.sqrt(var)
        assert got[et].n_days == n
        assert got[et].s_stat == s
        assert abs(got[et].z - round(z + 1e-9, 4)) < 1e-9
        assert got[et].trend == (
            "up" if s > 0 else ("down" if s < 0 else "flat")
        )


def test_attr_position_conserves_value(spark, sf_dir):
    from polybot_data_etl_spark.operators.behavior import q_attr_position

    # total credit across touch types == total purchase value of
    # journeys that HAVE at least one preceding touch segment-mate
    events = table(spark, sf_dir, "events").collect()
    by_user: dict[int, list] = {}
    for r in events:
        by_user.setdefault(r.user_id, []).append(r)
    total = 0.0
    for evs in by_user.values():
        evs.sort(key=lambda r: (r.ts, r.event_id))
        seg, touches_in_seg, purch = 0, {}, {}
        for r in evs:
            if r.event_type == "purchase":
                purch[seg] = purch.get(seg, 0.0) + r.value
                seg += 1
            else:
                touches_in_seg[seg] = touches_in_seg.get(seg, 0) + 1
        for s, v in purch.items():
            if touches_in_seg.get(s):
                total += v
    rows = q_attr_position(spark, sf_dir).collect()
    assert abs(sum(r.credit for r in rows) - total) < 0.05
    assert all(r.credit >= 0 for r in rows)


def test_embed_outliers_are_true_top5(spark, sf_dir):
    import numpy as np

    from polybot_data_etl_spark.functions.vectors import q_embed_outliers

    by_label: dict[int, list] = {}
    for r in table(spark, sf_dir, "embeddings").collect():
        by_label.setdefault(r.label, []).append(
            (r.vec_id, np.array(r.embedding, dtype=np.float64))
        )
    got: dict[int, list] = {}
    for r in q_embed_outliers(spark, sf_dir).collect():
        got.setdefault(r.label, []).append((r.vec_id, r.dist))
    assert set(got) == set(by_label)
    for label, vecs in by_label.items():
        X = np.stack([v for _, v in vecs])
        mu = np.round(X.mean(axis=0) + 1e-9, 6)
        dists = {
            vid: round(float(np.sqrt(((v - mu) ** 2).sum())) + 1e-9, 4)
            for vid, v in vecs
        }
        expect = sorted(dists, key=lambda k: (-dists[k], k))[:5]
        assert [vid for vid, _ in sorted(
            got[label], key=lambda t: (-t[1], t[0])
        )] == expect
        for vid, d in got[label]:
            assert abs(d - dists[vid]) < 1e-9


def test_logloss_matches_python(spark, sf_dir):
    from polybot_data_etl_spark.functions.ml import q_ml_logloss

    scores = _python_scores(spark, sf_dir)
    clipped = [
        (min(max(s, 1e-6), 1 - 1e-6), 1.0 if t else 0.0)
        for s, t in scores
    ]
    n = len(clipped)
    ll = -sum(
        y * math.log(p) + (1 - y) * math.log(1 - p) for p, y in clipped
    ) / n
    brier = sum((p - y) ** 2 for p, y in clipped) / n
    got = q_ml_logloss(spark, sf_dir).collect()[0]
    assert got.n == n
    assert abs(got.log_loss - round(ll + 1e-9, 4)) < 2e-4
    assert abs(got.brier - round(brier + 1e-9, 4)) < 2e-4
    assert got.log_loss > 0 and 0 <= got.brier <= 1


def test_proportion_ztest_matches_python(spark, sf_dir):
    from polybot_data_etl_spark.functions.stats import q_stats_proportion

    na = nb = xa = xb = 0
    for r in table(spark, sf_dir, "events").collect():
        click = r.event_type == "click"
        if r.user_id % 2 == 0:
            na += 1
            xa += click
        else:
            nb += 1
            xb += click
    pa, pb = xa / na, xb / nb
    pool = (xa + xb) / (na + nb)
    z = (pa - pb) / math.sqrt(pool * (1 - pool) * (1 / na + 1 / nb))
    got = q_stats_proportion(spark, sf_dir).collect()[0]
    assert (got.n_a, got.n_b) == (na, nb)
    assert abs(got.rate_a - round(pa + 1e-9, 4)) < 1e-9
    assert abs(got.rate_b - round(pb + 1e-9, 4)) < 1e-9
    assert abs(got.z - round(z + 1e-9, 4)) < 1e-9


def test_pca_power_iteration_properties(spark, sf_dir):
    import numpy as np

    from polybot_data_etl_spark.functions.vectors import q_embed_pca

    X = np.array(
        [
            [float(v) for v in r.embedding[:8]]
            for r in table(spark, sf_dir, "embeddings").collect()
        ]
    )
    cov = np.cov(X, rowvar=False, ddof=1)
    w = np.linalg.eigvalsh(cov)
    rows = sorted(q_embed_pca(spark, sf_dir).collect(), key=lambda r: r.dim)
    got = np.array([r.loading for r in rows])
    assert len(rows) == 8
    # unit norm (to 4-dp rounding)
    assert abs(np.linalg.norm(got) - 1.0) < 1e-3
    # the Rayleigh quotient of the 3-step iterate must beat the mean
    # eigenvalue (power iteration monotonically tilts toward the top
    # of the spectrum; the fixtures are near-isotropic — l2/l1 ~ 0.96
    # — so full eigenvector alignment is NOT expected in 3 steps)
    rq = float(got @ cov @ got)
    assert rq > w.mean()
    # the eigenvalue estimate ||C v|| lies inside the spectrum's range
    assert w[0] - 1e-6 <= rows[0].eigenvalue <= w[-1] + 1e-4
    # and improves on the uniform start's Rayleigh quotient
    v0 = np.full(8, 1 / np.sqrt(8))
    assert rq >= float(v0 @ cov @ v0) - 1e-9


def test_graph_degree_partitions_nodes(spark, sf_dir):
    from polybot_data_etl_spark.operators.graph import q_graph_degree

    rows = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    by_order: dict[int, set] = {}
    for r in rows:
        if r.l_partkey % 4 == 0:
            by_order.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                edges.add((a, b))
    deg: dict[int, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    from collections import Counter

    hist = Counter(deg.values())
    got = {r.degree: r.n_nodes for r in q_graph_degree(spark, sf_dir).collect()}
    assert got == dict(hist)


def test_upsample_balances_and_caps(spark, sf_dir):
    import math as _math

    from polybot_data_etl_spark.plans.pipelines import q_mix_upsample

    per: dict[str, int] = {}
    for r in table(spark, sf_dir, "documents").collect():
        per[r.source] = per.get(r.source, 0) + 1
    mx = max(per.values())
    rows = q_mix_upsample(spark, sf_dir).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    assert set(by_src) == set(per)
    for src, n in per.items():
        rep = min(4, _math.ceil(mx / n))
        copies = sorted(r.copy for r in by_src[src])
        assert copies == list(range(1, rep + 1))
        for r in by_src[src]:
            # every copy is a FULL replica of the source
            assert r.n_rows == n and r.n_docs == n


def test_nearest_join_matches_python(spark, sf_dir):
    from polybot_data_etl_spark.operators.joins import q_join_nearest

    clicks, purchases = {}, {}
    for r in table(spark, sf_dir, "events").collect():
        if r.event_type == "click":
            clicks.setdefault(r.user_id, []).append((r.ts, r.event_id))
        elif r.event_type == "purchase":
            purchases.setdefault(r.user_id, []).append((r.ts, r.event_id))
    expect = {}
    for uid, cs in clicks.items():
        ps = purchases.get(uid)
        if not ps:
            continue
        for cts, cid in cs:
            prev = [(ts, eid) for ts, eid in ps if ts <= cts]
            nxt = [(ts, eid) for ts, eid in ps if ts > cts]
            pbest = max(prev, key=lambda t: (t[0], t[1])) if prev else None
            nbest = min(nxt, key=lambda t: (t[0], t[1])) if nxt else None
            # second-truncated epochs: unix_timestamp/date_diff semantics
            sec = lambda ts: int(ts.timestamp())  # noqa: E731
            gp = sec(cts) - sec(pbest[0]) if pbest else None
            gn = sec(nbest[0]) - sec(cts) if nbest else None
            if nbest is None or (pbest is not None and gp <= gn):
                expect[cid] = (pbest[1], "prev", gp)
            else:
                expect[cid] = (nbest[1], "next", gn)
    got = {
        r.click_id: (r.nearest_purchase_id, r.direction, r.gap_sec)
        for r in q_join_nearest(spark, sf_dir).collect()
    }
    assert got == expect


def test_expectations_all_pass_on_clean_fixtures(spark, sf_dir):
    from polybot_data_etl_spark.functions.dq import q_dq_expectations

    total = table(spark, sf_dir, "events").count()
    rows = q_dq_expectations(spark, sf_dir).collect()
    assert len(rows) == 5
    assert all(r.n_rows == total for r in rows)
    # synthetic fixtures are clean: every expectation passes with 0
    # violations (the operator's job is to PROVE that, not assume it)
    assert all(r.passed and r.n_violations == 0 for r in rows)


def test_feature_auc_matches_python(spark, sf_dir):
    from polybot_data_etl_spark.functions.ml import q_ml_feature_auc

    rows = table(spark, sf_dir, "embeddings").collect()
    got = {r.dim: r for r in q_ml_feature_auc(spark, sf_dir).collect()}
    assert set(got) == set(range(1, 9))
    for dim in range(1, 9):
        scored = [
            (round(float(r.embedding[dim - 1]) + 1e-9, 4), r.label % 2 == 1)
            for r in rows
        ]
        by_score: dict[float, list[bool]] = {}
        for s, t in scored:
            by_score.setdefault(s, []).append(t)
        rank_pos, cum = 0.0, 0
        n_pos = sum(1 for _, t in scored if t)
        n_neg = len(scored) - n_pos
        for s in sorted(by_score):
            grp = by_score[s]
            rank_pos += (cum + (len(grp) + 1) / 2.0) * sum(grp)
            cum += len(grp)
        auc = (rank_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
        assert abs(got[dim].auc - round(auc + 1e-9, 4)) < 1e-9
        assert abs(
            got[dim].separation - round(abs(auc - 0.5) + 1e-9, 4)
        ) < 1e-9


def test_gaps_match_python(spark, sf_dir):
    import statistics as _st

    from polybot_data_etl_spark.operators.timeseries import q_ts_gaps

    by_key: dict[tuple, list] = {}
    for r in table(spark, sf_dir, "events").collect():
        by_key.setdefault((r.event_type, r.ts.date()), []).append(
            (r.ts, r.event_id)
        )
    gaps: dict[str, list[int]] = {}
    for (et, _), evs in by_key.items():
        evs.sort()
        for (a, _), (b, _) in zip(evs, evs[1:]):
            gaps.setdefault(et, []).append(
                int(b.timestamp()) - int(a.timestamp())
            )
    got = {r.event_type: r for r in q_ts_gaps(spark, sf_dir).collect()}
    assert set(got) == set(gaps)
    for et, gs in gaps.items():
        assert got[et].n_gaps == len(gs)
        assert abs(got[et].p50_sec - _st.median(gs)) < 1e-9
        assert got[et].max_sec == max(gs)
        # p95 within the sorted neighborhood of the python quantile
        gs_sorted = sorted(gs)
        import math as _m

        pos = 0.95 * (len(gs) - 1)
        lo, hi = gs_sorted[_m.floor(pos)], gs_sorted[_m.ceil(pos)]
        assert lo - 1e-9 <= got[et].p95_sec <= hi + 1e-9


def test_lsh_stats_accounts_all_docs(spark, sf_dir):
    from polybot_data_etl_spark.functions.text import (
        _MINHASH_BANDS,
        q_dedup_lsh_stats,
    )

    n_docs = table(spark, sf_dir, "documents").count()
    rows = q_dedup_lsh_stats(spark, sf_dir).collect()
    bands = {r.band for r in rows}
    assert bands == set(range(_MINHASH_BANDS))
    for b in bands:
        # every doc lands in exactly one bucket per band:
        # sum(size * n_buckets) over the band == corpus size
        total = sum(
            r.bucket_size * r.n_buckets for r in rows if r.band == b
        )
        assert total == n_docs
        for r in rows:
            if r.band == b:
                expect_cost = (
                    r.bucket_size * (r.bucket_size - 1) // 2
                ) * r.n_buckets
                assert r.pair_cost == expect_cost


def test_curriculum_partitions_each_lang(spark, sf_dir):
    from polybot_data_etl_spark.plans.pipelines import q_mix_curriculum

    per_lang: dict[str, int] = {}
    for r in table(spark, sf_dir, "documents").collect():
        per_lang[r.lang] = per_lang.get(r.lang, 0) + 1
    rows = q_mix_curriculum(spark, sf_dir).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    assert set(by_lang) == set(per_lang)
    for lang, rs in by_lang.items():
        assert sum(r.n_docs for r in rs) == per_lang[lang]
        assert {r.phase for r in rs} <= {1, 2, 3, 4}
        # phases are ordered score bands: min of phase p+1 >= max of p
        ordered = sorted(rs, key=lambda r: r.phase)
        for a, b in zip(ordered, ordered[1:]):
            assert b.min_quality >= a.max_quality - 1e-9
        # quartile balance: no phase holds more than ~45% of the lang
        # (exact quartiles up to cutpoint ties)
        assert max(r.n_docs for r in rs) <= 0.45 * per_lang[lang] + 2


def test_cross_source_containment_matches_python(spark, sf_dir):
    from polybot_data_etl_spark.functions.dedup import (
        q_dedup_cross_source,
    )

    def py_shingles(text):
        words = text.lower().split(" ")
        if len(words) < 3:
            return {" ".join(words)}
        return {
            " ".join(words[i : i + 3]) for i in range(len(words) - 2)
        }

    per_src: dict[str, set] = {}
    for r in table(spark, sf_dir, "documents").collect():
        per_src.setdefault(r.source, set()).update(py_shingles(r.text))
    got = {
        (r.src_a, r.src_b): r
        for r in q_dedup_cross_source(spark, sf_dir).collect()
    }
    for a in per_src:
        for b in per_src:
            if a == b:
                continue
            shared = len(per_src[a] & per_src[b])
            if shared == 0:
                assert (a, b) not in got
                continue
            r = got[(a, b)]
            assert r.shared_shingles == shared
            assert r.n_b == len(per_src[b])
            assert abs(
                r.containment
                - round(shared / len(per_src[b]) + 1e-9, 4)
            ) < 1e-9


def test_threshold_is_argmax_f1(spark, sf_dir):
    from polybot_data_etl_spark.functions.ml import q_ml_threshold

    scores = _python_scores(spark, sf_dir)
    ap = sum(1 for _, t in scores if t)
    best = None
    for cand in sorted({s for s, _ in scores}, reverse=True):
        tp = sum(1 for s, t in scores if s >= cand and t)
        pp = sum(1 for s, _ in scores if s >= cand)
        f1 = round(2.0 * tp / (pp + ap) + 1e-9, 4)
        if best is None or f1 > best[1] or (
            f1 == best[1] and cand > best[0]
        ):
            best = (cand, f1, tp, pp)
    got = q_ml_threshold(spark, sf_dir).collect()[0]
    assert (got.threshold, got.f1, got.tp, got.pred_pos) == best


def test_conversion_window_matches_python(spark, sf_dir):
    from polybot_data_etl_spark.operators.timeseries import (
        q_ts_conversion_window,
    )

    by_user: dict[int, list] = {}
    for r in table(spark, sf_dir, "events").collect():
        if r.event_type in ("click", "purchase"):
            by_user.setdefault(r.user_id, []).append(r)
    per_day: dict = {}
    for evs in by_user.values():
        evs.sort(
            key=lambda r: (
                r.ts,
                0 if r.event_type == "click" else 1,
                r.event_id,
            )
        )
        last_click = None
        for r in evs:
            if r.event_type == "click":
                last_click = r.ts
            else:
                day = r.ts.date()
                n, a = per_day.get(day, (0, 0))
                hit = last_click is not None and (
                    int(r.ts.timestamp()) - int(last_click.timestamp())
                    <= 3600
                )
                per_day[day] = (n + 1, a + (1 if hit else 0))
    got = {
        r.day.date(): (r.n_purchases, r.n_attributed)
        for r in q_ts_conversion_window(spark, sf_dir).collect()
    }
    assert got == per_day


def test_cumulative_users_matches_python(spark, sf_dir):
    from polybot_data_etl_spark.operators.timeseries import (
        q_ts_cumulative_users,
    )

    first: dict[int, object] = {}
    for r in table(spark, sf_dir, "events").collect():
        d = r.ts.date()
        if r.user_id not in first or d < first[r.user_id]:
            first[r.user_id] = d
    from collections import Counter

    per_day = Counter(first.values())
    rows = sorted(
        q_ts_cumulative_users(spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    assert [r.day.date() for r in rows] == sorted(per_day)
    cum = 0
    for r in rows:
        assert r.new_users == per_day[r.day.date()]
        cum += r.new_users
        assert r.cumulative_users == cum
    assert cum == len(first)


def test_ks_matches_python(spark, sf_dir):
    from polybot_data_etl_spark.functions.ml import q_ml_ks

    scores = _python_scores(spark, sf_dir)
    pos = sorted(s for s, t in scores if t)
    neg = sorted(s for s, t in scores if not t)
    grid = sorted({s for s, _ in scores})
    import bisect

    ks = max(
        abs(
            bisect.bisect_right(pos, g) / len(pos)
            - bisect.bisect_right(neg, g) / len(neg)
        )
        for g in grid
    )
    got = q_ml_ks(spark, sf_dir).collect()[0]
    assert got.n_pos == len(pos) and got.n_neg == len(neg)
    assert abs(got.ks - round(ks + 1e-9, 4)) < 1e-9
    assert 0.0 <= got.ks <= 1.0


def test_drift_ks_matches_python(spark, sf_dir):
    import bisect
    from datetime import date

    from polybot_data_etl_spark.functions.dq import q_dq_drift_ks

    halves: dict[str, tuple[list, list]] = {}
    for r in table(spark, sf_dir, "events").collect():
        v = round(r.value, 2)
        first = r.ts.date() < date(2024, 1, 16)
        a, b = halves.setdefault(r.event_type, ([], []))
        (a if first else b).append(v)
    got = {r.event_type: r for r in q_dq_drift_ks(spark, sf_dir).collect()}
    assert set(got) == set(halves)
    for et, (a, b) in halves.items():
        a.sort()
        b.sort()
        grid = sorted(set(a) | set(b))
        ks = max(
            abs(
                bisect.bisect_right(a, g) / len(a)
                - bisect.bisect_right(b, g) / len(b)
            )
            for g in grid
        )
        assert got[et].n_first_half == len(a)
        assert got[et].n_second_half == len(b)
        assert abs(got[et].ks - round(ks + 1e-9, 4)) < 1e-6


def test_ratio_delta_matches_python(spark, sf_dir):
    from polybot_data_etl_spark.functions.stats import q_stats_ratio

    per: dict[str, dict[int, list]] = {}
    for r in table(spark, sf_dir, "events").collect():
        u = per.setdefault(r.event_type, {}).setdefault(
            r.user_id, [0.0, 0]
        )
        u[0] += r.value
        u[1] += 1
    got = {r.event_type: r for r in q_stats_ratio(spark, sf_dir).collect()}
    assert set(got) == set(per)
    for et, users in per.items():
        xs = [v[0] for v in users.values()]
        ys = [v[1] for v in users.values()]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        ratio = sx / sy
        var_x = (sum(x * x for x in xs) - sx * sx / n) / (n - 1)
        var_y = (sum(y * y for y in ys) - sy * sy / n) / (n - 1)
        cov = (
            sum(x * y for x, y in zip(xs, ys)) - sx * sy / n
        ) / (n - 1)
        se = math.sqrt(
            (var_x + ratio * ratio * var_y - 2 * ratio * cov) / n
        ) / (sy / n)
        assert got[et].n_users == n
        assert abs(got[et].ratio - round(ratio + 1e-9, 4)) < 1e-9
        assert abs(got[et].se_delta - round(se + 1e-9, 4)) < 1e-7
        assert got[et].se_delta >= 0


def test_rolling_median_matches_python(spark, sf_dir):
    import statistics as _st

    from polybot_data_etl_spark.operators.timeseries import (
        q_ts_rolling_median,
    )

    daily: dict[str, dict] = {}
    for r in table(spark, sf_dir, "events").collect():
        d = r.ts.date()
        daily.setdefault(r.event_type, {}).setdefault(d, 0)
        daily[r.event_type][d] += 1
    got = {
        (r.event_type, r.day.date()): r
        for r in q_ts_rolling_median(spark, sf_dir).collect()
    }
    for et, by_day in daily.items():
        days = sorted(by_day)
        for i, d in enumerate(days):
            frame = [by_day[x] for x in days[max(0, i - 6) : i + 1]]
            r = got[(et, d)]
            assert r.n_events == by_day[d]
            assert abs(r.med7 - _st.median(frame)) < 1e-9
