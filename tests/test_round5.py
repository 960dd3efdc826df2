"""Property tests for the round-5 additions (decimal/interval scalar
surface, lift/MRR evaluation, HHI concentration, KL mix diagnostics,
geo grid, systematic sampling) — each verified against an independent
pure-Python recomputation on the sf0.001 fixtures (the oracle gate
checks DuckDB parity; these check the MATH)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import Decimal

from polybot_data_etl_spark.catalog import table
from polybot_data_etl_spark.functions.ml import q_ml_lift, q_ml_mrr
from polybot_data_etl_spark.functions.scalar import (
    q_fn_decimal,
    q_fn_interval,
)
from polybot_data_etl_spark.operators.aggregates import q_agg_hhi
from polybot_data_etl_spark.operators.geo import q_geo_grid
from polybot_data_etl_spark.operators.relational_ext import (
    q_sample_systematic,
)
from polybot_data_etl_spark.plans.pipelines import q_mix_kl


def test_decimal_sums_are_cents_exact(spark, sf_dir):
    """Recompute the DECIMAL ledger with Python's exact Decimal: the
    operator's string-rendered sums must match to the last digit (the
    whole point of the no-rounding contract)."""
    want_price = defaultdict(Decimal)
    want_dp = defaultdict(Decimal)
    want_ch = defaultdict(Decimal)
    n = Counter()
    q2 = Decimal("0.01")
    for r in table(spark, sf_dir, "lineitem").collect():
        price = Decimal(str(r.l_extendedprice)).quantize(q2)
        disc = Decimal(str(r.l_discount)).quantize(q2)
        tax = Decimal(str(r.l_tax)).quantize(q2)
        k = r.l_returnflag
        n[k] += 1
        want_price[k] += price
        want_dp[k] += price * (1 - disc)
        want_ch[k] += price * (1 - disc) * (1 + tax)
    got = {r.l_returnflag: r for r in q_fn_decimal(spark, sf_dir).collect()}
    assert set(got) == set(n)
    for k, r in got.items():
        assert r.n == n[k]
        assert Decimal(r.sum_price) == want_price[k]
        assert Decimal(r.sum_disc_price) == want_dp[k]
        assert Decimal(r.sum_charge) == want_ch[k]
        # fixed-scale rendering: always 2/4/6 fractional digits
        assert len(r.sum_price.split(".")[1]) == 2
        assert len(r.sum_disc_price.split(".")[1]) == 4
        assert len(r.sum_charge.split(".")[1]) == 6


def test_interval_windows_match_python(spark, sf_dir):
    orders = {
        r.o_orderkey: (r.o_orderdate, r.o_orderpriority)
        for r in table(spark, sf_dir, "orders").collect()
    }
    agg = defaultdict(lambda: [0, 0, 0, 0, None])  # n, d30, mon, sumd, maxd
    for r in table(spark, sf_dir, "lineitem").collect():
        if r.l_orderkey not in orders:
            continue
        od, prio = orders[r.l_orderkey]
        days = (r.l_shipdate.date() - od.date()).days
        a = agg[prio]
        a[0] += 1
        a[1] += 1 if days < 30 else 0
        # calendar month add with month-end clamping
        y, m = od.year + (od.month % 12 == 0), od.month % 12 + 1
        import calendar as _cal

        day = min(od.day, _cal.monthrange(y, m)[1])
        plus_month = od.replace(year=y, month=m, day=day)
        a[2] += 1 if r.l_shipdate < plus_month else 0
        a[3] += days
        a[4] = days if a[4] is None else max(a[4], days)
    got = {r.o_orderpriority: r for r in q_fn_interval(spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for k, r in got.items():
        n, d30, mon, sumd, maxd = agg[k]
        assert r.n_items == n
        assert r.n_within_30d == d30
        assert r.n_within_month == mon
        assert r.max_ship_days == maxd
        assert abs(r.avg_ship_days - round(sumd / n + 1e-9, 4)) < 1e-9


def _python_scores(spark, sf_dir):
    out = []
    for r in table(spark, sf_dir, "embeddings").collect():
        e = r.embedding
        z = 2.0 * float(e[0]) + 1.5 * float(e[1]) + float(e[2]) - 0.1
        out.append(
            (round(1.0 / (1.0 + math.exp(-z)) + 1e-9, 4), r.label % 2 == 1, r.vec_id)
        )
    return out


def test_lift_deciles_match_python(spark, sf_dir):
    scores = sorted(_python_scores(spark, sf_dir), key=lambda t: (-t[0], t[2]))
    n = len(scores)
    np_tot = sum(1 for _, t, _ in scores if t)
    dec = defaultdict(lambda: [0, 0])
    for i, (_, t, _) in enumerate(scores):
        d = (i * 10) // n
        dec[d][0] += 1
        dec[d][1] += 1 if t else 0
    got = {r.decile: r for r in q_ml_lift(spark, sf_dir).collect()}
    assert set(got) == set(dec)
    cum = 0
    for d in sorted(dec):
        rows, pos = dec[d]
        cum += pos
        r = got[d]
        assert (r.n_rows, r.n_pos) == (rows, pos)
        assert abs(r.resp_rate - round(pos / rows + 1e-9, 4)) < 1e-9
        assert abs(r.lift - round((pos / rows) / (np_tot / n) + 1e-9, 4)) < 1e-9
        assert abs(r.cum_gain - round(cum / np_tot + 1e-9, 4)) < 1e-9
    # equal-population deciles: sizes differ by at most 1
    sizes = [dec[d][0] for d in sorted(dec)]
    assert max(sizes) - min(sizes) <= 1


def test_mrr_matches_python(spark, sf_dir):
    by_user = defaultdict(list)
    for r in table(spark, sf_dir, "events").collect():
        by_user[r.user_id].append(
            (-r.value, r.event_id, r.event_type == "click")
        )
    firsts = []
    for evs in by_user.values():
        evs.sort()
        pos = next((i + 1 for i, e in enumerate(evs) if e[2]), None)
        if pos is not None:
            firsts.append(pos)
    got = q_ml_mrr(spark, sf_dir).collect()[0]
    assert got.n_users == len(firsts)
    assert got.n_hit_at_1 == sum(1 for p in firsts if p == 1)
    assert got.n_hit_at_3 == sum(1 for p in firsts if p <= 3)
    mrr = sum(1.0 / p for p in firsts) / len(firsts)
    assert abs(got.mrr - round(mrr + 1e-9, 4)) < 1e-9


def test_hhi_matches_python(spark, sf_dir):
    seg_of = {
        r.c_custkey: r.c_mktsegment
        for r in table(spark, sf_dir, "customer").collect()
    }
    totals = defaultdict(lambda: defaultdict(float))
    for r in table(spark, sf_dir, "orders").collect():
        totals[seg_of[r.o_custkey]][r.o_custkey] += r.o_totalprice
    got = {r.c_mktsegment: r for r in q_agg_hhi(spark, sf_dir).collect()}
    assert set(got) == set(totals)
    for seg, per_cust in totals.items():
        ts = [round(t, 2) for t in per_cust.values()]
        tot = sum(ts)
        hhi = sum((t / tot) ** 2 for t in ts)
        r = got[seg]
        assert r.n_custs == len(ts)
        assert abs(r.hhi - round(hhi + 1e-9, 4)) < 2e-4  # sum-order ulps
        assert abs(r.top_share - round(max(ts) / tot + 1e-9, 4)) < 2e-4
        # HHI bounds: [1/n, 1]
        assert 1.0 / len(ts) - 1e-9 <= r.hhi <= 1.0 + 1e-9


def test_mix_kl_matches_python(spark, sf_dir):
    cells = Counter(
        (r.lang, r.source) for r in table(spark, sf_dir, "documents").collect()
    )
    n = sum(cells.values())
    k = len(cells)
    ml = Counter()
    ms = Counter()
    for (lang, src), c in cells.items():
        ml[lang] += c
        ms[src] += c
    kl_u = sum((c / n) * math.log((c / n) * k) for c in cells.values())
    mi = sum(
        (c / n) * math.log((c * n) / (ml[lang] * ms[src]))
        for (lang, src), c in cells.items()
    )
    got = q_mix_kl(spark, sf_dir).collect()[0]
    assert got.n_cells == k
    assert abs(got.kl_vs_uniform - round(kl_u + 1e-9, 4)) < 1e-9
    assert abs(got.mutual_info - round(mi + 1e-9, 4)) < 1e-9
    assert got.mutual_info >= -1e-9  # MI is non-negative


def test_systematic_sample_matches_python(spark, sf_dir):
    per_lang = defaultdict(lambda: [0, 0])
    for r in table(spark, sf_dir, "documents").collect():
        a = per_lang[r.lang]
        a[0] += 1
        a[1] += 1 if r.doc_id % 20 == 7 else 0
    got = {r.lang: r for r in q_sample_systematic(spark, sf_dir).collect()}
    assert set(got) == set(per_lang)
    for lang, (tot, hit) in per_lang.items():
        assert (got[lang].n_total, got[lang].n_sampled) == (tot, hit)
        assert abs(got[lang].rate - round(hit / tot + 1e-9, 4)) < 1e-9


def test_geo_grid_matches_python(spark, sf_dir):
    MIX, MIX2, P = 2_654_435_761, 2_246_822_519, 1_000_000_007
    cells = Counter()
    for r in table(spark, sf_dir, "customer").collect():
        lat = ((r.c_custkey * MIX) % P) % 18000 / 100.0 - 90.0
        lon = ((r.c_custkey * MIX2) % P) % 36000 / 100.0 - 180.0
        cells[(math.floor(lat / 10.0), math.floor(lon / 10.0))] += 1
    want = sorted(
        ((cnt, la, lo) for (la, lo), cnt in cells.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:25]
    got = [
        (r.n, r.cell_lat, r.cell_lon)
        for r in q_geo_grid(spark, sf_dir).collect()
    ]
    assert got == want


def test_stringagg_sorted_csv(spark, sf_dir):
    from polybot_data_etl_spark.operators.aggregates import q_agg_stringagg

    nat = {
        r.n_nationkey: r.n_name
        for r in table(spark, sf_dir, "nation").collect()
    }
    segs = defaultdict(set)
    n = Counter()
    for r in table(spark, sf_dir, "customer").collect():
        segs[nat[r.c_nationkey]].add(r.c_mktsegment)
        n[nat[r.c_nationkey]] += 1
    got = {r.n_name: r for r in q_agg_stringagg(spark, sf_dir).collect()}
    assert set(got) == set(segs)
    for k, r in got.items():
        assert r.segments_csv == ",".join(sorted(segs[k]))
        assert r.n_segments == len(segs[k])
        assert r.n_custs == n[k]


def test_session_stats_match_python(spark, sf_dir):
    from datetime import timedelta

    from polybot_data_etl_spark.operators.timeseries import (
        q_ts_session_stats,
    )

    by_user = defaultdict(list)
    for r in table(spark, sf_dir, "events").collect():
        by_user[r.user_id].append(r.ts)
    def secs(a, b):
        # the operator diffs unix_timestamp()s, which truncate to the
        # whole second — mirror that, not exact total_seconds()
        return int(
            (b.replace(microsecond=0) - a.replace(microsecond=0)).total_seconds()
        )

    sessions = []  # (start, n_events, dur_s)
    gap = timedelta(minutes=30)
    for tss in by_user.values():
        tss.sort()
        start, last, cnt = tss[0], tss[0], 1
        for t in tss[1:]:
            if t - last > gap:  # strict >: exact gap extends the session
                sessions.append((start, cnt, secs(start, last)))
                start, cnt = t, 0
            last = t
            cnt += 1
        sessions.append((start, cnt, secs(start, last)))
    per_day = defaultdict(list)
    for s, cnt, dur in sessions:
        per_day[s.date()].append((cnt, dur))
    got = {r.day.date(): r for r in q_ts_session_stats(spark, sf_dir).collect()}
    assert set(got) == set(per_day)
    for d, items in per_day.items():
        r = got[d]
        assert r.n_sessions == len(items)
        assert r.max_events == max(c for c, _ in items)
        assert r.n_bounce == sum(1 for c, _ in items if c == 1)
        avg_ev = sum(c for c, _ in items) / len(items)
        avg_dur = sum(du for _, du in items) / len(items) / 60.0
        assert abs(r.avg_events - round(avg_ev + 1e-9, 4)) < 1e-9
        assert abs(r.avg_dur_min - round(avg_dur + 1e-9, 4)) < 1e-9


def test_sma_cross_matches_python(spark, sf_dir):
    from polybot_data_etl_spark.operators.timeseries import q_ts_sma_cross

    daily = defaultdict(float)
    for r in table(spark, sf_dir, "events").collect():
        daily[(r.event_type, r.ts.date())] += r.value
    by_type = defaultdict(list)
    for (t, d), v in daily.items():
        by_type[t].append((d, round(v, 2)))
    want = {}
    for t, days in by_type.items():
        days.sort()
        vols = [v for _, v in days]
        sigs = []
        for i in range(27, len(vols)):
            sma7 = sum(vols[i - 6 : i + 1]) / 7.0
            sma28 = sum(vols[i - 27 : i + 1]) / 28.0
            sigs.append(1 if sma7 > sma28 else 0)
        golden = sum(
            1 for a, b in zip(sigs, sigs[1:]) if (a, b) == (0, 1)
        )
        death = sum(1 for a, b in zip(sigs, sigs[1:]) if (a, b) == (1, 0))
        if sigs:
            want[t] = (len(sigs), golden, death, sigs[-1])
    got = {r.event_type: r for r in q_ts_sma_cross(spark, sf_dir).collect()}
    assert set(got) == set(want)
    for t, (nd, g, de, last) in want.items():
        r = got[t]
        assert (r.n_days, r.n_golden, r.n_death, r.last_signal) == (
            nd, g, de, last,
        )


def test_samplesize_matches_python(spark, sf_dir):
    from polybot_data_etl_spark.functions.stats import q_stats_samplesize

    vals = defaultdict(list)
    for r in table(spark, sf_dir, "events").collect():
        vals[r.event_type].append(r.value)
    got = {r.event_type: r for r in q_stats_samplesize(spark, sf_dir).collect()}
    assert set(got) == set(vals)
    import statistics

    for t, xs in vals.items():
        mu = sum(xs) / len(xs)
        v = statistics.variance(xs)
        n_arm = math.ceil((1.959964 + 0.841621) ** 2 * 2 * v / (mu * 0.05) ** 2)
        r = got[t]
        assert r.n_obs == len(xs)
        assert r.n_per_arm == n_arm
        assert abs(r.mean_value - round(mu + 1e-9, 4)) < 1e-8
        # power monotonicity: halving the MDE quadruples n (formula sanity)
        assert n_arm > 0


def test_ntile_quartiles_match_python(spark, sf_dir):
    from polybot_data_etl_spark.operators.windows import q_win_ntile

    by_cust = defaultdict(list)
    for r in table(spark, sf_dir, "orders").collect():
        by_cust[r.o_custkey].append((r.o_totalprice, r.o_orderkey))
    agg = defaultdict(lambda: [0, 0.0, float("inf"), float("-inf")])
    for orders in by_cust.values():
        orders.sort()
        n = len(orders)
        # ntile(4): earlier buckets absorb the remainder
        base, rem = divmod(n, 4)
        idx = 0
        for b in range(4):
            size = base + (1 if b < rem else 0)
            for _ in range(size):
                price = orders[idx][0]
                a = agg[b + 1]
                a[0] += 1
                a[1] += price
                a[2] = min(a[2], price)
                a[3] = max(a[3], price)
                idx += 1
    got = {r.quartile: r for r in q_win_ntile(spark, sf_dir).collect()}
    assert set(got) == {k for k, a in agg.items() if a[0]}
    for qt, r in got.items():
        cnt, s, lo, hi = agg[qt]
        assert r.n_orders == cnt
        assert abs(r.avg_price - round(s / cnt + 1e-9, 2)) < 1e-6
        assert r.min_price == round(lo, 2)
        assert r.max_price == round(hi, 2)


def test_format_rendering_matches_python(spark, sf_dir):
    from polybot_data_etl_spark.functions.scalar import q_fn_format

    orders = {
        r.o_orderkey: r
        for r in table(spark, sf_dir, "orders").collect()
        if r.o_orderkey <= 500
    }
    got = {r.o_orderkey: r for r in q_fn_format(spark, sf_dir).collect()}
    assert set(got) == set(orders)
    for k, r in got.items():
        od = orders[k].o_orderdate
        assert r.month_label == od.strftime("%Y-%m")
        assert r.dow_abbrev == od.strftime("%a")
        assert r.dow_name == od.strftime("%A")
        assert r.price_str == f"{round(orders[k].o_totalprice, 2):.2f}"
        assert r.cents_grouped == f"{round(orders[k].o_totalprice * 100):,}"


def test_drawdown_matches_python(spark, sf_dir):
    from polybot_data_etl_spark.operators.timeseries import q_ts_drawdown

    daily = defaultdict(float)
    for r in table(spark, sf_dir, "events").collect():
        daily[(r.event_type, r.ts.date())] += r.value
    want = {}
    by_type = defaultdict(list)
    for (t, d), v in daily.items():
        by_type[t].append((d, round(v, 2)))
    for t, days in by_type.items():
        days.sort()
        cum = peak = 0.0
        best = (-1.0, None, None)  # dd, day, peak
        for d, v in days:
            cum += v
            peak = max(peak, cum)
            if peak > 0:
                dd = (peak - cum) / peak
                if dd > best[0]:
                    best = (dd, d, peak)
        want[t] = best
    got = {r.event_type: r for r in q_ts_drawdown(spark, sf_dir).collect()}
    assert set(got) == set(want)
    for t, (dd, d, peak) in want.items():
        r = got[t]
        assert r.dd_day.date() == d
        assert abs(r.max_drawdown - round(dd + 1e-9, 6)) < 1e-9
        assert abs(r.peak_cum - round(peak, 2)) < 1e-6
        assert 0.0 <= r.max_drawdown <= 1.0


def test_bayes_ab_matches_python(spark, sf_dir):
    import statistics

    from polybot_data_etl_spark.functions.stats import q_stats_bayes_ab

    vals = defaultdict(list)
    for r in table(spark, sf_dir, "events").collect():
        if r.event_type in ("click", "purchase"):
            vals[r.event_type].append(r.value)
    a, b = vals["click"], vals["purchase"]
    mua, mub = sum(a) / len(a), sum(b) / len(b)
    va, vb = statistics.variance(a), statistics.variance(b)
    z = (mub - mua) / math.sqrt(va / len(a) + vb / len(b))
    phi = 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))
    got = q_stats_bayes_ab(spark, sf_dir).collect()[0]
    assert (got.n_a, got.n_b) == (len(a), len(b))
    assert abs(got.z - round(z + 1e-9, 4)) < 1e-8
    # the A&S polynomial is accurate to 1.5e-7 vs the true CDF
    assert abs(got.p_b_beats_a - phi) < 1e-4
    assert 0.0 <= got.p_b_beats_a <= 1.0


def test_window_clause_matches_inline_windows(spark, sf_dir):
    """The named-WINDOW SQL must agree with the equivalent inline
    DataFrame windows row for row."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from polybot_data_etl_spark.operators.relational_ext import (
        q_sql_window_clause,
    )

    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rank = Window.partitionBy("user_id").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    want = {
        r.event_id: r
        for r in e.select(
            "event_id",
            F.round(F.sum(cents).over(w_run) / F.lit(100.0), 2).alias("rt"),
            F.rank().over(w_rank).cast("bigint").alias("rk"),
        ).collect()
    }
    got = q_sql_window_clause(spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        assert r.run_total == want[r.event_id].rt
        assert r.value_rank == want[r.event_id].rk


def test_anova_matches_python_recompute(spark, sf_dir):
    """Recompute one-way ANOVA (F, dfs, eta^2) from the raw event rows
    with textbook group-mean formulas (not the operator's raw-moment
    algebra) — the two derivations must agree to the 4-dp round."""
    from polybot_data_etl_spark.functions.stats import q_stats_anova

    groups = defaultdict(list)
    for r in table(spark, sf_dir, "events").collect():
        groups[r.event_type].append(r.value)
    k = len(groups)
    nt = sum(len(v) for v in groups.values())
    grand = sum(sum(v) for v in groups.values()) / nt
    ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in groups.values())
    ssw = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v) for v in groups.values()
    )
    f = (ssb / (k - 1)) / (ssw / (nt - k))
    [row] = q_stats_anova(spark, sf_dir).collect()
    assert row.k_groups == k
    assert row.n_total == nt
    assert row.df_between == k - 1
    assert row.df_within == nt - k
    assert abs(row.f_stat - f) < 1e-3
    assert abs(row.eta_sq - ssb / (ssb + ssw)) < 1e-3


def test_cluster_sizes_partition_the_corpus(spark, sf_dir):
    """The size histogram must (a) partition the corpus exactly —
    sum(n_docs) == |documents| — and (b) agree with a recount of the
    q_dedup_clusters assignment it is derived from."""
    from polybot_data_etl_spark.functions.dedup import (
        q_dedup_cluster_sizes,
        q_dedup_clusters,
    )

    sizes = Counter()
    for r in q_dedup_clusters(spark, sf_dir).collect():
        sizes[r.cluster_id] += 1
    want = Counter(sizes.values())  # size -> n_clusters
    rows = q_dedup_cluster_sizes(spark, sf_dir).collect()
    assert {r.cluster_size: r.n_clusters for r in rows} == dict(want)
    for r in rows:
        assert r.n_docs == r.cluster_size * r.n_clusters
    n_docs_total = table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs_total
    # histogram is emitted sorted by size
    assert [r.cluster_size for r in rows] == sorted(
        r.cluster_size for r in rows
    )


def test_pq_codes_cover_all_vectors_and_mse_is_sane(spark, sf_dir):
    """PQ invariants: every (vector, subspace) gets exactly one code →
    per-subspace memberships sum to |embeddings|; MSE is nonnegative;
    and a brute-force Python recompute of the final assignment's mean
    squared reconstruction error matches the operator's."""
    from polybot_data_etl_spark.functions.vectors import (
        _PQ_K,
        _PQ_SUBDIM,
        _PQ_SUBS,
        q_embed_pq,
    )

    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in table(spark, sf_dir, "embeddings").collect()
    }
    rows = q_embed_pq(spark, sf_dir).collect()
    n_vecs = len(emb)
    per_sub = defaultdict(int)
    for r in rows:
        assert 0 <= r.sub < _PQ_SUBS
        assert 0 <= r.code < _PQ_K
        assert r.mse >= 0
        per_sub[r.sub] += r.n_members
    assert dict(per_sub) == {s: n_vecs for s in range(_PQ_SUBS)}

    # Python recompute: seed codebooks from vec_id 0..3, one recenter,
    # reassign, then MSE per (sub, code) with the operator's rounding.
    def subvec(v, s):
        return v[s * _PQ_SUBDIM : (s + 1) * _PQ_SUBDIM]

    def assign(cbs):
        out = {}
        for vid, v in emb.items():
            for s in range(_PQ_SUBS):
                x = subvec(v, s)
                best = None
                for code in range(_PQ_K):
                    c = cbs[(s, code)]
                    dotp = sum(a * b for a, b in zip(x, c))
                    nsq = sum(b * b for b in c)
                    score = round(dotp - 0.5 * nsq, 4)
                    key = (-score, code)
                    if best is None or key < best[0]:
                        best = (key, code, dotp, nsq)
                out[(vid, s)] = best[1:]
        return out

    cbs = {
        (s, code): [round(x + 1e-11, 6) for x in subvec(emb[code], s)]
        for s in range(_PQ_SUBS)
        for code in range(_PQ_K)
    }
    a1 = assign(cbs)
    members = defaultdict(list)
    for (vid, s), (code, _, _) in a1.items():
        members[(s, code)].append(vid)
    cbs2 = {}
    for (s, code), vids in members.items():
        comps = [
            round(
                sum(subvec(emb[v], s)[d] for v in vids) / len(vids) + 1e-11, 6
            )
            for d in range(_PQ_SUBDIM)
        ]
        cbs2[(s, code)] = comps
    a2 = assign(cbs2)
    errs = defaultdict(list)
    for (vid, s), (code, dotp, nsq) in a2.items():
        vsq = sum(x * x for x in subvec(emb[vid], s))
        errs[(s, code)].append(round(vsq - 2 * dotp + nsq, 6))
    for r in rows:
        es = errs[(r.sub, r.code)]
        assert r.n_members == len(es)
        assert abs(r.mse - round(sum(es) / len(es) + 1e-9, 4)) < 2e-4


def test_levene_matches_scipy_style_recompute(spark, sf_dir):
    """Recompute Levene's W by the textbook route (center each group on
    its mean, then one-way ANOVA on the absolute deviations) and check
    the operator agrees to the 4-dp round."""
    from polybot_data_etl_spark.functions.stats import q_stats_levene

    groups = defaultdict(list)
    for r in table(spark, sf_dir, "events").collect():
        groups[r.event_type].append(r.value)
    zs = {
        t: [abs(x - round(sum(v) / len(v) + 1e-11, 6)) for x in v]
        for t, v in groups.items()
    }
    k = len(zs)
    nt = sum(len(v) for v in zs.values())
    grand = sum(sum(v) for v in zs.values()) / nt
    ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in zs.values())
    ssw = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v) for v in zs.values()
    )
    w = (ssb / (k - 1)) / (ssw / (nt - k))
    [row] = q_stats_levene(spark, sf_dir).collect()
    assert row.k_groups == k
    assert row.n_total == nt
    assert abs(row.w_stat - w) < 1e-3


def test_bootstrap_matches_python_poisson_recompute(spark, sf_dir):
    """Replay the exact LCG → Poisson-weight → replicate-mean pipeline
    in pure Python and check every output number; also sanity: the
    bootstrap mean must sit near the observed mean and the CI must
    bracket it."""
    from polybot_data_etl_spark.functions.stats import (
        _BOOT_REPS,
        _POIS_CDF,
        q_stats_bootstrap,
    )

    cdf = [float(t) for t in _POIS_CDF]
    vals = [
        (r.event_id, r.value)
        for r in table(spark, sf_dir, "events").collect()
    ]
    means = []
    for rep in range(_BOOT_REPS):
        sw = swv = 0.0
        for eid, v in vals:
            h = (1103515245 * (eid * _BOOT_REPS + rep) + 12345) % 2147483648
            u = h / 2147483648.0
            w = next((i for i, t in enumerate(cdf) if u < t), 5)
            sw += w
            swv += w * v
        means.append(round(swv / sw + 1e-11, 6))
    nb = len(means)
    mu_b = sum(means) / nb
    se = math.sqrt(sum((m - mu_b) ** 2 for m in means) / (nb - 1))
    mu = sum(v for _, v in vals) / len(vals)
    [row] = q_stats_bootstrap(spark, sf_dir).collect()
    assert row.n_reps == nb
    assert abs(row.mean_obs - mu) < 1e-3
    assert abs(row.boot_mean - mu_b) < 1e-3
    assert abs(row.boot_se - se) < 1e-3
    assert abs(row.ci_lo - (mu - 1.96 * se)) < 2e-3
    assert abs(row.ci_hi - (mu + 1.96 * se)) < 2e-3
    assert row.ci_lo < row.mean_obs < row.ci_hi
    assert abs(row.boot_mean - row.mean_obs) < 5 * row.boot_se


def test_basket_lift_matches_python_recompute(spark, sf_dir):
    """Brute-force the co-purchase pairs from the raw lineitem rows and
    check support, per-item counts, and lift for every emitted row, plus
    that the emitted 15 are the true top by (support, part_a, part_b)."""
    from itertools import combinations

    from polybot_data_etl_spark.operators.behavior import q_basket_lift

    baskets = defaultdict(set)
    for r in table(spark, sf_dir, "lineitem").collect():
        baskets[r.l_orderkey].add(r.l_partkey)
    pair_cnt = Counter()
    item_cnt = Counter()
    for parts in baskets.values():
        for p in parts:
            item_cnt[p] += 1
        for a, b in combinations(sorted(parts), 2):
            pair_cnt[(a, b)] += 1
    n_orders = len(baskets)
    want_order = sorted(pair_cnt, key=lambda ab: (-pair_cnt[ab], ab))[:15]
    rows = q_basket_lift(spark, sf_dir).collect()
    assert [(r.part_a, r.part_b) for r in rows] == want_order
    for r in rows:
        assert r.pair_orders == pair_cnt[(r.part_a, r.part_b)]
        assert r.orders_a == item_cnt[r.part_a]
        assert r.orders_b == item_cnt[r.part_b]
        want_lift = round(
            r.pair_orders * n_orders / (r.orders_a * r.orders_b) + 1e-9, 4
        )
        assert abs(r.lift - want_lift) < 1e-9


def test_surrogate_key_is_dense_total_order(spark, sf_dir):
    """The sampled assignment must match a Python sort of the whole
    table: rowid r binds to the (r-1)-th event under (ts, event_id)."""
    from polybot_data_etl_spark.operators.relational_ext import (
        q_fn_surrogate_key,
    )

    order = [
        r.event_id
        for r in sorted(
            table(spark, sf_dir, "events").collect(),
            key=lambda r: (r.ts, r.event_id),
        )
    ]
    rows = q_fn_surrogate_key(spark, sf_dir).collect()
    assert len(rows) == (len(order) + 999) // 1000
    for r in rows:
        assert (r.rowid - 1) % 1000 == 0
        assert r.event_id == order[r.rowid - 1]


def test_stl_components_reassemble_and_match_python(spark, sf_dir):
    """volume == trend + seasonal + residual on every day (to the
    rounding), and the trend must equal a Python centered 7-day MA of
    the exact-cents daily volumes."""
    from polybot_data_etl_spark.operators.timeseries import q_ts_stl

    daily = defaultdict(int)
    for r in table(spark, sf_dir, "events").collect():
        daily[r.ts.date()] += int(round(r.value * 100))
    days = sorted(daily)
    rows = q_ts_stl(spark, sf_dir).collect()
    assert len(rows) == len(days)
    for i, r in enumerate(rows):
        assert r.day.date() == days[i]
        assert abs(r.volume - daily[days[i]] / 100.0) < 1e-9
        lo, hi = max(0, i - 3), min(len(days), i + 4)
        win = [daily[days[j]] for j in range(lo, hi)]
        assert abs(r.trend - sum(win) / len(win) / 100) < 1e-3
        assert (
            abs(r.volume - (r.trend + r.seasonal + r.residual)) < 5e-4
        )


def test_theilsen_matches_python_median_of_slopes(spark, sf_dir):
    """Recompute the pairwise-slope median (and the intercept median)
    in pure Python with the statistics module."""
    import statistics

    from polybot_data_etl_spark.operators.timeseries import q_ts_theilsen

    daily = defaultdict(int)
    for r in table(spark, sf_dir, "events").collect():
        daily[r.ts.date()] += int(round(r.value * 100))
    vols = [daily[d] for d in sorted(daily)]
    n = len(vols)
    slopes = [
        (vols[j] - vols[i]) / (j - i)
        for i in range(n)
        for j in range(i + 1, n)
    ]
    slope = statistics.median(slopes)
    icpt = statistics.median(
        [vols[i] - slope * (i + 1) for i in range(n)]
    )
    [row] = q_ts_theilsen(spark, sf_dir).collect()
    assert row.n_days == n
    assert row.n_pairs == len(slopes)
    assert abs(row.sen_slope - slope / 100) < 1e-3
    assert abs(row.sen_intercept - icpt / 100) < 1e-3


def test_brier_decomposition_identity(spark, sf_dir):
    """Recompute the raw Brier score in Python from the shared eval
    scores, and check the Murphy identity: brier ≈ reliability −
    resolution + uncertainty + within-bin score variance (the binned
    terms must reconstruct the raw score up to the within-bin term)."""
    from polybot_data_etl_spark.functions.ml import _eval_scores, q_ml_brier

    sy = [
        (r.score, 1.0 if r.truth else 0.0)
        for r in _eval_scores(spark, sf_dir).collect()
    ]
    n = len(sy)
    brier = sum((s - y) ** 2 for s, y in sy) / n
    [row] = q_ml_brier(spark, sf_dir).collect()
    assert row.n == n
    assert abs(row.brier - brier) < 1e-3
    assert row.uncertainty >= 0 and row.reliability >= 0
    assert row.resolution >= 0
    # Murphy: brier = rel - res + unc + E[within-bin var of s]
    bins = defaultdict(list)
    for s, y in sy:
        bins[min(int(s * 10), 9)].append((s, y))
    within = sum(
        sum((s - sum(a for a, _ in v) / len(v)) ** 2 for s, _ in v)
        for v in bins.values()
    ) / n
    assert (
        abs(
            row.brier
            - (row.reliability - row.resolution + row.uncertainty + within)
        )
        < 5e-3
    )


def test_fdr_is_monotone_and_matches_python_bh(spark, sf_dir):
    """BH invariants: adjusted p >= raw p, adjusted p is monotone in
    the raw-p order, and the values match a Python BH recompute from
    the operator's own raw p-values."""
    from polybot_data_etl_spark.functions.stats import q_stats_fdr

    rows = q_stats_fdr(spark, sf_dir).collect()
    k = len(rows)
    ordered = sorted(rows, key=lambda r: (r.p_value, r.event_type))
    prev = None
    for i, r in enumerate(ordered, start=1):
        assert r.p_adj >= r.p_value - 1e-9
        assert r.p_adj <= 1.0 + 1e-9
        if prev is not None:
            assert r.p_adj >= prev - 1e-9  # monotone along the rank order
        prev = r.p_adj
        want = min(
            min(x.p_value * k / j for j, x in enumerate(ordered, 1) if j >= i),
            1.0,
        )
        assert abs(r.p_adj - want) < 2e-3
        assert r.reject == (r.p_adj < 0.05)


def test_jsd_matches_python_and_is_bounded(spark, sf_dir):
    """Recompute per-source JSD vs the corpus unigram distribution in
    pure Python; every value must match to the round and sit in
    [0, ln 2]."""
    from polybot_data_etl_spark.functions.text import q_text_jsd

    cnt = defaultdict(Counter)
    for r in table(spark, sf_dir, "documents").collect():
        cnt[r.source].update(r.text.lower().split(" "))
    corpus = Counter()
    for c in cnt.values():
        corpus.update(c)
    tot = sum(corpus.values())
    rows = q_text_jsd(spark, sf_dir).collect()
    assert {r.source for r in rows} == set(cnt)
    for r in rows:
        c = cnt[r.source]
        ts = sum(c.values())
        assert r.n_tokens == ts
        jsd = 0.0
        for token, ct in corpus.items():
            p = c.get(token, 0) / ts
            q = ct / tot
            m = (p + q) / 2
            if p > 0:
                jsd += 0.5 * p * math.log(p / m)
            jsd += 0.5 * q * math.log(q / m)
        assert abs(r.jsd - jsd) < 1e-3
        assert -1e-9 <= r.jsd <= math.log(2) + 1e-9


def test_fd_audit_matches_python(spark, sf_dir):
    """Recompute every declared FD audit with Python dicts."""
    from polybot_data_etl_spark.functions.dq import q_dq_fd

    def audit(rows, lhs, rhs):
        m = defaultdict(set)
        for r in rows:
            m[str(r[lhs])].add(r[rhs])
        viol = sum(1 for v in m.values() if len(v) > 1)
        return (
            len(m),
            viol,
            max(len(v) for v in m.values()),
            round(viol / len(m) + 1e-9, 4),
        )

    want = {
        "part.p_brand->p_type": audit(
            table(spark, sf_dir, "part").collect(), "p_brand", "p_type"
        ),
        "orders.o_custkey->o_orderpriority": audit(
            table(spark, sf_dir, "orders").collect(),
            "o_custkey", "o_orderpriority",
        ),
        "nation.n_nationkey->n_regionkey": audit(
            table(spark, sf_dir, "nation").collect(),
            "n_nationkey", "n_regionkey",
        ),
    }
    rows = q_dq_fd(spark, sf_dir).collect()
    assert {r.fd for r in rows} == set(want)
    for r in rows:
        n_lhs, viol, mx, rate = want[r.fd]
        assert (r.n_lhs, r.n_violating, r.max_rhs) == (n_lhs, viol, mx)
        assert abs(r.violation_rate - rate) < 1e-9
        assert r.holds == (mx == 1)
    # the key FD must hold; the business-rule FDs must not (fixtures
    # have multi-order customers with varying priorities)
    by = {r.fd: r for r in rows}
    assert by["nation.n_nationkey->n_regionkey"].holds


def test_bool_aggs_match_python(spark, sf_dir):
    from polybot_data_etl_spark.operators.aggregates import q_agg_bool

    nations = {
        r.n_nationkey: r.n_name
        for r in table(spark, sf_dir, "nation").collect()
    }
    per = defaultdict(list)
    for r in table(spark, sf_dir, "customer").collect():
        per[nations[r.c_nationkey]].append(r)
    rows = q_agg_bool(spark, sf_dir).collect()
    assert {r.n_name for r in rows} == set(per)
    for r in rows:
        cs = per[r.n_name]
        assert r.n_cust == len(cs)
        assert r.all_positive == all(c.c_acctbal > 0 for c in cs)
        assert r.any_negative == any(c.c_acctbal < 0 for c in cs)
        assert r.n_high == sum(1 for c in cs if c.c_acctbal > 5000)
        assert r.segment_complete


def test_pythagorean_means_ordering_and_values(spark, sf_dir):
    """AM-GM-HM inequality must hold per type, and each mean must
    match a Python recompute."""
    from polybot_data_etl_spark.operators.aggregates import q_agg_means

    per = defaultdict(list)
    for r in table(spark, sf_dir, "events").collect():
        if r.value > 0:
            per[r.event_type].append(r.value)
    rows = q_agg_means(spark, sf_dir).collect()
    assert {r.event_type for r in rows} == set(per)
    for r in rows:
        v = per[r.event_type]
        assert r.n_pos == len(v)
        assert abs(r.mean_arith - sum(v) / len(v)) < 1e-3
        assert (
            abs(
                r.mean_geo
                - math.exp(sum(math.log(x) for x in v) / len(v))
            )
            < 1e-3
        )
        assert abs(r.mean_harm - len(v) / sum(1 / x for x in v)) < 1e-3
        assert r.mean_harm <= r.mean_geo + 1e-9 <= r.mean_arith + 2e-9


def test_cusum_reflection_identity_matches_recursion(spark, sf_dir):
    """The windowed reflection form must equal the textbook recursion
    S+_t = max(0, S+_{t-1} + z_t - k) replayed in Python."""
    from polybot_data_etl_spark.operators.timeseries import q_ts_cusum

    daily = defaultdict(lambda: defaultdict(int))
    for r in table(spark, sf_dir, "events").collect():
        daily[r.event_type][r.ts.date()] += int(round(r.value * 100))
    rows = q_ts_cusum(spark, sf_dir).collect()
    assert {r.event_type for r in rows} == set(daily)
    for r in rows:
        vols = [daily[r.event_type][d] for d in sorted(daily[r.event_type])]
        n = len(vols)
        mu = round(sum(vols) / n + 1e-11, 6)
        sd = round(
            math.sqrt(sum(v * v for v in vols) / n - (sum(vols) / n) ** 2)
            + 1e-11,
            6,
        )
        zs = [round((v - mu) / sd + 1e-11, 6) for v in vols]
        s_hi = s_lo = 0.0
        hi_alarms = lo_alarms = 0
        mx_hi = mx_lo = 0.0
        for z in zs:
            s_hi = max(0.0, s_hi + z - 0.5)
            s_lo = max(0.0, s_lo - z - 0.5)
            hi_alarms += s_hi > 4
            lo_alarms += s_lo > 4
            mx_hi = max(mx_hi, s_hi)
            mx_lo = max(mx_lo, s_lo)
        assert r.n_days == n
        assert r.n_alarm_high == hi_alarms
        assert r.n_alarm_low == lo_alarms
        assert abs(r.max_cusum_high - mx_hi) < 1e-3
        assert abs(r.max_cusum_low - mx_lo) < 1e-3


def test_two_hop_matches_python_bfs(spark, sf_dir):
    from polybot_data_etl_spark.operators.graph import q_graph_two_hop

    orders = {
        r.o_orderkey: r.o_custkey
        for r in table(spark, sf_dir, "orders").collect()
    }
    cust_nat = {
        r.c_custkey: r.c_nationkey
        for r in table(spark, sf_dir, "customer").collect()
    }
    supp_nat = {
        r.s_suppkey: r.s_nationkey
        for r in table(spark, sf_dir, "supplier").collect()
    }
    edges = set()
    for r in table(spark, sf_dir, "lineitem").collect():
        src = cust_nat[orders[r.l_orderkey]]
        dst = supp_nat[r.l_suppkey]
        if src != dst:
            edges.add((src, dst))
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
    names = {
        r.n_nationkey: r.n_name
        for r in table(spark, sf_dir, "nation").collect()
    }
    rows = {r.n_name: r for r in q_graph_two_hop(spark, sf_dir).collect()}
    assert set(rows) == set(names.values())
    for nk, name in names.items():
        two = {d2 for d in adj[nk] for d2 in adj[d] if d2 != nk}
        assert rows[name].n_1hop == len(adj[nk])
        assert rows[name].n_2hop == len(two)


def test_mcc_matches_python(spark, sf_dir):
    from polybot_data_etl_spark.functions.ml import _eval_scores, q_ml_mcc

    tp = fp = fn = tn = 0
    for r in _eval_scores(spark, sf_dir).collect():
        pos = r.score >= 0.5
        if pos and r.truth:
            tp += 1
        elif pos:
            fp += 1
        elif r.truth:
            fn += 1
        else:
            tn += 1
    [row] = q_ml_mcc(spark, sf_dir).collect()
    assert (row.tp, row.fp, row.fn, row.tn) == (tp, fp, fn, tn)
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    tpr, tnr = tp / (tp + fn), tn / (tn + fp)
    assert abs(row.mcc - mcc) < 1e-3
    assert abs(row.balanced_acc - (tpr + tnr) / 2) < 1e-3
    assert abs(row.youden_j - (tpr + tnr - 1)) < 1e-3
    assert -1 <= row.mcc <= 1


def test_tost_matches_python(spark, sf_dir):
    from polybot_data_etl_spark.functions.stats import q_stats_tost

    groups = defaultdict(list)
    for r in table(spark, sf_dir, "events").collect():
        if r.event_type in ("click", "view"):
            groups[r.event_type].append(r.value)
    a, b = groups["click"], groups["view"]
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
    delta = 0.1 * abs((ma + mb) / 2)
    se = math.sqrt(va / len(a) + vb / len(b))
    phi = lambda z: 0.5 * (1 + math.erf(z / math.sqrt(2)))
    p = max(1 - phi((ma - mb + delta) / se), phi((ma - mb - delta) / se))
    [row] = q_stats_tost(spark, sf_dir).collect()
    assert row.n_click == len(a) and row.n_view == len(b)
    assert abs(row.diff - (ma - mb)) < 1e-3
    assert abs(row.margin - delta) < 1e-3
    assert abs(row.p_tost - p) < 1e-3  # A&S poly error << tolerance
    assert row.equivalent == (row.p_tost < 0.05)


def test_rounding_modes_diverge_exactly_at_half(spark, sf_dir):
    from polybot_data_etl_spark.functions.scalar import q_fn_rounding

    rows = q_fn_rounding(spark, sf_dir).collect()
    halves = [r for r in rows if r.x % 1 == 0.5]
    assert halves, "grid must contain true .5 ties"
    for r in rows:
        assert r.half_up == math.floor(r.x + 0.5)
        # banker's: ties to even
        if r.x % 1 == 0.5:
            lo = math.floor(r.x)
            assert r.bankers == (lo if lo % 2 == 0 else lo + 1)
            assert r.half_up == r.bankers + (1 if lo % 2 == 0 else 0)
        assert r.floor_x == math.floor(r.x)
        assert r.ceil_x == math.ceil(r.x)
        assert r.trunc_x == math.trunc(r.x)


def test_recall_at_k_matches_set_intersection(spark, sf_dir):
    """recall@5 must equal the Python set intersection of the two
    registered ANN/exact top-5 results, and be 1.0 whenever the LSH
    candidate set contains all true neighbors."""
    from polybot_data_etl_spark.functions.vectors import (
        q_embed_recall_at_k,
        q_sim_topk,
        q_sim_topk_lsh,
    )

    exact = defaultdict(set)
    for r in q_sim_topk(spark, sf_dir).collect():
        exact[r.probe_id].add(r.neighbor_id)
    ann = defaultdict(set)
    for r in q_sim_topk_lsh(spark, sf_dir).collect():
        if r.probe_id < 10:
            ann[r.probe_id].add(r.neighbor_id)
    rows = q_embed_recall_at_k(spark, sf_dir).collect()
    assert {r.probe_id for r in rows} == set(exact)
    for r in rows:
        hits = len(exact[r.probe_id] & ann[r.probe_id])
        assert r.n_exact == len(exact[r.probe_id])
        assert r.n_hit == hits
        assert abs(r.recall_at_5 - hits / r.n_exact) < 1e-9
        assert 0 <= r.recall_at_5 <= 1


def test_dedup_loss_conserves_tokens_and_kept_counts(spark, sf_dir):
    """Per-lang token totals must match the corpus; keepers must be
    exactly the cluster representatives; loss rate must be consistent."""
    from polybot_data_etl_spark.functions.dedup import q_dedup_clusters
    from polybot_data_etl_spark.plans.pipelines import q_mix_dedup_loss

    cluster = {
        r.doc_id: r.cluster_id
        for r in q_dedup_clusters(spark, sf_dir).collect()
    }
    tot = defaultdict(int)
    kept = defaultdict(int)
    ndocs = Counter()
    nkept = Counter()
    for r in table(spark, sf_dir, "documents").collect():
        ntok = len(r.text.lower().split(" "))
        tot[r.lang] += ntok
        ndocs[r.lang] += 1
        if cluster[r.doc_id] == r.doc_id:
            kept[r.lang] += ntok
            nkept[r.lang] += 1
    rows = q_mix_dedup_loss(spark, sf_dir).collect()
    assert {r.lang for r in rows} == set(tot)
    for r in rows:
        assert r.n_docs == ndocs[r.lang]
        assert r.n_kept == nkept[r.lang]
        assert r.tokens_total == tot[r.lang]
        assert r.tokens_kept == kept[r.lang]
        assert (
            abs(r.token_loss_rate - (1 - kept[r.lang] / tot[r.lang])) < 1e-3
        )


def test_assortativity_matches_python_newman_r(spark, sf_dir):
    from polybot_data_etl_spark.operators.graph import q_graph_assortativity

    baskets = defaultdict(set)
    for r in table(spark, sf_dir, "lineitem").collect():
        if r.l_partkey % 4 == 0:
            baskets[r.l_orderkey].add(r.l_partkey)
    edges = set()
    for parts in baskets.values():
        ps = sorted(parts)
        for i, x in enumerate(ps):
            for y in ps[i + 1 :]:
                edges.add((x, y))
    deg = Counter()
    for x, y in edges:
        deg[x] += 1
        deg[y] += 1
    xs, ys = [], []
    for x, y in edges:
        xs += [deg[x], deg[y]]
        ys += [deg[y], deg[x]]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum(a * b for a, b in zip(xs, ys)) / n - mx * my
    vx = sum(a * a for a in xs) / n - mx * mx
    vy = sum(b * b for b in ys) / n - my * my
    r_want = cov / math.sqrt(vx * vy)
    [row] = q_graph_assortativity(spark, sf_dir).collect()
    assert row.n_edges == len(edges)
    assert abs(row.assortativity - r_want) < 1e-3
    assert -1 - 1e-9 <= row.assortativity <= 1 + 1e-9


def test_interval_union_matches_python_sweep(spark, sf_dir):
    """Recompute the per-user interval union with a direct Python
    merge-intervals pass (not the sweep formulation) — the two must
    agree exactly; the union can never exceed the naive duration sum."""
    from polybot_data_etl_spark.operators.timeseries import (
        q_ts_interval_union,
    )

    iv = defaultdict(list)
    for r in table(spark, sf_dir, "events").collect():
        s = int(r.ts.timestamp())
        iv[r.user_id].append((s, s + 60 * (r.event_id % 7 + 1)))
    rows = q_ts_interval_union(spark, sf_dir).collect()
    assert {r.user_id for r in rows} == set(iv)
    for r in rows:
        spans = sorted(iv[r.user_id])
        merged = []
        for s, e in spans:
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        covered = sum(e - s for s, e in merged)
        naive = sum(e - s for s, e in spans)
        # max concurrency via sweep
        pts = sorted(
            [(s, 1) for s, _ in spans] + [(e, -1) for _, e in spans]
        )
        cov = mx = 0
        for _, d in pts:
            cov += d
            mx = max(mx, cov)
        assert r.n_intervals == len(spans)
        assert r.covered_seconds == covered
        assert r.covered_seconds <= naive
        assert r.max_concurrency == mx


def test_jarque_bera_matches_python_and_detects_uniform(spark, sf_dir):
    """Recompute JB from central moments in Python; the uniform-ish
    `value` column must be flagged non-normal (its kurtosis is far
    from 3) for every type at any fixture scale."""
    from polybot_data_etl_spark.functions.stats import q_stats_jarque_bera

    per = defaultdict(list)
    for r in table(spark, sf_dir, "events").collect():
        per[r.event_type].append(r.value)
    rows = q_stats_jarque_bera(spark, sf_dir).collect()
    assert {r.event_type for r in rows} == set(per)
    for r in rows:
        v = per[r.event_type]
        n = len(v)
        mu = sum(v) / n
        m2 = sum((x - mu) ** 2 for x in v) / n
        m3 = sum((x - mu) ** 3 for x in v) / n
        m4 = sum((x - mu) ** 4 for x in v) / n
        skew = m3 / m2**1.5
        kurt = m4 / m2**2 - 3
        jb = n / 6 * (skew**2 + kurt**2 / 4)
        assert r.n == n
        assert abs(r.skewness - skew) < 1e-3
        assert abs(r.ex_kurtosis - kurt) < 1e-3
        assert abs(r.jb_stat - jb) < max(1e-3, abs(jb) * 1e-4)
        assert abs(r.p_value - math.exp(-jb / 2)) < 1e-3
        assert r.looks_normal == (r.p_value >= 0.05)


def test_parity_rates_and_four_fifths(spark, sf_dir):
    """Recompute per-lang positive rates from q_ml_score joined to
    documents; disparate impact must be rate/max-rate and the 4/5 rule
    verdict consistent."""
    from polybot_data_etl_spark.functions.ml import q_ml_parity, q_ml_score

    scores = {
        r.doc_id: r.positive for r in q_ml_score(spark, sf_dir).collect()
    }
    per = defaultdict(lambda: [0, 0])
    for r in table(spark, sf_dir, "documents").collect():
        per[r.lang][0] += 1
        per[r.lang][1] += scores[r.doc_id]
    best = max(np / n for n, np in per.values())
    rows = q_ml_parity(spark, sf_dir).collect()
    assert {r.lang for r in rows} == set(per)
    for r in rows:
        n, np = per[r.lang]
        assert (r.n, r.n_positive) == (n, np)
        assert abs(r.positive_rate - np / n) < 1e-3
        assert abs(r.disparate_impact - (np / n) / best) < 1e-3
        assert r.passes_four_fifths == ((np / n) / best >= 0.8)
    assert any(abs(r.disparate_impact - 1.0) < 1e-3 for r in rows)


def test_balanced_sample_is_exactly_min_class(spark, sf_dir):
    """Every class must sample exactly min-class-count rows, and the
    cents totals must match a Python replay of the hash order."""
    from polybot_data_etl_spark.operators.relational_ext import (
        q_sample_balanced,
    )

    per = defaultdict(list)
    for r in table(spark, sf_dir, "events").collect():
        per[r.event_type].append(
            (r.event_id * 2654435761 % 1000000007, r.event_id, r.value)
        )
    k = min(len(v) for v in per.values())
    rows = q_sample_balanced(spark, sf_dir).collect()
    assert {r.event_type for r in rows} == set(per)
    for r in rows:
        assert r.n_sampled == k
        sample = sorted(per[r.event_type])[:k]
        want = round(sum(v for _, _, v in sample), 2)
        assert abs(r.value_total - want) < 0.011


def test_minhash_eval_recall_matches_python_truth(spark, sf_dir):
    """Recompute the probe-set ground truth (exact token Jaccard >=
    threshold) in Python and check n_true / n_hit / recall; every
    LSH-found probe pair must be a true pair (precision 1)."""
    from polybot_data_etl_spark.functions.text import (
        _JACCARD_THRESHOLD,
        q_dedup_minhash,
        q_dedup_minhash_eval,
    )

    toks = {}
    for r in table(spark, sf_dir, "documents").collect():
        if r.doc_id < 100:
            toks[r.doc_id] = set(r.text.lower().split(" "))
    ids = sorted(toks)
    truth = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(toks[a] & toks[b])
            j = round(inter / (len(toks[a]) + len(toks[b]) - inter), 4)
            if j >= _JACCARD_THRESHOLD:
                truth.add((a, b))
    found = {
        (r.a_id, r.b_id)
        for r in q_dedup_minhash(spark, sf_dir).collect()
        if r.a_id < 100 and r.b_id < 100
    }
    [row] = q_dedup_minhash_eval(spark, sf_dir).collect()
    assert row.n_true == len(truth)
    assert row.n_found == len(found)
    assert found <= truth  # exact-verified candidates: no false pairs
    assert row.n_hit == len(truth & found)
    if truth:
        assert abs(row.recall - len(truth & found) / len(truth)) < 1e-3


def test_periodogram_matches_python_dft(spark, sf_dir):
    from polybot_data_etl_spark.operators.timeseries import q_ts_periodogram

    daily = defaultdict(int)
    for r in table(spark, sf_dir, "events").collect():
        daily[r.ts.date()] += int(round(r.value * 100))
    vols = [daily[d] for d in sorted(daily)]
    n = len(vols)
    mu = sum(vols) / n
    rows = q_ts_periodogram(spark, sf_dir).collect()
    assert [r.period for r in rows] == [2, 3, 4, 7, 14]
    for r in rows:
        c = sum(
            (v - mu) * math.cos(2 * math.pi * t / r.period)
            for t, v in enumerate(vols)
        )
        s = sum(
            (v - mu) * math.sin(2 * math.pi * t / r.period)
            for t, v in enumerate(vols)
        )
        want = (c * c + s * s) / n / 1e4
        assert abs(r.power - want) < max(1e-3, abs(want) * 1e-6)
        assert r.power >= 0


def test_running_distinct_matches_python_replay(spark, sf_dir):
    from polybot_data_etl_spark.operators.windows import (
        q_win_running_distinct,
    )

    per = defaultdict(list)
    for r in table(spark, sf_dir, "events").collect():
        per[r.user_id].append((r.ts, r.event_id, r.event_type))
    rows = q_win_running_distinct(spark, sf_dir).collect()
    assert {r.user_id for r in rows} == set(per)
    for r in rows:
        seen = set()
        reach3 = None
        for ts, eid, et in sorted(per[r.user_id]):
            seen.add(et)
            if reach3 is None and len(seen) >= 3:
                reach3 = eid
        assert r.final_distinct == len(seen)
        assert r.event_reaching_3 == reach3


def test_beta_binomial_shrinks_toward_half(spark, sf_dir):
    """Posterior must sit between the MLE and the prior mean 0.5, and
    every number must match the closed-form recompute."""
    from polybot_data_etl_spark.functions.stats import q_stats_beta_binomial

    per = defaultdict(lambda: [0, 0])
    for r in table(spark, sf_dir, "customer").collect():
        per[r.c_mktsegment][0] += 1
        per[r.c_mktsegment][1] += r.c_acctbal > 5000
    rows = q_stats_beta_binomial(spark, sf_dir).collect()
    assert {r.segment for r in rows} == set(per)
    for r in rows:
        n, x = per[r.segment]
        assert (r.n, r.x) == (n, x)
        pm = (x + 2) / (n + 4)
        psd = math.sqrt((x + 2) * (n - x + 2) / ((n + 4) ** 2 * (n + 5)))
        assert abs(r.post_mean - pm) < 1e-3
        assert abs(r.post_sd - psd) < 1e-3
        assert abs(r.ci_lo - (pm - 1.96 * psd)) < 2e-3
        assert abs(r.ci_hi - (pm + 1.96 * psd)) < 2e-3
        # shrinkage: posterior between MLE and prior mean 0.5
        lo, hi = sorted((x / n, 0.5))
        assert lo - 1e-3 <= r.post_mean <= hi + 1e-3


def test_threshold_sweep_is_monotone_cumulative(spark, sf_dir):
    """Counts must be non-increasing in threshold, match a recount of
    the registered pair frame, and the base row equals |q_dedup_embed|."""
    from polybot_data_etl_spark.functions.dedup import (
        q_dedup_embed,
        q_dedup_threshold_sweep,
    )

    sims = [r.sim for r in q_dedup_embed(spark, sf_dir).collect()]
    rows = q_dedup_threshold_sweep(spark, sf_dir).collect()
    assert [r.threshold for r in rows] == [
        0.45, 0.5, 0.55, 0.6, 0.65, 0.7, 0.8, 0.9,
    ]
    prev = None
    for r in rows:
        above = [s for s in sims if s >= r.threshold]
        assert r.n_pairs == len(above)
        if above:
            assert abs(r.mean_sim - sum(above) / len(above)) < 1e-3
        if prev is not None:
            assert r.n_pairs <= prev
        prev = r.n_pairs
    assert rows[0].n_pairs == len(sims)


def test_code_detect_flags_symbol_heavy_text(spark, sf_dir):
    """Recompute ratios in Python; a synthetic check that the rule
    would flag a code snippet and pass plain prose."""
    from polybot_data_etl_spark.functions.quality import q_text_code_detect

    per = defaultdict(lambda: [0, 0, 0.0, 0.0])
    kws = {"def", "return", "import", "function", "var", "const",
           "class", "void", "int"}
    import re

    for r in table(spark, sf_dir, "documents").collect():
        n_chars = len(r.text)
        n_sym = len(re.findall(r"[{}();=<>\[\]|&]", r.text))
        toks = r.text.split(" ")
        kw = sum(1 for t in toks if t in kws)
        sym_ratio = n_sym / n_chars
        kw_ratio = kw / len(toks)
        p = per[r.lang]
        p[0] += 1
        p[1] += sym_ratio > 0.03 or kw_ratio > 0.05
        p[2] += round(sym_ratio + 1e-9, 4)
        p[3] += round(kw_ratio + 1e-9, 4)
    rows = q_text_code_detect(spark, sf_dir).collect()
    assert {r.lang for r in rows} == set(per)
    for r in rows:
        n, ncode, ssum, ksum = per[r.lang]
        assert r.n_docs == n
        assert r.n_code == ncode
        assert abs(r.mean_sym_ratio - ssum / n) < 1e-3
        assert abs(r.mean_kw_ratio - ksum / n) < 1e-3


def test_rolling_corr_matches_python(spark, sf_dir):
    from polybot_data_etl_spark.operators.timeseries import q_ts_rolling_corr

    daily = defaultdict(lambda: [0, 0])
    for r in table(spark, sf_dir, "events").collect():
        c = int(round(r.value * 100))
        if r.event_type == "click":
            daily[r.ts.date()][0] += c
        elif r.event_type == "view":
            daily[r.ts.date()][1] += c
    days = sorted(daily)
    rows = q_ts_rolling_corr(spark, sf_dir).collect()
    assert len(rows) == max(0, len(days) - 6)
    for i, r in enumerate(rows):
        win = [daily[d] for d in days[i : i + 7]]
        xs = [a for a, _ in win]
        ys = [b for _, b in win]
        n = 7
        num = n * sum(a * b for a, b in win) - sum(xs) * sum(ys)
        den = math.sqrt(
            (n * sum(a * a for a in xs) - sum(xs) ** 2)
            * (n * sum(b * b for b in ys) - sum(ys) ** 2)
        )
        if den:
            assert abs(r.corr_7d - num / den) < 1e-3
            assert -1 - 1e-9 <= r.corr_7d <= 1 + 1e-9


def test_poisson_rate_matches_python(spark, sf_dir):
    from polybot_data_etl_spark.functions.stats import q_stats_poisson_rate

    ss = sorted(
        int(r.ts.timestamp())
        for r in table(spark, sf_dir, "events").collect()
        if r.event_type == "error"
    )
    mid = (ss[0] + ss[-1]) / 2.0
    x1 = sum(1 for s in ss if s < mid)
    x2 = len(ss) - x1
    z = math.log(x2 / x1) / math.sqrt(1 / x1 + 1 / x2)
    phi = lambda v: 0.5 * (1 + math.erf(v / math.sqrt(2)))
    p = 2 * (1 - phi(abs(z)))
    [row] = q_stats_poisson_rate(spark, sf_dir).collect()
    assert (row.n_first, row.n_second) == (x1, x2)
    assert abs(row.rate_ratio - x2 / x1) < 1e-3
    assert abs(row.z - z) < 1e-3
    assert abs(row.p_value - p) < 1e-3
    assert row.rate_changed == (row.p_value < 0.05)


def test_ece_matches_python_and_brier_bins(spark, sf_dir):
    from polybot_data_etl_spark.functions.ml import _eval_scores, q_ml_ece

    bins = defaultdict(list)
    for r in _eval_scores(spark, sf_dir).collect():
        bins[min(int(r.score * 10), 9)].append(
            (r.score, 1.0 if r.truth else 0.0)
        )
    n = sum(len(v) for v in bins.values())
    ece = sum(
        len(v)
        * abs(
            round(sum(s for s, _ in v) / len(v) + 1e-11, 6)
            - round(sum(y for _, y in v) / len(v) + 1e-11, 6)
        )
        for v in bins.values()
    ) / n
    mce = max(
        abs(
            round(sum(s for s, _ in v) / len(v) + 1e-11, 6)
            - round(sum(y for _, y in v) / len(v) + 1e-11, 6)
        )
        for v in bins.values()
    )
    [row] = q_ml_ece(spark, sf_dir).collect()
    assert row.n == n
    assert row.n_bins == len(bins)
    assert abs(row.ece - ece) < 1e-3
    assert abs(row.mce - mce) < 1e-3
    assert row.ece <= row.mce + 1e-9


def test_centroid_dist_matches_python_and_triangle(spark, sf_dir):
    from polybot_data_etl_spark.functions.vectors import (
        q_embed_centroid_dist,
    )

    per = defaultdict(list)
    for r in table(spark, sf_dir, "embeddings").collect():
        per[r.label].append([float(x) for x in r.embedding])
    cents = {
        lab: [
            round(sum(v[d] for v in vs) / len(vs) + 1e-11, 6)
            for d in range(len(vs[0]))
        ]
        for lab, vs in per.items()
    }
    rows = q_embed_centroid_dist(spark, sf_dir).collect()
    labs = sorted(cents)
    assert len(rows) == len(labs) * (len(labs) - 1) // 2
    d = {}
    for r in rows:
        want = math.sqrt(
            sum(
                (a - b) ** 2
                for a, b in zip(cents[r.label_a], cents[r.label_b])
            )
        )
        assert abs(r.centroid_dist - want) < 1e-3
        assert r.centroid_dist >= 0
        d[(r.label_a, r.label_b)] = r.centroid_dist

    def dist(a, b):
        return d[(min(a, b), max(a, b))] if a != b else 0.0

    # spot-check the triangle inequality on the first three labels
    if len(labs) >= 3:
        a, b, c = labs[:3]
        assert dist(a, c) <= dist(a, b) + dist(b, c) + 1e-6


def test_reconcile_matches_python_cents(spark, sf_dir):
    from polybot_data_etl_spark.functions.dq import q_dq_reconcile

    lsum = defaultdict(int)
    for r in table(spark, sf_dir, "lineitem").collect():
        lsum[r.l_orderkey] += int(round(r.l_extendedprice * 100))
    gaps = []
    for r in table(spark, sf_dir, "orders").collect():
        if r.o_orderkey in lsum:
            gaps.append(
                abs(int(round(r.o_totalprice * 100)) - lsum[r.o_orderkey])
            )
    [row] = q_dq_reconcile(spark, sf_dir).collect()
    assert row.n_orders == len(gaps)
    assert row.n_matched == sum(1 for g in gaps if g <= 1)
    assert abs(row.mean_abs_gap - sum(gaps) / len(gaps) / 100) < 1e-3
    assert abs(row.max_abs_gap - max(gaps) / 100) < 1e-9


def test_isoweek_rollup_matches_python(spark, sf_dir):
    import datetime

    from polybot_data_etl_spark.functions.scalar import q_fn_isoweek

    per = defaultdict(lambda: [0, 0])
    for r in table(spark, sf_dir, "orders").collect():
        d = r.o_orderdate
        if isinstance(d, datetime.datetime):
            d = d.date()
        iy, iw, _ = d.isocalendar()
        per[(iy, iw)][0] += 1
        per[(iy, iw)][1] += int(round(r.o_totalprice * 100))
    rows = q_fn_isoweek(spark, sf_dir).collect()
    assert {(r.iso_year, r.iso_week) for r in rows} == set(per)
    for r in rows:
        n, cents = per[(r.iso_year, r.iso_week)]
        assert r.n_orders == n
        assert abs(r.total - cents / 100) < 1e-6


def test_ess_bounds_and_python_recompute(spark, sf_dir):
    """1 <= ESS_docs <= n_docs, and the Kish formula must match."""
    from polybot_data_etl_spark.plans.pipelines import q_mix_ess

    per = defaultdict(list)
    for r in table(spark, sf_dir, "documents").collect():
        per[r.lang].append(len(r.text.lower().split(" ")))
    rows = q_mix_ess(spark, sf_dir).collect()
    assert {r.lang for r in rows} == set(per)
    for r in rows:
        w = per[r.lang]
        s1, s2, n = sum(w), sum(x * x for x in w), len(w)
        assert r.n_docs == n and r.tokens == s1
        assert abs(r.ess_docs - s1 * s1 / s2) < 0.02
        assert abs(r.ess_fraction - s1 * s1 / (n * s2)) < 1e-3
        assert 1 - 1e-9 <= r.ess_docs <= n + 1e-9


def test_hill_matches_python_order_stats(spark, sf_dir):
    from polybot_data_etl_spark.functions.stats import _HILL_K, q_stats_hill

    vals = sorted(
        (
            (r.o_totalprice, r.o_orderkey)
            for r in table(spark, sf_dir, "orders").collect()
        ),
        key=lambda t: (-t[0], t[1]),
    )[:_HILL_K]
    xk = vals[-1][0]
    s = sum(math.log(x / xk) for x, _ in vals[:-1])
    k = _HILL_K - 1
    [row] = q_stats_hill(spark, sf_dir).collect()
    assert row.k == k
    assert abs(row.x_k - round(xk, 2)) < 1e-9
    assert abs(row.hill_alpha - k / s) < 1e-3
    assert abs(row.alpha_se - k / s / math.sqrt(k)) < 1e-3
    assert row.hill_alpha > 0


def test_gumbel_fit_and_return_levels(spark, sf_dir):
    from polybot_data_etl_spark.functions.stats import q_stats_gumbel

    daily = defaultdict(int)
    for r in table(spark, sf_dir, "events").collect():
        c = int(round(r.value * 100))
        daily[r.ts.date()] = max(daily[r.ts.date()], c)
    mx = list(daily.values())
    n = len(mx)
    mean = sum(mx) / n
    sd = math.sqrt(sum((x - mean) ** 2 for x in mx) / (n - 1))
    beta = sd * math.sqrt(6) / math.pi
    mu = mean - 0.5772156649015329 * beta
    rl = lambda t: (mu - beta * math.log(-math.log(1 - 1 / t))) / 100
    [row] = q_stats_gumbel(spark, sf_dir).collect()
    assert row.n_days == n
    assert abs(row.gumbel_mu - mu / 100) < 1e-3
    assert abs(row.gumbel_beta - beta / 100) < 1e-3
    assert abs(row.return_level_30d - rl(30)) < 1e-2
    assert abs(row.return_level_365d - rl(365)) < 1e-2
    # longer horizon => higher return level; both above the location
    assert row.return_level_365d > row.return_level_30d > row.gumbel_mu


def test_rle_matches_python_scan(spark, sf_dir):
    from polybot_data_etl_spark.functions.dq import q_dq_rle

    # tie-break on the profiled columns themselves: (l_orderkey,
    # l_linenumber) is not unique in the synthetic lineitem, and the
    # r7 determinism audit moved q_dq_rle onto this total order
    rows = sorted(
        table(spark, sf_dir, "lineitem").collect(),
        key=lambda r: (
            r.l_orderkey,
            r.l_linenumber,
            r.l_returnflag,
            r.l_linestatus,
            r.l_shipdate,
        ),
    )
    cols = {
        "l_returnflag": [r.l_returnflag for r in rows],
        "l_linestatus": [r.l_linestatus for r in rows],
        "l_shipdate": [r.l_shipdate for r in rows],
    }
    got = {r.col: r for r in q_dq_rle(spark, sf_dir).collect()}
    assert set(got) == set(cols)
    for col, vals in cols.items():
        runs = 1 + sum(
            1 for a, b in zip(vals, vals[1:]) if a != b
        )
        assert got[col].n_rows == len(vals)
        assert got[col].n_runs == runs
        assert abs(got[col].avg_run_len - len(vals) / runs) < 1e-3


def test_median_ci_order_stats_match_python(spark, sf_dir):
    from polybot_data_etl_spark.functions.stats import q_stats_median_ci

    vals = sorted(
        r.value for r in table(spark, sf_dir, "events").collect()
    )
    n = len(vals)
    r_med = math.floor((n + 1) / 2)
    r_lo = math.floor(n / 2 - 1.96 * math.sqrt(n) / 2)
    r_hi = math.ceil(1 + n / 2 + 1.96 * math.sqrt(n) / 2)
    [row] = q_stats_median_ci(spark, sf_dir).collect()
    assert row.n == n
    assert abs(row.median - vals[r_med - 1]) < 1e-3
    assert abs(row.ci_lo - vals[r_lo - 1]) < 1e-3
    assert abs(row.ci_hi - vals[r_hi - 1]) < 1e-3
    assert row.ci_lo <= row.median <= row.ci_hi


def test_try_surface_nulls_exactly_where_dirty(spark, sf_dir):
    from polybot_data_etl_spark.functions.scalar import q_fn_try

    rows = q_fn_try(spark, sf_dir).collect()
    assert rows
    import json as _json

    ev = {
        r.event_id: r
        for r in table(spark, sf_dir, "events").collect()
        if r.event_id < 2000
    }
    for r in rows:
        src = ev[r.event_id]
        assert r.k_parsed == _json.loads(src.props)["k"]
        assert r.type_as_int is None  # event_type is never numeric
        if src.event_id % 5 == 0:
            assert r.safe_div is None
        else:
            assert abs(r.safe_div - src.value / (src.event_id % 5)) < 1e-6
        m = src.event_id % 15
        if 1 <= m <= 12:
            assert r.maybe_date == f"2024-{m:02d}-01"
        else:
            assert r.maybe_date is None


def test_auc_ci_hanley_mcneil_matches_python(spark, sf_dir):
    from polybot_data_etl_spark.functions.ml import _eval_scores, q_ml_auc_ci

    sy = [(r.score, r.truth) for r in _eval_scores(spark, sf_dir).collect()]
    pos = sorted(s for s, t in sy if t)
    neg = sorted(s for s, t in sy if not t)
    # exact Mann-Whitney AUC with tie credit
    import bisect

    wins = 0.0
    for p in pos:
        lo = bisect.bisect_left(neg, p)
        hi = bisect.bisect_right(neg, p)
        wins += lo + (hi - lo) / 2
    a = round(wins / (len(pos) * len(neg)) + 1e-11, 6)
    q1 = a / (2 - a)
    q2 = 2 * a * a / (1 + a)
    se = math.sqrt(
        (
            a * (1 - a)
            + (len(pos) - 1) * (q1 - a * a)
            + (len(neg) - 1) * (q2 - a * a)
        )
        / (len(pos) * len(neg))
    )
    [row] = q_ml_auc_ci(spark, sf_dir).collect()
    assert (row.n_pos, row.n_neg) == (len(pos), len(neg))
    assert abs(row.auc - a) < 1e-3
    assert abs(row.auc_se - se) < 1e-3
    assert row.ci_lo <= row.auc <= row.ci_hi
    assert 0 <= row.ci_lo and row.ci_hi <= 1


def test_load_factor_matches_python(spark, sf_dir):
    from polybot_data_etl_spark.operators.timeseries import q_ts_load_factor

    per = defaultdict(Counter)
    for r in table(spark, sf_dir, "events").collect():
        h = r.ts.replace(minute=0, second=0, microsecond=0)
        per[r.event_type][h] += 1
    rows = q_ts_load_factor(spark, sf_dir).collect()
    assert {r.event_type for r in rows} == set(per)
    for r in rows:
        counts = list(per[r.event_type].values())
        assert r.n_hours == len(counts)
        assert r.peak_hour == max(counts)
        assert abs(r.mean_hour - sum(counts) / len(counts)) < 1e-3
        assert abs(r.load_factor - (sum(counts) / len(counts)) / max(counts)) < 1e-3
        assert 0 < r.load_factor <= 1


def test_id_gaps_on_contiguous_fixture_and_synthetic_holes(spark, sf_dir):
    from polybot_data_etl_spark.functions.dq import q_dq_id_gaps

    ids = sorted(
        r.event_id for r in table(spark, sf_dir, "events").collect()
    )
    missing = (ids[-1] - ids[0] + 1) - len(ids)
    gaps = sum(1 for a, b in zip(ids, ids[1:]) if b - a > 1)
    mx = max((b - a - 1 for a, b in zip(ids, ids[1:])), default=0)
    [row] = q_dq_id_gaps(spark, sf_dir).collect()
    assert row.n_rows == len(ids)
    assert row.id_span == ids[-1] - ids[0] + 1
    assert row.n_gaps == gaps
    assert row.n_missing == missing
    assert row.max_gap == mx
    # invariant: span == rows + missing
    assert row.id_span == row.n_rows + row.n_missing


def test_prefix_agreement_matches_python(spark, sf_dir):
    from polybot_data_etl_spark.functions.vectors import (
        _PREFIX_DIMS,
        q_embed_prefix_agreement,
    )

    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in table(spark, sf_dir, "embeddings").collect()
    }

    def top1(probe, dims):
        best = None
        for cid, v in emb.items():
            if cid == probe:
                continue
            sim = round(
                sum(a * b for a, b in zip(emb[probe][:dims], v[:dims])), 4
            )
            key = (-sim, cid)
            if best is None or key < best[0]:
                best = (key, cid)
        return best[1]

    agree = 0
    probes = [p for p in emb if p < 20]
    for p in probes:
        if top1(p, len(emb[p])) == top1(p, _PREFIX_DIMS):
            agree += 1
    [row] = q_embed_prefix_agreement(spark, sf_dir).collect()
    assert row.n_probes == len(probes)
    assert row.n_agree == agree
    assert abs(row.agreement - agree / len(probes)) < 1e-9


def test_runs_test_matches_python(spark, sf_dir):
    from polybot_data_etl_spark.functions.stats import q_stats_runs

    daily = defaultdict(int)
    for r in table(spark, sf_dir, "events").collect():
        daily[r.ts.date()] += int(round(r.value * 100))
    vols = [daily[d] for d in sorted(daily)]
    ups = [1 if b > a else 0 for a, b in zip(vols, vols[1:])]
    n = len(ups)
    n1 = sum(ups)
    n2 = n - n1
    runs = 1 + sum(1 for a, b in zip(ups, ups[1:]) if a != b)
    mu = 2 * n1 * n2 / n + 1
    sd = math.sqrt(2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1)))
    z = (runs - mu) / sd
    [row] = q_stats_runs(spark, sf_dir).collect()
    assert (row.n_moves, row.n_up, row.n_down, row.n_runs) == (
        n, n1, n2, runs,
    )
    assert abs(row.z - z) < 1e-3
    phi = lambda v: 0.5 * (1 + math.erf(v / math.sqrt(2)))
    assert abs(row.p_value - 2 * (1 - phi(abs(z)))) < 1e-3
    assert row.non_random == (row.p_value < 0.05)


def test_winnowing_guarantee_and_python_replay(spark, sf_dir):
    """Replay the winnowing kernel in pure Python (positional 3-gram
    char hashes, tail-inclusive w-window mins, distinct) and check the
    pair table; also assert the MOSS guarantee on a synthetic pair of
    docs sharing a long substring."""
    from polybot_data_etl_spark.functions.dedup import (
        _P,
        _WIN_FP_DF_CAP,
        _WIN_SHARED,
        _WIN_W,
        q_dedup_winnowing,
    )

    def fingerprints(text):
        words = text.lower().split(" ")
        m = max(len(words) - 2, 1)
        hs = []
        for i in range(m):
            h = 0
            for c in " ".join(words[i : i + 3]):
                h = (h * 31 + ord(c)) % _P
            hs.append(h)
        inf = float("inf")
        padded = hs + [inf] * (_WIN_W - 1)
        return {
            int(min(padded[i : i + _WIN_W])) for i in range(len(hs))
        }

    fps = {}
    for r in table(spark, sf_dir, "documents").collect():
        fps[r.doc_id] = fingerprints(r.text)
    dfreq = Counter(f for s in fps.values() for f in s)
    keep = {f for f, c in dfreq.items() if c <= _WIN_FP_DF_CAP}
    want = {}
    ids = sorted(fps)
    inv = defaultdict(set)
    for d, s in fps.items():
        for f in s & keep:
            inv[f].add(d)
    pair_cnt = Counter()
    for f, ds in inv.items():
        ds = sorted(ds)
        for i, a in enumerate(ds):
            for b in ds[i + 1 :]:
                pair_cnt[(a, b)] += 1
    want = {p: c for p, c in pair_cnt.items() if c >= _WIN_SHARED}
    got = {
        (r.a_id, r.b_id): r.shared_fp
        for r in q_dedup_winnowing(spark, sf_dir).collect()
    }
    assert got == want
    # MOSS guarantee: docs sharing >= w+k-1 consecutive tokens share
    # at least one fingerprint
    shared_run = "alpha beta gamma delta epsilon zeta eta"
    f1 = fingerprints("start " + shared_run + " end one")
    f2 = fingerprints("other prefix " + shared_run + " different tail")
    assert f1 & f2


def test_capture_recapture_chapman_algebra(spark, sf_dir):
    from polybot_data_etl_spark.functions.dedup import (
        q_dedup_capture_recapture,
        q_dedup_ngram,
    )
    from polybot_data_etl_spark.functions.text import q_dedup_minhash

    mh = {
        (r.a_id, r.b_id)
        for r in q_dedup_minhash(spark, sf_dir).collect()
    }
    ng = {
        (r.a_id, r.b_id) for r in q_dedup_ngram(spark, sf_dir).collect()
    }
    m = len(mh & ng)
    nhat = (len(mh) + 1) * (len(ng) + 1) / (m + 1) - 1
    [row] = q_dedup_capture_recapture(spark, sf_dir).collect()
    assert (row.n_minhash, row.n_ngram, row.n_both) == (
        len(mh), len(ng), m,
    )
    assert abs(row.chapman_total - nhat) < 0.02
    assert abs(row.coverage_minhash - len(mh) / nhat) < 1e-3
    assert abs(row.coverage_ngram - len(ng) / nhat) < 1e-3
    # the estimated total can never be below either observed count
    assert row.chapman_total >= max(len(mh), len(ng)) - 1e-9


def test_mcnemar_matches_python(spark, sf_dir):
    from polybot_data_etl_spark.functions.stats import q_stats_mcnemar

    b = c = n = 0
    for r in table(spark, sf_dir, "embeddings").collect():
        truth = r.label % 2 == 1
        emb = [float(x) for x in r.embedding]
        za = 2.0 * emb[0] + 1.5 * emb[1] + emb[2] - 0.1
        zb = 2.0 * emb[0] - 0.1
        pa = round(1 / (1 + math.exp(-za)) + 1e-9, 4) >= 0.5
        pb = round(1 / (1 + math.exp(-zb)) + 1e-9, 4) >= 0.5
        n += 1
        if pa == truth and pb != truth:
            b += 1
        elif pa != truth and pb == truth:
            c += 1
    z = (b - c) / math.sqrt(b + c)
    phi = lambda v: 0.5 * (1 + math.erf(v / math.sqrt(2)))
    [row] = q_stats_mcnemar(spark, sf_dir).collect()
    assert (row.n, row.only_a_right, row.only_b_right) == (n, b, c)
    assert abs(row.chi2 - z * z) < 1e-3
    assert abs(row.p_value - 2 * (1 - phi(abs(z)))) < 1e-3
    assert row.models_differ == (row.p_value < 0.05)


def test_bimodality_uniform_sits_near_five_ninths(spark, sf_dir):
    from polybot_data_etl_spark.functions.stats import q_stats_bimodality

    per = defaultdict(list)
    for r in table(spark, sf_dir, "events").collect():
        per[r.event_type].append(r.value)
    rows = q_stats_bimodality(spark, sf_dir).collect()
    assert {r.event_type for r in rows} == set(per)
    for r in rows:
        v = per[r.event_type]
        n = len(v)
        mu = sum(v) / n
        m2 = sum((x - mu) ** 2 for x in v) / n
        m3 = sum((x - mu) ** 3 for x in v) / n
        m4 = sum((x - mu) ** 4 for x in v) / n
        skew = m3 / m2**1.5
        kurt = m4 / m2**2
        bc = (skew**2 + 1) / (
            kurt + 3 * (n - 1) ** 2 / ((n - 2) * (n - 3))
        )
        assert r.n == n
        assert abs(r.skewness - skew) < 1e-3
        assert abs(r.kurtosis - kurt) < 1e-3
        assert abs(r.bimodality_coef - bc) < 1e-3
        assert r.likely_bimodal == (r.bimodality_coef > 0.555)
        assert 0 < r.bimodality_coef <= 1 + 1e-9


def test_kappa_contingency_algebra(spark, sf_dir):
    from polybot_data_etl_spark.functions.ml import q_ml_kappa

    n = pp = nn = ap = bp = 0
    for r in table(spark, sf_dir, "embeddings").collect():
        emb = [float(x) for x in r.embedding]
        za = 2.0 * emb[0] + 1.5 * emb[1] + emb[2] - 0.1
        zb = 2.0 * emb[0] - 0.1
        pa = round(1 / (1 + math.exp(-za)) + 1e-9, 4) >= 0.5
        pb = round(1 / (1 + math.exp(-zb)) + 1e-9, 4) >= 0.5
        n += 1
        pp += pa and pb
        nn += (not pa) and (not pb)
        ap += pa
        bp += pb
    po = (pp + nn) / n
    pe = (ap * bp + (n - ap) * (n - bp)) / (n * n)
    kappa = (po - pe) / (1 - pe)
    [row] = q_ml_kappa(spark, sf_dir).collect()
    assert (row.n, row.both_pos, row.both_neg) == (n, pp, nn)
    assert abs(row.observed_agreement - po) < 1e-3
    assert abs(row.chance_agreement - pe) < 1e-3
    assert abs(row.kappa - kappa) < 1e-3
    # kappa never exceeds observed agreement and is ≤ 1
    assert row.kappa <= 1 + 1e-9
    bands = ["slight", "fair", "moderate", "substantial", "near_perfect"]
    cuts = [0.2, 0.4, 0.6, 0.8, float("inf")]
    want = next(b for b, c in zip(bands, cuts) if row.kappa < c)
    assert row.agreement_band == want


def test_cohens_d_pooled_sd_algebra(spark, sf_dir):
    from polybot_data_etl_spark.functions.stats import q_stats_cohens_d

    per = defaultdict(list)
    for r in table(spark, sf_dir, "events").collect():
        if r.event_type in ("click", "view"):
            per[r.event_type].append(r.value)
    a, b = per["click"], per["view"]
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = sum((x - ma) ** 2 for x in a) / (na - 1)
    vb = sum((x - mb) ** 2 for x in b) / (nb - 1)
    sp = math.sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2))
    d = round((ma - mb) / sp + 1e-11, 6)
    g = d * (1 - 3 / (4 * (na + nb) - 9))
    se = math.sqrt((na + nb) / (na * nb) + d * d / (2 * (na + nb)))
    [row] = q_stats_cohens_d(spark, sf_dir).collect()
    assert (row.n_click, row.n_view) == (na, nb)
    assert abs(row.cohens_d - d) < 1e-3
    assert abs(row.hedges_g - g) < 1e-3
    assert abs(row.ci_lo - (d - 1.96 * se)) < 1e-3
    assert abs(row.ci_hi - (d + 1.96 * se)) < 1e-3
    # Hedges g shrinks toward zero, never past d
    assert abs(row.hedges_g) <= abs(row.cohens_d) + 1e-9
    assert row.ci_lo < row.cohens_d < row.ci_hi


def test_ljung_box_white_noise_math(spark, sf_dir):
    from polybot_data_etl_spark.operators.timeseries import q_ts_ljung_box

    daily = defaultdict(Counter)
    for r in table(spark, sf_dir, "events").collect():
        daily[r.event_type][r.ts.date()] += 1
    rows = {r.event_type: r for r in q_ts_ljung_box(spark, sf_dir).collect()}
    for et, cnt in daily.items():
        xs = [c for _, c in sorted(cnt.items())]
        n = len(xs)
        if n < 8:
            assert et not in rows
            continue
        mean = sum(xs) / n
        den = sum(x * x for x in xs) - sum(xs) * mean
        rho = [
            round(
                (
                    sum(xs[t] * xs[t - k] for t in range(k, n))
                    - mean * sum(xs[t] + xs[t - k] for t in range(k, n))
                    + (n - k) * mean * mean
                )
                / den
                + 1e-11,
                6,
            )
            for k in (1, 2, 3, 4)
        ]
        q = round(
            n * (n + 2) * sum(r * r / (n - k) for k, r in zip((1, 2, 3, 4), rho))
            + 1e-11,
            6,
        )
        p = math.exp(-q / 2) * (1 + q / 2)
        row = rows[et]
        assert row.n_days == n
        for k, r_k in zip((1, 2, 3, 4), rho):
            assert abs(getattr(row, f"ac{k}") - r_k) < 1e-3
        assert abs(row.q_stat - q) < 1e-3
        assert abs(row.p_value - p) < 1e-3
        assert row.autocorrelated == (p < 0.05)
        assert row.q_stat >= -1e-9  # Q is a sum of squares


def test_theil_decomposition_is_additive(spark, sf_dir):
    from polybot_data_etl_spark.operators.aggregates import q_agg_theil

    nat = {
        r.c_custkey: r.c_nationkey
        for r in table(spark, sf_dir, "customer").collect()
    }
    per = defaultdict(list)
    for r in table(spark, sf_dir, "orders").collect():
        per[nat[r.o_custkey]].append(r.o_totalprice)
    allx = [x for xs in per.values() for x in xs]
    n, s = len(allx), sum(allx)
    mu = s / n
    total = sum((x / mu) * math.log(x / mu) for x in allx) / n
    within = between = 0.0
    for xs in per.values():
        ng, sg = len(xs), sum(xs)
        mug = sg / ng
        wg = sg / s
        within += wg * sum((x / mug) * math.log(x / mug) for x in xs) / ng
        between += wg * math.log(mug / mu)
    [row] = q_agg_theil(spark, sf_dir).collect()
    assert (row.n_orders, row.n_nations) == (n, len(per))
    assert abs(row.theil_total - total) < 1e-3
    assert abs(row.theil_between - between) < 1e-3
    assert abs(row.theil_within - within) < 1e-3
    # the decomposition is exactly additive
    assert abs(row.theil_between + row.theil_within - row.theil_total) < 2e-4
    assert row.theil_total >= -1e-9


def test_hurst_rescaled_range_math(spark, sf_dir):
    from polybot_data_etl_spark.operators.timeseries import q_ts_hurst

    daily = defaultdict(Counter)
    for r in table(spark, sf_dir, "events").collect():
        daily[r.event_type][r.ts.date()] += 1
    rows = {r.event_type: r for r in q_ts_hurst(spark, sf_dir).collect()}
    for et, cnt in daily.items():
        xs = [c for _, c in sorted(cnt.items())]
        n = len(xs)
        if n < 8:
            assert et not in rows
            continue
        mean = sum(xs) / n
        zs, cum = [], 0
        for t, x in enumerate(xs, start=1):
            cum += x
            zs.append(cum - t * mean)
        r_ = max(zs) - min(zs)
        s_ = math.sqrt(sum(x * x for x in xs) / n - mean * mean)
        rs = round(r_ / s_ + 1e-11, 6)
        h = math.log(rs) / math.log(n)
        row = rows[et]
        assert row.n_days == n
        assert abs(row.r_range - r_) < 1e-3
        assert abs(row.s_dev - s_) < 1e-3
        assert abs(row.hurst - h) < 1e-3
        assert row.persistent == (h > 0.55)
        # R/S of any real series is at least 1/2 max deviation over std
        assert row.rescaled_range > 0


def test_hapax_frequency_of_frequencies(spark, sf_dir):
    from polybot_data_etl_spark.functions.text import q_text_hapax

    tf = Counter()
    for r in table(spark, sf_dir, "documents").collect():
        for t in r.text.lower().split(" "):
            if t:
                tf[t] += 1
    v, n = len(tf), sum(tf.values())
    v1 = sum(1 for c in tf.values() if c == 1)
    v2 = sum(1 for c in tf.values() if c == 2)
    rep = sum(c * (c - 1) for c in tf.values())
    [row] = q_text_hapax(spark, sf_dir).collect()
    assert (row.vocab_size, row.n_tokens) == (v, n)
    assert (row.hapax, row.dis_legomena) == (v1, v2)
    assert abs(row.hapax_ratio - v1 / v) < 1e-3
    assert abs(row.herdan_c - math.log(v) / math.log(n)) < 1e-3
    assert abs(row.simpson_d - rep / (n * (n - 1))) < 1e-5
    assert 0 < row.herdan_c < 1  # vocab grows sublinearly in tokens


def test_anisotropy_resultant_identity(spark, sf_dir):
    from polybot_data_etl_spark.functions.vectors import q_embed_anisotropy

    vecs = []
    for r in table(spark, sf_dir, "embeddings").collect():
        v = [float(x) for x in r.embedding]
        nrm = math.sqrt(sum(x * x for x in v))
        vecs.append([x / nrm for x in v])
    n, d = len(vecs), len(vecs[0])
    sums = [sum(v[k] for v in vecs) for k in range(d)]
    ssq = sum(s * s for s in sums)
    avg_cos = (ssq - n) / (n * (n - 1))
    # brute-force check on a small prefix that the identity is the
    # pairwise mean it claims to be
    m = min(n, 40)
    pair = [
        sum(a * b for a, b in zip(vecs[i], vecs[j]))
        for i in range(m)
        for j in range(m)
        if i != j
    ]
    sub_sums = [sum(v[k] for v in vecs[:m]) for k in range(d)]
    sub_ssq = sum(s * s for s in sub_sums)
    assert abs(sum(pair) - (sub_ssq - m)) < 1e-6
    [row] = q_embed_anisotropy(spark, sf_dir).collect()
    assert (row.n_vectors, row.n_dims) == (n, d)
    assert abs(row.avg_pairwise_cos - avg_cos) < 1e-4
    assert abs(row.resultant_length - math.sqrt(ssq) / n) < 1e-3
    assert -1.0 / (n - 1) - 1e-9 <= row.avg_pairwise_cos <= 1 + 1e-9
    assert row.anisotropic == (row.avg_pairwise_cos > 0.1)


def test_sign_test_daily_pairing(spark, sf_dir):
    from polybot_data_etl_spark.functions.stats import q_stats_sign_test

    per = defaultdict(lambda: defaultdict(list))
    for r in table(spark, sf_dir, "events").collect():
        if r.event_type in ("click", "view"):
            per[r.ts.date()][r.event_type].append(r.value)
    w = l = m = 0
    for day, d in per.items():
        if d["click"] and d["view"]:
            m += 1
            mc = sum(d["click"]) / len(d["click"])
            mv = sum(d["view"]) / len(d["view"])
            if mc > mv:
                w += 1
            elif mc < mv:
                l += 1
    z = (2 * w - (w + l)) / math.sqrt(w + l)
    phi = lambda v: 0.5 * (1 + math.erf(v / math.sqrt(2)))
    [row] = q_stats_sign_test(spark, sf_dir).collect()
    assert (row.n_days, row.wins_click, row.wins_view) == (m, w, l)
    assert abs(row.z - z) < 1e-3
    assert abs(row.p_value - 2 * (1 - phi(abs(z)))) < 1e-3
    assert row.significant == (row.p_value < 0.05)


def test_kcore_peel_matches_python(spark, sf_dir):
    from polybot_data_etl_spark.operators.graph import q_graph_kcore

    by_order = defaultdict(set)
    for r in table(spark, sf_dir, "lineitem").collect():
        if r.l_partkey % 4 == 0:
            by_order[r.l_orderkey].add(r.l_partkey)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    rows = sorted(q_graph_kcore(spark, sf_dir).collect(),
                  key=lambda r: r.round)
    prev_nodes = prev_edges = None
    for rnd in (1, 2, 3):
        deg = Counter()
        for a, b in edges:
            deg[a] += 1
            deg[b] += 1
        keep = {v for v, d in deg.items() if d >= 2}
        edges = {(a, b) for a, b in edges if a in keep and b in keep}
        row = rows[rnd - 1]
        assert row.round == rnd
        assert row.n_nodes == len(keep)
        assert row.n_edges == len(edges)
        # peeling is monotone: survivors never grow
        if prev_nodes is not None:
            assert row.n_nodes <= prev_nodes
            assert row.n_edges <= prev_edges
        prev_nodes, prev_edges = row.n_nodes, row.n_edges


def test_simpson_stratum_vs_pooled_directions(spark, sf_dir):
    from polybot_data_etl_spark.functions.stats import q_stats_simpson

    per = defaultdict(lambda: defaultdict(lambda: [0, 0.0]))
    pooled = defaultdict(lambda: [0, 0.0])
    for r in table(spark, sf_dir, "orders").collect():
        coh = r.o_custkey % 2
        cell = per[r.o_orderpriority][coh]
        cell[0] += 1
        cell[1] += r.o_totalprice
        pooled[coh][0] += 1
        pooled[coh][1] += r.o_totalprice
    pa = pooled[0][1] / pooled[0][0]
    pb = pooled[1][1] / pooled[1][0]
    rows = {r.stratum: r for r in q_stats_simpson(spark, sf_dir).collect()}
    assert set(rows) == set(per)
    for st, d in per.items():
        row = rows[st]
        ma = d[0][1] / d[0][0]
        mb = d[1][1] / d[1][0]
        assert (row.n_a, row.n_b) == (d[0][0], d[1][0])
        assert abs(row.mean_a - ma) < 1e-2
        assert abs(row.mean_b - mb) < 1e-2
        assert row.a_wins_stratum == (ma > mb)
        assert row.a_wins_pooled == (pa > pb)
        assert row.reversed == ((ma > mb) != (pa > pb))


def test_mannkendall_pairwise_signs(spark, sf_dir):
    from polybot_data_etl_spark.operators.timeseries import q_ts_mannkendall

    daily = defaultdict(Counter)
    for r in table(spark, sf_dir, "events").collect():
        daily[r.event_type][r.ts.date()] += 1
    rows = {r.event_type: r for r in q_ts_mannkendall(spark, sf_dir).collect()}
    phi = lambda v: 0.5 * (1 + math.erf(v / math.sqrt(2)))
    for et, cnt in daily.items():
        xs = [c for _, c in sorted(cnt.items())]
        n = len(xs)
        s = sum(
            (xs[j] > xs[i]) - (xs[j] < xs[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        ties = Counter(xs)
        tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18
        z = ((s - 1) if s > 0 else (s + 1) if s < 0 else 0) / math.sqrt(var_s)
        if s == 0:
            z = 0.0
        p = 2 * (1 - phi(abs(z)))
        row = rows[et]
        assert (row.n_days, row.s_stat) == (n, s)
        assert abs(row.var_s - var_s) < 1e-2
        assert abs(row.z - z) < 1e-3
        assert abs(row.p_value - p) < 1e-3
        want = "none" if p >= 0.05 else ("increasing" if s > 0 else "decreasing")
        assert row.trend == want


def test_share_of_total_cents_exact(spark, sf_dir):
    from polybot_data_etl_spark.operators.windows import q_win_share_of_total

    nat = {
        r.c_custkey: r.c_nationkey
        for r in table(spark, sf_dir, "customer").collect()
    }
    cents = defaultdict(int)
    for r in table(spark, sf_dir, "orders").collect():
        cents[r.o_custkey] += round(r.o_totalprice * 100)
    nat_tot = defaultdict(int)
    for ck, c in cents.items():
        nat_tot[nat[ck]] += c
    grand = sum(cents.values())
    rows = q_win_share_of_total(spark, sf_dir).collect()
    by_nat = defaultdict(list)
    for r in rows:
        by_nat[r.c_nationkey].append(r)
    for nk, rs in by_nat.items():
        want = sorted(
            ((c, ck) for ck, c in cents.items() if nat[ck] == nk),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        assert [r.o_custkey for r in sorted(rs, key=lambda r: r.rank)] == [
            ck for _, ck in want
        ]
        for r in rs:
            c = cents[r.o_custkey]
            assert abs(r.revenue - c / 100.0) < 1e-9
            assert abs(r.share_of_nation - c / nat_tot[nk]) < 1e-3
            assert abs(r.share_of_total - c / grand) < 1e-5
    # every nation with at least one order appears
    assert set(by_nat) == set(nat_tot)


def test_breusch_pagan_two_pass_moments(spark, sf_dir):
    from polybot_data_etl_spark.functions.stats import q_stats_breusch_pagan

    per = defaultdict(list)
    for r in table(spark, sf_dir, "events").collect():
        per[r.event_type].append((float(r.ts.hour), r.value))
    phi = lambda v: 0.5 * (1 + math.erf(v / math.sqrt(2)))
    rows = {r.event_type: r for r in q_stats_breusch_pagan(spark, sf_dir).collect()}
    for et, pts in per.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        b = round((n * sxy - sx * sy) / (n * sxx - sx * sx) + 1e-11, 6)
        a = round(sy / n - b * sx / n + 1e-11, 6)
        zs = [(x, (y - a - b * x) ** 2) for x, y in pts]
        sz = sum(z for _, z in zs)
        sxz = sum(x * z for x, z in zs)
        szz = sum(z * z for _, z in zs)
        lm = round(
            n * (n * sxz - sx * sz) ** 2
            / ((n * sxx - sx * sx) * (n * szz - sz * sz))
            + 1e-11,
            6,
        )
        p = 2 * (1 - phi(math.sqrt(lm)))
        row = rows[et]
        assert row.n == n
        assert abs(row.lm - lm) < 1e-2
        assert abs(row.p_value - p) < 1e-3
        assert row.heteroskedastic == (row.p_value < 0.05)
        assert row.lm >= -1e-9  # LM = n·R² is nonnegative


def test_durbin_watson_residual_lags(spark, sf_dir):
    from polybot_data_etl_spark.functions.stats import q_stats_durbin_watson

    per = defaultdict(lambda: defaultdict(lambda: [0, 0.0]))
    for r in table(spark, sf_dir, "events").collect():
        c = per[r.event_type][r.ts.date()]
        c[0] += 1
        c[1] += r.value
    rows = {r.event_type: r for r in q_stats_durbin_watson(spark, sf_dir).collect()}
    for et, days in per.items():
        ys = [s / c for _, (c, s) in sorted(days.items())]
        n = len(ys)
        ts = list(range(1, n + 1))
        st, sy = sum(ts), sum(ys)
        sty = sum(t * y for t, y in zip(ts, ys))
        stt = sum(t * t for t in ts)
        b = round((n * sty - st * sy) / (n * stt - st * st) + 1e-11, 6)
        a = round(sy / n - b * st / n + 1e-11, 6)
        es = [y - a - b * t for t, y in zip(ts, ys)]
        dw = sum((es[i] - es[i - 1]) ** 2 for i in range(1, n)) / sum(
            e * e for e in es
        )
        row = rows[et]
        assert row.n_days == n
        assert abs(row.dw - dw) < 1e-3
        assert 0 <= row.dw <= 4 + 1e-9
        want = "positive" if dw < 1.5 else "negative" if dw > 2.5 else "none"
        assert row.residual_autocorr == want


def test_quantize_eval_roundtrip_math(spark, sf_dir):
    from polybot_data_etl_spark.functions.vectors import q_embed_quantize_eval

    per = defaultdict(list)
    for r in table(spark, sf_dir, "embeddings").collect():
        v = [float(x) for x in r.embedding]
        s = 127.0 / max(abs(x) for x in v)
        dq = [
            (math.floor(x * s + 0.5) if x >= 0 else -math.floor(-x * s + 0.5))
            / s
            for x in v
        ]
        dot = sum(a * b for a, b in zip(v, dq))
        cosv = dot / (
            math.sqrt(sum(a * a for a in v)) * math.sqrt(sum(b * b for b in dq))
        )
        l2e = math.sqrt(sum((a - b) ** 2 for a, b in zip(v, dq)))
        per[r.label].append((cosv, l2e))
    rows = {r.label: r for r in q_embed_quantize_eval(spark, sf_dir).collect()}
    assert set(rows) == set(per)
    for lb, vals in per.items():
        row = rows[lb]
        assert row.n_vectors == len(vals)
        assert abs(row.avg_cos - sum(c for c, _ in vals) / len(vals)) < 1e-4
        assert abs(row.min_cos - min(c for c, _ in vals)) < 1e-4
        assert abs(row.avg_l2_err - sum(e for _, e in vals) / len(vals)) < 1e-4
        # int8 round-trip keeps cosine extremely close to 1
        assert row.avg_cos > 0.999
        assert row.min_cos <= row.avg_cos + 1e-9


def test_langid_eval_confusion_cells(spark, sf_dir):
    from polybot_data_etl_spark.functions.quality import (
        q_text_langid,
        q_text_langid_eval,
    )

    pred = [(r.lang, r.pred_lang) for r in q_text_langid(spark, sf_dir).collect()]
    cells = Counter(pred)
    lang_tot = Counter(lang for lang, _ in pred)
    rows = q_text_langid_eval(spark, sf_dir).collect()
    assert {(r.lang, r.pred_lang) for r in rows} == set(cells)
    for r in rows:
        assert r.n == cells[(r.lang, r.pred_lang)]
        assert abs(r.share_of_lang - r.n / lang_tot[r.lang]) < 1e-3
        assert r.correct == (r.lang == r.pred_lang)
    # shares within each truth language sum to 1
    for lang in lang_tot:
        tot = sum(r.share_of_lang for r in rows if r.lang == lang)
        assert abs(tot - 1.0) < 1e-2


def test_growth_accounting_ledger_identities(spark, sf_dir):
    from polybot_data_etl_spark.operators.timeseries import (
        q_ts_growth_accounting,
    )

    weeks = defaultdict(set)
    for r in table(spark, sf_dir, "events").collect():
        d = r.ts.date()
        monday = d - __import__("datetime").timedelta(days=d.weekday())
        weeks[monday].add(r.user_id)
    ordered = sorted(weeks)
    first_seen = {}
    for wk in ordered:
        for u in weeks[wk]:
            first_seen.setdefault(u, wk)
    rows = sorted(q_ts_growth_accounting(spark, sf_dir).collect(),
                  key=lambda r: r.week)
    assert [r.week.date() for r in rows] == ordered
    import datetime as _dt

    for wk, row in zip(ordered, rows):
        users = weeks[wk]
        new = {u for u in users if first_seen[u] == wk}
        prev_users = weeks.get(wk - _dt.timedelta(days=7), set())
        retained = users & prev_users
        resurrected = users - new - retained
        assert row.active == len(users)
        assert row.new_users == len(new)
        assert row.retained == len(retained)
        assert row.resurrected == len(resurrected)
        # ledger identity: every active user has exactly one status
        assert row.active == row.new_users + row.retained + row.resurrected
        assert row.churned == len(prev_users) - len(retained)


def test_gamma_mom_parameter_algebra(spark, sf_dir):
    from polybot_data_etl_spark.functions.stats import q_stats_gamma_mom

    per = defaultdict(list)
    for r in table(spark, sf_dir, "events").collect():
        per[r.event_type].append(r.value)
    rows = {r.event_type: r for r in q_stats_gamma_mom(spark, sf_dir).collect()}
    for et, xs in per.items():
        n = len(xs)
        mu = sum(xs) / n
        v = sum(x * x for x in xs) / n - mu * mu
        row = rows[et]
        assert row.n == n
        assert abs(row.mean - mu) < 1e-2
        assert abs(row.shape_k - mu * mu / v) < 1e-2
        assert abs(row.scale_theta - v / mu) < 1e-2
        assert abs(row.cv - math.sqrt(v) / mu) < 1e-3
        # MoM identity: k·θ reconstructs the mean
        assert abs(row.shape_k * row.scale_theta - mu) < 0.05 * mu
        assert row.overdispersed == (row.shape_k < 1)


def test_pii_rates_match_regex(spark, sf_dir):
    import re as _re

    from polybot_data_etl_spark.functions.quality import q_text_pii

    em = _re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    ur = _re.compile(r"https?://[^ ]+")
    nm = _re.compile(r"[0-9]{6,}")
    per = defaultdict(lambda: [0, 0, 0, 0, 0, 0, 0])
    for r in table(spark, sf_dir, "documents").collect():
        c = per[r.source]
        e, u, n = len(em.findall(r.text)), len(ur.findall(r.text)), len(
            nm.findall(r.text)
        )
        c[0] += 1
        c[1] += e
        c[2] += u
        c[3] += n
        c[4] += e > 0
        c[5] += u > 0
        c[6] += n > 0
    rows = {r.source: r for r in q_text_pii(spark, sf_dir).collect()}
    assert set(rows) == set(per)
    for src, c in per.items():
        row = rows[src]
        assert (row.n_docs, row.emails, row.urls, row.long_numbers) == (
            c[0],
            c[1],
            c[2],
            c[3],
        )
        assert abs(row.doc_rate_email - c[4] / c[0]) < 1e-3
        assert abs(row.doc_rate_url - c[5] / c[0]) < 1e-3
        assert abs(row.doc_rate_number - c[6] / c[0]) < 1e-3
        assert row.needs_scrub == (c[4] / c[0] > 0.01)


def test_source_diversity_entropy_identities(spark, sf_dir):
    from polybot_data_etl_spark.functions.quality import (
        q_text_source_diversity,
    )

    docs = Counter()
    toks = Counter()
    for r in table(spark, sf_dir, "documents").collect():
        docs[r.source] += 1
        toks[r.source] += sum(1 for t in r.text.lower().split(" ") if t)
    n = sum(docs.values())
    tt = sum(toks.values())
    h = -sum((c / n) * math.log(c / n) for c in docs.values())
    hhi = sum((c / tt) ** 2 for c in toks.values())
    [row] = q_text_source_diversity(spark, sf_dir).collect()
    assert (row.n_sources, row.n_docs) == (len(docs), n)
    assert abs(row.doc_entropy - h) < 1e-3
    assert abs(row.effective_sources - math.exp(h)) < 1e-2
    assert abs(row.token_hhi - hhi) < 1e-3
    assert abs(row.top_source_token_share - max(toks.values()) / tt) < 1e-3
    # effective sources can never exceed the actual count, and HHI is
    # bounded below by perfect equality
    assert row.effective_sources <= len(docs) + 1e-6
    assert row.token_hhi >= 1.0 / len(docs) - 1e-6


def test_negbin_mom_dispersion(spark, sf_dir):
    from polybot_data_etl_spark.functions.stats import q_stats_negbin_mom

    daily = defaultdict(Counter)
    for r in table(spark, sf_dir, "events").collect():
        daily[r.event_type][r.ts.date()] += 1
    rows = {r.event_type: r for r in q_stats_negbin_mom(spark, sf_dir).collect()}
    for et, cnt in daily.items():
        xs = list(cnt.values())
        n = len(xs)
        mu = sum(xs) / n
        v = sum(x * x for x in xs) / n - mu * mu
        row = rows[et]
        assert row.n_days == n
        assert abs(row.mean - mu) < 1e-2
        assert abs(row.variance - v) < 1e-1
        assert abs(row.dispersion_index - v / mu) < 1e-3
        if v > mu:
            assert abs(row.nb_r - mu * mu / (v - mu)) < 1e-1
            assert abs(row.nb_p - mu / v) < 1e-3
            # NB mean identity: r(1-p)/p = mu
            assert abs(row.nb_r * (1 - row.nb_p) / row.nb_p - mu) < 0.05 * mu
        else:
            assert row.nb_r is None and row.nb_p is None
        assert row.poisson_ok == (row.dispersion_index <= 1.2)


def test_burn_rate_two_window_alert(spark, sf_dir):
    from polybot_data_etl_spark.operators.timeseries import q_ts_burn_rate

    hourly = defaultdict(lambda: [0, 0])
    for r in table(spark, sf_dir, "events").collect():
        h = r.ts.replace(minute=0, second=0, microsecond=0)
        hourly[h][0] += 1
        hourly[h][1] += r.event_type == "error"
    hours = sorted(hourly)
    tot_e = sum(v[0] for v in hourly.values())
    tot_r = sum(v[1] for v in hourly.values())
    slo = tot_r / tot_e
    rows = sorted(q_ts_burn_rate(spark, sf_dir).collect(), key=lambda r: r.hour)
    assert [r.hour for r in rows] == hours
    for i, (h, row) in enumerate(zip(hours, rows)):
        ev, er = hourly[h]
        lo = max(0, i - 5)
        w_ev = sum(hourly[hours[j]][0] for j in range(lo, i + 1))
        w_er = sum(hourly[hours[j]][1] for j in range(lo, i + 1))
        r1, r6 = er / ev, w_er / w_ev
        assert (row.events, row.errors) == (ev, er)
        assert abs(row.rate_1h - r1) < 1e-3
        assert abs(row.rate_6h - r6) < 1e-3
        assert abs(row.burn_1h - r1 / slo) < 1e-2
        assert row.page_alert == (r1 / slo > 1.2 and r6 / slo > 1.1)
        # the 6h window smooths: its burn can never exceed the max
        # hourly burn inside the window
        mx = max(
            hourly[hours[j]][1] / hourly[hours[j]][0] for j in range(lo, i + 1)
        )
        assert row.rate_6h <= mx + 1e-9


def test_circular_mean_resultant(spark, sf_dir):
    from polybot_data_etl_spark.functions.stats import q_stats_circular

    per = defaultdict(list)
    for r in table(spark, sf_dir, "events").collect():
        sec = (
            r.ts.hour * 3600 + r.ts.minute * 60 + r.ts.second
        )
        per[r.event_type].append(2 * math.pi * sec / 86400)
    rows = {r.event_type: r for r in q_stats_circular(spark, sf_dir).collect()}
    for et, thetas in per.items():
        n = len(thetas)
        s = sum(math.sin(t) for t in thetas)
        c = sum(math.cos(t) for t in thetas)
        rbar = math.sqrt(s * s + c * c) / n
        ang = math.atan2(s, c)
        if ang < 0:
            ang += 2 * math.pi
        row = rows[et]
        assert row.n == n
        assert abs(row.mean_hour - ang / (2 * math.pi) * 24) < 1e-3
        assert abs(row.resultant - rbar) < 1e-3
        assert abs(row.circ_variance - (1 - rbar)) < 1e-3
        assert 0 <= row.resultant <= 1 + 1e-9
        assert 0 <= row.mean_hour < 24 + 1e-9


def test_cardinality_shift_rolling_median(spark, sf_dir):
    from polybot_data_etl_spark.functions.dq import q_dq_cardinality_shift

    daily = defaultdict(lambda: defaultdict(set))
    for r in table(spark, sf_dir, "events").collect():
        daily[r.event_type][r.ts.date()].add(r.user_id)
    rows = defaultdict(dict)
    for r in q_dq_cardinality_shift(spark, sf_dir).collect():
        rows[r.event_type][r.day.date()] = r
    for et, days in daily.items():
        ordered = sorted(days)
        assert set(rows[et]) == set(ordered)
        for i, d in enumerate(ordered):
            du = len(days[d])
            window = sorted(
                len(days[ordered[j]]) for j in range(max(0, i - 6), i + 1)
            )
            k = len(window)
            med = (
                float(window[k // 2])
                if k % 2 == 1
                else (window[k // 2 - 1] + window[k // 2]) / 2.0
            )
            row = rows[et][d]
            assert row.distinct_users == du
            assert abs(row.med7 - med) < 1e-6
            assert abs(row.deviation - (du - med) / med) < 1e-3
            assert row.anomalous == (abs(row.deviation) > 0.3)


def test_interarrival_gap_moments(spark, sf_dir):
    from polybot_data_etl_spark.operators.timeseries import q_ts_interarrival

    per_user = defaultdict(list)
    for r in table(spark, sf_dir, "events").collect():
        per_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    gaps = defaultdict(list)
    for evs in per_user.values():
        evs.sort(key=lambda t: (t[0], t[1]))
        for (a, _, _), (b, _, et) in zip(evs, evs[1:]):
            gaps[et].append(
                int(b.timestamp()) - int(a.timestamp())
            )
    rows = {r.event_type: r for r in q_ts_interarrival(spark, sf_dir).collect()}
    assert set(rows) == set(gaps)
    for et, gs in gaps.items():
        n = len(gs)
        mu = sum(gs) / n
        cv = math.sqrt(sum(g * g for g in gs) / n - mu * mu) / mu
        row = rows[et]
        assert row.n_gaps == n
        assert abs(row.mean_gap_s - mu) < 1e-2
        assert abs(row.cv - cv) < 1e-3
        assert row.poisson_like == (abs(row.cv - 1) < 0.2)
        assert row.mean_gap_s > 0


def test_entropy_rate_bounds_and_math(spark, sf_dir):
    from polybot_data_etl_spark.operators.timeseries import q_ts_entropy_rate

    per_user = defaultdict(list)
    for r in table(spark, sf_dir, "events").collect():
        per_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    trans = Counter()
    for evs in per_user.values():
        evs.sort(key=lambda t: (t[0], t[1]))
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            trans[(a, b)] += 1
    total = sum(trans.values())
    out = Counter()
    for (a, _), n in trans.items():
        out[a] += n
    h_rate = -sum(
        (n / total) * math.log(n / out[a]) for (a, _), n in trans.items()
    )
    h0 = -sum((o / total) * math.log(o / total) for o in out.values())
    [row] = q_ts_entropy_rate(spark, sf_dir).collect()
    assert row.n_transitions == total
    assert row.n_states == len(out)
    assert abs(row.entropy_rate - h_rate) < 1e-3
    assert abs(row.state_entropy - h0) < 1e-3
    assert abs(row.predictability - (1 - h_rate / h0)) < 1e-3
    # conditioning can only reduce entropy: H(next|prev) <= H(state)
    assert row.entropy_rate <= row.state_entropy + 1e-9
    assert row.entropy_rate >= -1e-9


def test_clustering_coefficient_identity(spark, sf_dir):
    from polybot_data_etl_spark.operators.graph import q_graph_clustering

    by_order = defaultdict(set)
    for r in table(spark, sf_dir, "lineitem").collect():
        if r.l_partkey % 4 == 0:
            by_order[r.l_orderkey].add(r.l_partkey)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    tris = 0
    for a, b in edges:
        tris += len(adj[a] & adj[b])
    # each triangle counted 3 times (once per edge)
    tris //= 3
    [row] = q_graph_clustering(spark, sf_dir).collect()
    assert row.n_nodes == len(adj)
    assert row.n_edges == len(edges)
    assert row.wedges == wedges
    assert row.n_triangles == tris
    assert abs(row.global_clustering - 3 * tris / wedges) < 1e-5
    assert 0 <= row.global_clustering <= 1 + 1e-9


def test_logodds_dirichlet_prior_math(spark, sf_dir):
    from polybot_data_etl_spark.functions.text import (
        _LOGODDS_ALPHA,
        _LOGODDS_MIN_TF,
        _LOGODDS_TOPK,
        q_text_logodds,
    )

    st = defaultdict(Counter)
    for r in table(spark, sf_dir, "documents").collect():
        for t in r.text.lower().split(" "):
            if t:
                st[r.source][t] += 1
    tf = Counter()
    for cnt in st.values():
        tf.update(cnt)
    keep = {t for t, c in tf.items() if c >= _LOGODDS_MIN_TF}
    ns = {s: sum(c for t, c in cnt.items() if t in keep) for s, cnt in st.items()}
    n_all = sum(ns.values())
    a = _LOGODDS_ALPHA
    want = {}
    for s, cnt in st.items():
        scored = []
        for t in keep:
            y = cnt.get(t, 0)
            if y == 0:
                continue  # only observed (source, token) cells exist
            y_out = tf[t] - y
            delta = math.log((y + a) / (ns[s] - y + a)) - math.log(
                (y_out + a) / (n_all - ns[s] - y_out + a)
            )
            sd = math.sqrt(1 / (y + a) + 1 / (y_out + a))
            scored.append((round(delta / sd + 1e-11, 6), t, y, y_out, delta))
        scored.sort(key=lambda x: (-x[0], x[1]))
        want[s] = scored[:_LOGODDS_TOPK]
    rows = defaultdict(list)
    for r in q_text_logodds(spark, sf_dir).collect():
        rows[r.source].append(r)
    assert set(rows) == set(want)
    for s, exp in want.items():
        got = sorted(rows[s], key=lambda r: r.rank)
        assert [r.token for r in got] == [t for _, t, *_ in exp]
        for r, (zs, t, y, y_out, delta) in zip(got, exp):
            assert (r.count_in, r.count_out) == (y, y_out)
            assert abs(r.z - zs) < 1e-3
            assert abs(r.log_odds - delta) < 1e-3
            # a top distinguishing term must actually be overused
            assert r.log_odds > 0 or r.rank > 1


def test_gpd_pot_excess_moments(spark, sf_dir):
    from polybot_data_etl_spark.functions.stats import q_stats_gpd_pot

    per = defaultdict(list)
    for r in table(spark, sf_dir, "events").collect():
        per[r.event_type].append(r.value)
    rows = {r.event_type: r for r in q_stats_gpd_pot(spark, sf_dir).collect()}
    for et, xs in per.items():
        xs.sort()
        n = len(xs)
        # quantile_cont 0.95: linear interpolation at rank 0.95*(n-1)
        pos = 0.95 * (n - 1)
        lo = int(math.floor(pos))
        frac = pos - lo
        q = xs[lo] + frac * (xs[lo + 1] - xs[lo]) if lo + 1 < n else xs[lo]
        u = round(q + 1e-11, 6)
        exc = [x - u for x in xs if x > u]
        m = len(exc)
        mu = sum(exc) / m
        v = sum(e * e for e in exc) / m - mu * mu
        xi = 0.5 * (1 - mu * mu / v)
        beta = 0.5 * mu * (mu * mu / v + 1)
        row = rows[et]
        assert row.n_exceed == m
        assert abs(row.threshold - u) < 1e-3
        assert abs(row.mean_excess - mu) < 1e-3
        assert abs(row.gpd_xi - xi) < 1e-3
        assert abs(row.gpd_beta - beta) < 1e-3
        assert row.heavy_tail == (xi > 0)
        # roughly 5% of rows exceed the p95 threshold
        assert abs(m / n - 0.05) < 0.01


def test_clock_skew_inversion_counts(spark, sf_dir):
    from polybot_data_etl_spark.functions.dq import q_dq_clock_skew

    per_user = defaultdict(list)
    for r in table(spark, sf_dir, "events").collect():
        per_user[r.user_id].append((r.event_id, int(r.ts.timestamp()), r.event_type))
    stats = defaultdict(lambda: [0, 0, 0])
    for evs in per_user.values():
        evs.sort()
        for (_, a, _), (_, b, et) in zip(evs, evs[1:]):
            c = stats[et]
            c[0] += 1
            if b < a:
                c[1] += 1
                c[2] = max(c[2], a - b)
    rows = {r.event_type: r for r in q_dq_clock_skew(spark, sf_dir).collect()}
    assert set(rows) == set(stats)
    for et, (np_, ni, mb) in stats.items():
        row = rows[et]
        assert (row.n_pairs, row.n_inversions, row.max_backwards_s) == (
            np_,
            ni,
            mb,
        )
        assert abs(row.inversion_rate - ni / np_) < 1e-5
        assert row.skew_detected == (ni > 0)


def test_drift_chi2_contingency(spark, sf_dir):
    from polybot_data_etl_spark.functions.dq import q_dq_drift_chi2

    evs = [
        (r.event_type, int(r.ts.timestamp()))
        for r in table(spark, sf_dir, "events").collect()
    ]
    lo = min(s for _, s in evs)
    hi = max(s for _, s in evs)
    cells = Counter((et, 0 if 2 * s < lo + hi else 1) for et, s in evs)
    rows_tot = Counter()
    cols_tot = Counter()
    for (et, h), n in cells.items():
        rows_tot[et] += n
        cols_tot[h] += n
    grand = sum(cells.values())
    chi2 = sum(
        (n - rows_tot[et] * cols_tot[h] / grand) ** 2
        / (rows_tot[et] * cols_tot[h] / grand)
        for (et, h), n in cells.items()
    )
    k = len(rows_tot)
    [row] = q_dq_drift_chi2(spark, sf_dir).collect()
    assert (row.k_categories, row.dof) == (k, k - 1)
    assert abs(row.chi2 - chi2) < 1e-2
    assert abs(row.chi2_per_dof - chi2 / (k - 1)) < 1e-2
    assert row.drifted == (row.chi2_per_dof > 2)
    assert row.chi2 >= -1e-9


def test_oov_head_vocab(spark, sf_dir):
    from polybot_data_etl_spark.functions.text import (
        _OOV_VOCAB_K,
        q_text_oov,
    )

    tf = Counter()
    per = defaultdict(list)
    for r in table(spark, sf_dir, "documents").collect():
        for t in r.text.lower().split(" "):
            if t:
                tf[t] += 1
                per[r.source].append(t)
    vocab = {
        t
        for t, _ in sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[
            :_OOV_VOCAB_K
        ]
    }
    rows = {r.source: r for r in q_text_oov(spark, sf_dir).collect()}
    assert set(rows) == set(per)
    for src, toks in per.items():
        oov = [t for t in toks if t not in vocab]
        row = rows[src]
        assert (row.n_tokens, row.n_oov) == (len(toks), len(oov))
        assert abs(row.oov_rate - len(oov) / len(toks)) < 1e-3
        if oov:
            assert abs(
                row.avg_oov_len - sum(len(t) for t in oov) / len(oov)
            ) < 1e-3
        else:
            assert row.avg_oov_len is None
        assert row.vocab_mismatch == (row.oov_rate > 0.15)


def test_retention_halflife_eligibility_and_fit(spark, sf_dir):
    from polybot_data_etl_spark.operators.timeseries import (
        _RET_MAX_OFFSET,
        q_ts_retention_halflife,
    )

    user_days = defaultdict(set)
    for r in table(spark, sf_dir, "events").collect():
        user_days[r.user_id].add(r.ts.date())
    cohort = {u: min(ds) for u, ds in user_days.items()}
    max_day = max(d for ds in user_days.values() for d in ds)
    active = Counter()
    for u, ds in user_days.items():
        for d in ds:
            off = (d - cohort[u]).days
            if 1 <= off <= _RET_MAX_OFFSET:
                active[off] += 1
    curve = {}
    for off, na in active.items():
        if na == 0:
            continue
        elig = sum(1 for u, c in cohort.items() if (max_day - c).days >= off)
        curve[off] = (elig, na, round(na / elig + 1e-11, 6))
    xs = sorted(curve)
    n = len(xs)
    sx = sum(xs)
    sy = sum(math.log(curve[x][2]) for x in xs)
    sxy = sum(x * math.log(curve[x][2]) for x in xs)
    sxx = sum(x * x for x in xs)
    slope = round((n * sxy - sx * sy) / (n * sxx - sx * sx) + 1e-11, 6)
    rows = {r.day_offset: r for r in q_ts_retention_halflife(spark, sf_dir).collect()}
    assert set(rows) == set(curve)
    for off, (elig, na, r_) in curve.items():
        row = rows[off]
        assert (row.n_eligible, row.n_active) == (elig, na)
        assert abs(row.retention - r_) < 1e-3
        assert abs(row.decay_per_day - slope) < 1e-3
        assert abs(row.half_life_days - (-math.log(2) / slope)) < 0.05
        assert 0 <= row.fit_r2 <= 1 + 1e-9
        # retention is a probability; the synthetic fixture's curve is
        # near-flat so the slope's SIGN is data-dependent — only the
        # ln2/slope identity is asserted, not direction
        assert 0 < row.retention <= 1


def test_srm_parity_chi2(spark, sf_dir):
    from polybot_data_etl_spark.functions.stats import q_stats_srm

    users = {r.user_id for r in table(spark, sf_dir, "events").collect()}
    na = sum(1 for u in users if u % 2 == 0)
    nb = len(users) - na
    n = len(users)
    chi2 = (na - n / 2) ** 2 / (n / 2) + (nb - n / 2) ** 2 / (n / 2)
    phi = lambda v: 0.5 * (1 + math.erf(v / math.sqrt(2)))
    p = 2 * (1 - phi(math.sqrt(chi2)))
    [row] = q_stats_srm(spark, sf_dir).collect()
    assert (row.n_units, row.n_a, row.n_b) == (n, na, nb)
    assert abs(row.ratio_a - na / n) < 1e-3
    assert abs(row.chi2 - chi2) < 1e-3
    assert abs(row.p_value - p) < 1e-3
    assert row.srm_detected == (row.p_value < 0.001)


def test_fano_scales_with_window(spark, sf_dir):
    from polybot_data_etl_spark.operators.timeseries import (
        _FANO_WINDOWS_H,
        q_ts_fano,
    )

    secs = defaultdict(list)
    for r in table(spark, sf_dir, "events").collect():
        secs[r.event_type].append(int(r.ts.timestamp()))
    rows = {
        (r.event_type, r.w_hours): r
        for r in q_ts_fano(spark, sf_dir).collect()
    }
    for et, ss in secs.items():
        for w in _FANO_WINDOWS_H:
            cnt = Counter(s // (w * 3600) for s in ss)
            xs = list(cnt.values())
            n = len(xs)
            mu = sum(xs) / n
            v = sum(x * x for x in xs) / n - mu * mu
            row = rows[(et, w)]
            assert row.n_windows == n
            assert abs(row.mean_count - mu) < 1e-2
            assert abs(row.fano - v / mu) < 1e-2
            assert row.fano >= -1e-9
        # mean per window grows linearly with the window size
        assert (
            rows[(et, 24)].mean_count > rows[(et, 1)].mean_count
        )


def test_boxplot_tukey_fences(spark, sf_dir):
    from polybot_data_etl_spark.operators.aggregates import q_agg_boxplot

    per = defaultdict(list)
    for r in table(spark, sf_dir, "events").collect():
        per[r.event_type].append(r.value)
    def qc(xs, p):
        xs = sorted(xs)
        pos = p * (len(xs) - 1)
        lo = int(math.floor(pos))
        frac = pos - lo
        return xs[lo] + frac * (xs[lo + 1] - xs[lo]) if lo + 1 < len(xs) else xs[lo]
    rows = {r.event_type: r for r in q_agg_boxplot(spark, sf_dir).collect()}
    for et, xs in per.items():
        q1 = round(qc(xs, 0.25) + 1e-11, 6)
        med = round(qc(xs, 0.5) + 1e-11, 6)
        q3 = round(qc(xs, 0.75) + 1e-11, 6)
        iqr = q3 - q1
        lo_f, hi_f = q1 - 1.5 * iqr, q3 + 1.5 * iqr
        inside = [x for x in xs if lo_f <= x <= hi_f]
        n_out = sum(1 for x in xs if x < lo_f or x > hi_f)
        row = rows[et]
        assert row.n == len(xs)
        assert abs(row.q1 - q1) < 1e-3
        assert abs(row.median - med) < 1e-3
        assert abs(row.q3 - q3) < 1e-3
        assert abs(row.whisker_lo - min(inside)) < 1e-3
        assert abs(row.whisker_hi - max(inside)) < 1e-3
        assert row.n_outliers == n_out
        # box ordering invariants
        assert row.whisker_lo <= row.q1 <= row.median <= row.q3 <= row.whisker_hi


def test_fold_stability_hash_folds(spark, sf_dir):
    from polybot_data_etl_spark.functions.ml import (
        _CV_FOLDS,
        q_ml_fold_stability,
    )

    per = defaultdict(list)
    for r in table(spark, sf_dir, "embeddings").collect():
        emb = [float(x) for x in r.embedding]
        z = 2.0 * emb[0] + 1.5 * emb[1] + emb[2] - 0.1
        score = round(1 / (1 + math.exp(-z)) + 1e-9, 4)
        truth = r.label % 2 == 1
        fold = r.vec_id * 2654435761 % 1000000007 % _CV_FOLDS
        per[fold].append((score, truth))
    accs = {}
    for fold, rows_ in per.items():
        n = len(rows_)
        acc = sum(1 for s, t in rows_ if (s >= 0.5) == t) / n
        accs[fold] = round(acc + 1e-11, 6)
    k = len(accs)
    mean = sum(accs.values()) / k
    sd = math.sqrt(sum(a * a for a in accs.values()) / k - mean * mean)
    spread = max(accs.values()) - min(accs.values())
    rows = {r.fold: r for r in q_ml_fold_stability(spark, sf_dir).collect()}
    assert set(rows) == set(per)
    for fold, rows_ in per.items():
        row = rows[fold]
        n = len(rows_)
        brier = sum((s - (1.0 if t else 0.0)) ** 2 for s, t in rows_) / n
        assert row.n == n
        assert abs(row.accuracy - accs[fold]) < 1e-3
        assert abs(row.brier - brier) < 1e-3
        assert abs(row.acc_sd - sd) < 1e-3
        assert abs(row.acc_spread - spread) < 1e-3
        assert row.unstable == (spread > 0.05)
        # folds are near-equal sized under the multiplicative hash
        assert abs(n - len(per[0])) < 0.5 * len(per[0]) + 5


def test_link_predict_adamic_adar(spark, sf_dir):
    from polybot_data_etl_spark.operators.graph import (
        _LP_DEG_CAP,
        _LP_TOPK,
        q_graph_link_predict,
    )

    by_order = defaultdict(set)
    for r in table(spark, sf_dir, "lineitem").collect():
        if r.l_partkey % 4 == 0:
            by_order[r.l_orderkey].add(r.l_partkey)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    scores = defaultdict(lambda: [0, 0.0])
    for v, nbrs in adj.items():
        if len(nbrs) > _LP_DEG_CAP:
            continue
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                key = (ns[i], ns[j])
                scores[key][0] += 1
                scores[key][1] += 1 / math.log(len(nbrs))
    cand = [
        (round(aa + 1e-11, 6), a, b, cn)
        for (a, b), (cn, aa) in scores.items()
        if (a, b) not in edges
    ]
    cand.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = cand[:_LP_TOPK]
    rows = sorted(q_graph_link_predict(spark, sf_dir).collect(),
                  key=lambda r: r.rank)
    assert [(r.a, r.b) for r in rows] == [(a, b) for _, a, b, _ in want]
    for r, (aa, a, b, cn) in zip(rows, want):
        assert r.common_neighbors == cn
        assert abs(r.adamic_adar - aa) < 1e-3
        # a predicted link is never an existing edge
        assert (r.a, r.b) not in edges
        assert r.a < r.b


def test_cms_eval_one_sided_error(spark, sf_dir):
    from polybot_data_etl_spark.operators.sketches import (
        _CMS_P,
        _CMS_PARAMS,
        _CMS_W,
        q_agg_cms_eval,
    )

    keys = [
        r.l_partkey for r in table(spark, sf_dir, "lineitem").collect()
    ]
    exact = Counter(keys)
    counters = defaultdict(int)
    for k in keys:
        for i, a, b in _CMS_PARAMS:
            counters[(i, (k * a + b) % _CMS_P % _CMS_W)] += 1
    est = {
        k: min(
            counters[(i, (k * a + b) % _CMS_P % _CMS_W)]
            for i, a, b in _CMS_PARAMS
        )
        for k in exact
    }
    want = sorted(est.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = sorted(
        q_agg_cms_eval(spark, sf_dir).collect(),
        key=lambda r: (-r.est_count, r.l_partkey),
    )
    assert [(r.l_partkey, r.est_count) for r in rows] == want
    for r in rows:
        assert r.true_count == exact[r.l_partkey]
        # the CMS one-sided guarantee: never an underestimate
        assert r.overestimate >= 0
        assert abs(r.rel_err - r.overestimate / r.true_count) < 1e-5


def test_domain_cap_deterministic_keep_set(spark, sf_dir):
    from polybot_data_etl_spark.plans.pipelines import (
        _DOMAIN_CAP,
        q_mix_domain_cap,
    )

    per = defaultdict(list)
    for r in table(spark, sf_dir, "documents").collect():
        per[r.source].append((r.doc_id * 2654435761 % 1000000007, r.doc_id, r.n_chars))
    rows = {r.source: r for r in q_mix_domain_cap(spark, sf_dir).collect()}
    assert set(rows) == set(per)
    total_after = sum(min(len(v), _DOMAIN_CAP) for v in per.values())
    for src, docs in per.items():
        docs.sort()
        keep = docs[:_DOMAIN_CAP]
        row = rows[src]
        assert row.docs_before == len(docs)
        assert row.docs_after == len(keep)
        assert row.chars_before == sum(c for _, _, c in docs)
        assert row.chars_after == sum(c for _, _, c in keep)
        assert abs(row.share_after - len(keep) / total_after) < 1e-3
        assert row.capped == (len(docs) > _DOMAIN_CAP)
        assert row.docs_after <= _DOMAIN_CAP


def test_tail_ratio_quantile_algebra(spark, sf_dir):
    from polybot_data_etl_spark.functions.stats import q_stats_tail_ratio

    per = defaultdict(list)
    for r in table(spark, sf_dir, "events").collect():
        per[r.event_type].append(r.value)
    def qc(xs, p):
        xs = sorted(xs)
        pos = p * (len(xs) - 1)
        lo = int(math.floor(pos))
        frac = pos - lo
        return xs[lo] + frac * (xs[lo + 1] - xs[lo]) if lo + 1 < len(xs) else xs[lo]
    rows = {r.event_type: r for r in q_stats_tail_ratio(spark, sf_dir).collect()}
    for et, xs in per.items():
        row = rows[et]
        p50, p90, p99 = qc(xs, 0.5), qc(xs, 0.9), qc(xs, 0.99)
        assert row.n == len(xs)
        assert abs(row.p50 - p50) < 1e-3
        assert abs(row.p90 - p90) < 1e-3
        assert abs(row.p99 - p99) < 1e-3
        assert abs(row.p99_over_p50 - p99 / p50) < 1e-2
        assert abs(row.p90_over_p50 - p90 / p50) < 1e-2
        assert row.long_tailed == (p99 / p50 > 10)
        # percentiles are monotone
        assert row.p50 <= row.p90 <= row.p99


def test_profile_drift_cosine_and_tv(spark, sf_dir):
    from polybot_data_etl_spark.operators.timeseries import (
        q_ts_profile_drift,
    )

    evs = [
        (int(r.ts.timestamp()), r.ts.hour)
        for r in table(spark, sf_dir, "events").collect()
    ]
    lo = min(s for s, _ in evs)
    hi = max(s for s, _ in evs)
    halves = [Counter(), Counter()]
    for s, h in evs:
        halves[0 if 2 * s < lo + hi else 1][h] += 1
    tots = [sum(c.values()) for c in halves]
    p1 = {h: round(halves[0].get(h, 0) / tots[0] + 1e-11, 6) for h in range(24)}
    p2 = {h: round(halves[1].get(h, 0) / tots[1] + 1e-11, 6) for h in range(24)}
    dot = sum(p1[h] * p2[h] for h in range(24))
    n1 = sum(v * v for v in p1.values())
    n2 = sum(v * v for v in p2.values())
    l1 = sum(abs(p1[h] - p2[h]) for h in range(24))
    cos = dot / math.sqrt(n1 * n2)
    peak1 = min(h for h in p1 if p1[h] == max(p1.values()))
    peak2 = min(h for h in p2 if p2[h] == max(p2.values()))
    [row] = q_ts_profile_drift(spark, sf_dir).collect()
    assert abs(row.profile_cosine - cos) < 1e-4
    assert abs(row.tv_distance - l1 / 2) < 1e-3
    assert (row.peak_hour_first, row.peak_hour_second) == (peak1, peak2)
    assert row.shape_shift == (row.profile_cosine < 0.999)
    # both are similarity/distance measures with hard bounds
    assert 0 <= row.profile_cosine <= 1 + 1e-9
    assert 0 <= row.tv_distance <= 1 + 1e-9


def test_embed_separation_nearest_centroid(spark, sf_dir):
    from polybot_data_etl_spark.functions.vectors import q_embed_separation

    vecs = []
    for r in table(spark, sf_dir, "embeddings").collect():
        vecs.append((r.vec_id, r.label, [float(x) for x in r.embedding]))
    d = len(vecs[0][2])
    sums = defaultdict(lambda: [0.0] * d)
    counts = Counter()
    for _, lb, v in vecs:
        counts[lb] += 1
        for k in range(d):
            sums[lb][k] += v[k]
    cents = {
        lb: [round(s[k] / counts[lb] + 1e-11, 6) for k in range(d)]
        for lb, s in sums.items()
    }
    cn = {lb: math.sqrt(sum(c * c for c in cs)) for lb, cs in cents.items()}
    per = defaultdict(list)
    for _, lb, v in vecs:
        vn = math.sqrt(sum(x * x for x in v))
        cos = {
            cl: round(
                sum(a * b for a, b in zip(v, cs)) / (vn * cn[cl]) + 1e-11, 6
            )
            for cl, cs in cents.items()
        }
        own = cos[lb]
        other = max(c for cl, c in cos.items() if cl != lb)
        per[lb].append((own, other))
    rows = {r.label: r for r in q_embed_separation(spark, sf_dir).collect()}
    assert set(rows) == set(per)
    for lb, pairs in per.items():
        row = rows[lb]
        n = len(pairs)
        assert row.n_vectors == n
        assert abs(row.mean_cos_own - sum(o for o, _ in pairs) / n) < 1e-3
        assert abs(
            row.mean_margin - sum(o - b for o, b in pairs) / n
        ) < 1e-3
        frac = sum(1 for o, b in pairs if o > b) / n
        assert abs(row.frac_separated - frac) < 1e-3
        assert row.classes_separable == (frac > 0.5)
        assert -1 <= row.mean_cos_own <= 1 + 1e-9


def test_fertility_char_token_ratios(spark, sf_dir):
    from polybot_data_etl_spark.functions.quality import q_text_fertility

    per = defaultdict(lambda: [0, 0, 0])
    tot_tok = tot_char = 0
    for r in table(spark, sf_dir, "documents").collect():
        toks = [t for t in r.text.lower().split(" ") if t]
        chars = len(r.text.replace(" ", ""))
        c = per[r.lang]
        c[0] += 1
        c[1] += len(toks)
        c[2] += chars
        tot_tok += len(toks)
        tot_char += chars
    corpus_cpt = tot_char / tot_tok
    rows = {r.lang: r for r in q_text_fertility(spark, sf_dir).collect()}
    assert set(rows) == set(per)
    for lang, (nd, nt, nc) in per.items():
        row = rows[lang]
        assert (row.n_docs, row.n_tokens, row.n_chars) == (nd, nt, nc)
        assert abs(row.chars_per_token - nc / nt) < 1e-3
        assert abs(row.tokens_per_doc - nt / nd) < 1e-3
        assert row.high_fertility == (nc / nt > 1.2 * corpus_cpt)


def test_decimal_profile_terminal_digits(spark, sf_dir):
    from polybot_data_etl_spark.functions.dq import q_dq_decimal_profile

    per = defaultdict(list)
    for r in table(spark, sf_dir, "events").collect():
        per[r.event_type].append(round(r.value * 100))
    rows = {r.event_type: r for r in q_dq_decimal_profile(spark, sf_dir).collect()}
    for et, cents in per.items():
        n = len(cents)
        whole = sum(1 for c in cents if c % 100 == 0)
        dime = sum(1 for c in cents if c % 10 == 0 and c % 100 != 0)
        nn = sum(1 for c in cents if c % 100 == 99)
        row = rows[et]
        assert row.n == n
        assert abs(row.share_whole - whole / n) < 1e-3
        assert abs(row.share_dime - dime / n) < 1e-3
        assert abs(row.share_99 - nn / n) < 1e-3
        assert abs(row.whole_vs_uniform - (whole / n) / 0.01) < 1e-1
        assert row.rounding_spike == (whole / n > 0.05)
        # the three shares never overlap, so they sum to at most 1
        assert row.share_whole + row.share_dime + row.share_99 <= 1 + 1e-9


def test_incidents_gaps_and_islands(spark, sf_dir):
    from polybot_data_etl_spark.operators.timeseries import q_ts_incidents

    hourly = defaultdict(lambda: [0, 0])
    for r in table(spark, sf_dir, "events").collect():
        h = int(r.ts.replace(minute=0, second=0, microsecond=0).timestamp()) // 3600
        hourly[h][0] += 1
        hourly[h][1] += r.event_type == "error"
    slo = sum(e for _, (_, e) in [(k, v) for k, v in hourly.items()]) / sum(
        v[0] for v in hourly.values()
    )
    alert = sorted(h for h, (ev, er) in hourly.items() if er / ev > 1.2 * slo)
    incidents = []
    for h in alert:
        if incidents and h == incidents[-1][1] + 1:
            incidents[-1][1] = h
        else:
            incidents.append([h, h])
    durs = [b - a + 1 for a, b in incidents]
    [row] = q_ts_incidents(spark, sf_dir).collect()
    assert row.n_incidents == len(incidents)
    assert row.alert_hours == sum(durs)
    assert row.longest_hours == (max(durs) if durs else 0)
    if durs:
        assert abs(row.mean_hours - sum(durs) / len(durs)) < 1e-3
        assert row.sustained_incident == (max(durs) >= 3)
    # island identity: incidents can never exceed alert hours
    assert row.n_incidents <= row.alert_hours


def test_abc_cumulative_classes(spark, sf_dir):
    from polybot_data_etl_spark.operators.aggregates import q_agg_abc

    cents = defaultdict(int)
    for r in table(spark, sf_dir, "lineitem").collect():
        cents[r.l_partkey] += round(r.l_extendedprice * 100)
    parts = sorted(cents.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(cents.values())
    cum = 0
    cls = defaultdict(lambda: [0, 0])
    for pk, c in parts:
        cum += c
        k = "A" if cum <= 0.8 * total else "B" if cum <= 0.95 * total else "C"
        cls[k][0] += 1
        cls[k][1] += c
    rows = {r.abc_class: r for r in q_agg_abc(spark, sf_dir).collect()}
    assert set(rows) == set(cls)
    all_parts = len(parts)
    for k, (n, c) in cls.items():
        row = rows[k]
        assert row.n_parts == n
        assert abs(row.parts_share - n / all_parts) < 1e-3
        assert abs(row.revenue - c / 100.0) < 1e-6
        assert abs(row.revenue_share - c / total) < 1e-3
    # ABC sanity: A holds ≥ its parts share in revenue
    if "A" in rows and "C" in rows:
        assert rows["A"].revenue_share >= rows["A"].parts_share
        assert rows["C"].revenue_share <= rows["C"].parts_share


def test_lead_time_day_arithmetic(spark, sf_dir):
    from polybot_data_etl_spark.operators.joins import q_join_lead_time

    orders = {
        r.o_orderkey: (r.o_orderpriority, r.o_orderdate)
        for r in table(spark, sf_dir, "orders").collect()
    }
    ships = defaultdict(list)
    for r in table(spark, sf_dir, "lineitem").collect():
        if r.l_orderkey in orders:
            ships[r.l_orderkey].append(r.l_shipdate)
    per = defaultdict(list)
    for ok, ss in ships.items():
        prio, od = orders[ok]
        od_d = od.date() if hasattr(od, "date") else od
        fl = min((s.date() if hasattr(s, "date") else s) for s in ss)
        ll = max((s.date() if hasattr(s, "date") else s) for s in ss)
        per[prio].append(((fl - od_d).days, (ll - od_d).days))
    def qc(xs, p):
        xs = sorted(xs)
        pos = p * (len(xs) - 1)
        lo = int(math.floor(pos))
        frac = pos - lo
        return xs[lo] + frac * (xs[lo + 1] - xs[lo]) if lo + 1 < len(xs) else xs[lo]
    rows = {r.o_orderpriority: r for r in q_join_lead_time(spark, sf_dir).collect()}
    assert set(rows) == set(per)
    for prio, leads in per.items():
        row = rows[prio]
        n = len(leads)
        assert row.n_orders == n
        assert abs(row.avg_first_ship_days - sum(f for f, _ in leads) / n) < 1e-2
        assert abs(row.avg_complete_days - sum(l for _, l in leads) / n) < 1e-2
        assert abs(row.p90_complete_days - qc([l for _, l in leads], 0.9)) < 1e-2
        late = sum(1 for _, l in leads if l > 90) / n
        assert abs(row.late_share - late) < 1e-3
        # completion can never precede first shipment
        assert row.avg_complete_days >= row.avg_first_ship_days - 1e-9


def test_neyman_largest_remainder(spark, sf_dir):
    from polybot_data_etl_spark.operators.relational_ext import (
        _NEYMAN_N,
        q_sample_neyman,
    )

    per = defaultdict(list)
    for r in table(spark, sf_dir, "events").collect():
        per[r.event_type].append(r.value)
    stats = {}
    for et, xs in per.items():
        n = len(xs)
        mu = sum(xs) / n
        sigma = round(
            math.sqrt(sum(x * x for x in xs) / n - mu * mu) + 1e-11, 6
        )
        stats[et] = (n, sigma)
    wtot = sum(n * s for n, s in stats.values())
    ntot = sum(n for n, _ in stats.values())
    quotas = {et: _NEYMAN_N * n * s / wtot for et, (n, s) in stats.items()}
    base = {et: math.floor(q) for et, q in quotas.items()}
    rems = sorted(
        ((round(quotas[et] - base[et] + 1e-11, 6), et) for et in stats),
        key=lambda t: (-t[0], t[1]),
    )
    leftover = _NEYMAN_N - sum(base.values())
    ney = dict(base)
    for _, et in rems[: int(leftover)]:
        ney[et] += 1
    rows = {r.event_type: r for r in q_sample_neyman(spark, sf_dir).collect()}
    assert set(rows) == set(stats)
    assert sum(r.neyman_n for r in rows.values()) == _NEYMAN_N
    for et, (n, s) in stats.items():
        row = rows[et]
        assert row.n_stratum == n
        assert abs(row.sigma - s) < 1e-3
        assert row.neyman_n == ney[et]
        assert row.proportional_n == round(_NEYMAN_N * n / ntot)
        assert row.oversampled == (row.neyman_n > row.proportional_n)


def test_twap_hold_time_weighting(spark, sf_dir):
    from polybot_data_etl_spark.operators.timeseries import q_ts_twap

    per_user = defaultdict(list)
    for r in table(spark, sf_dir, "events").collect():
        per_user[r.user_id].append(
            (r.ts, r.event_id, r.event_type, r.value)
        )
    stats = defaultdict(lambda: [0, 0, 0.0, 0.0, 0])
    for evs in per_user.values():
        evs.sort(key=lambda t: (t[0], t[1]))
        for i, (ts, _, et, v) in enumerate(evs):
            c = stats[et]
            c[4] += 1
            c[3] += v
            if i + 1 < len(evs):
                dt = int(evs[i + 1][0].timestamp()) - int(ts.timestamp())
                c[0] += 1
                c[1] += dt
                c[2] += v * dt
    rows = {r.event_type: r for r in q_ts_twap(spark, sf_dir).collect()}
    assert set(rows) == set(stats)
    for et, (n, tt, vw, vs, n_all) in stats.items():
        row = rows[et]
        twap = vw / tt
        avg = vs / n_all
        assert row.n_intervals == n
        assert abs(row.twap - twap) < 1e-2
        assert abs(row.plain_avg - avg) < 1e-2
        assert abs(row.twap_vs_avg - (twap - avg) / avg) < 1e-3
        assert row.sampling_biased == (abs(row.twap_vs_avg) > 0.05)


def test_influence_loo_identity(spark, sf_dir):
    from polybot_data_etl_spark.functions.stats import q_stats_influence

    per = defaultdict(list)
    for r in table(spark, sf_dir, "events").collect():
        per[r.event_type].append(r.value)
    rows = {r.event_type: r for r in q_stats_influence(spark, sf_dir).collect()}
    for et, xs in per.items():
        n, s, mx = len(xs), sum(xs), max(xs)
        row = rows[et]
        assert row.n == n
        assert abs(row.mean - s / n) < 1e-2
        assert abs(row.mean_without_max - (s - mx) / (n - 1)) < 1e-2
        # exact LOO identity recomputed the slow way: drop ONE max
        rest = sorted(xs)[:-1]
        slow = sum(rest) / len(rest)
        assert abs(row.mean_without_max - slow) < 1e-3
        assert abs(row.max_influence - (s / n - slow) / (s / n)) < 1e-4
        assert abs(row.top1_share - mx / s) < 1e-4
        assert row.whale_fragile == (row.top1_share > 0.01)
        # removing the max can only lower the mean
        assert row.mean_without_max <= row.mean + 1e-9


def test_centralization_freeman_formula(spark, sf_dir):
    from polybot_data_etl_spark.operators.graph import q_graph_centralization

    by_order = defaultdict(set)
    for r in table(spark, sf_dir, "lineitem").collect():
        if r.l_partkey % 4 == 0:
            by_order[r.l_orderkey].add(r.l_partkey)
    deg = Counter()
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    n = len(deg)
    dmax = max(deg.values())
    gap = sum(dmax - d for d in deg.values())
    cent = gap / ((n - 1) * (n - 2))
    [row] = q_graph_centralization(spark, sf_dir).collect()
    assert (row.n_nodes, row.max_degree) == (n, dmax)
    assert abs(row.mean_degree - sum(deg.values()) / n) < 1e-3
    assert abs(row.centralization - cent) < 1e-5
    assert row.hub_dominated == (cent > 0.1)
    assert 0 <= row.centralization <= 1 + 1e-9


def test_multimodal_mix_byte_accounting(spark, sf_dir):
    from polybot_data_etl_spark.functions.multimodal import q_multimodal_mix

    per = defaultdict(lambda: [0, 0, 0])
    for r in table(spark, sf_dir, "documents").collect():
        mod = ["image", "audio", "video"][r.doc_id % 3]
        c = per[mod]
        nb = len(r.text)
        c[0] += 1
        c[1] += nb
        c[2] = max(c[2], nb)
    nt = sum(c[0] for c in per.values())
    bt = sum(c[1] for c in per.values())
    rows = {r.modality: r for r in q_multimodal_mix(spark, sf_dir).collect()}
    assert set(rows) == set(per)
    for mod, (n, b, mx) in per.items():
        row = rows[mod]
        assert (row.n_assets, row.total_bytes, row.max_bytes) == (n, b, mx)
        assert abs(row.avg_bytes - b / n) < 1e-2
        assert abs(row.asset_share - n / nt) < 1e-3
        assert abs(row.byte_share - b / bt) < 1e-3
        assert row.storage_heavy == (b / bt > 2 * n / nt)
    assert abs(sum(r.asset_share for r in rows.values()) - 1.0) < 1e-2


def test_overlap_histogram_intersection(spark, sf_dir):
    from polybot_data_etl_spark.functions.stats import (
        _OVL_BINS,
        q_stats_overlap,
    )

    a, b = [], []
    for r in table(spark, sf_dir, "events").collect():
        if r.event_type == "click":
            a.append(r.value)
        elif r.event_type == "view":
            b.append(r.value)
    lo = min(min(a), min(b))
    hi = max(max(a), max(b))
    width = (hi - lo) / _OVL_BINS
    ca, cb = Counter(), Counter()
    for x in a:
        ca[min(int((x - lo) // width), _OVL_BINS - 1)] += 1
    for x in b:
        cb[min(int((x - lo) // width), _OVL_BINS - 1)] += 1
    ovl = sum(
        min(ca.get(i, 0) / len(a), cb.get(i, 0) / len(b))
        for i in range(_OVL_BINS)
    )
    [row] = q_stats_overlap(spark, sf_dir).collect()
    assert (row.n_click, row.n_view) == (len(a), len(b))
    assert abs(row.overlap_coef - ovl) < 1e-3
    assert abs(row.separation - (1 - ovl)) < 1e-3
    assert row.distributions_similar == (row.overlap_coef > 0.9)
    assert 0 <= row.overlap_coef <= 1 + 1e-9


def test_dod_wow_lag_spine(spark, sf_dir):
    from polybot_data_etl_spark.operators.timeseries import q_ts_dod_wow

    daily = Counter()
    for r in table(spark, sf_dir, "events").collect():
        daily[r.ts.date()] += 1
    days = sorted(daily)
    rows = {r.day.date(): r for r in q_ts_dod_wow(spark, sf_dir).collect()}
    expect_days = [d for i, d in enumerate(days) if i >= 7]
    assert sorted(rows) == expect_days
    for i, d in enumerate(days):
        if i < 7:
            continue
        n, d1, d7 = daily[d], daily[days[i - 1]], daily[days[i - 7]]
        row = rows[d]
        assert row.n_events == n
        assert abs(row.dod_pct - (n - d1) * 100 / d1) < 1e-2
        assert abs(row.wow_pct - (n - d7) * 100 / d7) < 1e-2
        assert row.wow_smoother == (
            abs(n - d7) * 100 / d7 < abs(n - d1) * 100 / d1
        )
