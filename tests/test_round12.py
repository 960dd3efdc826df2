"""Round-12 pins: memoized bucket-bound literals (VERDICT r11 §wrong
#4 / §next #4), the registered corpus-scale LSH twins (§next #2), and
the simhash combinatorial flip's plan shape (§next #1)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def _job_count(spark, action) -> int:
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    action()
    after = set(tracker.getJobIdsForGroup(None) or [])
    return len(after - before)


def test_flipped_plan_bounds_memoized(spark, sf_dir):
    """VERDICT r11 §next #4 'Done' criterion: the second `queries()`
    build of each flipped name issues NO new Spark job — the
    build-time quantile pass (measured 4-7 s cold at sf0.1 across the
    four) runs once per (session, sf_dir, n_buckets) and later plan
    constructions re-use the cut-point literals."""
    from polybot_data_etl_spark.plans.bounds import clear_bounds_cache
    from polybot_data_etl_spark.registry import queries

    q = queries()
    names = ("q_dq_rle", "q_dq_id_gaps", "q_agg_rfm", "q_win_dist")
    clear_bounds_cache()
    for name in names:
        cold = _job_count(spark, lambda: q[name](spark, sf_dir))
        assert cold >= 1, (name, "first build must run the sampling job")
        warm = _job_count(spark, lambda: q[name](spark, sf_dir))
        assert warm == 0, (name, "second build must be job-free")


def test_bounds_memo_keys_isolate(spark, sf_dir, tmp_path):
    """Different (sf_dir, n_buckets) keys must not share cut points:
    a fixture swap or a bucket-count change re-samples; the same key
    re-uses.  Also pins the dead-session eviction sweep."""
    from polybot_data_etl_spark.plans import bounds as B

    B.clear_bounds_cache()
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return [1.0, 2.0]

    v1 = B.memoized_bounds(spark, ("k", str(tmp_path), 32), compute)
    v2 = B.memoized_bounds(spark, ("k", str(tmp_path), 32), compute)
    assert v1 == v2 == [1.0, 2.0] and calls["n"] == 1
    B.memoized_bounds(spark, ("k", str(tmp_path), 16), compute)
    assert calls["n"] == 2
    # a foreign (dead) session's entry is swept on the next insert
    with B._LOCK:
        B._CACHE[("dead-app", "k", "x", 8)] = [9.9]
    B.memoized_bounds(spark, ("k2", str(tmp_path), 32), compute)
    with B._LOCK:
        assert ("dead-app", "k", "x", 8) not in B._CACHE
    B.clear_bounds_cache()


def test_flipped_plans_still_match_demoted_after_memo(spark, sf_dir):
    """The memo must be value-transparent: the registered bucketed
    plans (second build — warm cache) still equal their demoted
    global-window witnesses."""
    from polybot_data_etl_spark.functions.dq import (
        id_gaps_global,
        rle_profile_global,
    )
    from polybot_data_etl_spark.registry import queries

    q = queries()
    for name, witness in (
        ("q_dq_rle", rle_profile_global),
        ("q_dq_id_gaps", id_gaps_global),
    ):
        got = sorted(map(tuple, q[name](spark, sf_dir).collect()))
        want = sorted(map(tuple, witness(spark, sf_dir).collect()))
        assert got == want, name


def test_embed_scaled_registered_is_8bit_build(spark, sf_dir):
    """q_dedup_embed_scaled (registered, r12) IS the 8-bit
    `_build_embed_pairs` the round-11 dial pinned: subset of the 4-bit
    output with the recall floor, now as a driver-checkable query."""
    from polybot_data_etl_spark.functions.dedup import (
        clear_pair_cache,
        q_dedup_embed,
        q_dedup_embed_scaled,
    )

    clear_pair_cache()
    scaled = {
        (r.a_id, r.b_id, r.sim)
        for r in q_dedup_embed_scaled(spark, sf_dir).collect()
    }
    reg = {
        (r.a_id, r.b_id, r.sim) for r in q_dedup_embed(spark, sf_dir).collect()
    }
    assert reg and scaled <= reg
    assert len(scaled) >= 0.4 * len(reg), (len(scaled), len(reg))


def test_topk_lsh_scaled_candidates_finer(spark, sf_dir):
    """q_sim_topk_lsh_scaled must emit per-probe neighbor lists from a
    strictly finer bucket space: per-band candidate mass at 8 bits is
    a fraction of the 4-bit mass (the quadratic term the ×100 point
    measured), while the probe set and k are unchanged."""
    from polybot_data_etl_spark.catalog import table
    from polybot_data_etl_spark.functions.dedup import hyperplane_buckets
    from polybot_data_etl_spark.functions.vectors import (
        q_sim_topk_lsh,
        q_sim_topk_lsh_scaled,
    )

    base = q_sim_topk_lsh(spark, sf_dir).collect()
    scaled = q_sim_topk_lsh_scaled(spark, sf_dir).collect()
    assert scaled, "scaled ANN must return neighbors on the fixture"
    # same probe universe, k cap respected
    assert {r.probe_id for r in scaled} <= {r.probe_id for r in base}
    per_probe = pd.Series([r.probe_id for r in scaled]).value_counts()
    assert per_probe.max() <= 5

    def mass(bits):
        bk = hyperplane_buckets(table(spark, sf_dir, "embeddings"), 4, bits)
        row = (
            bk.groupBy("band", "bucket")
            .agg(F.count("*").alias("n"))
            .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("m"))
            .first()
        )
        return int(row["m"] or 0)

    assert mass(8) * 4 < mass(4)


def test_simhash_registered_plan_is_combinatorial(spark, sf_dir):
    """Plan-shape pin for the r12 flip: the registered q_dedup_simhash
    explodes 20 band keys (C(6,3) block subsets), not 4 — the 2¹⁶→~2³²
    band-space move that kills the measured ×67.6 crowding term."""
    from polybot_data_etl_spark.registry import queries

    df = queries()["q_dedup_simhash"](spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    # the classic form's 4-element posexplode array carries bare band
    # columns; the combinatorial form's 20-element array is built from
    # shifted block arithmetic
    assert "shiftrightunsigned" in plan
    assert plan.count("shiftleft") >= 3  # fp64 reassembly present


def test_hubness_range_guard_trips_before_int64_wrap(spark, tmp_path):
    """ADVICE r11 #1: the |round(sim)·1e4| < 2²² guard must run on the
    FLOAT product.  With |raw·1e4| ≥ 2⁶³ the float→int64 cast wraps to
    int64 min (whose np.abs is still negative), so a post-cast guard
    was silently bypassed and garbage neighbor keys flowed on.  Both
    the wrap regime (values so large the cast overflows) and the
    plain out-of-range regime must raise the documented RuntimeError."""
    from polybot_data_etl_spark.functions.vectors import q_embed_hubness

    for scale, regime in ((1e17, "int64-wrap"), (1e3, "out-of-range")):
        d = tmp_path / regime
        d.mkdir()
        emb = [
            (np.ones(64, dtype=np.float64) * scale).astype(np.float32)
            for _ in range(3)
        ]
        pd.DataFrame(
            {
                "vec_id": np.arange(1, 4, dtype=np.int64),
                "embedding": emb,
                "label": np.zeros(3, dtype=np.int32),
            }
        ).to_parquet(d / "embeddings.parquet", index=False)
        # the RuntimeError raised in the executor kernel surfaces
        # driver-side wrapped as a PySpark PythonException
        with pytest.raises(Exception, match="composite-key bounds"):
            q_embed_hubness(spark, str(d)).collect()


def test_simhash_wide_twin_exactness_on_controlled_corpus(spark, tmp_path):
    """VERDICT r11 #5, exactness half: on a controlled corpus (base
    docs + exact copies + 1-word-changed copies + every-3rd-word-
    changed copies) the wide twin's emitted set must EQUAL the
    brute-force prediction from its own fingerprints — {pairs with
    Hamming ≤ 7/128 that agree on ≥ 1 of the 4 32-bit bands} — with
    exact copies present at Hamming 0.  This is the pair-layer oracle
    the width twin can't get from DuckDB (test-only semantic)."""
    import itertools

    from polybot_data_etl_spark.catalog import table
    from polybot_data_etl_spark.functions.dedup import (
        _SIMHASH_WIDE_BANDS,
        _WIDE_HAMMING_MAX,
        simhash_bands,
        simhash_pairs_wide,
    )

    rng = np.random.default_rng(12)
    vocab = [f"w{v}" for v in range(500)]
    texts, kinds = [], []
    for b in range(60):
        toks = list(rng.choice(vocab, size=40))
        texts.append(" ".join(toks)); kinds.append("base")
        texts.append(" ".join(toks)); kinds.append("exact")
        light = toks.copy(); light[7] = f"x{b}"
        texts.append(" ".join(light)); kinds.append("light")
        mod = [f"y{b}_{i}" if i % 3 == 0 else t for i, t in enumerate(toks)]
        texts.append(" ".join(mod)); kinds.append("moderate")
    pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)

    got = {
        (r.a_id, r.b_id): r.hamming
        for r in simhash_pairs_wide(spark, str(tmp_path)).collect()
    }
    fp = (
        simhash_bands(
            table(spark, str(tmp_path), "documents"), _SIMHASH_WIDE_BANDS
        )
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    cols = [fp[f"b{i}"].to_numpy() for i in range(_SIMHASH_WIDE_BANDS)]
    want = {}
    for a, b in itertools.combinations(range(len(fp)), 2):
        h = sum(int(c[a] ^ c[b]).bit_count() for c in cols)
        bands_agree = any(
            c0[a] == c0[b] and c1[a] == c1[b]
            for c0, c1 in zip(cols[0::2], cols[1::2])
        )
        if h <= _WIDE_HAMMING_MAX and bands_agree:
            want[(a, b)] = h
    assert got == want
    # every exact-copy pair is present at Hamming 0
    exact_pairs = {(4 * b, 4 * b + 1) for b in range(60)}
    assert exact_pairs <= set(got)
    assert all(got[p] == 0 for p in exact_pairs)


def test_simhash_wide_twin_precision_and_sharper_candidates(spark, sf_dir):
    """VERDICT r11 #5, with the MEASURED correction: the 128-bit width
    twin (8×16-bit columns, 4×32 banding, Hamming ≤ 7 ≈ the 64-bit ≤3
    rate at 2× width) is a PRECISION knob, not a recall knob — ~80% of
    the 64-bit ≤3 contract pairs on the fixture are Binomial lucky
    draws (second-half Hamming ≥ 8, true disagreement rate ~0.1) that
    the wide cut rejects, so the r11-suggested superset pin would be
    wrong.  Pins: (a) the wide cut rejects PART of the contract set
    but keeps its truly-near core; (b) every emitted pair verifies at
    ≤ 7/128; (c) candidate pair mass at 32-bit bands is below the
    16-bit mass (the correlated near-miss pruning the width exists
    for)."""
    from polybot_data_etl_spark.catalog import table
    from polybot_data_etl_spark.functions.dedup import (
        _SIMHASH_BANDS,
        _SIMHASH_BITS,
        _SIMHASH_WIDE_BANDS,
        _WIDE_HAMMING_MAX,
        clear_pair_cache,
        q_dedup_simhash,
        simhash_bands,
        simhash_pairs_wide,
    )

    clear_pair_cache()
    wide = {
        (r.a_id, r.b_id): r.hamming
        for r in simhash_pairs_wide(spark, sf_dir).collect()
    }
    contract = {
        (r.a_id, r.b_id) for r in q_dedup_simhash(spark, sf_dir).collect()
    }
    assert wide and contract
    assert all(h <= _WIDE_HAMMING_MAX for h in wide.values())
    kept = contract & set(wide)
    # the precision claim: a real, non-trivial split of the contract set
    assert kept, "the truly-near core must survive the wide cut"
    assert len(kept) < len(contract), "the wide cut must reject the lucky tail"

    # (c) candidate sharpness: 32-bit bands commit less pair mass
    def mass(n_bands, keys_of):
        fp = simhash_bands(table(spark, sf_dir, "documents"), n_bands)
        banded = fp.select(
            "doc_id", F.posexplode(F.array(*keys_of())).alias("band", "value")
        )
        row = (
            banded.groupBy("band", "value")
            .agg(F.count("*").alias("n"))
            .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("m"))
            .first()
        )
        return int(row["m"] or 0)

    m16 = mass(
        _SIMHASH_BANDS,
        lambda: [F.col(f"b{b}") for b in range(_SIMHASH_BANDS)],
    )
    m32 = mass(
        _SIMHASH_WIDE_BANDS,
        lambda: [
            F.col(f"b{2 * m}")
            + F.shiftleft(F.col(f"b{2 * m + 1}"), _SIMHASH_BITS)
            for m in range(_SIMHASH_WIDE_BANDS // 2)
        ],
    )
    assert m32 < m16, (m16, m32)


# --- round-12 optimization pins (plan shrink without value change) -------


def test_simhash_packed_band_keys_equal_column_forms(spark):
    """r12 packing fix: the packed-word band keys must be bit-identical
    to the historical per-column forms for every scheme — posting
    buckets (and so the verified pair sets) then cannot move."""
    import pandas as pd

    from polybot_data_etl_spark.functions.dedup import (
        _SIMHASH_BANDS,
        _SIMHASH_BITS,
        _SIMHASH_WIDE_BANDS,
        _simhash_combinatorial_keys,
        _simhash_pack,
        _simhash_scheme_keys,
    )

    rng = __import__("numpy").random.default_rng(12)
    n = 500
    cols = {"doc_id": range(n)}
    for b in range(_SIMHASH_WIDE_BANDS):
        cols[f"b{b}"] = rng.integers(0, 1 << 16, size=n).tolist()
    fp = spark.createDataFrame(pd.DataFrame(cols))

    # classic + comb read fp0 (4 cols); wide reads fp0/fp1 (8 cols)
    for scheme, n_cols, legacy in (
        (
            "classic",
            _SIMHASH_BANDS,
            [F.col(f"b{m}") for m in range(_SIMHASH_BANDS)],
        ),
        ("comb", _SIMHASH_BANDS, _simhash_combinatorial_keys()),
        (
            "wide",
            _SIMHASH_WIDE_BANDS,
            [
                F.col(f"b{2 * m}")
                + F.shiftleft(F.col(f"b{2 * m + 1}"), _SIMHASH_BITS)
                for m in range(_SIMHASH_WIDE_BANDS // 2)
            ],
        ),
    ):
        packed = fp.select("doc_id", *_simhash_pack(n_cols)).select(
            "doc_id", F.array(*_simhash_scheme_keys(scheme, n_cols)).alias("k")
        )
        col_form = fp.select("doc_id", F.array(*legacy).alias("k"))
        a = {r.doc_id: r.k for r in packed.collect()}
        b = {r.doc_id: r.k for r in col_form.collect()}
        assert a == b, scheme


def test_fused_bucketed_plans_are_single_scan(spark, sf_dir):
    """r12 fusion pins: the rle / id_gaps registered plans must keep
    their fused one-scan shape (the pre-r12 forms scanned the fact
    table 2-3x; a revert reads as a silent 2x scan regression)."""
    from polybot_data_etl_spark.registry import queries

    qs = queries()
    for name in ("q_dq_rle", "q_dq_id_gaps"):
        df = qs[name](spark, sf_dir)
        mode = (
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        plan = df._jdf.queryExecution().explainString(mode)
        # formatted explain prints each scan twice (tree line + the
        # numbered detail block), so ONE physical scan == 2 mentions
        assert plan.count("Scan parquet") == 2, (
            name,
            plan.count("Scan parquet"),
        )


def test_cross_source_diagonal_equals_size(spark, tmp_path):
    """r12 cross_source rewrite: n_b must still be B's distinct
    df-shingle count (now read off the pair-matrix diagonal instead of
    a second scan) — pinned on a controlled 2-source corpus where the
    truth is countable by hand."""
    import pandas as pd

    from polybot_data_etl_spark.functions.dedup import q_dedup_cross_source

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "source": ["A", "A", "B"],
            # B's text is a subset of doc 1's shingles
            "text": [
                "w x y z q r",   # shingles: wxy xyz yzq zqr
                "a b c d",       # abc bcd
                "w x y z",       # wxy xyz  (both also in A)
            ],
            "lang": ["en"] * 3,
            "n_chars": [11, 7, 7],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    rows = {
        (r.src_a, r.src_b): (r.shared_shingles, r.n_b, r.containment)
        for r in q_dedup_cross_source(spark, str(tmp_path)).collect()
    }
    # A has 6 distinct shingles, B has 2, both of B's occur in A
    assert rows[("A", "B")] == (2, 2, 1.0)
    assert rows[("B", "A")][0] == 2 and rows[("B", "A")][1] == 6
