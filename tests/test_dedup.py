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
