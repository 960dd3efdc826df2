"""Text analysis / LLM-data-pipeline operators over the documents corpus
(SURVEY.md §2 #53-57): tokenization, corpus stats, lexicon scoring,
language heuristics, exact + MinHash-LSH near-duplicate detection.

Reference provenance: the processor/transform stages of the reference's
social-text ETL [REC src/etl/.DS_Store:4664,5104]; lexicon scoring follows
the Spark sentiment-pipeline shape (PAPERS.md:5, EDBT'16). The dedup
family is mandated by the driver north star (BASELINE.json:6).

Scale posture: everything is explode → hash-agg (map-side combined).
MinHash-LSH is the 100 TB dedup path: candidate generation is
band-bucketed (no all-pairs), signatures are 64-bit xxhash64 minima
computed in one exploded agg, and only bucket-collided pairs pay the
exact-Jaccard verification join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table
from polybot_data_etl_spark.registry import register

# MinHash parameters: 32 permutations in 8 bands of 4 rows.
# P(candidate) = 1 - (1 - j^4)^8 — ~0.5 crossover near Jaccard 0.55.
_MINHASH_PERMS = 32
_MINHASH_BANDS = 8
_MINHASH_ROWS_PER_BAND = _MINHASH_PERMS // _MINHASH_BANDS
_JACCARD_THRESHOLD = 0.5


def _tokens(col: str = "text"):
    """Whitespace tokens, lowercased (corpus is already space-separated)."""
    return F.split(F.lower(F.col(col)), " ")


@register(
    "q_text_wordcount",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 20
    """,
)
def q_text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + explode + top-N term counts (deterministic tiebreak)."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(_tokens()).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )


@register(
    "q_text_stats",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           round(avg(n_chars), 2) AS avg_chars,
           round(avg(len(string_split(text, ' '))), 2) AS avg_tokens,
           round(avg(length(text)), 2) AS avg_len
    FROM documents
    GROUP BY lang
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics (doc count, chars, token counts)."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.round(F.avg(F.size(F.split(F.col("text"), " "))), 2).alias("avg_tokens"),
        F.round(F.avg(F.length("text")), 2).alias("avg_len"),
    )


@register(
    "q_text_keyword_score",
    oracle="""
    SELECT doc_id,
           (CASE WHEN text LIKE '%join%' THEN 2 ELSE 0 END
            + CASE WHEN text LIKE '%filter%' THEN 1 ELSE 0 END
            + CASE WHEN text LIKE '%window%' THEN 1 ELSE 0 END
            - CASE WHEN text LIKE '%slow%' THEN 2 ELSE 0 END) AS score
    FROM documents
    """,
)
def q_text_keyword_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic lexicon scoring (sentiment-style, PAPERS.md:5 shape)."""
    d = table(spark, sf_dir, "documents")

    def hit(kw: str, weight: int):
        return F.when(F.col("text").contains(kw), weight).otherwise(0)

    score = hit("join", 2) + hit("filter", 1) + hit("window", 1) - hit("slow", 2)
    return d.select("doc_id", score.cast("int").alias("score"))


@register(
    "q_dedup_exact",
    oracle="""
    SELECT min(doc_id) AS doc_id, count(*) AS n_dups
    FROM (SELECT doc_id, lower(trim(text)) AS norm FROM documents)
    GROUP BY norm
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a normalized text key, deterministic survivor
    (min doc_id) — a hash aggregation, not dropDuplicates, so the
    surviving row is engine-independent."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.lower(F.trim(F.col("text"))).alias("norm"))
        .groupBy("norm")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_dups"))
        .select("doc_id", "n_dups")
    )


def minhash_signatures(docs: DataFrame, n_perms: int = _MINHASH_PERMS) -> DataFrame:
    """(doc_id, sig_0..sig_{n-1}): per-doc MinHash signature over 3-token
    shingles.

    One explode + one hash-agg; each "permutation" is xxhash64 with a
    distinct seed column baked into the hashed value. Deterministic
    (fixed seeds, no RNG at runtime).  Shingle construction shared with
    functions/dedup.py (zip_with form: O(tokens) per doc, not the
    O(tokens²) per-index-slice HOF shape).
    """
    from polybot_data_etl_spark.functions.dedup import shingles

    exploded = docs.select(
        "doc_id", F.explode(shingles()).alias("shingle")
    )
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(seed))).alias(f"sig_{seed}")
        for seed in range(n_perms)
    ]
    return exploded.groupBy("doc_id").agg(*aggs)


@register("q_dedup_minhash")  # rows-only: not DuckDB-expressible
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH over 3-token shingles.

    Pipeline (all DataFrame ops, fully distributed):
      shingle → 32 xxhash64-min signatures → 8 band keys →
      band-bucket self-pairing (only docs sharing a band collide) →
      exact Jaccard verification on the candidate pairs.

    Output: (a_id, b_id, jaccard) with a_id < b_id, jaccard rounded 4,
    Jaccard ≥ 0.5. Deterministic: fixed hash seeds, no sampling.
    """
    return minhash_pairs(table(spark, sf_dir, "documents"))


def minhash_pairs(
    d: DataFrame, threshold: float = _JACCARD_THRESHOLD
) -> DataFrame:
    """MinHash-LSH near-dup pairs for any (doc_id, text) DataFrame."""
    sigs = minhash_signatures(d)

    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.hash(
                *[
                    F.col(f"sig_{b * _MINHASH_ROWS_PER_BAND + r}")
                    for r in range(_MINHASH_ROWS_PER_BAND)
                ]
            ).alias("bucket"),
        )
        for b in range(_MINHASH_BANDS)
    ]
    banded = sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket"))

    # Candidate pairs come from per-(band, bucket) posting lists rather
    # than a band self-join: the self-join recomputed the 32-permutation
    # signature stage on both sides, while one groupBy builds each
    # bucket's member list once and a double explode emits its pairs.
    # LSH bucket population is geometric (most buckets are singletons),
    # so the collect_list rows stay small; the cross-band distinct runs
    # on candidate pairs only.
    postings = (
        banded.groupBy("band", "bucket")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    candidates = (
        postings.select(F.explode("ids").alias("a_id"), "ids")
        .select("a_id", F.explode("ids").alias("b_id"))
        .filter(F.col("a_id") < F.col("b_id"))
        .distinct()
    )

    tok = d.select(
        "doc_id", F.explode(F.array_distinct(_tokens())).alias("token")
    )
    ta = tok.select(F.col("doc_id").alias("a_id"), "token")
    tb = tok.select(F.col("doc_id").alias("b_id"), "token")
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n_tok"))

    inter = (
        candidates.join(ta, "a_id")
        .join(tb, ["b_id", "token"])
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc_id": "a_id", "n_tok": "n_a"}), "a_id")
        .join(sizes.withColumnsRenamed({"doc_id": "b_id", "n_tok": "n_b"}), "b_id")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )
