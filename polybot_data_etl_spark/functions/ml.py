"""ML-inference-in-SQL operators: a trained model applied as fused
relational expressions — logistic scoring, k-NN classification, and
feature hashing.

Reference provenance: PAPERS.md:9 (ICDE'25, ML-inference-in-SQL via
operator fusion) is the driver-retrieved design source: inference
becomes ordinary Catalyst expressions inlined into the scan projection
(no UDF, no model server), so whole-stage codegen fuses
feature-engineering + model math into one pass. Surface is [DES] per
SURVEY.md §2.

Scale posture (100 TB): q_ml_score is a ZERO-shuffle narrow projection
(the model is literal constants in the plan). q_ml_knn reuses the
bounded-probe brute-force k-NN shape (broadcast probes; the scale path
swaps in the LSH/IVF candidate generators of functions/vectors.py
unchanged). q_ml_hashing is explode + one map-side-combined hash agg
keyed by (doc, bucket) — the hashing trick's whole point is the fixed
bucket domain, so downstream width is constant regardless of
vocabulary size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table
from polybot_data_etl_spark.registry import register

# Logistic-regression weights (a "trained" model shipped as constants;
# e-notation in SQL keeps every literal DOUBLE in DuckDB).
_W_NTOK = 0.8       # tokens / 100
_W_STOP = -1.2      # stopword ratio
_W_WLEN = 0.5       # mean word length / 8
_B = -0.3


@register(
    "q_ml_score",
    oracle=f"""
    SELECT doc_id,
           round(1e0 / (1e0 + exp(-(
               {_W_NTOK} * (n_tok / 1e2)
               + {_W_STOP} * (stop_cnt / CAST(n_tok AS DOUBLE))
               + {_W_WLEN} * (n_char / CAST(n_tok AS DOUBLE) / 8e0)
               + ({_B})))) + 1e-9, 4) AS score,
           CAST(1e0 / (1e0 + exp(-(
               {_W_NTOK} * (n_tok / 1e2)
               + {_W_STOP} * (stop_cnt / CAST(n_tok AS DOUBLE))
               + {_W_WLEN} * (n_char / CAST(n_tok AS DOUBLE) / 8e0)
               + ({_B})))) >= 5e-1 AS BOOLEAN) AS positive
    FROM (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tok,
               len(list_filter(string_split(text, ' '),
                               t -> t IN ('a', 'the'))) AS stop_cnt,
               length(replace(text, ' ', '')) AS n_char
        FROM documents
    )
    """,
)
def q_ml_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic-regression inference fused into the scan projection:
    engineered features (token count, stopword ratio, mean word
    length) → w·x + b → sigmoid, all as Catalyst expressions (the
    ICDE'25 inference-as-SQL shape, PAPERS.md:9) — model weights are
    plan literals, so whole-stage codegen emits ONE fused loop and the
    optimizer can push the `positive` predicate into the scan when a
    downstream filter uses it."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    stop_cnt = F.size(F.filter(toks, lambda t: t.isin("a", "the")))
    n_char = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    z = (
        F.lit(_W_NTOK) * (n_tok / F.lit(100.0))
        + F.lit(_W_STOP) * (stop_cnt / n_tok.cast("double"))
        + F.lit(_W_WLEN) * (n_char / n_tok.cast("double") / F.lit(8.0))
        + F.lit(_B)
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return d.select(
        "doc_id",
        F.round(score + F.lit(1e-9), 4).alias("score"),
        (score >= 0.5).alias("positive"),
    )


_KNN_PROBES = 20
_KNN_K = 5


@register(
    "q_ml_knn",
    oracle=f"""
    WITH nn AS (
        SELECT a.vec_id AS probe_id, b.label,
               round(list_inner_product(a.embedding::DOUBLE[],
                                        b.embedding::DOUBLE[]), 4) AS sim
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        WHERE a.vec_id < {_KNN_PROBES}
        QUALIFY row_number() OVER (
            PARTITION BY a.vec_id
            ORDER BY round(list_inner_product(a.embedding::DOUBLE[],
                                              b.embedding::DOUBLE[]), 4)
                     DESC,
                     b.vec_id
        ) <= {_KNN_K}
    )
    SELECT probe_id, label AS pred_label,
           cast(votes AS BIGINT) AS votes
    FROM (
        SELECT probe_id, label, count(*) AS votes
        FROM nn GROUP BY probe_id, label
    )
    QUALIFY row_number() OVER (
        PARTITION BY probe_id ORDER BY votes DESC, label
    ) = 1
    """,
)
def q_ml_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification: 5 nearest neighbors per probe vector by
    rounded cosine (id tiebreak), majority vote on the neighbor labels
    (smallest label wins ties) — the lazy-learner classifier on top of
    the similarity-search kernel.

    Shape: broadcast the bounded probe set, rank candidates with the
    same (rounded sim, id) window as q_sim_topk, then a tiny two-level
    vote agg. The 100 TB path swaps brute-force candidates for the
    LSH-bucketed or IVF generators (vectors.py) — the vote stage is
    unchanged."""
    e = table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < _KNN_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("emb_p")
    )
    cands = e.select(
        F.col("vec_id").alias("cand_id"), "label",
        F.col("embedding").alias("emb_n"),
    )
    from polybot_data_etl_spark.functions.vectors import dot

    scored = (
        F.broadcast(probes)
        .crossJoin(cands)
        .filter(F.col("probe_id") != F.col("cand_id"))
        .withColumn(
            "sim", F.round(dot(F.col("emb_p"), F.col("emb_n")), 4)
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("sim"), F.asc("cand_id")
    )
    nn = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _KNN_K
    )
    votes = nn.groupBy("probe_id", "label").agg(
        F.count("*").alias("votes")
    )
    wv = Window.partitionBy("probe_id").orderBy(
        F.desc("votes"), F.asc("label")
    )
    return (
        votes.withColumn("rk", F.row_number().over(wv))
        .filter(F.col("rk") == 1)
        .select(
            "probe_id",
            F.col("label").alias("pred_label"),
            F.col("votes").cast("bigint").alias("votes"),
        )
    )


_HASH_BUCKETS = 64


@register(
    "q_ml_hashing",
    oracle=f"""
    SELECT doc_id,
           list_reduce(list_transform(string_split(t, ''),
                                      c -> ascii(c)::BIGINT),
                       (a, x) -> (a * 31 + x) % 1000000007)
               % {_HASH_BUCKETS} AS bucket,
           cast(count(*) AS BIGINT) AS cnt
    FROM (
        SELECT doc_id, unnest(list_filter(
                   string_split(lower(text), ' '), t -> t <> '')) AS t
        FROM documents
        WHERE doc_id < 100
    )
    GROUP BY doc_id, bucket
    """,
)
def q_ml_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the hashing trick, Weinberger et al. 2009):
    token → portable char-hash → bucket in a fixed 64-slot domain,
    per-document bucket counts in long form (doc_id, bucket, cnt) —
    the constant-width bag-of-words featurizer that never needs a
    vocabulary pass.

    Shape: explode + ONE map-side-combined hash agg on
    (doc_id, bucket); the fixed bucket domain bounds output width at
    any corpus size. The portable polynomial hash is the same family
    as the dedup fingerprints (functions/dedup.py char_hash), so both
    engines bucket identically."""
    from polybot_data_etl_spark.functions.dedup import all_tokens, char_hash

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    ex = d.select(
        "doc_id", F.explode(all_tokens()).alias("t")
    )
    return (
        ex.select(
            "doc_id",
            (char_hash(F.col("t")) % _HASH_BUCKETS).alias("bucket"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
