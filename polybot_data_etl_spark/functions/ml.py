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


# Fused scoring model for the evaluation family: a 3-component logistic
# head over the embedding (weights are plan literals, like q_ml_score);
# ground truth is the odd/even label bit.  Scores round to 4 BEFORE any
# thresholding/ranking so both engines binarize and rank identical
# values.
_EVAL_SCORE_SQL = """
    SELECT vec_id,
           (label % 2 = 1) AS truth,
           round(1e0 / (1e0 + exp(-(
               2e0 * embedding[1]::DOUBLE
               + 15e-1 * embedding[2]::DOUBLE
               + embedding[3]::DOUBLE - 1e-1))) + 1e-9, 4) AS score
    FROM embeddings
"""


def _eval_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    z = (
        F.lit(2.0) * F.col("embedding")[0].cast("double")
        + F.lit(1.5) * F.col("embedding")[1].cast("double")
        + F.col("embedding")[2].cast("double")
        - F.lit(0.1)
    )
    return emb.select(
        "vec_id",
        (F.col("label") % 2 == 1).alias("truth"),
        F.round(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) + F.lit(1e-9), 4
        ).alias("score"),
    )


@register(
    "q_ml_confusion",
    oracle=f"""
    WITH s AS ({_EVAL_SCORE_SQL})
    SELECT CAST(sum(CASE WHEN score >= 5e-1 AND truth THEN 1 ELSE 0 END)
                AS BIGINT) AS tp,
           CAST(sum(CASE WHEN score >= 5e-1 AND NOT truth THEN 1 ELSE 0 END)
                AS BIGINT) AS fp,
           CAST(sum(CASE WHEN score < 5e-1 AND truth THEN 1 ELSE 0 END)
                AS BIGINT) AS fn,
           CAST(sum(CASE WHEN score < 5e-1 AND NOT truth THEN 1 ELSE 0 END)
                AS BIGINT) AS tn,
           round(sum(CASE WHEN score >= 5e-1 AND truth THEN 1 ELSE 0 END)
                 * 1e0 / nullif(sum(CASE WHEN score >= 5e-1
                                         THEN 1 ELSE 0 END), 0)
                 + 1e-9, 4) AS precision_,
           round(sum(CASE WHEN score >= 5e-1 AND truth THEN 1 ELSE 0 END)
                 * 1e0 / nullif(sum(CASE WHEN truth THEN 1 ELSE 0 END), 0)
                 + 1e-9, 4) AS recall_,
           round(2e0 * sum(CASE WHEN score >= 5e-1 AND truth
                                THEN 1 ELSE 0 END)
                 / nullif(sum(CASE WHEN score >= 5e-1 THEN 1 ELSE 0 END)
                          + sum(CASE WHEN truth THEN 1 ELSE 0 END), 0)
                 + 1e-9, 4) AS f1
    FROM s
    """,
)
def q_ml_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation: confusion matrix + precision/recall/F1
    for the fused logistic head at threshold 0.5 against the label-bit
    ground truth — the metric readout every model-scoring pipeline ends
    with (q_ml_score's missing second half).

    Shape: the scorer is a zero-shuffle narrow projection (model
    weights are plan literals); the whole evaluation is ONE conditional
    count aggregate collapsing to a single row — counts are exact
    integers, ratios int-over-int doubles, so the output is
    engine-identical at any scale.  F1 computed as 2·tp/(pred_pos +
    actual_pos) — the algebraic form that avoids compounding two
    rounded ratios."""
    s = _eval_scores(spark, sf_dir)
    pred = F.col("score") >= 0.5
    tp = F.sum(F.when(pred & F.col("truth"), 1).otherwise(0))
    fp = F.sum(F.when(pred & ~F.col("truth"), 1).otherwise(0))
    fn = F.sum(F.when(~pred & F.col("truth"), 1).otherwise(0))
    tn = F.sum(F.when(~pred & ~F.col("truth"), 1).otherwise(0))
    agg = s.agg(
        tp.alias("tp"), fp.alias("fp"), fn.alias("fn"), tn.alias("tn")
    )
    p = F.col("tp") / F.nullif(F.col("tp") + F.col("fp"), F.lit(0))
    r = F.col("tp") / F.nullif(F.col("tp") + F.col("fn"), F.lit(0))
    f1 = (
        F.lit(2.0)
        * F.col("tp")
        / F.nullif(
            (F.col("tp") + F.col("fp")) + (F.col("tp") + F.col("fn")),
            F.lit(0),
        )
    )
    return agg.select(
        F.col("tp").cast("bigint").alias("tp"),
        F.col("fp").cast("bigint").alias("fp"),
        F.col("fn").cast("bigint").alias("fn"),
        F.col("tn").cast("bigint").alias("tn"),
        F.round(p + F.lit(1e-9), 4).alias("precision_"),
        F.round(r + F.lit(1e-9), 4).alias("recall_"),
        F.round(f1 + F.lit(1e-9), 4).alias("f1"),
    )


@register(
    "q_ml_auc",
    oracle=f"""
    WITH s AS ({_EVAL_SCORE_SQL}),
    v AS (
        SELECT score, count(*) AS cnt,
               sum(CASE WHEN truth THEN 1 ELSE 0 END) AS cnt_p
        FROM s GROUP BY score
    ),
    r AS (
        SELECT score, cnt, cnt_p,
               sum(cnt) OVER (ORDER BY score
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS cum
        FROM v
    ),
    agg AS (
        SELECT sum(cnt_p) AS np, sum(cnt) - sum(cnt_p) AS nn,
               sum((cum - (cnt - 1) / 2.0) * cnt_p) AS rp
        FROM r
    )
    SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
           round((rp - np * (np + 1) / 2.0) / (np * nn) + 1e-9, 4) AS auc
    FROM agg
    """,
)
def q_ml_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC via the rank-sum identity AUC = U/(n₊·n₋) — the
    probability a random positive outscores a random negative, computed
    WITHOUT materializing the ROC curve: tie-averaged ranks of the
    (rounded) scores, positives' rank sum, Mann-Whitney U
    (q_stats_mannwhitney's machinery pointed at model evaluation).

    Determinism: scores round to 4 before ranking, so the distinct-
    score frame is identical across engines and rank sums are exact
    half-integers (order-independent).  Shape: fact → distinct-score
    frame via one map-side-combined agg (≤10⁴ rows for 4-dp scores —
    bounded by the score grid, not the corpus), ordered prefix over
    that bounded frame, 1-row reduce."""
    from pyspark.sql import Window

    s = _eval_scores(spark, sf_dir)
    v = s.groupBy("score").agg(
        F.count("*").alias("cnt"),
        F.sum(F.when(F.col("truth"), 1).otherwise(0)).alias("cnt_p"),
    )
    # 4-dp scores give a ≤20k-row distinct frame: a single ordered
    # window over it is bounded by the score grid (the two-pass bucket
    # recipe of q_stats_mannwhitney applies unchanged if scores were
    # ranked unrounded)
    w = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = v.withColumn("cum", F.sum("cnt").over(w))
    agg = r.agg(
        F.sum("cnt_p").alias("np"),
        (F.sum("cnt") - F.sum("cnt_p")).alias("nn"),
        F.sum(
            (F.col("cum") - (F.col("cnt") - 1) / 2.0) * F.col("cnt_p")
        ).alias("rp"),
    )
    # try_divide: a single-class sample (n₊ = 0 or n₋ = 0) has no
    # rankable pairs — AUC undefined, NULL not an ANSI crash (r6 audit)
    auc = F.try_divide(
        F.col("rp") - F.col("np") * (F.col("np") + 1) / 2.0,
        F.col("np") * F.col("nn"),
    )
    return agg.select(
        F.col("np").cast("bigint").alias("n_pos"),
        F.col("nn").cast("bigint").alias("n_neg"),
        F.round(auc + F.lit(1e-9), 4).alias("auc"),
    )


@register(
    "q_ml_calibration",
    oracle=f"""
    WITH s AS ({_EVAL_SCORE_SQL})
    SELECT CAST(least(floor(score * 10), 9) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(score) + 1e-9, 4) AS mean_score,
           round(sum(CASE WHEN truth THEN 1 ELSE 0 END) * 1e0 / count(*)
                 + 1e-9, 4) AS pos_rate
    FROM s GROUP BY 1
    """,
)
def q_ml_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration curve: decile buckets of the (rounded) score with
    per-bucket mean prediction vs realized positive rate — how far the
    model's probabilities are from the truth (reliability diagram
    data; a well-calibrated model has mean_score ≈ pos_rate per
    bucket).

    Shape: narrow scorer → ONE hash agg on the 10-value bucket key
    (map-side combined; ≤10 output rows at any corpus size).  Bucket =
    least(floor(score·10), 9) of the 4-dp-rounded score — integer
    bucketing of identical doubles, so bucket membership can't diverge
    across engines; avg(score) averages exact 4-dp values."""
    s = _eval_scores(spark, sf_dir)
    bucket = F.least(F.floor(F.col("score") * 10), F.lit(9)).cast("bigint")
    return (
        s.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("score") + F.lit(1e-9), 4).alias("mean_score"),
            F.round(
                F.sum(F.when(F.col("truth"), 1).otherwise(0))
                / F.count("*")
                + F.lit(1e-9),
                4,
            ).alias("pos_rate"),
        )
    )


@register(
    "q_ml_ndcg",
    oracle="""
    WITH ranked AS (
        SELECT user_id,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS rel,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY value DESC, event_id) AS pos
        FROM events
    ),
    per_user AS (
        SELECT r.user_id,
               sum(CASE WHEN r.pos <= 10
                        THEN r.rel / log2(r.pos + 1) ELSE 0 END) AS dcg,
               sum(r.rel) AS n_rel
        FROM ranked r
        GROUP BY r.user_id
    ),
    scored AS (
        SELECT user_id,
               dcg / list_sum(list_transform(
                   range(1, CAST(least(n_rel, 10) AS INTEGER) + 1),
                   i -> 1.0 / log2(i + 1))) AS ndcg
        FROM per_user
        WHERE n_rel > 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           round(avg(ndcg) + 1e-9, 4) AS mean_ndcg,
           CAST(sum(CASE WHEN ndcg >= 0.999999 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_perfect
    FROM scored
    """,
)
def q_ml_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 — the ranking-quality metric for retrieval/recommender
    evaluation: treat each user's events as a ranked list (by `value`
    desc, event_id tiebreak), relevance = the click bit, and score how
    near the top the clicks land vs the ideal ordering.  Mean NDCG over
    users with ≥1 relevant item, plus the perfect-ranking count.

    Determinism: the ranking key (value DESC, event_id) is total, so
    positions agree across engines; IDCG is evaluated as a SEQUENTIAL
    fold over sequence(1, min(n_rel, 10)) — both engines fold the same
    1/log₂(i+1) terms in the same order, giving bit-identical ideals
    (never a hardcoded lookup that could drift from the formula).

    Scale shape: one window partitioned by user_id (high-cardinality —
    no hot task), one per-user agg fused on the same shuffle
    partitioning (Catalyst reuses the hash exchange), then a 1-row
    reduce; the ≤10-term DCG sums are absorbed by the +1e-9 nudge."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    ranked = e.select(
        "user_id",
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("rel"),
        F.row_number().over(w).alias("pos"),
    )
    per_user = ranked.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("pos") <= 10,
                F.col("rel") / F.log2(F.col("pos") + 1),
            ).otherwise(0.0)
        ).alias("dcg"),
        F.sum("rel").alias("n_rel"),
    )
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.least(F.col("n_rel"), F.lit(10)).cast("int")),
        F.lit(0.0),
        lambda acc, i: acc + F.lit(1.0) / F.log2(i + 1),
    )
    scored = per_user.filter(F.col("n_rel") > 0).select(
        "user_id", (F.col("dcg") / idcg).alias("ndcg")
    )
    return scored.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.round(F.avg("ndcg") + F.lit(1e-9), 4).alias("mean_ndcg"),
        F.sum(F.when(F.col("ndcg") >= 0.999999, 1).otherwise(0))
        .cast("bigint")
        .alias("n_perfect"),
    )


@register(
    "q_ml_pr_curve",
    oracle=f"""
    WITH s AS ({_EVAL_SCORE_SQL}),
    v AS (
        SELECT score, count(*) AS cnt,
               sum(CASE WHEN truth THEN 1 ELSE 0 END) AS cnt_p
        FROM s GROUP BY score
    ),
    tot AS (
        SELECT sum(cnt_p) AS ap FROM v
    ),
    pts AS (
        SELECT t.thr,
               sum(v.cnt) AS pp,
               sum(v.cnt_p) AS tp
        FROM (SELECT unnest([0.0, 0.1, 0.2, 0.3, 0.4, 0.5,
                             0.6, 0.7, 0.8, 0.9]) AS thr) t
        LEFT JOIN v ON v.score >= t.thr
        GROUP BY t.thr
    )
    SELECT round(p.thr, 1) AS threshold,
           CAST(coalesce(p.tp, 0) AS BIGINT) AS tp,
           CAST(coalesce(p.pp, 0) AS BIGINT) AS pred_pos,
           round(coalesce(p.tp, 0) * 1e0 / nullif(p.pp, 0) + 1e-9, 4)
               AS precision_,
           round(coalesce(p.tp, 0) * 1e0 / nullif(tot.ap, 0) + 1e-9, 4)
               AS recall_
    FROM pts p, tot
    """,
)
def q_ml_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-recall curve at a 10-point threshold grid — the
    operating-point sweep between q_ml_confusion's single threshold
    and q_ml_auc's threshold-free summary (pick the deployment
    threshold from this table).

    Shape: the corpus collapses ONCE to the distinct-score frame
    (bounded by the 4-dp score grid, not row count); the threshold
    sweep is a ≤10×|grid| range join on that bounded frame — never a
    second pass over the facts; totals ride along from a 1-row
    aggregate.  Counts are exact integers; ratios int-over-int.
    The grid side is a LEFT join (ADVICE r4): every one of the 10
    thresholds appears even when no score reaches it, which is what
    makes the coalesce(tp/pp, 0) columns meaningful (precision is NULL
    at such points, on both engines)."""
    s = _eval_scores(spark, sf_dir)
    v = s.groupBy("score").agg(
        F.count("*").alias("cnt"),
        F.sum(F.when(F.col("truth"), 1).otherwise(0)).alias("cnt_p"),
    )
    thr = spark.range(10).select(
        (F.col("id") / 10.0).alias("thr")
    )
    pts = (
        thr.join(F.broadcast(v), F.col("score") >= F.col("thr"), "left")
        .groupBy("thr")
        .agg(F.sum("cnt").alias("pp"), F.sum("cnt_p").alias("tp"))
    )
    tot = v.agg(F.sum("cnt_p").alias("ap"))
    return pts.crossJoin(F.broadcast(tot)).select(
        F.round("thr", 1).alias("threshold"),
        F.coalesce(F.col("tp"), F.lit(0)).cast("bigint").alias("tp"),
        F.coalesce(F.col("pp"), F.lit(0)).cast("bigint").alias("pred_pos"),
        F.round(
            F.coalesce(F.col("tp"), F.lit(0))
            / F.nullif(F.col("pp"), F.lit(0))
            + F.lit(1e-9),
            4,
        ).alias("precision_"),
        F.round(
            F.coalesce(F.col("tp"), F.lit(0))
            / F.nullif(F.col("ap"), F.lit(0))
            + F.lit(1e-9),
            4,
        ).alias("recall_"),
    )


@register(
    "q_ml_logloss",
    oracle=f"""
    WITH s AS ({_EVAL_SCORE_SQL}),
    c AS (
        SELECT CASE WHEN truth THEN 1e0 ELSE 0e0 END AS y,
               least(greatest(score, 1e-6), 1 - 1e-6) AS p
        FROM s
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           round(-avg(y * ln(p) + (1 - y) * ln(1 - p)) + 1e-9, 4)
               AS log_loss,
           round(avg((p - y) * (p - y)) + 1e-9, 4) AS brier,
           round(avg(y) + 1e-9, 4) AS base_rate
    FROM c
    """,
)
def q_ml_logloss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proper scoring rules for the fused logistic head: log loss
    (cross-entropy) and Brier score against the label-bit truth, plus
    the base rate — the calibration-sensitive complements of
    q_ml_auc's rank-only view (AUC can't see miscalibration; these
    can).

    Determinism: probabilities are the 4-dp-rounded scores clipped to
    [1e-6, 1−1e-6] with identical double literals on both engines, so
    every ln/square input is bit-identical; the only cross-engine
    variance is float-sum order in the mean, absorbed by the +1e-9
    4-dp round.  Shape: zero-shuffle scorer → ONE map-side-combined
    1-row reduce — the cheapest distributed shape there is."""
    s = _eval_scores(spark, sf_dir)
    y = F.when(F.col("truth"), F.lit(1.0)).otherwise(F.lit(0.0))
    p = F.least(
        F.greatest(F.col("score"), F.lit(1e-6)), F.lit(1.0) - F.lit(1e-6)
    )
    c = s.select(y.alias("y"), p.alias("p"))
    return c.agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(
            -F.avg(
                F.col("y") * F.log(F.col("p"))
                + (1 - F.col("y")) * F.log(1 - F.col("p"))
            )
            + F.lit(1e-9),
            4,
        ).alias("log_loss"),
        F.round(
            F.avg((F.col("p") - F.col("y")) * (F.col("p") - F.col("y")))
            + F.lit(1e-9),
            4,
        ).alias("brier"),
        F.round(F.avg("y") + F.lit(1e-9), 4).alias("base_rate"),
    )


@register(
    "q_ml_feature_auc",
    oracle="""
    WITH ex AS (
        SELECT u.k AS dim, round(u.v::DOUBLE + 1e-9, 4) AS score,
               (label % 2 = 1) AS truth
        FROM (
            SELECT label,
                   unnest(list_transform(
                       embedding[1:8],
                       (v, k) -> struct_pack(k := k, v := v))) AS u
            FROM embeddings
        )
    ),
    v AS (
        SELECT dim, score, count(*) AS cnt,
               sum(CASE WHEN truth THEN 1 ELSE 0 END) AS cnt_p
        FROM ex GROUP BY dim, score
    ),
    r AS (
        SELECT dim, score, cnt, cnt_p,
               sum(cnt) OVER (PARTITION BY dim ORDER BY score
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS cum
        FROM v
    ),
    agg AS (
        SELECT dim, sum(cnt_p) AS np, sum(cnt) - sum(cnt_p) AS nn,
               sum((cum - (cnt - 1) / 2.0) * cnt_p) AS rp
        FROM r GROUP BY dim
    )
    SELECT CAST(dim AS BIGINT) AS dim,
           round((rp - np * (np + 1) / 2.0) / (np * nn) + 1e-9, 4) AS auc,
           round(abs((rp - np * (np + 1) / 2.0) / (np * nn) - 0.5)
                 + 1e-9, 4) AS separation
    FROM agg
    """,
)
def q_ml_feature_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Univariate feature screening: per-dimension ROC AUC of each of
    the leading 8 embedding components as a standalone classifier for
    the label bit, plus |AUC − 0.5| separation — the ranking a feature-
    selection pass starts from (a dim with AUC ≈ 0.5 carries no signal
    alone; q_ml_auc's machinery swept across features instead of
    models).

    Shape: ONE posexplode pass (8 rows/vector) → per-(dim, 4-dp score)
    distinct-value frames via a map-side-combined agg — each dim's
    frame is bounded by its score grid, not the corpus — → dim-
    partitioned rank prefix (8 independent bounded windows; the
    two-pass bucket recipe applies per dim if a grid outgrows a task)
    → 8-row rank-sum reduce.  Scores round to 4 dp BEFORE ranking so
    tie structure is engine-identical."""
    from pyspark.sql import Window

    emb = table(spark, sf_dir, "embeddings")
    ex = emb.select(
        (F.col("label") % 2 == 1).alias("truth"),
        F.posexplode(F.slice(F.col("embedding"), 1, 8)).alias(
            "dim0", "x"
        ),
    ).select(
        "truth",
        (F.col("dim0") + 1).alias("dim"),
        F.round(F.col("x").cast("double") + F.lit(1e-9), 4).alias(
            "score"
        ),
    )
    v = ex.groupBy("dim", "score").agg(
        F.count("*").alias("cnt"),
        F.sum(F.when(F.col("truth"), 1).otherwise(0)).alias("cnt_p"),
    )
    w = (
        Window.partitionBy("dim")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = v.withColumn("cum", F.sum("cnt").over(w))
    agg = r.groupBy("dim").agg(
        F.sum("cnt_p").alias("np"),
        (F.sum("cnt") - F.sum("cnt_p")).alias("nn"),
        F.sum(
            (F.col("cum") - (F.col("cnt") - 1) / 2.0) * F.col("cnt_p")
        ).alias("rp"),
    )
    # try_divide: a single-class dim sample has no rankable pairs —
    # AUC undefined, NULL not an ANSI crash (round-6 audit)
    auc = F.try_divide(
        F.col("rp") - F.col("np") * (F.col("np") + 1) / 2.0,
        F.col("np") * F.col("nn"),
    )
    return agg.select(
        F.col("dim").cast("bigint").alias("dim"),
        F.round(auc + F.lit(1e-9), 4).alias("auc"),
        F.round(F.abs(auc - 0.5) + F.lit(1e-9), 4).alias("separation"),
    )


@register(
    "q_ml_threshold",
    oracle=f"""
    WITH s AS ({_EVAL_SCORE_SQL}),
    v AS (
        SELECT score, count(*) AS cnt,
               sum(CASE WHEN truth THEN 1 ELSE 0 END) AS cnt_p
        FROM s GROUP BY score
    ),
    tot AS (SELECT sum(cnt_p) AS ap FROM v),
    c AS (
        SELECT score,
               sum(cnt) OVER (ORDER BY score DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS pp,
               sum(cnt_p) OVER (ORDER BY score DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS tp
        FROM v
    ),
    f AS (
        SELECT score AS threshold,
               round(2e0 * tp / (pp + tot.ap) + 1e-9, 4) AS f1,
               CAST(tp AS BIGINT) AS tp, CAST(pp AS BIGINT) AS pred_pos
        FROM c, tot
    )
    SELECT threshold, f1, tp, pred_pos
    FROM f
    ORDER BY f1 DESC, threshold DESC
    LIMIT 1
    """,
)
def q_ml_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-optimal decision threshold: sweep EVERY distinct score as a
    candidate threshold (predict positive at score ≥ t) and return the
    one maximizing F1 — the operating-point selection step after
    q_ml_pr_curve's fixed grid (F1 = 2·tp/(pp+ap), the single-ratio
    form; ties break to the higher threshold = fewer positives).

    Shape: the corpus collapses ONCE to the bounded distinct-score
    frame; cumulative tp/pp at every candidate come from a
    score-descending prefix over that bounded frame (the two-pass
    bucket recipe applies if it outgrows a task); the argmax is a
    deterministic (f1, threshold)-ordered limit 1.  Counts exact
    integers throughout."""
    from pyspark.sql import Window

    s = _eval_scores(spark, sf_dir)
    v = s.groupBy("score").agg(
        F.count("*").alias("cnt"),
        F.sum(F.when(F.col("truth"), 1).otherwise(0)).alias("cnt_p"),
    )
    tot = v.agg(F.sum("cnt_p").alias("ap"))
    w = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = v.select(
        "score",
        F.sum("cnt").over(w).alias("pp"),
        F.sum("cnt_p").over(w).alias("tp"),
    )
    f = c.crossJoin(F.broadcast(tot)).select(
        F.col("score").alias("threshold"),
        F.round(
            F.lit(2.0) * F.col("tp") / (F.col("pp") + F.col("ap"))
            + F.lit(1e-9),
            4,
        ).alias("f1"),
        F.col("tp").cast("bigint").alias("tp"),
        F.col("pp").cast("bigint").alias("pred_pos"),
    )
    return f.orderBy(F.desc("f1"), F.desc("threshold")).limit(1)


@register(
    "q_ml_ks",
    oracle=f"""
    WITH s AS ({_EVAL_SCORE_SQL}),
    v AS (
        SELECT score,
               sum(CASE WHEN truth THEN 1 ELSE 0 END) AS cnt_p,
               sum(CASE WHEN truth THEN 0 ELSE 1 END) AS cnt_n
        FROM s GROUP BY score
    ),
    tot AS (
        SELECT sum(cnt_p) AS np, sum(cnt_n) AS nn FROM v
    ),
    c AS (
        SELECT score,
               sum(cnt_p) OVER (ORDER BY score
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS cp,
               sum(cnt_n) OVER (ORDER BY score
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS cn
        FROM v
    )
    SELECT round(max(abs(cp * 1e0 / tot.np - cn * 1e0 / tot.nn))
                 + 1e-9, 4) AS ks,
           CAST(tot.np AS BIGINT) AS n_pos,
           CAST(tot.nn AS BIGINT) AS n_neg
    FROM c, tot
    GROUP BY tot.np, tot.nn
    """,
)
def q_ml_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov-Smirnov separation of the fused logistic head: the
    max gap between the positive and negative score CDFs — credit-
    scoring's favorite single-number separation metric (KS = 0 means
    the score can't tell the classes apart; reported beside AUC
    because KS localizes WHERE the distributions separate).

    Shape: the q_ml_auc skeleton — corpus → bounded distinct-score
    frame (4-dp grid) → one ordered prefix for both class CDFs → a
    1-row max reduce.  CDF values are exact integer ratios at every
    step; the max over them is order-independent."""
    from pyspark.sql import Window

    s = _eval_scores(spark, sf_dir)
    v = s.groupBy("score").agg(
        F.sum(F.when(F.col("truth"), 1).otherwise(0)).alias("cnt_p"),
        F.sum(F.when(F.col("truth"), 0).otherwise(1)).alias("cnt_n"),
    )
    tot = v.agg(
        F.sum("cnt_p").alias("np"), F.sum("cnt_n").alias("nn")
    )
    w = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = v.select(
        F.sum("cnt_p").over(w).alias("cp"),
        F.sum("cnt_n").over(w).alias("cn"),
    )
    return c.crossJoin(F.broadcast(tot)).groupBy("np", "nn").agg(
        F.round(
            F.max(
                # try_divide: single-class sample → one CDF is over an
                # empty class, KS undefined (NULL, r6 audit)
                F.abs(
                    F.try_divide(F.col("cp"), F.col("np"))
                    - F.try_divide(F.col("cn"), F.col("nn"))
                )
            )
            + F.lit(1e-9),
            4,
        ).alias("ks")
    ).select(
        "ks",
        F.col("np").cast("bigint").alias("n_pos"),
        F.col("nn").cast("bigint").alias("n_neg"),
    )


@register(
    "q_ml_lift",
    oracle=f"""
    WITH s AS ({_EVAL_SCORE_SQL}),
    ranked AS (
        SELECT truth,
               row_number() OVER (ORDER BY score DESC, vec_id) AS rn
        FROM s
    ),
    tot AS (SELECT count(*) AS n, sum(CASE WHEN truth THEN 1 ELSE 0 END) AS np
            FROM ranked),
    dec AS (
        SELECT ((rn - 1) * 10) // n AS decile,
               count(*) AS n_rows,
               sum(CASE WHEN truth THEN 1 ELSE 0 END) AS n_pos
        FROM ranked, tot GROUP BY 1
    )
    SELECT decile,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_pos AS BIGINT) AS n_pos,
           round(n_pos * 1e0 / n_rows + 1e-9, 4) AS resp_rate,
           round((n_pos * 1e0 / n_rows) / (t.np * 1e0 / t.n) + 1e-9, 4)
               AS lift,
           round(sum(n_pos) OVER (ORDER BY decile
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW)
                 * 1e0 / t.np + 1e-9, 4) AS cum_gain
    FROM dec, tot t
    """,
)
def q_ml_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile gains/lift table — the campaign-targeting readout: rank
    the corpus by model score, cut into 10 equal-population deciles,
    and report each decile's response rate, lift over the base rate,
    and cumulative gain (share of all positives captured through that
    decile).

    Determinism: the ranking key (score DESC, vec_id) is total, so the
    decile assignment ``floor((rn−1)·10 / n)`` is identical across
    engines; counts are exact ints and every ratio is int-over-int
    rounded at 4 dp.

    Scale shape: the global row number is NOT a single-partition window
    over the facts — the per-score counts aggregate first (bounded by
    the 4-dp score grid), a bounded window over that distinct-score
    frame yields each score's cumulative offset, and the row-level rank
    is offset + rank-within-score (window partitioned by score — high
    cardinality, no hot task).  The oracle uses the textbook global
    row_number; the two constructions agree exactly because the rank
    key is total.  Final lift algebra runs on the 10-row decile frame
    (its window is bounded by construction)."""
    s = _eval_scores(spark, sf_dir)
    per_score = s.groupBy("score").agg(F.count("*").alias("c"))
    w_cum = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = per_score.select(
        "score", (F.sum("c").over(w_cum) - F.col("c")).alias("off")
    )
    w_in = Window.partitionBy("score").orderBy("vec_id")
    ranked = (
        s.join(F.broadcast(offsets), "score")
        .select(
            "truth",
            (F.col("off") + F.row_number().over(w_in)).alias("rn"),
        )
    )
    tot = ranked.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("truth"), 1).otherwise(0)).alias("np"),
    )
    dec = (
        ranked.crossJoin(F.broadcast(tot))
        .groupBy(
            F.floor((F.col("rn") - 1) * 10 / F.col("n")).alias("decile")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when(F.col("truth"), 1).otherwise(0)).alias("n_pos"),
        )
    )
    w_gain = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return dec.crossJoin(F.broadcast(tot)).select(
        F.col("decile").cast("bigint").alias("decile"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.round(F.col("n_pos") / F.col("n_rows") + F.lit(1e-9), 4).alias(
            "resp_rate"
        ),
        F.round(
            (F.col("n_pos") / F.col("n_rows"))
            / (F.col("np") / F.col("n"))
            + F.lit(1e-9),
            4,
        ).alias("lift"),
        F.round(
            F.sum("n_pos").over(w_gain) / F.col("np") + F.lit(1e-9), 4
        ).alias("cum_gain"),
    )


@register(
    "q_ml_mrr",
    oracle="""
    WITH ranked AS (
        SELECT user_id,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS rel,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY value DESC, event_id) AS pos
        FROM events
    ),
    firsts AS (
        SELECT user_id, min(pos) AS first_pos
        FROM ranked WHERE rel = 1 GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           round(avg(1e0 / first_pos) + 1e-9, 4) AS mrr,
           CAST(sum(CASE WHEN first_pos = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hit_at_1,
           CAST(sum(CASE WHEN first_pos <= 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hit_at_3
    FROM firsts
    """,
)
def q_ml_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean reciprocal rank + hit@k — the first-relevant-result metric
    that complements q_ml_ndcg's graded gain: each user's events rank
    by (value DESC, event_id), relevance = the click bit, and the score
    is 1/position of the FIRST click (users with no clicks are
    excluded, as in standard MRR).

    Determinism: the rank key is total, so first_pos is exact on both
    engines; 1/first_pos sums are ≤1-magnitude doubles absorbed by the
    4-dp round + nudge; hit@k counts are exact ints.

    Scale shape: one window partitioned by user_id (high-cardinality,
    no hot task), the min-position agg reuses the same user_id hash
    partitioning (exchange reuse, as pinned for q_ml_ndcg), then a
    1-row reduce."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    ranked = e.select(
        "user_id",
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("rel"),
        F.row_number().over(w).alias("pos"),
    )
    firsts = (
        ranked.filter(F.col("rel") == 1)
        .groupBy("user_id")
        .agg(F.min("pos").alias("first_pos"))
    )
    return firsts.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.round(F.avg(F.lit(1.0) / F.col("first_pos")) + F.lit(1e-9), 4).alias(
            "mrr"
        ),
        F.sum(F.when(F.col("first_pos") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hit_at_1"),
        F.sum(F.when(F.col("first_pos") <= 3, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hit_at_3"),
    )


@register(
    "q_ml_brier",
    oracle=f"""
    WITH s AS ({_EVAL_SCORE_SQL}),
    b AS (
        SELECT least(floor(score * 10), 9) AS bucket,
               count(*) AS n,
               round(avg(score) + 1e-11, 6) AS sbar,
               round(avg(CASE WHEN truth THEN 1e0 ELSE 0e0 END) + 1e-11, 6)
                   AS ybar
        FROM s GROUP BY 1
    ),
    g AS (
        SELECT sum(n) AS nt, sum(n * ybar) / sum(n) AS ybar_g FROM b
    ),
    raw AS (
        SELECT avg((score - CASE WHEN truth THEN 1e0 ELSE 0e0 END)
                   * (score - CASE WHEN truth THEN 1e0 ELSE 0e0 END))
                   AS brier
        FROM s
    )
    SELECT CAST(g.nt AS BIGINT) AS n,
           round(raw.brier + 1e-9, 4) AS brier,
           round(sum(b.n * (b.sbar - b.ybar) * (b.sbar - b.ybar)) / g.nt
                 + 1e-9, 4) AS reliability,
           round(sum(b.n * (b.ybar - g.ybar_g) * (b.ybar - g.ybar_g)) / g.nt
                 + 1e-9, 4) AS resolution,
           round(g.ybar_g * (1 - g.ybar_g) + 1e-9, 4) AS uncertainty
    FROM b CROSS JOIN g CROSS JOIN raw
    GROUP BY g.nt, raw.brier, g.ybar_g
    """,
)
def q_ml_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score with the Murphy decomposition: overall mean squared
    probability error plus its reliability (calibration gap) /
    resolution (sharpness) / uncertainty (base-rate variance) split
    over the q_ml_calibration decile bins — brier ≈ reliability −
    resolution + uncertainty up to within-bin variance, the standard
    probabilistic-forecast quality readout.

    Determinism: bucket membership is integer bucketing of the exact
    4-dp scores (q_ml_calibration); bin means re-round to 6 dp before
    the squared-gap algebra (inside-iteration policy), which then runs
    on the ≤10-row bin frame; 4-dp +1e-9 final rounds.

    Shape: the narrow scorer feeds one map-side-combined agg to ≤10
    bins plus one 1-row raw-Brier agg; everything downstream is on
    bounded frames.  Two fact passes, no joins on row-count-sized
    keys."""
    s = _eval_scores(spark, sf_dir)
    s = s.localCheckpoint(eager=False)
    y = F.when(F.col("truth"), F.lit(1.0)).otherwise(F.lit(0.0))
    bucket = F.least(F.floor(F.col("score") * 10), F.lit(9))
    b = s.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n"),
        F.round(F.avg("score") + F.lit(1e-11), 6).alias("sbar"),
        F.round(F.avg(y) + F.lit(1e-11), 6).alias("ybar"),
    )
    raw = s.agg(
        F.avg((F.col("score") - y) * (F.col("score") - y)).alias("brier")
    )
    g = b.agg(
        F.sum("n").alias("nt"),
        (F.sum(F.col("n") * F.col("ybar")) / F.sum("n")).alias("ybar_g"),
        F.sum(
            F.col("n")
            * (F.col("sbar") - F.col("ybar"))
            * (F.col("sbar") - F.col("ybar"))
        ).alias("rel_num"),
    )
    res = (
        b.crossJoin(F.broadcast(g))
        .agg(
            F.sum(
                F.col("n")
                * (F.col("ybar") - F.col("ybar_g"))
                * (F.col("ybar") - F.col("ybar_g"))
            ).alias("res_num"),
            F.first("nt").alias("nt"),
            F.first("ybar_g").alias("ybar_g"),
            F.first("rel_num").alias("rel_num"),
        )
    )
    return res.crossJoin(F.broadcast(raw)).select(
        F.col("nt").cast("bigint").alias("n"),
        F.round(F.col("brier") + F.lit(1e-9), 4).alias("brier"),
        F.round(F.col("rel_num") / F.col("nt") + F.lit(1e-9), 4).alias(
            "reliability"
        ),
        F.round(F.col("res_num") / F.col("nt") + F.lit(1e-9), 4).alias(
            "resolution"
        ),
        F.round(
            F.col("ybar_g") * (1 - F.col("ybar_g")) + F.lit(1e-9), 4
        ).alias("uncertainty"),
    )


@register(
    "q_ml_mcc",
    oracle=f"""
    WITH s AS ({_EVAL_SCORE_SQL}),
    c AS (
        SELECT sum(CASE WHEN score >= 5e-1 AND truth THEN 1 ELSE 0 END)
                   AS tp,
               sum(CASE WHEN score >= 5e-1 AND NOT truth THEN 1 ELSE 0 END)
                   AS fp,
               sum(CASE WHEN score < 5e-1 AND truth THEN 1 ELSE 0 END)
                   AS fn,
               sum(CASE WHEN score < 5e-1 AND NOT truth THEN 1 ELSE 0 END)
                   AS tn
        FROM s
    )
    SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           round((tp * tn - fp * fn)
                 / sqrt((tp + fp)::DOUBLE * (tp + fn) * (tn + fp)
                        * (tn + fn)) + 1e-9, 4) AS mcc,
           round((tp * 1e0 / (tp + fn) + tn * 1e0 / (tn + fp)) / 2
                 + 1e-9, 4) AS balanced_acc,
           round(tp * 1e0 / (tp + fn) + tn * 1e0 / (tn + fp) - 1
                 + 1e-9, 4) AS youden_j
    FROM c
    """,
)
def q_ml_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient + balanced accuracy + Youden's
    J at the 0.5 threshold — the class-imbalance-robust single-number
    summaries q_ml_confusion's raw counts feed (MCC is the φ
    coefficient of the 2×2 table; chance level is 0 even at 99:1
    imbalance, unlike accuracy).

    All three derive from the same ONE-pass conditional-count agg
    (integer counts → exact products, one sqrt); 1-row output."""
    s = _eval_scores(spark, sf_dir)
    pos = F.col("score") >= 0.5
    c = s.agg(
        F.sum(F.when(pos & F.col("truth"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(pos & ~F.col("truth"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~pos & F.col("truth"), 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~pos & ~F.col("truth"), 1).otherwise(0)).alias("tn"),
    )
    tp, fp, fn, tn = (F.col(x) for x in ("tp", "fp", "fn", "tn"))
    # try_divide: an absent class/prediction zeroes a marginal — the
    # rates and MCC are undefined, NULL not an ANSI crash (r6 audit)
    tpr = F.try_divide(tp * 1.0, tp + fn)
    tnr = F.try_divide(tn * 1.0, tn + fp)
    return c.select(
        tp.cast("bigint").alias("tp"),
        fp.cast("bigint").alias("fp"),
        fn.cast("bigint").alias("fn"),
        tn.cast("bigint").alias("tn"),
        F.round(
            F.try_divide(
                tp * tn - fp * fn,
                F.sqrt(
                    (tp + fp).cast("double")
                    * (tp + fn)
                    * (tn + fp)
                    * (tn + fn)
                ),
            )
            + F.lit(1e-9),
            4,
        ).alias("mcc"),
        F.round((tpr + tnr) / 2 + F.lit(1e-9), 4).alias("balanced_acc"),
        F.round(tpr + tnr - 1 + F.lit(1e-9), 4).alias("youden_j"),
    )


@register(
    "q_ml_parity",
    oracle=f"""
    WITH s AS (
        SELECT d.lang,
               1e0 / (1e0 + exp(-(
                   {_W_NTOK} * (len(string_split(d.text, ' ')) / 1e2)
                   + {_W_STOP} * (len(list_filter(string_split(d.text, ' '),
                                   t -> t IN ('a', 'the')))
                       / CAST(len(string_split(d.text, ' ')) AS DOUBLE))
                   + {_W_WLEN} * (length(replace(d.text, ' ', ''))
                       / CAST(len(string_split(d.text, ' ')) AS DOUBLE)
                       / 8e0)
                   + ({_B})))) >= 5e-1 AS positive
        FROM documents d
    ),
    g AS (
        SELECT lang, count(*) AS n,
               sum(CASE WHEN positive THEN 1 ELSE 0 END) AS np
        FROM s GROUP BY lang
    ),
    mx AS (SELECT max(np * 1e0 / n) AS best FROM g)
    SELECT lang,
           CAST(n AS BIGINT) AS n,
           CAST(np AS BIGINT) AS n_positive,
           round(np * 1e0 / n + 1e-9, 4) AS positive_rate,
           round((np * 1e0 / n) / mx.best + 1e-9, 4) AS disparate_impact,
           CAST((np * 1e0 / n) / mx.best >= 0.8 AS BOOLEAN)
               AS passes_four_fifths
    FROM g CROSS JOIN mx
    """,
)
def q_ml_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demographic-parity audit of the q_ml_score classifier across
    languages: per-language positive rate, disparate impact vs the
    best-treated group, and the EEOC four-fifths-rule verdict — the
    fairness gate a scoring pipeline runs before its keep/drop
    decisions shape the corpus (a quality filter that passes 80% of
    English but 30% of Swahili is silently rebalancing the mix).

    Shape: the fused scan-side scorer (q_ml_score's Catalyst
    expression) feeds one k-language conditional-count agg; the max
    rate is a 1-row broadcast back onto the k-row frame.  Positive
    rates are exact integer ratios — bit-identical cross-engine."""
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
    positive = (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))) >= 0.5
    g = d.select("lang", positive.alias("positive")).groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("positive"), 1).otherwise(0)).alias("np"),
    )
    mx = g.agg(F.max(F.col("np") * 1.0 / F.col("n")).alias("best"))
    rate = F.col("np") * 1.0 / F.col("n")
    return g.crossJoin(F.broadcast(mx)).select(
        "lang",
        F.col("n").cast("bigint").alias("n"),
        F.col("np").cast("bigint").alias("n_positive"),
        F.round(rate + F.lit(1e-9), 4).alias("positive_rate"),
        F.round(rate / F.col("best") + F.lit(1e-9), 4).alias(
            "disparate_impact"
        ),
        (rate / F.col("best") >= 0.8).alias("passes_four_fifths"),
    )


@register(
    "q_ml_ece",
    oracle=f"""
    WITH s AS ({_EVAL_SCORE_SQL}),
    b AS (
        SELECT least(floor(score * 10), 9) AS bucket,
               count(*) AS n,
               round(avg(score) + 1e-11, 6) AS sbar,
               round(avg(CASE WHEN truth THEN 1e0 ELSE 0e0 END) + 1e-11, 6)
                   AS ybar
        FROM s GROUP BY 1
    )
    SELECT CAST(sum(n) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_bins,
           round(sum(n * abs(sbar - ybar)) / sum(n) + 1e-9, 4) AS ece,
           round(max(abs(sbar - ybar)) + 1e-9, 4) AS mce
    FROM b
    """,
)
def q_ml_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected + Maximum Calibration Error over the q_ml_calibration
    decile bins: ECE = Σ (n_b/N)·|conf_b − acc_b|, MCE = the worst
    bin — the one-number calibration summaries a model card quotes
    next to the reliability diagram (#241) and the Brier split (#301).

    Same determinism recipe as q_ml_brier (6-dp bin means, integer
    bucketing of exact 4-dp scores); one scorer pass → ≤10-bin agg →
    1-row reduce."""
    s = _eval_scores(spark, sf_dir)
    y = F.when(F.col("truth"), F.lit(1.0)).otherwise(F.lit(0.0))
    bucket = F.least(F.floor(F.col("score") * 10), F.lit(9))
    b = s.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n"),
        F.round(F.avg("score") + F.lit(1e-11), 6).alias("sbar"),
        F.round(F.avg(y) + F.lit(1e-11), 6).alias("ybar"),
    )
    gap = F.abs(F.col("sbar") - F.col("ybar"))
    return b.agg(
        F.sum("n").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("n_bins"),
        F.round(
            F.sum(F.col("n") * gap) / F.sum("n") + F.lit(1e-9), 4
        ).alias("ece"),
        F.round(F.max(gap) + F.lit(1e-9), 4).alias("mce"),
    )


@register(
    "q_ml_auc_ci",
    oracle=f"""
    WITH s AS ({_EVAL_SCORE_SQL}),
    v AS (
        SELECT score, count(*) AS cnt,
               sum(CASE WHEN truth THEN 1 ELSE 0 END) AS cnt_p
        FROM s GROUP BY score
    ),
    r AS (
        SELECT score, cnt, cnt_p,
               sum(cnt) OVER (ORDER BY score
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS cum
        FROM v
    ),
    agg AS (
        SELECT sum(cnt_p) AS np, sum(cnt) - sum(cnt_p) AS nn,
               sum((cum - (cnt - 1) / 2.0) * cnt_p) AS rp
        FROM r
    ),
    a AS (
        SELECT np, nn,
               round((rp - np * (np + 1) / 2.0) / (np * nn) + 1e-11, 6)
                   AS auc
        FROM agg
    ),
    se AS (
        SELECT np, nn, auc,
               sqrt((auc * (1 - auc)
                     + (np - 1) * (auc / (2 - auc) - auc * auc)
                     + (nn - 1) * (2 * auc * auc / (1 + auc)
                                   - auc * auc))
                    / (np * nn)) AS s
        FROM a
    )
    SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
           round(auc + 1e-9, 4) AS auc,
           round(s + 1e-9, 4) AS auc_se,
           round(greatest(auc - 1.96 * s, 0) + 1e-9, 4) AS ci_lo,
           round(least(auc + 1.96 * s, 1) + 1e-9, 4) AS ci_hi
    FROM se
    """,
)
def q_ml_auc_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC with a Hanley-McNeil standard error and 95% CI: the closed-
    form SE(AUC) from (AUC, n_pos, n_neg) via Q1 = A/(2−A),
    Q2 = 2A²/(1+A) — what q_ml_auc's point estimate needs before two
    models can be compared honestly (overlapping CIs at small n = no
    call).  CI clipped to [0, 1].

    Same rank-sum machinery as q_ml_auc (distinct-score frame, tied-
    rank midpoints), AUC re-rounded 6-dp before the SE algebra; 1-row
    output."""
    s = _eval_scores(spark, sf_dir)
    v = s.groupBy("score").agg(
        F.count("*").alias("cnt"),
        F.sum(F.when(F.col("truth"), 1).otherwise(0)).alias("cnt_p"),
    )
    w = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = v.select(
        "cnt", "cnt_p", F.sum("cnt").over(w).alias("cum")
    )
    agg = r.agg(
        F.sum("cnt_p").alias("np"),
        (F.sum("cnt") - F.sum("cnt_p")).alias("nn"),
        F.sum((F.col("cum") - (F.col("cnt") - 1) / 2.0) * F.col("cnt_p"))
        .alias("rp"),
    )
    np_, nn_ = F.col("np"), F.col("nn")
    # try_divide: single-class sample → no rankable pairs, AUC and its
    # Hanley-McNeil SE undefined — NULL, not an ANSI crash (r6 audit)
    a = agg.select(
        np_,
        nn_,
        F.round(
            F.try_divide(F.col("rp") - np_ * (np_ + 1) / 2.0, np_ * nn_)
            + F.lit(1e-11),
            6,
        ).alias("auc"),
    )
    auc = F.col("auc")
    se = F.sqrt(
        F.try_divide(
            auc * (1 - auc)
            + (np_ - 1) * (auc / (2 - auc) - auc * auc)
            + (nn_ - 1) * (2 * auc * auc / (1 + auc) - auc * auc),
            np_ * nn_,
        )
    )
    return a.select(
        np_.cast("bigint").alias("n_pos"),
        nn_.cast("bigint").alias("n_neg"),
        F.round(auc + F.lit(1e-9), 4).alias("auc"),
        F.round(se + F.lit(1e-9), 4).alias("auc_se"),
        F.round(F.greatest(auc - 1.96 * se, F.lit(0.0)) + F.lit(1e-9), 4)
        .alias("ci_lo"),
        F.round(F.least(auc + 1.96 * se, F.lit(1.0)) + F.lit(1e-9), 4)
        .alias("ci_hi"),
    )


@register(
    "q_ml_kappa",
    oracle=f"""
    WITH s AS (
        SELECT round(1e0 / (1e0 + exp(-(
                   2e0 * embedding[1]::DOUBLE
                   + 15e-1 * embedding[2]::DOUBLE
                   + embedding[3]::DOUBLE - 1e-1))) + 1e-9, 4) >= 5e-1
                   AS pred_a,
               round(1e0 / (1e0 + exp(-(
                   2e0 * embedding[1]::DOUBLE - 1e-1))) + 1e-9, 4)
                   >= 5e-1 AS pred_b
        FROM embeddings
    ),
    t AS (
        SELECT count(*) AS n,
               sum(CASE WHEN pred_a AND pred_b THEN 1 ELSE 0 END) AS pp,
               sum(CASE WHEN NOT pred_a AND NOT pred_b
                        THEN 1 ELSE 0 END) AS nn,
               sum(CASE WHEN pred_a THEN 1 ELSE 0 END) AS a_pos,
               sum(CASE WHEN pred_b THEN 1 ELSE 0 END) AS b_pos
        FROM s
    ),
    k AS (
        SELECT n, pp, nn, a_pos, b_pos,
               (pp + nn) / CAST(n AS DOUBLE) AS po,
               (a_pos * b_pos
                + (n - a_pos) * (n - b_pos))
                   / (CAST(n AS DOUBLE) * n) AS pe
        FROM t
    ),
    f AS (
        SELECT n, pp, nn, a_pos, b_pos, po, pe,
               round((po - pe) / (1 - pe) + 1e-9, 4) AS kappa
        FROM k
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(pp AS BIGINT) AS both_pos,
           CAST(nn AS BIGINT) AS both_neg,
           round(po + 1e-9, 4) AS observed_agreement,
           round(pe + 1e-9, 4) AS chance_agreement,
           kappa,
           CASE WHEN kappa < 2e-1 THEN 'slight'
                WHEN kappa < 4e-1 THEN 'fair'
                WHEN kappa < 6e-1 THEN 'moderate'
                WHEN kappa < 8e-1 THEN 'substantial'
                ELSE 'near_perfect' END AS agreement_band
    FROM f
    """,
)
def q_ml_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the full 3-feature logistic scorer and
    its 1-feature ablation (the q_stats_mcnemar pair) — chance-
    corrected inter-model agreement κ = (p_o − p_e)/(1 − p_e), the
    standard 'do these two labelers actually agree?' readout
    (Landis-Koch bands).  McNemar asks whether the models DIFFER in
    accuracy; kappa asks how interchangeable their labels are — both
    from the same one-scan discordance geometry.

    Shape: one fused scan computes both predictions, ONE conditional-
    count agg to a 1-row contingency summary; κ and the band come from
    that row's integer counts via identical algebra both engines (band
    thresholds compared against the 4-dp-rounded κ so the label can
    never straddle an ulp)."""
    emb = table(spark, sf_dir, "embeddings")
    za = (
        F.lit(2.0) * F.col("embedding")[0].cast("double")
        + F.lit(1.5) * F.col("embedding")[1].cast("double")
        + F.col("embedding")[2].cast("double")
        - F.lit(0.1)
    )
    zb = F.lit(2.0) * F.col("embedding")[0].cast("double") - F.lit(0.1)
    sig = lambda z: F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) + F.lit(1e-9), 4
    )
    s = emb.select(
        (sig(za) >= 0.5).alias("pred_a"), (sig(zb) >= 0.5).alias("pred_b")
    )
    t = s.agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("pred_a") & F.col("pred_b"), 1).otherwise(0)
        ).alias("pp"),
        F.sum(
            F.when(~F.col("pred_a") & ~F.col("pred_b"), 1).otherwise(0)
        ).alias("nn"),
        F.sum(F.when(F.col("pred_a"), 1).otherwise(0)).alias("a_pos"),
        F.sum(F.when(F.col("pred_b"), 1).otherwise(0)).alias("b_pos"),
    )
    n = F.col("n")
    po = (F.col("pp") + F.col("nn")) / n.cast("double")
    pe = (
        F.col("a_pos") * F.col("b_pos")
        + (n - F.col("a_pos")) * (n - F.col("b_pos"))
    ) / (n.cast("double") * n)
    # try_divide: if chance agreement pe = 1 (degenerate constant
    # raters, e.g. a 1-row sample) κ is undefined — NULL, not an ANSI
    # crash (r6 audit); the band must not fall through to the
    # `otherwise` branch on a NULL κ
    kappa = F.round(F.try_divide(po - pe, 1 - pe) + F.lit(1e-9), 4)
    band = (
        F.when(kappa.isNull(), F.lit(None).cast("string"))
        .when(kappa < 0.2, "slight")
        .when(kappa < 0.4, "fair")
        .when(kappa < 0.6, "moderate")
        .when(kappa < 0.8, "substantial")
        .otherwise("near_perfect")
    )
    return t.select(
        n.cast("bigint").alias("n"),
        F.col("pp").cast("bigint").alias("both_pos"),
        F.col("nn").cast("bigint").alias("both_neg"),
        F.round(po + F.lit(1e-9), 4).alias("observed_agreement"),
        F.round(pe + F.lit(1e-9), 4).alias("chance_agreement"),
        kappa.alias("kappa"),
        band.alias("agreement_band"),
    )


_CV_FOLDS = 5


@register(
    "q_ml_fold_stability",
    oracle=f"""
    WITH s AS ({_EVAL_SCORE_SQL}),
    f AS (
        SELECT truth, score,
               CAST(vec_id * 2654435761 % 1000000007 % {_CV_FOLDS}
                    AS INTEGER) AS fold
        FROM s
    ),
    per AS (
        SELECT fold, count(*) AS n,
               round(sum(CASE WHEN (score >= 5e-1) = truth
                              THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE) + 1e-11, 6) AS acc,
               round(sum(pow(score - CASE WHEN truth THEN 1e0 ELSE 0e0 END,
                             2)) / count(*) + 1e-11, 6) AS brier
        FROM f GROUP BY fold
    ),
    agg AS (
        SELECT sqrt(sum(acc * acc) / count(*)
                    - pow(sum(acc) / count(*), 2)) AS acc_sd,
               max(acc) - min(acc) AS acc_spread
        FROM per
    )
    SELECT per.fold, CAST(per.n AS BIGINT) AS n,
           round(per.acc + 1e-9, 4) AS accuracy,
           round(per.brier + 1e-9, 4) AS brier,
           round(agg.acc_sd + 1e-9, 4) AS acc_sd,
           round(agg.acc_spread + 1e-9, 4) AS acc_spread,
           CAST(agg.acc_spread > 5e-2 AS BOOLEAN) AS unstable
    FROM per CROSS JOIN agg ORDER BY per.fold
    """,
)
def q_ml_fold_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold stability of the fused scorer: accuracy and Brier score
    on 5 deterministic hash-folds of the eval set, with the cross-fold
    accuracy SD and max-min spread — a single pooled metric
    (q_ml_confusion) can hide a model that's great on four folds and
    broken on one data slice; spread > 5 pts says the pooled number
    isn't trustworthy.  Hash-assigned folds (the q_split_assign
    multiplicative recipe), never random(): re-runs land every row in
    the same fold.

    Shape: the zero-shuffle scorer projection + ONE k-row hash agg per
    fold; the stability summary is algebra over the 5-row frame
    broadcast back onto it."""
    s = _eval_scores(spark, sf_dir)
    fold = (
        (F.col("vec_id") * F.lit(2654435761)) % F.lit(1000000007) % _CV_FOLDS
    ).cast("int")
    f = s.select("truth", "score", fold.alias("fold"))
    per = f.groupBy("fold").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(
                F.when((F.col("score") >= 0.5) == F.col("truth"), 1).otherwise(
                    0
                )
            )
            / F.count("*").cast("double")
            + F.lit(1e-11),
            6,
        ).alias("acc"),
        F.round(
            F.sum(
                F.pow(
                    F.col("score")
                    - F.when(F.col("truth"), 1.0).otherwise(0.0),
                    2,
                )
            )
            / F.count("*")
            + F.lit(1e-11),
            6,
        ).alias("brier"),
    )
    agg = per.agg(
        F.sqrt(
            F.sum(F.col("acc") * F.col("acc")) / F.count("*")
            - F.pow(F.sum("acc") / F.count("*"), 2)
        ).alias("acc_sd"),
        (F.max("acc") - F.min("acc")).alias("acc_spread"),
    )
    return (
        per.crossJoin(F.broadcast(agg))
        .select(
            "fold",
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("acc") + F.lit(1e-9), 4).alias("accuracy"),
            F.round(F.col("brier") + F.lit(1e-9), 4).alias("brier"),
            F.round(F.col("acc_sd") + F.lit(1e-9), 4).alias("acc_sd"),
            F.round(F.col("acc_spread") + F.lit(1e-9), 4).alias(
                "acc_spread"
            ),
            (F.col("acc_spread") > 0.05).alias("unstable"),
        )
        .orderBy("fold")
    )
