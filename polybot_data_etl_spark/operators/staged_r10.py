"""Round-10 registration candidates, STAGED (SURVEY §2 #434-450).

The registration freeze holds through round 9 (VERDICT r8 §Next-round
#2: the driver evidence debt must drain to 365/365 before the surface
grows again), so these eight queries are built, oracle-paired, and
differentially verified (tests/test_staged_r10.py runs the exact
check_oracle canonicalization against DuckDB) — but NOT registered.
Round 10 flips each by wrapping it with ``registry.register(name,
oracle=STAGED[name].oracle)`` once CORRECTNESS_r09 lands green.

Every query follows the SURVEY §2.1 cross-dialect conventions: rounded
float outputs with the +1e-12/+1e-9 pre-round shift and the ``+ 0.0``
signed-zero normalizer on BOTH engines, identical aliases, integer
internals wherever a comparison could tie (kendall, hodges-lehmann),
deterministic tiebreaks on every top-k.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table


class StagedQuery(NamedTuple):
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str


STAGED: dict[str, StagedQuery] = {}


def _stage(name: str, oracle: str):
    def deco(fn):
        STAGED[name] = StagedQuery(fn, oracle)
        return fn

    return deco


# Repeat-co-purchase subgraph for the component census: an edge needs
# the pair co-purchased in >= _CC_MIN_ORDERS DISTINCT orders.  The raw
# co-occurrence graph is one giant component at every fixture scale
# (probed: %4 and %16, single blob) — the repeat filter keeps only
# STABLE product affinities and yields a genuinely multi-modal size
# census (33×2-node .. 1×14-node at sf0.01).
_CC_MIN_ORDERS = 2


@_stage(
    "q_graph_components",
    oracle=f"""
    WITH RECURSIVE e AS (
        SELECT l1.l_partkey AS a, l2.l_partkey AS b
        FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
        WHERE l1.l_partkey % 4 = 0 AND l2.l_partkey % 4 = 0
        GROUP BY 1, 2
        HAVING count(DISTINCT l1.l_orderkey) >= {_CC_MIN_ORDERS}
    ),
    und AS (
        SELECT a AS v, b AS w FROM e UNION ALL SELECT b, a FROM e
    ),
    reach(v, lbl) AS (
        SELECT v, v AS lbl FROM (SELECT DISTINCT v FROM und)
        UNION
        SELECT und.v, reach.lbl
        FROM reach JOIN und ON und.w = reach.v
        WHERE reach.lbl < und.v
    ),
    lbls AS (SELECT v, min(lbl) AS lbl FROM reach GROUP BY v),
    comps AS (SELECT lbl, count(*) AS size FROM lbls GROUP BY lbl)
    SELECT CAST(size AS BIGINT) AS size,
           CAST(count(*) AS BIGINT) AS n_components
    FROM comps GROUP BY size ORDER BY size
    """,
)
def q_graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component census of the REPEAT-co-purchase graph
    (pairs co-purchased in ≥2 distinct orders): (component size, how
    many components of that size) — the structural question every
    dedup/community pipeline asks first ("one giant blob or many
    islands?"), on the edge set sparse enough to have an interesting
    answer (the raw co-occurrence graph is one blob at every scale).

    Spark side builds weighted edges with the basket-bounded explode²
    kernel (collect_set per order → in-array pair generation, zero
    join shuffles, fan-out bounded by basket size — the r6
    link_predict recipe) and feeds the ≥2-weight survivors to the
    engine's superstep CC kernel (functions/dedup.component_labels:
    min-label propagation, O(|E|) shuffle per superstep, local fast
    path under the edge threshold).  The oracle replays it as a
    recursive CTE whose tuple space is pruned to (node, smaller-
    reachable-label) — the min label still reaches every node because
    every path from the component minimum is monotonically
    label-decreasing at each hop."""
    from polybot_data_etl_spark.functions.dedup import component_labels

    li = table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") % 4 == 0)
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    wa = baskets.select("ps", F.explode("ps").alias("a"))
    edges = (
        wa.select("a", F.explode("ps").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= _CC_MIN_ORDERS)
    )
    labels = component_labels(
        edges.select(F.col("a").alias("a_id"), F.col("b").alias("b_id"))
    )
    sizes = labels.groupBy("lbl").agg(F.count("*").alias("size"))
    return (
        sizes.groupBy(F.col("size").cast("bigint").alias("size"))
        .agg(F.count("*").cast("bigint").alias("n_components"))
        .orderBy("size")
    )


@_stage(
    "q_graph_modularity",
    oracle="""
    WITH e AS (
        SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
        FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
        WHERE l1.l_partkey % 4 = 0 AND l2.l_partkey % 4 = 0
    ),
    m AS (SELECT count(*) AS m FROM e),
    intra AS (
        SELECT pa.p_brand AS c, count(*) AS lc
        FROM e JOIN part pa ON pa.p_partkey = e.a
               JOIN part pb ON pb.p_partkey = e.b
        WHERE pa.p_brand = pb.p_brand
        GROUP BY pa.p_brand
    ),
    deg AS (
        SELECT node, count(*) AS d
        FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        GROUP BY node
    ),
    dc AS (
        SELECT p.p_brand AS c, sum(deg.d) AS dc
        FROM deg JOIN part p ON p.p_partkey = deg.node
        GROUP BY p.p_brand
    ),
    terms AS (
        SELECT dc.c,
               coalesce(intra.lc, 0) / (1e0 * m.m)
                   - (dc.dc / (2e0 * m.m)) * (dc.dc / (2e0 * m.m)) AS q
        FROM dc LEFT JOIN intra ON intra.c = dc.c CROSS JOIN m
    )
    SELECT (SELECT CAST(m AS BIGINT) FROM m) AS n_edges,
           CAST(count(*) AS BIGINT) AS n_communities,
           round(sum(q) + 1e-12, 6) + 0.0 AS modularity
    FROM terms
    """,
)
def q_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the co-purchase graph under the brand
    partition: Q = Σ_c [ L_c/m − (d_c/2m)² ] — does the catalog's brand
    structure explain the co-purchase communities (Q ≫ 0), or do
    baskets ignore brands (Q ≈ 0)?  The closed-form community-quality
    score every clustering pipeline reports.

    Shape: the memoized edge frame joins the broadcast part dim twice
    (brand of each endpoint) for the intra-community count, the degree
    frame joins it once for d_c; everything after is a handful of
    community-sized aggregates.  No iteration — modularity of a GIVEN
    partition is pure closed-form, unlike community DETECTION."""
    from polybot_data_etl_spark.operators.graph import copurchase_edges

    edges = copurchase_edges(spark, sf_dir)
    pt = F.broadcast(table(spark, sf_dir, "part").select("p_partkey", "p_brand"))
    m = edges.agg(F.count("*").alias("m"))
    intra = (
        edges.join(pt.withColumnRenamed("p_brand", "ba"), F.col("a") == F.col("p_partkey"))
        .drop("p_partkey")
        .join(pt.withColumnRenamed("p_brand", "bb"), F.col("b") == F.col("p_partkey"))
        .filter(F.col("ba") == F.col("bb"))
        .groupBy(F.col("ba").alias("c"))
        .agg(F.count("*").alias("lc"))
    )
    deg = (
        edges.select(F.col("a").alias("node"))
        .union(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    dc = (
        deg.join(pt, F.col("node") == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("c"))
        .agg(F.sum("d").alias("dc"))
    )
    terms = (
        dc.join(intra, "c", "left")
        .crossJoin(F.broadcast(m))
        .select(
            (
                F.coalesce(F.col("lc"), F.lit(0)) / (1.0 * F.col("m"))
                - (F.col("dc") / (2.0 * F.col("m")))
                * (F.col("dc") / (2.0 * F.col("m")))
            ).alias("q")
        )
    )
    return (
        terms.crossJoin(F.broadcast(m))
        .groupBy("m")
        .agg(
            F.count("*").cast("bigint").alias("n_communities"),
            (F.round(F.sum("q") + F.lit(1e-12), 6) + F.lit(0.0)).alias(
                "modularity"
            ),
        )
        .select(
            F.col("m").cast("bigint").alias("n_edges"),
            "n_communities",
            "modularity",
        )
    )


@_stage(
    "q_ts_xcorr",
    oracle="""
    WITH cal AS (SELECT DISTINCT ts::DATE AS d FROM events),
    x AS (
        SELECT cal.d, count(e.event_id) AS xv
        FROM cal LEFT JOIN events e
          ON e.ts::DATE = cal.d AND e.event_type = 'click'
        GROUP BY cal.d
    ),
    y AS (
        SELECT cal.d, count(e.event_id) AS yv
        FROM cal LEFT JOIN events e
          ON e.ts::DATE = cal.d AND e.event_type = 'purchase'
        GROUP BY cal.d
    ),
    lags AS (SELECT unnest(generate_series(0, 7)) AS lag)
    SELECT CAST(lags.lag AS INTEGER) AS lag,
           CAST(count(*) AS BIGINT) AS n_days,
           round(corr(x.xv, y.yv) + 1e-12, 4) + 0.0 AS r
    FROM lags
    JOIN x ON TRUE
    JOIN y ON y.d = x.d + CAST(lags.lag AS INTEGER)
    GROUP BY lags.lag
    ORDER BY lag
    """,
)
def q_ts_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between the daily click series and the
    daily purchase series, lags 0..7: does purchasing trail clicking by
    k days?  The lead/lag relationship test behind every marketing
    attribution window — q_ts_rolling_corr measures same-day
    co-movement; this measures the SHIFTED alignment.

    Shape: two zero-filled daily count series (30 rows each — the
    calendar is the bounding aggregate), an 8-row lag frame, one
    equi-join per lag on the shifted date, and Pearson corr per lag
    group.  Counts are exact integers on both engines, so the only
    float is the final correlation."""
    ev = table(spark, sf_dir, "events").withColumn("d", F.to_date("ts"))
    cal = ev.select("d").distinct()

    def daily(etype: str, alias: str) -> DataFrame:
        c = (
            ev.filter(F.col("event_type") == etype)
            .groupBy("d")
            .agg(F.count("*").alias("_n"))
        )
        return cal.join(c, "d", "left").select(
            "d", F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias(alias)
        )

    x = daily("click", "xv")
    y = daily("purchase", "yv").withColumnRenamed("d", "d2")
    lags = spark.range(0, 8).select(F.col("id").cast("int").alias("lag"))
    return (
        x.crossJoin(F.broadcast(lags))
        .join(y, F.col("d2") == F.date_add(F.col("d"), F.col("lag")))
        .groupBy("lag")
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            (F.round(F.corr("xv", "yv") + F.lit(1e-12), 4) + F.lit(0.0)).alias(
                "r"
            ),
        )
        .orderBy("lag")
    )


@_stage(
    "q_embed_hubness",
    oracle="""
    WITH knn AS (
        SELECT a.vec_id AS probe, b.vec_id AS nb
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        QUALIFY row_number() OVER (
            PARTITION BY a.vec_id
            ORDER BY round(list_inner_product(a.embedding::DOUBLE[],
                                              b.embedding::DOUBLE[]), 4) DESC,
                     b.vec_id
        ) <= 5
    ),
    indeg AS (
        SELECT e.vec_id, count(knn.nb) AS indeg
        FROM embeddings e LEFT JOIN knn ON knn.nb = e.vec_id
        GROUP BY e.vec_id
    )
    SELECT CAST(indeg AS BIGINT) AS indeg,
           CAST(count(*) AS BIGINT) AS n_vecs
    FROM indeg GROUP BY indeg ORDER BY indeg
    """,
)
def q_embed_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN in-degree (hubness) histogram of the embedding space: how
    many vectors appear in 0, 1, 2, … other vectors' 5-NN lists.  High
    hubness skew is the classic high-dimensional pathology that poisons
    ANN retrieval quality (a few "hub" vectors show up in everyone's
    neighbor list) — the one-number diagnosis to run before shipping an
    embedding index; complements q_embed_recall_at_k (which scores the
    INDEX, not the space).

    Shape: the replicated-index-shard brute force — the candidate
    matrix (bounded by contract: the embedding table is
    dimension-table-sized at every fixture scale; the 100 TB path is
    the IVF bucketing of q_sim_topk_ivf) broadcasts ONCE as a numpy
    block, and `mapInPandas` over the probe partitions computes each
    Arrow batch's scores as one BLAS matmul with a vectorized
    (−sim, id) lexsort top-5.  This replaces the 4 M-row pair
    materialization (measured 20-22 s at sf0.1 through either dot
    transport — the Arrow transfer of the pair frame IS the cost)
    with a 2 000-row broadcast + per-batch O(b·n·d) flops: measured
    1.3 s.  Exactly how a production BF-ANN stage shards: index
    replicated, queries partitioned."""
    import numpy as np
    import pandas as pd

    e = table(spark, sf_dir, "embeddings")
    pdf = e.select("vec_id", "embedding").toPandas()  # bounded index shard
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    bc = spark.sparkContext.broadcast((ids, mat))

    def knn_blocks(batches):
        b_ids, b_mat = bc.value
        for batch in batches:
            probes = batch["vec_id"].to_numpy(dtype=np.int64)
            pm = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            sims = np.round(pm @ b_mat.T, 4)
            out_p, out_n = [], []
            for i, pid in enumerate(probes):
                row = sims[i].copy()
                row[b_ids == pid] = -np.inf  # exclude self
                top = np.lexsort((b_ids, -row))[:5]
                out_p.extend([pid] * len(top))
                out_n.extend(b_ids[top])
            yield pd.DataFrame({"probe": out_p, "nb": out_n})

    knn = e.select("vec_id", "embedding").mapInPandas(
        knn_blocks, "probe long, nb long"
    )
    indeg = (
        e.select("vec_id")
        .join(knn, F.col("vec_id") == F.col("nb"), "left")
        .groupBy("vec_id")
        .agg(F.count("nb").alias("indeg"))
    )
    return (
        indeg.groupBy(F.col("indeg").cast("bigint").alias("indeg"))
        .agg(F.count("*").cast("bigint").alias("n_vecs"))
        .orderBy("indeg")
    )


@_stage(
    "q_text_ngram_coverage",
    oracle="""
    WITH counts AS (
        SELECT bigram, count(*) AS n
        FROM (
            SELECT unnest(list_transform(
                     range(1, len(string_split(lower(text), ' '))),
                     i -> string_split(lower(text), ' ')[i] || ' ' ||
                          string_split(lower(text), ' ')[i + 1])) AS bigram
            FROM documents
        )
        GROUP BY bigram
    ),
    top AS (
        SELECT n, row_number() OVER (ORDER BY n DESC, bigram) AS rnk
        FROM counts ORDER BY n DESC, bigram LIMIT 500
    ),
    tot AS (SELECT sum(n) AS total FROM counts),
    ks AS (SELECT unnest([10, 50, 100, 500]) AS k)
    SELECT CAST(ks.k AS INTEGER) AS k,
           CAST(sum(top.n) AS BIGINT) AS covered,
           CAST(tot.total AS BIGINT) AS total,
           round(CAST(sum(top.n) AS DOUBLE) / CAST(tot.total AS DOUBLE)
                 + 1e-12, 4) + 0.0 AS coverage
    FROM ks JOIN top ON top.rnk <= ks.k CROSS JOIN tot
    GROUP BY ks.k, tot.total
    ORDER BY k
    """,
)
def q_text_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram coverage curve: what fraction of all bigram occurrences
    the top-{10,50,100,500} bigrams account for — the Zipf-mass
    concentration number that sizes n-gram LM tables, dedup shingle
    filters, and stopword lists (q_text_bigrams lists the head;
    this measures how heavy the head IS).

    Shape: the corpus bigram count table (exact integers), a top-500
    cut via TakeOrdered (LIMIT bounds the frame, so the rank window
    runs over ≤500 rows — never a global sort of the vocabulary), a
    1-row total, and a 4-row k-frame joined on rank."""
    d = table(spark, sf_dir, "documents")
    words = F.split(F.lower(F.col("text")), " ")
    bigrams = F.filter(
        F.zip_with(
            words,
            F.slice(words, 2, F.lit(1 << 30)),
            lambda a, b: F.when(b.isNotNull(), F.concat_ws(" ", a, b)),
        ),
        lambda s: s.isNotNull(),
    )
    counts = (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
    )
    top = counts.orderBy(F.desc("n"), F.asc("bigram")).limit(500)
    rnk = Window.orderBy(F.desc("n"), F.asc("bigram"))
    top = top.withColumn("rnk", F.row_number().over(rnk))
    tot = counts.agg(F.sum("n").alias("total"))
    ks = spark.createDataFrame([(10,), (50,), (100,), (500,)], "k int")
    return (
        F.broadcast(ks)
        .join(top, F.col("rnk") <= F.col("k"))
        .groupBy("k")
        .agg(F.sum("n").alias("covered"))
        .crossJoin(F.broadcast(tot))
        .select(
            "k",
            F.col("covered").cast("bigint").alias("covered"),
            F.col("total").cast("bigint").alias("total"),
            (
                F.round(
                    F.col("covered").cast("double")
                    / F.col("total").cast("double")
                    + F.lit(1e-12),
                    4,
                )
                + F.lit(0.0)
            ).alias("coverage"),
        )
        .orderBy("k")
    )


@_stage(
    "q_stats_kendall",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate::DATE AS d,
               count(*) AS x,
               count(DISTINCT o_custkey) AS y
        FROM orders GROUP BY 1
    ),
    nd AS (SELECT count(*) AS n_days FROM daily),
    pairs AS (
        SELECT (a.x - b.x) AS sx, (a.y - b.y) AS sy
        FROM daily a JOIN daily b ON a.d < b.d
    ),
    agg AS (
        SELECT count(*) AS n0,
               sum(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END) AS c,
               sum(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END) AS disc,
               sum(CASE WHEN sx = 0 THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS n2
        FROM pairs
    )
    SELECT (SELECT CAST(n_days AS BIGINT) FROM nd) AS n_days,
           CAST(c AS BIGINT) AS concordant,
           CAST(disc AS BIGINT) AS discordant,
           round((c - disc) / sqrt((n0 - n1) * 1e0 * (n0 - n2)) + 1e-12, 4)
               + 0.0 AS tau_b
    FROM agg
    """,
)
def q_stats_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b between daily order volume and daily distinct
    buyers — the rank-correlation complement of q_stats_spearman that
    handles ties by construction (tau-b's denominator discounts them),
    on two INTEGER series so concordance decisions are exact on both
    engines (no float-sign ambiguity).

    Shape: one date-keyed aggregate (≤ ~2.4 k rows at any fixture
    scale — bounded by the calendar, not the table), an O(days²)
    self-join (≈3 M pairs) with integer sign products, and one final
    scalar row.  At 100 TB the daily frame is identical; only the
    first aggregate sees more data."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count("*").alias("x"),
        F.countDistinct("o_custkey").alias("y"),
    )
    nd = daily.agg(F.count("*").cast("bigint").alias("n_days"))
    a = daily.select(
        F.col("d").alias("da"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = daily.select(
        F.col("d").alias("db"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    pairs = a.join(b, F.col("da") < F.col("db")).select(
        (F.col("xa") - F.col("xb")).alias("sx"),
        (F.col("ya") - F.col("yb")).alias("sy"),
    )
    agg = pairs.agg(
        F.count("*").alias("n0"),
        F.sum(F.when(F.col("sx") * F.col("sy") > 0, 1).otherwise(0)).alias("c"),
        F.sum(F.when(F.col("sx") * F.col("sy") < 0, 1).otherwise(0)).alias(
            "disc"
        ),
        F.sum(F.when(F.col("sx") == 0, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("sy") == 0, 1).otherwise(0)).alias("n2"),
    )
    return (
        F.broadcast(nd)
        .crossJoin(agg)
        .select(
            "n_days",
            F.col("c").cast("bigint").alias("concordant"),
            F.col("disc").cast("bigint").alias("discordant"),
            (
                F.round(
                    (F.col("c") - F.col("disc"))
                    / F.sqrt(
                        (F.col("n0") - F.col("n1"))
                        * 1.0
                        * (F.col("n0") - F.col("n2"))
                    )
                    + F.lit(1e-12),
                    4,
                )
                + F.lit(0.0)
            ).alias("tau_b"),
        )
    )


@_stage(
    "q_sample_bernoulli_hash",
    oracle="""
    WITH flagged AS (
        SELECT event_type, value,
               ((event_id * 1103515245 + 12345) % 2147483648) % 1000 < 100
                   AS sampled
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sampled,
           round(sum(CASE WHEN sampled THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE) + 1e-12, 4) + 0.0 AS rate,
           round(avg(CASE WHEN sampled THEN value END) + 1e-9, 2) + 0.0
               AS avg_value_sample,
           round(avg(value) + 1e-9, 2) + 0.0 AS avg_value_all
    FROM flagged
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_sample_bernoulli_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-Bernoulli sampling audit (target rate 10%):
    membership is a pure function of the row key (an LCG step on
    event_id), so the sample is STABLE across reruns, engines, and
    partitionings — the property `rand()`-based sampling lacks and the
    reason production pipelines sample by key hash.  Output: realized
    rate and the sample-vs-population mean of `value` per event type
    (the estimator-quality check).

    Shape: one narrow projection (the LCG is two integer ops, fully
    codegen) and one group-by — embarrassingly parallel, no shuffle
    before the 5-group aggregate.  The same predicate is the 100 TB
    sampling pushdown: it rides the scan."""
    ev = table(spark, sf_dir, "events")
    u = (F.col("event_id").cast("long") * 1103515245 + 12345) % 2147483648
    flagged = ev.select(
        "event_type", "value", ((u % 1000) < 100).alias("sampled")
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.when(F.col("sampled"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_sampled"),
            (
                F.round(
                    F.sum(F.when(F.col("sampled"), 1).otherwise(0))
                    / F.count("*").cast("double")
                    + F.lit(1e-12),
                    4,
                )
                + F.lit(0.0)
            ).alias("rate"),
            (
                F.round(
                    F.avg(F.when(F.col("sampled"), F.col("value")))
                    + F.lit(1e-9),
                    2,
                )
                + F.lit(0.0)
            ).alias("avg_value_sample"),
            (F.round(F.avg("value") + F.lit(1e-9), 2) + F.lit(0.0)).alias(
                "avg_value_all"
            ),
        )
        .orderBy("event_type")
    )


@_stage(
    "q_stats_hodges_lehmann",
    oracle="""
    WITH daily AS (
        SELECT o_orderpriority AS pri, o_orderdate::DATE AS d,
               count(*) AS c
        FROM orders GROUP BY 1, 2
    ),
    walsh AS (
        SELECT a.pri, (a.c + b.c) / 2.0 AS w
        FROM daily a JOIN daily b ON a.pri = b.pri AND a.d <= b.d
    )
    SELECT w.pri AS o_orderpriority,
           (SELECT CAST(count(*) AS BIGINT) FROM daily dd
             WHERE dd.pri = w.pri) AS n_days,
           round(median(w.w) + 1e-9, 2) + 0.0 AS hl
    FROM walsh w
    GROUP BY w.pri
    ORDER BY o_orderpriority
    """,
)
def q_stats_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann pseudo-median of daily order volume per
    priority class: the median of all Walsh averages (c_i + c_j)/2,
    i ≤ j — the robust location estimator behind the Wilcoxon
    signed-rank test (30% breakdown, ~96% Gaussian efficiency vs the
    mean's 0% breakdown and the median's 64% efficiency).  Inputs are
    integer daily counts, so every Walsh average is an exact half-
    integer and the cross-engine median is bit-identical.

    Shape: a calendar-bounded daily aggregate (≤ ~2.4 k rows/group),
    an O(days²) within-group self-join (≈3 M Walsh rows per priority),
    and one exact median per group.  The pair blow-up is bounded by
    the CALENDAR, not the table — at 100 TB the daily frame is the
    same size."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.to_date("o_orderdate").alias("d"),
    ).agg(F.count("*").alias("c"))
    nd = daily.groupBy("pri").agg(F.count("*").cast("bigint").alias("n_days"))
    a = daily.select("pri", F.col("d").alias("da"), F.col("c").alias("ca"))
    b = daily.select(
        F.col("pri").alias("prib"), F.col("d").alias("db"), F.col("c").alias("cb")
    )
    walsh = a.join(
        b, (F.col("pri") == F.col("prib")) & (F.col("da") <= F.col("db"))
    ).select("pri", ((F.col("ca") + F.col("cb")) / 2.0).alias("w"))
    hl = walsh.groupBy("pri").agg(
        (F.round(F.median("w") + F.lit(1e-9), 2) + F.lit(0.0)).alias("hl")
    )
    return (
        nd.join(hl, "pri")
        .select(
            F.col("pri").alias("o_orderpriority"),
            "n_days",
            "hl",
        )
        .orderBy("o_orderpriority")
    )


@_stage(
    "q_stats_friedman",
    oracle="""
    WITH daily AS (
        SELECT ts::DATE AS d, event_type AS t, count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    grid AS (
        SELECT cal.d, ty.t, coalesce(daily.c, 0) AS c
        FROM (SELECT DISTINCT d FROM daily) cal
        CROSS JOIN (SELECT DISTINCT t FROM daily) ty
        LEFT JOIN daily ON daily.d = cal.d AND daily.t = ty.t
    ),
    ranked AS (
        SELECT d, t, c,
               count(*) FILTER (WHERE 1=1)
                   OVER (PARTITION BY d ORDER BY c
                         RANGE BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS cnt_lt,
               count(*) OVER (PARTITION BY d, c) AS tied
        FROM grid
    ),
    rk AS (
        SELECT d, t, cnt_lt + (tied + 1) / 2.0 AS r, tied
        FROM ranked
    ),
    rsum AS (SELECT t, sum(r) AS rj FROM rk GROUP BY t),
    dims AS (
        SELECT (SELECT count(DISTINCT d) FROM grid) AS n,
               (SELECT count(DISTINCT t) FROM grid) AS k
    ),
    ties AS (
        SELECT coalesce(sum(tt * tt * tt - tt), 0) AS tcorr
        FROM (
            SELECT d, c, count(*) AS tt FROM grid GROUP BY d, c
        )
    )
    SELECT CAST(dims.n AS BIGINT) AS n_blocks,
           CAST(dims.k AS BIGINT) AS k_treatments,
           round(
             (12.0 * (SELECT sum(rj * rj) FROM rsum)
                / (dims.n * dims.k * (dims.k + 1))
              - 3.0 * dims.n * (dims.k + 1))
             / (1.0 - ties.tcorr
                      / (CAST(dims.n AS DOUBLE) * (dims.k * dims.k * dims.k
                                                   - dims.k)))
             + 1e-9, 4) + 0.0 AS chi2_f
    FROM dims CROSS JOIN ties
    """,
)
def q_stats_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test (tie-corrected) for the daily event-type volume
    panel: blocks = days, treatments = the 5 event types, response =
    daily count — do the types differ in volume once day-level noise
    is blocked out?  The non-parametric two-way complement of
    q_stats_kruskal (one-way) and q_stats_anova (parametric); the
    workhorse test for 'same metric, k variants, repeated daily'.

    Average ranks for ties computed closed-form (below-count +
    (tied+1)/2 — exact half-integers from integer counts, never a
    float sort), the zero-filled day×type grid bounds every window at
    calendar × type size, and the tie-corrected statistic
    Q / (1 − Σ(t³−t)/(nk(k²−1))·…) uses only exact integer sums until
    the final division."""
    ev = table(spark, sf_dir, "events").withColumn("d", F.to_date("ts"))
    daily = ev.groupBy("d", F.col("event_type").alias("t")).agg(
        F.count("*").alias("c")
    )
    cal = daily.select("d").distinct()
    ty = daily.select("t").distinct()
    grid = (
        cal.crossJoin(F.broadcast(ty))
        .join(daily, ["d", "t"], "left")
        .select("d", "t", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    w_lt = (
        Window.partitionBy("d")
        .orderBy("c")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_tie = Window.partitionBy("d", "c")
    rk = grid.select(
        "d",
        "t",
        "c",
        (
            F.coalesce(F.count("*").over(w_lt), F.lit(0))
            + (F.count("*").over(w_tie) + 1) / 2.0
        ).alias("r"),
    )
    rsum = rk.groupBy("t").agg(F.sum("r").alias("rj"))
    sum_rj2 = rsum.agg(F.sum(F.col("rj") * F.col("rj")).alias("s2"))
    dims = grid.agg(
        F.countDistinct("d").alias("n"), F.countDistinct("t").alias("k")
    )
    ties = (
        grid.groupBy("d", "c")
        .agg(F.count("*").alias("tt"))
        .agg(
            F.coalesce(
                F.sum(F.col("tt") * F.col("tt") * F.col("tt") - F.col("tt")),
                F.lit(0),
            ).alias("tcorr")
        )
    )
    return (
        dims.crossJoin(F.broadcast(sum_rj2))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("n").cast("bigint").alias("n_blocks"),
            F.col("k").cast("bigint").alias("k_treatments"),
            (
                F.round(
                    (
                        12.0
                        * F.col("s2")
                        / (F.col("n") * F.col("k") * (F.col("k") + 1))
                        - 3.0 * F.col("n") * (F.col("k") + 1)
                    )
                    / (
                        1.0
                        - F.col("tcorr")
                        / (
                            F.col("n").cast("double")
                            * (
                                F.col("k") * F.col("k") * F.col("k")
                                - F.col("k")
                            )
                        )
                    )
                    + F.lit(1e-9),
                    4,
                )
                + F.lit(0.0)
            ).alias("chi2_f"),
        )
    )


@_stage(
    "q_stats_cramers_v",
    oracle="""
    WITH ct AS (
        SELECT o_orderpriority AS a, o_orderstatus AS b, count(*) AS o
        FROM orders GROUP BY 1, 2
    ),
    full_ct AS (
        SELECT ra.a, rb.b, coalesce(ct.o, 0) AS o
        FROM (SELECT DISTINCT a FROM ct) ra
        CROSS JOIN (SELECT DISTINCT b FROM ct) rb
        LEFT JOIN ct ON ct.a = ra.a AND ct.b = rb.b
    ),
    marg AS (
        SELECT a, b, o,
               sum(o) OVER (PARTITION BY a) AS ra,
               sum(o) OVER (PARTITION BY b) AS cb,
               sum(o) OVER () AS n
        FROM full_ct
    ),
    chi AS (
        SELECT any_value(n) AS n,
               count(DISTINCT a) AS r,
               count(DISTINCT b) AS c,
               sum((o - ra * cb / (1.0 * n)) * (o - ra * cb / (1.0 * n))
                   / (ra * cb / (1.0 * n))) AS chi2
        FROM marg
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
           round(chi2 + 1e-9, 4) + 0.0 AS chi2,
           round(sqrt(chi2 / (n * (least(r, c) - 1))) + 1e-9, 4) + 0.0
               AS cramers_v
    FROM chi
    """,
)
def q_stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V for order priority × order status: the NORMALIZED
    association strength ([0, 1], comparable across tables and sample
    sizes) that raw chi-square (q_stats_chisq) is not — the effect
    size every categorical-drift dashboard actually wants, since chi²
    alone grows linearly with row count.

    Shape: one hash agg to the ≤ r×c contingency table (zero-filled
    so expected counts are right even for absent cells), marginals by
    windows over that tiny frame, one scalar row out."""
    o = table(spark, sf_dir, "orders")
    ct = o.groupBy(
        F.col("o_orderpriority").alias("a"), F.col("o_orderstatus").alias("b")
    ).agg(F.count("*").alias("o"))
    ra = ct.select("a").distinct()
    rb = ct.select("b").distinct()
    full_ct = (
        ra.crossJoin(F.broadcast(rb))
        .join(ct, ["a", "b"], "left")
        .select("a", "b", F.coalesce(F.col("o"), F.lit(0)).alias("o"))
    )
    marg = full_ct.select(
        "a",
        "b",
        "o",
        F.sum("o").over(Window.partitionBy("a")).alias("ra"),
        F.sum("o").over(Window.partitionBy("b")).alias("cb"),
        F.sum("o").over(
            Window.partitionBy()
        ).alias("n"),  # whole frame = the tiny contingency table
    )
    exp = F.col("ra") * F.col("cb") / (1.0 * F.col("n"))
    chi = marg.agg(
        F.first("n").alias("n"),
        F.countDistinct("a").alias("r"),
        F.countDistinct("b").alias("c"),
        F.sum((F.col("o") - exp) * (F.col("o") - exp) / exp).alias("chi2"),
    )
    return chi.select(
        F.col("n").cast("bigint").alias("n"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("bigint").alias("dof"),
        (F.round(F.col("chi2") + F.lit(1e-9), 4) + F.lit(0.0)).alias("chi2"),
        (
            F.round(
                F.sqrt(
                    F.col("chi2")
                    / (F.col("n") * (F.least(F.col("r"), F.col("c")) - 1))
                )
                + F.lit(1e-9),
                4,
            )
            + F.lit(0.0)
        ).alias("cramers_v"),
    )


@_stage(
    "q_win_rolling_slope",
    oracle="""
    WITH daily AS (
        SELECT o_orderpriority AS pri, date_trunc('day', o_orderdate) AS d,
               round(sum(o_totalprice), 2) AS rev,
               date_diff('day', DATE '1992-01-01', o_orderdate::DATE) AS x
        FROM orders GROUP BY 1, 2, 4
    ),
    win AS (
        SELECT pri, d,
               count(*) OVER w AS n,
               sum(x) OVER w AS sx,
               sum(rev) OVER w AS sy,
               sum(x * rev) OVER w AS sxy,
               sum(CAST(x AS DOUBLE) * x) OVER w AS sxx
        FROM daily
        WINDOW w AS (PARTITION BY pri ORDER BY d
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT pri AS o_orderpriority, d,
           round((n * sxy - sx * sy) / (n * sxx - CAST(sx AS DOUBLE) * sx)
                 + 1e-9, 4) + 0.0 AS slope
    FROM win WHERE n = 7
    """,
)
def q_win_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row rolling OLS slope of daily revenue per priority class —
    the trend-strength signal behind every 'revenue decelerating?'
    alert (q_ts_rolling_corr co-moves two series; this regresses ONE
    series on time).  β = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²), assembled
    from five window sums over the SAME frame — one pass, no
    self-join.

    Cross-engine determinism: x is an exact integer day index, daily
    revenue is rounded to cents BEFORE the regression on both engines
    (the §2.1 two-step), the emitted day is a native TIMESTAMP on both
    (convention 10 — DATE surfaces as midnight-timestamp in pandas),
    windows are partitioned by priority (the bounded-key class), and
    rows without a full 7-day history are dropped identically via the
    frame row count."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.date_trunc("day", "o_orderdate").alias("d"),
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("rev")).withColumn(
        "x",
        F.datediff(F.to_date("d"), F.lit("1992-01-01").cast("date")),
    )
    w = (
        Window.partitionBy("pri")
        .orderBy("d")
        .rowsBetween(-6, Window.currentRow)
    )
    win = daily.select(
        "pri",
        "d",
        F.count("*").over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("rev").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("rev")).over(w).alias("sxy"),
        F.sum(F.col("x").cast("double") * F.col("x")).over(w).alias("sxx"),
    )
    return win.filter(F.col("n") == 7).select(
        F.col("pri").alias("o_orderpriority"),
        "d",
        (
            F.round(
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / (
                    F.col("n") * F.col("sxx")
                    - F.col("sx").cast("double") * F.col("sx")
                )
                + F.lit(1e-9),
                4,
            )
            + F.lit(0.0)
        ).alias("slope"),
    )


@_stage(
    "q_text_burstiness",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
        FROM documents
    ),
    per_doc AS (
        SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2
    ),
    stats AS (
        SELECT token,
               count(*) AS df,
               sum(c) AS total,
               sum(CAST(c AS DOUBLE) * c) AS sumsq
        FROM per_doc GROUP BY token
        ORDER BY df DESC, token LIMIT 20
    ),
    nd AS (SELECT count(*) AS n_docs FROM documents)
    SELECT token,
           CAST(df AS BIGINT) AS df,
           CAST(total AS BIGINT) AS total,
           round(total / (1.0 * df) + 1e-9, 4) + 0.0 AS per_doc_rate,
           round(
             (sumsq / (1.0 * n_docs)
              - (total / (1.0 * n_docs)) * (total / (1.0 * n_docs)))
             / (total / (1.0 * n_docs)) + 1e-9, 4) + 0.0 AS vmr
    FROM stats CROSS JOIN nd
    ORDER BY df DESC, token
    """,
)
def q_text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word burstiness (Church-Gale) for the 20 highest-df tokens:
    per-containing-doc rate (total/df — 'once it appears, how often?')
    and the zero-inclusive variance-to-mean ratio (VMR > 1 = bursty
    content word, VMR ≈ 1 = Poisson-like function word).  The
    mixture-model diagnostic behind stopword lists and tf saturation
    curves — q_text_zipf ranks the frequency mass, this measures its
    CLUMPINESS across documents.

    Zero-count docs enter the moments closed-form (Σc, Σc² over
    occurrences + the document total N), never as materialized zero
    rows; everything is an exact integer until the two final
    divisions."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"),
    )
    per_doc = tok.groupBy("doc_id", "token").agg(F.count("*").alias("c"))
    stats = (
        per_doc.groupBy("token")
        .agg(
            F.count("*").alias("df"),
            F.sum("c").alias("total"),
            F.sum(F.col("c").cast("double") * F.col("c")).alias("sumsq"),
        )
        .orderBy(F.desc("df"), F.asc("token"))
        .limit(20)
    )
    nd = d.agg(F.count("*").alias("n_docs"))
    mean = F.col("total") / (1.0 * F.col("n_docs"))
    return (
        stats.crossJoin(F.broadcast(nd))
        .select(
            "token",
            F.col("df").cast("bigint").alias("df"),
            F.col("total").cast("bigint").alias("total"),
            (
                F.round(F.col("total") / (1.0 * F.col("df")) + F.lit(1e-9), 4)
                + F.lit(0.0)
            ).alias("per_doc_rate"),
            (
                F.round(
                    (F.col("sumsq") / (1.0 * F.col("n_docs")) - mean * mean)
                    / mean
                    + F.lit(1e-9),
                    4,
                )
                + F.lit(0.0)
            ).alias("vmr"),
        )
        .orderBy(F.desc("df"), F.asc("token"))
    )


@_stage(
    "q_ts_interrupted",
    oracle="""
    WITH daily AS (
        SELECT date_diff('day', DATE '1992-01-01', o_orderdate::DATE) AS x,
               round(sum(o_totalprice), 2) AS y
        FROM orders GROUP BY 1
    ),
    cut AS (
        SELECT CAST(min(x) + (max(x) - min(x)) // 2 AS BIGINT) AS x0
        FROM daily
    ),
    seg AS (
        SELECT d.x, d.y, d.x >= c.x0 AS post FROM daily d CROSS JOIN cut c
    ),
    fits AS (
        SELECT post,
               count(*) AS n,
               (count(*) * sum(x * y) - sum(x) * sum(y))
                 / (count(*) * sum(CAST(x AS DOUBLE) * x)
                    - CAST(sum(x) AS DOUBLE) * sum(x)) AS slope,
               sum(y) / (1.0 * count(*))
                 - (count(*) * sum(x * y) - sum(x) * sum(y))
                   / (count(*) * sum(CAST(x AS DOUBLE) * x)
                      - CAST(sum(x) AS DOUBLE) * sum(x))
                   * (sum(x) / (1.0 * count(*))) AS intercept
        FROM seg GROUP BY post
    )
    SELECT (SELECT CAST(n AS BIGINT) FROM fits WHERE NOT post) AS n_pre,
           (SELECT CAST(n AS BIGINT) FROM fits WHERE post) AS n_post,
           round((SELECT slope FROM fits WHERE NOT post) + 1e-9, 4) + 0.0
               AS slope_pre,
           round((SELECT slope FROM fits WHERE post) + 1e-9, 4) + 0.0
               AS slope_post,
           round((SELECT slope FROM fits WHERE post)
                 - (SELECT slope FROM fits WHERE NOT post) + 1e-9, 4) + 0.0
               AS slope_change,
           round((SELECT intercept + slope * cut.x0 FROM fits WHERE post)
                 - (SELECT intercept + slope * cut.x0 FROM fits
                    WHERE NOT post) + 1e-9, 2) + 0.0 AS level_change
    FROM cut
    """,
)
def q_ts_interrupted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interrupted time-series (segmented regression) of daily revenue
    around the series midpoint: separate OLS fits before/after the
    cut, reporting the slope change and the level discontinuity AT the
    cutpoint — 'did the trend break, and did the level jump?', the
    causal-inference workhorse for launches/incidents
    (q_win_rolling_slope tracks local trend; this tests ONE structural
    break).  The cutpoint is derived from the data (midpoint of the
    integer day span), so the query is self-contained at every scale.

    Determinism: integer day index, cents-rounded daily revenue before
    the fits (§2.1 two-step), closed-form β and intercept from exact
    sums, two-group aggregate — no window at all."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date")
        ).alias("x")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("y"))
    cut = daily.agg(
        (
            F.min("x")
            + F.floor((F.max("x") - F.min("x")) / 2).cast("long")
        )
        .cast("bigint")
        .alias("x0")
    )
    seg = daily.crossJoin(F.broadcast(cut)).withColumn(
        "post", F.col("x") >= F.col("x0")
    )
    slope = (
        F.count("*") * F.sum(F.col("x") * F.col("y"))
        - F.sum("x") * F.sum("y")
    ) / (
        F.count("*") * F.sum(F.col("x").cast("double") * F.col("x"))
        - F.sum("x").cast("double") * F.sum("x")
    )
    fits = seg.groupBy("post").agg(
        F.count("*").alias("n"),
        slope.alias("slope"),
        (
            F.sum("y") / (1.0 * F.count("*"))
            - slope * (F.sum("x") / (1.0 * F.count("*")))
        ).alias("intercept"),
    )
    pre = fits.filter(~F.col("post")).select(
        F.col("n").alias("n_pre"),
        F.col("slope").alias("s_pre"),
        F.col("intercept").alias("i_pre"),
    )
    post = fits.filter(F.col("post")).select(
        F.col("n").alias("n_post"),
        F.col("slope").alias("s_post"),
        F.col("intercept").alias("i_post"),
    )
    return (
        pre.crossJoin(post)
        .crossJoin(F.broadcast(cut))
        .select(
            F.col("n_pre").cast("bigint").alias("n_pre"),
            F.col("n_post").cast("bigint").alias("n_post"),
            (F.round(F.col("s_pre") + F.lit(1e-9), 4) + F.lit(0.0)).alias(
                "slope_pre"
            ),
            (F.round(F.col("s_post") + F.lit(1e-9), 4) + F.lit(0.0)).alias(
                "slope_post"
            ),
            (
                F.round(F.col("s_post") - F.col("s_pre") + F.lit(1e-9), 4)
                + F.lit(0.0)
            ).alias("slope_change"),
            (
                F.round(
                    (F.col("i_post") + F.col("s_post") * F.col("x0"))
                    - (F.col("i_pre") + F.col("s_pre") * F.col("x0"))
                    + F.lit(1e-9),
                    2,
                )
                + F.lit(0.0)
            ).alias("level_change"),
        )
    )


def register_staged() -> None:
    """The round-10 flip: register every staged query with its oracle.

    NOT called anywhere in round 9 (the freeze).  Round 10:
      1. verify CORRECTNESS_r09.json landed green (the freeze's
         purpose — cumulative driver evidence 365/365);
      2. call this from plans/entrypoints (or inline the decorators);
      3. add the staged names to ``registry._NEW_THIS_ROUND`` so they
         enumerate AFTER any remaining evidence debt;
      4. move each function into its family module and update the
         SURVEY §2 rows from [STAGED r10] to registered.
    """
    from polybot_data_etl_spark.registry import register

    for name, (fn, oracle) in sorted(STAGED.items()):
        register(name, oracle=oracle)(fn)


@_stage(
    "q_stats_welch",
    oracle="""
    WITH g AS (
        SELECT event_type,
               count(*) AS n,
               sum(value) AS s,
               sum(CAST(value AS DOUBLE) * value) AS ss
        FROM events GROUP BY event_type
    ),
    m AS (
        SELECT event_type, n, s / (1.0 * n) AS mean,
               (ss - s * s / (1.0 * n)) / (n - 1.0) AS var
        FROM g
    ),
    w AS (
        SELECT event_type, n, mean, n / var AS wi FROM m
    ),
    tot AS (
        SELECT count(*) AS k, sum(wi) AS sw,
               sum(wi * mean) / sum(wi) AS mstar
        FROM w
    ),
    parts AS (
        SELECT sum(w.wi * (w.mean - tot.mstar) * (w.mean - tot.mstar)) AS num,
               sum((1.0 - w.wi / tot.sw) * (1.0 - w.wi / tot.sw)
                   / (w.n - 1.0)) AS lam,
               any_value(tot.k) AS k,
               sum(w.n) AS n
        FROM w CROSS JOIN tot
    )
    SELECT CAST(k AS BIGINT) AS k_groups,
           CAST(n AS BIGINT) AS n,
           round((num / (k - 1.0))
                 / (1.0 + 2.0 * (k - 2.0) / (k * k - 1.0) * lam)
                 + 1e-9, 4) + 0.0 AS f_welch,
           round((k * k - 1.0) / (3.0 * lam) + 1e-9, 4) + 0.0 AS df2
    FROM parts
    """,
)
def q_stats_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's ANOVA across event types: the unequal-variance one-way
    F (weights w_i = n_i/s_i², Welch-Satterthwaite df₂) — the modern
    default the classic F (q_stats_anova) should be replaced by when
    Levene (q_stats_levene) rejects variance homogeneity; the three
    queries form the complete omnibus-test decision path.

    Shape: ONE raw-moment pass over the fact table (n, Σx, Σx² per
    group — the q_stats_anova recipe exactly), then closed-form Welch
    algebra on the k-row frame; every post-agg frame is ≤ k rows."""
    ev = table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("value").alias("s"),
        F.sum(F.col("value").cast("double") * F.col("value")).alias("ss"),
    )
    m = g.select(
        "event_type",
        "n",
        (F.col("s") / (1.0 * F.col("n"))).alias("mean"),
        (
            (F.col("ss") - F.col("s") * F.col("s") / (1.0 * F.col("n")))
            / (F.col("n") - 1.0)
        ).alias("var"),
    )
    w = m.select(
        "event_type", "n", "mean", (F.col("n") / F.col("var")).alias("wi")
    )
    tot = w.agg(
        F.count("*").alias("k"),
        F.sum("wi").alias("sw"),
        (F.sum(F.col("wi") * F.col("mean")) / F.sum("wi")).alias("mstar"),
    )
    parts = (
        w.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.col("wi")
                * (F.col("mean") - F.col("mstar"))
                * (F.col("mean") - F.col("mstar"))
            ).alias("num"),
            F.sum(
                (1.0 - F.col("wi") / F.col("sw"))
                * (1.0 - F.col("wi") / F.col("sw"))
                / (F.col("n") - 1.0)
            ).alias("lam"),
            F.first("k").alias("k"),
            F.sum("n").alias("n"),
        )
    )
    return parts.select(
        F.col("k").cast("bigint").alias("k_groups"),
        F.col("n").cast("bigint").alias("n"),
        (
            F.round(
                (F.col("num") / (F.col("k") - 1.0))
                / (
                    1.0
                    + 2.0
                    * (F.col("k") - 2.0)
                    / (F.col("k") * F.col("k") - 1.0)
                    * F.col("lam")
                )
                + F.lit(1e-9),
                4,
            )
            + F.lit(0.0)
        ).alias("f_welch"),
        (
            F.round(
                (F.col("k") * F.col("k") - 1.0) / (3.0 * F.col("lam"))
                + F.lit(1e-9),
                4,
            )
            + F.lit(0.0)
        ).alias("df2"),
    )


@_stage(
    "q_agg_lorenz",
    oracle="""
    WITH cust AS (
        SELECT o_custkey, round(sum(o_totalprice), 2) AS rev
        FROM orders GROUP BY o_custkey
    ),
    tiled AS (
        SELECT rev, ntile(10) OVER (ORDER BY rev, o_custkey) AS decile
        FROM cust
    ),
    dec AS (
        SELECT decile, count(*) AS n_cust, sum(rev) AS drev
        FROM tiled GROUP BY decile
    ),
    tot AS (SELECT sum(drev) AS total FROM dec)
    SELECT CAST(decile AS INTEGER) AS decile,
           CAST(n_cust AS BIGINT) AS n_cust,
           round(drev / tot.total + 1e-12, 4) + 0.0 AS share,
           round(sum(drev) OVER (ORDER BY decile) / tot.total + 1e-12, 4)
               + 0.0 AS cum_share
    FROM dec CROSS JOIN tot
    ORDER BY decile
    """,
)
def q_agg_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of customer revenue concentration at deciles:
    share and cumulative share of total revenue held by each revenue
    decile of customers — the CURVE whose enclosed area q_agg_gini
    reduces to one scalar; the shape is what a data-mix or account-
    concentration review actually reads ('the top decile holds 40%').

    Determinism: per-customer revenue is cents-rounded BEFORE the
    decile ranking and tiled on (rev, custkey) — a total order, so
    ntile boundaries cannot flip on last-ulp float sums.  Scale
    posture: the ntile runs over the per-customer AGGREGATE (the
    entity-keyed bounded class documented for q_agg_rfm, whose
    bucketed twin #425 is the 100 TB recipe); the decile frame is 10
    rows."""
    o = table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    tiled = cust.select(
        "rev",
        F.ntile(10)
        .over(Window.orderBy(F.asc("rev"), F.asc("o_custkey")))
        .alias("decile"),
    )
    dec = tiled.groupBy("decile").agg(
        F.count("*").alias("n_cust"), F.sum("rev").alias("drev")
    )
    tot = dec.agg(F.sum("drev").alias("total"))
    wcum = Window.orderBy("decile")
    return (
        dec.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("int").alias("decile"),
            F.col("n_cust").cast("bigint").alias("n_cust"),
            (
                F.round(F.col("drev") / F.col("total") + F.lit(1e-12), 4)
                + F.lit(0.0)
            ).alias("share"),
            (
                F.round(
                    F.sum("drev").over(wcum) / F.col("total") + F.lit(1e-12),
                    4,
                )
                + F.lit(0.0)
            ).alias("cum_share"),
        )
        .orderBy("decile")
    )


@_stage(
    "q_graph_powerlaw",
    oracle="""
    WITH e AS (
        SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
        FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
        WHERE l1.l_partkey % 4 = 0 AND l2.l_partkey % 4 = 0
    ),
    deg AS (
        SELECT node, count(*) AS d
        FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        GROUP BY node
    )
    SELECT CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(max(d) AS BIGINT) AS max_degree,
           round(avg(1.0 * d) + 1e-9, 4) + 0.0 AS mean_degree,
           round(1.0 + count(*) / sum(ln(d / 0.5)) + 1e-9, 4) + 0.0
               AS alpha
    FROM deg
    """,
)
def q_graph_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law exponent of the co-purchase degree distribution:
    the Clauset-Shalizi-Newman continuous-MLE α̂ = 1 + n/Σ ln(d/(d_min
    −½)) at d_min = 1 — the one-number scale-free-ness check that
    decides whether hub-sensitive algorithms (the #430 degree cap,
    salting, top-k caches) are load-bearing on this graph (α ≲ 2.5 ⇒
    heavy hubs) or cosmetic (α ≳ 3.5).  Complements
    q_graph_centralization's max-vs-rest gap with the full tail
    exponent.

    Shape: one degree aggregate over the memoized edge frame, one
    scalar row — integer degrees make Σ ln(d/0.5) engine-identical
    to the last rounding step."""
    from polybot_data_etl_spark.operators.graph import copurchase_edges

    edges = copurchase_edges(spark, sf_dir)
    deg = (
        edges.select(F.col("a").alias("node"))
        .union(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    return deg.agg(
        F.count("*").cast("bigint").alias("n_nodes"),
        F.max("d").cast("bigint").alias("max_degree"),
        (F.round(F.avg(1.0 * F.col("d")) + F.lit(1e-9), 4) + F.lit(0.0)).alias(
            "mean_degree"
        ),
        (
            F.round(
                1.0 + F.count("*") / F.sum(F.log(F.col("d") / 0.5))
                + F.lit(1e-9),
                4,
            )
            + F.lit(0.0)
        ).alias("alpha"),
    )


@_stage(
    "q_ts_seasonal_mk",
    oracle="""
    WITH daily AS (
        SELECT CAST(extract('month' FROM o_orderdate) AS INTEGER) AS m,
               o_orderdate::DATE AS day, count(*) AS x
        FROM orders GROUP BY 1, 2
    ),
    s AS (
        SELECT a.m,
               sum(CASE WHEN b.x > a.x THEN 1
                        WHEN b.x < a.x THEN -1 ELSE 0 END) AS sm
        FROM daily a JOIN daily b ON a.m = b.m AND a.day < b.day
        GROUP BY a.m
    ),
    v AS (
        SELECT m, sum(tc) AS n,
               sum(tc * (tc - 1) * (2 * tc + 5)) AS tie_term
        FROM (SELECT m, x, count(*) AS tc FROM daily GROUP BY m, x)
        GROUP BY m
    ),
    tot AS (
        SELECT count(*) AS n_seasons,
               sum(s.sm) AS s_total,
               sum((v.n * (v.n - 1e0) * (2 * v.n + 5) - v.tie_term) / 18e0)
                   AS var_total
        FROM s JOIN v USING (m)
    )
    SELECT CAST(n_seasons AS BIGINT) AS n_seasons,
           CAST(s_total AS BIGINT) AS s_total,
           round(CASE WHEN s_total > 0
                      THEN (s_total - 1) / sqrt(var_total)
                      WHEN s_total < 0
                      THEN (s_total + 1) / sqrt(var_total)
                      ELSE 0e0 END + 1e-9, 4) + 0.0 AS z
    FROM tot
    """,
)
def q_ts_seasonal_mk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann-Kendall trend test on daily order volume: S and
    tie-corrected Var(S) computed WITHIN each calendar month across
    years, then summed — the seasonality-blocked version of
    q_ts_mannkendall that doesn't mistake an annual cycle for a
    monotone trend (Hirsch-Slack, the hydrology standard for exactly
    this failure mode).  Continuity-corrected z on the pooled S.

    Shape: a calendar-bounded daily aggregate, the O(days²) pairwise
    sign join runs WITHIN month blocks (~12× fewer pairs than the
    unblocked test), then 12-row closed-form assembly — integer
    counts end-to-end until the final z."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.month("o_orderdate").cast("int").alias("m"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(F.count("*").alias("x"))
    a = daily.select("m", F.col("day").alias("da"), F.col("x").alias("xa"))
    b = daily.select(
        F.col("m").alias("mb"), F.col("day").alias("db"), F.col("x").alias("xb")
    )
    s = (
        a.join(b, (F.col("m") == F.col("mb")) & (F.col("da") < F.col("db")))
        .groupBy("m")
        .agg(
            F.sum(
                F.when(F.col("xb") > F.col("xa"), 1)
                .when(F.col("xb") < F.col("xa"), -1)
                .otherwise(0)
            ).alias("sm")
        )
    )
    v = (
        daily.groupBy("m", "x")
        .agg(F.count("*").alias("tc"))
        .groupBy("m")
        .agg(
            F.sum("tc").alias("n"),
            F.sum(
                F.col("tc") * (F.col("tc") - 1) * (2 * F.col("tc") + 5)
            ).alias("tie_term"),
        )
    )
    tot = (
        s.join(v, "m")
        .agg(
            F.count("*").alias("n_seasons"),
            F.sum("sm").alias("s_total"),
            F.sum(
                (
                    F.col("n") * (F.col("n") - 1.0) * (2 * F.col("n") + 5)
                    - F.col("tie_term")
                )
                / 18.0
            ).alias("var_total"),
        )
    )
    return tot.select(
        F.col("n_seasons").cast("bigint").alias("n_seasons"),
        F.col("s_total").cast("bigint").alias("s_total"),
        (
            F.round(
                F.when(
                    F.col("s_total") > 0,
                    (F.col("s_total") - 1) / F.sqrt(F.col("var_total")),
                )
                .when(
                    F.col("s_total") < 0,
                    (F.col("s_total") + 1) / F.sqrt(F.col("var_total")),
                )
                .otherwise(F.lit(0.0))
                + F.lit(1e-9),
                4,
            )
            + F.lit(0.0)
        ).alias("z"),
    )
