"""Sketch-based distinct counting (SURVEY.md §2 #165-166).

Reference provenance: the reference's processor stage computed audience
/ reach metrics over the event stream (SURVEY.md §0.1 [REC
src/etl/.DS_Store:5104]); at 100 TB the naive ``count(DISTINCT ...)``
is a full shuffle of every distinct value, so production engines
pre-aggregate into mergeable summaries instead.  Two summary families:

* **Roaring-style bitmaps** (exact): Spark 3.5+ ships
  ``bitmap_bit_position / bitmap_bucket_number / bitmap_construct_agg /
  bitmap_or_agg / bitmap_count``.  Each (key, bucket) partition
  compresses into a <=4 KB bitmap before the shuffle, so shuffle bytes
  scale with #buckets (one per 32768-id range), not #rows — the same
  rollup trick Doris/ClickHouse bitmap indexes use, and the answer
  stays EXACT, so it hash-checks against ``count(DISTINCT)``.
* **HLL sketches** (approximate, mergeable): ``hll_sketch_agg`` builds
  an Apache DataSketches HLL per group, ``hll_union_agg`` merges
  partials — the canonical "store daily sketches, union them into any
  window later" pattern.  Estimates are library-specific, so the
  driver's check is rows-only by contract (like #30 q_agg_approx).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table
from polybot_data_etl_spark.registry import register


@register(
    "q_agg_bitmap_distinct",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def q_agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-user count per event type via bitmap partial
    aggregation.

    Stage 1 ORs every user_id bit into one bitmap per
    (event_type, 32k-id bucket) — map-side combinable, tiny shuffle
    payload; stage 2 sums per-bucket cardinalities.  Equivalent to
    ``count(DISTINCT user_id)`` but the shuffle carries bitmaps instead
    of raw ids: at 100 TB that is the difference between shuffling
    every event row and shuffling #keys × #buckets fixed-size blobs.
    The bitmap column itself is also a valid *stored* pre-aggregate
    (write it daily, OR it across days), which count(DISTINCT) can
    never be.
    """
    e = table(spark, sf_dir, "events")
    per_bucket = (
        e.select(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    return (
        per_bucket.select(
            "event_type", F.expr("bitmap_count(bm)").alias("bucket_users")
        )
        .groupBy("event_type")
        .agg(F.sum("bucket_users").alias("n_users"))
    )


@register("q_agg_hll_merge", oracle=None)
def q_agg_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable approximate distinct: daily HLL sketches of the user
    set per event type, unioned into a monthly estimate.

    The two-level shape is the point: ``hll_sketch_agg`` runs once over
    the raw events (what a daily ETL would persist), ``hll_union_agg``
    then answers the cross-day rollup WITHOUT rescanning the raw data —
    sketches are a few KB each, so the second stage is free at any
    scale.  DataSketches HLL estimates are implementation-defined, so
    this is a rows-only driver check by contract (SURVEY §2 #30
    precedent); the pytest twin asserts the estimate lands within 5% of
    exact truth at fixture scale.
    """
    e = table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sketch"))
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
                "approx_users"
            ),
            F.count("*").alias("n_days"),
        )
        .select("event_type", "approx_users", "n_days")
    )


# Count-min sketch geometry: d=4 portable multiplicative hash rows,
# w=256 counters each.  The (a, b) pairs are fixed primes/odd constants
# so both engines compute identical bucket indices — the sketch is
# DETERMINISTIC, which is what makes its estimates hash-checkable,
# unlike engine-native hash functions.
_CMS_PARAMS: tuple[tuple[int, int, int], ...] = (
    (0, 2654435761, 97),
    (1, 2246822519, 1013),
    (2, 3266489917, 293),
    (3, 668265263, 7919),
)
_CMS_P = 1_000_000_007
_CMS_W = 256


def _cms_oracle() -> str:
    values = ", ".join(f"({i}, {a}, {b})" for i, a, b in _CMS_PARAMS)
    return f"""
    WITH params(i, a, b) AS (VALUES {values}),
    counters AS (
        SELECT p.i,
               ((l.l_partkey * p.a + p.b) % {_CMS_P}) % {_CMS_W} AS bk,
               count(*) AS c
        FROM lineitem l CROSS JOIN params p
        GROUP BY p.i, bk
    ),
    keys AS (SELECT DISTINCT l_partkey FROM lineitem),
    est AS (
        SELECT k.l_partkey, min(c.c) AS est_count
        FROM keys k
        CROSS JOIN params p
        JOIN counters c
          ON c.i = p.i
         AND c.bk = ((k.l_partkey * p.a + p.b) % {_CMS_P}) % {_CMS_W}
        GROUP BY k.l_partkey
    )
    SELECT l_partkey, est_count
    FROM est ORDER BY est_count DESC, l_partkey LIMIT 20
    """


@register("q_agg_cms_topk", oracle=_cms_oracle())
def q_agg_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters: top-20 part keys by CMS-estimated
    frequency (d=4 hash rows × w=256 counters).

    Completes the sketch family — bitmap (exact distinct), HLL
    (mergeable approx distinct), CMS (frequency).  The counter build is
    one map-side-combinable aggregation whose output is d·w = 1024 rows
    REGARDLESS of input size — the whole point at 100 TB: the shuffle
    carries a fixed-size table, counters merge associatively across
    partitions/days, and any key's frequency is answerable later
    without the raw data (estimate = min over rows, one-sided
    overestimate ≤ εN).  The probe joins every distinct key against the
    broadcast counter table and takes the row-minimum.  The hash family
    is portable multiplicative arithmetic, so the DuckDB oracle
    reproduces the sketch bit-for-bit — the check verifies the
    ALGORITHM, not a lucky estimate.
    """
    li = table(spark, sf_dir, "lineitem").select("l_partkey")

    def buckets(key: F.Column) -> F.Column:
        return F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    (((key * F.lit(a) + F.lit(b)) % F.lit(_CMS_P)) % F.lit(_CMS_W)).alias("bk"),
                )
                for i, a, b in _CMS_PARAMS
            ]
        )

    counters = (
        li.select(F.explode(buckets(F.col("l_partkey"))).alias("x"))
        .groupBy(F.col("x.i").alias("i"), F.col("x.bk").alias("bk"))
        .agg(F.count("*").alias("c"))
    )
    keys = li.distinct()
    probed = keys.select(
        "l_partkey", F.explode(buckets(F.col("l_partkey"))).alias("x")
    ).select("l_partkey", F.col("x.i").alias("i"), F.col("x.bk").alias("bk"))
    return (
        probed.join(F.broadcast(counters), ["i", "bk"])
        .groupBy("l_partkey")
        .agg(F.min("c").alias("est_count"))
        .orderBy(F.desc("est_count"), F.asc("l_partkey"))
        .limit(20)
    )


@register(
    "q_agg_bitmap_rolling",
    oracle="""
    WITH days AS (
        SELECT DISTINCT date_trunc('day', ts) AS day FROM events
    )
    SELECT d.day,
           cast(count(DISTINCT e.user_id) AS BIGINT) AS rolling_users
    FROM days d
    JOIN events e
      ON date_trunc('day', e.ts)
         BETWEEN d.day - INTERVAL 6 DAY AND d.day
    GROUP BY d.day
    """,
)
def q_agg_bitmap_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users per day (the WAU curve) computed
    from MERGEABLE daily bitmaps: each (day, id-bucket) bitmap is
    exploded to the ≤7 window-end days it serves, OR-merged per target
    day, and popcounted — exact, and the raw events are scanned ONCE
    for the whole curve.

    The anti-shape is the oracle's formulation: re-join the fact table
    per window (7× scan volume) and count(DISTINCT) per day (shuffles
    raw ids). Here the shuffle after day one carries
    days × buckets × ≤4 KB blobs — this is why warehouses persist
    bitmap pre-aggregates: ANY trailing window (7/28/90-day) folds
    from the same daily bitmaps without touching events again.

    Shape: one map-side-combined bitmap agg over events, a bounded ×7
    explode of the tiny (day, bucket) frame, a second bitmap-OR agg,
    and a semi-join against the observed-days frame so partial windows
    past the calendar edge don't invent days."""
    e = table(spark, sf_dir, "events")
    # SQL-text expressions (r13, guide §4): identical operator tree,
    # fewer Py4J round-trips per plan build.
    daily = (
        e.selectExpr(
            "date_trunc('day', ts) AS day",
            "bitmap_bucket_number(user_id) AS bucket",
            "bitmap_bit_position(user_id) AS pos",
        )
        .groupBy("day", "bucket")
        .agg(F.expr("bitmap_construct_agg(pos) AS bm"))
        # consumed by contrib AND the observed-days semi-join: one
        # lineage cut -> one events scan (bounded days x buckets frame)
        .localCheckpoint(eager=False)
    )
    contrib = daily.selectExpr(
        "explode(sequence(day, day + INTERVAL 6 DAY, INTERVAL 1 DAY))"
        " AS wday",
        "bucket",
        "bm",
    )
    observed = daily.select("day").distinct()
    rolled = (
        contrib.join(
            observed, contrib.wday == observed.day, "left_semi"
        )
        .groupBy("wday", "bucket")
        .agg(F.expr("bitmap_or_agg(bm) AS bm7"))
        .selectExpr("wday", "bitmap_count(bm7) AS bucket_users")
        .groupBy("wday")
        .agg(F.expr("CAST(sum(bucket_users) AS BIGINT) AS rolling_users"))
    )
    return rolled.selectExpr("wday AS day", "rolling_users")


@register(
    "q_agg_cms_eval",
    oracle=f"""
    WITH params(i, a, b) AS (VALUES {", ".join(f"({i}, {a}, {b})" for i, a, b in _CMS_PARAMS)}),
    counters AS (
        SELECT p.i,
               ((l.l_partkey * p.a + p.b) % {_CMS_P}) % {_CMS_W} AS bk,
               count(*) AS c
        FROM lineitem l CROSS JOIN params p
        GROUP BY p.i, bk
    ),
    keys AS (SELECT DISTINCT l_partkey FROM lineitem),
    est AS (
        SELECT k.l_partkey, min(c.c) AS est_count
        FROM keys k
        CROSS JOIN params p
        JOIN counters c
          ON c.i = p.i
         AND c.bk = ((k.l_partkey * p.a + p.b) % {_CMS_P}) % {_CMS_W}
        GROUP BY k.l_partkey
    ),
    exact AS (
        SELECT l_partkey, count(*) AS true_count
        FROM lineitem GROUP BY l_partkey
    ),
    top AS (
        SELECT est.l_partkey, est.est_count, exact.true_count
        FROM est JOIN exact USING (l_partkey)
        ORDER BY est.est_count DESC, est.l_partkey LIMIT 20
    )
    SELECT l_partkey, CAST(est_count AS BIGINT) AS est_count,
           CAST(true_count AS BIGINT) AS true_count,
           CAST(est_count - true_count AS BIGINT) AS overestimate,
           round((est_count - true_count)
                 / CAST(true_count AS DOUBLE) + 1e-9, 6) AS rel_err
    FROM top ORDER BY est_count DESC, l_partkey
    """,
)
def q_agg_cms_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy audit for q_agg_cms_topk: the CMS estimate vs
    the EXACT count for each reported heavy hitter, with the
    (guaranteed non-negative) overestimate and relative error — the
    eval that turns 'we use a sketch' into 'our d=4×w=256 sketch is
    within X% on the keys we actually report', the number a capacity
    dashboard owner needs before trusting the sketch at 100 TB (where
    the exact side of THIS audit runs on a sampled day, not the full
    stream).  One-sided error ≥ 0 is the CMS invariant and is
    hash-checked here, not just asserted in a docstring.

    Shape: the identical fixed-width counter build (1024-row shuffle
    regardless of input) + one exact per-key count agg joined on the
    20 reported keys."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey")

    def buckets(key: F.Column) -> F.Column:
        return F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    (
                        ((key * F.lit(a) + F.lit(b)) % F.lit(_CMS_P))
                        % F.lit(_CMS_W)
                    ).alias("bk"),
                )
                for i, a, b in _CMS_PARAMS
            ]
        )

    counters = (
        li.select(F.explode(buckets(F.col("l_partkey"))).alias("x"))
        .groupBy(F.col("x.i").alias("i"), F.col("x.bk").alias("bk"))
        .agg(F.count("*").alias("c"))
    )
    keys = li.distinct()
    probed = keys.select(
        "l_partkey", F.explode(buckets(F.col("l_partkey"))).alias("x")
    ).select("l_partkey", F.col("x.i").alias("i"), F.col("x.bk").alias("bk"))
    est = (
        probed.join(F.broadcast(counters), ["i", "bk"])
        .groupBy("l_partkey")
        .agg(F.min("c").alias("est_count"))
    )
    exact = li.groupBy("l_partkey").agg(F.count("*").alias("true_count"))
    top = (
        est.join(exact, "l_partkey")
        .orderBy(F.desc("est_count"), F.asc("l_partkey"))
        .limit(20)
    )
    over = F.col("est_count") - F.col("true_count")
    return top.select(
        "l_partkey",
        F.col("est_count").cast("bigint").alias("est_count"),
        F.col("true_count").cast("bigint").alias("true_count"),
        over.cast("bigint").alias("overestimate"),
        F.round(
            over / F.col("true_count").cast("double") + F.lit(1e-9), 6
        ).alias("rel_err"),
    ).orderBy(F.desc("est_count"), F.asc("l_partkey"))
