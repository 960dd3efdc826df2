"""Join operators (SURVEY.md §2 #9-19).

Reference provenance: joins are the core of the reference's SQL analytics
surface (SURVEY.md §0.1 [REC src/etl/.DS_Store:4992]); the concrete join
set is the SURVEY §2 contract [DES].

Scale posture per join:
  * equi joins — declared with `on=` expressions; Catalyst/AQE pick
    broadcast vs shuffled-hash vs sort-merge. Fact⋈fact at 100 TB rides
    sort-merge on the join key; bucketing both sides on the key (see
    catalog.PARTITION_HINTS) removes the shuffle entirely.
  * broadcast — explicit `F.broadcast` hint for dimension tables (#10).
  * theta/range joins (#17, #18) — always carry an equi component
    (nationkey / user_id) so Spark plans a hash/sort-merge join with the
    inequality as a post-join residual, never a cartesian product.
  * as-of (#19) — no native Spark operator; implemented with the
    union+window technique (single shuffle on user_id, no pairwise blow-up)
    which is the scalable formulation — a join-then-argmax would
    materialize O(probe × build) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table
from polybot_data_etl_spark.registry import register


@register(
    "q_join_inner",
    oracle="""
    SELECT o_orderkey, c_name, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'O'
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join; Spark picks the physical strategy (AQE-enabled)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_name", "o_totalprice"
    )


@register(
    "q_join_broadcast",
    oracle="""
    SELECT p_brand, count(*) AS n_items, round(sum(l_extendedprice), 2) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join: explicit hint — the dim side ships to every
    executor, the 100 TB fact side never shuffles."""
    li = table(spark, sf_dir, "lineitem")
    p = F.broadcast(table(spark, sf_dir, "part"))
    return (
        li.join(p, li.l_partkey == p.p_partkey, "inner")
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


@register(
    "q_join_multi",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + filter + agg + deterministic top-N."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q_join_left",
    oracle="""
    SELECT c_custkey, c_name,
           count(o_orderkey) AS n_orders,
           round(sum(coalesce(o_totalprice, 0)), 2) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with null-extension, then aggregation."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))), 2).alias(
                "total_spent"
            ),
        )
    )


@register(
    "q_join_full",
    oracle="""
    SELECT n_nationkey, n_name, s_suppkey, s_name
    FROM nation FULL JOIN supplier ON n_nationkey = s_nationkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (nations without suppliers null-extend)."""
    n = table(spark, sf_dir, "nation")
    s = table(spark, sf_dir, "supplier")
    return n.join(s, n.n_nationkey == s.s_nationkey, "full").select(
        "n_nationkey", "n_name", "s_suppkey", "s_name"
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS): left rows with at least one big order."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS) — complement of q_join_semi."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join — only ever sane on tiny relations (5 × 25 here)."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "q_join_theta",
    oracle="""
    SELECT s_suppkey, s_name, count(*) AS n_richer_than,
           round(sum(c_acctbal), 2) AS sum_poorer_bal
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
    GROUP BY s_suppkey, s_name
    """,
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join bounded by an equi key: the nationkey equi component
    lets Spark hash-partition; the acctbal inequality is a residual."""
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    return (
        s.join(
            c,
            (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal),
            "inner",
        )
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.count("*").alias("n_richer_than"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_poorer_bal"),
        )
    )


@register(
    "q_join_range",
    oracle="""
    SELECT a.event_id AS a_id, b.event_id AS b_id, a.user_id AS user_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 1 HOUR
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range self-join: pairs of same-user events within 1 hour.

    The user_id equi key bounds the pair space per user; at 100 TB the
    scalable variant additionally buckets both sides by time_bucket(ts)
    so candidate pairs stay within adjacent buckets.
    """
    e = table(spark, sf_dir, "events")
    a = e.alias("a")
    b = e.alias("b")
    return a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select(
        F.col("a.event_id").alias("a_id"),
        F.col("b.event_id").alias("b_id"),
        F.col("a.user_id").alias("user_id"),
    )


@register(
    "q_join_range_bucketed",
    oracle="""
    SELECT a.event_id AS a_id, b.event_id AS b_id, a.user_id AS user_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 1 HOUR
    """,
)
def q_join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed formulation of q_join_range (same oracle, identical
    output): the scale path for interval self-joins.

    Both sides bucket by hour — the left side explodes into its own
    bucket and the next (a 1-hour-wide predicate can only match within
    those two) — and the join key becomes (user_id, hour_bucket), with
    the interval condition as a residual.  Candidate volume per task is
    then bounded by events-per-(user, hour) instead of events-per-user:
    a hot user with a year of data stops being a quadratic cell, because
    its pairs split across 8 760 hourly buckets.  Cost: a 2× explode of
    the left side — the classic bucketed-range-join trade."""
    e = table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    a = (
        e.withColumn(
            "bkt", F.explode(F.array(hour, hour + F.expr("INTERVAL 1 HOUR")))
        )
        .select(
            F.col("event_id").alias("a_id"),
            F.col("user_id"),
            F.col("ts").alias("a_ts"),
            "bkt",
        )
    )
    b = e.select(
        F.col("event_id").alias("b_id"),
        F.col("user_id"),
        F.col("ts").alias("b_ts"),
        hour.alias("bkt"),
    )
    return (
        a.join(b, ["user_id", "bkt"])
        .filter(
            (F.col("b_ts") > F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 1 HOUR"))
        )
        .select("a_id", "b_id", "user_id")
    )


@register(
    "q_join_asof",
    oracle="""
    SELECT p.event_id AS probe_id, p.ts AS probe_ts, b.event_id AS match_id
    FROM (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events
          WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events
               WHERE event_type <> 'purchase') b
      ON p.user_id = b.user_id AND b.ts <= p.ts
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest earlier non-purchase
    event of the same user.

    Spark has no ASOF JOIN; the scalable formulation is union + ordered
    window with `last(..., ignorenulls=True)`: one shuffle on (user_id),
    zero pairwise blow-up, O(n log n) per user. Build rows sort before
    probe rows at equal ts so "at-or-before" is inclusive. The ordering
    carries an event_id tiebreak, so even an input WITH duplicate
    (user_id, ts) rows resolves deterministically: among build events
    tied at the matched timestamp, the highest event_id wins
    (tests/test_joins_property.py injects duplicates to pin this down).
    """
    e = table(spark, sf_dir, "events")
    return asof_match(
        e.filter(F.col("event_type") == "purchase"),
        e.filter(F.col("event_type") != "purchase"),
    )


def asof_match(probe_events: DataFrame, build_events: DataFrame) -> DataFrame:
    """As-of core over two events-shaped frames (user_id, ts, event_id):
    for each probe row, the latest build row of the same user with
    build.ts <= probe.ts; ties at the matched timestamp resolve to the
    highest build event_id.  Union + ordered window — one shuffle on
    user_id, no pairwise blow-up (see q_join_asof)."""
    probe = probe_events.select(
        "user_id",
        "ts",
        F.lit(1).alias("is_probe"),
        F.col("event_id").alias("probe_id"),
        F.lit(None).cast("bigint").alias("build_id"),
    )
    build = build_events.select(
        "user_id",
        "ts",
        F.lit(0).alias("is_probe"),
        F.lit(None).cast("bigint").alias("probe_id"),
        F.col("event_id").alias("build_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_probe", F.coalesce("build_id", "probe_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = probe.unionByName(build).withColumn(
        "match_id", F.last("build_id", ignorenulls=True).over(w)
    )
    return (
        merged.filter((F.col("is_probe") == 1) & F.col("match_id").isNotNull())
        .select(
            F.col("probe_id").alias("probe_id"),
            F.col("ts").alias("probe_ts"),
            "match_id",
        )
    )


@register(
    "q_join_asof_fwd",
    oracle="""
    SELECT p.event_id AS probe_id, p.ts AS probe_ts, b.event_id AS match_id
    FROM (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events
          WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events
               WHERE event_type <> 'purchase') b
      ON p.user_id = b.user_id AND b.ts >= p.ts
    """,
)
def q_join_asof_fwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for each purchase, the EARLIEST non-purchase
    event of the same user at-or-after it — 'what did the user do next'
    (backward as-of answers 'state leading in'; forward answers
    post-event attribution / next-touch analysis).

    Same union + ordered window shape as the backward core
    (asof_match), mirrored: the running frame becomes
    currentRow→unboundedFollowing with `first(ignorenulls)`, probe rows
    sort BEFORE build rows at equal ts so at-or-after is inclusive, and
    ties at the matched timestamp resolve to the LOWEST build event_id
    (the ascending mirror of the backward rule).  One shuffle on
    user_id, no pairwise blow-up."""
    e = table(spark, sf_dir, "events")
    return asof_match_forward(
        e.filter(F.col("event_type") == "purchase"),
        e.filter(F.col("event_type") != "purchase"),
    )


def asof_match_forward(
    probe_events: DataFrame, build_events: DataFrame
) -> DataFrame:
    """Forward as-of core: for each probe row, the earliest build row of
    the same user with build.ts >= probe.ts; ties resolve to the lowest
    build event_id.  Mirror of asof_match — see q_join_asof_fwd."""
    probe = probe_events.select(
        "user_id",
        "ts",
        F.lit(1).alias("is_probe"),
        F.col("event_id").alias("probe_id"),
        F.lit(None).cast("bigint").alias("build_id"),
    )
    build = build_events.select(
        "user_id",
        "ts",
        F.lit(0).alias("is_probe"),
        F.lit(None).cast("bigint").alias("probe_id"),
        F.col("event_id").alias("build_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            "ts", F.desc("is_probe"), F.coalesce("build_id", "probe_id")
        )
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    merged = probe.unionByName(build).withColumn(
        "match_id", F.first("build_id", ignorenulls=True).over(w)
    )
    return (
        merged.filter((F.col("is_probe") == 1) & F.col("match_id").isNotNull())
        .select(
            F.col("probe_id").alias("probe_id"),
            F.col("ts").alias("probe_ts"),
            "match_id",
        )
    )


@register(
    "q_join_pit_staleness",
    oracle="""
    SELECT p.event_id AS probe_id, p.ts AS probe_ts, b.event_id AS match_id,
           (epoch_us(p.ts) - epoch_us(b.ts)) // 60000000 AS staleness_min
    FROM (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events
          WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events
               WHERE event_type <> 'purchase') b
      ON p.user_id = b.user_id AND b.ts <= p.ts
    WHERE epoch_us(p.ts) - epoch_us(b.ts) <= 3600000000::BIGINT
    """,
)
def q_join_pit_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join with a staleness bound: the backward as-of
    match, kept only when the matched state is at most 1 hour old, with
    the staleness (whole minutes, integer µs arithmetic) in the output
    — the feature-store read discipline ('use the latest feature value,
    but never one staler than the SLA').

    Shape: the as-of core's single user-keyed window + a residual
    filter on the matched timestamp — the bound never becomes a range
    join.  Probes whose only match is stale drop out (the SLA-violating
    rows a feature pipeline routes to a default/imputation path)."""
    e = table(spark, sf_dir, "events")
    probe = e.filter(F.col("event_type") == "purchase")
    build = e.filter(F.col("event_type") != "purchase")
    matched = asof_match_with_ts(probe, build)
    lag_us = F.expr(
        "unix_micros(cast(probe_ts as timestamp))"
        " - unix_micros(cast(match_ts as timestamp))"
    )
    return (
        matched.withColumn("__lag_us", lag_us)
        .filter(F.col("__lag_us") <= 60 * 60_000_000)
        .select(
            "probe_id",
            "probe_ts",
            "match_id",
            F.expr("__lag_us div 60000000").alias("staleness_min"),
        )
    )


def asof_match_with_ts(
    probe_events: DataFrame, build_events: DataFrame
) -> DataFrame:
    """asof_match variant that also carries the matched build row's
    timestamp (needed by staleness-bounded reads)."""
    probe = probe_events.select(
        "user_id",
        "ts",
        F.lit(1).alias("is_probe"),
        F.col("event_id").alias("probe_id"),
        F.lit(None).cast("bigint").alias("build_id"),
    )
    build = build_events.select(
        "user_id",
        "ts",
        F.lit(0).alias("is_probe"),
        F.lit(None).cast("bigint").alias("probe_id"),
        F.col("event_id").alias("build_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_probe", F.coalesce("build_id", "probe_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bts = F.when(F.col("is_probe") == 0, F.col("ts"))
    merged = (
        probe.unionByName(build)
        .withColumn(
            "match_id", F.last("build_id", ignorenulls=True).over(w)
        )
        .withColumn("match_ts", F.last(bts, ignorenulls=True).over(w))
    )
    return (
        merged.filter((F.col("is_probe") == 1) & F.col("match_id").isNotNull())
        .select(
            F.col("probe_id").alias("probe_id"),
            F.col("ts").alias("probe_ts"),
            "match_id",
            "match_ts",
        )
    )


def fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified fuzzy-match pairs (nationkey, ck_a, ck_b): the
    deletion-neighborhood candidate generator + exact Levenshtein ≤ 1
    verify shared by q_link_fuzzy (aggregate view) and
    q_pipeline_entities (entity resolution). See q_link_fuzzy for the
    algorithm and scale rationale."""
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_name"
    )
    # name itself + all single-deletion variants, via one codegen HOF
    variants = F.concat(
        F.array(F.col("c_name")),
        F.transform(
            F.sequence(F.lit(1), F.length("c_name")),
            lambda i: F.concat(
                F.col("c_name").substr(F.lit(1), i - 1),
                F.col("c_name").substr(i + 1, F.length("c_name")),
            ),
        ),
    )
    keyed = c.select(
        "c_custkey",
        "c_nationkey",
        "c_name",
        F.explode(variants).alias("variant"),
    )
    # Posting-list pair generation (same idiom as the dedup family):
    # ONE shuffle groups each (nation, variant) bucket, then pairs are
    # expanded bucket-locally by a double explode — no self-join, no
    # second scan of the exploded frame.
    buckets = (
        keyed.groupBy("c_nationkey", "variant")
        .agg(
            F.collect_list(F.struct("c_custkey", "c_name")).alias("members")
        )
        .filter(F.size("members") >= 2)
    )
    cand = (
        buckets.select(
            F.col("c_nationkey").alias("nationkey"),
            F.explode("members").alias("m_a"),
            F.col("members"),
        )
        .select(
            "nationkey",
            F.col("m_a.c_custkey").alias("ck_a"),
            F.col("m_a.c_name").alias("name_a"),
            F.explode("members").alias("m_b"),
        )
        .filter(F.col("ck_a") < F.col("m_b.c_custkey"))
        .select(
            "nationkey",
            "ck_a",
            F.col("m_b.c_custkey").alias("ck_b"),
            "name_a",
            F.col("m_b.c_name").alias("name_b"),
        )
        .distinct()  # names sharing several variants appear once
    )
    return cand.filter(F.levenshtein("name_a", "name_b") <= 1).select(
        "nationkey", "ck_a", "ck_b"
    )


@register(
    "q_link_fuzzy",
    oracle="""
    SELECT a.c_nationkey AS nationkey,
           count(*) AS n_matches,
           min(a.c_custkey) AS first_left,
           max(b.c_custkey) AS last_right
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey
     AND a.c_custkey < b.c_custkey
     AND levenshtein(a.c_name, b.c_name) <= 1
    GROUP BY a.c_nationkey
    """,
)
def q_link_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy record linkage: candidate customer pairs whose
    names are within Levenshtein distance 1, generated only inside a
    nation block.

    Candidate generation is **deletion-neighborhood blocking** (the
    spell-checker index): every name emits itself plus its |name|
    single-character-deletion variants; two names at Levenshtein
    distance ≤ 1 MUST share a variant (dist 0 → the name itself;
    substitution → the deletion at the differing position;
    insert/delete → one side's full name equals the other's variant),
    so the equi-join on (nation, variant) finds every true pair while
    only ever joining within tiny variant buckets.  The exact
    ``levenshtein`` then verifies the deduped candidates — thousands
    of rows, not the Σ|block|² matrix a plain nation-block join
    scores (measured: 12.1 s → sub-second at sf0.1, and the gap grows
    quadratically with block size at 100 TB).  The oracle replays the
    naive block-join + filter, which must agree exactly.
    """
    return fuzzy_pairs(spark, sf_dir).groupBy("nationkey").agg(
        F.count("*").alias("n_matches"),
        F.min("ck_a").alias("first_left"),
        F.max("ck_b").alias("last_right"),
    )


@register(
    "q_join_null_safe",
    oracle="""
    WITH fact AS (
        SELECT o_orderkey, nullif(o_orderstatus, 'O') AS st,
               o_totalprice
        FROM orders
    ),
    dim AS (
        SELECT DISTINCT nullif(o_orderstatus, 'O') AS st FROM orders
    )
    SELECT d.st, count(*) AS n_orders,
           round(sum(f.o_totalprice), 2) AS total
    FROM fact f JOIN dim d ON f.st IS NOT DISTINCT FROM d.st
    GROUP BY d.st
    """,
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL
    keys match each other instead of vanishing — the semantics CDC
    merges and dimension lookups need when the business key is
    legitimately nullable (a plain equi-join silently drops every NULL
    row; the null-safe operator keeps them AND stays a hash join,
    since <=> is still an equality predicate Spark can partition on —
    no degradation to a nested-loop).

    The nullable key is derived with nullif so the fixture exercises
    the NULL-matching path deterministically.
    """
    o = table(spark, sf_dir, "orders")
    fact = o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("st"),
        "o_totalprice",
    )
    dim = fact.select("st").distinct().alias("d")
    return (
        fact.alias("f")
        .join(dim, F.col("f.st").eqNullSafe(F.col("d.st")))
        .groupBy(F.col("d.st").alias("st"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


# Interval-overlap join: probe-user set + minimum overlap (minutes).
_OVERLAP_PROBES = 5          # probe users: user_id < 5
_OVERLAP_MIN_MINUTES = 30


@register(
    "q_join_overlap",
    oracle=f"""
    WITH iv AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               min(ts) AS s, max(ts) AS e
        FROM events GROUP BY user_id, date_trunc('day', ts)
    ),
    hits AS (
        SELECT a.day, a.user_id AS probe_id, b.user_id AS other_id,
               -- epoch() yields fractional-second doubles: bit-identical
               -- to Spark's timestamp→double cast, so the floor lands
               -- the same side of every minute boundary in both engines
               -- (date_diff('second') would count boundary CROSSINGS).
               cast(floor((epoch(least(a.e, b.e))
                           - epoch(greatest(a.s, b.s))) / 60.0)
                    AS BIGINT) AS overlap_min
        FROM iv a JOIN iv b
          ON a.day = b.day AND a.user_id <> b.user_id
        WHERE a.user_id < {_OVERLAP_PROBES}
          AND least(a.e, b.e) > greatest(a.s, b.s)
    )
    SELECT day, probe_id,
           cast(count(*) AS BIGINT) AS n_overlapping,
           max(overlap_min) AS max_overlap_min
    FROM hits
    WHERE overlap_min >= {_OVERLAP_MIN_MINUTES}
    GROUP BY day, probe_id
    """,
)
def q_join_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: per-(user, day) activity intervals
    [first event, last event], probe users joined against every other
    user active the same day whose interval overlaps ≥ 30 minutes —
    the concurrent-sessions / co-presence query.

    Shape: intervals come from ONE hash agg on (user_id, day); the
    overlap join is an equi-join on `day` with the overlap predicate
    applied as a post-join filter — the day key gives hash
    partitioning, and the probe side is filtered BEFORE the join (5
    users × days, broadcast). At 100 TB with dense days, the day
    bucket is subdivided by exploding each interval onto covered
    hour-buckets and equi-joining on (day, hour) + dedup, exactly the
    q_join_range_bucketed refinement (joins.py:261) — same machinery,
    finer key."""
    e = table(spark, sf_dir, "events")
    # consumed by both join sides: one lineage cut -> one events scan
    # (bounded user x day frame)
    iv = e.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.min("ts").alias("s"), F.max("ts").alias("e")).localCheckpoint(
        eager=False
    )
    probes = iv.filter(F.col("user_id") < _OVERLAP_PROBES).select(
        F.col("user_id").alias("probe_id"),
        F.col("day"),
        F.col("s").alias("ps"),
        F.col("e").alias("pe"),
    )
    others = iv.select(
        F.col("user_id").alias("other_id"), "day", "s", "e"
    )
    lo = F.greatest(F.col("ps"), F.col("s"))
    hi = F.least(F.col("pe"), F.col("e"))
    # NTZ → TIMESTAMP (session is UTC) → double = fractional epoch
    # seconds, the exact value DuckDB's epoch() yields.
    overlap_min = F.floor(
        (
            hi.cast("timestamp").cast("double")
            - lo.cast("timestamp").cast("double")
        )
        / 60.0
    ).cast("long")
    hits = (
        F.broadcast(probes)
        .join(others, "day")
        .filter(F.col("probe_id") != F.col("other_id"))
        .filter(hi > lo)
        .withColumn("overlap_min", overlap_min)
        .filter(F.col("overlap_min") >= _OVERLAP_MIN_MINUTES)
    )
    return hits.groupBy("day", "probe_id").agg(
        F.count("*").cast("bigint").alias("n_overlapping"),
        F.max("overlap_min").alias("max_overlap_min"),
    )


@register(
    "q_join_nearest",
    oracle="""
    WITH u AS (
        SELECT user_id, ts::TIMESTAMP AS ts,
               CASE WHEN event_type = 'click' THEN 1 ELSE NULL END
                   AS is_probe,
               CASE WHEN event_type = 'click' THEN event_id END AS probe_id,
               CASE WHEN event_type = 'purchase' THEN event_id END
                   AS build_id,
               CASE WHEN event_type = 'purchase' THEN ts::TIMESTAMP END
                   AS build_ts
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    m AS (
        SELECT user_id, ts, probe_id,
               last_value(build_id IGNORE NULLS) OVER w_prev AS prev_id,
               last_value(build_ts IGNORE NULLS) OVER w_prev AS prev_ts,
               first_value(build_id IGNORE NULLS) OVER w_next AS next_id,
               first_value(build_ts IGNORE NULLS) OVER w_next AS next_ts
        FROM u
        WINDOW w_prev AS (
            PARTITION BY user_id
            ORDER BY ts, is_probe NULLS FIRST,
                     coalesce(build_id, probe_id)
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (
            PARTITION BY user_id
            ORDER BY ts, is_probe NULLS FIRST,
                     coalesce(build_id, probe_id)
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT probe_id AS click_id,
           CASE WHEN next_id IS NULL THEN prev_id
                WHEN prev_id IS NULL THEN next_id
                WHEN date_diff('second', prev_ts, ts)
                     <= date_diff('second', ts, next_ts) THEN prev_id
                ELSE next_id END AS nearest_purchase_id,
           CASE WHEN next_id IS NULL THEN 'prev'
                WHEN prev_id IS NULL THEN 'next'
                WHEN date_diff('second', prev_ts, ts)
                     <= date_diff('second', ts, next_ts) THEN 'prev'
                ELSE 'next' END AS direction,
           CAST(CASE WHEN next_id IS NULL
                     THEN date_diff('second', prev_ts, ts)
                WHEN prev_id IS NULL THEN date_diff('second', ts, next_ts)
                WHEN date_diff('second', prev_ts, ts)
                     <= date_diff('second', ts, next_ts)
                     THEN date_diff('second', prev_ts, ts)
                ELSE date_diff('second', ts, next_ts) END AS BIGINT)
               AS gap_sec
    FROM m
    WHERE probe_id IS NOT NULL
      AND (prev_id IS NOT NULL OR next_id IS NOT NULL)
    """,
)
def q_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-event join: each click matched to the temporally CLOSEST
    purchase of the same user in either direction (prev wins gap ties)
    — the bidirectional completion of q_join_asof (backward) and
    q_join_asof_fwd (forward); the feature-engineering primitive for
    "time to nearest conversion".

    Same union + ordered window machinery as asof_match — one shuffle
    on user_id, zero pairwise blow-up: the backward candidate is
    last(purchase, ignorenulls) over the inclusive preceding frame,
    the forward one first(purchase, ignorenulls) over the strictly-
    following frame (purchases sort before ties-at-equal-ts clicks, so
    at-equal-ts purchases count as 'prev' — gap 0, prev tiebreak).
    Deterministic under duplicate timestamps via the build-id ordering
    (max prev id / min next id, same convention as asof_match)."""
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    is_click = F.col("event_type") == "click"
    u = e.select(
        "user_id",
        "ts",
        F.when(is_click, 1).alias("is_probe"),
        F.when(is_click, F.col("event_id")).alias("probe_id"),
        F.when(~is_click, F.col("event_id")).alias("build_id"),
        F.when(~is_click, F.col("ts")).alias("build_ts"),
    )
    order = [
        F.col("ts"),
        F.col("is_probe").asc_nulls_first(),
        F.coalesce("build_id", "probe_id"),
    ]
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    m = u.select(
        "ts",
        "probe_id",
        F.last("build_id", ignorenulls=True).over(w_prev).alias("prev_id"),
        F.last("build_ts", ignorenulls=True).over(w_prev).alias("prev_ts"),
        F.first("build_id", ignorenulls=True).over(w_next).alias("next_id"),
        F.first("build_ts", ignorenulls=True).over(w_next).alias("next_ts"),
    ).filter(
        F.col("probe_id").isNotNull()
        & (F.col("prev_id").isNotNull() | F.col("next_id").isNotNull())
    )
    gap_prev = F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")
    gap_next = F.unix_timestamp("next_ts") - F.unix_timestamp("ts")
    prev_wins = F.col("next_id").isNull() | (
        F.col("prev_id").isNotNull() & (gap_prev <= gap_next)
    )
    return m.select(
        F.col("probe_id").alias("click_id"),
        F.when(prev_wins, F.col("prev_id"))
        .otherwise(F.col("next_id"))
        .alias("nearest_purchase_id"),
        F.when(prev_wins, "prev").otherwise("next").alias("direction"),
        F.when(prev_wins, gap_prev)
        .otherwise(gap_next)
        .cast("bigint")
        .alias("gap_sec"),
    )


@register(
    "q_join_lead_time",
    oracle="""
    WITH per_order AS (
        SELECT o.o_orderkey, o.o_orderpriority,
               date_diff('day', o.o_orderdate::TIMESTAMP,
                         min(l.l_shipdate)::TIMESTAMP) AS first_lead,
               date_diff('day', o.o_orderdate::TIMESTAMP,
                         max(l.l_shipdate)::TIMESTAMP) AS last_lead
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(avg(first_lead) + 1e-9, 4) AS avg_first_ship_days,
           round(avg(last_lead) + 1e-9, 4) AS avg_complete_days,
           round(quantile_cont(last_lead, 0.9) + 1e-9, 4)
               AS p90_complete_days,
           round(sum(CASE WHEN last_lead > 90 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE) + 1e-9, 4) AS late_share
    FROM per_order GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q_join_lead_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-fulfilment lead time by priority: days from order date to
    FIRST shipment (responsiveness) and to LAST shipment (completion),
    with the p90 completion tail and the >90-day late share — the
    order⋈lineitem lifecycle rollup a fulfilment dashboard leads with,
    and the canonical header⋈detail temporal join (every lead is an
    exact integer day difference).

    Shape: one fact-fact equi-join on the orderkey (co-partitionable;
    the bucketed zero-exchange layout from tests/test_bucketing.py is
    the 100 TB form) → per-order min/max (map-side combined) → k-row
    priority rollup with one exact p90 percentile per group."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    per = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(
            F.datediff(F.min("l_shipdate"), F.col("o_orderdate")).alias(
                "first_lead"
            ),
            F.datediff(F.max("l_shipdate"), F.col("o_orderdate")).alias(
                "last_lead"
            ),
        )
    )
    return (
        per.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(F.avg("first_lead") + F.lit(1e-9), 4).alias(
                "avg_first_ship_days"
            ),
            F.round(F.avg("last_lead") + F.lit(1e-9), 4).alias(
                "avg_complete_days"
            ),
            F.round(
                F.percentile("last_lead", F.lit(0.9)) + F.lit(1e-9), 4
            ).alias("p90_complete_days"),
            F.round(
                F.sum(F.when(F.col("last_lead") > 90, 1).otherwise(0))
                / F.count("*").cast("double")
                + F.lit(1e-9),
                4,
            ).alias("late_share"),
        )
        .orderBy("o_orderpriority")
    )
