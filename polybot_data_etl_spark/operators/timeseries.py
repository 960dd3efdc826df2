"""Time-series / sessionization operators over the events table
(SURVEY.md §2 #62-66).

Reference provenance: the reference ingested timestamped social-media
events via scheduled DAGs (SURVEY.md §0.1 [REC src/etl/.DS_Store:4248,88]);
the time-series query surface is the SURVEY §2 contract [DES]. The
streaming twins of these queries live in polybot_data_etl_spark/streaming/.

Scale posture: tumbling/sliding windows are plain hash aggs on the
bucketed timestamp (map-side partials collapse 100 TB of events to one
row per bucket per partition before the shuffle). Session windows
shuffle once on user_id. With the events lake partitioned by date(ts)
(catalog.PARTITION_HINTS), time-bounded queries prune at the file level.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table
from polybot_data_etl_spark.functions.stats import _phi_sql
from polybot_data_etl_spark.registry import register


@register(
    "q_ts_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket,
           count(*) AS n,
           round(sum(value), 2) AS total
    FROM (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events) e
    GROUP BY bucket
    """,
)
def q_ts_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregation.

    Spark's window() is epoch-aligned, matching DuckDB time_bucket.
    """
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("bucket"), "n", "total")
    )


@register(
    "q_ts_sliding",
    oracle="""
    SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL (k * 30) MINUTE AS bucket,
           count(*) AS n,
           round(sum(value), 2) AS total
    FROM (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events) e,
         (VALUES (0), (1)) offsets(k)
    GROUP BY bucket
    """,
)
def q_ts_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1-hour windows sliding every 30 minutes.

    Every event lands in exactly 2 windows: the ones starting at
    floor30(ts) and floor30(ts) − 30 min (both epoch-aligned).
    """
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("bucket"), "n", "total")
    )


@register(
    "q_ts_session",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               -- STRICT > : Spark session_window end = last + gap and an
               -- event at exactly that end point EXTENDS the session
               -- (verified empirically: tests/test_edge_cases.py
               -- test_session_exact_gap_boundary), so only a gap
               -- strictly larger than 30 min breaks it
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS brk
        FROM (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events) e
    ), numbered AS (
        SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS session_id
        FROM flagged
    )
    SELECT user_id,
           min(ts) AS s_start,
           max(ts) + INTERVAL 30 MINUTE AS s_end,
           count(*) AS n,
           round(sum(value), 2) AS total
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def q_ts_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute inactivity gap) per user.

    Spark session_window end = last event + gap; the oracle replicates
    that bound via the gaps-and-islands rewrite (SURVEY §2.1.11).
    """
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            "user_id",
            F.col("w.start").alias("s_start"),
            F.col("w.end").alias("s_end"),
            "n",
            "total",
        )
    )


@register(
    "q_ts_funnel",
    oracle="""
    SELECT count(*) AS n_converted,
           round(avg(date_diff('second', t_signup, t_purchase) / 3600.0), 2)
               AS avg_hours_to_convert
    FROM (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events) e
        GROUP BY user_id
    )
    WHERE t_signup IS NOT NULL AND t_purchase IS NOT NULL AND t_signup < t_purchase
    """,
)
def q_ts_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion: users whose first signup precedes first purchase."""
    e = table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    converted = per_user.filter(
        F.col("t_signup").isNotNull()
        & F.col("t_purchase").isNotNull()
        & (F.col("t_signup") < F.col("t_purchase"))
    )
    hours = (
        F.expr("timestampdiff(SECOND, t_signup, t_purchase)").cast("double") / 3600.0
    )
    return converted.agg(
        F.count("*").alias("n_converted"),
        F.round(F.avg(hours), 2).alias("avg_hours_to_convert"),
    )


@register(
    "q_ts_cohort",
    oracle="""
    WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events),
    first_seen AS (
        SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
        FROM ev GROUP BY user_id
    )
    SELECT f.cohort_day AS cohort_day,
           date_trunc('day', e.ts) AS activity_day,
           count(DISTINCT e.user_id) AS n_active
    FROM ev e JOIN first_seen f ON e.user_id = f.user_id
    GROUP BY cohort_day, activity_day
    """,
)
def q_ts_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort/retention matrix: first-seen day × activity day.

    first_seen is one row per user (small) — broadcast back to events.
    """
    e = table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    return (
        e.join(F.broadcast(first_seen), "user_id")
        .groupBy("cohort_day", F.date_trunc("day", F.col("ts")).alias("activity_day"))
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@register(
    "q_ts_gapfill",
    oracle="""
    WITH obs AS (
        SELECT user_id, date_trunc('hour', ts) AS hour,
               count(*) AS n_events,
               round(sum(value), 2) AS hour_value
        FROM events GROUP BY user_id, date_trunc('hour', ts)
    ),
    bounds AS (
        SELECT user_id, min(hour) AS h0, max(hour) AS h1
        FROM obs GROUP BY user_id
    ),
    spine AS (
        SELECT user_id,
               unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        FROM bounds
    )
    SELECT s.user_id, s.hour,
           CAST(coalesce(o.n_events, 0) AS BIGINT) AS n_events,
           last_value(o.hour_value IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_ffill
    FROM spine s
    LEFT JOIN obs o ON o.user_id = s.user_id AND o.hour = s.hour
    """,
)
def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid resample + forward fill: per user, an hourly spine
    from their first to last active hour, hours with no events carrying
    0 events and the last observed hourly value forward — the gap-fill
    every downstream time-series model (and TimescaleDB's
    ``time_bucket_gapfill`` / ``locf``) expects.

    Shape: hourly pre-agg first (map-side partials collapse raw events
    before any shuffle), per-user bounds from the AGGREGATED frame, the
    spine via ``sequence()`` + explode (rows generated ∝ output, never a
    cross join against a global calendar), one (user_id, hour) equi-join
    back, and the fill as ``last(ignorenulls)`` over a user-partitioned
    running window — user_id is high-cardinality, so every stage
    partitions well at 100 TB.  The hourly value is rounded BEFORE the
    fill so filled copies are bit-identical to their source row on both
    engines."""
    from pyspark.sql.window import Window

    e = table(spark, sf_dir, "events")
    obs = e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("hour_value"),
    )
    spine = (
        obs.groupBy("user_id")
        .agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("h0", "h1", F.expr("interval 1 hour"))
            ).alias("hour"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return spine.join(obs, ["user_id", "hour"], "left").select(
        "user_id",
        "hour",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("hour_value", ignorenulls=True).over(w).alias("value_ffill"),
    )


@register(
    "q_ts_anomaly",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               count(*) AS n
        FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    stats AS (
        SELECT event_type,
               count(*) AS c,
               CAST(sum(n) AS BIGINT) AS s,
               CAST(sum(n * n) AS BIGINT) AS sq
        FROM daily GROUP BY event_type
    )
    SELECT d.event_type, d.day, d.n,
           round((d.n - s::DOUBLE / c)
                 / sqrt((c * sq - s * s)::DOUBLE / (c * (c - 1)))
                 + 1e-9, 4) AS z,
           abs((d.n - s::DOUBLE / c)
               / sqrt((c * sq - s * s)::DOUBLE / (c * (c - 1)))) > 2.0
               AS is_anomaly
    FROM daily d JOIN stats USING (event_type)
    """,
)
def q_ts_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: each (event_type, day) daily count
    scored as a z-value against that type's own daily distribution,
    flagged when |z| > 2 — the monitoring query that catches ingest
    outages (z ≪ 0) and bot floods (z ≫ 0) in an event lake.

    The variance is computed from exact integer moments
    ((c·Σn² − (Σn)²) / (c·(c−1))) rather than stddev_samp: both engines
    then derive z from the SAME integers through IEEE-exact ops
    (division, sqrt), so the hash gate can't be tripped by the
    last-ulp differences of incremental variance algorithms.  Shape:
    two hash aggs (map-side partials) + a broadcast join of the
    per-type stats (one row per event type) back onto the daily frame."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("c"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("sq"),
    )
    c, s, sq = F.col("c"), F.col("s"), F.col("sq")
    # try_divide: a 1-day (or constant) series has no sample variance —
    # z undefined, NULL not an ANSI crash (round-6 degenerate audit)
    z = F.try_divide(
        F.col("n") - s.cast("double") / c,
        F.sqrt(
            F.try_divide((c * sq - s * s).cast("double"), c * (c - 1))
        ),
    )
    return (
        daily.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "day",
            "n",
            F.round(z + F.lit(1e-9), 4).alias("z"),
            (F.abs(z) > 2.0).alias("is_anomaly"),
        )
    )


@register(
    "q_ts_resample",
    oracle="""
    WITH ordered AS (
        SELECT date_trunc('day', ts) AS day, event_type, value,
               row_number() OVER (
                   PARTITION BY date_trunc('day', ts), event_type
                   ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (
                   PARTITION BY date_trunc('day', ts), event_type
                   ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events) e
    )
    SELECT day, event_type,
           round(max(CASE WHEN rn_a = 1 THEN value END), 2) AS open,
           round(max(value), 2) AS high,
           round(min(value), 2) AS low,
           round(max(CASE WHEN rn_d = 1 THEN value END), 2) AS close,
           count(*) AS n,
           round(sum(value), 2) AS total
    FROM ordered GROUP BY day, event_type
    """,
)
def q_ts_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample to daily OHLC bars per event type: open/close = first/
    last value in event-time order (event_id tiebreak for determinism),
    high/low/volume from plain min/max/sum — the resampling step behind
    any metrics rollup or candlestick store.

    Shape: the two row_number windows and the final agg all hash on the
    SAME key (day, event_type), so Catalyst plans ONE shuffle and the
    windows + agg run in a single stage pipeline per partition; the key
    is a time bucket × type, which grows with the time span (no skew
    pileup on a single reducer at 100 TB — each day×type is one group)."""
    from pyspark.sql.window import Window

    e = table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    staged = e.select(
        day.alias("day"), "event_type", "value", "ts", "event_id"
    )
    w_a = Window.partitionBy("day", "event_type").orderBy("ts", "event_id")
    w_d = Window.partitionBy("day", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        staged.withColumn("rn_a", F.row_number().over(w_a))
        .withColumn("rn_d", F.row_number().over(w_d))
        .groupBy("day", "event_type")
        .agg(
            F.round(
                F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 2
            ).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(
                F.max(F.when(F.col("rn_d") == 1, F.col("value"))), 2
            ).alias("close"),
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
    )


@register(
    "q_ts_locf",
    oracle="""
    SELECT event_id, user_id, ts,
           round(last_value(
               CASE WHEN event_type = 'purchase' THEN value END
               IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 2) AS last_purchase
    FROM (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events) e
    """,
)
def q_ts_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward over an irregular event stream:
    annotate every event with the user's most recent 'purchase' value —
    the sparse-to-dense feature join (\"state as of this event\") used
    when labeling sessions with the last conversion.

    Shape: one window partitioned by user_id (high-cardinality key),
    running frame, `last(ignorenulls)` — a single shuffle, no join;
    the filter-to-purchase happens inside the window expression so the
    stream is scanned once."""
    from pyspark.sql.window import Window

    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.last(pv, ignorenulls=True).over(w), 2).alias(
            "last_purchase"
        ),
    )


_EWMA_ALPHA = 0.25
_EWMA_K = 20  # bounded lookback: EWMA over the last K observations


@register(
    "q_ts_ewma",
    oracle=f"""
    WITH arrs AS (
        SELECT event_id, user_id, ts,
               list(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {_EWMA_K - 1} PRECEDING AND CURRENT ROW
               ) AS arr
        FROM (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events) e
    )
    SELECT event_id, user_id, ts,
           floor(list_reduce(arr,
               (acc, x) -> acc * {1 - _EWMA_ALPHA} + x * {_EWMA_ALPHA})
               * 10000 + 0.5) / 10000 AS ewma
    FROM arrs
    """,
)
def q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of each user's value
    stream, bounded to the last K=20 observations (the tail weight
    (1-α)^20 ≈ 0.3% is below the output rounding, so the bounded form
    is the scale-safe twin of the unbounded recurrence — a running
    frame would serialize each user's whole history through one state).

    Both engines evaluate the SAME left fold seeded with the window's
    oldest element (DuckDB `list_reduce` seeds from element 1; Spark
    `aggregate` is seeded explicitly with element 1 over the rest), so
    the fold result is bit-identical; the final rounding is the
    engine-neutral half-up `floor(x·10⁴ + 0.5)/10⁴` (values are
    positive) because the built-in round() functions disagree at
    half boundaries (Spark decimal HALF_UP vs DuckDB double rounding —
    the q_win_moving exact-cents lesson).

    Shape: one user-partitioned window collecting a ≤K-element array,
    then a JVM-side higher-order fold — one shuffle, no UDF."""
    from pyspark.sql.window import Window

    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_K - 1), Window.currentRow)
    )
    # collect_list drops NULL values, so a window of all-NULL rows
    # yields an EMPTY arr: guard both the slice length (never negative)
    # and the seed (NULL ewma, not an ANSI crash) — null-injection audit
    fold = (
        "case when size(arr) = 0 then cast(null as double) else"
        " floor(aggregate(slice(arr, 2, greatest(size(arr) - 1, 0)),"
        " cast(element_at(arr, 1) as double),"
        f" (acc, x) -> acc * {1 - _EWMA_ALPHA} + x * {_EWMA_ALPHA})"
        " * 10000 + 0.5) / 10000 end"
    )
    return (
        e.withColumn("arr", F.collect_list("value").over(w))
        .select(
            "event_id",
            "user_id",
            "ts",
            F.expr(fold).alias("ewma"),
        )
    )


@register(
    "q_ts_rollup",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h, event_type,
               count(*) AS n, sum(value) AS v
        FROM (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events) e
        GROUP BY date_trunc('hour', ts), event_type
    )
    SELECT date_trunc('day', h) AS day, event_type,
           CAST(sum(n) AS BIGINT) AS n,
           round(sum(v), 2) AS total
    FROM hourly GROUP BY date_trunc('day', h), event_type
    """,
)
def q_ts_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical rollup: daily totals re-aggregated
    FROM the hourly pre-aggregate rather than from raw events — the
    continuous-aggregate pattern (TimescaleDB rollups, Druid/Pinot
    star-tree) where each coarser granularity reuses the finer one.

    Both levels are algebraic (count/sum merge losslessly), which is
    exactly the property that makes the pattern safe; the oracle runs
    the same two-level plan so the float summation tree matches.  Shape:
    two stacked map-side-combined hash aggs; at 100 TB the hourly level
    is a materialized continuous aggregate (managed table partitioned
    by day) and the daily query reads ~24 rows per (day, type) instead
    of the raw stream — this query IS that read path."""
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
    ).agg(F.count("*").alias("n"), F.sum("value").alias("v"))
    return (
        hourly.groupBy(
            F.date_trunc("day", F.col("h")).alias("day"), "event_type"
        )
        .agg(
            F.sum("n").alias("n"),
            F.round(F.sum("v"), 2).alias("total"),
        )
    )


@register(
    "q_ts_pct_change",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               round(sum(value), 2) AS total
        FROM (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events) e
        GROUP BY event_type, date_trunc('day', ts)
    )
    SELECT event_type, day, total,
           round((total - lag(total) OVER w) / lag(total) OVER w * 100
                 + 1e-9, 4) AS pct_change
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """,
)
def q_ts_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period delta: each event type's daily total with its
    day-over-day percent change (NULL on the first day) — the core of
    any metrics dashboard.

    The daily totals are rounded BEFORE the ratio so both engines
    divide the same 2-decimal inputs; the ratio itself is one IEEE
    division + multiply, nudged against boundary ties.  Shape: one
    hash agg to day grain, then a lag() window over the tiny per-type
    daily frame — the window input is |types|×|days| rows no matter
    the raw volume."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("total"))
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("total").over(w)
    return daily.select(
        "event_type",
        "day",
        "total",
        F.round(
            (F.col("total") - prev) / prev * 100 + F.lit(1e-9), 4
        ).alias("pct_change"),
    )


@register(
    "q_ts_funnel3",
    oracle="""
    WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events),
    s1 AS (
        SELECT user_id, min(ts) AS t1 FROM ev
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM ev e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts > s1.t1
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM ev e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        GROUP BY e.user_id
    )
    SELECT count(s1.t1) AS n_signup,
           count(s2.t2) AS n_click_after,
           count(s3.t3) AS n_purchase_after
    FROM s1
    LEFT JOIN s2 ON s1.user_id = s2.user_id
    LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
)
def q_ts_funnel3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order three-step funnel (signup → first click AFTER the
    signup → first purchase AFTER that click): per-step reach counts,
    generalizing the two-step funnel (#65) to ordered chains — the
    sequence constraint is what distinguishes a real conversion path
    from mere co-occurrence.

    Shape: each step is a filtered per-user min-aggregate joined
    against the previous step's (user, ts) frame — the step frames are
    one row per qualifying user (far smaller than the events), so the
    per-step joins broadcast; three passes over the (pruned) event
    scan, each map-side combined.  The same chain extends to K steps
    linearly."""
    e = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    # s1/s2 each feed the next step AND the final reach join; lazy cuts
    # on the one-row-per-user step frames keep each step's event scan
    # to a single execution (6 scans → 3 without them).
    s1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .localCheckpoint(eager=False)
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(F.broadcast(s1), "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .localCheckpoint(eager=False)
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(s2), "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .agg(
            F.count("t1").alias("n_signup"),
            F.count("t2").alias("n_click_after"),
            F.count("t3").alias("n_purchase_after"),
        )
    )


@register(
    "q_ts_dau_wau",
    oracle="""
    WITH active AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS d
        FROM (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events) e
    ),
    dau AS (SELECT d, count(*) AS dau FROM active GROUP BY d),
    spread AS (
        SELECT user_id, d + INTERVAL (k) DAY AS d
        FROM active, range(0, 7) t(k)
    ),
    wau AS (
        SELECT d, count(DISTINCT user_id) AS wau FROM spread GROUP BY d
    )
    SELECT dau.d AS day, dau.dau, wau.wau,
           round(dau.dau * 1.0 / wau.wau + 1e-9, 4) AS stickiness
    FROM dau JOIN wau ON dau.d = wau.d
    """,
)
def q_ts_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day — the engagement
    ratio every product dashboard leads with.  The trailing-window
    distinct is rewritten as a forward SPREAD (each active (user, day)
    projects onto the 7 days it keeps the user 'weekly-active' for)
    followed by a plain distinct count — windows can't do COUNT
    DISTINCT over a frame, and the spread shape is one narrow 7×
    Generate plus a hash agg, both map-side combinable at any scale.
    Days with zero DAU don't appear (inner join) — dashboard spines
    come from q_ts_gapfill's pattern."""
    e = table(spark, sf_dir, "events")
    active = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d")
    ).distinct().localCheckpoint(eager=False)
    dau = active.groupBy("d").agg(F.count("*").alias("dau"))
    spread = active.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.col("d") + F.expr("INTERVAL 6 DAY"),
                       F.expr("INTERVAL 1 DAY"))
        ).alias("d"),
    )
    wau = spread.groupBy("d").agg(F.countDistinct("user_id").alias("wau"))
    return (
        dau.join(wau, "d")
        .select(
            F.col("d").alias("day"),
            "dau",
            "wau",
            F.round(
                F.col("dau") * F.lit(1.0) / F.col("wau") + F.lit(1e-9), 4
            ).alias("stickiness"),
        )
    )


@register(
    "q_ts_autocorr",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
        FROM (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events) e
        GROUP BY event_type, date_trunc('day', ts)
    ),
    lagged AS (
        SELECT event_type, n AS x,
               lag(n) OVER (PARTITION BY event_type ORDER BY day) AS y
        FROM daily
    ),
    m AS (
        SELECT event_type,
               count(*) AS c,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM lagged WHERE y IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, c AS n_pairs,
           round((c * sxy - sx * sy)
                 / sqrt((c * sxx - sx * sx)::DOUBLE
                        * (c * syy - sy * sy)::DOUBLE)
                 + 1e-9, 4) AS autocorr_lag1
    FROM m
    """,
)
def q_ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each event type's daily volume — the
    trend/seasonality detector (≈0 for memoryless traffic, high for
    trending or weekly-patterned streams, negative for alternating
    load).

    The daily counts are INTEGERS, so the five moments are exact and
    both engines compute the correlation from identical integers
    through the same algebra (the q_ts_anomaly recipe) — only the final
    division/sqrt are floats, nudged at rounding.  Shape: one hash agg
    to day grain, a lag window over the tiny per-type daily frame, one
    moment agg."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        F.col("n").alias("x"),
        F.lag("n").over(w).alias("y"),
    ).filter(F.col("y").isNotNull())
    m = lagged.groupBy("event_type").agg(
        F.count("*").alias("c"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    c, sx, sy = F.col("c"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return m.select(
        "event_type",
        c.alias("n_pairs"),
        F.round(
            (c * sxy - sx * sy)
            / F.sqrt(
                (c * sxx - sx * sx).cast("double")
                * (c * syy - sy * sy).cast("double")
            )
            + F.lit(1e-9),
            4,
        ).alias("autocorr_lag1"),
    )


@register(
    "q_ts_interp",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               count(*)::DOUBLE AS n
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    bounds AS (
        SELECT event_type, min(h) AS h0, max(h) AS h1
        FROM hourly GROUP BY event_type
    ),
    spine AS (
        SELECT event_type,
               unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        FROM bounds
    ),
    joined AS (
        SELECT s.event_type, s.h,
               date_diff('hour', TIMESTAMP '1970-01-01', s.h) AS hidx,
               o.n
        FROM spine s LEFT JOIN hourly o
          ON o.event_type = s.event_type AND o.h = s.h
    ),
    fenced AS (
        SELECT event_type, h, hidx, n,
               last_value(n IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY hidx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS prev_n,
               last_value(CASE WHEN n IS NOT NULL THEN hidx END IGNORE NULLS)
                   OVER (
                   PARTITION BY event_type ORDER BY hidx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS prev_h,
               first_value(n IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY hidx
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) AS next_n,
               first_value(CASE WHEN n IS NOT NULL THEN hidx END IGNORE NULLS)
                   OVER (
                   PARTITION BY event_type ORDER BY hidx
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) AS next_h
        FROM joined
    )
    SELECT event_type, h,
           round(CASE WHEN n IS NOT NULL THEN n
                 ELSE prev_n + (next_n - prev_n) * (hidx - prev_h)
                      / (next_h - prev_h) END, 4) AS value,
           (n IS NULL) AS interpolated
    FROM fenced
    """,
)
def q_ts_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gapfill: the hourly volume series per event
    type on a dense min→max hour spine, missing hours filled by
    interpolating between the nearest observed neighbors (the
    time-series counterpart of LOCF — LOCF holds, interp slopes).

    Same spine discipline as q_ts_gapfill: the dense axis is generated
    per group with `sequence` (a Generate, no join against a calendar
    table), and the neighbor search is two ignorenulls window fences —
    never a per-gap self-join.  Gap positions interpolate on integer
    epoch-hour indices, portable across engines.  Interior spine rows
    always have both fences (the spine ends at observed extremes), so
    no NULL edge cases leak out.
    """
    from pyspark.sql.window import Window

    e = table(spark, sf_dir, "events")
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").cast("double").alias("n"))
        # Feeds both the spine bounds and the observation join — pin
        # the hour-bounded frame so events is scanned once.
        .localCheckpoint(eager=False)
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    joined = spine.join(hourly, ["event_type", "h"], "left").select(
        "event_type",
        "h",
        F.expr("unix_micros(cast(h as timestamp)) div 3600000000").alias(
            "hidx"
        ),
        "n",
    )
    w_back = (
        Window.partitionBy("event_type")
        .orderBy("hidx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("event_type")
        .orderBy("hidx")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("n").isNotNull(), F.col("hidx"))
    fenced = joined.select(
        "event_type",
        "h",
        "hidx",
        "n",
        F.last("n", ignorenulls=True).over(w_back).alias("prev_n"),
        F.last(obs_h, ignorenulls=True).over(w_back).alias("prev_h"),
        F.first("n", ignorenulls=True).over(w_fwd).alias("next_n"),
        F.first(obs_h, ignorenulls=True).over(w_fwd).alias("next_h"),
    )
    interp = F.col("prev_n") + (F.col("next_n") - F.col("prev_n")) * (
        F.col("hidx") - F.col("prev_h")
    ) / (F.col("next_h") - F.col("prev_h"))
    return fenced.select(
        "event_type",
        "h",
        F.round(
            F.when(F.col("n").isNotNull(), F.col("n")).otherwise(interp), 4
        ).alias("value"),
        F.col("n").isNull().alias("interpolated"),
    )


@register(
    "q_ts_forecast_snaive",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS d, count(*) AS n
        FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    scored AS (
        SELECT event_type, d, n,
               lag(n, 7) OVER (
                   PARTITION BY event_type ORDER BY d
               ) AS forecast
        FROM daily
    )
    SELECT event_type,
           count(*) AS n_days,
           round(avg(abs(n - forecast)), 4) AS mae,
           round(avg(abs(n - forecast) / n), 4) AS mape
    FROM scored
    WHERE forecast IS NOT NULL
    GROUP BY event_type
    """,
)
def q_ts_forecast_snaive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's volume as
    the volume 7 observed days earlier (weekly seasonality), and score
    MAE / MAPE per event type over the days where the lag exists — the
    baseline every real forecasting model must beat, and the shape of
    a backtest harness (prediction = pure window function, scoring =
    one aggregate).

    All windows run over the daily pre-aggregate (≤31 rows per type);
    the error ratios are integer-over-integer division, portable
    across engines.
    """
    from pyspark.sql.window import Window

    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("d")
    scored = daily.withColumn("forecast", F.lag("n", 7).over(w))
    err = F.abs(F.col("n") - F.col("forecast"))
    return (
        scored.filter(F.col("forecast").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.round(F.avg(err), 4).alias("mae"),
            F.round(F.avg(err / F.col("n")), 4).alias("mape"),
        )
    )


# Holt's linear-trend smoothing constants (exact decimal literals —
# both engines parse the same doubles).
_HOLT_ALPHA = 0.5
_HOLT_BETA = 0.3


@register(
    "q_ts_holt",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               cast(count(*) AS DOUBLE) AS y
        FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    series AS (
        SELECT event_type,
               list(y ORDER BY day) AS ys
        FROM daily GROUP BY event_type
    ),
    -- The fold is a recursive CTE, NOT list_reduce: DuckDB 1.0's
    -- list_reduce mutates a struct accumulator field-by-field, so a
    -- later field's expression reads the EARLIER field's new value
    -- (aliasing); a recursive CTE's SELECT list evaluates all columns
    -- against the prior row, which is the fold semantics both engines
    -- share. e-notation keeps every constant DOUBLE.
    fitted AS (
        WITH RECURSIVE r AS (
            SELECT event_type, 2 AS i, ys[2] AS l, ys[2] - ys[1] AS b
            FROM series
            UNION ALL
            SELECT r.event_type, r.i + 1,
                   5e-1 * s.ys[r.i + 1] + 5e-1 * (r.l + r.b),
                   3e-1 * ((5e-1 * s.ys[r.i + 1] + 5e-1 * (r.l + r.b))
                           - r.l)
                       + 7e-1 * r.b
            FROM r JOIN series s USING (event_type)
            WHERE r.i < len(s.ys)
        )
        SELECT r.event_type, r.i AS n_days, r.l, r.b
        FROM r JOIN series s USING (event_type)
        WHERE r.i = len(s.ys)
    )
    SELECT event_type, cast(n_days AS BIGINT) AS n_days,
           round(l, 4) AS level,
           round(b, 4) AS trend,
           round(l + 1 * b, 4) AS fc_1,
           round(l + 2 * b, 4) AS fc_2,
           round(l + 3 * b, 4) AS fc_3
    FROM fitted ORDER BY event_type
    """,
)
def q_ts_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend exponential smoothing over the daily event
    count per type (α=0.5, β=0.3), initialized l₀=y₂, b₀=y₂−y₁, folded
    over days 3..n, with 1/2/3-day-ahead forecasts l+h·b — the classic
    double-exponential forecaster (Holt 1957; q_ts_forecast_snaive's
    model-based sibling).

    Engine-portability: the recursion is a strictly SEQUENTIAL
    left-fold over the day-ordered series, so it runs as an
    F.aggregate higher-order fold over a collected per-group array —
    identical operation order to DuckDB's list_reduce, hence
    bit-identical doubles into round().

    Shape: daily counts are one map-side-combined hash agg; the
    collect_list gathers ≤ |days| scalars per group (bounded by the
    calendar, NOT the row count — 365 doubles/year/group), so the fold
    input is tiny no matter the fact-table size, and each group's fold
    is one JVM expression. This is the standard scale shape for
    sequential recursions: aggregate-to-bounded-series first, fold
    second.

    Holt needs two observations to initialize (l₀=y₂, b₀=y₂−y₁), so
    single-day groups are dropped — matching the oracle's recursion,
    whose seed row i=2 never exists when len(ys)=1."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").cast("double").alias("y"))
    series = daily.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("day"), F.col("y")))
        ).alias("sd")
    ).select(
        "event_type",
        F.transform(F.col("sd"), lambda s: s.getField("y")).alias("ys"),
    ).filter(F.size("ys") >= 2)
    a, b1 = F.lit(_HOLT_ALPHA), F.lit(1 - _HOLT_ALPHA)
    g, g1 = F.lit(_HOLT_BETA), F.lit(1 - _HOLT_BETA)

    def _step(acc, y):
        new_l = a * y + b1 * (acc.getField("l") + acc.getField("b"))
        new_b = g * (new_l - acc.getField("l")) + g1 * acc.getField("b")
        return F.struct(new_l.alias("l"), new_b.alias("b"))

    ys = F.col("ys")
    init = F.struct(
        F.element_at(ys, 2).alias("l"),
        (F.element_at(ys, 2) - F.element_at(ys, 1)).alias("b"),
    )
    st = F.aggregate(F.slice(ys, 3, F.lit(1 << 30)), init, _step)
    lvl, tr = st.getField("l"), st.getField("b")
    return series.select(
        "event_type",
        F.size(ys).cast("bigint").alias("n_days"),
        F.round(lvl, 4).alias("level"),
        F.round(tr, 4).alias("trend"),
        F.round(lvl + 1 * tr, 4).alias("fc_1"),
        F.round(lvl + 2 * tr, 4).alias("fc_2"),
        F.round(lvl + 3 * tr, 4).alias("fc_3"),
    ).orderBy("event_type")


@register(
    "q_ts_m4",
    oracle="""
    SELECT event_type, bucket,
           cast(n AS BIGINT) AS n,
           round(v_min, 2) AS v_min,
           round(v_max, 2) AS v_max,
           round(v_first, 2) AS v_first,
           round(v_last, 2) AS v_last
    FROM (
        -- first/last via lexicographic struct min/max — identical
        -- tie-break to the Spark side's struct-packing trick
        SELECT event_type, date_trunc('hour', ts) AS bucket,
               count(*) AS n,
               min(value) AS v_min,
               max(value) AS v_max,
               (min(struct_pack(ts := ts, eid := event_id, v := value))).v
                   AS v_first,
               (max(struct_pack(ts := ts, eid := event_id, v := value))).v
                   AS v_last
        FROM events
        GROUP BY event_type, date_trunc('hour', ts)
    )
    """,
)
def q_ts_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling (Jugel et al., VLDB'14): per series
    and per pixel-bucket (hour), keep min / max / first / last — the
    four points that make a line-chart render pixel-identical to the
    full series at any zoom level.

    first/last tie-break on (ts, event_id) so simultaneous events pick
    the same row in both engines (min_by/max_by alone are
    nondeterministic under ts ties — DuckDB's ORDER BY variant and
    Spark's struct-packing trick pin the same total order).

    Shape: ONE map-side-combined hash agg on (series, bucket) — the
    min/max/first/last accumulators are all associative, so the shuffle
    carries 4 scalars per bucket regardless of the row count. This is
    the standard downsample-before-visualize operator at 100 TB: output
    is bounded by series × pixels, never by data."""
    e = table(spark, sf_dir, "events")
    # first/last via min/max over a (ts, event_id, value) struct: struct
    # ordering is lexicographic, so this IS min_by/max_by with an
    # explicit deterministic tie-break, and it stays map-side combinable.
    key = F.struct(F.col("ts"), F.col("event_id"), F.col("value"))
    g = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.min("value"), 2).alias("v_min"),
        F.round(F.max("value"), 2).alias("v_max"),
        F.round(F.min(key).getField("value"), 2).alias("v_first"),
        F.round(F.max(key).getField("value"), 2).alias("v_last"),
    )
    return g.select(
        "event_type", "bucket", "n", "v_min", "v_max", "v_first", "v_last"
    )


@register(
    "q_ts_concurrency",
    oracle="""
    WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events),
    flagged AS (
        SELECT user_id, ts,
               -- STRICT > : an event at exactly prev_ts + gap EXTENDS
               -- the Spark session (tests/test_edge_cases.py)
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS brk
        FROM ev
    ),
    numbered AS (
        SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS sid
        FROM flagged
    ),
    sessions AS (
        SELECT user_id, min(ts) AS s, max(ts) + INTERVAL 30 MINUTE AS e
        FROM numbered GROUP BY user_id, sid
    ),
    segs AS (
        SELECT user_id,
               d.day,
               greatest(s, d.day) AS seg_s,
               least(e, d.day + INTERVAL 1 DAY) AS seg_e
        FROM sessions,
             LATERAL (
                 SELECT unnest(generate_series(
                     date_trunc('day', s),
                     date_trunc('day', e - INTERVAL 1 MICROSECOND),
                     INTERVAL 1 DAY)) AS day
             ) d
    ),
    pts AS (
        SELECT day, seg_s AS t, 1 AS delta, user_id FROM segs
        UNION ALL
        SELECT day, seg_e AS t, -1 AS delta, user_id FROM segs
    ),
    run AS (
        SELECT day,
               sum(delta) OVER (PARTITION BY day
                                ORDER BY t, delta, user_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS cur
        FROM pts
    )
    SELECT day, cast(max(cur) AS BIGINT) AS peak_concurrent
    FROM run GROUP BY day ORDER BY day
    """,
)
def q_ts_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the sweep-line (+1 at session
    start, −1 at end, running sum, max) over 30-minute-gap sessions,
    with sessions split into per-day segments so the sweep partitions
    by day (a session spanning midnight contributes a segment to each
    day it touches, so carry-over concurrency is exact).

    Determinism: at equal timestamps, ends (−1) sort before starts
    (+1) on both engines (ORDER BY t, delta, user_id), so the peak is
    the conservative no-overlap-at-touch reading and ties never
    reorder across engines.

    Shape: sessionization is the engine's q_ts_session shuffle
    (user-keyed); the segment explode is bounded by session length in
    days (≤2 for real session gaps).  The running sum is associative,
    so the sweep is TWO-LEVEL (the q_win_dist_scaled bucket-offset
    recipe): boundary events bucket by the HOUR of t within the day
    (hour = floor((t − day)/1h), a pure function of the row, monotone
    in the sort key so hour buckets are contiguous order ranges);
    per-(day, hour) windows run local sweeps in parallel, per-hour
    delta totals (≤ 25 rows/day) prefix-sum into carry-in offsets, and
    the true concurrency = carry-in + local.  A hot day with 10⁸
    sessions is then 25 bounded tasks, not one ~2×10⁸-row sorted
    window task."""
    e = table(spark, sf_dir, "events")
    sess = (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.lit(1).alias("one"))
        .select(
            "user_id",
            F.col("w.start").alias("s"),
            F.col("w.end").alias("e"),
        )
    )
    day_seq = F.sequence(
        F.date_trunc("day", F.col("s")),
        F.date_trunc(
            "day", F.col("e") - F.expr("INTERVAL 1 MICROSECOND")
        ),
        F.expr("INTERVAL 1 DAY"),
    )
    segs = sess.select(
        "user_id",
        F.explode(day_seq).alias("day"),
        F.col("s"),
        F.col("e"),
    ).select(
        "user_id",
        "day",
        F.greatest(F.col("s"), F.col("day")).alias("seg_s"),
        F.least(
            F.col("e"), F.col("day") + F.expr("INTERVAL 1 DAY")
        ).alias("seg_e"),
    )
    # Both boundary events come from ONE pass over the segment frame
    # (explode of a 2-element struct array) — a union of two selects
    # would re-run sessionization + the day explode twice.
    pts = segs.select(
        "day",
        "user_id",
        F.explode(
            F.array(
                F.struct(
                    F.col("seg_s").alias("t"), F.lit(1).alias("delta")
                ),
                F.struct(
                    F.col("seg_e").alias("t"), F.lit(-1).alias("delta")
                ),
            )
        ).alias("b"),
    ).select(
        "day", F.col("b.t").alias("t"), F.col("b.delta").alias("delta"),
        "user_id",
    )
    from pyspark.sql import Window

    hr = F.floor(
        (F.unix_timestamp("t") - F.unix_timestamp("day")) / 3600
    ).cast("int")
    pts = pts.withColumn("hr", hr)
    w_local = (
        Window.partitionBy("day", "hr")
        .orderBy("t", "delta", "user_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = pts.withColumn("lcur", F.sum("delta").over(w_local))
    w_off = (
        Window.partitionBy("day")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        pts.groupBy("day", "hr")
        .agg(F.sum("delta").alias("htot"))
        .withColumn(
            "carry", F.coalesce(F.sum("htot").over(w_off), F.lit(0))
        )
        .select("day", "hr", "carry")
    )
    run = local.join(F.broadcast(offsets), ["day", "hr"]).withColumn(
        "cur", F.col("carry") + F.col("lcur")
    )
    return (
        run.groupBy("day")
        .agg(F.max("cur").cast("bigint").alias("peak_concurrent"))
        .orderBy("day")
    )


@register(
    "q_ts_retention",
    oracle="""
    WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events),
    first_seen AS (
        SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
        FROM ev GROUP BY user_id
    ),
    active AS (
        SELECT f.cohort_day,
               cast(date_diff('day', f.cohort_day,
                              date_trunc('day', e.ts)) AS BIGINT) AS offset,
               count(DISTINCT e.user_id) AS n_active
        FROM ev e JOIN first_seen f ON e.user_id = f.user_id
        GROUP BY 1, 2
    ),
    sizes AS (
        SELECT cohort_day, count(*) AS cohort_size
        FROM first_seen GROUP BY cohort_day
    )
    SELECT a.cohort_day, a.offset, a.n_active,
           round(a.n_active / cast(s.cohort_size AS DOUBLE) + 1e-9, 4)
               AS retention
    FROM active a JOIN sizes s USING (cohort_day)
    """,
)
def q_ts_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-rate curve: for each signup cohort (first-seen day)
    and day offset N, the fraction of the cohort active N days later —
    the normalized version of the q_ts_cohort matrix, i.e. the actual
    retention triangle a product team reads.

    Shape: first-seen is one hash agg to a per-user frame (broadcast
    back, same as cohort); the distinct-active agg keys on
    (cohort_day, offset); cohort sizes aggregate the per-user frame
    and join on the tiny (≤ days) cohort list — no fact-table windows,
    no second events scan."""
    e = table(spark, sf_dir, "events")
    # bounded per-user frame consumed twice (cohort join + sizes):
    # one lineage cut → one events scan (SCALE.md §shared-subtree)
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    ).localCheckpoint(eager=False)
    active = (
        e.join(F.broadcast(first_seen), "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(
                F.date_trunc("day", F.col("ts")), F.col("cohort_day")
            )
            .cast("bigint")
            .alias("offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    sizes = first_seen.groupBy("cohort_day").agg(
        F.count("*").alias("cohort_size")
    )
    return active.join(F.broadcast(sizes), "cohort_day").select(
        "cohort_day",
        "offset",
        "n_active",
        F.round(
            F.col("n_active") / F.col("cohort_size").cast("double")
            + F.lit(1e-9),
            4,
        ).alias("retention"),
    )


@register(
    "q_ts_ltv",
    oracle="""
    WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events),
    first_seen AS (
        SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
        FROM ev GROUP BY user_id
    ),
    rev AS (
        SELECT f.cohort_day,
               cast(date_diff('day', f.cohort_day,
                              date_trunc('day', e.ts)) AS BIGINT) AS offset,
               sum(e.value) AS day_rev
        FROM ev e JOIN first_seen f ON e.user_id = f.user_id
        WHERE e.event_type = 'purchase'
        GROUP BY 1, 2
    ),
    sizes AS (
        SELECT cohort_day, count(*) AS cohort_size
        FROM first_seen GROUP BY cohort_day
    )
    SELECT r.cohort_day, r.offset,
           round(sum(r.day_rev) OVER (
               PARTITION BY r.cohort_day ORDER BY r.offset
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) / cast(s.cohort_size AS DOUBLE) + 1e-9, 4) AS ltv_per_user
    FROM rev r JOIN sizes s USING (cohort_day)
    """,
)
def q_ts_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve: cumulative purchase revenue per cohort member
    by day offset — the revenue sibling of q_ts_retention (the two
    curves together are the subscription-business dashboard).

    Shape: revenue aggregates to the (cohort, offset) frame FIRST
    (map-side combined), the running sum windows over that
    calendar-bounded frame (≤ days² rows), never raw events; cohort
    sizes join from the tiny per-day frame."""
    e = table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    ).localCheckpoint(eager=False)
    rev = (
        e.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(first_seen), "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(
                F.date_trunc("day", F.col("ts")), F.col("cohort_day")
            )
            .cast("bigint")
            .alias("offset"),
        )
        .agg(F.sum("value").alias("day_rev"))
    )
    sizes = first_seen.groupBy("cohort_day").agg(
        F.count("*").alias("cohort_size")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("cohort_day")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return rev.join(F.broadcast(sizes), "cohort_day").select(
        "cohort_day",
        "offset",
        F.round(
            F.sum("day_rev").over(w)
            / F.col("cohort_size").cast("double")
            + F.lit(1e-9),
            4,
        ).alias("ltv_per_user"),
    )


@register(
    "q_ts_calendar",
    oracle="""
    SELECT CAST(dayofweek(ts::TIMESTAMP) AS BIGINT) AS dow,
           CAST(hour(ts::TIMESTAMP) AS BIGINT) AS hr,
           CAST(count(*) AS BIGINT) AS n_events,
           round(avg(value) + 1e-9, 2) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_ts_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour activity heatmap (the calendar seasonality
    matrix behind every traffic dashboard): event count and mean value
    per (dow, hour) cell.

    Cross-engine calendar gotcha handled explicitly: Spark's
    dayofweek() is 1-based Sunday=1 while DuckDB's dayofweek() is
    0-based Sunday=0, so the Spark side subtracts 1 — a silent
    off-by-one across every cell otherwise.  Shape: ONE map-side-
    combined hash agg onto the fixed 7×24 key grid — output width is
    constant at any fact size, the cheapest distributed shape there
    is."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            (F.dayofweek("ts") - 1).cast("bigint").alias("dow"),
            F.hour("ts").cast("bigint").alias("hr"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("value") + F.lit(1e-9), 2).alias("avg_value"),
        )
    )


@register(
    "q_ts_gaps",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               date_diff('second',
                         lag(ts::TIMESTAMP) OVER (
                             PARTITION BY event_type,
                                          date_trunc('day', ts)
                             ORDER BY ts, event_id),
                         ts::TIMESTAMP) AS gap
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(median(gap) AS DOUBLE) AS p50_sec,
           CAST(quantile_cont(gap, 0.95) AS DOUBLE) AS p95_sec,
           CAST(max(gap) AS BIGINT) AS max_sec
    FROM seq WHERE gap IS NOT NULL
    GROUP BY event_type
    """,
)
def q_ts_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap percentiles per event type (p50/p95/max
    seconds between consecutive same-type events within a day) — the
    event-delivery SLA / feed-liveness metric every ingestion monitor
    watches (a p95 spike means the upstream producer is stalling).

    Scale shape: the lag window partitions by (event_type, DAY) — a
    hot event type never becomes one task's global sort; day-boundary
    gaps are excluded by construction (first event of each partition
    has NULL lag).  Gaps are exact integer seconds (cross-engine safe
    division-free date_diff), and the exact percentile is the
    q_agg_percentile cost class with approx_percentile as the
    documented 100 TB swap."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy(
        "event_type", F.date_trunc("day", "ts")
    ).orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        (
            F.unix_timestamp("ts")
            - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    return seq.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_gaps"),
        F.median("gap").cast("double").alias("p50_sec"),
        F.percentile("gap", F.lit(0.95)).cast("double").alias("p95_sec"),
        F.max("gap").cast("bigint").alias("max_sec"),
    )


@register(
    "q_ts_conversion_window",
    oracle="""
    WITH u AS (
        SELECT user_id, ts::TIMESTAMP AS ts,
               CASE WHEN event_type = 'purchase' THEN 1 END AS is_probe,
               CASE WHEN event_type = 'purchase' THEN event_id END
                   AS probe_id,
               CASE WHEN event_type = 'click' THEN event_id END
                   AS build_id,
               CASE WHEN event_type = 'click' THEN ts::TIMESTAMP END
                   AS build_ts
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    m AS (
        SELECT ts, probe_id,
               last_value(build_ts IGNORE NULLS) OVER (
                   PARTITION BY user_id
                   ORDER BY ts, is_probe NULLS FIRST,
                            coalesce(build_id, probe_id)
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS last_click_ts
        FROM u
    )
    SELECT date_trunc('day', ts) AS day,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(CASE WHEN last_click_ts IS NOT NULL
                         AND date_diff('second', last_click_ts, ts)
                             <= 3600
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
           round(sum(CASE WHEN last_click_ts IS NOT NULL
                          AND date_diff('second', last_click_ts, ts)
                              <= 3600
                          THEN 1 ELSE 0 END) * 1e0 / count(*)
                 + 1e-9, 4) AS attribution_rate
    FROM m
    WHERE probe_id IS NOT NULL
    GROUP BY 1
    """,
)
def q_ts_conversion_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-window conversion: per day, the share of purchases
    preceded by a click from the SAME user within the last hour — the
    click-through-conversion KPI with an explicit lookback window (the
    q_join_asof machinery with a gap predicate on top).

    Shape: one union + ordered window pass on user_id (no pairwise
    join, same as asof_match), the 1-hour check is an integer-second
    comparison on the matched timestamp, then one day-keyed rollup.
    Deterministic under duplicate timestamps via the asof ordering
    (clicks sort before ties-at-equal-ts purchases — a click AT the
    purchase instant counts, gap 0)."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    is_p = F.col("event_type") == "purchase"
    u = e.select(
        "user_id",
        "ts",
        F.when(is_p, 1).alias("is_probe"),
        F.when(is_p, F.col("event_id")).alias("probe_id"),
        F.when(~is_p, F.col("event_id")).alias("build_id"),
        F.when(~is_p, F.col("ts")).alias("build_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            "ts",
            F.col("is_probe").asc_nulls_first(),
            F.coalesce("build_id", "probe_id"),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = u.select(
        "ts",
        "probe_id",
        F.last("build_ts", ignorenulls=True).over(w).alias("last_click_ts"),
    ).filter(F.col("probe_id").isNotNull())
    attributed = F.when(
        F.col("last_click_ts").isNotNull()
        & (
            F.unix_timestamp("ts") - F.unix_timestamp("last_click_ts")
            <= 3600
        ),
        1,
    ).otherwise(0)
    return m.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("bigint").alias("n_purchases"),
        F.sum(attributed).cast("bigint").alias("n_attributed"),
        F.round(
            F.sum(attributed) / F.count("*") + F.lit(1e-9), 4
        ).alias("attribution_rate"),
    )


@register(
    "q_ts_cumulative_users",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, min(date_trunc('day', ts)) AS d
        FROM events GROUP BY user_id
    ),
    per_day AS (
        SELECT d, count(*) AS new_users FROM first_seen GROUP BY d
    )
    SELECT d AS day,
           CAST(new_users AS BIGINT) AS new_users,
           CAST(sum(new_users) OVER (ORDER BY d
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND CURRENT ROW) AS BIGINT)
               AS cumulative_users
    FROM per_day
    """,
)
def q_ts_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-audience curve: per day, the users seen for the
    FIRST time and the exact running total of distinct users ever seen
    — the registered-users growth chart, computed exactly (not a
    prefix of approx-distinct sketches).

    The trick that makes exact cumulative COUNT DISTINCT cheap:
    cumulative distinct users at day d == users whose FIRST event is
    ≤ d, so one per-user min-day agg (map-side combined,
    high-cardinality key) collapses the fact table, a day rollup
    bounds the frame at ≤365 rows/year, and the prefix sum runs over
    THAT — never a distinct-accumulating window over events.  The
    q_agg_bitmap_rolling sibling for the exact-running-distinct
    problem, via first-touch decomposition instead of bitmaps."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("d")
    )
    per_day = first_seen.groupBy("d").agg(
        F.count("*").alias("new_users")
    )
    w = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_day.select(
        F.col("d").alias("day"),
        F.col("new_users").cast("bigint").alias("new_users"),
        F.sum("new_users").over(w).cast("bigint").alias(
            "cumulative_users"
        ),
    )


@register(
    "q_ts_rolling_median",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS d, count(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, d AS day, CAST(n AS BIGINT) AS n_events,
           CAST(median(n) OVER (
               PARTITION BY event_type ORDER BY d
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS med7
    FROM daily
    """,
)
def q_ts_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling MEDIAN of daily volume per event type — the
    spike-resistant twin of q_win_moving's rolling mean (one
    flash-crowd day can't move a median baseline, which is why
    anomaly thresholds prefer it).

    Spark has no median-over-frame, so the operator builds it
    declaratively: array_sort(collect_list) over the ≤7-element frame
    + exact middle / two-middle average — identical to the oracle's
    interpolating window median because the frame never exceeds 7
    values.  All windows run over the day-level PRE-AGGREGATE (≤365
    rows/type/year — bounded, never the event stream), the
    q_ts_forecast_snaive conduct."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.count("*").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-6, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list("n").over(w))
    k = F.size(arr)
    med = F.when(
        k % 2 == 1,
        F.element_at(arr, ((k + 1) / 2).cast("int")).cast("double"),
    ).otherwise(
        (
            F.element_at(arr, (k / 2).cast("int"))
            + F.element_at(arr, (k / 2 + 1).cast("int"))
        )
        / 2.0
    )
    return daily.select(
        "event_type",
        F.col("d").alias("day"),
        F.col("n").cast("bigint").alias("n_events"),
        med.alias("med7"),
    )


@register(
    "q_ts_session_stats",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS brk
        FROM (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events)
    ),
    numbered AS (
        SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS sid
        FROM flagged
    ),
    sessions AS (
        SELECT user_id, sid,
               min(ts) AS s_start,
               count(*) AS n_events,
               date_diff('second', min(ts), max(ts)) AS dur_s
        FROM numbered GROUP BY user_id, sid
    )
    SELECT date_trunc('day', s_start) AS day,
           CAST(count(*) AS BIGINT) AS n_sessions,
           round(avg(n_events) + 1e-9, 4) AS avg_events,
           CAST(max(n_events) AS BIGINT) AS max_events,
           round(avg(dur_s) / 60.0 + 1e-9, 4) AS avg_dur_min,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounce
    FROM sessions GROUP BY 1
    """,
)
def q_ts_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-quality rollup per day: how many sessions started, their
    mean/max event counts, mean active span (first→last event,
    minutes), and the single-event "bounce" count — the engagement
    dashboard one level above q_ts_session's raw session list.

    Sessionization is the engine's session_window (30-min gap, strict-
    greater break in the oracle per the exact-gap semantics pinned in
    tests/test_edge_cases.py); the active span is last−first event
    (NOT the window end, which pads the idle gap).  Durations are
    integer seconds — exact on both engines — and only the two means
    round (4 dp + nudge).

    Shape: one user-keyed session shuffle, then a map-side-combined
    rollup to ≤|days| rows.  Nothing new materializes at scale beyond
    what q_ts_session already pays."""
    e = table(spark, sf_dir, "events")
    sess = (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.min("ts").alias("s_start"),
            F.max("ts").alias("s_last"),
            F.count("*").alias("n_events"),
        )
        .select(
            "s_start",
            "n_events",
            (
                F.unix_timestamp(F.col("s_last").cast("timestamp"))
                - F.unix_timestamp(F.col("s_start").cast("timestamp"))
            ).alias("dur_s"),
        )
    )
    return (
        sess.groupBy(F.date_trunc("day", "s_start").alias("day"))
        .agg(
            F.count("*").cast("bigint").alias("n_sessions"),
            F.round(F.avg("n_events") + F.lit(1e-9), 4).alias("avg_events"),
            F.max("n_events").cast("bigint").alias("max_events"),
            F.round(F.avg("dur_s") / F.lit(60.0) + F.lit(1e-9), 4).alias(
                "avg_dur_min"
            ),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_bounce"),
        )
    )


@register(
    "q_ts_sma_cross",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts::TIMESTAMP) AS day,
               round(sum(value), 2) AS vol
        FROM events GROUP BY 1, 2
    ),
    sma AS (
        SELECT event_type, day,
               avg(vol) OVER (PARTITION BY event_type ORDER BY day
                              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                   AS sma7,
               avg(vol) OVER (PARTITION BY event_type ORDER BY day
                              ROWS BETWEEN 27 PRECEDING AND CURRENT ROW)
                   AS sma28,
               row_number() OVER (PARTITION BY event_type ORDER BY day)
                   AS rn
        FROM daily
    ),
    sig AS (
        SELECT event_type, day,
               CASE WHEN sma7 > sma28 THEN 1 ELSE 0 END AS s,
               lag(CASE WHEN sma7 > sma28 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY event_type ORDER BY day) AS prev_s
        FROM sma WHERE rn >= 28
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN prev_s = 0 AND s = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_golden,
           CAST(sum(CASE WHEN prev_s = 1 AND s = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_death,
           CAST(max(CASE WHEN day = (SELECT max(day) FROM sig s2
                                     WHERE s2.event_type = sig.event_type)
                         THEN s END) AS BIGINT) AS last_signal
    FROM sig GROUP BY event_type
    """,
)
def q_ts_sma_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average crossover detector (the golden-cross/death-cross
    trend signal): per event type, daily volume's 7-day SMA vs 28-day
    SMA, counting upward and downward crossings once both windows are
    full, plus the latest regime bit.

    Determinism: daily volumes round to cents FIRST, so both engines
    average identical 2-dp values in the identical day order (same
    IEEE fold → bit-equal SMAs → the > comparison can't flip on ulps);
    crossings are exact ints on the lagged signal.

    Shape: map-side-combined daily rollup (corpus → ≤|types|·365
    rows), then all windows run on that bounded pre-aggregate,
    partitioned by type — the q_ts_rolling_median scale recipe; the
    last-signal subquery becomes a max_by on the same bounded frame."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("vol"))
    w7 = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    w28 = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-27, Window.currentRow)
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    sma = daily.select(
        "event_type",
        "day",
        F.avg("vol").over(w7).alias("sma7"),
        F.avg("vol").over(w28).alias("sma28"),
        F.row_number().over(wo).alias("rn"),
    )
    sig = sma.filter(F.col("rn") >= 28).select(
        "event_type",
        "day",
        F.when(F.col("sma7") > F.col("sma28"), 1).otherwise(0).alias("s"),
    )
    sig = sig.select(
        "event_type",
        "day",
        "s",
        F.lag("s").over(Window.partitionBy("event_type").orderBy("day")).alias(
            "prev_s"
        ),
    )
    return sig.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum(F.when((F.col("prev_s") == 0) & (F.col("s") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("n_golden"),
        F.sum(F.when((F.col("prev_s") == 1) & (F.col("s") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("n_death"),
        F.max_by("s", "day").cast("bigint").alias("last_signal"),
    )


@register(
    "q_ts_drawdown",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts::TIMESTAMP) AS day,
               round(sum(value), 2) AS vol
        FROM events GROUP BY 1, 2
    ),
    curve AS (
        SELECT event_type, day,
               sum(vol) OVER (PARTITION BY event_type ORDER BY day
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS cum
        FROM daily
    ),
    dd AS (
        SELECT event_type, day, cum,
               max(cum) OVER (PARTITION BY event_type ORDER BY day
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS peak
        FROM curve
    )
    SELECT event_type,
           round(max_dd + 1e-9, 6) AS max_drawdown,
           dd_day,
           round(peak_at_max, 2) AS peak_cum
    FROM (
        SELECT event_type, (peak - cum) / peak AS max_dd, day AS dd_day,
               peak AS peak_at_max,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY (peak - cum) / peak DESC, day)
                   AS rn
        FROM dd WHERE peak > 0
    ) WHERE rn = 1
    """,
)
def q_ts_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per event type: treat cumulative daily volume
    as an equity curve and report the deepest relative dip below its
    running peak — (peak − cum)/peak — with the day it bottomed and
    the peak it fell from.  The risk-analysis standard, and the
    monotone-health check for volume pipelines (a pipeline outage
    shows up as a drawdown spike).

    Determinism: daily volumes round to cents first, the running sums
    fold in identical day order on both engines (bit-equal curves),
    and the argmax tiebreak is (drawdown DESC, day) — total.

    Shape: map-side daily rollup, then every window runs on the
    bounded ≤|types|·365-day frame partitioned by type; the final
    row_number keeps one row per type.  Corpus is scanned once."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("vol"))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curve = daily.select(
        "event_type", "day", F.sum("vol").over(w_cum).alias("cum")
    )
    dd = curve.select(
        "event_type",
        "day",
        "cum",
        F.max("cum").over(w_cum).alias("peak"),
    ).filter(F.col("peak") > 0)
    mdd = ((F.col("peak") - F.col("cum")) / F.col("peak")).alias("max_dd")
    w_rk = Window.partitionBy("event_type").orderBy(
        F.desc((F.col("peak") - F.col("cum")) / F.col("peak")), F.asc("day")
    )
    return (
        dd.select(
            "event_type", mdd, F.col("day").alias("dd_day"),
            F.col("peak").alias("peak_at_max"),
            F.row_number().over(w_rk).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.round(F.col("max_dd") + F.lit(1e-9), 6).alias("max_drawdown"),
            "dd_day",
            F.round("peak_at_max", 2).alias("peak_cum"),
        )
    )


@register(
    "q_ts_stl",
    oracle="""
    WITH daily AS (
        SELECT date_trunc('day', ts::TIMESTAMP) AS day,
               sum(cast(round(value * 100) AS BIGINT)) AS vc
        FROM events GROUP BY 1
    ),
    t AS (
        SELECT day, vc,
               sum(vc) OVER w * 1.0 / count(*) OVER w AS trend_c
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    d AS (SELECT day, vc, trend_c, vc - trend_c AS det_c FROM t),
    s AS (
        SELECT dayofweek(day) AS dow, avg(det_c) AS seasonal_c
        FROM d GROUP BY 1
    )
    SELECT d.day,
           round(d.vc / 100.0, 2) AS volume,
           round(d.trend_c / 100 + 1e-9, 4) AS trend,
           round(s.seasonal_c / 100 + 1e-9, 4) AS seasonal,
           round((d.det_c - s.seasonal_c) / 100 + 1e-9, 4) AS residual
    FROM d JOIN s ON s.dow = dayofweek(d.day)
    ORDER BY d.day
    """,
)
def q_ts_stl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite seasonal decomposition of the daily volume curve:
    trend = centered 7-day moving average, seasonal = mean detrended
    value per weekday, residual = the rest — the classic
    trend/seasonal/remainder split an anomaly pipeline runs before
    thresholding residuals (q_ts_anomaly's principled cousin).

    Determinism: daily volumes are EXACT integer cents (per-row
    round(value·100) then integer sums — the q_win_moving pattern), so
    the centered-window sum is exact and trend = one integer-ratio
    division, bit-identical cross-engine; the per-weekday seasonal
    mean and the 4-dp +1e-9 rounds absorb the remaining last-ulp
    summation-order noise.  Weekday keys use the Spark dayofweek−1 ↔
    DuckDB dayofweek alignment (q_ts_calendar).

    Scale: everything below the first map-side-combined daily agg runs
    on the bounded day frame (windows, the 7-row seasonal join) — one
    fact pass at any corpus size."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).try_cast("long")).alias("vc")
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    t = daily.withColumn(
        "trend_c", F.sum("vc").over(w) * 1.0 / F.count("*").over(w)
    )
    d = t.withColumn("det_c", F.col("vc") - F.col("trend_c"))
    s = d.groupBy((F.dayofweek("day") - 1).alias("dow")).agg(
        F.avg("det_c").alias("seasonal_c")
    )
    return (
        d.join(
            F.broadcast(s), (F.dayofweek(d["day"]) - 1) == s["dow"]
        )
        .select(
            "day",
            F.round(F.col("vc") / 100.0, 2).alias("volume"),
            F.round(F.col("trend_c") / 100 + F.lit(1e-9), 4).alias("trend"),
            F.round(F.col("seasonal_c") / 100 + F.lit(1e-9), 4).alias(
                "seasonal"
            ),
            F.round(
                (F.col("det_c") - F.col("seasonal_c")) / 100 + F.lit(1e-9), 4
            ).alias("residual"),
        )
        .orderBy("day")
    )


@register(
    "q_ts_theilsen",
    oracle="""
    WITH daily AS (
        SELECT date_trunc('day', ts::TIMESTAMP) AS day,
               sum(cast(round(value * 100) AS BIGINT)) AS vc
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT row_number() OVER (ORDER BY day) AS i, vc FROM daily
    ),
    slopes AS (
        SELECT (b.vc - a.vc) * 1.0 / (b.i - a.i) AS slope
        FROM idx a JOIN idx b ON b.i > a.i
    ),
    sl AS (
        SELECT count(*) AS n_pairs, quantile_cont(slope, 0.5) AS slope
        FROM slopes
    ),
    ic AS (
        SELECT count(*) AS n_days,
               quantile_cont(vc - (SELECT slope FROM sl) * i, 0.5) AS icpt
        FROM idx
    )
    SELECT CAST(ic.n_days AS BIGINT) AS n_days,
           CAST(sl.n_pairs AS BIGINT) AS n_pairs,
           round(sl.slope / 100 + 1e-9, 4) AS sen_slope,
           round(ic.icpt / 100 + 1e-9, 4) AS sen_intercept
    FROM sl CROSS JOIN ic
    """,
)
def q_ts_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend: the median of all pairwise day-to-day
    slopes of the daily volume curve, plus the matching median
    intercept — the outlier-proof alternative to q_stats_regression's
    OLS slope (one corrupted day moves OLS, not the pairwise median).

    Determinism: exact integer-cents daily volumes (q_win_moving
    pattern) make every pairwise slope an exact integer ratio —
    bit-identical cross-engine; the median is percentile/quantile_cont
    0.5 (identical linear-interpolation definition both engines) and
    final values round 4-dp +1e-9.

    Scale: the O(days²) pair join and both medians run on the bounded
    day frame (the only fact-table work is the daily agg), so the
    quadratic term is over calendar days, never rows.  The 1-row
    median-slope frame broadcasts back for the intercept pass."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).try_cast("long")).alias("vc")
    )
    idx = daily.select(
        F.row_number().over(Window.orderBy("day")).alias("i"), "vc"
    )
    a = idx.select(F.col("i").alias("ia"), F.col("vc").alias("va"))
    b = idx.select(F.col("i").alias("ib"), F.col("vc").alias("vb"))
    slopes = (
        a.join(F.broadcast(b), F.col("ib") > F.col("ia"))
        .select(
            (
                (F.col("vb") - F.col("va"))
                * 1.0
                / (F.col("ib") - F.col("ia"))
            ).alias("slope")
        )
    )
    sl = slopes.agg(
        F.count("*").alias("n_pairs"),
        F.expr("percentile(slope, 0.5)").alias("slope"),
    )
    ic = idx.crossJoin(F.broadcast(sl)).agg(
        F.count("*").alias("n_days"),
        F.expr("percentile(vc - slope * i, 0.5)").alias("icpt"),
        F.first("n_pairs").alias("n_pairs"),
        F.first("slope").alias("msl"),
    )
    return ic.select(
        F.col("n_days").cast("bigint").alias("n_days"),
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.round(F.col("msl") / 100 + F.lit(1e-9), 4).alias("sen_slope"),
        F.round(F.col("icpt") / 100 + F.lit(1e-9), 4).alias("sen_intercept"),
    )


@register(
    "q_ts_cusum",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts::TIMESTAMP) AS day,
               sum(cast(round(value * 100) AS BIGINT)) AS vc
        FROM events GROUP BY 1, 2
    ),
    st AS (
        SELECT event_type,
               round(avg(vc) + 1e-11, 6) AS mu,
               round(sqrt(avg(vc * vc) - avg(vc) * avg(vc)) + 1e-11, 6)
                   AS sd
        FROM daily GROUP BY event_type
    ),
    z AS (
        SELECT d.event_type, d.day,
               round((d.vc - st.mu) / st.sd + 1e-11, 6) AS z
        FROM daily d JOIN st ON st.event_type = d.event_type
    ),
    p AS (
        SELECT event_type, day,
               sum(z - 0.5) OVER w AS pp,
               sum(z + 0.5) OVER w AS qq
        FROM z
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    s AS (
        SELECT event_type, day,
               pp - least(0, min(pp) OVER w) AS s_hi,
               greatest(0, max(qq) OVER w) - qq AS s_lo
        FROM p
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN s_hi > 4 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_alarm_high,
           CAST(sum(CASE WHEN s_lo > 4 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_alarm_low,
           round(max(s_hi) + 1e-9, 4) AS max_cusum_high,
           round(max(s_lo) + 1e-9, 4) AS max_cusum_low
    FROM s GROUP BY event_type
    """,
)
def q_ts_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM control chart per event type over the daily volume curve
    (Page's sequential drift detector — catches small sustained mean
    shifts that q_ts_anomaly's pointwise z-scores miss): upper/lower
    cumulative sums with slack k = 0.5σ, alarm threshold h = 4σ.

    The textbook recursion S⁺_t = max(0, S⁺_{t-1} + z_t − k) is not a
    windowed aggregate — it is rewritten by the reflection identity
    S⁺_t = P_t − min(0, min_{j≤t} P_j) with P the running sum of
    (z − k) (and symmetrically for S⁻ via the running max of z + k),
    turning the sequential max-recursion into two stock window
    functions that parallelize per type.

    Determinism: exact integer-cents daily volumes; per-type mean/sd
    and the z-scores re-round to 6 dp (inside-iteration policy), so
    the running sums fold identical decimals; 4-dp +1e-9 final round.
    Scale: one fact agg → all windows on the bounded per-type day
    frame."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).try_cast("long")).alias("vc"))
    st = daily.groupBy("event_type").agg(
        F.round(F.avg("vc") + F.lit(1e-11), 6).alias("mu"),
        F.round(
            F.sqrt(
                F.avg(F.col("vc") * F.col("vc"))
                - F.avg("vc") * F.avg("vc")
            )
            + F.lit(1e-11),
            6,
        ).alias("sd"),
    )
    z = daily.join(F.broadcast(st), "event_type").select(
        "event_type",
        "day",
        # try_divide: zero-variance series → z undefined (r6 audit)
        F.round(
            F.try_divide(F.col("vc") - F.col("mu"), F.col("sd"))
            + F.lit(1e-11),
            6,
        ).alias("z"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = z.select(
        "event_type",
        "day",
        F.sum(F.col("z") - 0.5).over(w).alias("pp"),
        F.sum(F.col("z") + 0.5).over(w).alias("qq"),
    )
    s = p.select(
        "event_type",
        "day",
        (F.col("pp") - F.least(F.lit(0.0), F.min("pp").over(w))).alias(
            "s_hi"
        ),
        (F.greatest(F.lit(0.0), F.max("qq").over(w)) - F.col("qq")).alias(
            "s_lo"
        ),
    )
    return s.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum(F.when(F.col("s_hi") > 4, 1).otherwise(0))
        .cast("bigint")
        .alias("n_alarm_high"),
        F.sum(F.when(F.col("s_lo") > 4, 1).otherwise(0))
        .cast("bigint")
        .alias("n_alarm_low"),
        F.round(F.max("s_hi") + F.lit(1e-9), 4).alias("max_cusum_high"),
        F.round(F.max("s_lo") + F.lit(1e-9), 4).alias("max_cusum_low"),
    )


@register(
    "q_ts_interval_union",
    oracle="""
    WITH iv AS (
        SELECT user_id,
               floor(epoch(ts::TIMESTAMP))::BIGINT AS s,
               floor(epoch(ts::TIMESTAMP))::BIGINT
                   + 60 * (event_id % 7 + 1) AS e
        FROM events
    ),
    pts AS (
        SELECT user_id, t, sum(delta) AS delta
        FROM (
            SELECT user_id, s AS t, 1 AS delta FROM iv
            UNION ALL
            SELECT user_id, e AS t, -1 AS delta FROM iv
        ) GROUP BY user_id, t
    ),
    sweep AS (
        SELECT user_id, t,
               sum(delta) OVER (PARTITION BY user_id ORDER BY t
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cov,
               lead(t) OVER (PARTITION BY user_id ORDER BY t) AS nxt
        FROM pts
    )
    SELECT user_id,
           CAST((SELECT count(*) FROM iv i WHERE i.user_id = sweep.user_id)
                AS BIGINT) AS n_intervals,
           CAST(sum(CASE WHEN cov > 0 THEN nxt - t ELSE 0 END) AS BIGINT)
               AS covered_seconds,
           CAST(max(cov) AS BIGINT) AS max_concurrency
    FROM sweep GROUP BY user_id
    """,
)
def q_ts_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union per user (sweep line): total wall-clock seconds
    covered by the union of each user's activity intervals (event start
    + a deterministic duration), plus peak overlap — the de-overlapped
    'actual active time' metric that naive duration sums double-count
    (billing, utilization, SLA math all need the union, not the sum).

    The sweep line IS the scale algorithm: intervals explode to ±1
    boundary points, points collapse per (user, timestamp) FIRST (so
    tie order can never matter), one running sum gives coverage, and
    covered length = Σ gaps where coverage > 0 via lead().  Everything
    is keyed by user_id — high-cardinality parallel windows, no
    interval-pair join (the O(n²) trap), one shuffle.

    All-integer arithmetic (epoch seconds, ±1 deltas) — bit-exact
    cross-engine."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.unix_timestamp("ts").alias("s"),
        (
            F.unix_timestamp("ts") + 60 * (F.col("event_id") % 7 + 1)
        ).alias("e"),
    )
    iv = iv.localCheckpoint(eager=False)
    pts = (
        iv.select("user_id", F.col("s").alias("t"), F.lit(1).alias("delta"))
        .unionByName(
            iv.select(
                "user_id", F.col("e").alias("t"), F.lit(-1).alias("delta")
            )
        )
        .groupBy("user_id", "t")
        .agg(F.sum("delta").alias("delta"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wl = Window.partitionBy("user_id").orderBy("t")
    sweep = pts.select(
        "user_id",
        "t",
        F.sum("delta").over(w).alias("cov"),
        F.lead("t").over(wl).alias("nxt"),
    )
    agg = sweep.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("cov") > 0, F.col("nxt") - F.col("t")).otherwise(0)
        )
        .cast("bigint")
        .alias("covered_seconds"),
        F.max("cov").cast("bigint").alias("max_concurrency"),
    )
    niv = iv.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_intervals")
    )
    return agg.join(niv, "user_id").select(
        "user_id", "n_intervals", "covered_seconds", "max_concurrency"
    )


@register(
    "q_ts_periodogram",
    oracle="""
    WITH daily AS (
        SELECT date_trunc('day', ts::TIMESTAMP) AS day,
               sum(cast(round(value * 100) AS BIGINT)) AS vc
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT row_number() OVER (ORDER BY day) - 1 AS t, vc,
               count(*) OVER () AS n, avg(vc) OVER () AS mu
        FROM daily
    ),
    freqs AS (SELECT unnest([2, 3, 4, 7, 14]) AS period),
    terms AS (
        SELECT f.period,
               (i.vc - i.mu) * cos(2 * pi() * i.t / f.period) AS c,
               (i.vc - i.mu) * sin(2 * pi() * i.t / f.period) AS s,
               i.n
        FROM idx i CROSS JOIN freqs f
    )
    SELECT period,
           round((power(sum(c), 2) + power(sum(s), 2)) / max(n) / 1e4
                 + 1e-9, 4) AS power
    FROM terms GROUP BY period ORDER BY period
    """,
)
def q_ts_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete periodogram of the daily volume curve at candidate
    cycle lengths (2/3/4/7/14 days): spectral power
    |Σ(x−x̄)e^{−2πit/p}|²/n per period — the cycle detector that says
    WHICH seasonality q_ts_seasonality should profile (a weekly cycle
    shows as a spike at p=7).

    Determinism: exact integer-cents daily sums; the cos/sin terms are
    identical doubles cross-engine (same t, same literals); only the
    Σ over the bounded day frame is order-sensitive — absorbed by the
    4-dp +1e-9 round (power reported in dollars² via the 1e4 cents
    scale-down).

    Shape: one fact agg → day frame; the day × 5-frequency cross and
    the per-period reduce are bounded by calendar × candidate count."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).try_cast("long")).alias("vc")
    )
    w = Window.orderBy("day")
    idx = daily.select(
        (F.row_number().over(w) - 1).alias("t"),
        "vc",
        F.count("*").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
        F.avg("vc").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("mu"),
    )
    freqs = idx.sparkSession.createDataFrame(
        [(2,), (3,), (4,), (7,), (14,)], "period int"
    )
    ang = 2 * math.pi * F.col("t") / F.col("period")
    terms = idx.crossJoin(F.broadcast(freqs)).select(
        "period",
        ((F.col("vc") - F.col("mu")) * F.cos(ang)).alias("c"),
        ((F.col("vc") - F.col("mu")) * F.sin(ang)).alias("s"),
        "n",
    )
    return (
        terms.groupBy("period")
        .agg(
            F.round(
                (F.pow(F.sum("c"), 2) + F.pow(F.sum("s"), 2))
                / F.max("n")
                / 1e4
                + F.lit(1e-9),
                4,
            ).alias("power")
        )
        .orderBy("period")
    )


@register(
    "q_ts_rolling_corr",
    oracle="""
    WITH daily AS (
        SELECT date_trunc('day', ts::TIMESTAMP) AS day,
               sum(CASE WHEN event_type = 'click'
                        THEN cast(round(value * 100) AS BIGINT)
                        ELSE 0 END) AS xc,
               sum(CASE WHEN event_type = 'view'
                        THEN cast(round(value * 100) AS BIGINT)
                        ELSE 0 END) AS yc
        FROM events GROUP BY 1
    ),
    r AS (
        SELECT day,
               count(*) OVER w AS n,
               sum(xc) OVER w AS sx, sum(yc) OVER w AS sy,
               sum(xc * xc) OVER w AS sxx, sum(yc * yc) OVER w AS syy,
               sum(xc * yc) OVER w AS sxy,
               row_number() OVER (ORDER BY day) AS rn
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           round((n * sxy - sx * sy)
                 / nullif(sqrt((n * sxx - sx * sx)::DOUBLE
                               * (n * syy - sy * sy)), 0)
                 + 1e-9, 4) AS corr_7d
    FROM r WHERE rn >= 7 ORDER BY day
    """,
)
def q_ts_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling correlation between the click and view daily
    volume curves — the metric-coupling monitor (a correlation break
    between two normally-coupled metrics is an incident signal even
    when each metric's own level looks fine).

    Determinism: exact integer-cents daily volumes → ALL six rolling
    moments are exact integer window sums (the pivot happens inside
    the day agg, so one pass); the Pearson algebra is a few exact-
    integer products cast to double once, nullif-guarded for
    zero-variance windows; 4-dp +1e-9.  Emitted only for full 7-day
    windows.  All windows on the bounded day frame."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).try_cast("long")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(
            F.when(F.col("event_type") == "click", cents).otherwise(0)
        ).alias("xc"),
        F.sum(
            F.when(F.col("event_type") == "view", cents).otherwise(0)
        ).alias("yc"),
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    wr = Window.orderBy("day")
    r = daily.select(
        "day",
        F.count("*").over(w).alias("n"),
        F.sum("xc").over(w).alias("sx"),
        F.sum("yc").over(w).alias("sy"),
        F.sum(F.col("xc") * F.col("xc")).over(w).alias("sxx"),
        F.sum(F.col("yc") * F.col("yc")).over(w).alias("syy"),
        F.sum(F.col("xc") * F.col("yc")).over(w).alias("sxy"),
        F.row_number().over(wr).alias("rn"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return (
        r.filter(F.col("rn") >= 7)
        .select(
            "day",
            F.round(
                (n * sxy - sx * sy)
                / F.nullif(
                    F.sqrt(
                        (n * sxx - sx * sx).cast("double")
                        * (n * syy - sy * sy)
                    ),
                    F.lit(0.0),
                )
                + F.lit(1e-9),
                4,
            ).alias("corr_7d"),
        )
        .orderBy("day")
    )


@register(
    "q_ts_load_factor",
    oracle="""
    WITH hourly AS (
        SELECT event_type, time_bucket(INTERVAL '1 hour', ts::TIMESTAMP)
                   AS h,
               count(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_hours,
           CAST(max(n) AS BIGINT) AS peak_hour,
           round(avg(n) + 1e-9, 4) AS mean_hour,
           round(max(n) / avg(n) + 1e-9, 4) AS peak_to_mean,
           round(avg(n) / max(n) + 1e-9, 4) AS load_factor
    FROM hourly GROUP BY event_type
    """,
)
def q_ts_load_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load factor per event type: peak-hour rate vs mean rate over
    observed hours — the capacity-planning number (provisioning for
    the mean melts at peak; load_factor = mean/peak says how bursty
    the workload is, 1.0 = perfectly flat).

    One map-side-combined hourly agg (epoch-aligned buckets, matching
    DuckDB time_bucket) → a k-type reduce over the bounded hour frame.
    Integer counts → exact ratios."""
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.window("ts", "1 hour").alias("w")
    ).agg(F.count("*").alias("n"))
    return hourly.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_hours"),
        F.max("n").cast("bigint").alias("peak_hour"),
        F.round(F.avg("n") + F.lit(1e-9), 4).alias("mean_hour"),
        F.round(F.max("n") / F.avg("n") + F.lit(1e-9), 4).alias(
            "peak_to_mean"
        ),
        F.round(F.avg("n") / F.max("n") + F.lit(1e-9), 4).alias(
            "load_factor"
        ),
    )


@register(
    "q_ts_ljung_box",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day, count(*) AS x
        FROM (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events) e
        GROUP BY event_type, date_trunc('day', ts)
    ),
    lagged AS (
        SELECT event_type, x,
               lag(x, 1) OVER (PARTITION BY event_type ORDER BY day) AS l1,
               lag(x, 2) OVER (PARTITION BY event_type ORDER BY day) AS l2,
               lag(x, 3) OVER (PARTITION BY event_type ORDER BY day) AS l3,
               lag(x, 4) OVER (PARTITION BY event_type ORDER BY day) AS l4
        FROM daily
    ),
    m AS (
        SELECT event_type, count(*) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(x * l1) AS BIGINT) AS p1,
               CAST(sum(CASE WHEN l1 IS NOT NULL THEN x + l1 END)
                    AS BIGINT) AS e1,
               CAST(sum(x * l2) AS BIGINT) AS p2,
               CAST(sum(CASE WHEN l2 IS NOT NULL THEN x + l2 END)
                    AS BIGINT) AS e2,
               CAST(sum(x * l3) AS BIGINT) AS p3,
               CAST(sum(CASE WHEN l3 IS NOT NULL THEN x + l3 END)
                    AS BIGINT) AS e3,
               CAST(sum(x * l4) AS BIGINT) AS p4,
               CAST(sum(CASE WHEN l4 IS NOT NULL THEN x + l4 END)
                    AS BIGINT) AS e4
        FROM lagged GROUP BY event_type HAVING count(*) >= 8
    ),
    r AS (
        SELECT event_type, n,
               round((p1 - (sx / CAST(n AS DOUBLE)) * e1
                      + (n - 1) * pow(sx / CAST(n AS DOUBLE), 2))
                     / (sxx - sx * (sx / CAST(n AS DOUBLE)))
                     + 1e-11, 6) AS r1,
               round((p2 - (sx / CAST(n AS DOUBLE)) * e2
                      + (n - 2) * pow(sx / CAST(n AS DOUBLE), 2))
                     / (sxx - sx * (sx / CAST(n AS DOUBLE)))
                     + 1e-11, 6) AS r2,
               round((p3 - (sx / CAST(n AS DOUBLE)) * e3
                      + (n - 3) * pow(sx / CAST(n AS DOUBLE), 2))
                     / (sxx - sx * (sx / CAST(n AS DOUBLE)))
                     + 1e-11, 6) AS r3,
               round((p4 - (sx / CAST(n AS DOUBLE)) * e4
                      + (n - 4) * pow(sx / CAST(n AS DOUBLE), 2))
                     / (sxx - sx * (sx / CAST(n AS DOUBLE)))
                     + 1e-11, 6) AS r4
        FROM m
    ),
    q AS (
        SELECT event_type, n, r1, r2, r3, r4,
               round(n * (n + 2e0)
                     * (r1 * r1 / (n - 1) + r2 * r2 / (n - 2)
                        + r3 * r3 / (n - 3) + r4 * r4 / (n - 4))
                     + 1e-11, 6) AS qs
        FROM r
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           round(r1 + 1e-9, 4) AS ac1,
           round(r2 + 1e-9, 4) AS ac2,
           round(r3 + 1e-9, 4) AS ac3,
           round(r4 + 1e-9, 4) AS ac4,
           round(qs + 1e-9, 4) AS q_stat,
           round(exp(-qs / 2) * (1 + qs / 2) + 1e-9, 4) AS p_value,
           CAST(exp(-qs / 2) * (1 + qs / 2) < 5e-2 AS BOOLEAN)
               AS autocorrelated
    FROM q
    """,
)
def q_ts_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test on each type's daily volume: are the
    first 4 autocorrelations JOINTLY zero?  Q = n(n+2)·Σₖ ρ̂ₖ²/(n−k) —
    the one-number answer to 'is this series white noise?' that
    q_ts_autocorr's single lag can miss (weekly patterns live at lags
    2-4).  With m=4 the χ²₄ survival function is EXACTLY
    e^(−Q/2)·(1+Q/2) (Erlang-2), so the p-value is a closed form both
    engines compute identically — no incomplete-gamma approximation
    (the q_stats_jarque_bera df=2 trick, one df-doubling up).

    Determinism: daily counts are integers, so every per-lag moment
    (Σxₜxₜ₋ₖ, Σ over the aligned window, Σx, Σx²) is exact; ρ̂ₖ uses the
    textbook global-mean centering rewritten in raw sums, 6-dp rounded
    before squaring, Q 6-dp before the exponential.  Shape: one hash
    agg to day grain → 4 lag columns from ONE window pass over the
    tiny per-type daily frame → one agg per type; series shorter than
    8 days are excluded (both engines)."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").alias("x"))
    w = Window.partitionBy("event_type").orderBy("day")
    x = F.col("x")
    lagged = daily.select(
        "event_type",
        x,
        *[F.lag("x", k).over(w).alias(f"l{k}") for k in (1, 2, 3, 4)],
    )
    aggs = [
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
    ]
    for k in (1, 2, 3, 4):
        lk = F.col(f"l{k}")
        aggs.append(F.sum(x * lk).alias(f"p{k}"))
        aggs.append(
            F.sum(F.when(lk.isNotNull(), x + lk)).alias(f"e{k}")
        )
    m = (
        lagged.groupBy("event_type")
        .agg(*aggs)
        .filter(F.col("n") >= 8)
    )
    n = F.col("n")
    mean = F.col("sx") / n.cast("double")
    den = F.col("sxx") - F.col("sx") * mean
    rho = {
        k: F.round(
            (F.col(f"p{k}") - mean * F.col(f"e{k}") + (n - k) * mean * mean)
            / den
            + F.lit(1e-11),
            6,
        )
        for k in (1, 2, 3, 4)
    }
    r = m.select("event_type", n.alias("n"), *[rho[k].alias(f"r{k}") for k in (1, 2, 3, 4)])
    qs = F.round(
        F.col("n")
        * (F.col("n") + F.lit(2.0))
        * sum(
            F.col(f"r{k}") * F.col(f"r{k}") / (F.col("n") - k)
            for k in (1, 2, 3, 4)
        )
        + F.lit(1e-11),
        6,
    )
    q = r.withColumn("qs", qs)
    p = F.exp(-F.col("qs") / 2) * (1 + F.col("qs") / 2)
    return q.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        *[
            F.round(F.col(f"r{k}") + F.lit(1e-9), 4).alias(f"ac{k}")
            for k in (1, 2, 3, 4)
        ],
        F.round(F.col("qs") + F.lit(1e-9), 4).alias("q_stat"),
        F.round(p + F.lit(1e-9), 4).alias("p_value"),
        (p < 0.05).alias("autocorrelated"),
    )


@register(
    "q_ts_hurst",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day, count(*) AS x
        FROM (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events) e
        GROUP BY event_type, date_trunc('day', ts)
    ),
    z AS (
        SELECT event_type,
               sum(x) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW)
                 - row_number() OVER (PARTITION BY event_type
                                      ORDER BY day)
                   * (sum(x) OVER (PARTITION BY event_type)
                      / CAST(count(*) OVER (PARTITION BY event_type)
                             AS DOUBLE)) AS zt,
               x,
               sum(x) OVER (PARTITION BY event_type) AS tot,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM daily
    ),
    m AS (
        SELECT event_type, max(n) AS n,
               max(zt) - min(zt) AS r,
               sqrt(sum(x * x) / CAST(max(n) AS DOUBLE)
                    - pow(max(tot) / CAST(max(n) AS DOUBLE), 2)) AS s
        FROM z GROUP BY event_type HAVING max(n) >= 8
    ),
    f AS (
        SELECT event_type, n, r, s,
               round(r / s + 1e-11, 6) AS rs
        FROM m
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           round(r + 1e-9, 4) AS r_range,
           round(s + 1e-9, 4) AS s_dev,
           round(rs + 1e-9, 4) AS rescaled_range,
           round(ln(rs) / ln(n) + 1e-9, 4) AS hurst,
           CAST(ln(rs) / ln(n) > 55e-2 AS BOOLEAN) AS persistent
    FROM f
    """,
)
def q_ts_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent (single-window R/S estimate) of each type's
    daily volume: H = ln(R/S)/ln(n), where R is the range of the
    mean-adjusted cumulative deviations and S the population std —
    H ≈ 0.5 random walk, > 0.5 persistent/trending (shocks compound:
    capacity must be provisioned for runs, not averages), < 0.5
    mean-reverting.  The long-memory readout that q_ts_autocorr's
    lag-1 and q_ts_ljung_box's short lags can't see.

    Determinism: Zₜ = cumsum(x) − t·x̄ where cumsum and t are exact
    integers and x̄ = Σx/n the same double both engines, so every Zₜ is
    bit-identical and max/min pick the same rows; R/S is 6-dp rounded
    before the log ratio.  Shape: one hash agg to day grain → one
    ordered window pass per type over the tiny daily frame (cumsum,
    rank, and the per-type totals share the single partition spec) →
    per-type agg; series under 8 days excluded (both engines)."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").alias("x"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    zt = (
        F.sum("x").over(wcum)
        - F.row_number().over(Window.partitionBy("event_type").orderBy("day"))
        * (F.sum("x").over(wall) / F.count("*").over(wall).cast("double"))
    )
    z = daily.select(
        "event_type",
        zt.alias("zt"),
        "x",
        F.sum("x").over(wall).alias("tot"),
        F.count("*").over(wall).alias("n"),
    )
    m = (
        z.groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            (F.max("zt") - F.min("zt")).alias("r"),
            F.sqrt(
                F.sum(F.col("x") * F.col("x")) / F.max("n").cast("double")
                - F.pow(F.max("tot") / F.max("n").cast("double"), 2)
            ).alias("s"),
        )
        .filter(F.col("n") >= 8)
    )
    rs = F.round(F.col("r") / F.col("s") + F.lit(1e-11), 6)
    f = m.withColumn("rs", rs)
    h = F.log(F.col("rs")) / F.log(F.col("n").cast("double"))
    return f.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.round(F.col("r") + F.lit(1e-9), 4).alias("r_range"),
        F.round(F.col("s") + F.lit(1e-9), 4).alias("s_dev"),
        F.round(F.col("rs") + F.lit(1e-9), 4).alias("rescaled_range"),
        F.round(h + F.lit(1e-9), 4).alias("hurst"),
        (h > 0.55).alias("persistent"),
    )


@register(
    "q_ts_mannkendall",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day, count(*) AS x
        FROM (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events) e
        GROUP BY event_type, date_trunc('day', ts)
    ),
    s AS (
        SELECT a.event_type,
               sum(CASE WHEN b.x > a.x THEN 1
                        WHEN b.x < a.x THEN -1 ELSE 0 END) AS s_stat
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.day < b.day
        GROUP BY a.event_type
    ),
    t AS (
        SELECT event_type, sum(tc) AS n,
               sum(tc * (tc - 1) * (2 * tc + 5)) AS tie_term
        FROM (
            SELECT event_type, x, count(*) AS tc
            FROM daily GROUP BY event_type, x
        ) GROUP BY event_type
    ),
    z AS (
        SELECT s.event_type, t.n, s.s_stat,
               (t.n * (t.n - 1e0) * (2 * t.n + 5) - t.tie_term) / 18e0
                   AS var_s,
               round(CASE
                   WHEN s.s_stat > 0 THEN (s.s_stat - 1)
                       / sqrt((t.n * (t.n - 1e0) * (2 * t.n + 5)
                               - t.tie_term) / 18e0)
                   WHEN s.s_stat < 0 THEN (s.s_stat + 1)
                       / sqrt((t.n * (t.n - 1e0) * (2 * t.n + 5)
                               - t.tie_term) / 18e0)
                   ELSE 0e0 END + 1e-11, 6) AS zst
        FROM s JOIN t USING (event_type)
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           CAST(s_stat AS BIGINT) AS s_stat,
           round(var_s + 1e-9, 4) AS var_s,
           round(zst + 1e-9, 4) AS z,
           round(2 * (1 - {_phi_sql("abs(zst)")}) + 1e-9, 4) AS p_value,
           CASE WHEN 2 * (1 - {_phi_sql("abs(zst)")}) >= 5e-2 THEN 'none'
                WHEN s_stat > 0 THEN 'increasing'
                ELSE 'decreasing' END AS trend
    FROM z ORDER BY event_type
    """,
)
def q_ts_mannkendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test on each type's daily volume: S =
    Σᵢ<ⱼ sign(xⱼ − xᵢ) over all day pairs, tie-corrected variance
    Var(S) = [n(n−1)(2n+5) − Σt(t−1)(2t+5)]/18, continuity-corrected
    z — the distribution-free 'is there a monotone trend?' verdict
    that complements q_ts_theilsen's slope ESTIMATE with a significance
    CALL (and, unlike OLS-on-time, is immune to outlier days).

    Determinism: S is a pure integer (sign comparisons of integer
    daily counts), tie groups are integer counts, so z is the same
    algebra both engines (6-dp before Φ).  Shape: day-grain hash agg →
    pair join ON event_type over the bounded per-type day frame
    (≤ n² pairs of a ~100-row frame — the q_ts_theilsen shape; at any
    corpus scale the day frame stays calendar-bounded) → per-type
    count aggs; the tie term is a second tiny agg on (type, x)."""
    from polybot_data_etl_spark.functions.stats import _phi_col

    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").alias("x"))
    a, b = daily.alias("a"), daily.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("b.x") > F.col("a.x"), 1)
                .when(F.col("b.x") < F.col("a.x"), -1)
                .otherwise(0)
            ).alias("s_stat")
        )
    )
    t = (
        daily.groupBy("event_type", "x")
        .agg(F.count("*").alias("tc"))
        .groupBy("event_type")
        .agg(
            F.sum("tc").alias("n"),
            F.sum(
                F.col("tc") * (F.col("tc") - 1) * (2 * F.col("tc") + 5)
            ).alias("tie_term"),
        )
    )
    j = s.join(t, "event_type")
    n, ss = F.col("n"), F.col("s_stat")
    var_s = (n * (n - F.lit(1.0)) * (2 * n + 5) - F.col("tie_term")) / 18.0
    zst = F.round(
        F.when(ss > 0, (ss - 1) / F.sqrt(var_s))
        .when(ss < 0, (ss + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
        + F.lit(1e-11),
        6,
    )
    z = j.withColumn("var_s", var_s).withColumn("zst", zst)
    p = 2 * (1 - _phi_col(F.abs(F.col("zst"))))
    trend = (
        F.when(p >= 0.05, "none")
        .when(F.col("s_stat") > 0, "increasing")
        .otherwise("decreasing")
    )
    return z.select(
        "event_type",
        n.cast("bigint").alias("n_days"),
        ss.cast("bigint").alias("s_stat"),
        F.round(F.col("var_s") + F.lit(1e-9), 4).alias("var_s"),
        F.round(F.col("zst") + F.lit(1e-9), 4).alias("z"),
        F.round(p + F.lit(1e-9), 4).alias("p_value"),
        trend.alias("trend"),
    ).orderBy("event_type")


@register(
    "q_ts_growth_accounting",
    oracle="""
    WITH uw AS (
        SELECT DISTINCT user_id,
               date_trunc('week', ts) AS week
        FROM (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events) e
    ),
    s AS (
        SELECT user_id, week,
               min(week) OVER (PARTITION BY user_id) AS first_week,
               lag(week) OVER (PARTITION BY user_id ORDER BY week)
                   AS prev_week
        FROM uw
    ),
    lab AS (
        SELECT week,
               CASE WHEN week = first_week THEN 'new'
                    WHEN prev_week = week - INTERVAL 7 DAY THEN 'retained'
                    ELSE 'resurrected' END AS status
        FROM s
    ),
    wk AS (
        SELECT week,
               count(*) AS active,
               sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS new_users,
               sum(CASE WHEN status = 'retained' THEN 1 ELSE 0 END)
                   AS retained,
               sum(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END)
                   AS resurrected
        FROM lab GROUP BY week
    ),
    ch AS (
        SELECT wk.*,
               lag(active) OVER (ORDER BY week) AS prev_active
        FROM wk
    )
    SELECT week, CAST(active AS BIGINT) AS active,
           CAST(new_users AS BIGINT) AS new_users,
           CAST(retained AS BIGINT) AS retained,
           CAST(resurrected AS BIGINT) AS resurrected,
           CAST(coalesce(prev_active - retained, 0) AS BIGINT) AS churned,
           round((new_users + resurrected)
                 / CAST(nullif(prev_active - retained, 0) AS DOUBLE)
                 + 1e-9, 4) AS quick_ratio
    FROM ch ORDER BY week
    """,
)
def q_ts_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting (the Social-Capital framework): every
    active user is exactly one of new / retained / resurrected, and
    churned(w) = active(w−1) − retained(w) — the decomposition that
    separates 'we grew because acquisition' from 'we grew because
    people came back', with the quick ratio (new+resurrected)/churned
    as the one-number health summary.  The lifecycle ledger behind
    q_ts_dau_wau's levels and q_ts_retention's cohort curves.

    Shape: fact → distinct (user, week) grain (ONE user-hash shuffle);
    first-week and previous-week both ride a single user-partitioned
    window pass; the weekly rollup is a map-side-combined agg and the
    churn lag runs over the calendar-bounded week frame.  Week
    equality uses exact Monday-truncated timestamps both engines."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    uw = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    wu = Window.partitionBy("user_id")
    wo = Window.partitionBy("user_id").orderBy("week")
    s = uw.select(
        "week",
        F.min("week").over(wu).alias("first_week"),
        F.lag("week").over(wo).alias("prev_week"),
    )
    status = (
        F.when(F.col("week") == F.col("first_week"), "new")
        .when(
            F.col("prev_week")
            == F.col("week") - F.expr("INTERVAL 7 DAYS"),
            "retained",
        )
        .otherwise("resurrected")
    )
    wk = (
        s.select("week", status.alias("status"))
        .groupBy("week")
        .agg(
            F.count("*").alias("active"),
            F.sum(F.when(F.col("status") == "new", 1).otherwise(0)).alias(
                "new_users"
            ),
            F.sum(
                F.when(F.col("status") == "retained", 1).otherwise(0)
            ).alias("retained"),
            F.sum(
                F.when(F.col("status") == "resurrected", 1).otherwise(0)
            ).alias("resurrected"),
        )
    )
    ch = wk.withColumn(
        "prev_active", F.lag("active").over(Window.orderBy("week"))
    )
    churn = F.col("prev_active") - F.col("retained")
    return ch.select(
        "week",
        F.col("active").cast("bigint").alias("active"),
        F.col("new_users").cast("bigint").alias("new_users"),
        F.col("retained").cast("bigint").alias("retained"),
        F.col("resurrected").cast("bigint").alias("resurrected"),
        F.coalesce(churn, F.lit(0)).cast("bigint").alias("churned"),
        F.round(
            (F.col("new_users") + F.col("resurrected"))
            / F.nullif(churn, F.lit(0)).cast("double")
            + F.lit(1e-9),
            4,
        ).alias("quick_ratio"),
    ).orderBy("week")


@register(
    "q_ts_burn_rate",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hour,
               count(*) AS events,
               sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                   AS errors
        FROM (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events) e
        GROUP BY date_trunc('hour', ts)
    ),
    w AS (
        SELECT hour, events, errors,
               errors / CAST(events AS DOUBLE) AS rate_1h,
               sum(errors) OVER (ORDER BY hour
                                 ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
                   / CAST(sum(events) OVER (ORDER BY hour
                                 ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
                          AS DOUBLE) AS rate_6h,
               sum(errors) OVER () / CAST(sum(events) OVER () AS DOUBLE)
                   AS slo_rate
        FROM hourly
    )
    SELECT hour, CAST(events AS BIGINT) AS events,
           CAST(errors AS BIGINT) AS errors,
           round(rate_1h + 1e-9, 4) AS rate_1h,
           round(rate_6h + 1e-9, 4) AS rate_6h,
           round(rate_1h / slo_rate + 1e-9, 4) AS burn_1h,
           round(rate_6h / slo_rate + 1e-9, 4) AS burn_6h,
           CAST(rate_1h / slo_rate > 12e-1
                AND rate_6h / slo_rate > 11e-1 AS BOOLEAN) AS page_alert
    FROM w ORDER BY hour
    """,
)
def q_ts_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window SLO burn-rate evaluation (the SRE-workbook alert):
    per hour, the error-event share over the 1 h and trailing 6 h
    windows expressed as multiples of the corpus-wide baseline rate,
    paging only when BOTH windows burn hot (1.2×/1.1×) — the two-window
    AND is what kills flappy single-window alerts while still catching
    sustained regressions.  The alert-evaluation layer over
    q_ts_burst's raw spike detector.

    Shape: one hash agg to hour grain, then every window (rolling 6 h
    sums + the baseline total) runs over the calendar-bounded hourly
    frame — the fact table is touched exactly once.  Integer
    error/event counts make every rate int-over-int, identical both
    engines."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour")).agg(
        F.count("*").alias("events"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("errors"),
    )
    w6 = Window.orderBy("hour").rowsBetween(-5, Window.currentRow)
    wa = Window.partitionBy()
    w = hourly.select(
        "hour",
        "events",
        "errors",
        (F.col("errors") / F.col("events").cast("double")).alias("rate_1h"),
        (
            F.sum("errors").over(w6)
            / F.sum("events").over(w6).cast("double")
        ).alias("rate_6h"),
        (
            F.sum("errors").over(wa)
            / F.sum("events").over(wa).cast("double")
        ).alias("slo_rate"),
    )
    b1 = F.col("rate_1h") / F.col("slo_rate")
    b6 = F.col("rate_6h") / F.col("slo_rate")
    return w.select(
        "hour",
        F.col("events").cast("bigint").alias("events"),
        F.col("errors").cast("bigint").alias("errors"),
        F.round(F.col("rate_1h") + F.lit(1e-9), 4).alias("rate_1h"),
        F.round(F.col("rate_6h") + F.lit(1e-9), 4).alias("rate_6h"),
        F.round(b1 + F.lit(1e-9), 4).alias("burn_1h"),
        F.round(b6 + F.lit(1e-9), 4).alias("burn_6h"),
        ((b1 > 1.2) & (b6 > 1.1)).alias("page_alert"),
    ).orderBy("hour")


@register(
    "q_ts_interarrival",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT)
                 - lag(CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS gap_s
        FROM events
    ),
    m AS (
        SELECT event_type, count(*) AS n,
               CAST(sum(gap_s) AS BIGINT) AS sg,
               CAST(sum(gap_s * gap_s) AS BIGINT) AS sgg
        FROM seq WHERE gap_s IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
           round(sg / CAST(n AS DOUBLE) + 1e-9, 4) AS mean_gap_s,
           round(sqrt(sgg / CAST(n AS DOUBLE)
                      - pow(sg / CAST(n AS DOUBLE), 2))
                 / (sg / CAST(n AS DOUBLE)) + 1e-9, 4) AS cv,
           CAST(abs(sqrt(sgg / CAST(n AS DOUBLE)
                         - pow(sg / CAST(n AS DOUBLE), 2))
                    / (sg / CAST(n AS DOUBLE)) - 1) < 2e-1
                AS BOOLEAN) AS poisson_like
    FROM m ORDER BY event_type
    """,
)
def q_ts_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time profile per event type: mean gap between a
    user's consecutive events (attributed to the LATER event's type)
    and its coefficient of variation — CV ≈ 1 is the memoryless
    Poisson signature, CV ≫ 1 means bursty sessions (q_ts_burst's
    per-user cause), CV ≪ 1 means scheduled/bot-like regularity.  The
    arrival-process characterization behind q_ts_session's gap
    threshold choice.

    Determinism: gaps are exact integer seconds (unix_timestamp ≡
    floor(epoch), the SKILL.md gotcha), moments are integer sums.
    Shape: ONE user-partitioned lag window (high-cardinality key, the
    q_ts_session shuffle) → map-side-combined moment agg per type."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    sec = F.unix_timestamp(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", (sec - F.lag(sec).over(w)).alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    m = seq.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("gap_s").alias("sg"),
        F.sum(F.col("gap_s") * F.col("gap_s")).alias("sgg"),
    )
    n = F.col("n")
    mu = F.col("sg") / n.cast("double")
    cv = F.sqrt(F.col("sgg") / n.cast("double") - mu * mu) / mu
    return m.select(
        "event_type",
        n.cast("bigint").alias("n_gaps"),
        F.round(mu + F.lit(1e-9), 4).alias("mean_gap_s"),
        F.round(cv + F.lit(1e-9), 4).alias("cv"),
        (F.abs(cv - 1) < 0.2).alias("poisson_like"),
    ).orderBy("event_type")


@register(
    "q_ts_entropy_rate",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ),
    t AS (
        SELECT prev_type, event_type AS next_type, count(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    ),
    w AS (
        SELECT t.*, sum(n) OVER (PARTITION BY prev_type) AS out_s,
               sum(n) OVER () AS total
        FROM t
    ),
    a AS (
        SELECT max(total) AS total,
               count(DISTINCT prev_type) AS k,
               -sum((n / CAST(total AS DOUBLE))
                    * ln(n / CAST(out_s AS DOUBLE))) AS h_rate
        FROM w
    ),
    s AS (
        SELECT prev_type, max(out_s) AS out_s, max(total) AS total
        FROM w GROUP BY prev_type
    ),
    h0 AS (
        SELECT -sum((out_s / CAST(total AS DOUBLE))
                    * ln(out_s / CAST(total AS DOUBLE))) AS h_state
        FROM s
    )
    SELECT CAST(a.total AS BIGINT) AS n_transitions,
           CAST(a.k AS BIGINT) AS n_states,
           round(a.h_rate + 1e-9, 4) AS entropy_rate,
           round(h0.h_state + 1e-9, 4) AS state_entropy,
           round(1 - a.h_rate / h0.h_state + 1e-9, 4) AS predictability
    FROM a CROSS JOIN h0
    """,
)
def q_ts_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the q_ts_markov behavior chain: H = −Σₛ π(s)
    Σₜ P(t|s)·ln P(t|s) with the empirical out-flow as π — bits of
    genuine novelty per step once the previous action is known —
    reported against the zeroth-order state entropy H₀, with
    predictability = 1 − H/H₀ (0 = the previous event tells you
    nothing, 1 = fully scripted journeys).  The one-number answer to
    'is modeling sequences worth it on this stream?'.

    Shape: q_ts_markov's transition-count pipeline (user-partitioned
    lag window → k²-cell hash agg) and then pure algebra over the
    bounded transition frame (windows + two 1-row reduces + a 1-row ×
    1-row cross).  π(s)·P(t|s) simplifies to n/total, so H is a single
    Σ over cells."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    t = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").alias("n")
    )
    wp = Window.partitionBy("prev_type")
    wa = Window.partitionBy()
    ww = t.select(
        "*",
        F.sum("n").over(wp).alias("out_s"),
        F.sum("n").over(wa).alias("total"),
    )
    a = ww.agg(
        F.max("total").alias("total"),
        F.countDistinct("prev_type").alias("k"),
        (
            -F.sum(
                (F.col("n") / F.col("total").cast("double"))
                * F.log(F.col("n") / F.col("out_s").cast("double"))
            )
        ).alias("h_rate"),
    )
    s = ww.groupBy("prev_type").agg(
        F.max("out_s").alias("out_s"), F.max("total").alias("total")
    )
    h0 = s.agg(
        (
            -F.sum(
                (F.col("out_s") / F.col("total").cast("double"))
                * F.log(F.col("out_s") / F.col("total").cast("double"))
            )
        ).alias("h_state")
    )
    return a.crossJoin(F.broadcast(h0)).select(
        F.col("total").cast("bigint").alias("n_transitions"),
        F.col("k").cast("bigint").alias("n_states"),
        F.round(F.col("h_rate") + F.lit(1e-9), 4).alias("entropy_rate"),
        F.round(F.col("h_state") + F.lit(1e-9), 4).alias("state_entropy"),
        F.round(
            1 - F.col("h_rate") / F.col("h_state") + F.lit(1e-9), 4
        ).alias("predictability"),
    )


_RET_MAX_OFFSET = 14   # fitted retention horizon (days)


@register(
    "q_ts_retention_halflife",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, date_trunc('day', ts::TIMESTAMP) AS day
        FROM events
    ),
    first_seen AS (
        SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id
    ),
    maxd AS (SELECT max(day) AS max_day FROM ev),
    active AS (
        SELECT CAST(date_diff('day', f.cohort_day, e.day) AS BIGINT)
                   AS day_offset,
               count(DISTINCT e.user_id) AS n_active
        FROM ev e JOIN first_seen f USING (user_id)
        GROUP BY 1
    ),
    elig AS (
        SELECT o.day_offset,
               (SELECT count(*) FROM first_seen f, maxd
                WHERE date_diff('day', f.cohort_day, maxd.max_day)
                      >= o.day_offset) AS n_eligible
        FROM (SELECT DISTINCT day_offset FROM active
              WHERE day_offset BETWEEN 1 AND {_RET_MAX_OFFSET}) o
    ),
    curve AS (
        SELECT a.day_offset, e.n_eligible, a.n_active,
               round(a.n_active / CAST(e.n_eligible AS DOUBLE)
                     + 1e-11, 6) AS r
        FROM active a JOIN elig e USING (day_offset)
        WHERE a.n_active > 0
    ),
    m AS (
        SELECT count(*) AS n, sum(day_offset) AS sx, sum(ln(r)) AS sy,
               sum(day_offset * ln(r)) AS sxy,
               sum(day_offset * day_offset) AS sxx,
               sum(ln(r) * ln(r)) AS syy
        FROM curve
    ),
    fit AS (
        SELECT round((n * sxy - sx * sy) / (n * sxx - sx * sx)
                     + 1e-11, 6) AS slope,
               pow(n * sxy - sx * sy, 2)
                   / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
        FROM m
    )
    SELECT curve.day_offset, CAST(curve.n_eligible AS BIGINT) AS n_eligible,
           CAST(curve.n_active AS BIGINT) AS n_active,
           round(curve.r + 1e-9, 4) AS retention,
           round(fit.slope + 1e-9, 4) AS decay_per_day,
           round(-ln(2) / fit.slope + 1e-9, 4) AS half_life_days,
           round(fit.r2 + 1e-9, 4) AS fit_r2
    FROM curve CROSS JOIN fit ORDER BY curve.day_offset
    """,
)
def q_ts_retention_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled retention curve with an exponential-decay fit: for each
    day offset 1..14, the share of ELIGIBLE users (cohorts old enough
    to be observable at that offset — no right-censoring bias) still
    active, plus the OLS fit of ln r(d) ~ d giving the per-day decay
    rate and the retention HALF-LIFE in days — the single number a
    growth team quotes from q_ts_retention's full cohort triangle, and
    the fit r² says whether exponential decay even describes this
    product (r² ≪ 1 ⇒ look for the habituated-core + tourist mixture).

    Shape: day-grain distinct activity → cohort assignment (one
    user-hash shuffle shared with q_ts_retention's pipeline) → offset
    aggregate; eligibility counts and the log-linear fit all run on
    the ≤14-row curve frame (cohort-size frame × offset grid is
    calendar-bounded).  The fit slope is 6-dp rounded before the
    half-life division."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    ev = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    )
    first_seen = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    maxd = ev.agg(F.max("day").alias("max_day"))
    active = (
        ev.join(first_seen, "user_id")
        .select(
            F.datediff(F.col("day"), F.col("cohort_day"))
            .cast("bigint")
            .alias("day_offset"),
            "user_id",
        )
        .groupBy("day_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .filter(
            (F.col("day_offset") >= 1) & (F.col("day_offset") <= _RET_MAX_OFFSET)
        )
    )
    cohort_age = first_seen.crossJoin(F.broadcast(maxd)).select(
        F.datediff(F.col("max_day"), F.col("cohort_day"))
        .cast("bigint")
        .alias("age")
    )
    ages = cohort_age.groupBy("age").agg(F.count("*").alias("n_users"))
    offs = active.select("day_offset").distinct()
    elig = (
        offs.join(ages, ages["age"] >= offs["day_offset"])
        .groupBy("day_offset")
        .agg(F.sum("n_users").alias("n_eligible"))
    )
    curve = (
        active.join(elig, "day_offset")
        .filter(F.col("n_active") > 0)
        .select(
            "day_offset",
            "n_eligible",
            "n_active",
            F.round(
                F.col("n_active") / F.col("n_eligible").cast("double")
                + F.lit(1e-11),
                6,
            ).alias("r"),
        )
    )
    lnr = F.log(F.col("r"))
    m = curve.agg(
        F.count("*").alias("n"),
        F.sum("day_offset").alias("sx"),
        F.sum(lnr).alias("sy"),
        F.sum(F.col("day_offset") * lnr).alias("sxy"),
        F.sum(F.col("day_offset") * F.col("day_offset")).alias("sxx"),
        F.sum(lnr * lnr).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope6 = F.round(
        (n * sxy - sx * sy) / (n * sxx - sx * sx) + F.lit(1e-11), 6
    )
    fit = m.select(
        slope6.alias("slope"),
        (
            F.pow(n * sxy - sx * sy, 2)
            / ((n * sxx - sx * sx) * (n * syy - sy * sy))
        ).alias("r2"),
    )
    return (
        curve.crossJoin(F.broadcast(fit))
        .select(
            "day_offset",
            F.col("n_eligible").cast("bigint").alias("n_eligible"),
            F.col("n_active").cast("bigint").alias("n_active"),
            F.round(F.col("r") + F.lit(1e-9), 4).alias("retention"),
            F.round(F.col("slope") + F.lit(1e-9), 4).alias("decay_per_day"),
            F.round(
                -F.log(F.lit(2.0)) / F.col("slope") + F.lit(1e-9), 4
            ).alias("half_life_days"),
            F.round(F.col("r2") + F.lit(1e-9), 4).alias("fit_r2"),
        )
        .orderBy("day_offset")
    )


_FANO_WINDOWS_H = (1, 4, 24)   # aggregation scales (hours)


@register(
    "q_ts_fano",
    oracle=f"""
    WITH sec AS (
        SELECT event_type,
               CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) AS s
        FROM events
    ),
    scales AS (
        SELECT unnest(ARRAY{list(_FANO_WINDOWS_H)}) AS w_hours
    ),
    bucketed AS (
        SELECT sec.event_type, scales.w_hours,
               CAST(floor(sec.s / (scales.w_hours * 36e2)) AS BIGINT)
                   AS bucket,
               count(*) AS x
        FROM sec CROSS JOIN scales
        GROUP BY 1, 2, 3
    ),
    m AS (
        SELECT event_type, w_hours, count(*) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM bucketed GROUP BY event_type, w_hours
    )
    SELECT event_type, CAST(w_hours AS INTEGER) AS w_hours,
           CAST(n AS BIGINT) AS n_windows,
           round(sx / CAST(n AS DOUBLE) + 1e-9, 4) AS mean_count,
           round((sxx / CAST(n AS DOUBLE)
                  - pow(sx / CAST(n AS DOUBLE), 2))
                 / (sx / CAST(n AS DOUBLE)) + 1e-9, 4) AS fano
    FROM m ORDER BY event_type, w_hours
    """,
)
def q_ts_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-time diagnostic: the Fano factor (window-count
    variance / mean) of each type's arrivals at 1 h / 4 h / 24 h
    aggregation scales — for Poisson traffic F ≈ 1 at EVERY scale;
    F growing with the window is the long-range-dependence signature
    (self-similar load) that q_ts_hurst estimates with one number and
    this shows scale-by-scale — the plot that decides whether capacity
    planning can use √t confidence bands at all.

    Determinism: buckets are integer-division epoch seconds (identical
    both engines), so every window count and moment is an exact
    integer.  Shape: the 3-scale explode is a constant-width cross on
    the scan (3× rows, still narrow) → ONE map-side-combined hash agg
    per (type, scale, bucket) → k×3-row moment algebra."""
    e = table(spark, sf_dir, "events")
    sec = e.select(
        "event_type", F.unix_timestamp(F.col("ts")).alias("s")
    )
    scales = spark.createDataFrame(
        [(w,) for w in _FANO_WINDOWS_H], "w_hours int"
    )
    bucketed = (
        sec.crossJoin(F.broadcast(scales))
        .groupBy(
            "event_type",
            "w_hours",
            (F.col("s") / (F.col("w_hours") * 3600))
            .cast("bigint")
            .alias("bucket"),
        )
        .agg(F.count("*").alias("x"))
    )
    m = bucketed.groupBy("event_type", "w_hours").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n")
    mu = F.col("sx") / n.cast("double")
    v = F.col("sxx") / n.cast("double") - mu * mu
    return m.select(
        "event_type",
        F.col("w_hours").cast("int").alias("w_hours"),
        n.cast("bigint").alias("n_windows"),
        F.round(mu + F.lit(1e-9), 4).alias("mean_count"),
        F.round(v / mu + F.lit(1e-9), 4).alias("fano"),
    ).orderBy("event_type", "w_hours")


@register(
    "q_ts_profile_drift",
    oracle="""
    WITH ev AS (
        SELECT CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) AS sec,
               extract(hour FROM ts::TIMESTAMP) AS hr
        FROM events
    ),
    split AS (
        SELECT hr,
               CASE WHEN 2 * sec < (SELECT min(sec) FROM ev)
                                   + (SELECT max(sec) FROM ev)
                    THEN 0 ELSE 1 END AS half
        FROM ev
    ),
    c AS (
        SELECT hr, half, count(*) AS n FROM split GROUP BY hr, half
    ),
    t AS (
        SELECT c.*, sum(n) OVER (PARTITION BY half) AS tot
        FROM c
    ),
    p AS (
        SELECT hr,
               round(coalesce(sum(CASE WHEN half = 0
                                       THEN n / CAST(tot AS DOUBLE)
                                  END), 0) + 1e-11, 6) AS p1,
               round(coalesce(sum(CASE WHEN half = 1
                                       THEN n / CAST(tot AS DOUBLE)
                                  END), 0) + 1e-11, 6) AS p2
        FROM t GROUP BY hr
    ),
    a AS (
        SELECT sum(p1 * p2) AS dot, sum(p1 * p1) AS n1,
               sum(p2 * p2) AS n2, sum(abs(p1 - p2)) AS l1,
               min(CASE WHEN p1 = (SELECT max(p1) FROM p)
                        THEN hr END) AS peak1,
               min(CASE WHEN p2 = (SELECT max(p2) FROM p)
                        THEN hr END) AS peak2
        FROM p
    )
    SELECT round(dot / sqrt(n1 * n2) + 1e-9, 6) AS profile_cosine,
           round(l1 / 2 + 1e-9, 4) AS tv_distance,
           CAST(peak1 AS INTEGER) AS peak_hour_first,
           CAST(peak2 AS INTEGER) AS peak_hour_second,
           CAST(dot / sqrt(n1 * n2) < 999e-3 AS BOOLEAN) AS shape_shift
    FROM a
    """,
)
def q_ts_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Workload-SHAPE drift: the 24-bin hour-of-day profile of the
    first vs second half of the observation window, compared by cosine
    similarity and total-variation distance, with each half's peak
    hour — volume monitors (q_dq_cardinality_shift) catch MORE or
    FEWER events; this catches the same volume arriving at DIFFERENT
    hours (a timezone bug, a shifted batch job, a new geo), which is
    what breaks capacity schedules.  TV distance is the 'share of
    traffic that moved' number.

    Shape: exact integer-epoch midpoint split (the q_dq_drift_chi2
    recipe) → ONE hash agg to the 24×2 frame → all comparison algebra
    on that bounded frame; profiles are 6-dp rounded before the
    cosine/TV so both engines compare identical vectors."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events").select(
        F.unix_timestamp(F.col("ts")).alias("sec"),
        F.hour(F.col("ts")).alias("hr"),
    )
    mm = e.agg(F.min("sec").alias("lo"), F.max("sec").alias("hi"))
    split = e.crossJoin(F.broadcast(mm)).select(
        "hr",
        F.when(2 * F.col("sec") < F.col("lo") + F.col("hi"), 0)
        .otherwise(1)
        .alias("half"),
    )
    c = split.groupBy("hr", "half").agg(F.count("*").alias("n"))
    t = c.withColumn(
        "tot", F.sum("n").over(Window.partitionBy("half"))
    )
    p = t.groupBy("hr").agg(
        F.round(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("half") == 0,
                        F.col("n") / F.col("tot").cast("double"),
                    )
                ),
                F.lit(0.0),
            )
            + F.lit(1e-11),
            6,
        ).alias("p1"),
        F.round(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("half") == 1,
                        F.col("n") / F.col("tot").cast("double"),
                    )
                ),
                F.lit(0.0),
            )
            + F.lit(1e-11),
            6,
        ).alias("p2"),
    )
    wmax = Window.partitionBy()
    pp = p.select(
        "*",
        F.max("p1").over(wmax).alias("m1"),
        F.max("p2").over(wmax).alias("m2"),
    )
    a = pp.agg(
        F.sum(F.col("p1") * F.col("p2")).alias("dot"),
        F.sum(F.col("p1") * F.col("p1")).alias("n1"),
        F.sum(F.col("p2") * F.col("p2")).alias("n2"),
        F.sum(F.abs(F.col("p1") - F.col("p2"))).alias("l1"),
        F.min(F.when(F.col("p1") == F.col("m1"), F.col("hr"))).alias(
            "peak1"
        ),
        F.min(F.when(F.col("p2") == F.col("m2"), F.col("hr"))).alias(
            "peak2"
        ),
    )
    # try_divide: an empty half-window zeroes a norm — cosine undefined
    cosv = F.try_divide(F.col("dot"), F.sqrt(F.col("n1") * F.col("n2")))
    return a.select(
        F.round(cosv + F.lit(1e-9), 6).alias("profile_cosine"),
        F.round(F.col("l1") / 2 + F.lit(1e-9), 4).alias("tv_distance"),
        F.col("peak1").cast("int").alias("peak_hour_first"),
        F.col("peak2").cast("int").alias("peak_hour_second"),
        (cosv < 0.999).alias("shape_shift"),
    )


@register(
    "q_ts_incidents",
    oracle="""
    WITH hourly AS (
        SELECT CAST(floor(epoch(date_trunc('hour', ts::TIMESTAMP)))
                    AS BIGINT) / 3600 AS hidx,
               count(*) AS events,
               sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                   AS errors
        FROM events GROUP BY 1
    ),
    base AS (
        SELECT sum(errors) / CAST(sum(events) AS DOUBLE) AS slo
        FROM hourly
    ),
    alert AS (
        SELECT h.hidx
        FROM hourly h, base b
        WHERE h.errors / CAST(h.events AS DOUBLE) > 12e-1 * b.slo
    ),
    isl AS (
        SELECT hidx,
               hidx - row_number() OVER (ORDER BY hidx) AS grp
        FROM alert
    ),
    inc AS (
        SELECT grp, count(*) AS dur, min(hidx) AS start_h
        FROM isl GROUP BY grp
    )
    SELECT CAST(count(*) AS BIGINT) AS n_incidents,
           CAST(coalesce(sum(dur), 0) AS BIGINT) AS alert_hours,
           CAST(coalesce(max(dur), 0) AS BIGINT) AS longest_hours,
           round(coalesce(avg(dur), 0) + 1e-9, 4) AS mean_hours,
           CAST(max(dur) >= 3 AS BOOLEAN) AS sustained_incident
    FROM inc
    """,
)
def q_ts_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incident segmentation: contiguous runs of hot hours (hourly
    error share > 1.2× the corpus baseline) merged into INCIDENTS via
    the gaps-and-islands rank-difference trick, reporting incident
    count, total alert hours, and the longest/mean durations — the
    difference between '40 alert hours' (meaningless) and '3
    incidents, longest 9 hours' (postmortem-shaped).  The
    incident-ledger layer over q_ts_burn_rate's per-hour alerts.

    Determinism: hour indices are exact integers (epoch/3600), the
    baseline multiple is an int-ratio comparison, and islands are pure
    integer arithmetic.  Shape: hour-grain hash agg → 1-row baseline
    broadcast → the island window runs over the alert-hour subset of
    the calendar-bounded hourly frame → 1-row incident reduce."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        (F.floor(F.unix_timestamp(F.date_trunc("hour", F.col("ts"))))
         / 3600)
        .cast("bigint")
        .alias("hidx")
    ).agg(
        F.count("*").alias("events"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("errors"),
    )
    base = hourly.agg(
        (F.sum("errors") / F.sum("events").cast("double")).alias("slo")
    )
    alert = (
        hourly.crossJoin(F.broadcast(base))
        .filter(
            F.col("errors") / F.col("events").cast("double")
            > 1.2 * F.col("slo")
        )
        .select("hidx")
    )
    isl = alert.select(
        "hidx",
        (F.col("hidx") - F.row_number().over(Window.orderBy("hidx"))).alias(
            "grp"
        ),
    )
    inc = isl.groupBy("grp").agg(
        F.count("*").alias("dur"), F.min("hidx").alias("start_h")
    )
    return inc.agg(
        F.count("*").cast("bigint").alias("n_incidents"),
        F.coalesce(F.sum("dur"), F.lit(0)).cast("bigint").alias(
            "alert_hours"
        ),
        F.coalesce(F.max("dur"), F.lit(0)).cast("bigint").alias(
            "longest_hours"
        ),
        F.round(F.coalesce(F.avg("dur"), F.lit(0.0)) + F.lit(1e-9), 4).alias(
            "mean_hours"
        ),
        (F.max("dur") >= 3).alias("sustained_incident"),
    )


@register(
    "q_ts_twap",
    oracle="""
    WITH seq AS (
        SELECT event_type, value,
               lead(CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 - CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) AS dt
        FROM events
    ),
    m AS (
        SELECT event_type,
               count(dt) AS n,
               CAST(sum(dt) AS BIGINT) AS tt,
               sum(value * dt) AS vw,
               sum(value) AS vs,
               count(*) AS n_all
        FROM seq GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_intervals,
           round(vw / CAST(tt AS DOUBLE) + 1e-9, 4) AS twap,
           round(vs / CAST(n_all AS DOUBLE) + 1e-9, 4) AS plain_avg,
           round((vw / CAST(tt AS DOUBLE) - vs / CAST(n_all AS DOUBLE))
                 / (vs / CAST(n_all AS DOUBLE)) + 1e-9, 4)
               AS twap_vs_avg,
           CAST(abs((vw / CAST(tt AS DOUBLE) - vs / CAST(n_all AS DOUBLE))
                    / (vs / CAST(n_all AS DOUBLE))) > 5e-2 AS BOOLEAN)
               AS sampling_biased
    FROM m ORDER BY event_type
    """,
)
def q_ts_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per event type: each observation
    weighted by how long it was the user's CURRENT state (hold time to
    the next event, the lead-lag integral) — vs the plain event-count
    average, with the relative gap as a sampling-bias readout: if
    users emit more events exactly when value spikes (activity bias),
    the plain average overstates reality and TWAP is the honest
    number (the finance-TWAP construction applied to product
    metrics).

    Determinism: hold times are exact integer seconds (floor-epoch
    lead diffs), weighted sums are plain doubles, ratios int-divided.
    Shape: ONE user-partitioned lead window (the q_ts_interarrival
    shuffle) → map-side-combined weighted-moment agg per type."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    sec = F.unix_timestamp(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        "value",
        (F.lead(sec).over(w) - sec).alias("dt"),
    )
    m = seq.groupBy("event_type").agg(
        F.count("dt").alias("n"),
        F.sum("dt").alias("tt"),
        F.sum(F.col("value") * F.col("dt")).alias("vw"),
        F.sum("value").alias("vs"),
        F.count("*").alias("n_all"),
    )
    twap = F.col("vw") / F.col("tt").cast("double")
    avg = F.col("vs") / F.col("n_all").cast("double")
    gap = (twap - avg) / avg
    return m.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_intervals"),
        F.round(twap + F.lit(1e-9), 4).alias("twap"),
        F.round(avg + F.lit(1e-9), 4).alias("plain_avg"),
        F.round(gap + F.lit(1e-9), 4).alias("twap_vs_avg"),
        (F.abs(gap) > 0.05).alias("sampling_biased"),
    ).orderBy("event_type")


@register(
    "q_ts_dod_wow",
    oracle="""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS day,
               count(*) AS n
        FROM (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events) e
        GROUP BY date_trunc('day', ts)
    ),
    g AS (
        SELECT day, n,
               lag(n, 1) OVER (ORDER BY day) AS d1,
               lag(n, 7) OVER (ORDER BY day) AS d7
        FROM daily
    )
    SELECT day, CAST(n AS BIGINT) AS n_events,
           round((n - d1) * 1e2 / d1 + 1e-9, 4) AS dod_pct,
           round((n - d7) * 1e2 / d7 + 1e-9, 4) AS wow_pct,
           CAST(abs(n - d7) * 1e2 / d7 < abs(n - d1) * 1e2 / d1
                AS BOOLEAN) AS wow_smoother
    FROM g WHERE d1 IS NOT NULL AND d7 IS NOT NULL
    ORDER BY day
    """,
)
def q_ts_dod_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth dashboard frame: day-over-day AND week-over-week volume
    change on one spine, with the per-day flag showing WoW is the
    smoother comparator (same-weekday comparison cancels the weekly
    cycle that makes DoD whipsaw every Monday) — the two numbers every
    daily standup quotes, and the empirical justification for
    preferring lag-7 baselines (q_ts_forecast_snaive) over lag-1.
    Rows where either baseline is missing are excluded (both
    engines).

    Shape: one day-grain hash agg → both lags from ONE ordered window
    pass over the calendar-bounded day frame; counts are exact
    integers so every percentage is int-algebra."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").alias("n"))
    w = Window.orderBy("day")
    g = daily.select(
        "day",
        "n",
        F.lag("n", 1).over(w).alias("d1"),
        F.lag("n", 7).over(w).alias("d7"),
    ).filter(F.col("d1").isNotNull() & F.col("d7").isNotNull())
    n, d1, d7 = F.col("n"), F.col("d1"), F.col("d7")
    return g.select(
        "day",
        n.cast("bigint").alias("n_events"),
        F.round((n - d1) * 100.0 / d1 + F.lit(1e-9), 4).alias("dod_pct"),
        F.round((n - d7) * 100.0 / d7 + F.lit(1e-9), 4).alias("wow_pct"),
        (F.abs(n - d7) * 100.0 / d7 < F.abs(n - d1) * 100.0 / d1).alias(
            "wow_smoother"
        ),
    ).orderBy("day")


# --- Round-10 registrations (formerly operators/staged_r10.py, the
# [STAGED r10] batch #434-450): moved into their family modules at
# the registration flip (VERDICT r9 §Next-round #2). ---


@register(
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


@register(
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


@register(
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
