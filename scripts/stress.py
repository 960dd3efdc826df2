#!/usr/bin/env python
"""Scale/skew stress harness (not part of pytest — run on demand):
synthesizes datasets 10-50× the sf0.1 fixtures, including a
pathologically hot key, and times each scale-path operator against its
naive twin.  Records the evidence behind SCALE.md's claims:

  * hour-bucketed range join vs plain per-user range join on a hot user
    (measured at --rows 2e7, 50%-hot, 1% slice: 269 s plain vs 9 s
    bucketed — 30x; the plain pair space is quadratic in the hot user)
  * salted_agg vs plain groupBy on a hot aggregation key (break-even
    for algebraic aggs — map-side combine already collapses the hot key)
  * salted_join vs plain shuffle join on a hot fact key, with AQE skew
    split on and off (measured at --rows 2e7, 50%-hot, broadcast
    disabled: AQE-on plain 6.8 s / salted 9.2 s — AQE's split wins;
    AQE-off plain 13.4 s / salted 10.2 s — the salt wins 1.3x and is
    the portable fallback where the split can't apply)

  * naive all-pairs haversine vs grid-bucketed 3×3 neighborhood radius
    join (measured at 50k band points: 55.4 s naive vs 1.4 s grid —
    40x, and the naive side grows with n² while the grid side tracks
    points-per-cell)
  * k-means assignment with broadcast centroids vs a shuffled centroid
    join (measured at 1M vectors × 16 dims, k=8: 3.9 s broadcast vs
    32.3 s shuffled — 8x; without the broadcast, the sort-merge join
    sorts the full exploded feature frame)

Usage:  python scripts/stress.py [--rows 2000000] [--hot-frac 0.5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from polybot_data_etl_spark.session import build_session
from polybot_data_etl_spark.operators.skew import salted_agg


def timed(label: str, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label:44s} {dt:7.2f} s   {out}")
    return dt


def synth_events(spark, n_rows: int, hot_frac: float):
    """Events-shaped frame: `hot_frac` of rows on user 0 (the hot key),
    the rest uniform over 100k users; timestamps spread over 30 days."""
    return (
        spark.range(n_rows)
        .select(
            F.col("id").alias("event_id"),
            F.when(F.rand(seed=7) < hot_frac, F.lit(0))
            .otherwise((F.col("id") % 100_000) + 1)
            .alias("user_id"),
            F.timestamp_seconds(
                F.lit(1_700_000_000) + (F.col("id") * 2_592_000 / n_rows).cast("long")
            ).alias("ts"),
            (F.col("id") % 1000 / 10.0).alias("value"),
        )
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--hot-frac", type=float, default=0.5)
    args = ap.parse_args()

    spark = build_session(
        app_name="polybot-stress",
        shuffle_partitions=32,
        # skew stress holds a 50%-hot SMJ partition + 64x-replicated dim
        # in one JVM; the 1g local default OOMs
        extra_conf={"spark.driver.memory": "8g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    e = synth_events(spark, args.rows, args.hot_frac)
    tmp = "/tmp/polybot_stress_events"
    e.write.mode("overwrite").parquet(tmp)
    e = spark.read.parquet(tmp)
    n = e.count()
    hot = e.filter(F.col("user_id") == 0).count()
    print(f"rows={n:,}  hot-user rows={hot:,} ({hot/n:.0%})")

    # --- skewed aggregation: plain vs salted -------------------------------
    aggs = {"total": ("sum", "value"), "n": ("count", "*")}
    timed(
        "plain groupBy(user_id) on hot key",
        lambda: e.groupBy("user_id")
        .agg(F.sum("value").alias("total"), F.count("*").alias("n"))
        .write.mode("overwrite")
        .format("noop")
        .save(),
    )
    timed(
        "salted_agg(user_id, salt=64) on hot key",
        lambda: salted_agg(e, ["user_id"], aggs, salt_n=64)
        .write.mode("overwrite")
        .format("noop")
        .save(),
    )

    # --- range self-join: plain (per-user pair space) vs hour-bucketed -----
    # Restrict to a slice so the plain variant finishes at all: the hot
    # user's pair space is quadratic in its row count.
    slice_e = e.filter(F.col("event_id") % 97 == 0)  # ~1% sample
    def plain_range():
        a, b = slice_e.alias("a"), slice_e.alias("b")
        return (
            a.join(
                b,
                (F.col("a.user_id") == F.col("b.user_id"))
                & (F.col("b.ts") > F.col("a.ts"))
                & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 1 HOUR")),
            )
            .select(F.col("a.event_id"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    def bucketed_range():
        hour = F.date_trunc("hour", F.col("ts"))
        a = slice_e.withColumn(
            "bkt", F.explode(F.array(hour, hour + F.expr("INTERVAL 1 HOUR")))
        )
        b = slice_e.withColumn("bkt", hour)
        return (
            a.alias("a")
            .join(
                b.alias("b"),
                (F.col("a.user_id") == F.col("b.user_id"))
                & (F.col("a.bkt") == F.col("b.bkt"))
                & (F.col("b.ts") > F.col("a.ts"))
                & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 1 HOUR")),
            )
            .select(F.col("a.event_id"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    timed("plain range join (1% slice, hot user)", plain_range)
    timed("hour-bucketed range join (same slice)", bucketed_range)

    # --- skewed fact⋈dim equi-join: plain shuffle vs salted ----------------
    # Dim too big to broadcast (forced by disabling the threshold), so
    # the hot key funnels one reducer in the plain sort-merge join.
    from polybot_data_etl_spark.operators.skew import salted_join

    dim = (
        spark.range(100_001)
        .select(
            F.col("id").alias("user_id"),
            F.concat(F.lit("seg-"), (F.col("id") % 7).cast("string")).alias(
                "segment"
            ),
        )
        .localCheckpoint(eager=True)
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_skew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    for skew_aqe in ("true", "false"):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_aqe)
        timed(
            f"plain shuffle join on hot key (AQE skew={skew_aqe})",
            lambda: e.join(dim, "user_id")
            .groupBy("segment")
            .agg(F.sum("value").alias("t"))
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )
        timed(
            f"salted_join salt=64 on hot key (AQE skew={skew_aqe})",
            lambda: salted_join(e, dim, ["user_id"], salt_n=64)
            .groupBy("segment")
            .agg(F.sum("value").alias("t"))
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", old_skew)

    # --- fuzzy linkage: naive block join vs deletion-neighborhood ----------
    # Synthesized names in ~1k-member nation blocks: the naive variant
    # scores |block|^2/2 Levenshtein pairs per block; the neighborhood
    # variant only verifies bucket-mates sharing a 1-deletion variant.
    n_names = min(args.rows // 20, 100_000)
    names = spark.range(n_names).select(
        F.col("id").alias("ck"),
        (F.col("id") % 20).cast("int").alias("nk"),
        F.concat(F.lit("Customer#"), F.lpad(F.col("id").cast("string"), 9, "0")).alias("nm"),
    )
    names.write.mode("overwrite").parquet("/tmp/polybot_stress_names")
    names = spark.read.parquet("/tmp/polybot_stress_names")

    def naive_fuzzy():
        a, b = names.alias("a"), names.alias("b")
        return (
            a.join(
                b,
                (F.col("a.nk") == F.col("b.nk"))
                & (F.col("a.ck") < F.col("b.ck"))
                & (F.levenshtein(F.col("a.nm"), F.col("b.nm")) <= 1),
            )
            .groupBy(F.col("a.nk"))
            .agg(F.count("*").alias("n"))
            .write.mode("overwrite").format("noop").save()
        )

    def neighborhood_fuzzy():
        variants = F.concat(
            F.array(F.col("nm")),
            F.transform(
                F.sequence(F.lit(1), F.length("nm")),
                lambda i: F.concat(
                    F.col("nm").substr(F.lit(1), i - 1),
                    F.col("nm").substr(i + 1, F.length("nm")),
                ),
            ),
        )
        keyed = names.select("ck", "nk", "nm", F.explode(variants).alias("v"))
        buckets = (
            keyed.groupBy("nk", "v")
            .agg(F.collect_list(F.struct("ck", "nm")).alias("ms"))
            .filter(F.size("ms") >= 2)
        )
        cand = (
            buckets.select("nk", F.explode("ms").alias("a"), "ms")
            .select("nk", F.col("a.ck").alias("ck_a"), F.col("a.nm").alias("nm_a"),
                    F.explode("ms").alias("b"))
            .filter(F.col("ck_a") < F.col("b.ck"))
            .select("nk", "ck_a", F.col("b.ck").alias("ck_b"), "nm_a",
                    F.col("b.nm").alias("nm_b"))
            .distinct()
        )
        return (
            cand.filter(F.levenshtein("nm_a", "nm_b") <= 1)
            .groupBy("nk").agg(F.count("*").alias("n"))
            .write.mode("overwrite").format("noop").save()
        )

    print(f"fuzzy linkage: {n_names:,} names in 20 blocks "
          f"(~{n_names // 20:,} per block)")
    timed("naive nation-block levenshtein join", naive_fuzzy)
    timed("deletion-neighborhood posting lists", neighborhood_fuzzy)

    # --- spatial radius join: naive all-pairs vs grid buckets --------------
    # Points uniform over the mid-latitude band; the naive join scores
    # n²/2 haversines, the grid join only co-bucketed candidates
    # (~9 × points-per-cell each).
    from polybot_data_etl_spark.operators.geo import (
        _CELL_LAT_DEG,
        _CELL_LON_DEG,
        _RADIUS_KM,
        haversine_km,
    )

    n_pts = min(args.rows // 100, 50_000)
    pts = spark.range(n_pts).select(
        F.col("id").alias("pid"),
        (((F.col("id") * 2654435761) % 1000000007) % 12000 / 100.0 - 60.0)
        .alias("lat"),
        (((F.col("id") * 2246822519) % 1000000007) % 34000 / 100.0 - 170.0)
        .alias("lon"),
    )
    pts.write.mode("overwrite").parquet("/tmp/polybot_stress_geo")
    pts = spark.read.parquet("/tmp/polybot_stress_geo")

    def naive_geo():
        a = pts.select(
            F.col("pid").alias("a_id"),
            F.col("lat").alias("a_lat"),
            F.col("lon").alias("a_lon"),
        )
        b = pts.select(
            F.col("pid").alias("b_id"),
            F.col("lat").alias("b_lat"),
            F.col("lon").alias("b_lon"),
        )
        d = F.round(
            haversine_km(
                F.col("a_lat"), F.col("a_lon"),
                F.col("b_lat"), F.col("b_lon"),
            ),
            2,
        )
        return (
            a.crossJoin(b)
            .filter(F.col("a_id") < F.col("b_id"))
            .filter(d <= _RADIUS_KM)
            .agg(F.count("*").alias("n"))
            .write.mode("overwrite").format("noop").save()
        )

    def grid_geo():
        ci = F.floor(F.col("lat") / _CELL_LAT_DEG).cast("long")
        cj = F.floor(F.col("lon") / _CELL_LON_DEG).cast("long")
        cells = pts.select("pid", "lat", "lon", ci.alias("ci"), cj.alias("cj"))
        a = (
            cells.withColumn("di", F.expr("explode(array(-1, 0, 1))"))
            .withColumn("dj", F.expr("explode(array(-1, 0, 1))"))
            .select(
                F.col("pid").alias("a_id"),
                F.col("lat").alias("a_lat"),
                F.col("lon").alias("a_lon"),
                (F.col("ci") + F.col("di")).alias("ci"),
                (F.col("cj") + F.col("dj")).alias("cj"),
            )
        )
        b = cells.select(
            F.col("pid").alias("b_id"),
            F.col("lat").alias("b_lat"),
            F.col("lon").alias("b_lon"),
            "ci", "cj",
        )
        d = F.round(
            haversine_km(
                F.col("a_lat"), F.col("a_lon"),
                F.col("b_lat"), F.col("b_lon"),
            ),
            2,
        )
        return (
            a.join(b, ["ci", "cj"])
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id", "a_lat", "a_lon", "b_lat", "b_lon")
            .distinct()
            .filter(d <= _RADIUS_KM)
            .agg(F.count("*").alias("n"))
            .write.mode("overwrite").format("noop").save()
        )

    print(f"spatial radius join: {n_pts:,} band points, {_RADIUS_KM} km")
    timed("naive all-pairs haversine", naive_geo)
    timed("grid-bucketed 3x3 neighborhood", grid_geo)

    # --- k-means assignment: broadcast centroids vs shuffled join ----------
    # One Lloyd assignment step over n vectors x 16 dims, k=8 centroids
    # in long form (128 rows). The engine broadcasts the centroid frame
    # (q_embed_kmeans); forcing a shuffle join instead sorts the full
    # exploded feature frame - the difference IS the broadcast-centroid
    # claim.
    n_vec = min(args.rows // 4, 1_000_000)
    dims, k = 16, 8
    ex = (
        spark.range(n_vec * dims)
        .select(
            (F.col("id") / dims).cast("long").alias("vec_id"),
            (F.col("id") % dims).alias("dim"),
            (((F.col("id") * 2654435761) % 1000000007) % 1000 / 1000.0)
            .alias("x"),
        )
    )
    ex.write.mode("overwrite").parquet("/tmp/polybot_stress_kmeans")
    ex = spark.read.parquet("/tmp/polybot_stress_kmeans")
    cent = spark.range(k * dims).select(
        (F.col("id") / dims).cast("long").alias("cluster"),
        (F.col("id") % dims).alias("dim"),
        (((F.col("id") * 2246822519) % 1000000007) % 1000 / 1000.0)
        .alias("comp"),
    )

    def assign(hint: bool):
        c = F.broadcast(cent) if hint else cent
        dots = (
            ex.join(c, "dim")
            .groupBy("vec_id", "cluster")
            .agg(F.sum(F.col("x") * F.col("comp")).alias("dotp"))
        )
        from pyspark.sql import Window as W

        best = dots.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("vec_id").orderBy(
                    F.desc("dotp"), F.asc("cluster")
                )
            ),
        ).filter(F.col("rn") == 1)
        return (
            best.groupBy("cluster").count()
            .write.mode("overwrite").format("noop").save()
        )

    old_t = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    print(f"k-means assignment: {n_vec:,} vectors x {dims} dims, k={k}")
    timed("broadcast centroid join (engine shape)", lambda: assign(True))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        timed("shuffled centroid join (no broadcast)", lambda: assign(False))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_t)

    # --- two-pass rank bucketing: min/max-width vs approx-quantile
    # boundaries on a pathologically skewed value column -------------
    # val = rand^8 * 1e6: continuous but heavy-tailed — ~92% of values
    # land in the lowest 1/32 of the range, so width buckets put ~all
    # rows in bucket 0 (one task sorts nearly everything) while
    # quantile cuts keep every bucket ≈ n/P.  (Identical-value ties are
    # the one skew boundaries can't split — that needs a composite
    # (val, hash-range) bucket key, same trick as the salted agg.)
    n_rank = args.rows
    skewed = spark.range(n_rank).select(
        F.col("id").alias("k"),
        (F.pow(F.rand(seed=11), 8) * 1e6).alias("val"),
    )
    skewed.write.mode("overwrite").parquet("/tmp/polybot_stress_rank")
    skewed = spark.read.parquet("/tmp/polybot_stress_rank")
    n_buckets = 32

    def rank_two_pass(quantile_cuts: bool):
        from pyspark.sql import Window as W

        if quantile_cuts:
            qs = [i / n_buckets for i in range(1, n_buckets)]
            bounds = sorted(
                set(
                    skewed.agg(
                        F.percentile_approx("val", qs, 10_000)
                    ).first()[0]
                )
            )
            cuts = F.array(*[F.lit(float(b)) for b in bounds])
            bkt = F.size(F.filter(cuts, lambda x: x <= F.col("val")))
        else:
            lohi = skewed.agg(
                F.min("val").alias("lo"), F.max("val").alias("hi")
            ).first()
            width = (lohi["hi"] - lohi["lo"]) / n_buckets or 1.0
            bkt = F.least(
                F.lit(n_buckets - 1),
                F.floor((F.col("val") - F.lit(lohi["lo"])) / F.lit(width)),
            ).cast("int")
        b = skewed.withColumn("bkt", bkt)
        local = b.withColumn(
            "lrn",
            F.row_number().over(W.partitionBy("bkt").orderBy("val", "k")),
        )
        counts = b.groupBy("bkt").agg(F.count("*").alias("cnt"))
        offsets = counts.withColumn(
            "off",
            F.coalesce(
                F.sum("cnt").over(
                    W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        ).select("bkt", "off")
        ranked = local.join(F.broadcast(offsets), "bkt").select(
            "k", (F.col("off") + F.col("lrn")).alias("rn")
        )
        ranked.write.mode("overwrite").format("noop").save()
        mx = counts.agg(F.max("cnt")).first()[0]
        return f"max bucket = {mx:,} of {n_rank:,}"

    print(f"two-pass global rank on 90%-hot value column: {n_rank:,} rows")
    timed("min/max-width buckets (skew-starved)", lambda: rank_two_pass(False))
    timed("approx-quantile buckets (engine shape)", lambda: rank_two_pass(True))

    return 0



if __name__ == "__main__":
    sys.exit(main())
