#!/usr/bin/env python
"""Stress evidence for the q_win_weighted_median_scaled rewrite (run on
demand, not part of pytest): synthesizes an N-row lineitem-shaped frame
with 3 group flags (the low-cardinality partition key that serializes
the naive plan into 3 single-task sorts) and times

  * the single-pass cumulative-weight window (q_win_weighted_median's
    plan shape: Window PARTITION BY flag ORDER BY qty — one task per
    flag sorts N/3 rows), vs
  * the two-pass bucket-offset rewrite (q_win_weighted_median_scaled's
    shape: quantile-cut value buckets, (flag, bkt)-partitioned local
    cum-sums, ≤96-row bucket-subtotal prefix sum)

and asserts both produce identical (flag → median, total) answers.

Usage:  python scripts/stress_weighted_median.py [--rows 20000000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from polybot_data_etl_spark.session import build_session


def timed(label: str, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label:44s} {dt:7.2f} s   {out}")
    return dt


def synth(spark, n_rows: int):
    """lineitem-shaped: 3 flags, ~50 distinct quantities, money weights;
    deterministic (seeded by row id)."""
    return (
        spark.range(n_rows)
        .select(
            F.col("id").alias("l_orderkey"),
            (F.col("id") % 7).cast("int").alias("l_linenumber"),
            F.element_at(
                F.array(F.lit("A"), F.lit("N"), F.lit("R")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("l_returnflag"),
            ((F.xxhash64(F.col("id")) % 50 + 50) % 50 + 1)
            .cast("double")
            .alias("l_quantity"),
            (
                F.round(
                    ((F.xxhash64(F.col("id"), F.lit(1)) % 100000 + 100000)
                     % 100000)
                    / 100.0
                    + 1.0,
                    2,
                )
            ).alias("l_extendedprice"),
        )
    )


def single_pass(li):
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        "l_quantity",
        F.sum("l_extendedprice").over(w_cum).alias("cum_w"),
        F.sum("l_extendedprice").over(w_tot).alias("tot_w"),
    )
    return (
        ranked.filter(F.col("cum_w") >= F.col("tot_w") / 2)
        .groupBy("l_returnflag")
        .agg(
            F.round(F.min("l_quantity"), 2).alias("weighted_median_qty"),
            F.round(F.min("tot_w"), 2).alias("total_weight"),
        )
    )


def bucket_offset(li, n_buckets=32):
    base = li.select(
        "l_returnflag",
        "l_quantity",
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("w"),
    )
    qs = [i / n_buckets for i in range(1, n_buckets)]
    row = base.agg(
        F.percentile_approx("l_quantity", qs, 10_000).alias("bounds")
    ).first()
    bounds = sorted(set(row["bounds"] or []))
    if bounds:
        cuts = F.array(*[F.lit(float(b)) for b in bounds])
        bkt = F.size(
            F.filter(cuts, lambda x: x <= F.col("l_quantity"))
        ).cast("int")
    else:
        bkt = F.lit(0)
    bucketed = base.withColumn("bkt", bkt)
    w_local = (
        Window.partitionBy("l_returnflag", "bkt")
        .orderBy("l_quantity", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.withColumn("cum_local", F.sum("w").over(w_local))
    summary = bucketed.groupBy("l_returnflag", "bkt").agg(
        F.sum("w").alias("bw")
    )
    w_off = (
        Window.partitionBy("l_returnflag")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = summary.select(
        "l_returnflag",
        "bkt",
        F.coalesce(F.sum("bw").over(w_off), F.lit(0)).alias("offset"),
    )
    totals = summary.groupBy("l_returnflag").agg(F.sum("bw").alias("tot"))
    cum = F.col("offset") + F.col("cum_local")
    return (
        local.join(F.broadcast(offsets), ["l_returnflag", "bkt"])
        .join(F.broadcast(totals), "l_returnflag")
        .filter(cum * 2 >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(
            F.round(F.min("l_quantity"), 2).alias("weighted_median_qty"),
            F.round(F.min("tot") / 100.0 + F.lit(1e-9), 2).alias(
                "total_weight"
            ),
        )
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    args = ap.parse_args()

    spark = build_session(
        app_name="stress-weighted-median",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    li = synth(spark, args.rows).localCheckpoint()  # exclude synth cost
    print(f"rows: {li.count():,}")

    r1 = {}
    r2 = {}
    timed(
        "single-pass window (3 single-task sorts)",
        lambda: r1.update(
            {r.l_returnflag: (r.weighted_median_qty, r.total_weight)
             for r in single_pass(li).collect()}
        ),
    )
    timed(
        "bucket-offset two-pass (96-way parallel)",
        lambda: r2.update(
            {r.l_returnflag: (r.weighted_median_qty, r.total_weight)
             for r in bucket_offset(li).collect()}
        ),
    )
    assert set(r1) == set(r2)
    for k in r1:
        assert r1[k][0] == r2[k][0], (k, r1[k], r2[k])
        assert abs(r1[k][1] - r2[k][1]) < 0.02, (k, r1[k], r2[k])
    print("answers identical:", r1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
