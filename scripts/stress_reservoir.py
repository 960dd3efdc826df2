#!/usr/bin/env python
"""Stress the q_sample_reservoir claim (SCALE.md): sharded two-pass
top-k vs a single whole-group window on a skewed corpus — one group
owns most of the rows, so the single window funnels it into one task.

Usage: python scripts/stress_reservoir.py [--rows 20000000]
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

K = 20


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=float, default=2e7)
    args = ap.parse_args()
    n = int(args.rows)
    spark = build_session(
        app_name="stress-reservoir",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "8g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # 90% of rows in one hot lang, the rest split across 9
    d = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 10 < 9, "hot")
            .otherwise(F.concat(F.lit("l"), (F.col("id") % 9)))
            .alias("lang"),
            F.md5(F.col("id").cast("string")).alias("h"),
        )
        .localCheckpoint(eager=True)
    )

    def run(label, df):
        t0 = time.time()
        cnt = df.count()
        print(f"{label:28s} {time.time() - t0:7.2f} s   rows={cnt}")

    single = Window.partitionBy("lang").orderBy("h", "doc_id")
    run(
        "single whole-lang window",
        d.withColumn("rn", F.row_number().over(single)).filter(
            F.col("rn") <= K
        ),
    )

    local = Window.partitionBy(
        "lang", F.pmod(F.hash("doc_id"), F.lit(32))
    ).orderBy("h", "doc_id")
    merge = Window.partitionBy("lang").orderBy("h", "doc_id")
    run(
        "sharded two-pass top-k",
        d.withColumn("lrn", F.row_number().over(local))
        .filter(F.col("lrn") <= K)
        .withColumn("rn", F.row_number().over(merge))
        .filter(F.col("rn") <= K),
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
