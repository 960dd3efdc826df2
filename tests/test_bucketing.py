"""Bucketed co-located join (SURVEY.md §4 shuffle-minimization): writing
both fact tables bucketed by the join key lets Spark sort-merge-join
them with ZERO exchanges — at 100 TB this converts the biggest shuffle
in the workload (fact ⋈ fact) into a local merge per bucket.
"""

from __future__ import annotations

import shutil

import pytest

from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table


@pytest.fixture()
def bucketed_tables(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
           .mode("overwrite").saveAsTable("b_orders"))
    (lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
             .mode("overwrite").saveAsTable("b_lineitem"))
    # at fixture scale Spark would broadcast the small side and skip the
    # bucketed scan entirely; pin the confs that make the 100 TB plan
    # (fact ⋈ fact sort-merge over co-located buckets) observable
    old = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.sources.bucketing.autoBucketedScan.enabled": spark.conf.get(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled"
        ),
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    for k, v in old.items():
        spark.conf.set(k, v)
    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    joined = (
        spark.table("b_lineitem")
        .join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = joined._jdf.queryExecution().explainString(mode)
    join_part = plan.split("HashAggregate")[0]
    # co-located: the join itself needs no exchange (the only exchange
    # in the whole plan is the final aggregation's)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in join_part, join_part
    # and it computes the same answer as the unbucketed join
    rows = {r["o_orderstatus"]: r["rev"] for r in joined.collect()}
    assert len(rows) > 0


def test_bucket_pruning_single_key(spark, bucketed_tables):
    # point lookup on the bucket key scans only the matching bucket
    df = spark.table("b_lineitem").filter(F.col("l_orderkey") == 7)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    assert "SelectedBucketsCount: 1 out of 8" in plan
