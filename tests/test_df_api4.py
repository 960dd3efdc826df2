"""Spark-4 DataFrame-API surfaces: `df.transpose()` and DataFrame-built
subqueries (`.scalar()` / `.exists()`).

SURVEY §2 test-only component (r7): the pure-DataFrame expressions of
shapes the engine otherwise reaches through SQL text — a scalar
subquery without `spark.sql`, an EXISTS semi-join predicate built from
a frame, and the row/column flip a reporting layer wants after a
narrow aggregate.  Each is pinned EQUIVALENT to its classic
formulation (join / semi-join / manual unpivot), so the API is an
ergonomic alternative, never new semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table


def test_scalar_subquery_equals_broadcast_join(spark, sf_dir):
    """.scalar() embeds a 1-row aggregate as a correlatable expression;
    must equal the classic crossJoin(broadcast(agg)) plan value-for-
    value on the orders-above-global-mean filter."""
    o = table(spark, sf_dir, "orders")
    mean_df = o.agg(F.avg("o_totalprice").alias("m"))
    via_scalar = o.filter(
        F.col("o_totalprice") > mean_df.scalar()
    ).select("o_orderkey")
    via_join = (
        o.crossJoin(F.broadcast(mean_df))
        .filter(F.col("o_totalprice") > F.col("m"))
        .select("o_orderkey")
    )
    assert via_scalar.count() > 0
    assert via_scalar.exceptAll(via_join).count() == 0
    assert via_join.exceptAll(via_scalar).count() == 0


def test_exists_predicate_equals_left_semi_join(spark, sf_dir):
    """.exists() as a boolean column must pick exactly the rows a
    LEFT SEMI join keeps (customers with at least one order)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    # the correlated reference must be marked .outer() — that is the
    # API's explicit stand-in for SQL's implicit outer-scope resolution
    via_exists = c.filter(
        o.where(F.col("o_custkey") == F.col("c_custkey").outer()).exists()
    ).select("c_custkey")
    via_semi = c.join(
        o, c["c_custkey"] == o["o_custkey"], "left_semi"
    ).select("c_custkey")
    assert via_exists.count() > 0
    assert via_exists.exceptAll(via_semi).count() == 0
    assert via_semi.exceptAll(via_exists).count() == 0


def test_transpose_equals_manual_unpivot_pivot(spark):
    """df.transpose(index) flips a narrow frame; must equal the manual
    unpivot→pivot construction cell-for-cell, with the former index
    row becoming the column axis."""
    df = spark.createDataFrame(
        [("p50", 1.0, 10.0), ("p95", 2.0, 20.0), ("p99", 3.0, 30.0)],
        "quantile string, latency double, bytes double",
    )
    t = df.transpose("quantile")
    # manual: unpivot metrics to rows, pivot quantiles to columns
    manual = (
        df.unpivot(
            "quantile", ["latency", "bytes"], "key", "val"
        )
        .groupBy("key")
        .pivot("quantile", ["p50", "p95", "p99"])
        .agg(F.first("val"))
    )
    got = {tuple(r) for r in t.collect()}
    want = {tuple(r) for r in manual.collect()}
    assert got == want
    assert set(t.columns) == {"key", "p50", "p95", "p99"}
