"""salted_agg (operators/skew.py): two-phase salted aggregation must be
row-for-row equivalent to the plain groupBy it replaces, on a skewed
key distribution, and must actually spread the hot key in phase 1."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from polybot_data_etl_spark.operators.skew import salted_agg


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of rows share key 0 (the hot key); the rest spread over 99."""
    return (
        spark.range(20_000)
        .select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 100)
            .alias("k"),
            (F.col("id") % 7).cast("double").alias("v"),
        )
    )


AGGS = {
    "total": ("sum", "v"),
    "n": ("count", "*"),
    "n_v": ("count", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
    "mean": ("avg", "v"),
}


def _plain(df):
    return df.groupBy("k").agg(
        F.sum("v").alias("total"),
        F.count("*").alias("n"),
        F.count("v").alias("n_v"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.avg("v").alias("mean"),
    )


def test_salted_agg_equals_plain_groupby(spark, skewed):
    got = salted_agg(skewed, ["k"], AGGS, salt_n=16).toPandas()
    want = _plain(skewed).toPandas()
    got = got.sort_values("k").reset_index(drop=True)[want.columns.tolist()]
    want = want.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_exact=False, rtol=1e-12)


def test_salted_agg_multi_key(spark, skewed):
    df = skewed.withColumn("k2", (F.col("v") >= 3).cast("int"))
    got = (
        salted_agg(df, ["k", "k2"], {"total": ("sum", "v"), "n": ("count", "*")})
        .toPandas()
        .sort_values(["k", "k2"])
        .reset_index(drop=True)
    )
    want = (
        df.groupBy("k", "k2")
        .agg(F.sum("v").alias("total"), F.count("*").alias("n"))
        .toPandas()
        .sort_values(["k", "k2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_exact=False, rtol=1e-12
    )


def test_salt_actually_spreads_hot_key(spark, skewed):
    """Phase 1 must see the hot key under multiple distinct salts —
    otherwise the helper is a no-op renaming of groupBy."""
    from polybot_data_etl_spark.operators.skew import _SALT

    salted = skewed.withColumn(
        _SALT, F.pmod(F.monotonically_increasing_id(), F.lit(16))
    )
    n_cells = (
        salted.filter(F.col("k") == 0).select(_SALT).distinct().count()
    )
    assert n_cells > 1


def test_rejects_non_mergeable(spark, skewed):
    with pytest.raises(ValueError, match="non-mergeable"):
        salted_agg(skewed, ["k"], {"p50": ("median", "v")})


def test_two_phase_plan_shape(spark, skewed):
    """The salted plan has the partial (keys+salt) and final (keys)
    aggregation exchanges — two-phase, as documented."""
    df = salted_agg(skewed, ["k"], {"total": ("sum", "v")}, salt_n=16)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan


def test_salted_join_equals_plain_join(spark, skewed):
    """salted_join must preserve inner/left join semantics exactly on a
    hot-keyed fact side, including fact-row multiplicity."""
    from polybot_data_etl_spark.operators.skew import salted_join

    dim = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("attr")
    ).filter(F.col("k") % 3 != 1)  # leave some fact keys unmatched
    for how in ("inner", "left"):
        plain = (
            skewed.join(dim, "k", how)
            .groupBy("k")
            .agg(
                F.count("*").alias("n"),
                F.sum("v").alias("sv"),
                F.sum("attr").alias("sa"),
            )
            .toPandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        salted = (
            salted_join(skewed, dim, ["k"], salt_n=8, how=how)
            .groupBy("k")
            .agg(
                F.count("*").alias("n"),
                F.sum("v").alias("sv"),
                F.sum("attr").alias("sa"),
            )
            .toPandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(plain, salted, check_like=True)


def test_salted_join_rejects_outer_modes(spark, skewed):
    from polybot_data_etl_spark.operators.skew import salted_join

    dim = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(skewed, dim, ["k"], how="full")


def test_aqe_skew_join_split_fires(spark):
    """AQE's OptimizeSkewedJoin must split a hot shuffle partition into
    parallel sub-reads (SortMergeJoin(skew=true) + 'skewed' AQE shuffle
    read) on a 90%-hot join key — the runtime complement of the manual
    salting in operators/skew.py (SCALE.md records when each wins).
    Thresholds are lowered so fixture-scale data trips the detector;
    confs are restored after."""
    from pyspark.sql import functions as F

    keys = (
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.forceOptimizeSkewedJoin",
        "spark.sql.autoBroadcastJoinThreshold",
    )
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB"
        )
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        left = spark.range(300000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), F.col("id").alias("w")
        )
        j = left.join(right, "k").select(
            F.substring("pad", 1, 4).alias("s"), "w"
        )
        # Execute THIS DataFrame: AQE finalizes the plan it ran, and
        # the skew markers only exist on the final physical plan.
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE skew split did not fire"
        assert "skewed" in plan  # the AQEShuffleRead marker
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_observe_metrics_without_extra_pass(spark, sf_dir):
    """The Observation API collects data-quality metrics DURING a query
    (accumulator-based) — row counts and sums arrive with the result,
    with no second scan of the input.  This is how a 100 TB pipeline
    self-audits (rows read, nulls seen, value totals) for free."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from polybot_data_etl_spark.catalog import table

    obs = Observation("dq")
    li = table(spark, sf_dir, "lineitem")
    out = (
        li.observe(
            obs,
            F.count("*").alias("rows_seen"),
            F.round(F.sum("l_extendedprice"), 2).alias("price_total"),
            F.count_if(F.col("l_quantity").isNull()).alias("null_qty"),
        )
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
    )
    got = {r["l_returnflag"]: r["n"] for r in out.collect()}
    m = obs.get
    assert m["rows_seen"] == sum(got.values())
    assert m["null_qty"] == 0
    assert m["price_total"] > 0
