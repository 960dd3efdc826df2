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
