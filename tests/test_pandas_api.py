"""pandas API on Spark (`pyspark.pandas`): the drop-in pandas layer
over the same engine.

SURVEY §2 test-only component (r7): a user migrating a pandas ETL
script gets the engine's distributed execution without a rewrite —
but only if the layer computes the SAME answers the SQL engine does.
Each test pins a pandas-API pipeline value-identical to its DataFrame
/ SQL twin on the shared fixtures (groupby-agg, merge, value_counts,
sort+head), and one pins the escape hatches (`to_spark` /
`pandas_api`) as lossless round-trips.
"""

from __future__ import annotations

import pyspark.pandas as ps
from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table


def _psdf(spark, sf_dir, name, cols):
    # index_col pins a real column as the index: the default attaches a
    # distributed-sequence index (an extra zipWithIndex-style pass)
    return ps.read_parquet(
        f"{sf_dir}/{name}.parquet", index_col=cols[0]
    )[cols[1:]]


def test_groupby_agg_matches_sql_engine(spark, sf_dir):
    psdf = ps.read_parquet(
        f"{sf_dir}/orders.parquet", index_col="o_orderkey"
    )
    got = (
        psdf.groupby("o_orderstatus")["o_totalprice"]
        .sum()
        .round(2)
        .sort_index()
        .to_pandas()
    )
    want = {
        r["o_orderstatus"]: r["s"]
        for r in table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("s"))
        .collect()
    }
    assert dict(got) == want


def test_merge_matches_join(spark, sf_dir):
    c = ps.read_parquet(f"{sf_dir}/customer.parquet")
    n = ps.read_parquet(f"{sf_dir}/nation.parquet")
    merged = c.merge(
        n, left_on="c_nationkey", right_on="n_nationkey", how="inner"
    )
    got = merged.groupby("n_name")["c_custkey"].count().to_pandas()
    want = {
        r["n_name"]: r["n"]
        for r in table(spark, sf_dir, "customer")
        .join(
            table(spark, sf_dir, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert dict(got) == want


def test_value_counts_matches_groupby_count(spark, sf_dir):
    d = ps.read_parquet(f"{sf_dir}/documents.parquet")
    got = dict(d["lang"].value_counts().to_pandas())
    want = {
        r["lang"]: r["n"]
        for r in table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_to_spark_and_pandas_api_round_trip(spark, sf_dir):
    """The escape hatches are lossless both ways: a Spark frame
    crossing into the pandas API and back carries identical rows."""
    sdf = table(spark, sf_dir, "supplier")
    back = sdf.pandas_api().to_spark()
    assert back.exceptAll(sdf).count() == 0
    assert sdf.exceptAll(back).count() == 0
