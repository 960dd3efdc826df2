"""Repository layer (sources/repository.py): keyed upsert semantics,
idempotence, and dynamic partition-overwrite isolation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table
from polybot_data_etl_spark.sources import repository as repo


@pytest.fixture()
def seeded_table(spark, sf_dir, tmp_path):
    path = str(tmp_path / "cust_repo")
    table(spark, sf_dir, "customer").write.parquet(path)
    return path


def test_upsert_updates_inserts_preserves(spark, seeded_table):
    before = spark.read.parquet(seeded_table)
    n_before = before.count()
    # update two existing keys, insert one new key
    updates = spark.createDataFrame(
        [
            (1, "UPDATED-1", 0, 999.99, "BUILDING"),
            (2, "UPDATED-2", 1, 888.88, "MACHINERY"),
            (10_000_001, "NEW", 2, 1.23, "HOUSEHOLD"),
        ],
        before.schema.names,
    ).select(
        *[F.col(c).cast(t) for c, t in zip(before.schema.names,
                                           [f.dataType.simpleString()
                                            for f in before.schema.fields])]
    )
    # materialize BEFORE the swap: `before` references the pre-merge
    # files, which merge_upsert replaces
    orig3 = before.filter(F.col("c_custkey") == 3).collect()[0]
    repo.merge_upsert(spark, seeded_table, updates, ["c_custkey"])
    after = spark.read.parquet(seeded_table)
    assert after.count() == n_before + 1
    got = {
        r["c_custkey"]: r["c_name"]
        for r in after.filter(
            F.col("c_custkey").isin(1, 2, 3, 10_000_001)
        ).collect()
    }
    assert got[1] == "UPDATED-1" and got[2] == "UPDATED-2"
    assert got[10_000_001] == "NEW"
    assert got[3] == orig3["c_name"]  # untouched key preserved verbatim


def test_upsert_idempotent(spark, seeded_table):
    before = spark.read.parquet(seeded_table)
    # decouple the update batch from the target's files (the merge swaps
    # them out, so a lazy file-backed plan would dangle on the 2nd call)
    updates = spark.createDataFrame(
        before.filter(F.col("c_custkey") < 5)
        .withColumn("c_acctbal", F.lit(42.0))
        .collect(),
        before.schema,
    )
    repo.merge_upsert(spark, seeded_table, updates, ["c_custkey"])
    once = spark.read.parquet(seeded_table).toPandas()
    repo.merge_upsert(spark, seeded_table, updates, ["c_custkey"])
    twice = spark.read.parquet(seeded_table).toPandas()
    from polybot_data_etl_spark.testing import frames_match

    ok, why = frames_match(
        once.sort_values("c_custkey").reset_index(drop=True),
        twice.sort_values("c_custkey").reset_index(drop=True),
    )
    assert ok, why


def test_upsert_rejects_duplicate_update_keys(spark, seeded_table):
    before = spark.read.parquet(seeded_table)
    dup = before.limit(1).unionAll(before.limit(1))
    with pytest.raises(ValueError, match="key-unique"):
        repo.merge_upsert(spark, seeded_table, dup, ["c_custkey"])


def test_dynamic_partition_overwrite_isolation(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_by_status")
    orders = table(spark, sf_dir, "orders")
    repo.overwrite_partitions(spark, orders, path, ["o_orderstatus"])
    statuses = {
        r["o_orderstatus"]
        for r in spark.read.parquet(path).select("o_orderstatus").distinct().collect()
    }
    assert len(statuses) >= 2

    # rewrite ONLY the 'O' partition with a single marker row
    one = orders.filter(F.col("o_orderstatus") == "O").limit(1).withColumn(
        "o_totalprice", F.lit(-1.0)
    )
    repo.overwrite_partitions(spark, one, path, ["o_orderstatus"])
    after = spark.read.parquet(path)
    # 'O' partition replaced…
    o_part = after.filter(F.col("o_orderstatus") == "O").collect()
    assert len(o_part) == 1 and o_part[0]["o_totalprice"] == -1.0
    # …every other partition untouched
    other_before = orders.filter(F.col("o_orderstatus") != "O").count()
    other_after = after.filter(F.col("o_orderstatus") != "O").count()
    assert other_before == other_after
