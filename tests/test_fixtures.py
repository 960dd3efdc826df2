"""Fixture schema pinning (SURVEY.md §5.5): catches driver regeneration
or Spark type-mapping drift explicitly."""

from __future__ import annotations

import pytest

from polybot_data_etl_spark.catalog import SCHEMAS, TABLES, assert_schema, table

EXPECTED_ROWS_SF0001 = {
    "region": 5,
    "nation": 25,
    "customer": 150,
    "supplier": 10,
    "part": 200,
    "orders": 1500,
    "lineitem": 6000,
    "events": 1000,
    "documents": 500,
    "embeddings": 500,
}


@pytest.mark.parametrize("name", TABLES)
def test_schema_pinned(spark, sf_dir, name):
    assert_schema(table(spark, sf_dir, name), name)


@pytest.mark.parametrize("name", TABLES)
def test_row_counts(spark, sf_dir, name):
    assert table(spark, sf_dir, name).count() == EXPECTED_ROWS_SF0001[name]


def test_unknown_table_rejected(spark, sf_dir):
    with pytest.raises(KeyError):
        table(spark, sf_dir, "nope")


def test_embeddings_are_unit_norm(spark, sf_dir):
    from pyspark.sql import functions as F

    from polybot_data_etl_spark.functions.vectors import l2_norm

    bad = (
        table(spark, sf_dir, "embeddings")
        .select(F.round(l2_norm(F.col("embedding")), 4).alias("n"))
        .filter(F.col("n") != 1.0)
        .count()
    )
    assert bad == 0


def test_all_schemas_cover_tables():
    assert set(SCHEMAS) == set(TABLES)
