"""Scans (SURVEY.md §2 #1-2).

Reference provenance: the reference's extract stage read whole tables
through its repository layer (SURVEY.md §0.1 [REC src/etl/.DS_Store:4824]);
here a scan is a Parquet read that Catalyst prunes to exactly the
projected columns (verified via explain() in tests/test_plans.py — the
ReadSchema of #1 carries only the three projected columns, which is the
property that matters when the table is 100 TB wide).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table
from polybot_data_etl_spark.registry import register


@register(
    "q_scan_project",
    oracle="SELECT l_orderkey, l_partkey, l_quantity FROM lineitem",
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection-only scan; column pruning must reach the Parquet reader."""
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )


@register("q_scan_count", oracle="SELECT count(*) AS n FROM lineitem")
def q_scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table count — planned as a metadata-only Parquet row-count."""
    return table(spark, sf_dir, "lineitem").agg(F.count("*").alias("n"))
