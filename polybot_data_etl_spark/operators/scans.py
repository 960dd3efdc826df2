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


@register(
    "q_scan_time_pruned",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
    FROM (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events) e
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <  TIMESTAMP '2024-01-12 00:00:00'
    GROUP BY event_type
    """,
)
def q_scan_time_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded scan + aggregate: the canonical 'last N days'
    dashboard read.  The ts-range predicate must reach the parquet scan
    as PushedFilters (row-group min/max skipping on the flat file;
    partition-directory pruning on the PARTITION_HINTS date layout —
    tests/test_layout.py proves that half), so at 100 TB the query
    reads two days, not the lake."""
    e = table(spark, sf_dir, "events")
    lo = F.expr("TIMESTAMP_NTZ '2024-01-10 00:00:00'")
    hi = F.expr("TIMESTAMP_NTZ '2024-01-12 00:00:00'")
    return (
        e.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
    )
