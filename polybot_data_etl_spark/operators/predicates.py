"""Projection / filter / predicate queries (SURVEY.md §2 #6-8).

Reference provenance: the reference expressed analytics as SQL text under
src/etl/sql/ (SURVEY.md §0.1 [REC src/etl/.DS_Store:4992]); filters here
are declarative Column predicates so Catalyst pushes them into the
Parquet scan (PushedFilters — asserted in tests/test_plans.py). At 100 TB
that pushdown (plus min/max row-group skipping) is the difference between
scanning a shipdate-year slice and scanning the whole fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table
from polybot_data_etl_spark.registry import register


@register(
    "q_filter_range",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: range + equality predicates, arithmetic projection."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "q_predicate_mix",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size
    FROM part
    WHERE (p_brand IN ('Brand#1', 'Brand#7', 'Brand#13')
           OR p_type LIKE 'PRO%')
      AND p_size BETWEEN 10 AND 40
      AND NOT (p_name LIKE '%green%')
    """,
)
def q_predicate_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate: IN, LIKE, BETWEEN, OR, NOT."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        (
            F.col("p_brand").isin("Brand#1", "Brand#7", "Brand#13")
            | F.col("p_type").like("PRO%")
        )
        & F.col("p_size").between(10, 40)
        & ~F.col("p_name").like("%green%")
    ).select("p_partkey", "p_name", "p_brand", "p_type", "p_size")


@register(
    "q_case_when",
    oracle="""
    SELECT CASE WHEN o_totalprice >= 400000 THEN 'large'
                WHEN o_totalprice >= 150000 THEN 'medium'
                ELSE 'small' END AS bucket,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY bucket
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional projection feeding an aggregation."""
    o = table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") >= 400000, "large")
        .when(F.col("o_totalprice") >= 150000, "medium")
        .otherwise("small")
        .alias("bucket")
    )
    return o.groupBy(bucket).agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )
