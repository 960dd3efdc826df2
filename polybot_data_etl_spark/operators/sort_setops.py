"""Sort / limit / top-k + set operations (SURVEY.md §2 #39-44).

Scale posture: `orderBy(...).limit(k)` compiles to TakeOrderedAndProject —
each task keeps a k-row heap, the driver merges P heaps; no global sort
is ever materialized. Set ops are hash-based distinct/except on the
shuffled key — UNION ALL is a zero-shuffle concatenation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table
from polybot_data_etl_spark.registry import register


@register(
    "q_sort_multi",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort, mixed asc/desc, unique-key tiebreak, limit."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy(
            F.asc("o_orderpriority"), F.desc("o_totalprice"), F.asc("o_orderkey")
        )
        .limit(100)
    )


@register(
    "q_topk_global",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 50
    """,
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k by measure (TakeOrderedAndProject: per-partition heaps)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(50)
    )


@register(
    "q_union_all",
    oracle="""
    SELECT o_orderkey FROM orders WHERE o_totalprice > 450000
    UNION ALL
    SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (keeps duplicates from overlapping filters)."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 450000).select("o_orderkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    return a.unionAll(b)


@register(
    "q_union_distinct",
    oracle="""
    SELECT o_orderkey FROM orders WHERE o_totalprice > 450000
    UNION
    SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union (hash distinct after concatenation)."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 450000).select("o_orderkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    return a.union(b).distinct()


@register(
    "q_intersect",
    oracle="""
    SELECT l_orderkey AS okey FROM lineitem WHERE l_quantity > 45
    INTERSECT
    SELECT o_orderkey AS okey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersect (distinct semantics, like SQL INTERSECT)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    a = li.filter(F.col("l_quantity") > 45).select(F.col("l_orderkey").alias("okey"))
    b = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("okey")
    )
    return a.intersect(b)


@register(
    "q_except",
    oracle="""
    SELECT o_orderkey AS okey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT l_orderkey AS okey FROM lineitem WHERE l_quantity > 30
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (distinct semantics, like SQL EXCEPT)."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    a = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderkey").alias("okey")
    )
    b = li.filter(F.col("l_quantity") > 30).select(F.col("l_orderkey").alias("okey"))
    return a.subtract(b)


@register(
    "q_setops_all",
    oracle="""
    SELECT 'intersect' AS op, user_id FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT ALL
        SELECT user_id FROM events WHERE event_type = 'view'
    )
    UNION ALL
    SELECT 'except' AS op, user_id FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        EXCEPT ALL
        SELECT user_id FROM events WHERE event_type = 'view'
    )
    """,
)
def q_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL):
    multiplicity-aware overlap and difference of two event streams —
    "how many click events does each user have matched/unmatched by a
    view event" without collapsing duplicates, which the DISTINCT
    variants (q_intersect/q_except) would destroy.

    Shape: Spark plans both as a single aggregate on the value row
    computing per-side counts then a generate of min(c₁,c₂) /
    max(c₁−c₂,0) replicas — one shuffle on the row key, no join, same
    cost class as a groupBy; scale-safe for any key cardinality."""
    e = table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id")
    views = e.filter(F.col("event_type") == "view").select("user_id")
    return clicks.intersectAll(views).select(
        F.lit("intersect").alias("op"), "user_id"
    ).unionByName(
        clicks.exceptAll(views).select(
            F.lit("except").alias("op"), "user_id"
        )
    )
