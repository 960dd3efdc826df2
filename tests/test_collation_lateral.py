"""Spark-4 SQL semantics surfaces: string collations and the
DataFrame `lateralJoin` API.

SURVEY §2 test-only component (r7): collations move case/accent
policy INTO the type (comparison, grouping, DISTINCT under
UNICODE_CI) instead of scattering lower() calls — each is pinned
equal to the explicit normalization; `lateralJoin` is the DataFrame
spelling of SQL LATERAL, pinned equal to the select-explode plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table


def test_ci_collation_groupby_equals_lower_normalization(spark, sf_dir):
    """GROUP BY a UNICODE_CI-collated column must produce exactly the
    groups of GROUP BY lower(col) — the policy lives in the type, the
    engine plans a plain hash aggregate."""
    d = table(spark, sf_dir, "documents")
    ci = (
        d.select(F.collate(F.col("source"), "UNICODE_CI").alias("s"))
        .groupBy("s")
        .agg(F.count("*").alias("n"))
    )
    norm = (
        d.select(F.lower("source").alias("s"))
        .groupBy("s")
        .agg(F.count("*").alias("n"))
    )
    got = {(r["s"].lower(), r["n"]) for r in ci.collect()}
    want = {(r["s"], r["n"]) for r in norm.collect()}
    assert got == want


def test_ci_collation_distinct_and_equality(spark):
    df = spark.createDataFrame(
        [("Foo",), ("foo",), ("FOO",), ("bar",)], "c string"
    )
    ci = df.select(F.collate("c", "UNICODE_CI").alias("c"))
    assert ci.distinct().count() == 2
    assert (
        ci.filter(F.col("c") == F.lit("fOo")).count() == 3
    )  # equality itself is case-insensitive under the collation


def test_lateraljoin_equals_select_explode(spark, sf_dir):
    """df.lateralJoin(tvf.explode(...outer())) must emit exactly the
    rows of the select-explode formulation — LATERAL as an API, same
    Generate plan underneath."""
    d = (
        table(spark, sf_dir, "documents")
        .limit(200)
        .select("doc_id", F.split("text", " ").alias("ws"))
    )
    via_lateral = d.lateralJoin(
        spark.tvf.explode(F.col("ws").outer())
    ).select("doc_id", F.col("col").alias("w"))
    via_select = d.select("doc_id", F.explode("ws").alias("w"))
    assert via_lateral.count() == via_select.count()
    assert via_lateral.exceptAll(via_select).count() == 0
    assert via_select.exceptAll(via_lateral).count() == 0
