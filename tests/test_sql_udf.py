"""SQL-defined UDFs (Spark 4 `CREATE FUNCTION ... RETURN`) — SURVEY
§2 test-only component #428.

Reusable business logic declared in SQL, not Python: a scalar SQL UDF
is INLINED into the optimized plan (no Python worker, no serialization
boundary — it rides whole-stage codegen like any expression), and a
table-valued SQL UDF packages a parameterized query the way the
reference's config layer parameterized pipeline stages.  At 100 TB
this is the difference between a function call that costs nothing and
a BatchEvalPython barrier that breaks codegen around every row.

Pinned here: scalar == the inline expression twin, plan shows NO
Python eval node; TVF == the plain parameterized query; functions
compose (scalar inside the TVF body); DROP removes the binding.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table


def test_scalar_sql_udf_matches_inline_and_stays_jvm_side(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("li_udf")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_price(p DOUBLE, d DOUBLE)"
        " RETURNS DOUBLE RETURN round(p * (1 - d), 2)"
    )
    via_udf = spark.sql(
        """
        SELECT l_returnflag, round(sum(net_price(l_extendedprice,
                                                 l_discount)), 2) AS net
        FROM li_udf GROUP BY l_returnflag ORDER BY l_returnflag
        """
    )
    via_inline = (
        li.groupBy("l_returnflag")
        .agg(
            F.round(
                F.sum(
                    F.round(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount")),
                        2,
                    )
                ),
                2,
            ).alias("net")
        )
        .orderBy("l_returnflag")
    )
    assert [tuple(r) for r in via_udf.collect()] == [
        tuple(r) for r in via_inline.collect()
    ]
    # the 100 TB claim: the SQL UDF inlines — no Python eval barrier
    plan = via_udf._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_table_valued_sql_udf_matches_plain_query(spark, sf_dir):
    table(spark, sf_dir, "orders").createOrReplaceTempView("ord_udf")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION big_orders(seg_min DOUBLE)
        RETURNS TABLE(o_orderkey BIGINT, o_totalprice DOUBLE)
        RETURN SELECT o_orderkey, o_totalprice
               FROM ord_udf WHERE o_totalprice >= seg_min
        """
    )
    via_tvf = spark.sql(
        "SELECT count(*) AS n, round(sum(o_totalprice), 2) AS mass"
        " FROM big_orders(200000.0)"
    ).first()
    via_plain = spark.sql(
        "SELECT count(*) AS n, round(sum(o_totalprice), 2) AS mass"
        " FROM ord_udf WHERE o_totalprice >= 200000.0"
    ).first()
    assert tuple(via_tvf) == tuple(via_plain)
    assert via_tvf.n > 0


def test_sql_udfs_compose_and_drop(spark, sf_dir):
    table(spark, sf_dir, "orders").createOrReplaceTempView("ord_udf2")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION price_band(p DOUBLE)"
        " RETURNS STRING RETURN CASE WHEN p >= 150000 THEN 'high'"
        " WHEN p >= 50000 THEN 'mid' ELSE 'low' END"
    )
    # a TVF whose body calls the scalar UDF — config-layer composition
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION banded_counts()
        RETURNS TABLE(band STRING, n BIGINT)
        RETURN SELECT price_band(o_totalprice) AS band, count(*) AS n
               FROM ord_udf2 GROUP BY 1
        """
    )
    got = {
        r.band: r.n for r in spark.sql("SELECT * FROM banded_counts()").collect()
    }
    want = {
        r.band: r.n
        for r in spark.sql(
            "SELECT CASE WHEN o_totalprice >= 150000 THEN 'high'"
            " WHEN o_totalprice >= 50000 THEN 'mid' ELSE 'low' END AS band,"
            " count(*) AS n FROM ord_udf2 GROUP BY 1"
        ).collect()
    }
    assert got == want and set(got) == {"high", "mid", "low"}

    spark.sql("DROP TEMPORARY FUNCTION banded_counts")
    try:
        spark.sql("SELECT * FROM banded_counts()").collect()
        dropped = False
    except Exception:
        dropped = True
    assert dropped
