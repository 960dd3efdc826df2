"""SQL scripting (Spark 4 procedural SQL: BEGIN/DECLARE/WHILE/IF) —
SURVEY §2 test-only component #412.

The procedural-driver-around-set-based-SQL pattern: control flow runs
on the driver over script variables, every data touch stays a full
Spark query — the engine surface that replaces bespoke Python driver
loops for iterative ETL (threshold search, convergence loops,
retry/backoff around statements).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table


@pytest.fixture(scope="module")
def scripting(spark, sf_dir):
    prev = spark.conf.get("spark.sql.scripting.enabled", "false")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_script"
    )
    yield spark
    spark.conf.set("spark.sql.scripting.enabled", prev)


def test_while_loop_accumulator(scripting):
    got = scripting.sql(
        """
        BEGIN
          DECLARE total INT DEFAULT 0;
          DECLARE i INT DEFAULT 1;
          WHILE i <= 100 DO
            SET total = total + i;
            SET i = i + 1;
          END WHILE;
          SELECT total AS s;
        END
        """
    ).first()
    assert got.s == 5050


def test_binary_search_minimal_topk_revenue_half(scripting, spark, sf_dir):
    """Script-driven binary search for the smallest k such that the
    top-k parts by revenue cover >= 50% of total revenue; each probe is
    a full distributed query, the bisection state lives in script
    variables.  Verified against the single-pass window answer."""
    got = scripting.sql(
        """
        BEGIN
          DECLARE lo INT DEFAULT 1;
          DECLARE hi INT DEFAULT 1000;
          DECLARE mid INT;
          DECLARE share DOUBLE;
          WHILE lo < hi DO
            SET mid = (lo + hi) DIV 2;
            SET share = (
              SELECT sum(rev) FROM (
                SELECT rev,
                       row_number() OVER (ORDER BY rev DESC, l_partkey) rnk
                FROM (SELECT l_partkey, sum(l_extendedprice) rev
                      FROM lineitem_script GROUP BY l_partkey)
              ) WHERE rnk <= mid
            ) / (SELECT sum(l_extendedprice) FROM lineitem_script);
            IF share >= 0.5 THEN SET hi = mid;
            ELSE SET lo = mid + 1;
            END IF;
          END WHILE;
          SELECT lo AS k_min;
        END
        """
    ).first()

    from pyspark.sql import Window

    pc = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("rev"))
    )
    w = Window.orderBy(F.desc("rev"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = pc.agg(F.sum("rev")).first()[0]
    want = (
        pc.withColumn("cum", F.sum("rev").over(w))
        .withColumn("rnk", F.row_number().over(
            Window.orderBy(F.desc("rev"), F.asc("l_partkey"))
        ))
        .filter(F.col("cum") >= 0.5 * total)
        .agg(F.min("rnk"))
        .first()[0]
    )
    assert got.k_min == want


def test_if_else_branching_on_query_result(scripting):
    got = scripting.sql(
        """
        BEGIN
          DECLARE n BIGINT;
          DECLARE label STRING;
          SET n = (SELECT count(*) FROM lineitem_script);
          IF n > 100 THEN SET label = 'big';
          ELSE SET label = 'small';
          END IF;
          SELECT label, n;
        END
        """
    ).first()
    assert got.label == "big" and got.n > 100


def test_execute_immediate_with_identifier_binding(scripting):
    """Dynamic SQL (#413): EXECUTE IMMEDIATE + IDENTIFIER(?) + session
    variables — table/column templating through BINDINGS, not string
    concatenation (the injection-safe form config-driven pipelines
    need)."""
    scripting.sql(
        "DECLARE OR REPLACE VARIABLE tbl STRING DEFAULT 'lineitem_script'"
    )
    got = scripting.sql(
        "EXECUTE IMMEDIATE "
        "'SELECT count(*) AS c FROM IDENTIFIER(?)' USING tbl"
    ).first()
    want = scripting.table("lineitem_script").count()
    assert got.c == want


def test_parameterized_sql_named_args(scripting):
    """spark.sql named parameters: the literal travels as a BOUND
    parameter, evaluated engine-side — same count as the inline form."""
    got = scripting.sql(
        "SELECT count(*) AS c FROM lineitem_script WHERE l_quantity >= :q",
        args={"q": 25},
    ).first()
    want = scripting.sql(
        "SELECT count(*) AS c FROM lineitem_script WHERE l_quantity >= 25"
    ).first()
    assert got.c == want.c and got.c > 0
