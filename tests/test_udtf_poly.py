"""Polymorphic Python UDTF via the Spark 4 ``analyze()`` API (#411).

The output schema is a plan-time function of a literal argument —
config-driven fixed-width extraction with statically resolved columns.
"""

from __future__ import annotations

import pytest
from pyspark.sql.functions import udtf

from polybot_data_etl_spark.functions.udf import SplitFixedUdtf


@pytest.fixture(scope="module")
def split_fixed(spark):
    spark.udtf.register("split_fixed_udtf", udtf(SplitFixedUdtf))
    return spark


def test_schema_is_plan_time_function_of_literal(split_fixed):
    three = split_fixed.sql("SELECT * FROM split_fixed_udtf('a b c d', 3)")
    five = split_fixed.sql("SELECT * FROM split_fixed_udtf('a b', 5)")
    assert three.columns == ["c0", "c1", "c2"]
    assert five.columns == ["c0", "c1", "c2", "c3", "c4"]
    assert three.first() == ("a", "b", "c")  # extra token truncated
    assert five.first() == ("a", "b", None, None, None)  # NULL-padded


def test_lateral_apply_over_corpus(split_fixed, sf_dir):
    """LATERAL apply over the documents table: every row resolves to
    the same static width, downstream selects by name."""
    from polybot_data_etl_spark.catalog import table

    table(split_fixed, sf_dir, "documents").filter("doc_id < 10") \
        .createOrReplaceTempView("docs_poly")
    out = split_fixed.sql(
        """
        SELECT d.doc_id, t.c0, t.c1
        FROM docs_poly d, LATERAL split_fixed_udtf(d.text, 2) t
        """
    ).collect()
    assert len(out) == 10
    assert all(r.c0 is not None for r in out)
    # c0/c1 are the first two whitespace tokens of the document
    ref = {
        r.doc_id: (r.text or "").split(" ")[:2]
        for r in table(split_fixed, sf_dir, "documents")
        .filter("doc_id < 10")
        .collect()
    }
    for r in out:
        want = ref[r.doc_id] + [None] * (2 - len(ref[r.doc_id]))
        assert [r.c0, r.c1] == want


def test_non_literal_width_is_a_plan_error(split_fixed, sf_dir):
    """analyze() rejects a column-valued width — schema can't depend on
    data; the error must surface at PLAN time, not mid-job."""
    from polybot_data_etl_spark.catalog import table
    from pyspark.errors import AnalysisException

    table(split_fixed, sf_dir, "documents").filter("doc_id < 3") \
        .createOrReplaceTempView("docs_poly_err")
    with pytest.raises(AnalysisException):
        split_fixed.sql(
            """
            SELECT t.* FROM docs_poly_err d,
            LATERAL split_fixed_udtf(d.text, CAST(d.doc_id AS INT)) t
            """
        ).collect()
