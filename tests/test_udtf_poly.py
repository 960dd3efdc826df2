"""Polymorphic Python UDTF via the Spark 4 ``analyze()`` API (#411).

The output schema is a plan-time function of a literal argument —
config-driven fixed-width extraction with statically resolved columns.
"""

from __future__ import annotations

import pandas as pd
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


def test_arrow_optimized_udtf_matches_pickled_path(spark, sf_dir):
    """`@udtf(useArrow=True)` swaps the row-pickle UDTF transport for
    Arrow batches (the pandas_udf treatment applied to table
    functions).  Same eval logic both ways must give identical rows —
    the transport is an optimization, never semantics."""
    from polybot_data_etl_spark.catalog import table

    def make(use_arrow: bool):
        @udtf(returnType="word string, n int", useArrow=use_arrow)
        class Words:
            def eval(self, text: str):
                if text:
                    for w in text.split(" ")[:3]:
                        yield w, len(w)

        return Words

    spark.udtf.register("words_arrow", make(True))
    spark.udtf.register("words_plain", make(False))
    docs = table(spark, sf_dir, "documents")
    docs.limit(50).createOrReplaceTempView("udtf_docs")
    a = spark.sql(
        "SELECT d.doc_id, w.word, w.n FROM udtf_docs d, "
        "LATERAL words_arrow(d.text) w"
    )
    p = spark.sql(
        "SELECT d.doc_id, w.word, w.n FROM udtf_docs d, "
        "LATERAL words_plain(d.text) w"
    )
    assert a.count() > 0
    assert a.exceptAll(p).count() == 0
    assert p.exceptAll(a).count() == 0


def test_python_udf_profiler_attributes_worker_time(spark):
    """spark.profile with spark.sql.pyspark.udf.profiler=perf samples
    the Python-worker execution of a UDF — the runtime observability
    that tells an operator WHICH udf is burning executor CPU before
    they ship it to a 1000-executor cluster.  The profile must exist
    for the executed UDF and show its eval frame."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql.functions import pandas_udf

    spark.conf.set("spark.sql.pyspark.udf.profiler", "perf")
    try:

        # NOTE: `from __future__ import annotations` stringifies type
        # hints and pandas_udf cannot resolve 'pd.Series' from a local
        # import, so the probe's types come from the module-scope pd
        # alias below.
        import pandas as _pd

        globals()["_pd"] = _pd

        @pandas_udf("double")
        def _prof_probe(s: "_pd.Series") -> "_pd.Series":
            return (s * 2 + 1).astype("float64")

        spark.range(1000).select(_prof_probe("id").alias("y")).collect()
        buf = io.StringIO()
        with redirect_stdout(buf):
            spark.profile.show(type="perf")
        out = buf.getvalue()
        assert "_prof_probe" in out or "function calls" in out
    finally:
        spark.conf.unset("spark.sql.pyspark.udf.profiler")
        spark.profile.clear()


def test_arrow_optimized_scalar_udf_matches_pickled_and_pandas(spark, sf_dir):
    """#429: `@udf(useArrow=True)` — the Arrow transport for SCALAR
    Python UDFs, closing the transport-parity family (#416 covered
    UDTFs, #420 mapInArrow/applyInArrow).  The same token-bucket logic
    through all three Python eval transports — pickled row UDF, Arrow
    row UDF, pandas_udf — must give identical rows; the executed plans
    must show the expected eval operators (ArrowEvalPython for both
    Arrow forms, BatchEvalPython for the pickled form), which is the
    difference between one serialization barrier per ROW and one per
    BATCH at 100 TB."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf, udf

    from polybot_data_etl_spark.catalog import table

    def bucket(n):
        return "long" if n is not None and n > 400 else "short"

    u_pickled = udf(bucket, "string", useArrow=False)
    u_arrow = udf(bucket, "string", useArrow=True)

    @pandas_udf("string")
    def u_pandas(n: pd.Series) -> pd.Series:
        return (n > 400).map({True: "long", False: "short"})

    d = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.length("text").alias("n"))
        .limit(200)
    )
    frames = {
        name: d.select("doc_id", fn(F.col("n")).alias("b"))
        for name, fn in [
            ("pickled", u_pickled),
            ("arrow", u_arrow),
            ("pandas", u_pandas),
        ]
    }
    rows = {
        name: sorted(map(tuple, df.collect())) for name, df in frames.items()
    }
    assert rows["pickled"] == rows["arrow"] == rows["pandas"]
    assert len(rows["arrow"]) == 200

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    assert "BatchEvalPython" in plan(frames["pickled"])
    assert "ArrowEvalPython" in plan(frames["arrow"])
    assert "ArrowEvalPython" in plan(frames["pandas"])
