"""Connector/sink surface (SURVEY.md §2 #3-4): CSV/JSON round trips with
declared schemas; plain + hive-partitioned Parquet sinks with read-back
equality."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from polybot_data_etl_spark.catalog import table
from polybot_data_etl_spark.sources import files


def _assert_same_rows(a, b, key):
    assert a.count() == b.count()
    assert a.subtract(b).count() == 0
    assert b.subtract(a).count() == 0
    assert a.select(key).distinct().count() == a.count()


def test_csv_round_trip(spark, sf_dir, tmp_path):
    nation = table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_csv")
    files.write_csv(nation, path)
    back = files.read_csv(
        spark,
        path,
        T.StructType(
            [
                T.StructField("n_nationkey", T.IntegerType()),
                T.StructField("n_name", T.StringType()),
                T.StructField("n_regionkey", T.IntegerType()),
            ]
        ),
    )
    _assert_same_rows(nation, back, "n_nationkey")


def test_json_round_trip(spark, sf_dir, tmp_path):
    cust = table(spark, sf_dir, "customer")
    path = str(tmp_path / "cust_json")
    files.write_json(cust, path)
    back = files.read_json(
        spark,
        path,
        T.StructType(
            [
                T.StructField("c_custkey", T.LongType()),
                T.StructField("c_name", T.StringType()),
                T.StructField("c_nationkey", T.IntegerType()),
                T.StructField("c_acctbal", T.DoubleType()),
                T.StructField("c_mktsegment", T.StringType()),
            ]
        ),
    ).select(*[f.name for f in cust.schema.fields])
    _assert_same_rows(cust, back, "c_custkey")


def test_parquet_sink_plain(spark, sf_dir, tmp_path):
    orders = table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_pq")
    files.write_parquet(orders, path)
    back = spark.read.parquet(path)
    _assert_same_rows(orders, back, "o_orderkey")


def test_parquet_sink_partitioned(spark, sf_dir, tmp_path):
    """Hive-partitioned write: directory layout prunes, values survive."""
    orders = table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_part")
    files.write_parquet(orders, path, partition_by=["order_year"])

    back = spark.read.parquet(path)
    assert back.count() == orders.count()

    # Partition pruning: a year-filtered read must scan only that dir.
    one_year = back.filter(F.col("order_year") == 1997)
    plan = one_year._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "order_year" in plan
    want = orders.filter(F.col("order_year") == 1997).count()
    assert one_year.count() == want


def test_orc_round_trip_partitioned(spark, sf_dir, tmp_path):
    orders = table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    files.write_orc(orders, path, partition_by=["o_orderstatus"])
    back = files.read_orc(spark, path).select(*orders.columns)
    _assert_same_rows(orders, back, "o_orderkey")


def test_orc_pushdown_plan_filters(spark, sf_dir, tmp_path):
    orders = table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc_pd")
    files.write_orc(orders, path)
    plan = (
        files.read_orc(spark, path)
        .filter(F.col("o_totalprice") > 100000.0)
        .select("o_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "o_totalprice" in plan


def test_text_lines_and_whole_file(spark, tmp_path):
    p = tmp_path / "docs"
    p.mkdir()
    (p / "a.txt").write_text("line one\nline two\n")
    (p / "b.txt").write_text("only line\n")
    lines = files.read_text(spark, str(p))
    assert lines.count() == 3
    assert set(lines.columns) == {"value"}
    whole = files.read_text(spark, str(p), whole_file=True)
    assert whole.count() == 2
    assert any("line one\nline two" in r.value for r in whole.collect())


def test_binary_source_glob(spark, tmp_path):
    p = tmp_path / "blobs"
    p.mkdir()
    (p / "x.bin").write_bytes(b"\x00\x01\x02payload")
    (p / "y.txt").write_text("not a blob")
    df = files.read_binary(spark, str(p), glob="*.bin")
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].content == b"\x00\x01\x02payload"
    assert rows[0].length == 10


def test_csv_malformed_row_modes(spark, tmp_path):
    """Dirty-input posture: a malformed CSV row is quarantined into
    _corrupt_record under PERMISSIVE, dropped under DROPMALFORMED, and
    fails the read under FAILFAST — the three ingestion policies a
    production loader chooses between."""
    import pytest
    from py4j.protocol import Py4JJavaError

    src = tmp_path / "dirty.csv"
    src.write_text(
        "k,v\n"
        "1,10\n"
        "2,not_an_int\n"
        "3,30\n"
    )
    schema = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("v", T.IntegerType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    permissive = files.read_csv(
        spark, str(src), schema, mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    ).cache()
    assert permissive.count() == 3
    bad = permissive.filter(F.col("_corrupt_record").isNotNull())
    assert bad.count() == 1
    assert bad.first().k == 2  # typed fields parse where possible
    permissive.unpersist()

    strict_schema = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("v", T.IntegerType()),
        ]
    )
    dropped = files.read_csv(
        spark, str(src), strict_schema, mode="DROPMALFORMED"
    )
    assert sorted(r.k for r in dropped.collect()) == [1, 3]

    with pytest.raises(Exception):
        files.read_csv(
            spark, str(src), strict_schema, mode="FAILFAST"
        ).collect()


def test_json_malformed_line_quarantine(spark, tmp_path):
    """A syntactically broken JSON line lands in _corrupt_record with
    NULL typed columns; clean lines parse normally."""
    src = tmp_path / "dirty.jsonl"
    src.write_text(
        '{"k": 1, "v": 10}\n'
        '{broken json!!\n'
        '{"k": 3, "v": 30}\n'
    )
    schema = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("v", T.IntegerType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    got = files.read_json(
        spark, str(src), schema, mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    ).cache()
    assert got.count() == 3
    assert got.filter(F.col("_corrupt_record").isNotNull()).count() == 1
    assert sorted(
        r.k for r in got.filter(F.col("k").isNotNull()).collect()
    ) == [1, 3]
    got.unpersist()


def test_orc_predicate_pushdown(spark, sf_dir, tmp_path):
    """The ORC connector must push filters into the scan like parquet
    (the format is a drop-in for the lake layout)."""
    path = str(tmp_path / "orders_orc")
    files.write_orc(table(spark, sf_dir, "orders"), path)
    back = files.read_orc(spark, path).filter(F.col("o_totalprice") > 100000.0)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = back._jdf.queryExecution().explainString(mode)
    assert "PushedFilters:" in plan
    assert "GreaterThan(o_totalprice" in plan.split("PushedFilters:")[1][:200]
    assert back.count() > 0


def test_avro_connector_gate_or_roundtrip(spark, sf_dir, tmp_path):
    """Avro is the one lake format pip pyspark doesn't bundle
    (external module since Spark 2.4).  When the jar is deployed the
    connector must round-trip like ORC; when it isn't, it must fail
    with an error naming the package to add — never a raw
    ClassNotFoundException from inside the DataSource resolver."""
    nation = table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_avro")
    if files.avro_available(spark):
        files.write_avro(nation, path)
        back = files.read_avro(spark, path).select(*nation.columns)
        _assert_same_rows(nation, back, "n_nationkey")
    else:
        import pytest

        with pytest.raises(RuntimeError, match="spark-avro"):
            files.write_avro(nation, path)
        with pytest.raises(RuntimeError, match="spark-avro"):
            files.read_avro(spark, path)


def test_xml_round_trip_exact(spark, sf_dir, tmp_path):
    """XML source/sink (native in Spark 4): write orders as XML, read
    back under an explicit schema, rows exactly equal — the lake
    interchange format #5 after parquet/ORC/CSV/JSON, still the
    export shape of many enterprise feeds."""
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        # XML carries timestamps as text; pin the lossless string form
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias(
            "o_date_s"
        ),
    )
    path = str(tmp_path / "orders_xml")
    files.write_xml(orders, path, row_tag="order", root_tag="orders")
    back = files.read_xml(
        spark,
        path,
        row_tag="order",
        schema=(
            "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
            " o_totalprice double, o_date_s string"
        ),
    ).select(*orders.columns)
    _assert_same_rows(orders, back, "o_orderkey")


def test_xml_attributes_and_nesting(spark, tmp_path):
    """XML structure mapping: attributes become _-prefixed columns,
    nested elements become structs — the shape contract code relies
    on when flattening a feed."""
    src = tmp_path / "feed"
    src.mkdir()
    (src / "a.xml").write_text(
        "<rows>"
        '<row id="7"><who><name>ann</name><org>acme</org></who>'
        "<amt>1.5</amt></row>"
        "</rows>"
    )
    df = files.read_xml(spark, str(src), row_tag="row")
    [r] = df.collect()
    assert r["_id"] == 7
    assert r["who"]["name"] == "ann" and r["who"]["org"] == "acme"
    assert r["amt"] == 1.5


def test_xml_permissive_mode_isolates_corrupt_rows(spark, tmp_path):
    """The CSV/JSON dirty-input policy holds for XML too: PERMISSIVE
    keeps malformed elements in the corrupt-record column instead of
    failing the scan."""
    src = tmp_path / "dirty"
    src.mkdir()
    (src / "a.xml").write_text(
        "<rows>"
        "<row><id>1</id><amt>2.5</amt></row>"
        "<row><id>notanint</id><amt>3.5</amt></row>"
        "</rows>"
    )
    df = files.read_xml(
        spark,
        str(src),
        row_tag="row",
        schema="id bigint, amt double, _corrupt string",
        mode="PERMISSIVE",
    )
    rows = df.collect()
    assert len(rows) == 2
    good = [r for r in rows if r["_corrupt"] is None]
    bad = [r for r in rows if r["_corrupt"] is not None]
    assert len(good) == 1 and good[0]["id"] == 1
    assert len(bad) == 1 and bad[0]["id"] is None


def test_xml_permissive_guard_parses_nested_ddl(spark, tmp_path):
    """ADVICE r7: the PERMISSIVE guard must parse DDL-string schemas
    with StructType.fromDDL, not a naive comma split — a nested
    'struct<x:int,y:int>' would otherwise split inside the angle
    brackets, spuriously rejecting valid schemas (or false-passing on
    a struct-INNER field named like the corrupt column, leaving
    corrupt capture silently inert)."""
    import pytest

    src = tmp_path / "nested"
    src.mkdir()
    (src / "a.xml").write_text(
        "<rows>"
        "<row><id>1</id><pt><x>2</x><y>3</y></pt></row>"
        "<row><id>oops</id><pt><x>4</x><y>5</y></pt></row>"
        "</rows>"
    )
    # nested struct BEFORE the corrupt column: the old split(',') saw
    # field names ['id', 'pt struct<x:int', ...] and raised on a
    # perfectly valid schema
    df = files.read_xml(
        spark,
        str(src),
        row_tag="row",
        schema="id bigint, pt struct<x:int,y:int>, _corrupt string",
        mode="PERMISSIVE",
    )
    rows = df.collect()
    assert len(rows) == 2
    assert sorted(r["_corrupt"] is None for r in rows) == [False, True]
    # and the inverse failure: a struct-inner field named _corrupt must
    # NOT satisfy the guard (top-level capture column still missing)
    with pytest.raises(ValueError, match="PERMISSIVE capture"):
        files.read_xml(
            spark,
            str(src),
            row_tag="row",
            schema="id bigint, pt struct<_corrupt:string,y:int>",
            mode="PERMISSIVE",
        )
