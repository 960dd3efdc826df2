"""SQL-database connector (sqlite_table Python DataSource) — the
JDBC-class surface (SURVEY §2 test-only component #451; VERDICT r10
§What's-missing #1 / §Next-round #4).

Proves the read/write/pushdown contract a `spark.read.jdbc` user
relies on, over the one SQL store the sandbox ships (stdlib sqlite3):
DSN via option (incl. env: indirection), catalog schema inference,
WHERE-clause predicate pushdown, column-pruned remote SELECTs, the
JDBC partitioning quadruple, and a two-phase single-transaction write
with abort/retry safety.
"""

from __future__ import annotations

import os
import sqlite3

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from polybot_data_etl_spark.sources.sqldb import (
    SqliteTableDataSource,
    _SqliteReader,
    _SqliteWriter,
    register_sqlite_table,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("score", DoubleType()),
        StructField("active", BooleanType()),
    ]
)

ROWS = [
    (1, "alice", 9.5, True),
    (2, "bob", 3.25, False),
    (3, "carol", 7.0, True),
    (4, None, 1.5, None),
    (5, "o'hara", 2.0, False),  # quote-escaping in pushed literals
]


@pytest.fixture(scope="module")
def sq(spark):
    register_sqlite_table(spark)
    return spark


def _seed_db(path: str, rows=ROWS, table: str = "people") -> str:
    con = sqlite3.connect(path)
    con.execute(
        f"CREATE TABLE {table} (id INTEGER, name TEXT, score REAL, "
        "active BOOLEAN)"
    )
    con.executemany(
        f"INSERT INTO {table} VALUES (?,?,?,?)",
        [
            (i, n, s, None if a is None else int(a))
            for i, n, s, a in rows
        ],
    )
    con.commit()
    con.close()
    return path


def _reader(db, schema=SCHEMA, **opts):
    options = {"url": db, "table": "people"}
    options.update({k: str(v) for k, v in opts.items()})
    return _SqliteReader(options, schema)


# --- read side -------------------------------------------------------------

def test_read_inferred_schema_and_values(sq, tmp_path):
    """Schema comes from the store's own catalog (PRAGMA table_info);
    values round-trip exactly, NULLs included, booleans re-typed."""
    db = _seed_db(str(tmp_path / "t.db"))
    df = sq.read.format("sqlite_table").option("url", db).option(
        "table", "people"
    ).load()
    assert df.schema.simpleString() == (
        "struct<id:bigint,name:string,score:double,active:boolean>"
    )
    got = sorted(tuple(r) for r in df.collect())
    assert got == sorted(ROWS)


def test_read_explicit_schema_query_option(sq, tmp_path):
    """Ad-hoc SQL pushes the whole statement to the store; the caller
    supplies the result schema (sqlite has no result-shape catalog)."""
    db = _seed_db(str(tmp_path / "t.db"))
    df = (
        sq.read.format("sqlite_table")
        .option("url", db)
        .option("query", "SELECT id, score * 2 AS score2 FROM people")
        .schema("id long, score2 double")
        .load()
    )
    got = dict((r.id, r.score2) for r in df.collect())
    assert got == {i: s * 2 for i, _, s, _ in ROWS}


def test_pushdown_compiles_supported_filters(tmp_path):
    """The planner hook: Equal/range/In/IsNull compile into the remote
    WHERE clause and are CONSUMED (not returned for Spark to re-run);
    anything else stays Spark-side."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        In,
        IsNotNull,
        StringContains,
    )

    db = _seed_db(str(tmp_path / "t.db"))
    r = _reader(db)
    remaining = r.pushFilters(
        [
            EqualTo(("active",), True),
            GreaterThan(("score",), 2.0),
            In(("id",), (1, 2, 3)),
            IsNotNull(("name",)),
            StringContains(("name",), "li"),  # not compilable → stays
        ]
    )
    assert [type(f).__name__ for f in remaining] == ["StringContains"]
    sql = r._select_sql(r.partitions()[0])
    assert '"active" = 1' in sql
    assert '"score" > 2.0' in sql
    assert '"id" IN (1, 2, 3)' in sql
    assert '"name" IS NOT NULL' in sql
    # column pruning: the remote statement names schema columns, not *
    assert sql.startswith('SELECT "id", "name", "score", "active" FROM')
    assert "SELECT *" not in sql


def test_pushdown_end_to_end_correct(sq, tmp_path):
    """Filters evaluated by the store yield the same rows Spark would
    have kept — including the quote-escaped string literal."""
    db = _seed_db(str(tmp_path / "t.db"))
    base = (
        sq.read.format("sqlite_table")
        .option("url", db)
        .option("table", "people")
        .load()
    )
    got = sorted(
        tuple(r)
        for r in base.filter(
            (F.col("score") >= 2.0) & (F.col("active") == False)  # noqa: E712
        ).collect()
    )
    want = sorted(
        t for t in ROWS if t[2] >= 2.0 and t[3] is False
    )
    assert got == want
    [row] = base.filter(F.col("name") == "o'hara").collect()
    assert row.id == 5


def test_partitioned_read_jdbc_quadruple(sq, tmp_path):
    """The JDBC partitioning contract: num_partitions strides on the
    partition column, first/last strides unbounded so rows OUTSIDE
    [lower, upper) are still read exactly once; result equal to the
    serial scan."""
    rows = [(i, f"u{i}", float(i), i % 2 == 0) for i in range(-5, 105)]
    db = _seed_db(str(tmp_path / "t.db"), rows=rows)
    df = (
        sq.read.format("sqlite_table")
        .option("url", db)
        .option("table", "people")
        .option("partition_column", "id")
        .option("num_partitions", "4")
        .option("lower_bound", "0")     # rows at -5..-1 and 100..104
        .option("upper_bound", "100")   # fall outside the bounds
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    assert sorted(tuple(r) for r in df.collect()) == sorted(rows)
    # pushdown composes with the stride predicates
    assert df.filter(F.col("id") >= 50).count() == sum(
        1 for t in rows if t[0] >= 50
    )


def test_partition_strides_are_half_open_and_disjoint(tmp_path):
    db = _seed_db(str(tmp_path / "t.db"))
    r = _reader(
        db,
        partition_column="id",
        num_partitions=3,
        lower_bound=0,
        upper_bound=9,
    )
    wheres = [p.where for p in r.partitions()]
    assert wheres == [
        '"id" < 3',
        '"id" >= 3 AND "id" < 6',
        '"id" >= 6',
    ]


# --- write side ------------------------------------------------------------

def test_write_read_roundtrip_append_and_overwrite(sq, tmp_path):
    db = str(tmp_path / "w.db")
    df = sq.createDataFrame([Row(**dict(zip(SCHEMA.names, t))) for t in ROWS], SCHEMA)
    w = df.write.format("sqlite_table").option("url", db).option(
        "table", "people"
    ).mode("append")  # Python sources support append/overwrite only
    w.save()  # creates the table
    w.save()  # doubles the rows
    con = sqlite3.connect(db)
    assert con.execute("SELECT count(*) FROM people").fetchone()[0] == 10
    con.close()
    df.limit(2).write.format("sqlite_table").option("url", db).option(
        "table", "people"
    ).mode("overwrite").save()
    back = (
        sq.read.format("sqlite_table")
        .option("url", db)
        .option("table", "people")
        .load()
    )
    assert back.count() == 2
    # staging dirs are swept after the commit
    assert not [p for p in os.listdir(tmp_path) if ".staging-" in p]


def test_write_commit_is_single_transaction(sq, tmp_path):
    """Two-phase contract, unit level: before commit() the target has
    no rows (tasks staged privately); abort() leaves the target
    untouched and sweeps the staging dir."""
    db = str(tmp_path / "w.db")
    _seed_db(db)  # pre-existing content that must survive an abort
    w = _SqliteWriter({"url": db, "table": "people"}, SCHEMA, overwrite=True)

    class _Ctx:  # the writer only uses partitionId()
        @staticmethod
        def partitionId():
            return 0

    import polybot_data_etl_spark.sources.sqldb as mod

    orig = mod.__dict__.get("TaskContext")
    from pyspark import TaskContext as _TC

    get_orig = _TC.get
    _TC.get = staticmethod(lambda: _Ctx())  # type: ignore[assignment]
    try:
        msg = w.write(iter([Row(id=9, name="z", score=0.5, active=True)]))
    finally:
        _TC.get = get_orig  # type: ignore[assignment]
        if orig is not None:
            mod.TaskContext = orig
    # staged, not published: the target still holds the OLD snapshot
    con = sqlite3.connect(db)
    assert con.execute("SELECT count(*) FROM people").fetchone()[0] == len(ROWS)
    con.close()
    w.abort([msg])
    assert not os.path.exists(w.staging)
    con = sqlite3.connect(db)
    assert con.execute("SELECT count(*) FROM people").fetchone()[0] == len(ROWS)
    con.close()


def test_failed_job_leaves_target_unchanged(sq, tmp_path):
    """E2E abort path: a task that dies mid-job must not publish
    anything — the engine calls abort() and the pre-existing table
    survives byte-identical."""
    db = str(tmp_path / "w.db")
    _seed_db(db)

    @F.udf("long")
    def boom(v):
        raise RuntimeError("task failure injected by test")

    df = sq.range(4).select(
        boom(F.col("id")).alias("id"),
        F.lit("x").alias("name"),
        F.lit(1.0).alias("score"),
        F.lit(True).alias("active"),
    )
    with pytest.raises(Exception, match="task failure injected"):
        df.write.format("sqlite_table").option("url", db).option(
            "table", "people"
        ).mode("overwrite").save()
    con = sqlite3.connect(db)
    got = sorted(con.execute("SELECT * FROM people").fetchall())
    con.close()
    assert got == sorted(
        (i, n, s, None if a is None else int(a)) for i, n, s, a in ROWS
    )


# --- contract edges ----------------------------------------------------------

def test_env_dsn_resolution(tmp_path, monkeypatch):
    """The reference's `.env` posture: url='env:VAR' resolves through
    the environment at plan time — no DSN in code.  Unit-level: Spark 4
    plans Python datasources in a separate worker process whose env
    snapshot predates any test-time setenv, so the e2e variant would
    test worker-pool lifecycle, not the connector (deployments set the
    variable before launching the app — the .env contract)."""
    from polybot_data_etl_spark.sources.sqldb import _resolve_url

    db = _seed_db(str(tmp_path / "t.db"))
    monkeypatch.setenv("TEST_SQLDB_DSN", db)
    assert _resolve_url({"url": "env:TEST_SQLDB_DSN"}) == db
    r = _SqliteReader(
        {"url": "env:TEST_SQLDB_DSN", "table": "people"}, SCHEMA
    )
    assert r.db == db  # resolved at PLAN time; executors get the path
    monkeypatch.delenv("TEST_SQLDB_DSN")
    with pytest.raises(ValueError, match="TEST_SQLDB_DSN"):
        _resolve_url({"url": "env:TEST_SQLDB_DSN"})
    with pytest.raises(ValueError, match="url"):
        _resolve_url({})


def test_rejects_non_affine_schema(sq, tmp_path):
    """Type strictness (the jsonl_ledger precedent): a timestamp column
    would silently degrade through sqlite's affinity system, so both
    sides refuse it up front with casting guidance."""
    db = str(tmp_path / "w.db")
    df = sq.sql("SELECT 1 AS id, current_timestamp() AS ts")
    with pytest.raises(Exception, match="ISO strings"):
        df.write.format("sqlite_table").option("url", db).option(
            "table", "t"
        ).mode("append").save()


def test_schema_inference_requires_table(sq, tmp_path):
    db = _seed_db(str(tmp_path / "t.db"))
    with pytest.raises(Exception, match="schema"):
        sq.read.format("sqlite_table").option("url", db).option(
            "query", "SELECT 1"
        ).load()


def test_source_name_and_registration_idempotent(sq):
    assert SqliteTableDataSource.name() == "sqlite_table"
    register_sqlite_table(sq)  # second registration must not raise


def test_nonfinite_float_filter_stays_spark_side(tmp_path):
    """ADVICE r11 #2: repr() of a non-finite float ('inf'/'nan') is
    not a sqlite literal — pushing it would fail the remote scan with
    OperationalError.  _qlit now raises TypeError for non-finite
    floats, so the filter is returned to Spark like other exotic
    literals, and the compiled WHERE contains only the finite
    conjunct."""
    import math

    from pyspark.sql.datasource import EqualTo, GreaterThan

    db = _seed_db(str(tmp_path / "t.db"))
    r = _reader(db)
    remaining = r.pushFilters(
        [
            EqualTo(("score",), float("inf")),
            EqualTo(("score",), float("nan")),
            GreaterThan(("score",), 2.0),
        ]
    )
    assert len(remaining) == 2
    assert all(not math.isfinite(f.value) for f in remaining)
    sql = r._select_sql(r.partitions()[0])
    assert '"score" > 2.0' in sql
    assert "inf" not in sql and "nan" not in sql
    # and the scan still executes cleanly against the store
    assert len(list(r.read(r.partitions()[0]))) > 0
