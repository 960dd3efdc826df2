"""Table catalog: pinned schemas + parquet loaders.

Mirrors the reference's typed-row-model + repository layers
(SURVEY.md §1.1 [REC src/etl/.DS_Store:4368,4824]): every table has a
fixed, declared schema; reads are schema-on-file (Parquet self-describes)
with an explicit StructType assertion available for tests.

Schemas transcribed from the driver fixtures (FIXTURES.md, read from
/root/testdata/sf0.001/*.parquet).

Scale posture: loaders return plain `spark.read.parquet` DataFrames so
Catalyst keeps full pushdown/pruning freedom; nothing here collects or
caches implicitly. At 100 TB these same paths would point at a
date-partitioned lake layout — `partition_hint` documents the layout each
table would use (and the sink tests in tests/test_sources.py exercise
`partitionBy` writes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLES: tuple[str, ...] = tuple(SCHEMAS)

# 100 TB layout note per table: how the lake would be partitioned/bucketed
# so the §2 query mix prunes and co-locates (SCALE.md has the full design).
PARTITION_HINTS: dict[str, str] = {
    "lineitem": "partitionBy(month(l_shipdate)); bucketBy(l_orderkey) for the orders join",
    "orders": "partitionBy(month(o_orderdate)); bucketBy(o_orderkey)",
    "events": "partitionBy(date(ts)) — event-time pruning for window/session queries",
    "documents": "hash-distributed by doc_id; no natural time key",
    "embeddings": "hash-distributed by vec_id; co-bucket with documents.doc_id",
    "customer": "small dim — broadcast candidate",
    "supplier": "small dim — broadcast candidate",
    "part": "small dim — broadcast candidate",
    "nation": "tiny dim — broadcast always",
    "region": "tiny dim — broadcast always",
}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (schema-on-file).

    events.ts is physically TIMESTAMP(NANOS) parquet, which Spark 4's
    reader refuses as a timestamp; we read it as raw nanos
    (`spark.sql.legacy.parquet.nanosAsLong`) and rebuild a µs
    TimestampType. Lossless here: the fixture's nanos are µs-resolution
    (verified: every value ends in 000 ns), and DuckDB's ns→µs cast
    truncates identically.

    The nanosAsLong conf is part of the engine's standard session config
    (session.build_session sets it at construction, so behavior is
    order-independent); the set below only covers externally built
    sessions (e.g. the driver's) and is a no-op on engine sessions.
    """
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(f"{sf_dir}/{name}.parquet").withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the Spark SQL surface."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def assert_schema(df: DataFrame, name: str) -> None:
    """Assert a loaded table matches the pinned schema (test helper)."""
    expected = SCHEMAS[name]
    got = df.schema
    exp_fields = [(f.name, f.dataType.simpleString()) for f in expected.fields]
    got_fields = [(f.name, f.dataType.simpleString()) for f in got.fields]
    if exp_fields != got_fields:
        raise AssertionError(
            f"schema drift for {name}: expected {exp_fields}, got {got_fields}"
        )
