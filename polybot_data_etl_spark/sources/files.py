"""File connectors + sinks (SURVEY.md §2 #3-5).

Reference provenance: the reference ingested external data through a
connector package (`ig/` [REC src/etl/.DS_Store:88]) and persisted
through a repository layer [REC src/etl/.DS_Store:4824]. The public
behavior to reproduce is the generic connector surface: schema-declared
reads of external formats, and partitioned columnar writes (the
credential/API plumbing has no public behavior — empty `.env` [REF]).

Scale posture: reads always declare an explicit StructType (no
inferSchema job over 100 TB); writes go through Parquet with
`partitionBy` on the lake's pruning key so downstream queries prune at
the directory level.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV connector: explicit schema, no inference pass."""
    reader = spark.read.schema(schema).option("header", str(header).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType, **options: str
) -> DataFrame:
    """JSON-lines connector: explicit schema, no inference pass."""
    reader = spark.read.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet sink, optionally hive-partitioned (directory pruning key)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """ORC connector (columnar alternative to Parquet; ORC carries its
    own schema in the footer, so the StructType is optional and acts as
    a projection/assertion when given)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink with the same hive-partitioned layout as the Parquet
    sink — predicate pushdown and partition pruning work identically."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_text(
    spark: SparkSession, path: str, whole_file: bool = False
) -> DataFrame:
    """Raw-text connector: one row per line (``value`` string), or one
    row per file with ``whole_file`` — the ingest shape for unstructured
    corpus drops before parsing imposes a schema."""
    # NB: must go through the text() kwarg — its default (False) would
    # silently override a reader-level .option("wholetext", ...).
    return spark.read.text(path, wholetext=whole_file)


def read_binary(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Opaque-binary connector (``binaryFile``): (path, modificationTime,
    length, content) — the ingest shape for the multimodal family
    (functions/multimodal.py), which treats payloads as binary columns
    plus typed metadata."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema=None,
    mode: str | None = None,
    corrupt_column: str = "_corrupt",
) -> DataFrame:
    """XML connector (NATIVE in Spark 4 — the spark-xml package moved
    in-tree): one row per ``row_tag`` element, attributes surfaced as
    ``_attr`` columns, nested elements as structs.  ``mode`` is the
    dirty-input policy shared with CSV/JSON (PERMISSIVE /
    DROPMALFORMED / FAILFAST) — the feed-ingest shape for the XML
    exports enterprise systems still emit.  Under PERMISSIVE,
    malformed elements land in ``corrupt_column`` — it must name a
    string field of the supplied schema, or the capture is silently
    inert (Spark routes corrupt data to a nonexistent column and
    drops it), so that mismatch raises here."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    if mode:
        reader = reader.option("mode", mode)
        if mode == "PERMISSIVE":
            if schema is not None:
                # DDL strings parse through StructType.fromDDL — a
                # naive split(',') breaks inside nested types like
                # 'a struct<x:int,y:int>' (ADVICE r7), either raising
                # spuriously or false-passing on a struct-inner field
                # and leaving corrupt capture silently inert.
                names = (
                    schema
                    if hasattr(schema, "fieldNames")
                    else T.StructType.fromDDL(str(schema))
                ).fieldNames()
                if corrupt_column not in [n.strip() for n in names]:
                    raise ValueError(
                        f"PERMISSIVE capture needs {corrupt_column!r} in"
                        f" the schema (got {names}); pass corrupt_column="
                        "to match your schema's corrupt-record field"
                    )
            reader = reader.option(
                "columnNameOfCorruptRecord", corrupt_column
            )
    return reader.load(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    partition_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """XML sink twin of :func:`read_xml` (one ``row_tag`` element per
    row under ``root_tag`` per file)."""
    writer = (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .mode(mode)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro module is on the session's classpath.

    Avro has been an EXTERNAL Spark module since 2.4: the pip pyspark
    distribution does not bundle ``spark-avro``; clusters add it via
    ``--packages org.apache.spark:spark-avro_2.13:<spark version>``.
    The connector below degrades to a clear, named error when absent
    (the same import-gating contract as the multimodal codecs).
    """
    try:
        # the same resolver the reader/writer uses — a bare
        # Class.forName probe is wrong here (pip pyspark ships SOME
        # sql.avro classes for from_avro/to_avro without registering
        # the file source)
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


_AVRO_HINT = (
    "spark-avro is an external module: submit with --packages "
    "org.apache.spark:spark-avro_2.13:<spark-version> (not bundled "
    "with pip pyspark)"
)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro connector (lake interchange format #4 after parquet/ORC/
    CSV/JSON). Raises a RuntimeError naming the missing package when
    the external module is not deployed."""
    if not avro_available(spark):
        raise RuntimeError(_AVRO_HINT)
    return spark.read.format("avro").load(path)


def write_avro(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    if not avro_available(df.sparkSession):
        raise RuntimeError(_AVRO_HINT)
    writer = df.write.format("avro").mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
