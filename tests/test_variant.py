"""VARIANT semi-structured ingestion (Spark 4 `parse_json` /
`variant_get` / `try_parse_json` / `schema_of_variant`).

SURVEY §2 test-only component: the schema-on-read path for
semi-structured payloads.  Why it matters at 100 TB: a VARIANT column
is parsed ONCE at ingest into a binary-encoded tree; every downstream
`variant_get` extraction is a path walk over that encoding, not a
re-parse of the JSON text — n extractions cost one parse, where the
`get_json_object` fallback re-tokenizes the string n times.  Parquet
writes the encoded form, so the parse survives the lake round-trip.

Correctness is asserted against the already-oracle-checked string-JSON
path (q_fn_json's functions) on the same fixture payloads: typed
`variant_get` extraction must agree with `from_json` on every row.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table


@pytest.fixture(scope="module")
def props(spark, sf_dir):
    return table(spark, sf_dir, "events").select("event_id", "props")


def test_variant_get_matches_from_json(spark, props):
    """Typed extraction from the VARIANT encoding == from_json's typed
    struct field on every fixture row (both NULL-safe on absent keys)."""
    both = props.select(
        "event_id",
        F.variant_get(F.parse_json("props"), "$.k", "int").alias("vk"),
        F.from_json("props", "k int").getField("k").alias("jk"),
    )
    assert both.filter(~F.col("vk").eqNullSafe(F.col("jk"))).count() == 0
    assert both.filter(F.col("vk").isNotNull()).count() > 0


def test_variant_survives_parquet_roundtrip(spark, props, tmp_path):
    """VARIANT is a first-class parquet type in Spark 4: the encoded
    value written to the lake reads back extraction-identical — the
    parse-once property the scale posture depends on."""
    out = str(tmp_path / "variant_events")
    props.select(
        "event_id", F.parse_json("props").alias("v")
    ).write.parquet(out)
    back = spark.read.parquet(out)
    assert back.schema["v"].dataType.typeName() == "variant"
    got = back.select(
        "event_id", F.variant_get("v", "$.k", "int").alias("k")
    )
    want = props.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_try_parse_json_is_malformed_safe(spark):
    """try_parse_json -> NULL on malformed payloads (the PERMISSIVE
    contract for the variant path); parse_json on the same row would
    raise, so ingest pipelines use the try_ form."""
    df = spark.createDataFrame(
        [("ok", '{"a": 1}'), ("bad", '{"a": ')], "tag string, payload string"
    )
    parsed = df.select(
        "tag", F.try_parse_json("payload").alias("v")
    )
    ok_rows = parsed.filter(F.col("v").isNotNull()).select("tag").collect()
    assert [r.tag for r in ok_rows] == ["ok"]


def test_schema_of_variant_reports_payload_shape(spark, props):
    shapes = (
        props.limit(50)
        .select(F.schema_of_variant(F.parse_json("props")).alias("s"))
        .distinct()
        .collect()
    )
    assert {r.s for r in shapes} == {"OBJECT<k: BIGINT>"}
