"""Multimodal binary-column plumbing tests (functions/multimodal.py):
schema contracts, Arrow batch behavior, per-row fan-out, determinism.
The two registered queries are oracle-checked in test_oracle.py; these
cover the engine APIs that have no SQL oracle (binary in/out)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
)

from polybot_data_etl_spark.functions import multimodal as mm


@pytest.fixture(scope="module")
def media_df(spark, sf_dir):
    return mm.media(spark, sf_dir).cache()


def test_media_schema(media_df):
    s = dict(media_df.dtypes)
    assert s["media_id"] == "bigint"
    assert s["modality"] == "string"
    assert s["payload"] == "binary"
    assert s["meta"].startswith("struct<n_bytes:int,width:int,height:int")


def test_media_modalities_partition(media_df):
    mods = {r["modality"] for r in media_df.select("modality").distinct().collect()}
    assert mods == {"image", "audio", "video"}
    # audio rows (and only audio rows) carry a sample rate
    bad = media_df.filter(
        ((F.col("modality") == "audio") & (F.col("meta.sample_rate") != 16000))
        | ((F.col("modality") != "audio") & (F.col("meta.sample_rate") != 0))
    )
    assert bad.count() == 0


def test_payload_roundtrip(media_df, spark, sf_dir):
    # payload is the exact UTF-8 encoding of the source text
    from polybot_data_etl_spark.catalog import table

    joined = (
        media_df.select("media_id", F.decode("payload", "UTF-8").alias("t"))
        .join(
            table(spark, sf_dir, "documents").select(
                F.col("doc_id").alias("media_id"), "text"
            ),
            "media_id",
        )
        .filter(F.col("t") != F.col("text"))
    )
    assert joined.count() == 0


def test_decode_strict_raises():
    with pytest.raises(NotImplementedError):
        mm.decode_strict(b"\x00\x01", "image")
    with pytest.raises(NotImplementedError):
        mm.decode_strict(b"\x00\x01", "video")


def test_decode_matches_fake_decoder(media_df):
    row = mm.decode(media_df).filter(F.col("media_id") == 0).collect()[0]
    src = media_df.filter(F.col("media_id") == 0).collect()[0]
    nb, mean = mm._fake_decode(bytes(src["payload"]))
    assert row["n_bytes"] == nb
    assert abs(row["brightness"] - mean) < 1e-12


def test_extract_features_shape_and_bridge(media_df):
    feats = mm.extract_features(media_df)
    assert feats.schema["features"].dataType == ArrayType(FloatType())
    rows = feats.filter(F.col("media_id") < 5).collect()
    assert len(rows) == 5
    for r in rows:
        v = r["features"]
        assert len(v) == mm._N_HIST_BINS
        assert abs(sum(v) - 1.0) < 1e-3  # normalized histogram
    # bridge: the vector kernels accept the feature column directly
    from polybot_data_etl_spark.functions.vectors import l2_norm

    normed = feats.select(l2_norm(F.col("features")).alias("n")).collect()
    assert all(r["n"] > 0 for r in normed[:5])


def test_resize_budget(media_df):
    out = mm.resize(media_df, 8, 4)  # 32-byte budget
    lens = out.select(F.length("payload").alias("n")).distinct().collect()
    assert [r["n"] for r in lens] == [32]
    # deterministic: same input -> same bytes
    a = {r["media_id"]: bytes(r["payload"]) for r in out.collect()}
    b = {r["media_id"]: bytes(r["payload"]) for r in mm.resize(media_df, 8, 4).collect()}
    assert a == b


def test_sample_frames_fanout(media_df):
    frames = mm.sample_frames(media_df)
    s = dict(frames.dtypes)
    assert s == {"media_id": "bigint", "frame_idx": "int", "frame": "binary"}
    joined = (
        frames.groupBy("media_id")
        .agg(F.count("*").alias("n_sampled"), F.max("frame_idx").alias("max_idx"))
        .join(
            media_df.filter(F.col("modality") == "video").select(
                "media_id", F.col("meta.n_bytes").alias("n_bytes")
            ),
            "media_id",
        )
        .collect()
    )
    assert len(joined) > 0
    for r in joined:
        n_frames = max(1, r["n_bytes"] // mm._FRAME_BYTES)
        expect = len(range(0, n_frames, 2))
        assert r["n_sampled"] == expect
        assert r["max_idx"] % 2 == 0  # only even frames sampled


def test_batch_iteration_is_batched(media_df):
    # mapInPandas must see > 1 batch when maxRecordsPerBatch is tiny —
    # proves the pipeline streams Arrow batches instead of materializing
    # the partition.
    spark = media_df.sparkSession
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")

    def counting(batches):
        n = 0
        rows = 0
        for pdf in batches:
            n += 1
            rows += len(pdf)
        import pandas as pd

        yield pd.DataFrame({"n_batches": [n], "rows": [rows]})

    try:
        got = (
            media_df.coalesce(1)
            .mapInPandas(counting, schema="n_batches long, rows long")
            .collect()[0]
        )
        assert got["rows"] > 7
        assert got["n_batches"] >= got["rows"] // 7
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_media_dedup_is_content_addressed(spark, sf_dir):
    import hashlib

    from polybot_data_etl_spark.catalog import table
    from polybot_data_etl_spark.functions.multimodal import (
        q_multimodal_dedup,
    )

    docs = table(spark, sf_dir, "documents").collect()
    expect: dict[str, list[int]] = {}
    for r in docs:
        h = hashlib.md5(r.text.encode()).hexdigest()
        expect.setdefault(h, []).append(r.doc_id)
    got = {r.content_md5: r for r in q_multimodal_dedup(spark, sf_dir).collect()}
    assert set(got) == set(expect)
    for h, ids in expect.items():
        assert got[h].media_id == min(ids)
        assert got[h].n_copies == len(ids)
