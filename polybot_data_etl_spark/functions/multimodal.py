"""Multimodal (image/audio/video) column support: opaque ``binary``
payloads + typed metadata, processed by Arrow-batched ``mapInPandas``
pipelines (driver north star BASELINE.json:6 — "multimodal columns" as a
first-class LLM-pipeline family; the reference's processor stage shape
[REC src/etl/.DS_Store:4664]).

Design:

  * A media table is DERIVED deterministically from the ``documents``
    fixture (payload = UTF-8 bytes of the text, modality by id mod 3,
    metadata from the byte length) — the container ships no image/audio
    codecs and the fixtures ship no binary column, so the *plumbing* is
    what's real here: binary Arrow transfer, mapInPandas batch shape,
    schema contracts, per-row fan-out (frame sampling).
  * Real decoders (PIL/librosa/av) are import-gated: ``decode_strict``
    raises NotImplementedError where a codec would run.  The default
    pipeline uses a clearly-marked DETERMINISTIC FAKE decoder whose
    arithmetic is byte-level and therefore reproducible in the DuckDB
    oracle (ASCII payload bytes == characters), keeping even the
    Pandas-UDF path hash-checked end-to-end.

Scale posture (100 TB): payloads stay opaque bytes end-to-end (no JVM
string conversion); work is per-row / per-batch narrow — mapInPandas
streams Arrow batches, so memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of table
size; frame sampling fans out rows without a shuffle.  Feature vectors
come back as ``array<float>`` ready for the vector operators
(functions/vectors.py, functions/dedup.py LSH).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table
from polybot_data_etl_spark.registry import register

_MODALITIES = ["image", "audio", "video"]
_N_HIST_BINS = 16
_FRAME_BYTES = 32          # fake video "frame" size for frame sampling


def media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived media table:

    ``(media_id long, modality string, payload binary,
       meta struct<n_bytes int, width int, height int, sample_rate int>)``

    Deterministic: payload = UTF-8 text bytes; modality = media_id % 3;
    width/height factor the byte length; audio rows get a sample rate.
    """
    d = table(spark, sf_dir, "documents")
    n = F.length(F.col("text"))
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(*[F.lit(m) for m in _MODALITIES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            n.cast("int").alias("n_bytes"),
            (n % 64 + 1).cast("int").alias("width"),
            (n % 48 + 1).cast("int").alias("height"),
            F.when(F.col("doc_id") % 3 == 1, F.lit(16000))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("sample_rate"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# decoders

def decode_strict(payload: bytes, modality: str) -> Any:
    """Where a real codec would run.  The container ships no image/audio
    libraries, so this is gated: with PIL/librosa installed it would
    decode; here it raises."""
    try:  # pragma: no cover - codecs absent in this environment
        if modality == "image":
            import io

            from PIL import Image  # type: ignore

            return Image.open(io.BytesIO(payload))
        if modality == "audio":
            import librosa  # type: ignore

            return librosa.load(payload)
    except ImportError:
        pass
    raise NotImplementedError(
        f"no codec available for modality={modality!r}; "
        "use the deterministic fake decoder (decode_batch)"
    )


def _fake_decode(payload: bytes) -> tuple[int, float]:
    """DETERMINISTIC FAKE decode: (n_bytes, mean byte value).  Stands in
    for pixel decoding; byte-level so the DuckDB oracle can reproduce it
    exactly on the ASCII fixture payloads."""
    if len(payload) == 0:
        return 0, 0.0
    return len(payload), sum(payload) / len(payload)


def decode_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: binary payload → decoded scalar features.

    Output schema: ``media_id long, modality string, n_bytes int,
    brightness double`` (brightness = mean byte value, the fake stand-in
    for mean pixel luminance)."""
    for pdf in batches:
        n_bytes, brightness = [], []
        for payload in pdf["payload"]:
            nb, mean = _fake_decode(bytes(payload))
            n_bytes.append(nb)
            brightness.append(mean)
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "n_bytes": pd.Series(n_bytes, dtype="int32"),
                "brightness": pd.Series(brightness, dtype="float64"),
            }
        )


_DECODE_SCHEMA = "media_id long, modality string, n_bytes int, brightness double"


def decode(media_df: DataFrame) -> DataFrame:
    """Decode every payload via the Arrow-batched fake decoder."""
    return media_df.filter(
        F.col("payload").isNotNull()  # NULL payload = undecodable, skip
    ).mapInPandas(decode_batch, schema=_DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# feature extraction / resize / frame sampling

def histogram_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: 16-bin byte-value histogram per payload,
    emitted LONG (one row per bin) so every output cell is a scalar."""
    for pdf in batches:
        out_id, out_bin, out_cnt = [], [], []
        for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
            counts = [0] * _N_HIST_BINS
            for b in bytes(payload):
                counts[b % _N_HIST_BINS] += 1
            out_id.extend([media_id] * _N_HIST_BINS)
            out_bin.extend(range(_N_HIST_BINS))
            out_cnt.extend(counts)
        yield pd.DataFrame(
            {
                "media_id": pd.Series(out_id, dtype="int64"),
                "bin": pd.Series(out_bin, dtype="int32"),
                "cnt": pd.Series(out_cnt, dtype="int64"),
            }
        )


def byte_histogram(media_df: DataFrame) -> DataFrame:
    """(media_id, bin, cnt): byte-value histogram, long form."""
    return media_df.filter(F.col("payload").isNotNull()).mapInPandas(
        histogram_batch, schema="media_id long, bin int, cnt long"
    )


def features_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: fixed-width float feature vector per payload
    (normalized byte histogram) — the multimodal → embedding bridge; the
    output array<float> feeds the vector operators directly."""
    for pdf in batches:
        feats = []
        for payload in pdf["payload"]:
            raw = bytes(payload)
            counts = [0.0] * _N_HIST_BINS
            for b in raw:
                counts[b % _N_HIST_BINS] += 1.0
            total = len(raw) or 1
            feats.append([c / total for c in counts])
        yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})


def extract_features(media_df: DataFrame) -> DataFrame:
    """(media_id, features array<float>): deterministic feature vectors."""
    return media_df.filter(F.col("payload").isNotNull()).mapInPandas(
        features_batch, schema="media_id long, features array<float>"
    )


def resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel standing in for image resize: truncate/cycle
    the payload to the target byte budget (width*height), preserving the
    binary-in/binary-out contract a real resizer has."""
    for pdf in batches:
        out = []
        for payload, target in zip(pdf["payload"], pdf["target_bytes"]):
            raw = bytes(payload)
            t = int(target)
            if len(raw) >= t:
                out.append(raw[:t])
            else:  # cycle-pad
                reps = (t + len(raw) - 1) // max(len(raw), 1)
                out.append((raw * reps)[:t])
        yield pd.DataFrame({"media_id": pdf["media_id"], "payload": out})


def resize(media_df: DataFrame, width: int, height: int) -> DataFrame:
    """(media_id, payload binary): payloads resized to width*height bytes."""
    target = media_df.withColumn("target_bytes", F.lit(width * height))
    return target.filter(F.col("payload").isNotNull()).mapInPandas(
        resize_batch, schema="media_id long, payload binary"
    )


def sample_frames_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: video payload → one row per sampled frame
    (every 2nd 32-byte chunk) — per-row fan-out with no shuffle."""
    for pdf in batches:
        ids, idxs, frames = [], [], []
        for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
            raw = bytes(payload)
            n_frames = max(1, len(raw) // _FRAME_BYTES)
            for fi in range(0, n_frames, 2):  # sample every 2nd frame
                ids.append(media_id)
                idxs.append(fi)
                frames.append(raw[fi * _FRAME_BYTES : (fi + 1) * _FRAME_BYTES])
        yield pd.DataFrame(
            {
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame": frames,
            }
        )


def sample_frames(media_df: DataFrame) -> DataFrame:
    """(media_id, frame_idx, frame binary): sampled video frames."""
    return media_df.filter(
        (F.col("modality") == "video") & F.col("payload").isNotNull()
    ).mapInPandas(
        sample_frames_batch, schema="media_id long, frame_idx int, frame binary"
    )


# ---------------------------------------------------------------------------
# registered, oracle-checked queries (ASCII payload ⇒ byte arithmetic is
# expressible over characters in DuckDB)

@register(
    "q_multimodal_decode",
    oracle="""
    SELECT doc_id AS media_id,
           ['image', 'audio', 'video'][(doc_id % 3)::INT + 1] AS modality,
           length(text)::INT AS n_bytes,
           round(list_sum(list_transform(string_split(text, ''),
                                         c -> ascii(c)::BIGINT))
                 / length(text)::DOUBLE, 4) AS brightness
    FROM documents
    """,
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode through the Arrow/mapInPandas path: derive the
    media table (binary payload + typed meta), fake-decode each payload
    batch-wise in pandas, return scalar features.  Hash-checked: the
    fake decoder's byte arithmetic is reproduced over characters in the
    oracle (payloads are ASCII)."""
    decoded = decode(media(spark, sf_dir))
    return decoded.select(
        "media_id",
        "modality",
        "n_bytes",
        F.round(F.col("brightness"), 4).alias("brightness"),
    )


@register(
    "q_multimodal_histogram",
    oracle=f"""
    SELECT doc_id AS media_id, bin::INT AS bin,
           len(list_filter(string_split(text, ''),
                           c -> ascii(c) % {_N_HIST_BINS} = bin))::BIGINT AS cnt
    FROM documents, unnest(range(0, {_N_HIST_BINS})) AS t(bin)
    """,
)
def q_multimodal_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-histogram feature extraction (the embedding stand-in) in
    long form — one row per (media, bin) so the hash check covers every
    histogram cell."""
    return byte_histogram(media(spark, sf_dir))


@register(
    "q_multimodal_frames",
    oracle=f"""
    WITH v AS (
        SELECT doc_id AS media_id, text, length(text) AS L
        FROM documents WHERE doc_id % 3 = 2
    ),
    fr AS (
        SELECT media_id, text,
               unnest(range(0, greatest(1, L // {_FRAME_BYTES}), 2))
                   AS frame_idx
        FROM v
    )
    SELECT media_id,
           frame_idx::INT AS frame_idx,
           length(substring(text, frame_idx * {_FRAME_BYTES} + 1,
                            {_FRAME_BYTES}))::INT AS frame_len,
           CAST(list_sum(list_transform(
               string_split(substring(text, frame_idx * {_FRAME_BYTES} + 1,
                                      {_FRAME_BYTES}), ''),
               c -> ascii(c)::BIGINT)) AS BIGINT) AS frame_sum
    FROM fr
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through the real mapInPandas fan-out kernel:
    every video payload expands to one row per sampled frame (every 2nd
    32-byte chunk), projected to (frame_idx, length, byte-sum) scalars
    so the binary plumbing is hash-checked end-to-end — the oracle
    replays the same slicing over characters (ASCII payloads).

    Shape: a narrow per-row expansion inside Arrow batches — no
    shuffle, no join; output volume ∝ sampled frames.  At 100 TB with
    real codecs only the kernel body changes (decode + stride read);
    the Spark plumbing — batch iteration, fan-out schema, binary
    column — is exactly what this query exercises."""
    frames = sample_frames(media(spark, sf_dir))
    s = F.col("frame").cast("string")
    fsum = F.aggregate(
        F.transform(F.split(s, ""), lambda c: F.ascii(c).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return frames.select(
        "media_id",
        "frame_idx",
        F.length(s).cast("int").alias("frame_len"),
        fsum.alias("frame_sum"),
    )


_AUDIO_WIN = 32       # fake PCM window (samples = bytes) for RMS energy


def audio_energy(media_df: DataFrame) -> DataFrame:
    """mapInPandas kernel: audio payloads → per-window RMS energy
    (windowed short-time energy, the first feature every audio
    pipeline computes). The DETERMINISTIC FAKE decode treats each
    payload byte as one PCM sample (librosa would yield float frames;
    the import-gated decode_strict marks where it plugs in).

    Output: ``media_id long, win_idx int, n_samples int, rms double``
    — one row per non-overlapping 32-sample window, fan-out inside the
    Arrow batch (no shuffle, no join)."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[Any]] = {
                "media_id": [], "win_idx": [], "n_samples": [], "rms": [],
            }
            for mid, modality, payload in zip(
                pdf["media_id"], pdf["modality"], pdf["payload"]
            ):
                if modality != "audio":
                    continue
                samples = np.frombuffer(bytes(payload), dtype=np.uint8)
                for w in range(max(1, len(samples) // _AUDIO_WIN)):
                    chunk = samples[w * _AUDIO_WIN:(w + 1) * _AUDIO_WIN]
                    if len(chunk) == 0:
                        continue
                    # integer sum of squares, then one float division +
                    # sqrt — the same op order as the SQL oracle
                    ssq = int((chunk.astype(np.int64) ** 2).sum())
                    out["media_id"].append(mid)
                    out["win_idx"].append(w)
                    out["n_samples"].append(len(chunk))
                    out["rms"].append(
                        float(np.sqrt(ssq / len(chunk)))
                    )
            yield pd.DataFrame(out)

    return media_df.filter(F.col("payload").isNotNull()).mapInPandas(
        kernel, "media_id long, win_idx int, n_samples int, rms double"
    )


@register(
    "q_multimodal_audio",
    oracle=f"""
    WITH a AS (
        SELECT doc_id AS media_id, text, length(text) AS L
        FROM documents WHERE doc_id % 3 = 1
    ),
    win AS (
        SELECT media_id, text,
               unnest(range(0, greatest(1, L // {_AUDIO_WIN})))
                   AS win_idx
        FROM a
    ),
    chunk AS (
        SELECT media_id, win_idx,
               substring(text, win_idx * {_AUDIO_WIN} + 1, {_AUDIO_WIN})
                   AS c
        FROM win
    )
    SELECT media_id, win_idx::INT AS win_idx,
           length(c)::INT AS n_samples,
           round(sqrt(list_sum(list_transform(string_split(c, ''),
                     ch -> ascii(ch)::BIGINT * ascii(ch)::BIGINT))
                 / CAST(length(c) AS DOUBLE)) + 1e-9, 4) AS rms
    FROM chunk
    WHERE length(c) > 0
    """,
)
def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio RMS energy through the real mapInPandas kernel —
    the audio member of the decode/histogram/frames kernel triple.
    Hash-checked end-to-end: the fake PCM decode is byte arithmetic,
    replayed over characters in the oracle (integer sum of squares,
    one division, one sqrt — same op order both engines).

    Shape: narrow Arrow-batch fan-out, zero shuffles; at 100 TB only
    the kernel body changes (real PCM frames via the import-gated
    codec), the plumbing is what this query locks in."""
    en = audio_energy(media(spark, sf_dir))
    return en.select(
        "media_id",
        "win_idx",
        "n_samples",
        F.round(F.col("rms") + F.lit(1e-9), 4).alias("rms"),
    )


@register(
    "q_multimodal_dedup",
    oracle="""
    SELECT md5(text) AS content_md5,
           CAST(min(doc_id) AS BIGINT) AS media_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed media dedup: group the binary payload store by
    its md5 fingerprint, keep the min media_id per content hash — the
    byte-identical image/audio dedup pass every multimodal ingest runs
    BEFORE any perceptual hashing (a re-uploaded file is the same
    bytes; no decode needed).  q_dedup_exact's conduct lifted to the
    binary column.

    Shape: fingerprint is a narrow projection over the payload (no
    decode, no Python), then ONE map-side-combined hash agg on the
    128-bit key — the cheapest dedup there is, and the md5 key is the
    portable content address downstream stages join on.  Oracle: the
    payload is the UTF-8 text bytes by construction, so md5(payload)
    == md5(text) lets DuckDB replay it without BLOB support."""
    m = media(spark, sf_dir)
    return (
        m.select("media_id", F.md5(F.col("payload")).alias("content_md5"))
        .groupBy("content_md5")
        .agg(
            F.min("media_id").cast("bigint").alias("media_id"),
            F.count("*").cast("bigint").alias("n_copies"),
        )
        .select("content_md5", "media_id", "n_copies")
    )


@register(
    "q_multimodal_mix",
    oracle="""
    WITH m AS (
        SELECT CASE CAST(doc_id % 3 AS INTEGER)
                    WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                    ELSE 'video' END AS modality,
               length(text) AS n_bytes
        FROM documents
    ),
    a AS (
        SELECT modality, count(*) AS n, sum(n_bytes) AS b,
               max(n_bytes) AS mx
        FROM m GROUP BY modality
    ),
    t AS (
        SELECT a.*, sum(n) OVER () AS nt, sum(b) OVER () AS bt
        FROM a
    )
    SELECT modality, CAST(n AS BIGINT) AS n_assets,
           CAST(b AS BIGINT) AS total_bytes,
           round(b / CAST(n AS DOUBLE) + 1e-9, 4) AS avg_bytes,
           CAST(mx AS BIGINT) AS max_bytes,
           round(n / CAST(nt AS DOUBLE) + 1e-9, 4) AS asset_share,
           round(b / CAST(bt AS DOUBLE) + 1e-9, 4) AS byte_share,
           CAST(b / CAST(bt AS DOUBLE)
                > 2 * n / CAST(nt AS DOUBLE) AS BOOLEAN)
               AS storage_heavy
    FROM t ORDER BY modality
    """,
)
def q_multimodal_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modality mix of the media store: asset count vs BYTE mass per
    modality (with per-asset mean/max sizes and the byte-share ≫
    asset-share 'storage heavy' flag) — the first number a multimodal
    training-data plan needs, because batch composition is decided in
    ASSETS but storage, egress, and decode budgets are spent in BYTES
    (video is always the minority of files and the majority of bytes).

    Shape: the deterministic media projection (no decode — sizes come
    from metadata) → ONE map-side-combined per-modality agg →
    marginals over the 3-row frame.  At 100 TB this reads parquet
    column statistics, never payloads."""
    m = media(spark, sf_dir)
    a = m.groupBy("modality").agg(
        F.count("*").alias("n"),
        F.sum(F.col("meta.n_bytes")).alias("b"),
        F.max(F.col("meta.n_bytes")).alias("mx"),
    )
    from pyspark.sql import Window

    wa = Window.partitionBy()
    t = a.select(
        "*",
        F.sum("n").over(wa).alias("nt"),
        F.sum("b").over(wa).alias("bt"),
    )
    ashare = F.col("n") / F.col("nt").cast("double")
    bshare = F.col("b") / F.col("bt").cast("double")
    return t.select(
        "modality",
        F.col("n").cast("bigint").alias("n_assets"),
        F.col("b").cast("bigint").alias("total_bytes"),
        F.round(
            F.col("b") / F.col("n").cast("double") + F.lit(1e-9), 4
        ).alias("avg_bytes"),
        F.col("mx").cast("bigint").alias("max_bytes"),
        F.round(ashare + F.lit(1e-9), 4).alias("asset_share"),
        F.round(bshare + F.lit(1e-9), 4).alias("byte_share"),
        (bshare > 2 * ashare).alias("storage_heavy"),
    ).orderBy("modality")
