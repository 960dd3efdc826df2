"""Repository-pattern persistence layer: keyed upsert (SCD-1 merge),
append, and dynamic partition-overwrite loads over parquet tables.

Reference provenance: the reference persisted typed models through a
repository layer [REC src/etl/.DS_Store:4368 models/, 4824 repository/]
fed by batch DAGs — i.e. the load step of its ETL was idempotent keyed
writes, which is exactly the surface here.

Scale posture: an upsert is one left-anti join (survivors) + a union —
shuffle keyed on the merge key, broadcast when the update batch is
small (the common case for incremental loads: a day's delta vs a full
table).  Partition-overwrite writes only the partitions present in the
incoming batch (`partitionOverwriteMode=dynamic`), so a daily load
touches one date partition of a 100 TB table instead of rewriting it.
The directory swap in merge_upsert is NOT atomic for concurrent
readers — a production deployment puts a transactional table format
(Iceberg/Delta/Hudi) under the same plan shapes; the merge logic is
format-independent.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def append_load(df: DataFrame, path: str) -> None:
    """Append-only load (the event-stream table shape)."""
    df.write.mode("append").parquet(path)


def merge_upsert(
    spark: SparkSession, path: str, updates: DataFrame, key: list[str]
) -> None:
    """SCD-1 keyed merge into the parquet table at ``path``: rows whose
    key appears in ``updates`` are replaced, new keys are inserted,
    everything else is carried over unchanged.  Idempotent: applying the
    same update batch twice equals once.

    Plan: target ⟕̸ updates (left-anti on the key — keeps survivors)
    ∪ updates.  The updates side is deduplicated on the key first
    (last-write-wins needs an explicit ordering column; here the batch
    is required to be key-unique, asserted).
    """
    n_updates = updates.count()
    n_keys = updates.select(*key).distinct().count()
    if n_updates != n_keys:
        raise ValueError(
            f"update batch must be key-unique on {key}: "
            f"{n_updates} rows, {n_keys} distinct keys"
        )
    target = spark.read.parquet(path)
    merged = target.join(updates.select(*key), key, "left_anti").unionByName(
        updates
    )
    tmp = f"{path}__stage_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)


def overwrite_partitions(
    spark: SparkSession, df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Dynamic partition overwrite: replaces ONLY the partitions present
    in ``df``, leaving all other partitions of the table untouched —
    the incremental daily-load primitive."""
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
