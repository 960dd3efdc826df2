"""Repository-pattern persistence layer: keyed upsert (SCD-1 merge),
append, and dynamic partition-overwrite loads over parquet tables.

Reference provenance: the reference persisted typed models through a
repository layer [REC src/etl/.DS_Store:4368 models/, 4824 repository/]
fed by batch DAGs — i.e. the load step of its ETL was idempotent keyed
writes, which is exactly the surface here.

Managed-table commit protocol (a minimal Delta/Iceberg-shaped layout):
a table directory holds immutable version directories ``v-<hex>/`` plus
a ``_MANIFEST`` file naming the current one.  Every mutation writes a
COMPLETE new version directory first, then commits by atomically
replacing the manifest (``os.replace`` — an atomic rename on POSIX).
Readers resolve the manifest once and read an immutable directory, so a
reader can never observe a half-written table; a reader that resolved
the previous version keeps reading its (still-present) files until
``vacuum`` reclaims them.  This is the same reader/writer isolation a
transactional table format provides, minus multi-writer coordination —
a production deployment swaps in Iceberg/Delta/Hudi without changing
any plan shape here.

Scale posture: an upsert is one left-anti join (survivors) + a union —
shuffle keyed on the merge key, broadcast when the update batch is
small (the common case for incremental loads: a day's delta vs a full
table).  Partition-overwrite writes only the partitions present in the
incoming batch (`partitionOverwriteMode=dynamic`), so a daily load
touches one date partition of a 100 TB table instead of rewriting it.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_MANIFEST"
_VERSION_PREFIX = "v-"


def _new_version() -> str:
    return f"{_VERSION_PREFIX}{uuid.uuid4().hex[:12]}"


def _commit(path: str, version: str) -> None:
    """Atomically point the manifest at ``version`` (os.replace is an
    atomic rename on POSIX — readers see either the old or the new
    manifest, never a partial write)."""
    tmp = os.path.join(path, f".{MANIFEST}.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        f.write(version + "\n")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, MANIFEST))


def current_version(path: str) -> str:
    """Name of the committed version directory."""
    with open(os.path.join(path, MANIFEST)) as f:
        return f.read().strip()


def is_managed(path: str) -> bool:
    return os.path.exists(os.path.join(path, MANIFEST))


def create_table(df: DataFrame, path: str) -> None:
    """Initialize a managed table at ``path`` from ``df`` (version 1)."""
    os.makedirs(path, exist_ok=True)
    version = _new_version()
    df.write.parquet(os.path.join(path, version))
    _commit(path, version)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """DataFrame over the committed version (snapshot isolation: the
    resolved version directory is immutable, later commits don't touch
    it)."""
    return spark.read.parquet(os.path.join(path, current_version(path)))


def vacuum(path: str) -> list[str]:
    """Delete all non-current version directories (breaks readers still
    pinned to them — run only after in-flight reads drain, like any
    table format's retention window). Returns what was removed."""
    keep = current_version(path)
    removed = []
    for entry in os.listdir(path):
        full = os.path.join(path, entry)
        if entry.startswith(_VERSION_PREFIX) and entry != keep and os.path.isdir(full):
            shutil.rmtree(full)
            removed.append(entry)
    return removed


def _migrate_legacy(path: str) -> None:
    """One-time adoption of a plain ``df.write.parquet(path)`` directory
    into the managed layout: move its files into a version dir, commit.
    (Not atomic for readers of the LEGACY layout — migration is a
    stop-the-world step, after which all mutations are atomic.)"""
    version = _new_version()
    vdir = os.path.join(path, version)
    os.makedirs(vdir)
    for entry in os.listdir(path):
        if entry == version or entry == MANIFEST or entry.startswith("."):
            continue
        os.rename(os.path.join(path, entry), os.path.join(vdir, entry))
    _commit(path, version)


def append_load(df: DataFrame, path: str) -> None:
    """Append-only load (the event-stream table shape)."""
    df.write.mode("append").parquet(path)


def merge_upsert(
    spark: SparkSession, path: str, updates: DataFrame, key: list[str]
) -> None:
    """SCD-1 keyed merge into the managed table at ``path``: rows whose
    key appears in ``updates`` are replaced, new keys are inserted,
    everything else is carried over unchanged.  Idempotent: applying the
    same update batch twice equals once.  A legacy plain-parquet
    directory is migrated into the managed layout first.

    Plan: target ⟕̸ updates (left-anti on the key — keeps survivors)
    ∪ updates.  The updates side is deduplicated on the key first
    (last-write-wins needs an explicit ordering column; here the batch
    is required to be key-unique, asserted).

    Commit: the merged result is fully written to a NEW version
    directory before the manifest swap, so concurrent ``read_table``
    callers see the old version until the commit instant and the new
    one after — never a mix, never missing files.
    """
    n_updates = updates.count()
    n_keys = updates.select(*key).distinct().count()
    if n_updates != n_keys:
        raise ValueError(
            f"update batch must be key-unique on {key}: "
            f"{n_updates} rows, {n_keys} distinct keys"
        )
    if not is_managed(path):
        _migrate_legacy(path)
    target = read_table(spark, path)
    merged = target.join(updates.select(*key), key, "left_anti").unionByName(
        updates
    )
    version = _new_version()
    merged.write.parquet(os.path.join(path, version))
    _commit(path, version)


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
