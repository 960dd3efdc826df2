"""Streaming state introspection: the `statestore` / `state-metadata`
DSv2 sources read a streaming query's CHECKPOINTED OPERATOR STATE back
as plain DataFrames.

SURVEY §2 test-only component (r7): the observability surface a
production streaming platform needs — audit what a stateful operator
is holding (key skew, state size, stuck keys), debug a wedged query
without replaying it, and verify at-rest state against the emitted
results.  At 100 TB this is how an operator answers "why is this
query's state 4 TB?" — per-partition state rows are readable without
touching the running job.

All-Spark surface: no custom code on the read path — the engine's own
state source plans partitioned reads over the checkpoint files, so the
audit itself scales like any other scan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _run_grouped_agg(spark, src_dir: str, ckpt: str, rows: list[str]) -> None:
    """Run a tiny groupBy-sum stream to completion against `ckpt`."""
    import os

    os.makedirs(src_dir, exist_ok=True)
    with open(os.path.join(src_dir, "batch0.json"), "w") as f:
        f.write("\n".join(rows) + "\n")
    df = spark.readStream.schema("k string, v long").json(src_dir)
    agg = df.groupBy("k").agg(F.sum("v").alias("s"))
    q = (
        agg.writeStream.outputMode("complete")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)


def test_statestore_reader_exposes_aggregation_state(spark, tmp_path):
    """The state rows of a groupBy-sum must equal the aggregate the
    query computed: key struct carries the grouping key, value struct
    the running sum, partition_id the state shard."""
    ckpt = str(tmp_path / "ckpt")
    _run_grouped_agg(
        spark,
        str(tmp_path / "src"),
        ckpt,
        ['{"k":"a","v":1}', '{"k":"b","v":2}', '{"k":"a","v":10}'],
    )
    st = spark.read.format("statestore").load(ckpt)
    got = {
        (r["key"]["k"], r["value"]["sum"]) for r in st.collect()
    }
    assert got == {("a", 11), ("b", 2)}
    # the state scan is partition-aware: every row names its shard
    n_parts = st.select("partition_id").distinct().count()
    assert 1 <= n_parts <= int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )


def test_state_metadata_lists_operators_and_batches(spark, tmp_path):
    """state-metadata is the catalog of stateful operators in a
    checkpoint: operator name, store name, shard count, batch range —
    what an audit reads FIRST to know which stores exist."""
    ckpt = str(tmp_path / "ckpt")
    _run_grouped_agg(
        spark, str(tmp_path / "src"), ckpt, ['{"k":"x","v":5}']
    )
    md = spark.read.format("state-metadata").load(ckpt).collect()
    assert len(md) == 1
    row = md[0]
    assert row["operatorName"] == "stateStoreSave"
    assert row["stateStoreName"] == "default"
    assert row["numPartitions"] == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    assert row["minBatchId"] == 0 and row["maxBatchId"] >= 0


def test_statestore_reader_time_travels_by_batch(spark, tmp_path):
    """State is versioned per micro-batch: reading with batchId=0 must
    return the FIRST batch's sums even after a second batch updated
    them — the state-level time travel that lets an audit pin down
    exactly when a key went wrong."""
    import os

    src_dir = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src_dir)
    with open(os.path.join(src_dir, "b0.json"), "w") as f:
        f.write('{"k":"a","v":1}\n')
    df = spark.readStream.schema("k string, v long").json(src_dir)
    agg = df.groupBy("k").agg(F.sum("v").alias("s"))
    q = (
        agg.writeStream.outputMode("complete")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    with open(os.path.join(src_dir, "b1.json"), "w") as f:
        f.write('{"k":"a","v":100}\n')
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)

    latest = spark.read.format("statestore").load(ckpt)
    at0 = (
        spark.read.format("statestore").option("batchId", "0").load(ckpt)
    )
    get = lambda df: {
        (r["key"]["k"], r["value"]["sum"]) for r in df.collect()
    }
    assert get(latest) == {("a", 101)}
    assert get(at0) == {("a", 1)}


def test_statestore_reader_works_under_rocksdb(spark, tmp_path):
    """The state source must read RocksDB-provider checkpoints too —
    the 100 TB posture pairs RocksDB state with changelog
    checkpointing, and the audit surface cannot depend on the
    dev-default HDFS store."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled",
        "true",
    )
    try:
        ckpt = str(tmp_path / "ckpt")
        _run_grouped_agg(
            spark,
            str(tmp_path / "src"),
            ckpt,
            ['{"k":"r","v":7}', '{"k":"r","v":3}'],
        )
        st = spark.read.format("statestore").load(ckpt)
        got = {(r["key"]["k"], r["value"]["sum"]) for r in st.collect()}
        assert got == {("r", 10)}
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        spark.conf.unset(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled"
        )


def test_statestore_state_matches_emitted_result(spark, tmp_path):
    """The audit equation: at-rest state == the query's own output.
    Run the same agg twice — once streamed (state), once batch over
    the same files — and reconcile them with an anti-join, the shape
    a production state audit uses (streaming lake table vs its
    checkpoint)."""
    import os

    src_dir = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    rows = [
        f'{{"k":"k{i % 7}","v":{i}}}' for i in range(50)
    ]
    _run_grouped_agg(spark, src_dir, ckpt, rows)
    state = (
        spark.read.format("statestore")
        .load(ckpt)
        .select(
            F.col("key.k").alias("k"), F.col("value.sum").alias("s")
        )
    )
    batch = (
        spark.read.schema("k string, v long")
        .json(src_dir)
        .groupBy("k")
        .agg(F.sum("v").alias("s"))
    )
    assert state.exceptAll(batch).count() == 0
    assert batch.exceptAll(state).count() == 0
    assert state.count() == 7


def test_statestore_change_feed_tracks_per_batch_updates(spark, tmp_path):
    """readChangeFeed turns the checkpoint into a CDC stream of state
    transitions: one (batch_id, change_type, key, value) row per
    update — how an audit attributes a state change to the exact
    micro-batch that made it (the state-level twin of a table's
    change feed)."""
    import os

    src_dir = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src_dir)
    with open(os.path.join(src_dir, "b0.json"), "w") as f:
        f.write('{"k":"a","v":1}\n')
    df = spark.readStream.schema("k string, v long").json(src_dir)
    agg = df.groupBy("k").agg(F.sum("v").alias("s"))
    q = (
        agg.writeStream.outputMode("complete")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    with open(os.path.join(src_dir, "b1.json"), "w") as f:
        f.write('{"k":"a","v":10}\n{"k":"b","v":5}\n')
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)

    cf = (
        spark.read.format("statestore")
        .option("readChangeFeed", "true")
        .option("changeStartBatchId", "0")
        .load(ckpt)
    )
    got = sorted(
        (r["batch_id"], r["change_type"], r["key"]["k"], r["value"]["sum"])
        for r in cf.collect()
    )
    assert got == [
        (0, "update", "a", 1),   # batch 0 creates a=1
        (1, "update", "a", 11),  # batch 1 updates a, creates b
        (1, "update", "b", 5),
    ]
