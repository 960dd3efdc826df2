"""Custom Python DataSource (Spark 4 API) — batch + streaming connector.

SURVEY §2 test-only component: the connector surface the reference's
`ig/` package implies, built as a FIRST-CLASS Spark source (planner-
visible partitions, engine-checkpointed stream offsets, pushed-filter
shard pruning) instead of a driver-side download loop.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from polybot_data_etl_spark.sources.pyds import (
    EventFeedDataSource,
    feed_row,
    register_event_feed,
)


@pytest.fixture(scope="module")
def feed(spark):
    register_event_feed(spark)
    return spark


def _read(feed, parts=3, rows=40, **opts):
    r = (
        feed.read.format("event_feed")
        .option("partitions", str(parts))
        .option("rows_per_partition", str(rows))
    )
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_batch_read_matches_python_recompute(feed):
    """Every cell is a pure function of (part, idx): the full read must
    equal the plain-Python regeneration, proving idempotent re-reads
    (retried/speculated tasks see identical data)."""
    df = _read(feed, parts=3, rows=40)
    got = sorted(
        (r.part_id, r.event_id, r.user_id, r.etype, r.amount) for r in df.collect()
    )
    want = sorted(
        feed_row(p, i)[:5] for p in range(3) for i in range(40)
    )
    assert got == want
    assert df.schema.simpleString() == (
        "struct<part_id:int,event_id:bigint,user_id:bigint,"
        "etype:string,amount:double,ts:timestamp>"
    )


def test_batch_read_declares_partition_parallelism(feed):
    """partitions() is the parallelism contract: N shards -> N scan
    tasks, so the same options scale the pull to a 1000-executor
    cluster with no code change."""
    assert _read(feed, parts=5, rows=4).rdd.getNumPartitions() == 5
    assert _read(feed, parts=2, rows=4).rdd.getNumPartitions() == 2


def test_pushed_equality_filter_prunes_shards(feed):
    """part_id = k is consumed by pushFilters and prunes the scan to
    one shard — the Python-source analog of parquet partition pruning.
    Evidence: the scan runs 1 task, and values still match recompute."""
    df = _read(feed, parts=4, rows=25).filter("part_id = 2")
    assert df.rdd.getNumPartitions() == 1
    got = sorted(r.event_id for r in df.collect())
    assert got == [2_000_000 + i for i in range(25)]


def test_pushed_in_filter_prunes_to_subset(feed):
    df = _read(feed, parts=4, rows=10).filter("part_id IN (0, 3)")
    assert df.rdd.getNumPartitions() == 2
    assert df.count() == 20


def test_unpushable_filter_still_correct(feed):
    """Filters the source does not consume (amount range) are returned
    to Spark and applied post-scan - correctness never depends on what
    the source chose to push."""
    df = _read(feed, parts=2, rows=50).filter("amount > 500.0")
    want = [
        feed_row(p, i)[:5]
        for p in range(2)
        for i in range(50)
        if feed_row(p, i)[4] > 500.0
    ]
    assert df.count() == len(want)


def test_aggregate_over_feed_matches_python(feed):
    got = {
        r.etype: (r.n, r.total)
        for r in _read(feed, parts=3, rows=30)
        .groupBy("etype")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("amount"), 2).alias("total"),
        )
        .collect()
    }
    want: dict[str, list[float]] = {}
    for p in range(3):
        for i in range(30):
            row = feed_row(p, i)
            want.setdefault(row[3], [0, 0.0])
            want[row[3]][0] += 1
            want[row[3]][1] += row[4]
    assert got == {k: (n, round(t, 2)) for k, (n, t) in want.items()}


def test_stream_drains_in_bounded_microbatches(feed, tmp_path):
    """The stream reader advances its offset by rows_per_batch per
    trigger (the maxOffsetsPerTrigger contract): draining 15 rows/shard
    at 5/trigger takes 3+ micro-batches, each bounded, and the union of
    batches equals the deterministic feed exactly once."""
    stream = (
        feed.readStream.format("event_feed")
        .option("partitions", "2")
        .option("rows_per_batch", "5")
        .option("max_rows", "15")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pyds_drain")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if feed.sql("SELECT count(*) c FROM pyds_drain").first().c >= 30:
                break
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(60)
    rows = feed.sql(
        "SELECT part_id, event_id, user_id, etype, amount FROM pyds_drain"
    ).collect()
    got = sorted(tuple(r) for r in rows)
    want = sorted(feed_row(p, i)[:5] for p in range(2) for i in range(15))
    assert got == want  # exactly-once: no dup, no gap, values identical
    # micro-batch sizes were bounded by rows_per_batch x shards
    sizes = [
        p["numInputRows"]
        for p in (pr for pr in q.recentProgress)
        if p["numInputRows"] > 0
    ]
    assert sizes and max(sizes) <= 10


def test_stream_availablenow_snapshots_one_offset(feed, tmp_path):
    """availableNow consults latestOffset once: the run ingests exactly
    one rows_per_batch step and terminates - the bounded-backfill
    behavior a scheduler relies on for catch-up jobs."""
    stream = (
        feed.readStream.format("event_feed")
        .option("partitions", "2")
        .option("rows_per_batch", "7")
        .option("max_rows", "100")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pyds_snap")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert feed.sql("SELECT count(*) c FROM pyds_snap").first().c == 14


def test_source_name_and_registration_idempotent(feed):
    assert EventFeedDataSource.name() == "event_feed"
    register_event_feed(feed)  # second registration must not raise
    assert _read(feed, parts=1, rows=3).count() == 3
