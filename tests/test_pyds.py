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


# --- jsonl_ledger: the Python DataSourceWriter two-phase commit -----------

from polybot_data_etl_spark.sources.pyds import (  # noqa: E402
    _LedgerCommit,
    _LedgerWriter,
    register_jsonl_ledger,
)

_LEDGER_SCHEMA = "event_id bigint, etype string, amount double"


@pytest.fixture(scope="module")
def ledger(spark):
    register_jsonl_ledger(spark)
    return spark


def _sample(spark, n=60):
    return spark.createDataFrame(
        [(i, f"t{i % 3}", round(i * 1.5, 2)) for i in range(n)], _LEDGER_SCHEMA
    )


def test_ledger_write_read_roundtrip_exact(ledger, tmp_path):
    """Partition-parallel write through the Python writer protocol,
    then read back through the committed-files-only reader: exact
    multiset equality, one committed file per write task, zero temp
    files after commit (the two-phase publish boundary)."""
    import os

    out = str(tmp_path / "ledger")
    df = _sample(ledger).repartition(5)
    df.write.format("jsonl_ledger").option("path", out).mode("append").save()
    files = os.listdir(out)
    assert len([f for f in files if f.endswith(".jsonl")]) == 5
    assert not [f for f in files if f.endswith(".tmp")]
    back = (
        ledger.read.format("jsonl_ledger")
        .schema(_LEDGER_SCHEMA)
        .option("path", out)
        .load()
    )
    assert back.exceptAll(df).count() == 0
    assert df.exceptAll(back).count() == 0


def test_ledger_overwrite_replaces_committed_set(ledger, tmp_path):
    import os

    out = str(tmp_path / "ledger_ow")
    _sample(ledger, 40).repartition(4).write.format("jsonl_ledger").option(
        "path", out
    ).mode("append").save()
    _sample(ledger, 10).repartition(2).write.format("jsonl_ledger").option(
        "path", out
    ).mode("overwrite").save()
    committed = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert len(committed) == 2
    back = (
        ledger.read.format("jsonl_ledger")
        .schema(_LEDGER_SCHEMA)
        .option("path", out)
        .load()
    )
    assert back.count() == 10


def test_ledger_reader_ignores_uncommitted_temps(ledger, tmp_path):
    """A crashed/in-flight task's temp file must be invisible to
    readers — visibility is the COMMIT rename, nothing else."""
    out = str(tmp_path / "ledger_tmp")
    _sample(ledger, 20).repartition(2).write.format("jsonl_ledger").option(
        "path", out
    ).mode("append").save()
    stray = f"{out}/part-99999-deadbeef.tmp"
    with open(stray, "w") as f:
        f.write('{"event_id": 424242, "etype": "ghost", "amount": 0.0}\n')
    back = (
        ledger.read.format("jsonl_ledger")
        .schema(_LEDGER_SCHEMA)
        .option("path", out)
        .load()
    )
    assert back.count() == 20
    assert back.filter("event_id = 424242").count() == 0


def test_ledger_abort_sweeps_temp_files(tmp_path):
    """Driver-side abort() removes every task temp named in the commit
    messages — the failed-job cleanup half of the protocol (unit-level:
    write() needs a live TaskContext, abort() does not)."""
    import os

    out = str(tmp_path / "ledger_abort")
    os.makedirs(out)
    temps = []
    for i in range(3):
        p = f"{out}/part-0000{i}-x.tmp"
        with open(p, "w") as f:
            f.write("{}\n")
        temps.append(_LedgerCommit(p, 1))
    w = _LedgerWriter({"path": out}, overwrite=False)
    w.abort(temps + [None])  # a lost task reports None
    assert os.listdir(out) == []


def test_ledger_stream_sink_exactly_once_end_to_end(feed, tmp_path):
    """Full Python-source → Python-sink pipeline: the event_feed stream
    drains through the jsonl_ledger streaming sink; committed batch
    files hold exactly the deterministic feed (no dup, no gap), named
    batch-<id>-part-<i>.jsonl at the driver's commit."""
    import glob
    import json as _json
    import os

    from pyspark.errors import StreamingQueryException

    register_jsonl_ledger(feed)
    out = str(tmp_path / "sink")

    def drain(attempt: int) -> None:
        stream = (
            feed.readStream.format("event_feed")
            .option("partitions", "2")
            .option("rows_per_batch", "5")
            .option("max_rows", "15")
            .load()
            .selectExpr("event_id", "etype", "amount")
        )
        q = (
            stream.writeStream.format("jsonl_ledger")
            .option("path", out)
            .option(
                "checkpointLocation", str(tmp_path / f"ckpt_sink{attempt}")
            )
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            deadline = time.time() + 120
            while time.time() < deadline:
                rows = sum(
                    sum(1 for _ in open(p))
                    for p in glob.glob(f"{out}/*.jsonl")
                )
                if rows >= 30:
                    break
                time.sleep(0.5)
        finally:
            q.stop()
            q.awaitTermination(60)

    try:
        drain(0)
    except StreamingQueryException as exc:
        # a saturated box can time out the Python sink worker's
        # connect-back socket — an infra flake, not a sink bug; the
        # batchId-keyed commit makes a clean retry exactly-once safe
        if "connect back" not in str(exc) and "CANNOT_OPEN_SOCKET" not in str(exc):
            raise
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        drain(1)
    got = sorted(
        (d["event_id"], d["etype"], d["amount"])
        for p in glob.glob(f"{out}/*.jsonl")
        for d in map(_json.loads, open(p))
    )
    want = sorted(
        (feed_row(p, i)[1], feed_row(p, i)[3], feed_row(p, i)[4])
        for p in range(2)
        for i in range(15)
    )
    assert got == want
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]


def test_ledger_stream_commit_is_replay_idempotent(tmp_path):
    """Crash-before-checkpoint replays a batch: commit(messages,
    batchId) must first drop that batch's previously-published files so
    the sink ends with exactly one copy (unit-level, driver-side)."""
    import os

    from polybot_data_etl_spark.sources.pyds import _LedgerStreamWriter

    out = str(tmp_path / "replay_sink")
    os.makedirs(out)
    w = _LedgerStreamWriter({"path": out})

    def temp(name, lines):
        p = f"{out}/{name}.tmp"
        with open(p, "w") as f:
            f.writelines(f'{{"n": {i}}}\n' for i in range(lines))
        return _LedgerCommit(p, lines)

    w.commit([temp("a", 3), temp("b", 2)], batchId=7)
    first = sorted(os.listdir(out))
    # the engine re-runs batch 7 after a simulated crash
    w.commit([temp("c", 3), temp("d", 2)], batchId=7)
    assert sorted(os.listdir(out)) == first  # same names, one copy
    total = sum(
        sum(1 for _ in open(f"{out}/{f}")) for f in os.listdir(out)
    )
    assert total == 5


def test_arrow_batch_path_identical_to_tuple_path(feed):
    """read() may yield Arrow RecordBatches instead of tuples — the
    vectorized scan path (numpy splitmix + one Arrow assembly; ~2.5x
    at 1M rows, SCALE.md). It must be value-identical on every column,
    timestamps included."""
    def rd(arrow):
        return (
            feed.read.format("event_feed")
            .option("partitions", "3")
            .option("rows_per_partition", "200")
            .option("arrow", str(arrow).lower())
            .load()
        )

    a, t = rd(True), rd(False)
    assert a.schema == t.schema
    assert a.exceptAll(t).count() == 0
    assert t.exceptAll(a).count() == 0


def test_stream_reader_watermark_ratchets_on_recovery():
    """ADVICE r6: a reader constructed against an existing checkpoint
    restarts with _current = 0; the recovered offset reaches it only
    through partitions()/commit(), so both must ratchet the watermark
    and latestOffset() must never regress below an offset the engine
    already planned."""
    from polybot_data_etl_spark.sources.pyds import _FeedStreamReader

    r = _FeedStreamReader(
        {"partitions": "2", "rows_per_batch": "5", "max_rows": "100"}
    )
    # engine replays the last planned batch from the WAL (rows 10->15)
    r.partitions({"rows": 10}, {"rows": 15})
    assert r.latestOffset() == {"rows": 20}  # 15 + 5, not 0 + 5
    # commit alone must also ratchet (all-committed restart path)
    r2 = _FeedStreamReader(
        {"partitions": "2", "rows_per_batch": "5", "max_rows": "100"}
    )
    r2.commit({"rows": 30})
    assert r2.latestOffset() == {"rows": 35}
    # a regressed planned range reads as EMPTY, never re-emits
    assert list(r2.read(next(iter(r2.partitions({"rows": 30}, {"rows": 25}))))) == []


def test_stream_reader_offset_dir_survives_hook_order(tmp_path):
    """ADVICE r7: the in-memory ratchet assumes the engine calls
    partitions()/commit() before the first latestOffset() after a
    restart.  With ``offset_dir`` set, the high-water mark is persisted
    (atomic rename) and reloaded at construction, so even an engine
    that calls latestOffset() FIRST on the fresh reader can never
    regress the offset log — the order-independent restart guarantee."""
    from polybot_data_etl_spark.sources.pyds import _FeedStreamReader

    opts = {
        "partitions": "2",
        "rows_per_batch": "5",
        "max_rows": "100",
        "offset_dir": str(tmp_path / "hw"),
    }
    r = _FeedStreamReader(opts)
    assert r.initialOffset() == {"rows": 0}
    r.latestOffset()  # 5
    r.commit({"rows": 5})
    r.latestOffset()  # 10
    # crash: fresh reader against the same offset_dir, latestOffset
    # FIRST (the hook order the in-memory ratchet cannot survive)
    r2 = _FeedStreamReader(opts)
    assert r2.latestOffset() == {"rows": 15}  # 10 + 5, not 0 + 5
    # and a third reader that only ever asks for initialOffset resumes
    # at the persisted high water, not 0
    assert _FeedStreamReader(opts).initialOffset() == {"rows": 15}
    # without offset_dir the documented in-memory behavior is unchanged
    r3 = _FeedStreamReader({k: v for k, v in opts.items() if k != "offset_dir"})
    assert r3.latestOffset() == {"rows": 5}


def test_stream_restart_from_checkpoint_is_exactly_once(feed, tmp_path):
    """Kill-and-restart against the same checkpoint with a FRESH reader
    instance (in-memory watermark back to 0): the union of both runs
    must equal the feed exactly once — the regression ADVICE r6 called
    out (offset-log regression re-emitting committed rows)."""
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def start(max_rows):
        stream = (
            feed.readStream.format("event_feed")
            .option("partitions", "2")
            .option("rows_per_batch", "5")
            .option("max_rows", str(max_rows))
            .load()
        )
        return (
            stream.writeStream.format("json")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )

    def drained():
        try:
            return feed.read.json(out).count()
        except Exception:
            return 0

    q = start(10)
    try:
        deadline = time.time() + 120
        while time.time() < deadline and drained() < 20:
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(60)
    assert drained() == 20

    q2 = start(20)  # restart: new reader, same checkpoint, more data
    try:
        deadline = time.time() + 120
        while time.time() < deadline and drained() < 40:
            time.sleep(0.5)
    finally:
        q2.stop()
        q2.awaitTermination(60)
    df = feed.read.json(out)
    got = sorted(r.event_id for r in df.select("event_id").collect())
    want = sorted(feed_row(p, i)[1] for p in range(2) for i in range(20))
    assert got == want  # no dup, no gap across the restart


def test_ledger_rejects_non_json_native_schema(ledger, tmp_path):
    """Timestamp/date/binary columns would round-trip as strings
    (json.dumps default=str) and miscast on read-back — the ledger
    refuses them up front on BOTH sides (ADVICE r6)."""
    import pytest as _pytest

    df = ledger.range(3).selectExpr(
        "id AS event_id", "current_timestamp() AS ts"
    )
    with _pytest.raises(Exception, match="JSON-native"):
        df.write.format("jsonl_ledger").option(
            "path", str(tmp_path / "bad")
        ).mode("append").save()
    with _pytest.raises(Exception, match="JSON-native"):
        (
            ledger.read.format("jsonl_ledger")
            .schema("event_id bigint, ts timestamp")
            .option("path", str(tmp_path / "bad"))
            .load()
            .collect()
        )
