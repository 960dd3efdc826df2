"""transformWithStateInPandas (Spark 4 arbitrary stateful processing).

SURVEY §2 test-only component: the successor API to
applyInPandasWithState — named state variables (ValueState/MapState)
in the RocksDB state store.  The operator (`jobs.tws_user_totals`) is
real; its end-to-end run needs the protobuf package for the JVM↔Python
state server, which this sandbox lacks, so:

- the streaming equivalence test runs wherever protobuf exists and
  SKIPS here (the documented multimodal-codec gating pattern), and
- the processor's fold logic is verified deterministically against a
  fake state harness (same dict-backed contract the real store gives
  one key), so the state arithmetic is tested in-sandbox.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import SCHEMAS
from polybot_data_etl_spark.streaming import jobs
from polybot_data_etl_spark.testing import frames_match, replay_events_chunks


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self) -> bool:
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v) -> None:
        self._v = tuple(v)


class _FakeMapState:
    def __init__(self):
        self._m: dict[tuple, tuple] = {}

    def containsKey(self, k) -> bool:  # noqa: N802
        return tuple(k) in self._m

    def getValue(self, k):  # noqa: N802
        return self._m.get(tuple(k))

    def updateValue(self, k, v) -> None:  # noqa: N802
        self._m[tuple(k)] = tuple(v)

    def keys(self):
        return iter(list(self._m.keys()))


class _FakeHandle:
    def __init__(self):
        self.states: dict[str, object] = {}

    def getValueState(self, name, schema, ttlDurationMs=None):  # noqa: N802
        return self.states.setdefault(name, _FakeValueState())

    def getMapState(self, name, kschema, vschema, ttlDurationMs=None):  # noqa: N802
        return self.states.setdefault(name, _FakeMapState())


def _batch(etypes, values):
    return pd.DataFrame({"event_type": etypes, "value": values})


def test_processor_fold_across_batches_matches_recompute():
    """Two micro-batches through one key: the second emission must
    reflect state carried from the first (n/total cumulative, n_types
    the distinct union) — the exact per-key contract the streaming
    equivalence test asserts end-to-end where protobuf exists."""
    p = jobs.UserTotalsProcessor()
    p.init(_FakeHandle())
    out1 = list(p.handleInputRows((7,), iter([_batch(["a", "b", "a"], [1.0, 2.5, 3.0])]), None))
    assert len(out1) == 1
    r1 = out1[0].iloc[0]
    assert (r1.user_id, r1.n, r1.total, r1.n_types) == (7, 3, 6.5, 2)

    out2 = list(
        p.handleInputRows(
            (7,), iter([_batch(["b"], [0.5]), _batch(["c"], [10.0])]), None
        )
    )
    r2 = out2[0].iloc[0]
    assert (r2.user_id, r2.n, r2.total, r2.n_types) == (7, 5, 17.0, 3)


def test_processor_empty_batch_emits_current_state():
    p = jobs.UserTotalsProcessor()
    p.init(_FakeHandle())
    out = list(p.handleInputRows((1,), iter([_batch([], [])]), None))
    r = out[0].iloc[0]
    assert (r.n, r.total, r.n_types) == (0, 0.0, 0)


def test_processor_keys_are_isolated_per_handle():
    """The engine scopes state to the grouping key; one processor
    instance per key partition must not leak between handles."""
    a, b = jobs.UserTotalsProcessor(), jobs.UserTotalsProcessor()
    a.init(_FakeHandle())
    b.init(_FakeHandle())
    list(a.handleInputRows((1,), iter([_batch(["x"], [5.0])]), None))
    out_b = list(b.handleInputRows((2,), iter([_batch(["y"], [1.0])]), None))
    r = out_b[0].iloc[0]
    assert (r.n, r.total, r.n_types) == (1, 1.0, 1)


def test_rocksdb_state_store_equals_default_provider(spark, sf_dir, tmp_path):
    """The RocksDB state store provider (+ changelog checkpointing) is
    the 100 TB posture — state bounded by executor local disk, commit
    cost bounded by the per-batch delta, not a full snapshot.  The
    backend must be semantics-free: the same watermarked tumbling agg
    over the same replay yields identical finalized windows under
    RocksDB and the default HDFS-backed store."""
    replay = replay_events_chunks(
        spark, sf_dir, str(tmp_path / "replay_rocks"), n_chunks=3
    )
    runs = {}
    for label, provider in (
        ("hdfs", None),
        (
            "rocksdb",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        ),
    ):
        if provider:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", provider
            )
            spark.conf.set(
                "spark.sql.streaming.stateStore.rocksdb."
                "changelogCheckpointing.enabled",
                "true",
            )
        try:
            jobs.run_to_completion(
                jobs.tumbling_agg(
                    jobs.events_file_stream(spark, replay), "10 minutes"
                ),
                str(tmp_path / f"ckpt_{label}"),
                output_mode="append",
                table_name=f"rocks_{label}",
            )
            runs[label] = (
                spark.table(f"rocks_{label}")
                .orderBy("bucket")
                .toPandas()
            )
        finally:
            if provider:
                spark.conf.unset(
                    "spark.sql.streaming.stateStore.providerClass"
                )
    assert len(runs["rocksdb"]) > 0
    ok, why = frames_match(runs["rocksdb"], runs["hdfs"])
    assert ok, why


def test_rocksdb_restart_resumes_from_changelog(spark, sf_dir, tmp_path):
    """Kill-and-restart UNDER RocksDB with changelog checkpointing: the
    restarted query reconstructs its state from the checkpointed
    changelog (not a leftover local RocksDB instance — the working dir
    of the first run is gone by design in a new executor), emits only
    new finalized windows, and the combined output equals an
    uninterrupted run.  This is the recovery path a 1000-executor
    deployment exercises on every task reschedule."""
    import os
    import shutil

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

        def run_to_files(stream_df, ckpt, out_dir):
            q = (
                stream_df.writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        src_all = replay_events_chunks(
            spark, sf_dir, str(tmp_path / "full_replay"), n_chunks=4
        )
        chunks = sorted(os.listdir(src_all))
        live = str(tmp_path / "live")
        os.makedirs(live)
        ckpt = str(tmp_path / "ckpt_rocks_restart")
        out = str(tmp_path / "out_rocks_restart")
        for f in chunks[:2]:
            shutil.copy(f"{src_all}/{f}", f"{live}/{f}")
        run_to_files(
            jobs.tumbling_agg(jobs.events_file_stream(spark, live), "10 minutes"),
            ckpt,
            out,
        )
        for f in chunks[2:]:
            shutil.copy(f"{src_all}/{f}", f"{live}/{f}")
        run_to_files(
            jobs.tumbling_agg(jobs.events_file_stream(spark, live), "10 minutes"),
            ckpt,
            out,
        )
        combined = spark.read.parquet(out).toPandas()
        assert combined["bucket"].is_unique  # no re-emission after restart

        ref_out = str(tmp_path / "out_rocks_ref")
        run_to_files(
            jobs.tumbling_agg(
                jobs.events_file_stream(spark, src_all), "10 minutes"
            ),
            str(tmp_path / "ckpt_rocks_ref"),
            ref_out,
        )
        ref = spark.read.parquet(ref_out).toPandas()
        ok, why = frames_match(combined, ref)
        assert ok, why
        assert len(combined) > 0
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        spark.conf.unset(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled"
        )


@pytest.mark.skipif(
    not jobs.tws_available(),
    reason="transformWithState needs the protobuf package for the "
    "JVM<->Python state server; absent in this sandbox (documented gate)",
)
def test_tws_user_totals_equals_batch(spark, sf_dir, tmp_path):
    """End-to-end: RocksDB provider + transformWithStateInPandas; the
    final update-mode emission per user equals the batch groupBy."""
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        replay = replay_events_chunks(
            spark, sf_dir, str(tmp_path / "replay"), n_chunks=3
        )
        out = jobs.tws_user_totals(jobs.events_file_stream(spark, replay))
        jobs.run_to_completion(
            out, str(tmp_path / "ckpt"), output_mode="update", table_name="tws_out"
        )
        got = spark.table("tws_out").toPandas()
        final = got.groupby("user_id", as_index=False).agg(
            n=("n", "max"), total=("total", "last"), n_types=("n_types", "max")
        )
        batch = (
            spark.read.schema(SCHEMAS["events"])
            .parquet(replay)
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("value"), 2).alias("total"),
                F.countDistinct("event_type").alias("n_types"),
            )
            .toPandas()
        )
        ok, why = frames_match(final, batch)
        assert ok, why
    finally:
        if prev is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_streaming_query_listener_ledger(spark, sf_dir, tmp_path):
    """StreamingQueryListener observability (#410): the engine pushes
    per-batch progress (rows, per-operator state rows, watermark) with
    zero extra query work. Assert the ledger's totals reconcile with
    the data actually ingested and that stateful-operator state-row
    counts surface (the 100 TB early-warning channel for state growth
    and watermark lag)."""
    import time as _time

    from polybot_data_etl_spark.streaming.monitor import ProgressLedger

    ledger = ProgressLedger()
    spark.streams.addListener(ledger)
    try:
        replay = replay_events_chunks(
            spark, sf_dir, str(tmp_path / "replay_mon"), n_chunks=3
        )
        n_events = spark.read.parquet(replay).count()
        out = jobs.tumbling_agg(jobs.events_file_stream(spark, replay))
        q = (
            out.writeStream.format("memory")
            .queryName("mon_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_mon"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        qid = str(q.id)
        # listener events are delivered async on the bus thread
        deadline = _time.time() + 30
        while _time.time() < deadline:
            if ledger.rows_ingested(qid) >= n_events and qid in [
                s for s in ledger.terminated
            ]:
                break
            _time.sleep(0.5)
        assert ledger.rows_ingested(qid) == n_events
        assert qid in ledger.started and qid in ledger.terminated
        batches = ledger.batches(qid)
        assert len(batches) >= 1
        # the watermarked agg is stateful: open windows must be visible
        assert max(b["state_rows_total"] for b in batches) > 0
        # watermark advanced past the epoch once data flowed
        assert any(b["event_time_watermark"] for b in batches)
    finally:
        spark.streams.removeListener(ledger)
