"""Structured Streaming jobs (SURVEY.md §2 #67-70): watermarked window
aggregation, in-stream dedup, stream-stream interval join, and stateful
sessionization — the streaming twins of the batch time-series operators.

Reference provenance: the reference ran periodic batch DAGs over
event-shaped social data [REC src/etl/.DS_Store:4248]; the driver north
star + the `events` stream fixture mandate a true streaming surface
(TESTDATA.md, BASELINE.json:6 [DRV]).

Test strategy (SURVEY.md §5.3): replay events.parquet as N file drops
into a temp dir; each job's final output must equal its batch twin on
the same rows, restricted to what the final watermark has finalized —
the batch twin is itself DuckDB-oracle-checked, so the streaming path
inherits the differential guarantee. See tests/test_streaming.py.

Scale posture: all state (window aggs, dedup keys, join buffers,
sessions) lives in the executor-local StateStore, keyed by the shuffle
key (bucket/user/event id) and bounded by the watermark — nothing here
accumulates unbounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import SCHEMAS


def events_file_stream(spark: SparkSession, directory: str) -> DataFrame:
    """File-source stream of events parquet chunks (schema-declared;
    maxFilesPerTrigger=1 so replay order maps to micro-batches).

    Watermarks only accept TIMESTAMP (with-local-tz), so the NTZ event
    time is cast here — the engine session pins timeZone=UTC
    (session.build_session), making the cast value-preserving.
    """
    return (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(directory)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def tumbling_agg(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """#67: tumbling 1-hour window count/sum with late-data drop.

    Append-mode output: a window emits once, when the watermark passes
    its end. Mirrors the batch q_ts_tumbling projection.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("bucket"), "n", "total")
    )


def stream_dedup(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """#68: drop duplicate event_ids arriving within the watermark
    (exactly-once-per-key within the horizon; state is evicted as the
    watermark advances)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def interval_join(
    left: DataFrame, right: DataFrame, band: str = "INTERVAL 1 HOUR"
) -> DataFrame:
    """#69: stream-stream interval join — same-user event pairs within
    `band` (streaming twin of batch q_join_range).

    Both sides watermarked; the time-band condition lets Spark bound
    the join buffer state on each side.
    """
    a = left.withWatermark("ts", "1 hour").alias("a")
    b = right.withWatermark("ts", "1 hour").alias("b")
    return a.join(
        b,
        F.expr(
            f"""
            a.user_id = b.user_id AND
            b.ts > a.ts AND
            b.ts <= a.ts + {band}
            """
        ),
        "inner",
    ).select(
        F.col("a.event_id").alias("a_id"),
        F.col("b.event_id").alias("b_id"),
        F.col("a.user_id").alias("user_id"),
    )


def sessionize(events: DataFrame, gap: str = "30 minutes",
               watermark: str = "0 seconds") -> DataFrame:
    """#70: stateful streaming sessionization — session_window merges
    per-user session state across micro-batches; a session finalizes
    (append-mode emit) when the watermark passes last_event + gap.

    Mirrors the batch q_ts_session projection.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            "user_id",
            F.col("w.start").alias("s_start"),
            F.col("w.end").alias("s_end"),
            "n",
            "total",
        )
    )


def run_to_completion(
    stream_df: DataFrame,
    checkpoint_dir: str,
    output_mode: str = "append",
    table_name: str = "stream_out",
) -> None:
    """Execute a bounded streaming query to exhaustion (availableNow):
    processes every pending file, runs the final no-data batch so the
    watermark flushes finalized state, then stops. Results land in the
    in-memory table `table_name`."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_upsert_to_table(
    events: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    key: list[str] | None = None,
) -> None:
    """Streaming incremental load into a managed table: every
    micro-batch is key-deduplicated and MERGED (SCD-1 upsert) into the
    repository-layer table at ``table_path``, committing atomically via
    the manifest swap — concurrent readers always see a complete
    snapshot, never a half-loaded batch.

    Exactly-once effect without sink-side transactions: foreachBatch
    may REPLAY a batch after a failure, but merge_upsert is idempotent
    (same keys ⇒ same final table), so replays are harmless.  This is
    the streaming version of the reference's repository load step —
    at scale each micro-batch merge is one keyed anti-join + union,
    identical to the batch path.
    """
    from polybot_data_etl_spark.sources import repository as repo

    merge_key = key or ["event_id"]

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.dropDuplicates(merge_key)
        if batch.isEmpty():
            return
        if repo.is_managed(table_path):
            repo.merge_upsert(
                batch_df.sparkSession, table_path, batch, merge_key
            )
        else:
            repo.create_table(batch, table_path)

    q = (
        events.writeStream.foreachBatch(_upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stateful_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running (event count, value total) maintained in an explicit
    GroupState across micro-batches — the escape hatch for stateful
    logic no built-in operator expresses (built-ins cover the other
    streaming ops; this one exists to keep the custom-state surface
    exercised).

    Update-mode: each micro-batch emits the refreshed totals for users
    seen in that batch; the final emission per user equals the batch
    groupBy aggregate (asserted in tests/test_streaming.py).

    Scale posture: state is one (long, double) pair per user in the
    executor-local state store, partitioned by the group key; batches
    stream through pandas per group, so memory is bounded by the
    largest single (user, micro-batch) slice.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n": [n], "total": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n long, total double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
