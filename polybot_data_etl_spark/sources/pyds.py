"""Custom Python DataSource connector (Spark 4 `pyspark.sql.datasource`).

Reference provenance: the reference's connector package (`ig/` [REC
src/etl/.DS_Store:88]) wrapped a remote feed behind a paginated client.
The public behavior to reproduce is a FIRST-CLASS custom source: one
that Spark itself plans, partitions, and (for streams) checkpoints —
not a driver-side download loop.  Spark 4's Python DataSource API is
the idiomatic surface for that: the engine calls ``partitions()`` and
fans ``read()`` out to executors, so a 1000-executor cluster pulls
1000 shards of the feed concurrently, and the streaming variant's
offsets live in the engine's checkpoint log (exactly-once replay on
restart, same contract as the file/kafka sources).

The concrete source here is a deterministic synthetic event feed
(``event_feed``): every cell is a pure function of (partition id, row
index) via a splitmix64-style integer mix, so

- re-reads are byte-identical (retried/speculated tasks are safe —
  the same idempotent-read contract real connectors must honor),
- no RNG state crosses the driver/executor boundary,
- tests can recompute expected values in plain Python.

Scale posture:
- ``partitions()`` emits one InputPartition per shard — read
  parallelism is declared to the planner, not discovered; shard count
  is an option, so the same source definition scales from local[32]
  to a 1000-executor pull by changing one option.
- ``pushFilters`` prunes whole shards when the query constrains
  ``part_id`` (EqualTo / ranges / In) — the Python-source analog of
  parquet partition pruning: pruned shards are never generated, the
  filter is consumed (not re-evaluated by Spark) only when it is
  exactly the shard key predicate.
- the stream reader advances a monotone row-offset watermark;
  ``partitions(start, end)`` splits each micro-batch's offset range
  into the same fixed shard count, so micro-batch size is bounded by
  ``rows_per_batch`` (the maxOffsetsPerTrigger contract) and each
  batch parallelizes like the batch reader.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

_SCHEMA_DDL = (
    "part_id int, event_id bigint, user_id bigint, "
    "etype string, amount double, ts timestamp"
)

_ETYPES = ("view", "click", "purchase", "error")

_EPOCH = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)


def _mix(x: int) -> int:
    """splitmix64 finalizer — a public-domain integer mix; the whole
    feed derives from it so rows are pure functions of their index."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def feed_row(part: int, idx: int, seed: int = 0) -> tuple:
    """The one definition of a feed cell — shared by the batch reader,
    the stream reader, and the tests' plain-Python recompute."""
    event_id = part * 1_000_000 + idx
    h = _mix(event_id * 2 + seed)
    user_id = h % 1000
    etype = _ETYPES[(h >> 16) % len(_ETYPES)]
    amount = round(((h >> 24) % 100_000) / 100.0, 2)
    ts = _EPOCH + _dt.timedelta(seconds=idx * 60 + part)
    return (part, event_id, user_id, etype, amount, ts)


class _ShardPartition(InputPartition):
    def __init__(self, part: int, start: int, end: int, seed: int):
        self.part = part
        self.start = start
        self.end = end
        self.seed = seed


def _shard_filter_bound(filters: list[Filter]) -> tuple[set[int] | None, list[Filter]]:
    """Consume filters that are exactly a ``part_id`` shard predicate;
    return (allowed shard set or None, filters Spark must still apply)."""
    remaining: list[Filter] = []
    allowed: set[int] | None = None

    def _narrow(parts: set[int]) -> None:
        nonlocal allowed
        allowed = parts if allowed is None else (allowed & parts)

    for f in filters:
        col = f.attribute[0] if getattr(f, "attribute", None) else None
        if col != "part_id":
            remaining.append(f)
            continue
        if isinstance(f, EqualTo):
            _narrow({int(f.value)})
        elif isinstance(f, In):
            _narrow({int(v) for v in f.value})
        elif isinstance(f, (GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)):
            # ranges resolved against the known shard universe in partitions()
            remaining.append(f)
        else:
            remaining.append(f)
    return allowed, remaining


def feed_batch(part: int, start: int, end: int, seed: int = 0):
    """Arrow RecordBatch holding feed rows [start, end) of one shard —
    value-identical to :func:`feed_row` but generated vectorized
    (numpy uint64 splitmix + one Arrow assembly, no per-row Python).
    This is the fast path a real connector should ship: the engine
    accepts RecordBatches from ``read()`` directly, so the per-row
    tuple→pickle→unpickle hop disappears from the scan."""
    import numpy as np
    import pyarrow as pa

    idx = np.arange(start, end, dtype=np.uint64)
    event_id = np.uint64(part) * np.uint64(1_000_000) + idx
    with np.errstate(over="ignore"):
        x = event_id * np.uint64(2) + np.uint64(seed)
        x = x + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h = x ^ (x >> np.uint64(31))
    user_id = h % np.uint64(1000)
    etype = np.array(_ETYPES)[(h >> np.uint64(16)) % np.uint64(len(_ETYPES))]
    amount = ((h >> np.uint64(24)) % np.uint64(100_000)).astype(
        np.float64
    ) / 100.0
    epoch_us = int(_EPOCH.timestamp()) * 1_000_000
    ts = epoch_us + (idx.astype(np.int64) * 60 + part) * 1_000_000
    # tz-explicit Arrow type (ADVICE r6): feed_row yields tz-aware UTC
    # datetimes; a NAIVE pa.timestamp("us") only matched because the
    # session pins spark.sql.session.timeZone=UTC — tz="UTC" makes the
    # Arrow path agree under any session timezone.
    return pa.RecordBatch.from_arrays(
        [
            pa.array(np.full(len(idx), part, dtype=np.int32)),
            pa.array(event_id.astype(np.int64)),
            pa.array(user_id.astype(np.int64)),
            pa.array(etype),
            pa.array(amount),
            pa.array(ts, type=pa.timestamp("us", tz="UTC")),
        ],
        names=["part_id", "event_id", "user_id", "etype", "amount", "ts"],
    )


class _FeedReader(DataSourceReader):
    def __init__(self, options):
        self.n_parts = int(options.get("partitions", "4"))
        self.rows = int(options.get("rows_per_partition", "100"))
        self.seed = int(options.get("seed", "0"))
        self.arrow = options.get("arrow", "false").lower() == "true"
        self._allowed: set[int] | None = None

    def pushFilters(self, filters):  # noqa: N802 (Spark API name)
        self._allowed, remaining = _shard_filter_bound(list(filters))
        return remaining

    def partitions(self) -> Sequence[InputPartition]:
        parts = range(self.n_parts)
        if self._allowed is not None:
            parts = [p for p in parts if p in self._allowed]
        return [_ShardPartition(p, 0, self.rows, self.seed) for p in parts]

    def read(self, partition: _ShardPartition):
        if self.arrow:
            yield feed_batch(
                partition.part, partition.start, partition.end, partition.seed
            )
            return
        for i in range(partition.start, partition.end):
            yield feed_row(partition.part, i, partition.seed)


class _FeedStreamReader(DataSourceStreamReader):
    """Offset = rows emitted per shard so far.  ``latestOffset``
    advances by ``rows_per_batch`` per trigger up to ``max_rows`` —
    the bounded-lag contract (maxOffsetsPerTrigger) that keeps each
    micro-batch's state under a known ceiling at any input rate.

    Restart contract (ADVICE r6): the watermark lives in driver
    memory, so a reader constructed against an EXISTING checkpoint
    would restart at 0 and regress the offset log — re-emitting rows
    already committed downstream.  The engine never hands the reader
    the recovered offset directly; it surfaces it as the ``start`` of
    the first planned batch and the ``end`` of every commit, so both
    hooks ratchet ``_current`` up and ``latestOffset`` never returns
    below an offset the engine has already planned.  Worst case after
    a restart is one EMPTY batch (``range(hi, lo)`` with hi < lo
    yields nothing) while the watermark catches up — never a
    duplicate row.

    ENGINE-ORDERING ASSUMPTION (ADVICE r7): the in-memory ratchet
    relies on the engine invoking ``partitions()`` (WAL replay of a
    pending batch) or planning from the recovered offset BEFORE the
    first ``latestOffset()`` of the restarted query — the behavior of
    the pinned Spark version, validated end-to-end by the
    kill-and-restart test.  A hypothetical engine that called
    ``latestOffset()`` first would see ``_current == 0`` and regress
    the offset log.  For deployments that must not depend on hook
    order, pass ``offset_dir`` (point it next to the query's
    ``checkpointLocation``): the high-water offset is then persisted
    there on every advance (atomic tmp+rename) and reloaded at
    construction, so ``latestOffset`` can never return below a
    previously planned/committed offset regardless of call order."""

    def __init__(self, options):
        self.n_parts = int(options.get("partitions", "4"))
        self.rows_per_batch = int(options.get("rows_per_batch", "20"))
        self.max_rows = int(options.get("max_rows", "100"))
        self.seed = int(options.get("seed", "0"))
        self.offset_dir = options.get("offset_dir")
        self._current = 0
        if self.offset_dir:
            try:
                with open(self._offset_path()) as f:
                    self._current = int(json.load(f)["rows"])
            except (OSError, ValueError, KeyError):
                pass  # no sidecar yet (first start) → 0
        # initialOffset must return the CONSTRUCTION-TIME high water,
        # not the live watermark: the engine calls latestOffset()
        # BEFORE initialOffset() when planning a fresh query's first
        # batch (observed on the pinned Spark version), and a live
        # read would skip the rows of that first planned range.
        self._initial = self._current

    def _offset_path(self) -> str:
        return os.path.join(self.offset_dir, "event_feed_high_water.json")

    def _ratchet(self, rows: int) -> None:
        """Advance the high-water mark, never regress; persist when
        ``offset_dir`` is set (atomic rename — a crash mid-write leaves
        the previous sidecar intact, worst case one empty batch)."""
        if rows <= self._current:
            return
        self._current = rows
        if self.offset_dir:
            os.makedirs(self.offset_dir, exist_ok=True)
            tmp = self._offset_path() + f".{os.getpid()}.tmp"
            with open(tmp, "w") as f:
                json.dump({"rows": rows}, f)
            os.replace(tmp, self._offset_path())

    def initialOffset(self) -> dict:  # noqa: N802
        return {"rows": self._initial}

    def latestOffset(self) -> dict:  # noqa: N802
        self._ratchet(min(self._current + self.rows_per_batch, self.max_rows))
        return {"rows": self._current}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:  # noqa: N802
        lo, hi = int(start["rows"]), int(end["rows"])
        # checkpoint recovery: the recovered offset arrives here as
        # `start` — ratchet the watermark so it never regresses below
        # what the engine already planned
        self._ratchet(max(lo, hi))
        return [_ShardPartition(p, lo, hi, self.seed) for p in range(self.n_parts)]

    def read(self, partition: _ShardPartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield feed_row(partition.part, i, partition.seed)

    def commit(self, end: dict) -> None:
        self._ratchet(int(end["rows"]))


class EventFeedDataSource(DataSource):
    """``spark.read.format("event_feed")`` / ``spark.readStream.…`` —
    register once per session with :func:`register_event_feed`."""

    @classmethod
    def name(cls) -> str:
        return "event_feed"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _FeedReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:  # noqa: N802
        return _FeedStreamReader(self.options)


def register_event_feed(spark) -> None:
    """Idempotent per-session registration of the custom source."""
    spark.dataSource.register(EventFeedDataSource)


# --- jsonl_ledger: Python DataSource with a two-phase-commit writer -------

class _LedgerCommit(WriterCommitMessage):
    def __init__(self, temp_path: str, rows: int):
        self.temp_path = temp_path
        self.rows = rows


class _LedgerWriter(DataSourceWriter):
    """Task side writes to `<uuid>.tmp`; only the driver-side
    ``commit()`` renames temps into place — so a reader never sees a
    partial task's output and a failed/speculated task's temp is
    swept by ``abort()``. This is the same publish contract the
    repository layer implements for managed tables (temp dir +
    atomic rename), expressed through the engine's writer protocol:
    Spark calls write() per partition, collects the commit messages,
    and calls exactly one of commit()/abort() with all of them."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_ledger requires a 'path' option")
        self.overwrite = overwrite

    def write(self, iterator) -> "_LedgerCommit":
        import json as _json
        import os
        import uuid

        from pyspark import TaskContext

        part = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"part-{part:05d}-{uuid.uuid4().hex}.tmp")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _LedgerCommit(tmp, n)

    def commit(self, messages) -> None:
        import os

        if self.overwrite:
            for old in os.listdir(self.path):
                if old.endswith(".jsonl"):
                    os.remove(os.path.join(self.path, old))
        for m in messages:
            if m is not None:
                os.rename(m.temp_path, m.temp_path[: -len(".tmp")] + ".jsonl")

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.temp_path):
                os.remove(m.temp_path)


class _LedgerReader(DataSourceReader):
    def __init__(self, options, schema: StructType):
        self.path = options.get("path")
        self.schema = schema

    def partitions(self) -> Sequence[InputPartition]:
        import os

        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(".jsonl")  # committed files ONLY — temps invisible
        )
        return [InputPartition(f) for f in files]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        import json as _json

        names = self.schema.fieldNames()
        with open(partition.value) as f:
            for line in f:
                d = _json.loads(line)
                yield tuple(d.get(n) for n in names)


# JSON round-trips these Spark types losslessly (json.dumps a Python
# int/float/str/bool/None → json.loads yields the same value, which the
# declared schema then types).  Timestamp/date/binary/decimal/nested
# values would serialize via default=str and come back as STRINGS the
# reader cannot re-type — so the ledger REFUSES them up front (ADVICE
# r6) instead of miscasting on read-back.
_LEDGER_OK_TYPES = (
    "string",
    "integer",
    "long",
    "short",
    "byte",
    "double",
    "float",
    "boolean",
)


def _check_ledger_schema(schema: StructType, side: str) -> None:
    bad = [
        f"{f.name}: {f.dataType.typeName()}"
        for f in schema.fields
        if f.dataType.typeName() not in _LEDGER_OK_TYPES
    ]
    if bad:
        raise ValueError(
            f"jsonl_ledger {side} supports only JSON-native column types "
            f"{_LEDGER_OK_TYPES}; unsupported: {bad}. Cast timestamps/"
            "dates to ISO strings (or epoch longs) and binary to base64 "
            "before writing, and re-parse after reading."
        )


class JsonlLedgerDataSource(DataSource):
    """``df.write.format("jsonl_ledger").option("path", …)`` — a
    Python-side sink/source pair whose visibility boundary is the
    driver's commit (two-phase: task temps → atomic renames)."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_ledger"

    def schema(self) -> str:
        # reader must be given a schema by the caller (`.schema(...)`);
        # this default covers the tests' event-shaped ledgers
        return "event_id bigint, etype string, amount double"

    def reader(self, schema: StructType) -> DataSourceReader:
        _check_ledger_schema(schema, "reader")
        return _LedgerReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        _check_ledger_schema(schema, "writer")
        return _LedgerWriter(self.options, overwrite)

    def streamWriter(  # noqa: N802
        self, schema: StructType, overwrite: bool
    ) -> DataSourceStreamWriter:
        _check_ledger_schema(schema, "stream writer")
        return _LedgerStreamWriter(self.options)


def register_jsonl_ledger(spark) -> None:
    """Idempotent per-session registration of the ledger source."""
    spark.dataSource.register(JsonlLedgerDataSource)


class _LedgerStreamWriter(DataSourceStreamWriter):
    """Streaming twin of :class:`_LedgerWriter`: per micro-batch, task
    temps → driver-side ``commit(messages, batchId)`` renames them to
    ``batch-<id>-part-*.jsonl``.  Idempotent replay: if the engine
    re-runs a batch after a crash-before-checkpoint, commit() first
    drops any files already published under that batchId — so the sink
    holds exactly one copy of every batch no matter how many times the
    engine retries it (the foreachBatch ledger recipe, expressed
    through the engine's sink protocol instead of user code)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_ledger requires a 'path' option")

    def write(self, iterator) -> "_LedgerCommit":
        import json as _json
        import os
        import uuid

        from pyspark import TaskContext

        part = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(
            self.path, f"part-{part:05d}-{uuid.uuid4().hex}.tmp"
        )
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _LedgerCommit(tmp, n)

    def commit(self, messages, batchId: int) -> None:  # noqa: N803
        import os

        for old in os.listdir(self.path):
            if old.startswith(f"batch-{batchId:09d}-") and old.endswith(
                ".jsonl"
            ):
                os.remove(os.path.join(self.path, old))  # replayed batch
        for i, m in enumerate(messages):
            if m is not None:
                os.rename(
                    m.temp_path,
                    os.path.join(
                        self.path,
                        f"batch-{batchId:09d}-part-{i:05d}.jsonl",
                    ),
                )

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        import os

        for m in messages:
            if m is not None and os.path.exists(m.temp_path):
                os.remove(m.temp_path)
