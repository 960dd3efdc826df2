"""Streaming observability via ``StreamingQueryListener``.

Reference provenance: the reference exposed no monitoring surface
(empty skeleton); this is the Spark-native contract a production
deployment watches instead of log-scraping — the engine pushes a
progress event per micro-batch (rows ingested, processing duration,
per-stateful-operator state row/байt counts, watermark) and lifecycle
events on start/termination.

Why it matters at 100 TB: state growth and watermark lag are the two
streaming failure modes that surface HOURS before an OOM or an SLA
miss; the listener stream is where they're visible per batch, with no
extra query work (the metrics ride the batch that already ran).

``ProgressLedger`` accumulates the per-batch metrics in-process; a
production twin would forward the same dicts to a metrics sink instead
of a list — the capture contract is identical (the events arrive on a
listener-bus thread, so consumers must be thread-safe; the ledger
locks around every mutation).
"""

from __future__ import annotations

import threading

from pyspark.sql.streaming import StreamingQueryListener


class ProgressLedger(StreamingQueryListener):
    """Accumulates one record per micro-batch progress event:
    (batch_id, num_input_rows, state_rows_total, watermark) plus
    start/stop lifecycle markers."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.progress: list[dict] = []
        self.started: list[str] = []
        self.terminated: list[str] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        with self._lock:
            self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        state_rows = sum(
            (op.numRowsTotal or 0) for op in (p.stateOperators or [])
        )
        with self._lock:
            self.progress.append(
                {
                    "query_id": str(p.id),
                    "batch_id": p.batchId,
                    "num_input_rows": p.numInputRows,
                    "state_rows_total": state_rows,
                    "event_time_watermark": (p.eventTime or {}).get(
                        "watermark"
                    ),
                }
            )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        with self._lock:
            self.terminated.append(str(event.id))

    def rows_ingested(self, query_id: str) -> int:
        with self._lock:
            return sum(
                r["num_input_rows"]
                for r in self.progress
                if r["query_id"] == query_id
            )

    def batches(self, query_id: str) -> list[dict]:
        with self._lock:
            return [r for r in self.progress if r["query_id"] == query_id]
