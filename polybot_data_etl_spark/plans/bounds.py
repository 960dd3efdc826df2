"""Session-scoped memo for driver-side bucket-bound literals.

The four plans flipped to their bucketed two-pass recipes in round 11
(q_dq_rle, q_dq_id_gaps, q_agg_rfm, q_win_dist — plus the round-8
q_win_weighted_median_scaled) each open with one synchronous
``percentile_approx(...).first()`` that samples the bucket cut points,
the RangePartitioner precedent.  That pass is deterministic in
(fixture dir, source frame, bucket count) but was re-paid on EVERY plan
construction — measured 4-7 s cold at sf0.1 across the four names
(SCALE.md, commit 290866b), hidden under bench's producer pipelining
but billed again by any caller that rebuilds plans in a shared session
(VERDICT r11 §wrong #4).

``memoized_bounds`` keys the computed plain-Python value by
(applicationId, caller key): the first build of a (query, sf_dir,
n_buckets) combination runs the sampling job, every later build in the
same session re-uses the literals and issues NO Spark job — asserted
via the status tracker in tests/test_round12.py.  Values are plain
lists/dicts (no DataFrame, no Py4J ref), so entries from dead sessions
hold no JVM resources; they are still evicted on app-id change so a
long-lived process cycling sessions over changing fixture paths cannot
read stale cuts.

Concurrency: the lock covers only dict access, never the Spark job —
two plan-producer threads racing the same cold key may both run the
sampling pass (harmless: the value is deterministic; ``setdefault``
keeps exactly one), but a cold build never blocks lookups of other
keys, unlike the module-wide build locks the lazy-frame caches need.
"""

from __future__ import annotations

import threading
from typing import Any, Callable

from pyspark.sql import SparkSession

_CACHE: dict[tuple, Any] = {}
_LOCK = threading.Lock()
_MISSING = object()


def memoized_bounds(
    spark: SparkSession, key: tuple, compute: Callable[[], Any]
) -> Any:
    """Return ``compute()``'s value memoized per (session, ``key``).

    ``compute`` must return a plain picklable Python value (bound
    literals, not frames); it runs outside the lock.
    """
    app_id = spark.sparkContext.applicationId
    full_key = (app_id, *key)
    with _LOCK:
        value = _CACHE.get(full_key, _MISSING)
    if value is not _MISSING:
        return value
    value = compute()
    with _LOCK:
        for k in [k for k in _CACHE if k[0] != app_id]:
            del _CACHE[k]
        return _CACHE.setdefault(full_key, value)


def clear_bounds_cache() -> None:
    """Drop memoized cut points (tests / fixture swaps under one app)."""
    with _LOCK:
        _CACHE.clear()
