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


# --- r13: scale-derived bucket counts + codegen'd bucket assignment ---
#
# The bucketed two-pass plans share two defects the r12 verdict named:
# (a) `n_buckets` was a fixed 32 — fine at fixture scale, but at ×100
#     each bucket holds ~1.8 M rows in ONE sorted partition (guide
#     §2.2: derive partition counts from input size); and
# (b) the bucket assignment `size(filter(array(cuts), x -> x <= col))`
#     is an interpreted higher-order function costing O(n_buckets) per
#     row — measured 3× the codegen'd ladder at 32 cuts and 6× at 256
#     (the per-row cost that made larger bucket counts a regression).
#
# `probe_rows_and_grid` samples the row count AND a fixed power-of-two
# quantile grid in ONE job; `derived_bucket_count` turns the sampled
# row count into a power-of-two bucket count (floor 32 keeps every
# fixture-scale plan byte-identical to the old fixed-32 form — the
# grid subsample at stride G/n lands on exactly the i/n quantiles of
# the same sketch); `bucket_index_sql` renders the assignment as a
# balanced comparison ladder — O(log n_buckets) codegen'd CASE nesting
# that computes exactly `count(cuts <= col)` including the NULL case
# (every NULL comparison descends left → 0, matching size(filter(..))
# on a NULL input).

GRID = 1024


def probe_rows_and_grid(
    df, col: str, accuracy: int = 10_000, grid: int = GRID
) -> dict:
    """ONE sampling job: row count + the (grid−1)-point quantile grid
    of ``col`` (plain Python values — memo-safe)."""
    from pyspark.sql import functions as F

    qs = [i / grid for i in range(1, grid)]
    row = df.agg(
        F.count(F.lit(1)).alias("rows"),
        F.percentile_approx(col, qs, accuracy).alias("cuts"),
    ).first()
    return {"rows": int(row["rows"]), "grid": list(row["cuts"] or [])}


def derived_bucket_count(
    rows: int, target_rows: int = 250_000, floor: int = 32, cap: int = GRID
) -> int:
    """Power-of-two bucket count ≈ rows / target_rows, clamped to
    [floor, cap].  floor=32 keeps sub-8M-row inputs on the historical
    fixed-32 plan; cap=GRID bounds the boundary-stitch summary and
    matches the sampled grid."""
    n = floor
    while n < cap and rows // target_rows > n:
        n *= 2
    return n


def grid_cuts(probe: dict, n_buckets: int, grid: int = GRID) -> list:
    """The i/n_buckets quantile cut points, subsampled from the fixed
    grid (exact: the grid is a superset of every power-of-two
    quantile set up to GRID)."""
    stride = grid // n_buckets
    return sorted(set(probe["grid"][stride - 1 :: stride]))


def bucket_index_sql(cuts: list, col_sql: str) -> str:
    """`count(cuts <= col)` — the bucket index against sorted distinct
    cut literals — as a balanced CASE ladder (codegen'd, O(log B) per
    row; exactly equivalent to size(filter(array(cuts), x -> x <=
    col)), including NULL → 0)."""

    def lit(v) -> str:
        if isinstance(v, int):
            return f"{v}L"
        return f"CAST({float(v)!r} AS DOUBLE)"

    def rec(lo: int, hi: int) -> str:
        if lo == hi:
            return str(lo)
        mid = (lo + hi) // 2
        return (
            f"(CASE WHEN {lit(cuts[mid])} <= {col_sql}"
            f" THEN {rec(mid + 1, hi)} ELSE {rec(lo, mid)} END)"
        )

    if not cuts:
        return "0"
    return rec(0, len(cuts))
