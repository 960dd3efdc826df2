"""Query + oracle registry.

The moral successor of the reference's ``src/etl/sql/`` directory
(SURVEY.md §0.1 [REC src/etl/.DS_Store:4992]): every analytics query the
engine supports is declared once, as a named pair of

  * a PySpark builder  ``(SparkSession, sf_dir) -> DataFrame``  and
  * (where SQL-expressible) an equivalent ANSI/DuckDB oracle SQL string

so the driver's differential gate (row-count + schema + order-insensitive
value-hash vs DuckDB 1.0) can check every operator end-to-end.

Cross-dialect conventions (SURVEY.md §2.1) are enforced by convention in
each registered query: float outputs rounded (2 for money, 4 for
similarity/stats), embeddings cast to double before arithmetic, every
computed column aliased identically on both sides, top-k always
tie-broken by a unique key.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QueryFn = Callable[..., Any]  # (SparkSession, str) -> DataFrame

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder and (optionally) its DuckDB oracle SQL.

    ``oracle=None`` marks a non-SQL-expressible operator (the driver then
    records a weaker rows-only check — SURVEY.md §2, "rows" rows).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return dict(_QUERIES)


def oracles() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imports are for their registration side effects.
    from polybot_data_etl_spark.operators import (  # noqa: F401
        aggregates,
        joins,
        predicates,
        relational_ext,
        scans,
        sort_setops,
        timeseries,
        windows,
    )
    from polybot_data_etl_spark.functions import (  # noqa: F401
        dedup,
        dq,
        multimodal,
        quality,
        scalar,
        text,
        udf,
        vectors,
    )

    _LOADED = True
