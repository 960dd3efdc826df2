"""DAG-runner tests: graph validation, deterministic topology,
failure propagation, retries, and an end-to-end Spark pipeline that
mirrors the reference's extract → process → transform → load shape."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table
from polybot_data_etl_spark.plans.dag import Pipeline, Task


def _noop(spark, ctx):
    return True


def test_validation_rejects_bad_graphs():
    with pytest.raises(ValueError, match="duplicate"):
        Pipeline([Task("a", _noop), Task("a", _noop)])
    with pytest.raises(ValueError, match="unknown"):
        Pipeline([Task("a", _noop, deps=("ghost",))])
    with pytest.raises(ValueError, match="cycle"):
        Pipeline(
            [
                Task("a", _noop, deps=("b",)),
                Task("b", _noop, deps=("a",)),
                Task("c", _noop),
            ]
        )


def test_topological_order_is_deterministic():
    # diamond: a → {b, c} → d ; lexicographic among ready tasks
    p = Pipeline(
        [
            Task("d", _noop, deps=("b", "c")),
            Task("c", _noop, deps=("a",)),
            Task("b", _noop, deps=("a",)),
            Task("a", _noop),
        ]
    )
    assert p.order == ["a", "b", "c", "d"]


def test_failure_skips_descendants_not_siblings(spark):
    def boom(s, ctx):
        raise RuntimeError("boom")

    p = Pipeline(
        [
            Task("a", _noop),
            Task("bad", boom, deps=("a",)),
            Task("down", _noop, deps=("bad",)),
            Task("side", _noop, deps=("a",)),
        ]
    )
    _, runs = p.run(spark)
    assert runs["a"].status == "success"
    assert runs["bad"].status == "failed" and "boom" in runs["bad"].error
    assert runs["down"].status == "skipped"
    assert runs["side"].status == "success"


def test_retries_recover_transient_failures(spark):
    calls = {"n": 0}

    def flaky(s, ctx):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    p = Pipeline([Task("t", flaky, retries=3)])
    ctx, runs = p.run(spark)
    assert runs["t"].status == "success" and runs["t"].attempts == 3
    assert ctx["t"] == "ok"


def test_etl_pipeline_end_to_end(spark, sf_dir, tmp_path):
    """extract (events scan) → process (hourly rollup) → transform
    (z-score tag) → load (parquet sink), results threaded via ctx."""
    out = str(tmp_path / "hourly")

    def extract(s, ctx):
        return table(s, sf_dir, "events")

    def process(s, ctx):
        return (
            ctx["extract"]
            .groupBy(F.date_trunc("hour", "ts").alias("hour"))
            .agg(F.count("*").alias("n"))
        )

    def transform(s, ctx):
        h = ctx["process"]
        stats = h.agg(
            F.avg("n").alias("mu"), F.stddev_pop("n").alias("sd")
        )
        return h.crossJoin(F.broadcast(stats)).select(
            "hour", "n",
            ((F.col("n") - F.col("mu")) / F.col("sd")).alias("z"),
        )

    def load(s, ctx):
        ctx["transform"].write.mode("overwrite").parquet(out)
        return out

    p = Pipeline(
        [
            Task("extract", extract),
            Task("process", process, deps=("extract",)),
            Task("transform", transform, deps=("process",)),
            Task("load", load, deps=("transform",)),
        ],
        name="hourly-zscore",
    )
    ctx, runs = p.run(spark)
    assert all(r.status == "success" for r in runs.values())
    written = spark.read.parquet(out)
    assert written.count() == ctx["process"].count()
    assert set(written.columns) == {"hour", "n", "z"}


def test_resume_from_failure_skips_completed(spark):
    """Restart-from-failure: pass the prior run's successes as
    `completed` + its ctx; they report `cached` and their callables
    never re-execute (exactly-once for load stages)."""
    calls = {"a": 0, "b": 0}

    def a(s, ctx):
        calls["a"] += 1
        return "A"

    attempt = {"n": 0}

    def b(s, ctx):
        calls["b"] += 1
        attempt["n"] += 1
        if attempt["n"] == 1:
            raise RuntimeError("first run fails")
        return ctx["a"] + "B"

    p = Pipeline([Task("a", a), Task("b", b, deps=("a",))])
    ctx1, runs1 = p.run(spark)
    assert runs1["a"].status == "success" and runs1["b"].status == "failed"
    done = {n for n, r in runs1.items() if r.status == "success"}
    ctx2, runs2 = p.run(spark, ctx=ctx1, completed=done)
    assert runs2["a"].status == "cached" and runs2["b"].status == "success"
    assert calls["a"] == 1 and calls["b"] == 2
    assert ctx2["b"] == "AB"


def test_resume_validates_completed_set(spark):
    p = Pipeline([Task("a", _noop)])
    with pytest.raises(ValueError, match="not in pipeline"):
        p.run(spark, completed={"ghost"})
    with pytest.raises(ValueError, match="no ctx result"):
        p.run(spark, completed={"a"})
