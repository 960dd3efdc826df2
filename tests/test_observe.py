"""#426: batch ``Observation`` metrics — the in-plan, one-pass row-loss
audit (the batch twin of #410's streaming listener).  Pinned: observed
values equal the second-pass ground truth; the input-side observation
sees PRE-filter rows; the observed run costs one Spark job where the
ground-truth twin costs two."""

from __future__ import annotations

import math

from pyspark.sql import Observation
from pyspark.sql import functions as F

from polybot_data_etl_spark.plans.observe import (
    funnel_ground_truth,
    observed_filter_funnel,
)


def test_observed_funnel_matches_ground_truth(spark, sf_dir):
    """The metrics that rode the single observed job must equal the
    separately-aggregated numbers exactly (counts) / to float addition
    order (sums)."""
    result, obs_in, obs_out = observed_filter_funnel(spark, sf_dir)
    rows = result.collect()  # the ONE action; observations fill here
    truth = funnel_ground_truth(spark, sf_dir)

    assert obs_in.get["rows"] == truth["in"]["rows"]
    assert obs_out.get["rows"] == truth["out"]["rows"]
    assert math.isclose(
        obs_in.get["price_mass"], truth["in"]["price_mass"], rel_tol=1e-9
    )
    assert math.isclose(
        obs_out.get["price_mass"], truth["out"]["price_mass"], rel_tol=1e-9
    )
    # the observation attaches to the plan POINT: input side sees the
    # full scan even though the collected result is post-filter
    assert obs_in.get["rows"] > obs_out.get["rows"] > 0
    # and the collected aggregate reconciles with the out-side funnel
    assert sum(r["n"] for r in rows) == obs_out.get["rows"]


def test_observation_metrics_ride_the_job_for_free(spark, sf_dir):
    """The 100 TB argument, asserted: collecting the funnel WITH both
    observations costs exactly as many Spark jobs as collecting the
    identical unobserved aggregate — the metrics ride tasks that were
    already running (vs the ground-truth twin, which by construction
    pays one extra full-scan action per audited stage)."""
    from polybot_data_etl_spark.catalog import table

    tracker = spark.sparkContext.statusTracker()

    def job_count(action):
        before = set(tracker.getJobIdsForGroup(None) or [])
        action()
        after = set(tracker.getJobIdsForGroup(None) or [])
        return len(after - before)

    def unobserved():
        li = table(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_extendedprice"
        )
        (
            li.filter(F.col("l_extendedprice") > 40000.0)
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("l_extendedprice"), 2).alias("kept_mass"),
            )
            .orderBy("l_returnflag")
            .collect()
        )

    # warm both shapes once so AQE/codegen first-run jobs don't skew
    unobserved()
    result, _, _ = observed_filter_funnel(spark, sf_dir)
    result.collect()

    plain_jobs = job_count(unobserved)
    result, obs_in, obs_out = observed_filter_funnel(spark, sf_dir)
    observed_jobs = job_count(result.collect)

    assert observed_jobs == plain_jobs
    assert obs_in.get["rows"] > obs_out.get["rows"] > 0


def test_observation_binds_to_one_action(spark, sf_dir):
    """An Observation is a record of the action that ran, not a live
    gauge: attaching the same instance to a second plan raises — the
    API forces one funnel record per observed run."""
    obs = Observation("once")
    li = spark.range(10).observe(obs, F.count(F.lit(1)).alias("rows"))
    li.collect()
    assert obs.get["rows"] == 10
    try:
        spark.range(5).observe(obs, F.count(F.lit(1)).alias("rows"))
        raised = False
    except Exception:
        raised = True
    assert raised
