"""Batch observability via the ``Observation`` API (SURVEY §2 #426).

Reference provenance: the reference exposed no metrics surface (empty
skeleton); this is the Spark-native batch twin of #410's streaming
``StreamingQueryListener`` — ``df.observe(Observation, aggs...)``
attaches named aggregate metrics to a point IN the plan, and the
engine computes them DURING the action that executes that plan, as a
side-car accumulator on the tasks that were already running.

Why it matters at 100 TB: the standard row-loss audit (count the
input, count the survivors, alert on the delta) costs a second full
scan per pipeline stage when written as separate aggregations — at
100 TB that doubles the I/O bill of every audited stage.  Observed
metrics ride the job: one pass, same answer.  The funnel below
instruments a filter stage at both ends (rows + byte/price mass in,
rows + mass out) so the loss accounting is exact and free.

Contract notes pinned by tests/test_observe.py:
- observed metrics equal the separately-aggregated ground truth;
- an ``Observation`` binds to ONE action — the values are those of
  the action that ran, not a live gauge (re-use raises upstream);
- metrics attach to the plan POINT: the input-side observation sees
  pre-filter rows even though the collected result is post-filter;
- the observed run executes the scan ONCE (job-count asserted via
  the status tracker), vs TWO scans for the aggregate-then-filter
  twin — the 100 TB argument in miniature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table


def observed_filter_funnel(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, Observation, Observation]:
    """High-value-lineitem filter with an observed in/out funnel.

    Returns ``(result, obs_in, obs_out)`` where ``result`` is the
    per-returnflag aggregate of lineitems with extendedprice above the
    threshold, and the two observations carry (rows, price mass) at
    the scan side and the survivor side of the filter.  Read the
    observation values only AFTER an action on ``result``.
    """
    obs_in = Observation("funnel_in")
    obs_out = Observation("funnel_out")
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    observed_in = li.observe(
        obs_in,
        F.count(F.lit(1)).alias("rows"),
        F.sum("l_extendedprice").alias("price_mass"),
    )
    kept = observed_in.filter(F.col("l_extendedprice") > 40000.0)
    observed_out = kept.observe(
        obs_out,
        F.count(F.lit(1)).alias("rows"),
        F.sum("l_extendedprice").alias("price_mass"),
    )
    result = (
        observed_out.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("kept_mass"),
        )
        .orderBy("l_returnflag")
    )
    return result, obs_in, obs_out


def funnel_ground_truth(spark: SparkSession, sf_dir: str) -> dict:
    """The same funnel numbers via plain (second-pass) aggregations —
    what the observed run must equal, and what a 100 TB pipeline pays
    a full extra scan for if it skips ``observe``."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    row_in = li.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("l_extendedprice").alias("price_mass"),
    ).first()
    kept = li.filter(F.col("l_extendedprice") > 40000.0)
    row_out = kept.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("l_extendedprice").alias("price_mass"),
    ).first()
    return {
        "in": {"rows": row_in["rows"], "price_mass": row_in["price_mass"]},
        "out": {"rows": row_out["rows"], "price_mass": row_out["price_mass"]},
    }
