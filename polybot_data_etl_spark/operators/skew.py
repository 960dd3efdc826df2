"""Skew-salted two-phase aggregation (SCALE.md "Skew").

AQE's skew handling covers *join*-side skew.  For aggregation the
standard counter to a hot key is the two-phase salt: phase 1 aggregates
on (keys…, salt) so the hot key's rows spread over ``salt_n`` reducers
and collapse to ``salt_n`` partial rows; phase 2 merges the partials on
the true keys — a shuffle of #groups × salt_n rows.

Honest scope (measured, scripts/stress.py, 2M rows with a 50%-hot key):
for ALGEBRAIC aggregates Spark's map-side partial aggregation already
collapses the hot key to one row per map task, so the salt is
break-even there (1.9 s plain vs 2.1 s salted).  The salt earns its
keep when the partial-combine step is ineffective: aggregation state
that doesn't shrink (large collect-style buffers), UDAF pipelines
without a JVM partial, or engines/paths where partial aggregation is
disabled — and as the general template SCALE.md documents.  It is
proven output-equivalent to the plain groupBy either way
(tests/test_skew.py), so using it costs correctness nothing.

``salted_agg`` composes the salt with any mergeable aggregate (sum /
count / min / max / avg — avg decomposes into sum+count partials, since
an average of averages is wrong for uneven salt cells).  Equivalence to
the plain ``groupBy`` is property-tested on a skewed key in
tests/test_skew.py.

Salt choice: ``monotonically_increasing_id() % salt_n`` — deterministic
for a fixed partition layout, spreads rows *within* an input partition
too (a partition-id salt would cap spread at the input partition count),
and costs no hash of row contents (a full-row hash would collapse
duplicate rows onto one salt, exactly the rows a hot key tends to have).
The result is salt-invariant, so layout changes can't change answers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table
from polybot_data_etl_spark.registry import register

_SALT = "__salt"

# fn name -> (partial builder, merge builder) where the partial runs on
# (keys…, salt) groups and the merge combines partial columns per key.
_MERGEABLE = ("sum", "count", "min", "max", "avg")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_n: int = 32,
) -> DataFrame:
    """Skew-safe ``df.groupBy(*keys).agg(...)``.

    ``aggs`` maps output column name -> (fn, col) with fn one of
    sum/count/min/max/avg (col may be "*" for count).  Returns one row
    per distinct key combination, exactly like the plain groupBy.
    """
    bad = [fn for fn, _ in aggs.values() if fn not in _MERGEABLE]
    if bad:
        raise ValueError(
            f"non-mergeable aggregate(s) {bad}; supported: {_MERGEABLE}"
        )
    partials: list[Column] = []
    merges: list[Column] = []
    for out, (fn, col) in aggs.items():
        if fn == "sum":
            partials.append(F.sum(col).alias(f"__s_{out}"))
            merges.append(F.sum(f"__s_{out}").alias(out))
        elif fn == "count":
            cnt = F.count("*") if col == "*" else F.count(col)
            partials.append(cnt.alias(f"__c_{out}"))
            merges.append(F.sum(f"__c_{out}").alias(out))
        elif fn in ("min", "max"):
            agg = getattr(F, fn)
            partials.append(agg(col).alias(f"__m_{out}"))
            merges.append(agg(f"__m_{out}").alias(out))
        else:  # avg: sum+count partials — avg-of-avgs would be wrong
            partials.append(F.sum(col).alias(f"__as_{out}"))
            partials.append(F.count(col).alias(f"__ac_{out}"))
            merges.append(
                (F.sum(f"__as_{out}") / F.sum(f"__ac_{out}")).alias(out)
            )
    salted = df.withColumn(
        _SALT, F.pmod(F.monotonically_increasing_id(), F.lit(salt_n))
    )
    partial = salted.groupBy(*keys, _SALT).agg(*partials)
    return partial.groupBy(*keys).agg(*merges)


@register(
    "q_agg_salted",
    oracle="""
    SELECT user_id, round(sum(value), 2) AS total, count(*) AS n,
           round(min(value), 2) AS lo, round(max(value), 2) AS hi
    FROM events GROUP BY user_id
    """,
)
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user aggregation THROUGH the two-phase salt — same answer as
    the plain groupBy (the oracle is the plain SQL), demonstrated
    end-to-end against the driver gate, so the skew path is not just a
    unit-tested utility."""
    e = table(spark, sf_dir, "events")
    out = salted_agg(
        e.select("user_id", "value"),
        ["user_id"],
        {
            "total": ("sum", "value"),
            "n": ("count", "*"),
            "lo": ("min", "value"),
            "hi": ("max", "value"),
        },
        salt_n=8,
    )
    return out.select(
        "user_id",
        F.round("total", 2).alias("total"),
        "n",
        F.round("lo", 2).alias("lo"),
        F.round("hi", 2).alias("hi"),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: list[str],
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe ``fact.join(dim, keys, how)`` for a hot-keyed fact side.

    The fact side gets a ``monotonically_increasing_id() % salt_n`` salt
    (same rationale as ``salted_agg``: spreads within input partitions,
    duplicate-row safe, salt-invariant result); the dim side is
    replicated ``salt_n``× by exploding the full salt range, and the
    join runs on (keys…, salt) — a hot key's rows land on ``salt_n``
    reducers instead of one.  The dim replication multiplies the small
    side only, which is exactly the side that fits.

    Only ``inner`` and ``left`` are supported: replication preserves
    fact-row multiplicity, but an unmatched DIM row would surface
    ``salt_n`` times under right/full semantics."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    fact_s = fact.withColumn(
        _SALT, F.pmod(F.monotonically_increasing_id(), F.lit(salt_n))
    )
    dim_s = dim.withColumn(
        "__salts", F.sequence(F.lit(0).cast("long"), F.lit(salt_n - 1).cast("long"))
    ).withColumn(_SALT, F.explode("__salts")).drop("__salts")
    return fact_s.join(dim_s, [*keys, _SALT], how).drop(_SALT)


@register(
    "q_join_salted",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           count(*) AS n,
           round(sum(e.value), 2) AS total
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim revenue rollup THROUGH the salted join — the oracle is
    the plain SQL join, so the salt is proven answer-invariant at the
    driver gate.  The production case is a hot key (power-user,
    null-bucket, default id) that AQE's skew split can't always catch
    (e.g. broadcast-ineligible dim + hash join); the salt bounds any
    key's reducer share at 1/salt_n by construction."""
    e = table(spark, sf_dir, "events").select("user_id", "value")
    dim = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    joined = salted_join(e, dim, ["user_id"], salt_n=8)
    return joined.groupBy("segment").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total")
    )
