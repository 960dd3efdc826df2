"""Round-9 pins.

The link-prediction degree-cap knob (VERDICT r8 #6): the registered
`q_graph_link_predict` keeps its fixed cap-64 contract, and
`link_predict_topk(deg_cap=...)` is the deployment knob — pinned
exactly equal at the default cap, and pinned as a monotone lower
bound when the cap tightens (dropping a wedge center can only remove
positive 1/ln(d) terms from a pair's Adamic-Adar sum)."""

from __future__ import annotations

from polybot_data_etl_spark.operators import graph


def _score_map(rows):
    return {(r["a"], r["b"]): (r["cn"], r["aa"]) for r in rows}


def _all_candidates(spark, sf_dir, deg_cap):
    """Every non-edge candidate with its wedge count + raw AA score at
    the given center cap — the knob's frame before top-k truncation."""
    return (
        graph.link_predict_topk(spark, sf_dir, deg_cap=deg_cap, topk=None)
        .select("a", "b", "common_neighbors", "adamic_adar")
        .withColumnRenamed("common_neighbors", "cn")
        .withColumnRenamed("adamic_adar", "aa")
        .collect()
    )


def test_link_predict_knob_default_equals_registered(spark, sf_dir):
    reg = graph.q_graph_link_predict(spark, sf_dir).collect()
    knob = graph.link_predict_topk(spark, sf_dir).collect()
    assert [r.asDict() for r in reg] == [r.asDict() for r in knob]
    assert len(reg) > 0  # the pin is vacuous on an empty result


def test_link_predict_tighter_cap_is_monotone_lower_bound(spark, sf_dir):
    full = _score_map(_all_candidates(spark, sf_dir, deg_cap=graph._LP_DEG_CAP))
    capped = _score_map(_all_candidates(spark, sf_dir, deg_cap=16))
    assert full, "fixture graph produced no candidates at the default cap"
    assert capped, "cap=16 dropped every candidate — not a useful knob pin"
    # tightening the cap only DROPS wedge centers: no new pairs appear,
    # and every surviving pair loses (never gains) witnesses and score
    assert set(capped) <= set(full)
    for pair, (cn_c, aa_c) in capped.items():
        cn_f, aa_f = full[pair]
        assert cn_c <= cn_f, pair
        # 4-dp emit rounding on both sides → half-ulp slack
        assert aa_c <= aa_f + 5e-5, (pair, aa_c, aa_f)


def test_link_predict_loose_cap_is_superset_of_default(spark, sf_dir):
    """Raising the cap beyond the registered 64 only ADDS wedge
    centers — the registered result's pairs all survive with
    equal-or-higher scores (cap→∞ is the exact Adamic-Adar)."""
    full = _score_map(_all_candidates(spark, sf_dir, deg_cap=graph._LP_DEG_CAP))
    uncapped = _score_map(_all_candidates(spark, sf_dir, deg_cap=2**31 - 1))
    assert set(full) <= set(uncapped)
    for pair, (cn_f, aa_f) in full.items():
        cn_u, aa_u = uncapped[pair]
        assert cn_f <= cn_u, pair
        assert aa_f <= aa_u + 5e-5, (pair, aa_f, aa_u)


def test_dynamic_partition_pruning_prunes_fact_scan(spark, sf_dir, tmp_path):
    """Component #431 — dynamic partition pruning, the star-schema
    complement of the static PartitionFilters pins (tests/test_layout
    .py) and the runtime bloom pin (tests/test_plans.py): when the
    selective predicate sits on a DIMENSION attribute (not the fact's
    partition column), the partition filter only exists at RUNTIME —
    Catalyst injects a `dynamicpruning` subquery into the fact scan's
    PartitionFilters, reusing the dim's broadcast to enumerate the
    surviving partition keys, so the fact side reads only matching
    hive partitions.  At 100 TB this is the difference between
    scanning every date partition of the fact table and scanning the
    handful a filtered dim actually joins to.  Pins: (a) the DPP
    subquery is in the fact scan's PartitionFilters, (b) rows equal
    the DPP-disabled twin exactly, (c) with DPP off the subquery is
    absent — the pin detects the feature, not a coincidence."""
    import pyspark.sql.functions as F

    from polybot_data_etl_spark.catalog import table

    fact_path = str(tmp_path / "li_by_year")
    li = table(spark, sf_dir, "lineitem")
    (
        li.withColumn("ship_year", F.year("l_shipdate"))
        .write.mode("overwrite")
        .partitionBy("ship_year")
        .parquet(fact_path)
    )
    # dim carries the year key + an ATTRIBUTE the filter lands on, so
    # the fact's partition predicate cannot be derived statically;
    # keep-years come from the data (the fixture's date span varies
    # by scale factor) — two kept, the rest dropped
    years = sorted(
        r[0]
        for r in li.select(F.year("l_shipdate").alias("y")).distinct().collect()
    )
    assert len(years) >= 3, f"fixture spans too few years for a pruning pin: {years}"
    keep = set(years[:2])
    dim = spark.createDataFrame(
        [(y, "keep" if y in keep else "drop") for y in years],
        "ship_year int, era string",
    )

    def run():
        fact = spark.read.parquet(fact_path)
        return (
            fact.join(F.broadcast(dim), "ship_year")
            .filter(F.col("era") == "keep")
            .groupBy("ship_year")
            .agg(
                F.count("*").alias("n"),
                F.sum("l_quantity").alias("qty"),
            )
        )

    saved = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    try:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true"
        )
        on = run()
        plan_on = on._jdf.queryExecution().executedPlan().toString()
        rows_on = sorted(r.asDict().items() for r in on.collect())

        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", "false"
        )
        off = run()
        plan_off = off._jdf.queryExecution().executedPlan().toString()
        rows_off = sorted(r.asDict().items() for r in off.collect())
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", saved
        )

    assert "dynamicpruning" in plan_on.lower(), plan_on[:2000]
    assert "dynamicpruning" not in plan_off.lower()
    assert rows_on == rows_off
    assert len(rows_on) == 2  # the two kept years survive, nothing else


def test_aqe_runtime_smj_to_broadcast_demotion(spark, sf_dir):
    """Component #432 — AQE's runtime join-strategy switch: static
    planning sees an un-filtered dim too big to broadcast (static
    threshold disabled) and plans a SortMergeJoin; at runtime the
    finished shuffle stage reveals the filtered build side is tiny,
    and AQE re-plans the join as a BroadcastHashJoin under its OWN
    threshold (`spark.sql.adaptive.autoBroadcastJoinThreshold`).  At
    100 TB this rescues every join whose build side shrinks only
    after a selectivity Catalyst can't estimate — no hint needed.
    Pins: initial plan SMJ, final plan BHJ, rows equal the static-SMJ
    twin."""
    import pyspark.sql.functions as F

    from polybot_data_etl_spark.catalog import table

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }

    def run():
        li = table(spark, sf_dir, "lineitem")
        pt = table(spark, sf_dir, "part").filter(F.col("p_partkey") % 50 == 0)
        return (
            li.join(pt, li.l_partkey == pt.p_partkey)
            .groupBy("p_brand")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("l_extendedprice"), 2).alias("rev"),
            )
        )

    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "32MB"
        )
        adaptive = run()
        rows_aqe = sorted(r.asDict().items() for r in adaptive.collect())
        plan = adaptive._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "BroadcastHashJoin" in plan, plan[:2000]
        initial = (
            adaptive._jdf.queryExecution().executedPlan().initialPlan().toString()
        )
        assert "SortMergeJoin" in initial and "BroadcastHashJoin" not in initial

        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        smj = run()
        rows_smj = sorted(r.asDict().items() for r in smj.collect())
        plan_smj = smj._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan_smj or "ShuffledHashJoin" in plan_smj
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    assert rows_aqe == rows_smj
    assert len(rows_aqe) > 0


def test_aqe_coalesces_overprovisioned_shuffle(spark, sf_dir):
    """Component #433 — AQE partition coalescing: a shuffle planned at
    a cluster-sized partition count (512 here — the 100 TB default
    posture of 2-3× total cores) collapses to a handful of
    post-shuffle reads when the actual map output is small, instead
    of launching hundreds of near-empty reducers.  Pins: final plan
    carries the `AQEShuffleRead coalesced` marker, the executed
    output partition count is far under the configured 512, and rows
    equal the coalescing-disabled twin."""
    import pyspark.sql.functions as F

    from polybot_data_etl_spark.catalog import table

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.shuffle.partitions",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }

    def run():
        o = table(spark, sf_dir, "orders")
        return o.groupBy("o_orderpriority").agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )

    try:
        spark.conf.set("spark.sql.shuffle.partitions", "512")
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "true"
        )
        on = run()
        rows_on = sorted(r.asDict().items() for r in on.collect())
        plan_on = on._jdf.queryExecution().executedPlan().toString()
        n_parts_on = on.rdd.getNumPartitions()

        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "false"
        )
        off = run()
        rows_off = sorted(r.asDict().items() for r in off.collect())
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    assert "coalesced" in plan_on, plan_on[:2000]
    assert n_parts_on < 64, n_parts_on
    assert rows_on == rows_off
    assert len(rows_on) == 5  # the five TPC-H order priorities
