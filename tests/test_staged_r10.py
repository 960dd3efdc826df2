"""Differential verification of the staged round-10 registration batch
(operators/staged_r10.py, SURVEY §2 #434-441): every staged query runs
through the SAME canonicalization as the t2 gate (row count, sorted
columns, order-insensitive value hash) against its DuckDB oracle — so
flipping them to `registry.register` in round 10 carries zero
correctness risk, only the driver-evidence formality."""

from __future__ import annotations

import pytest

from scripts.check_oracle import canon_frame
from polybot_data_etl_spark.operators.staged_r10 import STAGED


def test_staged_batch_is_nonempty_and_not_yet_registered():
    from polybot_data_etl_spark import registry

    assert len(STAGED) == 17
    clash = set(STAGED) & set(registry.queries())
    assert not clash, (
        "staged names already registered — the round-9 freeze forbids "
        f"registration this round: {sorted(clash)}"
    )


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_query_matches_oracle(spark, sf_dir, duck, name):
    fn, oracle = STAGED[name]
    sdf = fn(spark, sf_dir).toPandas()
    ddf = duck.execute(oracle).df()
    s_rows, s_cols, s_hash, s_sample = canon_frame(sdf)
    d_rows, d_cols, d_hash, d_sample = canon_frame(ddf)
    assert s_cols == d_cols, (name, s_cols, d_cols)
    assert s_rows == d_rows, (name, s_rows, d_rows)
    assert s_rows > 0, f"{name}: empty result proves nothing"
    assert s_hash == d_hash, (
        f"{name}: value hash mismatch\nspark  {s_sample}\nduckdb {d_sample}"
    )


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_query_schema_is_driver_hashable(spark, sf_dir, name):
    """Same all-scalar output invariant the registered fleet obeys
    (the driver's pandas hasher chokes on array/map/struct cells)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    fn, _ = STAGED[name]
    schema = fn(spark, sf_dir).schema
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert bad == [], bad


def test_staged_queries_have_no_unbounded_global_windows(spark, sf_dir):
    """The round-8 fleet plan invariant, applied to the staged batch
    BEFORE it registers: no unpartitioned window whose input reaches a
    scan without a cardinality-bounding node (Aggregate/Limit/
    Deduplicate) — the one-task global sort that dies first at 100 TB.
    Same walker as tests/test_plans.py's registered-fleet sweep.
    q_graph_components is excluded like q_dedup_clusters there: its
    CC kernel materializes labels eagerly at build time."""

    def children(n):
        cs = n.children()
        return [cs.apply(i) for i in range(cs.size())]

    bounding = {
        "Aggregate", "GlobalLimit", "LocalLimit", "Deduplicate",
        "OneRowRelation", "LocalRelation",
    }

    def bounded(n):
        if n.getClass().getSimpleName() in bounding:
            return True
        cs = children(n)
        if not cs:
            return False
        return all(bounded(c) for c in cs)

    bad = {}
    for name, (fn, _) in sorted(STAGED.items()):
        if name == "q_graph_components":
            continue
        plan = fn(spark, sf_dir)._jdf.queryExecution().optimizedPlan()
        count = [0]

        def walk(n):
            if (
                n.getClass().getSimpleName() == "Window"
                and n.partitionSpec().isEmpty()
                and not bounded(children(n)[0])
            ):
                count[0] += 1
            for c in children(n):
                walk(c)

        walk(plan)
        if count[0]:
            bad[name] = count[0]
    assert not bad, f"staged queries with unbounded global windows: {bad}"


@pytest.fixture(scope="module")
def duck_sf001():
    import duckdb

    from polybot_data_etl_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.01/{t}.parquet')"
        )
    yield con


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_query_matches_oracle_at_gate_scale(spark, duck_sf001, name):
    """Same differential, at the DRIVER'S gate scale (sf0.01) — the
    scale the t2 gate will actually run these at after the round-10
    registration flip.  Catches scale-dependent divergence (empty
    groups, tie structure, recursion depth) that sf0.001 can mask."""
    fn, oracle = STAGED[name]
    sdf = fn(spark, "/root/testdata/sf0.01").toPandas()
    ddf = duck_sf001.execute(oracle).df()
    s_rows, s_cols, s_hash, s_sample = canon_frame(sdf)
    d_rows, d_cols, d_hash, d_sample = canon_frame(ddf)
    assert (s_rows, s_cols) == (d_rows, d_cols), (name, s_rows, d_rows)
    assert s_rows > 0
    assert s_hash == d_hash, (
        f"{name} @sf0.01: hash mismatch\nspark  {s_sample}\nduckdb {d_sample}"
    )
