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

    assert len(STAGED) == 15
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
