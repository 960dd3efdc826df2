from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polybot_data_etl_spark.catalog import TABLES, check_fixture_layouts
from polybot_data_etl_spark.session import build_session

SF_DIR = "/root/testdata/sf0.001"

# Fail the whole run immediately, with the drifted column named, if the
# driver regenerated fixtures into a layout the loaders don't handle
# (round-2 lesson: events.ts moved ns→µs and cost 42 opaque failures).
check_fixture_layouts(SF_DIR)


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="polyspark-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
