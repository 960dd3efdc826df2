"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the polybot_data_etl_spark package
(operator inventory: SURVEY.md §2).
"""

from __future__ import annotations

import os
import sys

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from polybot_data_etl_spark.plans import entrypoints as _ep


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped) on /root/testdata/sf0.001."""
    return _ep.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ep.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each hash-checked query."""
    return _ep.oracle_sql()
