"""Driver-facing entry points consumed by /root/repo/__spark_entry__.py.

`entry` runs the flagship query (TPC-H-Q1-shaped q_agg_q1, SURVEY.md §7
M0) at sf0.001; `queries`/`oracle_sql` expose the full registered
surface (SURVEY.md §2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from polybot_data_etl_spark import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on the smoke fixtures; driver checks rows > 0."""
    return registry.queries()["q_agg_q1"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracles()
