"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real wiring lives in ``data_warehouse_implementation_spark.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_warehouse_implementation_spark import registry
from data_warehouse_implementation_spark.session import load_tables


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q1a analog: star join -> conditional-agg ratio ->
    HAVING gate -> double RANK -> top-k filter) on sf0.001."""
    return registry.queries()["timely_rank_report"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each (SQL-expressible) query."""
    return registry.oracle_sql()
