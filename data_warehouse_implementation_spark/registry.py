"""Query registry — the single source of truth wiring every implemented
operator to (a) its PySpark implementation and (b) its DuckDB oracle SQL.

``__spark_entry__.py`` re-exports this for the driver's correctness
gate. Every analytic capability from SURVEY.md §2 lands here as it is
implemented; keys are stable operator names.

Contract notes (driver compares row-count + schema + order-insensitive
value hash at sf0.01, columns sorted by name):
- every computed column is aliased identically in Spark and SQL;
- counts/ranks are BIGINT on both sides;
- ratios are double divisions of integer counts (bit-identical across
  engines); sums of double measures are rounded via a decimal cast so
  they are order-independent.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .plans import analytics
from .session import load_tables

SparkQuery = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, SparkQuery] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: Callable[[dict[str, DataFrame]], DataFrame], oracle: str | None) -> None:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(load_tables(spark, sf_dir))

    _QUERIES[name] = run
    if oracle is not None:
        _ORACLES[name] = oracle


def queries() -> dict[str, SparkQuery]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


# ---------------------------------------------------------------------------
# Flagship (SURVEY §7 step 1): Q1a analog — star join, conditional agg,
# HAVING, double RANK, rank filter.
register("timely_rank_report", analytics.timely_rank_report, analytics.TIMELY_RANK_ORACLE)
