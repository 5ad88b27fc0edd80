"""Calendar / date-dimension generation (reference F3:
``generate_series('2000-01-01','2050-12-31', interval '1 day')``,
``inserting-data.sql:43,56``).

Generated JVM-side via ``sequence`` + ``explode`` — a few thousand rows
of calendar never touch Python and broadcast for free in joins.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def date_range(spark: SparkSession, start: str | dt.date, end: str | dt.date) -> DataFrame:
    """One row per day in [start, end] with a single ``date`` column."""
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"),
                F.lit(end).cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("date")
    )


def build_calendar(spark: SparkSession, start: str, end: str) -> DataFrame:
    """Date dimension with decomposed attributes (reference
    ``date_dimension``: date_id/year/month/day, ``creating-tables.sql:43-48``
    + population at ``inserting-data.sql:38-44``).

    ``date_id`` is a deterministic yyyymmdd int — unlike the reference's
    SERIAL it is stable across runs and parallelism (SURVEY §4 note 3).
    """
    d = date_range(spark, start, end)
    return d.select(
        (F.year("date") * 10000 + F.month("date") * 100 + F.dayofmonth("date"))
        .cast("long")
        .alias("date_id"),
        F.col("date"),
        F.year("date").cast("long").alias("year"),
        F.month("date").cast("long").alias("month"),
        F.dayofmonth("date").cast("long").alias("day"),
        F.quarter("date").cast("long").alias("quarter"),
        F.dayofweek("date").isin(1, 7).alias("is_weekend"),
    )


def build_year_dim(spark: SparkSession, start_year: int, end_year: int) -> DataFrame:
    """Year dimension (reference ``year_dimension``,
    ``creating-tables.sql:58-61`` populated ``inserting-data.sql:53-57``)."""
    return spark.range(start_year, end_year + 1).select(F.col("id").cast("long").alias("year"))
