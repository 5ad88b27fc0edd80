"""Wide<->long reshaping (reference F17 melt ``python.py:129`` and F18
pivot_table ``python.py:159-161``)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def melt(
    df: DataFrame,
    id_vars: Sequence[str],
    value_vars: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide -> long. Numeric value columns are cast to double first so
    the unified value column has one type (pandas melt coerces to
    object/float the same way). Runs as a generator expression
    (UNPIVOT), one pass, no shuffle.
    """
    # names are backtick-escaped throughout: melted columns are often
    # compound ("a.b.2014") and must not resolve as struct paths
    casted = df.select(
        *[F.col(f"`{c}`") for c in id_vars],
        *[F.col(f"`{c}`").cast("double").alias(c) for c in value_vars],
    )
    return casted.unpivot(
        ids=[F.col(f"`{c}`") for c in id_vars],
        values=[F.col(f"`{c}`") for c in value_vars],
        variableColumnName=var_name,
        valueColumnName=value_name,
    )


def pivot_wide(
    df: DataFrame,
    index: Sequence[str],
    pivot_col: str,
    value_col: str,
    values: Sequence[str],
    agg: str = "first",
    fill: object | None = None,
) -> DataFrame:
    """Long -> wide (pandas ``pivot_table(index, columns, aggfunc)``)
    with an explicit ``values`` list: pinning the pivoted values keeps
    the output schema static (no extra distinct-scan job, required for
    a deterministic driver-checkable schema) and lets a single shuffle
    produce all columns.

    ``agg='first'`` mirrors the reference's ``aggfunc='first'``
    (``python.py:159-161``); note Spark's first() is
    nondeterministic under parallel input order, so use 'min'/'max'
    when stable output matters.
    """
    agg_col = getattr(F, agg)(value_col)
    out = df.groupBy(*index).pivot(pivot_col, list(values)).agg(agg_col)
    if fill is not None:
        out = out.select(
            *index, *[F.coalesce(F.col(f"`{v}`"), F.lit(fill)).alias(v) for v in values]
        )
    return out
