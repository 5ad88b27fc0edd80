"""Declared-constraint validation (reference DDL constraints,
``creating-tables.sql`` PRIMARY KEY / NOT NULL / FK declarations).

PostgreSQL enforces constraints per row at write time; Spark has no
enforced constraints, so (per SURVEY §1.3) they become a batch GATE:
declare the same constraints, run one validation job after each load,
and fail the pipeline on violations instead of admitting them. Each
check is a plain aggregate or anti-join — batch-sized work, no
row-at-a-time anything; a global aggregate always yields exactly one
report row, so the gate is total even on empty tables.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _report(agg: DataFrame, constraint: str, detail: str | None) -> DataFrame:
    return agg.select(
        F.lit(constraint).alias("constraint_name"),
        F.lit(detail).cast("string").alias("detail"),
        F.col("n_violations").cast("long").alias("n_violations"),
    )


def not_null(df: DataFrame, col: str) -> DataFrame:
    """NULL count under a NOT NULL declaration."""
    agg = df.agg(F.count(F.when(F.col(col).isNull(), 1)).alias("n_violations"))
    return _report(agg, f"not_null({col})", None)


def unique_key(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Surplus rows under a PRIMARY KEY / UNIQUE declaration (each key
    tuple may appear once; n-1 violations for an n-fold duplicate)."""
    agg = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .agg(F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).alias("n_violations"))
    )
    return _report(agg, f"unique({', '.join(cols)})", None)


def foreign_key(
    df: DataFrame, cols: Sequence[str], ref: DataFrame, ref_cols: Sequence[str]
) -> DataFrame:
    """Orphan child rows under an FK declaration — a left-anti join of
    the non-null child keys against the distinct parent keys."""
    child = df.select(*cols).na.drop()
    parent = ref.select(
        *[F.col(r).alias(c) for c, r in zip(cols, ref_cols)]
    ).distinct()
    agg = child.join(parent, on=list(cols), how="left_anti").agg(
        F.count(F.lit(1)).alias("n_violations")
    )
    return _report(agg, f"fk({', '.join(cols)})", None)


def check(df: DataFrame, name: str, predicate: str) -> DataFrame:
    """Rows failing a CHECK predicate (NULL predicate counts as a
    failure, like SQL CHECK treats unknown on the admission side we
    gate for)."""
    agg = df.agg(
        F.count(F.when(~F.coalesce(F.expr(predicate), F.lit(False)), 1)).alias(
            "n_violations"
        )
    )
    return _report(agg, f"check({name})", predicate)


def validate(checks: Sequence[DataFrame]) -> DataFrame:
    """Union the per-constraint reports into one gate table
    (constraint_name, detail, n_violations) — a load passes iff every
    n_violations is 0."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
