"""Null-imputation operators (reference ``python.py:66-111,170-181``).

Every strategy is a distributed window/join formulation — the pandas
originals are per-group Python loops; these shuffle once on the group
key and stay JVM-side except where noted.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_median_fill(df: DataFrame, group_by: Sequence[str], cols: Sequence[str]) -> DataFrame:
    """Fill numeric NULLs with the per-group median (reference A9,
    ``python.py:170-174``). ``F.median`` over a group window = exact
    median (interpolated for even counts), matching pandas/DuckDB."""
    w = Window.partitionBy(*group_by)
    out = df
    for c in cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.median(c).over(w)))
    return out


def deterministic_group_mode(
    df: DataFrame, group_by: Sequence[str], col: str, mode_col: str = "mode_value"
) -> DataFrame:
    """Per-group mode with pandas' tie-break: most frequent value,
    smallest value first on ties (``x.mode().iloc[0]``, ``python.py:179``
    — pandas mode() sorts, so .iloc[0] is the smallest).

    Formulated as count-then-rank (groupBy + row_number) instead of
    ``F.mode`` because Spark's mode() breaks ties arbitrarily —
    nondeterminism the reference's semantics don't allow.
    """
    counts = df.filter(F.col(col).isNotNull()).groupBy(*group_by, col).agg(
        F.count(F.lit(1)).alias("_n")
    )
    w = Window.partitionBy(*group_by).orderBy(F.desc("_n"), F.asc(col))
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*group_by, F.col(col).alias(mode_col))
    )


def group_mode_fill(df: DataFrame, group_by: Sequence[str], cols: Sequence[str]) -> DataFrame:
    """Fill string NULLs with the per-group deterministic mode
    (reference A10, ``python.py:177-181``)."""
    out = df
    for c in cols:
        modes = deterministic_group_mode(df, group_by, c, mode_col=f"_mode_{c}")
        out = out.join(modes, on=list(group_by), how="left").withColumn(
            c, F.coalesce(F.col(c), F.col(f"_mode_{c}"))
        ).drop(f"_mode_{c}")
    return out


def random_sample_fill(
    df: DataFrame, cols: Sequence[str], seed: int = 42, id_col: str | None = None
) -> DataFrame:
    """Fill NULLs in each column by sampling from that column's own
    non-null empirical distribution (reference F16, ``python.py:73-84``
    — there unseeded; here seeded for reproducibility).

    Distributed formulation: for each target column, pair every null
    row with a uniformly-chosen member of the non-null value pool via
    a modulo join on a seeded hash — two small shuffles, no driver
    collect of data rows (only the pool *size* is collected).
    """
    out = df
    for i, c in enumerate(cols):
        pool = (
            df.filter(F.col(c).isNotNull())
            .select(F.col(c).alias("_pool_value"))
            .withColumn(
                "_pool_idx",
                F.row_number().over(Window.orderBy("_pool_value")).cast("long") - 1,
            )
        )
        n = pool.count()
        if n == 0:
            continue
        key = F.coalesce(F.col(id_col), F.lit(0)) if id_col else F.monotonically_increasing_id()
        out = (
            out.withColumn(
                "_draw",
                F.pmod(F.xxhash64(key.cast("string"), F.lit(seed + i)), F.lit(n)),
            )
            .join(
                pool,
                on=F.when(F.col(c).isNull(), F.col("_draw")).otherwise(F.lit(-1))
                == F.col("_pool_idx"),
                how="left",
            )
            .withColumn(c, F.coalesce(F.col(c), F.col("_pool_value")))
            .drop("_draw", "_pool_idx", "_pool_value")
        )
    return out
