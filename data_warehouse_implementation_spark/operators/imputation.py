"""Null-imputation operators (reference ``python.py:66-111,170-181``).

Every strategy is a distributed window/join formulation — the pandas
originals are per-group Python loops; these shuffle once on the group
key and stay JVM-side except where noted.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
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


# Mixing constants for the portable draw (classic LCG multiplier over a
# Mersenne-prime modulus): expressible identically in any SQL engine, so
# DuckDB oracles can replay fills bit-for-bit.
_HASH_P = 2_147_483_647  # 2^31 - 1
_HASH_A = 1_103_515_245
_HASH_B = 12_345


def sample_draw(id_col: Column | str, seed: int, n: int | Column) -> Column:
    """Deterministic pseudo-uniform draw in [0, n) keyed on a stable row
    id: ``((id % P) * A + B + seed) % P % n``. Plain int64 arithmetic —
    no engine-specific hash — so oracle SQL can reproduce it exactly.
    (The id is reduced mod P first so the product stays within int64.)"""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    n_col = F.lit(n) if isinstance(n, int) else n
    return ((c % _HASH_P) * _HASH_A + _HASH_B + seed) % _HASH_P % n_col


def random_sample_fill(
    df: DataFrame, cols: Sequence[str], id_col: str, seed: int = 42
) -> DataFrame:
    """Fill NULLs in each column by sampling from that column's own
    non-null empirical distribution (reference F16, ``python.py:73-84``
    — there unseeded; here deterministic given (id_col, seed)).

    Distributed formulation — inverse-CDF over the value-frequency
    table: build (value, count, cumulative offset) for the non-null pool
    (one parallel groupBy + a window over #distinct values), then map
    each null row's draw in [0, pool size) onto its value via a
    broadcast range join. No row-level pool indexing, no global window
    over data rows — at 100 TB the only sequential structure is the
    distinct-value frequency table. For continuous high-cardinality
    columns, bin values first (the frequency table is the histogram).

    ``id_col`` is required: fills are a pure function of (id, seed),
    reproducible across runs, partitionings, and engines (the round-1
    ``monotonically_increasing_id`` fallback was neither).
    """
    out = df
    for i, c in enumerate(cols):
        freq = (
            out.filter(F.col(c).isNotNull())
            .groupBy(F.col(c).alias("_pool_value"))
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        # cumulative offsets over the (small) distinct-value table
        w = Window.orderBy("_pool_value").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        freq = freq.withColumn("_off", F.sum("_n").over(w) - F.col("_n"))
        # pool size stays a lazy broadcast scalar — no eager collect()
        # per column, so the whole multi-column fill is a single job.
        # Empty pool => empty broadcast side => draw/fill stay NULL,
        # which is the only possible semantics anyway.
        totals = freq.agg(F.sum("_n").alias("_t"))
        draw = F.when(
            F.col(c).isNull(), sample_draw(id_col, seed + i, F.col("_t"))
        ).otherwise(F.lit(-1))
        out = (
            out.crossJoin(F.broadcast(totals))
            .withColumn("_draw", draw)
            .join(
                F.broadcast(freq),
                on=(F.col("_draw") >= F.col("_off"))
                & (F.col("_draw") < F.col("_off") + F.col("_n")),
                how="left",
            )
            .withColumn(c, F.coalesce(F.col(c), F.col("_pool_value")))
            .drop("_draw", "_pool_value", "_n", "_off", "_t")
        )
    return out
