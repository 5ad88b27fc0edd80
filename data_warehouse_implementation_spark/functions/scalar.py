"""Scalar / column-level helpers.

These re-express the reference's scalar-function surface (SURVEY.md §2.8)
as composable Column functions. All of them stay JVM-side (built-in
``pyspark.sql.functions`` only) so they participate in whole-stage
codegen — no Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def canonicalize_nulls(col: Column | str, sentinel: str = "") -> Column:
    """NULL -> '' canonicalization (reference F4: ``COALESCE(c, '')``,
    ``inserting-data.sql:62,76-79,...``).

    The reference uses this before every dedup/join/load, which
    deliberately conflates NULL and '' — we preserve that semantic
    exactly (it changes join cardinality vs eqNullSafe when both '' and
    NULL occur).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(sentinel))


def yes_no_to_int(col: Column | str) -> Column:
    """'Yes'/'No' -> 1/0, anything else NULL (reference F11,
    ``python.py:103-106``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == "Yes", F.lit(1)).when(c == "No", F.lit(0)).cast("int")


def ratio(numerator: Column, denominator: Column) -> Column:
    """Double-division ratio (reference F5 casts the numerator to DECIMAL
    before ``/``; we use double division — deterministic for
    integer-valued counts, oracle-compatible)."""
    return numerator.cast("double") / denominator.cast("double")


def flag_ratio(flag_col: Column | str) -> Column:
    """Share of rows where a 0/1 flag is set: ``count_if(c=1)/count(*)``
    as an aggregate expression (reference A2/A3 + F5)."""
    c = F.col(flag_col) if isinstance(flag_col, str) else flag_col
    return ratio(F.count(F.when(c == 1, F.lit(1))), F.count(F.lit(1)))


def null_safe_ne(a: Column | str, b: Column | str) -> Column:
    """``a IS DISTINCT FROM b`` (reference F10, ``creating-tables.sql:258``
    — SCD3 change detection)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return ~ca.eqNullSafe(cb)


def date_parts(col: Column | str, prefix: str = "") -> list[Column]:
    """year/month/day decomposition used by expression joins to the date
    dimension (reference F1/J3, ``inserting-data.sql:164-169``)."""
    c = F.col(col) if isinstance(col, str) else col
    return [
        F.year(c).alias(f"{prefix}year"),
        F.month(c).alias(f"{prefix}month"),
        F.dayofmonth(c).alias(f"{prefix}day"),
    ]


def with_date_parts(df: DataFrame, col: str, prefix: str = "") -> DataFrame:
    """Attach year/month/day columns derived from ``col``."""
    c = F.col(col)
    return (
        df.withColumn(f"{prefix}year", F.year(c))
        .withColumn(f"{prefix}month", F.month(c))
        .withColumn(f"{prefix}day", F.dayofmonth(c))
    )


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton (Z-order) interleave of up to 4 non-negative int columns:
    bit i of column j lands at position ``i * len(cols) + j`` of the
    key. Sorting by this key clusters rows so that EVERY participating
    column's values are locally contiguous — the multi-column
    data-skipping layout (Delta's OPTIMIZE ZORDER) that a single-column
    sort cannot give: parquet min/max row-group stats become selective
    for predicates on ANY of the columns, not just the first sort key.

    Values are first rank-compressed by the caller if they exceed
    ``bits`` bits (here they are masked). Pure int64 bit algebra —
    works in any engine, no UDF.

    ``bits`` is the per-column budget and is lowered automatically so
    the interleaved key fits in 62 bits (e.g. 4 columns at the default
    16 → 15 effective bits each); pass a smaller ``bits`` explicitly to
    keep more headroom."""
    n = len(cols)
    assert 1 <= n <= 4
    bits = min(bits, 62 // n)
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    key = F.lit(0).cast("long")
    for j, c in enumerate(cs):
        v = c.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for i in range(bits):
            key = key.bitwiseOR(
                v.bitwiseAND(F.lit(1 << i)).cast("long")
                * F.lit(1 << (i * (n - 1) + j))
            )
    return key


def isqrt(col: Column | str) -> Column:
    """EXACT integer square root ``floor(sqrt(n))`` for non-negative
    int64 ``n`` — the building block that lets α=0.5 "temperature"
    weights (``corpus.mix_sources_temperature``) stay inside the
    engine's exact-arithmetic oracle discipline.

    ``sqrt`` on IEEE doubles is correctly rounded, so
    ``floor(sqrt(double(n)))`` is within ±1 of the true isqrt for any
    ``n`` below 2^52 (token totals are far below that); one CASE pass
    snaps it exactly: bump up while ``(r+1)² <= n``, bump down while
    ``r² > n``. Identical expression replays bit-for-bit in DuckDB
    (see ``ISQRT_SQL``) — no library isqrt needed on either side."""
    c = (F.col(col) if isinstance(col, str) else col).cast("long")
    r0 = F.floor(F.sqrt(c.cast("double"))).cast("long")
    return (
        F.when((r0 + 1) * (r0 + 1) <= c, r0 + 1)
        .when(r0 * r0 > c, r0 - 1)
        .otherwise(r0)
    )


def isqrt_sql(expr: str) -> str:
    """The DuckDB replay of :func:`isqrt` over SQL expression ``expr``
    (oracles interpolate this so both engines run the SAME snap)."""
    r0 = f"CAST(FLOOR(SQRT(CAST(({expr}) AS DOUBLE))) AS BIGINT)"
    return (
        f"(CASE WHEN ({r0} + 1) * ({r0} + 1) <= ({expr}) THEN {r0} + 1 "
        f"WHEN {r0} * {r0} > ({expr}) THEN {r0} - 1 ELSE {r0} END)"
    )


def zorder_key_sql(exprs: list[str], bits: int = 16) -> str:
    """The DuckDB replay of :func:`zorder_key` — the same mask/
    interleave bit algebra emitted as a SQL expression, so layout
    oracles cluster by the IDENTICAL Morton key."""
    n = len(exprs)
    assert 1 <= n <= 4
    bits = min(bits, 62 // n)
    mask = (1 << bits) - 1
    terms = []
    for j, e in enumerate(exprs):
        v = f"(CAST(({e}) AS BIGINT) & {mask})"
        for i in range(bits):
            terms.append(f"(({v} & {1 << i}) * {1 << (i * (n - 1) + j)})")
    return "(" + " | ".join(terms) + ")"
