"""Time-series join operators: as-of join and band/range join.

Extensions beyond the reference's own surface (SURVEY §7 "explicitly
absent" list) — added because a training-data / event-analytics
pipeline needs them constantly and Spark has no native ASOF JOIN.

Scale notes (the whole point of the design):

- ``asof_join`` uses the *union + running last(ignorenulls)* plan — ONE
  shuffle of (left ∪ right) on the key columns, a per-key sorted window
  pass, zero range-join row explosion. The naive alternatives either
  explode (inequality theta-join → BroadcastNestedLoop / cartesian per
  key) or single-thread (global sort). This formulation scales exactly
  like any other keyed window: keys spread across executors, AQE
  handles skewed keys.
- ``band_range_join`` broadcasts the (tiny, by contract) band table and
  lets Catalyst pick BroadcastNestedLoopJoin; with B bands each fact
  row matches exactly one band, so the output is |fact| rows — no
  explosion. For band tables too big to broadcast, band the fact side
  with a computed bucket column and equi-join instead.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_RTS = "__asof_right_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    payload: Sequence[str],
    matched_ts_col: str = "matched_ts",
    direction: str = "backward",
) -> DataFrame:
    """As-of (left) join: for every left row, attach ``payload`` columns
    from the matching right row within the same ``on`` key group —
    ``direction="backward"`` (default) matches the greatest right
    ``ts_col`` <= left ts (DuckDB ``ASOF LEFT JOIN ... l.ts >= r.ts``),
    ``direction="forward"`` the smallest right ts >= left ts (the
    next-quote-after-trade / next-event-after-signal shape, DuckDB
    ``l.ts <= r.ts``); both inclusive, nulls when no such row exists.

    Requirements: ``payload`` names must not collide with left columns;
    both inputs carry ``on`` + ``ts_col``.

    Plan: tag sides, union, one window per key ordered by (ts, side)
    with right rows sorting toward the left row at equal ts (inclusive
    match), then ``last(payload, ignorenulls=True)`` over the preceding
    frame (backward) or ``first`` over the following frame (forward),
    then keep left rows. One shuffle on the key either way — never a
    range-join explosion.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(f"payload columns collide with left columns: {sorted(overlap)}")

    left_extra = [c for c in left.columns if c not in on and c != ts_col]
    tagged_left = left.select(
        *on,
        F.col(ts_col),
        *[F.col(c) for c in left_extra],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload],
        F.lit(None).cast(right.schema[ts_col].dataType).alias(_RTS),
        F.lit(1).alias(_SIDE),
    )
    # side ordering puts the right rows on the matchable side of the
    # left row at equal ts (before it for backward, after for forward)
    right_side = 0 if direction == "backward" else 2
    tagged_right = right.select(
        *on,
        F.col(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_extra],
        *[F.col(c) for c in payload],
        F.col(ts_col).alias(_RTS),
        F.lit(right_side).alias(_SIDE),
    )
    unioned = tagged_left.unionByName(tagged_right)

    base = Window.partitionBy(*on).orderBy(ts_col, _SIDE)
    if direction == "backward":
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = F.last
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = F.first
    filled = unioned.select(
        *on,
        F.col(ts_col),
        *[F.col(c) for c in left_extra],
        *[pick(c, ignorenulls=True).over(w).alias(c) for c in payload],
        pick(_RTS, ignorenulls=True).over(w).alias(matched_ts_col),
        F.col(_SIDE),
    )
    return filled.filter(F.col(_SIDE) == 1).drop(_SIDE)


def band_range_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "inner",
) -> DataFrame:
    """Range (band) join: attach the band row whose [lo, hi) interval
    contains ``fact.value_col``; a NULL ``hi`` means unbounded above.
    The band table is broadcast (tiny by contract) so the fact side
    never shuffles or explodes — each fact row matches at most one band
    when bands are disjoint.
    """
    cond = (F.col(value_col) >= bands[lo_col]) & (
        bands[hi_col].isNull() | (F.col(value_col) < bands[hi_col])
    )
    return fact.join(F.broadcast(bands), cond, how)


def salted_skew_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    salt_expr: Column,
    buckets: int = 32,
) -> DataFrame:
    """Skew-safe equi-join: salt the (skewed) fact side with a
    deterministic per-row bucket, replicate each dim row across all
    ``buckets`` salt values, and join on (keys, salt). A hot key that
    would land 100% of its rows on one reducer instead fans out over
    ``buckets`` reducers; the dim side grows only |dim| x buckets rows.

    This is the classic salting pattern for when the dim is too big to
    broadcast but small enough to replicate, or when AQE skew-join
    splitting is unavailable (it only fires on sort-merge joins past
    size thresholds). ``shuffle_hash`` is hinted so the demonstration
    actually exercises the salted shuffle instead of collapsing to a
    broadcast. ``salt_expr`` must be deterministic (hash a row id, not
    rand()) so retried tasks produce identical output.
    """
    on = list(on)
    salted_fact = fact.withColumn("__salt", F.pmod(salt_expr, F.lit(buckets)))
    replicated = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    joined = salted_fact.join(replicated.hint("shuffle_hash"), [*on, "__salt"])
    return joined.drop("__salt")


def salted_two_phase_agg(
    df: DataFrame,
    group_by: Sequence[str],
    partials: dict[str, tuple[Column, "Callable[[Column], Column]"]],
    salt_expr: Column,
    buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation with explicit salting for skewed group
    keys. ``partials`` maps output name -> (phase1 aggregate over raw
    rows, phase2 re-aggregate over the partial column of the same
    name). Phase 1 groups by (keys, salt) — skewed keys fan out over
    ``buckets`` reducers; phase 2 groups the tiny partial table by the
    keys alone.

    With AQE skew handling on, plain groupBy already does map-side
    partial aggregation and this is rarely needed; it exists for the
    pathological case (one key ≫ everything, e.g. the empty-string
    canonical key at 100 TB) and as the documented salting pattern.
    Algebraic aggregates only (SUM/COUNT/MIN/MAX — not exact medians).
    """
    group_by = list(group_by)
    salted = df.withColumn("__salt", F.pmod(salt_expr, F.lit(buckets)))
    phase1 = salted.groupBy(*group_by, "__salt").agg(
        *[expr.alias(name) for name, (expr, _) in partials.items()]
    )
    return phase1.groupBy(*group_by).agg(
        *[re_agg(F.col(name)).alias(name) for name, (_, re_agg) in partials.items()]
    )
