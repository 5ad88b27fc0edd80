"""Slowly-changing-dimension batch algebra (SURVEY.md §2.9 M1-M7).

The reference implements mutation semantics with PostgreSQL per-row
machinery: ``ON CONFLICT`` clauses (``inserting-data.sql:29-30,44,57,
64-65,81-86,104``) and BEFORE-INSERT triggers (``creating-tables.sql:
223-239`` SCD2, ``248-270`` SCD3, ``196-216`` delete guard). Spark is
immutable, so each mutation becomes a *set-based transformation* that
maps (current table state, incoming batch) -> next table state. The
per-row trigger semantics are order-dependent; every function here takes
an explicit ``order_col`` that replays the reference's insertion order
deterministically, and an injectable ``as_of`` date standing in for the
triggers' ``current_date`` (F8) so results are reproducible in tests.

Replicated quirks (verified against the reference SQL, not idealized):

- **SCD2 re-close** (``creating-tables.sql:227-229``): the close-out
  UPDATE has no ``active = true`` guard, so *every* existing row for an
  incoming key — including already-closed history rows — gets
  ``end_date = as_of, active = false``.
- **SCD2 within-batch last-row-wins** (trigger fires per row): a batch
  with duplicate keys leaves only the *last* row per key active; earlier
  batch rows survive as degenerate closed rows with
  ``start_date = end_date = as_of``.
- **SCD3 intended semantics** (``creating-tables.sql:253-258``): the
  trigger compares ``OLD.consumer_consent`` — but ``OLD`` is undefined
  in an INSERT trigger, so the reference as written would error at
  runtime. We implement the unambiguous intent: null-safe comparison of
  the *stored* row's tracked value against the incoming one
  (``IS DISTINCT FROM``, F10).
- **SCD3 insert-discard** (``inserting-data.sql:94-104``): an incoming
  row for an existing key only updates the tracked/old/effective
  columns; its other attributes are discarded by ``ON CONFLICT DO
  NOTHING``.

Scale notes: every function is one or two hash shuffles on the natural
key — window functions partition by the key (parallel across keys, never
a global window) and the existing-vs-incoming matching is an equi-join
Catalyst can broadcast when the batch is small (the common case:
incremental batches joining a large dimension).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import null_safe_ne

SCD2_SENTINEL = "2099-12-31"  # open-ended end_date (``inserting-data.sql:117``, F9)


def _key_marker(incoming: DataFrame, keys: Sequence[str]) -> DataFrame:
    return incoming.select(*keys).distinct().withColumn("_hit", F.lit(True))


def scd1_upsert(
    existing: DataFrame,
    incoming: DataFrame,
    keys: Sequence[str],
    order_col: str,
) -> DataFrame:
    """SCD Type 1 upsert (M1): ``ON CONFLICT ... DO UPDATE`` — the
    incoming row overwrites any existing row with the same natural key
    (``inserting-data.sql:29-30,64-65,81-86``). Within a batch the
    conflict fires per row, so the *last* row per key (by ``order_col``)
    wins. ``incoming`` must share ``existing``'s schema minus
    ``order_col``.
    """
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col))
    last = (
        incoming.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", order_col)
    )
    kept = existing.join(incoming.select(*keys).distinct(), on=list(keys), how="left_anti")
    return kept.unionByName(last)


def insert_if_absent(
    existing: DataFrame,
    incoming: DataFrame,
    keys: Sequence[str],
    order_col: str,
) -> DataFrame:
    """M2: ``ON CONFLICT DO NOTHING`` — keep the existing row, discard
    the incoming one (``inserting-data.sql:44,57,104``). Within a batch
    the *first* row per key inserts; later duplicates are dropped.
    """
    w = Window.partitionBy(*keys).orderBy(F.asc(order_col))
    first = (
        incoming.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", order_col)
    )
    fresh = first.join(existing.select(*keys).distinct(), on=list(keys), how="left_anti")
    return existing.unionByName(fresh)


def scd2_apply(
    dim: DataFrame,
    incoming: DataFrame,
    keys: Sequence[str],
    as_of: str,
    order_col: str,
    start_col: str = "start_date",
    end_col: str = "end_date",
    active_col: str = "active",
    sentinel: str = SCD2_SENTINEL,
) -> DataFrame:
    """SCD Type 2 (M3): replay of the reference's BEFORE-INSERT trigger
    (``creating-tables.sql:223-239``) + versioned insert
    (``inserting-data.sql:111-118``) as batch algebra.

    ``dim`` carries ``start_col``/``end_col`` (DateType) and
    ``active_col``; ``incoming`` carries the key + attribute columns
    plus ``order_col`` (insertion order). Result state:

    - existing rows whose key appears in the batch: ``end = as_of``,
      ``active = false`` (including already-closed rows — see module
      docstring on the re-close quirk);
    - per key, the last batch row: ``[as_of, sentinel)``, active;
    - earlier batch rows: degenerate closed versions ``[as_of, as_of]``.
    """
    as_of_d = F.lit(as_of).cast("date")
    marker = _key_marker(incoming, keys)
    closed = (
        dim.join(marker, on=list(keys), how="left")
        .withColumn(
            end_col, F.when(F.col("_hit"), as_of_d).otherwise(F.col(end_col))
        )
        .withColumn(
            active_col,
            F.when(F.col("_hit"), F.lit(False)).otherwise(F.col(active_col)),
        )
        .drop("_hit")
    )
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col))
    versions = (
        incoming.withColumn("_rn", F.row_number().over(w))
        .withColumn(start_col, as_of_d)
        .withColumn(
            end_col,
            F.when(F.col("_rn") == 1, F.lit(sentinel).cast("date")).otherwise(as_of_d),
        )
        .withColumn(active_col, F.col("_rn") == 1)
        .drop("_rn", order_col)
    )
    return closed.unionByName(versions)


def scd3_apply(
    dim: DataFrame,
    incoming: DataFrame,
    keys: Sequence[str],
    tracked_col: str,
    as_of: str,
    order_col: str,
    old_col: str | None = None,
    effective_col: str = "effective_date",
    fresh_old: str | None = "",
) -> DataFrame:
    """SCD Type 3 (M4): replay of the reference's change-tracking trigger
    (``creating-tables.sql:248-270``) interplaying with ``ON CONFLICT DO
    NOTHING`` (``inserting-data.sql:94-104``).

    Sequential semantics being replayed, per natural key:

    - key already in ``dim``: each incoming row whose ``tracked_col``
      differs null-safely from the *current stored* value updates the
      stored row (``old <- stored``, ``tracked <- incoming``,
      ``effective <- as_of``); the incoming row itself is discarded, so
      non-tracked attributes never change.
    - fresh key: the first batch row inserts (``old = fresh_old``,
      ``effective = as_of``, per ``inserting-data.sql:101-102``);
      subsequent duplicate-key rows behave like updates against it.

    Batch formulation: build each key's value sequence (stored value at
    position 0, then incoming rows by ``order_col``), drop null-safe
    consecutive duplicates, and read the final state off the last two
    surviving values — equivalent to row-at-a-time replay but one
    key-partitioned window pipeline.
    """
    old_col = old_col or f"{tracked_col}_old"
    as_of_d = F.lit(as_of).cast("date")
    keys = list(keys)

    w_in = Window.partitionBy(*keys).orderBy(F.asc(order_col))
    inc = incoming.withColumn("_pos", F.row_number().over(w_in))

    seq = dim.select(*keys, F.lit(0).alias("_pos"), F.col(tracked_col).alias("_val")).unionByName(
        inc.select(*keys, "_pos", F.col(tracked_col).alias("_val"))
    )
    w_seq = Window.partitionBy(*keys).orderBy("_pos")
    seq = (
        seq.withColumn("_lag", F.lag("_val").over(w_seq))
        .withColumn("_minpos", F.min("_pos").over(Window.partitionBy(*keys)))
        # keep the base state + every null-safe change point (F10:
        # IS DISTINCT FROM, ``creating-tables.sql:258``)
        .filter(
            (F.col("_pos") == F.col("_minpos"))
            | null_safe_ne(F.col("_val"), F.col("_lag"))
        )
    )
    w_kept = Window.partitionBy(*keys).orderBy("_pos")
    last = (
        seq.withColumn("_prev", F.lag("_val").over(w_kept))
        .withColumn("_rnd", F.row_number().over(Window.partitionBy(*keys).orderBy(F.desc("_pos"))))
        .filter(F.col("_rnd") == 1)
        .select(
            *keys,
            F.col("_val").alias("_final"),
            F.col("_prev").alias("_prev"),
            (F.col("_pos") > F.col("_minpos")).alias("_changed"),
        )
    )

    # Base rows: the stored row for existing keys; the first batch row for
    # fresh keys (later duplicates only ever update, never insert).
    fresh_base = (
        inc.filter(F.col("_pos") == 1)
        .drop("_pos", order_col)
        .join(dim.select(*keys).distinct(), on=keys, how="left_anti")
        # fresh_old=None means "no prior value": a TYPED null (the
        # tracked column's own type), so a non-string tracked column
        # never unions a string sentinel into the old column (ADVICE
        # r9 — with the bare F.lit(None) the column would be NullType
        # and drift the union schema just the same)
        .withColumn(
            old_col,
            F.lit(fresh_old).cast(incoming.schema[tracked_col].dataType)
            if fresh_old is None
            else F.lit(fresh_old),
        )
        .withColumn(effective_col, as_of_d)
        .withColumn("_fresh", F.lit(True))
    )
    base = dim.withColumn("_fresh", F.lit(False)).unionByName(
        fresh_base.select(*dim.columns, "_fresh")
    )

    out = (
        base.join(last, on=keys, how="left")
        .withColumn(
            old_col,
            F.when(F.col("_changed"), F.col("_prev")).otherwise(F.col(old_col)),
        )
        .withColumn(
            effective_col,
            F.when(F.col("_changed"), as_of_d).otherwise(F.col(effective_col)),
        )
        .withColumn(
            tracked_col,
            F.when(F.col("_changed") | F.col("_fresh"), F.col("_final")).otherwise(
                F.col(tracked_col)
            ),
        )
        .drop("_final", "_prev", "_changed", "_fresh")
    )
    return out


def active_rows(dim: DataFrame, active_col: str = "active") -> DataFrame:
    """M6: the SCD2 active-version filter facts join against
    (``inserting-data.sql:178``: ``where r.active = true``)."""
    return dim.filter(F.col(active_col))


def current_version_lookup(
    fact: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    active_col: str = "active",
    how: str = "inner",
) -> DataFrame:
    """J9/M6 composition: keyed lookup of each fact row's *current* SCD2
    dimension version (the reference's ``join resolution_dimension r on
    ... where r.active=true``, ``inserting-data.sql:176-178``)."""
    return fact.join(active_rows(dim, active_col), on=list(keys), how=how)
