"""Property-based differential: the set-based SCD algebra must equal a
row-at-a-time replay of the reference's trigger semantics
(``creating-tables.sql:223-270``) on randomized batches — duplicate
keys, NULLs, no-op updates, arbitrary interleavings included."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _nsort(rows):
    """Sort tuples that may contain None."""
    return sorted(rows, key=lambda t: tuple((v is None, v) for v in t))
from pyspark.sql import functions as F

from data_warehouse_implementation_spark.plans import scd

AS_OF = "2024-05-05"
SENTINEL = scd.SCD2_SENTINEL

keys = st.integers(min_value=0, max_value=3)
vals = st.sampled_from(["a", "b", "c", None])

dim2_rows = st.lists(
    st.tuples(keys, vals), max_size=4, unique_by=lambda r: r[0]
)
batch_rows = st.lists(st.tuples(keys, vals), max_size=6)


def replay_scd2(dim, batch):
    """Per-row trigger replay: each insert first closes ALL rows for its
    key (no active guard), then appends an open row."""
    state = [
        {"key": k, "payload": p, "start": "2020-01-01", "end": SENTINEL, "active": True}
        for k, p in dim
    ]
    for k, p in batch:
        for s in state:
            if s["key"] == k:
                s["end"] = AS_OF
                s["active"] = False
        state.append({"key": k, "payload": p, "start": AS_OF, "end": SENTINEL, "active": True})
    return _nsort(
        (s["key"], s["payload"], s["start"], s["end"], s["active"]) for s in state
    )


def replay_scd3(dim, batch):
    """Per-row trigger replay: existing key + null-safe change -> update
    tracked/old/effective (row discarded); fresh key -> insert."""
    state = {
        k: {"tracked": v, "old": "", "eff": "2020-01-01", "narr": f"n{k}"} for k, v in dim
    }
    for i, (k, v) in enumerate(batch):
        if k in state:
            s = state[k]
            if s["tracked"] != v:  # null-safe: python != treats None correctly here
                s["old"] = s["tracked"]
                s["tracked"] = v
                s["eff"] = AS_OF
        else:
            state[k] = {"tracked": v, "old": "", "eff": AS_OF, "narr": f"i{i}"}
    return _nsort(
        (k, s["narr"], s["tracked"], s["old"], s["eff"]) for k, s in state.items()
    )


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(dim=dim2_rows, batch=batch_rows)
def test_scd2_matches_row_replay(spark, dim, batch):
    dim_df = spark.createDataFrame(
        [(k, p, "2020-01-01", SENTINEL, True) for k, p in dim],
        "key long, payload string, start_date string, end_date string, active boolean",
    ).withColumns(
        {c: F.col(c).cast("date") for c in ("start_date", "end_date")}
    )
    batch_df = spark.createDataFrame(
        [(k, p, i) for i, (k, p) in enumerate(batch)],
        "key long, payload string, seq long",
    )
    out = scd.scd2_apply(dim_df, batch_df, ["key"], as_of=AS_OF, order_col="seq")
    got = _nsort(
        (r.key, r.payload, str(r.start_date), str(r.end_date), r.active)
        for r in out.collect()
    )
    assert got == replay_scd2(dim, batch)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(dim=dim2_rows, batch=batch_rows)
def test_scd3_matches_row_replay(spark, dim, batch):
    dim_df = spark.createDataFrame(
        [(k, f"n{k}", v, "", "2020-01-01") for k, v in dim],
        "key long, narrative string, consent string, consent_old string,"
        " effective_date string",
    ).withColumn("effective_date", F.col("effective_date").cast("date"))
    batch_df = spark.createDataFrame(
        [(k, f"i{i}", v, i) for i, (k, v) in enumerate(batch)],
        "key long, narrative string, consent string, seq long",
    )
    out = scd.scd3_apply(
        dim_df, batch_df, ["key"], tracked_col="consent", as_of=AS_OF,
        order_col="seq", old_col="consent_old",
    )
    got = _nsort(
        (r.key, r.narrative, r.consent, r.consent_old, str(r.effective_date))
        for r in out.collect()
    )
    assert got == replay_scd3(dim, batch)
