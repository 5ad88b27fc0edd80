"""Golden tests for the SCD batch algebra (SURVEY §5 strategy #2).

The registered scd*_batch queries are already covered by the oracle
differential in test_oracle.py; these tests pin down the quirk behaviors
directly at the function level with additional edge batches.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_implementation_spark.plans import scd


def _rows(df, *cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_scd2_recloses_closed_history_rows(spark):
    """The reference close-out has no active=true guard: already-closed
    rows for an incoming key get end_date overwritten too."""
    dim = spark.createDataFrame(
        [(1, "v1", "2019-01-01", "2020-05-05", False)],
        "key long, payload string, start_date string, end_date string, active boolean",
    ).withColumns({c: F.col(c).cast("date") for c in ("start_date", "end_date")})
    incoming = spark.createDataFrame([(1, "v2", 1)], "key long, payload string, seq long")
    out = scd.scd2_apply(dim, incoming, ["key"], as_of="2024-01-01", order_col="seq")
    got = {
        (r.payload, str(r.start_date), str(r.end_date), r.active) for r in out.collect()
    }
    assert got == {
        ("v1", "2019-01-01", "2024-01-01", False),  # end_date 2020-05-05 overwritten
        ("v2", "2024-01-01", "2099-12-31", True),
    }


def test_scd2_batch_last_row_wins(spark):
    dim = spark.createDataFrame(
        [], "key long, payload string, start_date date, end_date date, active boolean"
    )
    incoming = spark.createDataFrame(
        [(1, "r1", 1), (1, "r2", 2), (1, "r3", 3)], "key long, payload string, seq long"
    )
    out = scd.scd2_apply(dim, incoming, ["key"], as_of="2024-01-01", order_col="seq")
    active = [r.payload for r in out.filter("active").collect()]
    closed = sorted(r.payload for r in out.filter("NOT active").collect())
    assert active == ["r3"]
    assert closed == ["r1", "r2"]
    # exactly one active row per key after apply
    assert out.filter("active").groupBy("key").count().filter("count > 1").count() == 0


def test_scd3_nullsafe_no_change_keeps_row_untouched(spark):
    dim = spark.createDataFrame(
        [(1, "n", None, "prior", "2020-01-01")],
        "key long, narrative string, consent string, consent_old string, effective_date string",
    ).withColumn("effective_date", F.col("effective_date").cast("date"))
    incoming = spark.createDataFrame(
        [(1, "discarded", None, 1)], "key long, narrative string, consent string, seq long"
    )
    out = scd.scd3_apply(
        dim, incoming, ["key"], tracked_col="consent", as_of="2024-01-01",
        order_col="seq", old_col="consent_old",
    )
    r = out.collect()[0]
    # NULL IS NOT DISTINCT FROM NULL -> untouched, incoming row discarded
    assert (r.narrative, r.consent, r.consent_old, str(r.effective_date)) == (
        "n", None, "prior", "2020-01-01"
    )


def test_scd3_null_to_value_is_a_change(spark):
    dim = spark.createDataFrame(
        [(1, "n", None, "", "2020-01-01")],
        "key long, narrative string, consent string, consent_old string, effective_date string",
    ).withColumn("effective_date", F.col("effective_date").cast("date"))
    incoming = spark.createDataFrame(
        [(1, "x", "Yes", 1)], "key long, narrative string, consent string, seq long"
    )
    out = scd.scd3_apply(
        dim, incoming, ["key"], tracked_col="consent", as_of="2024-01-01",
        order_col="seq", old_col="consent_old",
    )
    r = out.collect()[0]
    assert (r.narrative, r.consent, r.consent_old, str(r.effective_date)) == (
        "n", "Yes", None, "2024-01-01"
    )


def test_scd3_tracks_only_last_transition(spark):
    """A -> B -> C within one batch: final consent C, old B (the replay
    keeps only the most recent change pair)."""
    dim = spark.createDataFrame(
        [(1, "n", "A", "", "2020-01-01")],
        "key long, narrative string, consent string, consent_old string, effective_date string",
    ).withColumn("effective_date", F.col("effective_date").cast("date"))
    incoming = spark.createDataFrame(
        [(1, "i1", "B", 1), (1, "i2", "B", 2), (1, "i3", "C", 3)],
        "key long, narrative string, consent string, seq long",
    )
    out = scd.scd3_apply(
        dim, incoming, ["key"], tracked_col="consent", as_of="2024-01-01",
        order_col="seq", old_col="consent_old",
    )
    r = out.collect()[0]
    assert (r.consent, r.consent_old) == ("C", "B")
    assert r.narrative == "n"  # attributes never updated


def test_scd1_and_m2_roundtrip(spark):
    existing = spark.createDataFrame([(1, "a")], "key long, payload string")
    incoming = spark.createDataFrame(
        [(1, "a2", 1), (2, "b", 2)], "key long, payload string, seq long"
    )
    up = scd.scd1_upsert(existing, incoming, ["key"], order_col="seq")
    assert _rows(up, "key", "payload") == [(1, "a2"), (2, "b")]
    keep = scd.insert_if_absent(existing, incoming, ["key"], order_col="seq")
    assert _rows(keep, "key", "payload") == [(1, "a"), (2, "b")]


def test_active_rows_filter(spark):
    dim = spark.createDataFrame(
        [(1, True), (1, False), (2, False)], "key long, active boolean"
    )
    assert scd.active_rows(dim).count() == 1
