"""Checksum-validated PII scrubbing (text.luhn_scrub).

The registered sf0.01 differential proves the probe pipeline; these
tests pin the checksum itself against Python-reference Luhn on real
test PANs and the candidate/replacement edge semantics."""

from __future__ import annotations

from data_warehouse_implementation_spark.operators.text import luhn_scrub


def _luhn_ok(s: str) -> bool:
    total = 0
    for i, ch in enumerate(reversed(s), start=1):
        d = int(ch)
        total += (d * 2 - 9 if d * 2 > 9 else d * 2) if i % 2 == 0 else d
    return total % 10 == 0


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_luhn_matches_python_reference_on_standard_pans(spark):
    """The SQL fold must agree with reference Luhn on the standard
    network test numbers (all valid) and their off-by-one twins."""
    pans = [
        "4532015112830366",  # Visa-format test number
        "5425233430109903",  # Mastercard-format test number
        "6011000990139424",  # Discover-format test number
    ]
    rows, want = [], {}
    for i, p in enumerate(pans):
        assert _luhn_ok(p), p  # reference sanity
        bad = p[:-1] + str((int(p[-1]) + 1) % 10)
        assert not _luhn_ok(bad)
        rows.append((2 * i, f"pay {p} now"))
        rows.append((2 * i + 1, f"pay {bad} now"))
        want[2 * i] = (1, 1, "pay <CARD> now")
        want[2 * i + 1] = (1, 0, f"pay {bad} now")
    got = {
        r.doc_id: (r.n_candidates, r.n_valid, r.redacted_text)
        for r in luhn_scrub(_df(spark, rows)).collect()
    }
    assert got == want


def test_luhn_scrub_multiple_and_zero_candidates(spark):
    v1, v2 = "4532015112830366", "5425233430109903"
    rows = [
        (1, f"{v1} and {v2} twice {v1}"),
        (2, "no digits at all"),
    ]
    got = {
        r.doc_id: (r.n_candidates, r.n_valid, r.redacted_text)
        for r in luhn_scrub(_df(spark, rows)).collect()
    }
    # replace() is plain string replacement: both occurrences of v1 go
    assert got[1] == (3, 3, "<CARD> and <CARD> twice <CARD>")
    assert got[2] == (0, 0, "no digits at all")


def test_luhn_scrub_long_digit_run_chunks(spark):
    """Documented scope: candidates are the regex's leftmost
    non-overlapping 16-digit windows, so a 17-digit run yields ONE
    candidate — its first 16 digits (identical leftmost semantics in
    Spark and the DuckDB oracle; no lookarounds, which RE2 lacks)."""
    run17 = "4532015112830366" + "7"
    got = luhn_scrub(_df(spark, [(1, f"x {run17} y")])).collect()[0]
    assert got.n_candidates == 1 and got.n_valid == 1
    assert got.redacted_text == "x <CARD>7 y"


def test_luhn_scrub_plan_is_map_side(spark):
    plan = (
        luhn_scrub(_df(spark, [(1, "a")]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "CartesianProduct" not in plan
