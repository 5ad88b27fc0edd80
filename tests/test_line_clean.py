"""Line-grain cleaning operators: dedup.split_lines / dedup.dedup_lines
(CCNet/Dolma duplicate-line removal) and text.c4_line_clean (the real
line-by-line C4 algorithm).

The registered sf0.01 differentials prove the probe pipeline; these
tests pin the rule semantics on crafted corpora the synthetic word
salad cannot express — exact first-occurrence policy, word-not-substring
javascript matching, gate ordering, hashed==exact mode parity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_implementation_spark.operators import dedup
from data_warehouse_implementation_spark.operators.text import c4_line_clean


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_split_lines_trim_and_positions(spark):
    """Positions are 1-based over surviving lines; trim is SPACE-only
    (Spark trim == DuckDB trim — both default to spaces, so the
    oracle replays the identical line set)."""
    got = dedup.split_lines(
        _df(spark, [(1, "  a b \n\n c d \n e ")])
    ).collect()
    assert [(r.line_no, r.line) for r in sorted(got, key=lambda r: r.line_no)] == [
        (1, "a b"),
        (2, "c d"),
        (3, "e"),
    ]


def test_dedup_lines_first_occurrence_survives(spark):
    """The corpus-wide min (doc_id, line_no) copy survives; every later
    copy drops; comparison is case-insensitive; unique lines pass."""
    rows = [
        (1, "unique one\nShared Footer"),
        (2, "shared footer\nunique two"),
        (3, "SHARED FOOTER\nshared footer"),
    ]
    got = {r.doc_id: r for r in dedup.dedup_lines(_df(spark, rows)).collect()}
    assert (got[1].n_kept, got[1].n_dropped_dup) == (2, 0)
    assert got[1].cleaned_text == "unique one\nShared Footer"
    assert (got[2].n_kept, got[2].n_dropped_dup) == (1, 1)
    assert got[2].cleaned_text == "unique two"
    # doc 3: both copies are non-canonical -> fully deduped, empty text
    assert (got[3].n_kept, got[3].n_dropped_dup) == (0, 2)
    assert got[3].cleaned_text == ""


def test_dedup_lines_min_occurrences_threshold(spark):
    """min_occurrences=3: a line present twice survives in BOTH docs."""
    rows = [(1, "twice"), (2, "twice"), (3, "thrice"), (4, "thrice"), (5, "thrice")]
    got = {
        r.doc_id: r.n_kept
        for r in dedup.dedup_lines(_df(spark, rows), min_occurrences=3).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 0, 5: 0}


def test_dedup_lines_hashed_equals_exact(spark):
    """Production hashed mode (xxhash64 join keys) must make the same
    decisions as exact string mode on a collision-free corpus."""
    rows = [
        (i, f"unique line {i}.\nshared boilerplate line\nalso unique {i}")
        for i in range(30)
    ]
    exact = dedup.dedup_lines(_df(spark, rows)).orderBy("doc_id").collect()
    hashed = (
        dedup.dedup_lines(_df(spark, rows), hashed=True).orderBy("doc_id").collect()
    )
    assert [tuple(r) for r in exact] == [tuple(r) for r in hashed]


def test_dedup_lines_partition_invariance(spark):
    rows = [(i, f"line {i % 7}\ntail {i}") for i in range(40)]
    a = dedup.dedup_lines(_df(spark, rows)).orderBy("doc_id").collect()
    b = (
        dedup.dedup_lines(_df(spark, rows).repartition(13))
        .orderBy("doc_id")
        .collect()
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_c4_line_rules_hand_checked(spark):
    """Terminal punctuation (all four marks), the 3-word minimum, and
    word-not-substring javascript matching."""
    doc = "\n".join(
        [
            "this line is fine.",  # kept
            "is this line fine?",  # kept (?)
            'he said "keep it"',  # kept (terminal quote)
            "keep this one too!",  # kept (!)
            "no terminal punctuation",  # dropped
            "too short.",  # dropped (2 words)
            "enable javascript to proceed.",  # dropped (word match)
            "the javascripted page stays fine.",  # KEPT — substring only
        ]
    )
    got = c4_line_clean(_df(spark, [(1, doc)]), min_kept_lines=2).collect()[0]
    assert (got.n_lines, got.n_kept_lines, got.verdict) == (8, 5, "kept")
    assert got.cleaned_text.splitlines() == [
        "this line is fine.",
        "is this line fine?",
        'he said "keep it"',
        "keep this one too!",
        "the javascripted page stays fine.",
    ]


def test_c4_doc_gates_order_and_accounting(spark):
    """Gate order is lorem_ipsum > curly_brace > too_few_lines; rejected
    docs keep their accounting and cleaned text (never silent)."""
    good = "a good first line.\na good second line."
    rows = [
        (1, good),
        (2, good + "\nsome Lorem Ipsum here { too }"),  # lorem wins over curly
        (3, good + "\nconfig { debug }"),
        (4, "only one good line."),
    ]
    got = {
        r.doc_id: r
        for r in c4_line_clean(_df(spark, rows), min_kept_lines=2).collect()
    }
    assert got[1].verdict == "kept"
    assert got[2].verdict == "lorem_ipsum"
    assert got[3].verdict == "curly_brace"
    assert got[4].verdict == "too_few_lines"
    assert got[3].n_kept_lines == 2 and got[3].cleaned_text == good
    assert got[4].n_kept_lines == 1 and got[4].cleaned_text == "only one good line."


def test_c4_min_line_words_param(spark):
    got = c4_line_clean(
        _df(spark, [(1, "four words right here.\nthree words here.")]),
        min_line_words=4,
        min_kept_lines=1,
    ).collect()[0]
    assert (got.n_kept_lines, got.cleaned_text) == (1, "four words right here.")


def test_line_ops_scale_plan_invariants(spark):
    """c4_line_clean is one map-side pass (zero exchanges); dedup_lines
    has no window at all (min-struct census, not rank) and no
    CartesianProduct."""
    rows = [(i, f"line {i}.\nshared line here.") for i in range(20)]
    df = _df(spark, rows)
    c4_plan = (
        c4_line_clean(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in c4_plan
    dd_plan = (
        dedup.dedup_lines(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in dd_plan
    assert "windowspecdefinition" not in dd_plan
