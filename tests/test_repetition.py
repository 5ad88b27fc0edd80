"""Gopher/MassiveText repetition-census invariants
(operators/text.py::repetition_census) and the optional quality_filter
wiring. End-to-end values are oracle-checked in test_oracle.py
(``doc_repetition_census``); the synthetic corpus has no newlines, so
the line/paragraph rules are pinned HERE on crafted documents."""

from __future__ import annotations

import pytest

from data_warehouse_implementation_spark.operators import text as text_ops


def _census(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r for r in text_ops.repetition_census(df).collect()}


def test_duplicate_line_and_paragraph_fractions(spark):
    got = _census(
        spark,
        [
            # 4 lines, 'a b' twice: dup_frac 1/4; chars 3+3+3+6 = 15, dup mass 3
            (1, "a b\na b\nc d\nee fff"),
            # paragraphs: ['x y', 'x y', 'z w'] -> dup 1/3; lines differ
            (2, "x y\n\nx y\n\nz w"),
        ],
    )
    r1 = got[1]
    assert (r1.n_lines, r1.n_paras) == (4, 1)
    assert r1.dup_line_frac == 1 / 4
    assert r1.dup_line_char_frac == 3 / 15
    assert r1.dup_para_frac == 0.0
    r2 = got[2]
    # '\n\n' split leaves single-'\n' boundaries inside lines view
    assert r2.n_paras == 3
    assert r2.dup_para_frac == 1 / 3
    assert r2.dup_para_char_frac == 3 / 9


def test_top_ngram_share_ties_break_to_smallest_gram(spark):
    # 'b c' and 'c b' both appear twice; smallest gram 'b c' must win
    # on BOTH engines -> share is the same either way here, so pin the
    # count*mass arithmetic through an asymmetric case too
    got = _census(spark, [(1, "b c b c b q q q q z")])
    r = got[1]
    # grams2: b c, c b, b c, c b, b q, q q, q q, q q, q z -> top 'q q' x3
    assert r.top2_char_frac == (3 * 3) / len("b c b c b q q q q z")


def test_duplicate_5gram_char_mass(spark):
    # 10 words, 6 5-grams, one exact repeat of the first
    got = _census(spark, [(1, "x y z x y z x y w q")])
    assert got[1].dup_5gram_char_frac == 9 / (9 * 6)


def test_census_excludes_short_docs_and_is_map_side(spark):
    df = spark.createDataFrame(
        [(1, "one two three four"), (2, "one two three four five")],
        "doc_id long, text string",
    )
    out = text_ops.repetition_census(df)
    assert [r.doc_id for r in out.collect()] == [2]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # one map-side pass, nothing shuffles


def test_quality_filter_wires_repetition_rules_into_the_ladder_shape(spark):
    """The curation ladder's stage-1 shape — quality_filter then
    ``verdict == 'kept'`` — must reject a repetitious doc that passes
    every C4 rule, with the per-rule verdict accounting intact."""
    looping = "the cat sat on the mat " * 5  # dup 5-grams galore
    clean = "the quick brown fox jumps over the lazy dog and then rests quietly at home"
    df = spark.createDataFrame(
        [(1, looping.strip()), (2, clean)], "doc_id long, text string"
    )
    base = text_ops.quality_filter(df, min_words=5, max_words=100, min_quality=0.0)
    assert {r.doc_id: r.verdict for r in base.collect()} == {1: "kept", 2: "kept"}
    qf = text_ops.quality_filter(
        df,
        min_words=5,
        max_words=100,
        min_quality=0.0,
        repetition_rules={"dup_5gram_char_frac": 0.5, "top4_char_frac": 0.9},
    )
    verdicts = {r.doc_id: r.verdict for r in qf.collect()}
    assert verdicts == {1: "repetitious_dup_5gram_char_frac", 2: "kept"}
    kept = qf.filter("verdict = 'kept'").select("doc_id")  # the ladder's kept1 shape
    assert [r.doc_id for r in kept.collect()] == [2]
    # rule columns ride the output for funnel accounting
    assert {"dup_5gram_char_frac", "top4_char_frac"} <= set(qf.columns)


def test_quality_filter_rejects_unknown_rule_names(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    with pytest.raises(ValueError, match="unknown repetition rule"):
        text_ops.quality_filter(df, repetition_rules={"nope": 0.1})


def test_repetition_rules_apply_in_census_column_order(spark):
    """Two breached rules -> the verdict must name the FIRST one in the
    census's documented column order (dup_line_frac before
    top2_char_frac), regardless of dict insertion order."""
    df = spark.createDataFrame(
        # stopword-rich so the C4 language rule passes ('en' predicted)
        [(1, "the a of\nthe a of\nthe a of\nin is to and")],
        "doc_id long, text string",
    )
    qf = text_ops.quality_filter(
        df,
        min_words=1,
        max_words=100,
        min_quality=0.0,
        repetition_rules={"top2_char_frac": 0.01, "dup_line_frac": 0.1},
    )
    [r] = qf.collect()
    assert r.verdict == "repetitious_dup_line_frac"
