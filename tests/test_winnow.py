"""Winnowing fingerprints (text.winnow_fingerprints, Schleimer et al.
2003): pure-Python reference differential, the local-match guarantee,
and the map-side plan contract."""

from __future__ import annotations

from data_warehouse_implementation_spark.operators.text import (
    WINNOW_CHAR_MULT,
    WINNOW_GRAM_MULT,
    winnow_fingerprints,
)

P = 2_147_483_647


def _ref(text: str, k: int, w: int):
    toks = [t for t in text.lower().split() if t]
    if len(toks) < k:
        return None
    th = []
    for t in toks:
        h = 0
        for ch in t:
            h = (h * WINNOW_CHAR_MULT + ord(ch)) % P
        th.append(h)
    gh = []
    for s in range(len(toks) - k + 1):
        g = 0
        for j in range(s, s + k):
            g = (g * WINNOW_GRAM_MULT + th[j]) % P
        gh.append(g)
    if len(gh) < w:
        return None
    sel = set()
    for s in range(len(gh) - w + 1):
        # rightmost minimum in the window (1-based positions)
        best = min(range(s, s + w), key=lambda j: (gh[j], -j))
        sel.add((best + 1, gh[best]))
    return len(toks), len(gh), sorted(sel)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_winnow_matches_python_reference(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "a a a a a a a a",  # all-equal hashes: rightmost-tie rule decides
        "one two three four",  # exactly k tokens -> one gram -> short-circuit
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    got = {
        r.doc_id: (r.n_tokens, r.n_grams, [(f.pos, f.hash) for f in r.fingerprints])
        for r in winnow_fingerprints(_df(spark, rows), k=4, window=4).collect()
    }
    for i, t in enumerate(texts):
        want = _ref(t, 4, 4)
        if want is None:
            assert i not in got, (i, got.get(i))
        else:
            assert got[i] == want, (i, got[i], want)


def test_winnow_local_match_guarantee(spark):
    """Any shared token run of length >= window + k - 1 must share at
    least one selected fingerprint — the paper's core guarantee."""
    shared = "lorem ipsum dolor sit amet consectetur adipiscing"  # 7 = 4+4-1
    rows = [
        (1, "completely different head words " + shared),
        (2, shared + " entirely other tail content here"),
    ]
    got = {
        r.doc_id: {f.hash for f in r.fingerprints}
        for r in winnow_fingerprints(_df(spark, rows), k=4, window=4).collect()
    }
    assert got[1] & got[2], "shared run produced no shared fingerprint"


def test_winnow_plan_is_map_side(spark):
    plan = (
        winnow_fingerprints(_df(spark, [(1, "a b c d e")]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "CartesianProduct" not in plan


def test_winnow_expression_total_without_filter_pushdown(spark):
    """Review fix: the fps expression must be well-defined for short
    documents ON ITS OWN — Spark's sequence(1, n) DESCENDS when n < 1,
    so an unguarded expression only survived because PushDownPredicate
    moved the row filter below the projection. Excluding that rule
    forces the projection to evaluate on short docs first."""
    rule = "org.apache.spark.sql.catalyst.optimizer.PushDownPredicate"
    prev = spark.conf.get("spark.sql.optimizer.excludedRules", None)
    spark.conf.set("spark.sql.optimizer.excludedRules", rule)
    try:
        rows = [(1, "a b"), (2, "one two three four five"), (3, "x " * 10)]
        got = winnow_fingerprints(
            _df(spark, rows), k=4, window=4
        ).collect()  # doc 1 (< k tokens) and doc 2 (< k+w-1) must not crash
        assert sorted(r.doc_id for r in got) == [3]
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.optimizer.excludedRules")
        else:
            spark.conf.set("spark.sql.optimizer.excludedRules", prev)
