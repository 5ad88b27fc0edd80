"""Suffix-array exact-substring tests (VERDICT r12 #8): brute-force
differential for the per-position longest-duplicate lengths, the
census identity against the fixed-k positional-gram census, and the
exactness bound."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from data_warehouse_implementation_spark.operators import corpus, suffix


def _brute_dup_lengths(docs: list[tuple[int, str]]) -> dict[tuple[int, int], int]:
    toks = {
        d: [w for w in re.split(r"\s+", t.lower()) if w] for d, t in docs
    }
    toks = {d: a for d, a in toks.items() if a}
    out = {}
    for d, a in toks.items():
        for p in range(len(a)):
            best = 0
            for d2, a2 in toks.items():
                for p2 in range(len(a2)):
                    if (d2, p2) == (d, p):
                        continue
                    l = 0
                    while (
                        p + l < len(a)
                        and p2 + l < len(a2)
                        and a[p + l] == a2[p2 + l]
                    ):
                        l += 1
                    best = max(best, l)
            out[(d, p + 1)] = best
    return out


CORPUS = [
    # docs 1/2 share a 9-token passage (longer than the census k=5 —
    # the length only the suffix array can name); doc 3 repeats a
    # 3-token phrase INSIDE itself (below threshold, dup_len 3); doc 4
    # is a verbatim copy of doc 5 (full-length duplicate); doc 6 is
    # all-unique
    (1, "alpha beta gamma delta epsilon zeta eta theta iota unique1"),
    (2, "unique2 alpha beta gamma delta epsilon zeta eta theta iota"),
    (3, "red green blue stop red green blue"),
    (4, "the full copy lives twice"),
    (5, "the full copy lives twice"),
    (6, "one two three four five six"),
]


def test_suffix_dup_lengths_match_brute_force(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        (r.doc_id, r.p): r.dup_len
        for r in suffix.suffix_dup_lengths(df, rounds=4).collect()
    }
    want = _brute_dup_lengths(CORPUS)
    assert got == want
    # the 9-token shared passage is named at full length
    assert got[(1, 1)] == 9 and got[(2, 2)] == 9
    # the within-doc repeat is found at length 3
    assert got[(3, 1)] == 3 and got[(3, 5)] == 3
    # full-copy docs: every position duplicated to end-of-doc
    assert got[(4, 1)] == 5 and got[(5, 1)] == 5
    # the all-unique doc never matches beyond single shared tokens
    assert max(got[(6, p)] for p in range(1, 7)) <= 1


def test_suffix_census_equals_kgram_census_at_threshold(spark):
    """The maximal-substring identity: SA coverage at threshold k ==
    the positional k-gram census's coverage (docs with >= k tokens;
    max_dup_len is the strictly-stronger extra column)."""
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    k = 5
    sa = {
        r.doc_id: (r.n_tokens, r.dup_tokens)
        for r in suffix.suffix_dup_census(
            suffix.suffix_dup_lengths(df, rounds=4), threshold=k
        ).collect()
        if r.n_tokens >= k
    }
    kg = {
        r.doc_id: (r.n_tokens, r.dup_tokens)
        for r in corpus.substring_dup_census(df, k=k).collect()
    }
    assert sa == kg
    # and beyond the identity: the census at k says docs 1/2 have SOME
    # >=5 duplication; only max_dup_len says it is 9 tokens long
    full = {
        r.doc_id: r.max_dup_len
        for r in suffix.suffix_dup_census(
            suffix.suffix_dup_lengths(df, rounds=4), threshold=k
        ).collect()
    }
    assert full[1] == 9 and full[2] == 9


def test_suffix_rounds_idempotent_past_convergence(spark):
    """Extra doubling rounds past 2^rounds >= max doc length change
    nothing (dense-ranking distinct values is the identity) — the
    guard that makes a pinned rounds constant safe at smaller SFs."""
    df = spark.createDataFrame(CORPUS[:3], "doc_id long, text string")
    a = {
        (r.doc_id, r.p): r.dup_len
        for r in suffix.suffix_dup_lengths(df, rounds=4).collect()
    }
    b = {
        (r.doc_id, r.p): r.dup_len
        for r in suffix.suffix_dup_lengths(df, rounds=6).collect()
    }
    assert a == b


def test_sa_rounds_cover_driver_corpora():
    """SA_ROUNDS must satisfy the exactness bound 2^rounds >= max doc
    tokens on every driver corpus (the bound the operator's docstring
    pins; checked against the real testdata without Spark)."""
    import duckdb

    from data_warehouse_implementation_spark.plans.corpus_queries import SA_ROUNDS

    for sf in ["0.001", "0.01", "0.1"]:
        m = duckdb.sql(
            "SELECT max(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),"
            f" x -> x <> ''))) FROM read_parquet('/root/testdata/sf{sf}/documents.parquet')"
        ).fetchone()[0]
        assert m <= (1 << SA_ROUNDS), (sf, m, SA_ROUNDS)


def test_global_rank_rejects_scratch_out_col(spark):
    """The guard the SA operator tripped: out_col named like an
    internal scratch column must raise, not silently drop."""
    from data_warehouse_implementation_spark.operators.relational import global_rank

    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError, match="scratch"):
        global_rank(df, ["x"], "_rn")
