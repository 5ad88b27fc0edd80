"""Unit tests for corpus-preparation operators (splitting, chunking,
sharding) — properties the oracle differential doesn't state directly."""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest

from data_warehouse_implementation_spark.operators import corpus


def test_hash_split_is_deterministic_and_partition_invariant(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    a = corpus.hash_split(df).select("doc_id", "split")
    b = corpus.hash_split(df.repartition(7)).select("doc_id", "split")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # roughly the requested proportions (hash uniformity, not exactness)
    frac = {
        r["split"]: r["n"] for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert 700 < frac["train"] < 900
    assert 50 < frac["val"] < 160
    assert 50 < frac["test"] < 160


def test_chunk_boundaries_cover_without_gaps(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(50))), (2, "one two")], ["doc_id", "text"]
    )
    out = corpus.chunk_documents(df, size=32, stride=24).collect()
    d1 = sorted((r.chunk_id, r.n_chunk_tokens) for r in out if r.doc_id == 1)
    # 50 words, stride 24: chunks at 1, 25, 49 -> sizes 32, 26, 2
    assert d1 == [(0, 32), (1, 26), (2, 2)]
    d1_rows = {r.chunk_id: r for r in out if r.doc_id == 1}
    assert d1_rows[0].chunk_text.split()[0] == "w0"
    assert d1_rows[1].chunk_text.split()[0] == "w24"  # overlap of size-stride=8
    assert d1_rows[2].chunk_text == "w48 w49"
    d2 = [(r.chunk_id, r.chunk_text) for r in out if r.doc_id == 2]
    assert d2 == [(0, "one two")]


def test_shard_two_phase_matches_global_cumsum(spark):
    df = spark.createDataFrame(
        [(i, " ".join("t" for _ in range(1 + i % 7))) for i in range(300)],
        ["doc_id", "text"],
    )
    out = (
        corpus.shard_by_token_budget(df, budget=100, bucket_width=32)
        .orderBy("doc_id")
        .collect()
    )
    running = 0
    for r in out:
        assert r.token_start == running, r
        assert r.shard_id == running // 100
        running += r.n_tokens


def test_shard_ids_are_contiguous_from_zero(spark):
    df = spark.createDataFrame(
        [(i, "a b c d e") for i in range(100)], ["doc_id", "text"]
    )
    shards = sorted(
        r.shard_id
        for r in corpus.shard_by_token_budget(df, budget=50, bucket_width=16)
        .select("shard_id")
        .distinct()
        .collect()
    )
    assert shards == list(range(shards[-1] + 1))


def test_mix_sources_rates_and_invariance(spark):
    rows = [(i, "curated" if i < 40 else "crawl", "w " * (10 + i % 5)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kept = corpus.mix_sources(df, {"curated": 9}, token_budget=1000, default_weight=1)
    rates = {r.source: r.rate_pct for r in kept.select("source", "rate_pct").distinct().collect()}
    # curated target = 900 tokens vs ~480 available -> rate caps at 100 (keep all)
    assert rates["curated"] == 100
    assert kept.filter("source = 'curated'").count() == 40
    # crawl target = 100 tokens out of ~1900 -> small but nonzero rate
    assert 0 < rates["crawl"] < 100
    # partition invariance: identical keep set under different layouts
    k1 = {r.doc_id for r in kept.collect()}
    k2 = {
        r.doc_id
        for r in corpus.mix_sources(
            df.repartition(13), {"curated": 9}, token_budget=1000
        ).collect()
    }
    assert k1 == k2


def test_boilerplate_ngrams_threshold_exact(spark):
    common = "the quick brown"
    rows = [(i, f"{common} fox {i}") for i in range(10)] + [
        (100 + i, f"unique words here {i} nothing shared beyond") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = corpus.boilerplate_ngrams(df, n=3, min_doc_share_pct=50)
    got = {r.ngram: (r.dfreq, r.doc_share) for r in out.collect()}
    assert got[common] == (10, 0.5)  # exactly at the threshold -> kept
    assert all(share >= 0.5 for _, share in got.values())


def test_pack_sequences_stream_invariants(spark):
    """token_start must be the exact running sum in (doc, chunk) order
    and every chunk's sequence is the one containing its first token."""
    rows = [(i, "w " * (5 + (i * 7) % 40)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = (
        corpus.pack_sequences(df, seq_budget=64, chunk_size=16, chunk_stride=16)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    run = 0
    for r in out:
        assert r.token_start == run, (r, run)
        assert r.seq_id == r.token_start // 64
        run += r.n_chunk_tokens


def test_funnel_counts_are_monotone_nonincreasing(spark):
    from data_warehouse_implementation_spark.plans import timeseries_queries
    from data_warehouse_implementation_spark.session import load_tables

    t = load_tables(spark, "/root/testdata/sf0.001")
    rows = timeseries_queries.events_funnel(t).orderBy("stage_idx").collect()
    counts = [r.n_users for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert rows[0].share_of_entry == 1.0


def test_funnel_emits_zero_rows_for_unreached_stages(spark):
    """A stage no user reaches must still emit its row with n_users=0
    (matching the oracle's global COUNTs), and an absent ENTRY stage
    must not silently empty the whole funnel (ADVICE r3)."""
    from data_warehouse_implementation_spark.plans import timeseries_queries

    # users sign up and view; nobody clicks or purchases
    ev = spark.createDataFrame(
        [(1, "signup", "2024-01-01 00:00:00"), (1, "view", "2024-01-01 00:01:00"),
         (2, "signup", "2024-01-02 00:00:00")],
        "user_id long, event_type string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = timeseries_queries.events_funnel({"events": ev}).orderBy("stage_idx").collect()
    assert [(r.stage, r.n_users) for r in rows] == [
        ("signup", 2), ("view", 1), ("click", 0), ("purchase", 0)
    ]
    assert rows[2].share_of_entry == 0.0 and rows[3].share_of_entry == 0.0
    # entry stage absent entirely: all-zero rows, null shares — not an empty frame
    ev2 = spark.createDataFrame(
        [(1, "view", "2024-01-01 00:00:00")],
        "user_id long, event_type string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows2 = timeseries_queries.events_funnel({"events": ev2}).orderBy("stage_idx").collect()
    assert [r.n_users for r in rows2] == [0, 0, 0, 0]
    assert all(r.share_of_entry is None for r in rows2)


def test_zorder_key_matches_python_reference(spark):
    from data_warehouse_implementation_spark.functions.scalar import zorder_key

    def z_ref(vals, bits):
        n = len(vals)
        k = 0
        for j, v in enumerate(vals):
            v &= (1 << bits) - 1
            for i in range(bits):
                k |= (v & (1 << i)) << (i * (n - 1) + j)
        return k

    rows = [(a, b, c) for a in (0, 1, 5, 63) for b in (0, 2, 62) for c in (0, 7)]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    got = {
        (r.a, r.b, r.c): r.z
        for r in df.withColumn("z", zorder_key(["a", "b", "c"], bits=6)).collect()
    }
    for a, b, c in rows:
        assert got[(a, b, c)] == z_ref([a, b, c], 6), (a, b, c)


# ---------------------------------------------------------------------------
# Property-based differentials of the two-phase cumsum (VERDICT r3 #7):
# the bucket-offset algebra must equal the single-task global running sum
# under ADVERSARIAL id distributions and physical partitionings — sparse
# ids, all-one-bucket clusters, zero-token docs, bucket_width=1, and
# random repartitioning of the input.

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_shard_cases = st.tuples(
    st.lists(  # (doc_id, n_tokens) with unique, possibly sparse/clustered ids
        st.tuples(st.integers(min_value=0, max_value=5000), st.integers(min_value=0, max_value=40)),
        min_size=1,
        max_size=60,
        unique_by=lambda r: r[0],
    ),
    st.sampled_from([1, 2, 7, 256]),      # bucket_width incl. degenerate 1
    st.sampled_from([1, 13, 100]),        # budget incl. degenerate 1
    st.integers(min_value=1, max_value=7),  # physical partition count
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(_shard_cases)
def test_shard_two_phase_cumsum_property(spark, case):
    rows, bucket_width, budget, nparts = case
    df = spark.createDataFrame(
        [(i, n) for i, n in rows], "doc_id long, n_tokens_in long"
    ).repartition(nparts)
    out = {
        r.doc_id: (r.n_tokens, r.token_start, r.shard_id)
        for r in corpus.shard_by_token_budget(
            df, budget=budget, bucket_width=bucket_width, tokens_col="n_tokens_in"
        ).collect()
    }
    running = 0
    for did, n in sorted(rows):
        assert out[did] == (n, running, running // budget), (did, out[did], running)
        running += n
    assert len(out) == len(rows)


_pack_cases = st.tuples(
    st.lists(  # (doc_id, n_words)
        st.tuples(st.integers(min_value=0, max_value=300), st.integers(min_value=0, max_value=25)),
        min_size=1,
        max_size=25,
        unique_by=lambda r: r[0],
    ),
    st.sampled_from([(4, 4), (4, 3), (5, 2), (1, 1)]),  # (chunk_size, stride)
    st.sampled_from([1, 9, 64]),                        # seq budget
    st.integers(min_value=1, max_value=5),              # physical partitions
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(_pack_cases)
def test_pack_sequences_global_stream_property(spark, case):
    """pack_sequences must lay chunks end to end in (doc, chunk) order
    and cut exactly like a single global running sum — replayed here in
    plain Python chunk arithmetic (chunk c covers words
    [1+c*stride, 1+c*stride+size), final chunk short, empty docs
    dropped)."""
    rows, (size, stride), seq_budget, nparts = case
    df = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(n))) for i, n in rows],
        "doc_id long, text string",
    ).repartition(nparts)
    got = {
        (r.doc_id, r.chunk_id): (r.n_chunk_tokens, r.token_start, r.seq_id)
        for r in corpus.pack_sequences(
            df, seq_budget=seq_budget, chunk_size=size, chunk_stride=stride
        ).collect()
    }
    want = {}
    running = 0
    for did, n in sorted(rows):
        if n == 0:
            continue
        for cid, s in enumerate(range(0, n, stride)):
            clen = min(size, n - s)
            want[(did, cid)] = (clen, running, running // seq_budget)
            running += clen
    assert got == want


def test_bigram_rarity_hand_computed(spark):
    """Exact hand-computed check of the smoothed bigram conditional
    model: corpus {"a b a b", "b b b", "x"} -> c2={ab:2, ba:1, bb:2},
    ctx={a:2, b:3}, V=3; doc 1 mean = (4/4 + 5/2 + 4/4)/3, doc 2 mean
    = 6/3; the 1-token doc has no bigram and must not appear."""
    from data_warehouse_implementation_spark.operators import corpus

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "b b b"), (3, "x")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in corpus.bigram_rarity(df).collect()}
    assert set(got) == {1, 2}
    # V = |{a, b, x}| = 3
    # doc 1 bigrams: ab, ba, ab -> terms (2+3)/(2+1), (3+3)/(1+1), (2+3)/(2+1)
    want1 = (5 / 3 + 3.0 + 5 / 3) / 3
    assert got[1].n_bigrams == 3
    assert abs(got[1].mean_bigram_rarity - want1) < 1e-6
    # doc 2 bigrams: bb, bb -> terms (3+3)/(2+1) = 2.0 each
    assert got[2].n_bigrams == 2
    assert abs(got[2].mean_bigram_rarity - 2.0) < 1e-6


def test_bigram_rarity_flags_improbable_context(spark):
    """The fluency property unigram rarity cannot express: a doc built
    from the corpus's commonest TOKENS in an unseen ORDER must score
    higher (rarer) than the fluent ordering."""
    from data_warehouse_implementation_spark.operators import corpus

    fluent = "the cat sat on the mat"
    corpus_docs = [(i, fluent) for i in range(1, 9)]
    # same unigrams as the fluent docs, permuted into unseen bigrams
    corpus_docs.append((9, "mat the on sat cat the"))
    df = spark.createDataFrame(corpus_docs, "doc_id long, text string")
    got = {r.doc_id: r.mean_bigram_rarity for r in corpus.bigram_rarity(df).collect()}
    assert got[9] > got[1] * 2


def test_negative_pairs_invariants(spark):
    """No self-pairs (cyclic-shift construction), no same-group pairs
    (dedup-aware exclusion), at most k per doc, and full partition
    invariance of the draw."""
    docs = spark.range(40).withColumnRenamed("id", "doc_id")
    # groups: docs 0-4 share group 0 (a near-dup cluster); rest singleton
    groups = docs.select(
        "doc_id",
        F.when(F.col("doc_id") < 5, F.lit(0)).otherwise(F.col("doc_id")).alias("group_id"),
    )
    out = corpus.negative_pairs(docs, groups, k=3).collect()
    assert all(r.doc_id != r.neg_id for r in out)
    gid = {r.doc_id: r.group_id for r in groups.collect()}
    assert all(gid[r.doc_id] != gid[r.neg_id] for r in out)
    from collections import Counter

    per_doc = Counter(r.doc_id for r in out)
    assert max(per_doc.values()) <= 3
    # most docs keep all 3 draws (only cluster collisions drop)
    assert sum(per_doc.values()) >= 40 * 3 - 5 * 3
    # deterministic across partitionings
    again = corpus.negative_pairs(docs.repartition(7), groups, k=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_negative_pairs_drops_cluster_mates_specifically(spark):
    """Crafted collision: with N=2 and k=1 every doc's only possible
    partner is the other doc; making them cluster mates must yield an
    EMPTY pair set rather than a self- or in-cluster pair."""
    docs = spark.createDataFrame([(10,), (11,)], "doc_id long")
    mates = spark.createDataFrame([(10, 1), (11, 1)], "doc_id long, group_id long")
    assert corpus.negative_pairs(docs, mates, k=1).count() == 0
    # and with distinct groups the same draw is admitted
    split = spark.createDataFrame([(10, 1), (11, 2)], "doc_id long, group_id long")
    got = {(r.doc_id, r.neg_id) for r in corpus.negative_pairs(docs, split, k=1).collect()}
    assert got == {(10, 11), (11, 10)}


def test_negative_pairs_degenerate_corpus_is_defined_empty(spark):
    """A corpus of < 2 docs has no drawable partner: the explicit
    N >= 2 guard makes the result DEFINED EMPTY instead of relying on
    Spark's silent NULL-on-mod-zero (which strict engines error on —
    ADVICE r6)."""
    one = spark.createDataFrame([(5,)], "doc_id long")
    grp = spark.createDataFrame([(5, 5)], "doc_id long, group_id long")
    assert corpus.negative_pairs(one, grp, k=3).count() == 0
    empty = one.filter(F.lit(False))
    assert corpus.negative_pairs(empty, grp, k=3).count() == 0


def test_balanced_oversample_exact_class_totals(spark):
    """Every class's replicated row count equals EXACTLY the majority
    class count; per-doc copy counts differ by at most one within a
    class; deterministic across partitionings."""
    rows = (
        [(i, "big") for i in range(17)]
        + [(100 + i, "mid") for i in range(5)]
        + [(200 + i, "tiny") for i in range(3)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = corpus.balanced_oversample(df).collect()
    from collections import Counter

    per_class = Counter(r.lang for r in out)
    assert per_class == {"big": 17, "mid": 17, "tiny": 17}
    per_doc = Counter((r.lang, r.doc_id) for r in out)
    for lang in ("big", "mid", "tiny"):
        counts = [c for (lg, _), c in per_doc.items() if lg == lang]
        assert max(counts) - min(counts) <= 1
    # copy_id is 1..n_copies per doc
    seen = {}
    for r in out:
        seen.setdefault((r.lang, r.doc_id), []).append(r.copy_id)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in seen.values())
    again = corpus.balanced_oversample(df.repartition(5)).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_bm25_hand_computed(spark):
    """Pin the BM25 semantics on a corpus small enough to compute by
    hand in exact Python floats: rational-odds idf, k1=1.2, b=0.75,
    query-by-example with the query doc excluded from its own
    results."""
    rows = [
        (0, "spark sql engine"),
        (1, "spark spark runtime"),
        (2, "sql planner"),
        (3, "vector index"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = corpus.bm25_topk(df, [0], k=10).collect()
    docs = {i: t.split() for i, t in rows}
    N, T = 4, sum(len(w) for w in docs.values())
    dfreq = {}
    for ws in docs.values():
        for t in set(ws):
            dfreq[t] = dfreq.get(t, 0) + 1

    import decimal

    def score(q, d):
        s = decimal.Decimal(0)
        for t in set(docs[q]):
            tf = docs[d].count(t)
            if tf == 0:
                continue
            idf = float(2 * (N - dfreq[t]) + 1) / float(2 * dfreq[t] + 1)
            term = idf * (float(tf) * 2.2) / (
                float(tf) + float(3 * T + 9 * len(docs[d]) * N) / float(10 * T)
            )
            # mirror the engine's decimal(28,6) per-term cast (half-up)
            s += decimal.Decimal(repr(term)).quantize(
                decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
            )
        return float(s)

    got = {(r.query_doc, r.doc_id): (r.rank, r.bm25) for r in out}
    # docs 1 (shares 'spark') and 2 (shares 'sql') score; doc 3 shares
    # nothing and must be absent
    assert set(got) == {(0, 1), (0, 2)}
    expect = sorted(
        ((score(0, d), d) for d in (1, 2)), key=lambda x: (-x[0], x[1])
    )
    for rank, (sc, d) in enumerate(expect, start=1):
        assert got[(0, d)][0] == rank
        assert abs(got[(0, d)][1] - sc) < 1e-9, (d, got[(0, d)][1], sc)


def test_span_corruption_invariants(spark):
    """Spans never overlap (one per disjoint window), sit fully inside
    the document, mask exactly span tokens of every full window (15%
    at 3/20), match the actual token slice, and are partition-
    invariant."""
    rows = [
        (1, " ".join(f"w{i}" for i in range(50))),   # 2 full + 1 partial(10) windows
        (2, " ".join(f"x{i}" for i in range(2))),    # too short: no spans
        (3, " ".join(f"y{i}" for i in range(21))),   # full + partial(1): 1 span
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = corpus.span_corruption_plan(df).collect()
    toks = {i: t.split() for i, t in rows}
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 2 not in by_doc
    assert len(by_doc[1]) == 3 and len(by_doc[3]) == 1
    for d, spans in by_doc.items():
        seen = set()
        for r in spans:
            span_range = range(r.start_pos, r.start_pos + r.span_len)
            # inside the doc and inside its own window
            assert r.start_pos >= r.span_id * 20 + 1
            assert r.start_pos + r.span_len - 1 <= min((r.span_id + 1) * 20, len(toks[d]))
            assert not (set(span_range) & seen)
            seen.update(span_range)
            assert r.masked_text == " ".join(
                toks[d][r.start_pos - 1 : r.start_pos - 1 + r.span_len]
            )
    again = corpus.span_corruption_plan(df.repartition(5)).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_span_corruption_plan_is_shuffle_free(spark):
    """The whole plan must be map-side: no Exchange anywhere."""
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.array([F.lit(f"t{i}") for i in range(25)])).alias("text"),
    )
    plan = (
        corpus.span_corruption_plan(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_BM_WORDS = ["aa", "bb", "cc", "dd", "ee"]


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_BM_WORDS), min_size=1, max_size=6),
        min_size=2,
        max_size=8,
    )
)
def test_bm25_matches_python_reference_property(spark, docs):
    """BM25 on arbitrary tiny corpora must match an independent Python
    reference bit-for-bit (same decimal per-term rounding) — including
    total-vocabulary overlap, repeated tokens, and docs sharing nothing
    with the query."""
    import decimal

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = corpus.bm25_topk(df, [0], k=100).collect()
    toks = {i: ws for i, ws in enumerate(docs)}
    N, T = len(docs), sum(len(w) for w in toks.values())
    dfreq = {}
    for ws in toks.values():
        for t in set(ws):
            dfreq[t] = dfreq.get(t, 0) + 1

    def score(q, d):
        s = decimal.Decimal(0)
        for t in set(toks[q]):
            tf = toks[d].count(t)
            if tf == 0:
                continue
            idf = float(2 * (N - dfreq[t]) + 1) / float(2 * dfreq[t] + 1)
            term = idf * (float(tf) * 2.2) / (
                float(tf) + float(3 * T + 9 * len(toks[d]) * N) / float(10 * T)
            )
            s += decimal.Decimal(repr(term)).quantize(
                decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
            )
        return s

    want = {
        d: score(0, d)
        for d in toks
        if d != 0 and set(toks[0]) & set(toks[d])
    }
    got = {r.doc_id: (r.rank, r.bm25) for r in out}
    assert set(got) == set(want)
    order = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    for rank, (d, sc) in enumerate(order, start=1):
        assert got[d][0] == rank, (d, got[d], rank)
        assert abs(got[d][1] - float(sc)) < 1e-9


def test_lm_backoff_score_known_vs_backoff_paths(spark):
    """Hand-computed Stupid Backoff on a 3-doc corpus: bigrams clearing
    min_count score c2/c1(w1); the rare (a,z) transition falls through
    to 0.4 * c1(z)/T. Exact arithmetic, both paths exercised."""
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a b a b"), (3, "a z")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in corpus.lm_backoff_score(df, min_count=3).collect()}
    # c2(a,b)=5 known, c2(b,a)=3 known, c2(a,z)=1 backoff
    # c1: a=6, b=5, z=1; T=12
    assert (got[1].n_transitions, got[1].n_backoff) == (5, 0)
    assert got[1].lm_score == pytest.approx((3 * (5 / 6) + 2 * (3 / 5)) / 5, abs=1e-9)
    assert (got[3].n_transitions, got[3].n_backoff) == (1, 1)
    assert got[3].lm_score == pytest.approx(2 * 1 / (5 * 12), abs=1e-12)


def test_substring_dup_census_interval_union(spark):
    """Coverage is the UNION of duplicated 5-gram spans (overlaps not
    double-counted), within-doc repeats count as duplication, and
    dup-free docs still appear with fraction 0."""
    df = spark.createDataFrame(
        [
            (1, "p q r s t u v w"),   # identical to doc 2
            (2, "p q r s t u v w"),
            (3, "n1 n2 n3 n4 n5 n6 n7 n8"),  # unique
            (4, "m1 m2 m3 m4 m5 z m1 m2 m3 m4 m5"),  # self-repeat
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in corpus.substring_dup_census(df, k=5).collect()}
    # docs 1/2: all 4 grams dup; overlapping spans union to all 8 tokens
    assert (got[1].dup_tokens, got[1].dup_fraction) == (8, 1.0)
    assert (got[2].dup_tokens, got[2].dup_fraction) == (8, 1.0)
    assert (got[3].dup_tokens, got[3].dup_fraction) == (0, 0.0)
    # doc 4: gram m1..m5 occurs at s=1 and s=7 -> spans [1,6) u [7,12)
    assert got[4].n_tokens == 11 and got[4].dup_tokens == 10
    assert got[4].dup_fraction == pytest.approx(10 / 11)
    # hashed production mode: identical census, 8-byte shuffle key
    hashed = {
        r.doc_id: r.dup_tokens
        for r in corpus.substring_dup_census(df, k=5, hashed=True).collect()
    }
    assert hashed == {d: r.dup_tokens for d, r in got.items()}


def test_dsir_importance_hand_computed(spark):
    """Hand-computed DSIR mean likelihood ratios on a 2-doc corpus with
    doc 1 as the target domain: target-like bigrams score (ct+1)/(cr+1)
    * (Tr+V)/(Tt+V); unseen-in-target bigrams land near the smoothing
    floor. Hashed production mode preserves the target>raw ordering."""
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "x y x y")], "doc_id long, text string"
    )
    tgt = df.filter("doc_id = 1")
    got = {r.doc_id: r for r in corpus.dsir_importance(df, tgt).collect()}
    # raw: ab=2, ba=1, xy=2, yx=1 -> Tr=6, V=4; tgt: ab=2, ba=1 -> Tt=3
    assert got[1].n_transitions == 3 and got[2].n_transitions == 3
    assert got[1].dsir_weight == pytest.approx(10 / 7, abs=1e-9)
    assert got[2].dsir_weight == pytest.approx((2 * 10 / 21 + 5 / 7) / 3, abs=1e-9)
    hashed = {
        r.doc_id: r.dsir_weight
        for r in corpus.dsir_importance(df, tgt, hashed_buckets=8192).collect()
    }
    assert hashed[1] > hashed[2]


def test_new_corpus_ops_scale_plan_invariants(spark):
    """Scale-shape assertions for the round-7 operators (RUNBOOK §3):
    no unpartitioned window anywhere, no CartesianProduct (the only
    nested-loop joins allowed are one-row broadcast scalar frames),
    and the substring census's interval-union window is doc-bucketed."""
    from data_warehouse_implementation_spark.session import load_tables

    t = load_tables(spark, "/root/testdata/sf0.001")
    docs = t["documents"]
    plans = {
        "lm_backoff": corpus.lm_backoff_score(docs),
        "substring_dup": corpus.substring_dup_census(docs),
        "dsir": corpus.dsir_importance(docs, docs.filter(F.col("lang") == "en")),
    }
    for name, df in plans.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        for line in plan.splitlines():
            if "windowspecdefinition(" in line:
                assert "doc_id" in line, f"{name}: unpartitioned window:\n{line}"


# ---------------------------------------------------------------------------
# Property differential: substring_dup_census vs a pure-Python reference
# (interval-union edge cases: overlapping/adjacent/nested spans, within-
# doc repeats, docs shorter than k, single-token alphabets).

from hypothesis import HealthCheck as _HC2
from hypothesis import given as _given2
from hypothesis import settings as _settings2
from hypothesis import strategies as _st2

_census_corpus = _st2.lists(
    _st2.lists(_st2.sampled_from("abcd"), min_size=0, max_size=14).map(
        lambda ws: " ".join(ws)
    ),
    min_size=1,
    max_size=8,
)


def _census_ref(texts: list[str], k: int) -> dict[int, tuple[int, int]]:
    """Brute-force duplicated-k-gram coverage: count every positional
    k-gram corpus-wide, then per doc union the spans of grams occurring
    >= 2 times."""
    from collections import Counter

    toks = {i: t.split() for i, t in enumerate(texts)}
    counts = Counter(
        tuple(ws[i : i + k])
        for ws in toks.values()
        for i in range(len(ws) - k + 1)
    )
    out = {}
    for d, ws in toks.items():
        if len(ws) < k:
            continue
        covered = set()
        for i in range(len(ws) - k + 1):
            if counts[tuple(ws[i : i + k])] >= 2:
                covered.update(range(i, i + k))
        out[d] = (len(ws), len(covered))
    return out


@_settings2(
    max_examples=12,
    deadline=None,
    suppress_health_check=[_HC2.function_scoped_fixture],
)
@_given2(corpus=_census_corpus, k=_st2.integers(min_value=2, max_value=4))
def test_substring_dup_census_matches_brute_force(spark, corpus, k):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    ).repartition(3)
    got = {
        r.doc_id: (r.n_tokens, r.dup_tokens)
        for r in corpus_ops_census(df, k)
    }
    assert got == _census_ref(corpus, k)


def corpus_ops_census(df, k):
    return corpus.substring_dup_census(df, k=k).collect()


def test_substring_dedup_first_occurrence_survives(spark):
    """The removal policy: corpus-wide first occurrence of a duplicated
    5-gram keeps its span; later copies (cross-doc AND within-doc) lose
    exactly the duplicated positions; sub-k docs pass through."""
    df = spark.createDataFrame(
        [
            (1, "a b c d e x1 x2 x3"),          # owns "a b c d e"
            (2, "z1 z2 a b c d e z3"),          # later copy -> span removed
            (3, "m1 m2 m3 m4 m5 m1 m2 m3 m4 m5"),  # within-doc repeat
            (4, "q1 q2"),                        # sub-k: untouched
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in corpus.substring_dedup(df, k=5).collect()}
    assert (got[1].n_removed, got[1].cleaned_text) == (0, "a b c d e x1 x2 x3")
    assert (got[2].n_removed, got[2].cleaned_text) == (5, "z1 z2 z3")
    assert (got[3].n_removed, got[3].cleaned_text) == (5, "m1 m2 m3 m4 m5")
    assert (got[4].n_removed, got[4].cleaned_text) == (0, "q1 q2")
    assert got[3].n_tokens == 10


# ---------------------------------------------------------------------------
# Property differentials: lm_backoff_score and dsir_importance vs
# pure-Python references (shared bigram plumbing, different pooling).


def _bigrams(ws):
    return list(zip(ws, ws[1:]))


def _lm_ref(texts, min_count):
    from collections import Counter

    toks = {i: t.split() for i, t in enumerate(texts)}
    c1 = Counter(w for ws in toks.values() for w in ws)
    T = sum(c1.values())
    c2 = Counter(bg for ws in toks.values() for bg in _bigrams(ws))
    out = {}
    for d, ws in toks.items():
        bgs = _bigrams(ws)
        if not bgs:
            continue
        terms, backoff = [], 0
        for w1, w2 in bgs:
            if c2[(w1, w2)] >= min_count:
                terms.append(c2[(w1, w2)] / c1[w1])
            else:
                backoff += 1
                terms.append((2 * c1[w2]) / (5 * T))
        out[d] = (len(bgs), backoff, sum(terms) / len(bgs))
    return out


def _dsir_ref(texts, target_ids):
    from collections import Counter

    toks = {i: t.split() for i, t in enumerate(texts)}
    raw = Counter(bg for ws in toks.values() for bg in _bigrams(ws))
    tgt = Counter(
        bg for d, ws in toks.items() if d in target_ids for bg in _bigrams(ws)
    )
    Tr, V, Tt = sum(raw.values()), len(raw), sum(tgt.values())
    out = {}
    for d, ws in toks.items():
        bgs = _bigrams(ws)
        if not bgs:
            continue
        terms = [
            ((tgt[bg] + 1) / (raw[bg] + 1)) * ((Tr + V) / (Tt + V)) for bg in bgs
        ]
        out[d] = (len(bgs), sum(terms) / len(bgs))
    return out


@_settings2(
    max_examples=10,
    deadline=None,
    suppress_health_check=[_HC2.function_scoped_fixture],
)
@_given2(texts=_census_corpus, min_count=_st2.integers(min_value=1, max_value=3))
def test_lm_backoff_matches_brute_force(spark, texts, min_count):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(3)
    got = {
        r.doc_id: (r.n_transitions, r.n_backoff, r.lm_score)
        for r in corpus.lm_backoff_score(df, min_count=min_count).collect()
    }
    ref = _lm_ref(texts, min_count)
    assert set(got) == set(ref)
    for d in ref:
        assert got[d][:2] == ref[d][:2], d
        assert got[d][2] == pytest.approx(ref[d][2], abs=1e-9), d


@_settings2(
    max_examples=10,
    deadline=None,
    suppress_health_check=[_HC2.function_scoped_fixture],
)
@_given2(texts=_census_corpus)
def test_dsir_matches_brute_force(spark, texts):
    target_ids = {i for i in range(len(texts)) if i % 2 == 0}
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(3)
    got = {
        r.doc_id: (r.n_transitions, r.dsir_weight)
        for r in corpus.dsir_importance(
            df, df.filter(F.col("doc_id") % 2 == 0)
        ).collect()
    }
    ref = _dsir_ref(texts, target_ids)
    assert set(got) == set(ref)
    for d in ref:
        assert got[d][0] == ref[d][0], d
        assert got[d][1] == pytest.approx(ref[d][1], abs=1e-9), d


def test_round7_operators_on_degenerate_inputs(spark):
    """Empty and sub-threshold corpora produce defined, empty (or
    pass-through) results — no mod-zero, no window-over-nothing."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert corpus.lm_backoff_score(empty).count() == 0
    assert corpus.substring_dup_census(empty).count() == 0
    assert corpus.substring_dedup(empty).count() == 0
    assert corpus.dsir_importance(empty, empty).count() == 0
    one_word = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    assert corpus.lm_backoff_score(one_word).count() == 0  # no transition
    r = corpus.substring_dedup(one_word, k=5).collect()
    assert [(x.doc_id, x.n_removed, x.cleaned_text) for x in r] == [(1, 0, "solo")]


def test_epoch_shuffle_is_permutation_and_epoch_sensitive(spark):
    df = spark.range(500).withColumnRenamed("id", "doc_id").repartition(7)
    e1 = {r.doc_id: r.position for r in corpus.epoch_shuffle(df, epoch=1).collect()}
    e2 = {r.doc_id: r.position for r in corpus.epoch_shuffle(df, epoch=2).collect()}
    assert sorted(e1.values()) == list(range(1, 501))  # a true permutation
    assert sorted(e2.values()) == list(range(1, 501))
    assert e1 != e2  # different epoch, different order
    # reproducible across partitionings
    again = {
        r.doc_id: r.position
        for r in corpus.epoch_shuffle(df.repartition(3), epoch=1).collect()
    }
    assert again == e1


def test_length_bucketed_batches_homogeneous_and_budgeted(spark):
    rows = [(i, "w " * (3 + (i * 17) % 60)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = corpus.length_bucketed_batches(
        df, token_budget=100, bucket_width_tokens=16
    ).collect()
    assert len(out) == 300
    from collections import defaultdict

    batches = defaultdict(list)
    for r in out:
        assert r.len_bucket == r.n_tokens // 16  # bucket homogeneity
        batches[(r.len_bucket, r.batch_idx)].append(r.n_tokens)
    for (_, _), sizes in batches.items():
        # a batch starts before the budget line: its first doc begins
        # below budget*(idx+1); total overshoot bounded by one doc
        assert sum(sizes) <= 100 + max(sizes)
    # batch indices contiguous from 0 within each bucket
    by_bucket = defaultdict(set)
    for lb, bi in batches:
        by_bucket[lb].add(bi)
    for idxs in by_bucket.values():
        assert idxs == set(range(max(idxs) + 1))


def test_shard_by_token_budget_sparse_hashed_ids(spark):
    """Sparse int64 ids spanning the full hash range must shard
    correctly (derived-width bucketing) — the fixed id/256 bucket would
    give every row its own bucket and serialize the offsets pass."""
    df = (
        spark.range(400)
        .select(
            F.xxhash64(F.col("id").cast("string")).alias("doc_id"),
            F.lit("a b c d e").alias("text"),
        )
        .repartition(5)
    )
    out = corpus.shard_by_token_budget(df, budget=50, bucket_width=16).collect()
    assert len(out) == 400
    running = 0
    for r in sorted(out, key=lambda r: r.doc_id):
        assert r.token_start == running
        assert r.shard_id == running // 50
        running += r.n_tokens


def test_substring_dedup_canonical_overlap_keeps(spark):
    """A position covered by BOTH a canonical and a non-canonical span
    is KEPT (canonical wins): doc 1 owns gram 'a b c d e' (positions
    1-5) but carries a later copy of doc 0's 'c d e f g' (positions
    3-7) — only the positions covered SOLELY by the non-canonical span
    (6-7) are removed."""
    df = spark.createDataFrame(
        [
            (0, "c d e f g q1 q2"),   # owns "c d e f g"
            (1, "a b c d e f g"),     # owns "a b c d e"; later copy of g2
            (3, "a b c d e r1 r2"),   # later copy of "a b c d e"
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in corpus.substring_dedup(df, k=5).collect()}
    assert (got[0].n_removed, got[0].cleaned_text) == (0, "c d e f g q1 q2")
    assert (got[1].n_removed, got[1].cleaned_text) == (2, "a b c d e")
    assert (got[3].n_removed, got[3].cleaned_text) == (5, "r1 r2")


def _substring_dedup_ref(texts, k):
    """Pure-Python replay of the removal policy: canonical occurrence =
    min (doc, s) per duplicated gram; position removed iff covered and
    never by a canonical occurrence."""
    from collections import Counter, defaultdict

    toks = {i: t.split() for i, t in enumerate(texts)}
    occ = [
        (d, s, tuple(ws[s : s + k]))
        for d, ws in toks.items()
        for s in range(len(ws) - k + 1)
    ]
    counts = Counter(g for _, _, g in occ)
    first = {}
    for d, s, g in sorted(occ):
        if counts[g] >= 2 and g not in first:
            first[g] = (d, s)
    removed = defaultdict(set)
    kept_cover = defaultdict(set)
    for d, s, g in occ:
        if counts[g] < 2:
            continue
        span = set(range(s, s + k))
        if first[g] == (d, s):
            kept_cover[d] |= span
        else:
            removed[d] |= span
    out = {}
    for d, ws in toks.items():
        if not ws:
            continue
        dead = removed[d] - kept_cover[d]
        out[d] = (
            len(ws),
            len(dead),
            " ".join(w for i, w in enumerate(ws) if i not in dead),
        )
    return out


@_settings2(
    max_examples=10,
    deadline=None,
    suppress_health_check=[_HC2.function_scoped_fixture],
)
@_given2(texts=_census_corpus, k=_st2.integers(min_value=2, max_value=4))
def test_substring_dedup_matches_brute_force(spark, texts, k):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(3)
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_text)
        for r in corpus.substring_dedup(df, k=k).collect()
    }
    assert got == _substring_dedup_ref(texts, k)


def test_lm_backoff_external_reference_and_oov_exclusion(spark):
    """Scoring against an EXTERNAL reference corpus: known bigrams use
    the reference conditionals, reference-vocabulary transitions back
    off to the reference unigram, and transitions with OOV tokens are
    EXCLUDED from the score entirely (documented caveat — there is no
    count to back off to)."""
    ref = spark.createDataFrame(
        [(100, "a b a b a b"), (101, "b c b c")], "doc_id long, text string"
    )
    # doc 1: (a,b) known in ref; (b,z) has OOV z -> excluded
    df = spark.createDataFrame([(1, "a b z")], "doc_id long, text string")
    got = corpus.lm_backoff_score(df, min_count=3, reference=ref).collect()
    assert len(got) == 1
    r = got[0]
    # ref counts: c2(a,b)=3 (known at min_count=3), c1(a)=3
    assert (r.n_transitions, r.n_backoff) == (1, 0)
    assert r.lm_score == pytest.approx(3 / 3, abs=1e-12)
    # a doc made ENTIRELY of OOV transitions is absent from the output
    oov = spark.createDataFrame([(2, "x y x")], "doc_id long, text string")
    assert corpus.lm_backoff_score(oov, min_count=3, reference=ref).count() == 0
    # in-vocab but unseen-bigram transitions back off to the ref unigram
    bo = spark.createDataFrame([(3, "a c")], "doc_id long, text string")
    row = corpus.lm_backoff_score(bo, min_count=3, reference=ref).collect()[0]
    # (a,c) never occurs in ref -> backoff = 0.4 * c1(c)/T = 2*2/(5*10)
    assert (row.n_transitions, row.n_backoff) == (1, 1)
    assert row.lm_score == pytest.approx(2 * 2 / (5 * 10), abs=1e-12)


def test_cap_per_key_two_phase_matches_direct_window(spark):
    """cap_per_key (round 10, VERDICT r9 #5): the two-phase per-key
    rank (hash-range buckets -> within-bucket row_number -> per-key
    bucket offsets) must equal a DIRECT row_number over (key ORDER BY
    hash, id) on a skewed frame — one hot key with 50 members, several
    cold ones — and must be invariant to the input partitioning (the
    determinism the backfill story rests on)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_warehouse_implementation_spark.operators import corpus

    rows = [(i, "hot") for i in range(50)] + [
        (100 + i, f"cold{i % 3}") for i in range(9)
    ]
    # NULL keys are a real group in the window replay: they must be
    # CAPPED like any other key, never silently dropped (the offsets
    # join is null-safe — round-10 review finding)
    rows += [(200 + i, None) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    cap = 7
    got = {
        (r.doc_id, r.key_rank)
        for r in corpus.cap_per_key(
            df, key_col="source", max_docs=cap, rank_buckets=8
        ).collect()
    }
    h = ((F.col("doc_id") % corpus.HASH_P) * corpus.SPLIT_A + corpus.SPLIT_B) % corpus.HASH_P
    direct = {
        (r.doc_id, r.key_rank)
        for r in df.withColumn(
            "key_rank",
            F.row_number()
            .over(Window.partitionBy("source").orderBy(h, "doc_id"))
            .cast("long"),
        )
        .filter(F.col("key_rank") <= cap)
        .collect()
    }
    assert got == direct
    # cold keys under the cap keep everything; the hot key keeps
    # exactly cap; the NULL-key group is capped too (12 rows -> cap)
    assert sum(1 for d, _ in got if 100 <= d < 200) == 9
    assert sum(1 for d, _ in got if d < 100) == cap
    assert sum(1 for d, _ in got if d >= 200) == cap
    # partitioning invariance
    repart = {
        (r.doc_id, r.key_rank)
        for r in corpus.cap_per_key(
            df.repartition(13), key_col="source", max_docs=cap, rank_buckets=8
        ).collect()
    }
    assert repart == got


def test_cap_per_key_priority_keeps_best(spark):
    """cap_per_key(priority_col=...) — the RefinedWeb variant: keep the
    BEST max_docs per key (priority desc, hash/id tie-break), computed
    through the derived-width-bucket two-phase rank. Must equal the
    direct window and stay partition-invariant; the kept set is the
    top-priority members, not a random subset."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_warehouse_implementation_spark.operators import corpus

    rows = [(i, "hot", float((i * 37) % 101) / 101.0) for i in range(50)] + [
        (100 + i, f"cold{i % 3}", 0.5) for i in range(9)  # equal priorities: hash ties
    ]
    # NULL priorities rank LAST (both engines' DESC-nulls-last window
    # convention) — never first (round-10 review finding: the bucket
    # sentinel used to place them ahead of every real priority)
    rows += [(300 + i, "hot", None) for i in range(3)]
    # a key with FEWER scored docs than the cap: its NULL-priority rows
    # must fill the remainder ranked by (hash, id) ACROSS the
    # hash-range sub-buckets of the NULL group (round-10 review: one
    # monolithic NULL bucket would serialize a hot unscored key)
    rows += [(400 + i, "sparse", 0.9 - i * 0.1) for i in range(4)]
    rows += [(500 + i, "sparse", None) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, source string, quality double")
    cap = 7
    got = {
        (r.doc_id, r.key_rank)
        for r in corpus.cap_per_key(
            df, key_col="source", max_docs=cap, priority_col="quality",
            priority_buckets=16,
        ).collect()
    }
    h = ((F.col("doc_id") % corpus.HASH_P) * corpus.SPLIT_A + corpus.SPLIT_B) % corpus.HASH_P
    direct = {
        (r.doc_id, r.key_rank)
        for r in df.withColumn(
            "key_rank",
            F.row_number()
            .over(
                Window.partitionBy("source").orderBy(
                    F.col("quality").desc(), h.asc(), F.col("doc_id")
                )
            )
            .cast("long"),
        )
        .filter(F.col("key_rank") <= cap)
        .collect()
    }
    assert got == direct
    # the hot key kept exactly its 7 highest-quality NON-NULL members;
    # the null-priority rows ranked behind all 50 real ones
    hot_kept = {d for d, _ in got if d < 100 or 300 <= d < 400}
    top_quality = sorted(
        (q, d) for d, s, q in rows if s == "hot" and q is not None
    )[-cap:]
    assert hot_kept == {d for _, d in top_quality}
    assert not any(300 <= d < 400 for d, _ in got)
    # the sparse key kept its 4 scored docs at ranks 1-4 and exactly 3
    # NULL-priority fills behind them
    sparse_kept = {(d, r) for d, r in got if d >= 400}
    assert {r for d, r in sparse_kept if d < 500} == {1, 2, 3, 4}
    assert sum(1 for d, _ in sparse_kept if d >= 500) == cap - 4
    repart = {
        (r.doc_id, r.key_rank)
        for r in corpus.cap_per_key(
            df.repartition(11), key_col="source", max_docs=cap,
            priority_col="quality", priority_buckets=16,
        ).collect()
    }
    assert repart == got


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=60),  # doc_id (deduped below)
            st.sampled_from(["a", "b", None]),       # key incl. NULL group
            st.one_of(st.none(), st.sampled_from([0.0, 0.25, 0.5, 0.75, 1.0])),
        ),
        min_size=1,
        max_size=40,
    ).map(lambda rs: list({r[0]: r for r in rs}.values())),
    cap=st.integers(min_value=1, max_value=6),
)
def test_cap_per_key_hypothesis_matches_direct_window(spark, rows, cap):
    """Property differential (the repo's signature pattern): on random
    frames — duplicate priorities, NULL keys, NULL priorities, keys
    above and below the cap — cap_per_key's two-phase rank must equal
    the plain window replay in BOTH modes, with tiny bucket counts
    forcing multi-bucket offsets paths."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_warehouse_implementation_spark.operators import corpus

    df = spark.createDataFrame(rows, "doc_id long, source string, quality double")
    h = ((F.col("doc_id") % corpus.HASH_P) * corpus.SPLIT_A + corpus.SPLIT_B) % corpus.HASH_P

    got_hash = {
        (r.doc_id, r.key_rank)
        for r in corpus.cap_per_key(
            df, key_col="source", max_docs=cap, rank_buckets=4
        ).collect()
    }
    want_hash = {
        (r.doc_id, r.key_rank)
        for r in df.withColumn(
            "key_rank",
            F.row_number()
            .over(Window.partitionBy("source").orderBy(h, "doc_id"))
            .cast("long"),
        )
        .filter(F.col("key_rank") <= cap)
        .collect()
    }
    assert got_hash == want_hash

    got_best = {
        (r.doc_id, r.key_rank)
        for r in corpus.cap_per_key(
            df, key_col="source", max_docs=cap,
            priority_col="quality", rank_buckets=4, priority_buckets=4,
        ).collect()
    }
    want_best = {
        (r.doc_id, r.key_rank)
        for r in df.withColumn(
            "key_rank",
            F.row_number()
            .over(
                Window.partitionBy("source").orderBy(
                    F.col("quality").desc(), h, F.col("doc_id")
                )
            )
            .cast("long"),
        )
        .filter(F.col("key_rank") <= cap)
        .collect()
    }
    assert got_best == want_best


def test_pack_sequences_bfd_invariants_and_reference_equality(spark):
    """VERDICT r11 #7: the distributed best-fit-decreasing packer must
    (a) never fill a sequence past the budget (the property the
    contiguous cut lacks), (b) assign every chunk exactly once, and
    (c) reproduce the sequential reference greedy (longest-first,
    tightest-fitting-bin, new bin last) within each contiguous
    rank group, bit for bit."""
    from data_warehouse_implementation_spark.operators import corpus

    lens = [50, 33, 64, 10, 31, 32, 5, 70, 18, 27, 64, 3, 3, 3, 41]
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(lens)],
        "doc_id long, text string",
    )
    budget, size, group = 64, 32, 6
    out = corpus.pack_sequences_bfd(
        docs, seq_budget=budget, chunk_size=size, chunk_stride=size, group_size=group
    )
    rows = [(r.doc_id, r.chunk_id, r.n_chunk_tokens, r.seq_id) for r in out.collect()]

    # (a) no sequence over budget
    fills: dict[int, int] = {}
    for _, _, n, s in rows:
        fills[s] = fills.get(s, 0) + n
    assert all(f <= budget for f in fills.values()), fills

    # (b) exact partition of the chunk set
    chunks = []
    for d, n in enumerate(lens):
        s, cid = 1, 0
        while s <= n:
            chunks.append((d, cid, min(size, n - s + 1)))
            s += size
            cid += 1
    assert sorted((d, c) for d, c, _ in chunks) == sorted((d, c) for d, c, _, _ in rows)

    # (c) sequential reference replay
    order = sorted(chunks, key=lambda c: (-c[2], c[0], c[1]))
    ref = {}
    for g in range((len(order) + group - 1) // group):
        bins: list[int] = []
        for it in order[g * group : (g + 1) * group]:
            cands = [
                (-(bins[i] + it[2]), i)
                for i in range(len(bins))
                if bins[i] + it[2] <= budget
            ]
            if cands:
                _, i = min(cands)
                bins[i] += it[2]
                ref[(it[0], it[1])] = g * group + i
            else:
                bins.append(it[2])
                ref[(it[0], it[1])] = g * group + len(bins) - 1
    assert sorted(rows) == sorted((d, c, n, ref[(d, c)]) for d, c, n in chunks)


def test_pack_sequences_bfd_plan_no_global_sort(spark):
    """Scale invariant: the BFD rank is the two-phase global_rank —
    the executed plan must not contain a single-partition global Sort
    (rangepartitioning over the whole frame) feeding a window."""
    from data_warehouse_implementation_spark.operators import corpus

    docs = spark.createDataFrame(
        [(i, "w " * 40) for i in range(50)], "doc_id long, text string"
    )
    plan = (
        corpus.pack_sequences_bfd(docs, seq_budget=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" not in plan.lower().replace("(1)", ""), plan


def test_sequences_text_materializes_every_chunk_exactly_once(spark):
    """sequences_text invariants for BOTH packers: the concatenated
    sequence texts partition the chunk stream exactly (every chunk's
    words appear exactly once across all sequences), per-sequence
    n_tokens equals the text's word count, and the BFD variant never
    exceeds the budget."""
    from data_warehouse_implementation_spark.operators import corpus

    lens = [50, 33, 64, 10, 31, 32, 5]
    docs = spark.createDataFrame(
        [(i, " ".join([f"w{i}x{j}" for j in range(n)])) for i, n in enumerate(lens)],
        "doc_id long, text string",
    )
    for method in ("contiguous", "bfd"):
        out = corpus.sequences_text(
            docs, seq_budget=64, chunk_size=32, chunk_stride=32,
            method=method, group_size=4,
        ).collect()
        all_words: list[str] = []
        for r in out:
            words = r.text.split()
            assert len(words) == r.n_tokens, (method, r.seq_id)
            all_words.extend(words)
            if method == "bfd":
                assert r.n_tokens <= 64
        want = [w for i, n in enumerate(lens) for w in (f"w{i}x{j}" for j in range(n))]
        assert sorted(all_words) == sorted(want), method


def test_quantile_buckets_matches_direct_window(spark):
    """CCNet tercile bucketing (corpus.quantile_buckets) must equal the
    direct single-window formulation — per-key rank by (score DESC,
    id-hash, id), bucket = ((rank-1)*n) div group_size — and split
    every group into bands whose sizes differ by at most one."""
    rows = [
        (i, ["a", "b", "c"][i % 3], float((i * 37) % 11) / 7.0) for i in range(83)
    ]
    df = spark.createDataFrame(rows, "doc_id long, k string, s double")
    got = {
        r.doc_id: (r.key_rank, r.bucket_ix, r.bucket)
        for r in corpus.quantile_buckets(
            df.repartition(7),
            key_col="k",
            score_col="s",
            n_buckets=3,
            labels=["head", "middle", "tail"],
        ).collect()
    }
    from pyspark.sql.window import Window as W

    h = ((F.col("doc_id") % corpus.HASH_P) * corpus.SPLIT_A + corpus.SPLIT_B) % corpus.HASH_P
    direct = df.withColumn(
        "rk",
        F.row_number().over(W.partitionBy("k").orderBy(F.desc("s"), h, "doc_id")),
    ).withColumn("kn", F.count(F.lit(1)).over(W.partitionBy("k")))
    want = {}
    for r in direct.collect():
        bix = ((r.rk - 1) * 3) // r.kn
        want[r.doc_id] = (r.rk, bix, ["head", "middle", "tail"][bix])
    assert got == want
    # band sizes differ by at most one within every key
    from collections import Counter

    sizes = Counter((rows[i][1], got[i][1]) for i in range(83))
    for k in "abc":
        ns = [sizes[(k, b)] for b in range(3)]
        assert max(ns) - min(ns) <= 1, (k, ns)


def test_quantile_buckets_label_arity_checked(spark):
    df = spark.createDataFrame([(1, "a", 1.0)], "doc_id long, k string, s double")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="labels"):
        corpus.quantile_buckets(
            df, key_col="k", score_col="s", n_buckets=3, labels=["only", "two"]
        )


def test_mixture_schedule_interpolation_and_independence(spark):
    """Weights interpolate exactly between the recipes, the final epoch
    is uniform, rates cap at 100, and the epoch-salted hash draws
    INDEPENDENT samples (not nested subsets) across epochs."""
    rows = [(i, "web", "w " * 10) for i in range(300)] + [
        (1000 + i, "books", "w " * 10) for i in range(15)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kept = corpus.mixture_schedule(
        df,
        epochs=3,
        start_weights={"web": 9},
        end_weights={},
        token_budget=2000,
    )
    grid = {
        (r.epoch, r.source): (r.weight_num, r.rate_pct)
        for r in kept.select("epoch", "source", "weight_num", "rate_pct")
        .distinct()
        .collect()
    }
    # E=3: epoch 0 = start*2, epoch 1 = start+end, epoch 2 = end*2
    assert grid[(0, "web")][0] == 18 and grid[(0, "books")][0] == 2
    assert grid[(1, "web")][0] == 10 and grid[(1, "books")][0] == 2
    assert grid[(2, "web")][0] == 2 and grid[(2, "books")][0] == 2
    # web: 300 docs x 10 tokens; books: 15 x 10. epoch0 rates:
    # web = 2000*100*18 // (20*3000) = 60; books = 2000*100*2 // (20*150) = 133 -> cap 100
    assert grid[(0, "web")][1] == 60 and grid[(0, "books")][1] == 100
    # independence: epoch keep-sets must not be nested even where the
    # later epoch's rate is lower (web: 60 -> 41 -> 16)
    webs = {
        e: {r.doc_id for r in kept.filter(f"epoch = {e} and source = 'web'").collect()}
        for e in range(3)
    }
    assert grid[(1, "web")][1] < grid[(0, "web")][1]
    assert webs[1] - webs[0], "epoch-1 keeps are a subset of epoch-0 — hash not salted"
    # partition invariance
    again = corpus.mixture_schedule(
        df.repartition(11), epochs=3, start_weights={"web": 9},
        end_weights={}, token_budget=2000,
    )
    got1 = sorted((r.epoch, r.doc_id) for r in kept.select("epoch", "doc_id").collect())
    got2 = sorted((r.epoch, r.doc_id) for r in again.select("epoch", "doc_id").collect())
    assert got1 == got2


def test_mixture_schedule_rejects_single_epoch(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, "a", "w")], "doc_id long, source string, text string")
    with _pytest.raises(ValueError, match="epochs"):
        corpus.mixture_schedule(df, epochs=1, start_weights={}, end_weights={}, token_budget=10)


def test_temperature_and_schedule_keep_zero_token_sources(spark):
    """Review fix: a source whose documents are all empty has token
    total 0 — its rate must cap at 100 (target > actual, keep all),
    not silently NULL out of the keep filter via division by zero."""
    rows = [(1, "big", "w " * 10)] * 1 + [(2, "big", "w " * 10)] + [
        (3, "empty", "   "),
        (4, "empty", ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kept = corpus.mix_sources_temperature(df, token_budget=100)
    got = {r.doc_id: r.rate_pct for r in kept.collect()}
    assert got.get(3) == 100 and got.get(4) == 100
    sched = corpus.mixture_schedule(
        df, epochs=2, start_weights={}, end_weights={}, token_budget=100
    )
    g2 = {(r.epoch, r.doc_id) for r in sched.select("epoch", "doc_id").collect()}
    assert (0, 3) in g2 and (1, 4) in g2
