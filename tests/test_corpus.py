"""Unit tests for corpus-preparation operators (splitting, chunking,
sharding) — properties the oracle differential doesn't state directly."""

from __future__ import annotations

from pyspark.sql import functions as F

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
