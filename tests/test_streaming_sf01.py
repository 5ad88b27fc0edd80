"""Opt-in LARGE-SCALE streaming differential (VERDICT r9 #8): the
curation admission sink's batch parity is pytest-proven at toy scale in
``test_streaming_multimodal.py``; this re-proves it at sf0.1 (5,000
real documents, 10x the driver's correctness scale) under the staged-
cache mode, where the parity must be carried by the sink's parquet
STATE TABLES across micro-batches — not by anything session-cached.
Run with

    SPARK_GRAFT_SF01_ORACLE=1 python -m pytest tests/test_streaming_sf01.py
"""

from __future__ import annotations

import os

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SF01_ORACLE"),
    reason="sf0.1 streaming differential is opt-in (SPARK_GRAFT_SF01_ORACLE=1)",
)

SF_DIR = "/root/testdata/sf0.1"
BENCH_MAX_ID = 50
DECONTAM_N = 8
N_SHINGLE = 3
MINHASH_K = 16
LSH_BANDS = 8
LSH_ROWS = 2
THRESHOLD = 0.5


def test_curation_admission_sink_parity_at_sf01(spark, tmp_path, monkeypatch):
    """Two micro-batches of the REAL sf0.1 corpus (split by doc_id
    parity, so the planted near-duplicates straddle the batch boundary)
    through ``curation_admission_sink`` must equal the one-shot batch
    admission over the concatenated corpus, computed from the same
    operator expressions — quality ∧ clean ∧ not-near-dup-of-any-
    earlier-ADMITTED doc. Every rejection stage must fire at this
    scale (non-vacuous), including cross-batch duplicates."""
    from pyspark.sql import functions as F

    from data_warehouse_implementation_spark import streaming
    from data_warehouse_implementation_spark.operators import dedup
    from data_warehouse_implementation_spark.operators import text as text_ops
    from data_warehouse_implementation_spark.plans.corpus_queries import (
        FILTER_MAX_WORDS,
        FILTER_MIN_QUALITY,
        FILTER_MIN_WORDS,
    )
    from data_warehouse_implementation_spark.sources.catalog import WarehouseCatalog

    stage_dir = str(tmp_path / "stage")
    os.makedirs(stage_dir, exist_ok=True)
    monkeypatch.setenv("SPARK_GRAFT_STAGE_DIR", stage_dir)

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    benchmark = docs.filter(F.col("doc_id") < BENCH_MAX_ID)

    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, batch in enumerate(
        [docs.filter(F.col("doc_id") % 2 == 0), docs.filter(F.col("doc_id") % 2 == 1)]
    ):
        p = os.path.join(src, f"b{i}")
        batch.coalesce(1).write.parquet(p)
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (1_700_000_000 + 60 * i,) * 2)

    cat = WarehouseCatalog(spark, str(tmp_path / "wh"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = streaming.curation_admission_sink(
        stream,
        cat,
        "cur01",
        checkpoint=str(tmp_path / "ckpt"),
        benchmark=benchmark,
        min_words=FILTER_MIN_WORDS,
        max_words=FILTER_MAX_WORDS,
        min_quality=FILTER_MIN_QUALITY,
        decontam_n=DECONTAM_N,
        n_shingle=N_SHINGLE,
        k=MINHASH_K,
        bands=LSH_BANDS,
        rows=LSH_ROWS,
        threshold=THRESHOLD,
    )
    q.awaitTermination()

    got_admitted = {r.doc_id for r in cat.table("cur01_admitted").collect()}
    verdicts = {r.doc_id: r.stage for r in cat.table("cur01_verdicts").collect()}
    assert len(verdicts) == docs.count()

    # one-shot twin from the same operator expressions
    kept_q = (
        text_ops.quality_filter(
            docs,
            min_words=FILTER_MIN_WORDS,
            max_words=FILTER_MAX_WORDS,
            min_quality=FILTER_MIN_QUALITY,
        )
        .filter(F.col("verdict") == "kept")
        .select("doc_id")
    )
    bench_grams = (
        dedup.word_shingles(benchmark, n=DECONTAM_N).select("shingle").distinct()
    )
    contaminated = (
        dedup.word_shingles(docs.join(kept_q, "doc_id", "left_semi"), n=DECONTAM_N)
        .join(bench_grams, on="shingle", how="left_semi")
        .select("doc_id")
        .distinct()
        .unionByName(
            kept_q.join(benchmark.select("doc_id"), on="doc_id", how="left_semi")
        )
        .distinct()
    )
    survivors = docs.join(kept_q, "doc_id", "left_semi").join(
        contaminated, "doc_id", "left_anti"
    )
    tids = dedup.shingle_ids(
        dedup.word_shingles(survivors, n=N_SHINGLE), hashed=True
    ).localCheckpoint()
    bands_t = dedup.lsh_bands(
        dedup.minhash_signatures(tids, k=MINHASH_K), bands=LSH_BANDS, rows=LSH_ROWS
    ).localCheckpoint()
    b1_admitted = {r.doc_id for r in survivors.filter(F.col("doc_id") % 2 == 0).collect()}
    cands = (
        bands_t.filter(F.col("doc_id") % 2 == 1)
        .select(F.col("doc_id").alias("doc_a"), "band_id", "band_key")
        .join(
            bands_t.filter(F.col("doc_id") % 2 == 0)
            .select(F.col("doc_id").alias("doc_b"), "band_id", "band_key"),
            on=["band_id", "band_key"],
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    dup_b2 = {
        r.doc_a
        for r in dedup.pairwise_jaccard(cands, tids)
        .filter(F.col("jaccard") >= THRESHOLD)
        .collect()
    }
    b2_survivors = {
        r.doc_id for r in survivors.filter(F.col("doc_id") % 2 == 1).collect()
    }
    want_admitted = b1_admitted | (b2_survivors - dup_b2)
    assert got_admitted == want_admitted

    # every rejection stage must have fired at this scale — the parity
    # is non-vacuous (a cap/filter/dedup that never triggers proves
    # nothing about 10x behavior)
    from collections import Counter

    by_stage = Counter(verdicts.values())
    assert by_stage["admitted"] == len(want_admitted)
    assert by_stage["quality"] > 0
    assert by_stage["contaminated"] > 0
    assert by_stage["duplicate"] > 0, "no cross-batch near-duplicate fired at sf0.1"
    # duplicates recorded by the sink == the twin's verified set
    sink_dups = {d for d, s in verdicts.items() if s == "duplicate"}
    assert sink_dups == dup_b2

    # the state tables (parquet, not session cache) carry exactly the
    # admitted docs' shingle state
    state_docs = {
        r.doc_id for r in cat.table("cur01_tids").select("doc_id").distinct().collect()
    }
    assert state_docs == want_admitted


def test_stateful_sessionize_parity_at_sf01(spark, tmp_path):
    """Round 11: the deferred-emission sessionizer (gap-closed sessions
    held in state until the watermark passes ``last + gap``) re-proven
    at sf0.1 — 100,000 real events over 1,500 users replayed as three
    time-ordered micro-batches plus a watermark-flush sentinel must
    reproduce the batch lag+cumsum sessionizer exactly: same sessions,
    same seqs, same starts, same exact-cents values."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pandas as pd

    from data_warehouse_implementation_spark import streaming
    from data_warehouse_implementation_spark.plans import ingest_queries

    pdf = (
        pq.read_table(os.path.join(SF_DIR, "events.parquet"))
        .to_pandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    src = str(tmp_path / "sess_src_sf01")
    os.makedirs(src)
    n = len(pdf)
    cuts = [0, n // 3, 2 * n // 3, n]
    paths = []
    for i in range(3):
        p = os.path.join(src, f"chunk{i}.parquet")
        pq.write_table(
            pa.Table.from_pandas(pdf.iloc[cuts[i] : cuts[i + 1]], preserve_index=False), p
        )
        paths.append(p)
    sentinel = pdf.iloc[[n - 1]].copy()
    sentinel["user_id"] = -1
    sentinel["event_id"] = -1
    if pd.api.types.is_integer_dtype(sentinel["ts"]):
        sentinel["ts"] = sentinel["ts"] + 30 * 86400 * 1_000_000_000
    else:
        unit = sentinel["ts"].dtype
        sentinel["ts"] = (sentinel["ts"] + pd.Timedelta(days=30)).astype(unit)
    p = os.path.join(src, "chunk3.parquet")
    pq.write_table(pa.Table.from_pandas(sentinel, preserve_index=False), p)
    paths.append(p)
    for i, pth in enumerate(paths):
        os.utime(pth, (1_700_000_000 + 60 * i,) * 2)

    schema, is_nanos = streaming.events_stream_schema(spark, src)
    stream = streaming.normalize_event_ts(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        is_nanos,
    )
    streaming.run_to_memory(
        streaming.sessionize_stateful(stream), "sf01_sessions", output_mode="append"
    )
    got = {
        (r.user_id, r.session_seq): (r.n_events, r.session_start, r.session_value)
        for r in spark.table("sf01_sessions").filter("user_id >= 0").collect()
    }
    batch = ingest_queries.events_sessionize(
        {"events": spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))}
    )
    want = {
        (r.user_id, r.session_seq): (r.n_events, r.session_start, r.session_value)
        for r in batch.collect()
    }
    assert len(got) > 1000  # non-vacuous at this scale
    assert got == want
