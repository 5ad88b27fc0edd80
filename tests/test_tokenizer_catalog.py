"""Tokenizer artifact publish/apply through the catalog (VERDICT r13
#5): the deploy path every tokenizer ships through — train, persist the
vocab/merge table via WarehouseCatalog, encode a fresh corpus from the
PUBLISHED artifact — plus the version-pinned re-read story (replace ->
table_version -> rollback) for all three families."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_implementation_spark.operators import bpe, unigram, wordpiece
from data_warehouse_implementation_spark.sources.catalog import WarehouseCatalog

CORPUS_A = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox naps under the brown log"),
    (3, "lazy dogs nap while quick foxes jump"),
]
CORPUS_B = [
    (1, "completely different words appear here now"),
    (2, "different vocabularies train different merges"),
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_bpe_publish_roundtrip_and_version_pinned_reread(spark, tmp_path):
    docs_a = spark.createDataFrame(CORPUS_A, "doc_id long, text string")
    docs_b = spark.createDataFrame(CORPUS_B, "doc_id long, text string")
    cat = WarehouseCatalog(spark, str(tmp_path / "wh"))

    trained = bpe.bpe_train(docs_a, n_merges=6)
    cat.create_table_as("bpe_merges", trained)
    # round-trip: encode from the published artifact == encode from the
    # in-session trained frame
    fresh = _rows(bpe.bpe_encode(docs_a, trained))
    published = _rows(bpe.bpe_encode(docs_a, cat.table("bpe_merges")))
    assert published == fresh

    # retrain on a different corpus and REPLACE: the displaced artifact
    # must remain readable at its pinned version and still drive the
    # original encoding (the rollback-safety a model registry needs)
    cat.replace("bpe_merges", bpe.bpe_train(docs_b, n_merges=6))
    assert cat.versions("bpe_merges") == [1]
    v1 = cat.table_version("bpe_merges", 1)
    assert _rows(v1) == _rows(trained)
    assert _rows(bpe.bpe_encode(docs_a, v1)) == fresh
    # the CURRENT table now encodes differently (proves the replace
    # actually swapped contents — the re-read equality is not vacuous)
    assert _rows(bpe.bpe_encode(docs_a, cat.table("bpe_merges"))) != fresh
    # rollback restores v1 as current; the rollback itself is retained
    cat.rollback("bpe_merges", 1)
    assert _rows(bpe.bpe_encode(docs_a, cat.table("bpe_merges"))) == fresh


def test_wordpiece_publish_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame(CORPUS_A, "doc_id long, text string")
    cat = WarehouseCatalog(spark, str(tmp_path / "wh"))
    vocab = wordpiece.wordpiece_vocab(docs, wordpiece.wordpiece_train(docs, n_merges=6))
    cat.create_table_as("wp_vocab", vocab)
    wt = (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    fresh = _rows(wordpiece.wordpiece_encode_words(wt, vocab))
    published = _rows(wordpiece.wordpiece_encode_words(wt, cat.table("wp_vocab")))
    assert published == fresh


def test_unigram_publish_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame(CORPUS_A, "doc_id long, text string")
    cat = WarehouseCatalog(spark, str(tmp_path / "wh"))
    vocab = unigram.unigram_train(docs, em_rounds=2)
    cat.create_table_as("unigram_vocab", vocab)
    wt = unigram.word_table(docs)
    fresh = _rows(unigram.viterbi_segment(wt, vocab))
    published = _rows(unigram.viterbi_segment(wt, cat.table("unigram_vocab")))
    # IEEE doubles round-trip parquet bit-exactly, so the argmax
    # segmentations from the published probabilities are identical
    assert published == fresh
