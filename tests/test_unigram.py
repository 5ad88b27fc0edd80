"""Unigram-LM trainer/segmenter invariants (operators/unigram.py). The
end-to-end vocabulary values are oracle-checked in test_oracle.py
(``unigram_train`` / ``unigram_fertility_by_lang``); these pin the
Viterbi semantics — coverage, optimality, tie-breaks, and the
no-logarithm product-space determinism the cross-engine replay rests
on."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from data_warehouse_implementation_spark.operators import unigram


def _py_viterbi(word: str, probs: dict[str, float], L: int = 4):
    """Reference: exhaustive best segmentation by (product desc,
    earlier-longer-piece preference) — brute force over all
    compositions, replaying the DP's tie-break (at each position the
    smallest split point, i.e. the longest final piece, wins ties)."""
    n = len(word)
    best = [(-1.0, 0, ())]  # (neg product, j, path) per prefix
    for i in range(1, n + 1):
        cands = []
        for j in range(max(1, i - L + 1), i + 1):
            piece = word[j - 1 : i]
            np_, _, path = best[j - 1]
            cands.append((np_ * probs.get(piece, 0.0), j, path + (piece,)))
        cands.sort(key=lambda c: (c[0], c[1]))
        best.append(cands[0])
    return list(best[n][2]), -best[n][0]


def test_viterbi_matches_bruteforce_reference(spark):
    probs = {
        "a": 0.30, "b": 0.20, "c": 0.05, "ab": 0.25, "ba": 0.05,
        "bab": 0.20, "abc": 0.10, "cc": 0.15,
    }
    vocab = spark.createDataFrame(list(probs.items()), "piece string, prob double")
    words_ = ["abab", "ba", "aaab", "ccc", "abccc", "bababab", "c", "acbca"]
    wt = spark.createDataFrame([(w, 1) for w in words_], "word string, cnt long")
    got = {
        r.word: (list(r.pieces), r.n_pieces)
        for r in unigram.viterbi_segment(wt, vocab).collect()
    }
    for w in words_:
        pieces, _ = _py_viterbi(w, probs)
        assert got[w] == (pieces, len(pieces)), (w, got[w], pieces)


def test_viterbi_segmentation_reconstructs_and_is_optimal(spark):
    """Pieces must concatenate back to the word, and the chosen
    product must equal the true maximum over every composition."""
    probs = {"a": 0.4, "b": 0.1, "ab": 0.3, "bb": 0.2, "abb": 0.25}
    vocab = spark.createDataFrame(list(probs.items()), "piece string, prob double")
    words_ = ["abb", "abbabb", "bba"]
    wt = spark.createDataFrame([(w, 1) for w in words_], "word string, cnt long")
    rows = {r.word: list(r.pieces) for r in unigram.viterbi_segment(wt, vocab).collect()}

    def compositions(w):
        n = len(w)
        for cuts in itertools.product([0, 1], repeat=n - 1):
            parts, prev = [], 0
            for k, c in enumerate(cuts, start=1):
                if c:
                    parts.append(w[prev:k])
                    prev = k
            parts.append(w[prev:])
            yield parts

    import math

    for w in words_:
        assert "".join(rows[w]) == w
        got_p = math.prod(probs.get(p, 0.0) for p in rows[w])
        best_p = max(
            math.prod(probs.get(p, 0.0) for p in parts)
            for parts in compositions(w)
            if all(len(p) <= 4 for p in parts)
        )
        assert got_p == best_p, (w, rows[w], got_p, best_p)


def test_train_covers_all_characters_and_probs_are_exact_ratios(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the thematic cat"), (3, "mat mat mat")],
        "doc_id long, text string",
    )
    vocab = unigram.unigram_train(docs, em_rounds=2, seed_multi=10, keep_multi=6)
    rows = vocab.collect()
    pieces = {r.piece for r in rows}
    chars = set("".join("thecatsonmati"))
    assert chars <= pieces, chars - pieces  # single-char coverage survives pruning
    # probabilities are the exact add-one ratio of the recorded usages
    tot = sum(r.usage for r in rows)
    n = len(rows)
    for r in rows:
        assert r.prob == (r.usage + 1) / (tot + n)
    # multi-char pieces respect the keep_multi cap
    assert sum(1 for r in rows if r.n_chars >= 2) <= 6


def test_word_fertility_counts_occurrences_not_distinct_words(spark):
    docs = spark.createDataFrame(
        [(1, "aa aa b"), (2, "b")], "doc_id long, text string"
    )
    vocab = spark.createDataFrame(
        [("a", 0.2), ("b", 0.3), ("aa", 0.5)], "piece string, prob double"
    )
    got = {
        r.doc_id: (r.n_wrds, r.n_toks)
        for r in unigram.unigram_word_fertility(docs, vocab).collect()
    }
    # doc 1: 'aa' twice (1 piece each) + 'b' once (1 piece) = 3 words, 3 tokens
    assert got == {1: (3, 3), 2: (1, 1)}


def test_unknown_characters_fall_back_deterministically(spark):
    """A word with a character absent from the vocabulary still
    segments (zero-probability path) with a deterministic longest-
    piece-first tie-break — the guarantee that makes encode total."""
    vocab = spark.createDataFrame([("a", 1.0)], "piece string, prob double")
    wt = spark.createDataFrame([("axa", 1), ("axaxaxa", 1)], "word string, cnt long")
    rows = {r.word: list(r.pieces) for r in unigram.viterbi_segment(wt, vocab).collect()}
    # every zero-probability path ties at exactly -0.0, so the smallest
    # split point (longest final piece, capped at max_piece_len) wins
    assert rows["axa"] == ["axa"]
    assert rows["axaxaxa"] == ["axa", "xaxa"]
    for w, pieces in rows.items():
        assert "".join(pieces) == w


def test_plan_shape_vocab_broadcast_no_word_shuffle(spark):
    """Scale invariant: segmentation is one broadcast + a projection —
    the word table must reach the DP without any exchange."""
    vocab = spark.createDataFrame([("a", 0.5), ("b", 0.5)], "piece string, prob double")
    wt = spark.createDataFrame([("ab", 1)], "word string, cnt long").select(
        "word", "cnt"
    )
    plan = (
        unigram.viterbi_segment(wt, vocab)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # the word side itself is never hash-shuffled
    assert "hashpartitioning(word" not in plan


def test_train_rejects_zero_em_rounds(spark):
    """Round-11 review: em_rounds=0 used to crash with an
    unresolved-column error (the seed vocab has no usage column); the
    degenerate config now fails fast with a clear message."""
    import pytest

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="em_rounds must be >= 1"):
        unigram.unigram_train(docs, em_rounds=0)


def test_unigram_encode_reconstructs_documents(spark):
    """bpe_encode API parity: (doc_id, pos, token) rows must
    reconstruct each document's word stream when concatenated in the
    EXPLICIT pos order (round-11 review: never rely on row-order
    stability for within-word piece order), and the plan must stay a
    pure map-side broadcast projection — no joins or sorts of the
    document side."""
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "cat cat mat")], "doc_id long, text string"
    )
    vocab = unigram.unigram_train(docs, em_rounds=1, seed_multi=8, keep_multi=4)
    enc = unigram.unigram_encode(docs, vocab)
    by_doc: dict[int, str] = {}
    for r in sorted(enc.collect(), key=lambda r: (r.doc_id, r.pos)):
        by_doc[r.doc_id] = by_doc.get(r.doc_id, "") + r.token
    assert by_doc == {1: "thecatsat", 2: "catcatmat"}
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Sort" not in plan and "hashpartitioning" not in plan


def test_byte_fallback_encode_isolates_unseen_chars_and_roundtrips(spark):
    """VERDICT r11 #5: with ``byte_fallback=True`` no input is ever
    OOV — characters unseen in training come out as UTF-8 byte tokens
    ``<0xNN>`` (multi-byte chars as multiple tokens), each isolated
    into its own piece (the ordering-invariant 1.0 floor), while known
    spans segment EXACTLY as the strict encoder does; decoding the
    byte tokens reconstructs the original text losslessly."""
    train = spark.createDataFrame(
        [(1, "the cat sat on the mat the cat"), (2, "the hat on the cat")],
        "doc_id long, text string",
    )
    vocab = unigram.unigram_train(train, em_rounds=1, max_piece_len=3, seed_multi=10, keep_multi=8)
    probe = spark.createDataFrame([(9, "the zügxq cat")], "doc_id long, text string")
    toks = [
        r.token
        for r in unigram.unigram_encode(probe, vocab, max_piece_len=3, byte_fallback=True)
        .orderBy("pos")
        .collect()
    ]
    # z, ü (2 bytes), x are unseen; g, q are also unseen in this toy
    # corpus — every one isolated as byte tokens; 'the'/'cat' segment
    # normally
    assert toks[0] == "the" and toks[-1] == "cat"
    assert toks[1:-1] == ["<0x7A>", "<0xC3>", "<0xBC>", "<0x67>", "<0x78>", "<0x71>"]
    # lossless decode: byte tokens -> bytes, others -> their UTF-8
    out = b""
    for t in toks:
        if t.startswith("<0x"):
            out += bytes([int(t[3:5], 16)])
        else:
            out += t.encode()
    assert out.decode() == "thezügxqcat"


def test_byte_fallback_known_text_matches_strict_encoder(spark):
    """The fallback floor is ordering-invariant: on text whose every
    character was seen in training, byte_fallback=True produces
    byte-for-byte the strict encoder's segmentation."""
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "cat cat mat")], "doc_id long, text string"
    )
    vocab = unigram.unigram_train(docs, em_rounds=1, seed_multi=8, keep_multi=4)
    strict = unigram.unigram_encode(docs, vocab).collect()
    fb = unigram.unigram_encode(docs, vocab, byte_fallback=True).collect()
    key = lambda r: (r.doc_id, r.pos, r.token)  # noqa: E731
    assert sorted(map(key, strict)) == sorted(map(key, fb))
