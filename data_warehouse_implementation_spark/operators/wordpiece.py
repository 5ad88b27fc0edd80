"""WordPiece tokenizer training + greedy encoding as DataFrame algebra
(brief requirement — the third classic subword family alongside
``bpe.py`` and ``unigram.py``; no reference analog).

WordPiece (Schuster & Nakajima 2012; BERT's tokenizer) trains with the
SAME merge loop as BPE but a different objective: each round merges
the adjacent pair maximizing the unigram-likelihood GAIN

    score(l, r) = count(l r) / (count(l) * count(r))

— the pair whose merge most increases corpus likelihood under a
unigram LM, not the most frequent pair. Rare-but-exclusive pairs win
over frequent-but-promiscuous ones (the reason BERT's vocab keeps
morphemes BPE would skip). Everything else reuses ``bpe``'s portable
machinery: the word-frequency symbol table, ``pair_counts``,
``apply_merge``, vocab-scale rounds behind eager checkpoints.

Encoding is WordPiece's actual inference rule — GREEDY
LONGEST-MATCH-FIRST: at each position take the longest vocabulary
piece that matches; a word with an unmatchable position becomes one
``[UNK]`` token (the BERT rule). The vocabulary here is
position-independent (no ``##`` continuation marker — the
SentencePiece-style variant; the marked variant differs only in the
lookup key). The greedy scan runs INLINE per word inside one in-row
``aggregate`` fold over a broadcast vocab map — the
``unigram_encode`` execution shape: the document side is never
joined, shuffled, or sorted.

Portability: scores are IEEE doubles of exact int64 counts (products
bounded far below 2^63 at any realistic vocab), the argmax tie-break
is (score desc, l, r) binary order, and the greedy scan is a
deterministic longest-first probe — all replayed bit-for-bit by the
DuckDB oracles (train rounds unrolled, the scan as a recursive CTE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import END_MARK, apply_merge, pair_counts, word_symbol_table


def symbol_counts(symbols: DataFrame) -> DataFrame:
    """Per-symbol occurrence totals weighted by word frequency:
    (s, ns). One explode over vocab-scale rows + one aggregate —
    the denominator table of the WordPiece score."""
    return (
        symbols.select("cnt", F.explode(F.split(F.trim(F.col("sym")), " ")).alias("s"))
        .groupBy("s")
        .agg(F.sum("cnt").alias("ns"))
    )


def wordpiece_train(
    df: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> DataFrame:
    """Train ``n_merges`` WordPiece merges; returns (merge_rank,
    left_sym, right_sym, pair_count, left_count, right_count, score)
    in training order."""
    return wordpiece_train_from_symbols(word_symbol_table(df, text_col), n_merges)


def wordpiece_train_from_symbols(
    symbols: DataFrame, n_merges: int = 8
) -> DataFrame:
    """Train from an existing symbol table — the from-state entry
    point (the streaming ``word_count_sink`` state serves this family
    too, via ``bpe.symbol_table_from_words``)."""
    cur = symbols.localCheckpoint(eager=False)
    out: list[DataFrame] = []
    for rank in range(1, n_merges + 1):
        # two consumers (the l and r denominator joins) — barrier the
        # per-round count aggregate once
        sc = symbol_counts(cur).localCheckpoint(eager=False)
        top = (
            pair_counts(cur)
            .join(sc.select(F.col("s").alias("l"), F.col("ns").alias("nl")), on="l")
            .join(sc.select(F.col("s").alias("r"), F.col("ns").alias("nr")), on="r")
            .withColumn(
                "score",
                F.col("n").cast("double")
                / (F.col("nl").cast("double") * F.col("nr").cast("double")),
            )
            .orderBy(F.desc("score"), "l", "r")
            .limit(1)
            .localCheckpoint(eager=False)
        )
        out.append(
            top.select(
                F.lit(rank).cast("long").alias("merge_rank"),
                F.col("l").alias("left_sym"),
                F.col("r").alias("right_sym"),
                F.col("n").cast("long").alias("pair_count"),
                F.col("nl").cast("long").alias("left_count"),
                F.col("nr").cast("long").alias("right_count"),
                F.col("score"),
            )
        )
        if rank < n_merges:
            cur = apply_merge(cur, top).localCheckpoint(eager=False)
    merges = out[0]
    for m in out[1:]:
        merges = merges.unionAll(m)
    return merges


def wordpiece_vocab(
    df: DataFrame, merges: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Encode vocabulary: the corpus alphabet plus every merge output,
    end-marks stripped (position-independent pieces — see module
    docstring). Deterministic from (corpus, merges); vocab-scale."""
    from .bpe import corpus_alphabet

    merged = merges.select(
        F.regexp_replace(
            F.concat(F.col("left_sym"), F.col("right_sym")), END_MARK, ""
        ).alias("piece")
    ).filter(F.length("piece") > 0)
    alpha = corpus_alphabet(df, text_col).select(F.col("char").alias("piece"))
    return alpha.unionByName(merged).distinct()


def _greedy_expr(word_ref: str, max_piece_len: int) -> str:
    """The greedy longest-match-first scan as a SQL expression over
    ``word_ref`` and the broadcast vocab map ``_wm``: fold positions
    left to right; at each uncovered position probe piece lengths
    longest-first and take the first vocabulary hit; any miss turns
    the whole word into ``['[UNK]']`` (the BERT rule). The candidate
    probe binds through an array so the longest-first filter runs
    once per position."""
    L = int(max_piece_len)
    w = word_ref
    probe = (
        # try_element_at: the filtered candidate list is EMPTY at an
        # unmatchable position (plain element_at throws under ANSI)
        f"try_element_at(filter(transform("
        f"sequence(least({L}, length({w}) - i + 1), 1, -1),"
        f" l -> substring({w}, i, l)),"
        f" p -> try_element_at(_wm, p) is not null), 1)"
    )
    return f"""
      aggregate(
        sequence(1, length({w})),
        struct(1 as nx, cast(array() as array<string>) as path, false as unk),
        (acc, i) -> if(acc.unk or i < acc.nx, acc,
          element_at(transform(array({probe}), m ->
            if(m is null,
               struct(acc.nx as nx, acc.path as path, true as unk),
               struct(i + length(m) as nx, acc.path || array(m) as path,
                      false as unk))), 1)),
        acc -> if(acc.unk, array('[UNK]'), acc.path))
    """


def _vocab_map(vocab: DataFrame):
    return vocab.agg(
        F.map_from_arrays(
            F.collect_list("piece"), F.transform(F.collect_list("piece"), lambda _: F.lit(1))
        ).alias("_wm")
    )


def wordpiece_encode_words(
    wordtab: DataFrame, vocab: DataFrame, max_piece_len: int = 8
) -> DataFrame:
    """Greedy-encode every distinct word of a (word, cnt) table:
    (word, cnt, pieces array<string>, n_pieces). One broadcast vocab
    map + a codegen'd in-row fold — no shuffle of the word table; the
    corpus-occurrence token histogram weights by cnt downstream (the
    encode-distinct-words-once discipline every tokenizer family here
    shares).

    ``max_piece_len`` caps the probe: a vocabulary piece LONGER than
    the cap is unreachable (greedy then segments its span from shorter
    pieces). Merge chains can exceed any fixed cap in principle
    (lengths double per merge in the worst case), so size the cap to
    the training depth; the oracle probes the same lengths, so the
    differential is cap-consistent by construction."""
    return (
        wordtab.crossJoin(F.broadcast(_vocab_map(vocab)))
        .select(
            "word",
            "cnt",
            F.expr(_greedy_expr("word", max_piece_len)).alias("pieces"),
        )
        .withColumn("n_pieces", F.size("pieces").cast("long"))
    )
