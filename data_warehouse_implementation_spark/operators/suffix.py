"""Distributed suffix-array exact-substring analysis (VERDICT r12 #8
— the full Lee et al. 2022 formulation the fixed-k positional-gram
census approximates; reference-free extension, no reference analog).

Lee et al. ("Deduplicating Training Data Makes Language Models
Better") build a suffix array over the tokenized corpus and mark every
maximal substring that occurs twice or more. The DataFrame-native
construction here is PREFIX DOUBLING (Manber-Myers, the standard
distributed/external SA algorithm): round t assigns every suffix a
dense rank of its first 2^t tokens by ranking the PAIR of
half-prefix ranks from round t-1 — log(max doc length) rounds, each
one corpus-scale rank (the two-phase ``relational.global_rank``,
never a single-task sort) plus one self-join at offset 2^(t-1).
Suffixes never cross document boundaries (a training corpus's
documents are independent), so the doubling depth is bounded by the
LONGEST DOCUMENT, not the corpus: 2^rounds >= max doc tokens is the
exactness condition, and extra rounds are idempotent (dense-ranking
already-distinct values is the identity permutation).

What the suffix order buys over the k-gram census: each position's
LONGEST match elsewhere in the corpus. The longest common prefix of a
suffix with ANY other suffix is achieved at one of its two neighbors
in suffix order (the classic SA/LCP property), so one
adjacency-self-join plus a binary LCP DESCENT over the retained rank
tables — add 2^t to the accumulator when the round-t ranks at the
current offset agree, t from rounds down to 0 — yields the exact
per-position duplicate length in log(max doc length) more joins. The
fixed-k census can only answer "is there a duplicate of length >= k";
the suffix array answers "how long is the longest duplicate", at any
length, with no window parameter.

Scale shape: every round shuffles (corpus positions) rows on integer
keys; rank tables are retained for the descent (the log-factor space
cost Lee et al. pay in suffix-array form) behind deferred
``localCheckpoint`` barriers — each table feeds its successor round
AND two descent branches, the multi-consumer discipline documented at
``graph.count_triangles``. Equal suffixes (duplicate document tails)
tie at every depth and stay tied; adjacency breaks ties by (doc, pos)
and the descent credits them their full common length, which is
exactly right — they ARE duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import words


def _dense_rank(df: DataFrame, keys: list[str], out: str) -> DataFrame:
    """Dense rank of ``keys`` under their lexicographic order — rank
    the distinct key tuples with the two-phase global rank and join
    back (equality classes AND order are what the doubling needs;
    both are engine-portable for integer/ASCII keys)."""
    from .relational import global_rank

    distinct = df.select(*keys).distinct()
    ranked = global_rank(distinct, keys, out)
    return df.join(ranked, on=keys, how="inner")


def suffix_dup_lengths(
    df: DataFrame,
    rounds: int = 7,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-position longest-duplicate lengths via prefix doubling:
    ``(id_col, p, n_tokens, dup_len)`` where ``dup_len`` is the exact
    length of the longest token substring starting at 1-based position
    ``p`` that also occurs somewhere else in the corpus (another
    position of any document, including this one). Exact iff
    ``2**rounds >= max doc tokens`` (see module docstring); the
    companion query pins that bound on the driver corpora."""
    pos = (
        df.select(F.col(id_col).alias("d"), words(text_col).alias("_arr"))
        .filter(F.size("_arr") >= 1)
        .select(
            "d",
            F.size("_arr").cast("long").alias("n"),
            F.posexplode("_arr").alias("p0", "tok"),
        )
        .select("d", "n", (F.col("p0") + 1).alias("p"), "tok")
        # three consumers (round-0 rank's distinct + join branches, the
        # final position frame) — defer-checkpoint the explode once
        .localCheckpoint(eager=False)
    )
    # round 0: rank of the single token at p (span 1)
    ranks = [
        _dense_rank(pos, ["tok"], "r")
        .select("d", "n", "p", "r")
        .localCheckpoint(eager=False)
    ]
    for t in range(1, rounds + 1):
        half = 1 << (t - 1)
        prev = ranks[-1]
        shifted = prev.select(
            F.col("d"), (F.col("p") - half).alias("p"), F.col("r").alias("_r2")
        )
        paired = (
            prev.join(shifted, on=["d", "p"], how="left")
            .select("d", "n", "p", "r", F.coalesce("_r2", F.lit(0)).alias("r2"))
            # _dense_rank consumes this twice (distinct + join-back) —
            # checkpoint so the offset self-join runs once per round
            .localCheckpoint(eager=False)
        )
        ranks.append(
            # scratch name must avoid global_rank's reserved internals
            # ("_rn" et al. — the guard only checks INPUT columns)
            _dense_rank(paired, ["r", "r2"], "srnk")
            .select("d", "n", "p", F.col("srnk").alias("r"))
            .localCheckpoint(eager=False)
        )
    # adjacency in suffix order: (final rank, d, p) totally orders the
    # suffixes (ties = genuinely equal suffixes, broken by position)
    from .relational import global_rank

    order = global_rank(ranks[-1], ["r", "d", "p"], "s").localCheckpoint(eager=False)
    succ = order.select(
        (F.col("s") - 1).alias("s"),
        F.col("d").alias("d2"),
        F.col("p").alias("p2"),
        F.col("n").alias("n2"),
    )
    pairs = order.join(succ, on="s", how="inner").select(
        "d", "p", "n", "d2", "p2", "n2", F.lit(0).cast("long").alias("acc")
    )
    # binary LCP descent over the retained rank tables, t = rounds..0:
    # add 2^t when both suffixes still have a round-t rank at the
    # current offset and the ranks agree (a missing rank means the
    # suffix ended — never a match)
    for t in range(rounds, -1, -1):
        span = 1 << t
        rt = ranks[t]
        a = rt.select(
            F.col("d"), F.col("p").alias("_pa"), F.col("r").alias("_ra")
        )
        b = rt.select(
            F.col("d").alias("d2"), F.col("p").alias("_pb"), F.col("r").alias("_rb")
        )
        pairs = (
            pairs.withColumn("_pa", F.col("p") + F.col("acc"))
            .withColumn("_pb", F.col("p2") + F.col("acc"))
            .join(a, on=["d", "_pa"], how="left")
            .join(b, on=["d2", "_pb"], how="left")
            .withColumn(
                "acc",
                F.col("acc")
                + F.when(
                    F.col("_ra").isNotNull()
                    & F.col("_rb").isNotNull()
                    & (F.col("_ra") == F.col("_rb")),
                    F.lit(span),
                ).otherwise(F.lit(0)),
            )
            .drop("_pa", "_pb", "_ra", "_rb")
        )
    # the LCP against a neighbor cannot exceed either remaining suffix
    # (the descent guarantees this via missing ranks; the explicit
    # least() documents the invariant and guards rounds-overshoot)
    lcp = pairs.select(
        "d",
        "p",
        "d2",
        "p2",
        F.least(
            F.col("acc"), F.col("n") - F.col("p") + 1, F.col("n2") - F.col("p2") + 1
        ).alias("lcp"),
    ).localCheckpoint(eager=False)
    with_succ = lcp.select("d", "p", F.col("lcp").alias("dl"))
    with_pred = lcp.select(
        F.col("d2").alias("d"), F.col("p2").alias("p"), F.col("lcp").alias("dl")
    )
    best = (
        with_succ.unionByName(with_pred)
        .groupBy("d", "p")
        .agg(F.max("dl").cast("long").alias("dup_len"))
    )
    return (
        pos.select("d", "n", "p")
        .join(best, on=["d", "p"], how="left")
        .select(
            F.col("d").alias(id_col),
            F.col("p"),
            F.col("n").alias("n_tokens"),
            F.coalesce("dup_len", F.lit(0)).cast("long").alias("dup_len"),
        )
    )


def suffix_dup_census(
    dup_lengths: DataFrame,
    threshold: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document census over :func:`suffix_dup_lengths` rows at a
    length threshold: ``(id_col, n_tokens, max_dup_len, dup_tokens,
    dup_fraction)`` where ``dup_tokens`` is the interval-union
    coverage of ``[p, p + threshold)`` over positions with ``dup_len
    >= threshold`` — by the maximal-substring/run-of-k-grams identity
    this EQUALS ``corpus.substring_dup_census(k=threshold)``'s
    coverage (the cross-validating differential the tests pin), while
    ``max_dup_len`` is the answer the fixed-k census cannot give."""
    from pyspark.sql.window import Window

    dup = dup_lengths.filter(F.col("dup_len") >= threshold).withColumn(
        "_e", F.col("p") + threshold
    )
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    covered = (
        dup.withColumn(
            "_cov",
            F.greatest(
                F.lit(0),
                F.col("_e")
                - F.greatest(
                    F.coalesce(F.max("_e").over(w_prev), F.lit(0)), F.col("p")
                ),
            ),
        )
        .groupBy(id_col)
        .agg(F.sum("_cov").cast("long").alias("dup_tokens"))
    )
    per_doc = dup_lengths.groupBy(id_col).agg(
        F.max("n_tokens").cast("long").alias("n_tokens"),
        F.max("dup_len").cast("long").alias("max_dup_len"),
    )
    return per_doc.join(covered, on=id_col, how="left").select(
        id_col,
        "n_tokens",
        "max_dup_len",
        F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
        (
            F.coalesce("dup_tokens", F.lit(0)).cast("double")
            / F.col("n_tokens").cast("double")
        ).alias("dup_fraction"),
    )
