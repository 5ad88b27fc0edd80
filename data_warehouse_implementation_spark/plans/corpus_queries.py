"""Corpus-preparation CORRECTNESS queries over ``documents`` (brief
requirement — train/val/test splitting, chunking, vocabulary, TF-IDF,
shard packing; see operators/corpus.py for the scale design notes).

Every oracle replays the full pipeline in DuckDB SQL — the hashing is
plain int64 modular arithmetic and the ratios are doubles of exact
integers, so the differential checks the algorithm end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import corpus
from ..operators.corpus import HASH_P, SPLIT_A, SPLIT_B

_TOKS_SQL = r"""
toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS arr
  FROM documents
)
"""

# ---------------------------------------------------------------------------
# Deterministic train/val/test split

TRAIN_PCT = 80
VAL_PCT = 10


def doc_hash_split(t: dict[str, DataFrame]) -> DataFrame:
    """Hash-based split assignment per document plus the per-(source,
    split) census a pipeline operator actually monitors. Map-side hash,
    one tiny aggregate."""
    assigned = corpus.hash_split(t["documents"], train_pct=TRAIN_PCT, val_pct=VAL_PCT)
    return (
        assigned.groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("sum_chars"))
        .orderBy("source", "split")
    )


DOC_HASH_SPLIT_ORACLE = f"""
WITH assigned AS (
  SELECT source, n_chars,
         CASE WHEN ((doc_id % {HASH_P}) * {SPLIT_A} + {SPLIT_B}) % {HASH_P} % 100 < {TRAIN_PCT}
              THEN 'train'
              WHEN ((doc_id % {HASH_P}) * {SPLIT_A} + {SPLIT_B}) % {HASH_P} % 100
                   < {TRAIN_PCT + VAL_PCT}
              THEN 'val' ELSE 'test' END AS split
  FROM documents
)
SELECT source, split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM assigned GROUP BY source, split ORDER BY source, split
"""


# ---------------------------------------------------------------------------
# Context-window chunking

CHUNK_SIZE = 32
CHUNK_STRIDE = 24


def doc_chunks(t: dict[str, DataFrame]) -> DataFrame:
    """Overlapping word-window chunks — the full chunk rows (text
    included) are the checked output, so the slicing arithmetic and
    boundary behavior are verified exactly."""
    return corpus.chunk_documents(
        t["documents"], size=CHUNK_SIZE, stride=CHUNK_STRIDE
    ).orderBy("doc_id", "chunk_id")


DOC_CHUNKS_ORACLE = f"""
WITH {_TOKS_SQL.strip()},
st AS (
  SELECT doc_id, arr, unnest(generate_series(1, len(arr), {CHUNK_STRIDE})) AS s
  FROM toks WHERE len(arr) > 0
)
SELECT doc_id,
       CAST((s - 1) / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       CAST(least({CHUNK_SIZE}, len(arr) - s + 1) AS BIGINT) AS n_chunk_tokens,
       array_to_string(list_slice(arr, s, s + {CHUNK_SIZE - 1}), ' ') AS chunk_text
FROM st ORDER BY doc_id, chunk_id
"""


# ---------------------------------------------------------------------------
# Corpus vocabulary (top terms)

VOCAB_TOP = 100


def vocab_top_terms(t: dict[str, DataFrame]) -> DataFrame:
    """Top-``VOCAB_TOP`` vocabulary terms by corpus frequency with
    document frequency and a deterministic rank (count desc, token asc).
    The rank window runs on the post-limit term set (|top| rows), never
    the full vocabulary."""
    vocab = corpus.vocabulary(t["documents"])
    top = vocab.orderBy(F.col("tf").desc(), F.col("token")).limit(VOCAB_TOP)
    w = Window.orderBy(F.col("tf").desc(), F.col("token"))
    return top.withColumn("rank", F.row_number().over(w).cast("long")).orderBy("rank")


VOCAB_TOP_TERMS_ORACLE = f"""
WITH {_TOKS_SQL.strip()},
tok AS (SELECT doc_id, unnest(arr) AS token FROM toks),
vocab AS (
  SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS dfreq
  FROM tok GROUP BY token
)
SELECT token, tf, dfreq,
       CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, token) AS BIGINT) AS rank
FROM vocab ORDER BY tf DESC, token LIMIT {VOCAB_TOP}
"""


# ---------------------------------------------------------------------------
# TF-IDF top terms per document

TFIDF_TOP_K = 3


def doc_tfidf_top_terms(t: dict[str, DataFrame]) -> DataFrame:
    """Top-``TFIDF_TOP_K`` characteristic terms per document by
    rational TF-IDF (deterministic tie-break on the token)."""
    scored = corpus.tfidf_terms(t["documents"])
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("term_rank") <= TFIDF_TOP_K)
        .select("doc_id", "term_rank", "token", "tfidf")
        .orderBy("doc_id", "term_rank")
    )


DOC_TFIDF_TOP_TERMS_ORACLE = f"""
WITH {_TOKS_SQL.strip()},
tok AS (SELECT doc_id, unnest(arr) AS token FROM toks),
tf_tab AS (SELECT doc_id, token, COUNT(*) AS n FROM tok GROUP BY doc_id, token),
doclen AS (SELECT doc_id, COUNT(*) AS len FROM tok GROUP BY doc_id),
dfreq AS (SELECT token, COUNT(*) AS df FROM tf_tab GROUP BY token),
n_docs AS (SELECT COUNT(DISTINCT doc_id) AS N FROM documents),
scored AS (
  SELECT t.doc_id, t.token,
         (CAST(t.n AS DOUBLE) / CAST(l.len AS DOUBLE))
         * ((CAST(nd.N AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
            / (CAST(d.df AS DOUBLE) + 0.5)) AS tfidf
  FROM tf_tab t
  JOIN doclen l USING (doc_id)
  JOIN dfreq d USING (token)
  CROSS JOIN n_docs nd
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS term_rank
  FROM scored
)
SELECT doc_id, CAST(term_rank AS BIGINT) AS term_rank, token, tfidf
FROM ranked WHERE term_rank <= {TFIDF_TOP_K} ORDER BY doc_id, term_rank
"""


# ---------------------------------------------------------------------------
# Token-budget contiguous sharding

SHARD_BUDGET = 4096


def doc_shard_assignment(t: dict[str, DataFrame]) -> DataFrame:
    """Training-shard assignment by contiguous token budget. The Spark
    side computes the running total two-phase (bucket subtotals +
    within-bucket windows — no global window); the oracle uses the
    plain global window, so the differential proves the two-phase
    decomposition IS the global cumulative sum."""
    return corpus.shard_by_token_budget(t["documents"], budget=SHARD_BUDGET).orderBy(
        "doc_id"
    )


DOC_SHARD_ASSIGNMENT_ORACLE = f"""
WITH {_TOKS_SQL.strip()},
base AS (SELECT doc_id, CAST(len(arr) AS BIGINT) AS n_tokens FROM toks),
cum AS (
  SELECT doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         - n_tokens AS BIGINT) AS token_start
  FROM base
)
SELECT doc_id, n_tokens, token_start,
       CAST(FLOOR(CAST(token_start AS DOUBLE) / {SHARD_BUDGET}.0) AS BIGINT) AS shard_id
FROM cum ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Deterministic stratified sampling

SAMPLE_RATES = {f"src{i}": (60 if i % 2 == 0 else 20) for i in range(20)}


def doc_stratified_sample(t: dict[str, DataFrame]) -> DataFrame:
    """Stratified hash-sample of the corpus (60% of even sources, 20% of
    odd) plus the per-source census of what survived — the
    source-rebalancing move of a training-data mix, reproducible across
    runs and partitionings."""
    sampled = corpus.stratified_hash_sample(t["documents"], SAMPLE_RATES)
    return (
        sampled.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .orderBy("source")
    )


_RATE_CASE = "CASE " + " ".join(
    f"WHEN source = '{s}' THEN {p}" for s, p in sorted(SAMPLE_RATES.items())
) + " ELSE 0 END"

DOC_STRATIFIED_SAMPLE_ORACLE = f"""
SELECT source, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc_id
FROM documents
WHERE ((doc_id % {HASH_P}) * {SPLIT_A} + {SPLIT_B}) % {HASH_P} % 100 < {_RATE_CASE}
GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# Benchmark decontamination (8-gram overlap vs a held-out set)

DECONTAM_N = 8
BENCHMARK_MAX_ID = 20  # stand-in benchmark: doc_id < 20


def doc_decontaminate(t: dict[str, DataFrame]) -> DataFrame:
    """Benchmark decontamination report: for every corpus document, the
    number of distinct ``DECONTAM_N``-gram shingles it shares with the
    benchmark set (here: docs with id < ``BENCHMARK_MAX_ID``), plus the
    contamination flag. The benchmark shingle set is tiny and broadcast,
    so the overlap check is a map-side semi-join per shingle — at 100 TB
    the corpus is streamed once, never shuffled on the shingle. Every
    doc is reported (zeros included): a decontamination run must prove
    it looked at everything."""
    from ..operators import dedup

    docs = t["documents"]
    corpus_sh = dedup.word_shingles(docs, n=DECONTAM_N)
    bench_sh = (
        dedup.word_shingles(docs.filter(F.col("doc_id") < BENCHMARK_MAX_ID), n=DECONTAM_N)
        .select("shingle")
        .distinct()
    )
    hits = (
        corpus_sh.filter(F.col("doc_id") >= BENCHMARK_MAX_ID)
        .join(F.broadcast(bench_sh), on="shingle", how="left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        docs.filter(F.col("doc_id") >= BENCHMARK_MAX_ID)
        .select("doc_id")
        .join(hits, on="doc_id", how="left")
        .withColumn("n_overlap", F.coalesce(F.col("n_overlap"), F.lit(0)))
        .withColumn("contaminated", F.col("n_overlap") > 0)
        .orderBy("doc_id")
    )


_DECONTAM_SHINGLE = " || ' ' || ".join(f"arr[i+{j}]" for j in range(DECONTAM_N))

DOC_DECONTAMINATE_ORACLE = f"""
WITH {_TOKS_SQL.strip()},
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, len(arr) - {DECONTAM_N - 1}),
           i -> {_DECONTAM_SHINGLE}))) AS shingle
  FROM toks WHERE len(arr) >= {DECONTAM_N}
),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < {BENCHMARK_MAX_ID}),
hits AS (
  SELECT doc_id, COUNT(*) AS n_overlap
  FROM sh WHERE doc_id >= {BENCHMARK_MAX_ID} AND shingle IN (SELECT shingle FROM bench)
  GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(h.n_overlap, 0) AS n_overlap,
       COALESCE(h.n_overlap, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id >= {BENCHMARK_MAX_ID}
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# Intra-document repetition ratio (quality signal)


def doc_repetition_ratio(t: dict[str, DataFrame]) -> DataFrame:
    """Within-document 3-gram repetition: 1 - distinct/total shingles —
    the boilerplate/looping-text quality signal. Pure per-row array
    algebra (no explode, no shuffle): the shingle list never leaves its
    row."""
    arr = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
    shingle_expr = (
        "transform(sequence(1, size(_arr) - 2), "
        "i -> concat_ws(' ', element_at(_arr, i), element_at(_arr, i + 1), element_at(_arr, i + 2)))"
    )
    base = (
        t["documents"]
        .select("doc_id", arr.alias("_arr"))
        .filter(F.size("_arr") >= 3)
        .withColumn("_sh", F.expr(shingle_expr))
    )
    return base.select(
        "doc_id",
        F.size("_sh").cast("long").alias("n_shingles"),
        F.size(F.array_distinct("_sh")).cast("long").alias("n_distinct"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct("_sh")).cast("double")
            / F.size("_sh").cast("double")
        ).alias("repetition_ratio"),
    ).orderBy("doc_id")


DOC_REPETITION_RATIO_ORACLE = f"""
WITH {_TOKS_SQL.strip()},
sh AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(arr) - 2),
                        i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2]) AS shingles
  FROM toks WHERE len(arr) >= 3
)
SELECT doc_id,
       CAST(len(shingles) AS BIGINT) AS n_shingles,
       CAST(len(list_distinct(shingles)) AS BIGINT) AS n_distinct,
       1.0 - CAST(len(list_distinct(shingles)) AS DOUBLE) / CAST(len(shingles) AS DOUBLE)
         AS repetition_ratio
FROM sh ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# PII redaction (map-side regex scrubbing)

_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.]+[a-z]"
_PHONE_RE = "555-[0-9]+"


def doc_pii_redact(t: dict[str, DataFrame]) -> DataFrame:
    """PII scrubbing: redact email addresses and phone-shaped tokens to
    placeholder tags, reporting per-document redaction counts and the
    scrubbed text. The corpus has no natural PII, so deterministic PII
    is synthesized per doc first — the redaction path (regex match,
    replace, count) is what the oracle checks, end to end. Map-side
    only: one regexp pass per pattern, no shuffle."""
    pii_text = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.col("doc_id").cast("string"),
    )
    base = t["documents"].select("doc_id", pii_text.alias("_pii"))
    n_emails = F.size(F.regexp_extract_all(F.col("_pii"), F.lit(_EMAIL_RE), 0))
    n_phones = F.size(F.regexp_extract_all(F.col("_pii"), F.lit(_PHONE_RE), 0))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("_pii"), _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return base.select(
        "doc_id",
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"),
        redacted.alias("redacted_text"),
    ).orderBy("doc_id")


DOC_PII_REDACT_ORACLE = f"""
WITH pii AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or 555-' || CAST(doc_id AS VARCHAR) AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
       regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_PHONE_RE}', '<PHONE>', 'g') AS redacted_text
FROM pii ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Training-data source mixing (weighted token-budget sampling)

MIX_WEIGHTS = {"src0": 5, "src1": 3}
MIX_DEFAULT_WEIGHT = 1
MIX_TOKEN_BUDGET = 5000


def corpus_mix_sources(t: dict[str, DataFrame]) -> DataFrame:
    """Data-mixture census: sample each source toward its weighted share
    of a global token budget (corpus.mix_sources) and report the applied
    per-source rate plus kept docs/tokens — the table a pipeline owner
    reads to confirm the mixture matches the recipe."""
    kept = corpus.mix_sources(
        t["documents"],
        weights=MIX_WEIGHTS,
        token_budget=MIX_TOKEN_BUDGET,
        default_weight=MIX_DEFAULT_WEIGHT,
    )
    return (
        kept.groupBy("source", "rate_pct")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .orderBy("source")
    )


CORPUS_MIX_SOURCES_ORACLE = f"""
WITH base AS (
  SELECT doc_id, source,
         CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
),
w AS (
  SELECT source,
         CASE source WHEN 'src0' THEN {MIX_WEIGHTS["src0"]}
                     WHEN 'src1' THEN {MIX_WEIGHTS["src1"]}
                     ELSE {MIX_DEFAULT_WEIGHT} END AS wt
  FROM (SELECT DISTINCT source FROM base)
),
wsum AS (SELECT SUM(wt) AS ws FROM w),
tot AS (SELECT source, SUM(n_tokens) AS tt FROM base GROUP BY source),
rated AS (
  SELECT b.doc_id, b.source, b.n_tokens,
         CAST(CASE WHEN tot.tt = 0 THEN 100 ELSE least(CAST(100 AS BIGINT),
               (CAST({MIX_TOKEN_BUDGET} AS BIGINT) * 100 * w.wt) // (wsum.ws * tot.tt)) END
           AS BIGINT) AS rate_pct
  FROM base b JOIN w USING (source) JOIN tot USING (source) CROSS JOIN wsum
),
kept AS (
  SELECT * FROM rated
  WHERE ((doc_id % {HASH_P}) * {SPLIT_A} + {SPLIT_B}) % {HASH_P} % 100 < rate_pct
)
SELECT source, rate_pct, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
FROM kept GROUP BY source, rate_pct ORDER BY source
"""


# ---------------------------------------------------------------------------
# α=0.5 temperature source mixing (square-root weights, round 12)

MIX_TEMPERATURE_BUDGET = 5000


def corpus_mix_temperature(t: dict[str, DataFrame]) -> DataFrame:
    """Temperature-mixture census: α=0.5 ("square-root") source
    weighting — the mBERT/XLM-R multilingual sampling scheme — with
    EXACT integer-sqrt weights (corpus.mix_sources_temperature), so
    the whole mixture replays bit-for-bit in the oracle. Reports the
    derived per-source weight, applied rate, and kept docs/tokens —
    the table that shows the flattening (a source 100× larger gets
    only 10× the share)."""
    kept = corpus.mix_sources_temperature(
        t["documents"], token_budget=MIX_TEMPERATURE_BUDGET
    )
    return (
        kept.groupBy("source", "weight", "rate_pct")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .orderBy("source")
    )


def _mix_temperature_oracle() -> str:
    from ..functions.scalar import isqrt_sql

    return f"""
WITH base AS (
  SELECT doc_id, source,
         CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
),
tot AS (SELECT source, SUM(n_tokens) AS tt FROM base GROUP BY source),
w AS (SELECT source, tt, CAST({isqrt_sql("tt")} AS BIGINT) AS wt FROM tot),
wsum AS (SELECT SUM(wt) AS ws FROM w),
rated AS (
  SELECT b.doc_id, b.source, b.n_tokens, w.wt,
         CAST(CASE WHEN w.tt = 0 THEN 100 ELSE least(CAST(100 AS BIGINT),
               (CAST({MIX_TEMPERATURE_BUDGET} AS BIGINT) * 100 * w.wt)
                 // (wsum.ws * w.tt)) END
           AS BIGINT) AS rate_pct
  FROM base b JOIN w USING (source) CROSS JOIN wsum
),
kept AS (
  SELECT * FROM rated
  WHERE ((doc_id % {HASH_P}) * {SPLIT_A} + {SPLIT_B}) % {HASH_P} % 100 < rate_pct
)
SELECT source, wt AS weight, rate_pct,
       COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
FROM kept GROUP BY source, wt, rate_pct ORDER BY source
"""


CORPUS_MIX_TEMPERATURE_ORACLE = _mix_temperature_oracle()


# ---------------------------------------------------------------------------
# Per-source frequency cap (top-domain dominance guard, VERDICT r9 #5)

CAP_MAX_DOCS_PER_SOURCE = 20  # engages at sf0.01 (25 docs/source raw)


def corpus_cap_per_source(t: dict[str, DataFrame]) -> DataFrame:
    """The C4/RefinedWeb "top-domain dominance" guard as a direct
    query: keep at most ``CAP_MAX_DOCS_PER_SOURCE`` documents per
    source by the deterministic pseudo-random per-key rank
    (corpus.cap_per_key — two-phase, hot-key-parallel). Returns the
    kept (doc_id, source, key_rank) rows: the full witness of WHICH
    documents the rule keeps and their rank arithmetic, which the
    oracle replays as a plain per-key ROW_NUMBER over the same hash
    order (the two-phase decomposition preserves it exactly)."""
    return (
        corpus.cap_per_key(
            t["documents"].select("doc_id", "source"),
            key_col="source",
            max_docs=CAP_MAX_DOCS_PER_SOURCE,
        )
        .select("doc_id", "source", "key_rank")
        .orderBy("doc_id")
    )


CORPUS_CAP_PER_SOURCE_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, source,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY ((doc_id % {HASH_P}) * {SPLIT_A} + {SPLIT_B}) % {HASH_P}, doc_id
         ) AS BIGINT) AS key_rank
  FROM documents
)
SELECT doc_id, source, key_rank FROM ranked
WHERE key_rank <= {CAP_MAX_DOCS_PER_SOURCE}
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Boilerplate n-gram detection (corpus-wide document frequency)

BOILERPLATE_N = 3
BOILERPLATE_MIN_SHARE_PCT = 1


def boilerplate_ngrams(t: dict[str, DataFrame]) -> DataFrame:
    """High document-frequency n-grams — the removal list a boilerplate
    cleaning pass feeds on (corpus.boilerplate_ngrams)."""
    return corpus.boilerplate_ngrams(
        t["documents"], n=BOILERPLATE_N, min_doc_share_pct=BOILERPLATE_MIN_SHARE_PCT
    )


BOILERPLATE_NGRAMS_ORACLE = f"""
WITH {_TOKS_SQL.strip()},
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, len(arr) - {BOILERPLATE_N - 1}),
           i -> {" || ' ' || ".join(f"arr[i+{j}]" for j in range(BOILERPLATE_N)).replace("arr[i+0]", "arr[i]")}))) AS ngram
  FROM toks WHERE len(arr) >= {BOILERPLATE_N}
),
nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM toks)
SELECT ngram, COUNT(*) AS dfreq,
       CAST(COUNT(*) AS DOUBLE) / CAST(nd.n_docs AS DOUBLE) AS doc_share
FROM sh CROSS JOIN nd
GROUP BY ngram, nd.n_docs
HAVING COUNT(*) * 100 >= nd.n_docs * {BOILERPLATE_MIN_SHARE_PCT}
ORDER BY dfreq DESC, ngram
"""


# ---------------------------------------------------------------------------
# Training-sequence packing (chunk + contiguous token-budget cut)

SEQ_BUDGET = 64
SEQ_CHUNK = 32


def training_sequences(t: dict[str, DataFrame]) -> DataFrame:
    """Pack the chunked corpus into fixed-budget training sequences
    (corpus.pack_sequences): non-overlapping context windows laid end to
    end in (doc, chunk) order, cut every SEQ_BUDGET tokens. The oracle
    replays the packing with a global running-sum window — exactly the
    single-task shape the Spark two-phase cumsum avoids."""
    return corpus.pack_sequences(
        t["documents"], seq_budget=SEQ_BUDGET, chunk_size=SEQ_CHUNK, chunk_stride=SEQ_CHUNK
    ).orderBy("doc_id", "chunk_id")


TRAINING_SEQUENCES_ORACLE = f"""
WITH {_TOKS_SQL.strip()},
st AS (
  SELECT doc_id, arr, unnest(generate_series(1, len(arr), {SEQ_CHUNK})) AS s
  FROM toks WHERE len(arr) > 0
),
c AS (
  SELECT doc_id,
         CAST((s - 1) / {SEQ_CHUNK} AS BIGINT) AS chunk_id,
         CAST(least({SEQ_CHUNK}, len(arr) - s + 1) AS BIGINT) AS n_chunk_tokens
  FROM st
),
cum AS (
  SELECT *, CAST(SUM(n_chunk_tokens) OVER (
    ORDER BY doc_id, chunk_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) - n_chunk_tokens AS BIGINT) AS token_start
  FROM c
)
SELECT doc_id, chunk_id, n_chunk_tokens, token_start,
       CAST(FLOOR(CAST(token_start AS DOUBLE) / {SEQ_BUDGET}.0) AS BIGINT) AS seq_id
FROM cum ORDER BY doc_id, chunk_id
"""


def training_sequences_text(t: dict[str, DataFrame]) -> DataFrame:
    """The packed sequences MATERIALIZED as text
    (``corpus.sequences_text``, contiguous assignment) — the training
    file a consumer actually reads: per sequence, chunk count, token
    count, and the chunks concatenated in (doc, chunk) order. The
    oracle replays the contiguous assignment and rebuilds the text
    with an ordered ``string_agg``."""
    return corpus.sequences_text(
        t["documents"], seq_budget=SEQ_BUDGET, chunk_size=SEQ_CHUNK, chunk_stride=SEQ_CHUNK
    ).orderBy("seq_id")


TRAINING_SEQUENCES_TEXT_ORACLE = f"""
WITH {_TOKS_SQL.strip()},
st AS (
  SELECT doc_id, arr, unnest(generate_series(1, len(arr), {SEQ_CHUNK})) AS s
  FROM toks WHERE len(arr) > 0
),
c AS (
  SELECT doc_id,
         CAST((s - 1) / {SEQ_CHUNK} AS BIGINT) AS chunk_id,
         CAST(least({SEQ_CHUNK}, len(arr) - s + 1) AS BIGINT) AS n_chunk_tokens,
         array_to_string(list_slice(arr, s, s + {SEQ_CHUNK} - 1), ' ') AS chunk_text
  FROM st
),
cum AS (
  SELECT *, CAST(SUM(n_chunk_tokens) OVER (
    ORDER BY doc_id, chunk_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) - n_chunk_tokens AS BIGINT) AS token_start
  FROM c
)
SELECT CAST(FLOOR(CAST(token_start AS DOUBLE) / {SEQ_BUDGET}.0) AS BIGINT) AS seq_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(n_chunk_tokens) AS BIGINT) AS n_tokens,
       string_agg(chunk_text, ' ' ORDER BY doc_id, chunk_id) AS text
FROM cum GROUP BY 1 ORDER BY seq_id
"""


# ---------------------------------------------------------------------------
# Best-fit-decreasing packing (VERDICT r11 #7) + padding-efficiency census

BFD_GROUP = 128


def doc_pack_bfd(t: dict[str, DataFrame]) -> DataFrame:
    """Best-fit-decreasing sequence packing over the chunked corpus
    (``corpus.pack_sequences_bfd``): chunks longest-first into the
    tightest open sequence that fits, new sequence only when none
    does — no sequence ever exceeds the budget, unlike the contiguous
    cut. Deterministic distributed variant: BFD runs inside
    contiguous global-rank groups of :data:`BFD_GROUP` chunks (rank =
    two-phase (length desc, doc, chunk) — no single-task sort), one
    in-row fold per group. The oracle replays rank, grouping, and the
    greedy fold step by step as a recursive CTE."""
    return corpus.pack_sequences_bfd(
        t["documents"],
        seq_budget=SEQ_BUDGET,
        chunk_size=SEQ_CHUNK,
        chunk_stride=SEQ_CHUNK,
        group_size=BFD_GROUP,
    ).orderBy("doc_id", "chunk_id")


def _bfd_pack_sql(budget: int, chunk: int, group: int) -> str:
    """Full DuckDB replay of :func:`corpus.pack_sequences_bfd` —
    chunking, the (length desc, doc, chunk) rank, contiguous groups,
    and the per-group best-fit fold as a recursive CTE stepping one
    chunk at a time (the ``_unigram_dp_cte`` discipline). Returns a
    complete SELECT of (doc_id, chunk_id, n_chunk_tokens, seq_id)."""
    return rf"""
WITH RECURSIVE {_TOKS_SQL.strip().strip(",")},
st AS (
  SELECT doc_id, arr, unnest(generate_series(1, len(arr), {chunk})) AS s
  FROM toks WHERE len(arr) > 0
),
c AS (
  SELECT doc_id,
         CAST((s - 1) / {chunk} AS BIGINT) AS chunk_id,
         CAST(least({chunk}, len(arr) - s + 1) AS BIGINT) AS n_chunk_tokens
  FROM st
),
rk AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY n_chunk_tokens DESC, doc_id, chunk_id) AS rnk
  FROM c
),
gi AS MATERIALIZED (
  SELECT CAST((rnk - 1) // {group} AS BIGINT) AS grp,
         list(struct_pack(rnk := rnk, doc := doc_id, ck := chunk_id,
                          len := n_chunk_tokens) ORDER BY rnk) AS items
  FROM rk GROUP BY 1
),
bfd AS (
  SELECT grp, 0 AS i, []::BIGINT[] AS loads,
         []::STRUCT(doc BIGINT, ck BIGINT, len BIGINT, bin BIGINT)[] AS outs
  FROM gi
  UNION ALL
  SELECT grp, i + 1,
    CASE WHEN bsti IS NULL
      THEN loads || [itlen]
      ELSE list_transform(generate_series(1, len(loads)),
             x -> CASE WHEN x = bsti THEN loads[x] + itlen ELSE loads[x] END)
    END,
    outs || [struct_pack(doc := itdoc, ck := itck, len := itlen,
                         bin := coalesce(bsti, len(loads) + 1))]
  FROM (
    SELECT b.grp, b.i, b.loads, b.outs,
           g.items[b.i + 1].doc AS itdoc,
           g.items[b.i + 1].ck AS itck,
           g.items[b.i + 1].len AS itlen,
           list_sort(list_filter(list_transform(generate_series(1, len(b.loads)),
               x -> struct_pack(negnl := -(b.loads[x] + g.items[b.i + 1].len),
                                i := CAST(x AS BIGINT))),
             cc -> -cc.negnl <= {budget}))[1].i AS bsti
    FROM bfd b JOIN gi g USING (grp) WHERE b.i < len(g.items)
  )
),
fin AS (
  SELECT b.grp, unnest(b.outs) AS o
  FROM bfd b JOIN gi g USING (grp) WHERE b.i = len(g.items)
)
SELECT o.doc AS doc_id, o.ck AS chunk_id, o.len AS n_chunk_tokens,
       grp * {group} + o.bin - 1 AS seq_id
FROM fin"""


DOC_PACK_BFD_ORACLE = (
    _bfd_pack_sql(SEQ_BUDGET, SEQ_CHUNK, BFD_GROUP) + "\nORDER BY doc_id, chunk_id"
)


def doc_packing_efficiency(t: dict[str, DataFrame]) -> DataFrame:
    """Padding-efficiency census: the contiguous cut vs BFD at the
    SAME budget/chunking over the same corpus — per method, sequence
    count, token mass, padding (budget minus fill, floored at 0),
    overflow (fill above budget — only the contiguous cut can
    overflow, a chunk straddling the boundary counts into its start
    sequence), and the padding fraction of total capacity. The row a
    pipeline owner reads to decide whether BFD's extra rank is worth
    the padding it saves."""
    docs = t["documents"]
    cont = corpus.pack_sequences(
        docs, seq_budget=SEQ_BUDGET, chunk_size=SEQ_CHUNK, chunk_stride=SEQ_CHUNK
    )
    bfd = corpus.pack_sequences_bfd(
        docs,
        seq_budget=SEQ_BUDGET,
        chunk_size=SEQ_CHUNK,
        chunk_stride=SEQ_CHUNK,
        group_size=BFD_GROUP,
    )

    def census(df: DataFrame, method: str) -> DataFrame:
        per_seq = df.groupBy("seq_id").agg(
            F.sum("n_chunk_tokens").alias("_fill")
        )
        b = F.lit(int(SEQ_BUDGET))
        return per_seq.agg(
            F.lit(method).alias("method"),
            F.count(F.lit(1)).cast("long").alias("n_seqs"),
            F.sum("_fill").cast("long").alias("n_tokens"),
            F.sum(F.greatest(F.lit(0), b - F.col("_fill")))
            .cast("long")
            .alias("padding_tokens"),
            F.sum(F.greatest(F.lit(0), F.col("_fill") - b))
            .cast("long")
            .alias("overflow_tokens"),
        ).withColumn(
            "padding_pct",
            F.col("padding_tokens").cast("double")
            / (F.col("n_seqs") * b).cast("double"),
        )

    return census(cont, "contiguous").unionByName(census(bfd, "bfd")).orderBy("method")


def _packing_efficiency_oracle(budget: int, chunk: int, group: int) -> str:
    contig = rf"""
WITH {_TOKS_SQL.strip().strip(",")},
st AS (
  SELECT doc_id, arr, unnest(generate_series(1, len(arr), {chunk})) AS s
  FROM toks WHERE len(arr) > 0
),
c AS (
  SELECT doc_id,
         CAST((s - 1) / {chunk} AS BIGINT) AS chunk_id,
         CAST(least({chunk}, len(arr) - s + 1) AS BIGINT) AS n_chunk_tokens
  FROM st
),
cum AS (
  SELECT *, CAST(SUM(n_chunk_tokens) OVER (
    ORDER BY doc_id, chunk_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) - n_chunk_tokens AS BIGINT) AS token_start
  FROM c
)
SELECT CAST(FLOOR(CAST(token_start AS DOUBLE) / {budget}.0) AS BIGINT) AS seq_id,
       n_chunk_tokens
FROM cum"""
    bfd = _bfd_pack_sql(budget, chunk, group)
    return rf"""
SELECT method, n_seqs, n_tokens, padding_tokens, overflow_tokens,
       CAST(padding_tokens AS DOUBLE) / CAST(n_seqs * {budget} AS DOUBLE) AS padding_pct
FROM (
  SELECT 'contiguous' AS method,
         CAST(COUNT(*) AS BIGINT) AS n_seqs,
         CAST(SUM(fill) AS BIGINT) AS n_tokens,
         CAST(SUM(greatest(0, {budget} - fill)) AS BIGINT) AS padding_tokens,
         CAST(SUM(greatest(0, fill - {budget})) AS BIGINT) AS overflow_tokens
  FROM (SELECT seq_id, CAST(SUM(n_chunk_tokens) AS BIGINT) AS fill
        FROM ({contig}) GROUP BY seq_id)
  UNION ALL
  SELECT 'bfd',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(fill) AS BIGINT),
         CAST(SUM(greatest(0, {budget} - fill)) AS BIGINT),
         CAST(SUM(greatest(0, fill - {budget})) AS BIGINT)
  FROM (SELECT seq_id, CAST(SUM(n_chunk_tokens) AS BIGINT) AS fill
        FROM ({bfd}) GROUP BY seq_id)
)
ORDER BY method"""


DOC_PACKING_EFFICIENCY_ORACLE = _packing_efficiency_oracle(
    SEQ_BUDGET, SEQ_CHUNK, BFD_GROUP
)


# ---------------------------------------------------------------------------
# C4-style quality filter (per-reason rejection accounting)

FILTER_MIN_WORDS = 15
FILTER_MAX_WORDS = 90
FILTER_MIN_QUALITY = 0.35


def corpus_quality_filter(t: dict[str, DataFrame]) -> DataFrame:
    """Cleaning-pass verdicts per document (text.quality_filter): the
    first failing rule of too_short / too_long / non_target_lang /
    low_quality, or kept. Full per-doc verdict rows are the checked
    output, so the rule ORDER (first match decides) is verified, not
    just the counts."""
    from ..operators import text as text_ops

    out = text_ops.quality_filter(
        t["documents"],
        min_words=FILTER_MIN_WORDS,
        max_words=FILTER_MAX_WORDS,
        min_quality=FILTER_MIN_QUALITY,
    )
    return out.select("doc_id", "source", "n_words", "quality", "verdict").orderBy(
        "doc_id"
    )


from ..operators.text import EN_STOPWORDS as _QF_STOPWORDS

_QF_STOPLIST = ", ".join(f"'{w}'" for w in _QF_STOPWORDS)


def _qf_feat_sql(arr: str, text: str) -> str:
    """The ONE SQL rendering of the quality-gate features (n_words,
    mean_word_len, stop_ratio) over a token array + raw text — shared
    by the filter oracle and the classifier-label oracle so the gate's
    featurization can never fork (round-13 review)."""
    return rf"""CAST(len({arr}) AS BIGINT) AS n_words,
         CASE WHEN len({arr}) > 0
              THEN CAST(length(regexp_replace(lower({text}), '\s+', '', 'g')) AS DOUBLE)
                   / CAST(len({arr}) AS DOUBLE)
              ELSE 0.0 END AS mean_word_len,
         CASE WHEN len({arr}) > 0
              THEN CAST(len(list_filter({arr}, x -> list_contains([{_QF_STOPLIST}], x))) AS DOUBLE)
                   / CAST(len({arr}) AS DOUBLE)
              ELSE 0.0 END AS stop_ratio"""


#: quality score over the feature columns — the 0.4/0.3/0.3 formula,
#: one rendering (text.quality_score's SQL twin)
_QF_QUALITY_SQL = """0.4 * least(greatest(CAST(n_words AS DOUBLE) / 100.0, 0.0), 1.0)
       + 0.3 * least(greatest((mean_word_len - 2.0) / 6.0, 0.0), 1.0)
       + 0.3 * least(greatest(stop_ratio * 5.0, 0.0), 1.0)"""

#: first-match verdict ladder over (n_words, stop_ratio, quality) —
#: one rendering of text.quality_filter's rule order
_QF_VERDICT_SQL = f"""CASE WHEN n_words < {FILTER_MIN_WORDS} THEN 'too_short'
            WHEN n_words > {FILTER_MAX_WORDS} THEN 'too_long'
            WHEN stop_ratio < 0.05 THEN 'non_target_lang'
            WHEN quality < {FILTER_MIN_QUALITY} THEN 'low_quality'
            ELSE 'kept' END"""


CORPUS_QUALITY_FILTER_ORACLE = rf"""
WITH {_TOKS_SQL.strip()},
feat AS (
  SELECT d.doc_id, d.source,
         {_qf_feat_sql("t.arr", "d.text")}
  FROM toks t JOIN documents d ON d.doc_id = t.doc_id
),
scored AS (
  SELECT doc_id, source, n_words, stop_ratio, mean_word_len,
         {_QF_QUALITY_SQL} AS quality
  FROM feat
)
SELECT doc_id, source, n_words, quality,
       {_QF_VERDICT_SQL} AS verdict
FROM scored ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Trained quality classifier (VERDICT r12 #4 — the GPT-3/LLaMA-style
# classifier gate: a cheap trained model distilled from the expensive
# rule gate, scoring every document)

QC_TRAIN_MOD = 2  # train on doc_id % 2 = 0, hold out the rest
QC_POS = "hq"
QC_NEG = "lq"


def _rule_labeled(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, <text_col>, label, verdict): the C4 rule gate's verdict
    collapsed to the binary quality label the classifier trains on —
    'hq' for kept documents, 'lq' for every rejection reason. The
    GPT-3 recipe labels with a curated-vs-crawl contrast; with one
    corpus on hand the supervision is the rule gate itself
    (distillation), which keeps the labels deterministic and the
    oracle replayable."""
    from ..operators import text as text_ops

    out = text_ops.quality_filter(
        docs,
        min_words=FILTER_MIN_WORDS,
        max_words=FILTER_MAX_WORDS,
        min_quality=FILTER_MIN_QUALITY,
        text_col=text_col,
    )
    return out.select(
        "doc_id",
        text_col,
        "verdict",
        F.when(F.col("verdict") == "kept", QC_POS).otherwise(QC_NEG).alias("label"),
    )


def _qc_labeled(docs: DataFrame) -> DataFrame:
    """Session-cached rule-gate labels (S7): three query families
    consume the corpus-scale label pass (profile training, classifier
    predictions, the PR-curve ground truth) — pay it once per corpus."""
    from . import materialize

    return materialize.get_or_build(
        "qc_labeled", str(docs.semanticHash()), lambda: _rule_labeled(docs),
        corpus_scale=True,
    )


def _qc_model(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Session-cached (profiles, priors) — the trained Naive-Bayes
    word-unigram model (vocabulary × 2 rows + a 2-row prior frame,
    both broadcastable), trained once per corpus on the labeled slice
    (doc_id % QC_TRAIN_MOD = 0) and shared by the prediction and
    PR-curve queries."""
    from ..operators import text as text_ops
    from . import materialize

    labeled = _qc_labeled(docs)
    train = labeled.filter(F.col("doc_id") % QC_TRAIN_MOD == 0)
    profiles = materialize.get_or_build(
        "qc_profiles",
        str(docs.semanticHash()),
        lambda: text_ops.train_language_profiles(
            train, lang_col="label", feature_fn=text_ops.words
        ),
    )
    priors = materialize.get_or_build(
        "qc_priors",
        str(docs.semanticHash()),
        lambda: train.groupBy(F.col("label").alias("lang")).agg(
            F.count(F.lit(1)).alias("n_docs")
        ),
    )
    return profiles, priors


def _qc_pred(docs: DataFrame) -> DataFrame:
    """Session-cached classifier predictions (S7, the ``_langid_pred``
    discipline): Naive-Bayes word-unigram profiles trained on the
    labeled slice (doc_id % QC_TRAIN_MOD = 0), every document scored
    by the ln-free MAP mean-likelihood-ratio
    (text.language_model_scores with feature_fn=words — class prior ×
    mean over word occurrences of p_c(w)/q(w), add-one smoothed
    against the pooled model; no logarithm, decimal-cast term sums).
    Scale shape: the model is vocabulary × 2 rows (hashed-feature
    production mode available via train_language_profiles
    hashed_buckets — pytest-pinned), the doc×class grid a 2-row
    broadcast join; one corpus-scale explode feeds one aggregate."""
    from ..operators import text as text_ops
    from . import materialize

    def build() -> DataFrame:
        labeled = _qc_labeled(docs)
        profiles, priors = _qc_model(docs)
        pred = text_ops.language_model_predict(
            text_ops.language_model_scores(
                docs, profiles, priors=priors, feature_fn=text_ops.words
            )
        )
        return pred.join(labeled.drop("text"), "doc_id").select(
            "doc_id",
            "verdict",
            F.col("label").alias("label_rule"),
            F.col("lang_pred_model").alias("label_pred"),
            F.col("model_score"),
            F.col("n_trigrams").alias("n_word_occurrences"),
            (F.col("doc_id") % QC_TRAIN_MOD != 0).alias("is_holdout"),
        )

    return materialize.get_or_build(
        "qc_model_pred", str(docs.semanticHash()), build, corpus_scale=True
    )


def doc_quality_classifier(t: dict[str, DataFrame]) -> DataFrame:
    """TRAINED document-quality classifier (VERDICT r12 #4): per doc
    the rule gate's verdict and binary label, the trained model's
    prediction and score, and the holdout flag. Documents with zero
    words are unscorable (no feature occurrences) and absent — the
    rule gate already rejects them as too_short, so the classifier
    never gates them in practice."""
    return _qc_pred(t["documents"]).orderBy("doc_id")


def doc_quality_confusion(t: dict[str, DataFrame]) -> DataFrame:
    """Confusion census on the HOLDOUT slice: classifier prediction vs
    rule label, one row per (label_rule, label_pred) cell with the
    cell count and its share of the true-label row — recall on the
    diagonal, leakage off it (the `doc_language_confusion` discipline
    for the binary gate)."""
    pred = _qc_pred(t["documents"]).filter(F.col("is_holdout"))
    cells = pred.groupBy("label_rule", "label_pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    tot = Window.partitionBy("label_rule")
    return (
        cells.withColumn(
            "share_of_true",
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(tot).cast("double"),
        )
        .orderBy("label_rule", "label_pred")
    )


def doc_quality_pr_curve(t: dict[str, DataFrame]) -> DataFrame:
    """Exact precision/recall curve for the trained quality gate on
    the HOLDOUT slice — the threshold-selection artifact a real
    curation pipeline ships with its classifier (GPT-3's Appendix A
    gate is exactly a thresholded score). Curve algebra lives in
    :func:`pr_curve_from_model` (shared with the streaming
    ``pr_curve_from_state`` serve path); this query feeds it the
    session-cached model and labels."""
    docs = t["documents"]
    profiles, priors = _qc_model(docs)
    return pr_curve_from_model(docs, profiles, priors, labeled=_qc_labeled(docs))


def pr_curve_from_model(
    docs: DataFrame,
    profiles: DataFrame,
    priors: DataFrame,
    labeled: DataFrame | None = None,
) -> DataFrame:
    """PR curve for a given (profiles, priors) model over ``docs``'s
    holdout slice — the shared back half of the batch query and the
    streaming from-state serve (VERDICT r13 #8). Decision statistic
    per doc: ``p_hq = s_hq / (s_hq + s_lq)`` over the two MAP class
    scores (both strictly positive, so the ratio is a
    calibrated-order statistic with no log/exp). Docs rank by
    (p_hq desc, doc_id) via the two-phase ``global_rank``; the running
    hq count uses the rank-bucket two-phase cumsum
    (``shard_by_token_budget``'s discipline — never a corpus-scale
    global window). One row per holdout doc: rank k, the threshold
    that admits exactly the top k, and precision/recall at that cut —
    integer-ratio doubles, exact in SQL. ``labeled`` injects the
    session-cached rule labels; None recomputes them (the rule gate is
    deterministic and map-side, so both paths agree exactly)."""
    from ..operators import text as text_ops
    from ..operators.relational import global_rank

    if labeled is None:
        labeled = _rule_labeled(docs)
    hold = docs.filter(F.col("doc_id") % QC_TRAIN_MOD != 0)
    wide = (
        text_ops.language_model_scores(
            hold, profiles, priors=priors, feature_fn=text_ops.words
        )
        .groupBy("doc_id")
        .agg(
            F.max(F.when(F.col("lang") == QC_POS, F.col("score"))).alias("_shq"),
            F.max(F.when(F.col("lang") == QC_NEG, F.col("score"))).alias("_slq"),
        )
        .select(
            "doc_id",
            (F.col("_shq") / (F.col("_shq") + F.col("_slq"))).alias("p_hq"),
        )
    )
    labels = labeled.select(
        "doc_id", (F.col("label") == QC_POS).cast("long").alias("is_hq")
    )
    j = wide.join(labels, "doc_id").withColumn("_negp", -F.col("p_hq"))
    # bucket = floor(-p_hq * 4096): monotone in the rank order, pure —
    # the two branches of the rank and the cumsum agree by construction
    bucket = F.floor(F.col("_negp") * 4096)
    ranked = global_rank(j, ["_negp", "doc_id"], "rk", bucket=bucket).localCheckpoint(
        eager=False
    )
    # two-phase cumsum of is_hq in rank order: per-rank-block subtotals
    # -> offsets over #blocks rows -> within-block window
    blk = ranked.withColumn("_blk", F.expr("(rk - 1) div 4096"))
    btot = blk.groupBy("_blk").agg(F.sum("is_hq").alias("_bt"))
    w_off = Window.orderBy("_blk").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    offs = btot.withColumn("_boff", F.sum("_bt").over(w_off) - F.col("_bt")).select(
        "_blk", "_boff"
    )
    w_in = Window.partitionBy("_blk").orderBy("rk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = ranked.agg(F.sum("is_hq").alias("_tot"))
    return (
        blk.withColumn("_cum", F.sum("is_hq").over(w_in))
        .join(F.broadcast(offs), on="_blk")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.col("rk").cast("long").alias("rk"),
            F.col("p_hq").alias("threshold"),
            F.col("is_hq").cast("long").alias("is_hq"),
            ((F.col("_boff") + F.col("_cum")).cast("double") / F.col("rk").cast("double")).alias(
                "precision_at_k"
            ),
            ((F.col("_boff") + F.col("_cum")).cast("double") / F.col("_tot").cast("double")).alias(
                "recall_at_k"
            ),
        )
        .orderBy("rk")
    )


def _qc_ctes() -> str:
    """CTE chain replaying label + NB train + MAP score + argmax over
    WORD features: ``qcpred`` holds (doc_id, verdict, label_rule,
    label_pred, model_score, n_word_occurrences, is_holdout). The
    scoring arithmetic mirrors ``llm_queries._lang_model_ctes`` —
    decimal(28,12) term sums, each cast to double BEFORE adding (Spark
    demotes decimal+decimal to scale 11; DuckDB keeps 12)."""
    return rf"""{_TOKS_SQL.strip()},
qfeat AS MATERIALIZED (
  SELECT d.doc_id, t.arr,
         {_qf_feat_sql("t.arr", "d.text")}
  FROM toks t JOIN documents d USING (doc_id)
),
qlab AS MATERIALIZED (
  SELECT doc_id, arr, verdict,
         CASE WHEN verdict = 'kept' THEN '{QC_POS}' ELSE '{QC_NEG}' END AS label
  FROM (
    SELECT doc_id, arr, {_QF_VERDICT_SQL} AS verdict
    FROM (SELECT *, {_QF_QUALITY_SQL} AS quality FROM qfeat)
  )
),
wocc AS MATERIALIZED (SELECT doc_id, unnest(arr) AS gram FROM toks),
qprof AS MATERIALIZED (
  SELECT l.label, w.gram, CAST(COUNT(*) AS BIGINT) AS c
  FROM wocc w JOIN qlab l USING (doc_id)
  WHERE w.doc_id % {QC_TRAIN_MOD} = 0 GROUP BY l.label, w.gram
),
qpooled AS MATERIALIZED (SELECT gram, CAST(SUM(c) AS BIGINT) AS cg FROM qprof GROUP BY gram),
qltot AS MATERIALIZED (SELECT label, CAST(SUM(c) AS BIGINT) AS Tl FROM qprof GROUP BY label),
qgtot AS MATERIALIZED (SELECT CAST(SUM(cg) AS BIGINT) AS T, COUNT(*) AS V FROM qpooled),
qpri AS MATERIALIZED (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS nd FROM qlab
  WHERE doc_id % {QC_TRAIN_MOD} = 0 GROUP BY label
),
qndtot AS MATERIALIZED (SELECT CAST(SUM(nd) AS BIGINT) AS ND FROM qpri),
qocc AS MATERIALIZED (
  SELECT w.doc_id, w.gram, COALESCE(p.cg, 0) AS cg
  FROM wocc w LEFT JOIN qpooled p USING (gram)
),
qbase AS MATERIALIZED (
  SELECT doc_id, COUNT(*) AS n_occ,
         SUM(CAST(1.0 / CAST(cg + 1 AS DOUBLE) AS DECIMAL(28,12))) AS sbase
  FROM qocc GROUP BY doc_id
),
qpart AS MATERIALIZED (
  SELECT o.doc_id, pr.label,
         SUM(CAST(CAST(pr.c AS DOUBLE) / CAST(o.cg + 1 AS DOUBLE) AS DECIMAL(28,12))) AS spart
  FROM qocc o JOIN qprof pr USING (gram) GROUP BY o.doc_id, pr.label
),
qscore AS MATERIALIZED (
  SELECT b.doc_id, l.label, b.n_occ,
         (CAST(COALESCE(p.spart, CAST(0 AS DECIMAL(28,12))) AS DOUBLE)
            + CAST(b.sbase AS DOUBLE))
           * (CAST(g.T + g.V AS DOUBLE) / CAST(l.Tl + g.V AS DOUBLE))
           / CAST(b.n_occ AS DOUBLE)
           * (CAST(qpri.nd AS DOUBLE) / CAST(qndtot.ND AS DOUBLE)) AS score
  FROM qbase b
  CROSS JOIN qltot l
  LEFT JOIN qpart p ON p.doc_id = b.doc_id AND p.label = l.label
  JOIN qpri ON qpri.label = l.label
  CROSS JOIN qgtot g CROSS JOIN qndtot
),
qcpred AS MATERIALIZED (
  SELECT s.doc_id, ql.verdict, ql.label AS label_rule,
         s.label AS label_pred, s.score AS model_score,
         CAST(s.n_occ AS BIGINT) AS n_word_occurrences,
         (s.doc_id % {QC_TRAIN_MOD} <> 0) AS is_holdout
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, label) AS rn
        FROM qscore) s
  JOIN qlab ql USING (doc_id)
  WHERE s.rn = 1
)"""


DOC_QUALITY_CLASSIFIER_ORACLE = rf"""
WITH {_qc_ctes()}
SELECT doc_id, verdict, label_rule, label_pred, model_score,
       n_word_occurrences, is_holdout
FROM qcpred ORDER BY doc_id
"""


DOC_QUALITY_CONFUSION_ORACLE = rf"""
WITH {_qc_ctes()},
cells AS (
  SELECT label_rule, label_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM qcpred WHERE is_holdout GROUP BY label_rule, label_pred
)
SELECT label_rule, label_pred, n_docs,
       CAST(n_docs AS DOUBLE)
         / CAST(SUM(n_docs) OVER (PARTITION BY label_rule) AS DOUBLE) AS share_of_true
FROM cells ORDER BY label_rule, label_pred
"""


DOC_QUALITY_PR_CURVE_ORACLE = rf"""
WITH {_qc_ctes()},
prh AS (
  SELECT doc_id,
         MAX(CASE WHEN label = '{QC_POS}' THEN score END) AS s_hq,
         MAX(CASE WHEN label = '{QC_NEG}' THEN score END) AS s_lq
  FROM qscore WHERE doc_id % {QC_TRAIN_MOD} <> 0 GROUP BY doc_id
),
prj AS (
  SELECT p.doc_id, p.s_hq / (p.s_hq + p.s_lq) AS p_hq,
         CASE WHEN q.label = '{QC_POS}' THEN 1 ELSE 0 END AS is_hq
  FROM prh p JOIN qlab q USING (doc_id)
),
prr AS (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY p_hq DESC, doc_id) AS rk,
         SUM(is_hq) OVER (ORDER BY p_hq DESC, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_hq,
         SUM(is_hq) OVER () AS tot_hq
  FROM prj
)
SELECT doc_id, CAST(rk AS BIGINT) AS rk, p_hq AS threshold,
       CAST(is_hq AS BIGINT) AS is_hq,
       CAST(cum_hq AS DOUBLE) / CAST(rk AS DOUBLE) AS precision_at_k,
       CAST(cum_hq AS DOUBLE) / CAST(tot_hq AS DOUBLE) AS recall_at_k
FROM prr ORDER BY rk
"""


# ---------------------------------------------------------------------------
# Deterministic k-per-source eval sample

EVAL_K = 5


def doc_eval_sample(t: dict[str, DataFrame]) -> DataFrame:
    """Exactly EVAL_K docs per source, selected by id-hash rank
    (corpus.group_hash_sample) — the held-out eval-set pick,
    reproducible on any partitioning."""
    return (
        corpus.group_hash_sample(
            t["documents"].select("doc_id", "source", "n_chars"), k=EVAL_K
        )
        .orderBy("source", "doc_id")
    )


DOC_EVAL_SAMPLE_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY ((doc_id % {HASH_P}) * {SPLIT_A} + {SPLIT_B}) % {HASH_P} ASC,
                    doc_id ASC
         ) AS rn
  FROM documents
)
SELECT doc_id, source, n_chars FROM ranked
WHERE rn <= {EVAL_K} ORDER BY source, doc_id
"""


# ---------------------------------------------------------------------------
# Priority sampling (deterministic weighted sample without replacement)

SAMPLE_K = 50


def doc_priority_sample(t: dict[str, DataFrame]) -> DataFrame:
    """Importance-weighted corpus sampling: the 50 highest-priority
    documents under priority sampling with weight = n_chars (heavier
    documents near-certain, light ones hash-lottery) — the
    deterministic, backfill-stable alternative to ``rand()``-weighted
    selection for building training subsets."""
    return corpus.priority_sample(
        t["documents"].select("doc_id", "source", "n_chars"),
        weight_col="n_chars",
        k=SAMPLE_K,
    ).orderBy(F.desc("priority"), "doc_id")


DOC_PRIORITY_SAMPLE_ORACLE = f"""
WITH pri AS (
  SELECT doc_id, source, n_chars,
         CAST(n_chars AS DOUBLE) * {HASH_P}
           / CAST(((doc_id % {HASH_P}) * {corpus.PRIORITY_A}
                   + {corpus.PRIORITY_B}) % {HASH_P} + 1 AS DOUBLE) AS priority
  FROM documents
)
SELECT * FROM pri ORDER BY priority DESC, doc_id LIMIT {SAMPLE_K}
"""


# ---------------------------------------------------------------------------
# Unigram-LM rarity scoring (the portable core of a perplexity filter)


def doc_rarity_score(t: dict[str, DataFrame]) -> DataFrame:
    """Per-document mean inverse unigram probability over a corpus-
    trained add-one-smoothed model — the perplexity-filter signal with
    the log dropped for engine portability (see
    ``corpus.token_rarity``)."""
    return corpus.token_rarity(t["documents"]).orderBy("doc_id")


DOC_RARITY_SCORE_ORACLE = rf"""
WITH {_TOKS_SQL.strip().rstrip()},
tok AS (SELECT doc_id, unnest(arr) AS token FROM toks),
vocab AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
totals AS (
  SELECT CAST(SUM(c) AS BIGINT) AS T, COUNT(*) AS V FROM vocab
),
scored AS (
  SELECT tok.doc_id,
         CAST(CAST(totals.T + totals.V AS DOUBLE)
              / CAST(vocab.c + 1 AS DOUBLE) AS DECIMAL(28,6)) AS term
  FROM tok JOIN vocab USING (token) CROSS JOIN totals
)
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(term) AS DOUBLE) / COUNT(*) AS mean_rarity
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


def doc_bigram_rarity(t: dict[str, DataFrame]) -> DataFrame:
    """Per-document mean inverse smoothed bigram conditional
    probability — the context-sensitive fluency signal (see
    ``corpus.bigram_rarity``); docs with < 2 tokens carry no bigram
    and are excluded on both sides."""
    return corpus.bigram_rarity(t["documents"]).orderBy("doc_id")


DOC_BIGRAM_RARITY_ORACLE = rf"""
WITH {_TOKS_SQL.strip().rstrip()},
big AS (
  SELECT doc_id, arr[i] AS w1, arr[i+1] AS w2
  FROM toks, UNNEST(range(1, len(arr))) AS t(i)
  WHERE len(arr) >= 2
),
c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY w1, w2),
ctx AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS ctx FROM c2 GROUP BY w1),
vv AS (
  SELECT COUNT(DISTINCT token) AS V
  FROM (SELECT unnest(arr) AS token FROM toks)
),
scored AS (
  SELECT big.doc_id,
         CAST(CAST(ctx.ctx + vv.V AS DOUBLE)
              / CAST(c2.c2 + 1 AS DOUBLE) AS DECIMAL(28,6)) AS term
  FROM big JOIN c2 USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN vv
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       CAST(SUM(term) AS DOUBLE) / COUNT(*) AS mean_bigram_rarity
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Deterministic per-epoch shuffle + length-bucketed batching

SHUFFLE_EPOCH = 2
BATCH_TOKEN_BUDGET = 256
BATCH_BUCKET_WIDTH = 16


def doc_epoch_shuffle(t: dict[str, DataFrame]) -> DataFrame:
    """Reproducible epoch-2 training order (``corpus.epoch_shuffle``):
    position = two-phase rank of the per-epoch universal hash — a
    different deterministic permutation every epoch, resumable
    mid-epoch on any cluster layout (what ``orderBy(rand())`` can
    never give a training job)."""
    return (
        corpus.epoch_shuffle(t["documents"], epoch=SHUFFLE_EPOCH)
        .select("doc_id", "position")
        .orderBy("doc_id")
    )


DOC_EPOCH_SHUFFLE_ORACLE = f"""
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (
         ORDER BY ((doc_id % {HASH_P})
                   * {1 + (corpus.SHUFFLE_A + SHUFFLE_EPOCH * corpus.SHUFFLE_C) % (HASH_P - 1)}
                   + {corpus.SHUFFLE_B}) % {HASH_P},
                  doc_id) AS BIGINT) AS position
FROM documents ORDER BY doc_id
"""


def doc_length_batches(t: dict[str, DataFrame]) -> DataFrame:
    """Length-bucketed batch assignment
    (``corpus.length_bucketed_batches``): similar-length docs batch
    together (padding waste bounded by the 16-token bucket width),
    batches cut at 256 tokens by the two-phase within-bucket cumsum.
    The oracle replays the running total as a plain window — the
    sub-bucketed two-phase form must equal it exactly."""
    return corpus.length_bucketed_batches(
        t["documents"],
        token_budget=BATCH_TOKEN_BUDGET,
        bucket_width_tokens=BATCH_BUCKET_WIDTH,
    ).orderBy("doc_id")


DOC_LENGTH_BATCHES_ORACLE = rf"""
WITH {_TOKS_SQL.strip().rstrip()},
base AS (
  SELECT doc_id, CAST(len(arr) AS BIGINT) AS n_tokens,
         CAST(len(arr) // {BATCH_BUCKET_WIDTH} AS BIGINT) AS len_bucket
  FROM toks WHERE len(arr) > 0
)
SELECT doc_id, n_tokens, len_bucket,
       CAST((SUM(n_tokens) OVER (PARTITION BY len_bucket ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
            // {BATCH_TOKEN_BUDGET} AS BIGINT) AS batch_idx
FROM base ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Stupid-Backoff bigram LM scoring (VERDICT r6 #6b — the backoff
# completion of the rarity family above)

LM_MIN_COUNT = 3


def doc_lm_backoff(t: dict[str, DataFrame]) -> DataFrame:
    """Stupid-Backoff bigram-LM document scores
    (``corpus.lm_backoff_score``): transitions whose bigram count
    clears ``min_count=3`` score the raw conditional ``c2/c1(w1)``;
    the rest BACK OFF to ``0.4 * c1(w2)/T`` — the Brants et al. 2007
    web-scale LM recipe, ln-free so the oracle replays it exactly.
    ``n_backoff`` counts the out-of-distribution transitions (the
    filter signal CCNet thresholds perplexity for)."""
    return corpus.lm_backoff_score(t["documents"], min_count=LM_MIN_COUNT).orderBy(
        "doc_id"
    )


DOC_LM_BACKOFF_ORACLE = rf"""
WITH {_TOKS_SQL.strip().rstrip()},
tok AS (SELECT doc_id, unnest(arr) AS token FROM toks),
c1 AS (SELECT token, COUNT(*) AS c1 FROM tok GROUP BY token),
tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS T FROM c1),
big AS (
  SELECT doc_id, arr[i] AS w1, arr[i+1] AS w2
  FROM toks, UNNEST(range(1, len(arr))) AS t(i)
  WHERE len(arr) >= 2
),
c2 AS (
  SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY w1, w2
  HAVING COUNT(*) >= {LM_MIN_COUNT}
),
scored AS (
  SELECT big.doc_id,
         CASE WHEN c2.c2 IS NOT NULL THEN 1 ELSE 0 END AS known,
         CAST(CASE WHEN c2.c2 IS NOT NULL
              THEN CAST(c2.c2 AS DOUBLE) / CAST(u1.c1 AS DOUBLE)
              ELSE CAST(2 * u2.c1 AS DOUBLE) / CAST(5 * tot.T AS DOUBLE)
              END AS DECIMAL(28,12)) AS term
  FROM big
  LEFT JOIN c2 ON c2.w1 = big.w1 AND c2.w2 = big.w2
  JOIN c1 u1 ON u1.token = big.w1
  JOIN c1 u2 ON u2.token = big.w2
  CROSS JOIN tot
)
SELECT doc_id,
       COUNT(*) AS n_transitions,
       CAST(COUNT(*) - SUM(known) AS BIGINT) AS n_backoff,
       CAST(SUM(term) AS DOUBLE) / COUNT(*) AS lm_score
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# DSIR importance weighting (Xie et al. 2023 — target-domain selection)


def doc_dsir_weights(t: dict[str, DataFrame]) -> DataFrame:
    """DSIR importance weights for every document against the curated
    English slice as the target domain (``corpus.dsir_importance``):
    mean bigram likelihood ratio p_target/q_raw with add-one smoothing
    — the principled data-selection score (resample with
    ``priority_sample`` over it). Non-'en' docs whose bigrams never
    occur in the target land near the smoothing floor; target-like
    docs score ~V-normalized ratios above 1."""
    docs = t["documents"]
    return corpus.dsir_importance(docs, docs.filter(F.col("lang") == "en")).orderBy(
        "doc_id"
    )


DOC_DSIR_WEIGHTS_ORACLE = rf"""
WITH {_TOKS_SQL.strip().rstrip()},
big AS (
  SELECT doc_id, arr[i] || ' ' || arr[i+1] AS f
  FROM toks, UNNEST(range(1, len(arr))) AS t(i)
  WHERE len(arr) >= 2
),
raw AS (SELECT f, COUNT(*) AS cr FROM big GROUP BY f),
tgt AS (
  SELECT b.f, COUNT(*) AS ct
  FROM big b JOIN documents d USING (doc_id)
  WHERE d.lang = 'en'
  GROUP BY b.f
),
tot AS (
  SELECT CAST(SUM(cr) AS BIGINT) AS Tr, COUNT(*) AS V,
         (SELECT CAST(COALESCE(SUM(ct), 0) AS BIGINT) FROM tgt) AS Tt
  FROM raw
),
scored AS (
  SELECT big.doc_id,
         CAST(
           (CAST(COALESCE(tgt.ct, 0) + 1 AS DOUBLE)
            / CAST(COALESCE(raw.cr, 0) + 1 AS DOUBLE))
           * (CAST(tot.Tr + tot.V AS DOUBLE) / CAST(tot.Tt + tot.V AS DOUBLE))
         AS DECIMAL(28,12)) AS term
  FROM big
  LEFT JOIN tgt USING (f)
  LEFT JOIN raw USING (f)
  CROSS JOIN tot
)
SELECT doc_id, COUNT(*) AS n_transitions,
       CAST(SUM(term) AS DOUBLE) / COUNT(*) AS dsir_weight
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Exact-substring duplication census (VERDICT r6 #6c — Lee et al. 2022)

DUP_GRAM_K = 5


def doc_substring_dup(t: dict[str, DataFrame]) -> DataFrame:
    """Per-document exact-substring duplication coverage
    (``corpus.substring_dup_census``): the fraction of each doc's token
    positions inside a 5-token window occurring >= 2 times corpus-wide
    — Lee et al. 2022's dedup target in its DataFrame-native fixed-k
    formulation (positional k-grams + per-doc interval-union window).
    The integer position arithmetic replays exactly in SQL."""
    return corpus.substring_dup_census(t["documents"], k=DUP_GRAM_K).orderBy("doc_id")


DOC_SUBSTRING_DUP_ORACLE = rf"""
WITH {_TOKS_SQL.strip().rstrip()},
base AS (SELECT doc_id, arr, len(arr) AS n_tokens FROM toks WHERE len(arr) >= {DUP_GRAM_K}),
g AS (
  SELECT doc_id, n_tokens, i AS s,
         arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] || ' ' || arr[i+3] || ' ' || arr[i+4] AS gram
  FROM base, UNNEST(range(1, n_tokens - {DUP_GRAM_K} + 2)) AS t(i)
),
cnt AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
dup AS (
  SELECT g.doc_id, g.s, g.s + {DUP_GRAM_K} AS e
  FROM g JOIN cnt USING (gram)
),
merged AS (
  SELECT doc_id,
         GREATEST(0, e - GREATEST(COALESCE(
           MAX(e) OVER (PARTITION BY doc_id ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0), s)) AS cov
  FROM dup
),
covered AS (SELECT doc_id, CAST(SUM(cov) AS BIGINT) AS dup_tokens FROM merged GROUP BY doc_id)
SELECT b.doc_id,
       CAST(b.n_tokens AS BIGINT) AS n_tokens,
       COALESCE(c.dup_tokens, 0) AS dup_tokens,
       CAST(COALESCE(c.dup_tokens, 0) AS DOUBLE) / CAST(b.n_tokens AS DOUBLE) AS dup_fraction
FROM base b LEFT JOIN covered c USING (doc_id)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Exact-substring dedup REMOVAL (the census's action step)


def doc_substring_dedup(t: dict[str, DataFrame]) -> DataFrame:
    """Exact-substring span REMOVAL (``corpus.substring_dedup``):
    Lee et al. 2022's all-but-one policy made deterministic — the
    corpus-wide FIRST occurrence of every duplicated 5-gram survives
    (per-gram argmin window), later copies lose the duplicated span,
    canonical-overlapped positions are kept. Emits the cleaned token
    stream plus removal counts; the census query reports how much mass
    this pass touches before you run it."""
    return corpus.substring_dedup(t["documents"], k=DUP_GRAM_K).orderBy("doc_id")


DOC_SUBSTRING_DEDUP_ORACLE = rf"""
WITH {_TOKS_SQL.strip().rstrip()},
base AS (SELECT doc_id, arr, len(arr) AS n FROM toks WHERE len(arr) > 0),
g AS (
  SELECT doc_id, i AS s,
         arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] || ' ' || arr[i+3] || ' ' || arr[i+4] AS gram
  FROM base, UNNEST(range(1, n - {DUP_GRAM_K} + 2)) AS t(i)
  WHERE n >= {DUP_GRAM_K}
),
dupg AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
occ AS (
  SELECT g.doc_id, g.s,
         (ROW_NUMBER() OVER (PARTITION BY g.gram ORDER BY g.doc_id, g.s)) = 1 AS canon
  FROM g JOIN dupg USING (gram)
),
cover AS (
  SELECT doc_id, s + j AS p, MAX(CASE WHEN canon THEN 1 ELSE 0 END) AS anyc
  FROM occ, UNNEST(range(0, {DUP_GRAM_K})) AS t(j)
  GROUP BY doc_id, s + j
),
tok AS (
  SELECT doc_id, i AS p, arr[i] AS token
  FROM base, UNNEST(range(1, n + 1)) AS t(i)
),
kept AS (
  SELECT t.doc_id, t.p, t.token,
         COALESCE(c.anyc = 0, FALSE) AS removed
  FROM tok t LEFT JOIN cover c ON c.doc_id = t.doc_id AND c.p = t.p
)
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       COALESCE(string_agg(CASE WHEN NOT removed THEN token END, ' ' ORDER BY p), '') AS cleaned_text
FROM kept GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Suffix-array exact-substring analysis (VERDICT r12 #8 — the full
# Lee et al. formulation over the fixed-k census; operators/suffix.py)

# ORACLE unroll depth only (the Spark operator DERIVES its depth from
# a max-token-count scalar and early-exits on rank convergence —
# VERDICT r13 #3): 2^7 = 128 >= the max doc tokens on every driver
# corpus, the exactness bound tests/test_suffix.py pins per sf. Extra
# rounds are idempotent, so the fixed-depth DuckDB replay and the
# derived-depth operator agree exactly whenever this bound holds.
SA_ROUNDS = 7
SA_L = DUP_GRAM_K  # census threshold == the k-gram census's k (cross-check)
#: Removal threshold for the SA dedup pass — deliberately BELOW
#: DUP_GRAM_K so the registry row demonstrates the capability the
#: fixed-k pass lacks: removing duplicated spans shorter than k.
SA_DEDUP_L = 3


def _sa_token_positions(docs: DataFrame) -> DataFrame:
    """Session-cached token-position explode shared by BOTH SA modes
    (optimization round 15): the rank-mode and hashed-mode builds each
    read it three times; one word explode per corpus instead of two.
    Corpus-position scale, so staged to parquet when
    ``SPARK_GRAFT_STAGE_DIR`` is set."""
    from ..operators import suffix

    from . import materialize

    return materialize.get_or_build(
        "sa_token_positions",
        str(docs.semanticHash()),
        lambda: suffix.token_positions(docs),
        corpus_scale=True,
    )


def _sa_dup_lengths(docs: DataFrame) -> DataFrame:
    """Session-cached per-position SA dup-lengths (S7): the census
    (``doc_substring_sa``) and the removal pass
    (``doc_substring_sa_dedup``) share one prefix-doubling build per
    corpus — corpus-position scale, so staged to parquet when
    ``SPARK_GRAFT_STAGE_DIR`` is set."""
    from ..operators import suffix

    from . import materialize

    return materialize.get_or_build(
        "sa_dup_lengths",
        str(docs.semanticHash()),
        lambda: suffix.suffix_dup_lengths(
            docs, rounds=None, pos=_sa_token_positions(docs)
        ),
        corpus_scale=True,
    )


def _sa_dup_lengths_hashed(docs: DataFrame) -> DataFrame:
    """Session-cached HASHED-mode SA dup-lengths (VERDICT r14 #4: the
    hashed census was the top bench query because it rebuilt its own
    suffix array per call while the rank-mode build was shared) —
    same cache-key family and parquet staging tier as the rank-mode
    build, so the bench itemizes the doubling cost in
    ``cache_build_seconds`` and any future hashed-mode consumer
    (removal, shard stats) reuses one build per corpus."""
    from ..operators import suffix

    from . import materialize

    return materialize.get_or_build(
        "sa_dup_lengths_hashed",
        str(docs.semanticHash()),
        lambda: suffix.suffix_dup_lengths(
            docs, rounds=None, hashed_tokens=True, pos=_sa_token_positions(docs)
        ),
        corpus_scale=True,
    )


def doc_substring_sa(t: dict[str, DataFrame]) -> DataFrame:
    """Suffix-array exact-substring census (``suffix.suffix_dup_lengths``
    via prefix doubling + LCP descent): per doc the EXACT longest
    duplicated-substring length (any length — the answer the fixed-k
    census structurally cannot give) plus the coverage census at
    threshold SA_L, which by the maximal-substring identity equals
    ``doc_substring_dup``'s coverage (pinned in pytest). The doubling
    depth is DERIVED (``rounds=None``: ceil(log2(max doc tokens)) with
    per-round convergence early-exit); the oracle unrolls a fixed
    SA_ROUNDS-deep replay in DuckDB — equal by idempotence while the
    per-sf bound test holds."""
    from ..operators import suffix

    return suffix.suffix_dup_census(
        _sa_dup_lengths(t["documents"]),
        threshold=SA_L,
    ).orderBy("doc_id")


def doc_substring_sa_hashed(t: dict[str, DataFrame]) -> DataFrame:
    """Production-mode SA census: round-0 token ids are map-side
    ``pmod(xxhash64(tok), P63) + 1`` — the only string-shuffling rank
    round disappears and every exchange carries 8-byte ints (VERDICT
    r13 #7, the ``substring_gram_sink`` discipline).

    Oracle note: xxhash64 is engine-specific, so the oracle replays
    the RANK-mode pipeline — sound because ``dup_len`` is an LCP
    maximum, invariant under any alphabet relabeling (see
    ``suffix.suffix_dup_lengths``); bit-equality of the two modes on
    the driver corpus is additionally pinned by
    ``tests/test_suffix.py::test_hashed_mode_parity`` at the same sf,
    the ``near_dup_minhash_hashed`` discipline. The hashed doubling is
    session-cached/staged like the rank-mode build (VERDICT r14 #4)."""
    from ..operators import suffix

    return suffix.suffix_dup_census(
        _sa_dup_lengths_hashed(t["documents"]),
        threshold=SA_L,
    ).orderBy("doc_id")


def doc_substring_sa_dedup(t: dict[str, DataFrame]) -> DataFrame:
    """SA-driven exact-substring REMOVAL at arbitrary span length
    (``suffix.sa_substring_dedup`` — the action step of Lee et al.
    2022): all-but-one occurrence of every duplicated token span of
    length >= SA_DEDUP_L (= 3, BELOW the fixed-k pass's k = 5) is
    removed, covering each occurrence's FULL maximal match length.
    Shares the session-cached dup-lengths build with the census;
    pytest pins (a) equality with ``doc_substring_dedup`` on a corpus
    whose duplicated spans are all exactly k tokens and (b) a span the
    fixed-k pass structurally misses being removed here."""
    from ..operators import suffix

    docs = t["documents"]
    return suffix.sa_substring_dedup(
        docs, min_len=SA_DEDUP_L, dup_lengths=_sa_dup_lengths(docs)
    ).orderBy("doc_id")


def _sa_dl_ctes(rounds: int) -> list[str]:
    """Shared CTE chain of the SA oracles, up to and including ``dl``
    (per-position dup lengths): unrolled prefix-doubling ``r0..r{rounds}``
    rank CTEs (dense_rank over half-prefix rank pairs, sentinel 0 past
    the document end), suffix order + adjacency, then the binary
    descent ``l{rounds}..l0`` accumulating 2^t on round-t rank
    agreement at the running offset — the same arithmetic as the Spark
    operator, engine-portable because only integer equality classes
    and ASCII token order enter. Composed by the census oracle
    (``_sa_oracle``) and the removal oracle (``_sa_dedup_oracle``) so
    the replayed doubling can never fork between them."""
    ctes = [
        _TOKS_SQL.strip().rstrip(),
        """pos AS MATERIALIZED (
  SELECT doc_id AS d, CAST(len(arr) AS BIGINT) AS n,
         CAST(unnest(generate_series(1, len(arr))) AS BIGINT) AS p,
         unnest(arr) AS tok
  FROM toks WHERE len(arr) >= 1
)""",
        "r0 AS MATERIALIZED (SELECT d, n, p, CAST(dense_rank() OVER (ORDER BY tok) AS BIGINT) AS r FROM pos)",
    ]
    for t_ in range(1, rounds + 1):
        half = 1 << (t_ - 1)
        ctes.append(
            f"""r{t_} AS MATERIALIZED (
  SELECT a.d, a.n, a.p,
         CAST(dense_rank() OVER (ORDER BY a.r, COALESCE(b.r, 0)) AS BIGINT) AS r
  FROM r{t_ - 1} a LEFT JOIN r{t_ - 1} b ON b.d = a.d AND b.p = a.p + {half}
)"""
        )
    ctes.append(
        f"""ordr AS MATERIALIZED (
  SELECT *, ROW_NUMBER() OVER (ORDER BY r, d, p) AS s FROM r{rounds}
)"""
    )
    ctes.append(
        """adj AS MATERIALIZED (
  SELECT a.d, a.p, a.n, b.d AS d2, b.p AS p2, b.n AS n2,
         CAST(0 AS BIGINT) AS acc
  FROM ordr a JOIN ordr b ON b.s = a.s + 1
)"""
    )
    prev = "adj"
    for t_ in range(rounds, -1, -1):
        span = 1 << t_
        cur = f"l{t_}"
        ctes.append(
            f"""{cur} AS MATERIALIZED (
  SELECT q.d, q.p, q.n, q.d2, q.p2, q.n2,
         q.acc + CASE WHEN x.r IS NOT NULL AND y.r IS NOT NULL AND x.r = y.r
                      THEN {span} ELSE 0 END AS acc
  FROM {prev} q
  LEFT JOIN r{t_} x ON x.d = q.d AND x.p = q.p + q.acc
  LEFT JOIN r{t_} y ON y.d = q.d2 AND y.p = q.p2 + q.acc
)"""
        )
        prev = cur
    ctes.append(
        f"""lcp AS MATERIALIZED (
  SELECT d, p, d2, p2,
         least(acc, n - p + 1, n2 - p2 + 1) AS lcp
  FROM {prev}
)"""
    )
    ctes.append(
        """best AS MATERIALIZED (
  SELECT d, p, CAST(MAX(dl) AS BIGINT) AS dup_len
  FROM (SELECT d, p, lcp AS dl FROM lcp
        UNION ALL SELECT d2, p2, lcp FROM lcp)
  GROUP BY d, p
)"""
    )
    ctes.append(
        """dl AS MATERIALIZED (
  SELECT pos.d, pos.p, pos.n, COALESCE(best.dup_len, 0) AS dup_len
  FROM pos LEFT JOIN best ON best.d = pos.d AND best.p = pos.p
)"""
    )
    return ctes


def _sa_oracle(rounds: int, threshold: int) -> str:
    """SA census replay: the shared ``dl`` chain (``_sa_dl_ctes``)
    plus the interval-union coverage census at ``threshold``."""
    ctes = _sa_dl_ctes(rounds)
    ctes.append(
        f"""dup AS (SELECT d, p, p + {threshold} AS e FROM dl WHERE dup_len >= {threshold}),
cov0 AS (
  SELECT d, GREATEST(0, e - GREATEST(COALESCE(
    MAX(e) OVER (PARTITION BY d ORDER BY p
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0), p)) AS c
  FROM dup
),
cov AS (SELECT d, CAST(SUM(c) AS BIGINT) AS dup_tokens FROM cov0 GROUP BY d),
perdoc AS (
  SELECT d, CAST(MAX(n) AS BIGINT) AS n_tokens,
         CAST(MAX(dup_len) AS BIGINT) AS max_dup_len
  FROM dl GROUP BY d
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT perdoc.d AS doc_id, n_tokens, max_dup_len,
       COALESCE(cov.dup_tokens, 0) AS dup_tokens,
       CAST(COALESCE(cov.dup_tokens, 0) AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS dup_fraction
FROM perdoc LEFT JOIN cov ON cov.d = perdoc.d
ORDER BY doc_id
"""
    )


DOC_SUBSTRING_SA_ORACLE = _sa_oracle(SA_ROUNDS, SA_L)


def _sa_dedup_oracle(rounds: int, min_len: int) -> str:
    """SA removal replay: the shared ``dl`` chain, then the all-but-one
    policy — occurrences are positions with ``dup_len >= min_len``,
    each covering its FULL maximal span ``[p, p + dup_len)``; families
    key by the leading ``min_len``-gram; the corpus-first ``(doc, p)``
    per family is canonical; a position is removed iff covered only by
    non-canonical occurrences. Mirrors ``suffix.sa_substring_dedup``."""
    gram = " || ' ' || ".join(
        f"arr[i + {j}]" if j else "arr[i]" for j in range(min_len)
    )
    ctes = _sa_dl_ctes(rounds)
    ctes.append(
        f"""fam AS (
  SELECT doc_id AS d, i AS p, {gram} AS gram
  FROM toks, UNNEST(range(1, len(arr) - {min_len} + 2)) AS t(i)
  WHERE len(arr) >= {min_len}
)"""
    )
    ctes.append(
        f"""occ AS (
  SELECT s.d, s.p, s.dup_len,
         (ROW_NUMBER() OVER (PARTITION BY f.gram ORDER BY s.d, s.p)) = 1 AS canon
  FROM (SELECT d, p, dup_len FROM dl WHERE dup_len >= {min_len}) s
  JOIN fam f ON f.d = s.d AND f.p = s.p
)"""
    )
    ctes.append(
        """cov AS (
  SELECT d, p + j AS p, MAX(CASE WHEN canon THEN 1 ELSE 0 END) AS anyc
  FROM occ, UNNEST(range(0, dup_len)) AS t(j)
  GROUP BY d, p + j
)"""
    )
    ctes.append(
        """kept AS (
  SELECT pos.d, pos.p, pos.tok AS token,
         COALESCE(cov.anyc = 0, FALSE) AS removed
  FROM pos LEFT JOIN cov ON cov.d = pos.d AND cov.p = pos.p
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT d AS doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       COALESCE(string_agg(CASE WHEN NOT removed THEN token END, ' ' ORDER BY p), '') AS cleaned_text
FROM kept GROUP BY d ORDER BY doc_id
"""
    )


DOC_SUBSTRING_SA_DEDUP_ORACLE = _sa_dedup_oracle(SA_ROUNDS, SA_DEDUP_L)


# ---------------------------------------------------------------------------
# BPE tokenizer training (operators/bpe.py)

BPE_ROUNDS = 8


def _trained_merges(docs: DataFrame) -> DataFrame:
    """Session-cached trained merge table (S7): ``bpe_merges`` and
    ``bpe_token_stats`` share one training run per corpus — the 8-round
    loop is the expensive half, the encode pass the other."""
    from ..operators import bpe
    from . import materialize

    return materialize.get_or_build(
        "bpe_trained_merges",
        str(docs.semanticHash()),
        lambda: bpe.bpe_train(docs, n_merges=BPE_ROUNDS),
    )


def bpe_merges(t: dict[str, DataFrame]) -> DataFrame:
    """First ``BPE_ROUNDS`` byte-pair-encoding merges trained on the
    corpus word-frequency table — each round's winning pair and its
    weighted count, in training order."""
    return _trained_merges(t["documents"]).orderBy("merge_rank")


def _bpe_oracle(rounds: int) -> str:
    """Unrolled round-by-round replay: the merge loop is inherently
    iterative-with-argmax (a recursive CTE cannot re-aggregate per
    step), so the oracle chains one (pairs -> argmax -> apply) CTE
    triple per round — generated, not hand-written."""
    ctes = [
        _TOKS_SQL.strip().strip(","),
        """wc AS (
  SELECT token AS word, COUNT(*) AS cnt
  FROM (SELECT unnest(arr) AS token FROM toks) GROUP BY token
)""",
        """w0 AS (
  SELECT ' ' || array_to_string(regexp_extract_all(word, '.'), ' ')
             || ' </w> ' AS sym, cnt
  FROM wc
)""",
    ]
    for i in range(rounds):
        ctes.append(
            f"""p{i} AS (
  SELECT pr.l AS l, pr.r AS r, CAST(SUM(cnt) AS BIGINT) AS n
  FROM (
    SELECT cnt, unnest(list_transform(generate_series(1, len(arr) - 1),
                 j -> struct_pack(l := arr[j], r := arr[j + 1]))) AS pr
    FROM (SELECT string_split(trim(sym), ' ') AS arr, cnt FROM w{i})
    WHERE len(arr) >= 2
  ) GROUP BY pr.l, pr.r
)""".strip()
        )
        ctes.append(f"t{i} AS (SELECT l, r, n FROM p{i} ORDER BY n DESC, l, r LIMIT 1)")
        if i < rounds - 1:
            ctes.append(
                f"""w{i + 1} AS (
  SELECT replace(sym, ' ' || t.l || ' ' || t.r || ' ',
                 ' ' || t.l || t.r || ' ') AS sym, cnt
  FROM w{i}, t{i} t
)""".strip()
            )
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS merge_rank, l AS left_sym,"
        f" r AS right_sym, n AS pair_count FROM t{i}"
        for i in range(rounds)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT * FROM (\n{union}\n) ORDER BY merge_rank"
    )


BPE_MERGES_ORACLE = _bpe_oracle(BPE_ROUNDS)


BPE_TOP_TOKENS = 30


def _bpe_encoded_tokens(docs: DataFrame) -> DataFrame:
    """Session-cached encoded corpus (doc_id, token) under the trained
    merges (S7): the broadcast-fold encode pass is the expensive half
    of THREE queries (``bpe_token_stats``, ``bpe_fertility_by_lang``,
    ``tokenizer_fertility_compare``) — built once per corpus, like the
    training run itself. ``corpus_scale=True``: the token table grows
    with the corpus, so the staged-parquet spill mode applies at 100 TB
    (encode-once-materialize is exactly what a production tokenizer
    pipeline does with its encode output)."""
    from ..operators import bpe
    from . import materialize

    return materialize.get_or_build(
        "bpe_encoded_tokens",
        str(docs.semanticHash()),
        lambda: bpe.bpe_encode(docs, _trained_merges(docs)),
        corpus_scale=True,
    )


def bpe_token_stats(t: dict[str, DataFrame]) -> DataFrame:
    """Encode the corpus with the freshly trained merge table
    (``bpe.bpe_encode``: broadcast merge fold per word, no shuffle of
    the documents) and report the top tokens by count — the vocabulary
    histogram a tokenizer-training pipeline inspects. The oracle
    replays training AND encoding round by round."""
    enc = _bpe_encoded_tokens(t["documents"])
    return (
        enc.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(BPE_TOP_TOKENS)
    )


def _bpe_encode_oracle(rounds: int, top: int) -> str:
    """Training CTEs from :func:`_bpe_oracle` + one encode CTE per
    round applying that round's merge to every document word."""
    base = _bpe_oracle(rounds)
    ctes = base[: base.rindex("SELECT * FROM (")].rstrip()
    out = [
        ctes
        + """,
dw0 AS (
  SELECT doc_id,
         ' ' || array_to_string(regexp_extract_all(token, '.'), ' ')
             || ' </w> ' AS sym
  FROM (SELECT doc_id, unnest(arr) AS token FROM toks)
)"""
    ]
    for i in range(rounds):
        out.append(
            f"""dw{i + 1} AS (
  SELECT doc_id, replace(sym, ' ' || t.l || ' ' || t.r || ' ',
                         ' ' || t.l || t.r || ' ') AS sym
  FROM dw{i}, t{i} t
)"""
        )
    return (
        ",\n".join(out)
        + f"""
SELECT token, COUNT(*) AS n
FROM (SELECT unnest(string_split(trim(sym), ' ')) AS token FROM dw{rounds})
GROUP BY token ORDER BY n DESC, token LIMIT {top}
"""
    )


BPE_TOKEN_STATS_ORACLE = _bpe_encode_oracle(BPE_ROUNDS, BPE_TOP_TOKENS)


# ---------------------------------------------------------------------------
# Exact class-balanced oversampling


def doc_balanced_oversample(t: dict[str, DataFrame]) -> DataFrame:
    """EXACT class-balanced oversampling over the language column
    (``corpus.balanced_oversample``): every language is replicated to
    precisely the majority language's document count — base copies
    ``n_max div n_c`` for all docs plus one extra for the first
    ``n_max mod n_c`` docs of the class in id order, so each class sums
    to exactly ``n_max`` (deterministic, not a random resample). The
    within-class ordinal is the corpus-wide two-phase rank minus a
    broadcast per-class offset — never a skewed
    ``Window.partitionBy(lang)`` sort. Oracle: full replay
    (ROW_NUMBER per class, integer div/mod, generate_series)."""
    return corpus.balanced_oversample(t["documents"], class_col="lang").orderBy(
        "doc_id", "copy_id"
    )


DOC_BALANCED_OVERSAMPLE_ORACLE = """
WITH counts AS (SELECT lang, COUNT(*) AS n_c FROM documents GROUP BY lang),
mx AS (SELECT MAX(n_c) AS n_max FROM counts),
ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS cr
  FROM documents
),
sized AS (
  SELECT r.doc_id, r.lang,
         (m.n_max // c.n_c)
           + CASE WHEN r.cr <= m.n_max % c.n_c THEN 1 ELSE 0 END AS n_copies
  FROM ranked r JOIN counts c USING (lang) CROSS JOIN mx m
)
SELECT s.doc_id, s.lang, CAST(u.copy_id AS BIGINT) AS copy_id
FROM sized s, unnest(generate_series(1, CAST(s.n_copies AS BIGINT))) AS u(copy_id)
ORDER BY doc_id, copy_id
"""


# ---------------------------------------------------------------------------
# Sparse retrieval: query-by-example BM25


#: Query-by-example documents for the retrieval queries (fixed ids so
#: the oracle interpolates the same literals).
BM25_QUERY_DOCS = [7, 42, 99]
BM25_TOP_K = 10


def doc_bm25_topk(t: dict[str, DataFrame]) -> DataFrame:
    """Sparse lexical retrieval (``corpus.bm25_topk``): BM25 top-10
    query-by-example over three fixed query documents — the inverted-
    index complement to the dense ANN stack, and the sparse half of
    ``hybrid_rrf_fusion``. Rational-odds idf (no ``ln`` — see the
    operator docstring for the bit-portability trade), decimal-summed
    per-term scores, ranking on the exact decimal. Oracle: full replay
    (tf/df/len aggregates, identical integer-ratio arithmetic)."""
    return corpus.bm25_topk(
        t["documents"], BM25_QUERY_DOCS, k=BM25_TOP_K
    ).orderBy("query_doc", "rank")


DOC_BM25_TOPK_ORACLE = f"""
WITH {_TOKS_SQL.strip()},
tok AS (SELECT doc_id, unnest(arr) AS token FROM toks),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
dfq AS (SELECT token, COUNT(*) AS dfreq FROM tf GROUP BY token),
lens AS (SELECT doc_id, COUNT(*) AS len FROM tok GROUP BY doc_id),
tot AS (SELECT SUM(len) AS T, COUNT(*) AS N FROM lens),
q AS (
  SELECT doc_id AS query_doc, token FROM tf
  WHERE doc_id IN ({", ".join(str(i) for i in BM25_QUERY_DOCS)})
),
scored AS (
  SELECT q.query_doc, d.doc_id,
         SUM(CAST(
           (CAST(2*(t.N - f.dfreq) + 1 AS DOUBLE) / CAST(2*f.dfreq + 1 AS DOUBLE))
           * (CAST(d.tf AS DOUBLE) * 2.2)
           / (CAST(d.tf AS DOUBLE)
              + CAST(3*t.T + 9*l.len*t.N AS DOUBLE) / CAST(10*t.T AS DOUBLE))
         AS DECIMAL(28,6))) AS s
  FROM q
  JOIN tf d ON d.token = q.token AND d.doc_id <> q.query_doc
  JOIN dfq f ON f.token = q.token
  JOIN lens l ON l.doc_id = d.doc_id
  CROSS JOIN tot t
  GROUP BY q.query_doc, d.doc_id
),
ranked AS (
  SELECT query_doc, doc_id, s,
         ROW_NUMBER() OVER (PARTITION BY query_doc ORDER BY s DESC, doc_id) AS rank
  FROM scored
)
SELECT query_doc, CAST(rank AS BIGINT) AS rank, doc_id, CAST(s AS DOUBLE) AS bm25
FROM ranked WHERE rank <= {BM25_TOP_K} ORDER BY query_doc, rank
"""


#: A query term held by more than this fraction of the corpus is
#: dropped from capped BM25 scoring (``dfreq * 100 > N * 78``). 78%
#: bites on the driver corpus at every sf — the synthetic vocabulary is
#: ~30 words, half of which sit in ~80% of documents — so the capped
#: query genuinely exercises the truncation path while rare
#: discriminative terms ('dup' and the sub-78% half) keep scoring.
BM25_CAP_NUM = 78
BM25_CAP_DEN = 100


def doc_bm25_capped(t: dict[str, DataFrame]) -> DataFrame:
    """The df-CAPPED BM25 top-k (``corpus.bm25_topk`` with
    ``max_df_num`` — VERDICT r7 #7): query terms in more than 78% of
    documents never enter the postings join, the WAND-style valve that
    stops a stopword-grade term fanning one query across the whole
    corpus at 100 TB. Deterministic integer-ratio truncation, so the
    oracle replays it exactly; ``doc_bm25_term_stats`` publishes the
    accounting row alongside (a capped run without its census is a
    silent recall loss)."""
    return corpus.bm25_topk(
        t["documents"],
        BM25_QUERY_DOCS,
        k=BM25_TOP_K,
        max_df_num=BM25_CAP_NUM,
        max_df_den=BM25_CAP_DEN,
    ).orderBy("query_doc", "rank")


DOC_BM25_CAPPED_ORACLE = f"""
WITH {_TOKS_SQL.strip()},
tok AS (SELECT doc_id, unnest(arr) AS token FROM toks),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
dfq AS (SELECT token, COUNT(*) AS dfreq FROM tf GROUP BY token),
lens AS (SELECT doc_id, COUNT(*) AS len FROM tok GROUP BY doc_id),
tot AS (SELECT SUM(len) AS T, COUNT(*) AS N FROM lens),
q AS (
  SELECT f0.doc_id AS query_doc, f0.token, d0.dfreq FROM tf f0
  JOIN dfq d0 ON d0.token = f0.token
  CROSS JOIN tot t0
  WHERE f0.doc_id IN ({", ".join(str(i) for i in BM25_QUERY_DOCS)})
    AND d0.dfreq * {BM25_CAP_DEN} <= t0.N * {BM25_CAP_NUM}
),
scored AS (
  SELECT q.query_doc, d.doc_id,
         SUM(CAST(
           (CAST(2*(t.N - q.dfreq) + 1 AS DOUBLE) / CAST(2*q.dfreq + 1 AS DOUBLE))
           * (CAST(d.tf AS DOUBLE) * 2.2)
           / (CAST(d.tf AS DOUBLE)
              + CAST(3*t.T + 9*l.len*t.N AS DOUBLE) / CAST(10*t.T AS DOUBLE))
         AS DECIMAL(28,6))) AS s
  FROM q
  JOIN tf d ON d.token = q.token AND d.doc_id <> q.query_doc
  JOIN lens l ON l.doc_id = d.doc_id
  CROSS JOIN tot t
  GROUP BY q.query_doc, d.doc_id
),
ranked AS (
  SELECT query_doc, doc_id, s,
         ROW_NUMBER() OVER (PARTITION BY query_doc ORDER BY s DESC, doc_id) AS rank
  FROM scored
)
SELECT query_doc, CAST(rank AS BIGINT) AS rank, doc_id, CAST(s AS DOUBLE) AS bm25
FROM ranked WHERE rank <= {BM25_TOP_K} ORDER BY query_doc, rank
"""


def doc_bm25_term_stats(t: dict[str, DataFrame]) -> DataFrame:
    """The loud-truncation accounting row for ``doc_bm25_capped``
    (``corpus.bm25_term_stats``): how many query terms the 78% df cap
    drops, which queries are at risk, and the postings-join row bound
    before/after — the census that makes the cap's recall cost visible
    instead of silent. Same contract as r7's
    ``containment_probe_skew``."""
    return corpus.bm25_term_stats(
        t["documents"],
        BM25_QUERY_DOCS,
        max_df_num=BM25_CAP_NUM,
        max_df_den=BM25_CAP_DEN,
    )


DOC_BM25_TERM_STATS_ORACLE = f"""
WITH {_TOKS_SQL.strip()},
tok AS (SELECT doc_id, unnest(arr) AS token FROM toks),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
dfq AS (SELECT token, COUNT(*) AS dfreq FROM tf GROUP BY token),
nd AS (SELECT COUNT(DISTINCT doc_id) AS N FROM tok),
q AS (
  SELECT f.doc_id AS query_doc, f.token, d.dfreq, n.N,
         CASE WHEN d.dfreq * {BM25_CAP_DEN} > n.N * {BM25_CAP_NUM} THEN 1 ELSE 0 END AS hot
  FROM tf f JOIN dfq d ON d.token = f.token CROSS JOIN nd n
  WHERE f.doc_id IN ({", ".join(str(i) for i in BM25_QUERY_DOCS)})
)
SELECT COUNT(*) AS query_terms,
       CAST(SUM(hot) AS BIGINT) AS terms_dropped,
       CAST(COUNT(DISTINCT CASE WHEN hot = 1 THEN query_doc END) AS BIGINT) AS queries_at_risk,
       CAST(SUM(dfreq) AS BIGINT) AS postings_bound_uncapped,
       CAST(SUM(CASE WHEN hot = 1 THEN 0 ELSE dfreq END) AS BIGINT) AS postings_bound_capped,
       CAST(MAX(dfreq) AS BIGINT) AS max_term_df
FROM q
"""


# ---------------------------------------------------------------------------
# Deterministic span-corruption planning (T5-style denoising data prep)


def doc_span_corruption(t: dict[str, DataFrame]) -> DataFrame:
    """Span-corruption plan (``corpus.span_corruption_plan``): one
    3-token masked span per disjoint 20-token window — exactly 15%
    corruption, spans non-overlapping by construction, the whole plan a
    pure map-side function of (doc_id, window) with NO shuffle
    anywhere. Oracle: full replay (generate_series windows, identical
    modular arithmetic, list slicing)."""
    return corpus.span_corruption_plan(t["documents"]).orderBy(
        "doc_id", "span_id"
    )


DOC_SPAN_CORRUPTION_ORACLE = f"""
WITH {_TOKS_SQL.strip()},
base AS (
  SELECT doc_id, arr, len(arr) AS n FROM toks WHERE len(arr) >= 3
),
wins AS (
  SELECT doc_id, arr, CAST(t.w AS BIGINT) AS span_id,
         LEAST(n - t.w * 20, 20) AS win_len
  FROM base, unnest(generate_series(0, CAST(CEIL(n / 20.0) AS BIGINT) - 1)) AS t(w)
),
spans AS (
  SELECT doc_id, arr, span_id,
         span_id * 20
           + (((doc_id % {HASH_P}) * {corpus.SPAN_A} + {corpus.SPAN_B}
               + span_id * {corpus.SPAN_C}) % {HASH_P}) % (win_len - 2)
           + 1 AS start_pos
  FROM wins WHERE win_len >= 3
)
SELECT doc_id, span_id, CAST(start_pos AS BIGINT) AS start_pos,
       CAST(3 AS BIGINT) AS span_len,
       array_to_string(arr[start_pos : start_pos + 2], ' ') AS masked_text
FROM spans
ORDER BY doc_id, span_id
"""


def bpe_fertility_by_lang(t: dict[str, DataFrame]) -> DataFrame:
    """Tokenizer fertility report (the standard tokenizer-eval metric a
    training pipeline checks per language): encode the corpus with the
    session-cached trained merge table and report, per language,
    docs / words / tokens and fertility = tokens per word. Word counts
    are STRUCTURAL — a second pass over the same ``words()`` splitter
    the trainer uses — never inferred from the ``</w>`` marker string,
    which adversarial corpus text could forge mid-token (the marker is
    plain characters once merges glue symbols together). ``n_docs``
    counts documents with at least one word: zero-word (empty or
    whitespace-only) documents contribute no tokens on either engine
    and are excluded from the census by both, identically. Fertility is
    the double division of two exact integer sums — bit-identical
    across engines. The oracle replays training AND encoding round by
    round (same generated CTE chain as ``bpe_token_stats``)."""
    from ..operators.text import words

    docs = t["documents"]
    enc = _bpe_encoded_tokens(docs)
    n_toks = enc.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_toks"))
    # per-row array size — map-side, no explode/shuffle; zero-word docs
    # are still excluded by the inner join (they have no n_toks row)
    n_wrds = docs.select(
        "doc_id", F.size(words("text")).cast("long").alias("n_wrds")
    )
    per_doc = n_toks.join(n_wrds, "doc_id")
    return (
        per_doc.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_wrds").cast("long").alias("n_words"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
            (F.sum("n_toks").cast("double") / F.sum("n_wrds")).alias("fertility"),
        )
        .orderBy("lang")
    )


def _bpe_fertility_oracle(rounds: int) -> str:
    """Training + encode CTEs from :func:`_bpe_encode_oracle`, with the
    final histogram swapped for the per-word -> per-doc -> per-lang
    fertility rollup."""
    base = _bpe_encode_oracle(rounds, 1)
    ctes = base[: base.rindex("SELECT token, COUNT(*)")].rstrip()
    return (
        ctes
        + f""",
per_word AS (
  SELECT doc_id, len(string_split(trim(sym), ' ')) AS n_toks
  FROM dw{rounds}
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_wrds, CAST(SUM(n_toks) AS BIGINT) AS n_toks
  FROM per_word GROUP BY doc_id
)
SELECT d.lang,
       COUNT(*) AS n_docs,
       CAST(SUM(p.n_wrds) AS BIGINT) AS n_words,
       CAST(SUM(p.n_toks) AS BIGINT) AS n_tokens,
       CAST(SUM(p.n_toks) AS DOUBLE) / SUM(p.n_wrds) AS fertility
FROM per_doc p JOIN documents d USING (doc_id)
GROUP BY d.lang ORDER BY d.lang
"""
    )


BPE_FERTILITY_BY_LANG_ORACLE = _bpe_fertility_oracle(BPE_ROUNDS)


# ---------------------------------------------------------------------------
# WordPiece tokenizer training + greedy encode (round 13 — the third
# classic subword family; operators/wordpiece.py)

WP_ROUNDS = 8
WP_MAX_PIECE = 8
WP_TOP_TOKENS = 30


def _trained_wp_merges(docs: DataFrame) -> DataFrame:
    """Session-cached WordPiece merge table (S7 — the `_trained_merges`
    discipline for the third family)."""
    from ..operators import wordpiece
    from . import materialize

    return materialize.get_or_build(
        "wp_trained_merges",
        str(docs.semanticHash()),
        lambda: wordpiece.wordpiece_train(docs, n_merges=WP_ROUNDS),
    )


def wordpiece_merges(t: dict[str, DataFrame]) -> DataFrame:
    """First WP_ROUNDS WordPiece merges trained on the corpus
    word-frequency table (`wordpiece.wordpiece_train`): each round's
    winning pair under the likelihood-gain score
    count(lr)/(count(l)*count(r)) with its count evidence — the
    objective that separates WordPiece from BPE (rare-but-exclusive
    pairs beat frequent-but-promiscuous ones). The oracle replays
    every round's pair counts, symbol counts, score argmax, and merge
    application."""
    return _trained_wp_merges(t["documents"]).orderBy("merge_rank")


def _wp_train_ctes(rounds: int) -> str:
    """Unrolled (pairs + symbol counts -> score argmax -> apply) CTE
    triples, one per round — `_bpe_oracle`'s replay shape with the
    WordPiece score; `t{i}` holds round i's winner."""
    ctes = [
        _TOKS_SQL.strip().strip(","),
        """wpc AS MATERIALIZED (
  SELECT token AS word, COUNT(*) AS cnt
  FROM (SELECT unnest(arr) AS token FROM toks) GROUP BY token
)""",
        """y0 AS MATERIALIZED (
  SELECT ' ' || array_to_string(regexp_extract_all(word, '.'), ' ')
             || ' </w> ' AS sym, cnt
  FROM wpc
)""",
    ]
    for i in range(rounds):
        ctes.append(
            f"""q{i} AS MATERIALIZED (
  SELECT pr.l AS l, pr.r AS r, CAST(SUM(cnt) AS BIGINT) AS n
  FROM (
    SELECT cnt, unnest(list_transform(generate_series(1, len(arr) - 1),
                 j -> struct_pack(l := arr[j], r := arr[j + 1]))) AS pr
    FROM (SELECT string_split(trim(sym), ' ') AS arr, cnt FROM y{i})
    WHERE len(arr) >= 2
  ) GROUP BY pr.l, pr.r
)""".strip()
        )
        ctes.append(
            f"""s{i} AS MATERIALIZED (
  SELECT s, CAST(SUM(cnt) AS BIGINT) AS ns
  FROM (SELECT cnt, unnest(string_split(trim(sym), ' ')) AS s FROM y{i})
  GROUP BY s
)""".strip()
        )
        ctes.append(
            f"""t{i} AS MATERIALIZED (
  SELECT q.l, q.r, q.n, sl.ns AS nl, sr.ns AS nr,
         CAST(q.n AS DOUBLE) / (CAST(sl.ns AS DOUBLE) * CAST(sr.ns AS DOUBLE)) AS score
  FROM q{i} q JOIN s{i} sl ON sl.s = q.l JOIN s{i} sr ON sr.s = q.r
  ORDER BY score DESC, q.l, q.r LIMIT 1
)""".strip()
        )
        if i < rounds - 1:
            ctes.append(
                f"""y{i + 1} AS MATERIALIZED (
  SELECT replace(sym, ' ' || t.l || ' ' || t.r || ' ',
                 ' ' || t.l || t.r || ' ') AS sym, cnt
  FROM y{i}, t{i} t
)""".strip()
            )
    return ",\n".join(ctes)


def _wp_merges_oracle(rounds: int) -> str:
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS merge_rank, l AS left_sym,"
        f" r AS right_sym, n AS pair_count, nl AS left_count,"
        f" nr AS right_count, score FROM t{i}"
        for i in range(rounds)
    )
    return f"WITH {_wp_train_ctes(rounds)}\nSELECT * FROM (\n{union}\n) ORDER BY merge_rank"


WORDPIECE_MERGES_ORACLE = _wp_merges_oracle(WP_ROUNDS)


def wordpiece_token_stats(t: dict[str, DataFrame]) -> DataFrame:
    """Greedy-encode the corpus under the freshly trained WordPiece
    vocabulary (alphabet + merge outputs, end-marks stripped) and
    report the top tokens by corpus occurrence — encode runs once per
    DISTINCT word (`wordpiece.wordpiece_encode_words`, an in-row
    longest-match fold over a broadcast vocab map) and the histogram
    weights by word count, the encode-distinct-words-once discipline
    all three tokenizer families share. `[UNK]` words count too — the
    coverage signal. The oracle replays training, the vocabulary, and
    the greedy scan (a recursive CTE with a longest-first probe)."""
    from ..operators import wordpiece
    from ..operators.text import words as _words

    docs = t["documents"]
    merges = _trained_wp_merges(docs)
    vocab = wordpiece.wordpiece_vocab(docs, merges)
    wt = (
        docs.select(F.explode(_words("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    enc = wordpiece.wordpiece_encode_words(wt, vocab, max_piece_len=WP_MAX_PIECE)
    return (
        enc.select("cnt", F.explode("pieces").alias("token"))
        .groupBy("token")
        .agg(F.sum("cnt").cast("long").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(WP_TOP_TOKENS)
    )


def _wp_greedy_ctes(
    word_src: str, max_piece: int, g: str = "g", gfin: str = "gfin"
) -> str:
    """The greedy longest-match scan as a recursive-CTE pair over any
    ``(word, cnt)`` source — shared by the corpus oracles (source
    ``wpc``) and the foreign-encode oracle (a word table the vocab was
    NOT trained on, where ``[UNK]`` genuinely fires)."""
    return f"""{g} AS (
  SELECT word, cnt, 1 AS i, []::VARCHAR[] AS path, FALSE AS unk FROM {word_src}
  UNION ALL
  SELECT word, cnt,
         CASE WHEN m IS NULL THEN len(word) + 1 ELSE i + length(m) END,
         CASE WHEN m IS NULL THEN path ELSE path || [m] END,
         m IS NULL
  FROM (
    SELECT word, cnt, i, path,
           list_filter(list_transform(
             generate_series(least({max_piece}, len(word) - i + 1), 1, -1),
             l -> substring(word, i, l)),
             p -> map_extract(wvm.m, p)[1] IS NOT NULL)[1] AS m
    FROM {g}, wvm WHERE i <= len(word) AND NOT unk
  )
),
{gfin} AS (
  SELECT word, cnt, CASE WHEN unk THEN ['[UNK]'] ELSE path END AS pieces
  FROM {g} WHERE unk OR i = len(word) + 1
)"""


def _wp_vocab_ctes(rounds: int) -> str:
    """Training + derived-vocabulary CTEs (``... , wpv, wvm``) — the
    front half every WordPiece encode oracle shares."""
    merged_pieces = "\nUNION ALL\n".join(
        f"SELECT replace(l || r, '</w>', '') AS piece FROM t{i}" for i in range(rounds)
    )
    return f"""{_wp_train_ctes(rounds)},
wpv AS MATERIALIZED (
  SELECT DISTINCT piece FROM (
    SELECT unnest(regexp_extract_all(word, '.')) AS piece FROM wpc
    UNION ALL
    {merged_pieces}
  ) WHERE length(piece) > 0
),
wvm AS MATERIALIZED (
  SELECT map_from_entries(list(struct_pack(k := piece, v := 1) ORDER BY piece)) AS m
  FROM wpv
)"""


def _wp_token_stats_oracle(rounds: int, max_piece: int, top: int) -> str:
    return f"""WITH RECURSIVE {_wp_vocab_ctes(rounds)},
{_wp_greedy_ctes("wpc", max_piece)}
SELECT token, CAST(SUM(cnt) AS BIGINT) AS n
FROM (SELECT cnt, unnest(pieces) AS token FROM gfin)
GROUP BY token ORDER BY n DESC, token LIMIT {top}
"""


WORDPIECE_TOKEN_STATS_ORACLE = _wp_token_stats_oracle(
    WP_ROUNDS, WP_MAX_PIECE, WP_TOP_TOKENS
)


def wordpiece_fertility_by_lang(t: dict[str, DataFrame]) -> DataFrame:
    """WordPiece fertility report per language — docs / words / tokens
    / fertility like the BPE and unigram twins, PLUS ``n_unk_words``:
    the words the greedy encoder collapses to ``[UNK]`` (each
    contributing exactly one token), the coverage metric specific to
    a closed-vocabulary greedy tokenizer. NOTE (ADVICE r13): on the
    TRAINING corpus this column is structurally zero — the vocabulary
    includes the full corpus alphabet, so the greedy probe can always
    fall back to single-char pieces; UNK only measures coverage when
    encoding text the vocab was not trained on, which is what
    ``wordpiece_unk_foreign`` reports. The whole encode runs
    IN-ROW per document (the greedy fold inlined inside an aggregate
    over the word array — no explode, no join, no shuffle of the
    documents); zero-word docs are excluded identically on both
    engines. The oracle replays training, the vocabulary, the greedy
    scan per distinct word, and weights by word occurrences."""
    from ..operators import wordpiece
    from ..operators.text import words_sql

    docs = t["documents"]
    merges = _trained_wp_merges(docs)
    vocab = wordpiece.wordpiece_vocab(docs, merges)
    g = wordpiece._greedy_expr("w", WP_MAX_PIECE)
    per_doc = (
        docs.crossJoin(F.broadcast(wordpiece._vocab_map(vocab)))
        .select(
            "lang",
            F.expr(f"size({words_sql('text')})").cast("long").alias("n_wrds"),
            F.expr(
                f"aggregate({words_sql('text')}, 0L,"
                f" (acc, w) -> acc + size(({g})))"
            ).cast("long").alias("n_toks"),
            F.expr(
                f"aggregate({words_sql('text')}, 0L,"
                f" (acc, w) -> acc + if(({g})[0] = '[UNK]', 1L, 0L))"
            ).cast("long").alias("n_unk"),
        )
        .filter(F.col("n_wrds") > 0)
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_wrds").cast("long").alias("n_words"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
            F.sum("n_unk").cast("long").alias("n_unk_words"),
            (
                F.sum("n_toks").cast("double") / F.sum("n_wrds").cast("double")
            ).alias("fertility"),
        )
        .orderBy("lang")
    )


def _wp_fertility_oracle(rounds: int, max_piece: int) -> str:
    base = _wp_token_stats_oracle(rounds, max_piece, 1)
    ctes = base[: base.rindex("SELECT token")].rstrip().rstrip(",")
    return f"""{ctes},
wocc2 AS (
  SELECT doc_id, unnest(arr) AS word FROM toks
),
perdoc2 AS (
  SELECT o.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_wrds,
         CAST(SUM(len(g.pieces)) AS BIGINT) AS n_toks,
         CAST(SUM(CASE WHEN g.pieces[1] = '[UNK]' THEN 1 ELSE 0 END) AS BIGINT) AS n_unk
  FROM wocc2 o JOIN gfin g USING (word) GROUP BY o.doc_id
)
SELECT d.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(p.n_wrds) AS BIGINT) AS n_words,
       CAST(SUM(p.n_toks) AS BIGINT) AS n_tokens,
       CAST(SUM(p.n_unk) AS BIGINT) AS n_unk_words,
       CAST(SUM(p.n_toks) AS DOUBLE) / CAST(SUM(p.n_wrds) AS DOUBLE) AS fertility
FROM perdoc2 p JOIN documents d USING (doc_id)
GROUP BY d.lang ORDER BY d.lang
"""


WORDPIECE_FERTILITY_ORACLE = _wp_fertility_oracle(WP_ROUNDS, WP_MAX_PIECE)


def wordpiece_unk_foreign(t: dict[str, DataFrame]) -> DataFrame:
    """OOV coverage on a FOREIGN corpus (ADVICE r13: on the training
    corpus ``n_unk_words`` is structurally zero — the vocab contains
    the full corpus alphabet, so single-char fallback always succeeds;
    UNK is only a meaningful signal when encoding text the vocabulary
    was NOT trained on). Here the documents-trained vocabulary encodes
    the ``events`` stream's words (``event_type`` + the raw ``props``
    JSON — brace/quote/digit characters are outside the documents
    alphabet, so UNK genuinely fires), reported per event_type: the
    coverage check a tokenizer deploy runs before pointing a trained
    vocab at a new source. Same in-row broadcast greedy fold as the
    fertility query — events are never shuffled."""
    from ..operators import wordpiece
    from ..operators.text import words_sql

    docs = t["documents"]
    vocab = wordpiece.wordpiece_vocab(docs, _trained_wp_merges(docs))
    g = wordpiece._greedy_expr("w", WP_MAX_PIECE)
    per_event = (
        t["events"]
        .withColumn("_ft", F.concat_ws(" ", "event_type", "props"))
        .crossJoin(F.broadcast(wordpiece._vocab_map(vocab)))
        .select(
            "event_type",
            F.expr(f"size({words_sql('_ft')})").cast("long").alias("n_wrds"),
            F.expr(
                f"aggregate({words_sql('_ft')}, 0L,"
                f" (acc, w) -> acc + size(({g})))"
            ).cast("long").alias("n_toks"),
            F.expr(
                f"aggregate({words_sql('_ft')}, 0L,"
                f" (acc, w) -> acc + if(({g})[0] = '[UNK]', 1L, 0L))"
            ).cast("long").alias("n_unk"),
        )
    )
    return (
        per_event.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("n_wrds").cast("long").alias("n_words"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
            F.sum("n_unk").cast("long").alias("n_unk_words"),
            (
                F.sum("n_unk").cast("double") / F.sum("n_wrds").cast("double")
            ).alias("unk_rate"),
        )
        .orderBy("event_type")
    )


def _wp_unk_foreign_oracle(rounds: int, max_piece: int) -> str:
    return f"""WITH RECURSIVE {_wp_vocab_ctes(rounds)},
fwc AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(list_filter(
      regexp_split_to_array(lower(concat_ws(' ', event_type, props)), '\\s+'),
      x -> x <> '')) AS word
    FROM events
  ) GROUP BY word
),
{_wp_greedy_ctes("fwc", max_piece, "fg", "fgfin")},
focc AS (
  SELECT event_type, unnest(list_filter(
    regexp_split_to_array(lower(concat_ws(' ', event_type, props)), '\\s+'),
    x -> x <> '')) AS word
  FROM events
)
SELECT o.event_type,
       CAST((SELECT COUNT(*) FROM events e WHERE e.event_type = o.event_type) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(len(g.pieces)) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN g.pieces[1] = '[UNK]' THEN 1 ELSE 0 END) AS BIGINT) AS n_unk_words,
       CAST(SUM(CASE WHEN g.pieces[1] = '[UNK]' THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS unk_rate
FROM focc o JOIN fgfin g USING (word)
GROUP BY o.event_type ORDER BY o.event_type
"""


WORDPIECE_UNK_FOREIGN_ORACLE = _wp_unk_foreign_oracle(WP_ROUNDS, WP_MAX_PIECE)


# ---------------------------------------------------------------------------
# Unigram-LM (SentencePiece-family) tokenizer training — VERDICT r10 gap #1;
# the second tokenizer family next to BPE, sharing its fertility harness.

UNIGRAM_EM_ROUNDS = 2
UNIGRAM_MAX_PIECE = 4
UNIGRAM_SEED_MULTI = 60
UNIGRAM_KEEP_MULTI = 40


def _trained_unigram(docs: DataFrame) -> DataFrame:
    """Session-cached trained unigram vocabulary (S7): ``unigram_train``
    and ``unigram_fertility_by_lang`` share one training run per corpus
    — the EM rounds are the expensive half, the encode pass the other
    (the ``_trained_merges`` pattern)."""
    from ..operators import unigram
    from . import materialize

    return materialize.get_or_build(
        "unigram_trained_vocab",
        str(docs.semanticHash()),
        lambda: unigram.unigram_train(
            docs,
            em_rounds=UNIGRAM_EM_ROUNDS,
            max_piece_len=UNIGRAM_MAX_PIECE,
            seed_multi=UNIGRAM_SEED_MULTI,
            keep_multi=UNIGRAM_KEEP_MULTI,
        ),
    )


def unigram_train_report(t: dict[str, DataFrame]) -> DataFrame:
    """Final unigram-LM vocabulary after :data:`UNIGRAM_EM_ROUNDS`
    hard-EM rounds — every kept piece with its last-round Viterbi usage
    and add-one-smoothed probability (``operators.unigram``: substring
    seeding, product-space Viterbi, prune-by-usage; all arithmetic
    exact-integer or fixed-order IEEE double, so the oracle replays it
    bit-for-bit with recursive-CTE segmentation passes)."""
    return _trained_unigram(t["documents"]).orderBy(F.desc("usage"), "piece")


def _unigram_dp_cte(
    name: str,
    vm: str,
    max_piece: int,
    src: str = "wc",
    floor: str = "0.0::DOUBLE",
) -> str:
    """One Viterbi pass as a recursive CTE over the (word, cnt) CTE
    ``src`` under the vocabulary map CTE ``vm`` — the single source of
    the DP body shared by every unigram oracle (train rounds,
    fertility, token stats, byte-fallback encode). ``floor`` is the
    out-of-vocabulary piece probability (the byte-fallback oracle
    passes the single-char 1.0 floor — see
    ``operators.unigram._dp_expr`` for why 1.0 is ordering-invariant)."""
    L = max_piece
    return f"""{name} AS (
  SELECT word, cnt, 1 AS i,
         [struct_pack(np := -1.0::DOUBLE, j := 0::BIGINT, path := []::VARCHAR[])] AS best
  FROM {src}
  UNION ALL
  SELECT word, cnt, i + 1,
    best || [list_sort(
      list_transform(generate_series(greatest(1, i - {L} + 1), i),
        j -> struct_pack(
          np := best[j].np * coalesce(map_extract({vm}.m, substring(word, j, i - j + 1))[1], {floor}),
          j := j,
          path := best[j].path || [substring(word, j, i - j + 1)])))[1]]
  FROM {name}, {vm} WHERE i <= len(word)
)"""


def _unigram_train_ctes(rounds: int, max_piece: int, seed_multi: int, keep_multi: int) -> str:
    """Shared CTE chain replaying unigram training round by round: the
    seeding is plain SQL, each E-step Viterbi a recursive CTE carrying
    the per-word best-prefix list (cost/backpath DP — the generated
    analog of ``_bpe_oracle``'s replace chain), each M-step a prune +
    re-estimate pair. ``pv{r}`` is the vocabulary entering round ``r``;
    ``pv{rounds}`` the final one."""
    L = max_piece

    def dp_cte(r: int) -> str:
        return _unigram_dp_cte(f"dp{r}", f"vm{r}", max_piece)

    def vm_cte(r: int) -> str:
        return (
            f"vm{r} AS MATERIALIZED (\n  SELECT map_from_entries(list(struct_pack(k := piece,"
            f" v := p) ORDER BY piece)) AS m FROM pv{r}\n)"
        )

    ctes = [
        _TOKS_SQL.strip().strip(","),
        """wc AS MATERIALIZED (
  SELECT token AS word, COUNT(*) AS cnt
  FROM (SELECT unnest(arr) AS token FROM toks) GROUP BY token
)""",
        f"""subs AS MATERIALIZED (
  SELECT piece, CAST(SUM(cnt) AS BIGINT) AS freq FROM (
    SELECT cnt, unnest(flatten(list_transform(generate_series(1, len(word)),
      s -> list_transform(generate_series(s, least(s + {L} - 1, len(word))),
        e -> substring(word, s, e - s + 1))))) AS piece
    FROM wc) GROUP BY piece
)""",
        f"""v0 AS MATERIALIZED (
  SELECT piece, freq FROM subs WHERE len(piece) = 1
  UNION ALL
  SELECT piece, freq FROM (SELECT piece, freq FROM subs WHERE len(piece) >= 2
                           ORDER BY freq DESC, piece LIMIT {seed_multi})
)""",
        """pv0 AS MATERIALIZED (
  SELECT piece, CAST(freq AS DOUBLE) / CAST((SELECT SUM(freq) FROM v0) AS DOUBLE) AS p FROM v0
)""",
        vm_cte(0),
    ]
    for r in range(rounds):
        ctes.append(dp_cte(r))
        ctes.append(
            f"seg{r} AS MATERIALIZED (SELECT word, cnt, best[len(word) + 1].path AS pieces"
            f" FROM dp{r} WHERE i = len(word) + 1)"
        )
        ctes.append(f"occ{r} AS MATERIALIZED (SELECT unnest(pieces) AS piece, cnt FROM seg{r})")
        ctes.append(
            f"""use{r} AS MATERIALIZED (
  SELECT p.piece, CAST(COALESCE(SUM(o.cnt), 0) AS BIGINT) AS usage
  FROM pv{r} p LEFT JOIN occ{r} o USING (piece) GROUP BY p.piece
)"""
        )
        ctes.append(
            f"""v{r + 1} AS MATERIALIZED (
  SELECT piece, usage FROM use{r} WHERE len(piece) = 1
  UNION ALL
  SELECT piece, usage FROM (SELECT piece, usage FROM use{r} WHERE len(piece) >= 2
                            ORDER BY usage DESC, piece LIMIT {keep_multi})
)"""
        )
        ctes.append(
            f"""pv{r + 1} AS MATERIALIZED (
  SELECT piece, usage, CAST(usage + 1 AS DOUBLE)
         / CAST((SELECT SUM(usage) FROM v{r + 1}) + (SELECT COUNT(*) FROM v{r + 1}) AS DOUBLE) AS p
  FROM v{r + 1}
)"""
        )
        ctes.append(vm_cte(r + 1))
    return "WITH RECURSIVE " + ",\n".join(ctes)


def _unigram_train_oracle(rounds: int, max_piece: int, seed_multi: int, keep_multi: int) -> str:
    return (
        _unigram_train_ctes(rounds, max_piece, seed_multi, keep_multi)
        + f"""
SELECT piece, CAST(len(piece) AS BIGINT) AS n_chars, usage, p AS prob
FROM pv{rounds} ORDER BY usage DESC, piece"""
    )


UNIGRAM_TRAIN_ORACLE = _unigram_train_oracle(
    UNIGRAM_EM_ROUNDS, UNIGRAM_MAX_PIECE, UNIGRAM_SEED_MULTI, UNIGRAM_KEEP_MULTI
)


def unigram_fertility_by_lang(t: dict[str, DataFrame]) -> DataFrame:
    """Per-language fertility under the trained unigram vocabulary —
    the same report as ``bpe_fertility_by_lang`` over the same splitter,
    so the two tokenizer families compare head-to-head in one harness.
    The encode pass segments each DISTINCT word once and joins piece
    counts back to per-doc word multiplicities (never materializing
    per-token rows — both join sides are word-scale at any corpus
    size). The oracle replays training AND the final segmentation."""
    from ..operators import unigram

    docs = t["documents"]
    per_doc = unigram.unigram_word_fertility(
        docs, _trained_unigram(docs), max_piece_len=UNIGRAM_MAX_PIECE
    )
    return (
        per_doc.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_wrds").cast("long").alias("n_words"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
            (F.sum("n_toks").cast("double") / F.sum("n_wrds")).alias("fertility"),
        )
        .orderBy("lang")
    )


def _unigram_fertility_oracle(rounds: int, max_piece: int, seed_multi: int, keep_multi: int) -> str:
    """Training CTEs + one more Viterbi pass under the FINAL vocabulary
    (``dpF`` via the shared DP generator against ``vm{rounds}``), rolled
    up per doc then per lang exactly like ``_bpe_fertility_oracle``."""
    base = _unigram_train_ctes(rounds, max_piece, seed_multi, keep_multi)
    return (
        base
        + ",\n"
        + _unigram_dp_cte("dpF", f"vm{rounds}", max_piece)
        + """,
np AS MATERIALIZED (
  SELECT word, CAST(len(best[len(word) + 1].path) AS BIGINT) AS n_p
  FROM dpF WHERE i = len(word) + 1
),
dwk AS MATERIALIZED (
  SELECT doc_id, word, COUNT(*) AS k
  FROM (SELECT doc_id, unnest(arr) AS word FROM toks) GROUP BY doc_id, word
),
per_doc AS (
  SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_wrds,
         CAST(SUM(k * n_p) AS BIGINT) AS n_toks
  FROM dwk JOIN np USING (word) GROUP BY doc_id
)
SELECT d.lang,
       COUNT(*) AS n_docs,
       CAST(SUM(p.n_wrds) AS BIGINT) AS n_words,
       CAST(SUM(p.n_toks) AS BIGINT) AS n_tokens,
       CAST(SUM(p.n_toks) AS DOUBLE) / SUM(p.n_wrds) AS fertility
FROM per_doc p JOIN documents d USING (doc_id)
GROUP BY d.lang ORDER BY d.lang"""
    )


UNIGRAM_FERTILITY_BY_LANG_ORACLE = _unigram_fertility_oracle(
    UNIGRAM_EM_ROUNDS, UNIGRAM_MAX_PIECE, UNIGRAM_SEED_MULTI, UNIGRAM_KEEP_MULTI
)


# ---------------------------------------------------------------------------
# Gopher/MassiveText repetition-rule census (VERDICT r10 gap #2)


def doc_repetition_census(t: dict[str, DataFrame]) -> DataFrame:
    """Per-document Gopher repetition battery
    (``operators.text.repetition_census``): duplicate-line /
    duplicate-paragraph fractions (occurrence + character mass),
    top-{2,3,4}-gram character share, duplicate word-5-gram
    character-mass fraction. One map-side pass — every list lives
    inside its row; the oracle replays the same exact-integer-ratio
    formulas with list functions and a per-doc (count desc, gram)
    window for the top-gram argmax."""
    from ..operators import text as text_ops

    return text_ops.repetition_census(t["documents"]).orderBy("doc_id")


DOC_REPETITION_CENSUS_ORACLE = f"""
WITH {_TOKS_SQL.strip()},
base AS (
  SELECT d.doc_id, d.text, t.arr
  FROM documents d JOIN toks t USING (doc_id)
  WHERE len(t.arr) >= 5
),
seps AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                     x -> x <> '') AS lines,
         list_filter(list_transform(string_split(text, chr(10) || chr(10)), x -> trim(x)),
                     x -> x <> '') AS paras,
         list_transform(generate_series(1, len(arr) - 4),
                        i -> array_to_string(arr[i : i + 4], ' ')) AS g5,
         len(array_to_string(arr, ' ')) AS total_chars,
         len(arr) AS n_words
  FROM base
),
tops AS (
  SELECT doc_id, n, CAST(cnt * len(g) AS BIGINT) AS mass FROM (
    SELECT doc_id, n, g, COUNT(*) AS cnt,
           ROW_NUMBER() OVER (PARTITION BY doc_id, n ORDER BY COUNT(*) DESC, g) AS rn
    FROM (
      SELECT doc_id, n.n AS n, array_to_string(arr[t.i : t.i + n.n - 1], ' ') AS g
      FROM base,
           unnest([2, 3, 4]) AS n(n),
           unnest(generate_series(1, len(arr) - n.n + 1)) AS t(i)
    ) GROUP BY doc_id, n, g
  ) WHERE rn = 1
)
SELECT s.doc_id,
       CAST(s.n_words AS BIGINT) AS n_words,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE) / len(lines) AS dup_line_frac,
       CAST(list_aggregate(list_transform(lines, x -> len(x)), 'sum')
            - list_aggregate(list_transform(list_distinct(lines), x -> len(x)), 'sum') AS DOUBLE)
         / list_aggregate(list_transform(lines, x -> len(x)), 'sum') AS dup_line_char_frac,
       CAST(len(paras) AS BIGINT) AS n_paras,
       CAST(len(paras) - len(list_distinct(paras)) AS DOUBLE) / len(paras) AS dup_para_frac,
       CAST(list_aggregate(list_transform(paras, x -> len(x)), 'sum')
            - list_aggregate(list_transform(list_distinct(paras), x -> len(x)), 'sum') AS DOUBLE)
         / list_aggregate(list_transform(paras, x -> len(x)), 'sum') AS dup_para_char_frac,
       CAST(t2.mass AS DOUBLE) / s.total_chars AS top2_char_frac,
       CAST(t3.mass AS DOUBLE) / s.total_chars AS top3_char_frac,
       CAST(t4.mass AS DOUBLE) / s.total_chars AS top4_char_frac,
       CASE WHEN len(g5) > 0 THEN
         CAST(list_aggregate(list_transform(g5, x -> len(x)), 'sum')
              - list_aggregate(list_transform(list_distinct(g5), x -> len(x)), 'sum') AS DOUBLE)
           / list_aggregate(list_transform(g5, x -> len(x)), 'sum')
       ELSE 0.0 END AS dup_5gram_char_frac
FROM seps s
JOIN tops t2 ON t2.doc_id = s.doc_id AND t2.n = 2
JOIN tops t3 ON t3.doc_id = s.doc_id AND t3.n = 3
JOIN tops t4 ON t4.doc_id = s.doc_id AND t4.n = 4
ORDER BY s.doc_id
"""


UNIGRAM_TOP_TOKENS = 30


def unigram_token_stats(t: dict[str, DataFrame]) -> DataFrame:
    """Encode the corpus with the trained unigram vocabulary and report
    the top tokens by occurrence — ``bpe_token_stats``'s mate for the
    second tokenizer family. The histogram never touches documents:
    each DISTINCT word is segmented once and its piece multiset is
    weighted by the word's corpus count (token count = Σ word_cnt over
    Viterbi occurrences), so the explode is vocab-scale at any corpus
    size. Ties: (count desc, token asc) on both engines."""
    from ..operators import unigram

    docs = t["documents"]
    wordtab = unigram.word_table(docs)
    seg = unigram.viterbi_segment(
        wordtab, _trained_unigram(docs), max_piece_len=UNIGRAM_MAX_PIECE
    )
    return (
        seg.select(F.explode("pieces").alias("token"), "cnt")
        .groupBy("token")
        .agg(F.sum("cnt").cast("long").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(UNIGRAM_TOP_TOKENS)
    )


def _unigram_token_stats_oracle(
    rounds: int, max_piece: int, seed_multi: int, keep_multi: int, top: int
) -> str:
    """Training CTEs + the final-vocab Viterbi pass (the same shared
    ``dpF`` generator the fertility oracle uses), collapsed to the
    word-count-weighted token histogram."""
    return (
        _unigram_train_ctes(rounds, max_piece, seed_multi, keep_multi)
        + ",\n"
        + _unigram_dp_cte("dpF", f"vm{rounds}", max_piece)
        + f"""
SELECT token, CAST(SUM(cnt) AS BIGINT) AS n
FROM (
  SELECT cnt, unnest(best[len(word) + 1].path) AS token
  FROM dpF WHERE i = len(word) + 1
) GROUP BY token ORDER BY n DESC, token LIMIT {top}"""
    )


UNIGRAM_TOKEN_STATS_ORACLE = _unigram_token_stats_oracle(
    UNIGRAM_EM_ROUNDS,
    UNIGRAM_MAX_PIECE,
    UNIGRAM_SEED_MULTI,
    UNIGRAM_KEEP_MULTI,
    UNIGRAM_TOP_TOKENS,
)


# ---------------------------------------------------------------------------
# Tokenizer artifact publish/apply through the catalog (VERDICT r13 #5):
# every production tokenizer ships as a PUBLISHED artifact — train once,
# persist the vocab/merge table, encode every later corpus from the
# stored copy. These queries run that deploy path end-to-end on the
# correctness gate: train -> WarehouseCatalog.write -> read back ->
# encode FROM THE READ-BACK FRAME. Each reuses its family's existing
# train+encode replay oracle verbatim (the replay never touches the
# published file), so any corruption anywhere in the publish/read-back
# chain — schema drift, dtype loss, row loss, value damage — shifts the
# encoded histogram and fails the hash. The version-pinned re-read path
# (replace -> table_version -> rollback) is pinned by
# tests/test_tokenizer_catalog.py.


def _publish_read_back(docs: DataFrame, name: str, builder) -> DataFrame:
    """Publish a trained tokenizer artifact through a
    ``WarehouseCatalog`` rooted in the temp dir (keyed by the corpus's
    semantic hash — the ``media_file_ingest`` landing-zone discipline —
    AND the process id: two concurrent sessions on the same corpus
    (parallel pytest, driver + bench) must not clobber a parquet dir
    the other's lazy read-back frame is still scanning — ADVICE r14)
    and return the READ-BACK table. Overwrite mode keeps re-publishes
    idempotent; the read-back is session-cached (S7) so the three
    consumer queries pay the write->read cycle once per corpus."""
    import hashlib  # noqa: PLC0415
    import os as _os  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from ..sources.catalog import WarehouseCatalog
    from . import materialize

    key = str(docs.semanticHash())

    def build() -> DataFrame:
        root = _os.path.join(
            tempfile.gettempdir(),
            "dwis_tokenizer_pub_"
            + hashlib.md5(key.encode()).hexdigest()[:12]
            + f"_{_os.getpid()}",
        )
        cat = WarehouseCatalog(docs.sparkSession, root)
        cat.write(name, builder())
        return cat.table(name)

    return materialize.get_or_build(f"published_{name}", key, build)


def bpe_publish_encode(t: dict[str, DataFrame]) -> DataFrame:
    """BPE deploy path: the trained merge table is published via the
    catalog and the corpus encoded from the READ-BACK artifact; output
    contract (top tokens by count) and oracle are ``bpe_token_stats``'s
    — the replay trains+encodes in DuckDB without the publish hop, so
    the pair differentially proves the hop is lossless. Encode order
    comes from the artifact's ``merge_rank`` column (``bpe_encode``
    array_sorts the broadcast fold), never parquet row order."""
    from ..operators import bpe

    docs = t["documents"]
    merges = _publish_read_back(
        docs, "bpe_merges_published", lambda: _trained_merges(docs)
    )
    enc = bpe.bpe_encode(docs, merges)
    return (
        enc.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(BPE_TOP_TOKENS)
    )


def wordpiece_publish_encode(t: dict[str, DataFrame]) -> DataFrame:
    """WordPiece deploy path: the DERIVED VOCABULARY (alphabet + merge
    outputs — the artifact a WordPiece tokenizer actually ships, not
    the training-order merge log) is published and the corpus greedily
    encoded from the read-back copy; output contract and oracle are
    ``wordpiece_token_stats``'s. The greedy longest-match fold keys the
    vocab as an unordered broadcast map, so parquet row order is
    immaterial by construction."""
    from ..operators import wordpiece
    from ..operators.text import words as _words

    docs = t["documents"]
    vocab = _publish_read_back(
        docs,
        "wordpiece_vocab_published",
        lambda: wordpiece.wordpiece_vocab(docs, _trained_wp_merges(docs)),
    )
    wt = (
        docs.select(F.explode(_words("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    enc = wordpiece.wordpiece_encode_words(wt, vocab, max_piece_len=WP_MAX_PIECE)
    return (
        enc.select("cnt", F.explode("pieces").alias("token"))
        .groupBy("token")
        .agg(F.sum("cnt").cast("long").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(WP_TOP_TOKENS)
    )


def unigram_publish_encode(t: dict[str, DataFrame]) -> DataFrame:
    """Unigram-LM deploy path: the trained (piece, prob) vocabulary is
    published and every distinct word Viterbi-segmented from the
    read-back copy; output contract and oracle are
    ``unigram_token_stats``'s. Probabilities are IEEE doubles, which
    parquet round-trips bit-exactly — the hash equality is therefore a
    real check that the published probabilities drive the SAME argmax
    segmentations as the in-session ones."""
    from ..operators import unigram

    docs = t["documents"]
    vocab = _publish_read_back(
        docs, "unigram_vocab_published", lambda: _trained_unigram(docs)
    )
    wordtab = unigram.word_table(docs)
    seg = unigram.viterbi_segment(
        wordtab, vocab, max_piece_len=UNIGRAM_MAX_PIECE
    )
    return (
        seg.select(F.explode("pieces").alias("token"), "cnt")
        .groupBy("token")
        .agg(F.sum("cnt").cast("long").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(UNIGRAM_TOP_TOKENS)
    )


def tokenizer_fertility_compare(t: dict[str, DataFrame]) -> DataFrame:
    """The two tokenizer families head-to-head in one report: per
    (family, lang), docs / words / tokens / fertility from the SAME
    splitter over the SAME corpus — the comparison the fertility
    harness was built for (VERDICT r10 gap #1's acceptance shape).
    Reuses both session-cached training runs (``bpe_trained_merges``,
    ``unigram_trained_vocab``); the oracle replays both training+encode
    chains as independent subqueries and unions them."""
    bpe_f = bpe_fertility_by_lang(t).select(
        F.lit("bpe").alias("family"), "lang", "n_docs", "n_words", "n_tokens", "fertility"
    )
    uni_f = unigram_fertility_by_lang(t).select(
        F.lit("unigram").alias("family"), "lang", "n_docs", "n_words", "n_tokens", "fertility"
    )
    return bpe_f.unionByName(uni_f).orderBy("family", "lang")


TOKENIZER_FERTILITY_COMPARE_ORACLE = f"""
SELECT 'bpe' AS family, t.* FROM ({BPE_FERTILITY_BY_LANG_ORACLE}) t
UNION ALL
SELECT 'unigram' AS family, t.* FROM ({UNIGRAM_FERTILITY_BY_LANG_ORACLE}) t
ORDER BY family, lang
"""


# ---------------------------------------------------------------------------
# Tokenizer byte fallback (VERDICT r11 #5): no input is ever OOV.
#
# The synthetic corpus is single-alphabet (a-w, y + space in every
# language), so a train/encode language split would never exercise the
# fallback — instead the probe DETERMINISTICALLY appends a token of
# characters absent from the whole corpus (``z``, ``x``, and the
# two-byte ``ü``) to a small document slice, which both engines replay
# from the same literal. Training reuses the session-cached runs on
# the FULL corpus, so the probe encode is the only added work.

FALLBACK_PROBE_MOD = 50
FALLBACK_PROBE_CHARS = 40
FALLBACK_PROBE_UNSEEN = " zügxq"


def _fallback_probe(docs: DataFrame) -> DataFrame:
    return docs.filter((F.col("doc_id") % FALLBACK_PROBE_MOD) == 0).select(
        "doc_id",
        F.concat(
            F.substring("text", 1, FALLBACK_PROBE_CHARS),
            F.lit(FALLBACK_PROBE_UNSEEN),
        ).alias("text"),
    )


_FALLBACK_PROBE_SQL = rf"""
probe AS MATERIALIZED (
  SELECT doc_id, substring(text, 1, {FALLBACK_PROBE_CHARS}) || '{FALLBACK_PROBE_UNSEEN}' AS text
  FROM documents WHERE doc_id % {FALLBACK_PROBE_MOD} = 0
),
ptoks AS MATERIALIZED (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS arr
  FROM probe
)"""

# UTF-8 byte tokens of the DuckDB string expression {pc}: <0xNN> per
# byte, uppercase hex — the oracle twin of unigram.byte_tokens_sql.
_DUCK_BYTES = (
    "list_transform(generate_series(1, length(hex(encode({pc}))) // 2),"
    " b -> '<0x' || substring(hex(encode({pc})), 2 * b - 1, 2) || '>')"
)


def unigram_encode_byte_fallback(t: dict[str, DataFrame]) -> DataFrame:
    """Total (never-OOV) unigram encoding of a probe slice carrying
    characters unseen in training: (doc_id, pos, token) where unseen
    characters come out as SentencePiece-style UTF-8 byte tokens
    ``<0xNN>`` and every known span segments exactly as the strict
    encoder would (``unigram.unigram_encode(byte_fallback=True)``: the
    Viterbi floor isolates unknown chars, the post-DP transform
    byte-encodes out-of-vocab pieces; still one broadcast + one
    map-side projection, documents never shuffled). The oracle replays
    training, the floored DP per distinct probe word, the byte
    transform, and the per-document running token positions."""
    from ..operators import unigram

    docs = t["documents"]
    return unigram.unigram_encode(
        _fallback_probe(docs),
        _trained_unigram(docs),
        max_piece_len=UNIGRAM_MAX_PIECE,
        byte_fallback=True,
    ).orderBy("doc_id", "pos")


def _unigram_byte_fallback_oracle(
    rounds: int, max_piece: int, seed_multi: int, keep_multi: int
) -> str:
    floor = "CASE WHEN j = i THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END"
    bytes_pc = _DUCK_BYTES.format(pc="pc")
    return (
        _unigram_train_ctes(rounds, max_piece, seed_multi, keep_multi)
        + ",\n"
        + _FALLBACK_PROBE_SQL.strip().lstrip(",").strip()
        + ",\n"
        + """pw AS MATERIALIZED (
  SELECT doc_id, unnest(arr) AS word, unnest(generate_series(1, len(arr))) AS wi FROM ptoks
),
pwc AS MATERIALIZED (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM pw GROUP BY word),
"""
        + _unigram_dp_cte("dpB", f"vm{rounds}", max_piece, src="pwc", floor=floor)
        + f""",
segB AS MATERIALIZED (
  SELECT word, best[len(word) + 1].path AS pieces FROM dpB WHERE i = len(word) + 1
),
fbB AS MATERIALIZED (
  SELECT word, flatten(list_transform(pieces, pc ->
    CASE WHEN map_extract(v.m, pc)[1] IS NOT NULL THEN [pc]
    ELSE {bytes_pc} END)) AS toks
  FROM segB, vm{rounds} v
),
seqB AS (
  SELECT doc_id, wi, toks,
         COALESCE(SUM(len(toks)) OVER (PARTITION BY doc_id ORDER BY wi
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS base
  FROM pw JOIN fbB USING (word)
)
SELECT doc_id, CAST(base + unnest(generate_series(1, len(toks))) - 1 AS BIGINT) AS pos,
       unnest(toks) AS token
FROM seqB ORDER BY doc_id, pos"""
    )


UNIGRAM_ENCODE_BYTE_FALLBACK_ORACLE = _unigram_byte_fallback_oracle(
    UNIGRAM_EM_ROUNDS, UNIGRAM_MAX_PIECE, UNIGRAM_SEED_MULTI, UNIGRAM_KEEP_MULTI
)


def bpe_encode_byte_fallback(t: dict[str, DataFrame]) -> DataFrame:
    """Total (never-OOV) BPE encoding of the same unseen-character
    probe: (doc_id, token) where single characters outside the
    TRAINING alphabet come out as UTF-8 byte tokens
    (``bpe.bpe_encode(alphabet=...)`` — only single characters can be
    unknown by construction; the alphabet rides the encode as one
    broadcast map row). Reuses the session-cached merge table; the
    oracle replays training, the merge fold over probe words, and the
    alphabet-checked byte transform."""
    from ..operators import bpe

    docs = t["documents"]
    return bpe.bpe_encode(
        _fallback_probe(docs),
        _trained_merges(docs),
        alphabet=bpe.corpus_alphabet(docs),
    ).orderBy("doc_id", "token")


def _bpe_byte_fallback_oracle(rounds: int) -> str:
    base = _bpe_oracle(rounds)
    ctes = base[: base.rindex("SELECT * FROM (")].rstrip()
    out = [
        ctes
        + ",\n"
        + """alpha AS MATERIALIZED (
  SELECT DISTINCT unnest(regexp_extract_all(word, '.')) AS ch FROM wc
),"""
        + _FALLBACK_PROBE_SQL.strip().lstrip(",").strip()
        + """,
pb0 AS (
  SELECT doc_id,
         ' ' || array_to_string(regexp_extract_all(word, '.'), ' ')
             || ' </w> ' AS sym
  FROM (SELECT doc_id, unnest(arr) AS word FROM ptoks)
)"""
    ]
    for i in range(rounds):
        out.append(
            f"""pb{i + 1} AS (
  SELECT doc_id, replace(sym, ' ' || t.l || ' ' || t.r || ' ',
                         ' ' || t.l || t.r || ' ') AS sym
  FROM pb{i}, t{i} t
)"""
        )
    out.append(
        f"""ptk AS (
  SELECT doc_id, unnest(string_split(trim(sym), ' ')) AS tk FROM pb{rounds}
)"""
    )
    bytes_tk = _DUCK_BYTES.format(pc="tk")
    return (
        ",\n".join(out)
        + f"""
SELECT doc_id, unnest(CASE WHEN len(tk) > 1 OR a.ch IS NOT NULL THEN [tk]
                           ELSE {bytes_tk} END) AS token
FROM ptk LEFT JOIN alpha a ON a.ch = tk
ORDER BY doc_id, token"""
    )


BPE_ENCODE_BYTE_FALLBACK_ORACLE = _bpe_byte_fallback_oracle(BPE_ROUNDS)


# ---------------------------------------------------------------------------
# Line-grain cleaning (round 12): CCNet/Dolma duplicate-line removal and
# the real line-by-line C4 algorithm. The synthetic corpus has no
# newlines (the repetition tests already document this), so — exactly
# like the byte-fallback probes — both queries run on a DETERMINISTIC
# lined probe built in SQL from the corpus itself, constructed so every
# rule engages at every SF: an 8-word terminated line (clean), a 2-word
# unterminated fragment, a constant boilerplate line carrying the word
# 'javascript' (corpus-wide duplicate AND a C4 line reject), the
# block-head's 6-word line shared by each block of ten documents
# (cross-document duplicate), plus sparse 'lorem ipsum' / curly-brace
# lines and a lines-removed variant so every document gate fires too.

LINED_BLOCK = 10
LINED_BOILER = "enable javascript to view this page."
LINED_LOREM_MOD = 97
LINED_CURLY_MOD = 89
LINED_SPARSE_MOD = 101
C4_MIN_KEPT_LINES = 2


def _lined_probe(docs: DataFrame) -> DataFrame:
    from ..operators import text as text_ops

    warr = docs.select("doc_id", text_ops.words("text").alias("_arr"))
    heads = warr.filter(F.col("doc_id") % LINED_BLOCK == 0).select(
        F.col("doc_id").alias("_hk"),
        F.concat(F.array_join(F.slice("_arr", 1, 6), " "), F.lit(".")).alias(
            "_l4"
        ),
    )
    w = (
        warr.withColumn("_hk", F.col("doc_id") - F.col("doc_id") % LINED_BLOCK)
        .join(heads, on="_hk", how="left")
        .select(
            "doc_id",
            F.concat(F.array_join(F.slice("_arr", 1, 8), " "), F.lit(".")).alias(
                "_l1"
            ),
            F.array_join(F.slice("_arr", 9, 2), " ").alias("_l2"),
            F.lit(LINED_BOILER).alias("_l3"),
            F.coalesce("_l4", F.lit("")).alias("_l4"),
        )
    )
    parts = F.when(
        F.col("doc_id") % LINED_SPARSE_MOD == 0,
        F.array("_l2", "_l3"),
    ).otherwise(F.array("_l1", "_l2", "_l3", "_l4"))
    parts = F.concat(
        parts,
        F.when(
            F.col("doc_id") % LINED_LOREM_MOD == 0,
            F.array(F.lit("lorem ipsum dolor sit amet.")),
        ).otherwise(F.array().cast("array<string>")),
        F.when(
            F.col("doc_id") % LINED_CURLY_MOD == 0,
            F.array(F.lit("config { debug }")),
        ).otherwise(F.array().cast("array<string>")),
    )
    return w.select("doc_id", F.array_join(parts, "\n").alias("text"))


_LINED_PROBE_SQL = rf"""
warr AS MATERIALIZED (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS arr
  FROM documents
),
probe AS MATERIALIZED (
  SELECT w.doc_id,
         array_to_string(
           CASE WHEN w.doc_id % {LINED_SPARSE_MOD} = 0
                THEN [w.l2, w.l3]
                ELSE [w.l1, w.l2, w.l3, coalesce(h.l4, '')] END
           || CASE WHEN w.doc_id % {LINED_LOREM_MOD} = 0
                THEN ['lorem ipsum dolor sit amet.'] ELSE []::VARCHAR[] END
           || CASE WHEN w.doc_id % {LINED_CURLY_MOD} = 0
                THEN ['config {{ debug }}'] ELSE []::VARCHAR[] END,
           chr(10)) AS text
  FROM (
    SELECT doc_id,
           array_to_string(arr[1:8], ' ') || '.' AS l1,
           array_to_string(arr[9:10], ' ') AS l2,
           '{LINED_BOILER}' AS l3
    FROM warr
  ) w
  LEFT JOIN (
    SELECT doc_id AS hk, array_to_string(arr[1:6], ' ') || '.' AS l4
    FROM warr WHERE doc_id % {LINED_BLOCK} = 0
  ) h ON h.hk = w.doc_id - w.doc_id % {LINED_BLOCK}
),
plines AS MATERIALIZED (
  SELECT doc_id, CAST(t.i AS BIGINT) AS line_no, larr[CAST(t.i AS INT)] AS line
  FROM (
    SELECT doc_id,
           list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                       x -> x <> '') AS larr
    FROM probe
  ), UNNEST(range(1, len(larr) + 1)) AS t(i)
)"""


def doc_line_dedup(t: dict[str, DataFrame]) -> DataFrame:
    """Corpus-wide duplicate-line removal over the lined probe
    (``dedup.dedup_lines``, CCNet/Dolma paragraph dedup): the constant
    boilerplate line survives only at its corpus-wide first
    ``(doc_id, line_no)``, each block-head line survives once per
    corpus (not per block — any corpus-wide repeat counts), unique
    lines pass through. Full witness: per document line counts and
    the rejoined cleaned text."""
    from ..operators import dedup

    return dedup.dedup_lines(_lined_probe(t["documents"])).orderBy("doc_id")


DOC_LINE_DEDUP_ORACLE = rf"""
WITH {_LINED_PROBE_SQL.strip()},
marked AS (
  SELECT doc_id, line_no, line,
         COUNT(*) OVER (PARTITION BY lower(line)) AS cnt,
         ROW_NUMBER() OVER (PARTITION BY lower(line) ORDER BY doc_id, line_no) AS rn
  FROM plines
),
kept AS (SELECT *, (cnt < 2 OR rn = 1) AS keep FROM marked)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped_dup,
       coalesce(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY line_no), '')
         AS cleaned_text
FROM kept GROUP BY doc_id ORDER BY doc_id
"""


def doc_c4_line_clean(t: dict[str, DataFrame]) -> DataFrame:
    """The line-by-line C4 algorithm over the lined probe
    (``text.c4_line_clean``): terminal-punctuation / min-words /
    javascript line rules, then the lorem-ipsum, curly-brace, and
    too-few-kept-lines document gates (``min_kept_lines=2`` — the
    probe builds two clean lines per ordinary document, so both
    sides of the gate appear at every SF). Full witness per document:
    line accounting, verdict, and the cleaned text."""
    from ..operators import text as text_ops

    return text_ops.c4_line_clean(
        _lined_probe(t["documents"]), min_kept_lines=C4_MIN_KEPT_LINES
    ).orderBy("doc_id")


DOC_C4_LINE_CLEAN_ORACLE = rf"""
WITH {_LINED_PROBE_SQL.strip()},
judged AS (
  SELECT doc_id, line_no, line,
         (right(line, 1) IN ('.', '!', '?', '"')
          AND len(list_filter(regexp_split_to_array(lower(line), '\s+'), w -> w <> '')) >= 3
          AND NOT list_contains(
                list_filter(regexp_split_to_array(lower(line), '\s+'), w -> w <> ''),
                'javascript')) AS ok
  FROM plines
),
per AS (
  SELECT j.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_lines,
         coalesce(string_agg(CASE WHEN ok THEN line END, chr(10) ORDER BY line_no), '')
           AS cleaned_text
  FROM judged j GROUP BY j.doc_id
)
SELECT p.doc_id, p.n_lines, p.n_kept_lines,
       CASE WHEN contains(lower(pr.text), 'lorem ipsum') THEN 'lorem_ipsum'
            WHEN contains(lower(pr.text), '{{') THEN 'curly_brace'
            WHEN p.n_kept_lines < {C4_MIN_KEPT_LINES} THEN 'too_few_lines'
            ELSE 'kept' END AS verdict,
       p.cleaned_text
FROM per p JOIN probe pr USING (doc_id) ORDER BY p.doc_id
"""


# ---------------------------------------------------------------------------
# Luhn-validated card scrubbing (round 12): checksum-gated PII removal

LUHN_PROBE_MULT = 7919
LUHN_PROBE_ADD = 12345


def _luhn15_partial(b: str, engine: str) -> str:
    """Checksum partial sum over the first 15 digits of a 16-digit
    number under construction (doubling pattern for final length 16:
    odd 1-based positions double). ``engine``: 'spark' | 'duck'."""
    d = f"CAST(substring({b}, i, 1) AS INT)"
    term = (
        f"CASE WHEN i % 2 = 1 THEN CASE WHEN 2 * {d} > 9"
        f" THEN 2 * {d} - 9 ELSE 2 * {d} END ELSE {d} END"
    )
    if engine == "spark":
        return f"aggregate(sequence(1, 15), 0, (s, i) -> s + ({term}))"
    return f"list_sum(list_transform(generate_series(1, 15), i -> {term}))"


def _luhn_probe(docs: DataFrame) -> DataFrame:
    """The probe text: append one Luhn-VALID and one Luhn-INVALID
    16-digit number per document — the check digit is COMPUTED by the
    engine itself from a deterministic 15-digit base, so the probe
    exercises the checksum formula on both sides before the scrubber
    ever runs; the invalid twin differs only in its last digit (any
    digit other than the true check digit fails the checksum)."""
    b = F.expr(
        f"lpad(CAST((doc_id * {LUHN_PROBE_MULT} + {LUHN_PROBE_ADD})"
        f" % 1000000000000000 AS STRING), 15, '0')"
    )
    chk = F.expr(f"(10 - ({_luhn15_partial('_b', 'spark')} % 10)) % 10")
    return (
        docs.select("doc_id", "text", b.alias("_b"))
        .withColumn("_chk", chk)
        .select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.lit(" card "),
                F.col("_b"),
                F.col("_chk").cast("string"),
                F.lit(" ref "),
                F.col("_b"),
                ((F.col("_chk") + 1) % 10).cast("string"),
            ).alias("text"),
        )
    )


def doc_pii_luhn(t: dict[str, DataFrame]) -> DataFrame:
    """Checksum-validated card scrubbing (``text.luhn_scrub``) over the
    Luhn probe: exactly two 16-digit candidates per document, one
    valid and one failing the checksum — the scrubber must redact the
    valid one, count both, and leave the invalid one in the text (the
    false-positive class a naive always-redact regex would destroy).
    The oracle recomputes the check digit, the candidate extraction,
    the per-candidate checksum, and the replacement fold."""
    from ..operators import text as text_ops

    return text_ops.luhn_scrub(_luhn_probe(t["documents"])).orderBy("doc_id")


def _luhn_oracle() -> str:
    d16 = "CAST(substring(c, i, 1) AS INT)"
    term16 = (
        f"CASE WHEN i % 2 = 1 THEN CASE WHEN 2 * {d16} > 9"
        f" THEN 2 * {d16} - 9 ELSE 2 * {d16} END ELSE {d16} END"
    )
    luhn16 = (
        f"list_sum(list_transform(generate_series(1, 16), i -> {term16})) % 10 = 0"
    )
    return f"""
WITH based AS (
  SELECT doc_id, text,
         lpad(CAST((doc_id * {LUHN_PROBE_MULT} + {LUHN_PROBE_ADD})
              % 1000000000000000 AS VARCHAR), 15, '0') AS b
  FROM documents
),
probe AS (
  SELECT doc_id,
         text || ' card ' || b || CAST(chk AS VARCHAR)
              || ' ref ' || b || CAST((chk + 1) % 10 AS VARCHAR) AS t
  FROM (SELECT doc_id, text, b,
               (10 - ({_luhn15_partial("b", "duck")} % 10)) % 10 AS chk
        FROM based)
),
scr AS (
  SELECT doc_id, t,
         regexp_extract_all(t, '[0-9]{{16}}') AS cands,
         list_filter(regexp_extract_all(t, '[0-9]{{16}}'), c -> {luhn16}) AS valid
  FROM probe
)
SELECT doc_id,
       CAST(len(cands) AS BIGINT) AS n_candidates,
       CAST(len(valid) AS BIGINT) AS n_valid,
       list_reduce(list_prepend(t, valid),
                   (acc, c) -> replace(acc, c, '<CARD>')) AS redacted_text
FROM scr ORDER BY doc_id
"""


DOC_PII_LUHN_ORACLE = _luhn_oracle()


# ---------------------------------------------------------------------------
# CCNet head/middle/tail perplexity bucketing (round 12)


def doc_ccnet_buckets(t: dict[str, DataFrame]) -> DataFrame:
    """CCNet's quality-selection step end to end (Wenzek et al. 2020):
    score every document with the Stupid-Backoff LM
    (``corpus.lm_backoff_score`` — same config as ``doc_lm_backoff``),
    then cut EACH LANGUAGE into score terciles
    (``corpus.quantile_buckets``): head = the best third a pipeline
    keeps, tail = the third it drops. Witness: the per-(lang, bucket)
    census with the bucket's score band — docs, transitions, and the
    lo/hi scores whose boundaries ARE the cut decision."""
    from . import materialize

    docs = t["documents"]
    # the per-key rank's three branches (within-window, bucket counts,
    # group totals) would each re-derive the LM-score subtree (~3x the
    # scoring cost, measured); cache the doc-scale scored frame once
    # (S7 pattern — #docs rows of four scalars)
    j = materialize.get_or_build(
        "ccnet_scored_docs",
        str(docs.semanticHash()),
        lambda: docs.select("doc_id", "lang").join(
            corpus.lm_backoff_score(docs, min_count=LM_MIN_COUNT), "doc_id"
        ),
    )
    b = corpus.quantile_buckets(
        j,
        key_col="lang",
        score_col="lm_score",
        n_buckets=3,
        labels=["head", "middle", "tail"],
    )
    return (
        b.groupBy("lang", "bucket_ix", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_transitions").cast("long").alias("sum_transitions"),
            F.min("lm_score").alias("lo_score"),
            F.max("lm_score").alias("hi_score"),
        )
        .orderBy("lang", "bucket_ix")
    )


DOC_CCNET_BUCKETS_ORACLE = rf"""
WITH {_TOKS_SQL.strip().rstrip()},
tok AS (SELECT doc_id, unnest(arr) AS token FROM toks),
c1 AS (SELECT token, COUNT(*) AS c1 FROM tok GROUP BY token),
tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS T FROM c1),
big AS (
  SELECT doc_id, arr[i] AS w1, arr[i+1] AS w2
  FROM toks, UNNEST(range(1, len(arr))) AS t(i)
  WHERE len(arr) >= 2
),
c2 AS (
  SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY w1, w2
  HAVING COUNT(*) >= {LM_MIN_COUNT}
),
scored AS (
  SELECT big.doc_id,
         CAST(CASE WHEN c2.c2 IS NOT NULL
              THEN CAST(c2.c2 AS DOUBLE) / CAST(u1.c1 AS DOUBLE)
              ELSE CAST(2 * u2.c1 AS DOUBLE) / CAST(5 * tot.T AS DOUBLE)
              END AS DECIMAL(28,12)) AS term
  FROM big
  LEFT JOIN c2 ON c2.w1 = big.w1 AND c2.w2 = big.w2
  JOIN c1 u1 ON u1.token = big.w1
  JOIN c1 u2 ON u2.token = big.w2
  CROSS JOIN tot
),
docscore AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_transitions,
         CAST(SUM(term) AS DOUBLE) / COUNT(*) AS lm_score
  FROM scored GROUP BY doc_id
),
j AS (
  SELECT d.lang, s.doc_id, s.n_transitions, s.lm_score
  FROM docscore s JOIN documents d USING (doc_id)
),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY lm_score DESC,
                    ((doc_id % {HASH_P}) * {SPLIT_A} + {SPLIT_B}) % {HASH_P},
                    doc_id) AS rk,
         COUNT(*) OVER (PARTITION BY lang) AS kn
  FROM j
),
b AS (SELECT lang, n_transitions, lm_score, ((rk - 1) * 3) // kn AS bix FROM r)
SELECT lang, CAST(bix AS BIGINT) AS bucket_ix,
       CASE bix WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_transitions) AS BIGINT) AS sum_transitions,
       MIN(lm_score) AS lo_score,
       MAX(lm_score) AS hi_score
FROM b GROUP BY lang, bix ORDER BY lang, bix
"""


# ---------------------------------------------------------------------------
# Winnowing fingerprints (round 12): MOSS-style local fingerprint census

WINNOW_K = 4
WINNOW_WINDOW = 4


def doc_winnow_census(t: dict[str, DataFrame]) -> DataFrame:
    """Winnowing fingerprint census (``text.winnow_fingerprints``,
    Schleimer et al. 2003): per document the k-gram count, the number
    of DISTINCT selected fingerprints, the integer selection density
    (guaranteed expectation 2/(window+1) ≈ 40% at window 4), and the
    first selected (pos, hash) pair — a value-level witness that the
    window argmin and the rightmost-tie rule picked the same grams on
    both engines, not just the same count."""
    from ..operators import text as text_ops

    fp = text_ops.winnow_fingerprints(
        t["documents"], k=WINNOW_K, window=WINNOW_WINDOW
    )
    return fp.select(
        "doc_id",
        "n_tokens",
        "n_grams",
        F.size("fingerprints").cast("long").alias("n_fingerprints"),
        F.expr("(100 * size(fingerprints)) div n_grams").alias("density_pct"),
        F.expr("fingerprints[0].pos").alias("first_pos"),
        F.expr("fingerprints[0].hash").alias("first_hash"),
    ).orderBy("doc_id")


def _winnow_oracle() -> str:
    from ..operators.text import WINNOW_CHAR_MULT, WINNOW_GRAM_MULT

    P = 2_147_483_647
    k, w = WINNOW_K, WINNOW_WINDOW
    th = (
        "list_transform(arr, t -> list_reduce("
        "list_prepend(CAST(0 AS BIGINT), list_transform(generate_series(1, length(t)),"
        " i -> CAST(ascii(substring(t, CAST(i AS INT), 1)) AS BIGINT))),"
        f" (h, c) -> (h * {WINNOW_CHAR_MULT} + c) % {P}))"
    )
    gh = (
        f"list_transform(generate_series(1, len(arr) - {k} + 1), s -> list_reduce("
        f"list_prepend(CAST(0 AS BIGINT), list_transform(generate_series(s, s + {k} - 1),"
        " j -> th[CAST(j AS INT)])),"
        f" (g, x) -> (g * {WINNOW_GRAM_MULT} + x) % {P}))"
    )
    sel = (
        f"list_transform(generate_series(1, len(gh) - {w} + 1), s -> list_reduce("
        f"list_transform(generate_series(s, s + {w} - 1),"
        " j -> struct_pack(h := gh[CAST(j AS INT)], negp := -j)),"
        " (b, x) -> CASE WHEN x.h < b.h OR (x.h = b.h AND x.negp < b.negp)"
        " THEN x ELSE b END))"
    )
    return f"""
WITH toksw AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS arr
  FROM documents
),
hashed AS (
  SELECT doc_id, arr, {th} AS th
  FROM toksw WHERE len(arr) >= {k}
),
grams AS (
  SELECT doc_id, CAST(len(arr) AS BIGINT) AS n_tokens, {gh} AS gh
  FROM hashed
),
selw AS (
  -- (pos, hash) packed injectively as pos * 2^31 + hash (hash < 2^31),
  -- because DuckDB's list_distinct is unimplemented for struct lists;
  -- packed order == (pos, hash) lexicographic order
  SELECT doc_id, n_tokens, CAST(len(gh) AS BIGINT) AS n_grams,
         list_sort(list_distinct(list_transform({sel},
           x -> CAST(-x.negp AS BIGINT) * 2147483648 + x.h))) AS fps
  FROM grams WHERE len(gh) >= {w}
)
SELECT doc_id, n_tokens, n_grams,
       CAST(len(fps) AS BIGINT) AS n_fingerprints,
       CAST((100 * len(fps)) // n_grams AS BIGINT) AS density_pct,
       fps[1] // 2147483648 AS first_pos,
       fps[1] % 2147483648 AS first_hash
FROM selw ORDER BY doc_id
"""


DOC_WINNOW_CENSUS_ORACLE = _winnow_oracle()


# ---------------------------------------------------------------------------
# Mixture schedule (round 12): two-recipe annealed data curriculum

SCHED_EPOCHS = 3
SCHED_START = {"src0": 5, "src1": 3}
SCHED_END: dict[str, int] = {}
SCHED_BUDGET = 5000


def corpus_mixture_schedule(t: dict[str, DataFrame]) -> DataFrame:
    """Annealed mixture census (``corpus.mixture_schedule``): epoch 0
    runs the weighted recipe ``src0:5, src1:3, rest 1`` (the same
    recipe as ``corpus_mix_sources``), the final epoch runs uniform
    weights, the middle epoch the exact integer midpoint. Witness: the
    per-(epoch, source) grid — interpolated weight numerator, applied
    rate, kept docs and tokens — the table that shows the web-heavy
    shares FADING toward uniform as the schedule advances."""
    kept = corpus.mixture_schedule(
        t["documents"],
        epochs=SCHED_EPOCHS,
        start_weights=SCHED_START,
        end_weights=SCHED_END,
        token_budget=SCHED_BUDGET,
    )
    return (
        kept.groupBy("epoch", "source", "weight_num", "rate_pct")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .orderBy("epoch", "source")
    )


def _mixture_schedule_oracle() -> str:
    E = SCHED_EPOCHS
    sw = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in SCHED_START.items()
    )
    sw_case = f"CASE source {sw} ELSE 1 END" if SCHED_START else "1"
    ew = " ".join(f"WHEN '{k}' THEN {v}" for k, v in SCHED_END.items())
    ew_case = f"CASE source {ew} ELSE 1 END" if SCHED_END else "1"
    return f"""
WITH base AS (
  SELECT doc_id, source,
         CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
),
tot AS (SELECT source, SUM(n_tokens) AS tt FROM base GROUP BY source),
grid AS (
  SELECT source, tt, e.epoch,
         CAST(({sw_case}) * ({E} - 1 - e.epoch)
              + ({ew_case}) * e.epoch AS BIGINT) AS weight_num
  FROM tot, (SELECT unnest(generate_series(0, {E} - 1)) AS epoch) e
),
ws AS (SELECT epoch, SUM(weight_num) AS wsum FROM grid GROUP BY epoch),
rated AS (
  SELECT g.source, g.epoch, g.weight_num,
         CAST(CASE WHEN g.tt = 0 THEN 100 ELSE least(CAST(100 AS BIGINT),
               (CAST({SCHED_BUDGET} AS BIGINT) * 100 * g.weight_num)
                 // (w.wsum * g.tt)) END AS BIGINT) AS rate_pct
  FROM grid g JOIN ws w USING (epoch)
),
kept AS (
  SELECT b.doc_id, b.n_tokens, r.source, r.epoch, r.weight_num, r.rate_pct
  FROM base b JOIN rated r ON b.source = r.source
  WHERE ((b.doc_id % {HASH_P}) * ({SPLIT_A} + 2 * r.epoch) + {SPLIT_B})
          % {HASH_P} % 100 < r.rate_pct
)
SELECT epoch, source, weight_num, rate_pct,
       COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
FROM kept GROUP BY epoch, source, weight_num, rate_pct
ORDER BY epoch, source
"""


CORPUS_MIXTURE_SCHEDULE_ORACLE = _mixture_schedule_oracle()
