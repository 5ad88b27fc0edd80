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
SELECT source, split, COUNT(*) AS n_docs, SUM(n_chars) AS sum_chars
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
         SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         - n_tokens AS token_start
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
