"""END-TO-END corpus curation (VERDICT r7 #4): the full training-data
ladder the RUNBOOK describes — quality filter -> minhash near-dup
keep-BEST -> benchmark decontamination -> weighted source mixing ->
training-sequence packing — composed as ONE registered query whose
output (the packed sequence table) proves every upstream stage at once:
which documents are present encodes the filter + dedup + decontam +
mix decisions, and ``token_start``/``seq_id`` encode the packing math
over exactly the surviving set.

Every stage is an existing, individually-green operator; what THIS
query proves is their COMPOSITION — schema contracts between stages,
session-cache reuse (the near-dup pair graph comes from the family's
shared stack, so no second minhash pass), and stage coupling (mix
rates derive from the SURVIVORS' per-source token totals, not the raw
corpus). The oracle replays the entire ladder in DuckDB, recursive
connected components included.

Stage semantics (each the production-shaped choice):
- near-dup pairs are computed on the full corpus (that is what the
  cached family stack holds) and then RESTRICTED to pairs whose both
  endpoints survived the quality filter; components are built on the
  restricted graph. Filtering before clustering means two kept docs
  are not merged through a rejected bridge document — the bridge is
  gone, so its evidence of transitivity goes with it.
- keep-best (not keep-first) picks the highest-quality member per
  component, tie -> smallest id (``dedup_keep_best``'s rule).
- decontamination keeps a surviving doc only if it is not itself a
  benchmark doc and shares no 8-gram with the benchmark set (built
  from the FULL corpus — contamination does not care whether the
  benchmark copy was low quality).

Scale posture: RUNBOOK §4.1 maps every stage to its scale mechanism
and cache tier (survivor sets are doc-id-scale session caches; the
near-dup pair stack is corpus-scale and spills to parquet staging
tables under ``SPARK_GRAFT_STAGE_DIR``) — the 100× switch is a config
change, not a redesign. The streaming twin is
``streaming/pipelines.py::curation_admission_sink``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import corpus, dedup
from ..operators import text as text_ops
from ..operators.corpus import HASH_P, SPLIT_A, SPLIT_B
from . import llm_queries, materialize
from .corpus_queries import (
    BENCHMARK_MAX_ID,
    DECONTAM_N,
    FILTER_MAX_WORDS,
    FILTER_MIN_QUALITY,
    FILTER_MIN_WORDS,
    MIX_DEFAULT_WEIGHT,
    MIX_TOKEN_BUDGET,
    MIX_WEIGHTS,
    SEQ_BUDGET,
    SEQ_CHUNK,
    _QF_STOPLIST,
    _TOKS_SQL,
)
from .llm_queries import _ND_PAIR_CTES


def _curation_stages(t: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Session-cached survivor sets per curation stage (S7 discipline):
    ``kept1``..``kept4`` are each built ONCE per (session, corpus) and
    shared by ``corpus_curation_e2e`` and ``corpus_curation_funnel`` —
    the bench's ``cache_builds`` attribution shows the stage outputs
    built exactly once on whichever query runs first (VERDICT r7 #4's
    acceptance criterion)."""
    docs = t["documents"]
    key = str(docs.semanticHash())

    def _kept1() -> DataFrame:
        qf = text_ops.quality_filter(
            docs,
            min_words=FILTER_MIN_WORDS,
            max_words=FILTER_MAX_WORDS,
            min_quality=FILTER_MIN_QUALITY,
        )
        return qf.filter(F.col("verdict") == "kept").select("doc_id", "quality")

    kept1 = materialize.get_or_build("curation_kept1", key, _kept1)

    def _kept2() -> DataFrame:
        pairs = llm_queries._shared_stack(t)["verified"].select("doc_a", "doc_b")
        surv_pairs = (
            pairs.join(
                kept1.select(F.col("doc_id").alias("doc_a")), on="doc_a", how="left_semi"
            ).join(
                kept1.select(F.col("doc_id").alias("doc_b")), on="doc_b", how="left_semi"
            )
        )
        cc = dedup.connected_components(surv_pairs.select("doc_a", "doc_b"))
        from pyspark.sql.window import Window

        w = Window.partitionBy("cluster_id").orderBy(
            F.col("quality").desc(), F.col("doc_id")
        )
        dropped_dups = (
            cc.select(F.col("id").alias("doc_id"), "cluster_id")
            .join(kept1, on="doc_id")
            .withColumn("_pr", F.row_number().over(w))
            .filter(F.col("_pr") > 1)
            .select("doc_id")
        )
        return kept1.join(dropped_dups, on="doc_id", how="left_anti").select("doc_id")

    kept2 = materialize.get_or_build("curation_kept2", key, _kept2)

    def _kept3() -> DataFrame:
        corpus_sh = dedup.word_shingles(docs, n=DECONTAM_N)
        bench_sh = (
            dedup.word_shingles(
                docs.filter(F.col("doc_id") < BENCHMARK_MAX_ID), n=DECONTAM_N
            )
            .select("shingle")
            .distinct()
        )
        contaminated = (
            corpus_sh.filter(F.col("doc_id") >= BENCHMARK_MAX_ID)
            .join(F.broadcast(bench_sh), on="shingle", how="left_semi")
            .select("doc_id")
            .distinct()
        )
        return (
            kept2.filter(F.col("doc_id") >= BENCHMARK_MAX_ID)
            .join(contaminated, on="doc_id", how="left_anti")
        )

    kept3 = materialize.get_or_build("curation_kept3", key, _kept3)

    kept4 = materialize.get_or_build(
        "curation_kept4",
        key,
        lambda: corpus.mix_sources(
            docs.join(kept3, on="doc_id", how="left_semi"),
            weights=MIX_WEIGHTS,
            token_budget=MIX_TOKEN_BUDGET,
            default_weight=MIX_DEFAULT_WEIGHT,
        ).select("doc_id"),
    )
    return {"kept1": kept1, "kept2": kept2, "kept3": kept3, "kept4": kept4}


def corpus_curation_e2e(t: dict[str, DataFrame]) -> DataFrame:
    """The five-stage curation ladder as one lazy plan (plus the
    session-cached near-dup stack, the session-cached stage survivor
    sets, and the CC fixpoint loop). Returns the packed training
    sequences of the fully-curated corpus:
    ``(doc_id, chunk_id, n_chunk_tokens, token_start, seq_id)``.

    Scale shape: stage 1 is map-side column algebra; stage 2 reuses the
    family-cached banded-LSH pair graph (built once per session, never
    all-pairs) and runs CC on the |pairs|-sized survivor graph; stage 3
    is a broadcast semi-join against the tiny benchmark shingle set;
    stage 4's rates are broadcast per-source totals; stage 5 is the
    two-phase distributed cumsum (no global window). No stage
    materializes the corpus more than once."""
    docs = t["documents"]
    kept4 = _curation_stages(t)["kept4"]
    return _packed_sequences(docs, kept4).orderBy("doc_id", "chunk_id")


def _funnel(rows: list[tuple[int, str, DataFrame]]) -> DataFrame:
    """``(stage_ord, stage, n)`` census rows from a (ord, name, frame)
    stage list — the shared shape of both funnel variants, so the
    capped funnel differs ONLY in its stage list."""
    out = None
    for ord_, name, frame in rows:
        one = frame.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(ord_).cast("long").alias("stage_ord"),
            F.lit(name).alias("stage"),
            "n",
        )
        out = one if out is None else out.unionByName(one)
    return out.orderBy("stage_ord")


def _packed_sequences(docs: DataFrame, kept: DataFrame) -> DataFrame:
    """Training sequences over a survivor set — shared by the e2e
    query and both funnels (same packing knobs everywhere)."""
    return corpus.pack_sequences(
        docs.join(kept, on="doc_id", how="left_semi"),
        seq_budget=SEQ_BUDGET,
        chunk_size=SEQ_CHUNK,
        chunk_stride=SEQ_CHUNK,
    )


def corpus_curation_funnel(t: dict[str, DataFrame]) -> DataFrame:
    """The pipeline owner's FUNNEL census over the same cached stage
    outputs: one row per curation stage with its surviving count —
    ``(stage_ord, stage, n)`` where ``n`` is documents for stages 0-4
    and produced SEQUENCES for the final packing row. This is the
    at-a-glance artifact that says WHERE the corpus went (how many docs
    the quality filter rejected vs dedup vs decontamination vs the
    mixture downsample) — a curation run without its funnel is a silent
    shrink. Six scalar aggregates over cached stage frames; the oracle
    replays the whole ladder and counts the same sets."""
    docs = t["documents"]
    stages = _curation_stages(t)
    packed = _packed_sequences(docs, stages["kept4"])
    return _funnel(
        [
            (0, "input", docs.select("doc_id")),
            (1, "quality_filter", stages["kept1"].select("doc_id")),
            (2, "near_dup_keep_best", stages["kept2"]),
            (3, "decontaminate", stages["kept3"]),
            (4, "mix_sources", stages["kept4"]),
            (5, "pack_sequences", packed.select("seq_id").distinct()),
        ]
    )


# Per-source frequency cap for the CAPPED ladder variant (VERDICT r9
# #5: the C4/RefinedWeb top-domain dominance guard — mix_sources
# reweights by a RATE but never bounds one source's absolute
# concentration; the cap runs between decontamination and mixing).
# 10 engages at sf0.01: kept3 survivors run 6-13 docs/source.
CURATION_MAX_DOCS_PER_SOURCE = 10


def _capped_stages(t: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """The capped ladder's extra survivor sets, layered on the SAME
    cached kept1-kept3 stages as the uncapped ladder (no stage is
    rebuilt): ``kept3c`` = kept3 capped per source by the deterministic
    two-phase rank (corpus.cap_per_key), ``kept4c`` = the mixture over
    the capped survivors (rates re-derived from the capped totals)."""
    docs = t["documents"]
    key = str(docs.semanticHash())
    kept3 = _curation_stages(t)["kept3"]

    kept3c = materialize.get_or_build(
        "curation_kept3c",
        key,
        lambda: corpus.cap_per_key(
            docs.join(kept3, on="doc_id", how="left_semi").select("doc_id", "source"),
            key_col="source",
            max_docs=CURATION_MAX_DOCS_PER_SOURCE,
        ).select("doc_id"),
    )
    kept4c = materialize.get_or_build(
        "curation_kept4c",
        key,
        lambda: corpus.mix_sources(
            docs.join(kept3c, on="doc_id", how="left_semi"),
            weights=MIX_WEIGHTS,
            token_budget=MIX_TOKEN_BUDGET,
            default_weight=MIX_DEFAULT_WEIGHT,
        ).select("doc_id"),
    )
    return {"kept3c": kept3c, "kept4c": kept4c}


def corpus_curation_capped_funnel(t: dict[str, DataFrame]) -> DataFrame:
    """The curation funnel with the per-source frequency cap engaged as
    a ladder stage between decontamination and mixing — one row per
    stage with its surviving count, ``cap_per_source`` included, so the
    cap's cost is a visible funnel row (never a silent shrink; the same
    no-silent-caps discipline as the LSH bucket stats). Shares the
    kept1-kept3 session caches with the uncapped ladder — the funnel
    pair differs ONLY downstream of the cap, which is the point: the
    capped variant is a config choice, not a fork of the pipeline."""
    docs = t["documents"]
    stages = _curation_stages(t)
    capped = _capped_stages(t)
    packed = _packed_sequences(docs, capped["kept4c"])
    return _funnel(
        [
            (0, "input", docs.select("doc_id")),
            (1, "quality_filter", stages["kept1"].select("doc_id")),
            (2, "near_dup_keep_best", stages["kept2"]),
            (3, "decontaminate", stages["kept3"]),
            (4, "cap_per_source", capped["kept3c"]),
            (5, "mix_sources", capped["kept4c"]),
            (6, "pack_sequences", packed.select("seq_id").distinct()),
        ]
    )


_MIX_W_SQL = f"""CASE source WHEN 'src0' THEN {MIX_WEIGHTS["src0"]}
                     WHEN 'src1' THEN {MIX_WEIGHTS["src1"]}
                     ELSE {MIX_DEFAULT_WEIGHT} END"""

_E2E_SHINGLE = " || ' ' || ".join(
    f"arr[i+{j}]" if j else "arr[i]" for j in range(DECONTAM_N)
)

# The oracle CTE chain is assembled from three pieces so the CC step
# is swappable: the registry oracle inlines the recursive-CTE CC
# (`_CC_CTES`), while tools/oracle_sf1.py materializes `sym` once,
# iterates min-label propagation to fixpoint in BOUNDED passes
# (state O(V), pass cost O(E) — the recursive CTE's path-enumeration
# state OOMs DuckDB on the dup-heavy sf1 corpus), and re-composes the
# SAME chain around a temp-table `clusters` via
# :func:`capped_funnel_oracle_with_cc`. One source of truth for every
# non-CC stage — the replays cannot fork.
_CURATION_CTES_PRE_CC = f"""
WITH RECURSIVE {_ND_PAIR_CTES},
feat AS (
  SELECT d.doc_id,
         CAST(len(arr) AS BIGINT) AS n_words,
         CASE WHEN len(arr) > 0
              THEN CAST(length(regexp_replace(lower(d.text), '\\s+', '', 'g')) AS DOUBLE)
                   / CAST(len(arr) AS DOUBLE)
              ELSE 0.0 END AS mean_word_len,
         CASE WHEN len(arr) > 0
              THEN CAST(len(list_filter(arr, x -> list_contains([{_QF_STOPLIST}], x))) AS DOUBLE)
                   / CAST(len(arr) AS DOUBLE)
              ELSE 0.0 END AS stop_ratio
  FROM toks JOIN documents d USING (doc_id)
),
qual AS (
  SELECT doc_id, n_words, stop_ratio,
         0.4 * least(greatest(CAST(n_words AS DOUBLE) / 100.0, 0.0), 1.0)
       + 0.3 * least(greatest((mean_word_len - 2.0) / 6.0, 0.0), 1.0)
       + 0.3 * least(greatest(stop_ratio * 5.0, 0.0), 1.0) AS quality
  FROM feat
),
kept1 AS (
  SELECT doc_id, quality FROM qual
  WHERE NOT (n_words < {FILTER_MIN_WORDS})
    AND NOT (n_words > {FILTER_MAX_WORDS})
    AND (CASE WHEN stop_ratio >= 0.05 THEN 'en' ELSE 'unknown' END) = 'en'
    AND NOT (quality < {FILTER_MIN_QUALITY})
),
fp AS (
  SELECT doc_a, doc_b FROM nd
  WHERE doc_a IN (SELECT doc_id FROM kept1)
    AND doc_b IN (SELECT doc_id FROM kept1)
),
sym AS (
  SELECT doc_a AS src, doc_b AS dst FROM fp
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM fp
)"""

_CC_CTES = """walk(id, label) AS (
  SELECT DISTINCT src, src FROM sym
  UNION
  SELECT s.src, w.label FROM sym s JOIN walk w ON s.dst = w.id
),
clusters AS (SELECT id AS doc_id, MIN(label) AS cluster_id FROM walk GROUP BY id)"""

_CURATION_CTES_POST_CC = f"""rankedc AS (
  SELECT c.doc_id,
         ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                            ORDER BY k.quality DESC, c.doc_id) AS pr
  FROM clusters c JOIN kept1 k USING (doc_id)
),
kept2 AS (
  SELECT doc_id FROM kept1
  WHERE doc_id NOT IN (SELECT doc_id FROM rankedc WHERE pr > 1)
),
dsh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, len(arr) - {DECONTAM_N - 1}),
           i -> {_E2E_SHINGLE}))) AS g
  FROM toks WHERE len(arr) >= {DECONTAM_N}
),
bench AS (SELECT DISTINCT g FROM dsh WHERE doc_id < {BENCHMARK_MAX_ID}),
contaminated AS (
  SELECT DISTINCT doc_id FROM dsh
  WHERE doc_id >= {BENCHMARK_MAX_ID} AND g IN (SELECT g FROM bench)
),
kept3 AS (
  SELECT doc_id FROM kept2
  WHERE doc_id >= {BENCHMARK_MAX_ID}
    AND doc_id NOT IN (SELECT doc_id FROM contaminated)
),
mixbase AS (
  SELECT d.doc_id, d.source, CAST(len(t2.arr) AS BIGINT) AS n_tokens
  FROM documents d
  JOIN toks t2 ON t2.doc_id = d.doc_id
  JOIN kept3 k ON k.doc_id = d.doc_id
),
mw AS (
  SELECT source, {_MIX_W_SQL} AS wt
  FROM (SELECT DISTINCT source FROM mixbase)
),
mwsum AS (SELECT SUM(wt) AS ws FROM mw),
mtot AS (SELECT source, SUM(n_tokens) AS tt FROM mixbase GROUP BY source),
kept4 AS (
  SELECT b.doc_id FROM mixbase b
  JOIN mw USING (source) JOIN mtot USING (source) CROSS JOIN mwsum
  WHERE ((b.doc_id % {HASH_P}) * {SPLIT_A} + {SPLIT_B}) % {HASH_P} % 100
        < CAST(least(CAST(100 AS BIGINT),
                (CAST({MIX_TOKEN_BUDGET} AS BIGINT) * 100 * mw.wt) // (mwsum.ws * mtot.tt))
            AS BIGINT)
),
st AS (
  SELECT t3.doc_id, t3.arr, unnest(generate_series(1, len(t3.arr), {SEQ_CHUNK})) AS s
  FROM toks t3 JOIN kept4 USING (doc_id) WHERE len(t3.arr) > 0
),
ch AS (
  SELECT doc_id,
         CAST((s - 1) / {SEQ_CHUNK} AS BIGINT) AS chunk_id,
         CAST(least({SEQ_CHUNK}, len(arr) - s + 1) AS BIGINT) AS n_chunk_tokens
  FROM st
),
cum AS (
  SELECT *, CAST(SUM(n_chunk_tokens) OVER (
    ORDER BY doc_id, chunk_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) - n_chunk_tokens AS BIGINT) AS token_start
  FROM ch
)
"""


def _curation_ctes(cc_ctes: str = _CC_CTES) -> str:
    """The full curation WITH-chain around a swappable CC step —
    ``cc_ctes`` must define a ``clusters (doc_id, cluster_id)`` CTE
    over the ``sym (src, dst)`` edge list."""
    return f"{_CURATION_CTES_PRE_CC},\n{cc_ctes},\n{_CURATION_CTES_POST_CC}"


_CURATION_CTES = _curation_ctes()

CORPUS_CURATION_E2E_ORACLE = f"""{_CURATION_CTES}
SELECT doc_id, chunk_id, n_chunk_tokens, token_start,
       CAST(FLOOR(CAST(token_start AS DOUBLE) / {SEQ_BUDGET}.0) AS BIGINT) AS seq_id
FROM cum ORDER BY doc_id, chunk_id
"""

CORPUS_CURATION_FUNNEL_ORACLE = f"""{_CURATION_CTES}
SELECT CAST(stage_ord AS BIGINT) AS stage_ord, stage, CAST(n AS BIGINT) AS n FROM (
  SELECT 0 AS stage_ord, 'input' AS stage,
         (SELECT COUNT(*) FROM documents) AS n
  UNION ALL SELECT 1, 'quality_filter', (SELECT COUNT(*) FROM kept1)
  UNION ALL SELECT 2, 'near_dup_keep_best', (SELECT COUNT(*) FROM kept2)
  UNION ALL SELECT 3, 'decontaminate', (SELECT COUNT(*) FROM kept3)
  UNION ALL SELECT 4, 'mix_sources', (SELECT COUNT(*) FROM kept4)
  UNION ALL SELECT 5, 'pack_sequences',
    (SELECT COUNT(DISTINCT CAST(FLOOR(CAST(token_start AS DOUBLE) / {SEQ_BUDGET}.0) AS BIGINT))
     FROM cum)
) ORDER BY stage_ord
"""

# Capped-ladder CTEs layered onto the shared chain: the per-source rank
# replays corpus.cap_per_key's deterministic hash order as a plain
# window (the two-phase decomposition preserves it exactly), then the
# mixture and packing re-run over the capped survivors.
_CAPPED_EXTRA_CTES = f"""srcrank AS (
  SELECT d.doc_id, d.source,
         ROW_NUMBER() OVER (
           PARTITION BY d.source
           ORDER BY ((d.doc_id % {HASH_P}) * {SPLIT_A} + {SPLIT_B}) % {HASH_P}, d.doc_id
         ) AS rnk
  FROM documents d JOIN kept3 k ON k.doc_id = d.doc_id
),
kept3c AS (SELECT doc_id FROM srcrank WHERE rnk <= {CURATION_MAX_DOCS_PER_SOURCE}),
mixbase_c AS (
  SELECT d.doc_id, d.source, CAST(len(t2.arr) AS BIGINT) AS n_tokens
  FROM documents d
  JOIN toks t2 ON t2.doc_id = d.doc_id
  JOIN kept3c k ON k.doc_id = d.doc_id
),
mw_c AS (
  SELECT source, {_MIX_W_SQL} AS wt
  FROM (SELECT DISTINCT source FROM mixbase_c)
),
mwsum_c AS (SELECT SUM(wt) AS ws FROM mw_c),
mtot_c AS (SELECT source, SUM(n_tokens) AS tt FROM mixbase_c GROUP BY source),
kept4c AS (
  SELECT b.doc_id FROM mixbase_c b
  JOIN mw_c USING (source) JOIN mtot_c USING (source) CROSS JOIN mwsum_c
  WHERE ((b.doc_id % {HASH_P}) * {SPLIT_A} + {SPLIT_B}) % {HASH_P} % 100
        < CAST(least(CAST(100 AS BIGINT),
                (CAST({MIX_TOKEN_BUDGET} AS BIGINT) * 100 * mw_c.wt) // (mwsum_c.ws * mtot_c.tt))
            AS BIGINT)
),
st_c AS (
  SELECT t3.doc_id, t3.arr, unnest(generate_series(1, len(t3.arr), {SEQ_CHUNK})) AS s
  FROM toks t3 JOIN kept4c USING (doc_id) WHERE len(t3.arr) > 0
),
ch_c AS (
  SELECT doc_id,
         CAST((s - 1) / {SEQ_CHUNK} AS BIGINT) AS chunk_id,
         CAST(least({SEQ_CHUNK}, len(arr) - s + 1) AS BIGINT) AS n_chunk_tokens
  FROM st_c
),
cum_c AS (
  SELECT *, CAST(SUM(n_chunk_tokens) OVER (
    ORDER BY doc_id, chunk_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) - n_chunk_tokens AS BIGINT) AS token_start
  FROM ch_c
)
"""


def _capped_ctes(cc_ctes: str = _CC_CTES) -> str:
    return f"{_curation_ctes(cc_ctes)},\n{_CAPPED_EXTRA_CTES}"


_CAPPED_CTES = _capped_ctes()

_CAPPED_FUNNEL_SELECT = f"""
SELECT CAST(stage_ord AS BIGINT) AS stage_ord, stage, CAST(n AS BIGINT) AS n FROM (
  SELECT 0 AS stage_ord, 'input' AS stage,
         (SELECT COUNT(*) FROM documents) AS n
  UNION ALL SELECT 1, 'quality_filter', (SELECT COUNT(*) FROM kept1)
  UNION ALL SELECT 2, 'near_dup_keep_best', (SELECT COUNT(*) FROM kept2)
  UNION ALL SELECT 3, 'decontaminate', (SELECT COUNT(*) FROM kept3)
  UNION ALL SELECT 4, 'cap_per_source', (SELECT COUNT(*) FROM kept3c)
  UNION ALL SELECT 5, 'mix_sources', (SELECT COUNT(*) FROM kept4c)
  UNION ALL SELECT 6, 'pack_sequences',
    (SELECT COUNT(DISTINCT CAST(FLOOR(CAST(token_start AS DOUBLE) / {SEQ_BUDGET}.0) AS BIGINT))
     FROM cum_c)
) ORDER BY stage_ord
"""

CORPUS_CURATION_CAPPED_FUNNEL_ORACLE = f"{_CAPPED_CTES}{_CAPPED_FUNNEL_SELECT}"


def capped_funnel_oracle_with_cc(cc_ctes: str) -> str:
    """The capped-funnel oracle with a caller-supplied CC step —
    tools/oracle_sf1.py passes ``clusters AS (SELECT ... FROM
    <temp table>)`` after materializing components itself in bounded
    passes (the recursive CTE's path enumeration OOMs at sf1). Every
    non-CC stage is the registry oracle's own text."""
    return f"{_capped_ctes(cc_ctes)}{_CAPPED_FUNNEL_SELECT}"


#: The edge-list materialization statement for the chunked CC replay:
#: everything up to ``sym``, selected out. (The sf1 tool CREATEs a temp
#: table from this, iterates min-label propagation over it to fixpoint,
#: then runs :func:`capped_funnel_oracle_with_cc`.)
CURATION_SYM_SQL = f"{_CURATION_CTES_PRE_CC}\nSELECT src, dst FROM sym"
