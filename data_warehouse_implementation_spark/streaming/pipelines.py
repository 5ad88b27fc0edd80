"""Streaming pipelines: the thin Structured Streaming layer over the
batch operator library (SURVEY §2.10).

Batch/stream parity is the design rule: every streaming aggregate here
is the same expression as its batch twin (``ingest_queries``), so a
backfill job and the live stream produce identical tables. Incremental
dimension maintenance reuses the *batch* SCD algebra inside
``foreachBatch`` — micro-batches are just small batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import scd
from ..sources.catalog import WarehouseCatalog

def events_stream_schema(spark: SparkSession, path: str) -> tuple[str, bool]:
    """readStream needs an explicit schema; probe the path with the
    batch reader so both nanos-long (TIMESTAMP(NANOS) + ``nanosAsLong``)
    and native-timestamp testdata generations stream correctly. The
    probed ``ts`` type is used verbatim (LTZ stays LTZ, NTZ stays NTZ);
    if the probe fails — empty source dir is normal for a file stream
    whose files arrive later — fall back to the nanos-long layout.

    Returns ``(schema_ddl, is_nanos_long)`` so callers branch on an
    explicit flag rather than re-parsing the DDL string."""
    from pyspark.sql.types import LongType

    try:
        dt = spark.read.parquet(path).schema["ts"].dataType
        is_nanos, ts_t = isinstance(dt, LongType), dt.simpleString()
    except Exception:
        is_nanos, ts_t = True, "long"
    return (
        f"event_id long, ts {ts_t}, user_id long, event_type string,"
        " value double, props string"
    ), is_nanos


def normalize_event_ts(df: DataFrame, is_nanos_long: bool) -> DataFrame:
    """Normalize the raw ``ts`` column to a proper TIMESTAMP for
    watermarking: nanos-long becomes ``timestamp_micros(ts div 1000)``
    (integer div — exactly DuckDB's ns->us), anything else (LTZ or NTZ)
    is cast to TIMESTAMP (value-preserving under the UTC session tz)."""
    if is_nanos_long:
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def stream_events(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of events parquet, ts normalized to TIMESTAMP."""
    schema, is_nanos = events_stream_schema(spark, path)
    return normalize_event_ts(spark.readStream.schema(schema).parquet(path), is_nanos)


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window counts per event type — the
    streaming twin of ``ingest_queries.events_window_agg``. Late rows
    beyond the watermark are dropped; state for closed windows is
    evicted (bounded state at any scale)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def dedup_stream(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup — the streaming twin of
    ``operators.dedup.exact_dedup`` keep-first semantics for
    at-least-once sources (replayed events, duplicated delivery).

    ``dropDuplicatesWithinWatermark`` keeps one state entry per key
    only until the watermark passes it: duplicates are assumed to
    arrive within the delivery window, so state is O(keys-per-window),
    bounded at any scale — unlike ``dropDuplicates`` on a stream, whose
    state grows forever."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def run_to_memory(stream: DataFrame, name: str, output_mode: str = "append") -> None:
    """Drain all available input through the streaming plan into an
    in-memory table (test/debug sink), blocking until done."""
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


SESSION_OUT_SCHEMA = (
    "user_id long, session_seq long, n_events long,"
    " session_start string, session_value double"
)
# STATE-SCHEMA MIGRATION (ADVICE r11 #2): round 11 changed this
# schema incompatibly (5 scalar longs -> long + 4 array<long> pending-
# session columns). applyInPandasWithState state is NOT versioned: a
# stream restarted from a pre-change checkpoint fails state-store
# schema validation (or, on Spark builds without validation, decodes
# garbage). Upgrading across the round-11 boundary requires DISCARDING
# the old checkpoint and replaying the source from scratch — the
# operator is deterministic, so a replay reproduces the same sessions.
_SESSION_STATE_SCHEMA = (
    "session_seq long, starts array<long>, lasts array<long>,"
    " ns array<long>, cents array<long>"
)


def sessionize_stateful(
    events: DataFrame, gap_seconds: int = 1800, watermark: str = "30 minutes"
) -> DataFrame:
    """Custom stateful streaming operator: gap-based sessionization via
    ``applyInPandasWithState`` — the streaming twin of the batch
    ``ingest_queries.events_sessionize`` (lag + cumulative-sum windows).

    A session is emitted ONLY once the watermark passes ``last_event +
    gap`` — gap-closed sessions stay in state as closed-but-unflushed
    intervals until then (ADVICE r10: the old eager same-batch emission
    left a window where a late-but-within-watermark event could land
    between an already-emitted session and the open one, merging them
    in the batch twin while the stream had emitted two). Per-user state
    is the list of pending sessions ``(start, last, n, cents)``; because
    pending sessions all satisfy ``last + gap > watermark`` and are
    pairwise separated by more than ``gap``, the list holds at most
    ``watermark_delay / gap + 2`` entries — O(#active users) state at
    any scale, same bound class as before.

    Parity is now UNCONDITIONAL (no ``watermark <= gap`` precondition):
    every event processed in the same micro-batch set produces exactly
    the batch twin's time-sorted fold over the events that survived the
    watermark. The invariant: Spark drops late rows with ``eventTime <=
    watermark`` (STRICTLY-greater survivors — ``WatermarkSupport``'s
    predicate, verified on Spark 4.1.2; the strictness matters because
    the batch twin still MERGES at ``diff == gap``), so a surviving
    event has ``ts > watermark >= emitted.last + gap`` for every
    already-emitted session and can never retroactively merge with or
    precede one —
    any surviving event lands in the pending list, where sessions are
    re-merged as intervals (a bridging late event that joins two
    pending sessions collapses them, matching the batch fold exactly).
    Session numbering is emission order = start order, identical to the
    batch twin's per-user time order.

    Values are summed as exact cents (``Decimal(repr(v))`` reproduces
    Spark's shortest-repr double→decimal(18,2) HALF_UP cast) so the
    emitted ``session_value`` is bit-identical to the batch twin's
    decimal sum; merging sessions adds their cents, which decimal
    addition makes order-independent.

    MIGRATION: the round-11 deferred-emission rework changed
    ``_SESSION_STATE_SCHEMA`` incompatibly (see the note at the
    constant) — restarting a pre-change stream requires discarding its
    checkpoint and replaying the source; determinism makes the replay
    reproduce identical sessions.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_seconds * 1_000_000

    def _to_cents(v) -> int:
        from decimal import ROUND_HALF_UP, Decimal

        if v is None or pd.isna(v):
            return 0
        return int(
            (Decimal(repr(float(v))) * 100).to_integral_value(rounding=ROUND_HALF_UP)
        )

    def _emit(user_id: int, seq: int, start_us: int, n: int, cents: int) -> pd.DataFrame:
        start = pd.Timestamp(start_us * 1000).strftime("%Y-%m-%d %H:%M:%S.%f")
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "session_seq": [seq],
                "n_events": [n],
                "session_start": [start],
                "session_value": [cents / 100.0],
            }
        )

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.exists:
            seq, starts, lasts, ns, cts = state.get
            sess = [list(t) for t in zip(starts, lasts, ns, cts)]
        else:
            seq, sess = 0, []
        if not state.hasTimedOut:
            chunks = [p for p in pdf_iter if len(p)]
            if chunks:
                pdf = pd.concat(chunks)
                # datetime64[us] first so the int64 view is micros
                # regardless of the Arrow batch's native unit (ns vs us)
                ts_us = pdf["ts"].astype("datetime64[us]").astype("int64").tolist()
                vals = pdf["value"].tolist()
                # every event enters as a unit interval; the start-sorted
                # merge below is exactly the batch fold's gap partition
                # (connected components of the within-gap chain), so the
                # result is independent of arrival order — a bridging
                # late event collapses the two pending sessions it joins
                sess.extend([us, us, 1, _to_cents(v)] for us, v in zip(ts_us, vals))
                sess.sort(key=lambda s: (s[0], s[1]))
                merged: list[list[int]] = []
                for s in sess:
                    if merged and s[0] - merged[-1][1] <= gap_us:
                        m = merged[-1]
                        m[1] = max(m[1], s[1])
                        m[2] += s[2]
                        m[3] += s[3]
                    else:
                        merged.append(s)
                sess = merged
        if not sess:
            state.remove()
            return
        wm_us = state.getCurrentWatermarkMs() * 1000
        # pending sessions are disjoint and start-ordered, so the
        # watermark-closed ones form a prefix — emit in start order,
        # which keeps session_seq identical to the batch twin's
        keep = []
        for s in sess:
            if s[1] + gap_us <= wm_us and not keep:
                seq += 1
                yield _emit(user_id, seq, s[0], s[2], s[3])
            else:
                keep.append(s)
        if keep:
            state.update(
                (
                    seq,
                    [s[0] for s in keep],
                    [s[1] for s in keep],
                    [s[2] for s in keep],
                    [s[3] for s in keep],
                )
            )
            # earliest pending close; the max() guards the ms-floor edge
            # where last+gap lands inside the watermark's current ms
            state.setTimeoutTimestamp(
                max(keep[0][1] // 1000 + gap_seconds * 1000, wm_us // 1000 + 1)
            )
        else:
            state.remove()

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_OUT_SCHEMA,
            _SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def incremental_scd2_sink(
    stream: DataFrame,
    catalog: WarehouseCatalog,
    table: str,
    keys: list[str],
    order_col: str,
    as_of: str,
    checkpoint: str,
):
    """Incremental SCD2 dimension maintenance: each micro-batch is
    applied with the *batch* scd2 algebra against the current table
    state (``foreachBatch`` — the standard pattern for stateful sinks
    Spark doesn't natively provide). Returns the started query.

    Replay safety: scd2_apply is a FOLD, not a per-row merge — applying
    the same batch twice injects spurious degenerate versions (unlike
    the scd3 sink, where re-applying equal values is a natural no-op).
    foreachBatch is at-least-once, so each application first records
    its post-state in ``{table}__post`` keyed by batch_id and THEN
    publishes; a redelivery of the same batch (crash between publish
    and the stream's commit) just republishes the recorded post-state.
    The snapshot order closes both crash windows of the two writes.

    Redelivery is detected by batch_id AND a content fingerprint of the
    batch rows (order-insensitive count + exact decimal sum of per-row
    ``xxhash64``), stored alongside the snapshot — ADVICE r10: a batch
    id alone cannot tell a genuine replay from a NEW stream under a
    fresh checkpoint whose first batch id happens to collide with the
    recorded one (both start at 0), and treating the latter as a replay
    silently drops the new batch. A collision with a DIFFERENT
    fingerprint now raises loudly: the ``__post`` table belongs to the
    old checkpoint and must be dropped together with it.
    Scope: this covers Spark's actual redelivery contract (only the
    last uncommitted batch replays under a checkpoint); pointing a
    FRESH checkpoint at an already-populated dimension re-folds the
    whole stream and is caller error for any fold sink."""

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as SF

        spark = batch.sparkSession
        post = f"{table}__post"
        b = int(batch_id)
        # 1-row lazy fingerprint frame: riding the snapshot as a
        # broadcast costs no driver action on the happy path; the
        # decimal(38,0) sum is exact and order-insensitive, so the
        # fingerprint is independent of partitioning and replays
        # bit-for-bit
        fp = batch.agg(
            SF.concat_ws(
                ":",
                SF.count(SF.lit(1)),
                SF.coalesce(
                    SF.sum(SF.xxhash64(*batch.columns).cast("decimal(38,0)")),
                    SF.lit(0).cast("decimal(38,0)"),
                ),
            ).alias("_batch_fp")
        )
        if catalog.exists(post):
            prev = catalog.table(post)
            stored = prev.filter(SF.col("_batch_id") == b).limit(1).collect()
            if stored:
                has_fp_col = "_batch_fp" in prev.columns
                stored_fp = stored[0]["_batch_fp"] if has_fp_col else None
                if stored_fp is None:
                    # ADVICE r11 #3: a post table without a usable
                    # fingerprint can only do batch-id-only redelivery
                    # detection — the fresh-checkpoint content-collision
                    # hazard this fingerprint fixes persists until a NEW
                    # batch rewrites the snapshot. Be loud so operators
                    # know protection is not yet active (the happy path
                    # below is still correct for true at-least-once
                    # redelivery). Diagnose the RIGHT condition
                    # (round-12 review): a pre-fingerprint table lacks
                    # the column; a NULL value in an existing column is
                    # a different (hand-repaired / partially-migrated)
                    # state with the same degraded behavior.
                    import warnings

                    why = (
                        "predates content fingerprinting (_batch_fp "
                        "column absent)"
                        if not has_fp_col
                        else "has a NULL _batch_fp for this batch (the "
                        "column exists — a partially migrated or "
                        "hand-repaired snapshot?)"
                    )
                    warnings.warn(
                        f"incremental_scd2_sink: post table '{post}' "
                        f"{why} — batch_id {b} matched by id "
                        "alone, so a fresh-checkpoint batch-id collision "
                        "with different content would NOT be detected "
                        "for this batch. Fingerprint protection engages "
                        "once any new batch rewrites the snapshot; to "
                        "engage it now, drop the post table together "
                        "with the checkpoint and replay.",
                        RuntimeWarning,
                        stacklevel=2,
                    )
                if stored_fp is not None and stored_fp != fp.first()["_batch_fp"]:
                    raise RuntimeError(
                        f"incremental_scd2_sink: batch_id {b} was already "
                        f"applied to '{table}' with DIFFERENT content — this "
                        "stream is running under a fresh checkpoint whose "
                        f"batch ids collide with the recorded '{post}' "
                        "snapshot. Drop the post table together with the old "
                        "checkpoint (they are one unit of state) before "
                        "re-pointing a new stream at this dimension."
                    )
                # at-least-once redelivery: the batch was already fully
                # applied; republish the recorded post-state (idempotent)
                catalog.replace(
                    table, prev.drop("_batch_id", "_batch_fp"), internal=True
                )
                return
        current = (
            catalog.table(table)
            if catalog.exists(table)
            else _empty_like(spark, batch, order_col)
        )
        new_state = scd.scd2_apply(current, batch, keys, as_of=as_of, order_col=order_col)
        snap = new_state.withColumn("_batch_id", SF.lit(b)).crossJoin(SF.broadcast(fp))
        if catalog.exists(post):
            catalog.replace(post, snap, internal=True)
        else:
            catalog.write(post, snap)
        catalog.replace(
            table,
            catalog.table(post).drop("_batch_id", "_batch_fp"),
            internal=True,
        )

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def incremental_scd3_sink(
    stream: DataFrame,
    catalog: WarehouseCatalog,
    table: str,
    keys: list[str],
    tracked_col: str,
    order_col: str,
    as_of: str,
    checkpoint: str,
    old_col: str,
    effective_col: str = "effective_date",
    fresh_old: str | None = None,
):
    """Incremental SCD3 dimension maintenance — the change-tracking
    twin of :func:`incremental_scd2_sink`: each micro-batch is applied
    with the *batch* scd3 algebra (null-safe tracked-column update +
    fresh-key insert) against the current table state. Sequential
    per-batch application equals one-shot application of the
    concatenated batches (both replay the reference trigger row by
    row) — hypothesis-differentialed in
    ``tests/test_scd_properties.py``.

    ``fresh_old`` defaults to ``None`` (a TYPED null derived from the
    tracked column — ADVICE r9: the previous ``""`` default silently
    unioned a STRING sentinel into a non-string old column on the
    default path); pass an explicit string sentinel only for string
    tracked columns that want one."""

    def apply_batch(batch: DataFrame, _batch_id: int) -> None:
        spark = batch.sparkSession
        if catalog.exists(table):
            current = catalog.table(table)
        else:
            from pyspark.sql.types import DateType, StructField, StructType

            # Empty-table bootstrap: the old-value column mirrors the
            # TRACKED column's actual type (a long tracked_col used to
            # hit a hardcoded StringType here and break scd3_apply on
            # the first micro-batch — ADVICE r8), and the effective
            # column honours the caller's name like scd3_apply does.
            base = batch.drop(order_col).schema
            fields = list(base.fields) + [
                StructField(old_col, batch.schema[tracked_col].dataType),
                StructField(effective_col, DateType()),
            ]
            current = spark.createDataFrame([], StructType(fields))
        new_state = scd.scd3_apply(
            current, batch, keys, tracked_col=tracked_col, as_of=as_of,
            order_col=order_col, old_col=old_col, effective_col=effective_col,
            fresh_old=fresh_old,
        )
        catalog.replace(table, new_state, internal=True)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _ensure_batch_id(catalog: WarehouseCatalog, name: str) -> None:
    """One-time state-layout migration: tables written by the sinks'
    pre-idempotence layout carry no ``batch_id`` column, and a
    ``delete_where('batch_id = N')`` over them would die with an
    unresolved-column error on the first micro-batch after an upgrade.
    Tag such legacy rows with batch_id = -1 (never a real foreachBatch
    id) so replay deletes skip them and inserts stay schema-aligned."""
    tbl = catalog.table(name)
    if "batch_id" not in tbl.columns:
        catalog.replace(name, tbl.withColumn("batch_id", F.lit(-1)), internal=True)


def _nearest_state_match(
    catalog: WarehouseCatalog,
    prefix: str,
    tids_new: DataFrame,
    bands_new: DataFrame,
    threshold: float,
    spark: SparkSession,
) -> DataFrame:
    """Best near-dup match of each incoming doc against the STANDING
    admitted corpus — the shared admission step of
    ``incremental_dedup_sink`` and ``curation_admission_sink``: banded
    LSH candidates (new bands ⋈ state bands) verified by exact jaccard,
    collapsed to the highest-(jaccard, doc_b) match per new doc.
    Returns ``(doc_a, matched_corpus_id, jaccard)`` (empty when no
    state exists yet). ``cands`` is checkpointed because
    ``pairwise_jaccard`` consumes it in three branches (its documented
    caller contract) — left lazy, the state-scale band join + distinct
    would re-execute per branch on every trigger."""
    from pyspark.sql import functions as SF

    from ..operators import dedup

    if not catalog.exists(f"{prefix}_bands"):
        return spark.createDataFrame(
            [], "doc_a long, matched_corpus_id long, jaccard double"
        )
    old_bands = catalog.table(f"{prefix}_bands")
    old_tids = catalog.table(f"{prefix}_tids")
    cands = (
        bands_new.select(SF.col("doc_id").alias("doc_a"), "band_id", "band_key")
        .join(
            old_bands.select(SF.col("doc_id").alias("doc_b"), "band_id", "band_key"),
            on=["band_id", "band_key"],
        )
        .select("doc_a", "doc_b")
        .distinct()
        .localCheckpoint()
    )
    verified = dedup.pairwise_jaccard(
        cands, tids_new.unionByName(old_tids.drop("batch_id"))
    ).filter(SF.col("jaccard") >= threshold)
    return verified.groupBy("doc_a").agg(
        SF.max_by("doc_b", SF.struct("jaccard", SF.col("doc_b"))).alias(
            "matched_corpus_id"
        ),
        SF.max("jaccard").alias("jaccard"),
    )


def _empty_like(spark: SparkSession, batch: DataFrame, order_col: str) -> DataFrame:
    base = batch.drop(order_col).schema
    from pyspark.sql.types import BooleanType, DateType, StructField, StructType

    fields = list(base.fields) + [
        StructField("start_date", DateType()),
        StructField("end_date", DateType()),
        StructField("active", BooleanType()),
    ]
    return spark.createDataFrame([], StructType(fields))


def incremental_dedup_sink(
    stream: DataFrame,
    catalog: WarehouseCatalog,
    prefix: str,
    checkpoint: str,
    n_shingle: int = 3,
    k: int = 16,
    bands: int = 8,
    rows: int = 2,
    threshold: float = 0.5,
):
    """Continuous-crawl near-dup admission: each micro-batch of documents
    is near-dup-checked against the STANDING corpus state and only
    novel documents are admitted — the streaming twin of the batch
    ``near_dup_incremental`` query, maintained via ``foreachBatch``.

    Corpus state lives in two parquet staging tables (``{prefix}_bands``,
    ``{prefix}_tids``) — exactly the at-scale answer the batch module's
    docstrings prescribe instead of executor-memory caches. Shingle ids
    are map-side ``xxhash64`` (``dedup.shingle_ids(hashed=True)``), so
    ids are consistent across every batch with NO shared dictionary to
    maintain. Per batch: O(batch) shingling + one band equi-join against
    the state table + exact-Jaccard verification of candidates; admitted
    docs append their bands/tids to the state, duplicates are recorded
    in ``{prefix}_verdicts`` with their best corpus match. Intra-batch
    duplicates are not split here (both admitted if novel vs the
    corpus) — run the batch exact/near-dup pass inside the batch first
    if at-least-once sources can replay documents within one trigger.

    Replay-idempotent per ``batch_id`` (foreachBatch is at-least-once):
    every state/verdict table carries the batch id and a replayed
    batch's rows are deleted before the re-insert — the same contract
    as the CMS, rollup, IVF, and curation sinks.
    """
    from pyspark.sql import functions as SF  # local alias for closures

    from ..operators import dedup

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        batch = batch.select("doc_id", "text")
        for tname in ("bands", "tids", "verdicts"):
            full = f"{prefix}_{tname}"
            if catalog.exists(full):
                _ensure_batch_id(catalog, full)
                catalog.delete_where(full, f"batch_id = {int(batch_id)}")
        # checkpoint the batch-scale shingle/band tables: the verdict
        # join AND the two state inserts each run an action over them —
        # left lazy, every action re-pays the shingle->minhash->band
        # pipeline (3x the dominant map-side cost per trigger)
        tids_new = dedup.shingle_ids(
            dedup.word_shingles(batch, n=n_shingle), hashed=True
        ).localCheckpoint()
        bands_new = dedup.lsh_bands(
            dedup.minhash_signatures(tids_new, k=k), bands=bands, rows=rows
        ).localCheckpoint()
        best = _nearest_state_match(
            catalog, prefix, tids_new, bands_new, threshold, batch.sparkSession
        )
        verdicts = (
            batch.select("doc_id")
            .join(best.withColumnRenamed("doc_a", "doc_id"), on="doc_id", how="left")
            .select(
                "doc_id",
                SF.lit(batch_id).alias("batch_id"),
                SF.col("matched_corpus_id").isNotNull().alias("is_dup"),
                "matched_corpus_id",
                "jaccard",
            )
        )
        # verdicts must be decided before the state tables grow below
        verdicts = verdicts.localCheckpoint()
        admitted = verdicts.filter(~SF.col("is_dup")).select("doc_id")
        for name, df in (
            (f"{prefix}_bands", bands_new),
            (f"{prefix}_tids", tids_new),
        ):
            admit_rows = df.join(admitted, on="doc_id", how="left_semi").withColumn(
                "batch_id", SF.lit(batch_id)
            )
            if catalog.exists(name):
                catalog.insert_into(name, admit_rows)
            else:
                catalog.write(name, admit_rows)
        if catalog.exists(f"{prefix}_verdicts"):
            catalog.insert_into(f"{prefix}_verdicts", verdicts)
        else:
            catalog.write(f"{prefix}_verdicts", verdicts)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def semdedup_admission_sink(
    stream: DataFrame,
    catalog: WarehouseCatalog,
    prefix: str,
    checkpoint: str,
    quantizer_table: str,
    tau: float = 0.92,
    max_cell_state: int = 128,
):
    """Streaming SemDeDup admission — the embedding twin of
    ``incremental_dedup_sink``, completing the semantic-dedup family's
    streaming story: each micro-batch of vectors is admitted iff no
    ALREADY-ADMITTED vector in its cluster cell has cosine >= ``tau``.

    The coarse quantizer is a PUBLISHED catalog artifact
    (``quantizer_table``: (cen_id, cen_vec) — the round-14
    publish/apply discipline: a production quantizer is trained once,
    shipped through the catalog, and every consumer reads the same
    pinned copy). Per batch: map-side cell assignment against the
    broadcast quantizer; candidates are the state members of the NEW
    vector's cell only, capped at ``max_cell_state`` per cell via
    ``corpus.cap_per_key`` (two-phase per-cell rank over the
    partition-invariant id hash — deterministic, a hot cell
    parallelizes; the batch pair-stage's cap discipline) with the
    cap's engagement recorded LOUDLY per verdict
    (``cell_capped``); the best match (highest cosine, ties by lowest
    state id) lands on the verdict row. Admitted vectors append to
    ``{prefix}_members``; every decision lands in
    ``{prefix}_verdicts``. Intra-batch duplicates are not split here
    (both admitted if novel vs the state) — the
    ``incremental_dedup_sink`` caveat; run the batch pass inside the
    batch first if one trigger can carry duplicates.

    Replay-idempotent per ``batch_id``: state and verdict rows carry
    the batch id and a replayed batch's rows are deleted before the
    re-insert — the standing contract of every sink here. That
    contract covers the structured-streaming failure mode (re-running
    the LAST batch against the state as it stood). A FRESH-CHECKPOINT
    full-history replay is weaker: batch N is then re-decided against
    a state that already contains batches > N's admissions, so the
    admission set is only order-stable when no later admission crosses
    ``tau`` against an earlier batch's vectors — the same
    order-dependence caveat as the intra-batch note above. Replaying
    history from scratch should start from an EMPTY ``{prefix}_*``
    state (drop the tables with the checkpoint), never a populated
    one."""
    from pyspark.sql import functions as SF

    from ..operators import similarity

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        batch = batch.select("vec_id", "embedding")
        for tname in ("members", "verdicts"):
            full = f"{prefix}_{tname}"
            if catalog.exists(full):
                _ensure_batch_id(catalog, full)
                catalog.delete_where(full, f"batch_id = {int(batch_id)}")
        cen = catalog.table(quantizer_table).select(
            SF.col("cen_id"), SF.col("cen_vec")
        )
        assigned = (
            similarity.assign_cells(batch, cen)
            .join(batch, on="vec_id")
            .localCheckpoint()
        )
        members_tbl = f"{prefix}_members"
        if catalog.exists(members_tbl):
            state = catalog.table(members_tbl)
            from ..operators import corpus as corpus_ops

            kept_ids = corpus_ops.cap_per_key(
                state.select("vec_id", "cell_id"),
                key_col="cell_id",
                max_docs=max_cell_state,
                id_col="vec_id",
            ).select(SF.col("vec_id").alias("_sid"))
            st = (
                state.select(
                    SF.col("vec_id").alias("_sid"),
                    "cell_id",
                    SF.col("embedding").alias("_sv"),
                )
                .join(
                    kept_ids.withColumn("_in_cap", SF.lit(True)),
                    on="_sid",
                    how="left",
                )
                .withColumn("_in_cap", SF.coalesce("_in_cap", SF.lit(False)))
            )
            capped_cells = (
                st.groupBy("cell_id")
                .agg((SF.count(SF.lit(1)) > max_cell_state).alias("cell_capped"))
            )
            hits = (
                assigned.join(st.filter("_in_cap"), on="cell_id")
                .withColumn(
                    "_cos", similarity.cosine(SF.col("embedding"), SF.col("_sv"))
                )
                .filter(SF.col("_cos") >= tau)
                .groupBy("vec_id")
                .agg(
                    SF.max_by(
                        SF.struct(
                            SF.col("_sid").alias("matched_vec_id"),
                            SF.col("_cos").alias("cosine"),
                        ),
                        SF.struct(SF.col("_cos"), -SF.col("_sid")),
                    ).alias("_m")
                )
                .select("vec_id", "_m.matched_vec_id", "_m.cosine")
            )
            verdicts = (
                assigned.select("vec_id", "cell_id")
                .join(hits, on="vec_id", how="left")
                .join(capped_cells, on="cell_id", how="left")
                .select(
                    "vec_id",
                    "cell_id",
                    SF.lit(batch_id).alias("batch_id"),
                    SF.col("matched_vec_id").isNotNull().alias("is_dup"),
                    "matched_vec_id",
                    "cosine",
                    SF.coalesce("cell_capped", SF.lit(False)).alias("cell_capped"),
                )
            )
        else:
            verdicts = assigned.select(
                "vec_id",
                "cell_id",
                SF.lit(batch_id).alias("batch_id"),
                SF.lit(False).alias("is_dup"),
                SF.lit(None).cast("long").alias("matched_vec_id"),
                SF.lit(None).cast("double").alias("cosine"),
                SF.lit(False).alias("cell_capped"),
            )
        # decide before the state grows below
        verdicts = verdicts.localCheckpoint()
        admitted = verdicts.filter(~SF.col("is_dup")).select("vec_id")
        admit_rows = assigned.join(admitted, on="vec_id", how="left_semi").select(
            "vec_id", "cell_id", "embedding", SF.lit(batch_id).alias("batch_id")
        )
        for name, df in ((members_tbl, admit_rows), (f"{prefix}_verdicts", verdicts)):
            if catalog.exists(name):
                catalog.insert_into(name, df)
            else:
                catalog.write(name, df)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def curation_admission_sink(
    stream: DataFrame,
    catalog: WarehouseCatalog,
    prefix: str,
    checkpoint: str,
    benchmark: DataFrame,
    min_words: int = 5,
    max_words: int = 100_000,
    min_quality: float = 0.0,
    decontam_n: int = 8,
    n_shingle: int = 3,
    k: int = 16,
    bands: int = 8,
    rows: int = 2,
    threshold: float = 0.5,
    max_per_source: int | None = None,
    source_col: str = "source",
    priority_col: str | None = None,
    repetition_rules: dict[str, float] | None = None,
):
    """Incremental CURATION admission (VERDICT r8 #8) — the streaming
    twin of the batch curation ladder's admission stages (RUNBOOK
    §4.1), composed from pieces that each already exist: per
    micro-batch,

    1. stateless quality filter (``operators.text.quality_filter`` —
       the exact expression the batch ladder's stage 1 uses),
    2. benchmark decontamination: drop docs that ARE benchmark members
       or share a ``decontam_n``-gram with the FIXED broadcast
       benchmark shingle set (order matters: decontaminating BEFORE
       dedup means a contaminated doc can never enter the corpus state
       and permanently shadow a clean near-copy arriving later),
    3. near-dup admission against the STANDING admitted corpus
       (hashed shingles → minhash → banded LSH candidates →
       exact-Jaccard verify, the ``incremental_dedup_sink`` shape):
       keep-first-by-arrival.

    Admitted docs append their bands/tids and text to the state tables
    ``{prefix}_bands`` / ``{prefix}_tids`` / ``{prefix}_admitted``;
    every input doc gets one row in ``{prefix}_verdicts`` recording the
    REJECTING stage (``admitted`` / ``quality`` / ``contaminated`` /
    ``duplicate`` + corpus match). Replay-idempotent per ``batch_id``:
    each table's rows for a replayed batch are deleted before
    re-insert, the same contract as the CMS/rollup/IVF sinks.

    Parity contract (tested incl. a cross-batch near-duplicate): the
    admitted set equals a one-shot batch pass over the concatenated
    stream — quality ∧ clean ∧ not-near-dup-of-any-earlier-ADMITTED
    doc — built from the SAME operator expressions, so the parity is
    structural. Intra-batch duplicates are both admitted if novel vs
    the corpus, exactly as in ``incremental_dedup_sink``.

    ``max_per_source`` (round 10) is the streaming twin of the batch
    ladder's per-source frequency cap (``corpus.cap_per_key`` — the
    C4/RefinedWeb top-domain dominance guard): after dedup, a source
    whose STANDING admitted count has reached the cap rejects further
    docs with verdict ``source_capped`` (quota is consumed only by
    admissions — duplicates and rejects never burn it). Within one
    batch the remaining quota is filled in the SAME deterministic
    hash-rank order ``cap_per_key`` uses, so sequential per-batch
    application equals one cap_per_key pass ranked by (arrival batch,
    hash, id) — the parity the test checks. Requires ``source_col`` in
    the stream schema; the admitted state table then carries it.

    ``repetition_rules`` (round 11) passes the Gopher repetition
    battery straight through to the stage-1 ``quality_filter`` — the
    same optional rules the batch ladder's stage 1 accepts, so the
    streaming admission and the batch pass stay structurally identical
    when both are configured (a breach rejects with stage ``quality``,
    the same accounting bucket as every other stage-1 rule).

    ``priority_col`` (round 11 — the streaming half of the batch
    twin's keep-best mode, VERDICT r10 gap #3): when set (requires
    ``max_per_source``), each batch fills its remaining quota by
    ``cap_per_key``'s keep-best order (priority DESC nulls-last, then
    hash, then id) instead of hash rank alone. Scope is per ARRIVAL
    WINDOW by construction: an admission sink cannot evict, so standing
    admissions are final and priority ranks only the docs competing
    within one batch — sequential application equals cap_per_key with
    ``priority_col`` run batch-by-batch against the standing counts
    (the batch ladder's one-shot keep-best over the full corpus needs
    the batch operator; the fold-forward/rank-over-everything asymmetry
    is now limited to CROSS-batch ordering only)."""
    from pyspark.sql import Window as SW
    from pyspark.sql import functions as SF  # local alias for closures

    from ..operators import dedup
    from ..operators import text as text_ops
    from ..operators.corpus import HASH_P as CP, SPLIT_A as CA, SPLIT_B as CB

    # FIXED benchmark artifacts, checkpointed at sink construction so
    # the shingle explode + distinct runs once for the stream's
    # lifetime instead of once per micro-batch (deferred: the first
    # trigger materializes them)
    bench_ids = benchmark.select("doc_id").localCheckpoint(eager=False)
    bench_grams = (
        dedup.word_shingles(benchmark, n=decontam_n)
        .select("shingle")
        .distinct()
        .localCheckpoint(eager=False)
    )

    if priority_col is not None and max_per_source is None:
        raise ValueError("priority_col requires max_per_source")

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        extra = []
        if max_per_source is not None:
            extra.append(source_col)
        if priority_col is not None:
            extra.append(priority_col)
        batch = batch.select("doc_id", "text", *extra)
        # replay idempotence: drop any prior attempt of THIS batch
        for tname in ("verdicts", "bands", "tids", "admitted"):
            full = f"{prefix}_{tname}"
            if catalog.exists(full):
                _ensure_batch_id(catalog, full)
                catalog.delete_where(full, f"batch_id = {int(batch_id)}")

        qf = text_ops.quality_filter(
            batch,
            min_words=min_words,
            max_words=max_words,
            min_quality=min_quality,
            repetition_rules=repetition_rules,
        )
        kept_q = qf.filter(SF.col("verdict") == "kept").select("doc_id")
        contaminated = (
            dedup.word_shingles(
                batch.join(kept_q, on="doc_id", how="left_semi"), n=decontam_n
            )
            .join(SF.broadcast(bench_grams), on="shingle", how="left_semi")
            .select("doc_id")
            .distinct()
            .unionByName(kept_q.join(bench_ids, on="doc_id", how="left_semi"))
            .distinct()
        )
        survivors = batch.join(kept_q, on="doc_id", how="left_semi").join(
            contaminated, on="doc_id", how="left_anti"
        )

        # checkpointed for the same reason as in incremental_dedup_sink:
        # the verdict join and both state inserts each force these
        tids_new = dedup.shingle_ids(
            dedup.word_shingles(survivors, n=n_shingle), hashed=True
        ).localCheckpoint()
        bands_new = dedup.lsh_bands(
            dedup.minhash_signatures(tids_new, k=k), bands=bands, rows=rows
        ).localCheckpoint()
        best = _nearest_state_match(
            catalog, prefix, tids_new, bands_new, threshold, batch.sparkSession
        )

        verdicts = (
            batch.select("doc_id")
            .join(kept_q.withColumn("_q", SF.lit(True)), on="doc_id", how="left")
            .join(
                contaminated.withColumn("_c", SF.lit(True)), on="doc_id", how="left"
            )
            .join(best.withColumnRenamed("doc_a", "doc_id"), on="doc_id", how="left")
            .select(
                "doc_id",
                SF.lit(batch_id).alias("batch_id"),
                SF.when(SF.col("_q").isNull(), SF.lit("quality"))
                .when(SF.col("_c").isNotNull(), SF.lit("contaminated"))
                .when(SF.col("matched_corpus_id").isNotNull(), SF.lit("duplicate"))
                .otherwise(SF.lit("admitted"))
                .alias("stage"),
                "matched_corpus_id",
                "jaccard",
            )
        )
        if max_per_source is not None:
            # per-source quota: standing admitted counts come from the
            # state table (this batch's rows were delete_where'd above,
            # so replays see the same quota); the batch's would-be
            # admissions fill the remainder in cap_per_key's hash-rank
            # order, the rest turn 'source_capped'
            if catalog.exists(f"{prefix}_admitted"):
                standing = (
                    catalog.table(f"{prefix}_admitted")
                    .groupBy(source_col)
                    .agg(SF.count(SF.lit(1)).alias("_standing"))
                )
            else:
                # bootstrap schema mirrors the BATCH's actual source
                # type (ADVICE r10: a hardcoded string here made the
                # first batch's eqNullSafe join compare mismatched
                # types for any non-string source column)
                from pyspark.sql.types import LongType, StructField, StructType

                standing = batch.sparkSession.createDataFrame(
                    [],
                    StructType(
                        [
                            StructField(
                                source_col, batch.schema[source_col].dataType
                            ),
                            StructField("_standing", LongType()),
                        ]
                    ),
                )
            # NULL-SAFE standing join: a NULL source is a real quota
            # group on the batch side (cap_per_key caps it, the window
            # partitions it) — a plain equi-join would never match its
            # standing count and the cap would reset every batch
            standing = standing.select(
                SF.col(source_col).alias("_sc"), "_standing"
            )
            h = ((SF.col("doc_id") % CP) * CA + CB) % CP
            # fill order: cap_per_key's — keep-best (priority DESC
            # nulls-last) when configured, then the partition-invariant
            # hash rank, then id
            order_by = [h.asc(), SF.col("doc_id")]
            rank_cols = ["doc_id", source_col]
            if priority_col is not None:
                order_by.insert(0, SF.col(priority_col).desc_nulls_last())
                rank_cols.append(priority_col)
            over_quota = (
                verdicts.filter(SF.col("stage") == "admitted")
                .join(batch.select(*rank_cols), on="doc_id")
                .withColumn(
                    "_rk",
                    SF.row_number()
                    .over(SW.partitionBy(source_col).orderBy(*order_by))
                    .cast("long"),
                )
                .join(
                    SF.broadcast(standing),
                    SF.col(source_col).eqNullSafe(SF.col("_sc")),
                    "left",
                )
                .filter(
                    SF.col("_rk") + SF.coalesce(SF.col("_standing"), SF.lit(0))
                    > SF.lit(max_per_source)
                )
                .select("doc_id")
            )
            verdicts = verdicts.join(
                over_quota.withColumn("_capped", SF.lit(True)), on="doc_id", how="left"
            ).select(
                "doc_id",
                "batch_id",
                SF.when(SF.col("_capped").isNotNull(), SF.lit("source_capped"))
                .otherwise(SF.col("stage"))
                .alias("stage"),
                "matched_corpus_id",
                "jaccard",
            )
        # verdicts must be decided before the state tables grow below
        verdicts = verdicts.localCheckpoint()
        admitted = verdicts.filter(SF.col("stage") == "admitted").select("doc_id")
        for name, df in (
            (f"{prefix}_bands", bands_new),
            (f"{prefix}_tids", tids_new),
            (f"{prefix}_admitted", batch),
        ):
            admit_rows = df.join(admitted, on="doc_id", how="left_semi").withColumn(
                "batch_id", SF.lit(batch_id)
            )
            if catalog.exists(name):
                catalog.insert_into(name, admit_rows)
            else:
                catalog.write(name, admit_rows)
        if catalog.exists(f"{prefix}_verdicts"):
            catalog.insert_into(f"{prefix}_verdicts", verdicts)
        else:
            catalog.write(f"{prefix}_verdicts", verdicts)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def curation_sequences_from_state(
    catalog: WarehouseCatalog,
    prefix: str,
    seq_budget: int,
    chunk_size: int,
    chunk_stride: int | None = None,
    method: str = "contiguous",
) -> DataFrame:
    """Pack training sequences from the continuously-admitted curation
    corpus — the analysis-side reader that completes the streaming
    ladder (crawl → :func:`curation_admission_sink` admission →
    training sequences): one packing pass over the
    ``{prefix}_admitted`` state table. Results are IDENTICAL to batch
    packing over the same admitted set (parity-tested) because packing
    is a pure function of the set — the same batch/stream sharing
    contract as ``rollup_month_from_state`` and
    ``substring_census_from_state``.

    ``method``: ``"contiguous"`` (``corpus.pack_sequences`` — the
    order-preserving cumsum cut) or ``"bfd"``
    (``corpus.pack_sequences_bfd`` — best-fit-decreasing, never over
    budget; see RUNBOOK §4 "Packer choice")."""
    from ..operators import corpus as corpus_ops

    admitted = catalog.table(f"{prefix}_admitted").select("doc_id", "text")
    stride = chunk_stride if chunk_stride is not None else chunk_size
    if method == "bfd":
        return corpus_ops.pack_sequences_bfd(
            admitted, seq_budget=seq_budget, chunk_size=chunk_size, chunk_stride=stride
        )
    if method != "contiguous":
        raise ValueError(f"unknown packing method {method!r}")
    return corpus_ops.pack_sequences(
        admitted, seq_budget=seq_budget, chunk_size=chunk_size, chunk_stride=stride
    )


def clusters_from_state(catalog: WarehouseCatalog, prefix: str) -> DataFrame:
    """Near-dup CLUSTER labels from the admission sink's standing pair
    evidence — the reader that gives streaming users the batch
    ``near_dup_clusters`` surface (VERDICT r10 #8 / r11 #4): one
    ``connected_components`` pass (min-label propagation + pointer
    jumping, ``operators/dedup.py``) over the edges recorded in
    ``{prefix}_verdicts`` (every rejected duplicate's
    ``matched_corpus_id`` names its best admitted match). Returns
    (doc_id, cluster_id) with cluster_id = the smallest doc id in the
    component — the keeper under keep-first dedup — for every doc that
    appears in at least one pair, exactly the batch query's shape
    (singletons are absent there too). Works over the state of both
    :func:`curation_admission_sink` and :func:`incremental_dedup_sink`
    (their verdict schemas share ``doc_id`` / ``matched_corpus_id``).

    Parity contract (pytest incl. a cross-batch cluster and a
    replayed batch): labels equal one-shot batch clustering over the
    same documents whenever every near-dup relation is witnessed by an
    edge to an admitted doc — the near-duplicate-copies case the
    admission ladder is built for, where every cluster member matches
    the cluster's first-admitted representative. DOCUMENTED
    DIVERGENCE: rejected docs never enter the corpus state, so a
    rejected-rejected near-dup pair whose members matched DIFFERENT
    admitted docs is unwitnessed — batch clustering would merge the
    two components, this reader keeps them separate (the evidence
    graph is a union of stars around admitted docs, plus the pointer
    chains keep-first arrival can produce). Cost: edge count = total
    rejected duplicates, label state = docs-with-an-edge — both
    bounded by the verdict table the sink already maintains."""
    from ..operators import dedup

    verdicts = catalog.table(f"{prefix}_verdicts")
    edges = (
        verdicts.filter(F.col("matched_corpus_id").isNotNull())
        .select(
            F.col("doc_id").alias("doc_a"),
            F.col("matched_corpus_id").alias("doc_b"),
        )
        .distinct()
    )
    cc = dedup.connected_components(edges)
    return cc.select(F.col("id").alias("doc_id"), "cluster_id")


def enrich_stream(
    stream: DataFrame, dim: DataFrame, on: list[str] | str, how: str = "left"
) -> DataFrame:
    """Stream-static dimension enrichment: join each micro-batch against
    a (small) static dimension. The dim is broadcast, so the join is
    STATELESS — no streaming state at all, the canonical way to attach
    dimension attributes to a live fact stream. The static side is
    re-read per micro-batch, so a slowly-changing dim table picks up
    updates between batches (eventual-consistency enrichment)."""
    return stream.join(F.broadcast(dim), on=on, how=how)


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    interval_seconds: int,
    watermark: str = "2 hours",
) -> DataFrame:
    """Time-bounded stream-stream inner join: pair each left event with
    the same key's right events from the preceding ``interval_seconds``
    (attribution: purchase <- recent views). Both sides are watermarked,
    and the join condition bounds right.ts to a closed interval behind
    left.ts — Spark can therefore evict buffered rows once the watermark
    passes the interval, keeping state O(events-per-interval), bounded
    at any scale. An UNbounded stream-stream join would grow state
    forever: the time bound is what makes this shape production-safe."""
    lw = left.withWatermark("ts", watermark).alias("l")
    rw = right.withWatermark("ts", watermark).alias("r")
    return lw.join(
        rw,
        F.expr(
            f"l.{key} = r.{key} AND r.ts >= l.ts - INTERVAL {interval_seconds} SECONDS"
            " AND r.ts <= l.ts"
        ),
    )


def cms_sketch_sink(
    stream: DataFrame,
    catalog: WarehouseCatalog,
    prefix: str,
    checkpoint: str,
    key_col: str = "user_id",
):
    """Streaming count-min sketch maintenance — the live twin of the
    batch ``events_heavy_hitters_cms`` query. Each micro-batch collapses
    to its own DEPTH x WIDTH partial cell counts (a bounded, mergeable
    table — count-min cells merge by ADDITION, the same O(delta)
    maintenance contract as the HLL and histogram rollups), appended to
    ``{prefix}_cells`` with the batch id; the current sketch at any
    moment is one tiny re-aggregation of that state. Per batch the work
    is O(batch rows) map-side hashing + a <= DEPTH*WIDTH-row aggregate:
    no per-key state, no growth with the key cardinality — exactly why
    a sketch (and not a keyed counter) is the 100 TB stream shape.

    EXACTLY-ONCE on replay: foreachBatch is at-least-once — after a
    crash between the append and the checkpoint commit, the batch is
    replayed. A blind append would then double its cells and every
    estimate would overcount. The sink is idempotent per ``batch_id``:
    any rows already present for the replayed id (complete or partial)
    are deleted before the re-insert, so the cell table always holds
    exactly one complete set of rows per committed batch — the merged
    sketch stays IDENTICAL to a batch sketch over the concatenated
    stream. The delete rewrites only the bounded cell table (<=
    batches x DEPTH x WIDTH rows), never the stream data."""
    from pyspark.sql import functions as SF

    from ..plans.timeseries_queries import CMS_A, CMS_B, CMS_DEPTH, CMS_P, CMS_WIDTH

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        params = spark.createDataFrame(
            [(i, CMS_A[i], CMS_B[i]) for i in range(CMS_DEPTH)], "i int, a long, b long"
        )
        cell = (
            SF.pmod((SF.col(key_col) % CMS_P) * SF.col("a") + SF.col("b"), SF.lit(CMS_P))
            % CMS_WIDTH
        )
        cells = (
            batch.select(key_col)
            .crossJoin(SF.broadcast(params))
            .select("i", cell.alias("col"))
            .groupBy("i", "col")
            .agg(SF.count(SF.lit(1)).alias("c"))
            .withColumn("batch_id", SF.lit(batch_id))
        )
        tbl = f"{prefix}_cells"
        if catalog.exists(tbl):
            # replay-safe: drop any rows a previously-failed attempt of
            # THIS batch already appended, then insert fresh
            catalog.delete_where(tbl, f"batch_id = {int(batch_id)}")
            catalog.insert_into(tbl, cells)
        else:
            catalog.write(tbl, cells)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def cms_estimate(
    catalog: WarehouseCatalog, prefix: str, keys: DataFrame, key_col: str = "user_id"
) -> DataFrame:
    """Point-query the maintained sketch: merge the partial cell tables
    (sum per (row, col)) and return ``est_count`` per requested key —
    the min over its DEPTH cells, always >= the true count. Because
    cells merge by addition, the estimate is IDENTICAL to a batch
    sketch built over the concatenation of every micro-batch.

    A never-incremented cell is an implicit ZERO, not a missing
    observation: the probe LEFT-joins the merged cells and coalesces
    absent ones to 0 before taking the min, so a key that hashes into
    any empty cell estimates 0 (count-min's only sound answer for a
    never-seen key) instead of over-estimating from the subset of
    occupied cells — and every requested key always gets a row.

    Defense in depth vs sink replays: cells are first collapsed to one
    row per (batch_id, i, col) with max(c) — batch content is
    deterministic, so duplicate appends of the same batch carry
    identical per-cell counts and max() restores the single-append
    state even if a failure window left both copies on disk."""
    from pyspark.sql import functions as SF

    from ..plans.timeseries_queries import CMS_A, CMS_B, CMS_DEPTH, CMS_P, CMS_WIDTH

    spark = keys.sparkSession
    params = spark.createDataFrame(
        [(i, CMS_A[i], CMS_B[i]) for i in range(CMS_DEPTH)], "i int, a long, b long"
    )
    merged = (
        catalog.table(f"{prefix}_cells")
        .groupBy("batch_id", "i", "col")
        .agg(SF.max("c").alias("c"))
        .groupBy("i", "col")
        .agg(SF.sum("c").alias("c"))
    )
    cell = (
        SF.pmod((SF.col(key_col) % CMS_P) * SF.col("a") + SF.col("b"), SF.lit(CMS_P))
        % CMS_WIDTH
    )
    return (
        keys.crossJoin(SF.broadcast(params))
        .select(key_col, "i", cell.alias("col"))
        .join(SF.broadcast(merged), on=["i", "col"], how="left")
        .select(key_col, SF.coalesce("c", SF.lit(0)).alias("c"))
        .groupBy(key_col)
        .agg(SF.min("c").alias("est_count"))
    )


def substring_gram_sink(
    stream: DataFrame,
    catalog: WarehouseCatalog,
    prefix: str,
    checkpoint: str,
    k: int = 5,
    hashed: bool = False,
):
    """Incremental exact-substring state maintenance — the streaming
    front half of ``corpus.substring_dup_census`` (Lee et al. 2022):
    each micro-batch of documents is positional-k-gram-exploded ONCE
    (``corpus.positional_grams`` — the corpus-scale map-side work) and
    appended to the standing state table ``{prefix}_grams``; the
    census / dedup decision then runs on demand over the state via
    ``substring_dup_census(grams=...)`` without ever re-exploding
    ingested text. Per batch the work is O(batch tokens); state grows
    with the corpus (it IS the tokenized corpus) — at 100 TB this is
    the parquet staging table the batch operators' docstrings
    prescribe, partitioned however the census consumer buckets.

    Replay-idempotent per ``batch_id`` (foreachBatch is
    at-least-once): rows of a replayed batch are deleted before the
    re-insert, same contract as ``cms_sketch_sink``.

    ``hashed=True`` is the production state shape: grams are stored as
    ``xxhash64`` longs — 8 bytes per position instead of a k-token
    string (a ~10-20x state shrink at k=5), the same trade as
    ``shingle_ids(hashed=True)``; the census downstream only ever
    groups/joins on gram equality, so results are identical modulo
    astronomically-unlikely 64-bit collisions (census parity is
    asserted for both modes in the test suite)."""
    from ..operators import corpus as corpus_ops

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as SF

        grams = corpus_ops.positional_grams(
            batch.select("doc_id", "text"), k=k
        )
        if hashed:
            grams = grams.withColumn("gram", SF.xxhash64("gram"))
        grams = grams.withColumn("batch_id", SF.lit(batch_id))
        tbl = f"{prefix}_grams"
        if catalog.exists(tbl):
            catalog.delete_where(tbl, f"batch_id = {int(batch_id)}")
            catalog.insert_into(tbl, grams)
        else:
            catalog.write(tbl, grams)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def ivf_admission_sink(
    stream: DataFrame,
    catalog: WarehouseCatalog,
    prefix: str,
    checkpoint: str,
    centroids: DataFrame,
):
    """Streaming IVF index admission — the ANN twin of
    ``incremental_dedup_sink`` (VERDICT r7 #6): each micro-batch of new
    embeddings is coarse-quantized against the FIXED broadcast centroid
    table (``similarity.assign_cells`` — map-side argmin, no shuffle)
    and appended to the standing cell-assigned state table
    ``{prefix}_cells`` (vec_id, embedding, cell_id, batch_id). Queries
    then probe the continuously-admitted index via
    :func:`ivf_state_topk` without ever re-quantizing ingested vectors
    — the nightly-crawl production shape for a vector index: per-batch
    cost is O(batch x |centroids|), independent of index size.

    ``centroids`` is captured by the closure, so every batch quantizes
    against the SAME coarse quantizer — the invariant that makes
    incremental admission sound (cell membership must not depend on
    arrival order). Retraining the quantizer is a new index build
    (new prefix), exactly as in a production IVF deployment; at 100 TB
    the state table is parquet partitioned by ``cell_id`` so a probe
    reads only its cells.

    Replay-idempotent per ``batch_id`` (foreachBatch is
    at-least-once): rows of a replayed batch are deleted before the
    re-insert — the same contract as the CMS and substring sinks."""
    from ..operators import similarity as sim

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as SF

        vecs = batch.select("vec_id", "embedding")
        admitted = (
            vecs.join(sim.assign_cells(vecs, centroids), on="vec_id")
            .withColumn("batch_id", SF.lit(batch_id))
        )
        tbl = f"{prefix}_cells"
        if catalog.exists(tbl):
            catalog.delete_where(tbl, f"batch_id = {int(batch_id)}")
            catalog.insert_into(tbl, admitted)
        else:
            catalog.write(tbl, admitted)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def ivf_state_topk(
    catalog: WarehouseCatalog,
    prefix: str,
    queries: DataFrame,
    centroids: DataFrame,
    k: int,
    n_probe: int = 1,
) -> DataFrame:
    """Search the continuously-admitted IVF index: probe each query's
    ``n_probe`` nearest cells (``similarity.probe_cells`` against the
    same broadcast centroids the sink used) and rank cosine within the
    probed cells only — results are IDENTICAL to a one-shot
    ``assign_cells`` + ``cosine_topk`` over the concatenation of every
    admitted batch (parity-tested over unique vec_ids), because cell
    assignment is a pure function of (vector, centroids), not of
    arrival order.

    The state is collapsed to one row per ``vec_id`` first,
    DETERMINISTICALLY keeping the highest ``batch_id`` (ADVICE r8: an
    arbitrary ``dropDuplicates`` pick made re-admission of a vec_id
    with a new embedding nondeterministic). Semantics: re-admitting a
    vec_id is an UPSERT — the latest admitted embedding wins. This also
    stays replay-safe: duplicate appends of the same batch carry
    identical rows, so the latest-wins collapse restores the
    single-append state even if a failure window left both copies on
    disk.

    Within ONE batch the same vec_id with two different embeddings has
    no arrival order to break the tie, so the collapse orders by a
    content hash of the embedding second (ADVICE r9: batch_id alone
    left the row_number tie nondeterministic) — an arbitrary but FIXED
    winner, reproduced on every replay and by the parity test's
    one-shot twin. Callers who care which duplicate wins should dedup
    upstream; this guarantees only that the pick is stable."""
    from pyspark.sql import Window

    from ..operators import similarity as sim

    latest = Window.partitionBy("vec_id").orderBy(
        F.col("batch_id").desc(), F.xxhash64("embedding").desc()
    )
    state = (
        catalog.table(f"{prefix}_cells")
        .withColumn("_rn", F.row_number().over(latest))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "embedding", "cell_id")
    )
    probed = sim.probe_cells(queries, centroids, n_probe=n_probe)
    q = queries.select("vec_id", "embedding").join(probed, on="vec_id")
    return sim.cosine_topk(q, state, k=k, cell_col="cell_id")


def substring_census_from_state(
    catalog: WarehouseCatalog, prefix: str, k: int = 5, min_occurrences: int = 2
) -> DataFrame:
    """Census the continuously-ingested corpus: one aggregate pass over
    the gram state table ``substring_gram_sink`` maintains — identical
    results to the one-shot batch ``substring_dup_census`` over the
    concatenated stream (parity-tested), with the per-document explode
    paid once at ingest instead of per analysis."""
    from ..operators import corpus as corpus_ops

    # defense in depth vs sink replays: gram rows are unique per
    # (doc, position), so duplicate appends of one batch produce exact
    # row copies — dropDuplicates restores the single-append state
    # before the census counts occurrences
    state = catalog.table(f"{prefix}_grams").dropDuplicates().drop("batch_id")
    return corpus_ops.substring_dup_census(
        None, k=k, min_occurrences=min_occurrences, grams=state
    )


def histogram_sketch_sink(
    stream: DataFrame,
    catalog: WarehouseCatalog,
    prefix: str,
    checkpoint: str,
    ts_col: str = "ts",
):
    """Streaming QUANTILE-sketch maintenance — the live twin of the
    batch ``events_quantile_rollup``: each micro-batch collapses to its
    day-grain mergeable histogram partials (``(day, event_type, bin,
    n)`` — the SAME ``histogram_partials`` expression the batch query
    uses, so parity is structural) and appends them to
    ``{prefix}_hist`` with the batch id. Histograms merge by summing
    counts, so :func:`quantiles_from_state` at any point equals the
    one-shot batch rollup over every event seen — including a day (or a
    single bin) split across the batch boundary. Replay-idempotent per
    ``batch_id``. Completes the mergeable-sketch trio with the CMS
    (heavy hitters) and HLL (distincts) sinks: same O(delta)
    maintenance contract, for percentiles. ``ts_col`` must be a
    NORMALIZED timestamp column (route nanos-BIGINT sources through
    ``normalize_event_ts`` first, as with every event sink here)."""
    from ..plans.scale_queries import histogram_partials

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        partials = histogram_partials(batch, ts_col=ts_col).withColumn(
            "batch_id", F.lit(batch_id)
        )
        tbl = f"{prefix}_hist"
        if catalog.exists(tbl):
            catalog.delete_where(tbl, f"batch_id = {int(batch_id)}")
            catalog.insert_into(tbl, partials)
        else:
            catalog.write(tbl, partials)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def quantiles_from_state(catalog: WarehouseCatalog, prefix: str) -> DataFrame:
    """Current quantile report from the continuously-maintained
    histogram state: merge the per-(day, batch) partials by key and run
    the identical ``quantiles_from_bins`` expression the batch query
    uses — streamed-state results equal ``events_quantile_rollup`` over
    the concatenated stream bit for bit (parity-tested)."""
    from ..plans.scale_queries import quantiles_from_bins

    # defense in depth vs sink replays (same as cms_estimate): collapse
    # to one row per (batch, day, type, bin) with max(n) first — batch
    # content is deterministic, so duplicate appends of one batch carry
    # identical partials and max() restores the single-append state
    merged = (
        catalog.table(f"{prefix}_hist")
        .groupBy("batch_id", "day", "event_type", "bin")
        .agg(F.max("n").alias("n"))
        .groupBy("event_type", "bin")
        .agg(F.sum("n").alias("n"))
    )
    return quantiles_from_bins(merged)


def hll_sketch_sink(
    stream: DataFrame,
    catalog: WarehouseCatalog,
    prefix: str,
    checkpoint: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
):
    """Streaming DISTINCT-count maintenance via mergeable HLL sketches —
    the live twin of the batch ``user_sketch_rollup``: each micro-batch
    collapses to one Datasketches HLL sketch per (event_type, day)
    (``daily_hll_sketches`` — the SAME expression the batch query uses,
    so parity is structural) appended to ``{prefix}_sketches`` with the
    batch id. HLL union is order- and duplicate-insensitive, so
    :func:`distinct_from_state` equals the one-shot estimate over the
    concatenated stream EXACTLY (no approximation drift from batching:
    union of sketches over any partition of the data is the sketch of
    the whole). Replay-idempotent per ``batch_id``.

    ``ts_col`` must be a NORMALIZED timestamp column (like every other
    event sink here): a raw nanos-BIGINT ts would cast as seconds and
    land days in year ~56000 — route such sources through
    ``normalize_event_ts`` first."""
    from ..plans.timeseries_queries import daily_hll_sketches

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        ev = batch.select("event_type", F.to_date(ts_col).alias("day"), key_col)
        sketches = daily_hll_sketches(ev, key_col=key_col).withColumn(
            "batch_id", F.lit(batch_id)
        )
        tbl = f"{prefix}_sketches"
        if catalog.exists(tbl):
            catalog.delete_where(tbl, f"batch_id = {int(batch_id)}")
            catalog.insert_into(tbl, sketches)
        else:
            catalog.write(tbl, sketches)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def distinct_from_state(catalog: WarehouseCatalog, prefix: str) -> DataFrame:
    """Current per-type distinct estimate from the continuously-
    maintained HLL state: merge the per-(day, batch) sketch rows to one
    sketch per day (HLL union is associative, so day-then-type merging
    equals one-shot), then run the batch query's own
    ``hll_union_estimate`` expression — ``n_sketches`` is the distinct
    day count, exactly as in ``user_sketch_rollup``. Costs ~|days x
    batches| sketch merges, never a rescan of the raw stream."""
    from ..plans.timeseries_queries import hll_union_estimate

    per_day = (
        catalog.table(f"{prefix}_sketches")
        .groupBy("event_type", "day")
        .agg(F.hll_union_agg("sk").alias("sk"))
    )
    return (
        hll_union_estimate(per_day)
        .withColumnRenamed("n_sketches", "n_days")
        .orderBy("event_type")
    )


def rollup_hour_sink(
    stream: DataFrame,
    catalog: WarehouseCatalog,
    prefix: str,
    checkpoint: str,
):
    """Streaming continuous-aggregate maintenance — the live twin of
    the batch ``events_hypertable_rollup`` cascade. Each micro-batch
    collapses to its own hour-grain mergeable partials (count, exact
    decimal value sum, min, max per (hour, event_type) — the same
    ``hour_partials`` expression the batch query uses) appended to
    ``{prefix}_hours`` with the batch id; every coarser grain is one
    tiny re-aggregation of that state (``rollup_month_from_state``).
    Per batch the work is O(batch rows) map-side + an
    hour-partial-sized aggregate: state grows with distinct
    (batch, hour, event_type) triples, never with the raw event count
    — the continuous-aggregate shape that makes month-grain dashboards
    O(partials) instead of O(100 TB rescan).

    Replay-idempotent per ``batch_id`` exactly like ``cms_sketch_sink``:
    rows a previously-failed attempt of the same batch appended are
    deleted before the re-insert, so the state holds one complete
    partial set per committed batch and the merged rollup stays
    IDENTICAL to the one-shot batch cascade over the concatenated
    stream."""
    from ..plans.ingest_queries import hour_partials

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        hours = hour_partials(batch, ts_col="ts").withColumn(
            "batch_id", F.lit(batch_id)
        )
        tbl = f"{prefix}_hours"
        if catalog.exists(tbl):
            # delete_where itself probes first and skips the rewrite
            # when the batch was never seen, so the common non-replay
            # path stays append-only (one pruned scan, no rewrite)
            catalog.delete_where(tbl, f"batch_id = {int(batch_id)}")
            catalog.insert_into(tbl, hours)
        else:
            catalog.write(tbl, hours)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def rollup_month_from_state(catalog: WarehouseCatalog, prefix: str) -> DataFrame:
    """Month grain on demand from the maintained hour-partial state:
    first merge cross-batch partials of the SAME hour (a micro-batch
    boundary can split an hour — counts and decimal sums add, mins
    min, maxes max), then run the identical day -> month cascade the
    batch query uses (``rollup_cascade_from_hours``), so
    streamed-state results equal ``events_hypertable_rollup`` bit for
    bit.

    Defense in depth vs sink replays: partials are first collapsed to
    one row per (batch_id, hour, event_type) — batch content is
    deterministic, so duplicate appends of the same batch carry
    identical rows and the collapse restores the single-append state
    even if a failure window left both copies on disk."""
    from ..plans.ingest_queries import rollup_cascade_from_hours

    state = catalog.table(f"{prefix}_hours")
    deduped = state.groupBy("batch_id", "hour", "event_type").agg(
        F.max("n").alias("n"),
        F.max("sv").alias("sv"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )
    merged = deduped.groupBy("hour", "event_type").agg(
        F.sum("n").alias("n"),
        F.sum("sv").alias("sv"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )
    return rollup_cascade_from_hours(merged)


def word_count_sink(
    stream: DataFrame,
    catalog: WarehouseCatalog,
    prefix: str,
    checkpoint: str,
    text_col: str = "text",
):
    """Streaming tokenizer-corpus collector (round 11): each
    micro-batch collapses to its own (word, cnt) partials — word counts
    merge by ADDITION, the same mergeable-partial shape as the CMS
    cells and hour partials — appended to ``{prefix}_words`` with the
    batch id. Per batch the work is one word explode + a
    vocab-scale aggregate; state grows with distinct (batch, word)
    pairs, never with raw token volume, so a tokenizer can be
    (re)trained on demand from state without ever rescanning the
    corpus (``word_table_from_state`` →
    ``unigram.unigram_train_from_words``). Replay-idempotent per
    ``batch_id`` exactly like ``rollup_hour_sink``."""
    from ..operators.unigram import word_table

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        wc = word_table(batch, text_col).withColumn("batch_id", F.lit(batch_id))
        tbl = f"{prefix}_words"
        if catalog.exists(tbl):
            catalog.delete_where(tbl, f"batch_id = {int(batch_id)}")
            catalog.insert_into(tbl, wc)
        else:
            catalog.write(tbl, wc)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def word_table_from_state(catalog: WarehouseCatalog, prefix: str) -> DataFrame:
    """Merged (word, cnt) from the collector state — equals
    ``unigram.word_table`` over the concatenated stream (parity test).
    Defense in depth vs sink replays, same as
    ``rollup_month_from_state``: partials first collapse to one row per
    (batch_id, word) — batch content is deterministic, so duplicate
    appends carry identical rows and max() restores the single-append
    state — then cross-batch counts add."""
    state = catalog.table(f"{prefix}_words")
    return (
        state.groupBy("batch_id", "word")
        .agg(F.max("cnt").alias("cnt"))
        .groupBy("word")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def line_census_sink(
    stream: DataFrame,
    catalog: WarehouseCatalog,
    prefix: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Streaming duplicate-line census collector (round 12, the
    streaming twin of ``dedup.dedup_lines``): each micro-batch
    collapses to per-line-key partials — ``(key, cnt,
    canon_doc, canon_line)`` where the canonical is the batch-local
    minimum ``(doc_id, line_no)`` — appended to ``{prefix}_lines``
    with the batch id. Counts merge by ADDITION and canonicals by MIN,
    the same mergeable-partial discipline as the CMS cells / hour
    partials / word counts, so the corpus-wide dedup decision for ANY
    document set can be replayed on demand from state
    (:func:`dedup_lines_against_state`) without rescanning the
    ingested corpus. Per batch: one line explode + a line-vocab-scale
    aggregate; state grows with distinct (batch, line) pairs.
    Replay-idempotent per ``batch_id`` exactly like
    ``word_count_sink``."""
    from ..operators.dedup import split_lines

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        partial = (
            split_lines(batch, text_col=text_col, id_col=id_col)
            .withColumn("key", F.lower(F.col("line")))
            .groupBy("key")
            .agg(
                F.count(F.lit(1)).cast("long").alias("cnt"),
                F.min(F.struct(F.col(id_col), F.col("line_no"))).alias("_c"),
            )
            .select(
                "key",
                "cnt",
                F.col(f"_c.{id_col}").alias("canon_doc"),
                F.col("_c.line_no").alias("canon_line"),
            )
            .withColumn("batch_id", F.lit(batch_id))
        )
        tbl = f"{prefix}_lines"
        if catalog.exists(tbl):
            catalog.delete_where(tbl, f"batch_id = {int(batch_id)}")
            catalog.insert_into(tbl, partial)
        else:
            catalog.write(tbl, partial)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def line_census_from_state(catalog: WarehouseCatalog, prefix: str) -> DataFrame:
    """Merged ``(key, cnt, canon_doc, canon_line)`` from the line
    collector state. Defense in depth vs sink replays as everywhere:
    partials first collapse to one row per (batch_id, key) by max —
    batch content is deterministic, so a duplicate append restores the
    single-append state — then counts add and canonicals take the
    cross-batch MIN (the corpus-wide first occurrence regardless of
    which batch carried it)."""
    state = catalog.table(f"{prefix}_lines")
    return (
        state.groupBy("batch_id", "key")
        .agg(
            F.max("cnt").alias("cnt"),
            F.min(F.struct("canon_doc", "canon_line")).alias("_c"),
        )
        .groupBy("key")
        .agg(
            F.sum("cnt").cast("long").alias("cnt"),
            F.min("_c").alias("_c"),
        )
        .select(
            "key",
            "cnt",
            F.col("_c.canon_doc").alias("canon_doc"),
            F.col("_c.canon_line").alias("canon_line"),
        )
    )


def dedup_lines_against_state(
    docs: DataFrame,
    census: DataFrame,
    min_occurrences: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Replay ``dedup.dedup_lines`` decisions for ``docs`` against a
    corpus-wide census (:func:`line_census_from_state`): a line drops
    iff it reaches ``min_occurrences`` corpus-wide AND this occurrence
    is not the corpus-wide canonical. Applied to the full ingested
    corpus this EQUALS the one-shot batch ``dedup_lines`` (parity
    test, including duplicates that cross batch boundaries); applied
    to a fresh slice it makes the same keep/drop calls the full batch
    job would, without rescanning history. Same output contract as
    the batch operator."""
    from ..operators.dedup import split_lines

    lines = split_lines(docs, text_col=text_col, id_col=id_col).withColumn(
        "key", F.lower(F.col("line"))
    )
    kept = lines.join(census, on="key", how="left").withColumn(
        "_keep",
        (F.coalesce(F.col("cnt"), F.lit(0)) < F.lit(int(min_occurrences)))
        | (
            (F.col(id_col) == F.col("canon_doc"))
            & (F.col("line_no") == F.col("canon_line"))
        ),
    )
    from ..operators.dedup import reassemble_lines

    return reassemble_lines(kept, id_col)


def file_census_sink(
    stream: DataFrame,
    catalog: WarehouseCatalog,
    prefix: str,
    checkpoint: str,
    key_cols: list[str] | None = None,
    bytes_col: str = "n_chars",
):
    """Streaming small-file census collector (round 12, the streaming
    twin of the ``compaction_plan`` input): each micro-batch collapses
    to per-file-key byte partials — ``(key_cols..., file_bytes)``
    merging by ADDITION, the same mergeable-partial discipline as the
    CMS cells / hour / word / line partials — appended to
    ``{prefix}_files`` with the batch id. A continuously-ingesting
    table can then plan compaction ON DEMAND from the standing census
    (:func:`compaction_plan_from_state` → ``layout.bfd_bins``) without
    re-listing or re-scanning ingested data — the lakehouse OPTIMIZE
    loop. Replay-idempotent per ``batch_id``."""
    keys = key_cols if key_cols is not None else ["source", "lang"]

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        partial = (
            batch.groupBy(*keys)
            .agg(F.sum(bytes_col).cast("long").alias("file_bytes"))
            .withColumn("batch_id", F.lit(batch_id))
        )
        tbl = f"{prefix}_files"
        if catalog.exists(tbl):
            catalog.delete_where(tbl, f"batch_id = {int(batch_id)}")
            catalog.insert_into(tbl, partial)
        else:
            catalog.write(tbl, partial)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def compaction_plan_from_state(
    catalog: WarehouseCatalog,
    prefix: str,
    key_cols: list[str] | None = None,
    group_size: int = 128,
):
    """BFD compaction plan over the standing streaming file census:
    merge the per-batch byte partials (collapse per (batch_id, key) by
    max for replay defense, then add across batches — identical
    discipline to ``word_table_from_state``), derive the
    ``2 × max(file_bytes)`` capacity from the merged census, and run
    the SAME ``layout.bfd_bins`` fold the batch ``compaction_plan``
    query runs. Parity: over a fully-ingested stream this EQUALS the
    one-shot plan on the concatenated input (pytest, including a file
    key whose bytes arrive split across batches)."""
    from ..operators import layout

    keys = key_cols if key_cols is not None else ["source", "lang"]
    state = catalog.table(f"{prefix}_files")
    census = (
        state.groupBy("batch_id", *keys)
        .agg(F.max("file_bytes").alias("file_bytes"))
        .groupBy(*keys)
        .agg(F.sum("file_bytes").cast("long").alias("file_bytes"))
    )
    cap = census.agg((F.lit(2) * F.max("file_bytes")).cast("long").alias("_capc"))
    return layout.bfd_bins(
        census.crossJoin(F.broadcast(cap)),
        size_col="file_bytes",
        capacity="_capc",
        tiebreak=keys,
        group_size=group_size,
    )


def edge_census_sink(
    stream: DataFrame,
    catalog: WarehouseCatalog,
    prefix: str,
    checkpoint: str,
    group_col: str = "pk",
    item_col: str = "sk",
):
    """Streaming co-occurrence edge census (VERDICT r12 #5 — the
    incremental twin of ``graph.cooccurrence_edges``, feeding the
    triangle/k-core family the way ``line_census_sink`` feeds line
    dedup): maintain the weighted item-item projection of a streaming
    bipartite (group, item) relation by DELTA pairs, so edge weights
    merge by ADDITION across batches.

    Two state tables. ``{prefix}_members`` holds every (group, item)
    membership exactly once (each batch's genuinely-new memberships —
    an anti-join against prior state — are appended with the batch
    id). ``{prefix}_edges`` holds per-batch pair-weight DELTAS: a new
    membership (g, i) forms one pair per EXISTING member j of g
    (cross delta) plus the within-batch pairs among new members, so
    each (group, {i, j}) co-occurrence is counted exactly once — in
    the batch where the LATER endpoint arrived. Summing deltas
    therefore reproduces the one-shot projection's weights exactly
    (pytest parity incl. a triangle closed only across the boundary).

    Scale shape per batch: one batch-scale distinct, one anti-join +
    one equi-join against member state on the group key, one
    pair-scale aggregate — O(delta x group-degree) work, never a
    rescan of history; the new-membership frame takes an EAGER
    localCheckpoint both to cut its lineage out of the state table it
    is about to be appended to and because three consumers (within,
    cross, append) would each re-run the anti-join. Replay-idempotent
    per ``batch_id``: both tables drop the replayed id's rows before
    recomputing, and the recomputation is deterministic."""

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        tbl_m, tbl_e = f"{prefix}_members", f"{prefix}_edges"
        newm = batch.select(
            F.col(group_col).cast("long").alias("g"),
            F.col(item_col).cast("long").alias("i"),
        ).distinct()
        prior = None
        # replay defense FIRST, each table independently — a batch-0
        # crash between the edges write and the members write leaves
        # tbl_e populated while tbl_m is absent, and the stale deltas
        # must still be dropped before the re-insert
        if catalog.exists(tbl_e):
            catalog.delete_where(tbl_e, f"batch_id = {int(batch_id)}")
        if catalog.exists(tbl_m):
            catalog.delete_where(tbl_m, f"batch_id = {int(batch_id)}")
            prior = catalog.table(tbl_m).select("g", "i")
            newm = newm.join(prior, on=["g", "i"], how="left_anti")
        newm = newm.localCheckpoint(eager=True)
        a, b = newm.alias("a"), newm.alias("b")
        within = a.join(b, on="g").filter(F.col("a.i") < F.col("b.i")).select(
            F.col("a.i").alias("s1"), F.col("b.i").alias("s2")
        )
        pairs = within
        if prior is not None:
            cross = newm.join(prior.withColumnRenamed("i", "j"), on="g").select(
                F.least("i", "j").alias("s1"), F.greatest("i", "j").alias("s2")
            )
            pairs = pairs.unionByName(cross)
        delta = (
            pairs.groupBy("s1", "s2")
            .agg(F.count(F.lit(1)).cast("long").alias("w"))
            .withColumn("batch_id", F.lit(batch_id))
        )
        if catalog.exists(tbl_e):
            catalog.insert_into(tbl_e, delta)
        else:
            catalog.write(tbl_e, delta)
        members = newm.withColumn("batch_id", F.lit(batch_id))
        if catalog.exists(tbl_m):
            catalog.insert_into(tbl_m, members)
        else:
            catalog.write(tbl_m, members)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def cosupply_edges_from_state(catalog: WarehouseCatalog, prefix: str) -> DataFrame:
    """Merged weighted edge list ``(s1, s2, weight)`` from the edge
    census state — deltas collapse to one row per (batch_id, pair) by
    max (duplicate appends of a deterministic batch are absorbed, the
    CMS/line-census defense) and then SUM by addition into the exact
    one-shot ``cooccurrence_edges`` weights."""
    state = catalog.table(f"{prefix}_edges")
    return (
        state.groupBy("batch_id", "s1", "s2")
        .agg(F.max("w").alias("w"))
        .groupBy("s1", "s2")
        .agg(F.sum("w").cast("long").alias("weight"))
    )


def triangles_from_state(
    catalog: WarehouseCatalog, prefix: str, strong: bool = True
) -> DataFrame:
    """Per-node triangle counts over the maintained co-occurrence
    graph — the SAME sparsification (``graph.top_decile_edges``) and
    counting algebra (``graph.count_triangles``, degree-oriented) as
    the batch ``supplier_cosupply_triangles`` query, run over the
    merged edge state instead of a corpus rescan. ``strong=False``
    skips the decile cut (the full projection, what the parity pytest
    pins against the one-shot build)."""
    from ..operators import graph

    edges = cosupply_edges_from_state(catalog, prefix)
    if strong:
        edges = graph.top_decile_edges(edges)
    return graph.count_triangles(edges)


def kcore_from_state(
    catalog: WarehouseCatalog, prefix: str, rounds: int = 8, strong: bool = True
) -> DataFrame:
    """Core numbers over the maintained co-occurrence graph (the
    incremental face of ``supplier_cosupply_kcore``) — same h-index
    fixpoint (``graph.core_numbers``) over the merged edge state."""
    from ..operators import graph

    edges = cosupply_edges_from_state(catalog, prefix)
    if strong:
        edges = graph.top_decile_edges(edges)
    return graph.core_numbers(edges, rounds=rounds)


def labeled_word_count_sink(
    stream: DataFrame,
    catalog: WarehouseCatalog,
    prefix: str,
    checkpoint: str,
    text_col: str = "text",
):
    """Streaming TRAINING-STATE collector for the quality classifier
    (round 13 — the per-class face of ``word_count_sink``, completing
    the train-from-stream-state family alongside the BPE/unigram
    collectors): each micro-batch is labeled by the SAME deterministic
    rule gate the batch classifier distills
    (``corpus_queries._rule_labeled`` — map-side, no state needed)
    and collapses to two mergeable-partial tables — ``{prefix}_lwords``
    holding (label, word, cnt) occurrence partials and
    ``{prefix}_lpriors`` holding (label, n_docs) prior partials, both
    merging by ADDITION. A Naive-Bayes model retrained from state
    (:func:`quality_model_from_state`) therefore equals one trained on
    the concatenated corpus exactly (pytest parity), without ever
    rescanning ingested documents. Replay-idempotent per ``batch_id``
    like every sink here."""
    from ..operators.text import words
    from ..plans.corpus_queries import _rule_labeled

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        labeled = _rule_labeled(batch, text_col=text_col).localCheckpoint(eager=True)
        wc = (
            labeled.select("label", F.explode(words(text_col)).alias("word"))
            .groupBy("label", "word")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .withColumn("batch_id", F.lit(batch_id))
        )
        pri = (
            labeled.groupBy("label")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
            .withColumn("batch_id", F.lit(batch_id))
        )
        for tbl, part in ((f"{prefix}_lwords", wc), (f"{prefix}_lpriors", pri)):
            if catalog.exists(tbl):
                catalog.delete_where(tbl, f"batch_id = {int(batch_id)}")
                catalog.insert_into(tbl, part)
            else:
                catalog.write(tbl, part)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def quality_model_from_state(
    catalog: WarehouseCatalog, prefix: str
) -> tuple[DataFrame, DataFrame]:
    """(profiles, priors) for ``text.language_model_scores`` rebuilt
    from the labeled-word state — partials collapse per (batch_id,
    key) by max (duplicate appends of a deterministic batch absorbed,
    the standing defense) and then SUM by addition into exactly the
    counts ``text.train_language_profiles(feature_fn=words)`` would
    produce on the concatenated corpus. Profiles carry the (lang,
    gram, c) schema the scorer expects; priors the (lang, n_docs)
    frame for MAP scoring."""
    profiles = (
        catalog.table(f"{prefix}_lwords")
        .groupBy("batch_id", "label", "word")
        .agg(F.max("cnt").alias("cnt"))
        .groupBy("label", "word")
        .agg(F.sum("cnt").cast("long").alias("c"))
        .select(F.col("label").alias("lang"), F.col("word").alias("gram"), "c")
    )
    priors = (
        catalog.table(f"{prefix}_lpriors")
        .groupBy("batch_id", "label")
        .agg(F.max("n_docs").alias("n_docs"))
        .groupBy("label")
        .agg(F.sum("n_docs").cast("long").alias("n_docs"))
        .select(F.col("label").alias("lang"), "n_docs")
    )
    return profiles, priors


def pr_curve_from_state(
    catalog: WarehouseCatalog, prefix: str, docs: DataFrame
) -> DataFrame:
    """Serve the quality gate's precision/recall curve FROM the
    streaming training state (VERDICT r13 #8, completing the
    train-from-stream-state family): rebuild (profiles, priors) via
    :func:`quality_model_from_state` and run the SAME curve algebra as
    the batch ``doc_quality_pr_curve``
    (``corpus_queries.pr_curve_from_model`` — shared code, so the two
    paths cannot fork) over ``docs``'s holdout slice. When the sink
    ingested the batch query's training slice, the curve is bit-equal
    to the batch one across any number of micro-batches (pytest
    parity) — the threshold-selection artifact updates continuously as
    labeled word mass streams in, without rescanning ingested text."""
    from ..plans.corpus_queries import pr_curve_from_model

    profiles, priors = quality_model_from_state(catalog, prefix)
    return pr_curve_from_model(docs, profiles, priors)
