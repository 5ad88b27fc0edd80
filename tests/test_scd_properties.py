"""Property-based differential: the set-based SCD algebra must equal a
row-at-a-time replay of the reference's trigger semantics
(``creating-tables.sql:223-270``) on randomized batches — duplicate
keys, NULLs, no-op updates, arbitrary interleavings included."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _nsort(rows):
    """Sort tuples that may contain None."""
    return sorted(rows, key=lambda t: tuple((v is None, v) for v in t))
from pyspark.sql import functions as F

from data_warehouse_implementation_spark.plans import scd

AS_OF = "2024-05-05"
SENTINEL = scd.SCD2_SENTINEL

keys = st.integers(min_value=0, max_value=3)
vals = st.sampled_from(["a", "b", "c", None])

dim2_rows = st.lists(
    st.tuples(keys, vals), max_size=4, unique_by=lambda r: r[0]
)
batch_rows = st.lists(st.tuples(keys, vals), max_size=6)


def replay_scd2(dim, batch):
    """Per-row trigger replay: each insert first closes ALL rows for its
    key (no active guard), then appends an open row."""
    state = [
        {"key": k, "payload": p, "start": "2020-01-01", "end": SENTINEL, "active": True}
        for k, p in dim
    ]
    for k, p in batch:
        for s in state:
            if s["key"] == k:
                s["end"] = AS_OF
                s["active"] = False
        state.append({"key": k, "payload": p, "start": AS_OF, "end": SENTINEL, "active": True})
    return _nsort(
        (s["key"], s["payload"], s["start"], s["end"], s["active"]) for s in state
    )


def replay_scd3(dim, batch):
    """Per-row trigger replay: existing key + null-safe change -> update
    tracked/old/effective (row discarded); fresh key -> insert."""
    state = {
        k: {"tracked": v, "old": "", "eff": "2020-01-01", "narr": f"n{k}"} for k, v in dim
    }
    for i, (k, v) in enumerate(batch):
        if k in state:
            s = state[k]
            if s["tracked"] != v:  # null-safe: python != treats None correctly here
                s["old"] = s["tracked"]
                s["tracked"] = v
                s["eff"] = AS_OF
        else:
            state[k] = {"tracked": v, "old": "", "eff": AS_OF, "narr": f"i{i}"}
    return _nsort(
        (k, s["narr"], s["tracked"], s["old"], s["eff"]) for k, s in state.items()
    )


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(dim=dim2_rows, batch=batch_rows)
def test_scd2_matches_row_replay(spark, dim, batch):
    dim_df = spark.createDataFrame(
        [(k, p, "2020-01-01", SENTINEL, True) for k, p in dim],
        "key long, payload string, start_date string, end_date string, active boolean",
    ).withColumns(
        {c: F.col(c).cast("date") for c in ("start_date", "end_date")}
    )
    batch_df = spark.createDataFrame(
        [(k, p, i) for i, (k, p) in enumerate(batch)],
        "key long, payload string, seq long",
    )
    out = scd.scd2_apply(dim_df, batch_df, ["key"], as_of=AS_OF, order_col="seq")
    got = _nsort(
        (r.key, r.payload, str(r.start_date), str(r.end_date), r.active)
        for r in out.collect()
    )
    assert got == replay_scd2(dim, batch)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(dim=dim2_rows, batch=batch_rows)
def test_scd3_matches_row_replay(spark, dim, batch):
    dim_df = spark.createDataFrame(
        [(k, f"n{k}", v, "", "2020-01-01") for k, v in dim],
        "key long, narrative string, consent string, consent_old string,"
        " effective_date string",
    ).withColumn("effective_date", F.col("effective_date").cast("date"))
    batch_df = spark.createDataFrame(
        [(k, f"i{i}", v, i) for i, (k, v) in enumerate(batch)],
        "key long, narrative string, consent string, seq long",
    )
    out = scd.scd3_apply(
        dim_df, batch_df, ["key"], tracked_col="consent", as_of=AS_OF,
        order_col="seq", old_col="consent_old",
    )
    got = _nsort(
        (r.key, r.narrative, r.consent, r.consent_old, str(r.effective_date))
        for r in out.collect()
    )
    assert got == replay_scd3(dim, batch)


# ---------------------------------------------------------------------------
# Streaming x batch composition (VERDICT r7 #8): replaying a random key
# stream through the REAL foreachBatch sinks, split into >= 3
# micro-batches at random cut points (so within-batch duplicate keys
# land on BOTH sides of batch boundaries — the M3 quirk's streaming
# analog), must equal the one-shot batch application of the
# concatenated stream. Both reduce to the reference trigger's
# row-at-a-time replay, so sequential-batch and single-batch
# application are the same function of the row order.

split_points = st.lists(
    st.integers(min_value=1, max_value=7), min_size=2, max_size=2, unique=True
)
stream_rows = st.lists(st.tuples(keys, vals), min_size=3, max_size=8)


def _stage_batches(spark, tmp_path, rows, cuts):
    """Write the row stream as contiguous micro-batch parquet files
    (file mtimes force discovery order = stream order) and return the
    source dir plus the number of non-empty batches. ``tmp_path`` must
    be unique PER HYPOTHESIS EXAMPLE (pytest's tmp_path fixture is per
    test, not per example)."""
    import os

    src = os.path.join(str(tmp_path), "scd_stream_src")
    os.makedirs(src)
    bounds = sorted({c for c in cuts if c < len(rows)} | {len(rows)})
    batches, lo = [], 0
    for hi in bounds:
        if rows[lo:hi]:
            batches.append((lo, rows[lo:hi]))
        lo = hi
    for n, (lo, part) in enumerate(batches):
        p = os.path.join(src, f"b{n}")
        spark.createDataFrame(
            [(k, f"i{lo + i}", v, lo + i) for i, (k, v) in enumerate(part)],
            "key long, narrative string, consent string, seq long",
        ).coalesce(1).write.parquet(p)
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (1_700_000_000 + 60 * n,) * 2)
    return src, len(batches)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(dim=dim2_rows, rows=stream_rows, cuts=split_points)
def test_streaming_scd2_matches_one_shot_batch(spark, dim, rows, cuts):
    import os
    import tempfile

    from data_warehouse_implementation_spark import streaming
    from data_warehouse_implementation_spark.sources.catalog import WarehouseCatalog

    tmp_path = tempfile.mkdtemp(prefix="scd2_stream_")
    src, _ = _stage_batches(spark, tmp_path, rows, cuts)
    cat = WarehouseCatalog(spark, os.path.join(str(tmp_path), "wh2"))
    dim_df = spark.createDataFrame(
        [(k, f"n{k}", "2020-01-01", SENTINEL, True) for k, p in dim],
        "key long, narrative string, start_date string, end_date string, active boolean",
    ).withColumns({c: F.col(c).cast("date") for c in ("start_date", "end_date")})
    cat.write("dim2", dim_df)

    stream = (
        spark.readStream.schema("key long, narrative string, consent string, seq long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    ).drop("consent")
    q = streaming.incremental_scd2_sink(
        stream, cat, "dim2", ["key"], order_col="seq", as_of=AS_OF,
        checkpoint=os.path.join(str(tmp_path), "ckpt2"),
    )
    q.awaitTermination()

    one_shot = scd.scd2_apply(
        dim_df,
        spark.createDataFrame(
            [(k, f"i{i}", i) for i, (k, v) in enumerate(rows)],
            "key long, narrative string, seq long",
        ),
        ["key"],
        as_of=AS_OF,
        order_col="seq",
    )
    key = lambda r: (r.key, r.narrative, str(r.start_date), str(r.end_date), r.active)  # noqa: E731
    got = _nsort(map(key, cat.table("dim2").collect()))
    want = _nsort(map(key, one_shot.collect()))
    import shutil

    shutil.rmtree(tmp_path, ignore_errors=True)
    assert got == want


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(dim=dim2_rows, rows=stream_rows, cuts=split_points)
def test_streaming_scd3_matches_one_shot_batch(spark, dim, rows, cuts):
    import os
    import tempfile

    from data_warehouse_implementation_spark import streaming
    from data_warehouse_implementation_spark.sources.catalog import WarehouseCatalog

    tmp_path = tempfile.mkdtemp(prefix="scd3_stream_")
    src, _ = _stage_batches(spark, tmp_path, rows, cuts)
    cat = WarehouseCatalog(spark, os.path.join(str(tmp_path), "wh3"))
    dim_df = spark.createDataFrame(
        [(k, f"n{k}", v, "", "2020-01-01") for k, v in dim],
        "key long, narrative string, consent string, consent_old string,"
        " effective_date string",
    ).withColumn("effective_date", F.col("effective_date").cast("date"))
    cat.write("dim3", dim_df)

    stream = (
        spark.readStream.schema("key long, narrative string, consent string, seq long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = streaming.incremental_scd3_sink(
        stream, cat, "dim3", ["key"], tracked_col="consent", order_col="seq",
        as_of=AS_OF, checkpoint=os.path.join(str(tmp_path), "ckpt3"),
        old_col="consent_old",
        # explicit string sentinel: parity target is scd3_apply's
        # batch default ("") — the SINK default is the typed null
        # (covered by the bootstrap test below)
        fresh_old="",
    )
    q.awaitTermination()

    one_shot = scd.scd3_apply(
        dim_df,
        spark.createDataFrame(
            [(k, f"i{i}", v, i) for i, (k, v) in enumerate(rows)],
            "key long, narrative string, consent string, seq long",
        ),
        ["key"],
        tracked_col="consent",
        as_of=AS_OF,
        order_col="seq",
        old_col="consent_old",
    )
    key = lambda r: (r.key, r.narrative, r.consent, r.consent_old, str(r.effective_date))  # noqa: E731
    got = _nsort(map(key, cat.table("dim3").collect()))
    want = _nsort(map(key, one_shot.collect()))
    import shutil

    shutil.rmtree(tmp_path, ignore_errors=True)
    assert got == want


def test_streaming_scd3_bootstrap_nonstring_tracked_col(spark):
    """ADVICE r8: the sink's empty-table bootstrap hardcoded the old
    column as StringType and the effective column as 'effective_date',
    so a LONG tracked_col (or a custom effective column name) broke
    scd3_apply on the very first micro-batch. The bootstrap must derive
    the old column's type from the tracked column and honour
    effective_col/fresh_old."""
    import os
    import shutil
    import tempfile

    from data_warehouse_implementation_spark import streaming
    from data_warehouse_implementation_spark.sources.catalog import WarehouseCatalog

    tmp_path = tempfile.mkdtemp(prefix="scd3_boot_")
    try:
        src = os.path.join(tmp_path, "src")
        spark.createDataFrame(
            [(1, 100, 1), (1, 200, 2), (2, 300, 3)],
            "key long, quota long, seq long",
        ).write.parquet(src)
        cat = WarehouseCatalog(spark, os.path.join(tmp_path, "wh"))
        stream = spark.readStream.schema("key long, quota long, seq long").parquet(src)
        q = streaming.incremental_scd3_sink(
            stream, cat, "dim_boot", ["key"], tracked_col="quota",
            order_col="seq", as_of=AS_OF,
            checkpoint=os.path.join(tmp_path, "ckpt"),
            # DEFAULT fresh_old: must be the typed null (ADVICE r9 —
            # the old "" default made this long column drift to string)
            old_col="quota_old", effective_col="valid_from",
        )
        q.awaitTermination()
        out = {r.key: (r.quota, r.quota_old, str(r.valid_from)) for r in cat.table("dim_boot").collect()}
        # key 1: inserted at 100 then updated to 200 (old <- 100);
        # key 2: fresh insert keeps the null fresh_old sentinel
        assert out == {1: (200, 100, AS_OF), 2: (300, None, AS_OF)}
        assert dict(cat.table("dim_boot").dtypes)["quota_old"] == "bigint"
    finally:
        shutil.rmtree(tmp_path, ignore_errors=True)


def test_streaming_scd2_redelivery_is_idempotent(spark):
    """Round-10 review: scd2_apply is a FOLD that versions
    unconditionally, so redelivering an already-applied micro-batch
    (foreachBatch's at-least-once contract — the stream commit can be
    lost after the sink ran) used to inject a spurious degenerate
    version per key. The sink now snapshots its post-state per
    batch_id and republishes on redelivery. A single-batch stream
    re-run under a FRESH checkpoint IS exactly that redelivery
    (batch_id 0 again, same data): the dimension must be unchanged."""
    import os
    import shutil
    import tempfile

    from data_warehouse_implementation_spark import streaming
    from data_warehouse_implementation_spark.sources.catalog import WarehouseCatalog

    tmp_path = tempfile.mkdtemp(prefix="scd2_replay_")
    try:
        src = os.path.join(tmp_path, "src")
        spark.createDataFrame(
            [(1, "a", 1), (2, "b", 2)], "key long, narrative string, seq long"
        ).coalesce(1).write.parquet(src)
        cat = WarehouseCatalog(spark, os.path.join(tmp_path, "wh"))
        dim_df = spark.createDataFrame(
            [(1, "old", "2020-01-01", SENTINEL, True)],
            "key long, narrative string, start_date string, end_date string, active boolean",
        ).withColumns({c: F.col(c).cast("date") for c in ("start_date", "end_date")})
        cat.write("dim2r", dim_df)

        def run(ckpt):
            stream = spark.readStream.schema(
                "key long, narrative string, seq long"
            ).parquet(src)
            q = streaming.incremental_scd2_sink(
                stream, cat, "dim2r", ["key"], order_col="seq", as_of=AS_OF,
                checkpoint=os.path.join(tmp_path, ckpt),
            )
            q.awaitTermination()

        run("ckpt_a")
        key = lambda r: (r.key, r.narrative, str(r.start_date), str(r.end_date), r.active)  # noqa: E731
        first = _nsort(map(key, cat.table("dim2r").collect()))
        # sanity: the fold DID version (old row closed, new active rows)
        assert sum(1 for k in first if k[4]) == 2 and len(first) == 3
        run("ckpt_b")  # redelivery of batch 0
        second = _nsort(map(key, cat.table("dim2r").collect()))
        assert second == first, "redelivered batch must not re-fold the dimension"
    finally:
        shutil.rmtree(tmp_path, ignore_errors=True)


def test_streaming_scd2_batch_id_collision_with_new_data_raises(spark):
    """ADVICE r10: redelivery detection keyed on batch_id alone cannot
    tell a genuine replay from a NEW stream under a fresh checkpoint
    whose first batch id (0) collides with the recorded snapshot —
    treating the collision as a replay silently republishes the OLD
    state and drops the new batch. The sink now fingerprints batch
    content alongside the batch id: same id + same rows republishes
    (previous test), same id + DIFFERENT rows fails loudly, naming the
    post-table/checkpoint contract."""
    import os
    import shutil
    import tempfile

    import pytest

    from data_warehouse_implementation_spark import streaming
    from data_warehouse_implementation_spark.sources.catalog import WarehouseCatalog

    tmp_path = tempfile.mkdtemp(prefix="scd2_collide_")
    try:
        cat = WarehouseCatalog(spark, os.path.join(tmp_path, "wh"))

        def run(src_name, rows, ckpt):
            src = os.path.join(tmp_path, src_name)
            spark.createDataFrame(
                rows, "key long, narrative string, seq long"
            ).coalesce(1).write.parquet(src)
            stream = spark.readStream.schema(
                "key long, narrative string, seq long"
            ).parquet(src)
            q = streaming.incremental_scd2_sink(
                stream, cat, "dim2c", ["key"], order_col="seq", as_of=AS_OF,
                checkpoint=os.path.join(tmp_path, ckpt),
            )
            q.awaitTermination()

        run("src_a", [(1, "a", 1)], "ckpt_a")
        assert cat.table("dim2c").count() == 1
        # a DIFFERENT batch under a fresh checkpoint also gets batch_id
        # 0 — must raise, never silently drop the new rows
        with pytest.raises(Exception, match="DIFFERENT content"):
            run("src_b", [(2, "b", 2)], "ckpt_b")
        # the recorded dimension is untouched by the failed stream
        assert {r.key for r in cat.table("dim2c").collect()} == {1}
    finally:
        shutil.rmtree(tmp_path, ignore_errors=True)


def test_streaming_scd2_legacy_post_table_warns_on_id_only_match(spark):
    """ADVICE r11 #3: a post table written BEFORE content
    fingerprinting exists (no ``_batch_fp`` column) silently degrades
    to batch-id-only redelivery detection — the exact
    fresh-checkpoint collision hazard the fingerprint fixes persists
    for upgraded deployments until a new batch rewrites the snapshot.
    The sink must WARN on an id-only match so operators know
    protection is not yet active (while still republishing
    idempotently, which is correct for a true redelivery)."""
    import os
    import shutil
    import tempfile
    import warnings

    from data_warehouse_implementation_spark import streaming
    from data_warehouse_implementation_spark.sources.catalog import WarehouseCatalog

    tmp_path = tempfile.mkdtemp(prefix="scd2_legacy_")
    try:
        cat = WarehouseCatalog(spark, os.path.join(tmp_path, "wh"))

        def run(ckpt):
            stream = spark.readStream.schema(
                "key long, narrative string, seq long"
            ).parquet(os.path.join(tmp_path, "src"))
            q = streaming.incremental_scd2_sink(
                stream, cat, "dim2l", ["key"], order_col="seq", as_of=AS_OF,
                checkpoint=os.path.join(tmp_path, ckpt),
            )
            q.awaitTermination()

        spark.createDataFrame(
            [(1, "a", 1)], "key long, narrative string, seq long"
        ).coalesce(1).write.parquet(os.path.join(tmp_path, "src"))
        run("ckpt_a")
        # simulate a pre-fingerprint deployment: strip _batch_fp from
        # the recorded post snapshot
        post = "dim2l__post"
        assert "_batch_fp" in cat.table(post).columns
        cat.replace(post, cat.table(post).drop("_batch_fp"), internal=True)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            run("ckpt_b")  # same content, fresh checkpoint: id-only match
        msgs = [str(w.message) for w in caught if issubclass(w.category, RuntimeWarning)]
        assert any("_batch_fp" in m and "dim2l__post" in m for m in msgs), msgs
        # the republish itself stays idempotent
        assert {r.key for r in cat.table("dim2l").collect()} == {1}
    finally:
        shutil.rmtree(tmp_path, ignore_errors=True)
