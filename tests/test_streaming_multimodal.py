"""Streaming extension + multimodal plumbing tests (SURVEY §2.10 +
brief requirements). Streaming correctness = batch/stream parity: the
streaming windowed aggregate must equal its batch twin on the same
input."""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_warehouse_implementation_spark import streaming
from data_warehouse_implementation_spark.operators import multimodal
from data_warehouse_implementation_spark.plans.ingest_queries import _event_ts
from data_warehouse_implementation_spark.sources.catalog import WarehouseCatalog

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TMP = os.path.join(REPO, ".cache", "stream_tests")


def _batch_events(spark, path):
    """Batch oracle read with ts normalized the same schema-adaptive way
    as the library (nanos-long OR native timestamp testdata)."""
    df = spark.read.parquet(path)
    return df.withColumn("ts", _event_ts(df))


@pytest.fixture()
def tmp_dir():
    shutil.rmtree(TMP, ignore_errors=True)
    os.makedirs(TMP)
    yield TMP
    shutil.rmtree(TMP, ignore_errors=True)


def _stage_events(spark, tmp_dir):
    src = os.path.join(tmp_dir, "events_src")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").write.parquet(src)
    return src


def test_stream_window_agg_matches_batch(spark, tmp_dir):
    src = _stage_events(spark, tmp_dir)
    stream = streaming.stream_events(spark, src)
    assert stream.isStreaming
    agg = streaming.tumbling_counts(stream)
    streaming.run_to_memory(agg, "stream_counts", output_mode="complete")
    got = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        for r in spark.table("stream_counts").collect()
    }
    batch = (
        _batch_events(spark, src)
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )
    want = {
        (r.hour, r.event_type): (r.n_events, r.total_value) for r in batch.collect()
    }
    assert got == want and len(got) > 0


def test_stateful_sessionize_matches_batch(spark, tmp_dir):
    """applyInPandasWithState sessionizer == batch lag+cumsum sessionizer.

    Events are replayed as three time-ordered chunk files (micro-batches
    via maxFilesPerTrigger=1) plus a far-future sentinel event that
    advances the watermark past every real session, firing the
    event-time timeouts that flush the open sessions."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_warehouse_implementation_spark.plans import ingest_queries

    tbl = pq.read_table("/root/testdata/sf0.001/events.parquet")
    pdf = tbl.to_pandas().sort_values("ts").reset_index(drop=True)
    src = os.path.join(tmp_dir, "sess_src")
    os.makedirs(src)
    n = len(pdf)
    cuts = [0, n // 3, 2 * n // 3, n]
    paths = []
    for i in range(3):
        chunk = pdf.iloc[cuts[i] : cuts[i + 1]]
        p = os.path.join(src, f"chunk{i}.parquet")
        pq.write_table(pa.Table.from_pandas(chunk, preserve_index=False), p)
        paths.append(p)
    sentinel = pdf.iloc[[n - 1]].copy()
    sentinel["user_id"] = -1
    sentinel["event_id"] = -1
    if pd.api.types.is_integer_dtype(sentinel["ts"]):  # nanos-long generation
        sentinel["ts"] = sentinel["ts"] + 30 * 86400 * 1_000_000_000
    else:
        # keep the source resolution — a Timedelta add can upcast us->ns,
        # which parquet would then write as TIMESTAMP(NANOS) and Spark
        # would read as a different type than the other chunks
        unit = sentinel["ts"].dtype
        sentinel["ts"] = (sentinel["ts"] + pd.Timedelta(days=30)).astype(unit)
    p = os.path.join(src, "chunk3.parquet")
    pq.write_table(pa.Table.from_pandas(sentinel, preserve_index=False), p)
    paths.append(p)
    for i, p in enumerate(paths):  # force discovery order = time order
        os.utime(p, (1_700_000_000 + 60 * i, 1_700_000_000 + 60 * i))

    schema, is_nanos = streaming.events_stream_schema(spark, src)
    stream = streaming.normalize_event_ts(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        is_nanos,
    )
    sessions = streaming.sessionize_stateful(stream)
    streaming.run_to_memory(sessions, "stream_sessions", output_mode="append")
    got = {
        (r.user_id, r.session_seq): (r.n_events, r.session_start, r.session_value)
        for r in spark.table("stream_sessions").filter("user_id >= 0").collect()
    }
    batch = ingest_queries.events_sessionize(
        {"events": spark.read.parquet("/root/testdata/sf0.001/events.parquet")}
    )
    want = {
        (r.user_id, r.session_seq): (r.n_events, r.session_start, r.session_value)
        for r in batch.collect()
    }
    assert len(got) > 0 and got == want


def test_stateful_sessionize_handles_late_within_watermark_event(spark, tmp_dir):
    """Round-10 review: a later micro-batch delivering an event OLDER
    than the open session's last timestamp (but inside the watermark)
    must extend the open session BACKWARD — start min-updated, the
    session frontier never moving backward — so a following in-order
    event does not spuriously split the session. The batch twin's
    time-sorted fold is the truth: one session of 3 events starting at
    the late event's timestamp."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_warehouse_implementation_spark.plans import ingest_queries

    base = pd.Timestamp("2024-01-01 10:00:00")
    batches = [
        [(7, 1, base, 1.0)],
        [
            (7, 2, base - pd.Timedelta(minutes=10), 2.0),   # late, within gap+watermark
            (7, 3, base + pd.Timedelta(minutes=25), 3.0),   # mis-split if the frontier moved back
        ],
        [(-1, -1, base + pd.Timedelta(days=30), 0.0)],      # watermark flush sentinel
    ]
    src = os.path.join(tmp_dir, "late_src")
    os.makedirs(src)
    frames = []
    for i, rows in enumerate(batches):
        pdf = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "value"])
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        frames.append(pdf)
        p = os.path.join(src, f"b{i}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), p)
        os.utime(p, (1_700_000_000 + 60 * i,) * 2)

    stream = (
        spark.readStream.schema("user_id long, event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    streaming.run_to_memory(
        streaming.sessionize_stateful(stream), "late_sessions", output_mode="append"
    )
    got = {
        (r.user_id, r.session_seq): (r.n_events, r.session_start, r.session_value)
        for r in spark.table("late_sessions").filter("user_id >= 0").collect()
    }
    all_df = spark.createDataFrame(pd.concat(frames[:2]))
    want = {
        (r.user_id, r.session_seq): (r.n_events, r.session_start, r.session_value)
        for r in ingest_queries.events_sessionize({"events": all_df}).collect()
    }
    assert got == want
    assert len(got) == 1  # ONE session: the late event merged, not split
    (n_events, session_start, session_value) = next(iter(got.values()))
    assert n_events == 3 and session_value == 6.0
    assert session_start.startswith("2024-01-01 09:50:00")


def test_stateful_sessionize_late_event_bridges_gap_split_sessions(spark, tmp_dir):
    """ADVICE r10: two same-batch events more than a gap apart used to
    EAGERLY emit the first session, so a later in-watermark event
    falling between them (within gap of both) merged everything into
    one session in the batch twin while the stream had already emitted
    two. Emission is now deferred until the watermark passes
    ``last + gap``: the bridging event collapses the two pending
    sessions and the stream emits the batch twin's single session."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_warehouse_implementation_spark.plans import ingest_queries

    base = pd.Timestamp("2024-01-01 10:00:00")
    batches = [
        [
            (7, 1, base, 1.0),
            (7, 2, base + pd.Timedelta(minutes=50), 2.0),  # same-batch gap split
        ],
        # watermark after batch 1 = base+20min; this event survives and
        # sits within the 30-min gap of BOTH pending sessions
        [(7, 3, base + pd.Timedelta(minutes=25), 4.0)],
        [(-1, -1, base + pd.Timedelta(days=30), 0.0)],     # watermark flush sentinel
    ]
    src = os.path.join(tmp_dir, "bridge_src")
    os.makedirs(src)
    frames = []
    for i, rows in enumerate(batches):
        pdf = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "value"])
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        frames.append(pdf)
        p = os.path.join(src, f"b{i}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), p)
        os.utime(p, (1_700_000_000 + 60 * i,) * 2)

    stream = (
        spark.readStream.schema("user_id long, event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    streaming.run_to_memory(
        streaming.sessionize_stateful(stream), "bridge_sessions", output_mode="append"
    )
    got = {
        (r.user_id, r.session_seq): (r.n_events, r.session_start, r.session_value)
        for r in spark.table("bridge_sessions").filter("user_id >= 0").collect()
    }
    all_df = spark.createDataFrame(pd.concat(frames[:2]))
    want = {
        (r.user_id, r.session_seq): (r.n_events, r.session_start, r.session_value)
        for r in ingest_queries.events_sessionize({"events": all_df}).collect()
    }
    assert got == want
    assert len(got) == 1  # ONE merged session, not an eager split pair
    (n_events, session_start, session_value) = next(iter(got.values()))
    assert n_events == 3 and session_value == 7.0
    assert session_start.startswith("2024-01-01 10:00:00")


def test_incremental_scd2_over_two_microbatches(spark, tmp_dir):
    cat = WarehouseCatalog(spark, os.path.join(tmp_dir, "wh"))
    src = os.path.join(tmp_dir, "scd_src")
    os.makedirs(src)
    # micro-batch 1: two fresh keys
    spark.createDataFrame(
        [(1, "a1", 1), (2, "b1", 2)], "key long, payload string, seq long"
    ).write.parquet(os.path.join(src, "b1"))
    stream = (
        spark.readStream.schema("key long, payload string, seq long").parquet(src + "/*")
    )
    q = streaming.incremental_scd2_sink(
        stream, cat, "dim", ["key"], order_col="seq", as_of="2024-01-01",
        checkpoint=os.path.join(tmp_dir, "ckpt"),
    )
    q.awaitTermination()
    assert cat.table("dim").filter("active").count() == 2

    # micro-batch 2: update key 1, add key 3
    spark.createDataFrame(
        [(1, "a2", 3), (3, "c1", 4)], "key long, payload string, seq long"
    ).write.parquet(os.path.join(src, "b2"))
    q = streaming.incremental_scd2_sink(
        stream, cat, "dim", ["key"], order_col="seq", as_of="2024-02-01",
        checkpoint=os.path.join(tmp_dir, "ckpt"),
    )
    q.awaitTermination()
    dim = cat.table("dim")
    active = {(r.key, r.payload) for r in dim.filter("active").collect()}
    assert active == {(1, "a2"), (2, "b1"), (3, "c1")}
    closed = dim.filter("NOT active").collect()
    assert {(r.key, r.payload, str(r.end_date)) for r in closed} == {
        (1, "a1", "2024-02-01")
    }


def test_multimodal_feature_extraction_plumbing(spark):
    rows = [
        (1, "image", bytearray(b"\x01\x02\x03\x04\x05\x06\x07\x08\x09\x0a"), (2, 5, None)),
        (2, "audio", bytearray(b"\xff\x00\xff\x00"), (None, None, 44100)),
        (3, "image", None, (0, 0, None)),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.extract_features(df, dim=4)
    assert out.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,n_bytes:bigint,checksum:bigint,"
        "feature:array<double>>"
    )
    got = {r.media_id: r for r in out.collect()}
    assert got[1].n_bytes == 10 and got[1].checksum == sum(range(1, 11))
    assert len(got[1].feature) == 4
    assert got[3].n_bytes == 0 and got[3].feature == [0.0, 0.0, 0.0, 0.0]
    # determinism across runs
    again = {r.media_id: r.feature for r in multimodal.extract_features(df, dim=4).collect()}
    assert {k: v.feature for k, v in got.items()} == again


def test_multimodal_resize_plumbing(spark):
    rows = [
        (1, "image", bytearray(range(100)), (10, 10, None)),
        (2, "image", bytearray(b"\x05"), (1, 1, None)),
        (3, "image", None, (0, 0, None)),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.resize_images(df, width=4, height=3)
    got = {r.media_id: r for r in out.collect()}
    assert len(got[1].payload) == 12  # exactly width*height bytes
    assert len(got[2].payload) == 12  # smaller source cycles
    assert got[2].payload == b"\x05" * 12
    assert got[3].payload == b""
    assert got[1].meta.width == 4 and got[1].meta.height == 3
    # pure function of input bytes: stable across runs
    again = {r.media_id: bytes(r.payload) for r in out.collect()}
    assert {k: bytes(v.payload) for k, v in got.items()} == again


def test_multimodal_frame_sampling_explodes_rows(spark):
    payload = bytearray(range(256)) * 4  # 1024 bytes = 4 frames of 256
    rows = [
        (1, "video", payload, (None, None, None)),
        (2, "video", bytearray(b"xy"), (None, None, None)),  # 1 short frame
        (3, "video", None, (None, None, None)),  # no frames
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.sample_frames(df, frame_bytes=256, every_nth=2).collect()
    by_media = {}
    for r in out:
        by_media.setdefault(r.media_id, []).append(r)
    assert sorted(r.frame_idx for r in by_media[1]) == [0, 2]  # every 2nd of 4
    assert all(r.n_bytes == 256 for r in by_media[1])
    assert [r.n_bytes for r in by_media[2]] == [2]
    assert 3 not in by_media


def _ppm_bytes(w: int, h: int, pixels: bytes) -> bytearray:
    assert len(pixels) == w * h * 3
    return bytearray(b"P6\n# test image\n%d %d\n255\n" % (w, h) + pixels)


def _bmp_bytes(w: int, h: int, rgb_rows: list[list[tuple[int, int, int]]]) -> bytearray:
    """Build a real uncompressed 24-bit bottom-up BMP (rows 4-byte padded,
    BGR byte order) — the format decode_images must undo."""
    import struct

    row_bytes = (w * 3 + 3) & ~3
    pad = b"\x00" * (row_bytes - w * 3)
    body = b"".join(
        b"".join(bytes((bl, g, r)) for (r, g, bl) in row) + pad
        for row in reversed(rgb_rows)  # bottom-up storage
    )
    data_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", data_off + len(body), 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return bytearray(header + info + body)


def test_decode_images_real_ppm_and_bmp(spark):
    """decode_images is a REAL codec for PPM/BMP: exact dimensions and
    exact RGB pixel bytes back out of genuine on-disk formats."""
    ppm_px = bytes(range(2 * 2 * 3))  # 2x2 RGB, distinct byte per channel
    rgb = [[(255, 0, 0), (0, 255, 0), (0, 0, 255)],
           [(10, 20, 30), (40, 50, 60), (70, 80, 90)]]  # 3x2 image, row-major
    rows = [
        (1, "image", _ppm_bytes(2, 2, ppm_px), (2, 2, None)),
        (2, "image", _bmp_bytes(3, 2, rgb), (3, 2, None)),
        (3, "image", bytearray(b"not an image"), (None, None, None)),
        (4, "image", None, (None, None, None)),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.decode_images(df)
    assert out.schema.simpleString() == (
        "struct<media_id:bigint,width:int,height:int,channels:int,"
        "pixels:binary,codec:string>"
    )
    got = {r.media_id: r for r in out.collect()}
    # PPM: header stripped, raw RGB block returned verbatim
    assert got[1].width == 2 and got[1].height == 2 and got[1].channels == 3
    assert bytes(got[1].pixels) == ppm_px and got[1].codec == "ppm"
    # BMP: padding stripped, bottom-up flipped, BGR swapped to RGB
    assert got[2].width == 3 and got[2].height == 2 and got[2].channels == 3
    want = bytes(v for row in rgb for px in row for v in px)
    assert bytes(got[2].pixels) == want and got[2].codec == "bmp"
    # undecodable payloads are filtered, not fatal, in the default mode
    assert 3 not in got and 4 not in got


@pytest.mark.skipif(
    not multimodal.HAVE_IMAGE_CODEC,
    reason="Pillow not importable in this environment — built-in PPM/BMP "
    "tier is oracle-proven; this test keeps the Pillow tier equally "
    "proven wherever Pillow exists",
)
def test_decode_images_pillow_tier_roundtrip(spark):
    """Tier parity: the SAME deterministic pixel formula pushed through
    a Pillow-encoded PNG must come back byte-identical via the 'pillow'
    codec path, exactly as the PPM/BMP tier returns it — so both tiers
    of decode_images stay proven, not just the built-in one."""
    import io

    import numpy as np
    from PIL import Image

    w, h = 5, 3
    arr = np.array(
        [[((x * 7 + y * 13) % 256, (x * 3) % 256, (y * 11) % 256) for x in range(w)] for y in range(h)],
        dtype=np.uint8,
    )
    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, format="PNG")
    rows = [
        (21, "image", bytearray(buf.getvalue()), (w, h, None)),
        # control: a PPM of the same pixels must produce identical bytes
        # through the built-in tier
        (22, "image", _ppm_bytes(w, h, arr.tobytes()), (w, h, None)),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r.media_id: r for r in multimodal.decode_images(df).collect()}
    assert got[21].codec == "pillow" and got[22].codec == "ppm"
    assert (got[21].width, got[21].height, got[21].channels) == (w, h, 3)
    assert bytes(got[21].pixels) == arr.tobytes()
    assert bytes(got[21].pixels) == bytes(got[22].pixels)


def test_decode_images_strict_raises_on_undecodable(spark):
    rows = [(7, "image", bytearray(b"\x89PNG\r\n garbage"), (None, None, None))]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    if multimodal.HAVE_IMAGE_CODEC:
        pytest.skip("Pillow present: PNG routes to the real codec tier")
    with pytest.raises(Exception, match="media_id=7"):
        multimodal.decode_images(df, strict=True).collect()


def test_decode_images_feeds_feature_extraction(spark):
    """Decoded pixel output plugs straight back into the downstream
    mapInPandas stages (decode -> featurize), proving the stage contract
    composes."""
    ppm_px = bytes((i * 7) % 256 for i in range(4 * 3 * 3))
    df = spark.createDataFrame(
        [(1, "image", _ppm_bytes(4, 3, ppm_px), (4, 3, None))],
        multimodal.MEDIA_SCHEMA,
    )
    decoded = multimodal.decode_images(df).select(
        "media_id", F.lit("image").alias("kind"),
        F.col("pixels").alias("payload"),
        F.struct(
            F.col("width"), F.col("height"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )
    feats = {r.media_id: r for r in multimodal.extract_features(decoded, dim=4).collect()}
    assert feats[1].n_bytes == len(ppm_px)
    assert feats[1].checksum == sum(ppm_px) % 2_147_483_647


def test_stream_dedup_matches_batch_distinct(spark, tmp_dir):
    """dropDuplicatesWithinWatermark on a doubled event stream ==
    batch distinct on event_id (at-least-once delivery collapsed)."""
    src = os.path.join(tmp_dir, "dup_src")
    base = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    base.unionAll(base).write.parquet(src)  # every event delivered twice

    stream = streaming.stream_events(spark, src)
    deduped = streaming.dedup_stream(stream, keys=["event_id"])
    streaming.run_to_memory(deduped, "stream_dedup", output_mode="append")
    got = spark.table("stream_dedup")
    n_base = base.count()
    assert got.count() == n_base  # duplicates collapsed ...
    assert got.select("event_id").distinct().count() == n_base  # ... one per key
    # and the surviving rows are real events (spot-check a full row)
    one = got.orderBy("event_id").limit(1).collect()[0]
    orig = base.orderBy("event_id").limit(1).collect()[0]
    assert one.event_id == orig.event_id and one.user_id == orig.user_id


def test_stream_static_enrichment_matches_batch_join(spark, tmp_dir):
    src = _stage_events(spark, tmp_dir)
    dim = spark.range(200).select(
        F.col("id").alias("user_id"),
        F.when(F.col("id") % 3 == 0, "gold").otherwise("basic").alias("tier"),
    )
    stream = streaming.stream_events(spark, src)
    enriched = streaming.enrich_stream(stream, dim, on="user_id").groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    streaming.run_to_memory(enriched, "stream_enriched", output_mode="complete")
    got = {r.tier: r.n_events for r in spark.table("stream_enriched").collect()}
    batch = (
        spark.read.parquet(src)
        .join(dim, on="user_id", how="left")
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    want = {r.tier: r.n_events for r in batch.collect()}
    assert got == want and len(got) == 2


def test_stream_stream_interval_join_matches_batch(spark, tmp_dir):
    src = _stage_events(spark, tmp_dir)
    stream = streaming.stream_events(spark, src)
    purchases = stream.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    views = streaming.stream_events(spark, src).filter(
        F.col("event_type") == "view"
    ).select(F.col("user_id").alias("v_user"), F.col("event_id").alias("view_id"), "ts")
    joined = streaming.interval_join_stream(
        purchases.withColumnRenamed("user_id", "user_id"),
        views.withColumnRenamed("v_user", "user_id"),
        key="user_id",
        interval_seconds=3600,
    ).select("l.user_id", "purchase_id", "view_id")
    streaming.run_to_memory(joined, "stream_attrib", output_mode="append")
    got = {
        (r.user_id, r.purchase_id, r.view_id)
        for r in spark.table("stream_attrib").collect()
    }
    ev = _batch_events(spark, src)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    batch = p.join(
        v,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 3600 SECONDS"))
        & (F.col("v_ts") <= F.col("p_ts")),
    )
    want = {(r.user_id, r.purchase_id, r.view_id) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_incremental_dedup_sink_admits_novel_rejects_dups(spark, tmp_dir):
    """Two micro-batches of documents: batch 2 contains a near-copy of
    an admitted batch-1 doc (one word changed) plus a novel doc. The
    copy must be flagged with its corpus match; novel docs admitted and
    added to the state tables."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    src = os.path.join(tmp_dir, "docs_src")
    os.makedirs(src)
    b1 = [(1, base), (2, "completely different words about spark engines and shuffles here")]
    b2 = [(10, base.replace("kappa", "KAPPA2")), (11, "yet another novel document with fresh content words")]
    for i, rows in enumerate([b1, b2]):
        p = os.path.join(src, f"b{i}.parquet")
        pq.write_table(
            pa.table({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}), p
        )
        os.utime(p, (1_700_000_000 + 60 * i, 1_700_000_000 + 60 * i))

    cat = WarehouseCatalog(spark, os.path.join(tmp_dir, "dedup_wh"))

    def run(ckpt):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = streaming.incremental_dedup_sink(
            stream, cat, "corpus", checkpoint=os.path.join(tmp_dir, ckpt)
        )
        q.awaitTermination()

    run("ckpt_dedup")
    v = {r.doc_id: r for r in cat.table("corpus_verdicts").collect()}
    assert set(v) == {1, 2, 10, 11}
    assert not v[1].is_dup and not v[2].is_dup and not v[11].is_dup
    assert v[10].is_dup and v[10].matched_corpus_id == 1
    assert v[10].jaccard >= 0.5
    # state holds only admitted docs
    state_docs = {r.doc_id for r in cat.table("corpus_tids").select("doc_id").distinct().collect()}
    assert state_docs == {1, 2, 11}

    # replay idempotence: a fresh checkpoint re-delivers both batches;
    # batch_id-keyed delete-first must leave state and verdicts unchanged
    before_state = sorted(
        tuple(r) for r in cat.table("corpus_tids").collect()
    )
    before_verdicts = sorted(tuple(r) for r in cat.table("corpus_verdicts").collect())
    run("ckpt_dedup_replay")
    assert sorted(tuple(r) for r in cat.table("corpus_tids").collect()) == before_state
    assert (
        sorted(tuple(r) for r in cat.table("corpus_verdicts").collect())
        == before_verdicts
    )


def test_curation_admission_sink_parity_with_batch(spark, tmp_dir):
    """VERDICT r8 #8 — the incremental curation ladder: two micro-
    batches through quality filter → benchmark decontamination →
    near-dup admission must (a) reject each doc at the right stage,
    including a CROSS-BATCH near-duplicate of an admitted batch-1 doc,
    (b) admit a near-copy of a CONTAMINATED doc (rejected docs never
    enter the corpus state, so they cannot shadow clean arrivals), and
    (c) equal the one-shot batch admission over the concatenated
    stream, computed from the SAME operator expressions. Replaying
    under a fresh checkpoint must leave state and verdicts unchanged."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_warehouse_implementation_spark.operators import dedup
    from data_warehouse_implementation_spark.operators import text as text_ops

    base = (
        "the quick brown fox jumps over a lazy dog and the cat sits "
        "in the warm sun of a quiet afternoon to rest and dream"
    )
    base2 = (
        "a measured essay about the craft of writing and the value of "
        "revision in the long slow work of thought and expression"
    )
    bench_text = (
        "the secret benchmark passage lives here with its own special "
        "eight gram signature of unusual words in a row"
    )
    b1 = [
        (1, base),                       # admitted
        (2, "too short"),                # rejected: quality
        (3, base2 + " " + bench_text),   # rejected: contaminated
    ]
    b2 = [
        (10, base.replace("fox", "wolf")),  # rejected: cross-batch near-dup of 1
        (11, (
            "an unrelated report on the state of the harvest and the "
            "price of grain in the markets of the eastern provinces"
        )),                              # admitted
        (12, base2),                     # admitted: near-copy of REJECTED 3
    ]
    src = os.path.join(tmp_dir, "cur_src")
    os.makedirs(src)
    for i, rows in enumerate([b1, b2]):
        p = os.path.join(src, f"b{i}.parquet")
        pq.write_table(
            pa.table({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}), p
        )
        os.utime(p, (1_700_000_000 + 60 * i, 1_700_000_000 + 60 * i))

    benchmark = spark.createDataFrame([(900, bench_text)], "doc_id long, text string")
    cat = WarehouseCatalog(spark, os.path.join(tmp_dir, "cur_wh"))
    params = dict(
        benchmark=benchmark, min_words=5, max_words=200, min_quality=0.0,
        decontam_n=8, n_shingle=3, k=16, bands=8, rows=2, threshold=0.5,
    )

    def run(ckpt):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = streaming.curation_admission_sink(
            stream, cat, "cur", checkpoint=os.path.join(tmp_dir, ckpt), **params
        )
        q.awaitTermination()

    run("ckpt_cur")
    v = {r.doc_id: r for r in cat.table("cur_verdicts").collect()}
    assert {d: r.stage for d, r in v.items()} == {
        1: "admitted", 2: "quality", 3: "contaminated",
        10: "duplicate", 11: "admitted", 12: "admitted",
    }
    assert v[10].matched_corpus_id == 1 and v[10].jaccard >= 0.5
    admitted = {r.doc_id for r in cat.table("cur_admitted").collect()}
    assert admitted == {1, 11, 12}
    state_docs = {
        r.doc_id for r in cat.table("cur_tids").select("doc_id").distinct().collect()
    }
    assert state_docs == admitted

    # (c) one-shot batch admission over the concatenated stream, from
    # the same operator expressions: quality ∧ clean ∧ not-near-dup of
    # any earlier-ADMITTED doc
    all_docs = spark.createDataFrame(b1 + b2, "doc_id long, text string")
    kept_q = (
        text_ops.quality_filter(all_docs, min_words=5, max_words=200, min_quality=0.0)
        .filter(F.col("verdict") == "kept").select("doc_id")
    )
    bench_grams = dedup.word_shingles(benchmark, n=8).select("shingle").distinct()
    contaminated = (
        dedup.word_shingles(all_docs.join(kept_q, "doc_id", "left_semi"), n=8)
        .join(bench_grams, on="shingle", how="left_semi")
        .select("doc_id").distinct()
    )
    survivors = all_docs.join(kept_q, "doc_id", "left_semi").join(
        contaminated, "doc_id", "left_anti"
    )
    tids = dedup.shingle_ids(dedup.word_shingles(survivors, n=3), hashed=True)
    bands_t = dedup.lsh_bands(dedup.minhash_signatures(tids, k=16), bands=8, rows=2)
    b1_admitted = {1}  # batch-1 survivors (no standing state to collide with)
    cands = (
        bands_t.select(F.col("doc_id").alias("doc_a"), "band_id", "band_key")
        .join(
            bands_t.select(F.col("doc_id").alias("doc_b"), "band_id", "band_key"),
            on=["band_id", "band_key"],
        )
        .filter(F.col("doc_a") >= 10)
        .filter(F.col("doc_b").isin(list(b1_admitted)))
        .select("doc_a", "doc_b").distinct()
    )
    dup2 = {
        r.doc_a
        for r in dedup.pairwise_jaccard(cands, tids)
        .filter(F.col("jaccard") >= 0.5).collect()
    }
    one_shot_admitted = b1_admitted | (
        {r.doc_id for r in survivors.collect() if r.doc_id >= 10} - dup2
    )
    assert one_shot_admitted == admitted

    # replay idempotence: fresh checkpoint, same source, identical state
    before = sorted((r.doc_id, r.batch_id, r.stage) for r in cat.table("cur_verdicts").collect())
    run("ckpt_cur_replay")
    after = sorted((r.doc_id, r.batch_id, r.stage) for r in cat.table("cur_verdicts").collect())
    assert after == before
    assert {r.doc_id for r in cat.table("cur_admitted").collect()} == admitted

    # the ladder's last step: training sequences packed from the
    # admitted STATE equal batch packing over the same document set
    from data_warehouse_implementation_spark.operators import corpus as corpus_ops

    got_seq = sorted(
        tuple(r)
        for r in streaming.curation_sequences_from_state(
            cat, "cur", seq_budget=16, chunk_size=8
        ).collect()
    )
    want_seq = sorted(
        tuple(r)
        for r in corpus_ops.pack_sequences(
            all_docs.filter(F.col("doc_id").isin(sorted(admitted))),
            seq_budget=16, chunk_size=8, chunk_stride=8,
        ).collect()
    )
    assert got_seq == want_seq and len(got_seq) > 0

    # and the BFD packer reads the same state (round 12: method="bfd")
    got_bfd = sorted(
        tuple(r)
        for r in streaming.curation_sequences_from_state(
            cat, "cur", seq_budget=16, chunk_size=8, method="bfd"
        ).collect()
    )
    want_bfd = sorted(
        tuple(r)
        for r in corpus_ops.pack_sequences_bfd(
            all_docs.filter(F.col("doc_id").isin(sorted(admitted))),
            seq_budget=16, chunk_size=8, chunk_stride=8,
        ).collect()
    )
    assert got_bfd == want_bfd and len(got_bfd) > 0


def test_dedup_sink_migrates_legacy_state_without_batch_id(spark, tmp_dir):
    """State tables written by the pre-idempotence sink layout carry no
    batch_id column; the upgraded sink must migrate them in place
    (legacy rows tagged batch_id = -1) instead of dying with an
    unresolved-column error on the first micro-batch, and the standing
    corpus must still reject near-duplicates of legacy-admitted docs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_warehouse_implementation_spark.operators import dedup

    base = (
        "one two three four five six seven eight nine ten eleven twelve "
        "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    )
    legacy = spark.createDataFrame([(1, base)], "doc_id long, text string")
    cat = WarehouseCatalog(spark, os.path.join(tmp_dir, "legacy_wh"))
    tids = dedup.shingle_ids(dedup.word_shingles(legacy, n=3), hashed=True)
    cat.write("corpus_tids", tids)  # legacy layout: NO batch_id column
    cat.write(
        "corpus_bands",
        dedup.lsh_bands(dedup.minhash_signatures(tids, k=16), bands=8, rows=2),
    )

    src = os.path.join(tmp_dir, "legacy_src")
    os.makedirs(src)
    rows = [(10, base.replace("seven", "SEVEN7")), (11, "fresh novel words entirely unrelated to the admitted corpus")]
    pq.write_table(
        pa.table({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}),
        os.path.join(src, "b0.parquet"),
    )
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = streaming.incremental_dedup_sink(
        stream, cat, "corpus", checkpoint=os.path.join(tmp_dir, "ckpt_legacy")
    )
    q.awaitTermination()

    v = {r.doc_id: r for r in cat.table("corpus_verdicts").collect()}
    assert v[10].is_dup and v[10].matched_corpus_id == 1
    assert not v[11].is_dup
    legacy_rows = cat.table("corpus_tids").filter("doc_id = 1").collect()
    assert legacy_rows and all(r.batch_id == -1 for r in legacy_rows)


def test_histogram_and_hll_sketch_sinks_parity_with_batch(spark, tmp_dir):
    """The mergeable-sketch trio's remaining two members, live: two
    micro-batches through (a) the histogram-quantile sink must yield
    EXACTLY the batch events_quantile_rollup over the concatenated
    stream — including a (day, type, bin) cell split across the batch
    boundary (partials merge by summing counts) — and (b) the HLL sink
    must estimate distincts identically to a one-shot sketch over all
    events, including users recurring across batches (HLL union is
    duplicate- and partition-insensitive). Replaying a batch under a
    fresh checkpoint must leave both states unchanged."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_warehouse_implementation_spark.plans.scale_queries import (
        events_quantile_rollup,
    )

    d1 = dt.datetime(2024, 3, 1, 9, 0, 0)
    d2 = dt.datetime(2024, 3, 2, 14, 0, 0)
    # batch 1 and batch 2 both hit (2024-03-01, 'view', bin 1) — the
    # split-cell case — and share user 7 across batches
    b1 = [
        (d1, "view", 12.0, 7),
        (d1, "view", 17.0, 8),
        (d1, "click", 95.0, 7),
        (d2, "view", 44.0, 9),
    ]
    b2 = [
        (d1 + dt.timedelta(minutes=30), "view", 15.0, 7),
        (d2, "view", 101.0, 10),
        (d2, "click", 3.0, 11),
        (d2, "click", 95.0, 7),
    ]
    src = os.path.join(tmp_dir, "sk_src")
    os.makedirs(src)
    for i, rows in enumerate([b1, b2]):
        p = os.path.join(src, f"b{i}.parquet")
        pq.write_table(
            pa.table({
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                "event_type": [r[1] for r in rows],
                "value": [r[2] for r in rows],
                "user_id": pa.array([r[3] for r in rows], pa.int64()),
            }),
            p,
        )
        os.utime(p, (1_700_000_000 + 60 * i, 1_700_000_000 + 60 * i))

    cat = WarehouseCatalog(spark, os.path.join(tmp_dir, "sk_wh"))
    schema = "ts timestamp, event_type string, value double, user_id long"

    def run(sink, ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = sink(stream, cat, "sk", checkpoint=os.path.join(tmp_dir, ckpt))
        q.awaitTermination()

    run(streaming.histogram_sketch_sink, "ckpt_hist")
    run(streaming.hll_sketch_sink, "ckpt_hll")

    batch_all = spark.createDataFrame(b1 + b2, schema)
    want_q = [tuple(r) for r in events_quantile_rollup({"events": batch_all}).collect()]
    got_q = [tuple(r) for r in streaming.quantiles_from_state(cat, "sk").collect()]
    assert got_q == want_q and len(got_q) == 2
    # the split (2024-03-01, view, bin 1) cell merged into one count
    hist = cat.table("sk_hist")
    split = hist.filter("day = '2024-03-01' AND event_type = 'view' AND bin = 1")
    assert {(r.n, r.batch_id) for r in split.collect()} == {(2, 0), (1, 1)}

    # expectations via the BATCH query's own shared expressions, so the
    # parity is against the batch path, not a copy of the sink's code
    from data_warehouse_implementation_spark.plans.timeseries_queries import (
        daily_hll_sketches,
        hll_union_estimate,
    )

    want_d = {
        (r.event_type, r.n_approx, r.n_sketches)
        for r in hll_union_estimate(
            daily_hll_sketches(
                batch_all.select(
                    "event_type", F.to_date("ts").alias("day"), "user_id"
                )
            )
        ).collect()
    }
    got_d = {
        (r.event_type, r.n_approx, r.n_days)
        for r in streaming.distinct_from_state(cat, "sk").collect()
    }
    assert got_d == want_d
    # exact small-cardinality check: HLL is exact at these sizes
    assert {(r[0], r[1]) for r in got_d} == {("view", 4), ("click", 2)}

    # replay idempotence for both states
    before_h = sorted(tuple(r) for r in cat.table("sk_hist").collect())
    before_s = sorted(
        (r.event_type, str(r.day), r.batch_id) for r in cat.table("sk_sketches").collect()
    )
    run(streaming.histogram_sketch_sink, "ckpt_hist_replay")
    run(streaming.hll_sketch_sink, "ckpt_hll_replay")
    assert sorted(tuple(r) for r in cat.table("sk_hist").collect()) == before_h
    assert (
        sorted(
            (r.event_type, str(r.day), r.batch_id)
            for r in cat.table("sk_sketches").collect()
        )
        == before_s
    )
    assert [tuple(r) for r in streaming.quantiles_from_state(cat, "sk").collect()] == want_q

    # duplicate-append artifact (the replay failure window the CMS and
    # rollup readers already defend against — round-10 review): a second
    # copy of batch 0's histogram partials on disk must be collapsed by
    # the reader, not double-counted into the bin sums
    dup = cat.table("sk_hist").filter("batch_id = 0")
    cat.insert_into("sk_hist", dup)
    assert [tuple(r) for r in streaming.quantiles_from_state(cat, "sk").collect()] == want_q


def test_cms_sketch_sink_parity_with_batch(spark, tmp_dir):
    """Two micro-batches of keyed events through the streaming count-min
    sink must yield EXACTLY the estimates of one batch sketch over the
    concatenated stream (cells merge by addition), and every estimate
    must respect the never-undercount guarantee."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_warehouse_implementation_spark.plans.timeseries_queries import (
        CMS_A,
        CMS_B,
        CMS_DEPTH,
        CMS_P,
        CMS_WIDTH,
    )

    src = os.path.join(tmp_dir, "cms_src")
    os.makedirs(src)
    b1 = [7] * 50 + [13] * 5 + list(range(100, 130))
    b2 = [7] * 40 + [13] * 15 + list(range(200, 220))
    for i, keys in enumerate([b1, b2]):
        p = os.path.join(src, f"b{i}.parquet")
        pq.write_table(pa.table({"user_id": pa.array(keys, pa.int64())}), p)
        os.utime(p, (1_700_000_000 + 60 * i, 1_700_000_000 + 60 * i))

    cat = WarehouseCatalog(spark, os.path.join(tmp_dir, "cms_wh"))
    stream = (
        spark.readStream.schema("user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming.cms_sketch_sink(
        stream, cat, "cms", checkpoint=os.path.join(tmp_dir, "ckpt_cms")
    )
    q.awaitTermination()
    # two micro-batches appended two partial cell tables
    assert cat.table("cms_cells").select("batch_id").distinct().count() == 2

    all_keys = spark.createDataFrame(
        [(k,) for k in sorted(set(b1 + b2))], "user_id long"
    )
    est = {
        r.user_id: r.est_count
        for r in streaming.cms_estimate(cat, "cms", all_keys).collect()
    }
    # batch truth: the same sketch built in one shot over b1 + b2
    import collections

    true = collections.Counter(b1 + b2)
    cells = collections.Counter()
    for k, n in true.items():
        for i in range(CMS_DEPTH):
            cells[(i, ((k % CMS_P) * CMS_A[i] + CMS_B[i]) % CMS_P % CMS_WIDTH)] += n
    for k, n in true.items():
        want = min(
            cells[(i, ((k % CMS_P) * CMS_A[i] + CMS_B[i]) % CMS_P % CMS_WIDTH)]
            for i in range(CMS_DEPTH)
        )
        assert est[k] == want, k
        assert est[k] >= n, "sketch undercounted"

    # --- never-seen keys: empty cells are implicit zeros -------------
    # a key absent from the stream must still get a row, with min taken
    # over ALL its DEPTH cells (absent cell = 0), so a key hitting any
    # empty cell estimates 0 instead of overestimating from the subset
    probe_ids = [999_983, 999_979, 424_243]
    probe = spark.createDataFrame([(k,) for k in probe_ids], "user_id long")
    probe_est = {
        r.user_id: r.est_count
        for r in streaming.cms_estimate(cat, "cms", probe).collect()
    }
    for k in probe_ids:
        want = min(
            cells.get((i, ((k % CMS_P) * CMS_A[i] + CMS_B[i]) % CMS_P % CMS_WIDTH), 0)
            for i in range(CMS_DEPTH)
        )
        assert probe_est[k] == want, k

    # --- replay idempotency ------------------------------------------
    # simulate a crashed-and-recovered stream: a FRESH checkpoint over
    # the same source re-runs every micro-batch with the same batch_ids
    # through the real foreachBatch; the per-batch delete-then-insert
    # must leave the cell table (and so every estimate) unchanged
    before = sorted(
        (r.batch_id, r.i, r.col, r.c) for r in cat.table("cms_cells").collect()
    )
    q2 = streaming.cms_sketch_sink(
        stream, cat, "cms", checkpoint=os.path.join(tmp_dir, "ckpt_cms_replay")
    )
    q2.awaitTermination()
    after = sorted(
        (r.batch_id, r.i, r.col, r.c) for r in cat.table("cms_cells").collect()
    )
    assert after == before, "replayed batches must not change the sketch"
    est2 = {
        r.user_id: r.est_count
        for r in streaming.cms_estimate(cat, "cms", all_keys).collect()
    }
    assert est2 == est

    # --- duplicate-append artifact: estimate-side dedupe -------------
    # even if a failure window leaves BOTH copies of a batch's cells on
    # disk, the per-(batch_id, i, col) max() collapse restores the
    # single-append state (batch content is deterministic)
    dup = cat.table("cms_cells").filter("batch_id = 0")
    cat.insert_into("cms_cells", dup)
    est3 = {
        r.user_id: r.est_count
        for r in streaming.cms_estimate(cat, "cms", all_keys).collect()
    }
    assert est3 == est


def test_decode_audio_8bit_and_strictness(spark):
    """8-bit WAV decodes with unsigned->signed centering; junk payloads
    are dropped when lenient and raise naming the media_id when
    strict."""
    import struct

    def wav8(rate, samples_u8):
        data = bytes(samples_u8)
        fmt = struct.pack("<HHIIHH", 1, 1, rate, rate, 1, 8)
        chunks = (
            b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    rows = [
        (1, "audio", wav8(8000, [0, 128, 255, 128]), {"width": None, "height": None, "sample_rate": 8000}),
        (2, "audio", b"not a wav at all", {"width": None, "height": None, "sample_rate": None}),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r.media_id: r for r in multimodal.decode_audio(media).collect()}
    assert set(out) == {1}
    assert out[1].samples == [-128, 0, 127, 0]
    assert out[1].sample_rate == 8000 and out[1].n_channels == 1

    with pytest.raises(Exception, match="media_id=2"):
        multimodal.decode_audio(media, strict=True).collect()


def test_decode_video_markers_and_sampling(spark):
    """y4m parsing: frame sampling keeps every 2nd frame, a corrupt
    FRAME marker drops the payload when lenient and raises when strict,
    and mono streams carry no chroma."""
    def y4m(w, h, frames, cs="mono"):
        out = b"YUV4MPEG2 W%d H%d F30:1 C%s\n" % (w, h, cs.encode())
        for f in frames:
            out += b"FRAME\n" + bytes(f)
        return out

    good = y4m(2, 2, [[i] * 4 for i in (1, 2, 3, 4, 5)])
    m = good.index(b"FRAME")
    bad = good[:m] + b"XXXXX" + good[m + 5 :]  # clobber first FRAME marker
    rows = [
        (1, "video", good, {"width": None, "height": None, "sample_rate": None}),
        (2, "video", bad, {"width": None, "height": None, "sample_rate": None}),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.decode_video(media, sample_every=2).collect()
    assert {r.media_id for r in out} == {1}
    got = {r.frame_idx: bytes(r.y_plane) for r in out}
    assert sorted(got) == [0, 2, 4]
    assert got[2] == bytes([3] * 4)
    assert all(r.n_frames == 5 and r.colorspace == "mono" for r in out)

    with pytest.raises(Exception, match="media_id=2"):
        multimodal.decode_video(media, strict=True).collect()


def test_patchify_images_exact_bytes_and_crop(spark):
    """2x2 patchify over a 5x3 RGB frame: floor-crop drops the odd
    column and row; each patch's bytes are exactly the row-major
    channel-interleaved block (numpy reference), positioned by
    (patch_row, patch_col)."""
    import numpy as np

    w, h, ch = 5, 3, 3
    arr = np.arange(w * h * ch, dtype=np.uint8).reshape(h, w, ch)
    rows = [(7, w, h, ch, arr.tobytes(), "ppm")]
    decoded = spark.createDataFrame(rows, multimodal.DECODED_SCHEMA)
    got = {
        (r.patch_row, r.patch_col): bytes(r.patch)
        for r in multimodal.patchify_images(decoded, patch=2).collect()
    }
    # 3//2=1 patch row, 5//2=2 patch cols — odd edges cropped
    assert set(got) == {(0, 0), (0, 1)}
    for (r, c), b in got.items():
        assert b == arr[r * 2 : r * 2 + 2, c * 2 : c * 2 + 2, :].tobytes()
        assert len(b) == 2 * 2 * 3


def test_substring_gram_sink_census_parity_with_batch(spark, tmp_dir):
    """Documents ingested in two micro-batches; the census over the
    maintained gram state must EQUAL the one-shot batch census over the
    concatenated corpus — including cross-batch duplication (a batch-2
    doc repeating a batch-1 passage) that neither batch sees alone."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_warehouse_implementation_spark.operators import corpus as corpus_ops

    passage = "w1 w2 w3 w4 w5 w6"
    src = os.path.join(tmp_dir, "gram_src")
    os.makedirs(src)
    b1 = [(1, passage + " x1 x2"), (2, "a1 a2 a3 a4 a5 a6 a7")]
    b2 = [(10, "z1 z2 " + passage), (11, "b1 b2 b3 b4 b5 b6")]
    for i, rows in enumerate([b1, b2]):
        p = os.path.join(src, f"g{i}.parquet")
        pq.write_table(
            pa.table({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}), p
        )
        os.utime(p, (1_700_000_000 + 60 * i, 1_700_000_000 + 60 * i))

    cat = WarehouseCatalog(spark, os.path.join(tmp_dir, "gram_wh"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming.substring_gram_sink(
        stream, cat, "sub", checkpoint=os.path.join(tmp_dir, "ckpt_gram"), k=5
    )
    q.awaitTermination()

    from_state = {
        r.doc_id: (r.n_tokens, r.dup_tokens)
        for r in streaming.substring_census_from_state(cat, "sub", k=5).collect()
    }
    all_docs = spark.createDataFrame(b1 + b2, "doc_id long, text string")
    batch = {
        r.doc_id: (r.n_tokens, r.dup_tokens)
        for r in corpus_ops.substring_dup_census(all_docs, k=5).collect()
    }
    assert from_state == batch
    # the cross-batch duplicated passage is actually detected
    assert from_state[10][1] > 0 and from_state[1][1] > 0
    assert from_state[2][1] == 0 and from_state[11][1] == 0
    # hashed production state (8-byte gram keys): identical census
    q2 = streaming.substring_gram_sink(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        cat,
        "subh",
        checkpoint=os.path.join(tmp_dir, "ckpt_gram_h"),
        k=5,
        hashed=True,
    )
    q2.awaitTermination()
    hashed_state = {
        r.doc_id: (r.n_tokens, r.dup_tokens)
        for r in streaming.substring_census_from_state(cat, "subh", k=5).collect()
    }
    assert hashed_state == batch

    # duplicate-append artifact (round-10 review): a second copy of
    # batch 0's gram rows must be collapsed by the census reader — an
    # inflated occurrence count would flip unique substrings past
    # min_occurrences and over-report every doc's dup_tokens
    dup = cat.table("sub_grams").filter("batch_id = 0")
    cat.insert_into("sub_grams", dup)
    assert {
        r.doc_id: (r.n_tokens, r.dup_tokens)
        for r in streaming.substring_census_from_state(cat, "sub", k=5).collect()
    } == batch


def test_ivf_admission_sink_parity_with_batch(spark, tmp_dir):
    """Two micro-batches of embeddings through the streaming IVF
    admission sink must yield EXACTLY the one-shot assign_cells +
    cosine_topk results over the concatenated batches (cell assignment
    is a pure function of (vector, centroids), not arrival order);
    replaying every batch under a fresh checkpoint must leave the state
    and the search results unchanged; a duplicate-append artifact is
    absorbed by the estimate-side vec_id dedup."""
    from data_warehouse_implementation_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    centroids = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cen_id"), F.col("embedding").alias("cen_vec")
    )
    src = os.path.join(tmp_dir, "ivf_src")
    os.makedirs(src)
    b1 = emb.filter(F.col("vec_id") % 2 == 0)
    b2 = emb.filter(F.col("vec_id") % 2 == 1)
    for i, b in enumerate([b1, b2]):
        p = os.path.join(src, f"b{i}")
        b.coalesce(1).write.parquet(p)
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (1_700_000_000 + 60 * i,) * 2)

    cat = WarehouseCatalog(spark, os.path.join(tmp_dir, "ivf_wh"))
    schema = emb.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = streaming.ivf_admission_sink(
        stream, cat, "ivf", checkpoint=os.path.join(tmp_dir, "ckpt_ivf"),
        centroids=centroids,
    )
    q.awaitTermination()
    state = cat.table("ivf_cells")
    assert state.select("batch_id").distinct().count() == 2
    assert state.count() == emb.count()

    # one-shot batch truth over the concatenated stream
    batch_cells = sim.assign_cells(emb, centroids)
    want_assign = {(r.vec_id, r.cell_id) for r in batch_cells.collect()}
    got_assign = {(r.vec_id, r.cell_id) for r in state.collect()}
    assert got_assign == want_assign

    queries = emb.filter(F.col("vec_id") < 6)
    for n_probe in (1, 2):
        got = streaming.ivf_state_topk(
            cat, "ivf", queries, centroids, k=3, n_probe=n_probe
        )
        want = sim.cosine_topk(
            queries.join(sim.probe_cells(queries, centroids, n_probe=n_probe), on="vec_id"),
            emb.join(batch_cells, on="vec_id"),
            k=3,
            cell_col="cell_id",
        )
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    # replay idempotency: fresh checkpoint, same batch_ids, same state
    before = sorted((r.vec_id, r.cell_id, r.batch_id) for r in state.collect())
    q2 = streaming.ivf_admission_sink(
        stream, cat, "ivf", checkpoint=os.path.join(tmp_dir, "ckpt_ivf_replay"),
        centroids=centroids,
    )
    q2.awaitTermination()
    after = sorted((r.vec_id, r.cell_id, r.batch_id) for r in cat.table("ivf_cells").collect())
    assert after == before, "replayed batches must not change the index state"

    # duplicate-append artifact: search-side dedup absorbs it
    dup = cat.table("ivf_cells").filter("batch_id = 0")
    cat.insert_into("ivf_cells", dup)
    got3 = streaming.ivf_state_topk(cat, "ivf", queries, centroids, k=3, n_probe=2)
    want3 = sim.cosine_topk(
        queries.join(sim.probe_cells(queries, centroids, n_probe=2), on="vec_id"),
        emb.join(batch_cells, on="vec_id"),
        k=3,
        cell_col="cell_id",
    )
    assert sorted(map(tuple, got3.collect())) == sorted(map(tuple, want3.collect()))

    # re-admission upsert (ADVICE r8): the same vec_id admitted again in
    # a LATER batch with a different embedding must be searched with the
    # latest embedding, deterministically — not an arbitrary state row
    readmit_id = 2
    new_vec = [float(i % 7) / 7.0 for i in range(len(emb.first().embedding))]
    readmit = spark.createDataFrame([(readmit_id, new_vec)], schema)
    cat.insert_into(
        "ivf_cells",
        readmit.join(sim.assign_cells(readmit, centroids), on="vec_id")
        .withColumn("batch_id", F.lit(9)),
    )
    emb_after = emb.filter(F.col("vec_id") != readmit_id).unionByName(readmit)
    cells_after = sim.assign_cells(emb_after, centroids)
    want4 = sim.cosine_topk(
        queries.join(sim.probe_cells(queries, centroids, n_probe=2), on="vec_id"),
        emb_after.join(cells_after, on="vec_id"),
        k=3,
        cell_col="cell_id",
    )
    for _ in range(2):  # twice: the pick must be stable run-over-run
        got4 = streaming.ivf_state_topk(cat, "ivf", queries, centroids, k=3, n_probe=2)
        assert sorted(map(tuple, got4.collect())) == sorted(map(tuple, want4.collect()))

    # intra-batch duplicate (ADVICE r9): the same vec_id admitted TWICE
    # within one batch with different embeddings has no batch_id to
    # break the tie — the collapse must pick the documented content-hash
    # winner (larger xxhash64(embedding)), stably across evaluations
    dup_id = 3
    dim = len(emb.first().embedding)
    va = [float((i * 3) % 5) / 5.0 for i in range(dim)]
    vb = [float((i * 7) % 11) / 11.0 for i in range(dim)]
    two = spark.createDataFrame([(dup_id, va), (dup_id, vb)], schema)
    cat.insert_into(
        "ivf_cells",
        two.join(sim.assign_cells(two, centroids), on="vec_id")
        .withColumn("batch_id", F.lit(11)),
    )
    # hash via an indexed frame with the SAME embedding type as the
    # state (float32 storage rounds the python literals, so the values
    # themselves can't serve as dict keys)
    etype = schema["embedding"].dataType.simpleString()
    idx = spark.createDataFrame([(0, va), (1, vb)], f"i long, embedding {etype}")
    hs = {r.i: r.h for r in idx.select("i", F.xxhash64("embedding").alias("h")).collect()}
    winner = va if hs[0] >= hs[1] else vb
    emb_final = emb_after.filter(F.col("vec_id") != dup_id).unionByName(
        spark.createDataFrame([(dup_id, winner)], schema)
    )
    cells_final = sim.assign_cells(emb_final, centroids)
    want5 = sim.cosine_topk(
        queries.join(sim.probe_cells(queries, centroids, n_probe=2), on="vec_id"),
        emb_final.join(cells_final, on="vec_id"),
        k=3,
        cell_col="cell_id",
    )
    for _ in range(2):
        got5 = streaming.ivf_state_topk(cat, "ivf", queries, centroids, k=3, n_probe=2)
        assert sorted(map(tuple, got5.collect())) == sorted(map(tuple, want5.collect()))


def test_rollup_hour_sink_parity_with_batch(spark, tmp_dir):
    """Two micro-batches through the streaming continuous-aggregate
    sink must yield EXACTLY the batch hypertable cascade over the
    concatenated stream — including an hour SPLIT ACROSS the batch
    boundary (partials for the same hour must merge by sum/min/max) —
    and a duplicate append of one batch (the replay failure window)
    must be absorbed by the state-side collapse."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_warehouse_implementation_spark.plans.ingest_queries import (
        events_hypertable_rollup,
    )

    def us(y, mo, d, h, mi):
        return dt.datetime(y, mo, d, h, mi)

    # batch 1 and 2 SHARE hour 2024-01-31 23:xx and event_type 'click';
    # rows span a day AND a month boundary
    b1 = [
        (us(2024, 1, 31, 23, 10), "click", 1.25),
        (us(2024, 1, 31, 23, 20), "view", 2.50),
        (us(2024, 1, 15, 8, 0), "click", -3.75),
    ]
    b2 = [
        (us(2024, 1, 31, 23, 40), "click", 10.00),  # same hour as b1's first
        (us(2024, 2, 1, 0, 5), "click", 4.00),  # next month, 55 min later
        (us(2024, 2, 10, 12, 0), "view", 0.25),
    ]
    src = os.path.join(tmp_dir, "rollup_src")
    os.makedirs(src)
    for i, rows in enumerate([b1, b2]):
        p = os.path.join(src, f"b{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                    "event_type": pa.array([r[1] for r in rows]),
                    "value": pa.array([r[2] for r in rows], pa.float64()),
                }
            ),
            p,
        )
        os.utime(p, (1_700_000_000 + 60 * i, 1_700_000_000 + 60 * i))

    cat = WarehouseCatalog(spark, os.path.join(tmp_dir, "rollup_wh"))
    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming.rollup_hour_sink(
        stream, cat, "ca", checkpoint=os.path.join(tmp_dir, "ckpt_rollup")
    )
    q.awaitTermination()
    state = cat.table("ca_hours")
    assert state.select("batch_id").distinct().count() == 2
    # the boundary-split hour holds one partial per batch
    assert (
        state.filter(F.col("event_type") == "click")
        .groupBy("hour")
        .count()
        .filter(F.col("count") == 2)
        .count()
        == 1
    )

    batch_all = spark.read.parquet(src)
    want = [
        tuple(r)
        for r in events_hypertable_rollup({"events": batch_all}).collect()
    ]
    got = [tuple(r) for r in streaming.rollup_month_from_state(cat, "ca").collect()]
    assert got == want

    # replay failure window: duplicate-append batch 1's partials and
    # assert the collapse restores the single-append rollup
    dup = state.filter(F.col("batch_id") == 1)
    cat.insert_into("ca_hours", dup)
    got2 = [tuple(r) for r in streaming.rollup_month_from_state(cat, "ca").collect()]
    assert got2 == want


def test_rollup_hour_sink_replay_idempotent(spark, tmp_dir):
    """Re-running the whole stream from a FRESH checkpoint replays the
    same batch ids against existing state — the sink's probe-then-
    delete path must restore the single-append partials, leaving the
    state row set and the month rollup unchanged."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        (dt.datetime(2024, 3, 5, 10, 1), "click", 1.00),
        (dt.datetime(2024, 3, 5, 11, 2), "view", 2.00),
        (dt.datetime(2024, 4, 1, 0, 3), "click", 3.00),
    ]
    src = os.path.join(tmp_dir, "rollup_replay_src")
    os.makedirs(src)
    p = os.path.join(src, "b0.parquet")
    pq.write_table(
        pa.table(
            {
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[1] for r in rows]),
                "value": pa.array([r[2] for r in rows], pa.float64()),
            }
        ),
        p,
    )

    cat = WarehouseCatalog(spark, os.path.join(tmp_dir, "rollup_replay_wh"))

    def run(ckpt):
        stream = spark.readStream.schema(
            "ts timestamp, event_type string, value double"
        ).parquet(src)
        q = streaming.rollup_hour_sink(
            stream, cat, "car", checkpoint=os.path.join(tmp_dir, ckpt)
        )
        q.awaitTermination()

    run("ckpt_a")
    first_state = sorted(tuple(r) for r in cat.table("car_hours").collect())
    first = [tuple(r) for r in streaming.rollup_month_from_state(cat, "car").collect()]
    # fresh checkpoint => batch id 0 is replayed verbatim against the
    # populated state table
    run("ckpt_b")
    second_state = sorted(tuple(r) for r in cat.table("car_hours").collect())
    second = [tuple(r) for r in streaming.rollup_month_from_state(cat, "car").collect()]
    assert second_state == first_state
    assert second == first


def test_binary_file_ingest_decode_parity(spark, tmp_dir):
    """Raw media files ingested via the binaryFile source must flow
    through decode_images identically to the same blobs delivered as
    parquet-column rows: numeric filename stems become media_ids, the
    extension glob prunes foreign files at the listing, and the decoded
    dimensions/pixels match the in-memory path byte for byte."""
    from data_warehouse_implementation_spark.sources.binaryio import (
        read_binary_media,
    )

    ppm_px = bytes(range(2 * 2 * 3))
    rgb = [[(255, 0, 0), (0, 255, 0), (0, 0, 255)],
           [(10, 20, 30), (40, 50, 60), (70, 80, 90)]]
    blobs = {7: bytes(_ppm_bytes(2, 2, ppm_px)), 12: bytes(_bmp_bytes(3, 2, rgb))}
    media_dir = os.path.join(tmp_dir, "media")
    os.makedirs(media_dir)
    for mid, b in blobs.items():
        with open(os.path.join(media_dir, f"{mid}.img"), "wb") as f:
            f.write(b)
    # a foreign file the glob must exclude from the listing
    with open(os.path.join(media_dir, "manifest.txt"), "wb") as f:
        f.write(b"not media")

    ingested = read_binary_media(spark, media_dir, kind="image", glob="*.img")
    assert ingested.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,payload:binary,"
        "meta:struct<width:int,height:int,sample_rate:int>>"
    )
    rows = {r.media_id: bytes(r.payload) for r in ingested.collect()}
    assert rows == blobs

    via_files = {
        r.media_id: (r.width, r.height, bytes(r.pixels))
        for r in multimodal.decode_images(ingested).collect()
    }
    inmem = spark.createDataFrame(
        [(mid, "image", bytearray(b), (None, None, None)) for mid, b in blobs.items()],
        multimodal.MEDIA_SCHEMA,
    )
    via_column = {
        r.media_id: (r.width, r.height, bytes(r.pixels))
        for r in multimodal.decode_images(inmem).collect()
    }
    assert via_files == via_column


def test_binary_file_ingest_messy_filenames(spark, tmp_dir):
    """ADVICE r8: crawl filenames with hyphens, spaces, and multiple
    dots must each get a DISTINCT stable media_id (the old \\w-only stem
    regex collapsed them all to xxhash64('')); only the final extension
    is stripped, a numeric stem with a double extension still resolves
    to its number, and an extensionless/dotfile name hashes its full
    filename."""
    from data_warehouse_implementation_spark.sources.binaryio import (
        read_binary_media,
    )

    names = [
        "img-001.img",      # hyphenated stem
        "a.tar.img",        # inner dot: stem 'a.tar'
        "with space.img",   # space in stem
        "42.img",           # numeric stem -> id 42
    ]
    media_dir = os.path.join(tmp_dir, "messy")
    os.makedirs(media_dir)
    for i, n in enumerate(names):
        with open(os.path.join(media_dir, n), "wb") as f:
            f.write(b"blob-%d" % i)

    ingested = read_binary_media(spark, media_dir, kind="image", glob="*.img")
    rows = {bytes(r.payload): r.media_id for r in ingested.collect()}
    ids = list(rows.values())
    assert len(ids) == len(names)
    assert len(set(ids)) == len(names), f"colliding media_ids: {ids}"
    assert rows[b"blob-3"] == 42
    # stem derivation is stable across re-ingest (same ids both times)
    again = {
        bytes(r.payload): r.media_id
        for r in read_binary_media(spark, media_dir, kind="image", glob="*.img").collect()
    }
    assert again == rows


def test_curation_admission_per_source_cap(spark, tmp_dir):
    """The streaming twin of the batch per-source frequency cap (round
    10): with max_per_source=2, a source's standing ADMITTED count caps
    later arrivals with verdict 'source_capped'; within one batch the
    remaining quota fills in cap_per_key's deterministic hash-rank
    order; duplicates are decided BEFORE the cap and never burn quota;
    replay under a fresh checkpoint is idempotent."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_warehouse_implementation_spark.operators.corpus import (
        HASH_P,
        SPLIT_A,
        SPLIT_B,
    )

    def h(doc_id: int) -> int:
        return ((doc_id % HASH_P) * SPLIT_A + SPLIT_B) % HASH_P

    texts = {
        1: "the quick brown fox jumps over a lazy dog near the old mill road today",
        2: "a measured essay on the craft of writing and the slow value of revision",
        3: "an unrelated report on the state of the harvest and the price of grain",
        4: "the committee met on tuesday to review the annual budget for the parks",
    }
    # intra-batch quota fills in hash order: the two smallest-h A docs win
    a_order = sorted([1, 2, 3], key=h)
    winners, capped_b1 = set(a_order[:2]), a_order[2]
    dup_target = a_order[0]

    # NULL source is a real quota group (round-10 review: the standing
    # join must be null-safe or the NULL group's cap resets per batch)
    null_texts = {
        20: "a catalogue of ships that sailed from the harbor before the storm season began",
        21: "remarks on the cultivation of olives in the dry hills above the southern coast",
        22: "an account of the festival held each autumn when the river runs low and clear",
    }
    null_order = sorted(null_texts, key=h)
    null_winners, null_capped_b1 = set(null_order[:2]), null_order[2]
    b1 = (
        [(i, texts[i], "A") for i in (1, 2, 3)]
        + [(4, texts[4], "B")]
        + [(i, null_texts[i], None) for i in null_texts]
    )
    b2 = [
        (10, "a fresh novel document about rivers and the bridges that cross them in spring", "A"),
        (11, texts[dup_target].replace("the", "that", 1), "A"),  # near-dup of an ADMITTED doc
        (12, "notes from the observatory on the motion of the planets through the winter sky", "B"),
        (23, "the keeper of the lighthouse wrote daily of the weather and the passing sails", None),
    ]
    src = os.path.join(tmp_dir, "cap_src")
    os.makedirs(src)
    for i, rows in enumerate([b1, b2]):
        p = os.path.join(src, f"b{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": [r[0] for r in rows],
                    "text": [r[1] for r in rows],
                    "source": [r[2] for r in rows],
                }
            ),
            p,
        )
        os.utime(p, (1_700_000_000 + 60 * i,) * 2)

    benchmark = spark.createDataFrame(
        [(900, "completely disjoint benchmark passage with eight special uncommon tokens arranged here")],
        "doc_id long, text string",
    )
    cat = WarehouseCatalog(spark, os.path.join(tmp_dir, "cap_wh"))

    def run(ckpt):
        stream = (
            spark.readStream.schema("doc_id long, text string, source string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = streaming.curation_admission_sink(
            stream, cat, "capc", checkpoint=os.path.join(tmp_dir, ckpt),
            benchmark=benchmark, min_words=5, max_words=200, min_quality=0.0,
            decontam_n=8, n_shingle=3, k=16, bands=8, rows=2, threshold=0.5,
            max_per_source=2,
        )
        q.awaitTermination()

    run("ckpt_cap")
    v = {r.doc_id: r.stage for r in cat.table("capc_verdicts").collect()}
    want = {w: "admitted" for w in winners}
    want[capped_b1] = "source_capped"
    want[4] = "admitted"           # B quota untouched in batch 1
    want.update({w: "admitted" for w in null_winners})
    want[null_capped_b1] = "source_capped"  # NULL group capped in-batch too
    want[10] = "source_capped"     # A standing count is already 2
    want[11] = "duplicate"         # dedup fires BEFORE the cap
    want[12] = "admitted"          # B standing count is 1 < 2
    want[23] = "source_capped"     # NULL standing count carried across batches
    assert v == want
    admitted_by_source = {
        (r.source, r.doc_id) for r in cat.table("capc_admitted").collect()
    }
    assert {d for s, d in admitted_by_source if s == "A"} == winners
    assert {d for s, d in admitted_by_source if s == "B"} == {4, 12}
    assert {d for s, d in admitted_by_source if s is None} == null_winners
    # the duplicate matched an admitted A doc, proving it was judged
    # before the cap could reject it
    dup_row = [r for r in cat.table("capc_verdicts").collect() if r.doc_id == 11][0]
    assert dup_row.matched_corpus_id == dup_target and dup_row.jaccard >= 0.5

    # replay idempotence: fresh checkpoint, identical verdicts and state
    before = sorted((r.doc_id, r.batch_id, r.stage) for r in cat.table("capc_verdicts").collect())
    run("ckpt_cap_replay")
    after = sorted((r.doc_id, r.batch_id, r.stage) for r in cat.table("capc_verdicts").collect())
    assert after == before


def test_curation_admission_per_source_cap_keep_best(spark, tmp_dir):
    """Round 11 (VERDICT r10 gap #3): priority_col switches the in-batch
    quota fill to cap_per_key's keep-best order — the two HIGHEST
    priority docs of a 3-doc source win the quota regardless of hash
    rank, NULL priority ranks last, and a later batch's higher-priority
    doc is still capped (standing admissions are final — the documented
    arrival-window scope)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import pytest

    texts = {
        1: "the quick brown fox jumps over a lazy dog near the old mill road today",
        2: "a measured essay on the craft of writing and the slow value of revision",
        3: "an unrelated report on the state of the harvest and the price of grain",
        4: "the committee met on tuesday to review the annual budget for the parks",
    }
    # priorities deliberately anti-correlated with ids/hash order; doc 3
    # carries NULL priority and must rank last
    b1 = [
        (1, texts[1], "A", 0.1),
        (2, texts[2], "A", 0.9),
        (3, texts[3], "A", None),
        (4, texts[4], "A", 0.5),
    ]
    b2 = [
        (10, "a fresh novel document about rivers and the bridges that cross them in spring", "A", 99.0),
    ]
    src = os.path.join(tmp_dir, "best_src")
    os.makedirs(src)
    for i, rows in enumerate([b1, b2]):
        p = os.path.join(src, f"b{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": [r[0] for r in rows],
                    "text": [r[1] for r in rows],
                    "source": [r[2] for r in rows],
                    "prio": pa.array([r[3] for r in rows], type=pa.float64()),
                }
            ),
            p,
        )
        os.utime(p, (1_700_000_000 + 60 * i,) * 2)

    benchmark = spark.createDataFrame(
        [(900, "completely disjoint benchmark passage with eight special uncommon tokens arranged here")],
        "doc_id long, text string",
    )
    cat = WarehouseCatalog(spark, os.path.join(tmp_dir, "best_wh"))
    stream = (
        spark.readStream.schema("doc_id long, text string, source string, prio double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming.curation_admission_sink(
        stream, cat, "best", checkpoint=os.path.join(tmp_dir, "ckpt_best"),
        benchmark=benchmark, min_words=5, max_words=200, min_quality=0.0,
        decontam_n=8, n_shingle=3, k=16, bands=8, rows=2, threshold=0.5,
        max_per_source=2, priority_col="prio",
    )
    q.awaitTermination()
    v = {r.doc_id: r.stage for r in cat.table("best_verdicts").collect()}
    assert v == {
        2: "admitted",        # priority 0.9 — best
        4: "admitted",        # priority 0.5 — second best
        1: "source_capped",   # 0.1 loses to both
        3: "source_capped",   # NULL priority ranks last
        10: "source_capped",  # later batch: standing quota already full
    }
    # the admitted state table carries the priority column
    admitted = {r.doc_id: r.prio for r in cat.table("best_admitted").collect()}
    assert admitted == {2: 0.9, 4: 0.5}
    # misconfiguration fails fast
    with pytest.raises(ValueError, match="requires max_per_source"):
        streaming.curation_admission_sink(
            stream, cat, "bad", checkpoint=os.path.join(tmp_dir, "ckpt_bad"),
            benchmark=benchmark, priority_col="prio",
        )


def test_curation_admission_applies_repetition_rules(spark, tmp_dir):
    """Round 11: repetition_rules pass through to the sink's stage-1
    quality filter — a looping doc that every C4 rule accepts is
    rejected at the quality stage when the Gopher battery is
    configured, and admitted without it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    looping = ("the cat sat on the mat " * 5).strip()
    clean = "the quick brown fox jumps over the lazy dog and then rests quietly at home"
    src = os.path.join(tmp_dir, "rep_src")
    os.makedirs(src)
    pq.write_table(
        pa.table({"doc_id": [1, 2], "text": [looping, clean]}),
        os.path.join(src, "b0.parquet"),
    )
    benchmark = spark.createDataFrame(
        [(900, "completely disjoint benchmark passage with eight special uncommon tokens arranged here")],
        "doc_id long, text string",
    )
    cat = WarehouseCatalog(spark, os.path.join(tmp_dir, "rep_wh"))

    def run(prefix, rules):
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        q = streaming.curation_admission_sink(
            stream, cat, prefix, checkpoint=os.path.join(tmp_dir, f"ckpt_{prefix}"),
            benchmark=benchmark, min_words=5, max_words=200, min_quality=0.0,
            decontam_n=8, n_shingle=3, k=16, bands=8, rows=2, threshold=0.5,
            repetition_rules=rules,
        )
        q.awaitTermination()
        return {r.doc_id: r.stage for r in cat.table(f"{prefix}_verdicts").collect()}

    assert run("norules", None) == {1: "admitted", 2: "admitted"}
    assert run("gopher", {"dup_5gram_char_frac": 0.5}) == {1: "quality", 2: "admitted"}


def test_word_count_sink_state_trains_same_tokenizer(spark, tmp_dir):
    """Round 11: the streaming tokenizer-corpus collector — two
    micro-batches of word-count partials merged from state must equal
    the one-shot word table, a unigram trained from state must equal
    one trained on the full corpus, and a duplicate-append of a batch's
    partials is absorbed by the (batch_id, word) collapse."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_warehouse_implementation_spark.operators import unigram

    b0 = [(1, "the cat sat on the mat"), (2, "the thematic cat")]
    b1 = [(3, "mat mat mat"), (4, "a cat on a mat sat still")]
    src = os.path.join(tmp_dir, "wc_src")
    os.makedirs(src)
    for i, rows in enumerate([b0, b1]):
        p = os.path.join(src, f"b{i}.parquet")
        pq.write_table(
            pa.table({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}), p
        )
        os.utime(p, (1_700_000_000 + 60 * i,) * 2)
    cat = WarehouseCatalog(spark, os.path.join(tmp_dir, "wc_wh"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming.word_count_sink(
        stream, cat, "tok", checkpoint=os.path.join(tmp_dir, "ckpt_wc")
    )
    q.awaitTermination()

    docs = spark.createDataFrame(b0 + b1, "doc_id long, text string")
    want_words = {
        (r.word, r.cnt) for r in unigram.word_table(docs).collect()
    }
    got_words = {
        (r.word, r.cnt)
        for r in streaming.word_table_from_state(cat, "tok").collect()
    }
    assert got_words == want_words and len(got_words) > 5

    def vocab_key(df):
        return sorted((r.piece, r.usage, r.prob) for r in df.collect())

    from_state = unigram.unigram_train_from_words(
        streaming.word_table_from_state(cat, "tok"),
        em_rounds=2, seed_multi=10, keep_multi=6,
    )
    one_shot = unigram.unigram_train(docs, em_rounds=2, seed_multi=10, keep_multi=6)
    assert vocab_key(from_state) == vocab_key(one_shot)

    # the SAME collector state serves the other tokenizer family: BPE
    # merges trained from state equal the one-shot training run
    from data_warehouse_implementation_spark.operators import bpe

    merges_state = bpe.bpe_train_from_symbols(
        bpe.symbol_table_from_words(streaming.word_table_from_state(cat, "tok")),
        n_merges=4,
    )
    merges_full = bpe.bpe_train(docs, n_merges=4)
    key = lambda df: sorted(  # noqa: E731
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_count) for r in df.collect()
    )
    assert key(merges_state) == key(merges_full)

    # ...and the THIRD family (round 13): WordPiece merges trained
    # from the same state equal the one-shot run, scores included
    from data_warehouse_implementation_spark.operators import wordpiece

    wp_state = wordpiece.wordpiece_train_from_symbols(
        bpe.symbol_table_from_words(streaming.word_table_from_state(cat, "tok")),
        n_merges=4,
    )
    wp_full = wordpiece.wordpiece_train(docs, n_merges=4)
    wkey = lambda df: sorted(  # noqa: E731
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_count, r.score)
        for r in df.collect()
    )
    assert wkey(wp_state) == wkey(wp_full)

    # duplicate-append of batch 0's partials (a crash window leaving
    # both copies) is absorbed by the per-(batch_id, word) collapse
    state = cat.table("tok_words")
    cat.insert_into("tok_words", state.filter("batch_id = 0"))
    got_after = {
        (r.word, r.cnt)
        for r in streaming.word_table_from_state(cat, "tok").collect()
    }
    assert got_after == want_words


def test_clusters_from_state_parity_and_replay_idempotence(spark, tmp_dir):
    """VERDICT r11 #4: ``clusters_from_state`` replays
    ``connected_components`` over the admission sink's standing pair
    evidence so streaming users get the batch ``near_dup_clusters``
    labels — parity vs one-shot batch clustering over the same docs,
    including a CROSS-BATCH cluster merge (two later-batch rejects
    joining an earlier batch's admitted doc), and unchanged labels
    after a fresh-checkpoint replay of the whole source."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_warehouse_implementation_spark.operators import dedup

    base = (
        "the quick brown fox jumps over a lazy dog and the cat sits "
        "in the warm sun of a quiet afternoon to rest and dream"
    )
    base2 = (
        "a measured essay about the craft of writing and the value of "
        "revision in the long slow work of thought and expression"
    )
    b1 = [(1, base), (2, base2)]                      # both admitted
    b2 = [
        (10, base.replace("fox", "wolf")),            # dup of 1
        (11, base2.replace("craft", "art")),          # dup of 2
        (12, (
            "an unrelated report on the state of the harvest and the "
            "price of grain in the markets of the eastern provinces"
        )),                                           # admitted singleton
    ]
    b3 = [(20, base.replace("fox", "hound"))]         # dup of 1 again: the
    #                                                   cluster {1,10,20} now
    #                                                   spans three batches
    src = os.path.join(tmp_dir, "ccs_src")
    os.makedirs(src)
    for i, rows in enumerate([b1, b2, b3]):
        p = os.path.join(src, f"b{i}.parquet")
        pq.write_table(
            pa.table({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}), p
        )
        os.utime(p, (1_700_000_000 + 60 * i, 1_700_000_000 + 60 * i))

    benchmark = spark.createDataFrame(
        [(900, "completely disjoint benchmark passage nothing shared")],
        "doc_id long, text string",
    )
    cat = WarehouseCatalog(spark, os.path.join(tmp_dir, "ccs_wh"))
    params = dict(
        benchmark=benchmark, min_words=5, max_words=200, min_quality=0.0,
        decontam_n=8, n_shingle=3, k=16, bands=8, rows=2, threshold=0.5,
    )

    def run(ckpt):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = streaming.curation_admission_sink(
            stream, cat, "ccs", checkpoint=os.path.join(tmp_dir, ckpt), **params
        )
        q.awaitTermination()

    run("ckpt_ccs")
    got = {
        r.doc_id: r.cluster_id
        for r in streaming.clusters_from_state(cat, "ccs").collect()
    }
    assert got == {1: 1, 10: 1, 20: 1, 2: 2, 11: 2}  # 12 is a singleton: absent

    # one-shot batch clustering over the SAME documents, full pair
    # graph (not just doc-vs-admitted edges): must agree here because
    # every near-dup relation is witnessed by an admitted match
    all_docs = spark.createDataFrame(b1 + b2 + b3, "doc_id long, text string")
    tids = dedup.shingle_ids(dedup.word_shingles(all_docs, n=3), hashed=True)
    bands_t = dedup.lsh_bands(dedup.minhash_signatures(tids, k=16), bands=8, rows=2)
    cands = (
        bands_t.select(F.col("doc_id").alias("doc_a"), "band_id", "band_key")
        .join(
            bands_t.select(F.col("doc_id").alias("doc_b"), "band_id", "band_key"),
            on=["band_id", "band_key"],
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b").distinct()
    )
    pairs = dedup.pairwise_jaccard(cands, tids).filter(F.col("jaccard") >= 0.5)
    batch = {
        r.id: r.cluster_id
        for r in dedup.connected_components(pairs.select("doc_a", "doc_b")).collect()
    }
    assert batch == got

    # replay idempotence: a fresh checkpoint re-delivers every batch;
    # the per-batch delete-before-insert keeps the evidence (and so
    # the clusters) identical
    run("ckpt_ccs_replay")
    again = {
        r.doc_id: r.cluster_id
        for r in streaming.clusters_from_state(cat, "ccs").collect()
    }
    assert again == got


def test_line_census_sink_parity_and_replay(spark, tmp_dir):
    """Round 12: the streaming duplicate-line census — dedup decisions
    replayed from two-batch state must equal the one-shot batch
    dedup_lines on the concatenated stream, INCLUDING a duplicate that
    only exists across the batch boundary (neither batch sees both
    copies); a duplicate-append of a batch's partials is absorbed by
    the (batch_id, key) collapse; and the cross-batch canonical is the
    corpus-wide minimum even when the later batch carries the smaller
    (doc_id, line_no)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_warehouse_implementation_spark.operators import dedup

    # doc 9 arrives in batch 0 but doc 1 (batch 1) is the canonical
    # owner of "cross batch dup"; "shared footer" repeats within and
    # across batches; "only here" stays unique.
    b0 = [
        (9, "cross batch dup\nshared footer"),
        (10, "shared footer\nonly here"),
    ]
    b1 = [
        (1, "cross batch dup\nunique tail"),
        (12, "shared footer"),
    ]
    src = os.path.join(tmp_dir, "lc_src")
    os.makedirs(src)
    for i, rows in enumerate([b0, b1]):
        p = os.path.join(src, f"b{i}.parquet")
        pq.write_table(
            pa.table({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}), p
        )
        os.utime(p, (1_700_000_000 + 60 * i,) * 2)
    cat = WarehouseCatalog(spark, os.path.join(tmp_dir, "lc_wh"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming.line_census_sink(
        stream, cat, "lc", checkpoint=os.path.join(tmp_dir, "ckpt_lc")
    )
    q.awaitTermination()

    docs = spark.createDataFrame(b0 + b1, "doc_id long, text string")
    census = streaming.line_census_from_state(cat, "lc")
    got = {
        r.doc_id: tuple(r)[1:]
        for r in streaming.dedup_lines_against_state(docs, census).collect()
    }
    want = {r.doc_id: tuple(r)[1:] for r in dedup.dedup_lines(docs).collect()}
    assert got == want
    # the cross-batch dup dropped from doc 9 (batch 0) because doc 1
    # (batch 1) owns the corpus-wide canonical
    assert want[9][3] == "shared footer" and want[1][3].startswith("cross batch dup")

    # duplicate-append of batch 0's partials is absorbed
    state = cat.table("lc_lines")
    cat.insert_into("lc_lines", state.filter("batch_id = 0"))
    again = {
        r.doc_id: tuple(r)[1:]
        for r in streaming.dedup_lines_against_state(
            docs, streaming.line_census_from_state(cat, "lc")
        ).collect()
    }
    assert again == want


def test_file_census_sink_compaction_parity(spark, tmp_dir):
    """Round 12: the streaming small-file census — a BFD compaction
    plan from two-batch state must equal the one-shot plan on the
    concatenated stream, INCLUDING a file key whose bytes arrive split
    across the batch boundary; duplicate-append absorbed by the
    (batch_id, key) collapse."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_warehouse_implementation_spark.operators import layout

    # key ('a','en') spans both batches; sizes chosen so BFD packs
    # multiple bins under the derived 2*max capacity
    b0 = [(1, "a", "en", 50), (2, "a", "de", 80), (3, "b", "en", 30)]
    b1 = [(4, "a", "en", 40), (5, "b", "de", 120), (6, "c", "en", 10)]
    src = os.path.join(tmp_dir, "fc_src")
    os.makedirs(src)
    for i, rows in enumerate([b0, b1]):
        p = os.path.join(src, f"b{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": [r[0] for r in rows],
                    "source": [r[1] for r in rows],
                    "lang": [r[2] for r in rows],
                    "n_chars": [r[3] for r in rows],
                }
            ),
            p,
        )
        os.utime(p, (1_700_000_000 + 60 * i,) * 2)
    cat = WarehouseCatalog(spark, os.path.join(tmp_dir, "fc_wh"))
    stream = (
        spark.readStream.schema("doc_id long, source string, lang string, n_chars long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming.file_census_sink(
        stream, cat, "fc", checkpoint=os.path.join(tmp_dir, "ckpt_fc")
    )
    q.awaitTermination()

    docs = spark.createDataFrame(
        b0 + b1, "doc_id long, source string, lang string, n_chars long"
    )
    census = docs.groupBy("source", "lang").agg(
        F.sum("n_chars").cast("long").alias("file_bytes")
    )
    cap = census.agg((F.lit(2) * F.max("file_bytes")).cast("long").alias("_capc"))
    want = {
        (r.source, r.lang): (r.file_bytes, r.bin_id)
        for r in layout.bfd_bins(
            census.crossJoin(F.broadcast(cap)),
            size_col="file_bytes",
            capacity="_capc",
            tiebreak=["source", "lang"],
        ).collect()
    }
    got = {
        (r.source, r.lang): (r.file_bytes, r.bin_id)
        for r in streaming.compaction_plan_from_state(cat, "fc").collect()
    }
    assert got == want
    # the split key merged: ('a','en') = 50 + 40
    assert want[("a", "en")][0] == 90
    # duplicate-append of batch 0's partials is absorbed
    state = cat.table("fc_files")
    cat.insert_into("fc_files", state.filter("batch_id = 0"))
    again = {
        (r.source, r.lang): (r.file_bytes, r.bin_id)
        for r in streaming.compaction_plan_from_state(cat, "fc").collect()
    }
    assert again == want


def test_edge_census_sink_triangle_parity_and_replay(spark, tmp_dir):
    """Round 13 (VERDICT r12 #5): the streaming co-occurrence edge
    census — edges merged from two-batch state must EQUAL the one-shot
    cooccurrence_edges projection on the concatenated stream, and the
    triangle/k-core analytics over that state must equal their batch
    twins, INCLUDING a triangle whose closing pair only exists in
    batch 2 (neither batch sees the full triangle alone) and a
    cross-batch pair formed between a new member and a batch-1 member
    of the same group. A duplicated membership across batches must not
    double any weight; a duplicate-append of a batch's deltas is
    absorbed by the (batch_id, pair) collapse."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_warehouse_implementation_spark.operators import graph

    # b0: pairs (1,2) via part 100, (1,3) via part 101
    # b1: pair (2,3) via part 102 -> closes triangle {1,2,3};
    #     part 100 gains supplier 4 (cross-batch pairs 1-4, 2-4) and
    #     REPEATS membership (100, 1) which must not re-count
    b0 = [(100, 1), (100, 2), (101, 1), (101, 3)]
    b1 = [(102, 2), (102, 3), (100, 4), (100, 1)]
    src = os.path.join(tmp_dir, "ec_src")
    os.makedirs(src)
    for i, rows in enumerate([b0, b1]):
        p = os.path.join(src, f"b{i}.parquet")
        pq.write_table(
            pa.table({"pk": [r[0] for r in rows], "sk": [r[1] for r in rows]}), p
        )
        os.utime(p, (1_700_000_000 + 60 * i,) * 2)
    cat = WarehouseCatalog(spark, os.path.join(tmp_dir, "ec_wh"))
    stream = (
        spark.readStream.schema("pk long, sk long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming.edge_census_sink(
        stream, cat, "ec", checkpoint=os.path.join(tmp_dir, "ckpt_ec")
    )
    q.awaitTermination()

    all_rows = spark.createDataFrame(b0 + b1, "pk long, sk long")
    batch_edges = {
        (r.s1, r.s2): r.weight
        for r in graph.cooccurrence_edges(all_rows, "pk", "sk").collect()
    }
    state_edges = {
        (r.s1, r.s2): r.weight
        for r in streaming.cosupply_edges_from_state(cat, "ec").collect()
    }
    assert state_edges == batch_edges
    # the cross-batch pair (1,2) has weight 1 despite the repeated
    # (100, 1) membership; the triangle-closing pair exists
    assert state_edges[(1, 2)] == 1 and (2, 3) in state_edges

    tri_state = {
        r.node: r.n_triangles
        for r in streaming.triangles_from_state(cat, "ec", strong=False).collect()
    }
    tri_batch = {
        r.node: r.n_triangles
        for r in graph.count_triangles(
            graph.cooccurrence_edges(all_rows, "pk", "sk")
        ).collect()
    }
    assert tri_state == tri_batch
    # both triangles found: {1,2,3} closes only across the batch
    # boundary; {1,2,4} via the batch-1 member joining part 100
    assert tri_state == {1: 2, 2: 2, 3: 1, 4: 1}

    core_state = {
        r.node: r.core
        for r in streaming.kcore_from_state(cat, "ec", strong=False).collect()
    }
    core_batch = {
        r.node: r.core
        for r in graph.core_numbers(
            graph.cooccurrence_edges(all_rows, "pk", "sk")
        ).collect()
    }
    assert core_state == core_batch

    # duplicate-append of batch 0's deltas is absorbed
    state = cat.table("ec_edges")
    cat.insert_into("ec_edges", state.filter("batch_id = 0"))
    again = {
        (r.s1, r.s2): r.weight
        for r in streaming.cosupply_edges_from_state(cat, "ec").collect()
    }
    assert again == batch_edges


def test_labeled_word_sink_classifier_parity(spark, tmp_dir):
    """Round 13: the quality classifier retrained FROM STATE must
    equal one trained directly on the concatenated training slice —
    scores and argmax predictions both — including a label whose word
    mass arrives split across the batch boundary; duplicate-append
    absorbed by the (batch_id, key) collapse."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_warehouse_implementation_spark.operators import text as text_ops
    from data_warehouse_implementation_spark.plans.corpus_queries import _rule_labeled
    from data_warehouse_implementation_spark.session import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001")["documents"]
    train = docs.filter(F.col("doc_id") % 2 == 0)
    b0 = train.filter(F.col("doc_id") % 4 == 0).select("doc_id", "text").toPandas()
    b1 = train.filter(F.col("doc_id") % 4 != 0).select("doc_id", "text").toPandas()
    src = os.path.join(tmp_dir, "lw_src")
    os.makedirs(src)
    for i, pdf in enumerate([b0, b1]):
        p = os.path.join(src, f"b{i}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), p)
        os.utime(p, (1_700_000_000 + 60 * i,) * 2)
    cat = WarehouseCatalog(spark, os.path.join(tmp_dir, "lw_wh"))
    q = streaming.labeled_word_count_sink(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        cat,
        "lw",
        checkpoint=os.path.join(tmp_dir, "ckpt_lw"),
    )
    q.awaitTermination()

    profiles_s, priors_s = streaming.quality_model_from_state(cat, "lw")
    labeled = _rule_labeled(train)
    profiles_b = text_ops.train_language_profiles(
        labeled, lang_col="label", feature_fn=text_ops.words
    )
    priors_b = labeled.groupBy(F.col("label").alias("lang")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    # the state-rebuilt model TABLES equal the one-shot training run
    assert {tuple(r) for r in profiles_s.collect()} == {
        tuple(r) for r in profiles_b.collect()
    }
    assert {tuple(r) for r in priors_s.collect()} == {
        tuple(r) for r in priors_b.collect()
    }
    # and so do scored predictions over the full corpus
    pred_s = {
        (r.doc_id): (r.lang_pred_model, r.model_score)
        for r in text_ops.language_model_predict(
            text_ops.language_model_scores(
                docs, profiles_s, priors=priors_s, feature_fn=text_ops.words
            )
        ).collect()
    }
    pred_b = {
        (r.doc_id): (r.lang_pred_model, r.model_score)
        for r in text_ops.language_model_predict(
            text_ops.language_model_scores(
                docs, profiles_b, priors=priors_b, feature_fn=text_ops.words
            )
        ).collect()
    }
    assert pred_s == pred_b

    # duplicate-append of batch 0's partials absorbed
    st = cat.table("lw_lwords")
    cat.insert_into("lw_lwords", st.filter("batch_id = 0"))
    profiles_again, _ = streaming.quality_model_from_state(cat, "lw")
    assert {tuple(r) for r in profiles_again.collect()} == {
        tuple(r) for r in profiles_b.collect()
    }


def test_pr_curve_from_state_parity(spark, tmp_dir):
    """VERDICT r13 #8: the PR curve SERVED FROM the streaming training
    state must be bit-equal to the batch ``doc_quality_pr_curve`` when
    the sink ingested the batch query's training slice across >= 2
    micro-batches (word mass for both classes split over the batch
    boundary)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_warehouse_implementation_spark.plans import corpus_queries as cq
    from data_warehouse_implementation_spark.session import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001")["documents"]
    train = docs.filter(F.col("doc_id") % cq.QC_TRAIN_MOD == 0)
    # split by a digit ABOVE the train modulus so both halves are
    # non-empty (train ids are all multiples of QC_TRAIN_MOD)
    half = (F.col("doc_id") / cq.QC_TRAIN_MOD).cast("long") % 2
    b0 = train.filter(half == 0).select("doc_id", "text").toPandas()
    b1 = train.filter(half == 1).select("doc_id", "text").toPandas()
    assert len(b0) > 0 and len(b1) > 0
    src = os.path.join(tmp_dir, "prc_src")
    os.makedirs(src)
    for i, pdf in enumerate([b0, b1]):
        p = os.path.join(src, f"b{i}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), p)
        os.utime(p, (1_700_000_000 + 60 * i,) * 2)
    cat = WarehouseCatalog(spark, os.path.join(tmp_dir, "prc_wh"))
    q = streaming.labeled_word_count_sink(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        cat,
        "prc",
        checkpoint=os.path.join(tmp_dir, "ckpt_prc"),
    )
    q.awaitTermination()
    assert sorted(
        int(r.batch_id) for r in cat.table("prc_lpriors").select("batch_id").distinct().collect()
    ) == [0, 1]

    got = {
        r.doc_id: (r.rk, r.threshold, r.is_hq, r.precision_at_k, r.recall_at_k)
        for r in streaming.pr_curve_from_state(cat, "prc", docs).collect()
    }
    want = {
        r.doc_id: (r.rk, r.threshold, r.is_hq, r.precision_at_k, r.recall_at_k)
        for r in cq.doc_quality_pr_curve({"documents": docs}).collect()
    }
    assert got == want and len(got) > 0


def test_semdedup_admission_sink_parity_and_replay(spark, tmp_dir):
    """Streaming SemDeDup admission: the quantizer is a PUBLISHED
    catalog artifact; batch-1 vectors are all novel, batch-2 contains a
    near-copy of an admitted batch-1 vector (rejected with its match),
    an intra-batch pair novel vs the state (both admitted - the
    documented caveat), and a vector in a different cell. A fresh-
    checkpoint replay of both batches leaves state and verdicts
    unchanged (batch_id delete-first)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_warehouse_implementation_spark.plans import llm_queries as lq

    dim = 8

    def vec(x, y):
        v = [0.0] * dim
        v[0], v[1] = x, y
        return v

    cat = WarehouseCatalog(spark, os.path.join(tmp_dir, "sem_wh"))
    # publish the quantizer through the catalog (the deploy path)
    cat.create_table_as(
        "quantizer",
        spark.createDataFrame(
            [(0, vec(10.0, 0.0)), (1, vec(-10.0, 0.0))],
            "cen_id long, cen_vec array<float>",
        ),
    )
    b1 = [(100, vec(9.0, 5.0)), (101, vec(-9.0, 2.0))]
    b2 = [
        (200, vec(9.0, 5.01)),    # near-copy of 100 -> rejected, match 100
        (201, vec(9.0, -5.0)),    # cell 0, novel direction -> admitted
        (202, vec(9.0, -5.01)),   # intra-batch near-copy of 201 -> ADMITTED (caveat)
        (203, vec(-9.0, -4.0)),   # cell 1, novel -> admitted
    ]
    src = os.path.join(tmp_dir, "sem_src")
    os.makedirs(src)
    for i, rows in enumerate([b1, b2]):
        p = os.path.join(src, f"b{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                    "embedding": pa.array(
                        [r[1] for r in rows], pa.list_(pa.float32())
                    ),
                }
            ),
            p,
        )
        os.utime(p, (1_700_000_000 + 60 * i,) * 2)

    def run(ckpt):
        q = streaming.semdedup_admission_sink(
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            cat,
            "sem",
            checkpoint=os.path.join(tmp_dir, ckpt),
            quantizer_table="quantizer",
            tau=lq.SEMDEDUP_TAU,
        )
        q.awaitTermination()

    run("ckpt_sem")
    v = {r.vec_id: r for r in cat.table("sem_verdicts").collect()}
    assert set(v) == {100, 101, 200, 201, 202, 203}
    assert v[200].is_dup and v[200].matched_vec_id == 100 and v[200].cosine >= 0.92
    for i in (100, 101, 201, 202, 203):
        assert not v[i].is_dup, i
    assert not v[200].cell_capped
    state = {r.vec_id for r in cat.table("sem_members").collect()}
    assert state == {100, 101, 201, 202, 203}
    # cells assigned against the published quantizer
    cells = {r.vec_id: r.cell_id for r in cat.table("sem_members").collect()}
    assert cells[100] == 0 and cells[101] == 1 and cells[203] == 1

    # replay idempotence: fresh checkpoint, same batches, same state
    before_m = sorted(tuple(r) for r in cat.table("sem_members").collect())
    before_v = sorted(tuple(r) for r in cat.table("sem_verdicts").collect())
    run("ckpt_sem_replay")
    assert sorted(tuple(r) for r in cat.table("sem_members").collect()) == before_m
    assert sorted(tuple(r) for r in cat.table("sem_verdicts").collect()) == before_v


def test_semdedup_admission_sink_with_trained_quantizer(spark, tmp_dir):
    """Round 15 (VERDICT r14 #3, streaming face): the production
    quantizer is TRAINED once (``similarity.kmeans_fit`` over a
    bootstrap corpus), published through the catalog, and the
    admission sink consumes the published copy — cells the sink
    assigns must equal batch ``assign_cells`` against the same trained
    centroids, and a near-copy is rejected inside its TRAINED cell."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_warehouse_implementation_spark.operators import similarity
    from data_warehouse_implementation_spark.plans import llm_queries as lq

    dim = 8

    def vec(x, y):
        v = [0.0] * dim
        v[0], v[1] = x, y
        return v

    # bootstrap corpus: two blobs; the first-2 seed vectors BOTH sit in
    # blob A, so only TRAINING moves a centroid onto blob B
    boot = [
        (0, vec(10.0, 0.2)), (1, vec(10.0, -0.2)),
        (2, vec(9.5, 0.0)), (3, vec(10.5, 0.1)),
        (4, vec(-10.0, 0.1)), (5, vec(-9.5, -0.1)), (6, vec(-10.5, 0.0)),
    ]
    corpus = spark.createDataFrame(
        boot, "vec_id long, embedding array<float>"
    )
    cen, _ = similarity.kmeans_fit(corpus, k=2, iters=3)
    cen_rows = {r.cen_id: r.cen_vec for r in cen.collect()}
    # training separated the blobs: the two centroids point opposite
    # ways on axis 0 (the seed pair both pointed at blob A)
    signs = sorted(v[0] > 0 for v in cen_rows.values())
    assert signs == [False, True], cen_rows

    cat = WarehouseCatalog(spark, os.path.join(tmp_dir, "semt_wh"))
    cat.create_table_as("quantizer_trained", cen)

    b1 = [(100, vec(9.0, 5.0)), (101, vec(-9.0, 2.0))]
    b2 = [
        (200, vec(9.0, 5.01)),   # near-copy of 100 -> rejected in its trained cell
        (201, vec(-9.0, -4.0)),  # blob-B cell, novel -> admitted
    ]
    src = os.path.join(tmp_dir, "semt_src")
    os.makedirs(src)
    for i, rows in enumerate([b1, b2]):
        p = os.path.join(src, f"b{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                    "embedding": pa.array(
                        [r[1] for r in rows], pa.list_(pa.float32())
                    ),
                }
            ),
            p,
        )
        os.utime(p, (1_700_000_000 + 60 * i,) * 2)

    q = streaming.semdedup_admission_sink(
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        cat,
        "semt",
        checkpoint=os.path.join(tmp_dir, "ckpt_semt"),
        quantizer_table="quantizer_trained",
        tau=lq.SEMDEDUP_TAU,
    )
    q.awaitTermination()

    v = {r.vec_id: r for r in cat.table("semt_verdicts").collect()}
    assert v[200].is_dup and v[200].matched_vec_id == 100
    assert not v[201].is_dup
    # sink cells == batch assign_cells against the SAME published copy
    all_vecs = spark.createDataFrame(
        b1 + b2, "vec_id long, embedding array<float>"
    )
    expect = {
        r.vec_id: r.cell_id
        for r in similarity.assign_cells(all_vecs, cat.table("quantizer_trained")).collect()
    }
    got = {r.vec_id: r.cell_id for r in cat.table("semt_members").collect()}
    for vid, cell in got.items():
        assert cell == expect[vid], (vid, cell, expect[vid])
