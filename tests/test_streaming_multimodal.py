"""Streaming extension + multimodal plumbing tests (SURVEY §2.10 +
brief requirements). Streaming correctness = batch/stream parity: the
streaming windowed aggregate must equal its batch twin on the same
input."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from data_warehouse_implementation_spark import streaming
from data_warehouse_implementation_spark.operators import multimodal
from data_warehouse_implementation_spark.sources.catalog import WarehouseCatalog

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TMP = os.path.join(REPO, ".cache", "stream_tests")


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
        spark.read.parquet(src)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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


def test_real_decode_is_explicitly_stubbed(spark):
    df = spark.createDataFrame([], multimodal.MEDIA_SCHEMA)
    if not multimodal.HAVE_IMAGE_CODEC:
        with pytest.raises(NotImplementedError):
            multimodal.decode_images(df)
