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

EVENTS_STREAM_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string,"
    " value double, props string"
)


def stream_events(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of events parquet (ts arrives as nanos-long,
    converted to a proper timestamp for watermarking)."""
    raw = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(path)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


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
    Spark doesn't natively provide). Returns the started query."""

    def apply_batch(batch: DataFrame, _batch_id: int) -> None:
        spark = batch.sparkSession
        if catalog.exists(table):
            current = catalog.table(table)
        else:
            current = spark.createDataFrame(
                [], scd.scd2_apply(
                    _empty_like(spark, batch, order_col), batch.limit(0), keys,
                    as_of=as_of, order_col=order_col,
                ).schema,
            )
        new_state = scd.scd2_apply(current, batch, keys, as_of=as_of, order_col=order_col)
        catalog.replace(table, new_state, internal=True)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
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
