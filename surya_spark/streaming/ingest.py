"""Structured Streaming surface: incremental document ingest.

The reference is batch-only (SURVEY.md §2.10); this is the optional
incremental-ingest path the engine adds: new document files land in a
directory/Iceberg table, each micro-batch runs the SAME batch extraction
dataflow via foreachBatch, output appends to the out_spans table. Source
progress + exactly-once bookkeeping come from the streaming checkpoint;
the heavy per-stage resume inside a batch stays with plans/checkpoint.py.

Also provides watermarked windowed aggregation over an event stream —
the standard late-data pattern — so the engine's streaming operator
surface (window, watermark, append mode) is exercised and tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas, pipeline


def stream_extract(
    spark: SparkSession,
    docs_dir: str,
    page_blobs: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    with_tables: bool = True,
    available_now: bool = True,
):
    """documents parquet dir (streamed) → out_spans parquet (append).

    foreachBatch reuses the batch extract() verbatim — one code path for
    batch and streaming, which is the point of Structured Streaming."""
    src = (
        spark.readStream.schema(schemas.DOCUMENTS)
        .option("maxFilesPerTrigger", "16")
        .parquet(docs_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = pipeline.extract(batch_df, page_blobs, with_tables=with_tables)
        out.write.mode("append").parquet(out_path)

    writer = src.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts per event_type with a watermark for late
    data; works on both a static frame and a stream (append mode)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n", "avg_value",
        )
    )
