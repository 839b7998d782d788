"""Structured Streaming skin over the extraction operators.

The reference is batch-only (SURVEY.md §2.9): its thread/queue pipeline
maps to Spark's task scheduler, and the north rule's resumability maps
to either the chunked lineage runner (lineage.py) or — equivalently —
this Structured Streaming skin: a file-source stream over the pages
table, the SAME extraction operators (mapInPandas is streaming-capable),
and a checkpointed sink. Trigger.AvailableNow drains everything present
and stops, giving exactly-once incremental batch runs; new page files
appearing between runs are picked up automatically from the checkpoint.

Also provides the canonical watermarked event-time window aggregate for
late-data streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators.extract import dom_branch, is_image_page, ocr_branch

PAGES_DDL = ("url string, warc_ts timestamp, html binary, "
             "text string, lang string")


def stream_extract(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    protos_bc,
    max_files_per_trigger: int | None = None,
):
    """Incremental extraction: parquet file stream → two-branch extract →
    parquet sink with checkpoint. Returns the started query (caller
    awaits termination; AvailableNow stops when caught up)."""
    reader = (
        spark.readStream.schema(PAGES_DDL).format("parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.load(pages_dir)

    ocr = ocr_branch(pages.filter(is_image_page(F.col("html"))), protos_bc) \
        .withColumn("branch", F.lit("ocr"))
    dom = dom_branch(pages.filter(~is_image_page(F.col("html")))) \
        .withColumn("branch", F.lit("dom"))
    result = ocr.unionByName(dom)

    return (
        result.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts — the streaming aggregation
    shape (works identically on a batch DF, where the watermark is a
    no-op)."""
    src = events
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"),
             F.round(F.avg("value"), 4).alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n", "avg_value")
    )
