"""Structured-Streaming consumer for the harvest delta stream.

The reference pushes a message per stored document to an Azure queue /
webhook so downstream services learn about new harvests
(/root/reference/providers/store/azureQueueStore.js:66-70,
webhookDeltaStore.js:17-37). Our engine appends the same delta stream to
the `harvest_events` table; this module is the Spark-native consumer
side: `readStream` over the table's parquet files → watermarked windowed
aggregation → sink. The crawl itself stays epoch-batch (SURVEY.md §2.5 —
the reference has no streaming semantics to reproduce); this is the
integration point for downstream stream processing of crawl output.

Event time is deterministic (epoch × 5 s from a fixed anchor — one epoch
≡ the reference's 5 s loop quantum), so windowed results are replayable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

HARVEST_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("doc_type", T.StringType()),
        T.StructField("epoch", T.IntegerType()),
        T.StructField("event_ts", T.TimestampType()),
    ]
)


def harvest_event_stream(spark: SparkSession, store_path: str, max_files: int = 16) -> DataFrame:
    """Streaming DataFrame over the snapshot store's harvest_events data
    directory (file source; each epoch commit adds one new file set —
    the stream picks up exactly the committed files)."""
    path = os.path.join(store_path, "data", "harvest_events", "*")
    return (
        spark.readStream.schema(HARVEST_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def windowed_harvest_counts(events: DataFrame, window: str = "10 seconds", watermark: str = "30 seconds") -> DataFrame:
    """Per-window, per-doc-type harvest rates with late-data handling:
    the watermark bounds state for out-of-order epochs (re-runs/backfill
    commits can land files whose event time is behind the head)."""
    return (
        events.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window).alias("w"), "doc_type")
        .agg(F.count("*").alias("n_docs"), F.approx_count_distinct("doc_id").alias("n_unique"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "doc_type", "n_docs", "n_unique",
        )
    )


def run_to_memory(spark: SparkSession, store_path: str, query_name: str = "harvest_counts"):
    """Start the consumer with an in-memory sink (tests / interactive);
    production swaps the sink for kafka/delta — same plan."""
    q = (
        windowed_harvest_counts(harvest_event_stream(spark, store_path))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    return q
