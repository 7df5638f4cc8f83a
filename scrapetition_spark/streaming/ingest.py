"""Streaming URL ingest: discovered-URL batches as an unbounded
stream.

The epoch crawl loop (crawl.py) is the batch path. In a production
deployment the same frontier tables can also be fed by a continuous
stream — e.g. sitemap pings, off-cluster fetchers, or log-shipped
link discoveries landing as files in a drop directory. This module
expresses that path with Structured Streaming:

- ``stream_discovered_urls``: ``readStream`` over a parquet drop
  directory of (target, discovery_epoch, source_fetch_seq,
  dispatcher_idx, pos, event_time) rows → watermarked
  ``dropDuplicatesWithinWatermark`` on the URL (the streaming
  analogue of the frontier's MERGE dedup — state is bounded by the
  watermark horizon, which is what makes it viable at 10^10 URLs) →
  ``foreachBatch`` merge into the catalog frontier. Each micro-batch
  reuses the exact batch merge (idempotent), so the stream and the
  epoch loop can safely coexist.
- ``stream_seen_counts``: windowed per-host fetch counts with
  watermarked late-data handling — the live-metrics view of
  ``crawl_metrics``.

Tested with the ``availableNow`` trigger (bounded drain) in
tests/test_streaming.py — the same code runs unbounded in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

DISCOVERED_STREAM = StructType(
    [
        StructField("target", StringType()),
        StructField("discovery_epoch", IntegerType()),
        StructField("source_fetch_seq", LongType()),
        StructField("dispatcher_idx", IntegerType()),
        StructField("pos", IntegerType()),
        StructField("event_time", TimestampType()),
    ]
)


def stream_discovered_urls(
    spark: SparkSession,
    drop_dir: str,
    sink,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
    available_now: bool = False,
):
    """Start the ingest stream. ``sink(batch_df, batch_id)`` receives
    each deduplicated micro-batch (the engine passes a closure that
    runs the catalog's ``merge_insert`` — state dedup here only
    *reduces* merge work; the merge itself stays idempotent, so
    watermark-expired re-arrivals are still correct)."""
    stream = (
        spark.readStream.schema(DISCOVERED_STREAM)
        .parquet(drop_dir)
        .withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(["target"])
    )
    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_seen_counts(
    stream: DataFrame, window: str = "1 minute", watermark: str = "5 minutes"
) -> DataFrame:
    """Windowed per-host discovery counts over a (target, event_time)
    stream — watermarked so late rows update the open window and
    state is dropped past the horizon."""
    from scrapetition_spark.functions.urls import url_domain

    return (
        stream.withWatermark("event_time", watermark)
        .withColumn("host", url_domain(F.col("target")))
        .groupBy(F.window("event_time", window).alias("w"), "host")
        .agg(F.count("*").alias("n_urls"))
        .select(
            F.col("w.start").alias("window_start"),
            "host",
            "n_urls",
        )
    )
