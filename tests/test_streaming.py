"""Streaming ingest tests: file-source stream → watermarked dedup →
foreachBatch merge into the catalog frontier, drained with the
availableNow trigger (bounded run of the unbounded pipeline)."""

from __future__ import annotations

import datetime as dt
import tempfile

from pyspark.sql import functions as F

from scrapetition_spark.schemas import UNIQUE_KEYS, URLS
from scrapetition_spark.sources.catalog import Catalog
from scrapetition_spark.streaming.ingest import (
    DISCOVERED_STREAM,
    stream_discovered_urls,
    stream_seen_counts,
)

T0 = dt.datetime(2020, 1, 1, 12, 0, 0)


def _drop(spark, path, rows):
    spark.createDataFrame(rows, DISCOVERED_STREAM).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_stream_ingest_merges_frontier(spark):
    drop = tempfile.mkdtemp(prefix="stream-drop-")
    ckpt = tempfile.mkdtemp(prefix="stream-ckpt-")
    cat = Catalog(spark, tempfile.mkdtemp(prefix="stream-cat-"))

    rows = [
        (f"https://h{i % 3}.test/d/{i}", 0, 0, 0, i, T0 + dt.timedelta(seconds=i))
        for i in range(20)
    ]
    # duplicate re-discoveries inside the watermark horizon
    rows += rows[:5]
    _drop(spark, drop, rows)

    from scrapetition_spark.crawl import CrawlEngine
    from scrapetition_spark.config import CrawlConfig

    eng = CrawlEngine(
        spark, cat, CrawlConfig(start_domain=""), documents=None, use_bloom=False
    )

    def sink(batch_df, batch_id):
        cat.merge_insert(
            "urls",
            eng._url_row(batch_df, scheduled=True),
            UNIQUE_KEYS["urls"],
            URLS,
            order_cols=["pos"],
        )

    q = stream_discovered_urls(
        spark, drop, sink, ckpt, watermark="10 minutes", available_now=True
    )
    q.awaitTermination(120)

    urls = cat.read("urls", URLS)
    got = {r["url"] for r in urls.collect()}
    assert got == {f"https://h{i % 3}.test/d/{i}" for i in range(20)}
    assert urls.count() == 20  # stream dedup + idempotent merge

    # second drop: 5 repeats + 5 new → only the new ones add rows
    rows2 = [
        (f"https://h{i % 3}.test/d/{i}", 1, 9, 0, i, T0 + dt.timedelta(seconds=100 + i))
        for i in range(15, 25)
    ]
    _drop(spark, drop, rows2)
    q2 = stream_discovered_urls(
        spark, drop, sink, ckpt, watermark="10 minutes", available_now=True
    )
    q2.awaitTermination(120)
    assert cat.read("urls", URLS).count() == 25


def test_stream_seen_counts_windows(spark):
    rows = [
        (f"https://h{i % 2}.test/d/{i}", 0, 0, 0, i, T0 + dt.timedelta(seconds=30 * i))
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, DISCOVERED_STREAM)
    out = stream_seen_counts(df, window="1 minute", watermark="5 minutes")
    got = {
        (r["window_start"].strftime("%H:%M"), r["host"]): r["n_urls"]
        for r in out.collect()
    }
    # 8 rows at 30s spacing → 2 per 1-minute window, hosts alternate
    assert got[("12:00", "h0.test")] == 1 and got[("12:00", "h1.test")] == 1
    assert sum(got.values()) == 8
