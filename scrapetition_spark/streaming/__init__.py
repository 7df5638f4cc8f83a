"""Structured Streaming surfaces (engine addition; the reference is
batch-only — SURVEY.md §2.5 note)."""

from scrapetition_spark.streaming.ingest import (  # noqa: F401
    stream_discovered_urls,
    stream_seen_counts,
)
