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
- ``stream_ingest_dedup``: the continuous-ingest near-dup gate —
  each micro-batch of incoming DOCUMENTS probes a stored MinHash
  band-bucket index (operators/dedup.incremental_minhash_dedup) and
  emits one admit/reject decision per doc via ``foreachBatch``. The
  gate is STATEFUL: admitted docs join the index (stored parquet, no
  caching), so later dups of streamed docs — and same-batch dups —
  are rejected too, not just dups of the original corpus.

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


ADMIT_OUTPUT = StructType(
    [
        StructField("host", StringType()),
        StructField("target", StringType()),
        StructField("event_time", TimestampType()),
        StructField("admit_seq", LongType()),
    ]
)

ADMIT_STATE = StructType([StructField("n_admitted", LongType())])


def stream_politeness_admit(
    stream: DataFrame, host_budget: int = 5
) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): the
    streaming twin of the batch politeness queue (plans/frontier.py
    C9). Per host, admit discovered URLs up to a lifetime
    ``host_budget`` and assign each a dense per-host ``admit_seq``;
    everything past the budget is suppressed. The admitted count
    lives in GroupState, so the cap holds ACROSS micro-batches —
    a host that used its budget in batch 1 admits nothing in batch 9.

    Determinism: rows are ordered (event_time, target) within each
    batch before admission, so for any batch split that preserves
    per-host event-time order the admitted set and sequence are
    identical (tested one-batch vs file-at-a-time). Arrow-batched
    pandas per host group — no per-row Python; state is one int per
    host, bounded by the distinct-host count exactly like the batch
    frontier's per-host aggregates."""
    import pandas as pd  # noqa: PLC0415 — executor-side import
    from pyspark.sql.streaming.state import GroupStateTimeout

    def admit(key, pdfs, state):
        (host,) = key
        n = state.get[0] if state.exists else 0
        parts = [p for p in pdfs if len(p)]
        batch = (
            pd.concat(parts).sort_values(["event_time", "target"])
            if parts
            else pd.DataFrame(columns=["target", "event_time"])
        )
        room = max(0, host_budget - n)
        adm = batch.head(room).copy()
        adm["host"] = host
        adm["admit_seq"] = range(n, n + len(adm))
        state.update((n + len(adm),))
        yield adm[["host", "target", "event_time", "admit_seq"]]

    return (
        stream.groupBy("host")
        .applyInPandasWithState(
            admit, ADMIT_OUTPUT, ADMIT_STATE, "append",
            GroupStateTimeout.NoTimeout,
        )
    )


DOC_STREAM = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("event_time", TimestampType()),
    ]
)


def stream_ingest_dedup(
    spark: SparkSession,
    drop_dir: str,
    corpus: DataFrame,
    sink,
    checkpoint_dir: str,
    n_bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.02,
    available_now: bool = False,
    state_dir: str | None = None,
):
    """Continuous-ingest dedup GATE: incoming documents land as
    parquet files in ``drop_dir``; every micro-batch emits ONE
    decision row PER INCOMING DOC — ``(doc_id, admitted, n_matches,
    best_jaccard, matched_doc)`` — via ``sink(decisions, batch_id)``.
    A doc is rejected when it near-dups (verified n-gram Jaccard ≥
    ``threshold``, the batch ``d9`` code path) ANY of: the corpus, a
    doc admitted in an EARLIER micro-batch, or a smaller-``doc_id``
    doc in the SAME batch (intra-batch order is doc_id; a doc whose
    batch-mate is itself rejected still rejects — transitively it
    duplicates the same content). Clean docs therefore always get an
    ``admitted = true`` row; a sink never needs the raw batch to
    reconstruct admissions. Stream-wide unique doc_ids are the
    caller's contract (as for any frontier key).

    State is STORED PARQUET under ``state_dir`` (default
    ``<checkpoint_dir>/dedup-state``), exactly the production shape:
    the corpus band-bucket index is written once at stream start, and
    each batch appends its admitted docs + their buckets as a
    ``batch-<id>`` directory — no driver/executor caching, nothing
    pinned across restarts (a restarted stream rebuilds its view from
    the same files). Replay-safe: a re-run batch overwrites its own
    ``batch-<id>`` dirs and EXCLUDES them from the index it probes,
    so its decisions are bit-identical to the first run. Per-batch
    cost is the bounded probe + candidate-only verify; the state dir
    grows one small dir per batch (compact periodically in a
    long-lived deployment, like any streaming sink)."""
    import os

    from scrapetition_spark.operators.dedup import (
        incremental_minhash_dedup,
        lsh_verified_neardups,
        minhash_buckets,
    )

    state = state_dir or os.path.join(checkpoint_dir, "dedup-state")
    corpus_idx_path = os.path.join(state, "corpus_index")
    if not os.path.isdir(corpus_idx_path):
        minhash_buckets(
            corpus.select("doc_id", "text", "lang"), n_bands, shingle_n
        ).write.mode("overwrite").parquet(corpus_idx_path)

    def _batch_dirs(root: str, exclude: str) -> list[str]:
        # bounded driver-side metadata: one entry per past micro-batch
        if not os.path.isdir(root):
            return []
        return sorted(
            os.path.join(root, d)
            for d in os.listdir(root)
            if d != exclude
        )

    def probe(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.select("doc_id", "text", "lang")
        me = f"batch-{batch_id}"
        doc_dirs = _batch_dirs(os.path.join(state, "admitted_docs"), me)
        bkt_dirs = _batch_dirs(os.path.join(state, "admitted_buckets"), me)
        known = corpus.select("doc_id", "text", "lang")
        idx = spark.read.parquet(corpus_idx_path)
        if doc_dirs:
            known = known.unionByName(spark.read.parquet(*doc_dirs))
            idx = idx.unionByName(spark.read.parquet(*bkt_dirs))
        cross = incremental_minhash_dedup(
            known, batch,
            n_bands=n_bands, shingle_n=shingle_n, threshold=threshold,
            corpus_index=idx,
        )
        selfp = lsh_verified_neardups(
            batch, n_bands=n_bands, threshold=threshold, shingle_n=shingle_n
        )
        matches = (
            cross.filter("is_dup")
            .select(
                F.col("new_doc").alias("doc_id"),
                F.col("corpus_doc").alias("matched_doc"),
                "jaccard",
            )
            .unionByName(
                selfp.select(
                    F.col("doc_b").alias("doc_id"),
                    F.col("doc_a").alias("matched_doc"),
                    "jaccard",
                )
            )
        )
        agg = matches.groupBy("doc_id").agg(
            F.count("*").cast("int").alias("n_matches"),
            F.max("jaccard").alias("best_jaccard"),
            F.min("matched_doc").alias("matched_doc"),
        )
        decisions = (
            batch.select("doc_id")
            .join(agg, "doc_id", "left")
            .select(
                "doc_id",
                F.col("matched_doc").isNull().alias("admitted"),
                F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
                "best_jaccard",
                "matched_doc",
            )
        )
        sink(decisions, batch_id)
        admitted = batch.join(
            decisions.filter("admitted").select("doc_id"), "doc_id",
            "left_semi",
        )
        admitted.write.mode("overwrite").parquet(
            os.path.join(state, "admitted_docs", me)
        )
        minhash_buckets(admitted, n_bands, shingle_n).write.mode(
            "overwrite"
        ).parquet(os.path.join(state, "admitted_buckets", me))

    stream = spark.readStream.schema(DOC_STREAM).parquet(drop_dir)
    writer = stream.writeStream.foreachBatch(probe).option(
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


def windowed_event_rollup(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    with_users: bool = True,
) -> DataFrame:
    """Tumbling-window event rollup — counts, value totals and
    (optionally) distinct actors per (window, event_type). One
    definition serves both execution modes: on a stream the watermark
    bounds state (late rows inside the horizon still update their
    window, state past it is dropped); on a static frame
    ``withWatermark`` is a documented no-op, so the batch run of the
    SAME code is what the streaming test equates against (and the
    driver hash-checks against DuckDB ``time_bucket``).

    ``with_users=False`` is the streaming form: distinct aggregation
    is unsupported inside a streaming groupBy, so the exact
    distinct-user count is batch-only (a stream wanting it chains a
    second windowed agg over ``window_time`` or accepts
    ``approx_count_distinct`` — both documented trade-offs, neither
    silently substituted here).

    Scale shape: a hash aggregate on (window, event_type) — map-side
    partials per input partition, one shuffle of partials."""
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    ]
    if with_users:
        aggs.insert(1, F.countDistinct("user_id").alias("n_users"))
    # watermarks require TIMESTAMP (LTZ); parquet testdata is NTZ.
    # The session timezone is pinned UTC (session.py), so the LTZ
    # round-trip is value-preserving; the output goes back to NTZ so
    # batch/oracle comparisons stay timezone-naive.
    out = (
        events.withColumn("__ts", F.col("ts").cast("timestamp"))
        .withWatermark("__ts", watermark)
        .groupBy(F.window("__ts", window).alias("w"), "event_type")
        .agg(*aggs)
    )
    cols = ["n_events"] + (["n_users"] if with_users else []) + ["sum_value"]
    return out.select(
        F.col("w.start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        *cols,
    )
