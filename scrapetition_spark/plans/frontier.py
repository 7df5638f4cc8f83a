"""Frontier algebra: ordering, politeness due-set, discovery merge.

Re-expresses the reference's in-memory worklist algebra
(/root/reference/src/Network/Scrapetition/App.hs:38-69) as
set-oriented plans over the ``urls`` table:

- C1 frontier pop  → per-epoch *due set* (ordered anti-join + budget)
- C3 FIFO/LIFO merge with ``Data.List.union`` dedup semantics
- C4 deterministic discovery order via the total lineage key
  ``(discovery_epoch, source_fetch_seq, dispatcher_idx, pos)``
- C5 ``\\\\ seen`` → bloom-prefiltered anti-join (plans/seen.py)
- C7 cross-domain gate, C6 follow gate
- C9 politeness: per-host fetch budget per epoch via a window over
  host-partitioned rows (the reference sleeps 2 s globally,
  App.hs:68; the epoch driver enforces wall-clock ≥ politeness_sec
  per epoch so budget=1 ⇒ ≥2 s between same-host fetches)

Ordering semantics (verified against a pure-Python simulator of the
Haskell loop in tests/reference_sim.py):

- FIFO (``urls `union` new``): first discovery wins both position
  and dedup ⇒ ascending lineage key.
- LIFO (``new `union` urls``): the *new* occurrence wins — a
  re-discovered, still-unfetched URL jumps to the front
  (``Data.List.union`` keeps the left operand and deletes the
  duplicate from the right). Page-internal order is never reversed
  (comment at App.hs:65) ⇒ ordering is (discovery_epoch DESC,
  source_fetch_seq DESC, dispatcher_idx ASC, pos ASC) and
  re-discovery *updates* the lineage key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from scrapetition_spark.config import CrawlConfig
from scrapetition_spark.functions.urls import url_domain
from scrapetition_spark.plans.seen import BloomFilter, unseen

LINEAGE_COLS = ["discovery_epoch", "source_fetch_seq", "dispatcher_idx", "pos"]


def order_key(cfg: CrawlConfig) -> list[Column]:
    if cfg.lifo:
        return [
            F.col("discovery_epoch").desc(),
            F.col("source_fetch_seq").desc(),
            F.col("dispatcher_idx").asc(),
            F.col("pos").asc(),
        ]
    return [F.col(c).asc() for c in LINEAGE_COLS]


def plan_due(
    urls: DataFrame,
    seen: DataFrame,
    bloom: BloomFilter | None,
    cfg: CrawlConfig,
    fetch_seq_base: int,
    robots: DataFrame | None = None,
) -> DataFrame:
    """The epoch due set: unseen frontier rows, robots-filtered,
    politeness-budgeted per host, globally capped, with assigned
    ``fetch_seq`` continuing the global fetch counter."""
    active = urls.filter(
        (F.col("in_frontier") == 1) & F.col("first_seen").isNull()
    )
    cand = unseen(active, seen, bloom)

    if robots is not None and cfg.respect_robots:
        deny = robots.filter(F.col("allow") == 0).select(
            F.col("host").alias("r_host"), "path_prefix"
        )
        hit = cand.join(
            deny,
            (cand["host"] == deny["r_host"])
            & cand["url"].startswith(
                F.concat(F.lit("https://"), deny["r_host"], deny["path_prefix"])
            ),
            "left_semi",
        )
        cand = cand.join(hit.select("url"), ["url"], "left_anti")

    key = order_key(cfg)
    if cfg.sequential:
        due = cand.orderBy(*key).limit(1)
    else:
        per_host = Window.partitionBy("host_bucket", "host").orderBy(*key)
        due = (
            cand.withColumn("__hr", F.row_number().over(per_host))
            .filter(F.col("__hr") <= cfg.per_host_budget)
            .drop("__hr")
            .orderBy(*key)
            .limit(cfg.max_urls_per_epoch)
        )
    # global fetch_seq: a single-partition window over the (small,
    # budget-capped) due set — bounded by max_urls_per_epoch, not by
    # frontier size, so the single task is fine at scale.
    w = Window.orderBy(*key)
    return due.withColumn(
        "fetch_seq", (F.row_number().over(w) - 1 + F.lit(fetch_seq_base)).cast("long")
    )


def gate_discovered(discovered: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """Follow/cross-domain gates (C6/C7, App.hs:57-62) + within-epoch
    first/last-occurrence dedup (the sequential union semantics above).

    ``discovered``: one row per (source page × dispatcher × position)
    with columns (target, source_fetch_seq, dispatcher_idx, pos).
    Returns frontier-ready rows keyed by target with final lineage.
    """
    if not cfg.follow_links:
        return discovered.limit(0)
    d = discovered
    if not cfg.cross_domain:
        d = d.filter(url_domain(F.col("target")) == F.lit(cfg.start_domain))
    if cfg.lifo:
        order = [
            F.col("source_fetch_seq").desc(),
            F.col("dispatcher_idx").asc(),
            F.col("pos").asc(),
        ]
    else:
        order = [
            F.col("source_fetch_seq").asc(),
            F.col("dispatcher_idx").asc(),
            F.col("pos").asc(),
        ]
    w = Window.partitionBy("target").orderBy(*order)
    return (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
