"""Decompose the discovered-stage seconds (VERDICT r03 #4 probe).

Reproduces the epoch's discovered stage piecewise on the scaling web:
  (a) span-array URL extraction alone (count, no materialization)
  (b) extraction + localCheckpoint (block-manager write), no join
  (c) extraction + broadcast lineage join + localCheckpoint
      (= the real stage)
so a flat 8→32 stage can be attributed to compute vs checkpoint
write vs broadcast build/probe.

Usage: python tools/disc_probe.py <cpus> [docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from scaling_bench import WEB_DIR
from scrapetition_spark.session import get_spark
from scrapetition_spark.config import CrawlConfig, Dispatcher
from scrapetition_spark.parse import discover_urls
from scrapetition_spark.plans.frontier import plan_due, assign_fetch_seq


def main() -> None:
    cpus = sys.argv[1]
    docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_600_000
    path = f"{WEB_DIR}-{docs}"
    spark = get_spark(app_name=f"disc-probe-{cpus}",
                      master=f"local[{cpus}]", shuffle_partitions=64)
    web = spark.read.parquet(path)
    cfg = CrawlConfig(
        start_domain="", follow_links=True, cross_domain=True,
        politeness_sec=0, per_host_budget=1000, max_urls_per_epoch=None,
        dispatchers=(Dispatcher("bench", r"^https://h\d+\.test/.*", "comment",
                                url_collectors=("js-comment-loader",
                                                "pager__page")),),
    )
    dispatchers = [(i, d.url_scheme, d.url_collectors)
                   for i, d in enumerate(cfg.dispatchers) if d.url_collectors]

    # due + fetch exactly as run_epoch does
    from scrapetition_spark.schemas import URLS, URLS_SEEN
    from scrapetition_spark.session import local_df
    from scrapetition_spark.crawl import CrawlEngine
    from scrapetition_spark.sources.catalog import Catalog
    import tempfile

    cat = Catalog(spark, tempfile.mkdtemp(prefix=f"discprobe{cpus}-"))
    eng = CrawlEngine(spark, cat, cfg, web, expected_urls=1 << 22)
    eng.seed_frame(web.select(F.col("doc_id").alias("target")))
    urls = cat.read("urls", URLS)
    seen = cat.read("urls_seen", URLS_SEEN)
    raw = plan_due(urls, seen, eng._seen_filter(), cfg, 0, None).select(
        "url", "host", "host_bucket", "discovery_epoch",
        "source_fetch_seq", "dispatcher_idx", "pos").localCheckpoint()
    due, n_due = assign_fetch_seq(raw, cfg, 0)
    due = due.select("url", "host", "host_bucket", "fetch_seq").localCheckpoint()
    docs_df = web
    hit = (
        docs_df.join(F.broadcast(due), docs_df["doc_id"] == due["url"], "inner")
        .select(due["url"].alias("url"), due["fetch_seq"], docs_df["doc_id"],
                docs_df["spans"],
                F.coalesce(docs_df["status"], F.lit(200)).alias("status"),
                docs_df["encoding"])
        .localCheckpoint()
    )
    print(f"setup done: n_due={n_due} hit_parts={hit.rdd.getNumPartitions()}",
          flush=True)
    due_seq = due.select("url", "fetch_seq")

    def timed(label, thunk):
        t0 = time.time()
        r = thunk()
        print(f"{label}: {time.time() - t0:.1f}s ({r})", flush=True)

    disc0 = discover_urls(hit, dispatchers)

    # (a) extraction alone — pure codegen compute, aggregated to a
    # count; twice, to separate warmup/interference from steady state
    timed("a_extract_count", lambda: disc0.count())
    timed("a_extract_count_rep", lambda: disc0.count())
    # (b) extraction + checkpoint, lineage stamped without a join
    timed("b_extract_ckpt", lambda: disc0.withColumn(
        "source_fetch_seq", F.lit(0).cast("long")).localCheckpoint().count())
    timed("b_extract_ckpt_rep", lambda: disc0.withColumn(
        "source_fetch_seq", F.lit(0).cast("long")).localCheckpoint().count())
    # (c) the real stage: broadcast lineage join + checkpoint
    timed("c_join_ckpt", lambda: disc0.join(
        F.broadcast(due_seq), disc0["source"] == due_seq["url"], "inner"
    ).select("source", F.col("fetch_seq").alias("source_fetch_seq"),
             "dispatcher_idx", "pos", "target").localCheckpoint().count())
    timed("c_join_ckpt_rep", lambda: disc0.join(
        F.broadcast(due_seq), disc0["source"] == due_seq["url"], "inner"
    ).select("source", F.col("fetch_seq").alias("source_fetch_seq"),
             "dispatcher_idx", "pos", "target").localCheckpoint().count())


if __name__ == "__main__":
    main()
