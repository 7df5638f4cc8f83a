"""The downstream analytics query surface (SURVEY.md §2.5, A5-A15).

Each function mirrors the *operator shape* of one reference query
(utils/abfragen-sqlite.org, utils/abfragen-pg.org, utils/answers.sql,
utils/cooccurence.sql, notes.org) over the driver's TPC-H-ish tables;
the reference's comment/user/thread roles map onto
order/customer/supplier/lineitem. Every aggregate is aliased
identically in the DuckDB oracle (__spark_entry__.oracle_sql).

Top-k queries carry explicit deterministic tie-breaks — LIMIT with
ties is undefined in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def a5_counts_per_domain(lineitem, orders, customer, nation) -> DataFrame:
    """A5 (abfragen-sqlite.org:28-31): group-by + count + count
    distinct — items/orders/customers per nation (≙ per domain)."""
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_items"),
            F.countDistinct("c_custkey").alias("n_customers"),
        )
        .orderBy("n_name")
    )


def a6_avg_items_per_order(lineitem) -> DataFrame:
    """A6 (abfragen-sqlite.org:35-38): CTE + avg of per-group counts."""
    per_order = lineitem.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("cnt"))
    return per_order.agg(
        F.round(F.avg("cnt"), 4).alias("avg_items"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def a7_top_visited(lineitem, orders) -> DataFrame:
    """A7 (abfragen-sqlite.org:42-44): join + group + ORDER BY cnt
    DESC LIMIT 30 (tie-break on key)."""
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .orderBy(F.col("cnt").desc(), F.col("o_orderkey").asc())
        .limit(30)
    )


def a8_threads_per_article(orders, customer, nation) -> DataFrame:
    """A8 (abfragen-sqlite.org:62-69): left join + 2-key group +
    top-k."""
    return (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"), "left")
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"), "left")
        .groupBy("n_name", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy(F.col("n_orders").desc(), F.col("n_name").asc(), F.col("o_orderstatus").asc())
        .limit(30)
    )


def a9_density(lineitem) -> DataFrame:
    """A9 "Dichte" (abfragen-sqlite.org:83-92): per-thread users vs
    comments ratio ≙ per-order suppliers vs items."""
    return (
        lineitem.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            "l_orderkey",
            "n_suppliers",
            "n_items",
            F.round(F.col("n_items") / F.col("n_suppliers").cast("double"), 2).alias(
                "density"
            ),
        )
        .orderBy(F.col("density").desc(), F.col("l_orderkey").asc())
        .limit(50)
    )


def a10_answer_graph(lineitem, supplier) -> DataFrame:
    """A10 (utils/answers.sql:10-14): self-join child.parent =
    parent.id → weighted edge list. Here: consecutive line numbers of
    the same order link their suppliers."""
    a, b = lineitem.alias("a"), lineitem.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") == F.col("b.l_linenumber") + 1),
    ).select(
        F.col("a.l_suppkey").alias("s_from"),
        F.col("b.l_suppkey").alias("s_to"),
        F.col("a.l_orderkey").alias("okey"),
    )
    sa = supplier.select(F.col("s_suppkey").alias("k1"), F.col("s_name").alias("source"))
    sb = supplier.select(F.col("s_suppkey").alias("k2"), F.col("s_name").alias("target"))
    return (
        pairs.join(sa, F.col("s_from") == F.col("k1"))
        .join(sb, F.col("s_to") == F.col("k2"))
        .groupBy("source", "target")
        .agg(F.count(F.lit(1)).alias("weight"), F.countDistinct("okey").alias("n_threads"))
        .filter(F.col("weight") >= 3)
        .orderBy("source", "target")
    )


def latest_display_names(comments) -> DataFrame:
    """Per user key, the display name of the LATEST-scraped comment
    row (ties on ``last_scraped`` break on the comment ``id``, which
    is unique) — the user's current name, not an arbitrary historical
    one (VERDICT r04 wrong#2). One ``max_by`` hash aggregate with
    map-side partials; output cardinality = distinct users, so
    consumers can broadcast it. A null ``last_scraped`` sorts before
    any real timestamp (the crawl always stamps it; nulls only arise
    in hand-built frames)."""
    return comments.groupBy(F.col("user").alias("user")).agg(
        F.max_by(
            "name", F.struct(F.col("last_scraped"), F.col("id"))
        ).alias("name")
    )


def answer_graph_comments(comments) -> DataFrame:
    """A10 over a crawled ``comments`` table — the reference's actual
    input (utils/answers.sql:11-14): who answered whom, edge
    (child author → parent author), weight = count of replies. The
    SQL groups by the user *keys* while projecting display names
    (SQLite's bare-column pick); here each user key projects its
    LATEST-scraped display name (``latest_display_names``) so renamed
    users show their current name deterministically. Self-join on
    ``parent = id`` — equi-join keyed on comment id,
    shuffle-partitioned, never all-pairs; the name attach joins the
    aggregated edge list (small) to the per-user dim (small)."""
    child, parent = comments.alias("child"), comments.alias("parent")
    edges = (
        child.join(parent, F.col("child.parent") == F.col("parent.id"))
        .groupBy(
            F.col("parent.user").alias("_pu"), F.col("child.user").alias("_cu")
        )
        .agg(F.count(F.col("child.id")).alias("weight"))
    )
    names = latest_display_names(comments)
    src = names.select(F.col("user").alias("_su"), F.col("name").alias("source"))
    dst = names.select(F.col("user").alias("_du"), F.col("name").alias("target"))
    # null-safe equality: anonymous (NULL-user) authors form a group
    # key in SQL GROUP BY, so their edges must survive the name attach
    return (
        edges.join(src, F.col("_cu").eqNullSafe(F.col("_su")))
        .join(dst, F.col("_pu").eqNullSafe(F.col("_du")))
        .select("source", "target", "weight")
        .orderBy("weight", "source", "target")
    )


def _array_cooccurrence(
    rows: DataFrame,
    group_col: str,
    item_col: str,
    cap: int | None = None,
) -> DataFrame:
    """Skew-safe co-occurrence core (VERDICT r04 wrong#1): instead of
    the reference SQL's self-join on the group key — where one viral
    group with 10^5 distinct items lands ~10^10 joined rows in a
    SINGLE shuffle key that AQE skew-splitting cannot divide (the
    pair explosion is same-key) — pre-aggregate each group to its
    sorted DISTINCT item array (two hash aggs, map-side combined),
    then explode pairs from the bounded array. The first explode
    fans one row per (group, item); a repartition on (group, item)
    spreads a hot group's pair GENERATION across the whole cluster
    before the second explode, so no task ever materializes a
    group's full pair square. Output rows are identical to the
    self-join's: after the per-group distinct, count(*) per pair ==
    count(DISTINCT group). The plan is join-free (test-asserted).

    ``cap`` truncates each group's sorted item array to its first
    ``cap`` items — an explicit, documented approximation for
    adversarial groups (a 10^5-author thread yields 10^10 pairs *as
    output*, which no plan shape can shrink); default None is exact
    and oracle-verified."""
    # NULL filters mirror the reference self-join's null-unsafe
    # equi-join: a NULL group key (e.g. an orphan comment whose
    # thread never resolved) joins nothing there, so it must form no
    # group here — otherwise every orphan corpus-wide would collapse
    # into one unbounded pseudo-group, the exact hot-key shape this
    # rewrite exists to avoid
    items = rows.select(group_col, item_col).filter(
        F.col(item_col).isNotNull() & F.col(group_col).isNotNull()
    ).distinct()
    groups = items.groupBy(group_col).agg(
        F.sort_array(F.collect_set(item_col)).alias("__items")
    )
    if cap is not None:
        groups = groups.select(
            group_col, F.slice("__items", 1, cap).alias("__items")
        )
    fanned = groups.select(
        group_col, F.explode("__items").alias("__a"), "__items"
    ).repartition(group_col, "__a")
    return fanned.select("__a", F.explode("__items").alias("__b"))


def cooccurrence_comments(
    comments, max_authors_per_thread: int | None = None
) -> DataFrame:
    """A11 over a crawled ``comments`` table
    (utils/cooccurence.sql:11-15): how often two authors posted in
    the same thread; weight = count(DISTINCT thread); the a ≠ b
    filter keeps both edge directions, like the reference. Computed
    through the skew-safe array core (``_array_cooccurrence``) — no
    self-join on ``thread``, so a viral thread cannot concentrate
    its pair square in one shuffle key."""
    pairs = _array_cooccurrence(
        comments, "thread", "name", cap=max_authors_per_thread
    ).filter(F.col("__a") != F.col("__b"))
    return (
        pairs.groupBy(
            F.col("__a").alias("source"), F.col("__b").alias("target")
        )
        .agg(F.count(F.lit(1)).alias("weight"))
        .orderBy(F.col("weight").desc(), "source", "target")
    )


def a11_cooccurrence(lineitem) -> DataFrame:
    """A11 (utils/cooccurence.sql:10-14): same-thread co-occurrence
    with a < b, weight = count(DISTINCT thread) — the TPC-shape twin
    (orders ≙ threads, suppliers ≙ authors), through the same
    skew-safe array core as ``cooccurrence_comments``."""
    pairs = _array_cooccurrence(lineitem, "l_orderkey", "l_suppkey").filter(
        F.col("__a") < F.col("__b")
    )
    return (
        pairs.groupBy(
            F.col("__a").alias("supp_a"), F.col("__b").alias("supp_b")
        )
        .agg(F.count(F.lit(1)).alias("weight"))
        .filter(F.col("weight") >= 5)
        .orderBy("supp_a", "supp_b")
    )


def a12_leaderboard(orders, customer) -> DataFrame:
    """A12 (abfragen-sqlite.org:113-116): per-user comment counts,
    ORDER BY cnt DESC LIMIT 30."""
    return (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("c_custkey").asc())
        .limit(30)
    )


def a13_filtered_count(customer) -> DataFrame:
    """A13 (abfragen-sqlite.org:105-107): filtered count."""
    return customer.filter(
        F.col("c_acctbal").isNotNull() & (F.col("c_acctbal") > 0)
    ).agg(F.count(F.lit(1)).alias("n_positive"))


def a14_concomitance(lineitem) -> DataFrame:
    """A14 (abfragen-pg.org:211-286): apriori/aposteriori pair
    presence — for the top-3 suppliers, orders containing both vs
    either member of each pair. Multi-CTE cross/outer-join chain."""
    top = (
        lineitem.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("l_suppkey").asc())
        .limit(3)
        .select(F.col("l_suppkey").alias("sk"))
    )
    pres = (
        lineitem.join(F.broadcast(top), F.col("l_suppkey") == F.col("sk"))
        .select(F.col("sk"), F.col("l_orderkey").alias("okey"))
        .distinct()
    )
    p1 = pres.select(F.col("sk").alias("s1"), "okey")
    p2 = pres.select(F.col("sk").alias("s2"), F.col("okey").alias("okey2"))
    both = (
        p1.join(p2, (F.col("okey") == F.col("okey2")) & (F.col("s1") < F.col("s2")))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    totals = pres.groupBy("sk").agg(F.count(F.lit(1)).alias("n_total"))
    t1 = totals.select(F.col("sk").alias("s1"), F.col("n_total").alias("n_s1"))
    t2 = totals.select(F.col("sk").alias("s2"), F.col("n_total").alias("n_s2"))
    pairs = (
        t1.crossJoin(t2)
        .filter(F.col("s1") < F.col("s2"))
        .join(both, ["s1", "s2"], "left")
    )
    return pairs.select(
        "s1",
        "s2",
        F.coalesce("n_both", F.lit(0)).alias("n_both"),
        (F.col("n_s1") - F.coalesce("n_both", F.lit(0))).alias("only_s1"),
        (F.col("n_s2") - F.coalesce("n_both", F.lit(0))).alias("only_s2"),
    ).orderBy("s1", "s2")


def a15_set_ops(urls_frame: DataFrame) -> DataFrame:
    """A15 (App.hs:59-69 frontier algebra as queries): union /
    intersect / except / distinct over the seen vs unseen URL sets."""
    seen = urls_frame.filter(F.col("is_seen")).select("url")
    unseen_ = urls_frame.filter(~F.col("is_seen")).select("url")
    sample = urls_frame.filter(F.col("doc_id") % 2 == 0).select("url")
    n_union = seen.union(unseen_).distinct().agg(F.count(F.lit(1)).alias("n_union"))
    n_inter = sample.intersect(seen).agg(F.count(F.lit(1)).alias("n_intersect"))
    n_exc = sample.exceptAll(seen).agg(F.count(F.lit(1)).alias("n_except"))
    n_hosts = urls_frame.select("host").distinct().agg(
        F.count(F.lit(1)).alias("n_hosts")
    )
    return n_union.crossJoin(n_inter).crossJoin(n_exc).crossJoin(n_hosts)


def a3_graph_bfs(orders, lineitem, start_custkey: int = 1, max_depth: int = 2) -> DataFrame:
    """A3 (notes.org:28-35): URL-graph BFS with depth counter —
    customer → orders → parts as the edge set; returns node counts
    per depth (count(*) where depth = 2 in the reference). Iterative
    join loop ≙ the recursive CTE."""
    edges = (
        orders.select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("dst"),
        )
        .unionByName(
            lineitem.select(
                F.concat(F.lit("o"), F.col("l_orderkey").cast("string")).alias("src"),
                F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
            )
        )
        .distinct()
    )
    spark = orders.sparkSession
    from scrapetition_spark.session import local_df

    frontier = local_df(spark, [(f"c{start_custkey}", 0)], "node string, depth int")
    visited = frontier
    for d in range(1, max_depth + 1):
        nxt = (
            edges.join(frontier, edges["src"] == frontier["node"])
            .select(F.col("dst").alias("node"), F.lit(d).alias("depth"))
            .distinct()
            .join(visited.select("node"), ["node"], "left_anti")
            .localCheckpoint()
        )
        if nxt.count() == 0:
            break
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited.groupBy("depth").agg(F.count(F.lit(1)).alias("n_nodes")).orderBy("depth")


def a18_user_sessions(
    events: DataFrame, gap_minutes: int = 30, watermark: str | None = None
) -> DataFrame:
    """Per-user event sessionization: events closer than
    ``gap_minutes`` chain into one session (the classic behavioral
    gap-and-islands rollup a crawl/clickstream pipeline needs before
    any per-session statistics).

    Spark-first: ``F.session_window`` — the engine's native session
    assignment — grouped per user; the aggregate is one hash agg over
    (user, session_window), map-side partial like any other groupBy.
    The windowed state never crosses users, so the shuffle key is
    (user_id, window) — maximal cardinality, skew-free. The SAME
    expression is streamable (session_window + watermark) — this
    batch form is what the driver oracle-checks against a
    lag/gap-sum gap-and-islands DuckDB twin (semantically identical
    formulations, independently derived).

    ``session_end`` is reported as max(ts) (the last event), NOT the
    gap-padded window end — the padded end differs by exactly
    ``gap_minutes`` and carries no information.
    """
    ev = events.withColumn("__ts", F.col("ts").cast("timestamp"))
    if watermark is not None:
        # streaming form: every aggregate below is streaming-safe
        # (count/max/sum — no distinct), so the SAME definition runs
        # under a watermark in append mode; the batch run is what the
        # stream is equated against in tests
        ev = ev.withWatermark("__ts", watermark)
    return (
        ev.groupBy(
            "user_id",
            F.session_window(F.col("__ts"), f"{gap_minutes} minutes").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("__ts").alias("last_ts"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("last_ts").cast("timestamp_ntz").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def a20_cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention over the event stream: users are
    cohorted by the ISO week of their first event; each later active
    week increments that cohort's retention cell. The triangle
    (cohort_week, week_offset, n_users) is the standard
    product-analytics rollup.

    Plan shape: one distinct on (user, week) — a hash aggregate —
    one min-per-user hash agg for the cohort, a user-keyed join
    (co-partitioned; both sides were just shuffled on user), and the
    final (cohort, offset) count-distinct. No windows, no skew key:
    user_id is maximal-cardinality and week has bounded fan-in.
    Both engines truncate weeks to ISO Monday."""
    ts = F.col("ts").cast("timestamp")
    weeks = events.select(
        "user_id", F.date_trunc("week", ts).cast("date").alias("week")
    ).distinct()
    cohort = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        weeks.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        # weeks is distinct on (user, week) and offset is injective in
        # week per user, so each user contributes exactly one row per
        # group: plain count == count distinct, without the two-phase
        # distinct aggregation
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )
