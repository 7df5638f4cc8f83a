"""Round-5 coverage: skew-safe co-occurrence (VERDICT r04 wrong#1),
latest-display-name projection (wrong#2), auto-sized IVF cells
(wrong#3), and the multi-fragment HTML dump stitch (next#7)."""

from __future__ import annotations

import os
import tempfile
from collections import Counter

import pytest
from pyspark.sql import functions as F


SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").localCheckpoint()


def _comments(spark, rows):
    return spark.createDataFrame(
        rows, "id long, parent long, thread long, user string, "
        "name string, last_scraped int"
    )


def test_cooccurrence_plan_is_join_free(spark):
    """The skew-safe rewrite must contain NO join operator: a viral
    thread's pair square can then never concentrate in one shuffle
    key of a same-key self-join (which AQE cannot split). The
    spreading repartition on (thread, author) must be present."""
    from scrapetition_spark.operators.analytics import (
        a11_cooccurrence,
        cooccurrence_comments,
    )

    cm = _comments(
        spark, [(i, None, i % 3, f"u{i%5}", f"n{i%5}", 0) for i in range(30)]
    )
    plan = (
        cooccurrence_comments(cm)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert "Exchange" in plan

    li = spark.createDataFrame(
        [(i % 7, i % 5, 1.0) for i in range(50)],
        "l_orderkey long, l_suppkey long, l_quantity double",
    )
    plan2 = (
        a11_cooccurrence(li)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan2


def test_cooccurrence_matches_naive_self_join_semantics(spark):
    """Exactness of the array rewrite vs the reference SQL's
    self-join semantics (utils/cooccurence.sql:11-15), computed
    independently in pure Python: both directions, NULL-name drop,
    weight = count(DISTINCT thread) even when an author comments
    many times in one thread."""
    from scrapetition_spark.operators.analytics import cooccurrence_comments

    rows = []
    rid = 0
    for t, members in enumerate(
        [["a", "b", "c"], ["a", "b", "b", None], ["b", "c"], ["a"]]
    ):
        for m in members:
            rows.append((rid, None, t, m or "anon-key", m, 0))
            rid += 1
    cm = _comments(spark, rows)

    threads: dict[int, set] = {}
    for _, _, t, _, name, _ in rows:
        if name is not None:
            threads.setdefault(t, set()).add(name)
    exp: Counter = Counter()
    for members in threads.values():
        for a in members:
            for b in members:
                if a != b:
                    exp[(a, b)] += 1

    got = {
        (r["source"], r["target"]): r["weight"]
        for r in cooccurrence_comments(cm).collect()
    }
    assert got == dict(exp)


def test_cooccurrence_null_thread_orphans_make_no_edges(spark):
    """Orphan comments (thread=NULL after propagate_threads) must form
    NO co-occurrence group — the reference self-join's null-unsafe
    equi-join drops them, and a corpus-wide NULL pseudo-group would
    itself be the unbounded hot key the rewrite defuses."""
    from scrapetition_spark.operators.analytics import cooccurrence_comments

    rows = [
        (1, None, 0, "u1", "a", 0),
        (2, None, 0, "u2", "b", 0),
        # orphans: same NULL thread, must NOT pair with each other
        (3, None, None, "u3", "c", 0),
        (4, None, None, "u4", "d", 0),
    ]
    cm = _comments(spark, rows)
    got = {
        (r["source"], r["target"]) for r in cooccurrence_comments(cm).collect()
    }
    assert got == {("a", "b"), ("b", "a")}


def test_cooccurrence_author_cap_bounds_viral_thread(spark):
    """With ``max_authors_per_thread`` set, a hot thread contributes
    only pairs among its first ``cap`` sorted authors — the explicit
    opt-in approximation for adversarial threads whose exact pair
    square is quadratically large BY DEFINITION of the output."""
    from scrapetition_spark.operators.analytics import cooccurrence_comments

    rows = [(i, None, 0, f"u{i}", f"n{i:03d}", 0) for i in range(100)]
    rows += [(1000 + i, None, 1, f"u{i}", f"n{i:03d}", 0) for i in range(3)]
    cm = _comments(spark, rows)

    capped = cooccurrence_comments(cm, max_authors_per_thread=5).collect()
    names = {r["source"] for r in capped} | {r["target"] for r in capped}
    # thread 0's sorted author list is n000..n099; only n000..n004 survive
    assert names == {f"n{i:03d}" for i in range(5)}
    # 5*4 directed pairs from thread 0; thread 1's 3*2 pairs overlap them
    assert len(capped) == 20


def test_latest_display_name_projection(spark):
    """A renamed user's edges must carry the LATEST-scraped display
    name (VERDICT r04 wrong#2) — which here is NOT max(name), so the
    old rule would fail this test."""
    from scrapetition_spark.operators.analytics import (
        answer_graph_comments,
        latest_display_names,
    )

    rows = [
        # u1 posts as "zz-old" (scraped later than the rename row!)
        # then the crawl re-scrapes row 3 last: name "aa-new" wins by
        # (last_scraped, id); max(name) would pick "zz-old".
        (1, None, 0, "u1", "zz-old", 5),
        (3, 1, 0, "u1", "aa-new", 9),
        (2, 1, 0, "u2", "bob", 1),
    ]
    cm = _comments(spark, rows)
    latest = {r["user"]: r["name"] for r in latest_display_names(cm).collect()}
    assert latest == {"u1": "aa-new", "u2": "bob"}

    edges = {
        (r["source"], r["target"]): r["weight"]
        for r in answer_graph_comments(cm).collect()
    }
    # u2 replied to u1's comment 1; u1 replied to own comment via id 3
    assert edges == {("bob", "aa-new"): 1, ("aa-new", "aa-new"): 1}


def test_ivf_cells_auto_sizing_rule():
    """ivf_cells_for keeps ~10^4-vector cells at any corpus size
    (floor 16): the cell-local quadratic is then O(n·10^4) — linear
    in n — instead of O(n²/16) with a fixed cell count."""
    from scrapetition_spark.operators.similarity import ivf_cells_for

    assert ivf_cells_for(500) == 16
    assert ivf_cells_for(160_000) == 16
    assert ivf_cells_for(1_000_000) == 100
    assert ivf_cells_for(10_000_000_000) == 1_000_000
    # per-cell expected membership stays at the target
    assert 10_000_000_000 // ivf_cells_for(10_000_000_000) == 10_000


def test_semantic_dedup_auto_cells_matches_explicit(spark, emb):
    """Default (auto-sized) semantic_dedup equals the explicit
    n_cells=16 run at sub-floor corpus size — the rule changes
    nothing below the floor, by construction."""
    from scrapetition_spark.operators.dedup import semantic_dedup

    auto = {tuple(r) for r in semantic_dedup(emb, threshold=0.4).collect()}
    expl = {
        tuple(r)
        for r in semantic_dedup(emb, n_cells=16, threshold=0.4).collect()
    }
    assert auto == expl


def test_dump_html_multi_fragment_stitch(spark):
    """The driver-side stitch is file concatenation in part order —
    with AQE coalescing disabled the sorted write is forced into
    multiple part files, and the stitched document must equal the
    single-fragment render byte-for-byte."""
    from scrapetition_spark.sources.export import dump_html

    rows = [
        (f"c{i:04d}", "t0", None, f"author {i}", f"body {i} " * 5)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id string, thread string, "
                               "parent string, name string, text string")
    cm = df.select(
        "id", "thread", "parent", "name", "text",
        F.lit(None).cast("string").alias("date_informal"),
        F.lit(None).cast("string").alias("title"),
        F.lit(None).cast("int").alias("up_votes"),
    )

    d = tempfile.mkdtemp(prefix="dumphtml5-")
    single = os.path.join(d, "one.html")
    multi = os.path.join(d, "many.html")
    dump_html(cm.coalesce(1), single)

    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        dump_html(cm.repartition(8), multi)
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")

    with open(single) as f1, open(multi) as f2:
        a, b = f1.read(), f2.read()
    assert a == b
    assert a.count('class="comment"') == 400
