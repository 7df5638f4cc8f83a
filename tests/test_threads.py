"""Thread-propagation goldens (FIXTURES.md §3), verbatim from
/root/reference/test/Test/Network/Scrapetition/Utils.hs:26-134."""

from __future__ import annotations

from pyspark.sql import functions as F

from scrapetition_spark.operators.threads import propagate_threads, subthread


def _df(spark, rows):
    # (order, id, parent, thread)
    return spark.createDataFrame(
        [(i, r[0], r[1], r[2] if len(r) > 2 else None) for i, r in enumerate(rows)],
        "ord int, id string, parent string, thread string",
    ).withColumn("domain", F.lit("testdomain"))


def _threads(df):
    return {
        (r["id"], r["thread"])
        for r in df.select("id", "thread").collect()
    }


def test_all_roots(spark):  # Utils.hs(test):26-35
    df = _df(spark, [("1", None), ("2", None), ("3", None)])
    out = propagate_threads(df, order_col="ord")
    assert _threads(out) == {("1", "1"), ("2", "2"), ("3", "3")}


def test_deep_propagation(spark):  # :38-59
    rows = [
        ("1", None), ("2", None), ("3", None), ("4", "1"), ("5", "4"),
        ("6", "4"), ("7", "2"), ("8", "4"), ("9", "6"),
    ]
    out = propagate_threads(_df(spark, rows), order_col="ord")
    want = {
        ("1", "1"), ("2", "2"), ("3", "3"), ("4", "1"), ("5", "1"),
        ("6", "1"), ("7", "2"), ("8", "1"), ("9", "1"),
    }
    assert _threads(out) == want


def test_duplicate_id_collapse(spark):  # :62-85 — last occurrence wins
    rows = [
        ("1", None), ("7", "1"), ("2", None), ("7", "2"),
    ]
    out = propagate_threads(_df(spark, rows), order_col="ord")
    assert out.count() == 3  # duplicate collapsed
    assert _threads(out) == {("1", "1"), ("2", "2"), ("7", "2")}


def test_orphans_stay_null(spark):  # :89-134 — fixpoint terminates
    rows = [
        ("1", None), ("4", "1"), ("9", "missing"), ("10", "9"),
    ]
    out = propagate_threads(_df(spark, rows), order_col="ord")
    assert _threads(out) == {
        ("1", "1"), ("4", "1"), ("9", None), ("10", None),
    }


def test_all_orphans(spark):  # :101-110 — nothing resolvable, no hang
    rows = [("5", "4"), ("6", "4"), ("9", "8")]
    out = propagate_threads(_df(spark, rows), order_col="ord")
    assert _threads(out) == {("5", None), ("6", None), ("9", None)}


def test_depth_column(spark):  # A2 threadview height (threadview.sql:9-41)
    rows = [("1", None), ("4", "1"), ("5", "4"), ("9", "5")]
    out = propagate_threads(_df(spark, rows), order_col="ord", with_depth=True)
    got = {(r["id"], r["depth"]) for r in out.select("id", "depth").collect()}
    assert got == {("1", 0), ("4", 1), ("5", 2), ("9", 3)}


def test_subthread(spark):  # A4 (subthread.sh:63-69)
    rows = [
        ("1", None), ("4", "1"), ("5", "4"), ("6", "4"), ("2", None), ("7", "2"),
    ]
    out = subthread(_df(spark, rows), "4")
    assert {r["id"] for r in out.collect()} == {"4", "5", "6"}


def test_recursive_cte_matches_iterative(spark):
    """Spark 4 WITH RECURSIVE fast path ≡ the iterative fixpoint on
    the same forest (roots, deep chains, orphans)."""
    from scrapetition_spark.operators.threads import (
        propagate_threads,
        propagate_threads_recursive,
    )

    rows = [
        ("a", None), ("b", "a"), ("c", "b"), ("d", "c"),  # deep chain
        ("e", None), ("f", "e"),
        ("x", "missing"), ("y", "x"),  # orphan subtree → thread NULL
    ]
    df = spark.createDataFrame(rows, ["id", "parent"]).withColumn(
        "thread", F.lit(None).cast("string")
    )
    it = {
        r["id"]: (r["thread"], r["depth"])
        for r in propagate_threads(
            df, domain_col=None, with_depth=True
        ).collect()
    }
    rec = {
        r["id"]: (r["thread"], r["depth"])
        for r in propagate_threads_recursive(df).collect()
    }
    assert it == rec
    assert rec["d"] == ("a", 3) and rec["x"] == (None, None)
