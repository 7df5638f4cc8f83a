"""spark-submit driver CLI (scrapetition_spark/__main__.py): flags
map to the reference's (app/Main.hs:70-132), the run writes the
catalog, and resume (-d) completes a partial crawl."""

from __future__ import annotations

import json
import tempfile

from scrapetition_spark.__main__ import main
from scrapetition_spark.schemas import URLS_SEEN
from scrapetition_spark.sources.catalog import Catalog
from scrapetition_spark.sources.fixtures import documents_df, fixture_site

SEED = "https://www.zeit.de/politik/2020-01/art-a"


def test_cli_crawl_and_resume(spark, capsys):
    docs_path = tempfile.mkdtemp(prefix="cli-docs-")
    documents_df(spark, fixture_site()).write.mode("overwrite").parquet(docs_path)
    cat_dir = tempfile.mkdtemp(prefix="cli-cat-")

    rc = main([
        "--catalog", cat_dir, "--documents", docs_path,
        "-u", SEED, "-f", "--sequential", "--politeness", "0",
        "--epochs", "3",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["epochs"] == 3 and out["urls_fetched"] == 3

    # resume from the same catalog (-d) until done
    rc = main([
        "--catalog", cat_dir, "--documents", docs_path,
        "-d", "-f", "--sequential", "--politeness", "0",
    ])
    assert rc == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["urls_fetched"] > 0

    cat = Catalog(spark, cat_dir)
    seen = cat.read("urls_seen", URLS_SEEN)
    assert seen.count() == out["urls_fetched"] + out2["urls_fetched"]


def test_cli_raw_mode(spark, capsys, monkeypatch):
    """S5 raw output mode (app/Main.hs:232-237): scrapers run, items
    print, nothing persists. Asserts on THIS run's temp dir (captured
    via mkdtemp) — immune to stale dirs left in /tmp by other runs."""
    import os

    docs_path = tempfile.mkdtemp(prefix="cli-docs-")
    documents_df(spark, fixture_site()).write.mode("overwrite").parquet(docs_path)

    made: list[str] = []
    real_mkdtemp = tempfile.mkdtemp

    def capture_mkdtemp(*a, **kw):
        d = real_mkdtemp(*a, **kw)
        if kw.get("prefix", a[1] if len(a) > 1 else "").startswith(
            "scrapetition-raw-"
        ):
            made.append(d)
        return d

    monkeypatch.setattr(tempfile, "mkdtemp", capture_mkdtemp)
    rc = main([
        "--documents", docs_path, "--raw",
        "-u", SEED, "-f", "--sequential", "--politeness", "0",
        "--epochs", "2",
    ])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    out = json.loads(lines[-1])
    assert out["raw"] is True and out["urls_fetched"] == 2
    assert out["items"]["urls_seen"] == 2 and out["items"]["comments"] > 0
    # the temp catalog this run created is gone — nothing persisted
    assert made and all(not os.path.exists(d) for d in made)


def test_cli_visit_again(spark, capsys):
    """-a/--visit-again (app/Main.hs:89-91; seen=[] at Main.hs:246):
    a completed crawl re-run with -a fetches every URL again with
    fresh fetch_seq values and bumps last_seen; without -a the re-run
    fetches nothing."""
    import pyspark.sql.functions as F

    docs_path = tempfile.mkdtemp(prefix="cli-docs-")
    documents_df(spark, fixture_site()).write.mode("overwrite").parquet(docs_path)
    cat_dir = tempfile.mkdtemp(prefix="cli-cat-")

    rc = main([
        "--catalog", cat_dir, "--documents", docs_path,
        "-u", SEED, "-f", "--politeness", "0",
    ])
    assert rc == 0
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["urls_fetched"] > 0

    # exhaust -d (NotSeenFromDB schedules recorded-but-unscheduled
    # URLs, e.g. cross-domain link targets) until nothing is due
    for _ in range(5):
        rc = main([
            "--catalog", cat_dir, "--documents", docs_path,
            "-d", "-f", "--politeness", "0",
        ])
        assert rc == 0
        mid = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        if mid["urls_fetched"] == 0:
            break
    # without -a: everything is seen, nothing is due
    assert mid["urls_fetched"] == 0

    cat = Catalog(spark, cat_dir)
    first = {
        r["url"]: r for r in cat.read("urls_seen", URLS_SEEN).collect()
    }

    # with -a: every URL re-fetched once, fresh fetch_seq continuing
    # the global counter, FIFO order preserved within the run
    rc = main([
        "--catalog", cat_dir, "--documents", docs_path,
        "-d", "-a", "-f", "--politeness", "0",
    ])
    assert rc == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["urls_fetched"] == len(first)

    seen2 = cat.read("urls_seen", URLS_SEEN).collect()
    assert len(seen2) == 2 * len(first)
    by_url: dict[str, list] = {}
    for r in seen2:
        by_url.setdefault(r["url"], []).append(r)
    for url, rows in by_url.items():
        assert len(rows) == 2  # fetched exactly once per run
        a, b = sorted(rows, key=lambda r: r["fetch_seq"])
        assert a["fetch_seq"] == first[url]["fetch_seq"]
        assert b["fetch_seq"] >= len(first)  # fresh, continuing counter
        assert b["epoch"] > a["epoch"]
    # FIFO: within each host the re-run's fetch order follows the
    # discovery lineage key (the C3/C4 FIFO invariant)
    from scrapetition_spark.schemas import URLS

    urls = cat.read("urls", URLS).filter(F.col("first_seen").isNotNull())
    lineage = {
        r["url"]: (r["discovery_epoch"], r["source_fetch_seq"],
                   r["dispatcher_idx"], r["pos"], r["url"])
        for r in urls.collect()
    }
    rerun = {u: max(r["fetch_seq"] for r in rows) for u, rows in by_url.items()}
    hosts: dict[str, list[str]] = {}
    for r in seen2:
        if r["fetch_seq"] >= len(first):
            hosts.setdefault(r["host"], []).append(r["url"])
    for host, us in hosts.items():
        by_fetch = sorted(us, key=rerun.get)
        by_lineage = sorted(us, key=lineage.get)
        assert by_fetch == by_lineage, f"host {host} re-run order != FIFO"
    assert urls.filter(F.col("last_seen") > F.col("first_seen")).count() > 0


def test_cli_rejects_colliding_table_names():
    """Two sinks sharing one physical table (or shadowing crawl-state
    tables) must fail at argparse time, not corrupt the catalog
    mid-crawl."""
    import pytest

    base = ["--catalog", "/tmp/x", "--documents", "/tmp/y", "-u", SEED]
    # collides with the users sink's default physical name
    with pytest.raises(SystemExit):
        main(base + ["--items-table", "users"])
    # shadows a reserved crawl-state table
    with pytest.raises(SystemExit):
        main(base + ["--voting-table", "urls_seen"])
    # shadows engine-owned item/metric tables (review finding: the
    # first reserved set missed these — --items-table crawl_metrics
    # would interleave incompatible schemas into crawl state)
    with pytest.raises(SystemExit):
        main(base + ["--items-table", "crawl_metrics"])
    with pytest.raises(SystemExit):
        main(base + ["--users-table", "articles"])
