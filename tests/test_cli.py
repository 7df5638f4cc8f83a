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


def test_cli_raw_mode(spark, capsys):
    """S5 raw output mode (app/Main.hs:232-237): scrapers run, items
    print, nothing persists."""
    import os

    docs_path = tempfile.mkdtemp(prefix="cli-docs-")
    documents_df(spark, fixture_site()).write.mode("overwrite").parquet(docs_path)

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
    # the temp catalog is gone — nothing persisted anywhere
    assert not any(
        d.startswith("scrapetition-raw-") and os.path.exists(f"/tmp/{d}")
        for d in os.listdir(tempfile.gettempdir())
    )
