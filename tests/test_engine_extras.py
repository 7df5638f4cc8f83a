"""Robots gating, encoding sniff (S2), catalog snapshot semantics."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from scrapetition_spark.config import CrawlConfig
from scrapetition_spark.crawl import CrawlEngine
from scrapetition_spark.schemas import ROBOTS, URLS_SEEN
from scrapetition_spark.sources.catalog import Catalog
from scrapetition_spark.sources.fixtures import documents_df, fixture_site
from scrapetition_spark.spans import ROLE_CONTENT_TYPE, text_span

SEED = "https://www.zeit.de/politik/2020-01/art-a"


def test_robots_deny(spark):
    """North-rule robots gating (absent in the reference,
    SURVEY.md §4.1): denied path prefixes are never fetched but still
    recorded as discovered."""
    site = fixture_site()
    docs = documents_df(spark, site).localCheckpoint()
    robots = spark.createDataFrame(
        [("www.zeit.de", "/kultur/", 0)], ROBOTS
    )
    cfg = CrawlConfig("www.zeit.de", follow_links=True, sequential=False,
                      politeness_sec=0, per_host_budget=8,
                      respect_robots=True)
    cat = Catalog(spark, tempfile.mkdtemp(prefix="robots-"))
    eng = CrawlEngine(spark, cat, cfg, docs, robots=robots, use_bloom=False)
    eng.seed([SEED])
    eng.run(max_epochs=8)
    fetched = {r["url"] for r in cat.read("urls_seen", URLS_SEEN).collect()}
    assert fetched, "crawl fetched nothing"
    assert not any("/kultur/" in u for u in fetched)
    # ...but kultur URLs were still *discovered* (S6 inserts are
    # gate-free, App.hs:89-90)
    from scrapetition_spark.schemas import URLS

    known = {r["url"] for r in cat.read("urls", URLS).collect()}
    assert any("/kultur/" in u for u in known)


def test_encoding_sniff_recorded(spark):
    """S2 (Encoding.hs:16-41): charset from the meta content-type span
    lands in urls_seen.encoding via the S9 update path."""
    url = "https://www.zeit.de/enc-test"
    spans = [
        text_span(ROLE_CONTENT_TYPE, "text/html; charset=iso-8859-1", 0),
    ]
    docs = documents_df(spark, {url: spans})
    cfg = CrawlConfig("www.zeit.de", follow_links=False, sequential=True,
                      politeness_sec=0)
    cat = Catalog(spark, tempfile.mkdtemp(prefix="enc-"))
    eng = CrawlEngine(spark, cat, cfg, docs, use_bloom=False)
    eng.seed([url])
    eng.run()
    row = cat.read("urls_seen", URLS_SEEN).collect()[0]
    assert row["encoding"] == "iso-8859-1"


def test_catalog_snapshots_and_time_travel(spark):
    cat = Catalog(spark, tempfile.mkdtemp(prefix="cat-"))
    df1 = spark.createDataFrame([(1, "a")], "id int, v string")
    df2 = spark.createDataFrame([(2, "b")], "id int, v string")
    s1 = cat.append("t", df1)
    s2 = cat.append("t", df2)
    assert cat.read("t").count() == 2
    assert cat.read("t", snapshot=s1).count() == 1  # time travel
    # merge_insert dedups on key, first writer wins
    df3 = spark.createDataFrame([(2, "XX"), (3, "c")], "id int, v string")
    cat.merge_insert("t", df3, ["id"], df3.schema)
    rows = {r["id"]: r["v"] for r in cat.read("t").collect()}
    assert rows == {1: "a", 2: "b", 3: "c"}
