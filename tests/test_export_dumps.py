"""S13 dump sinks (utils/dumphtml.sh, utils/dumptxts.sh): HTML dump
structure/order/WHERE/-H semantics, one-file-per-comment text dump."""

from __future__ import annotations

import os
import tempfile

from scrapetition_spark.sources.export import dump_html, dump_texts


def _comments(spark):
    rows = [
        ("c1", "t1", None, "1. Jan 2020", "Uwe", "Hello", 3, "first <b>post</b>"),
        ("c2", "t1", "c1", "2. Jan 2020", "Eva", None, 0, "a reply"),
        ("c3", "t2", None, None, None, "Solo", None, "other thread"),
    ]
    return spark.createDataFrame(
        rows,
        "id string, thread string, parent string, date_informal string, "
        "name string, title string, up_votes int, text string",
    )


def test_dump_html_structure_and_order(spark):
    path = os.path.join(tempfile.mkdtemp(prefix="dump-"), "all.html")
    dump_html(_comments(spark), path)
    html = open(path).read()
    assert html.startswith(
        '<html><head><meta charset="UTF-8"></head><body>'
    ) and html.rstrip().endswith("</div></body></html>")
    # one div.comment per row, in id order, with meta anchors
    assert html.index('<div id="c1"') < html.index('<div id="c2"') < html.index(
        '<div id="c3"'
    )
    assert 'Thread-ID: <a href="#t1">t1</a>' in html
    assert 'Parent-ID: <a href="#c1">c1</a>' in html
    assert "Author: Uwe<br/>" in html and "Up Votes: 3<br/>" in html
    # NULLs print empty like sqlite3 -batch
    assert "Author: <br/>" in html
    assert "first <b>post</b>" in html
    assert html.count("<hr/>") == 3


def test_dump_html_where_and_no_header(spark):
    path = os.path.join(tempfile.mkdtemp(prefix="dump-"), "t1.html")
    dump_html(_comments(spark), path, where="thread = 't1'", header=False)
    html = open(path).read()
    assert '<div id="c1"' in html and '<div id="c2"' in html
    assert '<div id="c3"' not in html
    assert 'class="meta"' not in html  # -H
    assert "a reply" in html


def test_dump_texts_one_file_per_comment(spark):
    out = tempfile.mkdtemp(prefix="dumptxt-")
    n = dump_texts(_comments(spark), out)
    assert n == 3
    assert sorted(os.listdir(out)) == ["c1.txt", "c2.txt", "c3.txt"]
    assert open(os.path.join(out, "c2.txt")).read() == "a reply\n"
