"""Flat-file export sinks (S14).

The reference's analytics terminate in Gephi-ready TSV edge tables
(`.mode tabs` exports — /root/reference/utils/cooccurence.sql:7-8,
utils/answers.sql:7-8, utils/abfragen-pg.org:169-177). Spark-side the
same sink is one distributed CSV write; ``single_file=True`` produces
the one-file layout desktop Gephi ingests (fine for edge tables —
they are aggregates, orders of magnitude smaller than the corpus).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame


def export_tsv(
    df: DataFrame, path: str, single_file: bool = False, sep: str = "\t"
) -> str:
    """Write ``df`` as a header-ed TSV directory (or single file).
    Returns the written path."""
    target = path + ".__dir" if single_file else path
    w = df.coalesce(1) if single_file else df
    (
        w.write.mode("overwrite")
        .option("sep", sep)
        .option("header", True)
        .option("emptyValue", "")
        .csv(target)
    )
    if single_file:
        part = glob.glob(os.path.join(target, "part-*.csv"))[0]
        shutil.move(part, path)
        shutil.rmtree(target)
        return path
    return target


def read_tsv(spark, path: str, sep: str = "\t") -> DataFrame:
    """Round-trip reader (tests / downstream tooling)."""
    return (
        spark.read.option("sep", sep)
        .option("header", True)
        .option("inferSchema", True)
        .csv(path)
    )


# ---------------------------------------------------------------- S13 dumps

_HTML_HEAD = '<html><head><meta charset="UTF-8"></head><body><div class="container">'
_HTML_FOOT = "</div></body></html>"


def _comment_html(header: bool = True):
    """Per-comment HTML fragment mirroring utils/dumphtml.sh:82-111:
    a ``div.comment`` with optional ``div.meta`` (ID, Thread-ID /
    Parent-ID anchors, Date, Author, Title, Up Votes) and the
    ``div.text`` body, followed by ``<hr/>``. Built as ONE native
    string expression — the dump stays a column projection, no
    per-row Python."""
    from pyspark.sql import functions as F

    def s(col):  # sqlite3 -batch prints NULL as empty string
        return F.coalesce(F.col(col).cast("string"), F.lit(""))

    parts = [F.lit('<div id="'), s("id"), F.lit('" class="comment">\n')]
    if header:
        parts += [
            F.lit('<div class="meta">\nID: '), s("id"),
            F.lit("<br/>\nThread-ID: <a href=\"#"), s("thread"),
            F.lit('">'), s("thread"),
            F.lit("</a><br/>\nParent-ID: <a href=\"#"), s("parent"),
            F.lit('">'), s("parent"),
            F.lit("</a><br/>\nDate: "), s("date_informal"),
            F.lit("<br/>\nAuthor: "), s("name"),
            F.lit("<br/>\nTitle: "), s("title"),
            F.lit("<br/>\nUp Votes: "), s("up_votes"),
            F.lit("<br/>\n<br/>\n</div>\n"),
        ]
    parts += [
        F.lit('<div class="text">\n'), s("text"),
        F.lit("\n</div>\n</div>\n<hr/>\n"),
    ]
    return F.concat(*parts)


def dump_html(
    comments: DataFrame,
    path: str,
    where: str | None = None,
    header: bool = True,
    order_col: str = "id",
) -> str:
    """S13 HTML dump (utils/dumphtml.sh): the selected comments as one
    HTML file. ``where`` is a SQL predicate string (the script's -w),
    ``header=False`` ≙ -H. Fragments are rendered distributed (native
    expressions) and written as sorted text parts; the driver then
    stitches head + parts + foot by FILE concatenation — no row ever
    crosses to the driver, so the only single-file cost is the same
    byte copy the shell script's stdout redirect pays."""
    df = comments.filter(where) if where else comments
    frag = df.orderBy(order_col).select(
        _comment_html(header).alias("value")
    )
    tmp = path + ".__dir"
    frag.write.mode("overwrite").text(tmp)
    with open(path, "w") as out:
        out.write(_HTML_HEAD + "\n")
        for part in sorted(glob.glob(os.path.join(tmp, "part-*"))):
            with open(part) as f:
                shutil.copyfileobj(f, out)
        out.write(_HTML_FOOT + "\n")
    shutil.rmtree(tmp)
    return path


def dump_texts(comments: DataFrame, out_dir: str) -> int:
    """S13 text dump (utils/dumptxts.sh): one ``<id>.txt`` per
    comment, written from the executors (Arrow-batched) — the
    reference loops sqlite3 once per comment on one core. ``out_dir``
    must be storage all executors reach (local fs here; a shared
    mount on a real cluster). Returns the number of files written.
    Note: one-file-per-row is the reference's contract; for corpus
    scale prefer ``export_tsv``/parquet and keep this for bounded
    WHERE-selected slices."""
    import pandas as pd
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)

    def write_batches(batches):
        for pdf in batches:
            n = 0
            for cid, text in zip(pdf["id"], pdf["text"]):
                name = str(cid).replace(os.sep, "_") + ".txt"
                with open(os.path.join(out_dir, name), "w") as f:
                    f.write((text or "") + "\n")
                n += 1
            yield pd.DataFrame({"n": [n]})

    counts = comments.select("id", "text").mapInPandas(write_batches, "n long")
    row = counts.agg(F.sum("n").alias("total")).collect()[0]
    return int(row["total"] or 0)
