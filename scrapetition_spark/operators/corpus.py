"""Derived corpus frames shared by the analytics/dedup query surface.

The driver's correctness gate runs each query against a DuckDB oracle
over the same parquet tables (region…lineitem, events, documents,
embeddings). Crawl-shaped operators therefore derive deterministic
URL/comment corpora *in-query* from those tables — the same
derivation is written in ANSI SQL inside __spark_entry__.oracle_sql,
so both engines compute over identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def urls_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic URL corpus: host = doc_id % 23, with query and
    fragment variants to exercise the URL scalar layer."""
    d = F.col("doc_id")
    url = F.concat(
        F.lit("https://h"),
        (d % 23).cast("string"),
        F.lit(".example.test/d/"),
        d.cast("string"),
        F.when(d % 4 == 1, F.concat(F.lit("?page="), (d % 7).cast("string"))).otherwise(F.lit("")),
        F.when(d % 5 == 2, F.lit("#frag")).otherwise(F.lit("")),
    )
    return docs.select(
        d.alias("doc_id"),
        url.alias("url"),
        F.concat(F.lit("h"), (d % 23).cast("string"), F.lit(".example.test")).alias("host"),
        (d % 3 == 0).alias("is_seen"),
        (d % 4).cast("int").alias("discovery_epoch"),
        d.cast("long").alias("seq"),
        (d % 11).cast("int").alias("priority"),
    )


def comments_from_events(events: DataFrame) -> DataFrame:
    """Deterministic threaded comments: chains of 5 (event_id % 5 == 0
    roots), with orphan branches (event_id % 97 == 3 points at a
    missing parent) to exercise the fixpoint's progress guard."""
    e = F.col("event_id")
    cid = F.concat(F.lit("c"), e.cast("string"))
    parent = (
        F.when(e % 5 == 0, F.lit(None).cast("string"))
        .when(e % 97 == 3, F.concat(F.lit("missing-"), e.cast("string")))
        .otherwise(F.concat(F.lit("c"), (e - 1).cast("string")))
    )
    return events.select(
        cid.alias("id"),
        parent.alias("parent"),
        F.lit(None).cast("string").alias("thread"),
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("user"),
        F.col("ts"),
        F.col("event_type"),
    )


def link_graph_from_documents(docs: DataFrame, n_docs: int) -> DataFrame:
    """Deterministic crawl link graph over the document corpus
    (doc_ids are 0..n-1 contiguous in the driver's testdata, so every
    modular target exists):

    - ``(d+1) % n`` always — so out-degree ≥ 1, no dangling mass;
    - ``(d² + 1) % n`` when ``d % 3 != 0`` — the quadratic map is
      many-to-one mod n, concentrating in-links on quadratic residues
      (the in-degree skew a real link graph has);
    - ``(7d + 3) % n`` when ``d % 5 < 3``.

    Out-degree varies 1..3 and in-degree is genuinely skewed, so the
    fixed-point is NON-uniform (a 3-permutation union would be doubly
    stochastic and rank everything exactly 1.0 — useless as a
    correctness signal). Self-loops/parallel edges at residue
    collisions are kept; ``graph.pagerank`` handles both. The DuckDB
    twin builds the identical edge list with the same arithmetic."""
    d = F.col("doc_id").cast("long")
    parts = [
        docs.select(d.alias("src"), ((d + 1) % n_docs).alias("dst")),
        docs.filter(d % 3 != 0).select(
            d.alias("src"), ((d * d + 1) % n_docs).alias("dst")
        ),
        docs.filter(d % 5 < 3).select(
            d.alias("src"), ((d * 7 + 3) % n_docs).alias("dst")
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, lang, shingle) — word n-grams in document order via
    posexplode + lead windows (identical to the oracle's
    string_split + lead construction)."""
    toks = docs.select(
        "doc_id",
        "lang",
        F.posexplode(F.split("text", " ")).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    sh = F.col("tok")
    for i in range(1, n):
        sh = F.concat(sh, F.lit(" "), F.lead("tok", i).over(w))
    return toks.select("doc_id", "lang", sh.alias("shingle")).filter(
        F.col("shingle").isNotNull()
    )
