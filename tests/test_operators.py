"""Dedup / similarity / text operator tests at sf0.001 — recall and
semantic properties beyond the driver's oracle hash-match."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").localCheckpoint()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").localCheckpoint()


def test_exact_dedup_planted(spark, docs):
    """Planted duplicates collapse to the smallest doc_id."""
    from scrapetition_spark.operators.dedup import exact_dedup

    dup = docs.limit(0).unionByName(
        spark.createDataFrame(
            [(9001, "same text twice", "en", "x", 15),
             (9002, "same text twice", "en", "x", 15)],
            docs.schema,
        )
    )
    out = exact_dedup(docs.unionByName(dup))
    grp = out.filter(F.col("n_docs") > 1).collect()
    assert len(grp) == 1
    assert grp[0]["canonical_doc"] == 9001 and grp[0]["n_docs"] == 2


def test_minhash_lsh_vs_exact_jaccard(spark, docs):
    """Every high-jaccard pair must be an LSH candidate (recall on the
    pairs the bands are sized for), and planted near-dups are found."""
    from scrapetition_spark.operators.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    near = spark.createDataFrame(
        [(9101, "alpha beta gamma delta epsilon zeta eta theta iota kappa",
          "en", "x", 58),
         (9102, "alpha beta gamma delta epsilon zeta eta theta iota lambda",
          "en", "x", 59)],
        docs.schema,
    )
    corpus = docs.unionByName(near)
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_candidates(corpus, n_bands=8).collect()
    }
    assert (9101, 9102) in cands
    exact = ngram_jaccard_pairs(corpus, threshold=0.5).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in exact}
    assert (9101, 9102) in pairs and pairs[(9101, 9102)] > 0.6


def test_simhash_planted_near_dup(spark, docs):
    from scrapetition_spark.operators.dedup import simhash_near_dups

    near = spark.createDataFrame(
        [(9201, "one two three four five six seven eight nine ten", "en", "x", 50),
         (9202, "one two three four five six seven eight nine eleven", "en", "x", 52)],
        docs.schema,
    )
    out = simhash_near_dups(docs.unionByName(near), max_hamming=16)
    pairs = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    assert (9201, 9202) in pairs


def test_ann_lsh_recall(spark, emb):
    """ANN top-5 recall vs brute force ≥ 0.4 on sf0.001 (random
    embeddings are the worst case for LSH; the planted-structure
    check is the sketch-identity one below)."""
    from scrapetition_spark.operators.similarity import ann_lsh_topk, cosine_topk

    qids = list(range(5))
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, qids, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_lsh_topk(emb, qids, k=5, n_planes=6, n_tables=12).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"recall {recall}"


def test_ann_identical_vector_found(spark, emb):
    """A duplicated vector always lands in the same bucket in every
    table ⇒ ANN must find it as the top neighbor."""
    from scrapetition_spark.operators.similarity import ann_lsh_topk

    twin = emb.filter(F.col("vec_id") == 0).select(
        F.lit(99999).cast("long").alias("vec_id"),
        "embedding",
        F.lit(0).cast("int").alias("label"),
    )
    out = ann_lsh_topk(emb.unionByName(twin), [0], k=1)
    top = out.filter(F.col("rnk") == 1).collect()[0]
    assert top["neighbor_id"] == 99999 and top["cos"] == pytest.approx(1.0)


def test_quality_and_tokens(spark, docs):
    from scrapetition_spark.operators.text import quality_scores, token_counts

    q = quality_scores(docs)
    row = q.orderBy("doc_id").first()
    assert row["n_tokens"] > 0 and 0 < row["distinct_ratio"] <= 1.0
    t = token_counts(docs, top=5).collect()
    assert len(t) == 5 and t[0]["cnt"] >= t[-1]["cnt"]


def test_fingerprint_stability(spark, docs):
    """Fingerprints are order-stable: permuting row order does not
    change any fingerprint."""
    from scrapetition_spark.operators.text import fingerprints

    f1 = {r["doc_id"]: r["fingerprint"] for r in fingerprints(docs).collect()}
    shuffled = docs.orderBy(F.xxhash64("doc_id"))
    f2 = {r["doc_id"]: r["fingerprint"] for r in fingerprints(shuffled).collect()}
    assert f1 == f2
