"""Large-scale deduplication operators over the documents table.

These are the training-data-pipeline operators a 100 TB corpus needs
(task brief): exact hash dedup, MinHash+LSH candidate generation,
n-gram Jaccard verification, SimHash. All are pure DataFrame plans —
hashing via ``md5``/``xxhash64`` (JVM), set ops via native array
functions; nothing leaves the JVM.

Scale notes:
- exact dedup = one hash-shuffle on the digest (map-side combine);
- MinHash buckets: one shuffle per (doc → shingle → band min), the
  candidate join shuffles on (band, bucket) — bucket keys are
  md5-uniform, so no skew;
- the Jaccard verify joins only candidate pairs (LSH output), never
  the full cross product; the same-lang blocked variant here is the
  sf-scale stand-in for the banded join;
- SimHash: 64 aggregated bit-majorities per doc via bitwise ops on
  xxhash64 — near-dup = hamming distance ≤ t on the signature, found
  by banding the signature into 4×16-bit keys (pigeonhole: distance
  ≤ 3 ⟹ at least one exact 16-bit band match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from scrapetition_spark.operators.corpus import shingles


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by content digest; keeps the smallest
    doc_id as canonical (deterministic)."""
    return (
        docs.select("doc_id", F.md5("text").alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc"),
            F.count("*").alias("n_docs"),
        )
        .select("text_hash", "canonical_doc", "n_docs")
    )


def minhash_buckets(docs: DataFrame, n_bands: int = 4, shingle_n: int = 3) -> DataFrame:
    """Per-(doc, band) MinHash bucket = min over shingles of
    md5(band || '|' || shingle). A string-min over an md5 image is an
    order-uniform MinHash; using md5 keeps the value reproducible in
    any engine (the DuckDB oracle runs the same expression)."""
    sh = shingles(docs, shingle_n)
    banded = sh.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
        "shingle",
    )
    return banded.groupBy("doc_id", "band").agg(
        F.min(
            F.md5(F.concat(F.col("band").cast("string"), F.lit("|"), F.col("shingle")))
        ).alias("bucket")
    )


def minhash_lsh_candidates(docs: DataFrame, n_bands: int = 4) -> DataFrame:
    """Candidate near-dup pairs: docs sharing a bucket in ≥1 band."""
    b = minhash_buckets(docs, n_bands)
    a, c = b.alias("a"), b.alias("b")
    return (
        a.join(
            c,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_bands"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.02, shingle_n: int = 3
) -> DataFrame:
    """Exact n-gram Jaccard over same-language blocked pairs."""
    sets = (
        shingles(docs, shingle_n)
        .groupBy("doc_id", "lang")
        .agg(F.collect_set("shingle").alias("sh_set"))
    )
    a, b = sets.alias("a"), sets.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh_set"), F.col("b.sh_set")))
    union = (
        F.size(F.col("a.sh_set")) + F.size(F.col("b.sh_set")) - inter
    )
    jac = inter.cast("double") / union
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 5).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def lsh_verified_neardups(
    docs: DataFrame,
    n_bands: int = 4,
    threshold: float = 0.02,
    shingle_n: int = 3,
) -> DataFrame:
    """The production dedup pipeline: MinHash-LSH candidate pairs →
    exact n-gram Jaccard verify. Cost is O(candidates), never the
    quadratic block join — the shape that survives 100 TB."""
    cands = minhash_lsh_candidates(docs, n_bands).select("doc_a", "doc_b")
    sets = (
        shingles(docs, shingle_n)
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("sh_set"))
    )
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh_set").alias("set_a"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh_set").alias("set_b"))
    joined = cands.join(a, ["doc_a"]).join(b, ["doc_b"])
    inter = F.size(F.array_intersect(F.col("set_a"), F.col("set_b")))
    union = F.size(F.col("set_a")) + F.size(F.col("set_b")) - inter
    return (
        joined.select(
            "doc_a",
            "doc_b",
            F.round(inter.cast("double") / union, 5).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(docs: DataFrame, bits: int = 64) -> DataFrame:
    """64-bit SimHash per doc: per-token xxhash64, per-bit majority
    vote, reassembled with bitwise ops. Native-only (no UDF)."""
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    bit_votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftrightunsigned("h", i).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    sig = F.lit(0).cast("long")
    for i in range(bits):
        # bit 63 is the sign bit of a signed long
        bit_val = F.lit(1 << i if i < 63 else -(1 << 63)).cast("long")
        sig = sig + F.when(F.col(f"b{i}") > 0, bit_val).otherwise(
            F.lit(0).cast("long")
        )
    out = bit_votes.select("doc_id", sig.alias("simhash"))
    # 4×16-bit bands for hamming-banded candidate lookup
    for band in range(4):
        out = out.withColumn(
            f"band{band}",
            F.shiftrightunsigned(F.col("simhash"), band * 16).bitwiseAND(F.lit(0xFFFF)),
        )
    return out


def simhash_near_dups(docs: DataFrame, max_hamming: int = 12) -> DataFrame:
    """Near-dup pairs by SimHash banding + exact hamming verify."""
    s = simhash(docs)
    pairs = None
    for band in range(4):
        a, b = s.alias("a"), s.alias("b")
        p = a.join(
            b,
            (F.col(f"a.band{band}") == F.col(f"b.band{band}"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    pairs = pairs.dropDuplicates(["doc_a", "doc_b"])
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return pairs.select(
        "doc_a", "doc_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def embedding_cosine_neardups(
    embeddings: DataFrame, threshold: float = 0.4, round_to: int = 4
) -> DataFrame:
    """Embedding-space near-dup pairs: cosine ≥ threshold over the
    (vec_id < vec_id) pair space. Exactness baseline — the all-pairs
    join is the oracle-checkable form; at corpus scale the pair space
    is pruned first with the sign-sketch LSH
    (operators/similarity.ann_lsh_topk uses the same sketch), which
    turns the cross join into a bucket join with identical verify
    semantics. Cosine is rounded before thresholding so the cut is
    reproducible across engines."""
    from scrapetition_spark.operators.similarity import cosine

    a = embeddings.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a")
    )
    b = embeddings.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b")
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("emb_a"), F.col("emb_b")), round_to).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
