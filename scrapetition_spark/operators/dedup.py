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
- SimHash: 32 aggregated bit-majorities per doc (md5-parity bits,
  engine-portable) — near-dup = hamming distance ≤ t on the
  signature, found by banding into t+1 keys (pigeonhole: distance
  ≤ t ⟹ at least one exact band match, i.e. 100% recall at t);
- embedding near-dups default to sign-sketch LSH bucketing with an
  exact cosine verify on the candidates; the all-pairs join survives
  only behind ``exact=True`` (small-scale ground-truth path).
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
    any engine (the DuckDB oracle runs the same expression).

    All band minima are computed in ONE grouped aggregation over the
    un-replicated shingle stream (n_bands agg columns, map-side
    partial min), then unpivoted — the r01 shape exploded shingles
    ×n_bands before the shuffle, multiplying shuffle volume by the
    band count for no information gain."""
    sh = shingles(docs, shingle_n)
    per_doc = sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.md5(F.concat(F.lit(f"{b}|"), F.col("shingle")))
            ).alias(f"__b{b}")
            for b in range(n_bands)
        ]
    )
    bands = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"), F.col(f"__b{b}").alias("bucket")
                )
                for b in range(n_bands)
            ]
        )
    )
    return per_doc.select("doc_id", bands.alias("p")).select(
        "doc_id", F.col("p.band").alias("band"), F.col("p.bucket").alias("bucket")
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


SIMHASH_BITS = 32


def simhash_bands(max_hamming: int, bits: int = SIMHASH_BITS) -> list[tuple[int, int]]:
    """Partition ``bits`` signature bits into ``max_hamming + 1``
    contiguous (start, width) bands. Pigeonhole: any pair within
    hamming distance ``max_hamming`` differs in at most ``max_hamming``
    bands, so at least one of the ``max_hamming + 1`` bands matches
    exactly — banding has 100% recall at the advertised distance."""
    n_bands = min(max_hamming + 1, bits)
    starts = [bits * b // n_bands for b in range(n_bands + 1)]
    return [(starts[b], starts[b + 1] - starts[b]) for b in range(n_bands)]


def simhash(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """SimHash per doc: bit i of a token = parity of hex char i of
    md5(token); per-bit majority vote over token occurrences;
    signature reassembled with arithmetic. Native expressions only —
    and, unlike an xxhash64 derivation, bit values are reproducible in
    any engine with md5 + substr (the DuckDB oracle runs the identical
    computation), so ``d4`` is hash-verifiable end-to-end."""
    assert bits <= 32  # md5 hex has 32 chars
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).select("doc_id", F.md5("tok").alias("h"))
    bit_votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.ascii(F.substring("h", i + 1, 1)) % 2 == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig + F.when(F.col(f"b{i}") > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bit_votes.select("doc_id", sig.alias("simhash"))


def simhash_near_dups(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash banding + exact hamming verify.

    ``max_hamming + 1`` bands (simhash_bands) make the candidate set a
    guaranteed superset of all pairs within the distance — the verify
    then filters exactly. One (band, key) bucket self-join: at corpus
    scale this shuffles on near-uniform keys, never all-pairs."""
    s = simhash(docs)
    bands = simhash_bands(max_hamming)
    keys = F.array(
        *[
            F.shiftrightunsigned("simhash", start).bitwiseAND(F.lit((1 << width) - 1))
            for start, width in bands
        ]
    )
    kb = s.select(
        "doc_id", "simhash", F.posexplode(keys).alias("band", "key")
    )
    a, b = kb.alias("a"), kb.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return pairs.select(
        "doc_a", "doc_b", hamming.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def embedding_cosine_neardups(
    embeddings: DataFrame,
    threshold: float = 0.4,
    round_to: int = 4,
    exact: bool = False,
    n_planes: int = 8,
    n_tables: int = 8,
) -> DataFrame:
    """Embedding-space near-dup pairs: cosine ≥ threshold, rounded
    before thresholding so the cut is reproducible across engines.

    DEFAULT (the 100 TB shape): sign-sketch LSH candidate generation —
    a single self-join on (table, sketch) bucket keys over
    ``n_tables`` independent md5-derived sketches — then exact cosine
    verify on candidates only. Never materializes the O(n²) pair
    space; recall follows the standard (1-(1-p^planes)^tables) LSH
    curve (≈0.99 at cosine 0.95 with 8×8; tests/test_operators.py
    asserts the bound on planted near-dups). The sketch derivation is
    engine-portable, so the DuckDB oracle mirrors this path
    bit-for-bit — candidates included.

    ``exact=True`` keeps the all-pairs join: the small-scale
    ground-truth path (recall tests, ad-hoc audits) — NOT wired into
    any default pipeline."""
    from scrapetition_spark.operators.similarity import cosine, lsh_sketch_tables

    if exact:
        a = embeddings.select(
            F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a")
        )
        b = embeddings.select(
            F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b")
        )
        pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    else:
        sk = lsh_sketch_tables(embeddings, n_planes, n_tables)
        a, b = sk.alias("a"), sk.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.table") == F.col("b.table"))
                & (F.col("a.sketch") == F.col("b.sketch"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .select(
                F.col("a.vec_id").alias("vec_a"),
                F.col("a.embedding").alias("emb_a"),
                F.col("b.vec_id").alias("vec_b"),
                F.col("b.embedding").alias("emb_b"),
            )
            .dropDuplicates(["vec_a", "vec_b"])
        )
    return pairs.select(
        "vec_a",
        "vec_b",
        F.round(cosine(F.col("emb_a"), F.col("emb_b")), round_to).alias("cos"),
    ).filter(F.col("cos") >= threshold)
