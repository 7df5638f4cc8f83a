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


def _py_simhash(text: str) -> int:
    """Pure-Python mirror of dedup.simhash (64-bit: md5 hex-char
    parity for bits 0-31, md5('x'+tok) parity for bits 32-63,
    majority vote) for ground-truth recall checks."""
    import hashlib

    votes = [0] * 64
    for tok in text.split(" "):
        h = (
            hashlib.md5(tok.encode()).hexdigest()
            + hashlib.md5(b"x" + tok.encode()).hexdigest()
        )
        for i in range(64):
            votes[i] += 1 if ord(h[i]) % 2 == 1 else -1
    return sum(1 << i for i in range(64) if votes[i] > 0)


def test_simhash_banding_full_recall(spark, docs):
    """The pigeonhole contract: EVERY pair within max_hamming is
    found (this is the recall bug VERDICT r01 flagged — 4 fixed bands
    silently missed distances 4-12). Ground truth = brute force over
    pure-Python signatures; includes planted mid-distance pairs."""
    from scrapetition_spark.operators.dedup import simhash_near_dups

    rows = docs.select("doc_id", "text").collect()
    texts = {r["doc_id"]: r["text"] for r in rows}
    sigs = {d: _py_simhash(t) for d, t in texts.items()}
    for max_h in (3, 10):
        want = {
            (a, b)
            for a in sigs
            for b in sigs
            if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= max_h
        }
        got = {
            (r["doc_a"], r["doc_b"])
            for r in simhash_near_dups(docs, max_hamming=max_h).collect()
        }
        assert got == want, f"max_hamming={max_h}: {len(want - got)} missed"
    # sanity: the corpus actually exercises the mid-distance range
    assert any(
        0 < bin(sigs[a] ^ sigs[b]).count("1") <= 10
        for a in sigs for b in sigs if a < b
    )


def test_d5_default_is_not_all_pairs(spark, emb):
    """The default embedding near-dup plan must never contain a
    cartesian/nested-loop join (the O(n²) shape VERDICT r01 flagged);
    only exact=True may."""
    from scrapetition_spark.operators.dedup import embedding_cosine_neardups

    plan = embedding_cosine_neardups(emb)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    exact_plan = (
        embedding_cosine_neardups(emb, exact=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" in exact_plan or "BroadcastNestedLoopJoin" in exact_plan


def test_d5_lsh_recall_planted(spark, emb):
    """LSH-pruned near-dups find planted high-cosine pairs: each
    planted twin is the base vector with one coordinate nudged
    (cos ≥ 0.95), recall vs the exact path ≥ 0.8 at 8×8."""
    from scrapetition_spark.operators.dedup import embedding_cosine_neardups

    base = emb.filter(F.col("vec_id") < 20)
    twins = base.select(
        (F.col("vec_id") + 90000).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: x + F.when(i == 0, F.lit(0.05)).otherwise(F.lit(0.0))
        ).cast("array<float>").alias("embedding"),
        "label",
    )
    corpus = base.unionByName(twins).localCheckpoint()
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_cosine_neardups(corpus, threshold=0.95, exact=True).collect()
    }
    approx = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_cosine_neardups(corpus, threshold=0.95).collect()
    }
    assert len(exact) >= 20  # the planted pairs are really there
    assert approx <= exact
    assert len(approx & exact) / len(exact) >= 0.8


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


def test_ann_ivf_recall_and_partitioning(spark, emb):
    """IVF (the second ANN family): top-5 recall vs brute force on
    random vectors, and the structural guarantee — every corpus
    vector lands in exactly one cell (search reads n_probe cells,
    never the corpus)."""
    from scrapetition_spark.operators.similarity import (
        ann_ivf_topk,
        cosine_topk,
        ivf_assign,
    )

    assigned = ivf_assign(emb, n_cells=8)
    assert assigned.count() == emb.count()
    assert assigned.select("vec_id").distinct().count() == emb.count()
    assert assigned.select("cell").distinct().count() <= 8

    qids = list(range(5))
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, qids, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_ivf_topk(emb, qids, k=5, n_cells=8, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"recall {recall}"


def test_repetition_scores_planted(spark, docs):
    """Gopher-style repetition features on hand-computable docs: a
    looping 2-gram, a clean doc, and a back-to-back token run."""
    from scrapetition_spark.operators.text import repetition_scores

    planted = spark.createDataFrame(
        [
            # "spam ham" appears 3x out of 5 2-grams
            (9301, "spam ham spam ham spam ham", "en", "x", 26),
            # all 2-grams and 3-grams distinct, no runs
            (9302, "one two three four five", "en", "x", 23),
            # "go go go go" = max run 4
            (9303, "stop go go go go stop", "en", "x", 21),
        ],
        docs.schema,
    )
    out = {r["doc_id"]: r for r in repetition_scores(planted).collect()}
    r1 = out[9301]
    assert r1["n_2grams"] == 5 and r1["top_2gram_cnt"] == 3
    assert r1["top_2gram_frac"] == 0.6
    r2 = out[9302]
    assert r2["top_2gram_cnt"] == 1 and r2["dup_3gram_frac"] == 0.0
    assert r2["max_token_run"] == 1
    assert out[9303]["max_token_run"] == 4
    # duplicate 3-grams in the loop doc: 4 total, 2 distinct
    assert r1["dup_3gram_frac"] == 0.5


def test_pii_scrub_counts_and_redaction(spark, docs):
    """Planted PII is counted per category and fully redacted; the
    digest equals md5 of the expected redacted text."""
    import hashlib

    from scrapetition_spark.operators.text import pii_scrub

    planted = spark.createDataFrame(
        [
            (9401, "mail me at bob.smith+x@sub.example.org today", "en", "x", 1),
            (9402, "call 415-555-0123 or 212-555-9876 now", "en", "x", 1),
            (9403, "server at 10.1.2.3 and 192.168.0.1", "en", "x", 1),
            (9404, "clean text with no pii at all", "en", "x", 1),
        ],
        docs.schema,
    )
    out = {r["doc_id"]: r for r in pii_scrub(planted).collect()}
    assert out[9401]["n_emails"] == 1 and out[9401]["n_phones"] == 0
    assert out[9402]["n_phones"] == 2
    assert out[9403]["n_ips"] == 2
    assert out[9404]["n_emails"] == out[9404]["n_phones"] == out[9404]["n_ips"] == 0
    exp = hashlib.md5(b"mail me at <EMAIL> today").hexdigest()
    assert out[9401]["redacted_digest"] == exp
    exp3 = hashlib.md5(b"server at <IP> and <IP>").hexdigest()
    assert out[9403]["redacted_digest"] == exp3


def test_pii_scrub_synthetic_injection_roundtrip(spark, docs):
    """with_synthetic_pii plants exactly the counts pii_scrub finds:
    doc_id%3==0 → 1 email, %4==1 → 1 phone, %5==2 → 1 IP (the corpus
    itself is PII-free, asserted on a no-injection pass)."""
    from scrapetition_spark.operators.text import pii_scrub, with_synthetic_pii

    base = pii_scrub(docs)
    assert base.filter(
        (F.col("n_emails") > 0) | (F.col("n_phones") > 0) | (F.col("n_ips") > 0)
    ).count() == 0

    out = pii_scrub(with_synthetic_pii(docs))
    bad = out.filter(
        (F.col("n_emails") != F.when(F.col("doc_id") % 3 == 0, 1).otherwise(0))
        | (F.col("n_phones") != F.when(F.col("doc_id") % 4 == 1, 1).otherwise(0))
        | (F.col("n_ips") != F.when(F.col("doc_id") % 5 == 2, 1).otherwise(0))
    )
    assert bad.count() == 0


def test_stratified_sample_deterministic_and_bounded(spark, docs):
    """The sampler is deterministic (same summary twice), respects
    rate=0/100 exactly, and keeps per-language rates within a
    hash-uniform tolerance of the target."""
    from scrapetition_spark.operators.text import stratified_sample

    rows1 = {r["lang"]: r for r in stratified_sample(docs).collect()}
    rows2 = {r["lang"]: r for r in stratified_sample(docs).collect()}
    assert rows1.keys() == rows2.keys()
    for lang in rows1:
        assert rows1[lang] == rows2[lang]

    # rate 100 keeps everything; rate 0 keeps nothing
    langs = list(rows1)
    edge = stratified_sample(
        docs, rates={langs[0]: 100, **{l: 0 for l in langs[1:]}}
    )
    for r in edge.collect():
        if r["lang"] == langs[0]:
            assert r["n_kept"] == r["n_docs"] and r["kept_pct"] == 100.0
        else:
            assert r["n_kept"] == 0 and r["n_tokens_kept"] == 0

    # default rates land near target (±15pp at sf0.001 sizes)
    from scrapetition_spark.operators.text import SAMPLE_RATES

    for lang, r in rows1.items():
        target = SAMPLE_RATES[lang]
        assert abs(r["kept_pct"] - target) <= 15, (lang, r["kept_pct"], target)


def test_neardup_clusters_transitive(spark, docs):
    """Connected components: a planted chain a-b, b-c plus a separate
    pair d-e yields clusters {a,b,c}→a and {d,e}→d; label propagation
    converges (transitivity the pair list alone doesn't give)."""
    from scrapetition_spark.operators.dedup import neardup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    out = {r["doc_id"]: r["cluster_id"] for r in neardup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_neardup_clusters_long_chain_pointer_jumping(spark):
    """A 64-node path graph converges to one cluster — pointer
    jumping must beat naive per-hop propagation well inside the
    iteration cap (label-only propagation would need 63 rounds)."""
    from scrapetition_spark.operators.dedup import neardup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "doc_a long, doc_b long"
    )
    out = neardup_clusters(pairs, max_iterations=16)
    assert out.select("cluster_id").distinct().count() == 1
    assert out.count() == 65


def test_pack_sequences_single_stream_hand_computed(spark, docs):
    """One stream, seq_len=5: placement of hand-sized docs is exact,
    including a doc spanning a cut boundary."""
    from scrapetition_spark.operators.text import pack_sequences

    planted = spark.createDataFrame(
        [
            (1, "a b c", "en", "x", 5),          # 3 tok @ 0 → seq 0
            (2, "d e f g", "en", "x", 7),        # 4 tok @ 3 → spans seq 0-1
            (3, "h", "en", "x", 1),              # 1 tok @ 7 → seq 1
            (4, "i j k l m n o p q r s", "en", "x", 21),  # 11 tok @ 8 → seq 1-3
        ],
        docs.schema,
    )
    out = {
        r["doc_id"]: r
        for r in pack_sequences(planted, seq_len=5, n_streams=1).collect()
    }
    assert out[1]["first_seq"] == 0 and out[1]["offset_in_seq"] == 0
    assert out[1]["n_seqs_spanned"] == 1
    assert out[2]["first_seq"] == 0 and out[2]["offset_in_seq"] == 3
    assert out[2]["n_seqs_spanned"] == 2
    assert out[3]["first_seq"] == 1 and out[3]["offset_in_seq"] == 2
    assert out[4]["first_seq"] == 1 and out[4]["offset_in_seq"] == 3
    assert out[4]["n_seqs_spanned"] == 3  # tokens 8..18 → seqs 1,2,3


def test_pack_sequences_stream_tape_invariants(spark, docs):
    """Structural invariants on the real corpus: offsets stay below
    seq_len, each stream is a gapless token tape (sum of earlier
    docs' tokens == this doc's global offset), and placement is
    independent of input partitioning (determinism at any
    parallelism)."""
    from scrapetition_spark.operators.text import pack_sequences

    out = pack_sequences(docs, seq_len=128, n_streams=4)
    assert out.filter(
        (F.col("offset_in_seq") < 0) | (F.col("offset_in_seq") >= 128)
    ).count() == 0
    # gapless tape: reconstruct each doc's global start and compare
    # to the running sum computed independently via a self-join
    rows = out.collect()
    by_stream: dict[int, list] = {}
    for r in rows:
        by_stream.setdefault(r["stream"], []).append(r)
    for stream, members in by_stream.items():
        members.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in members:
            assert r["first_seq"] * 128 + r["offset_in_seq"] == cum
            cum += r["n_tokens"]
    # repartition the input differently: identical placement
    again = {
        (r["doc_id"], r["stream"], r["first_seq"], r["offset_in_seq"])
        for r in pack_sequences(docs.repartition(13), 128, 4).collect()
    }
    assert again == {
        (r["doc_id"], r["stream"], r["first_seq"], r["offset_in_seq"])
        for r in rows
    }


def test_eval_decontamination_planted(spark, docs):
    """A training doc sharing exactly one 3-gram window (twice) with
    the eval stratum is flagged with exact counts; a disjoint doc is
    absent; eval docs themselves are never in the output."""
    from scrapetition_spark.operators.dedup import eval_decontamination

    planted = spark.createDataFrame(
        [
            # eval doc (doc_id % 7 == 0 with eval_mod=7)
            (7000, "secret bench phrase plus filler words", "en", "x", 1),
            # contaminated: contains "secret bench phrase" twice
            (7001, "secret bench phrase again secret bench phrase", "en", "x", 1),
            # clean: no shared 3-gram
            (7002, "totally unrelated text goes here now", "en", "x", 1),
        ],
        docs.schema,
    )
    out = {r["doc_id"]: r for r in eval_decontamination(planted, eval_mod=7).collect()}
    assert 7000 not in out and 7002 not in out
    r = out[7001]
    # 7 tokens -> 5 3-grams; "secret bench phrase" occurs at pos 0 and 4
    assert r["n_ngrams"] == 5
    assert r["n_hit_ngrams"] == 2 and r["n_hit_distinct"] == 1
    assert r["contam_frac"] == 0.4


def test_full_pipeline_composition(spark, docs):
    """p2 (the composed cleaning pipeline in the driver entry) equals
    the intersection of its individually-verified gates — every kept
    doc passes each gate recomputed independently, and each gate has
    signal (drops at least one doc that passed the previous ones) on
    a corpus planted to exercise all of them."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __spark_entry__ as E
    from scrapetition_spark.operators.dedup import (
        eval_decontamination,
        exact_dedup,
    )
    from scrapetition_spark.operators.text import (
        SAMPLE_RATES,
        quality_scores,
        repetition_scores,
        sample_bucket,
    )

    kept = {
        r["doc_id"]
        for r in E.queries()["p2_full_pipeline"](spark, SF).collect()
    }
    assert kept, "pipeline kept nothing at sf0.001"

    canon = {r["canonical_doc"] for r in exact_dedup(docs).collect()}
    q = {r["doc_id"]: r["n_tokens"] for r in quality_scores(docs).collect()}
    rep = {r["doc_id"]: r for r in repetition_scores(docs).collect()}
    contam = {r["doc_id"] for r in eval_decontamination(docs).collect()}
    buckets = {
        r["doc_id"]: (r["b"], r["lang"])
        for r in docs.select(
            "doc_id", "lang", sample_bucket(F.col("doc_id")).alias("b")
        ).collect()
    }
    for d in kept:
        assert d in canon and q[d] >= 20 and d % 97 != 0 and d not in contam
        assert (rep[d]["top_2gram_frac"] or 0) <= 0.1
        assert (rep[d]["max_token_run"] or 1) <= 3
        b, lang = buckets[d]
        assert b < SAMPLE_RATES[lang]
    # sampling gate has signal: some doc passing everything else is
    # excluded purely by its bucket
    passed_all_but_sample = {
        d
        for d in q
        if d in canon and q[d] >= 20 and d % 97 != 0 and d not in contam
        and (rep[d]["top_2gram_frac"] or 0) <= 0.1
        and (rep[d]["dup_3gram_frac"] or 0) <= 0.3
        and (rep[d]["max_token_run"] or 1) <= 3
    }
    assert kept == {
        d for d in passed_all_but_sample
        if buckets[d][0] < SAMPLE_RATES[buckets[d][1]]
    }
    assert passed_all_but_sample - kept, "sampling gate had no signal"


def test_pii_scrub_nested_patterns_consistent(spark, docs):
    """Counts agree with the redaction digest when categories nest:
    an IP-shaped email local part is ONE email and ZERO IPs; a
    phone-shaped local part is ONE email and ZERO phones (both would
    double-count if counted on the raw text)."""
    import hashlib

    from scrapetition_spark.operators.text import pii_scrub

    planted = spark.createDataFrame(
        [
            (9501, "reach me at 10.1.2.3@example.com ok", "en", "x", 1),
            (9502, "or 415-555-0123@example.com maybe", "en", "x", 1),
        ],
        docs.schema,
    )
    out = {r["doc_id"]: r for r in pii_scrub(planted).collect()}
    r1 = out[9501]
    assert (r1["n_emails"], r1["n_ips"], r1["n_phones"]) == (1, 0, 0)
    assert r1["redacted_digest"] == hashlib.md5(
        b"reach me at <EMAIL> ok"
    ).hexdigest()
    r2 = out[9502]
    assert (r2["n_emails"], r2["n_phones"]) == (1, 0)


def test_neardup_clusters_raises_when_not_converged(spark):
    """Exhausting max_iterations with labels still changing raises
    instead of returning a partially-merged clustering."""
    import pytest as _pytest

    from scrapetition_spark.operators.dedup import neardup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a long, doc_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        neardup_clusters(pairs, max_iterations=2)


def test_repetition_scores_plan_is_shuffle_free(spark, docs):
    """Document-local features must not shuffle: the physical plan is
    one parquet scan with zero exchanges (the review finding that the
    first cut paid three explode+window passes)."""
    from scrapetition_spark.operators.text import repetition_scores

    plan = (
        repetition_scores(docs.limit(10))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_exact_segment_dedup_planted(spark, docs):
    """Hand-computable segment dedup: a later doc repeating an earlier
    doc's full 4-token window is flagged; partial trailing windows and
    sub-k docs are dropped (identically to the oracle)."""
    from scrapetition_spark.operators.dedup import exact_segment_dedup

    planted = spark.createDataFrame(
        [
            (9301, "qa qb qc qd qe qf qg qh", "en", "x", 23),
            # 9 tokens: segments "qz qz qz qz" and "qe qf qg qh" (dup
            # of 9301's second segment); trailing "qx" dropped
            (9302, "qz qz qz qz qe qf qg qh qx", "en", "x", 26),
            (9303, "qp qq qr", "en", "x", 8),  # < 4 tokens: absent
        ],
        docs.schema,
    )
    out = {
        r["doc_id"]: r
        for r in exact_segment_dedup(planted, k=4).collect()
    }
    assert set(out) == {9301, 9302}
    assert out[9301]["n_segments"] == 2 and out[9301]["n_dup_segments"] == 0
    assert out[9302]["n_segments"] == 2 and out[9302]["n_dup_segments"] == 1
    assert out[9302]["dup_frac"] == 0.5


def test_incremental_minhash_planted(spark, docs):
    """An incoming doc identical to a corpus doc collides in every
    band and verifies at jaccard 1.0; a disjoint-vocab doc produces no
    candidate at all (its shingle minima cannot equal any corpus
    bucket)."""
    from scrapetition_spark.operators.dedup import incremental_minhash_dedup

    corpus = spark.createDataFrame(
        [(9401, "ia ib ic id ie if ig ih ii ij", "en", "x", 29),
         (9402, "ja jb jc jd je jf jg jh ji jj", "en", "x", 29)],
        docs.schema,
    )
    new = spark.createDataFrame(
        [(9901, "ia ib ic id ie if ig ih ii ij", "en", "x", 29),
         (9902, "ka kb kc kd ke kf kg kh ki kj", "en", "x", 29)],
        docs.schema,
    )
    rows = incremental_minhash_dedup(corpus, new).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["new_doc"] == 9901 and r["corpus_doc"] == 9401
    assert r["n_bands"] == 4 and r["jaccard"] == 1.0 and r["is_dup"]


def test_mix_weights_hand_computed(spark, docs):
    """weight = target share / actual token share; keep_rate caps at
    1; n_repeats = ceil(weight); absent strata get weight 0."""
    from scrapetition_spark.operators.text import mix_weights

    planted = spark.createDataFrame(
        [(1, "a b c d e f", "en", "x", 11),     # 6 tokens
         (2, "g h", "de", "x", 3),              # 2 tokens
         (3, "i j", "xx", "x", 3),              # 2 tokens, not in mix
         (4, "k", "zh", "x", 1)],               # 1 token (upsampled)
        docs.schema,
    )
    out = {r["lang"]: r for r in mix_weights(planted).collect()}
    # totals: 11 tokens; en 6/11 actual vs 0.40 target -> 0.7333
    assert out["en"]["actual_frac"] == 0.545455
    assert out["en"]["weight"] == 0.7333
    assert out["en"]["keep_rate"] == 0.7333 and out["en"]["n_repeats"] == 1
    # de: 2/11 actual vs 0.15 -> 0.825 (downsample)
    assert out["de"]["weight"] == 0.825 and out["de"]["n_repeats"] == 1
    # zh: 1/11 actual vs 0.15 -> 1.65: keep everything, repeat 2x
    assert out["zh"]["weight"] == 1.65
    assert out["zh"]["keep_rate"] == 1.0 and out["zh"]["n_repeats"] == 2
    # xx: not in targets -> dropped from the mix
    assert out["xx"]["weight"] == 0.0 and out["xx"]["keep_rate"] == 0.0


def test_epoch_shuffle_permutation_properties(spark, docs):
    """shuffle_pos is a contiguous 0..n-1 permutation, invariant under
    input partitioning AND under the shard count (the monotone-prefix
    sharding must reproduce the single global md5 order exactly);
    different epochs give different permutations."""
    from scrapetition_spark.operators.text import epoch_shuffle

    import pytest as _pytest

    n = docs.count()
    e1 = {r["doc_id"]: r["shuffle_pos"]
          for r in epoch_shuffle(docs, epoch=1).collect()}
    assert sorted(e1.values()) == list(range(n))
    # shard-count + partitioning invariance: same permutation
    e1b = {r["doc_id"]: r["shuffle_pos"]
           for r in epoch_shuffle(docs.repartition(13), epoch=1,
                                  n_shards=7).collect()}
    assert e1 == e1b
    # another epoch is a different (but still complete) permutation
    e2 = {r["doc_id"]: r["shuffle_pos"]
          for r in epoch_shuffle(docs, epoch=2).collect()}
    assert sorted(e2.values()) == list(range(n))
    assert e1 != e2
    with _pytest.raises(ValueError, match="n_shards"):
        epoch_shuffle(docs, n_shards=0)


def test_unigram_lm_scores_hand_computed(spark, docs):
    """bits_per_token = mean -log2(corpus unigram prob); a doc of
    common tokens scores below the corpus entropy (keep=True), a doc
    carrying the rare tokens above it (keep=False)."""
    import math

    from scrapetition_spark.operators.text import unigram_lm_scores

    planted = spark.createDataFrame(
        [(1, "x x x x", "en", "x", 7),
         (2, "x x y z", "en", "x", 7)],
        docs.schema,
    )
    out = {r["doc_id"]: r for r in unigram_lm_scores(planted).collect()}
    # vocab: x:6 y:1 z:1, total 8
    bx, br = -math.log2(6 / 8), -math.log2(1 / 8)
    assert out[1]["n_tokens"] == 4
    assert out[1]["bits_per_token"] == pytest.approx(round(bx, 4))
    assert out[2]["bits_per_token"] == pytest.approx(
        round((2 * bx + 2 * br) / 4, 4)
    )
    # entropy = (6*bx + 2*br)/8 ≈ 1.0613: doc 1 below, doc 2 above
    assert out[1]["keep"] is True and out[2]["keep"] is False


def test_semantic_dedup_planted_and_invariants(spark, emb):
    """SemDedup: a planted identical pair lands in one cell and the
    larger id is dropped with dup_of = the smaller; every vector
    appears exactly once and keep <=> dup_of IS NULL."""
    from scrapetition_spark.operators.dedup import semantic_dedup

    base = emb.limit(40)
    clone = base.filter(F.col("vec_id") == 7).select(
        F.lit(9001).cast("long").alias("vec_id"),
        "embedding",
        F.col("label"),
    )
    frame = base.unionByName(clone)
    out = semantic_dedup(frame, n_cells=4, threshold=0.99).localCheckpoint()

    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == 41  # one row per vector, none lost
    assert rows[9001]["keep"] is False and rows[9001]["dup_of"] == 7
    assert rows[7]["keep"] is True and rows[7]["dup_of"] is None
    # identical embeddings must share a cell (same cosines, same
    # deterministic tie-break)
    assert rows[9001]["cell"] == rows[7]["cell"]
    for r in rows.values():
        assert r["keep"] == (r["dup_of"] is None)
        if r["dup_of"] is not None:
            assert r["dup_of"] < r["vec_id"]


def test_semantic_dedup_prune_is_cell_local(spark, emb):
    """Near-identical vectors in DIFFERENT cells are both kept —
    the quadratic prune never crosses a cell boundary (that is the
    SemDedup contract that bounds the pairwise pass)."""
    from scrapetition_spark.operators.dedup import semantic_dedup

    out = semantic_dedup(emb, n_cells=16, threshold=0.4)
    joined = (
        out.alias("x")
        .join(out.alias("y"), F.col("x.dup_of") == F.col("y.vec_id"))
        .select(F.col("x.cell").alias("cx"), F.col("y.cell").alias("cy"))
    )
    cross = joined.filter(F.col("cx") != F.col("cy")).count()
    assert cross == 0


def test_tfidf_top_terms_planted(spark):
    """Hand-computed TF-IDF on a 3-doc corpus: integer rank key
    (tf desc, df asc, tok asc) and exact ln-based scores."""
    import math

    from scrapetition_spark.operators.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [(0, "a a a b c"), (1, "a b b d"), (2, "c c e e e")],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["pos"]): r
        for r in tfidf_top_terms(docs, k=3).collect()
    }
    # doc0: a(tf3) then the tf-1 tie b/c breaks on token asc
    assert [rows[(0, p)]["tok"] for p in (1, 2, 3)] == ["a", "b", "c"]
    # doc1: b(tf2), then d (df=1) outranks a (df=2) at equal tf
    assert [rows[(1, p)]["tok"] for p in (1, 2, 3)] == ["b", "d", "a"]
    # doc2 has only two distinct terms -> two rows
    assert (2, 3) not in rows
    assert [rows[(2, p)]["tok"] for p in (1, 2)] == ["e", "c"]
    assert rows[(0, 1)]["tfidf"] == round(3 * math.log(3 / 2), 4)
    assert rows[(1, 2)]["tfidf"] == round(1 * math.log(3 / 1), 4)
    assert rows[(0, 1)]["tf"] == 3 and rows[(0, 1)]["df"] == 2


def test_kmeans_matches_numpy_replica(spark, emb):
    """kmeans_assign equals an independent NumPy Lloyd replica
    (md5-sample init, rounded-argmax assign, rounded-mean update) —
    every assignment and rounded csim, not just cluster sizes."""
    import hashlib

    import numpy as np

    from scrapetition_spark.operators.similarity import kmeans_assign

    from decimal import ROUND_HALF_UP, Decimal

    sub = emb.limit(60).localCheckpoint()
    data = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in sub.collect()}
    k, n_iter = 4, 2

    def r(x, n):
        # Spark's F.round on doubles: shortest-repr + HALF_UP (NOT
        # numpy/python banker's rounding — they diverge at .5 tails)
        return float(
            Decimal(repr(float(x))).quantize(
                Decimal(f"1e-{n}"), rounding=ROUND_HALF_UP
            )
        )

    anchors = sorted(data, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v))[:k]
    cents = {a: data[a].copy() for a in anchors}

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    def assign(cents):
        out = {}
        for vid, v in data.items():
            best = min(
                ((-r(cos(v, c), 6), cell) for cell, c in cents.items())
            )
            out[vid] = best[1]
        return out

    for _ in range(n_iter):
        asg = assign(cents)
        cents = {}
        for cell in set(asg.values()):
            members = np.stack([data[v] for v, c in asg.items() if c == cell])
            cents[cell] = np.array([r(m, 6) for m in members.mean(axis=0)])
    expected = {
        vid: (cell, r(cos(data[vid], cents[cell]), 4))
        for vid, cell in assign(cents).items()
    }

    got = {
        r["vec_id"]: (r["cell"], r["csim"])
        for r in kmeans_assign(sub, k=k, n_iter=n_iter).collect()
    }
    assert got == expected


def test_kmeans_rejects_zero_iterations(spark, emb):
    from scrapetition_spark.operators.similarity import kmeans_assign

    with pytest.raises(ValueError):
        kmeans_assign(emb, n_iter=0)


def test_length_stats_exact_interpolation(spark):
    """Exact linear-interpolated percentiles on a hand-computable
    group: values 10,20,30,40 -> p50 = 25.0, p90 = 37.0."""
    from scrapetition_spark.operators.text import length_stats

    docs = spark.createDataFrame(
        [(i, "x", "en", "s", v) for i, v in enumerate([10, 20, 30, 40])],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = length_stats(docs).collect()[0]
    assert (r["lang"], r["n_docs"], r["total_chars"]) == ("en", 4, 100)
    assert (r["min_chars"], r["max_chars"]) == (10, 40)
    assert r["p50"] == 25.0
    assert r["p90"] == pytest.approx(37.0)
    assert r["p99"] == pytest.approx(39.7)
