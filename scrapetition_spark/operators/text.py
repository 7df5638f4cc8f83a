"""Text-analysis operators over the documents table: quality scoring,
token counting, fingerprinting, language heuristics. All native
column expressions (whole-stage codegen); each has an ANSI-SQL twin
in the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from scrapetition_spark.operators.corpus import shingles

# tiny built-in stopword list for the quality/language heuristics
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]


def quality_scores(docs: DataFrame) -> DataFrame:
    """Per-doc quality features: length, token counts, mean token
    length, distinct-token ratio, stopword ratio."""
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop_arr))
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.round((F.length("text") - n_tok + 1) / n_tok.cast("double"), 4).alias(
            "mean_token_len"
        ),
        F.round(n_distinct / n_tok.cast("double"), 4).alias("distinct_ratio"),
        n_stop.alias("n_stopword_types"),
    )


def token_counts(docs: DataFrame, top: int = 20) -> DataFrame:
    """Corpus-level token frequencies, top-N (deterministic
    tie-break on the token itself)."""
    return (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(top)
    )


def fingerprints(docs: DataFrame, shingle_n: int = 5) -> DataFrame:
    """Winnowing-lite document fingerprint: the minimum md5 over
    word 5-grams (rolling-window hash; engine-portable)."""
    sh = shingles(docs, shingle_n)
    return sh.groupBy("doc_id").agg(
        F.min(F.md5("shingle")).alias("fingerprint"),
        F.count("*").alias("n_windows"),
    )


def repetition_scores(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition features per doc (Rae et al. 2021's
    repetition filters, re-expressed over word n-grams since the
    corpus has no line structure):

    - ``top_2gram_frac``: occurrences of the most frequent word
      2-gram / total 2-grams (high ⇒ boilerplate loops);
    - ``dup_3gram_frac``: 1 − distinct 3-grams / total 3-grams;
    - ``max_token_run``: longest run of one token repeated
      back-to-back.

    These are DOCUMENT-LOCAL features, so the right 100 TB plan has
    no shuffle at all: everything is computed with array higher-order
    functions on the in-row token array (``zip_with`` n-grams, an
    ``aggregate`` linear scan for the longest equal-run — the most
    frequent element of the sorted 2-gram array IS its longest
    equal-run). ONE parquet scan, ZERO exchanges (asserted by test),
    all JVM-side expression evaluation — no Python, no explode, no
    window sort. Docs shorter than the n-gram width get NULL for
    that feature (documented; the synthetic corpus has none)."""
    cols = repetition_columns()
    return docs.select("doc_id", *(c.alias(n) for n, c in cols.items()))


def repetition_columns() -> dict[str, F.Column]:
    """The repetition features as raw named Columns over ``text`` —
    the single definition shared by ``repetition_scores`` and fused
    pipelines (``p2_full_pipeline`` computes them inline on its base
    scan instead of joining the operator's output back on doc_id,
    which Catalyst cannot fuse across a self-join)."""
    toks = F.split("text", " ")
    n = F.size(toks)

    def ngrams(width: int):
        parts = [
            F.slice(toks, i + 1, F.greatest(n - (width - 1), F.lit(0)))
            for i in range(width)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = F.zip_with(out, p, lambda a, b: F.concat(a, F.lit(" "), b))
        return out

    def max_equal_run(arr):
        init = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        )

        def step(acc, x):
            run = (
                F.when(x == acc["prev"], acc["run"] + 1)
                .otherwise(F.lit(1).cast("long"))
            )
            return F.struct(
                x.alias("prev"),
                run.alias("run"),
                F.greatest(acc["best"], run).alias("best"),
            )

        return F.aggregate(arr, init, step, lambda acc: acc["best"])

    g2 = ngrams(2)
    g3 = ngrams(3)
    n2 = F.size(g2)
    n3 = F.size(g3)
    top2 = max_equal_run(F.array_sort(g2))
    return {
        "n_2grams": F.when(n2 > 0, n2.cast("long")),
        "top_2gram_cnt": F.when(n2 > 0, top2),
        "top_2gram_frac": F.when(
            n2 > 0, F.round(top2 / n2.cast("double"), 4)
        ),
        "dup_3gram_frac": F.when(
            n3 > 0,
            F.round(
                1.0 - F.size(F.array_distinct(g3)) / n3.cast("double"), 4
            ),
        ),
        "max_token_run": max_equal_run(toks),
    }


# PII regexes — identical Java-regex / RE2 semantics (character
# classes, \b ASCII word boundary, bounded repetition only), so the
# Spark expressions and the DuckDB oracle match byte-for-byte.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def with_synthetic_pii(docs: DataFrame) -> DataFrame:
    """Deterministically inject PII-shaped strings into the corpus
    text (emails for doc_id % 3 == 0, phone numbers for % 4 == 1,
    IPv4s for % 5 == 2) — the testdata corpus is PII-free, so the
    scrub operator needs a deterministic corpus both engines can
    derive identically (same pattern as corpus.urls_from_documents)."""
    d = F.col("doc_id")
    email = F.when(
        d % 3 == 0,
        F.concat(
            F.lit(" contact user"), d.cast("string"),
            F.lit("@mail"), (d % 7).cast("string"), F.lit(".example.com"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        d % 4 == 1,
        F.concat(
            F.lit(" call 415-555-"),
            F.lpad((d % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        d % 5 == 2,
        F.concat(
            F.lit(" from 10."), (d % 256).cast("string"),
            F.lit(".0."), (d % 100).cast("string"),
        ),
    ).otherwise(F.lit(""))
    return docs.select(
        "doc_id", "lang", F.concat(F.col("text"), email, phone, ip).alias("text")
    )


def pii_scrub(docs: DataFrame) -> DataFrame:
    """Detect + redact PII (emails, NANP-style phone numbers, IPv4
    addresses) with native ``regexp_extract_all`` / ``regexp_replace``
    — counts per category plus the md5 of the fully-redacted text
    (the digest keeps the verified payload small while still pinning
    every replaced byte). Redaction order: emails first (their
    local parts / domains would otherwise feed the IP/phone
    patterns), then IPs, then phones — and each category is COUNTED
    on the text as it stands at its stage of that same order, so the
    counts always agree with the digest (an IP-shaped email local
    part like 10.1.2.3@example.com is one email, zero IPs)."""
    t = F.col("text")
    n_emails = F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_RE), F.lit(0)))
    t1 = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    n_ips = F.size(F.regexp_extract_all(t1, F.lit(PII_IP_RE), F.lit(0)))
    t2 = F.regexp_replace(t1, PII_IP_RE, "<IP>")
    n_phones = F.size(F.regexp_extract_all(t2, F.lit(PII_PHONE_RE), F.lit(0)))
    redacted = F.regexp_replace(t2, PII_PHONE_RE, "<PHONE>")
    return docs.select(
        "doc_id",
        n_emails.cast("int").alias("n_emails"),
        n_phones.cast("int").alias("n_phones"),
        n_ips.cast("int").alias("n_ips"),
        F.md5(redacted).alias("redacted_digest"),
    )


# per-language keep rates (percent) for the deterministic stratified
# sampler — a typical training-mix rebalance (downsample the dominant
# language, keep the tails)
SAMPLE_RATES = {"en": 30, "de": 60, "fr": 60, "es": 60, "zh": 90}


def sample_bucket(doc_id: F.Column, mod: int = 100) -> F.Column:
    """Deterministic 0..mod-1 bucket from md5(doc_id) — engine-portable
    (DuckDB computes the identical hex-prefix integer), so sampling
    is reproducible and join-free at any scale."""
    return (
        F.conv(F.substring(F.md5(doc_id.cast("string")), 1, 4), 16, 10)
        .cast("long") % mod
    )


def rate_expr(rates: dict[str, int]) -> F.Column:
    """Per-language keep-rate CASE chain — the single source of truth
    shared by stratified_sample and the composed p2 pipeline."""
    rate = F.lit(None).cast("int")
    for lang, r in sorted(rates.items()):
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return rate


def stratified_sample(
    docs: DataFrame, rates: dict[str, int] | None = None
) -> DataFrame:
    """Per-language deterministic downsampling summary: every doc
    hashes into a 0-99 bucket, strata keep ``bucket < rate[lang]``.
    Returns one row per language — (n_docs, n_kept, n_tokens_kept,
    kept_pct) — the mixing/budget accounting a training-data pipeline
    runs before materializing the sampled corpus. Pure map-side
    expression + one hash aggregate; no shuffle beyond the groupBy."""
    rates = SAMPLE_RATES if rates is None else rates
    keep = sample_bucket(F.col("doc_id")) < rate_expr(rates)
    n_tok = F.size(F.split("text", " "))
    return (
        docs.select("doc_id", "lang", keep.alias("keep"), n_tok.alias("n_tok"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("keep"), F.col("n_tok")).otherwise(0))
            .cast("long")
            .alias("n_tokens_kept"),
        )
        .select(
            "lang",
            "n_docs",
            "n_kept",
            "n_tokens_kept",
            F.round(F.col("n_kept") * 100.0 / F.col("n_docs"), 2).alias("kept_pct"),
        )
    )


# target token proportions per language for the mixing planner — a
# typical multilingual pretraining mix (dominant language capped, tails
# upweighted)
MIX_TARGETS = {"en": 0.40, "de": 0.15, "fr": 0.15, "es": 0.15, "zh": 0.15}


def mix_weights(
    docs: DataFrame, targets: dict[str, float] | None = None
) -> DataFrame:
    """Training-mix rebalance plan: given target token PROPORTIONS per
    language/domain stratum, compute each stratum's actual share and
    the sampling directive that achieves the target — ``weight`` =
    target share / actual share, ``keep_rate`` = min(1, weight) (the
    downsample fraction), ``n_repeats`` = ceil(weight) (the epoch
    repetition count for upsampled strata, the LLaMA-style "seen N
    times" mixing knob). Strata absent from ``targets`` get weight 0
    (dropped from the mix).

    Scale shape: ONE map-side-combining hash aggregate over the corpus
    (per-stratum doc/token totals — a handful of rows), then a
    crossJoin against the broadcast 1-row grand total; the CASE chain
    and arithmetic are driver-free column algebra. Nothing here grows
    with corpus size except the single agg scan."""
    targets = MIX_TARGETS if targets is None else targets
    n_tok = F.size(F.split("text", " "))
    per_lang = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tok).cast("long").alias("n_tokens"),
    )
    total = per_lang.agg(F.sum("n_tokens").cast("long").alias("total_tokens"))
    tgt = F.lit(0.0)
    for lang, share in sorted(targets.items()):
        tgt = F.when(F.col("lang") == lang, F.lit(float(share))).otherwise(tgt)
    actual = F.col("n_tokens") / F.col("total_tokens").cast("double")
    weight = tgt / actual
    return (
        per_lang.crossJoin(F.broadcast(total))
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            F.round(actual, 6).alias("actual_frac"),
            F.round(tgt, 6).alias("target_frac"),
            F.round(weight, 4).alias("weight"),
            F.round(F.least(F.lit(1.0), weight), 4).alias("keep_rate"),
            F.ceil(weight).cast("long").alias("n_repeats"),
        )
    )


def pack_sequences(
    docs: DataFrame, seq_len: int = 512, n_streams: int = 8
) -> DataFrame:
    """GPT-style sequence packing plan: documents are concatenated in
    deterministic order (by doc_id) within ``n_streams`` independent
    token streams (md5-bucketed) and cut every ``seq_len`` tokens,
    documents splitting across cuts — the standard LLM-pretraining
    packing. Returns the per-doc placement map ``(doc_id, stream,
    n_tokens, first_seq, offset_in_seq, n_seqs_spanned)`` that a
    tokenizer-materialization pass joins on to emit the actual
    sequences.

    Scale shape: one running-sum window per stream and nothing else —
    streams are independent token tapes, so packing 100 TB is
    embarrassingly parallel across the hash buckets (no global
    ordering, no cross-stream shuffle; ``n_streams`` ≈ cluster
    parallelism). Deterministic: same corpus ⇒ same placement on any
    cluster size."""
    n_tok = F.size(F.split("text", " ")).cast("long")
    base = docs.select(
        "doc_id",
        sample_bucket(F.col("doc_id"), mod=n_streams).alias("stream"),
        n_tok.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("stream")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return base.select(
        "doc_id",
        "stream",
        "n_tokens",
        F.floor(cum_before / seq_len).alias("first_seq"),
        (cum_before % seq_len).alias("offset_in_seq"),
        (
            F.floor((cum_before + F.col("n_tokens") - 1) / seq_len)
            - F.floor(cum_before / seq_len)
            + 1
        ).alias("n_seqs_spanned"),
    )


def unigram_lm_scores(docs: DataFrame) -> DataFrame:
    """CCNet-style language-model quality scoring (Wenzek et al.
    2020's perplexity filter, at unigram order so the model is
    derivable from the corpus itself with no external artifact):
    per-doc average surprisal ``bits_per_token`` under the corpus
    unigram distribution, plus ``keep`` = bits_per_token ≤ the
    distribution's entropy (docs more typical than the corpus
    average — the "head" CCNet keeps). Both quantities are rounded
    to 4 decimals BEFORE the comparison, so the flag is a pure
    function of the hash-verified numbers.

    Scale shape: the vocabulary is Zipf-small relative to the corpus
    (one map-side-combining hash agg), so the per-token bits table
    broadcasts and the corpus side streams through explode → broadcast
    join → per-doc hash agg — no corpus-sized shuffle. (A
    beyond-broadcast vocabulary would demote that join to a plain
    shuffle on ``tok``; nothing else changes.) The entropy is one
    aggregate over the vocab frame."""
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count("*").cast("long").alias("cnt"))
    total = vocab.agg(F.sum("cnt").cast("long").alias("total"))
    vb = vocab.crossJoin(F.broadcast(total)).select(
        "tok",
        "cnt",
        (-F.log2(F.col("cnt") / F.col("total"))).alias("bits"),
    )
    ent = vb.agg(
        F.round(
            F.sum(F.col("cnt") * F.col("bits")) / F.sum("cnt"), 4
        ).alias("h")
    )
    bpt = F.round(F.sum("bits") / F.count("*"), 4)
    return (
        toks.join(F.broadcast(vb.select("tok", "bits")), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            bpt.alias("bits_per_token"),
        )
        .crossJoin(F.broadcast(ent))
        .select(
            "doc_id",
            "n_tokens",
            "bits_per_token",
            (F.col("bits_per_token") <= F.col("h")).alias("keep"),
        )
    )


def epoch_shuffle(
    docs: DataFrame, epoch: int = 1, n_shards: int = 256
) -> DataFrame:
    """Deterministic global training shuffle: assign every doc a
    contiguous 0-based ``shuffle_pos`` for the given ``epoch`` — the
    order a data loader reads the corpus that epoch. The permutation
    is ``md5(epoch || '|' || doc_id)`` rank: reproducible on any
    cluster, different per epoch, no RNG state to ship.

    Scale shape: a naive ``row_number() OVER (ORDER BY key)`` is a
    SINGLE-partition sort — the one-machine bottleneck a 100 TB
    shuffle cannot pay. Instead the key's top two bytes map MONOTONE
    onto ``n_shards`` contiguous ranges (``floor(v * n_shards /
    65536)`` — order-preserving, so sorting within shards IS the
    global md5 order): each shard ranks independently under a
    partitioned window (``n_shards`` ≈ cluster parallelism,
    md5-uniform sizes), and the global position adds the shard's
    offset — a cumulative sum over the per-shard counts, a
    ``n_shards``-row frame whose driver-window cost is O(shards),
    broadcast back. One shuffle for the window, one tiny agg; no
    global sort."""
    if not 1 <= n_shards <= 65536:
        raise ValueError(f"n_shards must be in [1, 65536], got {n_shards}")
    key = F.md5(
        F.concat(F.lit(f"{epoch}|"), F.col("doc_id").cast("string"))
    )
    shard = F.floor(
        F.conv(F.substring(key, 1, 4), 16, 10).cast("long")
        * n_shards
        / 65536
    ).cast("int")
    base = docs.select("doc_id", key.alias("skey"), shard.alias("shard"))
    w = Window.partitionBy("shard").orderBy("skey", "doc_id")
    pos_in = F.row_number().over(w).cast("long")
    counts = base.groupBy("shard").agg(F.count("*").alias("c"))
    w_off = Window.orderBy("shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "shard",
        F.coalesce(F.sum("c").over(w_off), F.lit(0).cast("long")).alias(
            "off"
        ),
    )
    return (
        base.join(F.broadcast(offsets), "shard")
        .select(
            "doc_id",
            F.lit(epoch).alias("epoch"),
            (F.col("off") + pos_in - 1).alias("shuffle_pos"),
        )
    )


def language_guess(docs: DataFrame) -> DataFrame:
    """Stopword-marker language heuristic (the operator shape of an
    n-gram language-ID; the synthetic corpus is vocab-uniform so the
    scores are what's asserted, not linguistics)."""
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    hits = F.size(F.array_intersect(F.array_distinct(toks), stop_arr))
    ratio = F.round(hits / F.size(F.array_distinct(toks)).cast("double"), 4)
    return docs.select(
        "doc_id",
        "lang",
        hits.alias("marker_hits"),
        ratio.alias("marker_ratio"),
        (hits >= 2).alias("looks_english"),
    )


def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Per-document top-k TF-IDF terms — the classic corpus keyword
    surface a training-data pipeline uses for topic tagging / quality
    triage.

    Plan shape at 100 TB: term frequencies are one map-side-combining
    hash agg after the explode; document frequencies aggregate the
    (already distinct) tf pairs, so no second corpus scan; the
    tf⋈df join shuffles on the token key (Zipf-wide key space — AQE
    broadcasts the df side when the vocabulary is small); the top-k
    window partitions on doc_id, which is maximal-cardinality, so no
    single partition sees more than one document's terms.

    The RANKING key is integer-exact — (tf DESC, df ASC, token ASC) —
    never the floating score: two engines disagreeing by one ulp of
    ``ln`` must not pick different terms. The tfidf score itself
    (tf · ln(n/df), rounded to 4) is reported for the rows the integer
    rank selected.
    """
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = docs.count()  # one bounded scalar action
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("tok").asc()
    )
    return (
        tf.join(dfreq, "tok")
        .withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= k)
        .select(
            "doc_id",
            "tok",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.lit(float(n)) / F.col("df")), 4
            ).alias("tfidf"),
            "pos",
        )
    )


def length_stats(docs: DataFrame) -> DataFrame:
    """Per-language exact length percentiles (p50/p90/p99), min/max
    and totals — the corpus profile a pipeline consults before
    setting quality-filter thresholds.

    Exact (not approx) percentiles on purpose: ``F.percentile`` is a
    single-pass sort-based aggregate per group, and language groups
    are few — the right trade at any scale when the group count is
    bounded (use percentile_approx only when the GROUP key is
    unbounded). Interpolation is the classical linear rule in both
    engines (Spark `percentile` ≙ DuckDB `quantile_cont`), rounded
    once at 4."""
    pct = F.percentile(F.col("n_chars"), F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.round(pct[0], 4).alias("p50"),
            F.round(pct[1], 4).alias("p90"),
            F.round(pct[2], 4).alias("p99"),
        )
        .orderBy("lang")
    )
