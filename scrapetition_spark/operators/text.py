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
