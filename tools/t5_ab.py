"""A/B: repetition_scores formulations — 3×(explode+window) (the
first cut) vs document-local array higher-order functions (shipped).

Alternating passes in ONE session so ambient drift hits both arms;
prints per-pass seconds and medians. Run at sf0.1 on a quiet machine:

    python tools/t5_ab.py [sf_dir] [passes]
"""

from __future__ import annotations

import statistics
import sys
import time

from pyspark.sql import Window
from pyspark.sql import functions as F


def windowed_repetition(docs):
    """The pre-review formulation: one explode+window per feature
    family (kept here verbatim for the measured comparison)."""
    from scrapetition_spark.operators.corpus import shingles

    g2 = (
        shingles(docs, 2)
        .groupBy("doc_id", "shingle")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(F.sum("cnt").alias("n_2grams"), F.max("cnt").alias("top_2gram_cnt"))
        .select(
            "doc_id", "n_2grams", "top_2gram_cnt",
            F.round(F.col("top_2gram_cnt") / F.col("n_2grams").cast("double"), 4)
            .alias("top_2gram_frac"),
        )
    )
    g3 = (
        shingles(docs, 3)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_3grams"),
             F.countDistinct("shingle").alias("n_distinct_3grams"))
        .select(
            "doc_id",
            F.round(1.0 - F.col("n_distinct_3grams")
                    / F.col("n_3grams").cast("double"), 4)
            .alias("dup_3gram_frac"),
        )
    )
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = toks.withColumn(
        "chg",
        F.when(F.col("tok") == F.lag("tok").over(w), F.lit(0)).otherwise(F.lit(1)),
    ).withColumn("run_id", F.sum("chg").over(w))
    rmax = (
        runs.groupBy("doc_id", "run_id").agg(F.count("*").alias("run_len"))
        .groupBy("doc_id").agg(F.max("run_len").alias("max_token_run"))
    )
    return (
        docs.select("doc_id")
        .join(g2, ["doc_id"], "left")
        .join(g3, ["doc_id"], "left")
        .join(rmax, ["doc_id"], "left")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    sys.path.insert(0, "/root/repo")
    from scrapetition_spark.operators.text import repetition_scores
    from scrapetition_spark.session import get_spark

    spark = get_spark(app_name="t5-ab", master="local[32]",
                      shuffle_partitions=32)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # warm-up both arms once (codegen / shuffle-service spin-up)
    windowed_repetition(docs).count()
    repetition_scores(docs).count()

    times: dict[str, list[float]] = {"window": [], "hof": []}
    for _ in range(passes):
        for name, fn in (("window", windowed_repetition),
                         ("hof", repetition_scores)):
            t0 = time.time()
            fn(docs).count()
            times[name].append(round(time.time() - t0, 3))
    for name, ts in times.items():
        print(f"{name}: passes={ts} median={statistics.median(ts):.3f}s")


if __name__ == "__main__":
    main()
