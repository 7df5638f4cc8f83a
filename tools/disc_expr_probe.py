"""Pin the non-scaling sub-expression of the discovered stage.

Builds the same `hit` frame as the scaling epoch, then times each
layer of the span-array URL-extraction expression chain separately:
scan → keep/transform → array_sort → native RFC3986 resolve →
aggregate-dedup → posexplode. Run at two levels and diff.

Usage: python tools/disc_expr_probe.py <cpus> [docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from scaling_bench import WEB_DIR
from scrapetition_spark.session import get_spark
from scrapetition_spark.functions.urls import url_resolve_native
from scrapetition_spark.parse.kernel import (
    COLLECTOR_ROLES, SP, _collector_target, hygienic_link,
)

_DISC_STRUCT = "array<struct<rank:int,offset:int,target:string>>"


def main() -> None:
    cpus = sys.argv[1]
    docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_600_000
    path = f"{WEB_DIR}-{docs}"
    spark = get_spark(app_name=f"expr-probe-{cpus}",
                      master=f"local[{cpus}]", shuffle_partitions=64)
    spark.range(10**6).select(F.avg("id")).collect()
    web = spark.read.parquet(path)
    # same shape as the epoch's hit (status always 200 here)
    hit = web.select(F.col("doc_id").alias("url"), "spans").localCheckpoint()
    print(f"hit_parts={hit.rdd.getNumPartitions()}", flush=True)

    scheme = r"^https://h\d+\.test/.*"
    collectors = ("js-comment-loader", "pager__page")
    roles = [r for r in collectors if r in COLLECTOR_ROLES]
    rank_of = {r: collectors.index(r) for r in roles}

    def role_of(s):
        return F.substring_index(s["text"], SP.SEP, 1)

    def keep(s):
        r = role_of(s)
        return (
            r.isin(roles)
            & s["media_ref"].isNotNull()
            & ((r != SP.ROLE_ANCHOR) | hygienic_link(s["media_ref"]))
        )

    def to_cand(s):
        r = role_of(s)
        rank = F.lit(None).cast("int")
        for role, rk in rank_of.items():
            rank = F.when(r == role, F.lit(rk)).otherwise(rank)
        return F.struct(
            rank.alias("rank"),
            s["offset"].cast("int").alias("offset"),
            _collector_target(r, s["media_ref"]).alias("target"),
        )

    def timed(label, df):
        for attempt in range(2):
            t0 = time.time()
            n = df.count()
            print(f"{label}[{attempt}]: {time.time() - t0:.1f}s n={n}",
                  flush=True)

    timed("1_scan_size", hit.select(F.size("spans").alias("n")).filter(F.col("n") >= 0))
    base = hit.filter(F.col("url").rlike(scheme))
    timed("2_rlike", base)
    cand = base.select(
        "url", F.transform(F.filter("spans", keep), to_cand).alias("__cand")
    ).filter(F.size("__cand") > 0)
    timed("3_keep_transform", cand)
    cand_sorted = base.select(
        "url", F.array_sort(F.transform(F.filter("spans", keep), to_cand)).alias("__cand")
    ).filter(F.size("__cand") > 0)
    timed("4_array_sort", cand_sorted)
    resolved = cand_sorted.withColumn(
        "__res",
        F.transform(
            "__cand",
            lambda x: F.struct(
                x["rank"].alias("rank"),
                x["offset"].alias("offset"),
                url_resolve_native(F.col("url"), x["target"]).alias("target"),
            ),
        ),
    )
    timed("5_resolve", resolved.select("url", F.size("__res").alias("k")))
    dedup = F.aggregate(
        "__res",
        F.expr(f"cast(array() as {_DISC_STRUCT})"),
        lambda acc, x: F.when(
            F.exists(acc, lambda a: a["target"] == x["target"]), acc
        ).otherwise(F.concat(acc, F.array(x))),
    )
    timed("6_dedup", resolved.select("url", F.size(dedup).alias("k")))
    timed("7_posexplode", resolved.select("url", F.posexplode(dedup)))
    # candidate rewrite: dedup via array_distinct over the (sorted)
    # target sequence — O(k) hash-set dedup, no O(k²) struct-array
    # concat churn; first occurrence in array order is preserved
    targets = F.array_distinct(
        F.transform("__res", lambda x: x["target"])
    )
    timed("8_distinct_posexplode", resolved.select("url", F.posexplode(targets)))


if __name__ == "__main__":
    main()
