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
