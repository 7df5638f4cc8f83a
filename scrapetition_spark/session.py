"""SparkSession bootstrap tuned for the crawl/analytics workload.

Maps the reference's connect+DDL step (app/Main.hs:207-217,
Setup.hs:16-24) onto SparkSession construction + catalog bootstrap.

Scale rationale (100 TB / 1000 executors):
- AQE on: runtime coalescing of shuffle partitions, skew-join
  splitting for hot-host joins, dynamic broadcast conversion.
- Arrow on: every pandas UDF (URL canonicalization, parse kernel)
  crosses the JVM/Python boundary in columnar batches.
- shuffle.partitions is a local default; on a real cluster it is
  set per-job to ~2-3x total cores (or left to AQE's coalescing
  with a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "scrapetition-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, else *).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    # Sandbox/local-mode: avoid reverse-DNS stalls on task scheduling.
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.locality.wait", "0")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Catalog commits bin-pack to few files (catalog.py); smaller
        # parquet row groups keep those files splittable so later
        # scans still fan out across all cores (Spark splits parquet
        # at row-group boundaries).
        .config("spark.hadoop.parquet.block.size", str(16 * 1024 * 1024))
        # Sink writes are device-bound at high local parallelism
        # (BENCH addendum 2: tmpfs cuts sinks 2.6x); a denser codec
        # trades spare CPU for bytes through the shared device.
        # Default snappy; probe knob for the codec A/B.
        .config(
            "spark.sql.parquet.compression.codec",
            os.environ.get("SPARK_GRAFT_PARQUET_CODEC", "snappy"),
        )
    )
    # Device-isolation probe knob (BENCH/BASELINE.md): point shuffle /
    # block-manager spill at a different device (e.g. /dev/shm) to
    # separate "plan doesn't scale" from "one shared disk saturates".
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    # JVM-flag probe knob (e.g. "-Xms32g -XX:+AlwaysPreTouch" to pin
    # the heap: under a syscall-intercepting sandbox, G1's on-demand
    # region commit/uncommit serializes 32 allocation-heavy threads
    # on memory-management syscalls — a single-JVM artifact a real
    # per-executor deployment never sees).
    java_opts = os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS")
    if java_opts:
        builder = builder.config("spark.driver.extraJavaOptions", java_opts)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def local_df(spark: SparkSession, rows, schema):
    """Driver-local rows as a SINGLE-partition DataFrame.

    ``spark.createDataFrame(rows, ...)`` parallelizes into
    defaultParallelism slices (32 on local[32]), so every job over the
    tiny frame schedules 32 Python-RDD tasks; under this sandbox each
    such task can spawn a fresh Python worker (~0.2 s apiece), turning
    a 1-row write into ~6 s (measured r03 — the bulk of the r01→r02
    crawl bench regression). One slice = one task ≈ 0.3 s, and is the
    right shape for small driver-side frames on a real cluster too."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )
