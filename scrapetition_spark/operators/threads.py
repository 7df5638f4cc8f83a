"""Thread-id propagation (C12/A1-A4).

Reference: ``propagateThreads''`` —
/root/reference/src/Network/Scrapetition/Utils.hs:94-126 — a fixpoint
over a (key → comment) map:

1. duplicate keys collapse, LAST occurrence wins (``Map.fromList``
   over ``zip keys items``, Utils.hs:78);
2. roots (``parent IS NULL``) get ``thread := id`` (Utils.hs:109);
3. children adopt the thread of their (key-resolved) parent, but only
   from parents already *done* (Utils.hs:120-126);
4. a progress counter stops the recursion when an iteration resolves
   nothing new — orphans (parent not in the data) keep
   ``thread = NULL`` without crashing (Utils.hs:99-105; golden
   tests test/.../Utils.hs:89-134).

Spark shape: an iterative self-join loop — each round joins the
unresolved rows against the resolved ones on
``key(parent) == key(id)`` and checkpoints (lineage cut). Rounds =
thread depth, not data size; each round is a hash join on
(domain, id) — fully distributed, no skew beyond viral threads
(AQE skew-join handles those). The same loop serves the recursive
CTEs of the analytics layer (utils/threads.sql:3-13,
utils/threadview.sql:9-41, utils/subthread.sh:63-69): ``depth`` is
emitted for the threadview ``height`` column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def collapse_duplicates(
    df: DataFrame, key_cols: list[str], order_col: str | None
) -> DataFrame:
    """Map.fromList duplicate-key collapse: LAST occurrence wins
    (Utils.hs:78; golden test/.../Utils.hs:62-85). ``order_col``
    defines input order; None keeps arbitrary-but-single row."""
    if order_col is None:
        return df.dropDuplicates(key_cols)
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def propagate_threads(
    df: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
    thread_col: str = "thread",
    domain_col: str | None = "domain",
    order_col: str | None = None,
    with_depth: bool = False,
    max_iterations: int = 1000,
) -> DataFrame:
    """Assign ``thread_col`` by fixpoint parent-chasing; returns the
    input frame with ``thread`` filled (orphans stay NULL) and
    optionally ``depth`` (root = 0, ≙ threadview.sql height)."""
    keys = ([domain_col] if domain_col else []) + [id_col]
    cur = collapse_duplicates(df, keys, order_col)

    # step 1: thread starters (Utils.hs:109) — keep pre-assigned
    # threads (propagate only touches rows with thread IS NULL).
    cur = cur.withColumn(
        thread_col,
        F.when(F.col(thread_col).isNotNull(), F.col(thread_col)).when(
            F.col(parent_col).isNull(), F.col(id_col)
        ),
    )
    depth = F.when(F.col(thread_col).isNotNull(), F.lit(0)).cast("int")
    cur = cur.withColumn("__depth", depth).localCheckpoint()

    resolved_cnt = cur.filter(F.col(thread_col).isNotNull()).count()
    for _ in range(max_iterations):
        parents = cur.filter(F.col(thread_col).isNotNull()).select(
            *[F.col(k).alias(f"__p_{k}") for k in keys],
            F.col(thread_col).alias("__p_thread"),
            F.col("__depth").alias("__p_depth"),
        )
        todo = cur.filter(F.col(thread_col).isNull())
        done = cur.filter(F.col(thread_col).isNotNull())
        cond = [todo[parent_col] == parents[f"__p_{id_col}"]]
        if domain_col:
            cond.append(todo[domain_col].eqNullSafe(parents[f"__p_{domain_col}"]))
        joined = todo.join(parents, cond, "left_outer")
        stepped = joined.select(
            *[todo[c] for c in df.columns if c not in (thread_col, "__depth")],
            F.coalesce(todo[thread_col], parents["__p_thread"]).alias(thread_col),
            F.coalesce(
                todo["__depth"], parents["__p_depth"] + F.lit(1)
            ).alias("__depth"),
        ).select(*done.columns)
        cur = done.unionByName(stepped).localCheckpoint()
        new_cnt = cur.filter(F.col(thread_col).isNotNull()).count()
        if new_cnt == resolved_cnt:  # progress guard (Utils.hs:99-102)
            break
        resolved_cnt = new_cnt
        if new_cnt == cur.count():  # all done (Utils.hs:103-105)
            break

    if with_depth:
        return cur.withColumnRenamed("__depth", "depth")
    return cur.drop("__depth")


def subthread(
    threads_df: DataFrame,
    start_id: str,
    id_col: str = "id",
    parent_col: str = "parent",
    max_iterations: int = 1000,
) -> DataFrame:
    """A4 (utils/subthread.sh:63-69): all descendants of ``start_id``
    (inclusive) via iterative edge expansion — BFS over parent edges."""
    frontier = threads_df.filter(F.col(id_col) == start_id).select(id_col)
    result = frontier.localCheckpoint()
    for _ in range(max_iterations):
        children = (
            threads_df.alias("c")
            .join(
                result.alias("r"),
                F.col(f"c.{parent_col}") == F.col(f"r.{id_col}"),
                "inner",
            )
            .select(F.col(f"c.{id_col}").alias(id_col))
            .join(result, [id_col], "left_anti")
            .localCheckpoint()
        )
        if children.count() == 0:
            break
        result = result.unionByName(children).localCheckpoint()
    return threads_df.join(result, [id_col], "left_semi")


def propagate_threads_recursive(
    df: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
) -> DataFrame:
    """A1/A2 via Spark 4's ``WITH RECURSIVE`` (verified available in
    this runtime): the declarative twin of ``propagate_threads`` —
    Catalyst plans the fixpoint itself (UnionLoop), no driver-side
    iteration or localCheckpoints. Semantics = the *view* form
    (utils/threadview.sql:9-41): no duplicate-key collapse; orphans
    (parent chain leaving the data) come back with thread NULL via
    the outer join, matching the reference's progress-guard outcome
    (Utils.hs:99-105)."""
    spark = df.sparkSession
    df.createOrReplaceTempView("__threads_in")
    return spark.sql(
        f"""
        WITH RECURSIVE t ({id_col}, thread, depth) AS (
          SELECT {id_col}, {id_col}, 0
          FROM __threads_in WHERE {parent_col} IS NULL
          UNION ALL
          SELECT c.{id_col}, t.thread, t.depth + 1
          FROM __threads_in c JOIN t ON c.{parent_col} = t.{id_col}
        )
        SELECT c.{id_col}, c.{parent_col},
               t.thread AS thread, CAST(t.depth AS INT) AS depth
        FROM __threads_in c LEFT JOIN t ON c.{id_col} = t.{id_col}
        """
    )
