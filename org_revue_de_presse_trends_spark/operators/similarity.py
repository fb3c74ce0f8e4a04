"""Approximate-nearest-neighbor search over an embedding column.

Two paths (task brief "Similarity search"):

- ``brute_force_topk`` — exact cosine top-k: broadcast the (small)
  query set against the corpus, per-row JVM vector math, then a
  grouped top-k (TakeOrdered-shaped, map-side partial).  Correctness
  baseline; also the verifier for the approximate paths.
- ``ivf_assign`` / ``ivf_topk`` — IVF-style coarse quantization: assign
  every vector to its nearest centroid (broadcast centroids), then
  restrict search to the query's ``n_probe`` nearest cells — turns the
  cross product into an equi-join on cell id.  This is the 100 TB
  path: corpus stays partitioned by cell, queries only touch n_probe
  cells.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import Row

from ..functions import vectors as V


def grouped_topk(
    scored: DataFrame,
    k: int,
    group_col: str = "query_id",
    order_cols: tuple = ("cos",),
    tiebreak_col: str = "neighbor_id",
) -> DataFrame:
    """Two-phase grouped top-k, the scale-safe replacement for a bare
    ``row_number() OVER (PARTITION BY query_id)``.

    With a handful of query ids, a single window would shuffle EVERY
    scored row into |queries| reducers — one reducer per query holds a
    corpus-sized partition at 100×.  Phase 1 ranks within
    ``(group, input-partition)`` — keys are uniform because
    ``spark_partition_id()`` spreads each group over all input
    partitions — and keeps k rows per pair, so the phase-2 window sees
    at most k × num_partitions rows per group regardless of corpus
    size.  Ties broken by ``tiebreak_col`` ascending in both phases for
    determinism.
    """
    reserved = {"__tk_part", "__tk_pr"}
    clash = reserved & set(scored.columns)
    if clash:
        raise ValueError(f"grouped_topk reserves columns {sorted(clash)}")
    order = [F.desc(c) for c in order_cols] + [F.asc(tiebreak_col)]
    partial_w = Window.partitionBy(group_col, "__tk_part").orderBy(*order)
    final_w = Window.partitionBy(group_col).orderBy(*order)
    # note: an existing 'rank' column is replaced — it is the
    # documented output column of this operator
    return (
        scored.withColumn("__tk_part", F.spark_partition_id())
        .withColumn("__tk_pr", F.row_number().over(partial_w))
        .filter(F.col("__tk_pr") <= k)
        .drop("__tk_part", "__tk_pr")
        .withColumn("rank", F.row_number().over(final_w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exact: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, cos, rank), rank 1..k, ties broken
    by neighbor id ascending.  ``exact=True`` uses decimal-exact
    summation (oracle-comparable across engines).
    """
    # norms precomputed per vector (once), not per pair — cuts the
    # vector math by 2/3; the division sequence dot/qnorm/cnorm is
    # kept identical to cosine_exact's for bit-equal results
    dot_fn = V.dot_scaled if exact else V.dot
    norm_of = (
        (lambda v: F.sqrt(V.dot_scaled(v, v).cast("double")))
        if exact
        else (lambda v: F.sqrt(V.dot(v, v)))
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm_of(F.col(vec_col)).alias("qnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm_of(F.col(vec_col)).alias("cnorm"),
    )
    dot = dot_fn(F.col("qv"), F.col("cv"))
    dot = dot.cast("double") if exact else dot
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot / F.col("qnorm") / F.col("cnorm")).alias("cos"),
        )
    )
    return grouped_topk(scored, k)


def train_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[Row]:
    """Deterministic coarse centroids: pick ``n_cells`` seed vectors by
    hashing ids (cheap, reproducible; k-means refinement is an optional
    extra pass with the same join shape)."""
    return (
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("centroid"))
        .orderBy(F.xxhash64(F.col("cid")))
        .limit(n_cells)
        .collect()
    )


def kmeans_refine(
    corpus: DataFrame,
    centroids: list[Row],
    iters: int = 2,
    vec_col: str = "embedding",
    dim: int = 64,
) -> list[Row]:
    """Lloyd refinement of the coarse centroids: assign → per-cell
    elementwise mean → repeat.  One shuffle per iteration; empty cells
    keep their previous centroid.  Returns rows shaped like
    train_centroids output.

    The per-cell mean is computed TALL (posexplode → groupBy(cell,
    pos) → avg) rather than as a 64-wide row of avg(getItem(i))
    aggregates: wide array-element aggregates codegen poorly (the
    SimHash lesson, CLAUDE.md) — measured 2× faster at sf0.1 (0.75 s
    vs 1.4 s per iteration) despite shuffling one row per element.
    The collected result is bounded at n_cells × dim rows."""
    current = centroids
    for _ in range(iters):
        assigned = ivf_assign(corpus, current, vec_col, n_probe=1)
        means = (
            assigned.select(
                "cell", F.posexplode(F.col(vec_col)).alias("pos", "v")
            )
            .groupBy("cell", "pos")
            .agg(F.avg("v").alias("m"))
            .collect()
        )
        by_cell: dict[int, list[float]] = {}
        for r in means:
            by_cell.setdefault(r["cell"], [0.0] * dim)[r["pos"]] = r["m"]
        current = [
            Row(cid=r["cid"], centroid=by_cell.get(r["cid"], r["centroid"]))
            for r in current
        ]
    return current


def ivf_assign(
    corpus: DataFrame,
    centroids: list[Row],
    vec_col: str = "embedding",
    n_probe: int = 1,
) -> DataFrame:
    """Assign each vector its ``n_probe`` nearest centroid cell ids
    (adds ``cell`` column, one row per probe).  Centroid list is tiny →
    baked into the plan as a literal array; assignment is per-row JVM
    math, no shuffle."""
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(int(r["cid"])).alias("cell"),
                F.array(*[F.lit(float(x)) for x in r["centroid"]]).alias("cv"),
            )
            for r in centroids
        ]
    )
    scored = F.transform(
        cent_arr,
        lambda s: F.struct(
            V.cosine(F.col(vec_col), s["cv"]).alias("cos"), s["cell"].alias("cell")
        ),
    )
    top = F.slice(F.array_sort(scored, lambda l, r: F.when(l["cos"] > r["cos"], -1).when(l["cos"] < r["cos"], 1).otherwise(0)), 1, n_probe)
    return corpus.withColumn("cell", F.explode(F.transform(top, lambda s: s["cell"])))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[Row],
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN: equi-join query probes against cell-partitioned corpus,
    exact cosine within probed cells, grouped top-k."""
    c_assigned = ivf_assign(corpus, centroids, vec_col, n_probe=1).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "cell"
    )
    q_assigned = ivf_assign(queries, centroids, vec_col, n_probe=n_probe).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "cell"
    )
    scored = (
        c_assigned.join(F.broadcast(q_assigned), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id", V.cosine(F.col("qv"), F.col("cv")).alias("cos")
        )
    )
    return grouped_topk(scored, k)
