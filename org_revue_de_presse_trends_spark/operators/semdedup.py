"""SemDeDup-style semantic deduplication over an embedding column
(Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication", arXiv:2303.09540 — public algorithm).

Where the exact/LSH dedup family (operators/dedup.py) prunes LEXICAL
duplicates and keeps the min-id member, SemDeDup prunes SEMANTIC
duplicates — documents whose embeddings are nearly parallel even when
their text differs — and keeps, per duplicate cluster, the member
LEAST similar to its k-means cell centroid (the paper's
diversity-preserving keeper rule, §3).

Pipeline (all composition of existing blocks):

1. deterministic k-means cells (``similarity.train_centroids_local``
   — one bounded sample-collect job, Lloyd rounds in numpy, the
   FAISS-style sample-trained coarse quantizer) baked into the plan
   as literals;
2. per-row nearest-cell assignment (``similarity.ivf_assign``) — no
   shuffle, broadcast-free (literal centroids);
3. intra-cell cosine pairs — one ``applyInPandas`` per cell: the
   group's unit-normalized matrix multiplied against itself in
   row-blocks (BLAS), pairs above threshold emitted with id_a < id_b.
   Replaced the r5 ids-only self-join + per-pair interpreted dot fold:
   measured 1.9 s → 0.45 s for the pair stage at sf0.1 (250k dots) —
   the matmul batches what the HOF evaluated pair-at-a-time;
4. connected components over the pair graph
   (``dedup.cluster_pairs``);
5. keeper election: per cluster, row_number over (cent_cos ASC,
   id ASC) — the unique-id tiebreak keeps the result total-ordered.

Scale shape (100 TB): pairwise work is Σ|cell|² — pick ``n_cells``
proportional to corpus size to bound cell occupancy (the paper uses
~50k cells for 8B docs; occupancy stays ~1e5 and the per-cell matmul
is embarrassingly parallel, one task per cell).  Per-task memory is
|block| × |cell| similarity rows (the matrix is computed in row
blocks, never |cell|² at once) plus the |cell| × dim unit matrix.
The keeper window partitions by cluster — near-dup components are
small by construction (cosine ≥ τ within one cell).  Nothing here
materializes on the driver except the centroid list.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as V
from .dedup import cluster_pairs
from .similarity import _dcsv, ivf_assign, train_centroids_local


def _cell_pair_fn(threshold: float, block: int):
    """applyInPandas factory: all intra-group cosine pairs ≥ threshold.

    The group is sorted by id first, so (a) emitted pairs satisfy
    id_a < id_b by construction and (b) the BLAS input layout is
    independent of shuffle arrival order — each pair's dot accumulates
    over the dimension axis only, making values replay-stable."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id", ignore_index=True)
        ids = pdf["id"].to_numpy()
        rows, cols, cos = V.blocked_cosine_pairs(
            pdf["v"].to_numpy(), threshold, block
        )
        # the kernel pairs by POSITION: duplicate input ids would emit
        # id_a == id_b rows the replaced join formulation's a.id < b.id
        # predicate excluded — preserve that contract
        if len(rows):
            distinct = ids[rows] != ids[cols]
            rows, cols, cos = rows[distinct], cols[distinct], cos[distinct]
        return pd.DataFrame(
            {"id_a": ids[rows], "id_b": ids[cols], "cos": cos}
        ).astype({"id_a": "int64", "id_b": "int64", "cos": "float64"})

    return fn


def semantic_dedup(
    corpus: DataFrame,
    n_cells: int = 16,
    threshold: float = 0.7,
    kmeans_iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """(id, cell, cluster, cent_cos, keep) — one row per input vector.

    ``keep`` is true for exactly one member of every semantic-dup
    cluster (the one least similar to its cell centroid, ties → min
    id) and for every unpaired vector.  ``cluster`` is the min id of
    the vector's near-dup component (its own id when unpaired).
    ``cent_cos`` is the cosine to the assigned cell centroid —
    returned so callers can audit the keeper rule.
    """
    cents = train_centroids_local(
        corpus, n_cells, iters=kmeans_iters, vec_col=vec_col,
        id_col=id_col, dim=dim,
    )
    assigned = ivf_assign(corpus, cents, vec_col, n_probe=1)
    # cell→centroid as ONE parsed map literal (plan-build tax: a
    # Column-by-Column construction costs ~0.2 ms/py4j call × n_cells
    # × dim — see CLAUDE.md).  Keys are exactly the cid set ivf_assign
    # emits, so plain element_at cannot miss under ANSI.
    cent_map = F.expr(
        "map("
        + ",".join(
            f"{int(r['cid'])}, array({_dcsv(r['centroid'])})" for r in cents
        )
        + ")"
    )
    base = assigned.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).alias("v"),
        "cell",
        V.cosine(F.col(vec_col), F.element_at(cent_map, F.col("cell"))).alias(
            "cent_cos"
        ),
    )
    # Pair stage history: the naive cosine-inside-self-join paid three
    # interpreted 64-folds per pair at |cells|-way parallelism (14.7 s
    # warm at sf0.1); the r5 rework (ids-only join + rebalance + one
    # dot fold) got it to ~1.9 s; this applyInPandas per-cell blocked
    # matmul measures 0.45 s — BLAS batches what the HOF evaluated
    # pair-at-a-time, and Arrow moves each cell's vectors once instead
    # of twice through a pair join.
    pairs = (
        base.select("id", "v", "cell")
        .groupBy("cell")
        .applyInPandas(
            _cell_pair_fn(threshold, block=4096),
            "id_a long, id_b long, cos double",
        )
    )
    clusters = cluster_pairs(pairs)
    labeled = (
        base.select("id", "cell", "cent_cos")
        .join(clusters, "id", "left")
        .withColumn("cluster", F.coalesce(F.col("cluster"), F.col("id")))
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("cent_cos").asc(), F.col("id").asc()
    )
    return labeled.select(
        "id",
        "cell",
        "cluster",
        "cent_cos",
        (F.row_number().over(w) == F.lit(1)).alias("keep"),
    )
