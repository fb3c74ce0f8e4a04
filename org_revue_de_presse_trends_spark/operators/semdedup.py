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

1. deterministic k-means cells (``similarity.train_centroids`` +
   ``kmeans_refine``) — centroids are collected once (bounded at
   n_cells × dim scalars) and baked into the plan as literals;
2. per-row nearest-cell assignment (``similarity.ivf_assign``) — no
   shuffle, broadcast-free (literal centroids);
3. intra-cell cosine pairs — an ids-only equi self-join on the cell
   id (never all-pairs; sides share one exchange), rebalanced by
   id_a, then once-per-row unit-normalized vectors re-attached so
   each pair costs ONE interpreted 64-fold (dot), not three;
4. connected components over the pair graph
   (``dedup.cluster_pairs``);
5. keeper election: per cluster, row_number over (cent_cos ASC,
   id ASC) — the unique-id tiebreak keeps the result total-ordered.

Scale shape (100 TB): pairwise work is Σ|cell|² — pick ``n_cells``
proportional to corpus size to bound cell occupancy (the paper uses
~50k cells for 8B docs; occupancy stays ~1e5 and the per-cell join is
embarrassingly parallel).  The keeper window partitions by cluster —
near-dup components are small by construction (cosine ≥ τ within one
cell).  Nothing here materializes on the driver except the centroid
list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as V
from .dedup import cluster_pairs
from .similarity import _dcsv, ivf_assign, kmeans_refine, train_centroids


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
    cents = train_centroids(corpus, n_cells, vec_col, id_col)
    cents = kmeans_refine(
        corpus, cents, iters=kmeans_iters, vec_col=vec_col, dim=dim
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
    # Pair stage, cost-shaped like embedding_lsh_pairs (CLAUDE.md):
    # the naive form — cosine inside the cell self-join — paid THREE
    # interpreted 64-folds per pair (dot + both norms) AND ran the
    # scoring at |cells|-way parallelism (the join output stays
    # partitioned by the handful of cell keys); measured 14.7 s warm
    # at sf0.1.  Instead: ids-only cell join → repartition(id_a)
    # rebalance → re-attach ONCE-normalized vectors → a single dot
    # fold per pair at full parallelism.  With the dot-rank
    # ivf_assign this took the query 14.7 s → 5.1 s warm at sf0.1
    # (what remains is the iterative phases' driver sync, not pair
    # work — exec after plan build measures 0.8 s).
    members = base.select("id", "cell").repartition(F.col("id"))
    a, b = members.alias("a"), members.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .repartition("id_a")
    )
    # norm staged as an attribute before the transform: referencing it
    # inside the per-element lambda would re-evaluate the norm
    # reduction per element (O(dim²) per row)
    unit = base.select(
        "id", "v", F.sqrt(V.dot(F.col("v"), F.col("v"))).alias("_nrm")
    ).select(
        "id",
        F.transform(
            F.col("v"), lambda x: x.cast("double") / F.col("_nrm")
        ).alias("vn"),
    )
    pairs = (
        cand.join(
            unit.select(F.col("id").alias("id_a"), F.col("vn").alias("va")),
            "id_a",
        )
        .join(
            unit.select(F.col("id").alias("id_b"), F.col("vn").alias("vb")),
            "id_b",
        )
        .select(
            "id_a", "id_b", V.dot(F.col("va"), F.col("vb")).alias("cos")
        )
        .filter(F.col("cos") >= threshold)
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
