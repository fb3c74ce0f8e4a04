"""Graph centrality — weighted PageRank over a distributed edge list.

The corpus-curation use: rank pages/domains/documents by link or
similarity structure (Page et al. 1999, "The PageRank citation
ranking"; web-corpus pipelines weight crawl frontiers and quality
priors this way), and rank event types by the user-path transition
matrix (Markov-chain stationary-visit view of product analytics).

Determinism discipline (the house scaled-long rule): ranks live as
exact BIGINTs at a fixed decimal scale.  Every per-edge contribution
is one double expression with a pinned shape —
``round(d · rank · weight / out_weight)`` — whose multiply/divide
tree any engine evaluates identically under IEEE-754, immediately
rounded back to a long; the per-node reduce is then an exact integer
SUM, so iteration results are bit-identical regardless of engine,
partitioning, or aggregation order.  A DuckDB oracle unrolls the same
iterations as CTEs and hash-matches value-exactly
(plans/events_analytics.event_type_pagerank).

Semantics: the unnormalized "Google" variant — r₀ = 1 per node,
rₜ₊₁(v) = (1-d) + d·Σ_{(u,v)∈E} rₜ(u)·w(u,v)/out_w(u).  Dangling
nodes (no out-edges) receive but do not redistribute mass (their mass
decays — the simplified variant; redistribution needs a global
broadcast per round and is not what similarity graphs need).

Scale: per round, one join of edges against the rank table (both
keyed by node — the join exchange is reused by the groupBy(dst) that
follows only via AQE; edges are localCheckpointed ONCE so the
typically-expensive candidate-pair lineage never re-executes) and one
integer-sum aggregate.  No collects inside the loop; lineage is cut
per round (CLAUDE.md iterative-loop invariant).

Exactness bound: contributions are exact while
``d · max_rank_scaled · max_weight < 2**53``.  Total scaled mass is
≤ n_nodes · scale, so the default scale of 10⁹ is safe up to roughly
a million nodes at unit weights; pass a smaller ``scale`` for larger
graphs (documented, asserted nowhere — the caller owns the budget).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pagerank_driver(
    spark, rows, iterations: int, damping: float, scale: int, node_type
) -> DataFrame:
    """Driver union-find-style fast path for small graphs (the
    cluster_pairs precedent): one collect instead of O(iterations)
    checkpoint jobs whose fixed scheduling latency dominates at small
    edge counts.  BIT-IDENTICAL to the distributed loop: the same
    pinned expression per edge, rounded like Spark's ROUND — decimal
    HALF_UP over the shortest repr (the probed house rule: Python
    round() is half-even and diverges on exact .5 ties like
    0.85·10⁹/256 = 3320312.5; floor(x+0.5) diverges one ulp below
    ties, e.g. 0.49999999999999994 + 0.5 == 1.0)."""
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql import types as T

    def _round_half_up(x: float) -> int:
        return int(
            Decimal(repr(x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
        )

    # rows are the RAW (src, dst, w) edges; out-weights are exact
    # Python-int sums, identical to Spark's integer SUM
    out_w: dict = {}
    for r in rows:
        out_w[r["src"]] = out_w.get(r["src"], 0) + r["w"]
    nodes = sorted(
        {r["src"] for r in rows} | {r["dst"] for r in rows}
    )
    base = round((1.0 - damping) * scale)
    rank = {n: int(scale) for n in nodes}
    for _ in range(iterations):
        mass = {n: 0 for n in nodes}
        for r in rows:
            c = damping * float(rank[r["src"]]) * float(r["w"]) / float(
                out_w[r["src"]]
            )
            mass[r["dst"]] += _round_half_up(c)
        rank = {n: base + mass[n] for n in nodes}
    schema = T.StructType(
        [
            T.StructField("node", node_type),
            T.StructField("rank_scaled", T.LongType()),
            T.StructField("pagerank", T.DoubleType()),
        ]
    )
    data = [
        (n, rank[n], float(rank[n]) / float(scale)) for n in nodes
    ]
    return spark.createDataFrame(data, schema)


def weighted_pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    scale: int = 10**9,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
    small_graph_max: int | None = 100_000,
) -> DataFrame:
    """PageRank over a weighted directed edge list → (node,
    rank_scaled BIGINT, pagerank DOUBLE).

    ``rank_scaled`` is the exact fixed-point state after exactly
    ``iterations`` rounds (no convergence test — a pinned iteration
    count is what an oracle can unroll); ``pagerank`` is the one
    deterministic IEEE division ``rank_scaled / scale``.  Undirected
    graphs: pass each edge in both directions.

    Edge lists at or under ``small_graph_max`` (after the one
    localCheckpoint) take a driver fast path — one collect instead of
    O(iterations) jobs, bit-identical output (measured on the event
    graph: per-round scheduling latency dominated).  Pass 0/None to
    force the distributed loop.

    Weights: ``weight_col`` is cast to BIGINT (TRUNCATING — fractional
    weights below 1 become 0; pre-scale fractional weights yourself).
    Non-positive weights after the cast are DROPPED: they contribute
    zero mass but a source whose weights sum to zero would otherwise
    divide by zero (ANSI) — so such a source becomes dangling, and a
    node appearing only in dropped edges leaves the graph."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("long").alias("w"),
    ).where(F.col("w") > 0)
    if small_graph_max:
        # gate on the RAW edge list: the driver path computes out_w
        # itself (exact Python-int sums == Spark's SUM), so the small
        # graph never pays the out_w groupBy + join + the wider joined
        # materialization.  r11 interleaved best-of-5 at sf0.1
        # (doc_overlap_pairs anchor, anchor-normalized):
        # event_type_pagerank 1.24 → 1.08 s median on a ~7%-slower
        # host (clear win), doc_centrality_pagerank ~6% (its cost is
        # the pair join, not the rank tail); bit-identical goldens.
        e = e.localCheckpoint()
        if e.count() <= small_graph_max:
            return _pagerank_driver(
                edges.sparkSession,
                e.collect(),
                iterations,
                damping,
                scale,
                e.schema["src"].dataType,
            )
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # one materialization: the edge lineage (often a candidate-pair
    # join) must not re-execute every round (with the gate on, both
    # join sides read the raw checkpoint, so the pair lineage still
    # runs once)
    e = e.join(out_w, "src").localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    base = round((1.0 - damping) * scale)  # exact long, same literal
    ranks = nodes.withColumn(
        "rank_scaled", F.lit(int(scale)).cast("long")
    )
    # pinned expression tree: ((d * r) * w) / out_w — left-assoc
    # multiply chain then one divide, identical in Spark and DuckDB SQL
    contrib = F.round(
        F.lit(damping)
        * F.col("rank_scaled").cast("double")
        * F.col("w").cast("double")
        / F.col("out_w").cast("double")
    ).cast("long")
    for _ in range(iterations):
        msgs = (
            e.join(ranks, e.src == ranks.node)
            .select(F.col("dst").alias("node"), contrib.alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nodes.join(msgs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base) + F.coalesce(F.col("in_mass"), F.lit(0))
                )
                .cast("long")
                .alias("rank_scaled"),
            )
            .localCheckpoint()
        )
    return ranks.select(
        "node",
        "rank_scaled",
        (F.col("rank_scaled").cast("double") / F.lit(float(scale))).alias(
            "pagerank"
        ),
    )


def triangle_stats(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_degree: int | None = None,
) -> DataFrame:
    """Per-node triangle counts and local clustering coefficient over
    an undirected simple graph given as canonical pairs →
    (node, degree BIGINT, n_triangles BIGINT, clustering DOUBLE).

    clustering(v) = 2·T(v) / (deg(v)·(deg(v)−1)), 0 when deg < 2 —
    the near-dup-graph diagnostic: cliquish neighborhoods (template
    families, mirrored sites) score ~1, chain-shaped false-positive
    paths score ~0, so it separates "cluster is a real duplicate
    family" from "transitive LSH chain" before a keep-one collapse.

    Plan shape (Schank–Wagner forward enumeration): every edge is
    ORIENTED from its lower-(degree, id) endpoint, wedges are one
    self-equi-join of the oriented list on the SOURCE, and a wedge is
    a triangle iff the tip pair is itself an oriented edge.  Each
    triangle appears as exactly one wedge (its two lowest-ranked
    corners share the source), and total wedge count is Σ outdeg² =
    O(m^1.5) instead of the unoriented Σ deg² — a star hub has huge
    in-degree but ~zero out-degree, so hubs stop fanning.  A genuine
    m-clique still has C(m,3) triangles (no enumeration beats its
    output size), which is what ``max_degree`` caps: edges incident
    to a node of degree > max_degree are dropped BEFORE enumeration
    (the house hub-cap rule — max_shingle_df, max_frame_df), so
    per-task wedge fan-out is ≤ max_degree²; reported ``degree`` is
    the TRUE pre-cap degree, so capped hubs read n_triangles=0 /
    clustering=0 rather than vanishing.

    The skinny canonical edge list is localCheckpointed once — the
    upstream pair lineage (typically an expensive candidate-pair
    join) never re-executes across the degree/orient/wedge branches
    (the r7c centrality lesson).  All counts are exact integers; the
    coefficient is one pinned IEEE division, rounded to 9 dp —
    oracled value-exactly in DuckDB."""
    e = (
        pairs.select(
            F.least(F.col(id_a), F.col(id_b)).alias("a"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    ed = e.join(
        deg.select(F.col("node").alias("a"), F.col("degree").alias("da")),
        "a",
    ).join(
        deg.select(F.col("node").alias("b"), F.col("degree").alias("db")),
        "b",
    )
    if max_degree is not None:
        ed = ed.where(
            (F.col("da") <= max_degree) & (F.col("db") <= max_degree)
        )
    # orient from the lower-(degree, id) endpoint; a < b canonically,
    # so the degree tie breaks to a — a strict total order either way
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    o = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("s"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("t"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dt"),
    ).localCheckpoint()  # referenced three times below; |E| rows
    o1 = o.select("s", F.col("t").alias("v"), F.col("dt").alias("dv"))
    o2 = o.select("s", F.col("t").alias("w"), F.col("dt").alias("dw"))
    wedges = o1.join(o2, "s").where(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    closing = o.select(F.col("s").alias("v"), F.col("t").alias("w"))
    tri = wedges.join(closing, ["v", "w"]).select(
        F.col("s").alias("x"), F.col("v").alias("y"), F.col("w").alias("z")
    )
    per_node = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    return deg.join(per_node, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("n_triangles"), F.lit(0))
        .cast("long")
        .alias("n_triangles"),
        F.when(
            F.col("degree") >= 2,
            F.round(
                F.lit(2.0)
                * F.coalesce(F.col("n_triangles"), F.lit(0)).cast("double")
                / (
                    F.col("degree").cast("double")
                    * (F.col("degree") - F.lit(1)).cast("double")
                ),
                9,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering"),
    )
