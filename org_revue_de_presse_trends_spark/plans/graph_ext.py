"""Graph-centrality queries (operators/graph.py) — registers past the
driver's 50-slot window on purpose; the in-repo contract gate
oracle-checks them."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from .registry import query

_PR_D = 0.85
_PR_SCALE = 10**9
_PR_BASE = round((1.0 - _PR_D) * _PR_SCALE)
_PR_ITERS = 4


def _pr_iters_sql(iters: int) -> tuple[str, str]:
    """Unrolled PageRank iterations as DuckDB CTE text: per iteration
    the SAME pinned expression tree ``round(d · rank · w / out_w)``
    cast to BIGINT, then an exact integer SUM — value-identical to
    the Spark loop by construction.  Expects CTEs ``e(src, dst, w)``,
    ``nodes(node)``, ``ow(src, out_w)``, ``r0(node, rank_scaled)`` in
    scope; returns (cte_chunk, final_table_name)."""
    its = []
    prev = "r0"
    for k in range(1, iters + 1):
        its.append(
            f"""
    it{k} AS (
        SELECT n.node,
               CAST({_PR_BASE} + COALESCE(SUM(
                   CAST(ROUND({_PR_D!r} * CAST(r.rank_scaled AS DOUBLE)
                              * CAST(e.w AS DOUBLE)
                              / CAST(ow.out_w AS DOUBLE)) AS BIGINT)
               ), 0) AS BIGINT) AS rank_scaled
        FROM nodes n
        LEFT JOIN e ON e.dst = n.node
        LEFT JOIN {prev} r ON r.node = e.src
        LEFT JOIN ow ON ow.src = e.src
        GROUP BY n.node
    )"""
        )
        prev = f"it{k}"
    return ",".join(its), prev


_PR_COMMON = """
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    ow AS (SELECT src, CAST(SUM(w) AS BIGINT) AS out_w FROM e GROUP BY src),
    r0 AS (
        SELECT node, CAST({scale} AS BIGINT) AS rank_scaled
        FROM nodes
    ),"""


def _event_pagerank_oracle() -> str:
    chained, last = _pr_iters_sql(_PR_ITERS)
    return f"""
    WITH ordered AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ),
    e AS (
        SELECT prev_type AS src, event_type AS dst,
               CAST(count(*) AS BIGINT) AS w
        FROM ordered WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    ),{_PR_COMMON.format(scale=_PR_SCALE)}{chained}
    SELECT node AS event_type, rank_scaled,
           CAST(rank_scaled AS DOUBLE) / {float(_PR_SCALE)!r} AS pagerank
    FROM {last}
    """


@query("event_type_pagerank", _event_pagerank_oracle())
def event_type_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the first-order event-transition graph
    (operators/graph.py): edges are (prev_type → next_type, count)
    from each user's (ts, event_id)-ordered path — the Markov-chain
    stationary-visit view of which event types user journeys
    concentrate on.  Exactly 4 iterations at damping 0.85 with
    ranks as scaled longs; the DuckDB oracle unrolls the same rounds
    as CTEs and every rank_scaled hash-matches bit-exactly (the
    per-edge double expression has a pinned IEEE shape; the per-node
    reduce is an integer sum — aggregation order cannot move it).

    Scale: the same operator ranks a million-node similarity or link
    graph — per round one edges⋈ranks join and one integer-sum
    aggregate, edges localCheckpointed once, no collects; see
    operators/graph.py for the 2**53 exactness budget."""
    from ..operators.graph import weighted_pagerank

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.select(
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("src"),
            F.col("event_type").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    ranks = weighted_pagerank(
        edges,
        iterations=_PR_ITERS,
        damping=_PR_D,
        scale=_PR_SCALE,
    )
    return ranks.select(
        F.col("node").alias("event_type"), "rank_scaled", "pagerank"
    )


#: containment-pair graph parameters — mirror doc_overlap_pairs
#: (analytics_tpch.py) so the edge set is the already-oracled one
_CENTRALITY_ITERS = 3


def _doc_centrality_oracle() -> str:
    chained, last = _pr_iters_sql(_CENTRALITY_ITERS)
    return f"""
    WITH base AS (
        SELECT doc_id AS id, source,
               list_distinct(list_transform(
                   range(1, greatest(len(string_split(text,' ')) - 2, 1) + 1),
                   i -> string_split(text,' ')[i] || ' ' ||
                        string_split(text,' ')[i+1] || ' ' ||
                        string_split(text,' ')[i+2]
               )) AS sh
        FROM documents
    ),
    ex0 AS (SELECT id, source, unnest(sh) AS shingle FROM base),
    exf AS (
        SELECT id, source, shingle
        FROM (SELECT id, source, shingle,
                     COUNT(*) OVER (PARTITION BY source, shingle) AS df
              FROM ex0)
        WHERE df <= 1000
    ),
    ex AS (
        SELECT id, source, shingle,
               COUNT(*) OVER (PARTITION BY id) AS n_sh
        FROM exf
    ),
    inter AS (
        SELECT a.id AS id_a, b.id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b,
               COUNT(*) AS n_inter
        FROM ex a JOIN ex b
          ON a.shingle = b.shingle AND a.source = b.source AND a.id < b.id
        GROUP BY a.id, b.id, a.n_sh, b.n_sh
    ),
    pairs AS (
        SELECT id_a, id_b FROM inter
        WHERE CAST(n_inter AS DOUBLE) / CAST(least(n_a, n_b) AS DOUBLE)
              >= 0.1
    ),
    e AS (
        SELECT id_a AS src, id_b AS dst, CAST(1 AS BIGINT) AS w FROM pairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst, CAST(1 AS BIGINT) AS w FROM pairs
    ),{_PR_COMMON.format(scale=_PR_SCALE)}{chained}
    SELECT node AS doc_id, rank_scaled,
           CAST(rank_scaled AS DOUBLE) / {float(_PR_SCALE)!r} AS pagerank
    FROM {last}
    """


@query("doc_centrality_pagerank", _doc_centrality_oracle())
def doc_centrality_pagerank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Document centrality in the containment near-dup graph: PageRank
    (operators/graph.py, 3 iterations) over the symmetrized
    doc_overlap_pairs edge set — central documents anchor clusters of
    partial copies, the signal a curation pipeline uses to pick the
    canonical representative (keep the hub, drop the satellites)
    instead of keep-first.

    Cross-engine: the edge set is the already-oracled containment
    join; ranks are scaled longs (pinned IEEE per-edge expression +
    exact integer sums), so the whole composition hash-matches.
    Isolated documents (no near-dup edge) are absent by construction —
    centrality is only defined on the pair graph."""
    from ..operators import dedup as D
    from ..operators.graph import weighted_pagerank

    # the symmetrizing union reads `pairs` from TWO branches; the
    # containment join's exchange is only partially reused across
    # them, so materialize the small pair list once (A/B best-of-3 at
    # sf0.1: 2.88 → 2.48 s)
    pairs = (
        D.shingle_pairs_overlap(
            load_table(spark, sf_dir, "documents"),
            block_cols=["source"],
            k=3,
            threshold=0.1,
        )
        .select("id_a", "id_b")
        .localCheckpoint()
    )
    edges = (
        pairs.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        )
        .unionByName(
            pairs.select(
                F.col("id_b").alias("src"), F.col("id_a").alias("dst")
            )
        )
        .withColumn("weight", F.lit(1).cast("long"))
    )
    ranks = weighted_pagerank(
        edges,
        iterations=_CENTRALITY_ITERS,
        damping=_PR_D,
        scale=_PR_SCALE,
    )
    return ranks.select(
        F.col("node").alias("doc_id"), "rank_scaled", "pagerank"
    )


#: directory synthesis for the fuzzy-link demo: a 32-hex key per
#: customer, every 3rd entry with one char DELETED, every 3rd+1 with
#: one char SUBSTITUTED by a non-hex char, the rest verbatim — pure
#: SQL-expressible function of c_custkey (the image_near_dup_from_docs
#: synthesis precedent; md5 keys keep non-planted pairs ~30 edits
#: apart so the result set is exactly the planted links)
_DIR_CASE = """CASE
    WHEN c_custkey % 3 = 0 THEN
        substr(key_name, 1, CAST(c_custkey % 29 AS INTEGER) + 1)
        || substr(key_name, CAST(c_custkey % 29 AS INTEGER) + 3)
    WHEN c_custkey % 3 = 1 THEN
        substr(key_name, 1, CAST(c_custkey % 31 AS INTEGER))
        || 'z' || substr(key_name, CAST(c_custkey % 31 AS INTEGER) + 2)
    ELSE key_name END"""


@query(
    "customer_directory_fuzzy_link",
    f"""
    WITH cust AS (
        SELECT c_custkey,
               md5(CAST(c_custkey AS VARCHAR)) AS key_name
        FROM customer
    ),
    dir AS (
        SELECT c_custkey + 1000000000 AS dir_id,
               {_DIR_CASE} AS dir_name
        FROM cust
    )
    SELECT d.dir_id AS left_id,
           c.c_custkey AS right_id,
           CAST(levenshtein(d.dir_name, c.key_name) AS BIGINT) AS dist
    FROM dir d, cust c
    WHERE levenshtein(d.dir_name, c.key_name) <= 2
    """,
)
def customer_directory_fuzzy_link(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-table fuzzy join (operators/linkage.fuzzy_join): link a
    synthesized directory (every customer key verbatim, one char
    deleted, or one char substituted — deterministic in c_custkey)
    back to the customer table within Levenshtein distance 2.  The
    operator's q-chunk candidates + banded verify recover exactly the
    planted links; the DuckDB oracle is the brute-force cross join
    with full levenshtein, so the signature scheme is proven to be a
    pure FILTER (no pair missed).

    Scale: the oracle's |L|×|R| cross join is the validator; the
    operator's candidate set is an equi-join on (chunk_len, gram) —
    |R|·(τ+1) index rows, O(len²/k) probe bytes per left row, linear
    in both table sizes for non-templated keys (see operators/
    linkage.py for the shared-prefix caveat and block_cols guidance).
    """
    from ..operators.linkage import fuzzy_join

    # localCheckpoint: fuzzy_join references each side from several
    # plan branches (index, probe, two re-attach joins, two corner
    # paths) — materializing the skinny synthesized keys once keeps
    # the scan+md5 from re-running per branch (17.8 → ~1 s measured
    # warm at sf0.01 on the operator alone)
    cust = (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            F.md5(F.col("c_custkey").cast("string")).alias("key_name"),
        )
        .localCheckpoint()
    )
    directory = cust.select(
        (F.col("c_custkey") + 1000000000).alias("dir_id"),
        F.expr(_DIR_CASE).alias("dir_name"),
    ).localCheckpoint()
    out = fuzzy_join(
        directory,
        cust,
        left_text="dir_name",
        right_text="key_name",
        left_id="dir_id",
        right_id="c_custkey",
        max_dist=2,
    )
    return out.select(
        F.col("lid").alias("left_id"),
        F.col("rid").alias("right_id"),
        "dist",
    )


#: the containment-pair CTE chain (shared with the centrality oracle)
_PAIRS_CTES = """
    base AS (
        SELECT doc_id AS id, source,
               list_distinct(list_transform(
                   range(1, greatest(len(string_split(text,' ')) - 2, 1) + 1),
                   i -> string_split(text,' ')[i] || ' ' ||
                        string_split(text,' ')[i+1] || ' ' ||
                        string_split(text,' ')[i+2]
               )) AS sh
        FROM documents
    ),
    ex0 AS (SELECT id, source, unnest(sh) AS shingle FROM base),
    exf AS (
        SELECT id, source, shingle
        FROM (SELECT id, source, shingle,
                     COUNT(*) OVER (PARTITION BY source, shingle) AS df
              FROM ex0)
        WHERE df <= 1000
    ),
    ex AS (
        SELECT id, source, shingle,
               COUNT(*) OVER (PARTITION BY id) AS n_sh
        FROM exf
    ),
    inter AS (
        SELECT a.id AS id_a, b.id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b,
               COUNT(*) AS n_inter
        FROM ex a JOIN ex b
          ON a.shingle = b.shingle AND a.source = b.source AND a.id < b.id
        GROUP BY a.id, b.id, a.n_sh, b.n_sh
    ),
    pairs AS (
        SELECT id_a, id_b FROM inter
        WHERE CAST(n_inter AS DOUBLE) / CAST(least(n_a, n_b) AS DOUBLE)
              >= 0.1
    )"""


@query(
    "doc_neardup_clustering",
    f"""
    WITH {_PAIRS_CTES},
    e AS (
        SELECT LEAST(id_a, id_b) AS a, GREATEST(id_a, id_b) AS b
        FROM pairs WHERE id_a <> id_b GROUP BY 1, 2
    ),
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
        FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        GROUP BY 1
    ),
    ecap AS (
        SELECT e.a, e.b FROM e
        JOIN deg dda ON dda.node = e.a
        JOIN deg ddb ON ddb.node = e.b
        WHERE dda.degree <= 1000 AND ddb.degree <= 1000
    ),
    tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM ecap e1
        JOIN ecap e2 ON e2.a = e1.b
        JOIN ecap e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    pn AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM (SELECT x AS node FROM tri
              UNION ALL SELECT y FROM tri
              UNION ALL SELECT z FROM tri)
        GROUP BY 1
    )
    SELECT d.node AS doc_id, d.degree,
           CAST(COALESCE(pn.n_triangles, 0) AS BIGINT) AS n_triangles,
           CASE WHEN d.degree >= 2 THEN
               ROUND(2.0 * CAST(COALESCE(pn.n_triangles, 0) AS DOUBLE)
                     / (CAST(d.degree AS DOUBLE)
                        * CAST(d.degree - 1 AS DOUBLE)), 9)
           ELSE 0.0 END AS clustering
    FROM deg d LEFT JOIN pn ON pn.node = d.node
    """,
)
def doc_neardup_clustering(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Triangle counts and local clustering coefficient per document
    in the containment near-dup graph (operators/graph.triangle_stats)
    — the diagnostic that separates a real duplicate FAMILY (cliquish
    neighborhood, clustering ≈ 1) from a transitive LSH chain
    (path-shaped, clustering ≈ 0) before a keep-one collapse commits
    to merging a cluster.

    Cross-engine: degree-oriented (Schank–Wagner) triangle
    enumeration — orientation does not change the triangle set, so
    the oracle enumerates unoriented; exact integer counts, one
    pinned IEEE division rounded to 9 dp — value-exact in DuckDB over
    the already-oracled pair CTE.  The max_degree=1000 hub cap (house
    rule — a real duplicate family is a clique with C(m,3) triangles)
    is mirrored in the oracle's ecap CTE so parity holds even if a
    regenerated fixture grows a >1000-degree hub."""
    from ..operators import dedup as D
    from ..operators.graph import triangle_stats

    pairs = D.shingle_pairs_overlap(
        load_table(spark, sf_dir, "documents"),
        block_cols=["source"],
        k=3,
        threshold=0.1,
    ).select("id_a", "id_b")
    return triangle_stats(pairs, max_degree=1000).select(
        F.col("node").alias("doc_id"),
        "degree",
        "n_triangles",
        "clustering",
    )
