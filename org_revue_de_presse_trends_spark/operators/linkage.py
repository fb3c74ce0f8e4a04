"""Record linkage — exact cross-TABLE fuzzy join on edit distance.

Entity resolution's core primitive: join two DIFFERENT tables
(directory ↔ CRM, crawl ↔ catalog) on a string key within Levenshtein
distance τ.  The near-dup family's self-join machinery
(operators/dedup.edit_distance_pairs_qchunk) doesn't apply directly —
a fuzzy join is asymmetric by nature, which is exactly what the
q-chunk signature scheme (Qin et al. SIGMOD 2011) wants: the RIGHT
table is indexed by its non-overlapping chunks, the LEFT table probes
with all substrings of the feasible chunk lengths, and candidates are
an equi-join on (blocks, chunk_len, gram) — never a cross join.

Soundness is the self-join pigeonhole verbatim (dedup.py:1223 has the
full argument): a right string of length L ≥ k = τ+1 cut into
L div q ≥ k chunks keeps ≥ 1 chunk verbatim (within ±τ positions) in
any partner within distance τ, and the left probe enumerates every
substring a feasible partner chunk could be.  Two exact corners:

- right strings with len < k defeat the pigeonhole → banded
  length-bucket cross-table join against left strings with
  len ≤ len(right)+τ (both sets tiny by construction);
- strings ≥ ``max_len`` would pay an O(len²/k) probe fan → routed
  through the same banded bucket join, with pair ownership split
  exactly as in the self-join variant (a bucket-path pair must have
  its longer side ≥ max_len; both-short pairs stay q-chunk-only) —
  no pair missed, none double-counted.

Verification is the banded JVM ``levenshtein(a, b, τ)`` — the
candidate scheme only ever filters, so results are EXACT (oracled by
a DuckDB cross join + full levenshtein in
plans/graph_ext.customer_directory_fuzzy_link).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .skew import spread_for_cpu


def _banded_cross(
    left: DataFrame,
    right: DataFrame,
    blocks: list[str],
    tau: int,
) -> DataFrame:
    """Exact small-set fallback: candidates via a length-bucket
    equi-join (each left row probes its own bucket ±1 — any pair with
    ``|len_l − len_r| ≤ τ`` shares one of those three buckets), then
    the banded levenshtein.  Inputs carry (blocks…, lid/rid, ltxt/rtxt,
    llen/rlen)."""
    width = tau + 1
    lf = left.withColumn(
        "_bk",
        F.explode(
            F.expr(
                f"sequence(CAST(llen DIV {width} AS INT) - 1,"
                f" CAST(llen DIV {width} AS INT) + 1)"
            )
        ),
    )
    rf = right.withColumn(
        "_bk", F.expr(f"CAST(rlen DIV {width} AS INT)")
    )
    return (
        lf.join(rf, on=[*blocks, "_bk"])
        .where(F.abs(F.col("llen") - F.col("rlen")) <= tau)
        .select(
            "lid",
            "rid",
            "llen",
            "rlen",
            F.levenshtein(F.col("ltxt"), F.col("rtxt"), tau)
            .cast("long")
            .alias("dist"),
        )
        .where(F.col("dist") >= 0)
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_text: str,
    right_text: str,
    left_id: str,
    right_id: str,
    max_dist: int = 2,
    block_cols: list[str] | None = None,
    max_len: int = 8192,
) -> DataFrame:
    """All cross-table pairs within Levenshtein ``max_dist`` →
    (left_id, right_id, dist) — EXACT (signatures only generate
    candidates; the banded verify decides).

    Scale shape: index = |right| × ~(τ+1) skinny chunk rows; probe =
    O(len²/k) bytes per left row (bounded by ``max_len``); candidates
    are an equi-join on (blocks, chunk_len, gram).  Shared-prefix key
    families (formulaic ids, templated names) inflate candidates —
    same caveat as the self-join: every verbatim shared chunk is a
    genuine candidate no exact scheme can skip; pick ``block_cols``
    that break such families apart when the keys are templated."""
    blocks = list(block_cols or [])
    tau = int(max_dist)
    k = tau + 1
    if int(max_len) <= 2 * tau:
        raise ValueError(f"max_len must exceed 2*max_dist, got {max_len}")
    lt = left.select(
        *blocks,
        F.col(left_id).cast("long").alias("lid"),
        F.col(left_text).alias("ltxt"),
        F.length(left_text).alias("llen"),
    )
    rt = right.select(
        *blocks,
        F.col(right_id).cast("long").alias("rid"),
        F.col(right_text).alias("rtxt"),
        F.length(right_text).alias("rlen"),
    )
    # index: right chunks (pigeonhole side)
    idx = (
        rt.filter((F.col("rlen") >= k) & (F.col("rlen") < max_len))
        .withColumn("q", F.expr(f"rlen DIV {k}"))
        .withColumn(
            "ci",
            F.explode(F.expr("sequence(0, CAST(rlen DIV q AS INT) - 1)")),
        )
        .select(
            *blocks,
            "rid",
            "rlen",
            "q",
            (F.col("ci") * F.col("q")).alias("ipos"),
            F.expr(
                "substring(rtxt, CAST(ci * q AS INT) + 1, CAST(q AS INT))"
            ).alias("gram"),
        )
    )
    # probe: left substrings of every feasible partner chunk length
    probe = (
        spread_for_cpu(lt.filter(F.col("llen") < max_len))
        .withColumn(
            "q",
            F.explode(
                F.expr(
                    f"sequence(CAST(greatest({k}, llen - {tau}) DIV {k} AS INT),"
                    f" CAST((llen + {tau}) DIV {k} AS INT))"
                )
            ),
        )
        .where(F.col("q") <= F.col("llen"))
        .withColumn(
            "pp", F.explode(F.expr("sequence(0, CAST(llen - q AS INT))"))
        )
        .select(
            *blocks,
            "lid",
            "llen",
            "q",
            F.col("pp").alias("ppos"),
            F.expr(
                "substring(ltxt, CAST(pp AS INT) + 1, CAST(q AS INT))"
            ).alias("gram"),
        )
    )
    cand = (
        probe.join(idx, on=[*blocks, "q", "gram"])
        .where(
            (F.abs(F.col("llen") - F.col("rlen")) <= tau)
            & (F.abs(F.col("ipos") - F.col("ppos")) <= tau)
        )
        .select(*blocks, "lid", "rid")
        .distinct()
    )
    verified = (
        cand.join(lt.select(*blocks, "lid", "ltxt"), on=[*blocks, "lid"])
        .join(rt.select(*blocks, "rid", "rtxt"), on=[*blocks, "rid"])
        .select(
            "lid",
            "rid",
            F.levenshtein(F.col("ltxt"), F.col("rtxt"), tau)
            .cast("long")
            .alias("dist"),
        )
        .where(F.col("dist") >= 0)
    )
    # corner 1: short right side (rlen < k) — partners have
    # llen ≤ rlen + τ ≤ 2τ, both sets tiny
    short = _banded_cross(
        lt.filter(F.col("llen") <= 2 * tau),
        rt.filter(F.col("rlen") < k),
        blocks,
        tau,
    ).select("lid", "rid", "dist")
    # corner 2: over-long strings — same ownership rule as the
    # self-join: the bucket path keeps only pairs whose LONGER side is
    # ≥ max_len; both-below-cap pairs belong to the q-chunk band
    long_pairs = (
        _banded_cross(
            lt.filter(F.col("llen") >= max_len - tau),
            rt.filter(F.col("rlen") >= max_len - tau),
            blocks,
            tau,
        )
        .where(F.greatest("llen", "rlen") >= max_len)
        .select("lid", "rid", "dist")
    )
    return verified.unionByName(short).unionByName(long_pairs)
