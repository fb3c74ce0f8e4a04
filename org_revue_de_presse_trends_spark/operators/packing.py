"""Token-budget sequence packing for LLM training data.

Training pipelines concatenate variable-length chunks into fixed-budget
sequences (e.g. 512 or 4096 tokens) to minimize padding waste.  Packing
is inherently sequential, so the distributed shape is:

1. deterministically bin chunks into ``num_bins`` groups (hash of the
   chunk identity — NOT ``spark_partition_id``, which would make results
   depend on input layout);
2. pack each bin independently with best-fit-decreasing
   (``applyInPandas``, one Arrow batch per bin — the documented Python
   escape hatch: bin packing is not expressible as window/aggregate);
3. emit a globally unique ``seq_id = bin << 32 | local_seq``.

Waste is bounded per bin, not globally — with chunk sizes ≤ budget/2,
best-fit-decreasing fills ≥ ~5/6 of each closed sequence (classic BFD
bound), independent of bin count, so sharding does not degrade packing
quality materially.  Determinism: bins are hash-derived, each bin's
input is sorted, and best-fit ties break on the lowest sequence id.
"""

from __future__ import annotations

import bisect

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    chunks: DataFrame,
    budget: int = 512,
    doc_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    tokens_col: str = "n_tokens",
    num_bins: int = 32,
) -> DataFrame:
    """Assign every chunk to a training sequence of total length ≤
    ``budget`` tokens (a chunk longer than the budget gets a sequence of
    its own).  Returns (doc_col, chunk_col, tokens_col, seq_id).
    """

    def pack_bin(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(
            [tokens_col, doc_col, chunk_col], ascending=[False, True, True]
        ).reset_index(drop=True)
        bin_key = int(pdf["_bin"].iloc[0])
        # sorted list of (remaining_capacity, seq_id): best-fit =
        # leftmost capacity >= tok; ties resolve to the lowest seq_id
        # because tuples sort lexicographically
        open_seqs: list[tuple[int, int]] = []
        next_seq = 0
        assigned = []
        for tok in pdf[tokens_col].astype(int):
            i = bisect.bisect_left(open_seqs, (tok, -1))
            if i < len(open_seqs):
                cap, sid = open_seqs.pop(i)
                bisect.insort(open_seqs, (cap - tok, sid))
                assigned.append(sid)
            else:
                # no open sequence fits (covers tok > budget too)
                bisect.insort(open_seqs, (max(budget - tok, 0), next_seq))
                assigned.append(next_seq)
                next_seq += 1
        out = pdf[[doc_col, chunk_col, tokens_col]].copy()
        out["seq_id"] = [(bin_key << 32) | s for s in assigned]
        return out

    binned = chunks.select(
        doc_col,
        chunk_col,
        tokens_col,
        F.pmod(
            F.xxhash64(F.col(doc_col), F.col(chunk_col)), F.lit(num_bins)
        ).alias("_bin"),
    )
    # carry the input column types through: hardcoding e.g. "int" for a
    # long chunk_col would hit an Arrow downcast error/overflow at runtime
    in_types = {f.name: f.dataType.simpleString() for f in chunks.schema}
    schema = (
        f"{doc_col} {in_types[doc_col]}, {chunk_col} {in_types[chunk_col]}, "
        f"{tokens_col} {in_types[tokens_col]}, seq_id long"
    )
    return binned.groupBy("_bin").applyInPandas(pack_bin, schema=schema)


def token_chunks(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 32,
    stride: int = 24,
):
    """(id_col, chunk_idx, chunk_text, n_tokens) — overlapping
    token-window chunks (chunk i covers tokens [i*stride,
    i*stride + size)), the context-window segmentation every training
    pipeline applies before packing.  Start positions run while
    start < doc length, so the tail chunk may be short but no token is
    dropped; stride < size gives (size - stride)-token overlap.

    Shape: chunk structs are built INSIDE the array domain (one
    transform over the staged token array — total work and bytes are
    O(len · size/stride), linear) and only then exploded, so the full
    token array is never duplicated per chunk row (an explode-first
    form would copy it ceil(len/stride) times — fatal for giant
    documents).  Map-only: no windows, no shuffle."""
    from pyspark.sql import functions as F

    if int(stride) <= 0 or int(size) <= 0:
        raise ValueError("size and stride must be positive")
    d1 = df.select(
        F.col(id_col),
        F.expr(f"split(`{text_col}`, ' ')").alias("__t"),
    )
    k, st = int(size), int(stride)
    d2 = d1.select(
        id_col,
        F.explode(
            F.expr(
                f"""transform(
                    sequence(0, CAST((size(__t) - 1) DIV {st} AS INT)),
                    i -> struct(
                        CAST(i AS BIGINT) AS chunk_idx,
                        array_join(slice(__t, i * {st} + 1, {k}), ' ')
                            AS chunk_text,
                        CAST(least({k}, size(__t) - i * {st}) AS BIGINT)
                            AS n_tokens))"""
            )
        ).alias("c"),
    )
    return d2.select(
        id_col,
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.n_tokens").alias("n_tokens"),
    )
