"""Hash-family column expressions: MinHash signatures and SimHash.

Built on ``xxhash64`` (JVM-side, codegen'd) with per-permutation seeds.
These back the near-duplicate operators in ``operators.dedup``.

Literature: MinHash — Broder, "On the resemblance and containment of
documents" (SEQUENCES 1997); LSH banding — Leskovec/Rajaraman/Ullman,
Mining of Massive Datasets ch.3; SimHash — Charikar, "Similarity
estimation techniques from rounding algorithms" (STOC 2002).

Scale design: a MinHash signature is computed per-row with zero shuffle;
LSH banding turns near-dup detection into an equi-join on (band,
band_hash) — the shuffle key is small and uniformly distributed, so the
plan survives 100 TB (the classic MMDS ch.3 construction).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _seeded_hash(i: int):
    # 1-arg lambda factory: PySpark introspects lambda arity, so the
    # seed must be captured in a closure, not a default argument.
    return lambda s: F.xxhash64(s, F.lit(i))


def minhash_signature(shingle_arr: Column, num_perm: int = 64) -> Column:
    """array<long> of length ``num_perm``: element i is
    min(xxhash64(shingle, seed=i)) over the shingle set."""
    sigs = [
        F.array_min(F.transform(shingle_arr, _seeded_hash(i)))
        for i in range(num_perm)
    ]
    return F.array(*sigs)


def lsh_band_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """array<struct<band:int, key:long>> — one LSH bucket key per band.

    Two documents land in the same (band, key) bucket iff their
    signatures agree on every row of that band.
    """
    keys = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.element_at(signature, b * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ],
                )
            ).alias("key"),
        )
        for b in range(bands)
    ]
    return F.array(*keys)


def simhash64(token_arr: Column) -> Column:
    """64-bit SimHash over a token array.

    For each bit position j, sum +1/-1 across tokens according to bit j
    of xxhash64(token); bit j of the result is 1 iff the sum > 0.
    Pure JVM expression: one xxhash64 per token, then a 64-slot count
    accumulator (bit positions unrolled at plan-build time because
    shift amounts must be literals).
    """
    import functools

    def bits_pm1(h: Column) -> Column:
        return F.array(
            *[
                F.when(
                    F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1))
                for j in range(64)
            ]
        )

    contrib = F.transform(token_arr, lambda t: bits_pm1(F.xxhash64(t)))
    counts = F.aggregate(
        contrib,
        F.array_repeat(F.lit(0), 64),
        lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
    )
    bit_terms = [
        F.when(
            F.element_at(counts, j + 1) > 0,
            F.shiftleft(F.lit(1).cast("long"), j),
        ).otherwise(F.lit(0).cast("long"))
        for j in range(64)
    ]
    return functools.reduce(lambda a, b: a.bitwiseOR(b), bit_terms)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit hashes (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))
