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


def lsh_band_keys_expr(
    sig_name: str, bands: int, rows_per_band: int
) -> Column:
    """array<struct<band:int, key:long>> — one LSH bucket key per band
    over a signature column ATTRIBUTE named ``sig_name``: two
    documents land in the same (band, key) bucket iff their signatures
    agree on every row of that band (key = xxhash64 of the band's
    comma-joined rows).

    Built as ONE parsed SQL expression — the equivalent
    Column-by-Column form costs ~8 py4j round-trips per band (~0.24 s
    of driver plan-build at 16 bands; the plan-build tax, CLAUDE.md)
    and was removed as dead code in r6 after both callers switched.
    Keys are golden-pinned."""
    parts = ",".join(
        f"struct({b} as band, xxhash64(concat_ws(',', "
        + ",".join(
            f"element_at(`{sig_name}`, {b * rows_per_band + r + 1})"
            for r in range(rows_per_band)
        )
        + ")) as key)"
        for b in range(bands)
    )
    return F.expr(f"array({parts})")


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


def _splitmix64(x: int) -> int:
    """Deterministic 64-bit integer mix (splitmix64 finalizer — public
    PRNG construction) used to derive reproducible hyperplane signs
    without any runtime hashing."""
    mask = (1 << 64) - 1
    x = (x + 0x9E3779B97F4A7C15) & mask
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & mask
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & mask
    return x ^ (x >> 31)


def srp_signs(n_bits: int, dim: int, seed: int = 0x5EED) -> list[list[float]]:
    """±1 Rademacher hyperplane matrix for signed random projection,
    derived deterministically from ``seed`` (Charikar STOC'02 rounding
    scheme; Rademacher entries are a standard substitute for Gaussian —
    Achlioptas, JCSS 2003)."""
    return [
        [
            1.0 if _splitmix64(seed + i * dim + j) & 1 else -1.0
            for j in range(dim)
        ]
        for i in range(n_bits)
    ]


def srp_sign_masks(n_bits: int, dim: int, seed: int = 0x5EED) -> list[int]:
    """Per-dimension packed sign masks for the explode+groupBy SRP
    formulation: element j is a signed 64-bit long whose bit i is 1 iff
    hyperplane i has a +1 entry at dimension j (same ``srp_signs``
    matrix, transposed and bit-packed so one long literal carries all
    ``n_bits`` signs for a dimension)."""
    if n_bits > 64:
        raise ValueError("sign masks pack into one long: n_bits <= 64")
    signs = srp_signs(n_bits, dim, seed)
    masks = []
    for j in range(dim):
        m = 0
        for i in range(n_bits):
            if signs[i][j] > 0:
                m |= 1 << i
        if m >= 1 << 63:  # two's-complement into a signed long literal
            m -= 1 << 64
        masks.append(m)
    return masks


def srp_band_keys(
    vec: Column,
    dim: int,
    n_bits: int = 16,
    bands: int = 8,
    seed: int = 0x5EED,
) -> Column:
    """array<struct<band:int, key:long>> — SRP-LSH bucket keys for a
    cosine metric over an ``array<float/double>`` column.

    Bit i = sign(v · r_i) for fixed ±1 hyperplanes r_i baked into the
    plan as literal arrays (zero runtime hashing, zero shuffle);
    P[bit agrees] = 1 - θ/π.  Bits are grouped into ``bands`` keys so
    near vectors collide in ≥1 band with high probability — the same
    banding amplification as MinHash-LSH, making embedding near-dup an
    equi-join on (band, key)."""
    if n_bits % bands:
        raise ValueError("n_bits must divide evenly into bands")
    if n_bits // bands > 63:
        # the band key is packed into one signed 64-bit long
        raise ValueError("rows_per_band (n_bits/bands) must be <= 63")
    signs = srp_signs(n_bits, dim, seed)
    bits = []
    for i in range(n_bits):
        plane = F.array(*[F.lit(x) for x in signs[i]])
        dot = F.aggregate(
            F.zip_with(vec, plane, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)))
    rows_per_band = n_bits // bands
    keys = []
    for b in range(bands):
        # long accumulator: an int literal would wrap at 32 bits once
        # rows_per_band > 31, silently merging buckets
        key = F.lit(0).cast("long")
        for r in range(rows_per_band):
            key = F.shiftleft(key, 1).bitwiseOR(bits[b * rows_per_band + r])
        keys.append(
            F.struct(F.lit(b).alias("band"), key.cast("long").alias("key"))
        )
    return F.array(*keys)
