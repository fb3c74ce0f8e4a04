"""Bloom-filter membership — the broadcast-sized "maybe contains"
structure for decontamination and blocklist probes whose key set is
too large to broadcast-join directly (Bloom, "Space/time trade-offs
in hash coding with allowable errors", CACM 1970 — public algorithm).

The filter is an array of 64-bit words with 62 USABLE bits per word:
bit index stays in [0, 62), so every mask is ``1 << b`` with b ≤ 61 —
always a positive long, exempt from sign-bit/overflow divergence in
any engine (ANSI Spark and DuckDB both).  Each key sets ``k`` bits
(one 48-bit md5-prefix hash per seed, the kmv/dsir discipline), so
both construction and membership are deterministic and reproduce
value-exactly in DuckDB — INCLUDING the false positives.

Why it matters at 100 TB: an exact decontamination join must shuffle
(or at least broadcast) the full benchmark n-gram set — at
hundreds of millions of eval grams that is gigabytes per executor.
The Bloom filter compresses it to ``n_words`` longs (a few KB for a
1% false-positive rate per million keys scales linearly), the corpus
side stays map-only against the broadcast bits, and false positives
only cost a second-pass exact check on the tiny flagged subset —
the standard two-phase shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: usable bits per 64-bit word — masks stay strictly positive longs
BITS_PER_WORD = 62


def _hash48(col: Column, seed: int) -> Column:
    """48-bit md5-prefix hash of ``"<seed>|<value>"``."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{int(seed)}|"), col.cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")


def _word_and_mask(col: Column, seed: int, n_words: int):
    pos = _hash48(col, seed) % F.lit(int(n_words) * BITS_PER_WORD)
    word = (pos / F.lit(BITS_PER_WORD)).cast("long")
    bit = pos % F.lit(BITS_PER_WORD)
    # F.shiftleft only takes a literal bit count — call the SQL
    # function directly for a column-valued shift
    return word, F.call_function(
        "shiftleft", F.lit(1).cast("long"), bit.cast("int")
    )


def bloom_build(
    keys: DataFrame,
    key_col: str,
    n_words: int = 66,
    k: int = 3,
) -> DataFrame:
    """(word, bits) — the filter as ≤ n_words rows of or-ed masks.
    One map-side-combinable bit_or aggregate over k rows per key;
    words no key hashed into are absent (an absent word is all-zero
    by definition — ``bloom_probe`` treats it so)."""
    fans = []
    key = F.col(key_col)
    for j in range(int(k)):
        w, m = _word_and_mask(key, j, n_words)
        fans.append(F.struct(w.alias("word"), m.alias("mask")))
    return (
        keys.select(F.explode(F.array(*fans)).alias("f"))
        .select(F.col("f.word").alias("word"), F.col("f.mask").alias("mask"))
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    n_words: int = 66,
    k: int = 3,
    out_col: str = "maybe_member",
) -> DataFrame:
    """``df`` with a boolean ``out_col``: true iff every one of the
    key's k filter bits is set (possibly-member — false positives at
    the configured rate; false negatives never).  The filter side is
    ≤ n_words rows and explicitly broadcast: the probe is map-only at
    any corpus size.

    Implementation: k successive left BROADCAST joins on the computed
    word index (no explode, no groupBy — row multiplicity and order
    are preserved and the whole probe stays in the scan stage), each
    contributing one bit check; ``out_col`` is their AND."""
    key = F.col(key_col)
    cols = list(df.columns)
    out = df
    checks = []
    for j in range(int(k)):
        w, m = _word_and_mask(key, j, n_words)
        side = bloom.select(
            F.col("word").alias(f"__w{j}"), F.col("bits").alias(f"__b{j}")
        )
        out = out.withColumn(f"__w{j}", w).withColumn(f"__m{j}", m)
        out = out.join(F.broadcast(side), f"__w{j}", "left")
        checks.append(
            F.coalesce(F.col(f"__b{j}"), F.lit(0).cast("long")).bitwiseAND(
                F.col(f"__m{j}")
            )
            == F.col(f"__m{j}")
        )
    acc = checks[0]
    for c in checks[1:]:
        acc = acc & c
    return out.select(*cols, acc.alias(out_col))
