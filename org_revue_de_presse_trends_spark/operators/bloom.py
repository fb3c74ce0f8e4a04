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


def _hash48_sql(key_expr: str, seed: int) -> str:
    """48-bit md5-prefix hash of ``"<seed>|<value>"`` (string-form —
    the r8b plan-build-tax rule; the parsed tree is identical to the
    old Column builder)."""
    return (
        f"CAST(conv(substring(md5(concat('{int(seed)}|',"
        f" CAST({key_expr} AS STRING))), 1, 12), 16, 10) AS BIGINT)"
    )


def _word_and_mask_sql(key_expr: str, seed: int, n_words: int):
    pos = f"({_hash48_sql(key_expr, seed)} % {int(n_words) * BITS_PER_WORD})"
    word = f"CAST({pos} / {BITS_PER_WORD} AS BIGINT)"
    # shiftleft with a column-valued bit count (F.shiftleft only takes
    # a literal count in the Column API)
    mask = (
        f"shiftleft(CAST(1 AS BIGINT),"
        f" CAST({pos} % {BITS_PER_WORD} AS INT))"
    )
    return word, mask


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
    for j in range(int(k)):
        w, m = _word_and_mask_sql(f"`{key_col}`", j, n_words)
        fans.append(f"struct({w} AS word, {m} AS mask)")
    return (
        keys.selectExpr(f"explode(array({', '.join(fans)})) AS f")
        .selectExpr("f.word AS word", "f.mask AS mask")
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
    cols = list(df.columns)
    out = df
    checks = []
    for j in range(int(k)):
        w, m = _word_and_mask_sql(f"`{key_col}`", j, n_words)
        side = bloom.selectExpr(f"word AS __w{j}", f"bits AS __b{j}")
        out = out.selectExpr("*", f"{w} AS __w{j}", f"{m} AS __m{j}")
        out = out.join(F.broadcast(side), f"__w{j}", "left")
        checks.append(
            f"((coalesce(__b{j}, CAST(0 AS BIGINT)) & __m{j})"
            f" = __m{j})"
        )
    # backtick-quote the passthrough names: they route through the SQL
    # parser here, and caller columns need not be bare identifiers
    return out.selectExpr(
        *[f"`{c}`" for c in cols],
        f"({' AND '.join(checks)}) AS `{out_col}`",
    )
