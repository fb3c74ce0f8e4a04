"""PII detection / redaction column expressions.

Standard training-data-pipeline stage (C4 / Dolma-style cleaning):
scrub emails, card numbers, phone numbers, SSNs and IPv4 addresses
from document text before it reaches a training corpus.

Design constraints (same as functions/text.py):

- JVM-side built-ins only (``regexp_extract_all`` / ``regexp_replace``)
  so redaction stays inside whole-stage codegen — at 100 TB this is a
  pure map stage, embarrassingly parallel, zero shuffle.
- Every pattern is valid in BOTH Java regex (Spark) and RE2 (DuckDB):
  no lookaround, no backreferences — so the driver's DuckDB oracle can
  run the exact same redaction and the cross-engine hash check covers
  regex semantics character-for-character.
- Rules apply in a FIXED order (email → card → phone → ssn → ipv4) and
  each class is counted on the text as already redacted by the earlier
  classes, so overlapping matches (a card's tail reads like a phone
  number) are attributed to exactly one class, deterministically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (class name, pattern, replacement token) — order is semantic: the
#: longest / most specific classes first so their digits are consumed
#: before looser patterns (phone) can see them.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "card",
        r"\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b",
        "<CARD>",
    ),
    (
        "phone",
        # \b sits before the first digit group (a boundary before the
        # optional "+1"/"(" would not exist after a space) so the
        # pattern cannot start mid-digit-run: without it, the tail of
        # a longer digit string matched, leaving its head unredacted
        r"(\+1[-. ])?\(?\b[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}\b",
        "<PHONE>",
    ),
    (
        "ssn",
        r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
        "<SSN>",
    ),
    (
        "ipv4",
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "<IPV4>",
    ),
)


def match_count(text: Column, pattern: str) -> Column:
    """Number of non-overlapping matches of ``pattern`` (bigint, to
    line up with DuckDB's ``len(list)``)."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0))).cast(
        "long"
    )


def redact(text: Column, pattern: str, token: str) -> Column:
    """Replace every match of ``pattern`` with ``token``."""
    return F.regexp_replace(text, pattern, token)


def with_pii_redacted(
    df: DataFrame, text_col: str = "text", out_col: str = "text_redacted"
) -> DataFrame:
    """Append per-class match counts (``n_email`` … ``n_ipv4``) and the
    fully redacted text.

    Each stage is projected as a named column before the next rule
    reads it, so counts are attributed on the partially-redacted text
    (fixed-order semantics above) and the regex engine runs each rule
    once per row, not once per downstream reference.
    """
    cur = F.col(text_col)
    out = df
    for i, (name, pattern, token) in enumerate(PII_RULES):
        staged = f"__pii_stage_{i}"
        out = out.withColumns(
            {
                f"n_{name}": match_count(cur, pattern),
                staged: redact(cur, pattern, token),
            }
        )
        cur = F.col(staged)
    out = out.withColumn(out_col, cur)
    return out.drop(*[f"__pii_stage_{i}" for i in range(len(PII_RULES))])


def oracle_redaction_ctes(base: str = "planted") -> str:
    """DuckDB CTE chain mirroring :func:`with_pii_redacted` over a CTE
    ``base`` with columns (doc_id, text): stages ``pii0 … piiN`` where
    the last stage carries every ``n_<class>`` count and the redacted
    ``text``.  RE2 needs the explicit ``'g'`` flag to replace all."""
    ctes = []
    prev = base
    carried: list[str] = []
    for i, (name, pattern, token) in enumerate(PII_RULES):
        keep = ", ".join(carried) + (", " if carried else "")
        ctes.append(
            f"""pii{i} AS (
        SELECT doc_id, {keep}
               CAST(len(regexp_extract_all(text, '{pattern}')) AS BIGINT)
                 AS n_{name},
               regexp_replace(text, '{pattern}', '{token}', 'g') AS text
        FROM {prev}
    )"""
        )
        carried.append(f"n_{name}")
        prev = f"pii{i}"
    return ",\n    ".join(ctes)


FINAL_PII_STAGE = f"pii{len(PII_RULES) - 1}"
