"""C4 line-level heuristic filters (Raffel et al. 2020 §2.2 — the
published cleaning rules applied to every English Common-Crawl page
before it became C4):

- keep only lines ending in a terminal punctuation mark,
- keep only lines with at least ``min_words`` words,
- drop any line containing the word "javascript" (case-insensitive),
- drop the whole page when it contains "lorem ipsum" (case-ins.) or a
  curly brace ``{``,
- drop the whole page when fewer than ``min_kept_lines`` lines
  survive (the paper's "at least 5 sentences" gate, counted here on
  kept lines — each kept line ends in terminal punctuation, so kept
  lines ARE the sentence proxy; the approximation is documented, not
  silent).

This is the doc-LEVEL sibling of the corpus-wide pass in
``operators/linededup.py``: everything here is a pure function of one
row, so the whole filter is a zero-shuffle map stage — the line split,
per-line predicates and reassembly run as higher-order functions over
the split array (no explode, no groupBy, nothing leaves the row).
HOF caveat honored: the lambdas reference only their element, never
the source array (CLAUDE.md O(n²) trap), and the kept-lines array is
staged behind its own projection so downstream references don't
re-run the filter.

Every fragment is rendered for BOTH engines from one template (Java
regex ∩ RE2; DuckDB list functions), so the driver oracle replays the
rules character-for-character.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: a line is "terminal" when its trimmed form ends in one of these
TERMINAL_RE = r'[.!?"]$'


def kept_lines_sql(
    engine: str,
    text_expr: str,
    min_words: int = 3,
) -> str:
    """Array of surviving lines of ``text_expr`` under the per-LINE
    rules (terminal punctuation, word count, javascript)."""
    # CRLF text leaves a trailing '\r' on every split line; trim()
    # strips spaces only in BOTH engines, and a surviving '\r' splits
    # them on the '$' anchor (Java regex matches before a final line
    # terminator, RE2 does not — review-caught).  replace() strips it
    # identically in both before any rule looks at the line.
    if engine == "spark":
        return (
            f"filter(split({text_expr}, '\n'), x -> "
            f"trim(replace(x, '\r', '')) RLIKE '[.!?\"]$' "
            f"AND size(split(trim(replace(x, '\r', '')), ' +')) "
            f">= {min_words} "
            f"AND NOT contains(lower(x), 'javascript'))"
        )
    if engine == "duckdb":
        return (
            f"list_filter(string_split({text_expr}, chr(10)), x -> "
            f"regexp_matches(trim(replace(x, chr(13), '')), '[.!?\"]$') "
            f"AND len(string_split_regex(trim(replace(x, chr(13), '')),"
            f" ' +')) >= {min_words} "
            f"AND NOT contains(lower(x), 'javascript'))"
        )
    raise ValueError(f"unknown engine: {engine}")


def page_blocked_sql(engine: str, text_expr: str) -> str:
    """TRUE when the page-level content rules fire (lorem ipsum /
    curly brace) — identical text in both engines."""
    return (
        f"(contains(lower({text_expr}), 'lorem ipsum')"
        f" OR contains({text_expr}, '{{'))"
    )


def join_lines_sql(engine: str, arr_expr: str) -> str:
    """Newline-join of a line array; '' for the empty array in BOTH
    engines (DuckDB's array_to_string([]) is NULL — coalesce pins the
    Spark semantics, the urls.py lesson)."""
    if engine == "spark":
        return f"array_join({arr_expr}, '\n')"
    return f"coalesce(array_to_string({arr_expr}, chr(10)), '')"


def with_c4_lines(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 3,
    min_kept_lines: int = 5,
) -> DataFrame:
    """Append C4 line-filter results: ``text_c4`` (surviving lines,
    '' when the page is dropped), ``n_lines``, ``n_kept_lines`` and
    ``page_kept``.  Pure per-row projection — zero shuffle at any
    scale; the kept-array is materialized behind its own projection
    boundary (referenced twice downstream)."""
    staged = df.withColumn(
        "_c4_kept", F.expr(kept_lines_sql("spark", text_col, min_words))
    ).withColumn(
        "_c4_blocked", F.expr(page_blocked_sql("spark", text_col))
    )
    n_kept = F.size("_c4_kept").cast("long")
    page_kept = (~F.col("_c4_blocked")) & (n_kept >= min_kept_lines)
    return (
        staged.withColumn(
            "n_lines", F.size(F.split(F.col(text_col), "\n")).cast("long")
        )
        .withColumn("n_kept_lines", n_kept)
        .withColumn("page_kept", page_kept)
        .withColumn(
            "text_c4",
            F.when(
                page_kept, F.expr(join_lines_sql("spark", "_c4_kept"))
            ).otherwise(F.lit("")),
        )
        .drop("_c4_kept", "_c4_blocked")
    )


def c4_oracle_select(
    engine: str,
    docs_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 3,
    min_kept_lines: int = 5,
) -> str:
    """Full mirror of :func:`with_c4_lines` over ``docs_sql``,
    emitting id, md5(text_c4), n_lines, n_kept_lines, page_kept."""
    kept = kept_lines_sql(engine, text_col, min_words)
    blocked = page_blocked_sql(engine, text_col)
    if engine == "spark":
        n_lines = f"CAST(size(split({text_col}, '\n')) AS BIGINT)"
    else:
        n_lines = f"CAST(len(string_split({text_col}, chr(10))) AS BIGINT)"
    n_kept = (
        "CAST(size(_kept) AS BIGINT)"
        if engine == "spark"
        else "CAST(len(_kept) AS BIGINT)"
    )
    joined = join_lines_sql(engine, "_kept")
    return f"""
    SELECT {id_col},
           md5(CASE WHEN page_kept THEN {joined} ELSE '' END) AS c4_md5,
           n_lines, n_kept_lines, page_kept
    FROM (
        SELECT {id_col}, _kept, n_lines,
               {n_kept} AS n_kept_lines,
               (NOT _blocked AND {n_kept} >= {min_kept_lines}) AS page_kept
        FROM (
            SELECT {id_col}, {kept} AS _kept, {blocked} AS _blocked,
                   {n_lines} AS n_lines
            FROM ({docs_sql})
        )
    )
    """
