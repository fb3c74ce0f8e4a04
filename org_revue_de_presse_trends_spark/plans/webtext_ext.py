"""Web-text extraction queries (past the driver window;
contract-gated): HTML → plain-text extraction and corpus-wide
line-level dedup — the two passes that precede everything else in a
C4 / RefinedWeb / FineWeb-style web pipeline.

The driver fixtures carry no HTML and no newlines, so each query
SYNTHESIZES its input as a pure function of (doc_id, text) — the
image_near_dup_from_docs precedent — with the identical synthesis
rendered in both engines, so the cross-engine hash gate covers the
synthesis AND the operator character-for-character.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..functions import c4lines as C4
from ..functions import htmltext as H
from ..operators.linededup import line_dedup_oracle_sql, remove_duplicate_lines
from ..operators.skew import spread_for_cpu
from .registry import query


def _cast_str(engine: str, expr: str) -> str:
    return f"CAST({expr} AS {'STRING' if engine == 'spark' else 'VARCHAR'})"


# ---------------------------------------------------------------------------
# HTML → text extraction
# ---------------------------------------------------------------------------


def _synth_html_sql(engine: str) -> str:
    """One SQL expression building a deterministic HTML page from
    (doc_id, text): head with <title>/<style>/<script> (the script
    contains a bare '<' and '&' that must NOT leak into the text),
    a comment, an <h1>, the document text inside <p> with a <br/>
    split after 40 chars, and residue-keyed list / entity blocks so
    every extraction stage fires on a known subset of docs."""
    i = _cast_str(engine, "doc_id")
    body_text = (
        "CASE WHEN length(text) > 40 THEN substr(text, 1, 40) || '<br/>' "
        "|| substr(text, 41) ELSE text END"
    )
    return (
        f"'<html><head><title>Doc ' || {i} || '</title>'"
        " || '<style type=\"text/css\">body { margin: 0; }</style>'"
        " || '<script>if (1 < 2) { alert(\"x&y\"); }</script>'"
        " || '</head><body>'"
        f" || '<!-- crawl id ' || {i} || ' -->'"
        f" || '<h1>Doc ' || {i} || '</h1>'"
        f" || '<p class=\"lead\">' || {body_text} || '</p>'"
        " || CASE WHEN doc_id % 3 = 0 THEN"
        " '<ul><li>alpha item</li><li>beta&amp;gamma</li></ul>'"
        " ELSE '' END"
        " || CASE WHEN doc_id % 5 = 0 THEN"
        " '<p>extra &lt;b&gt;bold&lt;/b&gt;&nbsp;&#39;quoted&#39;</p>'"
        " ELSE '' END"
        " || '</body></html>'"
    )


def _html_oracle_select() -> str:
    """DuckDB-side final projection over the extracted text (the
    Spark twin is the two chained selectExpr calls in the query body
    — separate because the Spark side needs DataFrame projection
    boundaries, not a subquery).  The extraction chain lands behind
    its own projection because ``txt`` is referenced three times —
    without the boundary the planner would inline the 17-stage regex
    chain per reference."""
    txt = H.html_to_text_sql("duckdb", "html")
    title = H.html_title_sql("duckdb", "html")
    return (
        f"SELECT doc_id, title, md5(txt) AS txt_md5, "
        f"CAST(length(txt) AS BIGINT) AS txt_len, "
        f"CAST(len(string_split(txt, chr(10))) AS BIGINT) AS n_lines "
        f"FROM (SELECT doc_id, {txt} AS txt, {title} AS title FROM _html)"
    )


@query(
    "doc_html_extract",
    f"""
    WITH _html AS (
        SELECT doc_id, {_synth_html_sql('duckdb')} AS html FROM documents
    )
    {_html_oracle_select()}
    """,
)
def doc_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → plain-text extraction (functions/htmltext.py) over a
    synthesized page per document: strips comment/script/style spans,
    turns block closers into newlines, decodes the fixed entity table
    after tag removal (so planted ``&lt;b&gt;`` survives as literal
    text), normalizes whitespace, and extracts the <title>.

    Scale: pure map stage, one parsed expression chain inside
    whole-stage codegen; ``spread_for_cpu`` because the regex chain is
    scan-stage CPU work with no downstream shuffle (the
    doc_pii_redaction precedent)."""
    d = spread_for_cpu(load_table(spark, sf_dir, "documents"))
    html = d.selectExpr("doc_id", _synth_html_sql("spark") + " AS html")
    staged = html.selectExpr(
        "doc_id",
        H.html_to_text_sql("spark", "html") + " AS txt",
        H.html_title_sql("spark", "html") + " AS title",
    )
    return staged.selectExpr(
        "doc_id",
        "title",
        "md5(txt) AS txt_md5",
        "CAST(length(txt) AS BIGINT) AS txt_len",
        "CAST(size(split(txt, '\n')) AS BIGINT) AS n_lines",
    )


# ---------------------------------------------------------------------------
# Corpus-wide line-level dedup
# ---------------------------------------------------------------------------

#: min trimmed chars for a line to be dedup-eligible
_MIN_CHARS = 10


def _synth_lines_sql(engine: str) -> str:
    """Documents re-lined deterministically: a newline after every 6
    whitespace-separated tokens, plus planted boilerplate lines on
    doc_id residues (every 4th doc shares one line, every 9th another)
    so corpus-wide line collisions are guaranteed at every SF —
    exactly the repeated-boilerplate shape C4's rule exists for."""
    if engine == "spark":
        relined = "regexp_replace(text, '((?:\\\\S+ ){6})', '$1\n')"
        nl = "'\n'"
    else:
        relined = "regexp_replace(text, '((?:\\S+ ){6})', '\\1\n', 'g')"
        nl = "chr(10)"
    return (
        f"SELECT doc_id, {relined}"
        f" || CASE WHEN doc_id % 4 = 0 THEN {nl} ||"
        f" 'Subscribe to our newsletter today' ELSE '' END"
        f" || CASE WHEN doc_id % 9 = 0 THEN {nl} ||"
        f" 'All rights reserved worldwide' ELSE '' END AS text"
        f" FROM documents"
    )


@query(
    "doc_line_dedup",
    f"""
    WITH _ded AS (
        {line_dedup_oracle_sql(_synth_lines_sql('duckdb'),
                               min_chars=_MIN_CHARS)}
    )
    SELECT doc_id, md5(text_line_deduped) AS ded_md5,
           n_lines, n_kept, n_dropped
    FROM _ded
    """,
)
def doc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-wide keep-first line dedup
    (operators/linededup.py) over deterministically re-lined
    documents with planted cross-document boilerplate lines.

    Scale: two skew-immune hash aggregates (map-side combine on the
    normalized line — boilerplate keys reduce per-partition before
    the exchange) + one unique-key equi-join for totality; no window
    over the line key, no join back to the exploded stream (the
    aggregate output IS the kept set — see the operator docstring)."""
    d = load_table(spark, sf_dir, "documents")
    relined = d.selectExpr(
        "doc_id",
        "regexp_replace(text, '((?:\\\\S+ ){6})', '$1\n')"
        " || CASE WHEN doc_id % 4 = 0 THEN '\n' ||"
        " 'Subscribe to our newsletter today' ELSE '' END"
        " || CASE WHEN doc_id % 9 = 0 THEN '\n' ||"
        " 'All rights reserved worldwide' ELSE '' END AS text",
    )
    ded = remove_duplicate_lines(relined, min_chars=_MIN_CHARS)
    return ded.selectExpr(
        "doc_id",
        "md5(text_line_deduped) AS ded_md5",
        "n_lines",
        "n_kept",
        "n_dropped",
    )


# ---------------------------------------------------------------------------
# C4 line-level heuristic filter
# ---------------------------------------------------------------------------


def _synth_c4_sql(engine: str) -> str:
    """Documents re-lined with per-DOC terminators (doc_id%3: '.', no
    terminator, '!') plus planted lines firing each rule on a known
    residue: a 2-word line (word-count rule, every doc), a javascript
    line (%5), an unterminated tail line (%7), a clean keeper (%11),
    a 'lorem ipsum' page blocker (%13) and a curly-brace page blocker
    (%17)."""
    if engine == "spark":
        relined = "regexp_replace(text, '((?:\\\\S+ ){6})', '$1\n')"
        nl = "'\n'"
    else:
        relined = "regexp_replace(text, '((?:\\S+ ){6})', '\\1\n', 'g')"
        nl = "chr(10)"
    term = (
        "CASE WHEN doc_id % 3 = 0 THEN '.' || " + nl
        + " WHEN doc_id % 3 = 1 THEN " + nl
        + " ELSE '!' || " + nl + " END"
    )
    return (
        f"SELECT doc_id, replace({relined}, ' ' || {nl}, {term})"
        f" || {nl} || 'Tiny line.'"
        f" || CASE WHEN doc_id % 5 = 0 THEN {nl} ||"
        f" 'Please enable javascript to continue browsing.' ELSE '' END"
        f" || CASE WHEN doc_id % 7 = 0 THEN {nl} ||"
        f" 'this trailing line has no terminal punctuation' ELSE '' END"
        f" || CASE WHEN doc_id % 11 = 0 THEN {nl} ||"
        f" 'A perfectly good extra sentence stays here.' ELSE '' END"
        f" || CASE WHEN doc_id % 13 = 0 THEN {nl} ||"
        f" 'Sample filler lorem ipsum dolor sit amet.' ELSE '' END"
        f" || CASE WHEN doc_id % 17 = 0 THEN {nl} ||"
        f" 'if (x) {{ return; }}' ELSE '' END AS text"
        f" FROM documents"
    )


@query(
    "doc_c4_line_filter",
    C4.c4_oracle_select("duckdb", _synth_c4_sql("duckdb")),
)
def doc_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 §2.2 line-level cleaning (functions/c4lines.py): terminal
    punctuation, >=3 words, javascript-line removal, lorem-ipsum /
    curly-brace page drops, >=5 surviving lines per page — over
    deterministically re-lined documents whose terminators and planted
    rule-trigger lines are pure functions of doc_id.

    Scale: zero shuffle — the split, per-line predicates and
    reassembly are higher-order functions over the split array; the
    whole query is one map stage over the corpus."""
    # spread_for_cpu (r11 optimization): the whole regex re-lining +
    # HOF rule chain is map-only per-row CPU, and a small corpus file
    # arrives as ONE split — the doc_bloom_contamination shape.  A/B
    # interleaved best-of-6 at sf0.1: med 0.597 -> 0.433 s (min 0.442
    # -> 0.353, the spread variant timed on the COLDER JVM; one task
    # before).  The operator chain itself still adds zero shuffle
    # (test_plans pins ≤ the one guarded round-robin exchange, the
    # html_extract precedent).
    d = spread_for_cpu(load_table(spark, sf_dir, "documents"))
    # Python-side string: '\\\\S' renders the Spark SQL literal \\S
    docs = d.selectExpr(
        "doc_id",
        "replace(regexp_replace(text, '((?:\\\\S+ ){6})', '$1\n'),"
        " ' ' || '\n',"
        " CASE WHEN doc_id % 3 = 0 THEN '.' || '\n'"
        " WHEN doc_id % 3 = 1 THEN '\n'"
        " ELSE '!' || '\n' END)"
        " || '\n' || 'Tiny line.'"
        " || CASE WHEN doc_id % 5 = 0 THEN '\n' ||"
        " 'Please enable javascript to continue browsing.' ELSE '' END"
        " || CASE WHEN doc_id % 7 = 0 THEN '\n' ||"
        " 'this trailing line has no terminal punctuation' ELSE '' END"
        " || CASE WHEN doc_id % 11 = 0 THEN '\n' ||"
        " 'A perfectly good extra sentence stays here.' ELSE '' END"
        " || CASE WHEN doc_id % 13 = 0 THEN '\n' ||"
        " 'Sample filler lorem ipsum dolor sit amet.' ELSE '' END"
        " || CASE WHEN doc_id % 17 = 0 THEN '\n' ||"
        " 'if (x) { return; }' ELSE '' END AS text",
    )
    filtered = C4.with_c4_lines(docs)
    return filtered.selectExpr(
        "doc_id",
        "md5(text_c4) AS c4_md5",
        "n_lines",
        "n_kept_lines",
        "page_kept",
    )


# ---------------------------------------------------------------------------
# WARC round-trip pipeline (driver-visible evidence for sources/warc.py)
# ---------------------------------------------------------------------------


@query(
    "doc_warc_roundtrip_extract",
    f"""
    WITH _html AS (
        SELECT doc_id, {_synth_html_sql('duckdb')} AS html FROM documents
    )
    SELECT doc_id, 200 AS http_status,
           CAST('text/html; charset=utf-8' AS VARCHAR) AS content_type,
           md5(txt) AS txt_md5, CAST(length(txt) AS BIGINT) AS txt_len
    FROM (SELECT doc_id, {H.html_to_text_sql('duckdb', 'html')} AS txt
          FROM _html)
    """,
)
def doc_warc_roundtrip_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WARC pipeline end-to-end, driver-visible (the
    video_real_webm_frames precedent): each document's synthesized
    HTML page is wrapped in an HTTP/1.1 response inside a spec-valid
    WARC record (sources/warc.build_warc), the bytes are parsed back
    by the record walker, the HTTP payload is split out and
    charset-decoded, and the text is extracted by the HTML chain.

    The ORACLE computes the fixed point directly — extraction over
    the synthesized HTML with no framing — so the cross-engine hash
    equality proves the entire WARC+HTTP framing, record walk, and
    charset ladder are identity-preserving on every document, and the
    extraction itself matches character-for-character.

    Scale: the framing/parse is a per-row mapInPandas (µs per record;
    at crawl scale the walker amortizes over ~1 GB files instead —
    see sources/warc.py); extraction is the same zero-shuffle chain
    as q:doc_html_extract."""
    from ..sources import warc as W

    d = spread_for_cpu(load_table(spark, sf_dir, "documents"))
    html = d.selectExpr("doc_id", _synth_html_sql("spark") + " AS html")

    def frame_and_parse(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, page in zip(pdf["doc_id"], pdf["html"]):
                payload = W.build_http_response(
                    200,
                    {"Content-Type": "text/html; charset=utf-8"},
                    str(page).encode("utf-8"),
                )
                data = W.build_warc(
                    [(
                        {
                            "WARC-Type": "response",
                            "WARC-Record-ID": f"<urn:doc:{int(doc_id)}>",
                            "WARC-Target-URI": f"http://ex.org/{int(doc_id)}",
                            "Content-Type":
                                "application/http; msgtype=response",
                        },
                        payload,
                    )],
                    gzip_members=True,
                )
                rows = W._record_rows(f"mem://{int(doc_id)}", data)
                # explicit raise, not assert: an assert vanishes under
                # python -O and fails opaquely in an executor
                if len(rows) != 1 or rows[0]["parse_error"] is not None:
                    raise ValueError(
                        f"WARC round-trip failed for doc {int(doc_id)}: "
                        f"{[r['parse_error'] for r in rows]}"
                    )
                r = rows[0]
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "http_status": int(r["http_status"]),
                        "content_type": r["content_type"],
                        "html": r["payload_text"],
                    }
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "http_status", "content_type", "html"],
            )

    parsed = html.mapInPandas(
        frame_and_parse,
        "doc_id LONG, http_status INT, content_type STRING, html STRING",
    )
    staged = parsed.selectExpr(
        "doc_id",
        "http_status",
        "content_type",
        H.html_to_text_sql("spark", "html") + " AS txt",
    )
    return staged.selectExpr(
        "doc_id",
        "http_status",
        "content_type",
        "md5(txt) AS txt_md5",
        "CAST(length(txt) AS BIGINT) AS txt_len",
    )
