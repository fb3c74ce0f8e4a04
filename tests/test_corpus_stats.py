"""Corpus-statistics queries vs independent pure-Python references.

Each test writes a synthetic documents.parquet and runs the REAL
registered query end-to-end (same path the driver takes), comparing
against a from-scratch Python computation of the same definition —
exact to the queries' own 6dp rounding, not approximate.
"""

from __future__ import annotations

import math

import pytest

from org_revue_de_presse_trends_spark.plans.registry import QUERIES


def _write_docs(spark, tmp_path, rows):
    # single parquet FILE, like the driver fixtures (catalog.load_table
    # reads the file path, not a Spark parquet directory)
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _scaled(v: float) -> int:
    # ROUND(x, 0) in both engines: half away from zero
    return int(math.floor(v * 1_000_000 + 0.5)) if v >= 0 else -int(
        math.floor(-v * 1_000_000 + 0.5)
    )


def test_zipf_slope_matches_python_reference(spark, tmp_path):
    """Planted power-law corpus: token k appears ⌊C/k⌋ times → the
    fitted slope must equal the pure-Python least-squares over the
    identical scaled-long terms, and sit near −1."""
    counts = {f"t{k:02d}": 200 // k for k in range(1, 21)}
    text = " ".join(t for t, c in counts.items() for _ in range(c))
    sf = _write_docs(spark, tmp_path, [(0, text, "en", "s0")])
    [row] = QUERIES["source_zipf_slope"](spark, sf).collect()
    # python reference: same ranking (count desc, token asc), same
    # scaled-long x/y, same final double arithmetic
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [_scaled(math.log(r + 1)) for r in range(len(ranked))]
    ys = [_scaled(math.log(c)) for _, c in ranked]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = round(
        (float(n) * float(sxy) - float(sx) * float(sy))
        / (float(n) * float(sxx) - float(sx) * float(sx)),
        6,
    )
    assert row["n_terms"] == n
    assert row["zipf_slope"] == pytest.approx(slope, abs=1e-9)
    assert -1.35 < row["zipf_slope"] < -0.75


def test_token_entropy_matches_python_reference(spark, tmp_path):
    docs = {
        0: "a a a a",                  # zero entropy
        1: "a b c d",                  # uniform: ln 4
        2: "a a b",                    # 2/3,1/3
    }
    sf = _write_docs(
        spark, tmp_path, [(i, t, "en", "s0") for i, t in docs.items()]
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_distinct"], r["entropy_scaled"])
        for r in QUERIES["doc_token_entropy"](spark, sf).collect()
    }
    for i, t in docs.items():
        toks = t.split(" ")
        n = len(toks)
        cs = {w: toks.count(w) for w in set(toks)}
        want = sum(
            _scaled((c / n) * math.log(n / c)) for c in cs.values()
        )
        assert got[i] == (n, len(cs), want), (i, got[i], want)
    assert got[0][2] == 0
    assert got[1][2] == pytest.approx(_scaled(math.log(4)), abs=2)


def test_js_divergence_reference_bounds_and_identity(spark, tmp_path):
    """Identical distributions → 0; disjoint vocabularies → ln 2; a
    mixed pair matches the pure-Python JS to the query's own per-term
    rounding (±1 ulp of the 1e-6 scale per term)."""
    rows = [
        (0, "a a b", "en", "s0"),
        (1, "a a b", "en", "s1"),     # identical to s0
        (2, "x y z", "en", "s2"),     # disjoint from s0/s1
        (3, "a b b b", "en", "s3"),   # overlapping with s0
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {
        (r["source_a"], r["source_b"]): r["js_divergence"]
        for r in QUERIES["source_js_divergence"](spark, sf).collect()
    }
    assert got[("s0", "s1")] == pytest.approx(0.0, abs=1e-6)
    # fully disjoint vocabularies emit NO row (documented: absence =
    # the maximal distance ln 2) — the common-token join never fires
    assert ("s0", "s2") not in got and ("s1", "s2") not in got
    # all emitted values inside [0, ln 2]
    for v in got.values():
        assert -1e-6 <= v <= math.log(2) + 1e-6

    def js(p: dict, q: dict) -> float:
        s = 0.0
        for t in set(p) | set(q):
            pp, qq = p.get(t, 0.0), q.get(t, 0.0)
            m = (pp + qq) / 2
            if pp:
                s += 0.5 * pp * math.log(pp / m)
            if qq:
                s += 0.5 * qq * math.log(qq / m)
        return s

    p = {"a": 2 / 3, "b": 1 / 3}
    q = {"a": 1 / 4, "b": 3 / 4}
    assert got[("s0", "s3")] == pytest.approx(js(p, q), abs=5e-6)


def test_vocab_coverage_curve_monotone_and_complete(spark, tmp_path):
    sf = _write_docs(
        spark, tmp_path,
        [(0, "a a a b b c", "en", "s0"), (1, "a b d", "en", "s1")],
    )
    rows = sorted(
        QUERIES["vocab_coverage_curve"](spark, sf).collect(),
        key=lambda r: r["vocab_size"],
    )
    # ranks 1..V, coverage strictly increasing to exactly 1.0
    assert [r["vocab_size"] for r in rows] == list(range(1, len(rows) + 1))
    cov = [r["coverage"] for r in rows]
    assert all(b > a for a, b in zip(cov, cov[1:]))
    assert cov[-1] == pytest.approx(1.0, abs=1e-12)
    # top-1 token is 'a' (4 of 9 occurrences)
    assert rows[0]["tok"] == "a"
    assert rows[0]["coverage"] == pytest.approx(4 / 9, abs=1e-12)
