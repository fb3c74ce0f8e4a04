"""SemDeDup semantic dedup (operators/semdedup.py): planted-geometry
keeper-rule checks + partition/layout invariants.  The sf0.01 driver
query is additionally hash-pinned in test_golden_rowsonly.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from org_revue_de_presse_trends_spark.operators.semdedup import semantic_dedup

DIM = 4


def _vec(*xs):
    return [float(x) for x in xs] + [0.0] * (DIM - len(xs))


@pytest.fixture(scope="module")
def planted(spark):
    # two tight duplicate groups on orthogonal axes + two singletons.
    # Within group 1, id 12 points slightly off-axis → lowest cosine to
    # the (near-axis) cell centroid → the SemDeDup keeper.
    rows = [
        (10, _vec(1.0, 0.0)),
        (11, _vec(0.999, 0.02)),
        (12, _vec(0.95, 0.18)),
        (20, _vec(0.0, 1.0)),
        (21, _vec(0.02, 0.999)),
        (30, _vec(0.0, 0.0, 1.0)),
        (31, _vec(0.0, 0.0, 0.0, 1.0)),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _run(df, **kw):
    kw.setdefault("n_cells", 3)
    kw.setdefault("threshold", 0.9)
    kw.setdefault("dim", DIM)
    return semantic_dedup(df, **kw)


def test_partitions_ids_and_one_keeper_per_cluster(planted):
    out = _run(planted).collect()
    assert {r["id"] for r in out} == {10, 11, 12, 20, 21, 30, 31}
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for members in by_cluster.values():
        assert sum(r["keep"] for r in members) == 1
    # singletons (orthogonal to everything at threshold 0.9) survive
    singles = {r["id"] for r in out if r["id"] in (30, 31)}
    assert all(r["keep"] for r in out if r["id"] in singles)


def test_clusters_match_planted_geometry(planted):
    out = {r["id"]: r for r in _run(planted).collect()}
    # groups cluster under their min id; cross-axis cosine ~0 < 0.9
    assert out[11]["cluster"] == out[10]["cluster"] == 10
    assert out[12]["cluster"] == 10
    assert out[21]["cluster"] == out[20]["cluster"] == 20
    assert out[30]["cluster"] == 30 and out[31]["cluster"] == 31
    # exactly one doc pruned per extra member
    assert sum(not r["keep"] for r in out.values()) == 3


def test_keeper_is_least_centroid_similar(planted):
    """The paper's rule: per duplicate cluster keep the member with the
    LOWEST cosine to its cell centroid (ties → min id) — here the
    off-axis id 12, not the min-id member."""
    out = {r["id"]: r for r in _run(planted).collect()}
    g1 = [out[i] for i in (10, 11, 12)]
    keeper = [r for r in g1 if r["keep"]]
    assert len(keeper) == 1
    best = min(g1, key=lambda r: (r["cent_cos"], r["id"]))
    assert keeper[0]["id"] == best["id"] == 12


def test_layout_independent(planted):
    """Result is a function of the data, not the input partitioning."""
    a = {(r["id"], r["cluster"], r["keep"]) for r in _run(planted).collect()}
    b = {
        (r["id"], r["cluster"], r["keep"])
        for r in _run(planted.repartition(7)).collect()
    }
    assert a == b


def test_threshold_one_prunes_nothing(planted):
    out = _run(planted, threshold=1.01).collect()
    assert all(r["keep"] for r in out)
    assert all(r["cluster"] == r["id"] for r in out)


def test_semdedup_cell_pairs_skip_duplicate_ids(spark):
    """the intra-cell blocked-matmul pair stage pairs by position: two
    rows sharing an id must not produce an id_a == id_b pair."""
    import pandas as pd

    from org_revue_de_presse_trends_spark.operators.semdedup import (
        _cell_pair_fn,
    )

    v = [1.0] + [0.0] * 63
    pdf = pd.DataFrame({"id": [5, 5, 9], "v": [v, v, v]})
    out = _cell_pair_fn(threshold=0.5, block=4096)(pdf)
    assert (out["id_a"] != out["id_b"]).all()
    # the distinct-id pairs survive
    assert set(zip(out["id_a"], out["id_b"])) == {(5, 9)}
