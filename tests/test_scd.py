"""MERGE change-apply and SCD2 history (operators/scd.py)."""

from __future__ import annotations

from datetime import datetime

from org_revue_de_presse_trends_spark.operators.scd import (
    merge_changes,
    scd2_from_observations,
)


def _ts(s: int):
    return datetime(2024, 1, 1, 0, s // 60, s % 60)


def test_merge_upsert_insert_delete(spark):
    snap = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"
    )
    chg = spark.createDataFrame(
        [
            (1, 11.0, "U", _ts(1), 100),   # update existing
            (1, 12.0, "U", _ts(2), 101),   # later update wins
            (2, 0.0, "D", _ts(1), 102),    # delete existing
            (4, 40.0, "U", _ts(1), 103),   # insert new key
            (5, 50.0, "U", _ts(1), 104),   # insert then delete -> absent
            (5, 0.0, "D", _ts(2), 105),
            (6, 60.0, "D", _ts(1), 106),   # delete then re-insert -> present
            (6, 61.0, "U", _ts(2), 107),
        ],
        "k long, v double, op string, ts timestamp, event_id long",
    )
    out = merge_changes(snap, chg, ["k"], ["ts", "event_id"])
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {1: 12.0, 3: 30.0, 4: 40.0, 6: 61.0}


def test_merge_seq_tiebreak_within_same_ts(spark):
    snap = spark.createDataFrame([(1, 0.0)], "k long, v double")
    chg = spark.createDataFrame(
        [(1, 5.0, "U", _ts(1), 200), (1, 7.0, "U", _ts(1), 201)],
        "k long, v double, op string, ts timestamp, event_id long",
    )
    out = merge_changes(snap, chg, ["k"], ["ts", "event_id"]).collect()
    assert out[0]["v"] == 7.0  # higher unique id wins at equal ts


def test_merge_layout_independence(spark):
    snap = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "k long, v double"
    )
    chg = spark.createDataFrame(
        [
            (i % 60, float(100 + i), "D" if i % 7 == 0 else "U", _ts(i), i)
            for i in range(120)
        ],
        "k long, v double, op string, ts timestamp, event_id long",
    )
    a = merge_changes(snap, chg, ["k"], ["ts", "event_id"]).collect()
    b = merge_changes(
        snap.repartition(7), chg.repartition(11), ["k"], ["ts", "event_id"]
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_scd2_islands_and_intervals(spark):
    obs = spark.createDataFrame(
        [
            (1, "bronze", _ts(0), 0),
            (1, "bronze", _ts(10), 1),   # same -> same island
            (1, "silver", _ts(20), 2),   # change
            (1, "bronze", _ts(30), 3),   # back -> NEW island, not merged
            (2, "gold", _ts(5), 4),      # single-observation key
        ],
        "k long, tier string, ts timestamp, oid long",
    )
    out = scd2_from_observations(obs, ["k"], ["tier"], "ts", "oid")
    rows = sorted(
        out.collect(), key=lambda r: (r["k"], r["valid_from"])
    )
    assert [
        (r["k"], r["tier"], r["valid_from"], r["valid_to"], r["is_current"],
         r["n_obs"])
        for r in rows
    ] == [
        (1, "bronze", _ts(0), _ts(20), False, 2),
        (1, "silver", _ts(20), _ts(30), False, 1),
        (1, "bronze", _ts(30), None, True, 1),
        (2, "gold", _ts(5), None, True, 1),
    ]
    # intervals tile: every non-current valid_to equals the successor's
    # valid_from; exactly one current row per key
    assert sum(r["is_current"] for r in rows) == 2


def test_scd2_null_attr_and_tiebreak(spark):
    obs = spark.createDataFrame(
        [
            (1, None, _ts(0), 0),
            (1, None, _ts(1), 1),       # null==null -> same island
            (1, "x", _ts(1), 2),        # same ts: oid breaks the tie
        ],
        "k long, tier string, ts timestamp, oid long",
    )
    out = scd2_from_observations(obs, ["k"], ["tier"], "ts", "oid")
    rows = sorted(out.collect(), key=lambda r: r["valid_from"] or _ts(0))
    assert len(rows) == 2
    assert rows[0]["tier"] is None and rows[0]["n_obs"] == 2
    assert rows[1]["tier"] == "x" and rows[1]["is_current"]
