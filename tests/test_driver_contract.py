"""The local mirror of the driver's t2 correctness gate: run every
registered query through Spark AND its DuckDB oracle on the same
parquet, compare canonicalized results (sorted columns, stable float
rendering, sorted rows).  Catches oracle drift before the driver does.
"""

from __future__ import annotations

import pytest

from conftest import SF_ORACLE, canon, register_duck_views

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["day", "event_id", "user_id", "event_type", "value", "rank"]
    assert len(rows) > 0


def _pairs():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    return [(name, fn, oracles.get(name)) for name, fn in sorted(qs.items())]


@pytest.mark.parametrize("name,fn,oracle", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, duck, name, fn, oracle):
    df = fn(spark, SF_ORACLE)
    spark_rows = df.collect()
    cols = df.columns
    assert len(cols) == len(set(cols)), f"{name}: duplicate column names"
    if oracle is None:
        # rows-only contract: must run and return a stable schema
        assert isinstance(spark_rows, list)
        return
    register_duck_views(duck, SF_ORACLE)
    res = duck.execute(oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(cols)} duck={sorted(duck_cols)}"
    )
    # type correspondence: a strict driver-side schema compare must not
    # trip over e.g. DuckDB SUM(int)->HUGEINT vs Spark long
    # DuckDB TIMESTAMP is naive; Spark reads naive parquet timestamps
    # as timestamp_ntz (inferTimestampNTZ) but produces LTZ timestamps
    # from timestamp_micros() — both are faithful counterparts
    DUCK_TO_SPARK = {
        "BIGINT": ("bigint",), "INTEGER": ("int",), "DOUBLE": ("double",),
        "VARCHAR": ("string",), "DATE": ("date",),
        "TIMESTAMP": ("timestamp", "timestamp_ntz"),
        "BOOLEAN": ("boolean",), "FLOAT": ("float",),
    }
    spark_types = dict(zip(df.columns, [f.dataType.simpleString()
                                        for f in df.schema.fields]))
    duck_types = {
        r[0]: r[1] for r in duck.execute(f"DESCRIBE {oracle}").fetchall()
    }
    for col in cols:
        dt = duck_types[col]
        expected = DUCK_TO_SPARK.get(dt)
        assert expected is not None, (
            f"{name}.{col}: oracle type {dt} has no clean Spark "
            f"equivalent — add explicit casts"
        )
        assert spark_types[col] in expected, (
            f"{name}.{col}: spark {spark_types[col]} vs duck {dt}"
        )
    s = canon([tuple(r) for r in spark_rows], cols)
    d = canon(duck_rows, duck_cols)
    assert len(s) == len(d), f"{name}: row count spark={len(s)} duck={len(d)}"
    mismatches = [i for i, (a, b) in enumerate(zip(s, d)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatching rows; first: "
        f"spark={s[mismatches[0]]} duck={d[mismatches[0]]}"
    )
    assert len(s) > 0, f"{name}: empty result — weak test, tune constants"
