"""Escape-hatch equivalence: pandas UDFs must agree with their JVM
twins (the declarative path stays the source of truth)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from org_revue_de_presse_trends_spark.catalog import load_table
from org_revue_de_presse_trends_spark.functions import vectors as V
from org_revue_de_presse_trends_spark.functions import text as T
from org_revue_de_presse_trends_spark.functions.udf_escape import (
    cosine_pandas,
    normalize_embedding,
    token_count_pandas,
)

SF = "/root/testdata/sf0.001"


def test_cosine_pandas_matches_jvm(spark):
    e = load_table(spark, SF, "embeddings").limit(50)
    a = e.alias("a")
    b = e.alias("b")
    pairs = a.join(
        b, (F.col("a.vec_id") + 1 == F.col("b.vec_id"))
    ).select(
        F.col("a.vec_id").alias("id"),
        V.cosine(F.col("a.embedding"), F.col("b.embedding")).alias("jvm"),
        cosine_pandas()(F.col("a.embedding"), F.col("b.embedding")).alias("py"),
    )
    for r in pairs.collect():
        assert math.isclose(r["jvm"], r["py"], rel_tol=1e-9), r


def test_normalize_embedding_unit_norm(spark):
    e = load_table(spark, SF, "embeddings").limit(20)
    out = e.select(
        V.norm(normalize_embedding()(F.col("embedding"))).alias("n")
    ).collect()
    for r in out:
        assert math.isclose(r["n"], 1.0, rel_tol=1e-6)


def test_token_count_pandas_matches_jvm(spark):
    d = load_table(spark, SF, "documents").limit(100)
    out = d.select(
        F.size(T.tokens(F.col("text"))).cast("long").alias("jvm"),
        token_count_pandas()(F.col("text")).alias("py"),
    ).collect()
    assert all(r["jvm"] == r["py"] for r in out)


def test_zscore_apply_in_pandas_matches_jvm(spark):
    from org_revue_de_presse_trends_spark.operators.grouped import (
        zscore_apply_in_pandas,
        zscore_jvm,
    )

    ev = load_table(spark, SF, "events")
    jvm = {r["event_id"]: r["z"] for r in zscore_jvm(ev).collect()}
    py = {r["event_id"]: r["z"] for r in zscore_apply_in_pandas(ev).collect()}
    assert set(jvm) == set(py) and len(jvm) > 900
    for k in jvm:
        assert math.isclose(jvm[k], py[k], rel_tol=1e-9, abs_tol=1e-12), k


def test_lake_partition_pruning(spark, tmp_path):
    """Scale evidence: a day-partitioned lake turns the F1 day filter
    into partition pruning (plan shows the partition filter and no
    pushed data filter on day)."""
    import io, contextlib

    from org_revue_de_presse_trends_spark.functions.expressions import (
        civil_day,
    )
    from org_revue_de_presse_trends_spark.sources.lake import (
        write_partitioned,
    )

    lake = str(tmp_path / "events_lake")
    ev = load_table(spark, SF, "events").withColumn(
        "day", civil_day(F.col("ts"))
    )
    write_partitioned(ev, lake, partition_by=("day",))
    one_day = spark.read.parquet(lake).filter(
        F.col("day") == "2024-01-05"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        one_day.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [isnotnull(day" in plan
    n_all = spark.read.parquet(lake).count()
    n_day = one_day.count()
    assert 0 < n_day < n_all
