"""Deterministic shard export + order-independent content manifests
(operators/export.py): layout independence, write round-trip
integrity, NULL/empty distinguishability, and the float guard.  The
cross-engine value-exactness of q:doc_shard_manifest rides the
driver-contract gate like every oracled query."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from org_revue_de_presse_trends_spark.catalog import load_table
from org_revue_de_presse_trends_spark.operators import export as X

SF = "/root/testdata/sf0.001"


def _manifest_rows(df, n_shards=4, payload=("text",)):
    return sorted(
        map(
            tuple,
            X.shard_manifest(df, n_shards, "doc_id", list(payload)).collect(),
        )
    )


def test_manifest_is_layout_independent(spark):
    """The whole point: same corpus, any partitioning/row order →
    identical manifest."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    base = _manifest_rows(docs)
    scrambled = _manifest_rows(
        docs.repartition(17, F.col("text")).sortWithinPartitions(
            F.col("doc_id").desc()
        )
    )
    assert base == scrambled
    # every shard non-empty at 500 docs / 4 shards, counts sum to 500
    assert len(base) == 4
    assert sum(r[1] for r in base) == docs.count()


def test_single_row_change_moves_exactly_its_shard(spark):
    """Checksums localize corruption: flipping one row's payload must
    change that row's shard checksum and nothing else."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    mutated = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 7, F.concat(F.col("text"), F.lit("!")))
        .otherwise(F.col("text")),
    )
    a = {r[0]: r for r in _manifest_rows(docs)}
    b = {r[0]: r for r in _manifest_rows(mutated)}
    diff = [s for s in a if a[s] != b[s]]
    assert len(diff) == 1
    s = diff[0]
    assert a[s][1] == b[s][1]  # same row count
    assert a[s][2] + 1 == b[s][2]  # one more char
    assert a[s][3] != b[s][3]  # checksum moved


def test_null_payload_distinct_from_empty_string(spark):
    """concat_ws would silently collapse NULL and '' — the explicit
    sentinel must keep them apart."""
    rows = [(1, None), (2, "")]
    a = spark.createDataFrame(rows, "doc_id long, text string")
    b = spark.createDataFrame([(1, ""), (2, None)], "doc_id long, text string")
    ma = _manifest_rows(a, n_shards=1)
    mb = _manifest_rows(b, n_shards=1)
    assert ma != mb


def test_write_shards_round_trip_reproduces_manifest(spark, tmp_path):
    """Export integrity: the manifest computed from the WRITTEN files
    equals the one computed from the input, and a rerun overwrite is
    manifest-identical."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    path = str(tmp_path / "shards")
    m1 = sorted(
        map(tuple, X.write_shards(docs, path, 4, "doc_id", ["text"]).collect())
    )
    back = spark.read.parquet(path)
    assert sorted(
        map(
            tuple,
            X.shard_manifest(
                back.select("doc_id", "text"), 4, "doc_id", ["text"]
            ).collect(),
        )
    ) == m1
    # written shard dirs agree with the manifest's membership
    got = {
        (r["shard_id"], r["n"])
        for r in back.groupBy("shard_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == {(r[0], r[1]) for r in m1}
    m2 = sorted(
        map(tuple, X.write_shards(docs, path, 4, "doc_id", ["text"]).collect())
    )
    assert m1 == m2


def test_verify_export_flags_only_corrupt_shards(spark, tmp_path):
    """The reader-side check: clean export verifies empty; a corrupted
    shard (and only it) names itself, with a missing shard surfacing
    through the FULL outer join."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    path = str(tmp_path / "shards")
    manifest = X.write_shards(docs, path, 4, "doc_id", ["text"])
    assert (
        X.verify_export(spark, path, manifest, 4, "doc_id", ["text"]).count()
        == 0
    )
    # corrupt: rewrite with one doc's text flipped — exactly one shard
    # must flag, with both sides' checksums present
    mutated = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 7, F.lit("corrupted")).otherwise(
            F.col("text")
        ),
    )
    X.write_shards(mutated, path, 4, "doc_id", ["text"])
    bad = X.verify_export(
        spark, path, manifest, 4, "doc_id", ["text"]
    ).collect()
    assert len(bad) == 1
    assert bad[0]["got_checksum"] != bad[0]["want_checksum"]
    # a manifest expecting a shard the files lack must surface it
    extra = manifest.unionByName(
        spark.createDataFrame(
            [(99, 1, 1, 1)],
            "shard_id long, n_rows long, total_chars long, checksum long",
        )
    )
    flagged = {
        r["shard_id"]
        for r in X.verify_export(
            spark, path, extra, 4, "doc_id", ["text"]
        ).collect()
    }
    assert 99 in flagged


def test_manifest_cross_engine_on_adversarial_strings(spark, duck, tmp_path):
    """The contract gate pins the oracle on fixture ASCII; this pins
    the SAME bit-for-bit cross-engine manifest on the strings the
    canonicalization actually has to survive: unicode (multi-byte,
    astral-plane — char-count AND md5-over-UTF-8 must agree), the
    separator control char inside a payload, empty vs NULL, and a long
    repetitive string."""
    rows = [
        (1, "plain ascii"),
        (2, "accentué déjà vu"),
        (3, "汉字 и кириллица"),
        (4, "astral \U0001f600\U0001f680 plane"),
        (5, "embedded \x1f separator"),
        (6, ""),
        (7, None),
        (8, "x" * 5000),
        (9, "trailing space "),
        (10, "quote ' and \" chars"),
    ]
    p = str(tmp_path / "adv.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(p)
    sdf = X.shard_manifest(
        spark.read.parquet(p), 3, "doc_id", ["text"]
    )
    got = sorted(map(tuple, sdf.collect()))
    oracle = X.manifest_oracle_sql(
        "duckdb", 3, "doc_id", ["text"],
        f"SELECT doc_id, text FROM '{p}/*.parquet'",
    )
    want = sorted(map(tuple, duck.execute(oracle).fetchall()))
    assert got == want
    assert sum(r[1] for r in got) == len(rows)


def test_guards(spark):
    docs = load_table(spark, SF, "documents")
    with pytest.raises(ValueError, match="n_shards"):
        X.shard_manifest(docs, 0, "doc_id", ["text"])
    emb = load_table(spark, SF, "embeddings")
    with pytest.raises(ValueError, match="string/integer"):
        X.shard_manifest(
            emb.withColumn("f", F.lit(1.5)), 2, "vec_id", ["f"]
        )
    # the ID column is checksummed via CAST(...AS STRING) too — a
    # float id hits the same cross-engine formatting trap
    with pytest.raises(ValueError, match="string/integer"):
        X.shard_manifest(
            docs.withColumn("fid", F.lit(1.5)), 2, "fid", ["text"]
        )
