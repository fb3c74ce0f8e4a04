"""JSONL ingestion (sources/jsonl.py) — corrupt-record quarantine,
strict mode, and explicit sampled inference."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from org_revue_de_presse_trends_spark.sources.jsonl import (
    infer_jsonl_schema,
    read_jsonl,
    read_jsonl_strict,
    split_corrupt,
)

GOOD = [
    {"doc_id": 1, "text": "alpha beta", "score": 0.5},
    {"doc_id": 2, "text": "gamma", "score": 1.25},
    {"doc_id": 3, "text": "delta epsilon zeta", "score": -0.75},
]
BAD = [
    '{"doc_id": 4, "text": "truncated',  # cut mid-string
    "not json at all",
    '{"doc_id": }',  # syntax error
]
SCHEMA = "doc_id long, text string, score double"


@pytest.fixture
def corpus(tmp_path):
    p = tmp_path / "corpus.jsonl"
    lines = [json.dumps(g) for g in GOOD]
    # interleave damage between good lines
    lines = [lines[0], BAD[0], lines[1], BAD[1], lines[2], BAD[2]]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


class TestQuarantine:
    def test_clean_and_quarantine_partition_the_file(self, spark, corpus):
        clean, quarantine = split_corrupt(
            read_jsonl(spark, corpus, SCHEMA)
        )
        got = {
            r["doc_id"]: (r["text"], r["score"]) for r in clean.collect()
        }
        assert got == {
            g["doc_id"]: (g["text"], g["score"]) for g in GOOD
        }
        assert "_corrupt_record" not in clean.columns
        raw = sorted(r["raw_line"] for r in quarantine.collect())
        assert raw == sorted(BAD)  # byte-preserved audit trail

    def test_all_good_file_has_empty_quarantine(self, spark, tmp_path):
        p = tmp_path / "ok.jsonl"
        p.write_text("\n".join(json.dumps(g) for g in GOOD) + "\n")
        clean, quarantine = split_corrupt(
            read_jsonl(spark, str(p), SCHEMA)
        )
        assert clean.count() == 3
        assert quarantine.count() == 0

    def test_split_requires_corrupt_column(self, spark, corpus):
        df = read_jsonl(spark, corpus, SCHEMA).drop("_corrupt_record")
        with pytest.raises(ValueError, match="_corrupt_record"):
            split_corrupt(df)


class TestStrict:
    def test_failfast_raises_on_damage(self, spark, corpus):
        with pytest.raises(Exception):  # noqa: B017 — Py4J wraps it
            read_jsonl_strict(spark, corpus, SCHEMA).collect()

    def test_failfast_passes_clean_input(self, spark, tmp_path):
        p = tmp_path / "ok.jsonl"
        p.write_text("\n".join(json.dumps(g) for g in GOOD) + "\n")
        assert read_jsonl_strict(spark, str(p), SCHEMA).count() == 3


class TestInference:
    def test_sampled_inference_then_quarantined_read(
        self, spark, tmp_path
    ):
        p = tmp_path / "c.jsonl"
        rows = [
            {"doc_id": i, "text": f"doc {i}", "score": i / 4.0}
            for i in range(40)
        ]
        lines = [json.dumps(r) for r in rows]
        lines.insert(17, '{"doc_id": 999, "text":')  # one bad line
        p.write_text("\n".join(lines) + "\n")
        schema = infer_jsonl_schema(spark, str(p), sampling_ratio=1.0)
        assert {f.name for f in schema.fields} >= {
            "doc_id",
            "text",
            "score",
        }
        clean, quarantine = split_corrupt(
            read_jsonl(spark, str(p), schema)
        )
        assert clean.count() == 40
        assert quarantine.count() == 1

    def test_ratio_validation(self, spark):
        with pytest.raises(ValueError):
            infer_jsonl_schema(spark, "/nonexistent", sampling_ratio=0.0)
