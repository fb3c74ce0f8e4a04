"""CLI end-to-end + multimodal plumbing tests."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row

from fixtures.gen import DEPRECATED_LIST, TARGET_LIST, generate

from org_revue_de_presse_trends_spark.cli import main
from org_revue_de_presse_trends_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_media_features,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def domain_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("cli_domain")
    generate(str(out))
    return str(out)


def test_cli_writes_document_store(spark, domain_dir, tmp_path):
    sink = str(tmp_path / "store")
    rc = main(
        [
            "--publishers-list-id", TARGET_LIST,
            "--deprecated-list-id", DEPRECATED_LIST,
            "--since-date", "2024-03-02",
            "--source-dir", domain_dir,
            "--sink-dir", sink,
        ],
        spark=spark,
    )
    assert rc == 0
    status_dir = os.path.join(
        sink, "highlights", TARGET_LIST, "2024-03-02", "status"
    )
    files = os.listdir(status_dir)
    assert 0 < len(files) <= 10
    rec = json.load(open(os.path.join(status_dir, files[0])))
    assert set(rec) >= {"id", "twitterId", "username", "url",
                        "totalRetweets", "isRetweet"}


def test_cli_distinct_only_and_dry_mode(spark, domain_dir, tmp_path, capsys):
    rc = main(
        [
            "--publishers-list-id", TARGET_LIST,
            "--since-date", "2024-03-02",
            "--source-dir", domain_dir,
            "--distinct-sources-only",
            "--dry-mode",
        ],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "statusFromDistinctSources" in out
    assert "status" in out and "-- variant: status\n" not in out
    assert "Physical Plan" in out


def test_cli_count_log_line(spark, domain_dir, capsys):
    rc = main(
        [
            "--publishers-list-id", TARGET_LIST,
            "--deprecated-list-id", DEPRECATED_LIST,
            "--since-date", "2024-03-02",
            "--source-dir", domain_dir,
            "--dry-mode",
            "--no-quiet",
        ],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "matching highlights on 2024-03-02" in out


@pytest.fixture
def media_df(spark):
    rows = [
        Row(media_id=1, kind="image", payload=bytes(range(256)) * 4,
            meta=Row(mime="image/png", width=16, height=16,
                     duration_ms=None)),
        Row(media_id=2, kind="video", payload=b"\x00\x01" * 500,
            meta=Row(mime="video/mp4", width=64, height=48,
                     duration_ms=3500)),
        Row(media_id=3, kind="audio", payload=b"", meta=None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_media_features_fake_decoder(spark, media_df):
    feats = {r["media_id"]: r for r in
             extract_media_features(media_df).collect()}
    assert feats[1]["n_bytes"] == 1024
    assert abs(feats[1]["byte_mean"] - 127.5) < 1e-9
    assert abs(feats[1]["byte_entropy"] - 8.0) < 1e-9  # uniform bytes
    assert len(feats[1]["feature"]) == 8
    assert feats[3]["n_bytes"] == 0
    # determinism
    again = {r["media_id"]: r for r in
             extract_media_features(media_df).collect()}
    assert feats[1]["content_hash"] == again[1]["content_hash"]


def test_media_stub_decoder_raises(spark, media_df):
    import py4j.protocol
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, py4j.protocol.Py4JJavaError)):
        extract_media_features(media_df, decoder="stub").collect()


def test_video_frame_sampling(spark, media_df):
    frames = sample_video_frames(media_df, every_ms=1000).collect()
    assert {r["media_id"] for r in frames} == {2}
    assert sorted(r["frame_ts_ms"] for r in frames) == [0, 1000, 2000]
    assert len({r["frame_hash"] for r in frames}) >= 1
