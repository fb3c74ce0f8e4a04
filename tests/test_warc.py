"""WARC/WET ingestion (sources/warc.py): round-trip through the
spec-valid writer, multi-member gzip, HTTP response splitting,
damage quarantine, and the Spark end-to-end including the chained
HTML-extraction convenience."""

from __future__ import annotations

import gzip

import pytest

from org_revue_de_presse_trends_spark.sources import warc as W


def _rec(i: int, rtype: str = "resource", payload: bytes = b"hello") -> tuple:
    return (
        {
            "WARC-Type": rtype,
            "WARC-Record-ID": f"<urn:uuid:{i}>",
            "WARC-Target-URI": f"http://ex.org/{i}",
            "WARC-Date": "2025-01-01T00:00:00Z",
            "Content-Type": "text/plain",
        },
        payload,
    )


def test_roundtrip_plain_and_gzip():
    recs = [_rec(i, payload=f"payload {i}".encode()) for i in range(4)]
    for gz in (False, True):
        data = W.build_warc(recs, gzip_members=gz)
        got = list(W.iter_warc_records(data))
        assert len(got) == 4
        for i, (h, p) in enumerate(got):
            assert h["warc-record-id"] == f"<urn:uuid:{i}>"
            assert p == f"payload {i}".encode()


def test_external_gzip_whole_file():
    # a .warc.gz compressed as ONE member (tools do this too) and by
    # a foreign gzip implementation
    data = gzip.compress(W.build_warc([_rec(1), _rec(2)]))
    assert len(list(W.iter_warc_records(data))) == 2


def test_http_response_split():
    body = "<html><body><p>Sentence one.</p></body></html>".encode()
    payload = W.build_http_response(
        200, {"Content-Type": "text/html; charset=utf-8"}, body
    )
    status, headers, got = W.parse_http_response(payload)
    assert status == 200 and got == body
    assert headers["content-type"].startswith("text/html")


@pytest.mark.parametrize(
    "mutate,err",
    [
        (lambda d: d[: len(d) - 20], "truncated payload"),
        (lambda d: b"GARBAGE\r\n" + d, "expected WARC version"),
        (lambda d: d.replace(b"Content-Length", b"X-Nope"), "Content-Length"),
    ],
)
def test_damage_raises_value_error_only(mutate, err):
    data = mutate(W.build_warc([_rec(1, payload=b"x" * 50)]))
    with pytest.raises(ValueError, match=err):
        list(W.iter_warc_records(data))


def test_damaged_file_keeps_parsed_prefix():
    good = W.build_warc([_rec(1), _rec(2)])
    rows = W._record_rows("f.warc", good + b"WARC/1.0\r\ntrunc")
    assert [r["parse_error"] is None for r in rows] == [True, True, False]
    assert rows[0]["target_uri"] == "http://ex.org/1"


def test_spark_end_to_end(spark, tmp_path):
    html_body = (
        "<html><head><title>T</title></head>"
        "<body><p>Alpha beta.</p><p>Gamma delta!</p></body></html>"
    ).encode()
    wet_text = "already extracted text\nsecond line"
    f1 = [
        (
            {
                "WARC-Type": "response",
                "WARC-Record-ID": "<urn:uuid:a>",
                "WARC-Target-URI": "http://ex.org/a",
                "WARC-Date": "2025-01-01T00:00:00Z",
                "Content-Type": "application/http; msgtype=response",
            },
            W.build_http_response(
                200, {"Content-Type": "text/html"}, html_body
            ),
        ),
        (
            {
                "WARC-Type": "response",
                "WARC-Record-ID": "<urn:uuid:b>",
                "WARC-Target-URI": "http://ex.org/b",
                "WARC-Date": "2025-01-01T00:00:00Z",
                "Content-Type": "application/http; msgtype=response",
            },
            W.build_http_response(404, {"Content-Type": "text/html"}, b"gone"),
        ),
    ]
    f2 = [
        (
            {
                "WARC-Type": "conversion",
                "WARC-Record-ID": "<urn:uuid:c>",
                "WARC-Target-URI": "http://ex.org/c",
                "WARC-Date": "2025-01-02T00:00:00Z",
                "Content-Type": "text/plain",
            },
            wet_text.encode(),
        ),
    ]
    (tmp_path / "a.warc").write_bytes(W.build_warc(f1))
    (tmp_path / "b.warc.gz").write_bytes(W.build_warc(f2, gzip_members=True))
    (tmp_path / "c.warc").write_bytes(b"not a warc at all")

    records = W.read_warc(spark, str(tmp_path))
    rows = {r["record_id"]: r for r in records.collect() if r["record_id"]}
    assert set(rows) == {"<urn:uuid:a>", "<urn:uuid:b>", "<urn:uuid:c>"}
    a = rows["<urn:uuid:a>"]
    assert a["http_status"] == 200
    assert a["content_type"] == "text/html"
    assert bytes(a["payload"]) == html_body
    assert a["payload_text"] == html_body.decode()
    assert rows["<urn:uuid:b>"]["http_status"] == 404
    errs = [r for r in records.collect() if r["parse_error"]]
    assert len(errs) == 1 and errs[0]["path"].endswith("c.warc")

    wet = {r["target_uri"]: r["text"] for r in W.wet_documents(records).collect()}
    assert wet == {"http://ex.org/c": wet_text}

    docs = {
        r["target_uri"]: r["text"]
        for r in W.warc_html_documents(records).collect()
    }
    # 404 excluded; html extracted through functions/htmltext.py
    assert docs == {"http://ex.org/a": "T\nAlpha beta.\nGamma delta!"}


@pytest.mark.parametrize(
    "body,ctype,want",
    [
        ("café".encode("utf-8"), "text/html", "café"),
        ("café".encode("latin-1"), "text/html; charset=ISO-8859-1", "café"),
        # undeclared cp1252 smart quotes (latin-1 would give C1 controls)
        (b"\x93quoted\x94", "text/html", "“quoted”"),
        ("bom".encode("utf-16"), "text/plain", "bom"),  # BOM-prefixed
        (b"\xef\xbb\xbfplain", "text/plain", "plain"),
        # unknown charset name falls through to the ladder
        ("ok".encode(), 'text/html; charset="x-not-a-codec"', "ok"),
        # truly arbitrary bytes still decode (latin-1 total fallback)
        (bytes(range(256)), "text/plain", bytes(range(256)).decode("latin-1")),
    ],
)
def test_decode_text_ladder(body, ctype, want):
    got = W.decode_text(body, ctype)
    if want is not None:
        assert got == want


def test_write_wet_roundtrip_and_determinism(spark, tmp_path):
    """write_wet: the curated corpus goes out as sharded .warc.gz WET
    and re-ingests losslessly; the emitted bytes are deterministic
    across reruns AND input layouts (md5 shard coin + in-shard sort +
    MTIME=0 gzip)."""
    docs = spark.range(57).selectExpr(
        "id AS doc_id",
        "concat('http://ex.org/', id) AS target_uri",
        "'2025-03-01T00:00:00Z' AS warc_date",
        "concat('text body ', id, ' with café — lines\nand more.') AS text",
    )
    out1, out2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    m1 = W.write_wet(docs, out1, n_shards=4)
    m2 = W.write_wet(docs.repartition(7), out2, n_shards=4)
    assert sum(m["n_records"] for m in m1) == 57
    assert [m["shard_id"] for m in m1] == sorted(
        {m["shard_id"] for m in m1}
    )
    # byte-determinism across layout
    import os

    for a, b in zip(m1, m2):
        assert a["n_records"] == b["n_records"]
        ab = open(a["path"], "rb").read()
        bb = open(b["path"], "rb").read()
        assert ab == bb and len(ab) == a["n_bytes"]
    assert sorted(os.listdir(out1)) == sorted(
        f"wet-{m['shard_id']:05d}.warc.gz" for m in m1
    )
    # lossless re-ingestion through the reader
    back = W.wet_documents(W.read_warc(spark, out1))
    got = {r["target_uri"]: r["text"] for r in back.collect()}
    want = {
        r["target_uri"]: r["text"] for r in docs.collect()
    }
    assert got == want


def test_payload_digest_and_dedup(spark, tmp_path):
    """WARC-Payload-Digest rides through the reader and digest_dedup
    keeps exactly the first occurrence per digest, exempting
    digest-less records."""

    def rec(i, digest, date="2025-01-01T00:00:00Z"):
        h = {
            "WARC-Type": "resource",
            "WARC-Record-ID": f"<urn:d{i}>",
            "WARC-Target-URI": f"http://ex.org/{i}",
            "WARC-Date": date,
            "Content-Type": "text/plain",
        }
        if digest:
            h["WARC-Payload-Digest"] = digest
        return (h, f"body {i}".encode())

    recs = [
        rec(0, "sha1:AAA"),
        rec(1, "sha1:AAA", date="2025-01-02T00:00:00Z"),  # later dup
        rec(2, "sha1:BBB"),
        rec(3, None),
        rec(4, None),
    ]
    (tmp_path / "d.warc").write_bytes(W.build_warc(recs))
    records = W.read_warc(spark, str(tmp_path))
    by_id = {r["record_id"]: r for r in records.collect()}
    assert by_id["<urn:d0>"]["payload_digest"] == "sha1:AAA"
    assert by_id["<urn:d3>"]["payload_digest"] is None

    kept = {r["record_id"] for r in W.digest_dedup(records).collect()}
    assert kept == {"<urn:d0>", "<urn:d2>", "<urn:d3>", "<urn:d4>"}


def test_digest_dedup_null_date_still_kept(spark, tmp_path):
    """Review-caught: a digest group whose keeper has no WARC-Date
    must still keep one occurrence (null-unsafe equi-join dropped the
    whole group)."""
    h = {
        "WARC-Type": "resource",
        "WARC-Record-ID": "<urn:nodate>",
        "WARC-Target-URI": "http://ex.org/nd",
        "WARC-Payload-Digest": "sha1:CCC",
        "Content-Type": "text/plain",
    }
    (tmp_path / "nd.warc").write_bytes(W.build_warc([(h, b"x")]))
    records = W.read_warc(spark, str(tmp_path))
    assert records.collect()[0]["warc_date"] is None
    kept = W.digest_dedup(records).collect()
    assert len(kept) == 1 and kept[0]["record_id"] == "<urn:nodate>"


def test_uppercase_content_type_promoted(spark, tmp_path):
    """Media types are case-insensitive (RFC 9110): Text/HTML pages
    must still decode and flow into warc_html_documents."""
    recs = [(
        {
            "WARC-Type": "response",
            "WARC-Record-ID": "<urn:up>",
            "WARC-Target-URI": "http://ex.org/up",
            "WARC-Date": "2025-01-01T00:00:00Z",
            "Content-Type": "application/http; msgtype=response",
        },
        W.build_http_response(
            200, {"Content-Type": "Text/HTML; Charset=UTF-8"},
            b"<p>Upper case type.</p>",
        ),
    )]
    (tmp_path / "u.warc").write_bytes(W.build_warc(recs))
    records = W.read_warc(spark, str(tmp_path))
    row = records.collect()[0]
    assert row["payload_text"] == "<p>Upper case type.</p>"
    docs = W.warc_html_documents(records).collect()
    assert len(docs) == 1 and docs[0]["text"] == "Upper case type."


def test_crawl_stats_wet_only_host_has_zero_ok(spark, tmp_path):
    """Review-caught: an all-conversion (WET) host must report
    n_ok = 0, not NULL."""
    recs = [(
        {
            "WARC-Type": "conversion",
            "WARC-Record-ID": "<urn:w>",
            "WARC-Target-URI": "http://wet-host.net/x",
            "WARC-Date": "2025-01-01T00:00:00Z",
            "Content-Type": "text/plain",
        },
        b"plain text",
    )]
    (tmp_path / "w.warc").write_bytes(W.build_warc(recs))
    row = W.crawl_stats(W.read_warc(spark, str(tmp_path))).collect()[0]
    assert row["n_ok"] == 0 and row["n_records"] == 1


def test_crawl_stats_card(spark, tmp_path):
    recs = [
        (
            {
                "WARC-Type": "response",
                "WARC-Record-ID": f"<urn:s{i}>",
                "WARC-Target-URI": f"http://Site-A.com/p{i}",
                "WARC-Date": "2025-01-01T00:00:00Z",
                "Content-Type": "application/http; msgtype=response",
            },
            W.build_http_response(
                200 if i < 2 else 404,
                {"Content-Type": "text/html; charset=utf-8"},
                b"x" * (10 * (i + 1)),
            ),
        )
        for i in range(3)
    ]
    (tmp_path / "s.warc").write_bytes(W.build_warc(recs))
    (tmp_path / "bad.warc").write_bytes(b"junk not warc")
    stats = {
        r["host"]: r for r in W.crawl_stats(
            W.read_warc(spark, str(tmp_path))
        ).collect()
    }
    a = stats["site-a.com"]
    assert a["n_records"] == 3 and a["n_ok"] == 2 and a["n_html"] == 3
    assert a["payload_bytes"] == 10 + 20 + 30
    # the junk file's error row has no URI: empty host bucket
    assert stats[""]["n_parse_errors"] == 1


def test_roundtrip_fuzz_adversarial_payloads():
    """Hypothesis-free seeded fuzz: payloads containing WARC version
    lines, CRLF soup, gzip magic and arbitrary bytes must round-trip
    exactly — Content-Length discipline means payload content can
    never desync the walker."""
    import random

    rng = random.Random(1138)
    for trial in range(50):
        recs = []
        for i in range(rng.randrange(1, 6)):
            payload = bytes(
                rng.randrange(256) for _ in range(rng.randrange(0, 120))
            )
            if rng.random() < 0.5:  # plant adversarial structure
                payload += rng.choice(
                    [b"\r\nWARC/1.0\r\n", b"\x1f\x8b", b"\r\n\r\n",
                     b"Content-Length: 0\r\n"]
                )
            recs.append(
                (
                    {
                        "WARC-Type": "resource",
                        "WARC-Record-ID": f"<urn:f{trial}-{i}>",
                        "WARC-Target-URI": f"http://f.org/{i}",
                        "Content-Type": "application/octet-stream",
                    },
                    payload,
                )
            )
        gz = rng.random() < 0.5
        data = W.build_warc(recs, gzip_members=gz)
        got = list(W.iter_warc_records(data))
        assert len(got) == len(recs)
        for (h, p), (_, want) in zip(got, recs):
            assert p == want


def test_mutation_fuzz_never_crashes():
    """Seeded mutation fuzz over valid WARC bytes (plain and gzip):
    truncations, bit flips and splices must yield rows (possibly with
    parse_error), NEVER an uncaught exception — the quarantine
    contract under arbitrary damage."""
    import random

    rng = random.Random(4079)
    base_plain = W.build_warc([_rec(i, payload=b"pay" * 9) for i in range(3)])
    base_gz = W.build_warc(
        [_rec(i, payload=b"load" * 7) for i in range(3)], gzip_members=True
    )
    for base in (base_plain, base_gz):
        for trial in range(120):
            data = bytearray(base)
            op = rng.randrange(3)
            if op == 0 and len(data) > 1:  # truncate
                data = data[: rng.randrange(1, len(data))]
            elif op == 1:  # flip bytes
                for _ in range(rng.randrange(1, 6)):
                    data[rng.randrange(len(data))] ^= 1 << rng.randrange(8)
            else:  # splice a chunk elsewhere
                a, b = sorted(rng.randrange(len(data)) for _ in range(2))
                data = data[:a] + data[b:] + data[a:b]
            rows = W._record_rows("fuzz.warc", bytes(data))
            for r in rows:
                assert r["parse_error"] is None or isinstance(
                    r["parse_error"], str
                )


def test_cdx_index_surt_keys(spark, tmp_path):
    """CDX index: SURT urlkeys off the CANONICALIZED url (www/port
    strip, sorted query), compact timestamps, metadata passthrough —
    two noisy crawls of one logical page share a key."""
    def rec(i, uri):
        return (
            {
                "WARC-Type": "response",
                "WARC-Record-ID": f"<urn:c{i}>",
                "WARC-Target-URI": uri,
                "WARC-Date": "2025-03-04T05:06:07Z",
                "WARC-Payload-Digest": f"sha1:D{i}",
                "Content-Type": "application/http; msgtype=response",
            },
            W.build_http_response(
                200, {"Content-Type": "text/html"}, b"<p>Indexed.</p>"
            ),
        )

    recs = [
        rec(0, "http://www.News.Example.com:80/World/Story?b=2&a=1"),
        rec(1, "http://news.example.com/World/Story?a=1&b=2"),
        rec(2, "http://other.org/"),
    ]
    (tmp_path / "c.warc").write_bytes(W.build_warc(recs))
    idx = {
        r["record_id"]: r
        for r in W.cdx_index(W.read_warc(spark, str(tmp_path))).collect()
    }
    assert (
        idx["<urn:c0>"]["urlkey"]
        == idx["<urn:c1>"]["urlkey"]
        == "com,example,news)/world/story?a=1&b=2"
    )
    assert idx["<urn:c2>"]["urlkey"] == "org,other)/"
    assert idx["<urn:c0>"]["ts"] == "20250304050607"
    assert idx["<urn:c0>"]["payload_digest"] == "sha1:D0"
    assert idx["<urn:c0>"]["http_status"] == 200
    assert idx["<urn:c0>"]["payload_length"] == len(b"<p>Indexed.</p>")
