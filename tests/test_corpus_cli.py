"""prepare-corpus CLI: the end-to-end curation funnel wired from the
tested operators — e2e on the sf0.001 fixtures."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from org_revue_de_presse_trends_spark.corpus_cli import curate, main

SF = "/root/testdata/sf0.001"


def test_prepare_corpus_e2e_funnel_and_outputs(spark, tmp_path):
    out = str(tmp_path / "corpus")
    rc = main(
        [
            "--source-dir", SF,
            "--out-dir", out,
            "--lsh-threshold", "0.5",
            "--pack-budget", "128",
        ],
        spark=spark,
    )
    assert rc == 0
    funnel = json.load(open(os.path.join(out, "funnel.json")))
    # monotone non-increasing through the filtering stages
    stages = ["input", "gopher_quality", "exact_dedup", "near_dup_dedup"]
    vals = [funnel[s] for s in stages]
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    assert funnel["output"] == vals[-1] > 0
    # split-partitioned outputs exist and re-read to the output count
    docs = spark.read.parquet(os.path.join(out, "documents"))
    assert docs.count() == funnel["output"]
    assert set(
        r["split"] for r in docs.select("split").distinct().collect()
    ) <= {"train", "val", "test"}
    # packed chunks: every chunk has a sequence, budget respected
    packed = spark.read.parquet(os.path.join(out, "packed_chunks"))
    assert funnel["packed_chunks"] == packed.count() > 0
    # budget and split isolation: seq_ids are scoped per split, so a
    # sequence is identified by (split, seq_id) and can never mix
    # train/val/test members
    over = (
        packed.groupBy("split", "seq_id")
        .agg(F.sum("n_tokens").alias("t"), F.count("*").alias("n"))
        .filter((F.col("t") > 128) & (F.col("n") > 1))
        .count()
    )
    assert over == 0, "a multi-chunk sequence exceeds the token budget"


def test_prepare_corpus_classifier_stage(spark, tmp_path):
    """The optional model-based quality filter: train a tiny planted
    model, ship it as the JSON artifact, and verify the CLI stage
    keeps exactly the threshold-passing documents (rank-exact integer
    scoring — the same expressions the oracled AUC query uses)."""
    from org_revue_de_presse_trends_spark.catalog import load_table
    from org_revue_de_presse_trends_spark.operators import (
        classifier as C,
    )

    docs = load_table(spark, SF, "documents")
    # planted model: lang=='en' on the even split (the classifier_ext
    # recipe) — the exact weights don't matter for the stage test,
    # only that scoring + thresholding is reproducible
    w, _ = C.train_logreg(
        docs.filter(F.col("doc_id") % 2 == 0),
        F.col("lang") == "en",
        iters=4,
    )
    wq = C.scaled_weights(w)
    model_path = str(tmp_path / "model.json")
    with open(model_path, "w") as f:
        json.dump({"wq": wq, "dim": 64}, f)
    # threshold at the median score so the gate provably keeps SOME
    # and drops SOME (scores are all-negative for this model — w·x
    # sans bias skews with the minority class)
    scores = sorted(
        r["clf_score"]
        for r in C.with_classifier_score(docs, wq).collect()
    )
    thr = scores[len(scores) // 2]
    out = str(tmp_path / "corpus")
    rc = main(
        [
            "--source-dir", SF,
            "--out-dir", out,
            "--no-gopher",
            "--lsh-threshold", "0",
            "--classifier-model", model_path,
            "--classifier-min-score", str(thr),
        ],
        spark=spark,
    )
    assert rc == 0
    funnel = json.load(open(os.path.join(out, "funnel.json")))
    # expectation computed independently through the operator
    want = (
        C.with_classifier_score(docs, wq)
        .filter(F.col("clf_score") >= thr)
        .count()
    )
    assert funnel["classifier_quality"] == want
    assert 0 < want < funnel["input"]  # the gate actually filtered
    # survivors flow through to the output (exact dedup drops nothing
    # on the duplicate-free fixture)
    assert funnel["output"] == funnel["exact_dedup"]


def test_prepare_corpus_sharded_export_verifies(spark, tmp_path):
    """--shards: the written (split, shard) layout must reproduce the
    manifest.json sidecar when recomputed from the files, and a rerun
    is manifest-identical — the export-integrity loop the operator
    promises, driven through the CLI surface."""
    from org_revue_de_presse_trends_spark.operators.export import (
        read_manifest_json,
        shard_manifest,
        verify_export,
    )

    out = str(tmp_path / "corpus")
    args = ["--source-dir", SF, "--out-dir", out, "--shards", "4"]
    assert main(args, spark=spark) == 0
    man = json.load(open(os.path.join(out, "manifest.json")))
    assert man["n_shards"] == 4
    # checksum/total_chars are decimal STRINGS in the sidecar (values
    # reach 2^61-1, past JS's 2^53 safe-integer range)
    assert all(
        isinstance(s["checksum"], str) and isinstance(s["total_chars"], str)
        for s in man["shards"]
    )
    docs = spark.read.parquet(os.path.join(out, "documents"))
    got = sorted(
        (r["split"], r["shard_id"], r["n_rows"], r["total_chars"],
         r["checksum"])
        for r in shard_manifest(
            docs.select("split", "doc_id", "text"), 4, "doc_id",
            ["text"], extra_group_cols=["split"],
        ).collect()
    )
    want = sorted(
        (s["split"], s["shard_id"], s["n_rows"], int(s["total_chars"]),
         int(s["checksum"]))
        for s in man["shards"]
    )
    assert got == want and len(want) > 0
    # the physical shard dirs agree with the manifest membership
    counts = {
        (r["split"], r["shard_id"]): r["n"]
        for r in docs.groupBy("split", "shard_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert counts == {(s, sh): n for s, sh, n, _c, _k in want}
    funnel = json.load(open(os.path.join(out, "funnel.json")))
    assert funnel["manifest_shards"] == len(want)
    assert sum(n for _s, _sh, n, _c, _k in want) == funnel["output"]
    # the DOCUMENTED reader-side loop composes end-to-end: load the
    # split-grouped sidecar and verify the split-partitioned export
    # (r10 advice: joining it on shard_id alone flagged every shard)
    loaded = read_manifest_json(spark, os.path.join(out, "manifest.json"))
    assert (
        verify_export(
            spark, os.path.join(out, "documents"), loaded, 4,
            "doc_id", ["text"], extra_group_cols=["split"],
        ).count()
        == 0
    )
    # rerun: overwrite in place, manifest byte-identical
    assert main(args, spark=spark) == 0
    assert json.load(open(os.path.join(out, "manifest.json"))) == man


def test_prepare_corpus_rerun_is_deterministic(spark, tmp_path):
    from org_revue_de_presse_trends_spark.catalog import load_table

    docs = load_table(spark, SF, "documents")
    a, fa = curate(spark, docs, lsh_threshold=0.5)
    b, fb = curate(spark, docs, lsh_threshold=0.5)
    assert fa == fb
    sa = sorted((r["doc_id"], r["split"]) for r in a.collect())
    sb = sorted((r["doc_id"], r["split"]) for r in b.collect())
    assert sa == sb


def test_prepare_corpus_span_decontamination_rewrites_text(spark, tmp_path):
    """spans mode: contaminated docs survive with the matched windows
    cut; drop mode removes them entirely."""
    from org_revue_de_presse_trends_spark.catalog import load_table

    docs = load_table(spark, SF, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    dropped, fd = curate(
        spark, docs, gopher=False, lsh_threshold=0.0,
        benchmark=bench, decontaminate_mode="drop",
    )
    spans, fs = curate(
        spark, docs, gopher=False, lsh_threshold=0.0,
        benchmark=bench, decontaminate_mode="spans",
    )
    # drop mode loses every benchmark-matching doc; spans mode keeps
    # survivors whose non-matched text is non-empty, so it keeps >= drop
    assert fs["decontaminated"] >= fd["decontaminated"]
    # no surviving doc in spans mode still contains a benchmark text
    bench_texts = {r["text"] for r in bench.collect()}
    for r in spans.select("text").collect():
        assert all(bt not in r["text"] for bt in bench_texts)


def test_quality_gate_passes_and_reports(spark, tmp_path):
    out = str(tmp_path / "corpus")
    rc = main(
        [
            "--source-dir", SF,
            "--out-dir", out,
            "--lsh-threshold", "0",
            "--no-gopher",
            "--quality-gate",
        ],
        spark=spark,
    )
    assert rc == 0
    funnel = json.load(open(os.path.join(out, "funnel.json")))
    rep = {
        (r["constraint"], r["column"]): r["passed"]
        for r in funnel["quality_report"]
    }
    assert all(rep.values())
    assert ("uniqueness>=1.0", "doc_id") in rep


def test_quality_gate_aborts_on_violation(spark, tmp_path, capsys):
    # corrupt copy: duplicate every doc_id -> uniqueness fails
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "bad_src")
    os.makedirs(src)
    pdf = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    doubled = pa.Table.from_pandas(
        __import__("pandas").concat([pdf, pdf], ignore_index=True)
    )
    # single parquet FILE, matching the fixture layout load_table reads
    pq.write_table(doubled, f"{src}/documents.parquet")
    out = str(tmp_path / "corpus_bad")
    rc = main(
        ["--source-dir", src, "--out-dir", out, "--quality-gate"],
        spark=spark,
    )
    assert rc == 2
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["gate"] == "FAILED"
    failed = [
        r for r in payload["quality_report"] if not r["passed"]
    ]
    assert any(r["constraint"].startswith("uniqueness") for r in failed)
    assert not os.path.exists(out)  # nothing written past the gate


def test_prepare_corpus_from_warc(spark, tmp_path):
    """--warc-dir: raw WARC files through extraction, C4 line filter,
    corpus-wide line dedup and into the standard funnel — the full
    web front door as one command."""
    from org_revue_de_presse_trends_spark.sources import warc as W

    boiler = "Subscribe to our newsletter for updates."

    def page(host, slug, n=6, extra=""):
        lines = "".join(
            f"<p>Page {slug} body line {i} has plenty of words.</p>"
            for i in range(n)
        )
        html = (
            f"<html><head><title>{slug}</title></head><body>"
            f"{lines}<p>{boiler}</p>{extra}</body></html>"
        )
        return (
            {
                "WARC-Type": "response",
                "WARC-Record-ID": f"<urn:{slug}>",
                "WARC-Target-URI": f"http://www.{host}/{slug}",
                "WARC-Date": "2025-02-01T00:00:00Z",
                "Content-Type": "application/http; msgtype=response",
            },
            W.build_http_response(
                200, {"Content-Type": "text/html; charset=utf-8"},
                html.encode(),
            ),
        )

    recs = [
        (
            {
                "WARC-Type": "response",
                "WARC-Record-ID": "<urn:robots-a>",
                "WARC-Target-URI": "http://www.alpha-site.com/robots.txt",
                "WARC-Date": "2025-02-01T00:00:00Z",
                "Content-Type": "application/http; msgtype=response",
            },
            W.build_http_response(
                200, {"Content-Type": "text/plain"},
                b"User-agent: *\nDisallow: /a1\n",
            ),
        )
    ]
    recs += [page("alpha-site.com", f"a{i}") for i in range(3)]
    recs += [page("beta-site.org", f"b{i}") for i in range(3)]
    recs.append(page("alpha-site.com", "spam",
                     extra="<p>Filler lorem ipsum text sits here.</p>"))
    recs.append(
        (
            {
                "WARC-Type": "response",
                "WARC-Record-ID": "<urn:gone>",
                "WARC-Target-URI": "http://www.alpha-site.com/gone",
                "WARC-Date": "2025-02-01T00:00:00Z",
                "Content-Type": "application/http; msgtype=response",
            },
            W.build_http_response(
                404, {"Content-Type": "text/html"}, b"nope"
            ),
        )
    )
    recs.append(
        (
            {
                "WARC-Type": "conversion",
                "WARC-Record-ID": "<urn:wet>",
                "WARC-Target-URI": "http://gamma-site.net/wet",
                "WARC-Date": "2025-02-02T00:00:00Z",
                "Content-Type": "text/plain",
            },
            "\n".join(
                f"Wet text line {i} is here to stay." for i in range(6)
            ).encode(),
        )
    )
    warc_dir = tmp_path / "crawl"
    warc_dir.mkdir()
    (warc_dir / "seg0.warc").write_bytes(W.build_warc(recs[:5]))
    (warc_dir / "seg1.warc.gz").write_bytes(
        W.build_warc(recs[5:], gzip_members=True)
    )

    out = str(tmp_path / "corpus")
    rc = main(
        [
            "--warc-dir", str(warc_dir),
            "--web-robots-filter",
            "--web-c4-filter",
            "--web-line-dedup",
            "--out-dir", out,
            "--no-gopher",
            "--lsh-threshold", "0",
            "--wet-shards", "2",
        ],
        spark=spark,
    )
    assert rc == 0
    funnel = json.load(open(os.path.join(out, "funnel.json")))
    assert funnel["warc_records"] == 10
    assert funnel["warc_parse_errors"] == 0
    # 404 and the text/plain robots.txt excluded; 7 html pages + 1 wet
    assert funnel["web_documents"] == 8
    # /a1 is robots-disallowed on alpha-site.com
    assert funnel["robots_allowed"] == 7
    # the lorem-ipsum page fails the C4 page rules
    assert funnel["c4_pages_kept"] == 6
    # the boilerplate line survives exactly once: dropped from the
    # 4 other surviving html pages (a1 robots-dropped, spam C4-dropped)
    assert funnel["line_dedup_lines_dropped"] == 4
    assert funnel["input"] == 6 and funnel["output"] == 6

    docs = spark.read.parquet(os.path.join(out, "documents"))
    rows = docs.collect()
    assert len(rows) == 6
    assert not any("a1" in r["target_uri"] for r in rows)
    # registrable domains became the source column (www stripped)
    assert {r["source"] for r in rows} == {
        "alpha-site.com", "beta-site.org", "gamma-site.net"
    }
    all_text = "\n".join(r["text"] for r in rows)
    assert all_text.count(boiler) == 1
    assert "lorem" not in all_text
    # titles are not terminal-punctuated: C4 dropped them
    assert "a0\n" not in all_text
    # WET re-export: the curated corpus round-trips through the reader
    from org_revue_de_presse_trends_spark.sources.warc import (
        read_warc,
        wet_documents,
    )

    assert funnel["wet_shards"] == 2
    wet_manifest = json.load(open(os.path.join(out, "wet_manifest.json")))
    assert sum(m["n_records"] for m in wet_manifest) == 6
    back = wet_documents(read_warc(spark, os.path.join(out, "wet")))
    assert sorted(r["text"] for r in back.collect()) == sorted(
        r["text"] for r in rows
    )


def test_prepare_corpus_requires_exactly_one_input(spark, tmp_path, capsys):
    out = str(tmp_path / "x")
    assert main(["--out-dir", out], spark=spark) == 2
    assert (
        main(
            ["--source-dir", SF, "--warc-dir", "/tmp/nope",
             "--out-dir", out],
            spark=spark,
        )
        == 2
    )
