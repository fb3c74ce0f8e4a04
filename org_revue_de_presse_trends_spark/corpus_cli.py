"""``prepare-corpus`` — the end-to-end training-corpus curation CLI.

One command from a raw ``documents.parquet`` — or, with ``--warc-dir``,
straight from raw WARC/WET crawl files (record walk → HTML→text
extraction → optional C4 line rules → optional corpus-wide line
dedup, the web front door) — to curated, split, optionally packed
training data, wired entirely from the tested operators:

    quality rules (Gopher) → model-based quality filter (optional:
    a shipped hashed-BoW classifier artifact, rank-exact integer
    scoring) → exact dedup → near-dup dedup (MinHash LSH + connected
    components) → benchmark decontamination (drop or span-removal) →
    deterministic train/val/test split → chunk + pack (optional) →
    split-partitioned parquet + a per-stage funnel report.

Every stage is the same code the driver queries exercise
(plans.analytics_ext.gopher_rule_flags, operators.dedup,
operators.decontaminate, operators.splits, operators.packing), so the
CLI adds orchestration only — no new semantics.  The funnel report
(one JSON line on stdout, also written next to the output) records
per-stage survivor counts: the audit a pipeline operator reads before
trusting a corpus.

Scale shape: stages are the operators' own (broadcast probes, banded
equi-joins, hash-coin filters); the CLI materializes only the bounded
funnel counters on the driver.

Usage::

    python -m org_revue_de_presse_trends_spark.corpus_cli \
        --source-dir /root/testdata/sf0.001 --out-dir /tmp/corpus \
        [--benchmark-parquet eval.parquet --decontaminate-mode spans] \
        [--lsh-threshold 0.5] [--no-gopher] [--pack-budget 512] \
        [--shards 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="prepare-corpus",
        description="Curate a documents corpus into training data",
    )
    p.add_argument("--source-dir", default=None,
                   help="directory containing documents.parquet "
                   "(exactly one of --source-dir / --warc-dir)")
    p.add_argument("--warc-dir", default=None,
                   help="ingest raw WARC/WET files instead "
                   "(sources/warc.py): response records go through "
                   "HTML->text extraction (functions/htmltext.py), "
                   "conversion (WET) records are taken as-is; doc_id "
                   "is a deterministic content hash, source is the "
                   "PSL registrable domain of the target URI")
    p.add_argument("--web-robots-filter", action="store_true",
                   help="with --warc-dir: parse the crawl's own "
                   "/robots.txt responses (operators/robots.py, RFC "
                   "9309 groups + longest-prefix verdicts) and drop "
                   "pages a polite crawler for --web-robots-agent "
                   "would not have fetched")
    p.add_argument("--web-robots-agent", default="*",
                   help="user-agent token for --web-robots-filter")
    p.add_argument("--web-c4-filter", action="store_true",
                   help="with --warc-dir: apply the C4 line-level "
                   "heuristics (functions/c4lines.py) — pages failing "
                   "the page rules are dropped, surviving pages keep "
                   "only their surviving lines")
    p.add_argument("--web-line-dedup", action="store_true",
                   help="with --warc-dir: corpus-wide keep-first line "
                   "dedup (operators/linededup.py) before the funnel")
    p.add_argument("--out-dir", required=True,
                   help="output root (created; split-partitioned docs, "
                   "optional packed chunks, funnel.json)")
    p.add_argument("--no-gopher", action="store_true",
                   help="skip the Gopher rule-set quality filter")
    p.add_argument("--classifier-model", default=None,
                   help="JSON model artifact {\"wq\": [ints], \"dim\": N,"
                   " \"bq\": int} — write it with json.dump("
                   "operators/classifier.model_artifact(w, b, dim)) "
                   "from train_logreg output (bq optional, defaults 0)"
                   " — adds a model-based quality filter after the "
                   "rule gate (the CCNet/GPT-3 classifier step)")
    p.add_argument("--classifier-min-score", type=float, default=0.0,
                   help="keep documents with rank-exact classifier "
                   "score >= this.  Score scale: 1e9 x the logistic-"
                   "regression LOGIT when the artifact carries bq "
                   "(a sigmoid-probability cut p is 1e9*ln(p/(1-p))); "
                   "without bq it is 1e9 x logit-minus-intercept "
                   "(same ranking, shifted scale; used only with "
                   "--classifier-model)")
    p.add_argument("--lsh-threshold", type=float, default=0.5,
                   help="MinHash-LSH near-dup similarity threshold "
                   "(0 disables near-dup dedup)")
    p.add_argument("--benchmark-parquet", default=None,
                   help="eval-set parquet (bench_id/text or "
                   "doc_id/text) to decontaminate against")
    p.add_argument("--decontaminate-mode", choices=("drop", "spans"),
                   default="drop",
                   help="drop contaminated docs, or cut only the "
                   "matched spans (GPT-3 removal step)")
    p.add_argument("--split-weights", default="train:0.9,val:0.05,test:0.05",
                   help="name:weight comma list, weights sum to 1")
    p.add_argument("--split-seed", type=int, default=7)
    p.add_argument("--pack-budget", type=int, default=0,
                   help="token budget per packed sequence "
                   "(0 disables chunk+pack)")
    p.add_argument("--chunk-size", type=int, default=50)
    p.add_argument("--chunk-overlap", type=int, default=10)
    p.add_argument("--shards", type=int, default=0,
                   help="also partition the curated documents into N "
                   "deterministic hash shards per split (layout-"
                   "independent md5 assignment) and write "
                   "manifest.json with per-(split, shard) row counts "
                   "and order-independent content checksums "
                   "(operators/export.py) — the sidecar a downstream "
                   "reader verifies the export against: "
                   "export.read_manifest_json + export.verify_export("
                   "..., extra_group_cols=['split']).  checksum/"
                   "total_chars are serialized as decimal STRINGS "
                   "(values reach 2^61-1, past JS's 2^53 safe-integer "
                   "range) (0 disables)")
    p.add_argument("--wet-shards", type=int, default=0,
                   help="also export the curated documents as N "
                   "deterministic sharded .warc.gz WET files under "
                   "out-dir/wet + wet_manifest.json (sources/warc."
                   "write_wet: byte-deterministic across layouts; "
                   "target URIs synthesized as urn:doc:{id} when the "
                   "corpus has none) — the interchange format another "
                   "pipeline re-ingests with --warc-dir (0 disables)")
    p.add_argument("--quality-gate", action="store_true",
                   help="run the declarative constraint suite "
                   "(operators/checks.py) on the INPUT before any "
                   "curation; a failed constraint aborts with exit "
                   "code 2 and prints the report — nothing is written")
    p.add_argument("--master", default=None)
    return p


def _parse_weights(spec: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for part in spec.split(","):
        name, w = part.split(":")
        out[name.strip()] = float(w)
    return out


def curate(
    spark: SparkSession,
    docs: DataFrame,
    *,
    gopher: bool = True,
    classifier_model: dict | None = None,
    classifier_min_score: float = 0.0,
    lsh_threshold: float = 0.5,
    benchmark: DataFrame | None = None,
    decontaminate_mode: str = "drop",
    split_weights: dict[str, float] | None = None,
    split_seed: int = 7,
) -> tuple[DataFrame, dict[str, int]]:
    """Run the curation funnel; returns (curated docs with ``split``
    column, per-stage survivor counts).

    Each filtering stage is ``localCheckpoint``'d before its funnel
    count: the count doubles as the one materialization, so downstream
    stages (and the final writes) read the checkpointed survivors
    instead of re-executing the whole prefix — without it the
    LSH + connected-components stage alone re-ran ~5× across counts
    and writes (review finding)."""
    from .operators import dedup as D
    from .operators.splits import assign_split
    from .plans.analytics_ext import gopher_rule_flags

    funnel: dict[str, int] = {"input": docs.count()}
    cur = docs

    if gopher:
        passing = gopher_rule_flags(cur).filter(F.col("pass_gopher"))
        cur = cur.join(
            passing.select("doc_id"), "doc_id", "left_semi"
        ).localCheckpoint()
        funnel["gopher_quality"] = cur.count()

    if classifier_model is not None:
        # model-based quality filter (the CCNet/GPT-3 classifier
        # step): score with the shipped artifact's integer weights —
        # rank-exact, libm-free — and keep above the threshold.
        # Unscorable docs (no non-empty token) have NULL score and
        # are dropped, like every other gate.
        from .operators.classifier import with_classifier_score

        cur = (
            with_classifier_score(
                cur,
                [int(x) for x in classifier_model["wq"]],
                dim=int(classifier_model.get("dim", 64)),
                bq=int(classifier_model.get("bq", 0)),
            )
            .filter(F.col("clf_score") >= float(classifier_min_score))
            .drop("clf_score")
            .localCheckpoint()
        )
        funnel["classifier_quality"] = cur.count()

    exact = D.dedup_exact(cur)
    cur = cur.join(
        exact.select(F.col("keep_id").alias("doc_id")), "doc_id",
        "left_semi",
    ).localCheckpoint()
    funnel["exact_dedup"] = cur.count()

    if lsh_threshold > 0:
        pairs = D.minhash_lsh_pairs(cur, threshold=lsh_threshold)
        verdicts = D.dedup_assignments(cur, pairs)
        keep = verdicts.filter(F.col("keep")).select(
            F.col("id").alias("doc_id")
        )
        cur = cur.join(keep, "doc_id", "left_semi").localCheckpoint()
        funnel["near_dup_dedup"] = cur.count()

    if benchmark is not None:
        from .operators import decontaminate as DC

        if decontaminate_mode == "drop":
            cur = DC.decontaminate(cur, benchmark)
        else:
            cleaned = DC.remove_contaminated_spans(cur, benchmark)
            cur = (
                cur.drop("text")
                .join(
                    cleaned.select(
                        "doc_id", F.col("text_clean").alias("text")
                    ),
                    "doc_id",
                )
                .filter(F.length("text") > 0)
            )
        cur = cur.localCheckpoint()
        funnel["decontaminated"] = cur.count()

    weights = split_weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    cur = assign_split(cur, weights, seed=split_seed)
    # split assignment drops nothing: output == last surviving count
    funnel["output"] = list(funnel.values())[-1]
    return cur, funnel


def ingest_web(
    spark: SparkSession,
    warc_dir: str,
    *,
    robots_filter: bool = False,
    robots_user_agent: str = "*",
    c4_filter: bool = False,
    line_dedup: bool = False,
) -> tuple[DataFrame, dict[str, int]]:
    """WARC/WET → curation-ready documents frame + web-stage funnel
    counts.  Orchestration only — every stage is a tested operator:
    sources/warc (record walk, HTTP split, charset ladder),
    functions/htmltext (extraction), operators/urls+psl (registrable
    domain as the ``source`` column), operators/robots (the crawl's
    own /robots.txt responses → longest-prefix verdicts, when
    ``robots_filter``), functions/c4lines, operators/linededup.

    doc_id is ``xxhash64(target_uri, warc_date, text)`` — a
    deterministic content hash, so byte-identical re-fetches collapse
    via the exact-duplicate drop here and near-identical ones are the
    dedup funnel's job downstream."""
    from .functions.c4lines import with_c4_lines
    from .operators.linededup import remove_duplicate_lines
    from .operators.urls import with_canonical_url
    from .sources.warc import read_warc, warc_html_documents, wet_documents

    records = read_warc(spark, warc_dir).localCheckpoint()
    funnel: dict[str, int] = {
        "warc_records": records.count(),
        "warc_parse_errors": records.where(
            F.col("parse_error").isNotNull()
        ).count(),
    }
    web = warc_html_documents(records).unionByName(wet_documents(records))
    docs = (
        with_canonical_url(
            web.withColumn("url", F.col("target_uri")), "url"
        )
        .select(
            F.xxhash64("target_uri", "warc_date", "text").alias("doc_id"),
            F.col("registrable_domain"),
            "canonical_path",
            "target_uri",
            "warc_date",
            "text",
        )
        .dropDuplicates(["doc_id"])
        .localCheckpoint()
    )
    funnel["web_documents"] = docs.count()
    if robots_filter:
        from .operators.robots import robots_rules_from_records
        from .operators.urls import robots_verdicts

        rules = robots_rules_from_records(
            records, robots_user_agent
        ).localCheckpoint()
        allowed = robots_verdicts(docs, rules, ["doc_id"]).where(
            F.col("allowed")
        )
        docs = docs.join(
            allowed.select("doc_id"), "doc_id", "left_semi"
        ).localCheckpoint()
        funnel["robots_allowed"] = docs.count()
    docs = docs.drop("canonical_path").withColumnRenamed(
        "registrable_domain", "source"
    )
    if c4_filter:
        filtered = with_c4_lines(docs)
        docs = (
            filtered.where(F.col("page_kept"))
            .select(
                "doc_id", "source", "target_uri", "warc_date",
                F.col("text_c4").alias("text"),
            )
            .localCheckpoint()
        )
        funnel["c4_pages_kept"] = docs.count()
    if line_dedup:
        ded = remove_duplicate_lines(docs, min_chars=10)
        docs = (
            docs.drop("text")
            .join(
                ded.select(
                    "doc_id",
                    F.col("text_line_deduped").alias("text"),
                    "n_dropped",
                ),
                "doc_id",
            )
            .localCheckpoint()
        )
        funnel["line_dedup_lines_dropped"] = (
            docs.agg(F.sum("n_dropped")).collect()[0][0] or 0
        )
        docs = docs.drop("n_dropped")
    return docs, funnel


def main(argv: list[str] | None = None,
         spark: SparkSession | None = None) -> int:
    args = build_parser().parse_args(argv)
    if bool(args.source_dir) == bool(args.warc_dir):
        print(
            "exactly one of --source-dir / --warc-dir is required",
            file=sys.stderr,
        )
        return 2
    own_spark = spark is None
    if own_spark:
        from .session import get_spark

        spark = get_spark(app_name="prepare-corpus", master=args.master)
    try:
        from .catalog import load_table
        from .functions import text as T
        from .operators.packing import pack_sequences

        web_funnel: dict[str, int] = {}
        if args.warc_dir:
            docs, web_funnel = ingest_web(
                spark,
                args.warc_dir,
                robots_filter=args.web_robots_filter,
                robots_user_agent=args.web_robots_agent,
                c4_filter=args.web_c4_filter,
                line_dedup=args.web_line_dedup,
            )
        else:
            docs = load_table(spark, args.source_dir, "documents")
        quality = None
        if args.quality_gate:
            from .operators.checks import (
                completeness,
                non_empty,
                quality_report,
                uniqueness,
            )

            quality = [
                r.asDict()
                for r in quality_report(
                    docs,
                    [
                        completeness("doc_id"),
                        completeness("text"),
                        uniqueness(["doc_id"]),
                        non_empty(),
                    ],
                ).collect()
            ]
            if not all(r["passed"] for r in quality):
                print(
                    json.dumps(
                        {"gate": "FAILED", "quality_report": quality}
                    )
                )
                return 2
        benchmark = None
        if args.benchmark_parquet:
            raw = spark.read.parquet(args.benchmark_parquet)
            bid = "bench_id" if "bench_id" in raw.columns else "doc_id"
            benchmark = raw.select(
                F.col(bid).alias("bench_id"), "text"
            )
        model = None
        if args.classifier_model:
            with open(args.classifier_model) as f:
                model = json.load(f)
        curated, funnel = curate(
            spark,
            docs,
            gopher=not args.no_gopher,
            classifier_model=model,
            classifier_min_score=args.classifier_min_score,
            lsh_threshold=args.lsh_threshold,
            benchmark=benchmark,
            decontaminate_mode=args.decontaminate_mode,
            split_weights=_parse_weights(args.split_weights),
            split_seed=args.split_seed,
        )
        if web_funnel:
            # web ingest stages lead the report (they precede "input")
            funnel = {**web_funnel, **funnel}
        os.makedirs(args.out_dir, exist_ok=True)
        docs_out = os.path.join(args.out_dir, "documents")
        if args.shards > 0:
            from .operators.export import (
                manifest_to_json_dict,
                repartition_for_shards,
                shard_id_sql,
                shard_manifest,
            )

            # deterministic hash shards nested under the split dirs,
            # plus the order-independent checksum manifest a reader
            # verifies the export against (operators/export.py:
            # read_manifest_json + verify_export(extra_group_cols=
            # ['split']))
            manifest = shard_manifest(
                curated.select("split", "doc_id", "text"),
                args.shards,
                "doc_id",
                ["text"],
                extra_group_cols=["split"],
            ).collect()
            sharded = curated.selectExpr(
                "*",
                f"{shard_id_sql('spark', 'doc_id', args.shards)}"
                " AS shard_id",
            )
            (
                repartition_for_shards(sharded, args.shards)
                .write.mode("overwrite")
                .partitionBy("split", "shard_id")
                .parquet(docs_out)
            )
            with open(
                os.path.join(args.out_dir, "manifest.json"), "w"
            ) as f:
                json.dump(
                    manifest_to_json_dict(
                        manifest, args.shards, "doc_id", ["text"]
                    ),
                    f,
                    indent=1,
                )
            funnel["manifest_shards"] = len(manifest)
        else:
            curated.write.mode("overwrite").partitionBy("split").parquet(
                docs_out
            )
        if args.pack_budget > 0:
            staged = curated.withColumn("__toks", T.tokens(F.col("text")))
            chunks = staged.select(
                "doc_id",
                "split",
                F.explode(
                    T.chunks_from_tokens(
                        F.col("__toks"),
                        size=args.chunk_size,
                        overlap=args.chunk_overlap,
                    )
                ).alias("c"),
            ).select(
                "doc_id", "split", F.col("c.chunk_id").alias("chunk_id"),
                F.col("c.chunk").alias("chunk"),
                F.col("c.n_tokens").alias("n_tokens"),
            )
            # pack PER SPLIT: a sequence must never mix train/val/test
            # chunks (review finding — cross-split members would break
            # both isolation and the partitioned layout); seq_ids are
            # scoped per split, matching the split-partitioned output
            chunks = chunks.localCheckpoint()
            split_names = [
                r["split"]
                for r in chunks.select("split").distinct().collect()
            ]
            parts = []
            for s in sorted(split_names):
                part = chunks.filter(F.col("split") == s)
                packed = pack_sequences(
                    part.select("doc_id", "chunk_id", "n_tokens"),
                    budget=args.pack_budget,
                )
                parts.append(
                    part.join(
                        packed.select("doc_id", "chunk_id", "seq_id"),
                        ["doc_id", "chunk_id"],
                    )
                )
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            out.write.mode("overwrite").partitionBy("split").parquet(
                os.path.join(args.out_dir, "packed_chunks")
            )
            funnel["packed_chunks"] = out.count()
        if args.wet_shards > 0:
            from .sources.warc import write_wet

            wet_base = curated
            if "target_uri" not in wet_base.columns:
                wet_base = wet_base.withColumn(
                    "target_uri",
                    F.concat(F.lit("urn:doc:"), F.col("doc_id")),
                )
            if "warc_date" not in wet_base.columns:
                wet_base = wet_base.withColumn("warc_date", F.lit(""))
            wet_manifest = write_wet(
                wet_base.select(
                    "doc_id", "target_uri", "warc_date", "text"
                ),
                os.path.join(args.out_dir, "wet"),
                n_shards=args.wet_shards,
            )
            with open(
                os.path.join(args.out_dir, "wet_manifest.json"), "w"
            ) as f:
                json.dump(wet_manifest, f, indent=1)
            funnel["wet_shards"] = len(wet_manifest)
        if quality is not None:
            funnel["quality_report"] = quality
        report = json.dumps(funnel)
        with open(os.path.join(args.out_dir, "funnel.json"), "w") as f:
            f.write(report + "\n")
        print(report)
        return 0
    finally:
        if own_spark:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
