"""``export-tools`` — reader-side CLI for shard exports.

Two subcommands over the `operators/export.py` machinery, closing the
loop the manifest.json sidecar promises:

- ``verify``: recompute the manifest from an export directory and
  diff it against the sidecar — prints one JSON line
  ``{"verified": bool, "mismatched": [...]}`` and exits 0 (clean) /
  1 (mismatch).  Group columns (the CLI's per-(split, shard) rows)
  are detected from the sidecar automatically.
- ``diff``: content diff between two exports, scanning ONLY the
  shards whose manifest row moved (corpus_diff_pruned — partition
  pruning skips unchanged shards entirely).  Prints per-status counts
  and optionally writes the (id, status) delta as parquet.

Usage::

    python -m org_revue_de_presse_trends_spark.export_cli verify \
        --data OUT/documents --manifest OUT/manifest.json
    python -m org_revue_de_presse_trends_spark.export_cli diff \
        --old V1/documents --old-manifest V1/manifest.json \
        --new V2/documents --new-manifest V2/manifest.json \
        [--out delta.parquet]
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession

_MANIFEST_CORE = ("shard_id", "n_rows", "total_chars", "checksum")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="export-tools",
        description="Verify / diff deterministic shard exports",
    )
    p.add_argument("--master", default=None)
    sub = p.add_subparsers(dest="cmd", required=True)
    v = sub.add_parser("verify", help="verify an export against its sidecar")
    v.add_argument("--data", required=True, help="export directory")
    v.add_argument("--manifest", required=True, help="manifest.json sidecar")
    d = sub.add_parser(
        "diff", help="content diff between two exports (manifest-pruned)"
    )
    d.add_argument("--old", required=True)
    d.add_argument("--old-manifest", required=True)
    d.add_argument("--new", required=True)
    d.add_argument("--new-manifest", required=True)
    d.add_argument("--out", default=None,
                   help="optional parquet path for the (id, status) delta")
    return p


def _load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def main(argv: list[str] | None = None,
         spark: SparkSession | None = None) -> int:
    args = build_parser().parse_args(argv)
    own_spark = spark is None
    if own_spark:
        from .session import get_spark

        spark = get_spark(app_name="export-tools", master=args.master)
    try:
        from .operators.export import (
            corpus_diff_pruned,
            merge_manifest_groups,
            read_manifest_json,
            verify_export,
        )

        if args.cmd == "verify":
            doc = _load(args.manifest)
            want = read_manifest_json(spark, args.manifest)
            extra = [c for c in want.columns if c not in _MANIFEST_CORE]
            bad = verify_export(
                spark,
                args.data,
                want,
                int(doc["n_shards"]),
                doc["id_col"],
                list(doc["payload_cols"]),
                extra_group_cols=extra,
            ).collect()
            print(
                json.dumps(
                    {
                        "verified": not bad,
                        "mismatched": [
                            {
                                k: (str(v) if isinstance(v, int)
                                    and abs(v) > (1 << 53) else v)
                                for k, v in r.asDict().items()
                            }
                            for r in bad
                        ],
                    }
                )
            )
            return 0 if not bad else 1

        old_doc = _load(args.old_manifest)
        new_doc = _load(args.new_manifest)
        if (old_doc["id_col"], old_doc["payload_cols"], old_doc["n_shards"]) != (
            new_doc["id_col"], new_doc["payload_cols"], new_doc["n_shards"]
        ):
            print(json.dumps({"error": "manifest layouts differ"}))
            return 2
        # group-split sidecars merge exactly to per-shard rows
        m_old = merge_manifest_groups(
            read_manifest_json(spark, args.old_manifest)
        )
        m_new = merge_manifest_groups(
            read_manifest_json(spark, args.new_manifest)
        )
        delta = corpus_diff_pruned(
            spark,
            args.old,
            args.new,
            m_old,
            m_new,
            old_doc["id_col"],
            list(old_doc["payload_cols"]),
        ).localCheckpoint()
        if args.out:
            delta.write.mode("overwrite").parquet(args.out)
        counts = {
            r["status"]: r["n"]
            for r in delta.groupBy("status").count()
            .withColumnRenamed("count", "n").collect()
        }
        print(
            json.dumps(
                {
                    "added": counts.get("added", 0),
                    "removed": counts.get("removed", 0),
                    "changed": counts.get("changed", 0),
                }
            )
        )
        return 0
    finally:
        if own_spark:
            spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
