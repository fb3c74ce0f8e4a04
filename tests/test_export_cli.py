"""export-tools CLI (export_cli.py): the documented reader-side loop
driven end-to-end through the command surface — verify against the
prepare-corpus sidecar (clean + corrupted), and the manifest-pruned
diff between two exports."""
from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from org_revue_de_presse_trends_spark.catalog import load_table
from org_revue_de_presse_trends_spark.corpus_cli import main as corpus_main
from org_revue_de_presse_trends_spark.export_cli import main as export_main
from org_revue_de_presse_trends_spark.operators import export as X

SF = "/root/testdata/sf0.001"


def test_verify_subcommand_clean_and_corrupt(spark, tmp_path, capsys):
    out = str(tmp_path / "corpus")
    assert corpus_main(
        ["--source-dir", SF, "--out-dir", out, "--shards", "4"],
        spark=spark,
    ) == 0
    capsys.readouterr()
    data = os.path.join(out, "documents")
    manifest = os.path.join(out, "manifest.json")
    rc = export_main(
        ["verify", "--data", data, "--manifest", manifest], spark=spark
    )
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and rep["verified"] and rep["mismatched"] == []
    # corrupt: delete one shard file -> exit 1, that (split, shard)
    # names itself
    victim = sorted(glob.glob(f"{data}/split=*/shard_id=*/part-*.parquet"))[0]
    os.remove(victim)
    rc = export_main(
        ["verify", "--data", data, "--manifest", manifest], spark=spark
    )
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and not rep["verified"]
    assert len(rep["mismatched"]) >= 1
    flagged = {(m["split"], m["shard_id"]) for m in rep["mismatched"]}
    import re

    m = re.search(r"split=([^/]+)/shard_id=(\d+)/", victim)
    assert (m.group(1), int(m.group(2))) in flagged


def test_diff_subcommand_counts_and_out(spark, tmp_path, capsys):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    new = (
        docs.filter(F.col("doc_id") != 7)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") == 11, F.concat(F.col("text"), F.lit("!"))
            ).otherwise(F.col("text")),
        )
        .unionByName(
            spark.createDataFrame(
                [(9001, "brand new doc")], "doc_id long, text string"
            )
        )
    )
    p_old, p_new = str(tmp_path / "v1"), str(tmp_path / "v2")
    m_old = X.write_shards(docs, p_old, 8, "doc_id", ["text"]).collect()
    m_new = X.write_shards(new, p_new, 8, "doc_id", ["text"]).collect()
    for rows, path in ((m_old, "m1.json"), (m_new, "m2.json")):
        with open(tmp_path / path, "w") as f:
            json.dump(
                X.manifest_to_json_dict(rows, 8, "doc_id", ["text"]), f
            )
    out = str(tmp_path / "delta.parquet")
    rc = export_main(
        [
            "diff",
            "--old", p_old, "--old-manifest", str(tmp_path / "m1.json"),
            "--new", p_new, "--new-manifest", str(tmp_path / "m2.json"),
            "--out", out,
        ],
        spark=spark,
    )
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert rep == {"added": 1, "removed": 1, "changed": 1}
    delta = {
        r["doc_id"]: r["status"] for r in spark.read.parquet(out).collect()
    }
    assert delta == {7: "removed", 11: "changed", 9001: "added"}
