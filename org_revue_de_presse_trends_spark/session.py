"""SparkSession factory tuned for this engine.

The reference delegates all relational work to PostgreSQL's
planner/executor (reference trends.go:414,438,444); here the equivalent
roles are played by Catalyst + Tungsten, so the session config is where
engine-wide physical-execution policy lives:

- AQE on (runtime re-planning, skew-join splitting, partition coalescing)
- UTC session timezone (all reference timestamps are UTC-shifted civil
  days, reference trends.go:311)
- dynamic partition overwrite (parity with the reference's
  delete-then-write idempotent sink, reference trends.go:656-662)
- Arrow enabled for the Pandas-UDF escape hatch

Scale note: these settings are sized by environment variables so the
same code runs local[32] in tests and on a multi-executor cluster; at
100 TB the only knobs that change are shuffle partitions /
maxPartitionBytes / executor sizing, not the plans.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # driver fixtures store naive micros timestamps; read them as LTZ
    # (session tz UTC) engine-wide — NTZ breaks withWatermark and long
    # casts, and catalog.load_table re-asserts this per-read for
    # sessions built outside this factory
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.parquet.aggregatePushdown": "true",
    # InferFiltersFromGenerate pushes a size(..)>0/isnotnull filter
    # below the Generate with the generator's child EXPRESSION inlined
    # — for this engine's explode-after-staged-HOF pipelines (shingles,
    # k-grams, segment windows) that re-evaluates the whole interpreted
    # array pipeline several extra times per row, in the scan stage,
    # BELOW any spread/repartition (r7 plan audit on the boilerplate
    # operator; filter text was 4x the projection).  Interleaved
    # best-of-3 A/B at sf0.1: dedup_ngram_jaccard 1.73->1.36,
    # source_ngram_overlap 1.74->1.34, doc_duplicate_spans 1.19->0.74,
    # doc_decontamination 1.26->1.06, everything else a wash.  The
    # rule's benefit (skipping empty-array rows before a join) never
    # applies here: our generators feed aggregations, not selective
    # joins.
    "spark.sql.optimizer.excludedRules": (
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    ),
    # local-mode niceties; harmless on a cluster
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    # whole-stage codegen compiles one class per stage; a long-lived
    # session running the full 50-query suite fills the JVM's default
    # 240 MB code cache, after which the JIT silently disables and
    # EVERY subsequent query runs interpreted (uniform ~30-40%
    # slowdown on untouched queries was the symptom)
    "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=512m",
}


def get_spark(
    app_name: str = "org-revue-de-presse-trends-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract);
    on a real cluster pass ``master=None`` with ``--master`` supplied by
    spark-submit and the builder leaves it untouched.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)

    conf = dict(DEFAULT_CONF)
    n_shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    )
    conf["spark.sql.shuffle.partitions"] = str(n_shuffle)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
