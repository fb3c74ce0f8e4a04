"""Partitioned-lake sink: parquet with dynamic partition overwrite.

The DataFrame-native equivalent of the reference's delete-then-write
idempotency (S4, trends.go:656-662): with
``spark.sql.sources.partitionOverwriteMode=dynamic`` (set by our
session factory) an ``overwrite`` only replaces the partitions present
in the incoming data — re-running a day's job rewrites exactly that
day's partitions and leaves history untouched.

Scale note: partitioning by (day, statusType) keeps the day filter a
static partition-pruning predicate for every downstream reader (F1
becomes a directory prune, not a scan filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = ("day", "statusType"),
    mode: str = "overwrite",
) -> None:
    (
        df.write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def delete_matching(
    spark: SparkSession,
    path: str,
    predicate,
    partition_by: tuple[str, ...] = ("day", "statusType"),
) -> int:
    """Delete every row matching ``predicate`` (a Column) from the
    lake — the takedown / right-to-be-forgotten primitive a training-
    data lake needs.  Returns the number of rows removed.

    Shape: find the PARTITIONS that contain matching rows (a pruned
    aggregation over the partition columns), then rewrite exactly those
    partitions without the matching rows via dynamic partition
    overwrite — untouched partitions are never read or written, so the
    cost scales with the affected data, not the lake.  Idempotent: a
    rerun matches nothing and rewrites nothing.

    The rewrite slice is localCheckpointed before the overwrite because
    its lineage READS the same files the overwrite replaces (the
    classic self-overwrite hazard).

    NULL semantics: under SQL three-valued logic a predicate can
    evaluate to NULL (e.g. ``col('username') == 'bob'`` on a NULL
    username), and such rows satisfy neither ``predicate`` nor
    ``~predicate``.  A takedown must never silently drop them, so the
    match condition is ``coalesce(predicate, false)`` — NULL means KEEP
    — and match/keep partition the slice exactly (``n_removed`` counts
    every row that disappears).

    Partition selection is a broadcast left-semi join against the
    distinct affected-partition frame, not a literal OR-chain: the plan
    stays constant-size no matter how many partitions match, and
    dynamic partition pruning still skips untouched partitions at
    runtime.  NULL-valued partition KEYS are not supported (the hive
    partition layout encodes them as a default-partition directory;
    keep partition columns NOT NULL, as ``write_partitioned`` callers
    do).
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    match = F.coalesce(predicate.cast("boolean"), F.lit(False))
    affected_df = df.filter(match).select(*partition_by).distinct()
    # O(#affected partitions) driver-side — needed anyway for the
    # emptied-directory cleanup below; re-localized as a literal frame
    # so the semi-join build side doesn't re-read the lake.
    affected = affected_df.collect()
    if not affected:
        return 0
    aff_local = spark.createDataFrame(affected, schema=affected_df.schema)
    slice_df = df.join(
        F.broadcast(aff_local), on=list(partition_by), how="left_semi"
    )
    n_removed = slice_df.filter(match).count()
    keep = slice_df.filter(~match).localCheckpoint()
    kept_parts = {
        tuple(str(r[c]) for c in partition_by)
        for r in keep.select(*partition_by).distinct().collect()
    }
    if kept_parts:
        write_partitioned(keep, path, partition_by=partition_by)
    # dynamic overwrite only replaces partitions PRESENT in the written
    # data — a fully-emptied partition must be removed explicitly
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    for row in affected:
        key = tuple(str(row[c]) for c in partition_by)
        if key in kept_parts:
            continue
        sub = "/".join(f"{c}={v}" for c, v in zip(partition_by, key))
        hpath = jvm.org.apache.hadoop.fs.Path(f"{path}/{sub}")
        fs = hpath.getFileSystem(hconf)
        fs.delete(hpath, True)
        # prune now-empty parent partition directories up to the root
        parent = hpath.getParent()
        root = jvm.org.apache.hadoop.fs.Path(path)
        while (
            str(parent) != str(root)
            and fs.exists(parent)
            and len(fs.listStatus(parent)) == 0
        ):
            fs.delete(parent, True)
            parent = parent.getParent()
    return n_removed


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    partition_by: tuple[str, ...] = ("day", "statusType"),
) -> dict:
    """Small-file compaction — the lake-maintenance primitive a
    continuously-written 100 TB lake needs: every micro-batch /
    per-day overwrite leaves a few files per partition, and a year of
    them turns every scan into a metadata storm (driver-side file
    listing, one task per splinter, parquet footer reads).

    Per leaf partition, the data-file listing decides: a partition
    whose file count exceeds ``ceil(bytes / target_bytes)`` is
    rewritten into exactly that many files via ``repartition(n_out)``
    (round-robin, exempt from AQE partition coalescing — the
    REPARTITION_BY_NUM rule, so the file count is exact); partitions
    already at or under their target file count are NOT read or
    written — cost scales with the splintered data, not the lake.

    The rewrite rides the same dynamic-partition-overwrite path as
    ``delete_matching`` (slice localCheckpointed first — the
    self-overwrite hazard), so a crash mid-commit leaves the original
    partition, and a rerun is idempotent (compacted partitions no
    longer qualify).  Row CONTENT is untouched; only file layout
    changes.

    Returns ``{"partitions_compacted", "files_before", "files_after",
    "bytes_compacted"}``.
    """
    import math
    from urllib.parse import unquote

    from pyspark.sql import functions as F

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(hconf)

    def _leaf_dirs(p, depth):
        if depth == 0:
            yield p
            return
        for st in fs.listStatus(p):
            if st.isDirectory() and "=" in st.getPath().getName():
                yield from _leaf_dirs(st.getPath(), depth - 1)

    plan = []  # (key tuple, n_files, bytes, n_out)
    for leaf in _leaf_dirs(root, len(partition_by)):
        files = [
            st
            for st in fs.listStatus(leaf)
            if not st.isDirectory()
            and not st.getPath().getName().startswith(("_", "."))
        ]
        total = sum(st.getLen() for st in files)
        n_out = max(1, math.ceil(total / float(target_bytes)))
        if len(files) > n_out:
            # str(leaf) may carry a filesystem scheme (file:/...) the
            # root string lacks — key off the trailing hive segments.
            # Hive URL-escapes special chars in partition VALUES
            # (space, '%', '='...); unescape before the equality
            # filter below or those partitions read-prune to empty
            # and the rewrite silently no-ops.
            segs = str(leaf).split("/")[-len(partition_by):]
            key = tuple(
                unquote(seg.split("=", 1)[1]) for seg in segs
            )
            plan.append((key, len(files), total, n_out))
    if not plan:
        return {
            "partitions_compacted": 0,
            "files_before": 0,
            "files_after": 0,
            "bytes_compacted": 0,
        }
    df = spark.read.parquet(path)
    # one rewrite per splintered partition: the filter on partition
    # columns is a directory prune (only that partition's files are
    # read), repartition(n_out) is a round-robin exchange EXEMPT from
    # AQE coalescing (the REPARTITION_BY_NUM rule), so the partition
    # lands in exactly n_out files.  A maintenance job compacting
    # thousands of partitions should batch calls by day range; each
    # rewrite here is independent and idempotent.
    for key, _, _, n_out in plan:
        pred = None
        for c, v in zip(partition_by, key):
            cond = df[c].cast("string") == F.lit(v)
            pred = cond if pred is None else (pred & cond)
        slice_df = (
            df.filter(pred).repartition(n_out).localCheckpoint()
        )
        write_partitioned(slice_df, path, partition_by=partition_by)
    files_after = 0
    compacted_keys = {k for k, _, _, _ in plan}
    for leaf in _leaf_dirs(root, len(partition_by)):
        segs = str(leaf).split("/")[-len(partition_by):]
        key = tuple(unquote(seg.split("=", 1)[1]) for seg in segs)
        if key in compacted_keys:
            files_after += sum(
                1
                for st in fs.listStatus(leaf)
                if not st.isDirectory()
                and not st.getPath().getName().startswith(("_", "."))
            )
    return {
        "partitions_compacted": len(plan),
        "files_before": sum(n for _, n, _, _ in plan),
        "files_after": files_after,
        "bytes_compacted": sum(b for _, _, b, _ in plan),
    }
