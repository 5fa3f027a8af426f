"""Small-file compaction for parquet outputs.

A long-running curation pipeline accretes small files: every resumed
run, streaming micro-batch, and skew-split task adds part-files, and at
100 TB a table of 10 MB files makes every downstream scan
metadata-bound (driver file listing, task-per-file scheduling, row-group
overhead). This is the scale analog of the reference's object
move/rewrite step (S8: copy_object + delete_object,
reference backend/src/lambda/redact.py:228-244) — rewrite in place,
same rows, better layout.

Mechanics: size the target file count from the actual on-disk bytes
(ceil(total / target_bytes)), rewrite with `repartition(n)` (round-robin
— even output sizes, no key skew), write to a staging dir, then swap
via two FileSystem renames. The swap is atomic on HDFS/local rename
semantics; on S3-style object stores prefer the Iceberg path
(`TableIO` + rewrite_data_files) where the commit is a metadata swap —
this module is the Parquet-fallback analog, mirroring the
Iceberg-or-Parquet split used everywhere else in sources/tables.py.

Partition-preserving: a dir written with partitionBy(bucket) keeps its
layout by compacting per partition directory (`partition_cols`), so
bucket pruning and the zero-shuffle re-read path survive compaction.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return jvm, fs, hpath


def dir_stats(spark: SparkSession, path: str) -> dict:
    """Recursive (n_files, total_bytes) for a parquet dir."""
    jvm, fs, hpath = _fs(spark, path)
    n_files = 0
    total = 0
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        n_files += 1
        total += st.getLen()
    return {"n_files": n_files, "total_bytes": total}


def plan_compaction(
    spark: SparkSession, path: str, target_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Dry run: current layout + the file count a rewrite would produce."""
    stats = dir_stats(spark, path)
    stats["target_files"] = max(1, math.ceil(stats["total_bytes"] / target_bytes))
    stats["worth_it"] = stats["n_files"] > 2 * stats["target_files"]
    return stats


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    partition_cols: list[str] | None = None,
) -> dict:
    """Rewrite a parquet dir into ~target_bytes files and swap in place.

    Returns {n_files_before, n_files_after, total_bytes, rows}. Row
    count is asserted preserved across the rewrite before the swap —
    a failed rewrite leaves the original untouched (staging dir is
    cleaned up).
    """
    plan = plan_compaction(spark, path, target_bytes)
    df = spark.read.parquet(path)
    rows_before = df.count()
    staging = path.rstrip("/") + "__compact_staging"

    jvm, fs, hpath = _fs(spark, path)
    spath = jvm.org.apache.hadoop.fs.Path(staging)
    if fs.exists(spath):  # leftover from a crashed compaction
        fs.delete(spath, True)

    try:
        writer = df.repartition(plan["target_files"]).write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(staging)
        rows_after = spark.read.parquet(staging).count()
        if rows_after != rows_before:
            raise RuntimeError(
                f"compaction row drift: {rows_before} -> {rows_after}; "
                "original left untouched"
            )
    except Exception:
        fs.delete(spath, True)
        raise

    old = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__compact_old")
    fs.rename(hpath, old)
    fs.rename(spath, hpath)
    fs.delete(old, True)
    after = dir_stats(spark, path)
    return {
        "n_files_before": plan["n_files"],
        "n_files_after": after["n_files"],
        "total_bytes": after["total_bytes"],
        "rows": rows_before,
    }
