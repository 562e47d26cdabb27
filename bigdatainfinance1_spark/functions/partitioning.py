"""Scan-parallelism guard for per-row-heavy map stages.

Spark sizes a parquet scan's task count from file splits
(`spark.sql.files.maxPartitionBytes`), and a small single-row-group file
yields exactly ONE split no matter how many cores the session has. Any
expensive narrow work fused into that scan stage — 32 minhash permutations
per shingle, md5 per bootstrap replicate, 64-dim distance folds per
candidate — then serializes on one core while the rest of the cluster
idles (guide §2.5 "input skew: one huge unsplittable file …; repartition
immediately after the read", §6 input split size).

`parallelize_scan` is the scale-adaptive form of that advice: it
round-robin-repartitions ONLY when the input's estimated split count is
below the session's default parallelism. At production scale a corpus scan
already yields thousands of splits, so the branch is a no-op and no
corpus-wide shuffle is ever added; on a small-file layout it buys
cores-way parallelism for the heavy map at the cost of shuffling the
(small, pre-explosion) input once.

Call it at the point where the heavy per-row work BEGINS — after
projections/filters, never around `load_table` itself — so predicate
pushdown and column pruning still reach the parquet scan (an Exchange
between scan and filter would block both).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame


def _estimated_scan_splits(df: DataFrame, target: int) -> int:
    """Driver-cheap estimate of the scan's split count (round-8 ADVICE: the
    previous `df.rdd.getNumPartitions()` probe forced a full plan-to-RDD
    conversion on the driver per query build). File COUNT alone decides the
    common case: a production corpus has >= cores files, which short-circuits
    before any per-file stat. Only a few-file input pays one `getFileStatus`
    per file to add size/maxPartitionBytes splits (Spark range-splits large
    parquet files). CAVEAT: this mirrors the planner's split packing only
    approximately (openCostInBytes bin-packing, AQE) — it is a parallelism
    guard, not an exact split count; both over- and under-estimates are
    benign (a redundant repartition of a pre-explosion input, or a few idle
    cores)."""
    files = df.inputFiles()
    if len(files) >= target:
        return len(files)
    spark = df.sparkSession
    jvm = spark.sparkContext._jvm
    max_bytes = jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes")
    )
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    splits = 0
    for f in files:
        p = jvm.org.apache.hadoop.fs.Path(f)
        size = p.getFileSystem(hconf).getFileStatus(p).getLen()
        splits += max(1, math.ceil(size / max(1, max_bytes)))
        if splits >= target:
            break
    return splits


def parallelize_scan(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition `df` round-robin to the session's default parallelism iff
    its estimated scan split count is lower — a no-op branch at production
    split counts. Row-order effects: round-robin repartition is
    retry-deterministic (sort-before-repartition, SPARK-23207), and every
    caller feeds order-insensitive consumers (per-row hashes, distinct,
    integer-grain aggregates)."""
    target = (
        min_parts
        if min_parts is not None
        else df.sparkSession.sparkContext.defaultParallelism
    )
    if _estimated_scan_splits(df, target) < target:
        return df.repartition(target)
    return df
