"""Cheap parallelism gate for pre-spreading narrow scans.

A single-file parquet scan plans as 1-2 tasks, so an expensive per-row map
(shingle/regex/subprocess) downstream of it runs on 2 of N cores. Library
operators accept ``min_parallelism`` to repartition such inputs first.

The gate must itself be cheap: ``df.rdd.getNumPartitions()`` pays ~0.18 s
of DataFrame->RDD plan conversion per query (measured, CLAUDE.md perf
lore), so for file-backed inputs we gate on ``df.inputFiles()`` — a pure
driver-side metadata call. Only non-file inputs (in-memory ranges, cached
frames) fall back to the RDD probe, where plan conversion is trivial
anyway because there is no scan to plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def spread(
    df: DataFrame, min_parallelism: int | None, *cols: Column
) -> DataFrame:
    """Repartition ``df`` to ``min_parallelism`` when its input is narrow.

    File-backed input: spread when it has fewer than ``min_parallelism//2``
    files (same threshold as the entry layer's ``_docs_spread``) — a table
    already split into many files scans wide on its own, and files larger
    than ``maxPartitionBytes`` split further still. Non-file input: fall
    back to the partition-count probe so semantics match the old gate.

    ``cols`` hash-partitions (co-locates downstream keyed ops); without
    them the exchange is round-robin.
    """
    if not min_parallelism:
        return df
    files = df.inputFiles()
    if files:
        narrow = len(files) < max(1, min_parallelism // 2)
    else:
        narrow = df.rdd.getNumPartitions() < min_parallelism
    if not narrow:
        return df
    if cols:
        return df.repartition(min_parallelism, *cols)
    return df.repartition(min_parallelism)
