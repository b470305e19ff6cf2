"""Sink operators.

Reference: ``hf_upload`` concatenates all shards, pushes to the HF hub and
returns a one-row metadata dataset {length, fingerprint, commit_hash,
repo_id} (/root/reference/open_thoughts_3/engine/operators/
hf_upload_operator.py:35-107). Spark-native: a table write (Iceberg
``writeTo(...).createOrReplace()`` on a real catalog; parquet dir here) plus
the same one-row metadata DataFrame built from the write's outcome.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table bucketed (and optionally sorted) by join key.

    Two tables bucketed the same way join WITHOUT a shuffle — the
    pre-partitioning is the lakehouse answer to repeated co-located joins at
    100 TB (pay the shuffle once at write time, never again at read time).
    Plan evidence: tests/test_plans.py asserts the bucketed join has no
    Exchange."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_clustered_table(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table range-clustered on ``cluster_cols`` — the data-
    skipping layout (Iceberg sort orders / Delta OPTIMIZE ZORDER's 1-D
    case): ``repartitionByRange`` gives every output file a disjoint key
    range and ``sortWithinPartitions`` keeps row groups tight, so parquet
    footer min/max stats let readers skip whole files and row groups for
    selective predicates on the cluster key. Complements
    :func:`write_bucketed_table` (hash layout for shuffle-free JOINS;
    this is the range layout for selective SCANS). Clustering pays one
    range shuffle at write time; ``num_files`` defaults to the session's
    shuffle parallelism.

    The range boundaries come from Spark's reservoir sampling of the key —
    skewed keys still land in roughly equal-sized files (the sampler sees
    the skew), unlike hash bucketing where a hot key pins one bucket.
    """
    if num_files is not None:
        parted = df.repartitionByRange(num_files, *cluster_cols)
    else:
        parted = df.repartitionByRange(*cluster_cols)
    parted.sortWithinPartitions(*cluster_cols).write.mode(mode).parquet(path)


def upload_metadata(
    spark: SparkSession, df: DataFrame, destination: str, key_cols: list[str]
) -> DataFrame:
    """One-row metadata dataset in the hf_upload shape: row count + a
    content fingerprint (order-insensitive xor-of-row-hashes, computed
    distributed — no collect) + destination id."""
    agg = df.select(
        F.xxhash64(*[F.col(c).cast("string") for c in key_cols]).alias("_h")
    ).agg(
        F.count("*").alias("length"),
        F.expr("bit_xor(_h)").alias("_xor"),  # order-insensitive, overflow-free
    )
    row = agg.collect()[0]
    fingerprint = hashlib.sha256(
        f"{row['length']}|{row['_xor']}".encode()
    ).hexdigest()[:16]
    return spark.createDataFrame(
        [(int(row["length"]), fingerprint, destination)],
        "length long, fingerprint string, destination string",
    )
