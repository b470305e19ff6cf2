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
