"""Source operators — the reference's ingest surface, Spark-native.

Reference operators being re-expressed:
- ``hf_source`` (column projection + truncation + constant source column,
  /root/reference/open_thoughts_3/engine/operators/hf_source_operator.py:141-167)
- ``json_source`` / ``local_json_source`` (JSON/JSONL dirs or files,
  engine/operators/json_source_operator.py)
- ``dclm_refinedweb_source`` (seeded random sample of N compressed JSONL
  shards from an object store, with retry/backoff,
  engine/operators/dclm_refinedweb_source_operator.py:48-191)

Spark notes: projection/truncation push into the scan (Catalyst column
pruning + GlobalLimit); zstd/gzip decompression of ``*.jsonl.zst`` is handled
by the codec layer; S3 retry/backoff is the Hadoop S3A connector's job, not
application code. Shard sampling is seeded and done on the *file list* so the
scan only ever opens the chosen shards (the reference's behavior, without a
driver-side download loop).
"""

from __future__ import annotations

import fnmatch
import os
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def with_source_column(df: DataFrame, name: str, value: str) -> DataFrame:
    """hf_source_operator.py:162-163 — constant provenance column."""
    return df.withColumn(name, F.lit(value))


def _apply_common(
    df: DataFrame,
    columns: list[str] | None,
    num_truncate: int | None,
    source_column: tuple[str, str] | None,
) -> DataFrame:
    if columns:
        df = df.select(*columns)  # hf_source_operator.py:157-158
    if num_truncate:
        df = df.limit(num_truncate)  # hf_source_operator.py:159-160
    if source_column:
        df = with_source_column(df, *source_column)
    return df


def read_parquet_source(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    num_truncate: int | None = None,
    source_column: tuple[str, str] | None = None,
) -> DataFrame:
    """The hf_source equivalent: a table scan with projection/limit pushed
    into the reader (check ``ReadSchema`` in .explain)."""
    return _apply_common(spark.read.parquet(path), columns, num_truncate, source_column)


def read_json_source(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    multiline: bool = False,
    columns: list[str] | None = None,
    num_truncate: int | None = None,
    source_column: tuple[str, str] | None = None,
) -> DataFrame:
    """json_source semantics. ALWAYS pass ``schema`` at scale — schema
    inference is a full extra pass over 100 TB."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    df = reader.option("multiLine", str(multiline).lower()).json(path)
    return _apply_common(df, columns, num_truncate, source_column)


def sample_shards(
    base_dir: str,
    pattern: str = "*.jsonl*",
    num_shards: int | None = None,
    seed: int = 314,
) -> list[str]:
    """Seeded random shard choice on the FILE LIST (dclm_refinedweb_source
    semantics, :95-118: choose num_shards of the listed keys with a seeded
    RNG). Listing a posix dir here; on S3 the same logic runs over the
    object listing."""
    names = sorted(
        f for f in os.listdir(base_dir) if fnmatch.fnmatch(f, pattern)
    )
    if num_shards is not None and num_shards < len(names):
        rng = random.Random(seed)
        names = sorted(rng.sample(names, num_shards))
    return [os.path.join(base_dir, n) for n in names]


def read_jsonl_sharded(
    spark: SparkSession,
    base_dir: str,
    pattern: str = "*.jsonl*",
    num_shards: int | None = None,
    seed: int = 314,
    schema: str | None = None,
    columns: list[str] | None = None,
    num_truncate: int | None = None,
    source_column: tuple[str, str] | None = None,
) -> DataFrame:
    """dclm_refinedweb_source: read a seeded sample of JSONL shards. Only the
    sampled files are ever opened; compressed shards (.gz/.zst where codecs
    are present) decompress in the scan."""
    files = sample_shards(base_dir, pattern, num_shards, seed)
    if not files:
        raise FileNotFoundError(f"no shards matching {pattern} under {base_dir}")
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    df = reader.json(files)
    return _apply_common(df, columns, num_truncate, source_column)
