from open_thoughts_spark.sources.readers import (
    read_json_source,
    read_jsonl_sharded,
    read_parquet_source,
    sample_shards,
    with_source_column,
)
from open_thoughts_spark.sources.sinks import write_table, upload_metadata

__all__ = [
    "read_json_source",
    "read_jsonl_sharded",
    "read_parquet_source",
    "sample_shards",
    "with_source_column",
    "write_table",
    "upload_metadata",
]
