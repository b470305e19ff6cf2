from open_thoughts_spark.pipeline.quality_filter import (
    quality_filter,
    read_transcripts,
    run_pipeline,
)
from open_thoughts_spark.pipeline.metrics import drop_reason_metrics, partition_lineage

__all__ = [
    "quality_filter",
    "read_transcripts",
    "run_pipeline",
    "drop_reason_metrics",
    "partition_lineage",
]
