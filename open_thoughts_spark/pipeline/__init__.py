from open_thoughts_spark.pipeline.quality_filter import (
    quality_filter,
    read_transcripts,
    run_pipeline,
    run_checkpointed,
    checkpointed_stages,
)
from open_thoughts_spark.pipeline.metrics import drop_reason_metrics, partition_lineage
from open_thoughts_spark.pipeline.checkpoint import CheckpointedPipeline, Stage, stage_hash

__all__ = [
    "quality_filter",
    "read_transcripts",
    "run_pipeline",
    "run_checkpointed",
    "checkpointed_stages",
    "drop_reason_metrics",
    "partition_lineage",
    "CheckpointedPipeline",
    "Stage",
    "stage_hash",
]
