from open_thoughts_spark.streaming.pipeline import (
    read_transcripts_stream,
    stream_decontaminate,
    stream_exact_dedup,
    stream_minhash_candidates,
    stream_quality_filter,
    streaming_drop_metrics,
)

__all__ = [
    "read_transcripts_stream",
    "stream_decontaminate",
    "stream_exact_dedup",
    "stream_minhash_candidates",
    "stream_quality_filter",
    "streaming_drop_metrics",
]
