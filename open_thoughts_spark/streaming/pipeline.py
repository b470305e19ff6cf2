"""Structured Streaming surface of the quality-filter engine.

The reference is purely batch (SURVEY.md §2.4: no streams anywhere); this
module is the additive capability a transcript firehose needs: the SAME
per-turn scoring/decision/scrub expressions run under ``readStream`` —
every per-turn step is a narrow transformation, so the batch plan is reused
verbatim — plus watermarked event-time aggregation for the drop-reason
metrics (late turns tolerated up to the watermark).

Checkpointing here is Spark's own streaming checkpoint (offsets + state),
complementary to the batch stage-hash manifest in pipeline/checkpoint.py.

Ordering note: global ``turn_rank`` windows don't exist in streaming — turn
order is an ingest-time property (``turn_idx`` is already the order), so the
streaming surface simply carries ``turn_idx`` through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_thoughts_spark.fixtures.transcripts import SCHEMA_DDL
from open_thoughts_spark.pipeline.quality_filter import RESULT_COLUMNS, quality_filter


def read_transcripts_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """File-source stream over a growing transcripts directory (the sandbox
    stand-in for a Kafka/Kinesis turn firehose; swap ``format``)."""
    return (
        spark.readStream.schema(SCHEMA_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_quality_filter(
    stream_df: DataFrame,
    output_path: str,
    checkpoint_path: str,
    langid_mode: str = "native",
    available_now: bool = True,
):
    """Score → decide → scrub on the stream; append kept turns to parquet.

    ``available_now=True`` drains everything currently in the source and
    stops — the testable/batch-catchup trigger; continuous deployments drop
    it for the default micro-batch trigger."""
    decided = quality_filter(
        stream_df, langid_mode=langid_mode, with_turn_order=False
    ).select(*RESULT_COLUMNS)
    writer = (
        decided.filter(F.col("keep"))
        .drop("keep", "drop_reason")
        .writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_drop_metrics(
    stream_df: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    langid_mode: str = "native",
) -> DataFrame:
    """Watermarked event-time drop-reason metrics: one row per
    (time window, reason). Late turns beyond the watermark are dropped from
    the aggregation state — bounded state at firehose scale."""
    decided = quality_filter(
        stream_df, langid_mode=langid_mode, with_turn_order=False
    )
    return (
        decided.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window).alias("time_window"),
            F.coalesce(F.col("drop_reason"), F.lit("kept")).alias("reason"),
        )
        .agg(F.count("*").alias("rows"))
    )


def stream_exact_dedup(
    stream_df: DataFrame,
    key_cols: list[str] | None = None,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop turns whose normalized-text md5 was
    already seen. With ``ts_col``, state is bounded by the watermark
    (``dropDuplicatesWithinWatermark`` — duplicates farther apart than the
    watermark can both survive, the standard bounded-state trade); without
    it, state grows with distinct keys (only for bounded backfills).

    The md5 key (not the text) is what the state store holds — constant
    bytes per distinct document regardless of document size.
    """
    # same normalization as the batch exact_dedup_normalized: lowercase +
    # collapsed whitespace runs
    keyed = stream_df.withColumn(
        "_dk",
        F.md5(
            F.lower(
                F.regexp_replace(
                    F.trim(F.col(text_col)), "[ \\t\\n\\x0B\\f\\r]+", " "
                )
            )
        ),
    )
    keys = (key_cols or []) + ["_dk"]
    if ts_col is not None:
        deduped = keyed.withWatermark(ts_col, watermark)
        deduped = deduped.dropDuplicatesWithinWatermark(keys)
    else:
        deduped = keyed.dropDuplicates(keys)
    return deduped.drop("_dk")


def stream_decontaminate(
    stream_df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    eval_text_col: str | None = None,
    n: int = 3,
) -> DataFrame:
    """Streaming n-gram decontamination: drop stream rows sharing any word
    n-gram with a STATIC eval set; no streaming state at all.

    Implementation note: a streaming explode + left_anti + re-aggregate
    would need the full row back; instead the contamination test is one
    narrow predicate per row — no shuffle, no state. Small eval sets
    (<= 256 distinct grams) inline as an ``arrays_overlap`` literal array;
    larger ones (a real benchmark is easily 20k+ grams, which would blow
    up the expression tree / codegen) go through an Arrow-batched pandas
    UDF holding the gram set in the task closure. NULL text is never
    contaminated (matches batch ngram_decontaminate, which keeps
    null-text rows)."""
    from open_thoughts_spark.operators.dedup import shingles_expr

    etc = eval_text_col or text_col
    eval_grams = [
        r["_g"]
        for r in eval_df.select(
            F.explode(shingles_expr(F.col(etc), n)).alias("_g")
        ).distinct().collect()
    ]
    if not eval_grams:
        return stream_df
    grams = shingles_expr(F.col(text_col), n)
    if len(eval_grams) <= 256:
        hit = F.arrays_overlap(
            F.coalesce(grams, F.array()),
            F.array(*[F.lit(g) for g in eval_grams]),
        )
        return stream_df.filter(~F.coalesce(hit, F.lit(False)))

    import pandas as pd

    gram_set = set(eval_grams)

    @F.pandas_udf("boolean")
    def _contaminated(col: pd.Series) -> pd.Series:
        def check(arr) -> bool:
            if arr is None:
                return False
            return any(g in gram_set for g in arr)

        return col.map(check)

    return stream_df.filter(~_contaminated(grams))
