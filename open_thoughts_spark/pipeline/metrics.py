"""Drop-reason metrics + per-partition lineage tables.

The reference logs before/after counts and % removed at every filter
(/root/reference/open_thoughts_3/dcft/data_strategies/commons.py:425-433,
open_thoughts/deduplicate.py:53-54) and records per-operator row counts in a
Postgres lineage table (synthetic_data_manager.py:794-1056). Here both become
first-class DataFrames: declarative aggregations, no driver-side counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def drop_reason_metrics(decided: DataFrame) -> DataFrame:
    """Rows per drop_reason (null reason = kept), with fraction of total.

    A single groupBy — Catalyst performs map-side partial aggregation, so at
    10^12 turns the shuffle carries one row per (partition, reason). The
    global-total window runs over the tiny aggregated result (≤ #rules rows).
    """
    return (
        decided.groupBy(F.coalesce(F.col("drop_reason"), F.lit("kept")).alias("reason"))
        .agg(F.count("*").alias("rows"))
        .withColumn("fraction", F.col("rows") / F.sum("rows").over(Window.partitionBy()))
    )


def partition_lineage(decided: DataFrame) -> DataFrame:
    """Per-input-partition accounting: rows in, rows kept, rows dropped.

    The Spark analog of the reference's per-shard logging — expressed as a
    groupBy on ``spark_partition_id()`` instead of imperative counters.
    """
    return (
        decided.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count("*").alias("rows_in"),
            F.sum(F.col("keep").cast("long")).alias("rows_kept"),
        )
        .withColumn("rows_dropped", F.col("rows_in") - F.col("rows_kept"))
    )
