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


def rule_hit_matrix(
    flagged: DataFrame, reason_col: str = "drop_reason"
) -> DataFrame:
    """(rule, hits, attributed, shadowed) per rule — the ablation view the
    first-match cascade hides.

    ``hits`` counts every row where the rule fires independent of cascade
    position (the ``rule_<name>`` flags from ``with_quality_flags``);
    ``attributed`` counts rows the cascade actually charged to this rule
    (its drop_reason); ``shadowed = hits - attributed`` is overlap an
    earlier rule claimed first. Tuning a threshold against the metrics
    table alone misleads — a rule whose drops all reappear under another
    rule's hits buys nothing when relaxed; this table shows that.

    One pass: a single global aggregate (2 small counters per rule,
    map-side partial agg — well under the ~40-buffer-field codegen limit
    at the 13-rule inventory) unpivoted driver-free into one row per rule.
    """
    rules = [c[len("rule_"):] for c in flagged.columns if c.startswith("rule_")]
    if not rules:
        raise ValueError(
            "rule_hit_matrix needs the rule_<name> flag columns — pass the "
            "with_quality_flags / quality_filter output, not a projection "
            "that dropped them"
        )
    aggs = []
    for r in rules:
        aggs.append(F.sum(F.col(f"rule_{r}").cast("long")).alias(f"_h_{r}"))
        aggs.append(
            F.sum(F.when(F.col(reason_col) == r, 1).otherwise(0)).alias(f"_a_{r}")
        )
    row = flagged.agg(*aggs)
    pieces = [
        F.struct(
            F.lit(r).alias("rule"),
            F.col(f"_h_{r}").alias("hits"),
            F.col(f"_a_{r}").alias("attributed"),
        )
        for r in rules
    ]
    return (
        row.select(F.explode(F.array(*pieces)).alias("_x"))
        .select("_x.rule", "_x.hits", "_x.attributed")
        .withColumn("shadowed", F.col("hits") - F.col("attributed"))
    )
