"""Skew handling: salted repartitioning + skew-aware aggregation helpers.

The reference has NOTHING for skew (SURVEY.md §4: its shard operator cuts
contiguous ranges); at 10^12 turns, hot conversations (FIXTURES.md: ~1% of
conv_ids own ~30% of turns) make any conv_id-keyed shuffle lopsided. Three
tools:

- ``salted_repartition``: spread each hot key over ``salt_buckets`` reducers
  (key, salt) — for per-turn work that only needs *approximate* co-location;
- ``two_phase_agg``: aggregate per (key, salt) then re-aggregate per key —
  the classic salting scheme for skewed aggregations whose functions compose
  (counts, sums, min/max);
- AQE's skew-join splitting is enabled in session.py for the join side.

Note windows that need exact per-key ordering (turn_rank) cannot be salted —
their skew bound is the max conversation length, which the fixture (and any
sane transcript store) caps at ~10^3 turns: a window partition is small by
construction. That invariant is the load-bearing one, and `conv_length_stats`
lets a pipeline assert it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_repartition(
    df: DataFrame, key: str, salt_buckets: int = 16, num_partitions: int | None = None
) -> DataFrame:
    """Repartition on (key, salt) where salt is a stable per-row hash bucket
    — hot keys fan out over ``salt_buckets`` partitions instead of one."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    if num_partitions:
        return df.repartition(num_partitions, F.col(key), salt)
    return df.repartition(F.col(key), salt)


def two_phase_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe aggregation: ``aggs`` maps output name → (input expr,
    combine fn) where combine ∈ {sum, min, max} composes across salt buckets.
    count(*) is expressed as sum of partial counts.

    two_phase_agg(df, "conv_id", {"n": ("1", "sum"), "mx": ("x", "max")})
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    partial_aggs = []
    final_aggs = []
    for out, (expr, combine) in aggs.items():
        partial_col = f"_p_{out}"
        fn = {"sum": F.sum, "min": F.min, "max": F.max}[combine]
        partial_aggs.append(fn(F.expr(expr)).alias(partial_col))
        final_aggs.append(fn(F.col(partial_col)).alias(out))
    partial = df.withColumn("_salt", salt).groupBy(key, "_salt").agg(*partial_aggs)
    return partial.groupBy(key).agg(*final_aggs)


def conv_length_stats(df: DataFrame, key: str = "conv_id") -> DataFrame:
    """Skew audit: distribution of per-key row counts (drives the choice of
    salt_buckets and validates the bounded-conversation invariant)."""
    counts = df.groupBy(key).agg(F.count("*").alias("rows"))
    return counts.agg(
        F.count("*").alias("n_keys"),
        F.max("rows").alias("max_rows"),
        F.expr("percentile_approx(rows, 0.5)").alias("p50"),
        F.expr("percentile_approx(rows, 0.99)").alias("p99"),
        F.sum("rows").alias("total_rows"),
    )
