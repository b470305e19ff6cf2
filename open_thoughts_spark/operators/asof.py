"""As-of (backward, inclusive) join — a temporal operator Spark lacks.

For every left row, attach the right row with the greatest ``right_ts <=
left_ts`` within the same key (the point-in-time lookup every event/feature
pipeline needs: "state as of this event"). The reference is text-only, but
the brief's custom-operator list names as-of joins explicitly; DuckDB's
native ``ASOF JOIN`` provides the exact correctness oracle.

Spark-native formulation — NOT a range cross join: union-tag both sides,
ONE shuffle on (key), per-key sort by (ts, side), and a running
``last(right_value, ignorenulls)`` window carries the most recent right row
forward onto each left row. Cost is a single hash partition + sort —
the same shape as sessionization — so it survives 100× data with the key
cardinality providing parallelism. Ties (equal ts) resolve INCLUSIVE
(right row at ts == left ts matches), like DuckDB ASOF with ``>=``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row + the latest right values at-or-
    before its timestamp (null when no earlier right row exists)."""
    rvals = right_value_cols or [
        c for c in right.columns if c not in key_cols and c != right_ts
    ]
    # join-semantics NULL handling: a SQL join never matches NULL keys or
    # NULL timestamps, so such right rows must not enter the carry-forward
    # (a NULL-ts right row would sort first and leak onto every left row)
    r_clean = right.filter(F.col(right_ts).isNotNull())
    for k in key_cols:
        r_clean = r_clean.filter(F.col(k).isNotNull())
    # carry the right values as ONE struct so the left row gets a single
    # whole right row — per-column carries would mix values from different
    # right rows whenever a later row holds NULL in some column
    rv_struct = F.struct(*[F.col(c) for c in rvals])
    l_tag = left.select(
        *key_cols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left.columns if c not in key_cols and c != left_ts],
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in rvals) + ">"
        ).alias("_rv"),
    )
    r_tag = r_clean.select(
        *key_cols,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left.columns
            if c not in key_cols and c != left_ts
        ],
        rv_struct.alias("_rv"),
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows sort BEFORE left rows at equal ts (_is_left asc) →
    # inclusive backward semantics; last(ignorenulls) carries the whole
    # struct forward (non-null for every right row, even with null members)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_ts"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        "_rv", F.last(F.col("_rv"), ignorenulls=True).over(w)
    )
    return (
        filled.filter(F.col("_is_left") == 1)
        .select(
            *key_cols,
            F.col("_ts").alias(left_ts),
            *[c for c in left.columns if c not in key_cols and c != left_ts],
            *[F.col(f"_rv.{c}").alias(f"{c}{suffix}") for c in rvals],
        )
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval join (start inclusive, end EXCLUSIVE) without a
    cross/theta join: each interval explodes into the fixed-width time
    buckets it covers, points carry their own bucket, and an equi-join on
    (key, bucket) + the exact containment filter finds every pair. Cost is
    points + intervals × (interval_len / bucket) — pick ``bucket_seconds``
    near the typical interval length. Each qualifying pair meets in exactly
    ONE bucket (the point's), so no post-join dedup is needed."""
    w_us = bucket_seconds * 1_000_000
    p_us = F.unix_micros(F.col(point_ts).cast("timestamp_ltz"))
    s_us = F.unix_micros(F.col(start_ts).cast("timestamp_ltz"))
    e_us = F.unix_micros(F.col(end_ts).cast("timestamp_ltz"))
    pb = points.withColumn("_b", F.floor(p_us / w_us))
    # guard inverted/empty intervals: sequence(stop < start) would generate
    # a DESCENDING bucket list (junk fan-out) instead of zero rows
    ib = intervals.filter(e_us > s_us).withColumn(
        "_b", F.explode(F.sequence(F.floor(s_us / w_us), F.floor((e_us - 1) / w_us)))
    )
    joined = pb.join(ib, on=key_cols + ["_b"]).drop("_b")
    return joined.filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
    )
