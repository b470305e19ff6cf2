"""The generic ``function`` operator — arbitrary Python over Arrow batches.

Reference: the DCFT engine's most-used operator applies a dotted-path Python
callable ``f(Dataset, **cfg) -> Dataset`` either per shard (``sharded=True``)
or over the merged whole; resource-annotated variants only change Ray
scheduling; multi-input functions take one main sharded dataset plus
secondary small datasets merged whole (/root/reference/open_thoughts_3/
engine/operators/function_operator.py:157-621, multi-input :279-365).

Spark-first mapping:
- sharded      → ``mapInPandas`` (per-partition Arrow batches; schema
  declared, not inferred);
- unsharded    → the reference merges all shards into one so the fn sees the
  whole table; the honest Spark equivalent is a driver-side pandas roundtrip
  (kept, with a loud size guard) — but almost every real "unsharded" use is
  better expressed as an aggregation, window, or broadcast join;
- multi-input  → the secondary datasets are small by contract: broadcast
  them into the UDF closure as pandas (the reference merges them whole too).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_sharded(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
    batch_size: int | None = None,
) -> DataFrame:
    """sharded=True: fn runs per Arrow batch, distributed, model-scoring safe.

    ``fn`` must be serializable (top-level function or closure over small
    state); heavy state should be lazily constructed inside fn and cached in
    a module-level global (once per executor — the SparkFiles/model-cache
    pattern, fasttext_operator.py:193-240).
    """

    def _runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if batch_size:
                for i in range(0, len(pdf), batch_size):
                    yield fn(pdf.iloc[i : i + batch_size])
            else:
                yield fn(pdf)

    return df.mapInPandas(_runner, schema=schema)


def apply_unsharded(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    max_rows: int = 5_000_000,
) -> DataFrame:
    """sharded=False: fn needs the WHOLE table (global sorts, cross-row logic
    the reference does in pandas). Driver-side by necessity — guarded so a
    10^12-row table can't be collected by accident. Prefer rewriting as
    aggregation/window/join; this exists for reference-parity of the few
    truly global functions."""
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"apply_unsharded would collect {n} rows (> {max_rows}); "
            "rewrite as an aggregation/window/broadcast join instead"
        )
    spark = df.sparkSession
    return spark.createDataFrame(fn(df.toPandas()))


def apply_with_side_inputs(
    df: DataFrame,
    side: dict[str, DataFrame],
    fn: Callable[..., pd.DataFrame],
    schema: str,
    max_side_rows: int = 1_000_000,
) -> DataFrame:
    """Multi-input function: main table sharded, side tables small + merged
    whole (function_operator.py:279-365). Side tables ship to executors via
    broadcast; fn is called as fn(main_batch, **{name: side_pdf})."""
    spark = df.sparkSession
    side_pdfs = {}
    for name, sdf in side.items():
        n = sdf.count()
        if n > max_side_rows:
            raise ValueError(f"side input {name!r} has {n} rows (> {max_side_rows})")
        side_pdfs[name] = sdf.toPandas()
    bc = spark.sparkContext.broadcast(side_pdfs)

    def _runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sides = bc.value
        for pdf in batches:
            yield fn(pdf, **sides)

    return df.mapInPandas(_runner, schema=schema)
