"""Helpers referenced by the checked-in examples/ YAML pipelines via the
generic ``function`` operator (the reference's function_operator resolves
dotted paths the same way)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_by_length(df: DataFrame, threshold: int = 400) -> DataFrame:
    """Deterministic weak labels for the classifier example: documents at
    or above ``threshold`` characters label 'long', the rest 'short'."""
    return df.withColumn(
        "label",
        F.when(F.length("text") >= threshold, F.lit("long")).otherwise(
            F.lit("short")
        ),
    )
