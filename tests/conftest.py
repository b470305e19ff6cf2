from __future__ import annotations

import os

import pandas as pd
import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small, fast test sessions


@pytest.fixture(scope="session")
def spark():
    from open_thoughts_spark.session import get_spark

    s = get_spark(app_name="ots-tests")
    yield s


@pytest.fixture(scope="session")
def transcripts_path(spark, tmp_path_factory) -> str:
    from open_thoughts_spark.fixtures.transcripts import write_transcripts

    path = str(tmp_path_factory.mktemp("fixture") / "transcripts")
    write_transcripts(spark, path, n_convs=300, seed=42)
    return path


@pytest.fixture(scope="session")
def transcripts_pdf(spark, transcripts_path) -> pd.DataFrame:
    return spark.read.parquet(transcripts_path).toPandas()
