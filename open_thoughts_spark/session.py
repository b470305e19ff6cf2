"""SparkSession construction with scale-oriented defaults.

Single place where execution knobs live so tests, bench.py and spark-submit
entrypoints agree. Designed for a real multi-executor cluster; in this sandbox
we run ``local[N]`` but every setting below is the one you would ship to a
1000-executor cluster reading 100 TB:

- AQE on (runtime shuffle-partition coalescing + skew-join splitting),
- Arrow on (vectorized pandas UDF transfer),
- shuffle partitions sized for the local core count (cluster: 2-3x total cores),
- parquet pushdown/pruning left at defaults (on).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "open-thoughts-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, fallback 32) so the
    same code path is used by tests, bench and the driver harness. On a real
    cluster you simply omit ``master`` at spark-submit time.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: one shuffle partition per core keeps every stage fully
        # parallel without tiny-task overhead; cluster deployments override.
        shuffle_partitions = cpus

    if master.startswith("local[") and master[6:-1].isdigit():
        min_scan_partitions = 2 * int(master[6:-1])
    else:
        min_scan_partitions = shuffle_partitions

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # keep scan parallelism ∝ cores even for small/bin-packed file sets:
        # without this, a handful of small parquet files collapses into 1-2
        # input partitions (128MB maxPartitionBytes + 4MB openCost) and the
        # whole job runs serial regardless of executor count
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
        .config("spark.sql.files.minPartitionNum", str(min_scan_partitions))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
