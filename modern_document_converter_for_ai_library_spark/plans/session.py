"""SparkSession construction with scale-oriented defaults.

Configured for the execution profile SURVEY.md §4 calls for: AQE with
partition coalescing and skew-join handling, Arrow-batched Python exchange
(the only Python in the job is vectorized kernels), and shuffle-partition
sizing driven by the environment. The same settings apply unchanged on a real
multi-executor cluster — local[.] only swaps the scheduler.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "modern-document-converter-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = 256,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a session.

    ``arrow_batch_rows`` bounds the rows per Arrow batch entering the pandas
    kernels — documents can be MBs each, so batches are kept small enough that
    one batch of worst-case docs fits executor memory (SURVEY.md §4 item 2).
    """
    cpus = DEFAULT_CPUS
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # 2 shuffle partitions per core: enough parallelism for AQE to
        # coalesce down, not so many that task overhead dominates at small SF.
        if master.startswith("local[") and master != "local[*]":
            try:
                cpus = int(master[6:-1])
            except ValueError:
                pass
        shuffle_partitions = max(8, cpus * 2)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", "33554432")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
