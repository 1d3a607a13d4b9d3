"""SparkSession factory.

Defaults are tuned for correctness + scale-mindedness:
- AQE on (runtime re-plan, skew-join splitting, partition coalescing)
- Arrow on (vectorized pandas UDF transfer; the input_hint mandates
  no per-row Python in the extraction path)
- shuffle partitions configurable (tests use small counts; a real
  cluster run would size this to ~2-3x total cores)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("FS_SHUFFLE_PARTITIONS", "32"))


def get_spark(
    app_name: str = "fundamental-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config."""
    master = master or os.environ.get("FS_MASTER", "local[*]")
    shuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # size-based coalescing: without this AQE keeps ~2x cores partitions
        # even for KB-sized shuffles, and task dispatch dominates small stages
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("FS_ADVISORY_PARTITION_BYTES", "16m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("FS_ARROW_BATCH", "2000"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("FS_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # shuffle/spill on tmpfs when available (single-node local mode);
    # a real cluster would use NVMe-backed local dirs per executor
    shm = os.environ.get("FS_LOCAL_DIR", "/dev/shm/fs_spark_local")
    if shm and os.path.isdir(os.path.dirname(shm) or "/"):
        os.makedirs(shm, exist_ok=True)
        builder = builder.config("spark.local.dir", shm)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
