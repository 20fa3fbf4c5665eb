"""SparkSession factory tuned for this engine.

Local-mode testing runs on ``local[N]`` (one JVM); the config below is
chosen so the same logical plans scale to a multi-executor cluster:
AQE handles runtime re-planning (partition coalescing, skew-join
splitting), shuffle partitions default to ~cores locally (on a real
cluster you'd size this to ~2-3x total cores or let AQE coalesce), and
Arrow is enabled for the Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "flink_join_scaling_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    max_partition_bytes: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all cores.
    ``max_partition_bytes`` sizes file-scan splits: leave None (Spark's
    128m) on a real cluster reading TB-scale tables; set small (e.g.
    "8m") when the inputs are tiny relative to cores, else every scan
    collapses to one task and the cluster idles (a 10 MB file at the
    default split size is a single-task scan on 32 cores).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 4)
    if max_partition_bytes is None:
        max_partition_bytes = os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES")
    # Shuffle/spill scratch (spark.local.dir): put it on the fastest
    # local storage available (guide §2.1/§9 — local disk bandwidth and
    # open() latency bound the shuffle). r18 jstack sampling of a
    # query loop showed executor threads spending most of their
    # non-CPU wall in java.io.FileOutputStream.open0 / file-stat
    # syscalls against the default /tmp (ext4-on-virtio here); a
    # RAM-backed dir removed that wait (measured same-session:
    # q_lm_bigram_hashed 2.11 → 1.89 s, q_dedup_minhash 3.28 → 2.45 s
    # medians). Scale note: on YARN/K8s the resource manager OVERRIDES
    # spark.local.dir with container-local dirs, so this default only
    # governs local/standalone mode, where bench/test shuffle volumes
    # are far below the tmpfs size; production standalone deployments
    # point $SPARK_GRAFT_LOCAL_DIR at their NVMe scratch instead.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.access("/dev/shm", os.W_OK):
        local_dir = "/dev/shm/fjss-spark-local"
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    )
    if max_partition_bytes is not None:
        builder = builder.config(
            "spark.sql.files.maxPartitionBytes", max_partition_bytes
        )
    if local_dir is not None:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
