"""SparkSession factory tuned for the engine.

AQE on (runtime re-plan + skew-join splitting), Arrow on (every custom
operator is a vectorized pandas/Arrow UDF — no per-row Python anywhere),
shuffle partitions sized to cores rather than the 200 default, UTC session
timezone so DuckDB oracle comparisons are stable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "imtag_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    On a real cluster this factory is bypassed by ``spark-submit`` conf;
    every knob set here is also safe cluster-side.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    n_shuffle = shuffle_partitions or (int(cpus) if str(cpus).isdigit() else 32)

    # Shuffle/spill files on tmpfs when available: this host's /tmp is a
    # virtio disk that serializes under many concurrent shuffle writers —
    # with 32 task threads the disk, not the CPUs, becomes the bottleneck
    # and parallel scaling collapses. On a real cluster the equivalent is
    # NVMe/ramdisk local dirs per executor.
    # Gate the tmpfs default on actual capacity: RAM-backed shuffle dirs on
    # a memory-constrained host would exhaust memory instead of spilling.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        try:
            st = os.statvfs("/dev/shm")
            free_gib = st.f_bavail * st.f_frsize / (1 << 30)
        except OSError:
            free_gib = 0.0
        if free_gib >= 16.0:
            local_dir = "/dev/shm/imtag_spark_local"

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.default.parallelism", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # default 10k Arrow batches fragment multi-million-row partitions
        # into hundreds of IPC round-trips per task; 500k cuts the framing
        # overhead while keeping per-batch memory trivial (~8 MB for two
        # BIGINT columns)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "500000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # iterative graph supersteps re-use shuffle outputs; keep them around
        .config("spark.shuffle.service.enabled", "false")
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
