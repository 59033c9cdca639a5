"""SparkSession factory.

Local-mode settings mirror what a 1000-executor cluster deployment
would set per-executor: AQE on (runtime shuffle-partition coalescing
+ skew-join splitting), Arrow transfers on, UTC session timezone so
timestamp comparisons against the DuckDB oracle are stable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "big_data_fknn_spark", cpus: int | None = None) -> SparkSession:
    """Create (or reuse) a SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all local cores.  On a
    real cluster these configs move to spark-submit; nothing here is
    local-only except the master URL.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    # BLAS threading in Python workers — measured BOTH ways this
    # round (tools/key_timer.py + a direct matmul probe): with the
    # kernel running as ONE task (the bench's single-row-group scans
    # produce single-task kernels), OpenBLAS's own threading IS the
    # intra-host parallelism — the 2000×64×6667 distance matmul runs
    # ~0.013 s unpinned vs 0.050 s pinned, and pinning regressed j9's
    # exec 0.25 s → 0.41 s.  Oversubscription (guide §4.5) only bites
    # when MANY tasks each spin a pool; that is a deployment where
    # executors run `spark.executor.cores` concurrent tasks, and the
    # right production setting is spark.executorEnv.OPENBLAS_NUM_THREADS
    # ≈ host_cores / executor_cores in spark-submit conf — a cluster
    # knob, deliberately NOT forced here where it un-parallelizes the
    # local single-task kernels the bench actually runs.
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 4)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Spark 4 defaults ANSI on; pin it explicitly so the engine's
        # semantics (overflow raises, bad casts raise — the admission
        # gates exist so clean-data plans never hit either) don't
        # silently flip on a cluster deployed with the legacy default.
        # Every sweep/test/bench in this repo ran with ANSI on.
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # local mode: the driver JVM IS the executor — give it real
        # memory (the box has 128 GiB; shuffles spill if exceeded)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
