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
    # Single-threaded BLAS inside every Python worker (round-12,
    # guide §4.5): Spark tasks are the parallelism unit — `cpus`
    # concurrent tasks each spawning an OpenBLAS/OMP thread pool
    # oversubscribes the host by N× and the pools' spin-waits fight
    # the scheduler (measured here: one 2000×6667×64 matmul 2.7 s
    # with OpenBLAS threading vs 0.055 s pinned to one thread — the
    # BLAS kNN kernel was paying that on every Arrow batch).  Pin via
    # env BEFORE the JVM forks so local-mode workers inherit it; the
    # executorEnv conf carries the same pin to real clusters.
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
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
        # cluster mirror of the BLAS pin above (local workers inherit
        # the process env; separate-JVM executors need the conf)
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
        .config("spark.ui.enabled", "false")
        # local mode: the driver JVM IS the executor — give it real
        # memory (the box has 128 GiB; shuffles spill if exceeded)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
