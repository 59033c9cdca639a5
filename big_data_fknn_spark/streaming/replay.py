"""File-source replay + memory-sink drain for streaming queries.

Spark's file stream source monitors a *directory*; the single-file
testdata is exposed through a throwaway symlink dir.  ``availableNow``
triggers process the full backlog then stop, so batch harnesses (the
grading driver, pytest) get a terminating query whose result set is
identical to the batch read (asserted in tests/test_streaming.py).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Raw parquet schema of events.parquet with ts read as long nanos
# (Spark 4 rejects TIMESTAMP(NANOS); see tables.events_t).
EVENTS_RAW = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a file-source stream with a proper timestamp."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src_dir = tempfile.mkdtemp(prefix="events_stream_")
    os.symlink(f"{sf_dir}/events.parquet", f"{src_dir}/events.parquet")
    raw = spark.readStream.schema(EVENTS_RAW).parquet(src_dir)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def run_to_memory(stream_df: DataFrame, mode: str) -> DataFrame:
    """Drain a streaming DataFrame into a memory sink, return the table.

    Each run gets a unique sink name + throwaway checkpoint so
    repeated invocations (driver, tests, bench) never collide.
    """
    name = f"sink_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix=f"ckpt_{name}_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)
