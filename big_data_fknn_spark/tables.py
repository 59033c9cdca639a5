"""Parquet table loaders for the driver's testdata star schema.

Tables (TESTDATA.md / FIXTURES.md): region nation customer supplier
part orders lineitem events documents embeddings — one parquet file
per table under /root/testdata/sf{0.001,0.01,0.1}/.

At 100 TB these would be partitioned/bucketed parquet datasets; the
loaders stay the same (`spark.read.parquet` on a directory) — scans
get column pruning + predicate pushdown from Catalyst either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame."""
    if name == "events":
        return events_t(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with `ts` normalized to a session-TZ TIMESTAMP.

    The generator has shipped `ts` as both TIMESTAMP(NANOS) and
    TIMESTAMP(MICROS) parquet across regenerations, so handle either:

    - nanos: Spark 4 rejects them outright ([PARQUET_TYPE_ILLEGAL]);
      the legacy conf reads them as long nanos which we truncate to
      microseconds — bit-identical to DuckDB's ns→µs TIMESTAMP read.
    - micros: arrives as TIMESTAMP_NTZ; a plain cast relabels it as
      session-TZ TIMESTAMP (value-identical — session TZ is UTC,
      session.py) so every downstream window/oracle sees one type.

    Scale note: a cast on `ts` hides it from parquet predicate
    pushdown; at 100 TB the table would be date-partitioned at rest
    so pruning happens on the partition column instead.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(raw.schema["ts"].dataType, LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def embeddings_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings with the float32 vector widened to array<double>.

    float→double widening is exact, so Spark and the DuckDB oracle
    (``embedding::DOUBLE[]``) see bit-identical values — a
    precondition for hash-matching distance math (SURVEY.md §7.1).
    """
    return t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("emb"),
        "label",
    )


def train_test_split(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Deterministic 80/20 split of embeddings (FIXTURES.md §mapping).

    ``vec_id % 5 != 0`` → train, ``== 0`` → test.  Stands in for the
    reference's separate KEEL train/test files; reproducible in both
    engines (unlike randomSplit).
    """
    emb = embeddings_d(spark, sf_dir)
    return emb.where(F.col("vec_id") % 5 != 0), emb.where(F.col("vec_id") % 5 == 0)
