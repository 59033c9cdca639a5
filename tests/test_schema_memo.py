"""tables.read_table footer-schema memo (r12 batch 7).

The memo skips the per-call parquet footer schema-inference job —
it must never change WHAT is read: identical schema and rows vs a
bare ``spark.read.parquet``, file listing still per-call, and the
memo forgotten at the corpus boundary (``release_query_caches``)
so a table regenerated under the same path is re-inferred.
"""

import os

from pyspark.sql import functions as F

from big_data_fknn_spark import tables
from big_data_fknn_spark.cache import release_query_caches
from big_data_fknn_spark.tables import read_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def test_memo_read_is_identical_to_bare_read(spark):
    path = f"{SF_DIR}/lineitem.parquet"
    bare = spark.read.parquet(path)
    first = read_table(spark, path)   # populates the memo
    memo = read_table(spark, path)    # served from the memo
    assert first.schema == bare.schema
    assert memo.schema == bare.schema
    a = bare.agg(
        F.count("*"), F.sum("l_quantity"), F.sum(F.xxhash64("l_returnflag", "l_shipdate").cast("decimal(38,0)"))
    ).collect()[0]
    b = memo.agg(
        F.count("*"), F.sum("l_quantity"), F.sum(F.xxhash64("l_returnflag", "l_shipdate").cast("decimal(38,0)"))
    ).collect()[0]
    assert tuple(a) == tuple(b)
    key = (spark.sparkContext.applicationId, path)
    assert key in tables._SCHEMA_MEMO


def test_release_query_caches_clears_memo_so_regenerated_table_reinfers(
    spark, tmp_path
):
    path = str(tmp_path / "regen.parquet")
    spark.range(5).select(F.col("id").alias("a")).write.parquet(path)
    assert read_table(spark, path).columns == ["a"]

    # Regenerate under the SAME path with a different schema — the
    # corpus boundary must invalidate the memo, not serve stale "a".
    release_query_caches()
    spark.range(7).select(
        F.col("id").alias("b"), F.lit("x").alias("c")
    ).write.mode("overwrite").parquet(path)
    df = read_table(spark, path)
    assert sorted(df.columns) == ["b", "c"]
    assert df.count() == 7


def test_memo_sees_new_part_files_without_invalidation(spark, tmp_path):
    """Listing stays per-call: appended part files are read even when
    the schema comes from the memo."""
    path = str(tmp_path / "grow.parquet")
    spark.range(3).write.parquet(path)
    assert read_table(spark, path).count() == 3
    spark.range(4).write.mode("append").parquet(path)
    assert read_table(spark, path).count() == 7
