"""Streaming queries (rows-only in the driver) checked against their
batch equivalents: an availableNow file-source replay must produce
exactly the same row SET as the batch read — micro-batching changes
execution, never results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_fknn_spark.queries import load_all
from big_data_fknn_spark.tables import t

SF_DIR = "/root/testdata/sf0.001"

DEFS = load_all()


def rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture(scope="module")
def events_batch(spark):
    return t(spark, SF_DIR, "events").cache()


def test_a6_stream_equals_batch(spark, events_batch):
    got = DEFS["a6_stream_source"].fn(spark, SF_DIR)
    want = events_batch.where(F.col("value") > 0)
    assert rows(got, "event_id", "user_id", "event_type") == rows(
        want, "event_id", "user_id", "event_type"
    )


def test_i4_watermark_equals_batch_windows(spark, events_batch):
    got = DEFS["i4_watermark"].fn(spark, SF_DIR)
    want = (
        events_batch.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("bucket"), "n")
    )
    assert rows(got, "bucket", "n") == rows(want, "bucket", "n")


def test_i5_dedup_keeps_distinct_ids(spark, events_batch):
    got = DEFS["i5_stream_dedup"].fn(spark, SF_DIR)
    n_distinct = events_batch.select("event_id").distinct().count()
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct


def test_i6_stateful_per_user_totals(spark, events_batch):
    got = DEFS["i6_stateful"].fn(spark, SF_DIR)
    want = events_batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.unix_micros("ts")).alias("last_us"),
    )
    assert rows(got, "user_id", "n_events", "last_us") == rows(
        want, "user_id", "n_events", "last_us"
    )


def test_i7b_stream_stream_join_equals_batch(spark):
    got = DEFS["i7b_stream_stream_join_live"].fn(spark, SF_DIR)
    want = DEFS["i7_stream_stream_join"].fn(spark, SF_DIR)
    assert rows(got, "user_id", "view_id", "purchase_id") == rows(
        want, "user_id", "view_id", "purchase_id"
    )


def test_i9_transform_with_state_per_user_totals(spark, events_batch):
    # i9 runs the Spark 4 transformWithState API when protobuf is
    # available, else its applyInPandasWithState fallback — either
    # path must reproduce the batch per-user aggregate (value sums
    # compared at 6dp: double-add order differs per path).
    got = DEFS["i9_transform_with_state"].fn(spark, SF_DIR)
    want = events_batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )
    g = rows(got.withColumn("total_value", F.round("total_value", 6)),
             "user_id", "n_events", "total_value")
    w = rows(want.withColumn("total_value", F.round("total_value", 6)),
             "user_id", "n_events", "total_value")
    assert g == w


def test_live_session_window_equals_batch(spark):
    # i11 (true streaming session window) must produce exactly the
    # batch i3 session set — same users, starts, and counts.
    from big_data_fknn_spark.queries import load_all

    reg = load_all()
    sf = "/root/testdata/sf0.001"
    live = {
        tuple(r) for r in reg["i11_stream_session_live"].fn(spark, sf).collect()
    }
    batch = {tuple(r) for r in reg["i3_session"].fn(spark, sf).collect()}
    assert live == batch
