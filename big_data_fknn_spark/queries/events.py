"""SURVEY.md §2.A6/I — event-time windowing and Structured Streaming.

The reference is pure batch ([R kNN_IS.scala] has no streaming
surface); this module is the driver-mandated streaming extension.
i1–i3 run the event-time operators in BATCH mode (Spark's window /
session_window functions work identically there), which makes them
DuckDB-oracle-checkable; a6/i4–i6 are true `readStream` pipelines
replaying events.parquet through a file source into a memory sink
(engine-specific micro-batch semantics → rows-only checks).

Scale notes: windowed aggregations shuffle on (window, key) — at
100 TB/day the watermark bounds state size, and session windows use
Spark's state-store merge rather than a global sort.  The batch
variants below compile to ordinary hash aggregates after the window
expression expands, so they inherit partial+final aggregation.
"""

from __future__ import annotations

import os
from uuid import uuid4

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_fknn_spark.functions.numeric import davg, dsum, fin_sql, finite
from big_data_fknn_spark.queries import register
from big_data_fknn_spark.streaming import events_stream, run_to_memory
from big_data_fknn_spark.tables import events_t, t, wall_micros, wall_timestamp

# i8's final state is one row per user; lift it to a LocalRelation
# (enabling eager temp-dir cleanup) only below this row count —
# above it the collect() itself would be the driver-memory hazard
# (round-10 advice).  Module-level so tests can exercise the lazy
# branch without synthesizing 100k users.
I8_COLLECT_CAP = 100_000

# --------------------------------------------------------------- A6. source


@register("a6_stream_source", oracle=None)
def a6_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming source → sink round trip: replay events.parquet
    through a file source, project/filter in flight, drain to a
    memory sink.  Rows-only (micro-batch boundaries are engine
    semantics, but the row SET equals the batch read — asserted in
    tests/test_streaming.py)."""
    s = events_stream(spark, sf_dir).where(F.col("value") > 0).select(
        "event_id", "user_id", "event_type"
    )
    return run_to_memory(s, "append")


@register(
    "e9_time_slice",
    oracle=f"""
SELECT event_type,
       count(*) AS n,
       count(DISTINCT user_id) AS n_users,
       round(sum(CAST(value AS DECIMAL(38,10))), 6)::VARCHAR::DOUBLE AS total
FROM events
WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-15'
  AND {fin_sql("value")}
GROUP BY event_type
""",
)
def e9_time_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constant time-range scan — THE dominant access pattern on an
    event store.  The [min, max) predicate is handed to `events_t`,
    which applies it to the RAW parquet column BEFORE the
    normalization cast: the filter reaches the scan as a pushed
    parquet predicate, so row-group stats (and, on a production
    date-partitioned layout, whole partitions) prune instead of
    scanning all history.  Plan-asserted in tests/test_plans.py —
    without the raw-level filter the cast would hide `ts` from
    pushdown and a 100 TB table would be read end-to-end for a
    5-day slice.  Non-finite values gate post-scan (numeric.finite —
    orthogonal to the ts pushdown, which stays on the raw column)."""
    e = events_t(spark, sf_dir, ts_min="2024-01-10", ts_max="2024-01-15").where(
        finite("value")
    )
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        dsum("value").alias("total"),
    )


# ------------------------------------------------- I. event-time windowing


@register(
    "i1_tumbling",
    oracle=f"""
SELECT date_trunc('hour', ts) AS bucket, event_type,
       count(*) AS n,
       round(sum(CAST(value AS DECIMAL(38,10))), 6)::VARCHAR::DOUBLE AS total_value
FROM events
WHERE {fin_sql("value")}
GROUP BY 1, 2
""",
)
def i1_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window (batch mode — identical
    semantics to the streaming plan minus the watermark).  1-hour
    windows align to epoch hours, so DuckDB's date_trunc is the exact
    oracle.  Non-finite values gate at the scan (numeric.finite)."""
    # window over the WALL clock (NTZ): F.window on a session-TZ
    # timestamp aligns buckets to INSTANT epochs, which sit at :30
    # wall marks under a fractional-offset zone like Asia/Kolkata
    # (+05:30) — the round-10 Kolkata drive measured 3376 vs the
    # oracle's 3385 wall-hour buckets.  NTZ windows align to wall
    # hours and the labels render wall under every zone.  (The 15-min
    # slide grid of i2/i14 divides every real zone offset, so those
    # stay instant-aligned safely.)
    e = t(spark, sf_dir, "events").where(finite("value")).withColumn(
        "ts_w", F.col("ts").cast("timestamp_ntz")
    )
    return (
        e.groupBy(F.window("ts_w", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value").alias("total_value"),
        )
        .select(F.col("w.start").alias("bucket"), "event_type", "n", "total_value")
    )


@register(
    "i2_sliding",
    oracle=f"""
WITH base AS (
  SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000) AS b, value
  FROM events
  WHERE {fin_sql("value")}
), expanded AS (
  SELECT b - (k.k * INTERVAL 15 MINUTE) AS win_start, value
  FROM base CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) k
)
SELECT win_start, count(*) AS n,
       round(sum(CAST(value AS DECIMAL(38,10))), 6)::VARCHAR::DOUBLE AS total_value
FROM expanded GROUP BY win_start
""",
)
def i2_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1-hour length, 15-minute slide — every event
    lands in exactly 4 windows.  The oracle expands the window
    assignment explicitly (floor to the slide grid, back-shift k
    slides).  Non-finite values gate at the scan (numeric.finite)."""
    e = t(spark, sf_dir, "events").where(finite("value"))
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value").alias("total_value"),
        )
        .select(F.col("w.start").alias("win_start"), "n", "total_value")
    )


@register(
    "i3_session",
    oracle="""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM numbered GROUP BY user_id, sid
""",
)
def i3_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window (30-minute gap) per user, batch mode.  Oracle
    is the classic gaps-and-islands rewrite.  Spark's session spans
    [first_ts, last_ts + gap): an event at exactly last_ts + 30min
    starts a NEW session, hence `>=` in the oracle's gap test.
    Output is (user, start, count) — session *end* semantics differ
    across engines, so it is deliberately excluded (SURVEY.md §7.5)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


# -------------------------------------------------- I4-I6. true streaming


@register("i4_watermark", oracle=None)
def i4_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming window aggregation: replay events with a
    10-minute watermark and 1-hour tumbling count.  Complete output
    mode so the single availableNow replay emits all windows (append
    would hold them until a later batch advances the watermark — in
    production the stream keeps running and windows finalize
    continuously)."""
    s = events_stream(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("bucket"), "n")
    )
    return run_to_memory(agg, "complete")


@register("i5_stream_dedup", oracle=None)
def i5_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup keyed on event_id within the
    watermark horizon (state is dropped once event-time passes
    event_ts + delay — bounded memory at 100 TB/day, unlike a global
    distinct)."""
    s = events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    deduped = s.dropDuplicatesWithinWatermark(["event_id"]).select(
        "event_id", "user_id", "event_type"
    )
    return run_to_memory(deduped, "append")


@register("i6_stateful", oracle=None)
def i6_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful streaming op (applyInPandasWithState): a
    per-user running aggregate kept in explicit state — event count,
    value sum, last event-time — the custom-operator escape hatch
    when built-in windows can't express the semantics."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id BIGINT, n_events BIGINT, total_value DOUBLE, last_us BIGINT"
    state_schema = "n BIGINT, total DOUBLE, last_us BIGINT"

    def track(key, pdf_iter, state: GroupState):
        n, total, last_us = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
            last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
        state.update((n, total, last_us))
        yield pd.DataFrame(
            [{"user_id": key[0], "n_events": n, "total_value": total, "last_us": last_us}]
        )

    s = events_stream(spark, sf_dir)
    tracked = s.groupBy("user_id").applyInPandasWithState(
        track, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
    return run_to_memory(tracked, "update")


@register(
    "i7_stream_stream_join",
    oracle="""
SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
       epoch_us(p.ts) - epoch_us(v.ts) AS lag_us
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 10 MINUTE
""",
)
def i7_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (view → purchase within 10 min per
    user), batch mode for the oracle; the true streaming variant is
    i7b.  At scale both sides shuffle on user_id and the time bound
    keeps join state finite."""
    e = t(spark, sf_dir, "events")
    v = e.where(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("v_ts")
    )
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    return (
        v.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("v_ts"))
            & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 10 MINUTES")),
        )
        .select(
            "user_id",
            "view_id",
            "purchase_id",
            (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("lag_us"),
        )
    )


@register("i7b_stream_stream_join_live", oracle=None)
def i7b_stream_stream_join_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same interval join as a REAL stream-stream join: both
    sides replayed as streams, watermarked so Spark can expire join
    state (without the watermark + time bound the state store grows
    forever).  Result set equals the batch i7 (tests/test_streaming).
    """
    s = events_stream(spark, sf_dir)
    v = (
        s.where(F.col("event_type") == "view")
        .withWatermark("ts", "10 minutes")
        .select("user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("v_ts"))
    )
    s2 = events_stream(spark, sf_dir)
    p = (
        s2.where(F.col("event_type") == "purchase")
        .withWatermark("ts", "10 minutes")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    joined = v.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 10 MINUTES")),
    ).select("user_id", "view_id", "purchase_id")
    return run_to_memory(joined, "append")


# ------------------------------------- I8. idempotent merge sink


@register(
    "i8_foreachbatch_upsert",
    oracle="""
SELECT user_id, event_id AS last_event_id, epoch_us(ts) AS ts_us,
       event_type, round(value, 6) AS value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
""",
)
def i8_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once-style streaming UPSERT: replay events through a
    file source and maintain "latest event per user" state with a
    foreachBatch merge — the standard pattern for keyed mutable
    state on an append-only lake when a transactional table format
    isn't available.  Each batch writes a NEW state generation
    (read prev ∪ batch → window-dedup → write gen_{id}) instead of
    overwriting the files it is reading; re-running a batch just
    rewrites its generation, so the sink is idempotent.

    Scale: the merge shuffles on user_id only; state stays one row
    per key.  On a real lake the generation swap is a Delta/Iceberg
    MERGE INTO or an atomic manifest pointer update.

    The mechanism is streaming but the final state is deterministic
    (max event time per user, event_id tiebreak) → full SQL oracle,
    ordered on epoch_us because Spark reads these nanos timestamps
    truncated to micros.
    """
    import os
    import tempfile

    stream = events_stream(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="upsert_state_")
    gens: list[str] = []

    def merge(batch: DataFrame, batch_id: int) -> None:
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        cur = batch
        if gens:
            prev = batch.sparkSession.read.parquet(gens[-1])
            cur = prev.unionByName(batch.select(prev.columns))
        out = cur.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
        path = os.path.join(root, f"gen_{batch_id}")
        out.drop("rn").write.mode("overwrite").parquet(path)
        gens.append(path)

    q = (
        stream.writeStream.foreachBatch(merge)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .start()
    )
    q.awaitTermination()

    final = spark.read.parquet(gens[-1]).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        # wall_micros: ts_us is an exported ABSOLUTE epoch (non-UTC drive)
        wall_micros("ts").alias("ts_us"),
        "event_type",
        F.round("value", 6).alias("value"),
    )
    # Tear the generation dirs + checkpoint down without an unbounded
    # driver collect: the state is one row per user, and user
    # cardinality is NOT driver-sized at the scales this repo targets
    # (the round-10 fix traded the /tmp leak — the per-call-leak class
    # the round-6 verdict caught on events_stream and round-9 on the
    # memory-sink ckpt — for an unbounded collect()).  Now: count the
    # state (cheap — it is already deduped), and only lift it into a
    # LocalRelation when it is provably driver-sized; above the cap,
    # return the lazy read and register the temp root for removal at
    # interpreter exit (bounded: one dir per live oversized call, gone
    # when the process ends).  On a real lake the generations are
    # owned table paths compacted by retention, not /tmp.
    import atexit
    import shutil

    if final.count() <= I8_COLLECT_CAP:
        rows = final.collect()
        shutil.rmtree(root, ignore_errors=True)
        return spark.createDataFrame(rows, final.schema)
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    return final


# ---------------------------- I9. transformWithState (Spark 4 API)


@register("i9_transform_with_state", oracle=None)
def i9_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's transformWithStateInPandas — the successor to
    applyInPandasWithState (i6) with named state variables, timers,
    and TTL.  Same semantics as i6 (per-user running count + value
    sum) so tests/test_streaming.py can assert the two APIs and the
    batch groupBy agree; rows-only for the driver (double-sum order
    inside Arrow batches is engine-specific).

    Requires the RocksDB state store; at scale that's the point —
    keyed state spills to local SST files + changelog checkpoints
    instead of executor heap, so per-key state survives 100M+ keys
    per executor.

    DEPENDENCY GATE: the transformWithState Python worker speaks a
    protobuf protocol to the JVM state server, and this container
    lacks `google.protobuf` (installs forbidden).  Without it the
    query falls back to the applyInPandasWithState implementation
    of the SAME per-user aggregate, so the registered semantics are
    identical either way; tests assert both paths against the batch
    answer."""
    import pandas as pd

    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        return _i9_fallback_apply_in_pandas(spark, sf_dir)

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class Track(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.agg = handle.getValueState("agg", "n BIGINT, total DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            n, total = self.agg.get() if self.agg.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self.agg.update((n, total))
            yield pd.DataFrame(
                [{"user_id": key[0], "n_events": n, "total_value": total}]
            )

        def close(self) -> None:
            pass

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        s = events_stream(spark, sf_dir)
        tracked = s.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=Track(),
            outputStructType="user_id BIGINT, n_events BIGINT, total_value DOUBLE",
            outputMode="Update",
            timeMode="None",
        )
        return run_to_memory(tracked, "update")
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def _i9_fallback_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i9's protobuf-free fallback: the identical per-user running
    (count, value-sum) via applyInPandasWithState (i6's API)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def track(key, pdf_iter, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            [{"user_id": key[0], "n_events": n, "total_value": total}]
        )

    s = events_stream(spark, sf_dir)
    tracked = s.groupBy("user_id").applyInPandasWithState(
        track,
        "user_id BIGINT, n_events BIGINT, total_value DOUBLE",
        "n BIGINT, total DOUBLE",
        "update",
        GroupStateTimeout.NoTimeout,
    )
    return run_to_memory(tracked, "update")


# ------------------------------ I10. durable streaming file sink


@register(
    "i10_stream_file_sink",
    oracle="""
SELECT event_id, user_id, event_type FROM events WHERE value > 5
""",
)
def i10_stream_file_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durable end of a streaming pipeline: file-source stream →
    filter/project → PARQUET sink with a checkpoint (availableNow
    trigger), then read the sink back.  Unlike the memory-sink
    demos, this is the production exactly-once path: the sink's
    _spark_metadata commit log names exactly the files of committed
    batches, so a crashed job resumes from the checkpoint without
    duplicating output, and readers ignore half-written files.  The
    committed row SET is deterministic (every source row passes
    through a stateless filter exactly once) → full value oracle.
    """
    import shutil
    import tempfile
    import uuid

    base = os.path.join(
        tempfile.gettempdir(), f"i10_sink_{uuid.uuid4().hex[:12]}"
    )
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")
    s = (
        events_stream(spark, sf_dir)
        .where(F.col("value") > 5)
        .select("event_id", "user_id", "event_type")
    )
    q = (
        s.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


@register(
    "x22_time_rollup_multires",
    oracle=f"""
SELECT CASE WHEN grouping(h) = 0 THEN 'hour'
            WHEN grouping(d) = 0 THEN 'day'
            ELSE 'month' END AS grain,
       coalesce(h, d, m) AS bucket_ts,
       count(*) AS n,
       round(sum(CAST(value AS DECIMAL(38,10))), 6)::VARCHAR::DOUBLE AS total
FROM (SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d,
             date_trunc('month', ts) AS m, value
      FROM events WHERE {fin_sql("value")})
GROUP BY GROUPING SETS ((h), (d), (m))
""",
)
def x22_time_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: hourly, daily, and
    monthly aggregates of the event stream in ONE scan via GROUPING
    SETS — Catalyst's Expand replicates each row once per grain, so
    the input is read once instead of three times.  At 100 TB that's
    the difference between one IO pass and three; the expanded stream
    still combines map-side per grain before the single shuffle.
    grouping() disambiguates which grain each output row belongs to.
    Non-finite values gate at the scan (numeric.finite)."""
    ev = t(spark, sf_dir, "events").where(finite("value")).select(
        F.date_trunc("hour", "ts").alias("h"),
        F.date_trunc("day", "ts").alias("d"),
        F.date_trunc("month", "ts").alias("m"),
        "value",
    )
    view = f"x22_ev_{uuid4().hex}"  # unique per call — concurrent-safe
    ev.createOrReplaceTempView(view)
    out = spark.sql(
        f"""
SELECT CASE WHEN grouping(h) = 0 THEN 'hour'
            WHEN grouping(d) = 0 THEN 'day'
            ELSE 'month' END AS grain,
       coalesce(h, d, m) AS bucket_ts,
       count(*) AS n,
       round(sum(CAST(value AS DECIMAL(38,10))), 6) AS total
FROM {view}
GROUP BY GROUPING SETS ((h), (d), (m))
"""
    ).withColumn("total", F.col("total").cast("double"))
    # spark.sql analyzed the plan eagerly — the DataFrame is bound to
    # the resolved relation, so dropping the view leaks no catalog
    # entry per call while staying concurrent-safe (unique name)
    spark.catalog.dropTempView(view)
    return out


@register(
    "i11_stream_session_live",
    oracle="""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM numbered GROUP BY user_id, sid
""",
)
def i11_stream_session_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE-streaming session window: the live twin of i3 — replayed
    events, 10-minute watermark, per-user 30-minute-gap sessions.
    Session state merges windows as events arrive and finalizes when
    the watermark passes a session's close; complete mode makes the
    single availableNow replay emit every session, so the result
    equals the batch i3 gaps-and-islands rollup exactly — the same
    SQL IS the full value oracle (upgraded from rows-only once the
    replay-equality held across scale factors).  At scale the state
    store holds only open sessions (bounded by active users × gap),
    not history."""
    s = events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    agg = (
        s.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )
    return run_to_memory(agg, "complete")


@register(
    "i12_stream_static_join",
    oracle=f"""
WITH profile AS (
  SELECT user_id,
         round(sum(CAST(value AS DECIMAL(38,10)))::VARCHAR::DOUBLE
               / count(value), 6) AS mean_value
  FROM events WHERE {fin_sql("value")} GROUP BY user_id
)
SELECT e.event_id, e.user_id, e.event_type,
       p.mean_value,
       (e.value > p.mean_value) AS above_mean
FROM events e JOIN profile p ON e.user_id = p.user_id
WHERE {fin_sql("value")}
""",
)
def i12_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join — the most common production streaming
    pattern: each arriving event is enriched against a STATIC
    (batch-computed) per-user profile.  The static side is planned
    once and broadcast/hashed per micro-batch with no state store at
    all (unlike i7b's stream-stream buffering); at 100 TB/day the
    profile refreshes on its own batch cadence while the stream
    only ever touches the current micro-batch.  availableNow replay
    makes the result equal the pure-batch join, which is what the
    oracle checks.

    The profile mean uses the davg device (exact decimal sum /
    non-null count — SQL AVG semantics), NOT F.avg: a double avg is accumulation-order dependent,
    and the round-11 hostile-layout soak caught exactly that — the
    re-grouped parquet moved each engine's summation order
    independently and 8 users' means crossed a 6-dp rounding
    boundary in one engine but not the other.  Non-finite values
    gate at both sides' scan edge (numeric.finite, mirrored in the
    oracle), same as batch-twin i1 — also keeps the above_mean
    comparison out of the engines' divergent NaN ordering."""
    profile = (
        t(spark, sf_dir, "events")
        .where(finite("value"))
        .groupBy("user_id")
        .agg(davg("value").alias("mean_value"))
    )
    s = events_stream(spark, sf_dir).where(finite("value"))
    enriched = s.join(profile, "user_id").select(
        "event_id",
        "user_id",
        "event_type",
        "mean_value",
        (F.col("value") > F.col("mean_value")).alias("above_mean"),
    )
    return run_to_memory(enriched, "append")


@register(
    "x42_latest_snapshot",
    oracle="""
SELECT user_id, event_id AS last_event_id, event_type AS last_type,
       round(value, 6) AS last_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def x42_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog → latest-snapshot read (the batch CDC compaction
    every MERGE-less lake does): newest record per key via a
    descending rank-1 window, tie-broken on event_id so replays and
    engines agree.  WindowGroupLimit pushes the rn=1 filter below
    the shuffle — each map task forwards ONE candidate row per key
    it sees, so the shuffle carries O(keys × tasks) rows, not the
    changelog.  (i8 is this same semantic maintained incrementally
    by a stream.)"""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_type"),
            F.round("value", 6).alias("last_value"),
        )
    )


@register(
    "i13_stream_tumbling_live",
    oracle=f"""
SELECT date_trunc('hour', ts) AS bucket, event_type,
       count(*) AS n,
       round(sum(CAST(value AS DECIMAL(38,10))), 6)::VARCHAR::DOUBLE AS total_value
FROM events
WHERE {fin_sql("value")}
GROUP BY 1, 2
""",
)
def i13_stream_tumbling_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE-streaming tumbling window — the live twin of i1, and
    (unlike i11's data-dependent sessions) FULLY value-oracled:
    1-hour windows align to epoch hours whatever the arrival order,
    so the availableNow replay must equal the batch rollup
    bit-for-bit, decimal sums included.  Watermark 10 minutes bounds
    state exactly as production would (windows finalize and leave the
    store once the watermark passes); complete mode makes the single
    replay surface every window for the oracle.  The streaming agg is
    the same partial+final HashAggregate as i1 per micro-batch, plus
    a state-store merge keyed by (window, event_type) — O(open
    windows × types), never history.  Non-finite values gate at the
    stream's scan edge (numeric.finite), same as batch-twin i1."""
    # wall-aligned windows, streaming edition: watermarks REQUIRE
    # TimestampType (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE rejects NTZ),
    # so unlike batch-twin i1 the wall clock is re-expressed as an
    # INSTANT whose epoch equals the wall epoch (timestamp_micros of
    # wall_micros) — windows then align to wall hours under any
    # session zone, and the watermark still bounds state.  The label
    # converts back to an NTZ wall timestamp at output (an instant
    # label would render through the session zone).
    s = (
        events_stream(spark, sf_dir)
        .where(finite("value"))
        .withColumn("ts_w", F.timestamp_micros(wall_micros("ts")))
        .withWatermark("ts_w", "10 minutes")
    )
    agg = (
        s.groupBy(F.window("ts_w", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value").alias("total_value"),
        )
        .select(
            wall_timestamp(F.unix_micros(F.col("w.start"))).alias("bucket"),
            "event_type",
            "n",
            "total_value",
        )
    )
    return run_to_memory(agg, "complete")


@register(
    "i14_stream_sliding_live",
    oracle=f"""
WITH base AS (
  SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000) AS b, value
  FROM events
  WHERE {fin_sql("value")}
), expanded AS (
  SELECT b - (k.k * INTERVAL 15 MINUTE) AS win_start, value
  FROM base CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) k
)
SELECT win_start, count(*) AS n,
       round(sum(CAST(value AS DECIMAL(38,10))), 6)::VARCHAR::DOUBLE AS total_value
FROM expanded GROUP BY win_start
""",
)
def i14_stream_sliding_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE-streaming sliding window (1 h length / 15 min slide) — the
    live twin of i2, fully value-oracled like i13: slide boundaries
    are epoch-aligned, so every event lands in the same 4 windows
    whatever order the replay delivers it, and the availableNow
    result must equal the batch expansion bit-for-bit.  Watermark
    10 min bounds state to open windows × 4 overlap; each micro-batch
    updates at most (batch span / slide + 4) window rows per key.
    The state-store merge is the only difference from i2's plan —
    identical partial+final agg otherwise.  Non-finite values gate at
    the stream's scan edge (numeric.finite), same as batch-twin i2."""
    s = (
        events_stream(spark, sf_dir)
        .where(finite("value"))
        .withWatermark("ts", "10 minutes")
    )
    agg = (
        s.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value").alias("total_value"),
        )
        .select(F.col("w.start").alias("win_start"), "n", "total_value")
    )
    return run_to_memory(agg, "complete")


def _i15_track(key, pdf_iter, state):
    """Per-user stateful handler for i15 (module-level so the
    ordering guard is unit-testable with a fake GroupState): carries
    ONE (ts_us, event_id, event_type) tuple across micro-batches,
    sorts each batch, stitches the carried event onto the front, and
    RAISES if the batch delivers a row at or before the carried one —
    the checked invariant replacing a silent ordering assumption."""
    import pandas as pd

    frames = [pdf for pdf in pdf_iter]
    ev = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
    if len(ev) == 0:
        return
    ev = ev.assign(ts_us=ev["ts"].astype("int64") // 1000).sort_values(
        ["ts_us", "event_id"], kind="mergesort"
    )
    types = ev["event_type"].tolist()
    if state.exists:
        last_us, last_id, last_type = state.get
        first = ev.iloc[0]
        if (int(first["ts_us"]), int(first["event_id"])) <= (last_us, last_id):
            raise ValueError(
                "i15_stream_transitions_live: batch row at or before the "
                f"carried last event (batch first=({int(first['ts_us'])}, "
                f"{int(first['event_id'])}) vs state=({last_us}, {last_id})) "
                "— replay source violated per-key event-time order; "
                "cross-batch transitions would be wrong"
            )
        types = [last_type] + types
    last = ev.iloc[-1]
    last_type = last["event_type"]
    # carry a missing type as a real NULL — str() would smuggle the
    # string 'None' into the next batch's transition pairs
    state.update(
        (
            int(last["ts_us"]),
            int(last["event_id"]),
            None if pd.isna(last_type) else str(last_type),
        )
    )
    if len(types) < 2:
        return
    counts: dict = {}
    for a, b in zip(types, types[1:]):
        if b is None or pd.isna(b):
            continue  # no destination type → no transition (oracle:
            # WHERE dst IS NOT NULL); a NULL SRC still counts
        a = None if pd.isna(a) else a
        counts[(a, b)] = counts.get((a, b), 0) + 1
    yield pd.DataFrame(
        [
            {"user_id": key[0], "src": a, "dst": b, "n": n}
            for (a, b), n in counts.items()
        ]
    )


@register(
    "i15_stream_transitions_live",
    oracle="""
WITH seq AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events),
c AS (
  SELECT src, dst, count(*) AS n FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2)
SELECT src, dst, n,
       round(n::DOUBLE / sum(n) OVER (PARTITION BY src), 6) AS p
FROM c
""",
)
def i15_stream_transitions_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE-streaming twin of x52's Markov transition matrix, FULLY
    value-oracled: a per-user applyInPandasWithState handler buffers
    nothing but the LAST event (ts, id, type) across micro-batches,
    sorts each batch's arrivals by (ts, event_id), stitches the
    carried last event onto the front, and emits per-user (src, dst)
    pair counts; the downstream rollup over the sink is the same
    constant-size |types|² aggregate as x52.  State per key is ONE
    tuple — O(users), never history — which is why this op survives
    any event volume.

    Ordering contract: within-batch order is restored by the sort;
    ACROSS batches the file-replay source delivers whole files in
    order, so the carried last event is never stale (true of the
    single-parquet replay here; a production deployment keyed by a
    log with per-key ordering — Kafka partitions on user_id — gives
    the same guarantee).  That contract is CHECKED, not assumed: the
    handler compares each batch's earliest (ts, event_id) against
    the carried state and raises — failing the stream loudly —
    if a multi-file or reordered replay ever delivers a row at or
    before the stitched last event, instead of silently emitting
    wrong cross-batch transitions."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "user_id BIGINT, src STRING, dst STRING, n BIGINT"
    state_schema = "last_us BIGINT, last_id BIGINT, last_type STRING"

    s = events_stream(spark, sf_dir)
    tracked = s.groupBy("user_id").applyInPandasWithState(
        _i15_track, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
    mem = run_to_memory(tracked, "append")
    tot = Window.partitionBy("src")
    c = mem.groupBy("src", "dst").agg(F.sum("n").alias("n"))
    return c.select(
        "src",
        "dst",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(tot), 6).alias("p"),
    )


_I16_D = 4
_I16_W = 64
_I16_PROBE_MOD = 37


@register(
    "i16_stream_countmin_live",
    oracle=f"""
WITH rows_ AS (SELECT unnest(generate_series(0, {_I16_D - 1})) AS r),
hashed AS (
  SELECT user_id, r,
         ('0x' || substr(md5(r || '#' || user_id), 1, 8))::BIGINT % {_I16_W} AS b
  FROM events CROSS JOIN rows_),
counters AS (SELECT r, b, count(*) AS c FROM hashed GROUP BY r, b),
probes AS (
  SELECT DISTINCT user_id FROM events WHERE user_id % {_I16_PROBE_MOD} = 0),
pbuckets AS (
  SELECT user_id, r,
         ('0x' || substr(md5(r || '#' || user_id), 1, 8))::BIGINT % {_I16_W} AS b
  FROM probes CROSS JOIN rows_),
est AS (
  SELECT p.user_id, min(coalesce(c.c, 0))::BIGINT AS est_n
  FROM pbuckets p LEFT JOIN counters c ON c.r = p.r AND c.b = p.b
  GROUP BY p.user_id),
tru AS (
  SELECT user_id, count(*) AS true_n FROM events
  WHERE user_id % {_I16_PROBE_MOD} = 0 GROUP BY user_id)
SELECT e.user_id, t.true_n, e.est_n
FROM est e JOIN tru t ON t.user_id = e.user_id
""",
)
def i16_stream_countmin_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE-streaming Count-Min sketch, fully value-oracled: the d22
    construction (d=4 md5-hash rows × w=64 counters) built as a
    STREAMING aggregation over replayed events — counter merge is
    addition, the definitional mergeable-sketch property, so
    micro-batch partials combine into exactly the batch sketch
    whatever the batch boundaries.  The drained counter table is
    then probed batch-side (broadcast against d·w = 256 rows) for
    per-user frequency estimates, compared to true counts; est ≥
    true always, equality when no collision.

    Scale: streaming state is d·w counters TOTAL (not per key!) —
    the sketch answers heavy-hitter frequency queries over unbounded
    streams in constant memory, the use case CMS was built for."""
    s = events_stream(spark, sf_dir)

    def bucket(col, r):
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{r}#"), col)), 1, 8), 16, 10
            ).cast("long")
            % _I16_W
        )

    hashed = s.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(r).alias("r"), bucket(F.col("user_id"), r).alias("b"))
                    for r in range(_I16_D)
                ]
            )
        ).alias("h")
    ).select(F.col("h.r").alias("r"), F.col("h.b").alias("b"))
    counters = run_to_memory(
        hashed.groupBy("r", "b").agg(F.count(F.lit(1)).alias("c")), "complete"
    )

    e = t(spark, sf_dir, "events")
    probes = (
        e.where(F.col("user_id") % _I16_PROBE_MOD == 0)
        .select("user_id")
        .distinct()
    )
    pbuckets = probes.select(
        "user_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(r).alias("r"), bucket(F.col("user_id"), r).alias("b"))
                    for r in range(_I16_D)
                ]
            )
        ).alias("h"),
    ).select("user_id", F.col("h.r").alias("r"), F.col("h.b").alias("b"))
    est = (
        pbuckets.join(F.broadcast(counters), ["r", "b"], "left")
        .groupBy("user_id")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_n"))
    )
    tru = (
        e.where(F.col("user_id") % _I16_PROBE_MOD == 0)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_n"))
    )
    return est.join(F.broadcast(tru), "user_id").select("user_id", "true_n", "est_n")


@register(
    "i17_stream_bitmap_live",
    oracle="""
SELECT user_id,
       bit_or(1::BIGINT << date_diff('day', DATE '2024-01-01', ts::DATE))
         AS day_bitmap,
       bit_count(bit_or(1::BIGINT << date_diff('day', DATE '2024-01-01', ts::DATE)))::INT
         AS active_days
FROM events GROUP BY user_id
""",
)
def i17_stream_bitmap_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE-streaming twin of x55's bitmap-index distinct days,
    fully value-oracled: bit_or is associative/commutative/
    idempotent, so per-micro-batch partial masks merge into exactly
    the batch bitmap whatever the batch boundaries — the second
    member (after i16's Count-Min) of the mergeable-aggregate
    streaming family, with 8 BYTES of state per user.  popcount
    happens batch-side on the drained sink.

    Scale: replace-by-key state of one long per user — the streaming
    funnel/retention backbone; distinct-day queries over an
    unbounded stream never re-scan history."""
    s = events_stream(spark, sf_dir).withColumn(
        "mask",
        # range-checked like x55: Spark shiftleft wraps the shift mod
        # 64 (DuckDB << yields 0), so out-of-[0,63] days must FAIL,
        # not silently diverge between the engines
        F.expr(
            "shiftleft(cast(1 as bigint), "
            "CASE WHEN datediff(cast(ts as date), date'2024-01-01') BETWEEN 0 AND 63 "
            "THEN datediff(cast(ts as date), date'2024-01-01') "
            "ELSE raise_error('i17_stream_bitmap_live: day offset outside [0,63] — "
            "chunk the bitmap (roaring)') END)"
        ),
    )
    bmp = run_to_memory(
        s.groupBy("user_id").agg(F.bit_or("mask").alias("day_bitmap")), "complete"
    )
    return bmp.select(
        "user_id",
        "day_bitmap",
        F.bit_count("day_bitmap").cast("int").alias("active_days"),
    )


_I18_WIN = 20
_I18_THRESH = 2.5


@register(
    "i18_stream_zscore_live",
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE value IS NOT NULL AND {fin_sql("value")}),
win AS (
  SELECT user_id, event_id, value,
         sum(CAST(value AS DECIMAL(38,10))) OVER w AS s1,
         sum(CAST(value * value AS DECIMAL(38,10))) OVER w AS s2,
         count(*) OVER w AS n
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY rn
               ROWS BETWEEN {_I18_WIN - 1} PRECEDING AND CURRENT ROW)),
scored AS (
  SELECT user_id, event_id, value,
         (value - s1::VARCHAR::DOUBLE / n)
           / sqrt(s2::VARCHAR::DOUBLE / n - (s1::VARCHAR::DOUBLE / n) * (s1::VARCHAR::DOUBLE / n)) AS z
  FROM win
  WHERE n >= 5 AND s2::VARCHAR::DOUBLE / n - (s1::VARCHAR::DOUBLE / n) * (s1::VARCHAR::DOUBLE / n) > 1e-12)
SELECT user_id, event_id, round(value, 6) AS value, round(z, 6) AS z
FROM scored WHERE abs(z) > {_I18_THRESH}
""",
)
def i18_stream_zscore_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE-streaming twin of x59's rolling z-score monitor, fully
    value-oracled: applyInPandasWithState carries a RING BUFFER of
    the last 20 (rn, value) pairs per user — the canonical bounded
    sliding-window state — sorts each batch's arrivals by (ts,
    event_id), stitches the carried tail in front, and emits every
    event whose value sits > 2.5σ from its trailing-window mean.
    Moments are recomputed per event from ≤ 20 float64 values with
    numpy's pairwise summation replaced by an exact Python-decimal
    accumulation of the SAME rounded doubles the batch oracle sums,
    so the flagged set matches bit-for-bit.

    Scale: state = ≤ 20 doubles per user (vs x59's full-table window
    shuffle) — this is the shape that runs forever on a live
    monitoring stream; the batch twin exists for backfills."""
    from decimal import Decimal

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id BIGINT, event_id BIGINT, value DOUBLE, z DOUBLE"
    state_schema = "tail ARRAY<DOUBLE>"
    W, TH = _I18_WIN, _I18_THRESH
    Q = Decimal("0.0000000001")  # DECIMAL(38,10) pin, the oracle's cast

    def track(key, pdf_iter, state: GroupState):
        frames = [pdf for pdf in pdf_iter]
        ev = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
        if len(ev) == 0:
            return
        ev = ev.assign(ts_us=ev["ts"].astype("int64") // 1000).sort_values(
            ["ts_us", "event_id"], kind="mergesort"
        )
        tail = list(state.get[0]) if state.exists else []
        vals = tail + ev["value"].tolist()
        ids = [None] * len(tail) + ev["event_id"].tolist()
        out = []
        for i in range(len(tail), len(vals)):
            lo = max(0, i - W + 1)
            win = vals[lo : i + 1]
            n = len(win)
            if n < 5:
                continue
            s1 = sum(Decimal(v).quantize(Q) for v in win)  # Decimal(float) = exact binary expansion, what the engines cast
            s2 = sum(Decimal(v * v).quantize(Q) for v in win)
            mean = float(s1) / n
            var = float(s2) / n - mean * mean
            if var <= 1e-12:
                continue
            z = (vals[i] - mean) / var**0.5
            if abs(z) > TH:
                out.append(
                    {
                        "user_id": key[0],
                        "event_id": ids[i],
                        "value": round(vals[i], 6),
                        "z": round(z, 6),
                    }
                )
        state.update(([float(v) for v in vals[-(W - 1):]],))
        if out:
            yield pd.DataFrame(out)

    # the rolling moments are over OBSERVED values: a NULL reading
    # neither fills a window slot nor can be scored (mirrored in the
    # oracle's WHERE; it would also NaN the Decimal accumulation) —
    # and a non-finite reading gates at the scan edge like every
    # measure here (Decimal(inf) raises in the Python kernel)
    s = events_stream(spark, sf_dir).where(
        F.col("value").isNotNull() & finite("value")
    )
    flagged = s.groupBy("user_id").applyInPandasWithState(
        track, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
    return run_to_memory(flagged, "append")


@register(
    "i19_stream_reach_live",
    oracle="""
WITH first_day AS (
  SELECT user_id, min((epoch_us(ts) // 86400000000)::BIGINT) AS d0
  FROM events GROUP BY user_id),
new_by_day AS (
  SELECT d0 AS d, count(*) AS new_users FROM first_day GROUP BY d0)
SELECT make_timestamp(d * 86400000000) AS day, new_users,
       sum(new_users) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)::BIGINT
         AS total_reach
FROM new_by_day
""",
)
def i19_stream_reach_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE-streaming twin of x68's cumulative reach, fully
    value-oracled: per-user first-seen day is a streaming min()
    aggregate — min is the third mergeable-family operator (after
    i16's +, i17's OR), so micro-batch partials collapse to exactly
    the batch answer with ONE long of state per user.  The drained
    first-seen table rolls up to the daily growth curve batch-side.

    Scale: replace-by-key state of 8 bytes per user; the growth
    curve over an unbounded stream never rescans history."""
    s = events_stream(spark, sf_dir)
    # wall_micros, not unix_micros: absolute day buckets (non-UTC drive)
    day = (wall_micros("ts") / 86_400_000_000).cast("long")
    first_day = run_to_memory(
        s.select("user_id", day.alias("d")).groupBy("user_id").agg(
            F.min("d").alias("d0")
        ),
        "complete",
    )
    new_by_day = first_day.groupBy(F.col("d0").alias("d")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return new_by_day.select(
        # NTZ label: instants render through the session zone (non-UTC drive)
        wall_timestamp(F.col("d") * 86_400_000_000).alias("day"),
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("total_reach"),
    )
