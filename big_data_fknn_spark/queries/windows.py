"""SURVEY.md §2.E/F — window functions, sorts, limits, top-k.

e1 is the reference's central primitive: k nearest per query point.
Spark ≥3.5 plans `row_number ≤ k` as WindowGroupLimit — partial
top-k below the shuffle, exactly the reference's bounded k-list merge
([P kNN-IS §3.3]) built into the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_fknn_spark.functions.numeric import DEC, fin_sql, finite
from big_data_fknn_spark.operators.rank import global_rank, ntile_from_rank
from big_data_fknn_spark.queries import register
from big_data_fknn_spark.tables import t


@register(
    "e1_topk_window",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (
    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def e1_topk_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the kNN top-k shape on relational
    data.  Unique (o_totalprice desc, o_orderkey) tiebreak."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "e2_rank",
    oracle="""
SELECT s_nationkey, s_suppkey,
       rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS rnk,
       dense_rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS drnk
FROM supplier
""",
)
def e2_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank (gap vs no-gap semantics on acctbal ties)."""
    s = t(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc())
    return s.select(
        "s_nationkey",
        "s_suppkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "e3_lag_lead",
    oracle="""
SELECT event_id, user_id,
       lag(event_id) OVER w AS prev_id,
       epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us,
       lead(event_type) OVER w AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def e3_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over per-user event sequences (gap analysis)."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.lag("event_id").over(w).alias("prev_id"),
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "e4_frame_running",
    oracle=f"""
SELECT o_custkey, o_orderkey,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
         AS running_spend_c,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / (100 * count(*) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) AS avg3
FROM orders
WHERE {fin_sql("o_totalprice")}
""",
)
def e4_frame_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit frame specs: running total + trailing 3-row average.

    Money quantizes to exact integer CENTS before the windows (x58's
    centi-unit device), so every running total is pure int64
    arithmetic — immune to frame evaluation order AND to the
    decimal→double conversion itself: round-8's extremes sweep pinned
    a 1-ulp split where Spark converts DECIMAL(38,10) correctly
    rounded (BigDecimal.doubleValue) while DuckDB computes
    int128→double / 1e10 — two roundings — so even UNROUNDED doubles
    of the identical exact decimal diverge at ≥1e12.  avg3 is one
    int→double conversion (exact below 2^53) and one IEEE division on
    identical operands.  Non-finite prices gate at the scan
    (numeric.finite), and the running sums accumulate in DECIMAL(38,0)
    mirroring DuckDB's HUGEINT window accumulator — int64 would wrap
    silently past 2^63 while the oracle render raises (round-9 ADVICE
    posture; render back to BIGINT/double at the edge)."""
    o = t(spark, sf_dir, "orders").where(finite("o_totalprice"))
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    last3 = w.rowsBetween(-2, 0)
    cents = F.round(F.col("o_totalprice") * 100).cast("decimal(38,0)")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(cents).over(run).cast("long").alias("running_spend_c"),
        (
            F.sum(cents).over(last3).cast("double")
            / (100 * F.count(F.lit(1)).over(last3))
        ).alias("avg3"),
    )


@register(
    "e5_pct",
    oracle="""
SELECT c_custkey,
       round(percent_rank() OVER (ORDER BY c_acctbal NULLS FIRST, c_custkey), 6) AS pct,
       ntile(4) OVER (ORDER BY c_acctbal NULLS FIRST, c_custkey) AS quartile
FROM customer
""",
)
def e5_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / ntile over a global total order (unique key
    appended so both engines tile identically).

    Routed through operators/rank.py's range-bucketed global_rank —
    a bare ``Window.orderBy`` plans as ``Exchange SinglePartition``
    (all customers through ONE task); the bucketed rank keeps every
    exchange hash-partitioned.  percent_rank = (rank−1)/(n−1) and
    ntile derive exactly from the rank + driver-known total."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    gr = global_rank(c, [("c_acctbal", True), ("c_custkey", True)], rank_col="__r")
    ranked, total = gr.df, gr.total
    denom = float(max(total - 1, 1))
    return ranked.select(
        "c_custkey",
        F.round((F.col("__r") - 1) / F.lit(denom), 6).alias("pct"),
        ntile_from_rank(F.col("__r"), total, 4).alias("quartile"),
    )


@register(
    "f1_sort",
    oracle="""
SELECT row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS pos, c_custkey
FROM customer
""",
)
def f1_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort made hash-observable: emit each row's position in
    the total order — via the range-bucketed global_rank (bucket on
    acctbal, local row_number per bucket + broadcast offsets), NOT a
    bare ``Window.orderBy`` whose physical plan is a single-partition
    exchange of the whole table."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ranked = global_rank(
        c, [(F.col("c_acctbal"), False), ("c_custkey", True)], rank_col="pos"
    ).df
    return ranked.select("pos", "c_custkey")


@register(
    "f2_global_topk",
    oracle="""
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""",
)
def f2_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT → TakeOrderedAndProject (per-partition top-k,
    merge on driver — no global sort materialized)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "f3_sort_within",
    oracle="SELECT event_id, user_id, event_type FROM events",
)
def f3_sort_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sortWithinPartitions after a hash repartition: partition-local
    order (the reference's per-partition candidate ordering).  Row
    *content* is unchanged — which is exactly what the
    order-insensitive oracle verifies."""
    e = t(spark, sf_dir, "events")
    return (
        e.repartition(8, "user_id")
        .sortWithinPartitions("ts")
        .select("event_id", "user_id", "event_type")
    )


@register(
    "e6_value_fns",
    oracle="""
SELECT o_custkey, o_orderkey,
       first_value(o_totalprice) OVER w AS first_price,
       last_value(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS last_price,
       nth_value(o_totalprice, 2) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS second_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def e6_value_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window value functions: first/last/nth order price per
    customer.  last/nth need the full-partition frame (the default
    frame ends at CURRENT ROW in both engines); the (date, key)
    order makes every pick deterministic.  No value arithmetic —
    prices pass through untouched, so no decimal guard is needed.
    """
    o = t(spark, sf_dir, "orders")
    order = [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()]
    grow = Window.partitionBy("o_custkey").orderBy(*order)
    full = grow.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(grow).alias("first_price"),
        F.last("o_totalprice").over(full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(full).alias("second_price"),
    )


@register(
    "f4_offset",
    oracle="""
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 40
""",
)
def f4_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset-free pagination: ORDER BY + OFFSET + LIMIT (page 3 of
    20).  Spark plans offset+limit over a sorted stream as a single
    TakeOrderedAndProject of the first offset+limit rows, then drops
    the prefix — no global sort materialized.  The unique
    (price, orderkey) sort key makes every page boundary
    deterministic in both engines.  Scale note: OFFSET cost grows
    with the offset (the first offset+limit rows are still
    collected); deep pagination at 100 TB should switch to keyset
    (WHERE sortkey > last_seen) — same plan as f2."""
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(40)
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "e7_cume_dist",
    oracle="""
SELECT c_custkey, c_mktsegment,
       round(cume_dist() OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal NULLS FIRST), 6) AS cd
FROM customer
WHERE c_custkey <= 300
""",
)
def e7_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist — fraction of partition rows ordered at-or-below the
    current row.  Rank-family semantics make it tie-stable (equal
    order keys share one value), so no synthetic tiebreaker is needed
    for cross-engine parity, unlike row_number.  One shuffle on the
    partition key, sort within, single pass."""
    c = t(spark, sf_dir, "customer").where(F.col("c_custkey") <= 300)
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@register(
    "e8_range_frame",
    oracle=f"""
SELECT event_id, user_id,
       count(*) OVER w AS n_1h,
       round(sum(CAST(value AS DECIMAL(38,10))) OVER w, 6)::VARCHAR::DOUBLE AS sum_1h
FROM events
WHERE {fin_sql("value")}
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
)
def e8_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event TIME (trailing 1 hour per user) — the
    sliding aggregate without exploding rows into buckets (contrast
    i2's hop windows): each row's frame is defined by the value of
    its epoch-MICROsecond order key (full timestamp precision — a
    whole-second key would silently widen the frame for sub-second
    data), and rows with equal timestamps are peers sharing one
    frame, which makes the result deterministic without a
    tiebreaker.  One shuffle on user_id, sort within, one pass — at
    100 TB this is the per-entity rolling feature builder (rate
    limits, trailing spend, burst detection).  Non-finite values gate
    at the scan (functions/numeric.py finite)."""
    e = t(spark, sf_dir, "events").where(finite("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(F.sum(F.col("value").cast(DEC)).over(w), 6)
        .cast("double")
        .alias("sum_1h"),
    )
