"""SURVEY.md §2 A/B/C/G/H — scans, predicates, joins, set ops, scalars.

The reference's relational surface is implicit (KEEL text parsing,
broadcast side inputs, theta self-join exclusion — [R KeelParser.scala,
kNN_IS.scala]); the rest is the driver-mandated complete-engine
surface.  Every query here is a pure Catalyst plan: filters and
projections push to the parquet scan, dimension joins broadcast,
large joins sort-merge under AQE.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from uuid import uuid4

from big_data_fknn_spark.functions.distance import euclidean, manhattan
from big_data_fknn_spark.functions.numeric import (
    cents_sum,
    davg,
    dsum,
    fin_sql,
    finite,
)
from big_data_fknn_spark.queries import register
from big_data_fknn_spark.tables import EMB_ADMIT_SQL, t

# ---------------------------------------------------------------- A. scans


@register(
    "a1_scan_parquet",
    oracle="""
SELECT l_orderkey, l_partkey, l_quantity
FROM lineitem WHERE l_quantity >= 49
""",
)
def a1_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar scan with projection+filter pushed into the reader.

    `.explain` shows PushedFilters: [GreaterThanOrEqual(l_quantity,49)]
    and ReadSchema with only the 3 needed columns — at 100 TB this is
    the difference between reading 3 columns and reading 11.
    """
    return (
        t(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") >= 49)
        .select("l_orderkey", "l_partkey", "l_quantity")
    )


# Fixed inline micro-dataset for the external-format scans (a2/a3):
# the query writes it to a temp file at run time, the oracle carries
# the same rows as VALUES — no dependency on oracle-side file access.
_A2_ROWS = [
    (1, "alpha", 3.5),
    (2, "beta", -1.25),
    (3, "gamma", 0.0),
    (4, "delta", 99.875),
    (5, "epsilon", 7.0),
]
_A23_ORACLE = """
SELECT id, name, score::DOUBLE AS score FROM (VALUES
  (1, 'alpha', 3.5), (2, 'beta', -1.25), (3, 'gamma', 0.0),
  (4, 'delta', 99.875), (5, 'epsilon', 7.0)
) AS v(id, name, score)
"""


def _tmp_path(name: str) -> str:
    # Per-process scratch dir: a concurrently running second harness
    # (pytest next to the grading driver) must never overwrite the
    # files another process is mid-read on.  Within one process the
    # path is stable, which the file-count assertions rely on.
    d = os.path.join(tempfile.gettempdir(), f"bdfknn_io_{os.getpid()}")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, name)


@register("a2_scan_csv_schema", oracle=_A23_ORACLE)
def a2_scan_csv_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV scan with an explicit schema — the reference's KEEL-style
    externally-declared schema ([R KeelParser.parserHeaderFile]): no
    inference, types fixed up front."""
    path = _tmp_path("a2.csv")
    with open(path, "w") as f:
        for r in _A2_ROWS:
            f.write(f"{r[0]},{r[1]},{r[2]}\n")
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    return spark.read.schema(schema).csv(path)


@register("a3_schema_declared", oracle=_A23_ORACLE)
def a3_schema_declared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines scan with a declared StructType (schema-on-read
    without inference)."""
    path = _tmp_path("a3.jsonl")
    with open(path, "w") as f:
        for r in _A2_ROWS:
            f.write('{"id": %d, "name": "%s", "score": %s}\n' % r)
    schema = "id INT, name STRING, score DOUBLE"
    return spark.read.schema(schema).json(path)


@register(
    "a4_sink_parquet",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
""",
)
def a4_sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize → re-scan round trip (the reference's
    saveAsTextFile sink, parquet-native).  Correctness check: the
    round-tripped rows equal the source selection."""
    out = _tmp_path("a4_sink.parquet")
    (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite")
        .parquet(out)
    )
    return spark.read.parquet(out)


@register(
    "a5_broadcast_side",
    oracle=f"""
SELECT n.n_name, count(*) AS n_cust,
       round(sum(CAST(c.c_acctbal AS DECIMAL(38,10))), 6)::VARCHAR::DOUBLE AS bal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE {fin_sql("c.c_acctbal")}
GROUP BY n.n_name
""",
)
def a5_broadcast_side(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast side input — the reference's core distribution trick
    (sc.broadcast(testChunk), [P kNN-IS §3.2]) as a broadcast-hash
    join against the 25-row nation dim.  Non-finite balances are
    gated at the scan (functions/numeric.py finite — the exact-decimal
    sum has no ±Inf/NaN representation); NULLs keep flowing."""
    c = t(spark, sf_dir, "customer").where(finite("c_acctbal"))
    n = t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            dsum("c_acctbal").alias("bal"),
        )
    )


# ------------------------------------------------------------ B. predicates


@register("b1_project", oracle="SELECT c_custkey, c_mktsegment FROM customer")
def b1_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure projection (column pruning reaches the scan)."""
    return t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")


@register(
    "b2_filter_pred",
    oracle="""
SELECT l_orderkey, l_linenumber
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""",
)
def b2_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate (TPC-H Q6 shape) — range + between + comparison,
    all pushed down (the reference's only predicate is the
    leave-one-out guard, [P FkNN-BD §III])."""
    li = t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).select("l_orderkey", "l_linenumber")


@register(
    "b3_derived_col",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge
FROM lineitem WHERE l_returnflag = 'R'
""",
)
def b3_derived_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed column (the reference's per-pair distance expression
    generalized)."""
    li = t(spark, sf_dir, "lineitem")
    charge = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    return li.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_linenumber", F.round(charge, 6).alias("charge")
    )


@register(
    "b4_null_semantics",
    oracle="""
SELECT c.c_custkey,
       o.o_orderkey IS NULL AS no_order,
       coalesce(o.o_totalprice, -1.0) AS price_or_default,
       c.c_nationkey IS NOT DISTINCT FROM o.o_orderkey AS weird_eq
FROM customer c LEFT JOIN orders o
  ON c.c_custkey = o.o_custkey AND o.o_totalprice > 450000
""",
)
def b4_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe predicates: IS NULL, coalesce, null-safe equality
    (eqNullSafe ≡ IS NOT DISTINCT FROM) over outer-join-produced nulls."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    j = c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 450000), "left"
    )
    return j.select(
        "c_custkey",
        F.col("o_orderkey").isNull().alias("no_order"),
        F.coalesce(F.col("o_totalprice"), F.lit(-1.0)).alias("price_or_default"),
        F.col("c_nationkey").eqNullSafe(F.col("o_orderkey")).alias("weird_eq"),
    )


# ---------------------------------------------------------------- C. joins


@register(
    "c1_bnl_cross",
    oracle="""
SELECT n.n_nationkey, r.r_regionkey, n.n_name, r.r_name
FROM nation n CROSS JOIN region r
""",
)
def c1_bnl_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast nested-loop cross join — the reference's core join
    shape (every test×train pair scored, [P kNN-IS §3.2]).  The
    full-scale variant is the kNN itself (j1/j3); this is the minimal
    relational demonstration."""
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return n.crossJoin(F.broadcast(r)).select(
        "n_nationkey", "r_regionkey", "n_name", "r_name"
    )


@register(
    "c2_theta_join",
    oracle="""
SELECT a.s_suppkey AS s1, b.s_suppkey AS s2, a.s_nationkey AS nat,
       round(abs(a.s_acctbal - b.s_acctbal), 6) AS bal_gap
FROM supplier a JOIN supplier b
  ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
""",
)
def c2_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi theta self-join (the reference's self-pair exclusion
    `a.id <> b.id` generalized to `<` pair enumeration)."""
    s = t(spark, sf_dir, "supplier")
    a = s.select(
        F.col("s_suppkey").alias("s1"),
        F.col("s_nationkey").alias("nat"),
        F.col("s_acctbal").alias("bal_a"),
    )
    b = s.select(
        F.col("s_suppkey").alias("s2"),
        F.col("s_nationkey").alias("nat_b"),
        F.col("s_acctbal").alias("bal_b"),
    )
    return (
        a.join(b, (F.col("nat") == F.col("nat_b")) & (F.col("s1") < F.col("s2")))
        .select(
            "s1",
            "s2",
            "nat",
            F.round(F.abs(F.col("bal_a") - F.col("bal_b")), 6).alias("bal_gap"),
        )
    )


@register(
    "c3_hash_inner",
    oracle=f"""
SELECT c.c_mktsegment, count(*) AS n_orders,
       sum(CAST(round(o.o_totalprice * 100) AS BIGINT))::BIGINT AS revenue_c
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE {fin_sql("o.o_totalprice")}
GROUP BY c.c_mktsegment
""",
)
def c3_hash_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join (shuffled hash / SMJ picked by AQE) + agg.

    Revenue is exact integer CENTS (x58's centi-unit device): a ≥1e12
    total breaks round(x, 6) — ~19 significant digits, past double
    precision — and, as round-8's extremes sweep pinned, even the
    UNROUNDED decimal→double conversion splits by 1 ulp between
    Spark's correctly-rounded BigDecimal.doubleValue and DuckDB's
    int128→double / 1e10 double-rounding.  Integer sums are immune to
    both.  Non-finite prices gate at the scan (numeric.finite) and the
    total accumulates in DECIMAL(38,0) mirroring the oracle's HUGEINT
    (numeric.cents_sum — round-9 ADVICE items)."""
    o = t(spark, sf_dir, "orders").where(finite("o_totalprice"))
    c = t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            cents_sum("o_totalprice").alias("revenue_c"),
        )
    )


@register(
    "c4_broadcast_hash",
    oracle=f"""
SELECT p.p_brand, count(*) AS n_items,
       round(sum(CAST(l.l_quantity AS DECIMAL(38,10))), 6)::VARCHAR::DOUBLE AS qty
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_size <= 10 AND {fin_sql("l.l_quantity")}
GROUP BY p.p_brand
""",
)
def c4_broadcast_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast(dim): the filtered part dim ships to every
    executor; the 100-TB lineitem side never shuffles for the join.
    Non-finite quantities gate at the scan (numeric.finite — on the
    round-8 extremes data they happened to join away; the gate makes
    that structural, not luck)."""
    li = t(spark, sf_dir, "lineitem").where(finite("l_quantity"))
    p = t(spark, sf_dir, "part").where(F.col("p_size") <= 10)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity").alias("qty"),
        )
    )


@register(
    "c5_sort_merge",
    oracle=f"""
SELECT o.o_orderstatus, count(*) AS n,
       round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,10))), 6)::VARCHAR::DOUBLE AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE {fin_sql("l.l_extendedprice")}
GROUP BY o.o_orderstatus
""",
)
def c5_sort_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large⋈large sort-merge join (MERGE hint pins SMJ — the shape
    AQE picks anyway once both sides exceed the broadcast threshold).
    Non-finite prices gate at the scan (functions/numeric.py finite)."""
    li = t(spark, sf_dir, "lineitem").where(finite("l_extendedprice"))
    o = t(spark, sf_dir, "orders").hint("merge")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
    )


@register(
    "c6_outer",
    # exact integer cents (c3's device): a single customer's spend can
    # reach ≥1e12, past the decimal→double-safe render magnitude
    oracle=f"""
SELECT c.c_custkey, count(o.o_orderkey) AS n_orders,
       coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0)::BIGINT AS spend_c
FROM customer c LEFT JOIN (SELECT * FROM orders
                           WHERE {fin_sql("o_totalprice")}) o
  ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey
""",
)
def c6_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (count=0).
    Non-finite prices gate the orders side BEFORE the join (a customer
    whose only orders are non-conforming reports count=0, spend=0 —
    the admission contract drops the row, not the customer); spend
    accumulates in DECIMAL(38,0) (numeric.cents_sum)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(finite("o_totalprice"))
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                cents_sum("o_totalprice"),
                F.lit(0).cast("long"),
            ).alias("spend_c"),
        )
    )


@register(
    "c7_semi",
    oracle="""
SELECT c_custkey, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
""",
)
def c7_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS): customers with ≥1 finished order."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "c8_anti",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def c8_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS): customers with no orders — also
    the dedup survivor-check shape."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "c9_range_join",
    oracle="""
SELECT e1.user_id, e1.event_id AS first_id, e2.event_id AS next_id,
       epoch_us(e2.ts) - epoch_us(e1.ts) AS gap_us
FROM events e1 JOIN events e2
  ON e1.user_id = e2.user_id
 AND e1.event_type = 'signup' AND e2.event_type = 'purchase'
 AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 30 MINUTE
""",
)
def c9_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join: purchases within 30min after a signup by
    the same user.  Equi key (user_id) keeps it a hash join with a
    range residual — at 100 TB add time-bucketing on both sides so
    the range residual only scans adjacent buckets."""
    e = t(spark, sf_dir, "events")
    e1 = e.where(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("first_id"), F.col("ts").alias("ts1")
    )
    e2 = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u2"),
        F.col("event_id").alias("next_id"),
        F.col("ts").alias("ts2"),
    )
    j = e1.join(
        e2,
        (F.col("user_id") == F.col("u2"))
        & (F.col("ts2") > F.col("ts1"))
        & (F.col("ts2") <= F.col("ts1") + F.expr("INTERVAL 30 MINUTES")),
    )
    return j.select(
        "user_id",
        "first_id",
        "next_id",
        (F.unix_micros("ts2") - F.unix_micros("ts1")).alias("gap_us"),
    )


@register(
    "c10_asof",
    oracle="""
WITH u AS (
  SELECT user_id, ts, event_id, event_type FROM events
  WHERE event_type IN ('click', 'purchase')
),
pairs AS (
  SELECT p.event_id AS purchase_id, p.user_id, p.ts AS pts,
         c.event_id AS click_id, c.ts AS cts
  FROM u p JOIN u c
    ON p.user_id = c.user_id AND p.event_type = 'purchase'
   AND c.event_type = 'click' AND c.ts <= p.ts
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY purchase_id ORDER BY cts DESC, click_id DESC) AS rn
  FROM pairs
)
SELECT purchase_id, user_id, click_id,
       epoch_us(pts) - epoch_us(cts) AS age_us
FROM r WHERE rn = 1
""",
)
def c10_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest click at-or-before it
    by the same user (Spark has no native ASOF — SURVEY.md §2 c10).

    Implemented with the union+window trick: tag both sides, sort per
    user by (ts, side, event_id), carry the last click forward with
    last_value(ignore nulls).  One shuffle on user_id, no pair
    blow-up — this is the 100-TB shape (the naive join+filter
    materializes every click×purchase pair first).
    """
    e = t(spark, sf_dir, "events")
    u = e.where(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        # side: clicks sort before purchases at equal ts (c.ts <= p.ts)
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "user_id",
        "ts",
        "event_id",
        "side",
        F.last(
            F.when(F.col("side") == 0, F.col("event_id")), ignorenulls=True
        ).over(w).alias("click_id"),
        F.last(F.when(F.col("side") == 0, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("cts"),
    )
    return (
        carried.where((F.col("side") == 1) & F.col("click_id").isNotNull())
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "click_id",
            (F.unix_micros("ts") - F.unix_micros("cts")).alias("age_us"),
        )
    )


# ------------------------------------------------------------- G. set ops


@register(
    "g1_union_all",
    oracle="""
SELECT o_orderkey, o_custkey, 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
UNION ALL
SELECT o_orderkey, o_custkey, 'big' AS src FROM orders WHERE o_totalprice > 400000
""",
)
def g1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — the reference's per-chunk result concatenation
    ([P kNN-IS §3.4] iterative scheme)."""
    o = t(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_custkey", F.lit("urgent").alias("src")
    )
    b = o.where(F.col("o_totalprice") > 400000).select(
        "o_orderkey", "o_custkey", F.lit("big").alias("src")
    )
    return a.unionByName(b)


@register(
    "g2_union_distinct",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
UNION
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
""",
)
def g2_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct)."""
    o = t(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.union(b).distinct()


@register(
    "g3_intersect",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
""",
)
def g3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers with both finished and open orders."""
    o = t(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersect(b)


@register(
    "g4_except",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
""",
)
def g4_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): finished-only customers."""
    o = t(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.subtract(b)


# ------------------------------------------------------- H. scalar functions


@register(
    "h1_math_dist",
    oracle=f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
             WHERE {EMB_ADMIT_SQL})
SELECT a.vec_id,
       round(list_distance(a.emb, b.emb), 6) AS eucl,
       round(list_sum(list_transform(list_zip(a.emb, b.emb), p -> abs(p[1] - p[2]))), 6) AS manh
FROM emb a JOIN emb b ON b.vec_id = a.vec_id + 1
""",
)
def h1_math_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Euclidean & Manhattan over consecutive vector pairs — the
    reference's Distance.scala surface ([R utils/Distance.scala])."""
    from big_data_fknn_spark.tables import embeddings_d

    emb = embeddings_d(spark, sf_dir)
    a = emb.select(F.col("vec_id"), F.col("emb").alias("ea"))
    b = emb.select((F.col("vec_id") - 1).alias("vid_b"), F.col("emb").alias("eb"))
    return a.join(b, a.vec_id == F.col("vid_b")).select(
        "vec_id",
        F.round(euclidean(F.col("ea"), F.col("eb")), 6).alias("eucl"),
        F.round(manhattan(F.col("ea"), F.col("eb")), 6).alias("manh"),
    )


@register(
    "h2_array_fns",
    oracle=f"""
SELECT vec_id,
       len(embedding) AS n_elems,
       round(list_sum(embedding[1:3]::DOUBLE[]), 6) AS first3_sum,
       len(list_filter(embedding, x -> x > 0)) AS n_pos,
       round(list_max(list_transform(embedding::DOUBLE[], x -> abs(x))), 6) AS max_abs
FROM embeddings WHERE {EMB_ADMIT_SQL}
""",
)
def h2_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions: size/slice/filter/transform/array_max."""
    from big_data_fknn_spark.tables import embeddings_d

    emb = embeddings_d(spark, sf_dir)
    return emb.select(
        "vec_id",
        F.size("emb").alias("n_elems"),
        F.round(
            F.aggregate(F.slice("emb", 1, 3), F.lit(0.0), lambda a, x: a + x), 6
        ).alias("first3_sum"),
        F.size(F.filter("emb", lambda x: x > 0)).alias("n_pos"),
        F.round(F.array_max(F.transform("emb", lambda x: F.abs(x))), 6).alias(
            "max_abs"
        ),
    )


@register(
    "h3_string_fns",
    oracle="""
SELECT doc_id,
       length(text) AS n_chars2,
       len(string_split(text, ' ')) AS n_words,
       regexp_extract(text, '^([a-z0-9]+)', 1) AS first_word,
       upper(lang) || '/' || source AS tag
FROM documents
""",
)
def h3_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions: length/split/regexp_extract/concat/upper
    (the reference's KEEL line split, [R KeelParser], generalized)."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars2"),
        F.size(F.split("text", " ")).alias("n_words"),
        F.regexp_extract("text", "^([a-z0-9]+)", 1).alias("first_word"),
        F.concat(F.upper("lang"), F.lit("/"), F.col("source")).alias("tag"),
    )


@register(
    "h4_datetime",
    oracle="""
SELECT date_trunc('day', ts)::TIMESTAMP AS day, extract(hour FROM ts)::INT AS hr,
       count(*) AS n,
       date_diff('day', DATE '2024-01-01', ts::DATE)::INT AS days_in
FROM events
GROUP BY 1, 2, 4
""",
)
def h4_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime functions: date_trunc/extract/datediff + agg."""
    e = t(spark, sf_dir, "events")
    return (
        e.select(
            F.date_trunc("day", "ts").alias("day"),
            F.hour("ts").alias("hr"),
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
                "days_in"
            ),
        )
        .groupBy("day", "hr", "days_in")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("day", "hr", "n", "days_in")
    )


@register(
    "h5_json",
    oracle="""
SELECT event_type, count(*) AS n,
       round(avg(json_extract_string(props, '$.k')::INT), 6) AS avg_k
FROM events GROUP BY event_type
""",
)
def h5_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the semi-structured props column."""
    e = t(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("k"), 6).alias("avg_k"))
    )


@register(
    "h6_case_when",
    oracle=f"""
SELECT CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'low'
            ELSE 'high' END AS band,
       count(*) AS n,
       round(sum(CAST(c_acctbal AS DECIMAL(38,10)))::VARCHAR::DOUBLE / count(c_acctbal), 6) AS avg_bal
FROM customer
WHERE {fin_sql("c_acctbal")}
GROUP BY 1
""",
)
def h6_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN banding (the Keller 0.51/0.49 membership init shape,
    [P Keller85]; the real thing is in operators/fknn.py).  Non-finite
    balances gate at the scan (functions/numeric.py finite)."""
    c = t(spark, sf_dir, "customer").where(finite("c_acctbal"))
    band = (
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
    )
    return (
        c.select(band.alias("band"), "c_acctbal")
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n"), davg("c_acctbal").alias("avg_bal"))
    )


@register(
    "h7_hash",
    oracle="""
SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256
FROM documents
""",
)
def h7_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hashes for dedup keys (xxhash64 is used on the
    Spark-internal fast path in j7; md5/sha256 are the
    cross-engine-checkable ones)."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


# ---------------------------- A8. partitioned sink + partition pruning


@register(
    "a8_partitioned_sink_prune",
    oracle="""
SELECT event_id, user_id, event_type, round(value, 6) AS value
FROM events WHERE event_type IN ('view', 'purchase')
""",
)
def a8_partitioned_sink_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned layout + partition PRUNING: write events
    partitioned by event_type, read back with a partition predicate.
    The filter never touches row data — pruned directories are not
    even listed (PartitionFilters in the scan, asserted in
    tests/test_plans.py).  At 100 TB this is the difference between
    scanning 5 directories and scanning one: partition on the
    coarse, always-filtered column (event date/type), never on
    high-cardinality keys."""
    out = _tmp_path("a8_events_parted")
    (
        t(spark, sf_dir, "events")
        .select("event_id", "user_id", F.round("value", 6).alias("value"), "event_type")
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(out)
    )
    # explicit schema on the read-back: an EMPTY partitioned sink has
    # no files to infer from (UNABLE_TO_INFER_SCHEMA) — the writer
    # knows the schema, a robust reader states it
    schema = (
        "event_id bigint, user_id bigint, value double, event_type string"
    )
    return (
        spark.read.schema(schema)
        .parquet(out)
        .where(F.col("event_type").isin("view", "purchase"))
        .select("event_id", "user_id", "event_type", "value")
    )


# --------------------------------- A9. bucketed (co-located) join


@register(
    "a9_bucketed_join",
    oracle="""
SELECT o.o_orderkey, c.c_name, o.o_totalprice
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
""",
)
def a9_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join: both sides written bucketBy(8) on
    the join key, so the sort-merge join reads matching buckets
    directly — NO shuffle exchange on either side (asserted in
    tests/test_plans.py).  This is the 100 TB pattern for a join
    repeated every run (fact ⋈ dim on a stable key): pay the
    bucketed write once, skip the exchange forever after.  The
    `merge` hint pins the bucketed SMJ path so the plan is stable
    regardless of the dim side's size."""
    import re as _re

    tag = _re.sub(r"\W", "_", sf_dir).strip("_")
    base = _tmp_path(f"a9_bucketed_{tag}")
    for name, key in (("orders", "o_custkey"), ("customer", "c_custkey")):
        tbl = f"a9_{name}_{tag}"
        (
            t(spark, sf_dir, name)
            .write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", os.path.join(base, name))
            .saveAsTable(tbl)
        )
    o = spark.table(f"a9_orders_{tag}")
    c = spark.table(f"a9_customer_{tag}").where(F.col("c_mktsegment") == "BUILDING")
    return (
        o.hint("merge")
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_name", "o_totalprice")
    )


# ------------------------------------------- A10. ORC round trip


@register(
    "a10_orc_roundtrip",
    oracle="""
SELECT doc_id, lang, source, n_chars FROM documents
""",
)
def a10_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + scan round trip — the second columnar format the
    engine speaks natively (both ORC and Parquet get vectorized
    reads, predicate pushdown, and column pruning from the same
    FileFormat machinery).  Correctness check: the round-tripped
    rows equal the source projection."""
    out = _tmp_path("a10_docs.orc")
    (
        t(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source", "n_chars")
        .write.mode("overwrite")
        .orc(out)
    )
    return spark.read.orc(out)


@register(
    "a11_schema_evolution",
    oracle="""
SELECT n_nationkey, n_name, -1 AS n_regionkey, 'v1' AS src FROM nation
UNION ALL
SELECT n_nationkey, n_name, n_regionkey, 'v2' AS src FROM nation
""",
)
def a11_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema evolution: two writer generations of the same
    table — v1 before a column existed, v2 after adding
    ``n_regionkey`` — land in one directory; ``mergeSchema=true``
    reconciles them at read time and backfills the missing column
    with NULL for v1 files (coalesced to -1 so both engines hash an
    int, never a nullable-int→float dtype).

    This is the 100 TB reality: petabyte tables are written over
    years by evolving jobs, and readers must union old and new file
    schemas without a rewrite.  Spark's parquet source does it with
    per-file footer schemas + a merged read schema; only the footer
    metadata is read twice, the column data is still pruned.
    """
    n = t(spark, sf_dir, "nation")
    out = _tmp_path("a11_evolved")
    n.select("n_nationkey", "n_name", F.lit("v1").alias("src")).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "gen=1"))
    n.select("n_nationkey", "n_name", "n_regionkey", F.lit("v2").alias("src")).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "gen=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(out, "gen=1"), os.path.join(out, "gen=2")
    )
    return merged.select(
        "n_nationkey",
        "n_name",
        F.coalesce("n_regionkey", F.lit(-1)).cast("int").alias("n_regionkey"),
        "src",
    )


@register(
    "h8_bitwise",
    oracle="""
SELECT o_orderkey,
       o_orderkey & 255 AS mask_and,
       o_orderkey | 7 AS mask_or,
       xor(o_orderkey, 131071) AS mask_xor,
       o_orderkey << 2 AS shl,
       o_orderkey >> 3 AS shr
FROM orders
""",
)
def h8_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar functions (and/or/xor/shifts) — the primitives
    behind hash partitioners, bloom probes, and bitmap indexes.
    Pure int64 lane math, bit-identical across engines by
    definition; whole-stage codegen keeps it in one scan stage."""
    o = t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("mask_and"),
        k.bitwiseOR(F.lit(7)).alias("mask_or"),
        k.bitwiseXOR(F.lit(131071)).alias("mask_xor"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 3).alias("shr"),
    )


@register(
    "h9_map_fns",
    oracle="""
SELECT event_id,
       len(json_keys(coalesce(props, '{}'))) AS n_keys,
       json_extract_string(coalesce(props, '{}'), '$.k')::INT AS k_val,
       CASE WHEN json_extract_string(coalesce(props, '{}'), '$.k') IS NOT NULL
            THEN 1 ELSE 0 END AS has_k,
       1 AS tag_val
FROM events
""",
)
def h9_map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: parse the semi-structured ``props`` JSON into
    a real ``map<string,int>`` and exercise the map operators —
    ``map_keys``/``size``, ``element_at`` lookup, membership
    (``map_contains_key``), and ``map_concat`` with a literal map.
    The DuckDB oracle reaches the same scalars through its JSON
    functions (it has no first-class MAP over JSON), which is the
    point: the *values* round-trip identically whichever container
    the engine uses.  Scale: all scan-stage scalar expressions, one
    pass, whole-stage codegen, no shuffle."""
    e = t(spark, sf_dir, "events")
    # absent props = empty map (NULL would otherwise flow asymmetric
    # defaults: Spark's NULL map vs the oracle's CASE/LEN scalars)
    m = F.from_json(F.coalesce(F.col("props"), F.lit("{}")), "map<string,int>")
    tagged = F.map_concat(m, F.create_map(F.lit("tag"), F.lit(1)))
    return e.select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(m, "k").alias("k_val"),
        F.map_contains_key(m, "k").cast("int").alias("has_k"),
        F.element_at(tagged, "tag").alias("tag_val"),
    )


# ------------------------------------------------- late additions (r1 cont.)


@register(
    "c11_lateral_topk",
    oracle="""
SELECT n.n_name, tc.c_custkey, tc.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_custkey, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 2
) tc
""",
)
def c11_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery join (Spark 3.4+ SQL): top-2
    customers by balance per nation, written the way a SQL user
    writes it.  Catalyst decorrelates the LIMIT-per-key subquery
    into a window rank ≤ k under the hood — the same physical shape
    as e1_topk_window, so the WindowGroupLimit map-side prune still
    applies at 100 TB.  Deterministic: (c_acctbal DESC, c_custkey)
    is a unique order."""
    # uuid views + drop after the eager spark.sql analysis (x22's
    # pattern): no catalog leak per call AND no cross-wiring when two
    # sessions' threads run this key concurrently (round-9 verdict —
    # the old fixed names let caller B's registration replace caller
    # A's between A's register and A's sql)
    nv = f"c11_nation_{uuid4().hex}"
    cv = f"c11_customer_{uuid4().hex}"
    t(spark, sf_dir, "nation").createOrReplaceTempView(nv)
    t(spark, sf_dir, "customer").createOrReplaceTempView(cv)
    out = spark.sql(
        f"""
SELECT n.n_name, tc.c_custkey, tc.c_acctbal
FROM {nv} n,
LATERAL (
  SELECT c_custkey, c_acctbal FROM {cv} c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 2
) tc
"""
    )
    spark.catalog.dropTempView(nv)
    spark.catalog.dropTempView(cv)
    return out


@register(
    "a12_json_roundtrip",
    oracle="""
SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
       min(ts) AS first_ts, max(ts) AS last_ts
FROM events GROUP BY event_type
""",
)
def a12_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed JSON-lines round trip of a real table: Spark
    writes events as JSONL (timestamps serialized as strings — JSON
    has no timestamp type), re-reads with a DECLARED schema (no
    inference pass — at 100 TB schema inference is a full extra
    scan), parses timestamps back, and aggregates.  Matching the
    parquet-sourced oracle proves the round trip is lossless to
    microsecond precision."""
    out = _tmp_path("a12_events_jsonl")
    (
        t(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.col("ts").cast("string").alias("ts_str"),
        )
        .write.mode("overwrite")
        .json(out)
    )
    back = spark.read.schema(
        "event_id bigint, user_id bigint, event_type string, ts_str string"
    ).json(out)
    return (
        back.select(
            "event_type", "user_id", F.col("ts_str").cast("timestamp").alias("ts")
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )


@register(
    "h10_variant",
    oracle="""
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events GROUP BY event_type
""",
)
def h10_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT type (Spark 4): `parse_json` builds the
    binary variant encoding once at scan time, `try_variant_get`
    extracts typed fields without re-parsing the JSON text per access
    — at 100 TB with many extractions per row that one-time parse is
    the difference vs h5's get_json_object (which re-parses the
    string per call).  try_ semantics (NULL on type mismatch) match
    the oracle's permissive string-extract + cast."""
    e = t(spark, sf_dir, "events")
    k = F.expr("try_variant_get(parse_json(props), '$.k', 'int')")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "a13_python_datasource",
    oracle="""
SELECT (range * range) % 97 % 7 AS bucket,
       count(*) AS n,
       CAST(sum((range * range) % 97) AS BIGINT) AS sum_h,
       min(range) AS first_id,
       max(range) AS last_id
FROM range(100000) GROUP BY 1
""",
)
def a13_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource (Spark 4 `pyspark.sql.datasource`) —
    the distributed successor to the reference's driver-side KEEL
    parser ([R KeelParser.scala]; sources/keel.py is our faithful
    path).  `DetSeqDataSource` splits itself into InputPartitions
    whose `read` runs on executors, so a new format scales with the
    cluster, not the driver.  Deterministic arithmetic rows → the
    oracle regenerates them with range().  The aggregate on top
    proves the source composes with ordinary Catalyst plans."""
    from big_data_fknn_spark.sources.pyds import DetSeqDataSource

    try:
        spark.dataSource.register(DetSeqDataSource)
    except Exception:
        pass  # already registered in this session
    seq = (
        spark.read.format("detseq")
        .option("n", 100000)
        .option("parts", 8)
        .load()
    )
    return seq.groupBy((F.col("h") % 7).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("h").alias("sum_h"),
        F.min("id").alias("first_id"),
        F.max("id").alias("last_id"),
    )


@register(
    "h11_math_fns",
    oracle="""
SELECT p_partkey,
       round(ln(p_retailprice), 6) AS ln_price,
       round(log10(p_retailprice), 6) AS log10_price,
       round(sqrt(p_retailprice), 6) AS sqrt_price,
       round(pow(p_size, 1.5), 6) AS size_pow,
       round(exp(p_size / 50.0), 6) AS size_exp,
       round(sin(p_size), 6) AS size_sin,
       round(atan2(p_size, p_retailprice), 6) AS size_atan2,
       abs(p_size - 25) AS size_dev,
       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
       CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
       p_size % 7 AS size_mod
FROM part
WHERE p_partkey <= 200
""",
)
def h11_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar math-function surface: ln/log10/sqrt/pow/exp/trig/
    abs/floor/ceil/mod.  Both engines call the same IEEE-754 libm
    family; round(x, 6) absorbs any last-ulp platform drift
    (SURVEY.md §7.1).  All of it runs inside one whole-stage-codegen
    project over the scan — zero shuffles, and at 100 TB the columns
    not referenced never leave the parquet footer (ReadSchema
    pruning)."""
    p = t(spark, sf_dir, "part").where(F.col("p_partkey") <= 200)
    return p.select(
        "p_partkey",
        F.round(F.log(F.col("p_retailprice")), 6).alias("ln_price"),
        F.round(F.log10("p_retailprice"), 6).alias("log10_price"),
        F.round(F.sqrt("p_retailprice"), 6).alias("sqrt_price"),
        F.round(F.pow("p_size", F.lit(1.5)), 6).alias("size_pow"),
        F.round(F.exp(F.col("p_size") / 50.0), 6).alias("size_exp"),
        F.round(F.sin("p_size"), 6).alias("size_sin"),
        F.round(F.atan2(F.col("p_size").cast("double"), "p_retailprice"), 6).alias(
            "size_atan2"
        ),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        F.floor("p_retailprice").alias("price_floor"),
        F.ceil("p_retailprice").alias("price_ceil"),
        (F.col("p_size") % 7).alias("size_mod"),
    )


@register(
    "h12_intervals",
    oracle="""
SELECT o_orderkey,
       o_orderdate + INTERVAL 45 DAY AS due_date,
       o_orderdate + INTERVAL 3 MONTH AS review_date,
       (date_trunc('month', o_orderdate) + INTERVAL 1 MONTH - INTERVAL 1 DAY)::TIMESTAMP AS month_end,
       round(date_diff('second', o_orderdate, TIMESTAMP '2000-01-01') / 86400.0, 6) AS days_to_y2k
FROM orders
WHERE o_orderkey <= 500
""",
)
def h12_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic: day intervals (fixed 24 h), calendar month
    intervals (variable length — `+ 3 months` lands on the same
    day-of-month, which ADD_MONTHS/INTERVAL agree on for these dates),
    end-of-month via trunc + month − day, and a fractional-day
    difference.  All constant-folded expression work inside one
    codegen stage over the pruned 2-column scan.

    Oracle gotcha: DuckDB 1.0.0 dedups constant subexpressions by
    interval VALUE equality, under which 3 MONTH == 90 DAY (30-day
    months) — a 90-day due_date would silently alias the 3-month
    review_date.  45 DAY keeps every interval distinct."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 45 DAY")).alias("due_date"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTH")).alias("review_date"),
        (
            F.date_trunc("month", "o_orderdate")
            + F.expr("INTERVAL 1 MONTH")
            - F.expr("INTERVAL 1 DAY")
        )
        .cast("timestamp")
        .alias("month_end"),
        # NTZ-native diff: the old string→TIMESTAMP→long route applied
        # the SESSION zone to both casts, and with a DST-observing
        # default (America/New_York) the two offsets differ by 1 h for
        # summer order dates — the one divergence the round-10 non-UTC
        # driver_sim probe caught.  timestampdiff over TIMESTAMP_NTZ
        # operands is pure wall-clock arithmetic, identical under any
        # session/host zone (matching the oracle's naive date_diff).
        F.round(
            F.expr(
                "timestampdiff(SECOND, CAST(o_orderdate AS TIMESTAMP_NTZ),"
                " TIMESTAMP_NTZ '2000-01-01 00:00:00')"
            )
            / 86400.0,
            6,
        ).alias("days_to_y2k"),
    )


@register(
    "g5_union_byname",
    oracle="""
SELECT c_custkey AS entity_key, c_acctbal AS balance, c_mktsegment AS segment,
       NULL::VARCHAR AS priority
FROM customer WHERE c_custkey <= 200
UNION ALL BY NAME
SELECT o_orderkey AS entity_key, o_totalprice AS balance,
       NULL::VARCHAR AS segment, o_orderpriority AS priority
FROM orders WHERE o_orderkey <= 200
""",
)
def g5_union_byname(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolving UNION: two sources with overlapping-but-
    different columns combine by NAME with NULL backfill
    (unionByName(allowMissingColumns=True)) — how a pipeline appends
    a new-generation table to an old one without positional-union
    corruption.  Zero shuffle: union is a metadata concat of the two
    scans."""
    c = (
        t(spark, sf_dir, "customer")
        .where(F.col("c_custkey") <= 200)
        .select(
            F.col("c_custkey").alias("entity_key"),
            F.col("c_acctbal").alias("balance"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    o = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= 200)
        .select(
            F.col("o_orderkey").alias("entity_key"),
            F.col("o_totalprice").alias("balance"),
            F.col("o_orderpriority").alias("priority"),
        )
    )
    return c.unionByName(o, allowMissingColumns=True)


@register(
    "h13_array_hof",
    oracle=f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
           WHERE {EMB_ADMIT_SQL})
SELECT vec_id,
       len(list_filter(v, x -> x > 0.2)) > 0 AS any_big,
       len(list_filter(v, x -> abs(x) < 1.0)) = len(v) AS all_small,
       round(list_sort(v)[1], 6) AS v_min,
       round(list_sort(v)[len(v)], 6) AS v_max,
       coalesce(list_position(list_transform(v, x -> CASE WHEN x > 0 THEN 1 ELSE 0 END), 1), 0) AS first_pos_idx,
       len(flatten([v[1:4], v[(len(v)-2):len(v)]])) AS ends_len,
       len(generate_series(1, label + 1)) AS lab_seq_len
FROM e
""",
)
def h13_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array predicates and builders: exists / forall,
    sort-and-index extremes, first-match position, flatten of sliced
    ends, and a data-dependent sequence.  All lambda expressions
    compile into the same codegen stage as the scan — arrays stay in
    Tungsten memory, no Python involved (the UDF surface k1-k6 exists
    for when that's genuinely needed)."""
    from big_data_fknn_spark.tables import embeddings_d

    emb = embeddings_d(spark, sf_dir)
    v = F.col("emb")
    return emb.select(
        "vec_id",
        F.exists(v, lambda x: x > 0.2).alias("any_big"),
        F.forall(v, lambda x: F.abs(x) < 1.0).alias("all_small"),
        F.round(F.array_min(v), 6).alias("v_min"),
        F.round(F.array_max(v), 6).alias("v_max"),
        # Spark encodes "no match" as 0; DuckDB list_position yields
        # NULL — the oracle coalesces to 0 so both engines agree.
        F.array_position(
            F.transform(v, lambda x: F.when(x > 0, 1).otherwise(0)), 1
        ).alias("first_pos_idx"),
        F.size(
            F.flatten(
                F.array(F.slice(v, 1, 4), F.slice(v, F.size(v) - 2, 3))
            )
        ).alias("ends_len"),
        F.size(F.sequence(F.lit(1), F.col("label") + 1)).alias("lab_seq_len"),
    )


@register(
    "h14_array_set_ops",
    oracle="""
WITH d AS (
  SELECT doc_id,
         list_sort(list_distinct(string_split(coalesce(text, ''), ' ')))[1:40] AS w,
         list_sort(list_distinct(string_split(reverse(coalesce(text, '')), ' ')))[1:40] AS z
  FROM documents WHERE doc_id <= 300
)
SELECT doc_id,
       len(list_intersect(w, z)) AS n_common,
       len(list_distinct(list_concat(w, z))) AS n_union,
       len(list_filter(w, x -> NOT list_contains(z, x))) AS n_only_w,
       list_has_any(w, z) AS overlaps,
       list_has_all(w, w[1:3]) AS has_own_head
FROM d
""",
)
def h14_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra: intersect/union/except cardinalities plus
    overlap predicates between two token sets per document.  Only
    SIZES and booleans are emitted — Spark's array_intersect keeps
    first-array order while DuckDB's list_intersect doesn't, so the
    set CONTENTS are compared via their cardinalities, which are
    order-free.  All of it is per-row expression work in the scan
    stage."""
    d = (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id") <= 300)
        .select(
            "doc_id",
            # sort before slicing: Spark keeps first-occurrence order
            # after distinct, DuckDB doesn't — a sorted prefix is the
            # only 40-element truncation both engines agree on.
            # NULL text coalesces to '' so the set columns stay
            # non-null (a NULL array would NULL the overlap booleans)
            F.slice(
                F.array_sort(
                    F.array_distinct(F.split(F.coalesce(F.col("text"), F.lit("")), " "))
                ),
                1,
                40,
            ).alias("w"),
            F.slice(
                F.array_sort(
                    F.array_distinct(
                        F.split(F.reverse(F.coalesce(F.col("text"), F.lit(""))), " ")
                    )
                ),
                1,
                40,
            ).alias("z"),
        )
    )
    return d.select(
        "doc_id",
        F.size(F.array_intersect("w", "z")).alias("n_common"),
        F.size(F.array_union("w", "z")).alias("n_union"),
        F.size(F.array_except("w", "z")).alias("n_only_w"),
        F.arrays_overlap("w", "z").alias("overlaps"),
        F.forall(
            F.slice("w", 1, 3), lambda x: F.array_contains(F.col("w"), x)
        ).alias("has_own_head"),
    )


@register(
    "h15_string_fns2",
    oracle="""
SELECT p_partkey,
       lpad(p_brand, 12, '*') AS brand_pad,
       rpad(p_type, 10, '.') AS type_pad,
       translate(p_name, 'aeiou', 'AEIOU') AS name_vowels,
       repeat(left(p_name, 2), 3) AS name_echo,
       reverse(p_name) AS name_rev,
       printf('%s/%d', p_brand, p_size) AS brand_size,
       ascii(p_name) AS first_code,
       position('rand' IN p_brand) AS rand_pos,
       replace(p_type, 'O', '0') AS type_leet
FROM part WHERE p_partkey <= 300
""",
)
def h15_string_fns2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string-function tranche: pad/translate/repeat/reverse/
    printf-format/ascii/position/replace — the formatting-and-
    cleanup layer under every report and every text normalizer
    (j19's canonicalizer is built from exactly these).  Pure
    codegen projection, scan-stage."""
    p = t(spark, sf_dir, "part").where(F.col("p_partkey") <= 300)
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.rpad("p_type", 10, ".").alias("type_pad"),
        F.translate("p_name", "aeiou", "AEIOU").alias("name_vowels"),
        F.repeat(F.substring("p_name", 1, 2), 3).alias("name_echo"),
        F.reverse("p_name").alias("name_rev"),
        # NULL-in-NULL-out: Java's format renders a NULL int as the
        # string 'null' while SQL printf propagates NULL — guard so
        # both engines agree
        F.when(
            F.col("p_brand").isNull() | F.col("p_size").isNull(), F.lit(None)
        )
        .otherwise(F.printf(F.lit("%s/%d"), "p_brand", "p_size"))
        .alias("brand_size"),
        F.ascii("p_name").alias("first_code"),
        F.instr("p_brand", "rand").alias("rand_pos"),
        F.replace("p_type", F.lit("O"), F.lit("0")).alias("type_leet"),
    )


@register(
    "h16_try_fns",
    oracle="""
SELECT p_partkey,
       round(p_retailprice / nullif(p_size - 25, 0), 6) AS safe_ratio,
       TRY_CAST(p_brand AS INT) AS brand_as_int,
       TRY_CAST(substr(p_brand, 7) AS INT) AS brand_num,
       string_split(p_name, 'a')[99] AS oob_elem
FROM part WHERE p_partkey <= 300
""",
)
def h16_try_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe try_* functions (Spark 4 runs ANSI mode by default,
    where bad casts and div-by-zero THROW): try_divide, try_cast on
    a non-numeric and on a parsed suffix, try_element_at out of
    bounds — each yields NULL instead of killing a 10-hour job at
    row 10^11.  The oracle spells the same semantics in DuckDB
    (nullif guard; TRY_CAST; native NULL on list out-of-range)."""
    p = t(spark, sf_dir, "part").where(F.col("p_partkey") <= 300)
    return p.select(
        "p_partkey",
        F.round(
            F.try_divide("p_retailprice", F.col("p_size") - 25), 6
        ).alias("safe_ratio"),
        F.col("p_brand").try_cast("int").alias("brand_as_int"),
        F.substring("p_brand", 7, 10).try_cast("int").alias("brand_num"),
        F.try_element_at(F.split("p_name", "a"), F.lit(99)).alias("oob_elem"),
    )


@register(
    "a14_text_log_roundtrip",
    # NOT isnan/abs<inf: Java's %.3f renders a non-finite value as the
    # token 'Infinity'/'NaN', which the parse regex dead-letters — the
    # oracle mirrors that quarantine explicitly
    oracle="""
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(round(round(value, 3) * 1000, 0) AS BIGINT)) AS BIGINT) AS value_millis
FROM events
WHERE event_type IS NOT NULL AND value IS NOT NULL
  AND NOT isnan(value) AND abs(value) < cast('Infinity' AS DOUBLE)
GROUP BY event_type
""",
)
def a14_text_log_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unstructured-text round trip — the log-file reality: events are
    FORMATTED into syslog-ish lines (`<epoch_us> <type> user=<id>
    value=<v>`) and written with the distributed text sink (one file
    per partition, no driver funnel), then re-read as raw lines and
    parsed back with regexp_extract into typed columns.  The
    aggregate matching the parquet-sourced oracle proves parse ∘
    format = identity on every field the lines carry.

    value survives via a fixed 3-decimal format and an integer-millis
    aggregate (text round trips of binary doubles are NOT identity —
    that's the point of columnar formats; the key demonstrates the
    ingest-legacy-logs path, a8/a12 show the formats you'd migrate
    to).  Scale: format is scan-stage codegen; parse is one regexp
    pass per line — the classic schema-on-read ELT step."""
    out = _tmp_path("a14_events_log")
    line = F.format_string(
        "%d %s user=%d value=%.3f",
        F.unix_micros("ts"),
        "event_type",
        "user_id",
        "value",
    )
    # NULL fields can't ride a syslog line (Java formats them as the
    # string 'null', which is indistinguishable from a real token) —
    # exclude them at write time, mirrored in the oracle's WHERE
    t(spark, sf_dir, "events").where(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    ).select(line.alias("value")).write.mode("overwrite").text(out)
    back = spark.read.text(out)
    # \S+, not \w+: the format is space-delimited, and Java's \w is
    # ASCII-only — a multibyte event type ('käuf', '浏览') would be
    # silently dead-lettered instead of round-tripping
    rx = r"^(\d+) (\S+) user=(\d+) value=(-?\d+\.\d{3})$"
    # quarantine any line the pattern can't parse instead of feeding
    # '' to an ANSI cast (no-op here; the dead-letter route at scale)
    parsed = back.where(F.col("value").rlike(rx)).select(
        F.regexp_extract("value", rx, 2).alias("event_type"),
        F.regexp_extract("value", rx, 4).cast("double").alias("v"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.round(F.col("v"), 3) * 1000, 0).cast("bigint"))
        .cast("bigint")
        .alias("value_millis"),
    )


# ------------------------------------ C12. interval-overlap join

_C12_GAP_US = 30 * 60 * 1_000_000  # 30-min session gap
_C12_BUCKET_US = 3_600 * 1_000_000  # 1-hour join buckets


@register(
    "c12_interval_overlap",
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS t FROM events),
marked AS (
  SELECT user_id, t,
         CASE WHEN lag(t) OVER w IS NULL
                   OR t - lag(t) OVER w > {_C12_GAP_US}
              THEN 1 ELSE 0 END AS brk
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
numbered AS (
  SELECT user_id, t,
         sum(brk) OVER (PARTITION BY user_id ORDER BY t
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked),
sess AS (
  SELECT user_id, sid, min(t) AS s, max(t) AS e
  FROM numbered GROUP BY user_id, sid),
pairs AS (
  SELECT a.user_id AS user_a, b.user_id AS user_b,
         least(a.e, b.e) - greatest(a.s, b.s) AS ov
  FROM sess a JOIN sess b
    ON a.user_id < b.user_id AND a.s <= b.e AND b.s <= a.e)
SELECT user_a, user_b,
       sum(ov)::BIGINT AS overlap_us, count(*) AS n_pairs
FROM pairs GROUP BY user_a, user_b
""",
)
def c12_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join, the scalable way: sessionize each user
    (30-min gaps-and-islands), then find cross-user CONCURRENT
    sessions with a bucketed interval join — each session explodes
    into the 1-hour buckets it covers, candidates come from a bucket
    EQUI-join (overlapping intervals always share a covered bucket),
    duplicates from multi-bucket spans collapse with distinct, and
    the exact a.s <= b.e AND b.s <= a.e test verifies.  Output:
    total concurrent microseconds + overlapping-session-pair count
    per user pair.

    The DuckDB oracle runs the NAIVE theta join (every session pair
    compared) — correct, and exactly the plan that dies at scale;
    the bucket equi-join's work tracks concurrency density instead
    of |sessions|².  All arithmetic is integer microseconds.

    Cite: the same explode-to-grid trick j22 uses for chunking and
    DuckDB/PostgreSQL range-join literature calls binned interval
    joins."""
    from big_data_fknn_spark.tables import events_t

    e = events_t(spark, sf_dir).select(
        "user_id", "event_id", F.unix_micros("ts").alias("t")
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    brk = F.when(
        F.lag("t").over(w).isNull()
        | ((F.col("t") - F.lag("t").over(w)) > _C12_GAP_US),
        1,
    ).otherwise(0)
    sess = (
        e.withColumn("brk", brk)
        .withColumn("sid", F.sum("brk").over(w))
        .groupBy("user_id", "sid")
        .agg(F.min("t").alias("s"), F.max("t").alias("e"))
    )
    bucketed = sess.select(
        "user_id",
        "sid",
        "s",
        "e",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / _C12_BUCKET_US),
                F.floor(F.col("e") / _C12_BUCKET_US),
            )
        ).alias("hb"),
    )
    a = bucketed.select(
        F.col("user_id").alias("user_a"),
        F.col("sid").alias("sid_a"),
        F.col("s").alias("sa"),
        F.col("e").alias("ea"),
        "hb",
    )
    b = bucketed.select(
        F.col("user_id").alias("user_b"),
        F.col("sid").alias("sid_b"),
        F.col("s").alias("sb"),
        F.col("e").alias("eb"),
        "hb",
    )
    cand = (
        a.join(b, "hb")
        .where(F.col("user_a") < F.col("user_b"))
        .select("user_a", "sid_a", "sa", "ea", "user_b", "sid_b", "sb", "eb")
        .distinct()
    )
    ov = F.least("ea", "eb") - F.greatest("sa", "sb")
    return (
        cand.where((F.col("sa") <= F.col("eb")) & (F.col("sb") <= F.col("ea")))
        .groupBy("user_a", "user_b")
        .agg(
            F.sum(ov).cast("bigint").alias("overlap_us"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )


@register(
    "a15_json_corrupt_records",
    oracle="""
SELECT CASE WHEN doc_id % 10 = 3 THEN '(corrupt)' ELSE lang END AS lang_key,
       count(*) AS n
FROM documents GROUP BY 1
""",
)
def a15_json_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-input robustness at the SOURCE layer: write one
    JSON line per document with every doc_id % 10 == 3 line
    deliberately truncated mid-object, re-read in PERMISSIVE mode
    with columnNameOfCorruptRecord, and count rows per language with
    corrupt lines bucketed as '(corrupt)'.  The oracle derives the
    expected split from the same deterministic corruption rule —
    proving the reader salvages every parseable line instead of
    failing the file (FAILFAST) or silently dropping (DROPMALFORMED;
    both modes exist, this op pins the production default).

    Scale: corrupt-record capture is per-row inside the scan — no
    extra pass; quarantined lines land in a side column you route to
    a dead-letter sink, the standard ingest topology."""
    out = _tmp_path("a15_corrupt_jsonl")
    d = t(spark, sf_dir, "documents").select("doc_id", "lang")
    # a NULL lang serializes as JSON null (concat would otherwise
    # NULL the whole line and silently drop the row from the fixture)
    lang_json = F.coalesce(
        F.concat(F.lit('"'), F.col("lang"), F.lit('"')), F.lit("null")
    )
    line = F.when(
        F.col("doc_id") % 10 == 3,
        F.concat(F.lit('{"doc_id": '), F.col("doc_id"), F.lit(', "lang": "')),
    ).otherwise(
        F.concat(
            F.lit('{"doc_id": '),
            F.col("doc_id"),
            F.lit(', "lang": '),
            lang_json,
            F.lit("}"),
        )
    )
    d.select(line.alias("value")).write.mode("overwrite").text(out)
    back = (
        spark.read.schema("doc_id bigint, lang string, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(out)
    )
    return back.groupBy(
        F.when(F.col("_corrupt_record").isNotNull(), "(corrupt)")
        .otherwise(F.col("lang"))
        .alias("lang_key")
    ).agg(F.count(F.lit(1)).alias("n"))
