"""SURVEY.md §2.D — aggregation surface.

The reference's reduce-side k-list merge is a combiner (partial
aggregation, [P kNN-IS §3.3]); Catalyst emits partial+final
HashAggregate pairs for every groupBy here automatically — the same
map-side-combine trick, engine-built.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_fknn_spark.functions.numeric import DEC, davg, dsum, fin_sql, finite
from big_data_fknn_spark.queries import register
from big_data_fknn_spark.tables import EMB_ADMIT_SQL as _EMB_ADMIT
from big_data_fknn_spark.tables import t


@register(
    "d1_hashagg",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       round(sum(CAST(l_quantity AS DECIMAL(38,10))), 6)::VARCHAR::DOUBLE AS sum_qty,
       round(sum(CAST(l_extendedprice AS DECIMAL(38,10))), 6)::VARCHAR::DOUBLE AS sum_base_price,
       round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))), 6)::VARCHAR::DOUBLE AS sum_disc_price,
       round(sum(CAST(l_quantity AS DECIMAL(38,10)))::VARCHAR::DOUBLE / count(l_quantity), 6) AS avg_qty,
       round(sum(CAST(l_discount AS DECIMAL(38,10)))::VARCHAR::DOUBLE / count(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
  AND {fin_sql("l_quantity")} AND {fin_sql("l_extendedprice")}
GROUP BY l_returnflag, l_linestatus
""",
)
def d1_hashagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: multi-aggregate hash agg with partial+final
    stages (map-side combine happens before the shuffle — check
    `partial_sum` in .explain).  Money sums accumulate in exact
    decimal (functions/numeric.py) so the result is independent of
    partition order — required for oracle parity AND for accuracy
    over 1e12 rows."""
    li = t(spark, sf_dir, "lineitem").where(
        finite("l_quantity") & finite("l_extendedprice")
    )
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            davg("l_quantity").alias("avg_qty"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "d2_count_distinct",
    oracle="""
SELECT c_mktsegment,
       count(DISTINCT c_nationkey) AS n_nations,
       count(*) AS n_cust
FROM customer GROUP BY c_mktsegment
""",
)
def d2_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count (expands to a two-phase agg under the hood)."""
    c = t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_cust"),
    )


@register("d3_approx_cd", oracle=None)  # HLL++ is engine-specific → rows-only
def d3_approx_cd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate count-distinct (HyperLogLog++).  Sketches differ
    across engines, so no value oracle — the scale story is the
    point: fixed-size state per group vs exact distinct's full
    shuffle."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_cust")
    )


@register(
    "d4_rollup_cube",
    oracle=f"""
SELECT r.r_name, n.n_name, count(*) AS n_cust,
       round(sum(CAST(c.c_acctbal AS DECIMAL(38,10))), 6)::VARCHAR::DOUBLE AS bal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE {fin_sql("c.c_acctbal")}
GROUP BY ROLLUP (r.r_name, n.n_name)
-- Spark's rollup emits NO grand-total row over empty input (standard
-- SQL emits one with count 0); the no-op-on-data HAVING mirrors that
HAVING count(*) > 0
""",
)
def d4_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (region → nation → grand total).
    Non-finite balances gate at the scan (functions/numeric.py)."""
    c = t(spark, sf_dir, "customer").where(finite("c_acctbal"))
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return j.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_cust"),
        dsum("c_acctbal").alias("bal"),
    )


@register(
    "d5_pivot",
    oracle="""
SELECT label,
       coalesce(sum(CASE WHEN vec_id % 5 = 0 THEN 1 END), 0)::BIGINT AS b0,
       coalesce(sum(CASE WHEN vec_id % 5 = 1 THEN 1 END), 0)::BIGINT AS b1,
       coalesce(sum(CASE WHEN vec_id % 5 = 2 THEN 1 END), 0)::BIGINT AS b2,
       coalesce(sum(CASE WHEN vec_id % 5 = 3 THEN 1 END), 0)::BIGINT AS b3,
       coalesce(sum(CASE WHEN vec_id % 5 = 4 THEN 1 END), 0)::BIGINT AS b4
FROM embeddings GROUP BY label
""",
)
def d5_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot to wide — the reference's per-class membership-vector
    shape ([P FkNN-BD stage 1] materializes k×numClasses matrices)."""
    emb = t(spark, sf_dir, "embeddings")
    piv = (
        emb.select("label", (F.col("vec_id") % 5).alias("bucket"))
        .groupBy("label")
        .pivot("bucket", [0, 1, 2, 3, 4])
        .count()
    )
    return piv.select(
        "label",
        *[F.coalesce(F.col(str(i)), F.lit(0)).alias(f"b{i}") for i in range(5)],
    )


@register(
    "d6_mode_vote",
    oracle="""
WITH counts AS (
  SELECT user_id, event_type, count(*) AS cnt FROM events GROUP BY 1, 2
),
pick AS (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY cnt DESC, event_type) AS rn
  FROM counts
)
SELECT user_id, event_type AS top_type, cnt FROM pick WHERE rn = 1
""",
)
def d6_mode_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic majority vote — the reference's crisp-kNN class
    vote ([R kNN_IS.calculatePredictedRightClasses]).  Explicit
    (count desc, key asc) tiebreak instead of engine mode()
    (SURVEY.md §7.3)."""
    e = t(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("user_id").orderBy(F.col("cnt").desc(), F.col("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("top_type"), "cnt")
    )


@register(
    "d7_collect_list",
    oracle="""
SELECT s_nationkey, string_agg(s_name, ',' ORDER BY s_name) AS names,
       count(*) AS n
FROM supplier GROUP BY s_nationkey
""",
)
def d7_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List aggregation — the reference's per-query neighbor arrays
    ([R kNN_IS]).  Emitted as a sorted joined string so the value is
    deterministic and scalar for the oracle hash."""
    s = t(spark, sf_dir, "supplier")
    return s.groupBy("s_nationkey").agg(
        F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias("names"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "d8_weighted_agg",
    oracle=f"""
SELECT l_returnflag,
       round(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(38,10)))::VARCHAR::DOUBLE
             / sum(CAST(l_quantity AS DECIMAL(38,10)))::VARCHAR::DOUBLE, 6) AS weighted_price
FROM lineitem
WHERE {fin_sql("l_quantity")} AND {fin_sql("l_extendedprice")}
GROUP BY l_returnflag
""",
)
def d8_weighted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted aggregate — the FkNN stage-2 distance-weighted
    membership sum shape ([P Keller85]; real use in operators/fknn.py).
    Both sums in exact decimal: at ~1e10 magnitude a double sum's
    partition-order drift lands inside round(,6).  Non-finite
    measures gate at the scan (functions/numeric.py)."""
    li = t(spark, sf_dir, "lineitem").where(
        finite("l_quantity") & finite("l_extendedprice")
    )
    num = F.sum((F.col("l_extendedprice") * F.col("l_quantity")).cast(DEC)).cast(
        "double"
    )
    den = F.sum(F.col("l_quantity").cast(DEC)).cast("double")
    return li.groupBy("l_returnflag").agg(
        F.round(num / den, 6).alias("weighted_price")
    )


# d9/d10 reuse the crisp-kNN prediction CTE chain from queries/ml.py.
# WHERE mirrors the Spark-side vector admission gate (tables.EMB_ADMIT_SQL).
_KNN_PRED_CTES = f"""
emb AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label FROM embeddings
        WHERE {_EMB_ADMIT}),
train AS (SELECT * FROM emb WHERE vec_id % 5 <> 0 AND label IS NOT NULL),
test AS (SELECT * FROM emb WHERE vec_id % 5 = 0),
pairs AS (
  SELECT t.vec_id AS q, t.label AS label, r.vec_id AS n, r.label AS n_label,
         list_distance(t.emb, r.emb) AS d
  FROM test t CROSS JOIN train r
),
knn AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY q ORDER BY d, n) AS rn FROM pairs
  ) WHERE rn <= 5
),
votes AS (SELECT q, label, n_label AS cls, count(*) AS cnt FROM knn GROUP BY 1, 2, 3),
pred AS (
  SELECT q AS vec_id, label, cls AS pred FROM (
    SELECT *, row_number() OVER (PARTITION BY q ORDER BY cnt DESC, cls) AS r FROM votes
  ) WHERE r = 1
)
"""


@register(
    "d9_confusion",
    oracle=f"""
WITH {_KNN_PRED_CTES}
SELECT label, pred, count(*) AS n FROM pred GROUP BY label, pred
""",
)
def d9_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix over kNN predictions (the reference's driver-
    side numClass×numClass matrix, [R runFuzzyKNN.scala] — here a
    distributed groupBy, never collected)."""
    from big_data_fknn_spark.queries.ml import j1_knn_crisp

    return (
        j1_knn_crisp(spark, sf_dir)
        .groupBy("label", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "d10_metrics",
    oracle=f"""
WITH {_KNN_PRED_CTES}
SELECT count(*) AS n_test,
       round(avg(CASE WHEN label = pred THEN 1.0 ELSE 0.0 END), 6) AS accuracy
FROM pred
""",
)
def d10_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier accuracy (the reference's right/total metric;
    labels are ~random in this fixture so ≈0.1 — correctness is the
    oracle match, not the score)."""
    from big_data_fknn_spark.queries.ml import j1_knn_crisp

    return j1_knn_crisp(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n_test"),
        F.round(
            F.avg(F.when(F.col("label") == F.col("pred"), 1.0).otherwise(0.0)), 6
        ).alias("accuracy"),
    )


@register(
    "d17_auc",
    oracle=f"""
WITH {_KNN_PRED_CTES},
classes AS (SELECT DISTINCT label AS cls FROM emb WHERE label IS NOT NULL),
tq AS (SELECT DISTINCT q, label FROM votes WHERE label IS NOT NULL),
dense AS (
  SELECT t.q, t.label, c.cls, coalesce(v.cnt, 0) AS score
  FROM tq t CROSS JOIN classes c
  LEFT JOIN votes v ON v.q = t.q AND v.cls = c.cls
),
ranked AS (
  SELECT cls, (label = cls) AS pos,
         rank() OVER (PARTITION BY cls ORDER BY score)
           + (count(*) OVER (PARTITION BY cls, score) - 1) / 2.0 AS avg_rank
  FROM dense
),
stats AS (
  SELECT cls,
         sum(CASE WHEN pos THEN avg_rank ELSE 0 END) AS s_pos,
         sum(CASE WHEN pos THEN 1 ELSE 0 END)::BIGINT AS n_pos,
         sum(CASE WHEN pos THEN 0 ELSE 1 END)::BIGINT AS n_neg
  FROM ranked GROUP BY cls
),
per AS (
  SELECT cls::INT AS cls,
         round((s_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg), 6) AS auc
  FROM stats
)
SELECT cls, auc FROM per
UNION ALL
SELECT -1 AS cls,
       round(sum(CAST(auc AS DECIMAL(38,10)))::VARCHAR::DOUBLE / count(*), 6) AS auc
FROM per
""",
)
def d17_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-vs-rest AUC over the crisp-kNN vote scores — the
    reference's second headline metric (runFuzzyKNN emits accuracy
    AND AUC via BinaryClassificationMetrics, [R runFuzzyKNN.scala];
    SURVEY.md §2 d10).  Per class c: score(test point) = number of
    its k neighbors voting c (an integer 0..k — ranking on raw ints
    sidesteps float-tie hazards entirely), positives = points whose
    true label is c, and AUC is the tie-aware Mann-Whitney statistic

        AUC_c = (Σ avg_rank(pos) − P(P+1)/2) / (P·N)

    which is exactly what BinaryClassificationMetrics' threshold
    sweep integrates to under tied scores.  The cls = -1 row is the
    macro average.  Determinism: ranks are ints, avg_rank is a
    half-integer (sums are exact in IEEE doubles at any partition
    order), so both engines produce identical bits before round(6).

    Scale: one kNN pass (the flagship kernel), one dense |test|×|C|
    expansion against a broadcast class dim, one window per class
    over integer keys, one tiny aggregate — no driver collect.
    """
    from big_data_fknn_spark.operators.knn import knn_join_blas
    from big_data_fknn_spark.tables import embeddings_d, train_test_split

    train, test = train_test_split(spark, sf_dir)
    knn = knn_join_blas(
        test, train, k=5, keep_q_cols=("label",), keep_c_cols=("label",)
    )
    votes = knn.groupBy(
        F.col("q_id").alias("q"),
        F.col("q_label").alias("label"),
        F.col("n_label").alias("cls"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    # AUC needs labeled ground truth (unlabeled test points have no
    # pos/neg identity) and a NULL "class" is not a class — both
    # filters are no-ops on the clean testdata
    votes = votes.where(F.col("label").isNotNull())
    classes = (
        embeddings_d(spark, sf_dir)
        .where(F.col("label").isNotNull())
        .select(F.col("label").alias("cls"))
        .distinct()
    )
    from big_data_fknn_spark.operators.metrics import dense_vote_scores, ovr_auc

    return ovr_auc(dense_vote_scores(votes, classes))


@register(
    "d11_histogram",
    oracle=f"""
SELECT CAST(floor(l_extendedprice / 10000) AS BIGINT) AS bucket,
       count(*) AS n,
       round(sum(CAST(l_extendedprice AS DECIMAL(38,10))), 6)::VARCHAR::DOUBLE AS total
FROM lineitem
WHERE {fin_sql("l_extendedprice")}
GROUP BY 1
""",
)
def d11_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram of lineitem prices (10k-wide buckets).

    Fixed bucket edges (constant divisor, floor) rather than
    min/max-derived edges: the same IEEE divide+floor happens in
    both engines, so boundary rows never straddle a bucket from
    last-ulp drift.  Bucket totals use the exact-decimal sum.  One
    partial+final hash aggregate, ~12 groups out — the map-side
    combine does essentially all the work, the shuffle is a few
    dozen rows.  Non-finite prices gate at the scan (a ±Inf price has
    no bucket; functions/numeric.py finite).
    """
    li = t(spark, sf_dir, "lineitem").where(finite("l_extendedprice"))
    return li.groupBy(
        F.floor(F.col("l_extendedprice") / 10000).cast("bigint").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_extendedprice").alias("total"),
    )


@register(
    "d12_stat_moments",
    oracle=f"""
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 6) AS sd_qty,
       round(var_samp(l_quantity), 6) AS var_qty,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(covar_samp(l_quantity, l_discount), 6) AS cov_qty_disc,
       count(*) AS n
FROM lineitem
WHERE {fin_sql("l_quantity")} AND {fin_sql("l_extendedprice")}
GROUP BY l_returnflag
""",
)
def d12_stat_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics (stddev/variance/correlation/
    covariance) per group.  Both engines use numerically stable
    co-moment merge formulas, so partition-order drift stays ~1e-12
    relative — far inside the 6-decimal round.  Inputs are kept to
    small-magnitude columns (quantity 1..50, discount 0..0.1) so the
    rounding boundary is never in play.  Scale: constant state per
    group (n, mean, M2, co-moment), merged associatively — the same
    partial+final HashAggregate shape as d1, no extra pass.  A single
    non-finite input makes every moment ±Inf/NaN — gated at the scan
    (functions/numeric.py finite)."""
    li = t(spark, sf_dir, "lineitem").where(
        finite("l_quantity") & finite("l_extendedprice")
    )
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("cov_qty_disc"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "d13_median",
    oracle=f"""
SELECT o_orderpriority,
       round(median(o_totalprice), 6) AS med_price,
       count(*) AS n
FROM orders WHERE {fin_sql("o_totalprice")}
GROUP BY o_orderpriority
""",
)
def d13_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped median (the `median` builtin, Spark 3.4+).

    Both engines interpolate the even-count midpoint as (a+b)/2 on
    doubles — the identical IEEE op — so the result hash-matches
    without a tolerance.  Scale note: exact median materializes the
    group's values for the percentile pass (unlike d12's constant
    state); for high-cardinality keys at 100 TB prefer
    approx_percentile (d3's sketch cousin) or x3's manual
    interpolation over a pre-aggregated value histogram.

    Non-finite prices gate at the scan: the engines disagree on NaN in
    a percentile buffer (Spark orders NaN greatest; DuckDB's is
    nondeterministic — the x3/d23 class), and ±Inf poisons the even-
    count midpoint interpolation."""
    o = t(spark, sf_dir, "orders").where(finite("o_totalprice"))
    return o.groupBy("o_orderpriority").agg(
        F.round(F.median("o_totalprice"), 6).alias("med_price"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "d14_conditional_agg",
    oracle=f"""
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
       bool_and(o_totalprice > 0) AS all_pos,
       bool_or(o_orderstatus = 'F') AS any_final,
       arg_max(o_orderkey,
               CAST(round(o_totalprice * 100) AS HUGEINT)
               * 10000000000000000000::HUGEINT
               + o_orderkey) AS top_order
FROM orders WHERE {fin_sql("o_totalprice")}
GROUP BY o_orderpriority
""",
)
def d14_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional / selector aggregates: count_if (SQL FILTER),
    bool_and/bool_or, and max_by (arg_max).  All are single-pass
    partial+final aggregates — constant merge state, map-side combine
    does the work at 100 TB, same as d1.

    Determinism note: max_by ties are engine-arbitrary, so the
    ordering value packs (cents, orderkey) into one 128-bit integer —
    Spark spells it DECIMAL(38,0), DuckDB HUGEINT; both are exact
    integer arithmetic on the same values.  cents = round(price·100)
    stays a double-exact integer up to 2^53 (price ≤ ~9e13, far above
    any real total), the 10^19 shift clears the full BIGINT orderkey
    range (< 9.3e18), and the packed value ≤ ~1e33 fits both 128-bit
    representations — no overflow at any representable input, unlike
    the original 64-bit pack (2^43-cent / 10^10-key assumption, which
    a 1.5e12 price or a 2^53 surrogate key silently breaks).

    Non-finite prices gate at the scan: Spark's non-ANSI decimal cast
    maps ±Inf/NaN to NULL (silently excluding the row from max_by)
    while the oracle's HUGEINT cast raises — the one-bad-row
    divergence class (round-9 ADVICE)."""
    o = t(spark, sf_dir, "orders").where(finite("o_totalprice"))
    packed = (
        F.round(F.col("o_totalprice") * 100).cast("decimal(20,0)")
        * F.expr("CAST('10000000000000000000' AS DECIMAL(20,0))")
        + F.col("o_orderkey")
    )
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 150000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_pos"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_final"),
        F.max_by("o_orderkey", packed).alias("top_order"),
    )


@register(
    "d15_string_agg",
    oracle="""
SELECT r.r_name,
       string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
       count(*) AS n_nations
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
)
def d15_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg): collect,
    sort inside the aggregate, then join with a delimiter — the
    deterministic form (an unordered listagg is nondeterministic
    under parallelism and would never hash-match).  collect_list's
    partial states concat map-side like any agg buffer; the sort cost
    is per-group output size, not input size."""
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


@register("d16_approx_percentile", oracle=None)  # sketch internals differ
def d16_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch): bounded-memory
    quantiles whose partial sketches merge map-side — the 100 TB
    answer where x3's exact percentile would need each group's full
    value set in one place.  Sketch internals differ per engine →
    rows-only here; tests/test_scale_stress.py asserts the estimates
    land within the sketch's accuracy bound of x3's exact values."""
    c = t(spark, sf_dir, "customer")
    # one GK sketch queried at both percentiles (round-12, the d23
    # device): the percentage argument only QUERIES the sketch — two
    # scalar aggs built two identical sketches from the same rows, so
    # the array form halves the sketch-update work with bit-identical
    # estimates (verified values-equal at sf0.01/0.1)
    qs = c.groupBy("c_mktsegment").agg(
        F.percentile_approx(
            "c_acctbal", F.array(F.lit(0.5), F.lit(0.9)), F.lit(10000)
        ).alias("qa")
    )
    return qs.select(
        "c_mktsegment",
        F.round(F.col("qa")[0], 6).alias("p50_approx"),
        F.round(F.col("qa")[1], 6).alias("p90_approx"),
    )


@register(
    "d18_entropy",
    oracle="""
WITH c AS (SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2),
tot AS (SELECT source, sum(n) AS tot, count(*) AS n_langs FROM c GROUP BY 1)
SELECT c.source,
       CAST(max(t.tot) AS BIGINT) AS n_docs,
       max(t.n_langs) AS n_langs,
       round(-sum((c.n * 1.0 / t.tot) * ln(c.n * 1.0 / t.tot)), 6) AS entropy,
       round(1.0 - sum((c.n * 1.0 / t.tot) * (c.n * 1.0 / t.tot)), 6) AS gini
FROM c JOIN tot t ON c.source = t.source
GROUP BY c.source
""",
)
def d18_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy + Gini impurity of each source's language mix —
    the diversity diagnostics a corpus-curation pass reports next to
    d1's plain counts (and the split-quality criteria of every
    decision-tree learner).  Two chained aggregations: per-(source,
    lang) counts (partial+final, map-side combined), then per-source
    entropy over at most |langs| rows per group — the second shuffle
    carries one row per (source, lang), never documents.  Both
    engines evaluate the identical -SUM p·ln p over exact integer
    ratios → 6dp round is far above float drift."""
    c = (
        t(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("source")
    p = F.col("n") * 1.0 / F.sum("n").over(w)
    return (
        c.withColumn("p", p)
        .groupBy("source")
        .agg(
            F.sum("n").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).alias("n_langs"),
            F.round(-F.sum(F.col("p") * F.log("p")), 6).alias("entropy"),
            F.round(F.lit(1.0) - F.sum(F.col("p") * F.col("p")), 6).alias("gini"),
        )
    )


@register("d19_sketch_merge", oracle=None)  # sketch internals are engine-specific
def d19_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-count sketches (Apache DataSketches HLL) —
    the property that makes approximate aggregation work at 100 TB:
    build one sketch PER DAY per event type, union the day sketches,
    and estimate — against the estimate from a single direct pass.
    Mergeability means daily sketches can be stored (bytes per day),
    rolled up across any date range without rescanning events, and
    re-aggregated along any dimension — the sketch is the datastore,
    the rescan never happens.  tests/test_scale_stress.py asserts
    est_merged == est_direct exactly (the union of partials IS the
    algorithm's own merge, not an approximation of it) and both land
    within the sketch's published error of the exact count."""
    e = t(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    merged = (
        daily.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_merged"))
    )
    direct = e.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est_direct"),
        F.countDistinct("user_id").alias("exact"),
    )
    return merged.join(direct, "event_type").select(
        "event_type", "est_merged", "est_direct", "exact"
    )


@register(
    "d20_prf1",
    oracle=f"""
WITH {_KNN_PRED_CTES},
act AS (SELECT label AS cls, count(*) AS n_act FROM pred GROUP BY 1),
prd AS (SELECT pred AS cls, count(*) AS n_prd FROM pred GROUP BY 1),
tp AS (SELECT label AS cls, count(*) AS tp FROM pred WHERE label = pred GROUP BY 1),
per AS (
  SELECT coalesce(a.cls, p.cls)::INT AS cls,
         coalesce(tp.tp, 0) AS tp,
         coalesce(a.n_act, 0) AS n_act,
         coalesce(p.n_prd, 0) AS n_prd
  FROM act a FULL JOIN prd p ON a.cls = p.cls
  LEFT JOIN tp ON tp.cls = coalesce(a.cls, p.cls)),
m AS (
  SELECT cls,
         CASE WHEN n_prd > 0 THEN tp::DOUBLE / n_prd END AS p_raw,
         CASE WHEN n_act > 0 THEN tp::DOUBLE / n_act END AS r_raw
  FROM per),
m2 AS (
  SELECT cls, round(p_raw, 6) AS prec, round(r_raw, 6) AS rec,
         round(CASE WHEN p_raw + r_raw > 0
                    THEN 2 * p_raw * r_raw / (p_raw + r_raw) END, 6) AS f1
  FROM m)
SELECT cls, prec, rec, f1 FROM m2
UNION ALL
SELECT -1 AS cls,
       round(sum(CAST(prec AS DECIMAL(38,10)))::VARCHAR::DOUBLE / count(prec), 6),
       round(sum(CAST(rec AS DECIMAL(38,10)))::VARCHAR::DOUBLE / count(rec), 6),
       round(sum(CAST(f1 AS DECIMAL(38,10)))::VARCHAR::DOUBLE / count(f1), 6)
FROM m2
""",
)
def d20_prf1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision / recall / F1 over the crisp-kNN
    predictions, plus the macro average as cls = -1 — the metric
    trio next to d10's accuracy and d17's AUC in any classifier
    report.  All ratios are int/int divisions (identical doubles in
    both engines); the macro average re-sums the ROUNDED per-class
    values as exact decimals, so partition order can't perturb the
    6dp output (the d17 device).

    Scale: three hash aggregates over the prediction table and a
    10-row join — metric cost is the classifier's, not this."""
    from big_data_fknn_spark.queries.ml import j1_knn_crisp

    p = j1_knn_crisp(spark, sf_dir)
    act = p.groupBy(F.col("label").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_act")
    )
    prd = p.groupBy(F.col("pred").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_prd")
    )
    tp = (
        p.where(F.col("label") == F.col("pred"))
        .groupBy(F.col("label").alias("cls"))
        .agg(F.count(F.lit(1)).alias("tp"))
    )
    per = (
        act.join(prd, "cls", "full")
        .join(tp, "cls", "left")
        .fillna(0, ["n_act", "n_prd", "tp"])
    )
    p_raw = F.when(
        F.col("n_prd") > 0, F.col("tp").cast("double") / F.col("n_prd")
    )
    r_raw = F.when(
        F.col("n_act") > 0, F.col("tp").cast("double") / F.col("n_act")
    )
    m2 = per.select(
        F.col("cls").cast("int").alias("cls"),
        F.round(p_raw, 6).alias("prec"),
        F.round(r_raw, 6).alias("rec"),
        F.round(
            F.when(p_raw + r_raw > 0, 2 * p_raw * r_raw / (p_raw + r_raw)), 6
        ).alias("f1"),
    )
    dec = "decimal(38,10)"
    macro = m2.agg(
        F.lit(-1).cast("int").alias("cls"),
        F.round(
            F.sum(F.col("prec").cast(dec)).cast("double") / F.count("prec"), 6
        ).alias("prec"),
        F.round(
            F.sum(F.col("rec").cast(dec)).cast("double") / F.count("rec"), 6
        ).alias("rec"),
        F.round(
            F.sum(F.col("f1").cast(dec)).cast("double") / F.count("f1"), 6
        ).alias("f1"),
    )
    return m2.unionByName(macro)


@register(
    "d21_weighted_median",
    oracle=f"""
WITH li AS (
  SELECT l_returnflag AS flag, l_extendedprice AS x,
         CAST(l_quantity AS DECIMAL(38,10)) AS w
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
    AND {fin_sql("l_quantity")} AND {fin_sql("l_extendedprice")}),
cum AS (
  SELECT flag, x,
         sum(w) OVER (PARTITION BY flag ORDER BY x
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         sum(w) OVER (PARTITION BY flag) AS tw
  FROM li)
SELECT flag, min(x) AS wmedian
FROM cum WHERE 2 * cw >= tw GROUP BY flag
""",
)
def d21_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median (price weighted by quantity, per return
    flag): the smallest x whose cumulative weight reaches half the
    total.  The cumulative sum uses a RANGE frame ordered by the
    value itself, so tied prices accumulate as one block — no
    arbitrary intra-tie order can change any visible cw — and
    weights are pinned to exact decimals, so partition order can't
    perturb the comparison either.  min() over the qualifying set is
    then fully deterministic.

    Scale: one shuffle (window by flag) + one hash agg.  Contrast
    d13's percentile_approx: this is the EXACT path — at 100 TB you
    run it per group only when exactness is demanded; the window
    sort is the cost (same as any exact quantile)."""
    # a row without a value can't rank, one without a weight can't
    # weigh — and a NULL x in the window ORDER BY would also sit at
    # opposite ends in Spark (NULLS FIRST) vs the oracle (NULLS LAST)
    li = (
        t(spark, sf_dir, "lineitem")
        .where(
            F.col("l_extendedprice").isNotNull()
            & F.col("l_quantity").isNotNull()
            & finite("l_quantity")
            & finite("l_extendedprice")
        )
        .select(
            F.col("l_returnflag").alias("flag"),
            F.col("l_extendedprice").alias("x"),
            F.col("l_quantity").cast(DEC).alias("w"),
        )
    )
    wcum = (
        Window.partitionBy("flag")
        .orderBy("x")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("flag")
    cum = li.select(
        "flag",
        "x",
        F.sum("w").over(wcum).alias("cw"),
        F.sum("w").over(wtot).alias("tw"),
    )
    return (
        cum.where(2 * F.col("cw") >= F.col("tw"))
        .groupBy("flag")
        .agg(F.min("x").alias("wmedian"))
    )


# ------------------------------------------ D22. Count-Min sketch

_CMS_D = 4  # hash rows
_CMS_W = 256  # buckets per row
_CMS_PROBE_MOD = 997


@register(
    "d22_countmin",
    oracle=f"""
WITH items AS (SELECT l_partkey AS pk FROM lineitem),
rows_ AS (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS r),
hashed AS (
  SELECT pk, r,
         ('0x' || substr(md5(r || '#' || pk), 1, 8))::BIGINT % {_CMS_W} AS b
  FROM items CROSS JOIN rows_),
counters AS (SELECT r, b, count(*) AS c FROM hashed GROUP BY r, b),
probes AS (SELECT p_partkey AS pk FROM part WHERE p_partkey % {_CMS_PROBE_MOD} = 0),
pbuckets AS (
  SELECT pk, r,
         ('0x' || substr(md5(r || '#' || pk), 1, 8))::BIGINT % {_CMS_W} AS b
  FROM probes CROSS JOIN rows_),
est AS (
  SELECT p.pk, min(coalesce(c.c, 0))::BIGINT AS est_n
  FROM pbuckets p LEFT JOIN counters c ON c.r = p.r AND c.b = p.b
  GROUP BY p.pk),
tru AS (
  SELECT pk, count(*) AS true_n FROM items
  WHERE pk % {_CMS_PROBE_MOD} = 0 GROUP BY pk)
SELECT e.pk AS p_partkey, coalesce(t.true_n, 0) AS true_n, e.est_n
FROM est e LEFT JOIN tru t ON t.pk = e.pk
""",
)
def d22_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch as a DataFrame aggregate: d=4 md5-derived
    hash rows × w=256 counters over lineitem part keys, probed for a
    deterministic key sample — est_n = min over rows of the hit
    counter (≥ true_n always; equality when no collision).  The
    hashes are substr(md5)-mod in BOTH engines, so the entire sketch
    is value-oracled — unlike d3's opaque HLL, this shows the sketch
    CONSTRUCTION as engine-native ops.

    Scale: the counter table is d·w rows regardless of input (the
    classic CMS bound); building it is one partial-aggregable
    groupBy.  Merging shards = summing counter tables (the same
    merge d19 demonstrates for HLL).  Probe lookups broadcast the
    d·w table."""
    li = t(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("pk"))

    def bucket(r):
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{r}#"), F.col("pk"))), 1, 8),
                16,
                10,
            ).cast("long")
            % _CMS_W
        )

    hashed = li.select(
        "pk",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(r).alias("r"), bucket(r).alias("b"))
                    for r in range(_CMS_D)
                ]
            )
        ).alias("h"),
    ).select("pk", F.col("h.r").alias("r"), F.col("h.b").alias("b"))
    counters = hashed.groupBy("r", "b").agg(F.count(F.lit(1)).alias("c"))

    probes = (
        t(spark, sf_dir, "part")
        .where(F.col("p_partkey") % _CMS_PROBE_MOD == 0)
        .select(F.col("p_partkey").alias("pk"))
    )
    pbuckets = probes.select(
        "pk",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(r).alias("r"), bucket(r).alias("b"))
                    for r in range(_CMS_D)
                ]
            )
        ).alias("h"),
    ).select("pk", F.col("h.r").alias("r"), F.col("h.b").alias("b"))
    est = (
        pbuckets.join(F.broadcast(counters), ["r", "b"], "left")
        .groupBy("pk")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_n"))
    )
    tru = (
        li.where(F.col("pk") % _CMS_PROBE_MOD == 0)
        .groupBy("pk")
        .agg(F.count(F.lit(1)).alias("true_n"))
    )
    return (
        est.join(F.broadcast(tru), "pk", "left")
        .select(
            F.col("pk").alias("p_partkey"),
            F.coalesce(F.col("true_n"), F.lit(0)).alias("true_n"),
            "est_n",
        )
    )


@register(
    "d23_percentile_cont",
    oracle=f"""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 6) AS q25,
       round(quantile_cont(l_extendedprice, 0.50), 6) AS q50,
       round(quantile_cont(l_extendedprice, 0.95), 6) AS q95,
       round(quantile_cont(l_extendedprice, 0.99), 6) AS q99
FROM lineitem
WHERE {fin_sql("l_extendedprice")}
GROUP BY l_returnflag
""",
)
def d23_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT linearly-interpolated percentiles per group (SQL
    PERCENTILE_CONT semantics): both engines sort the group and
    interpolate x[⌊h⌋] + (h−⌊h⌋)·(x[⌈h⌉]−x[⌊h⌋]) at the same h, so
    the doubles agree bit-for-bit; complements d13 (exact discrete
    median) and d16 (approx sketch, error-bounded rows-only).

    Scale: exact quantiles need the per-group sort — the honest
    cost; Spark's percentile() aggregates a per-partition buffer and
    merges, so it distributes without a global sort.  Reach for d16's
    KLL-style sketch when 1% error is acceptable.

    Non-finite values gate at the scan: the engines DISAGREE on NaN in
    quantiles (Spark's percentile orders NaN greatest; DuckDB's
    quantile_cont ignores it — pinned on the round-7 extremes sweep),
    and interpolation against ±Inf is meaningless anyway."""
    li = t(spark, sf_dir, "lineitem").where(finite("l_extendedprice"))
    # ONE percentile aggregate over an array of percentages (round-12,
    # guide §5): four scalar `percentile(col, p)` aggs each buffered
    # EVERY group value independently — 4× the ObjectHashAggregate
    # buffer, spill and merge traffic for one sorted-group pass worth
    # of information.  The array form sorts the shared buffer once and
    # interpolates all four h's from it — same PERCENTILE_CONT
    # arithmetic on the same sorted values, bit-identical doubles
    # (values-equal verified + oracle hash-MATCH).  Interleaved A/B
    # (6 reps, one session): exec min 8.67 → 1.76 s, med 25.1 → 5.0 s.
    qs = li.groupBy("l_returnflag").agg(
        F.percentile(
            "l_extendedprice",
            F.array(F.lit(0.25), F.lit(0.50), F.lit(0.95), F.lit(0.99)),
        ).alias("qa")
    )
    return qs.select(
        "l_returnflag",
        *[
            F.round(F.col("qa")[i], 6).alias(name)
            for i, name in ((0, "q25"), (1, "q50"), (2, "q95"), (3, "q99"))
        ],
    )
