"""Exact distributed Fuzzy k-Nearest-Neighbors (the reference's flagship).

Two-stage GE-FkNN (Maillo, Luengo, García, Herrera, Triguero, "Exact
fuzzy k-nearest neighbor classification for big datasets",
FUZZ-IEEE 2017; Keller, Gray, Givens, IEEE SMC 1985; reconstructed
reference surface [R src/main/scala/FuzzyKNN.scala]):

Stage 1 — class membership degrees (CMD): leave-one-out kNN of the
training set against itself; Keller init per train point i of class
c_i with n_j of its k neighbors in class j:

    u_j(i) = 0.51 + 0.49·(n_j/k)   if j == c_i
           = 0.49·(n_j/k)          otherwise

Stage 2 — fuzzy classification: kNN of test vs train; each neighbor
votes its membership vector weighted by w = 1/d^(2/(m-1)) (m=2 ⇒
1/d²); normalized class scores u_q(j) = Σ w·u_n(j) / Σ w;
prediction = argmax_j (ties → smallest class id).

Both stages are pure DataFrame compositions (crossJoin+window top-k,
groupBy aggregates, CASE) — no UDFs, fully codegen'd, and the exact
same neighbor sets as the sequential algorithm (the papers'
"exactness" property carries over because the top-k is global).

Memberships are kept in sparse long format ``(vec_id, cls, u)`` —
rows only for classes a point has evidence for — which at 100 TB
avoids a dense numClasses-wide matrix and keeps the stage-2 join a
plain shuffled equi-join on the neighbor id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from big_data_fknn_spark.operators.knn import knn_join_blas

EPS = 1e-12  # guards w = 1/d² against duplicate points (d = 0)


def keller_memberships(train: DataFrame, k: int = 5) -> DataFrame:
    """Stage 1: sparse membership table ``(vec_id, cls, u)``.

    ``train`` needs columns (vec_id, emb: array<double>, label).
    """
    knn = knn_join_blas(
        train,
        train,
        k=k,
        exclude_self=True,
        keep_q_cols=("label",),
        keep_c_cols=("label",),
    )
    # neighbor-class counts per train point (partial+final hash agg)
    counts = knn.groupBy(
        F.col("q_id").alias("vec_id"),
        F.col("q_label").alias("own"),
        F.col("n_label").alias("cls"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    # ensure the own-class row exists even with zero same-class
    # neighbors (its membership is still 0.51): union a zero row per
    # train point, then re-aggregate.
    own_rows = train.select(
        "vec_id",
        F.col("label").alias("own"),
        F.col("label").alias("cls"),
        F.lit(0).cast("long").alias("cnt"),
    )
    merged = counts.unionByName(own_rows).groupBy("vec_id", "own", "cls").agg(
        F.sum("cnt").alias("cnt")
    )
    u = F.when(
        F.col("cls") == F.col("own"),
        0.51 + 0.49 * F.col("cnt") / F.lit(float(k)),
    ).otherwise(0.49 * F.col("cnt") / F.lit(float(k)))
    return merged.select("vec_id", "cls", u.alias("u"))


def fknn_classify(
    test: DataFrame,
    train: DataFrame,
    memberships: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Stage 2: ``(vec_id, label, pred, conf)`` per test point.

    conf = the winning class's normalized fuzzy membership, rounded
    to 6 decimals for cross-engine hash stability (SURVEY.md §7.1).
    """
    knn = knn_join_blas(test, train, k=k, keep_q_cols=("label",))
    knn = knn.withColumn(
        "w", F.lit(1.0) / F.greatest(F.col("dist") * F.col("dist"), F.lit(EPS))
    )
    # total weight per query — an unbounded-frame window sum over the
    # SAME q_id partitioning the top-k window just established, so it
    # adds no exchange (round-12: previously a separate groupBy(q_id)
    # aggregate joined back on q_id — one extra shuffle + one join,
    # and the knn subtree's window/filter re-ran once per branch).
    # Value-identical: the k weights are summed in the same
    # (dist, n_id) order the partition is already sorted in.
    wq = Window.partitionBy("q_id").orderBy(F.col("dist").asc(), F.col("n_id").asc())
    knn = knn.withColumn(
        "tw", F.sum("w").over(wq.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    )
    scores = (
        knn.join(memberships, knn.n_id == memberships.vec_id)
        .groupBy("q_id", "q_label", "cls", "tw")
        .agg(F.sum(F.col("w") * F.col("u")).alias("s"))
        .withColumn("u_norm", F.col("s") / F.col("tw"))
    )
    pick = Window.partitionBy("q_id").orderBy(F.col("u_norm").desc(), F.col("cls").asc())
    return (
        scores.withColumn("rnk", F.row_number().over(pick))
        .where(F.col("rnk") == 1)
        .select(
            F.col("q_id").alias("vec_id"),
            F.col("q_label").alias("label"),
            F.col("cls").alias("pred"),
            F.round("u_norm", 6).alias("conf"),
        )
    )


def fknn_pipeline(train: DataFrame, test: DataFrame, k: int = 5) -> DataFrame:
    """Full two-stage FkNN: stage-1 memberships feed stage-2 voting."""
    memb = keller_memberships(train, k=k)
    return fknn_classify(test, train, memb, k=k)
