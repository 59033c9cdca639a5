"""Distributed exact k-nearest-neighbors join.

Re-expresses the reference's kNN-IS core (reconstructed [R
src/main/scala/kNN_IS.scala]; Maillo et al., KBS 2017 §3): broadcast
the query set, stream candidate partitions past it computing
distances, keep only k per query point.

Spark-first mapping (SURVEY.md §2 c1 + e1):

- broadcast test chunk × mapPartitions  →  ``candidates.crossJoin(
  F.broadcast(queries))`` — Catalyst plans a
  BroadcastNestedLoopJoin, the same dataflow as the reference's
  hand-rolled broadcast + partition scan.
- bounded k-size candidate arrays merged in reduceByKey  →
  ``row_number() OVER (PARTITION BY q ORDER BY dist, n) <= k``.
  Spark ≥3.5 plans a WindowGroupLimit below the shuffle, so each map
  task keeps only k rows per query before exchanging — literally the
  reference's partial top-k trick, built into the engine
  (verified in tests/test_plans.py).
- the reference's iterative test-chunking (numIterations/maxWeight)
  is unnecessary: shuffles spill, AQE re-sizes partitions.

Scale path (100 TB): brute force is O(|Q|·|C|) — correct but
quadratic.  Keep |Q| chunked via broadcast (≤ ~1 GB per chunk), or
switch to LSH candidate generation (operators/similarity.py) and
re-rank exactly; both preserve this operator's output contract.

Determinism contract for the DuckDB oracle: ties broken by
``(dist, n_id)`` — n_id unique ⇒ unique ranking (SURVEY.md §7.2).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from big_data_fknn_spark.functions.distance import euclidean


def knn_join(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    metric: Callable[[Column, Column], Column] = euclidean,
    q_cols: tuple[str, str] = ("vec_id", "emb"),
    c_cols: tuple[str, str] = ("vec_id", "emb"),
    exclude_self: bool = False,
    keep_q_cols: tuple[str, ...] = (),
    keep_c_cols: tuple[str, ...] = (),
) -> DataFrame:
    """For every query row, the k nearest candidate rows.

    Returns ``(q_id, <keep_q_cols>, n_id, <keep_c_cols>, dist, rn)``
    with rn in 1..k ordered by (dist, n_id).

    ``exclude_self=True`` gives the leave-one-out variant used by the
    fuzzy stage-1 class-membership computation (a theta join,
    SURVEY.md §2 c2).
    """
    q_id, q_vec = q_cols
    c_id, c_vec = c_cols
    q = queries.select(
        F.col(q_id).alias("q_id"),
        F.col(q_vec).alias("_q_vec"),
        *[F.col(c).alias(f"q_{c}") for c in keep_q_cols],
    )
    c = candidates.select(
        F.col(c_id).alias("n_id"),
        F.col(c_vec).alias("_c_vec"),
        *[F.col(c_).alias(f"n_{c_}") for c_ in keep_c_cols],
    )
    # Broadcast the query side: the candidate (train) side is the big
    # table and must stream; this is the reference's broadcast choice.
    pairs = c.join(F.broadcast(q), F.col("q_id") != F.col("n_id") if exclude_self else F.lit(True))
    pairs = pairs.withColumn("dist", metric(F.col("_q_vec"), F.col("_c_vec")))
    w = Window.partitionBy("q_id").orderBy(F.col("dist").asc(), F.col("n_id").asc())
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("_q_vec", "_c_vec")
    )
