"""knn_join_blas must return the SAME neighbors as the declarative
knn_join — the papers' exactness property ([P FkNN-BD §III]) must
survive the kernel swap.  Distances may differ in final ulps (BLAS
vs sequential fold), so sets are compared on ids + rounded dist."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_fknn_spark.operators.knn import knn_join, knn_join_blas
from big_data_fknn_spark.tables import embeddings_d, train_test_split

SF_DIR = "/root/testdata/sf0.001"


def neighbor_set(df):
    return sorted(
        (r["q_id"], r["rn"], r["n_id"], round(r["dist"], 9))
        for r in df.select("q_id", "rn", "n_id", "dist").collect()
    )


@pytest.mark.parametrize("k", [1, 5, 11])
def test_blas_matches_declarative(spark, k):
    train, test = train_test_split(spark, SF_DIR)
    a = neighbor_set(knn_join(test, train, k=k))
    b = neighbor_set(knn_join_blas(test, train, k=k))
    assert a == b


def test_blas_exclude_self_leave_one_out(spark):
    emb = embeddings_d(spark, SF_DIR)
    a = neighbor_set(knn_join(emb, emb, k=3, exclude_self=True))
    b = neighbor_set(knn_join_blas(emb, emb, k=3, exclude_self=True))
    assert a == b
    assert all(q != n for q, _, n, _ in b)


def test_blas_chunking_invariant(spark, monkeypatch):
    """Splitting the query side into many broadcast chunks must not
    change results (the kNN-IS iterative scheme is result-neutral)."""
    import big_data_fknn_spark.operators.knn as knn_mod

    train, test = train_test_split(spark, SF_DIR)
    whole = neighbor_set(knn_join_blas(test, train, k=5))
    monkeypatch.setattr(knn_mod, "_CHUNK", 7)  # 100 queries → 15 chunks
    chunked = neighbor_set(knn_join_blas(test, train, k=5))
    assert whole == chunked


def test_blas_cosine_metric(spark):
    emb = embeddings_d(spark, SF_DIR)
    probes = emb.where(F.col("vec_id") % 50 == 0)
    got = knn_join_blas(probes, emb, k=5, metric="cosine_neg", exclude_self=True)
    rows = got.select("q_id", "rn", "dist").collect()
    assert len(rows) == probes.count() * 5
    # negated cosine of unit vectors ∈ [-1, 1]
    assert all(-1.0001 <= r["dist"] <= 1.0001 for r in rows)
