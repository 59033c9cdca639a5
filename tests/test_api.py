"""Reference-API facade: the setup(...).predict() surface must return
exactly what the registered queries return (which the DuckDB oracle
already vouches for), across both reference distance encodings."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_fknn_spark.api import FuzzyKNNClassifier, KNNISClassifier
from big_data_fknn_spark.functions.distance import manhattan
from big_data_fknn_spark.operators.knn import knn_join, knn_join_blas
from big_data_fknn_spark.queries import load_all
from big_data_fknn_spark.tables import train_test_split

SF_DIR = "/root/testdata/sf0.001"

DEFS = load_all()


def rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_knn_is_matches_j1(spark):
    train, test = train_test_split(spark, SF_DIR)
    clf = KNNISClassifier.setup(train, test, k=5, distance_type=2)
    got = rows(clf.predict(), "vec_id", "label", "pred")
    want = rows(DEFS["j1_knn_crisp"].fn(spark, SF_DIR), "vec_id", "label", "pred")
    assert got == want


def test_fuzzy_knn_matches_j3(spark):
    train, test = train_test_split(spark, SF_DIR)
    clf = FuzzyKNNClassifier.setup(train, test, k=5)
    got = rows(
        clf.predict().withColumn("conf", F.round("conf", 6)),
        "vec_id",
        "label",
        "pred",
        "conf",
    )
    want = rows(
        DEFS["j3_fknn_stage2"].fn(spark, SF_DIR), "vec_id", "label", "pred", "conf"
    )
    assert got == want


def test_manhattan_kernel_matches_expression(spark):
    train, test = train_test_split(spark, SF_DIR)
    a = rows(
        knn_join(test, train, k=5, metric=manhattan), "q_id", "rn", "n_id"
    )
    b = rows(
        knn_join_blas(test, train, k=5, metric="manhattan"), "q_id", "rn", "n_id"
    )
    assert a == b


def test_confusion_and_accuracy_consistent(spark):
    train, test = train_test_split(spark, SF_DIR)
    clf = KNNISClassifier.setup(train, test, k=5, distance_type=1)
    cm = clf.confusion_matrix().collect()
    total = sum(r["n"] for r in cm)
    right = sum(r["n"] for r in cm if r["label"] == r["pred"])
    assert total == test.count()
    assert abs(clf.accuracy() - right / total) < 1e-12


def test_knnis_auc_matches_d17(spark):
    """The API's auc() is the same computation d17_auc oracles — both
    come from operators/metrics.ovr_auc over k=5 vote scores."""
    from big_data_fknn_spark.api import KNNISClassifier
    from big_data_fknn_spark.queries import load_all
    from big_data_fknn_spark.tables import train_test_split

    sf = "/root/testdata/sf0.01"
    train, test = train_test_split(spark, sf)
    api_rows = {
        r.cls: r.auc
        for r in KNNISClassifier.setup(train, test, k=5).auc().collect()
    }
    d17_rows = {
        r.cls: r.auc for r in load_all()["d17_auc"].fn(spark, sf).collect()
    }
    assert api_rows == d17_rows
    assert -1 in api_rows and 0.0 < api_rows[-1] <= 1.0
