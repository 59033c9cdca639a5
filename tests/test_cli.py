"""CLI entry points (the reference's spark-submit runners): run both
algorithms in-process over KEEL and parquet inputs and check the
emitted artifacts — predictions, confusion matrix, metrics.json."""

from __future__ import annotations

import json
import tempfile

from pyspark.sql import functions as F

from big_data_fknn_spark.cli import main
from big_data_fknn_spark.sources import write_keel
from big_data_fknn_spark.tables import train_test_split

SF_DIR = "/root/testdata/sf0.001"


def test_knn_cli_parquet(spark, tmp_path):
    train, test = train_test_split(spark, SF_DIR)
    train.write.parquet(f"{tmp_path}/train")
    test.write.parquet(f"{tmp_path}/test")
    out = f"{tmp_path}/out"
    main(
        [
            "knn",
            "--format", "parquet",
            "--train", f"{tmp_path}/train",
            "--test", f"{tmp_path}/test",
            "--k", "5",
            "--distance", "1",
            "--out", out,
        ]
    )
    m = json.load(open(f"{out}/metrics.json"))
    assert m["n_test"] == test.count()
    pred = spark.read.parquet(f"{out}/predictions")
    assert pred.columns == ["vec_id", "label", "pred"]
    assert pred.count() == m["n_test"]
    conf = spark.read.parquet(f"{out}/confusion")
    assert conf.agg(F.sum("n")).first()[0] == m["n_test"]


def test_fknn_cli_keel(spark):
    train, test = train_test_split(spark, SF_DIR)
    d = tempfile.mkdtemp(prefix="cli_keel_")
    for name, df in (("train", train), ("test", test)):
        write_keel(
            df.select(
                F.col("emb").alias("features"),
                F.col("label").cast("double").alias("label"),
            ),
            f"{d}/{name}.header",
            f"{d}/{name}.dat",
        )
    main(
        [
            "fknn",
            "--header", f"{d}/train.header",
            "--train", f"{d}/train.dat",
            "--test", f"{d}/test.dat",
            "--k", "5",
            "--out", f"{d}/out",
        ]
    )
    m = json.load(open(f"{d}/out/metrics.json"))
    assert m["algo"] == "fknn" and m["n_test"] == 100
    pred = spark.read.parquet(f"{d}/out/predictions")
    assert set(pred.columns) == {"vec_id", "label", "pred", "conf"}
