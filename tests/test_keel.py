"""KEEL source: header parsing, nominal decoding, bit-exact round trip."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from big_data_fknn_spark.sources import parse_keel_header, read_keel, write_keel
from big_data_fknn_spark.tables import embeddings_d

HEADER = """@relation toy
@attribute f0 real [-1.5, 2.5]
@attribute f1 integer [0, 9]
@attribute color {red, green, blue}
@attribute class {0, 1}
@inputs f0, f1, color
@outputs class
"""


def test_parse_header():
    ks = parse_keel_header(HEADER)
    assert ks.names == ["f0", "f1", "color", "class"]
    assert ks.kinds == {
        "f0": "real",
        "f1": "integer",
        "color": "nominal",
        "class": "nominal",
    }
    assert ks.ranges["f0"] == (-1.5, 2.5)
    assert ks.nominal_values["color"] == ["red", "green", "blue"]
    assert ks.outputs == ["class"]
    assert ks.feature_names == ["f0", "f1", "color"]


def test_nominal_decoding(spark):
    d = tempfile.mkdtemp(prefix="keel_toy_")
    with open(f"{d}/toy.header", "w") as fh:
        fh.write(HEADER)
    with open(f"{d}/toy.dat", "w") as fh:
        fh.write("@data\n0.25,3,green,1\n-1.0,7,red,0\n2.5,0,blue,1\n")
    df, ks = read_keel(spark, f"{d}/toy.header", f"{d}/toy.dat")
    rows = sorted(
        (tuple(r["features"]), r["label"]) for r in df.collect()
    )
    # color decoded to its value-list position, label to its code
    assert rows == [
        ((-1.0, 7.0, 0.0), 0.0),
        ((0.25, 3.0, 1.0), 1.0),
        ((2.5, 0.0, 2.0), 1.0),
    ]


def test_roundtrip_bit_exact(spark):
    emb = (
        embeddings_d(spark, "/root/testdata/sf0.001")
        .select(
            F.col("vec_id"),
            F.col("emb").alias("features"),
            F.col("label").cast("double").alias("label"),
        )
    )
    d = tempfile.mkdtemp(prefix="keel_rt_")
    write_keel(
        emb.select("features", "label"), f"{d}/e.header", f"{d}/e.dat"
    )
    back, ks = read_keel(spark, f"{d}/e.header", f"{d}/e.dat")
    assert len(ks.feature_names) == 64
    # %.17g rendering → exact doubles: compare summed features per label
    a = sorted(
        emb.groupBy("label")
        .agg(F.sum(F.element_at("features", 1)).alias("s"))
        .collect()
    )
    b = sorted(
        back.groupBy("label")
        .agg(F.sum(F.element_at("features", 1)).alias("s"))
        .collect()
    )
    assert [(r["label"], r["s"]) for r in a] == [(r["label"], r["s"]) for r in b]
