"""Cross-engine float determinism for the distance expressions.

functions/distance.py claims its left-fold accumulation produces
bit-identical doubles to DuckDB's list functions on identical
array<double> inputs — the property every kNN ranking oracle rests
on (SURVEY.md §7.1/§7.2).  Checked here on adversarial vectors:
denormals, huge/tiny magnitude mixes, negative zeros, repeated
values.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

from big_data_fknn_spark.functions.distance import cosine_sim, dot, euclidean, manhattan

VECS = [
    ([0.0] * 8, [0.0] * 8),
    ([1e-308, 1e308, -1e-308, 1.5, -2.5, 3.25, 0.1, 0.2],
     [2e-308, -1e307, 5e-309, -1.5, 2.5, -3.25, 0.3, 0.7]),
    ([-0.0, 0.1 + 0.2, 1 / 3, 2 / 3, 7e-10, -7e10, 1.0, -1.0],
     [0.0, 0.3, 1 / 3, -2 / 3, -7e-10, 7e10, -1.0, 1.0]),
    ([3.141592653589793] * 8, [2.718281828459045] * 8),
]


@pytest.fixture(scope="module")
def frames(spark):
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("a", ArrayType(DoubleType())),
            StructField("b", ArrayType(DoubleType())),
        ]
    )
    rows = [(i, a, b) for i, (a, b) in enumerate(VECS)]
    sdf = spark.createDataFrame(rows, schema)
    con = duckdb.connect()
    con.execute("CREATE TABLE v (id BIGINT, a DOUBLE[], b DOUBLE[])")
    con.executemany("INSERT INTO v VALUES (?, ?, ?)", rows)
    return sdf, con


def collect_map(df, col):
    return {r["id"]: r[col] for r in df.collect()}


def assert_same(got: dict, want: dict):
    """Exact equality, except NaN == NaN (overflow cases must agree
    on *producing* NaN; NaN's self-inequality isn't a mismatch)."""
    import math

    assert got.keys() == want.keys()
    for k in got:
        g, w = got[k], want[k]
        if isinstance(g, float) and math.isnan(g):
            assert isinstance(w, float) and math.isnan(w), (k, g, w)
        else:
            assert g == w, (k, g, w)


def test_euclidean_bit_identical(frames):
    sdf, con = frames
    got = collect_map(sdf.select("id", euclidean(F.col("a"), F.col("b")).alias("d")), "d")
    want = dict(con.sql("SELECT id, list_distance(a, b) FROM v").fetchall())
    assert_same(got, want)  # exact ==, no tolerance


def test_manhattan_bit_identical(frames):
    sdf, con = frames
    got = collect_map(sdf.select("id", manhattan(F.col("a"), F.col("b")).alias("d")), "d")
    want = dict(
        con.sql(
            "SELECT id, list_sum(list_transform(list_zip(a, b), p -> abs(p[1] - p[2]))) FROM v"
        ).fetchall()
    )
    assert_same(got, want)


def test_dot_bit_identical(frames):
    sdf, con = frames
    got = collect_map(sdf.select("id", dot(F.col("a"), F.col("b")).alias("d")), "d")
    want = dict(con.sql("SELECT id, list_dot_product(a, b) FROM v").fetchall())
    assert got == want


def test_cosine_bit_identical_nonzero(frames):
    sdf, con = frames
    got = collect_map(
        sdf.where(F.col("id") > 0).select(
            "id", cosine_sim(F.col("a"), F.col("b")).alias("d")
        ),
        "d",
    )
    want = dict(
        con.sql(
            """SELECT id, list_dot_product(a, b)
                      / (sqrt(list_dot_product(a, a)) * sqrt(list_dot_product(b, b)))
               FROM v WHERE id > 0"""
        ).fetchall()
    )
    assert_same(got, want)
