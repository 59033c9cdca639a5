"""The two round-8 admission predicates must agree CROSS-ENGINE on
every representable edge of the double domain — they are the
correctness boundary for the extremes sweep, so a Spark-vs-DuckDB
disagreement on a single value class would silently re-open it.

`numeric.finite` (Spark Column) ↔ `numeric.fin_sql` (one SQL text
that parses in BOTH engines) and the Spark vector gate inside
`tables.embeddings_d` ↔ `tables.EMB_ADMIT_SQL` are each evaluated on
a curated value set (±0.0, denormals, ±min/max normal, ±Inf, NaN,
2^53±1, NULL) plus a seeded random batch, and the admitted id sets
must be identical everywhere.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest

from big_data_fknn_spark.functions.numeric import fin_sql, finite

EDGES = [
    0.0,
    -0.0,
    5e-324,            # smallest denormal
    -5e-324,
    2.2250738585072014e-308,   # min normal
    1.7976931348623157e308,    # max finite
    -1.7976931348623157e308,
    float("inf"),
    float("-inf"),
    float("nan"),
    9007199254740992.0,        # 2^53
    9007199254740994.0,
    1.5e12,
    None,
]


def _values():
    rng = random.Random(8)
    vals = list(EDGES)
    vals += [rng.uniform(-1e9, 1e9) for _ in range(50)]
    vals += [rng.choice(EDGES[:-1]) * rng.choice([1.0, -1.0]) for _ in range(20)]
    return list(enumerate(vals))


def test_finite_and_fin_sql_agree_cross_engine(spark):
    rows = _values()
    sdf = spark.createDataFrame(rows, "i long, x double")
    spark_ids = {
        r["i"] for r in sdf.where(finite("x")).select("i").collect()
    }
    con = duckdb.connect()
    con.sql("CREATE TABLE t (i BIGINT, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    duck_ids = {
        r[0] for r in con.sql(f"SELECT i FROM t WHERE {fin_sql('x')}").fetchall()
    }
    assert spark_ids == duck_ids
    # semantic spot checks: NULL passes, non-finite fails, denormal passes
    by_val = dict(rows)
    for i in spark_ids:
        v = by_val[i]
        assert v is None or math.isfinite(v)
    assert all(
        i in spark_ids
        for i, v in rows
        if v is None or (isinstance(v, float) and math.isfinite(v))
    )


@pytest.mark.parametrize(
    "vec,admit",
    [
        ([0.1] * 64, True),
        ([1.5e-45] * 64, True),             # float32 denormal, non-zero
        ([5e-324] * 64, False),             # double denormal UNDERFLOWS to
                                            # 0.0 in the float32 column →
                                            # zero norm, both engines reject
        ([0.0] * 64, False),                # zero norm
        ([], False),                        # ragged: empty
        ([0.1] * 63, False),                # ragged: short
        ([0.1] * 65, False),                # ragged: long
        ([float("nan")] + [0.1] * 63, False),
        ([float("inf")] + [0.1] * 63, False),
        ([-float("inf")] + [0.1] * 63, False),
        (None, False),
        ([None] + [0.1] * 63, False),       # NULL element
    ],
)
def test_vector_admission_agrees_cross_engine(spark, tmp_path, vec, admit):
    from big_data_fknn_spark.tables import EMB_ADMIT_SQL, embeddings_d

    path = str(tmp_path / "embeddings.parquet")
    spark.createDataFrame(
        [(1, vec, 0)], "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(path)
    got_spark = embeddings_d(spark, str(tmp_path)).count() == 1
    con = duckdb.connect()
    got_duck = (
        con.sql(
            f"SELECT count(*) FROM read_parquet('{path}/*.parquet') "
            f"WHERE {EMB_ADMIT_SQL}"
        ).fetchone()[0]
        == 1
    )
    assert got_spark == got_duck == admit


def test_davg_excludes_nulls_like_sql_avg(spark):
    """davg's denominator is the NON-NULL count (SQL AVG semantics):
    a NULL that passes the finite() gate must not dilute the mean.
    Round-12 fix — the previous count(*) denominator silently turned
    'avg of values' into 'sum / row-count'."""
    from big_data_fknn_spark.functions.numeric import davg

    sdf = spark.createDataFrame(
        [(1, 2.0), (1, 4.0), (1, None)], "g int, x double"
    ).where(finite("x"))
    got = sdf.groupBy("g").agg(davg("x").alias("m")).collect()[0]["m"]
    assert got == 3.0, got  # (2+4)/2 non-null, not /3 rows
