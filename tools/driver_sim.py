"""Grading-driver simulation: the STRICTEST local replica of the gate.

Smokes ``entry()`` then runs every ``queries()`` key against its
``oracle_sql()`` in DuckDB and compares an order-insensitive hash of
the RAW ``str(v)`` cell strings — no float canonicalization at all,
unlike tests/oracle.py's 6-decimal rounding.  That extra strictness is
the point: the raw hash caught x69_abc_pareto rendering the two
engines' IDENTICAL exact-decimal class sum as NEIGHBORING doubles
(DuckDB's DECIMAL→DOUBLE divides int_rep/10^scale in float and picks
the wrong neighbor once int_rep > 2^53; Spark's conversion is
correctly rounded) — invisible under the rounded canon, and the
reason decimal renders now go through ::VARCHAR::DOUBLE / exact
DECIMAL.  Run from the repo root (Python workers resolve the package
via cwd):

    python tools/driver_sim.py      # ~13 min at sf0.01, exit 1 on any fail
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as e  # noqa: E402

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

SF = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def h(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = sorted(
        tuple(str(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    )
    return hashlib.md5(repr(rows).encode()).hexdigest(), len(rows)


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = e.entry(spark).collect()
    assert len(rows) > 0, "entry() returned no rows"
    print(f"DRIVERSIM entry ok rows={len(rows)}", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    oracles = e.oracle_sql()
    n_match = n_rowsonly = 0
    fails = []
    for k, fn in e.queries().items():
        try:
            pdf = fn(spark, SF).toPandas()
        except Exception as ex:
            fails.append((k, f"spark-error {type(ex).__name__}: {ex}"))
            print(f"DRIVERSIM {k} SPARK-ERROR {ex}", flush=True)
            continue
        if k not in oracles:
            n_rowsonly += 1
            print(f"DRIVERSIM {k} rows-only rows={len(pdf)}", flush=True)
            continue
        try:
            opdf = con.sql(oracles[k]).df()
        except Exception as ex:
            fails.append((k, f"oracle-error {type(ex).__name__}: {ex}"))
            print(f"DRIVERSIM {k} ORACLE-ERROR {ex}", flush=True)
            continue
        hs, ns = h(pdf)
        ho, no = h(opdf)
        if hs == ho and ns == no:
            n_match += 1
        else:
            fails.append((k, f"hash-mismatch spark_rows={ns} oracle_rows={no}"))
            print(f"DRIVERSIM {k} MISMATCH spark={ns} oracle={no}", flush=True)
    print(
        f"DRIVERSIM done match={n_match} rows_only={n_rowsonly} fails={len(fails)}",
        flush=True,
    )
    for k, msg in fails:
        print(f"DRIVERSIM FAIL {k}: {msg}", flush=True)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
