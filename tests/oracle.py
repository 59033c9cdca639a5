"""Local replica of the driver's DuckDB-oracle comparison.

The driver compares row-count + schema + order-insensitive value
hash at sf0.01 (__spark_entry__.py docstring).  This harness is
deliberately stricter: it canonicalizes every cell (floats rounded
to 6 decimals, timestamps → ISO strings, numpy scalars unboxed),
sorts columns by name and rows lexicographically, and asserts full
equality — if this passes, the driver's hash comparison passes.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb
import pandas as pd

from big_data_fknn_spark.tables import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def canon_cell(v):
    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, (list, tuple)):
        return tuple(canon_cell(x) for x in v)
    if hasattr(v, "item") and not isinstance(v, (pd.Timestamp,)):  # numpy scalar/array
        try:
            v = v.item()
        except (ValueError, AttributeError):
            return tuple(canon_cell(x) for x in v.tolist())
    if isinstance(v, float):
        if math.isnan(v):
            # same token as None: pandas is the transport for BOTH
            # engines and it renders SQL NULL as NaN for float dtypes
            # (and as float NaN inside object/boolean columns on the
            # DuckDB side), so NULL-vs-NaN is not observable here —
            # distinct tokens only created false mismatches between a
            # Spark None and an oracle NaN that both mean NULL
            return "∅"
        r = round(v, 6)
        return f"{r + 0.0:.6f}"  # +0.0 normalizes -0.0
    if isinstance(v, Decimal):
        return canon_cell(float(v))
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, (pd.Timestamp, dt.datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return str(v)


def df_canon(pdf: pd.DataFrame):
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(canon_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    return cols, rows


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, key: str = "?"):
    scols, srows = df_canon(spark_df.toPandas())
    ocols, orows = df_canon(con.sql(sql).df())
    assert scols == ocols, f"{key}: column mismatch spark={scols} oracle={ocols}"
    assert len(srows) == len(orows), (
        f"{key}: row count spark={len(srows)} oracle={len(orows)}"
    )
    if srows != orows:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
        ][:5]
        raise AssertionError(f"{key}: value mismatch, first diffs: {diffs}")
