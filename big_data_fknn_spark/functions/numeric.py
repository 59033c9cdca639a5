"""Order-independent numeric aggregates for oracle parity.

Double sums depend on accumulation order (partition order in Spark,
morsel order in DuckDB), so large-magnitude money sums drift in the
last ulps and `round(x, 6)` cannot rescue a 1e9-magnitude value —
six decimals there IS the 16th significant digit (SURVEY.md §7.1,
observed live on c5_sort_merge).

Fix: accumulate in exact decimal.  Each row's double is cast to
DECIMAL(38,10) (deterministic, same value in both engines), decimal
addition is exact and associative → the sum is bit-identical however
the engine orders or parallelizes it.  Round, then cast back to
double so both engines report the same scalar type.

At 100 TB this also matters for correctness, not just parity: a
single-pass double sum over 1e12 rows accumulates real error, while
decimal partial aggregates stay exact and still combine map-side.

Oracle-side equivalents (keep in sync with any query using these):
    dsum  → round(sum(CAST(x AS DECIMAL(38,10))), 6)::VARCHAR::DOUBLE
    davg  → round(sum(CAST(x AS DECIMAL(38,10)))::VARCHAR::DOUBLE / count(*), 6)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,10)"


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Exact decimal sum of a double column, rounded, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)), scale).cast("double")


def davg(col: Column | str, scale: int = 6) -> Column:
    """Exact-sum average: decimal sum → double, / non-null count,
    rounded.  The denominator is ``count(col)`` — NULLs are excluded
    exactly as in SQL ``AVG`` — so oracles mirroring this must divide
    by ``count(col)``, not ``count(*)`` (round-12 fix: the previous
    all-rows denominator silently diluted the mean when a NULL passed
    the finite() gate)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)).cast("double") / F.count(c), scale)


def cents(col: Column | str) -> Column:
    """Per-row exact integer cents of a money measure (int64).

    The centi-unit device (x58): round(x·100) of a FINITE double is an
    exact integer; as int64 it survives the decimal→double 1-ulp split
    the round-8 extremes sweep pinned at ≥1e12 totals.  Callers MUST
    gate the column with `finite` first — Spark's non-ANSI
    cast('long') silently maps NaN→0 and ±Inf→±Long.{Min,Max}Value
    while the oracle's CAST(... AS BIGINT) raises, the exact
    one-bad-row divergence class the admission contracts exist to
    close (round-9 ADVICE item)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def cents_sum(col: Column | str) -> Column:
    """Overflow-proof cents total: per-row int64 cents accumulated in
    DECIMAL(38,0), rendered BIGINT.

    DuckDB's sum(BIGINT) accumulates in HUGEINT (int128); a matching
    Spark sum('long') wraps silently past 2^63 under non-ANSI mode
    (round-9 ADVICE: 1.5e12-scale admitted prices are 1.5e14 cents —
    ~6e4 such rows in one group overflow int64).  Accumulating in
    DECIMAL(38,0) mirrors the oracle's int128 accumulator exactly; the
    final cast('long') is exact whenever the total fits BIGINT, which
    the oracle's ::BIGINT render already requires.  Downstream
    consumers (rank/sort pipelines) still see int64 — the device that
    A/B-measured ~16% faster than decimal through rank is preserved."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.round(c * 100).cast("decimal(38,0)")).cast("long")


def finite(col: Column | str) -> Column:
    """NULL-preserving measure admission: TRUE for NULL or any finite
    value, FALSE for NaN/±Infinity.

    The exact-decimal devices above (and every INT/BIGINT quantization
    downstream of them) have no representation for non-finite doubles —
    DECIMAL and INT128 casts throw in both engines.  A measure column
    carrying one ±Inf/NaN row in 100 TB of input must not kill the
    job, so queries aggregating such measures gate them at the scan
    edge with this predicate — the same ingest posture as the j28
    text-quality gate and the tables.EMB_ADMIT_SQL vector gate.  NULLs
    pass through untouched: each query's established NULL semantics
    (round-6 nulls sweep) are not changed by the gate.

    Oracle-side mirror (keep in sync):  FIN_SQL below — spelled with
    isnan/abs so the IDENTICAL text parses in BOTH Spark and DuckDB
    (needed by the shared-SQL keys x12/x41).
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.isNull() | (~F.isnan(c) & (F.abs(c.cast("double")) < F.lit(float("inf"))))


def fin_sql(col: str) -> str:
    """The oracle-side mirror of `finite` — one spelling that parses
    identically in Spark SQL and DuckDB (both have isnan; both cast
    'Infinity' to +inf)."""
    return (
        f"({col} IS NULL OR (NOT isnan({col})"
        f" AND abs({col}) < cast('Infinity' AS DOUBLE)))"
    )
