"""Vector distance metrics as Catalyst column expressions.

Re-expresses the reference's ``utils.Distance`` (euclidean/manhattan
over ``Array[Double]`` — SURVEY.md §2.H h1, reconstructed [R
src/main/scala/utils/Distance.scala]) as ``zip_with`` +
``aggregate`` expressions: JVM-side, codegen'd, no UDF.

Accumulation is sequential left-to-right over the array — the same
order DuckDB's ``list_distance``/``list_sum`` use — so on identical
``array<double>`` inputs both engines produce bit-identical doubles
(verified empirically in tests/test_distance_parity.py).  That makes
top-k neighbor ranking deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _sum_elems(col: Column) -> Column:
    return F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x)


def euclidean(a: Column, b: Column) -> Column:
    """sqrt(Σ (a_i - b_i)²) — the reference's default metric."""
    return F.sqrt(_sum_elems(F.zip_with(a, b, lambda x, y: (x - y) * (x - y))))


def manhattan(a: Column, b: Column) -> Column:
    """Σ |a_i - b_i| — the reference's distanceType=1."""
    return _sum_elems(F.zip_with(a, b, lambda x, y: F.abs(x - y)))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i."""
    return _sum_elems(F.zip_with(a, b, lambda x, y: x * y))


def l2_norm(a: Column) -> Column:
    """sqrt(Σ a_i²)."""
    return F.sqrt(_sum_elems(F.transform(a, lambda x: x * x)))


def cosine_sim(a: Column, b: Column) -> Column:
    """dot(a,b) / (‖a‖·‖b‖) — extension metric for similarity search."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


METRICS = {
    "euclidean": euclidean,
    "manhattan": manhattan,
}
