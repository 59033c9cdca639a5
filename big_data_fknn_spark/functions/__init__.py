"""Column-expression builders (pure functions Column → Column).

Everything here compiles to built-in Catalyst expressions — JVM-side,
whole-stage-codegen'd, no Python per-row cost.
"""

from big_data_fknn_spark.functions.distance import (
    cosine_sim,
    dot,
    euclidean,
    l2_norm,
    manhattan,
)

__all__ = ["euclidean", "manhattan", "cosine_sim", "dot", "l2_norm"]
