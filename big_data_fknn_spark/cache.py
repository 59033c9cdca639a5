"""Query-scoped cache registry.

Several query builders cache small derived frames (the shingle/token
projection, LSH band table, graph edges, k-means features) because
the same frame is scanned 2+ times inside one query — and because
Spark's CollapseProject would otherwise inline expensive expressions
into every consumer.  ``DataFrame.cache()`` registers the plan in
the session's CacheManager, which holds a STRONG reference: entries
are never garbage-collected, so a long-lived session running the
whole 249-query registry accumulates every helper cache it ever
touched (round-2 advisor finding).

Fix: every helper cache goes through :func:`cached`, which records
the frame; :func:`release_query_caches` unpersists and forgets all
of them.  The parity suite releases every ~60 queries (bounding
executor storage at a few caches' worth), library users call it
from ``big_data_fknn_spark.api`` whenever a query batch completes.
Within a batch, plan-keyed sharing still works — release is explicit
and coarse, not per-query — and ``unpersist`` is lazy/non-blocking,
so releasing costs nothing on the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def cached(df: DataFrame) -> DataFrame:
    """``df.cache()`` + register for later bulk release."""
    out = df.cache()
    _LIVE.append(out)
    return out


def release_query_caches() -> int:
    """Unpersist every cache created via :func:`cached`; returns how
    many were released.  Safe to call at any time — consumers built
    on a released cache recompute instead of failing."""
    n = 0
    for df in _LIVE:
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    _LIVE.clear()
    # Corpus boundary: also forget memoized parquet footer schemas so
    # a table regenerated under the SAME path (layout soak, scale
    # sweeps) is re-inferred on next read (tables._SCHEMA_MEMO doc).
    from big_data_fknn_spark import tables

    tables._SCHEMA_MEMO.clear()
    return n
