"""Every registered query vs its DuckDB oracle at sf0.01 — the local
replica of the driver's t2 correctness gate."""

from __future__ import annotations

import os

import pytest

from big_data_fknn_spark.queries import load_all
from tests.oracle import compare, duck_con

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")

DEFS = load_all()


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_DIR)


_RELEASE_EVERY = 60
_done = {"n": 0}


@pytest.fixture(autouse=True)
def _periodic_cache_release():
    """Bound executor storage across the 249-query run: helper caches
    (shingles, LSH bands, graph edges...) register in
    big_data_fknn_spark.cache and are bulk-released every ~60 keys —
    plan-keyed sharing still works within a window, nothing
    accumulates for the whole session (round-2 advisor finding)."""
    yield
    _done["n"] += 1
    if _done["n"] % _RELEASE_EVERY == 0:
        from big_data_fknn_spark.cache import release_query_caches

        release_query_caches()


def test_registry_frozen_at_round3_counts():
    """The round-3 verdict froze the registry: 249 keys, 236 of them
    value-oracled.  Accidental additions/removals (or an oracle
    silently dropped to rows-only) should fail loudly, not drift."""
    assert len(DEFS) == 249, len(DEFS)
    oracled = sum(1 for d in DEFS.values() if d.oracle is not None)
    assert oracled == 236, oracled


@pytest.mark.parametrize("key", sorted(DEFS))
def test_query(spark, con, key):
    d = DEFS[key]
    df = d.fn(spark, SF_DIR)
    if d.oracle is None:
        assert df.count() >= 0  # rows-only: runs and has a stable schema
    else:
        compare(df, con, d.oracle, key=key)
        if "tpch" in key:
            # a hash match on zero rows is vacuous — every TPC-H shape
            # must actually select data at sf0.01 (caught x32's
            # nonexistent region literal silently passing)
            assert df.count() > 0, f"{key}: TPC-H query returned no rows"
