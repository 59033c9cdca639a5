"""Super-threshold parity for the count-adaptive subcell quantizer.

The driver gate and the 250-test parity suite run at sf0.01/sf0.1,
where n ≤ _CELL_TARGET·2 so nb = 0 and the (label, scode) cluster key
collapses to label-only — i.e. the quantizer's Spark/oracle lockstep
was never exercised where it matters.  This suite synthesizes a
6,000-vector corpus (nb = 2 → 4 subcells), symlinks the other nine
tables from sf0.001, and hash-compares j9b/j26 against their DuckDB
oracles on that layout — the exact scale regime the round-9 10× soak
showed blowing up (j9b 23×, j26 78× exec on 10× data) before the
subcell key was wired into the Spark side.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from big_data_fknn_spark.queries import load_all
from big_data_fknn_spark.tables import TABLES, embeddings_d
from tests.oracle import compare, duck_con

BASE = "/root/testdata/sf0.001"
N = 6000  # nb = ceil(log2(6000/2048)) = 2 → 4 subcells
DEFS = load_all()


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("subcell_sf")
    for name in TABLES:
        if name == "embeddings":
            continue
        os.symlink(f"{BASE}/{name}.parquet", d / f"{name}.parquet")
    # Deterministic 64-dim float32 corpus: a per-label anchor plus
    # small noise, so some cosine pairs clear j26's τ=0.4 within a
    # label AND the sign projections split labels into real subcells.
    rng = np.random.default_rng(7)
    anchors = rng.standard_normal((10, 64)).astype(np.float32)
    labels = np.arange(N, dtype=np.int32) % 10
    emb = anchors[labels] + 0.8 * rng.standard_normal((N, 64)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(1, N + 1), type=pa.int64()),
            "embedding": pa.array(
                [row for row in emb.astype(np.float32)],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(labels, type=pa.int32()),
        }
    )
    pq.write_table(tbl, d / "embeddings.parquet")
    return str(d)


@pytest.fixture(scope="module")
def con(sf_dir):
    return duck_con(sf_dir)


def test_quantizer_depth_is_super_threshold(spark, sf_dir):
    from big_data_fknn_spark.queries.llm import _CELL_TARGET, _subcell_codes

    e = embeddings_d(spark, sf_dir)
    nb, scodes = _subcell_codes(spark, e)
    assert nb == math.ceil(math.log2(N / _CELL_TARGET)) == 2
    codes = scodes.toPandas()
    # every admitted vector gets a code, and the corpus genuinely
    # splits into >1 subcell (otherwise the test proves nothing)
    assert len(codes) == N
    assert codes["scode"].between(0, 3).all()
    assert codes["scode"].nunique() > 1


@pytest.mark.parametrize("key", ["j9b_sim_search_ivf", "j26_semdedup"])
def test_super_threshold_parity(spark, con, key, sf_dir):
    d = DEFS[key]
    compare(d.fn(spark, sf_dir), con, d.oracle, key=key)
    # vacuity guard: j26 must mark real duplicates and j9b must rank
    # real neighbors on this corpus, or the hash match is trivial
    df = d.fn(spark, sf_dir)
    assert df.count() > 0
    if key == "j26_semdedup":
        assert df.where("is_dup = 1").count() > 0
