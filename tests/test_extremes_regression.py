"""Committed regression pins for the round-8 extremes closure.

The full adversarial sweep (tools/adversarial_parity.py, ~10 min over
five mutation datasets × 236 keys) runs per-round; this test pins the
SPECIFIC failure classes the round-7 extremes pass exposed (68/236
keys split) so a regression shows up in every CI run, not only at the
next sweep.  One representative key per root cause, exercised on the
extremes mutation of the sf0.001 tables (built fresh into tmp_path —
never the shared /tmp copy a concurrent sweep may be rewriting):

- ragged/zero-norm/non-finite EMBEDDINGS → vector admission contract
  (tables.EMB_ADMIT_SQL): j1 (BLAS kernel family), j9b (zero-norm
  cosine divide), j41 (element_at on the empty vector), j30 (the
  8-row random-projection divergence).
- ±Inf/NaN MEASURES → numeric.finite scan gates: d1 (exact-decimal
  sums), d23 + x3 (NaN-in-quantile engine disagreement; DuckDB's
  quantile buffer is not even run-deterministic with NaN), i1
  (streaming-twin family), a14 (text dead-letter mirror), k1/k5
  (Python-kernel guards).
- ≥1e12 totals / 2^53 keys → 128-bit argmax pack (d14) and the
  integer-cents render (c3, e4, x54).
- documented out-of-domain RAISE (x55): the ±100-day event offsets
  must keep failing LOUDLY — widening the single-long bitmap silently
  would trade the error for silent engine divergence.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from tests.oracle import compare  # noqa: E402

from big_data_fknn_spark.queries import load_all  # noqa: E402

_KEYS = [
    "j1_knn_crisp",
    "j9b_sim_search_ivf",
    "j41_knn_regression",
    "j30_random_projection",
    "d1_hashagg",
    "d23_percentile_cont",
    "x3_percentile_exact",
    "i1_tumbling",
    "a14_text_log_roundtrip",
    "k1_py_udf",
    "k5_cogroup",
    "d14_conditional_agg",
    "c3_hash_inner",
    "e4_frame_running",
    "x54_grouping_sets",
    # the luck-dependent exposures closed late in round 8 (gates that
    # make structural what the fixed mutation draw merely happened to
    # miss, plus the remaining integer-cents renders)
    "c4_broadcast_hash",
    "c6_outer",
    "e9_time_slice",
    "x11_tpch_q18",
    "x30_tpch_q17",
    "x37_tpch_q22",
    "x61_welch_t",
    "x6_monthly_growth",
    "x43_incremental_agg",
    "x48_exchange_reuse",
    "x65_rfm_segmentation",
    "x72_growth_decomposition",
    # round-9: o_totalprice ±Inf/NaN injection (ADVICE medium) — the
    # cents-render/median/argmax/decimal-sum keys over orders money,
    # incl. the two the seeded injection caught (x67/x70 oracles cast
    # to DECIMAL(38,10), which raises on Inf in DuckDB while Spark
    # silently NULLed)
    "c3_hash_inner",
    "d13_median",
    "d14_conditional_agg",
    "e4_frame_running",
    "x44_salted_join",
    "x54_grouping_sets",
    "x67_gini",
    "x70_lorenz_deciles",
]


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "adversarial_parity", os.path.join(REPO, "tools", "adversarial_parity.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def extremes(tmp_path_factory):
    tool = _load_tool()
    dst = str(tmp_path_factory.mktemp("extremes"))
    tool.build("extremes", dst=dst)
    con = duckdb.connect()
    for name in tool.TABLES:
        con.sql(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{dst}/{name}.parquet')"
        )
    return dst, con


@pytest.mark.parametrize("key", _KEYS)
def test_extremes_parity(spark, extremes, key):
    sf_dir, con = extremes
    reg = load_all()
    compare(reg[key].fn(spark, sf_dir), con, reg[key].oracle, key=key)


def test_x55_documented_contract_still_raises(spark, extremes):
    sf_dir, _ = extremes
    reg = load_all()
    with pytest.raises(Exception, match=r"day offset outside \[0,63\]"):
        reg["x55_bitmap_days"].fn(spark, sf_dir).collect()


# ------------------- round-9: seed-randomized draw pins (seed 1023)

# Keys the SEEDED extremes draw caught that the fixed draw missed:
# seed 1023 anchored the poisoned lineitem row's part key at a
# quantile whose p_name passes x33's LIKE filter, so the NaN profit
# term reached the oracle's DECIMAL cast (raise) while Spark silently
# NULLed it.  The whole l_extendedprice-revenue family got the same
# gate; x33 is pinned here against the EXACT dataset that exposed it.
_SEED_1023_KEYS = ["x33_tpch_q9", "x32_tpch_q8", "x1_tpch_q3"]


@pytest.fixture(scope="module")
def extremes_s1023(tmp_path_factory):
    tool = _load_tool()
    dst = str(tmp_path_factory.mktemp("extremes_s1023"))
    tool.build("extremes", dst=dst, seed=1023)
    con = duckdb.connect()
    for name in tool.TABLES:
        con.sql(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{dst}/{name}.parquet')"
        )
    return dst, con


@pytest.mark.parametrize("key", _SEED_1023_KEYS)
def test_seeded_extremes_parity(spark, extremes_s1023, key):
    sf_dir, con = extremes_s1023
    reg = load_all()
    compare(reg[key].fn(spark, sf_dir), con, reg[key].oracle, key=key)
