"""connected_components: the sf0.01 corpus only plants size-2
near-dup clusters, so the oracle-parity check never exercises the
multi-hop (transitive) path.  These synthetic graphs do."""

from __future__ import annotations

from big_data_fknn_spark.operators.graph import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    rows = connected_components(df).collect()
    return {r["node"]: r["component"] for r in rows}


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: diameter 4, needs real iteration to converge
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_two_components_and_direction_irrelevant(spark):
    # edges given in "wrong" direction: symmetrization must fix it
    got = _cc(spark, [(9, 8), (8, 7), (2, 1), (30, 31)])
    assert got == {7: 7, 8: 7, 9: 7, 1: 1, 2: 1, 30: 30, 31: 30}


def test_star_and_cycle(spark):
    got = _cc(spark, [(10, 11), (10, 12), (10, 13), (20, 21), (21, 22), (22, 20)])
    assert got == {10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20, 22: 20}
