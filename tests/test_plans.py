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

import os

import pytest
from pyspark.sql import functions as F

from big_data_fknn_spark.plans import (
    executed_plan,
    has_operator,
    pushed_filters,
    read_schema_width,
)
from big_data_fknn_spark.queries import load_all

SF_DIR = "/root/testdata/sf0.001"

DEFS = load_all()


def q(spark, key: str):
    return DEFS[key].fn(spark, SF_DIR)


def test_knn_uses_arrow_blas_kernel(spark):
    # j1/j3 take the fast path: broadcast query matrix + mapInPandas
    # BLAS kernel emitting batch-local top-k (operators/knn.py).
    df = q(spark, "j1_knn_crisp")
    assert has_operator(df, "MapInPandas"), "kNN must run the Arrow BLAS kernel"
    assert not has_operator(df, "BroadcastNestedLoopJoin"), "no pair materialization"


def test_knn_expression_path_broadcasts_and_limits_below_shuffle(spark):
    # the declarative fallback path (knn_join — what knn_join_blas
    # degrades to above _MAX_BROADCAST_ROWS) must broadcast the query
    # side and prune top-k below the shuffle
    from big_data_fknn_spark.operators.knn import knn_join
    from big_data_fknn_spark.tables import embeddings_d

    e = embeddings_d(spark, SF_DIR)
    probes = e.where(F.col("vec_id") % 50 == 0)
    df = knn_join(probes, e, 10, exclude_self=True)
    assert has_operator(df, "BroadcastNestedLoopJoin"), "query side must broadcast"
    assert has_operator(df, "WindowGroupLimit"), "top-k must prune below the shuffle"


def test_sim_search_uses_arrow_blas_kernel(spark):
    # j9 rides the same BLAS kernel as j1/j3 (cosine_neg metric)
    df = q(spark, "j9_sim_search")
    assert has_operator(df, "MapInPandas"), "sim search must run the Arrow BLAS kernel"
    assert not has_operator(df, "BroadcastNestedLoopJoin"), "no pair materialization"


def test_fknn_stage2_uses_kernel_twice(spark):
    assert executed_plan(q(spark, "j3_fknn_stage2")).count("MapInPandas") >= 2


def test_dim_join_broadcasts(spark):
    df = q(spark, "c4_broadcast_hash")
    assert has_operator(df, "BroadcastHashJoin"), "filtered dim must broadcast"
    assert "ShuffleExchange" not in executed_plan(df).replace(
        "AQEShuffleRead", ""
    ), "fact side must not shuffle for a broadcast join"


def test_scan_pushes_filter_and_prunes_columns(spark):
    df = q(spark, "b2_filter_pred")
    assert pushed_filters(df), "predicate must reach the parquet scan"
    assert max(read_schema_width(df)) < 8, (
        f"lineitem scan reads too many columns: {read_schema_width(df)}"
    )


def test_tpch_q3_pushes_both_date_filters(spark):
    pf = " ".join(pushed_filters(q(spark, "x1_tpch_q3")))
    assert "o_orderdate" in pf and "l_shipdate" in pf
    assert has_operator(q(spark, "x1_tpch_q3"), "TakeOrderedAndProject"), (
        "ORDER BY + LIMIT must not global-sort"
    )


def test_hashagg_has_partial_stage(spark):
    assert "partial_" in executed_plan(q(spark, "d1_hashagg")), (
        "aggregation must map-side combine before the shuffle"
    )


def test_cube_is_single_expand_pass(spark):
    p = executed_plan(q(spark, "x8_cube_grouping"))
    assert p.count("Expand") >= 1 and p.count("FileScan") == 1, (
        "CUBE must expand grouping sets in one scan, not four"
    )


@pytest.mark.parametrize("key", ["e1_topk_window", "j7_dedup_exact"])
def test_rank_limit_pushdown(spark, key):
    assert has_operator(q(spark, key), "WindowGroupLimit")


def test_minhash_join_is_equi_not_cross(spark):
    p = executed_plan(q(spark, "j8_dedup_near"))
    assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p) or (
        "BroadcastHashJoin" in p
    ), "LSH candidates must come from an equi-join on (band, key)"


def test_ivf_search_joins_on_cluster_id(spark):
    p = executed_plan(q(spark, "j9b_sim_search_ivf"))
    assert p.count("BroadcastNestedLoopJoin") <= 1, (
        "IVF must not brute-force the candidate set"
    )


def test_partitioned_read_prunes_partitions(spark):
    df = q(spark, "a8_partitioned_sink_prune")
    plan = executed_plan(df)
    assert "PartitionFilters: [" in plan and "event_type" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], "event_type predicate must prune partitions, not filter rows"


def test_bucketed_join_has_no_shuffle(spark):
    df = q(spark, "a9_bucketed_join")
    plan = executed_plan(df)
    assert "SortMergeJoin" in plan, "bucketed join must stay sort-merge"
    assert "Exchange" not in plan, (
        "bucketed co-located join must not shuffle either side"
    )
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan


def test_decontaminate_broadcasts_eval_side(spark):
    # j20's eval-shingle set is small by construction; the corpus
    # probe must be a broadcast join, and nothing may cross-join.
    df = q(spark, "j20_decontaminate")
    plan = executed_plan(df)
    assert "BroadcastHashJoin" in plan, "eval shingles must broadcast"
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_reshard_agg_reuses_repartition_exchange(spark):
    # j24: the groupBy(shard_id) must reuse the repartition(32,
    # shard_id) exchange — exactly one shuffle in the whole plan.
    df = q(spark, "j24_corpus_reshard")
    plan = executed_plan(df)
    assert plan.count("Exchange hashpartitioning") == 1, (
        "reshard agg must reuse the repartition exchange, not add its own"
    )


def test_q18_having_subquery_is_semi_join(spark):
    # x11: the HAVING-subquery must lower to a semi join on the
    # grouped lineitem aggregate, never a full inner re-join.
    plan = executed_plan(q(spark, "x11_tpch_q18"))
    assert "LeftSemi" in plan, "qualifying-order probe must be a semi join"
    assert "CartesianProduct" not in plan


def test_unigram_lm_broadcasts_vocab(spark):
    # j27: the vocabulary aggregate re-joins the token stream via
    # broadcast — tokens must not shuffle by token a second time.
    plan = executed_plan(q(spark, "j27_unigram_logprob"))
    assert "BroadcastHashJoin" in plan, "vocab join must broadcast"


def test_semdedup_pairs_are_cluster_equi_join(spark):
    # j26: the pair search must co-partition on the cluster key —
    # an equi hash/sort-merge join, never an all-pairs product.
    plan = executed_plan(q(spark, "j26_semdedup"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_kmeans_broadcasts_centers(spark):
    # j29: both assign stages broadcast the k-row center table; the
    # corpus side must never shuffle for the join.
    plan = executed_plan(q(spark, "j29_kmeans_lloyd"))
    assert "BroadcastNestedLoopJoin" in plan, "centers must broadcast"
    assert "CartesianProduct" not in plan


def test_q6_pushes_every_predicate_to_scan(spark):
    # x18: the pure-scan query must push its range predicates into
    # the parquet reader and aggregate without any join.
    plan = executed_plan(q(spark, "x18_tpch_q6"))
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual(l_shipdate" in plan
    assert "Join" not in plan


def test_q14_and_q19_broadcast_part(spark):
    # x19/x20: part is the dimension side — it must arrive via
    # BroadcastHashJoin, and lineitem must not shuffle for the join.
    for key in ("x19_tpch_q14", "x20_tpch_q19"):
        plan = executed_plan(q(spark, key))
        assert "BroadcastHashJoin" in plan, f"{key}: part must broadcast"
        assert "CartesianProduct" not in plan


def test_q4_exists_is_semi_join(spark):
    # x21: EXISTS must run as a left-semi join probing filtered
    # lineitem; the returnflag filter must sit below the join.
    plan = executed_plan(q(spark, "x21_tpch_q4"))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_math_fns_single_stage_no_shuffle(spark):
    # h11: pure scalar projection — no Exchange anywhere, and the
    # scan must prune to the two referenced part columns + key.
    plan = executed_plan(q(spark, "h11_math_fns"))
    assert "Exchange" not in plan
    assert "p_name" not in plan, "unreferenced columns must be pruned"


def test_multires_rollup_is_one_scan_one_expand(spark):
    # x22: three time grains must come from a single Expand over one
    # events scan — never a union of three separate reads.
    plan = executed_plan(q(spark, "x22_time_rollup_multires"))
    assert plan.count("Expand") >= 1
    assert plan.count("Scan parquet") == 1, "three grains must share one scan"
    assert "Union" not in plan


def test_seq_packing_single_lang_shuffle(spark):
    # j35: the running-offset window and the bin rollup must share
    # the lang-keyed exchange — one shuffle in the whole plan.
    plan = executed_plan(q(spark, "j35_seq_packing"))
    assert plan.count("Exchange hashpartitioning") == 1


def test_compaction_actually_compacts(spark):
    # x24: after the query runs, the fragmented dir must hold ~64
    # part files and the compacted dir exactly 2.
    import glob

    from big_data_fknn_spark.queries.relational import _tmp_path

    q(spark, "x24_compaction").collect()
    frag = glob.glob(_tmp_path("x24_fragmented.parquet") + "/part-*")
    comp = glob.glob(_tmp_path("x24_compacted.parquet") + "/part-*")
    assert len(frag) == 64
    assert len(comp) == 2


def test_q8_broadcasts_all_four_dims(spark):
    # x32: the widest join in the suite — nation(×2)/region/part must
    # all arrive via broadcast; the fact chain must never cartesian.
    plan = executed_plan(q(spark, "x32_tpch_q8"))
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan


def test_q21_shares_orderkey_partitioning(spark):
    # x36: the per-(order,supplier) rollup and the per-order stats
    # rollup must reuse one l_orderkey-cluster exchange lineage — no
    # third fact shuffle, and the self-join stays equi (no BNLJ on
    # the big side).
    plan = executed_plan(q(spark, "x36_tpch_q21"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q2_min_rejoin_is_equi(spark):
    # x31: the decorrelated min must re-join on (part, cost) as an
    # equi join; dims broadcast.
    plan = executed_plan(q(spark, "x31_tpch_q2"))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_q22_anti_join_and_broadcast_threshold(spark):
    # x37: NOT EXISTS must lower to LeftAnti; the scalar average
    # arrives as a broadcast, not a per-row subquery.
    plan = executed_plan(q(spark, "x37_tpch_q22"))
    assert "LeftAnti" in plan


def test_time_slice_pushes_ts_to_scan(spark):
    # e9: the [min, max) time slice must be applied to the RAW ts
    # column below the normalization cast, arriving at the parquet
    # scan as pushed filters — the row-group-pruning contract for
    # every time-sliced read of the event store.
    df = q(spark, "e9_time_slice")
    pf = " ".join(pushed_filters(df))
    assert "ts" in pf and ("GreaterThanOrEqual" in pf or "LessThan" in pf), pf


def test_latest_snapshot_uses_window_group_limit(spark):
    # x42: the rank-1 filter must push below the shuffle so each map
    # task forwards one candidate row per key, not the changelog.
    plan = executed_plan(q(spark, "x42_latest_snapshot"))
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_naive_bayes_model_is_broadcast(spark):
    # j42: the fitted model (likelihood grid + priors + defaults) must
    # reach the scoring stream via broadcast joins — never a shuffle
    # of the token stream against the model side.
    plan = executed_plan(q(spark, "j42_naive_bayes"))
    assert plan.count("BroadcastHashJoin") >= 2, "model joins must broadcast"
    assert "CartesianProduct" not in plan, "no unbroadcast cross product"


def test_incremental_merge_never_rescans_history(spark):
    # x43: exactly two parquet scans (base slice + delta slice) with
    # the cutoff predicate pushed into each — the merge itself joins
    # two aggregated rollups, not raw history.
    df = q(spark, "x43_incremental_agg")
    plan = executed_plan(df)
    assert plan.count("Scan parquet") == 2
    pushed = pushed_filters(df)
    assert any("o_orderdate" in f for f in pushed), (
        f"cutoff must reach the scans, got {pushed}"
    )


def test_entropy_second_shuffle_carries_groups_only(spark):
    # d18: two chained aggs — the per-(source,lang) partial+final agg,
    # then the per-source entropy over group rows.  The plan must
    # show partial aggregation (map-side combine) on the first.
    plan = executed_plan(q(spark, "d18_entropy"))
    assert plan.count("HashAggregate") >= 2, "chained aggs must both hash-agg"


def test_knn_regression_uses_kernel(spark):
    assert has_operator(q(spark, "j41_knn_regression"), "MapInPandas")


def test_salted_join_shuffles_on_composite_key(spark):
    # x44: the join must be a SHUFFLED join keyed on (custkey, salt) —
    # a broadcast join would never shuffle the fact side, making the
    # salt decorative.
    plan = executed_plan(q(spark, "x44_salted_join"))
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
    import re

    join_line = next(
        l for l in plan.splitlines()
        if "ShuffledHashJoin" in l or "SortMergeJoin" in l
    )
    assert "salt" in join_line, f"join must key on salt: {join_line}"


def test_bloom_prefilter_broadcasts_bitmap_and_semi_joins(spark):
    # x45: the 1-row bloom bitmap reaches the fact scan by broadcast,
    # and the exact verify is a left-semi join (no full join blowup).
    plan = executed_plan(q(spark, "x45_bloom_prefilter"))
    assert "BroadcastNestedLoopJoin" in plan  # 1-row bitmap crossJoin
    assert "LeftSemi" in plan, "exact verify must be a semi join"


def test_runtime_filter_injects_bloom(spark):
    # x46: Catalyst must plant might_contain(xxhash64(l_orderkey)) on
    # the fact scan (InjectRuntimeFilter), and the join must be the
    # shuffle kind (the regime runtime filters exist for).
    df = q(spark, "x46_runtime_filter")
    plan = executed_plan(df)
    assert "might_contain" in plan, "runtime bloom filter must inject"
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_exchange_reuse_dedups_rollup_shuffle(spark):
    # x48: the rollup subplan feeds two consumers; the static planner
    # must emit ReusedExchange for the second (AQE performs the same
    # dedup at stage materialization, but renders it differently).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = executed_plan(q(spark, "x48_exchange_reuse"))
        assert "ReusedExchange" in plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_pmi_joins_broadcast_and_no_cartesian(spark):
    p = executed_plan(q(spark, "j48_pmi_bigrams"))
    assert "CartesianProduct" not in p, "PMI must never cross-join"
    assert "BroadcastHashJoin" in p, "unigram counts must broadcast onto bigrams"


def test_ewma_is_single_window_no_join(spark):
    p = executed_plan(q(spark, "x49_ewma"))
    assert "Join" not in p, "EWMA must not self-join the rank range"
    assert p.count("Window") >= 2, "rank + trailing-frame collect windows"


def test_bfs_frontier_joins_are_equi(spark):
    p = executed_plan(q(spark, "x50_bfs_hops"))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, (
        "frontier expansion must be an equi-join on src"
    )


def test_attribution_is_single_window_no_join(spark):
    p = executed_plan(q(spark, "x51_attribution"))
    assert "Join" not in p, "last-touch must carry state in a window, not self-join"


def test_twa_single_shuffle(spark):
    # x53: the lead() window and the user-id agg share one hash
    # partitioning on user_id — exactly one exchange in the plan.
    p = executed_plan(q(spark, "x53_time_weighted_avg"))
    assert p.count("Exchange hashpartitioning") == 1, (
        "agg must reuse the window's user_id partitioning"
    )


def test_containment_is_equi_join(spark):
    p = executed_plan(q(spark, "j50_containment"))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, (
        "containment pairs must come from the shingle inverted index"
    )


def test_interval_overlap_is_bucket_equi_join(spark):
    p = executed_plan(q(spark, "c12_interval_overlap"))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, (
        "interval overlap must candidate-generate via the bucket equi-join"
    )


# Whitelist for the full-registry single-partition-window sweep:
# keys whose Window legitimately consumes an Exchange SinglePartition
# because the windowed input is BOUNDED-TINY (independent of data
# scale), not entity-cardinality.  Everything else must route global
# order through operators/rank.py (range-bucketed rank / running agg).
_TINY_WINDOW_OK = {
    # cumulative share over per-MONTH rollup rows (|months| ≤ a few
    # hundred for any realistic retention)
    "x6_monthly_growth": "window over month-cardinality rollup",
    # rank over the 25-row per-nation aggregate
    "x12_sql_api": "window over 25 nations",
    # running reach over per-DAY new-user counts (|days|)
    "x68_cumulative_reach": "window over day-cardinality rollup",
    # same day-cardinality running sum, streaming replay flavor
    "i19_stream_reach_live": "window over day-cardinality rollup",
    # cumulative shares over the 10-row decile table (the
    # customer-cardinality ranking below it rides global_rank)
    "x70_lorenz_deciles": "window over 10 decile rows",
}


def test_no_single_partition_window_over_entities(spark):
    """Sweep EVERY registered batch query's executed plan: an
    ``Exchange SinglePartition`` feeding a Window means the whole
    input sorts in one task — the round-2 scale-killer family
    (x65/x67/x70/x57/e5, since routed through operators/rank.py).
    New queries that reintroduce the shape fail here and must either
    use global_rank/global_running_agg or justify a whitelist entry
    above (genuinely tiny windowed input only)."""
    import re

    from big_data_fknn_spark.plans import (
        single_partition_consumers,
        single_partition_window_feeds,
    )

    # an SP exchange's DIRECT consumer may only be a global-scalar
    # aggregate final (keys=[] — one partial row per task crosses) or
    # a Sort/Window, which the whitelist above separately polices.
    # Anything else (join, project chain, KEYED aggregate) would
    # funnel real data through one task.
    _SCALAR_FINAL = re.compile(
        r"^(HashAggregate|ObjectHashAggregate|SortAggregate)\(keys=\[\]"
    )

    violations: dict[str, list[str]] = {}
    whitelisted_clean: list[str] = []
    cartesians: list[str] = []
    bad_consumers: dict[str, list[str]] = {}
    for key in sorted(DEFS):
        df = DEFS[key].fn(spark, SF_DIR)
        if df.isStreaming:
            continue
        plan = executed_plan(df)
        hits = single_partition_window_feeds(plan)
        if hits and key not in _TINY_WINDOW_OK:
            violations[key] = hits
        elif not hits and key in _TINY_WINDOW_OK:
            whitelisted_clean.append(key)
        # same sweep, second invariant: a CartesianProduct means two
        # DISTRIBUTED inputs pair all-vs-all with no key — nothing in
        # the registry may do that (scalar cross joins ride
        # BroadcastNestedLoopJoin with a single-row broadcast side,
        # which is fine and not matched here)
        if "CartesianProduct" in plan:
            cartesians.append(key)
        for consumer in single_partition_consumers(plan):
            if _SCALAR_FINAL.match(consumer) or consumer.startswith(
                ("Sort ", "Sort[", "Window")
            ):
                continue
            bad_consumers.setdefault(key, []).append(consumer[:80])
    assert not bad_consumers, (
        "Exchange SinglePartition feeding something other than a "
        f"global-scalar aggregate final or policed Sort/Window: "
        f"{bad_consumers}"
    )
    assert not cartesians, (
        f"CartesianProduct in executed plans: {cartesians} — route "
        "through a derived equi-key (band/bucket/block) candidate "
        "generator or broadcast the scalar side"
    )
    assert not violations, (
        "single-partition exchange feeds a Window over non-whitelisted "
        f"input: {violations} — route through operators/rank.py or "
        "whitelist with a tiny-input justification"
    )
    # keep the whitelist honest: every entry must still be needed
    assert not whitelisted_clean, (
        f"stale whitelist entries (plan no longer single-partition): "
        f"{whitelisted_clean}"
    )


def test_temp_view_registrations_do_not_accumulate(spark):
    """Round-3 verdict item 3 / round-2 advisor: queries that register
    temp views (or UDTFs) must not leak a catalog entry per call — a
    long-lived session serving many queries would accumulate metadata
    forever.  Fixed names are REPLACED on repeat calls; uuid-named
    views must be dropped after spark.sql analyzes the plan.  Each
    query runs twice; the second call must add ZERO temp views."""
    view_users = [
        "x7_subqueries",
        "x22_time_rollup_multires",
        "x39_recursive_cte",
        "x41_group_by_all",
        "x54_grouping_sets",
        "c11_lateral_topk",
        "k4_udtf",
        # streaming demos: run_to_memory must drop its uuid-named
        # memory-sink table (which buffers result ROWS driver-side)
        # before returning — round-4/5 verdict item.  a6 is the plain
        # append sink, i4 the watermarked complete-mode agg.
        "a6_stream_source",
        "i4_watermark",
    ]
    missing = [k for k in view_users if k not in DEFS]
    assert not missing, f"leak-test key list is stale: {missing}"
    for key in view_users:
        DEFS[key].fn(spark, SF_DIR)  # warm: registers any fixed names
        before = {v.name for v in spark.catalog.listTables()}
        DEFS[key].fn(spark, SF_DIR)
        after = {v.name for v in spark.catalog.listTables()}
        assert after == before, (
            f"{key} leaked catalog entries on repeat invocation: "
            f"{sorted(after - before)}"
        )
    # round-6 verdict: the streaming file source must not leave one
    # /tmp symlink dir per invocation either (events_stream now reuses
    # a canonical per-source-path dir, run_to_memory removes its
    # checkpoint).  Attribution is via the module's LAST_* diagnostics
    # — NOT a glob over the shared tempdir, which races against any
    # concurrent process creating its own stream dirs between the two
    # snapshots (round-7 advisor).
    from big_data_fknn_spark.streaming import replay

    for key in ("a6_stream_source", "i4_watermark"):
        DEFS[key].fn(spark, SF_DIR)  # warm: creates the canonical symlink dir
        first_src = replay.LAST_SRC_DIR
        DEFS[key].fn(spark, SF_DIR)
        # the canonical per-source dir is REUSED, not re-created…
        assert replay.LAST_SRC_DIR == first_src and os.path.isdir(first_src), (
            f"{key} did not reuse the canonical stream-source dir: "
            f"{first_src} -> {replay.LAST_SRC_DIR}"
        )
        # …and the memory-sink checkpoint of THIS call is torn down
        if replay.LAST_CKPT_DIR is not None:
            assert not os.path.exists(replay.LAST_CKPT_DIR), (
                f"{key} leaked its checkpoint dir {replay.LAST_CKPT_DIR}"
            )


# Measured at sf0.001 (pre-AQE executed plans, pyspark 4.1.2); a
# regression that adds a shuffle to a headline query fails here.
# Bounds are ceilings — improvements only lower them.
_HEADLINE_SHUFFLE_BOUNDS = {
    "d1_hashagg": 1,          # one map-combined agg shuffle
    "c5_sort_merge": 3,       # two sort-merge sides + final agg
    "e1_topk_window": 1,      # WindowGroupLimit prunes below it
    "i1_tumbling": 1,
    "j1_knn_crisp": 1,        # BLAS kernel: broadcast + one agg
    "j3_fknn_stage2": 8,
    "j8_dedup_near": 15,      # minhash bands + verify joins; +4 in
    # round 6 for the stop-shingle DF cap (count-by-shingle agg +
    # static SMJ anti-join + re-shuffle to doc_id) — a deliberate
    # linear pass that bounds every band bucket by a constant; at
    # runtime AQE converts the anti-join to broadcast when the
    # frequent set is small, collapsing most of the extra exchanges
    # (measured: sf0.1 exec 0.4-0.5 s, within noise of pre-cap)
    "j9_sim_search": 1,
    "j9b_sim_search_ivf": 3,  # cluster assign + equi-join + topk
    "j10_text_tfidf": 5,      # +1 in r12: the corpus count moved from
    # a separate driver-side d.count() job (whose exchanges this test
    # never saw) INTO the plan as a broadcast single-row aggregate —
    # the extra exchange is the canonical one-row-per-task
    # SinglePartition crossing of a global count, strictly cheaper
    # than the extra scan job it replaced
    "x32_tpch_q8": 1,         # 7 broadcast dims, ONE fact shuffle
    "j31_dedup_survivors": 2, # CC rounds run at construct (checkpoints);
    # the final doc_id label join is UNHINTED since round 12 (the
    # cluster table is corpus-scale on real web corpora — a forced
    # broadcast would abort at the 8 GB cap), so the pre-AQE plan
    # shows both equi-join sides shuffling; at runtime AQE broadcasts
    # the genuinely small side and the exchanges collapse
    "j46_fpgrowth": 0,        # MLlib fit at construct
    "x65_rfm_segmentation": 4,  # 1 orders agg + 3 bucketed windows
}


def test_headline_shuffle_counts_do_not_regress(spark):
    """Shuffle-count ceilings for the bench headline queries: every
    `Exchange hash/range/Single` in the pre-AQE executed plan is a
    real shuffle at scale, and the current counts encode deliberate
    design (broadcast dims, map-side combines, below-shuffle top-k
    prunes, construct-time checkpoints).  A new exchange appearing in
    one of these plans is a scale regression even if results stay
    correct — fail loudly with the diff."""
    import re

    import bench

    # hermetic plan shapes: helper frames cached by earlier test files
    # change executed plans (a cached subtree can lose its output
    # partitioning and force an extra Exchange above it), so measure
    # against a cache-free session like the bench's first run
    from big_data_fknn_spark.cache import release_query_caches

    release_query_caches()
    spark.catalog.clearCache()

    assert set(_HEADLINE_SHUFFLE_BOUNDS) == set(bench.HEADLINE), (
        "bounds table out of sync with bench.HEADLINE"
    )
    over: dict[str, tuple[int, int]] = {}
    for key, bound in _HEADLINE_SHUFFLE_BOUNDS.items():
        df = DEFS[key].fn(spark, SF_DIR)
        plan = executed_plan(df)
        n = len(re.findall(r"\bExchange (hash|range|Single)", plan))
        if n > bound:
            over[key] = (n, bound)
    assert not over, f"shuffle-count regressions (got, ceiling): {over}"


def test_single_partition_consumers_helper(spark):
    """The helper must name the DIRECT parent of each SP exchange:
    a global scalar aggregate final for df.agg(sum), and the Sort
    Spark inserts for an unpartitioned window."""
    from big_data_fknn_spark.plans import single_partition_consumers

    df = spark.range(100).agg(F.sum("id").alias("s"))
    consumers = single_partition_consumers(executed_plan(df))
    assert consumers and all(
        c.startswith("HashAggregate(keys=[]") for c in consumers
    ), consumers

    from pyspark.sql import Window

    w = spark.range(100).select(
        "id", F.row_number().over(Window.orderBy("id")).alias("r")
    )
    consumers = single_partition_consumers(executed_plan(w))
    assert consumers and any(c.startswith(("Sort", "Window")) for c in consumers), (
        consumers
    )


# ------------------------- round-12 broadcast-hint boundedness sweep
#
# A broadcast HINT bypasses autoBroadcastJoinThreshold, and Spark
# hard-fails any broadcast over 8 GB — so a hinted relation whose size
# scales with the corpus doesn't get slow at 100×, it aborts the job.
# Round 12 removed every such hint (per-doc size tables in the
# dedup/containment family, the j31 cluster table, the vocab tier);
# these tests pin that they stay gone.  The ANALYZED logical plan is
# inspected (broadcast_hint_groupings), not the physical plan, so the
# assertion is about what the query FORCES — AQE is still free to
# broadcast the genuinely-small sides at runtime, which is the point.

# enum-bounded grouping columns: a hint over an aggregate grouped only
# by these is bounded at any corpus size (k classes / languages /
# sources), like a dim table
_BOUNDED_GROUP_COLS = {"lang", "cls", "source"}

# keys whose corpus-scaling hints were removed in round 12, plus the
# two sampler keys whose per-source hints are the legitimate pattern
# the rule must keep admitting
_HINT_SWEPT_KEYS = [
    "j8_dedup_near",
    "j8b_ngram_jaccard",
    "j8f_dedup_clusters",
    "j10_text_tfidf",
    "j27_unigram_logprob",
    "j31_dedup_survivors",
    "j32_bm25",
    "j38_mixture_rebalance",
    "j42_naive_bayes",
    "j48_pmi_bigrams",
    "j50_containment",
    "j51_lsh_eval",
    "j52_weighted_sample",
    "j53_minhash_estimate",
    "j54_bigram_lm",
]


@pytest.mark.parametrize("key", _HINT_SWEPT_KEYS)
def test_no_corpus_relation_under_broadcast_hint(spark, key):
    from big_data_fknn_spark.plans import broadcast_hint_groupings

    df = q(spark, key)
    for groups in broadcast_hint_groupings(df):
        assert groups is not None, (
            f"{key}: broadcast hint over a subtree with no aggregate — "
            "an unbounded relation is being force-broadcast"
        )
        assert set(groups) <= _BOUNDED_GROUP_COLS, (
            f"{key}: broadcast hint over an aggregate grouped by "
            f"{groups} — corpus-cardinality keys must not be hinted"
        )


def test_broadcast_hint_groupings_helper(spark):
    """The helper must classify all three shapes: scalar-agg hint →
    [], enum-grouped hint → its columns, raw-relation hint → None."""
    from big_data_fknn_spark.plans import broadcast_hint_groupings

    base = spark.range(100).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("lang")
    )
    scalar = base.agg(F.count(F.lit(1)).alias("n"))
    assert broadcast_hint_groupings(base.crossJoin(F.broadcast(scalar))) == [[]]

    byl = base.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    assert broadcast_hint_groupings(base.join(F.broadcast(byl), "lang")) == [
        ["lang"]
    ]

    raw = base.select("id", F.col("lang").alias("l2"))
    got = broadcast_hint_groupings(
        base.join(F.broadcast(raw), "id")
    )
    assert got == [None], got
