"""Render PLANS.md: the headline queries' physical-plan summaries.

    python -m big_data_fknn_spark.plans > PLANS.md

Reviewable evidence that the plans have the shape the scale story
claims (broadcasts, rank-limit pushdown, partial aggregation, pushed
filters, pruned scans) — regenerate after any plan-affecting change.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from big_data_fknn_spark.plans import explain_summary  # noqa: E402
from big_data_fknn_spark.plans.inspect import executed_plan  # noqa: E402
from big_data_fknn_spark.queries import load_all  # noqa: E402
from big_data_fknn_spark.session import get_spark  # noqa: E402

KEYS = (
    "d1_hashagg",
    "c5_sort_merge",
    "c4_broadcast_hash",
    "e1_topk_window",
    "i1_tumbling",
    "j1_knn_crisp",
    "j3_fknn_stage2",
    "j8_dedup_near",
    "j9_sim_search",
    "j9b_sim_search_ivf",
    "x1_tpch_q3",
    "x8_cube_grouping",
    "x32_tpch_q8",
    "x36_tpch_q21",
    "x22_time_rollup_multires",
    "j35_seq_packing",
    "e9_time_slice",
    "d17_auc",
    "j8d_embed_neardup",
    "j31_dedup_survivors",
    "x44_salted_join",
    "x45_bloom_prefilter",
    "j42_naive_bayes",
    "x43_incremental_agg",
    # round-2 additions with plan-level claims worth evidencing
    "j46_fpgrowth",
    "j48_pmi_bigrams",
    "c12_interval_overlap",
    "x49_ewma",
    "x53_time_weighted_avg",
    "d21_weighted_median",
    "d22_countmin",
    "x55_bitmap_days",
    # round-3: the range-bucketed global-rank family (operators/
    # rank.py) — evidence that global order/ntile/running-agg plans
    # hash-partition on the value bucket, no Exchange SinglePartition
    "e5_pct",
    "x65_rfm_segmentation",
    "x57_skyline",
    "x69_abc_pareto",
    "j44_vocab_build",
    # round-4: exec-profile rewrites with plan-level claims — x63's
    # brackets now come from lead() over observations + explode
    # (no grid join, no grid-wide ignore-nulls windows); x50's BFS
    # supersteps are localCheckpointed so the final frame's plan is
    # shallow instead of ~3^depth re-executions
    "x63_gap_fill_interp",
    "x50_bfs_hops",
)

SF = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark(app_name="plans_md")
    reg = load_all()
    print("# PLANS — headline physical plans (auto-generated)\n")
    print("Regenerate with `python -m big_data_fknn_spark.plans > PLANS.md`.")
    print(f"Interesting operators only (plans/inspect.py), at {SF}.\n")
    for k in KEYS:
        print(f"## {k}\n\n```")
        df = reg[k].fn(spark, SF)
        summary = explain_summary(df)
        if not summary:
            # no "interesting" operator at all — e.g. x50's final
            # frame is a scan of its localCheckpointed superstep
            # result; show the raw (shallow) plan as the evidence
            summary = "\n".join(
                l.strip()[:160] for l in executed_plan(df).splitlines() if l.strip()
            )
        print(summary)
        print("```\n")
    spark.stop()


if __name__ == "__main__":
    main()
