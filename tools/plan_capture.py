"""Capture ``explain("formatted")`` for a set of registry keys.

Round-12 optimization evidence: the judge checks plan claims against
committed ``plans/r12/<key>_{before,after}.txt`` files.  Usage:

    python tools/plan_capture.py before d1_hashagg c5_sort_merge ...
    python tools/plan_capture.py after  d1_hashagg ...
    python tools/plan_capture.py before --headline        # bench.py set

Each file holds the formatted physical plan (initial AQE plan) plus a
one-line summary of exchange / join / python-eval node counts so a
diff between before and after is self-describing.  Construct-time
driver actions (the kNN kernel's chunk fetch, connected-components
rounds) run as usual while the plan is built — the capture reflects
the FINAL DataFrame each query returns.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

HEADLINE = (
    "d1_hashagg",
    "c5_sort_merge",
    "e1_topk_window",
    "i1_tumbling",
    "j1_knn_crisp",
    "j3_fknn_stage2",
    "j8_dedup_near",
    "j9_sim_search",
    "j9b_sim_search_ivf",
    "j10_text_tfidf",
    "x32_tpch_q8",
    "j31_dedup_survivors",
    "j46_fpgrowth",
    "x65_rfm_segmentation",
)

_COUNTED = (
    "Exchange hashpartitioning",
    "Exchange rangepartitioning",
    "Exchange SinglePartition",
    "BroadcastExchange",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "WindowGroupLimit",
    "MapInPandas",
    "ArrowEvalPython",
    "BatchEvalPython",
)


def formatted_plan(df) -> str:
    spark = df.sparkSession
    key = "spark.sql.maxMetadataStringLength"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "10000")
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    finally:
        spark.conf.set(key, old)


def main() -> None:
    from big_data_fknn_spark.cache import release_query_caches
    from big_data_fknn_spark.queries import load_all
    from big_data_fknn_spark.session import get_spark

    phase = sys.argv[1]
    assert phase in ("before", "after"), "phase must be before|after"
    keys = sys.argv[2:]
    rnd = "r13"
    if "--round" in keys:
        i = keys.index("--round")
        rnd = keys[i + 1]
        keys = keys[:i] + keys[i + 2 :]
    if "--headline" in keys:
        keys = [k for k in keys if k != "--headline"] + list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name=f"plan_capture_{phase}")
    reg = load_all()
    for key in keys:
        df = reg[key].fn(spark, sf_dir)
        plan = formatted_plan(df)
        counts = {p: len(re.findall(re.escape(p), plan)) for p in _COUNTED}
        summary = ", ".join(f"{p}={n}" for p, n in counts.items() if n)
        path = os.path.join(out_dir, f"{key}_{phase}.txt")
        with open(path, "w") as f:
            f.write(f"# {key} [{phase}] @ {sf_dir}\n# node counts: {summary}\n\n")
            f.write(plan)
        print(f"{key:28s} -> {path}   [{summary}]", flush=True)
        release_query_caches()
    spark.stop()


if __name__ == "__main__":
    main()
