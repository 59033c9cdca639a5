"""Headline benchmark — the driver's per-round BENCH_r{N}.json feed.

Runs representative queries from every operator family at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {<key>: sec, ...}, "sf": <float>}

Timing excludes SparkSession creation (BASELINE.md: JVM startup
dominates at sf0.1 and says nothing about 100 TB throughput) and
materializes each query with a noop sink — full execution, no
driver-side collect.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from big_data_fknn_spark.queries import load_all  # noqa: E402
from big_data_fknn_spark.session import get_spark  # noqa: E402

# One heavy representative per family: scan+agg, big join, window
# top-k, event windowing, the reference's two algorithms, near-dup
# LSH, similarity search (brute + IVF), tf-idf, plus two genuinely
# shuffle-heavy composites (the 8-table TPC-H Q8 join chain and the
# full dedup pipeline shingle→cluster→survivor) so regressions in
# the join/dedup stack show up round-over-round, not just the kNN
# kernel.
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
    # round 2: MLlib FP-Growth — tracks the frequent-pattern / MLlib
    # stack (fit happens at construct time; the timer wraps both).
    "j46_fpgrowth",
    # round 3: RFM segmentation — round 2's worst single-partition-
    # window offender (three chained full sorts of all customers),
    # now three independent range-bucketed rank passes over one
    # checkpointed base (operators/rank.py).  Added so the rank
    # primitive's construct-time jobs (percentile splits + bucket
    # counts) are measured, not hidden; per-query timings for the
    # other 13 stay directly comparable to r02.
    "x65_rfm_segmentation",
)


def _loadavg() -> list[float]:
    """1/5/15-minute system load — lets a reader adjudicate machine
    contention without re-running the bench (absolute timings on this
    shared host have swung ±30% round-over-round on identical code)."""
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except (OSError, ValueError):
        return []


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    load_start = _loadavg()

    spark = get_spark(app_name="bench")
    registry = load_all()

    # Warm the JVM/codegen once with the cheapest query so per-query
    # numbers measure the plan, not first-run initialization.
    registry["d1_hashagg"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # steady-state: best of three executions per query (first run pays
    # one-off plan compilation / codegen; production queries run hot;
    # min-of-3 — up from min-of-2 in r02-r05 — damps the transient
    # machine-contention spikes that inflated r04/r05 absolutes).
    # The timer wraps plan CONSTRUCTION as well as execution: some
    # operators do real cluster work at build time (the kNN kernel's
    # chunk fetches, connected-components' localCheckpoint rounds),
    # and excluding it would under-report them.
    timings: dict[str, float] = {}
    split: dict[str, dict[str, float]] = {}
    for key in HEADLINE:
        runs = []  # (total, construct, exec) per attempt
        for _ in range(3):
            t0 = time.perf_counter()
            df = registry[key].fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            runs.append((t2 - t0, t1 - t0, t2 - t1))
        best = min(runs)
        timings[key] = round(best[0], 3)
        split[key] = {"construct_s": round(best[1], 3), "exec_s": round(best[2], 3)}

    # diagnostic only (no clock change): j31's construct time is the
    # connected-components rounds, each a real cluster job — record
    # how many the last run took so the number is attributable.
    from big_data_fknn_spark.operators import graph, rank  # noqa: E402

    # x65 (the last headline query) is also the last rank.py caller,
    # so LAST_REFINE_STAGES is its final metric's refinement stage
    # count — expected 0 at bench sf: no tie bucket crosses the
    # max(4x ideal, 10k rows) skew floor, i.e. the smooth-key fast
    # path really runs zero extra jobs.
    diagnostics = {
        "j31_cc_rounds": graph.LAST_RUN_ROUNDS,
        "x65_refine_stages": rank.LAST_REFINE_STAGES,
    }

    # CONTROL: e1_topk_window's code is untouched since round 1, so
    # its exec drift round-over-round is pure machine state.  Each
    # query's exec normalized by the control separates code effects
    # from environment (rounds 4/6/8 re-derived "environmental" by
    # hand from untouched-key deltas every time — this makes the
    # attribution a recorded number instead of an argument).
    control_key = "e1_topk_window"
    control_exec = split[control_key]["exec_s"]
    exec_vs_control = {
        k: round(split[k]["exec_s"] / control_exec, 2) if control_exec > 0 else None
        for k in HEADLINE
    }

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        # same clock as r02 (construct+exec, min of 2); the split
        # attributes each query's time to plan construction (which
        # for the kNN kernel / connected components / global_rank
        # does real cluster jobs) vs final execution.
        "queries_split": split,
        "diagnostics": diagnostics,
        # e1 is the drift control (code untouched since r1): divide a
        # round's exec_vs_control by last round's per query — a moved
        # ratio is a code effect, a uniform absolute shift is machine.
        "control": {"query": control_key, "exec_s": control_exec},
        "exec_vs_control": exec_vs_control,
        # system 1/5/15-min load sampled before the warm-up and after
        # the last query: high or rising load means the absolutes are
        # contention-inflated and only controlled A/B deltas count.
        "loadavg": {"start": load_start, "end": _loadavg()},
        "sf": sf,
        # round 1 timed execution only; from round 2 the timer also
        # wraps plan construction (the kNN kernel's chunk-fetch jobs
        # and connected-components' checkpoint rounds do real cluster
        # work at build time) — compare r1 numbers with that in mind.
        "note": "timing=construct+exec min-of-3 (r02-r05 used min-of-2; r01 timed exec only); queries_split attributes construct vs exec; loadavg flags contention",
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
