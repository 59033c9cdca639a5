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

    # steady-state: best of N INTERLEAVED passes per query.  r02-r09
    # ran each key's repeats back-to-back, so a transient contention
    # spike (this host's per-key noise is 2-3×: d1 measured 1.86 s and
    # 4.95 s in two identical back-to-back runs) poisoned every repeat
    # of whichever key it landed on.  Interleaving (pass 1 runs all 14
    # keys, then pass 2, ...) decorrelates a spike from any single key
    # — it inflates one pass of many keys instead of every repeat of
    # one — so min-over-passes converges on the true floor (round-9
    # verdict item 3).  The timer wraps plan CONSTRUCTION as well as
    # execution: some operators do real cluster work at build time
    # (the kNN kernel's chunk fetches, connected-components'
    # localCheckpoint rounds), and excluding it would under-report.
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "5"))
    runs: dict[str, list[tuple[float, float, float]]] = {k: [] for k in HEADLINE}
    for _ in range(passes):
        for key in HEADLINE:
            t0 = time.perf_counter()
            df = registry[key].fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            runs[key].append((t2 - t0, t1 - t0, t2 - t1))
    timings: dict[str, float] = {}
    split: dict[str, dict[str, float]] = {}
    for key in HEADLINE:
        best = min(runs[key])
        timings[key] = round(best[0], 3)
        split[key] = {
            "construct_s": round(best[1], 3),
            # min exec may come from a different pass than min total:
            # exec_min is the regression-check statistic, exec_s stays
            # the best-total attribution (comparable to r02-r09).
            "exec_s": round(best[2], 3),
            "exec_min_s": round(min(r[2] for r in runs[key]), 3),
        }

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

    # FLOOR CHECK (round-9 verdict item 3): bench_floors.json records
    # each key's minimum exec_s the driver ever measured.  Floors are
    # ALL-TIME minima, so a typical session sits uniformly 1.3-1.7×
    # above them (measured on zero-diff code the first time this check
    # ran raw: 10/14 keys "flagged" while the control itself was at
    # 1.18×) — comparing raw ratios to a 1.25× bar just detects "not
    # the quietest session ever".  Each key's floor ratio is therefore
    # NORMALIZED by the control key's own floor ratio first: uniform
    # machine inflation cancels, a single key that moved does not.  A
    # genuine 2× code regression on a 1.2×-inflated session shows
    # ~1.7 normalized, a 3x to ~2.5.  The bar lives in
    # bench_floors.json (normalized_tolerance, 1.75): two same-code
    # round-10 runs 20 minutes apart measured per-key normalized noise
    # up to 1.52, so 1.5 still false-positives.  The control guard
    # stays: a control past 2× its floor marks the whole run
    # contention-inflated (control_degraded) and no key is blamed.
    # Exit stays 0 — the driver's contract is one JSON line; run
    # `bench.py --strict` locally to turn flags into exit 1.
    regressions: dict[str, dict[str, float]] = {}
    control_degraded = False
    floors_path = os.path.join(REPO, "bench_floors.json")
    floors_doc: dict = {}
    if os.path.exists(floors_path):
        with open(floors_path) as f:
            floors_doc = json.load(f)
    floors = floors_doc.get("floors", {})
    tol = float(floors_doc.get("normalized_tolerance", 1.5))
    ctrl_floor = floors.get(control_key, {}).get("exec_s")
    ctrl_min = split[control_key]["exec_min_s"]
    # floors were recorded at the driver's sf0.1 — at any other scale
    # the comparison is meaningless (sf0.001 would never flag, sf1
    # would always flag), so the check disarms itself.
    if ctrl_floor and sf == 0.1:
        ctrl_ratio = ctrl_min / ctrl_floor
        control_degraded = ctrl_ratio > 2.0
        if not control_degraded:
            for k in HEADLINE:
                fl = floors.get(k, {}).get("exec_s")
                mn = split[k]["exec_min_s"]
                if not fl:
                    continue
                normalized = (mn / fl) / ctrl_ratio
                if normalized > tol:
                    # CONFIRMATION pass before the flag sticks: a
                    # heavy-tailed key (j8's exec spanned 0.60-1.06 s
                    # across three same-code round-10 runs) can miss
                    # its floor in 5 passes; 5 more runs of just this
                    # key either find the floor (noise — no flag) or
                    # don't (the flag carries 10-pass evidence).
                    for _ in range(5):
                        df = registry[k].fn(spark, sf_dir)
                        t0 = time.perf_counter()
                        df.write.format("noop").mode("overwrite").save()
                        mn = min(mn, time.perf_counter() - t0)
                    mn = round(mn, 3)
                    split[k]["exec_min_s"] = mn
                    normalized = (mn / fl) / ctrl_ratio
                    if normalized <= tol:
                        continue
                    regressions[k] = {
                        "exec_min_s": mn,
                        "floor_s": fl,
                        "ratio": round(mn / fl, 2),
                        "normalized": round(normalized, 2),
                    }
                    print(
                        f"BENCH REGRESSION {k}: exec min {mn}s ="
                        f" {normalized:.2f}x floor after control"
                        f" normalization (control at {ctrl_ratio:.2f}x),"
                        f" confirmed over 10 passes",
                        file=sys.stderr,
                        flush=True,
                    )

    # The grading driver captures only the LAST 2000 CHARACTERS of
    # stdout and json-parses from that tail: round 10's single fat
    # JSON line (queries_split + exec_vs_control + loadavg + prose
    # note) grew past 2000 chars, got front-truncated, and the driver
    # recorded `parsed: null` — a round of bench numbers the judge
    # could not read.  Since round 11 the stdout line carries ONLY the
    # contract fields plus the floor-check verdict, hard-capped below
    # the window; every diagnostic (split, control ratios, loadavg,
    # cc-round counts) moves to bench_detail.json next to this file.
    detail = {
        # which corpus produced these numbers — the suite's bench
        # smoke runs at sf0.001 and overwrites this file, so a reader
        # must be able to tell a test-run artifact from the sf0.1
        # record the round commits
        "sf": sf,
        # same clock as r02 (construct+exec); the split attributes
        # each query's time to plan construction (which for the kNN
        # kernel / connected components / global_rank does real
        # cluster jobs) vs final execution.  exec_min_s is the
        # floor-check statistic (min over all interleaved passes).
        "queries_split": split,
        "diagnostics": diagnostics,
        # e1 is the drift control (code untouched since r1): divide a
        # round's exec_vs_control by last round's per query — a moved
        # ratio is a code effect, a uniform absolute shift is machine.
        "exec_vs_control": exec_vs_control,
        # system 1/5/15-min load sampled before the warm-up and after
        # the last query: high or rising load means the absolutes are
        # contention-inflated and only controlled A/B deltas count.
        "loadavg": {"start": load_start, "end": _loadavg()},
        "regressions": regressions,
        "passes": passes,
        "note": (
            "timing=construct+exec, min over N INTERLEAVED passes"
            " (r10+; r02-r09 min-of-2/3 back-to-back); a regression ="
            " exec_min_s above normalized_tolerance (bench_floors.json,"
            " currently %.2f) x the key's recorded floor AFTER dividing"
            " out the control key's own floor ratio, confirmed by 5"
            " extra runs; control >2x its floor disarms the check"
            " (control_degraded)" % tol
        ),
    }
    # SPARK_GRAFT_BENCH_DETAIL lets the suite's bench smoke write its
    # sf0.001 detail somewhere else instead of clobbering the sf0.1
    # record committed per round
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL", os.path.join(REPO, "bench_detail.json")
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "control": {"query": control_key, "exec_s": control_exec},
        # floor check: per-key min exec vs the best the driver ever
        # recorded (bench_floors.json), control-ratio normalized so a
        # slow host can't fabricate regressions; per-key evidence in
        # bench_detail.json.
        "regressions": {
            k: v["normalized"] for k, v in regressions.items()
        },
        "control_degraded": control_degraded,
        "detail": "bench_detail.json",
        "note": (
            "min over %d interleaved passes; regressions ="
            " control-normalized exec floor ratio > tolerance from"
            " bench_floors.json; split/loadavg in bench_detail.json"
            % passes
        ),
    }
    # the driver json-parses a 2000-char STDOUT TAIL — the line must
    # PROVABLY fit (r10 recorded parsed:null when it outgrew the
    # window).  Shrink in stages and assert, never hope: drop prose,
    # compress regressions, then drop per-query timings (they live in
    # bench_detail.json anyway), keeping metric/value/unit/sf intact.
    line = json.dumps(out)
    if len(line) > 1700:
        out.pop("note", None)
        out["regressions"] = {"count": len(regressions)}
        line = json.dumps(out)
    if len(line) > 1700:
        out["queries"] = {"count": len(timings)}
        line = json.dumps(out)
    assert len(line) <= 1700, (
        "bench stdout line still over the driver tail budget: %d chars"
        % len(line)
    )
    print(line)
    spark.stop()
    if "--strict" in sys.argv and regressions:
        sys.exit(1)


if __name__ == "__main__":
    main()
