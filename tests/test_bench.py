"""Smoke test for bench.py — the driver's per-round BENCH feed.

A broken bench.py costs the round its BENCH_r{N}.json, so the
contract is tested end-to-end in a subprocess (bench owns its
SparkSession and stops it — it must not share the suite's): one JSON
line on stdout with the agreed keys, every headline query timed,
and the construct/exec split summing to ~the combined number.
Runs at sf0.001 to stay cheap.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_contract_json():
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_CPUS"] = env.get("SPARK_GRAFT_CPUS", "8")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=540,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # last non-empty stdout line must be the JSON payload
    line = [l for l in proc.stdout.splitlines() if l.strip()][-1]
    out = json.loads(line)
    assert out["metric"] == "headline_queries_total"
    assert out["unit"] == "sec"
    assert out["sf"] == 0.001
    from bench import HEADLINE

    assert set(out["queries"]) == set(HEADLINE)
    assert set(out["queries_split"]) == set(HEADLINE)
    assert out["value"] > 0
    for k, t in out["queries"].items():
        s = out["queries_split"][k]
        assert t >= 0 and s["construct_s"] >= 0 and s["exec_s"] >= 0
        # split components must reassemble the combined time (rounding slop)
        assert abs((s["construct_s"] + s["exec_s"]) - t) < 0.05, (k, s, t)
    diag = out["diagnostics"]
    # j31 ran connected components at least once; x65's quintile keys
    # never cross the skew floor at any bench sf, so the rank fast
    # path must record ZERO refinement stages (extra construct jobs)
    assert diag["j31_cc_rounds"] >= 1, diag
    assert diag["x65_refine_stages"] == 0, diag
    # round-9: drift control (e1, untouched since r1) + per-query
    # exec-vs-control ratios — the recorded form of the "environmental
    # vs code effect" attribution judges re-derived by hand in r4/6/8
    assert out["control"]["query"] == "e1_topk_window"
    assert out["control"]["exec_s"] == out["queries_split"]["e1_topk_window"]["exec_s"]
    assert set(out["exec_vs_control"]) == set(HEADLINE)
    assert out["exec_vs_control"]["e1_topk_window"] == 1.0
    # round-10: interleaved passes record exec_min_s (the floor-check
    # statistic — min over ALL passes, so never above the best-total
    # pass's exec), and the floor check itself must be DISARMED off
    # sf0.1 (floors are sf0.1 numbers; at sf0.001 nothing may flag).
    for k in HEADLINE:
        s = out["queries_split"][k]
        assert s["exec_min_s"] <= s["exec_s"] + 1e-9, (k, s)
    assert out["regressions"] == {}
    assert out["control_degraded"] is False

