"""Execution-config invariance (round 11).

A deployment can legitimately flip execution knobs — disable AQE,
turn off whole-stage codegen, shrink Arrow batches, change input
split sizes, disable auto-broadcast — and none of them may change a
result.  The full-registry sweeps live in tools/driver_sim.py
(``--conf K=V``, artifacts DRIVERSIM_r11_*.json); this test pins the
two most failure-prone knobs on a small hot set so a regression
shows up in every suite run, not just the per-round sweep:

- ``spark.sql.autoBroadcastJoinThreshold=-1`` — every auto-broadcast
  becomes a sort-merge join (the flip that happens by itself at real
  scale when a "small" side outgrows the threshold).  Explicit
  F.broadcast() hints are unaffected by design.
- ``spark.sql.execution.arrow.maxRecordsPerBatch=7`` — the Arrow
  batch boundary moves through every Pandas-UDF kernel (kNN BLAS
  chunking, mapInPandas/mapInArrow operators), the classic source of
  batch-boundary-dependent results.

Each knob runs the key set in a subprocess session (driver_sim
--conf) against the DuckDB oracles; CLEAN = all hash-match.
Cost: two extra small Spark sessions (~2 min).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# join-heavy + kernel-heavy + adaptive-threshold owners
KEYS = (
    "c4_broadcast_hash",
    "x32_tpch_q8",
    "j1_knn_crisp",
    "j3_fknn_stage2",
    "j8_dedup_near",
    "j9b_sim_search_ivf",
)

CONFS = {
    "broadcast_off": ["spark.sql.autoBroadcastJoinThreshold=-1"],
    "arrow_batch_7": ["spark.sql.execution.arrow.maxRecordsPerBatch=7"],
}


@pytest.mark.parametrize("name", list(CONFS))
def test_conf_flip_does_not_change_results(name):
    cmd = [
        sys.executable,
        os.path.join(REPO, "tools", "driver_sim.py"),
        "--keys",
        ",".join(KEYS),
    ]
    for kv in CONFS[name]:
        cmd += ["--conf", kv]
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=560, cwd=REPO
    )
    tail = "\n".join(proc.stdout.splitlines()[-20:])
    assert proc.returncode == 0, f"{name} drift:\n{tail}\n{proc.stderr[-2000:]}"
    assert f"match={len(KEYS)}" in proc.stdout, tail
