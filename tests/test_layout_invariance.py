"""Hostile-writer physical-layout invariance (round 11).

tools/layout_soak.py rewrites the sf0.01 tables the way an
uncontrolled producer would — multi-part directories, shuffled column
order, an appended decoy column, zstd, 512-row row groups — and runs
the strict gate replica against them.  Its first full run CAUGHT a
real bug: i12_stream_static_join's per-user profile used a raw double
F.avg, and the re-grouped parquet moved each engine's summation order
independently — 8 users' means crossed a 6-dp rounding boundary in
one engine only (fixed with the davg exact-decimal device, the same
contract every other money aggregate already followed).

This test pins a hot subset (i12 plus one key per reader family:
scan, declared schema, join, agg, window, streaming replay, kNN
kernel, dedup) so a layout-sensitivity regression shows up in every
suite run; the full 249-key sweep stays a per-round tool run.
Cost: one corpus build (~10 s, cached in /tmp) + one small Spark
session (~2 min).
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

KEYS = (
    "a1_scan_parquet",
    "a3_schema_declared",
    "c5_sort_merge",
    "d1_hashagg",
    "e1_topk_window",
    "i1_tumbling",
    "i8_foreachbatch_upsert",
    "i12_stream_static_join",
    "j1_knn_crisp",
    "j8_dedup_near",
)


def test_hostile_layout_does_not_change_results():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "layout_soak.py"),
            "--keys",
            ",".join(KEYS),
        ],
        capture_output=True,
        text=True,
        timeout=560,
        cwd=REPO,
    )
    tail = "\n".join(proc.stdout.splitlines()[-20:])
    assert proc.returncode == 0, f"layout drift:\n{tail}\n{proc.stderr[-2000:]}"
    assert f"match={len(KEYS)}" in proc.stdout, tail
