"""Non-UTC host/session robustness (round-9 verdict item 4).

The engine pins spark.sql.session.timeZone=UTC in its own sessions
(session.py), but a deployment that hands queries a session with the
host's zone must not change any oracled result.  The round-10 drives
(tools/driver_sim.py --tz, all 249 keys under America/New_York and
Asia/Kolkata) found two exposed classes, both fixed:

- ABSOLUTE epoch extraction and timestamp label rendering (day/hour
  buckets, exported ts_us longs, h12's DST-asymmetric casts) — fixed
  via tables.wall_micros / wall_timestamp (wall-clock arithmetic over
  TIMESTAMP_NTZ).  Caught under America/New_York; difference/order
  uses of unix_micros cancel the offset and were never exposed.
- Hour-granularity F.window alignment — instant-epoch boundaries sit
  at :30 wall marks under a fractional-offset zone (+05:30), moving
  window MEMBERSHIP (3376 vs 3385 buckets).  Fixed by windowing over
  the wall clock: NTZ windows in batch (i1), a wall-epoch INSTANT in
  streaming (i13 — watermarks reject NTZ event time).  The 15-minute
  slide grid of i2/i14 divides every real zone offset, so those stay
  instant-aligned by arithmetic, not luck (both drove clean under
  +05:30).

This test re-runs the once-broken keys (plus never-broken controls
from the same families) under each zone in subprocesses — a session's
zone cannot be changed after the suite's UTC session exists — and
fails if any drifts from its DuckDB oracle again.

Cost: two extra Spark sessions over small sf0.01 key sets (~3 min).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CASES = {
    # DST zone: h12's cast asymmetry + the absolute-epoch family
    "America/New_York": (
        "h12_intervals",
        "i8_foreachbatch_upsert",
        "i19_stream_reach_live",
        "x63_gap_fill_interp",
        "x66_dau_wau",
        "x68_cumulative_reach",
        "x71_new_vs_returning",
        "x9_cohort_retention",  # never-broken control (diffs cancel)
    ),
    # fractional-offset zone: hourly window alignment + day buckets
    "Asia/Kolkata": (
        "i1_tumbling",
        "i13_stream_tumbling_live",
        "i2_sliding",  # control: 15-min grid divides every real offset
        "x66_dau_wau",
    ),
}


@pytest.mark.parametrize("tz", list(CASES))
def test_once_broken_keys_hold_under_non_utc_default(tz):
    keys = CASES[tz]
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "driver_sim.py"),
            "--tz",
            tz,
            "--keys",
            ",".join(keys),
        ],
        capture_output=True,
        text=True,
        timeout=560,
        cwd=REPO,
    )
    tail = "\n".join(proc.stdout.splitlines()[-20:])
    assert proc.returncode == 0, f"{tz} drift:\n{tail}\n{proc.stderr[-2000:]}"
    assert f"match={len(keys)}" in proc.stdout, tail
