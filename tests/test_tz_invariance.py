"""Non-UTC host/session robustness (round-9 verdict item 4).

The engine pins spark.sql.session.timeZone=UTC in its own sessions
(session.py), but a deployment that hands queries a session with the
host's zone must not change any oracled result.  The round-10 probe
(tools/driver_sim.py --tz) found exactly one exposed class: ABSOLUTE
epoch extraction (day/hour buckets, exported ts_us longs) and
timestamp LABEL rendering, fixed via tables.wall_micros /
wall_timestamp (wall-clock arithmetic over TIMESTAMP_NTZ).  This test
re-runs the once-broken keys plus controls under America/New_York in
a subprocess (a session's zone cannot be changed after the suite's
UTC session exists) and fails if any drifts from its DuckDB oracle
again.

Cost: one extra Spark session over 8 sf0.01 keys (~2-3 min).
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the five keys the round-10 non-UTC drive caught + h12 (caught by the
# first probe) + two never-broken controls from the same families
KEYS = (
    "h12_intervals",
    "i8_foreachbatch_upsert",
    "i19_stream_reach_live",
    "x63_gap_fill_interp",
    "x66_dau_wau",
    "x68_cumulative_reach",
    "x71_new_vs_returning",
    "i1_tumbling",
    "x9_cohort_retention",
)


def test_once_broken_keys_hold_under_non_utc_default():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "driver_sim.py"),
            "--tz",
            "America/New_York",
            "--keys",
            ",".join(KEYS),
        ],
        capture_output=True,
        text=True,
        timeout=560,
        cwd=REPO,
    )
    tail = "\n".join(proc.stdout.splitlines()[-20:])
    assert proc.returncode == 0, f"non-UTC drift:\n{tail}\n{proc.stderr[-2000:]}"
    assert f"match={len(KEYS)}" in proc.stdout, tail
