"""Memory-pressure soak: heavy keys must SPILL, not die, on lean heaps.

Nothing else tests the "spill-aware" claim: every suite runs with the
default 24 GiB local driver, where no shuffle ever feels pressure.
This tool re-runs the shuffle-heavy keys at the synthetic ~sf1 corpus
(/tmp/soak_sf1, built by tools/scale_soak.py) under deliberately
constrained JVMs and asserts row-count equality against the roomy
default — proving Tungsten's sort/agg spill paths and the Python-side
Arrow batching hold under realistic executor shapes.

Shapes (driver JVM IS the executor in local mode):
- ROOMY   24g / 8 threads — the reference counts.
- LEAN     4g / 8 threads = 512 MB/core, a realistic production
  executor (e.g. 8-core/4-8 GiB).  EVERY key must complete with
  identical counts — measured round 9: the full dedup family
  (shingle explode, MinHash banding, edit-distance blocking, SRP
  explode, connected components) completes here at sf1.
- STARVED  2g / 32 threads = 64 MB/core, far below any sane deploy.
  Only the pure-JVM relational/window/agg set must survive (their
  operators spill); the Python/Arrow dedup family legitimately OOMs
  here (measured round 9: GCLocker allocation-retry death in j8's
  shingle explode) — that 0.5 GB/core floor is the documented
  deployment requirement, not a defect to hide.

Each shape runs in a SUBPROCESS because driver heap is fixed at JVM
start.  Exit 1 on any count mismatch or a LEAN/STARVED-mandatory
failure.

    python tools/scale_soak.py      # build /tmp/soak_sf1 first
    python tools/memory_soak.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SF_DIR = "/tmp/soak_sf1"

# pure-JVM plans: must survive even the starved shape
RELATIONAL = [
    "d1_hashagg",
    "c5_sort_merge",
    "e1_topk_window",
    "x32_tpch_q8",
    "d23_percentile_cont",
    "f1_sort",
]
# Python/Arrow-heavy dedup family: must survive the lean shape
DEDUP = [
    "j8_dedup_near",
    "j31_dedup_survivors",
    "j40_srp_lsh_neardup",
    "j34_fuzzy_editdist",
]

_CHILD = r"""
import json, sys
sys.path.insert(0, {repo!r})
from big_data_fknn_spark.session import get_spark
from big_data_fknn_spark.queries import load_all
from big_data_fknn_spark.cache import release_query_caches
spark = get_spark(app_name="memory_soak")
reg = load_all()
out = {{}}
for key in {keys!r}:
    release_query_caches()
    try:
        out[key] = reg[key].fn(spark, {sf_dir!r}).count()
    except Exception as ex:  # noqa: BLE001 — the parent classifies
        out[key] = f"FAILED {{type(ex).__name__}}"
print("MEMSOAK " + json.dumps(out))
"""


def run_shape(mem: str, cpus: int, keys: list[str]) -> dict[str, object]:
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=mem, SPARK_GRAFT_CPUS=str(cpus))
    code = _CHILD.format(repo=REPO, keys=keys, sf_dir=SF_DIR)
    p = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in p.stdout.splitlines():
        if line.startswith("MEMSOAK "):
            return json.loads(line[len("MEMSOAK "):])
    raise RuntimeError(
        f"shape {mem}/{cpus} produced no result (rc={p.returncode}):\n"
        + p.stderr[-2000:]
    )


def main() -> None:
    if not os.path.isdir(SF_DIR):
        print(f"{SF_DIR} missing — run tools/scale_soak.py first", file=sys.stderr)
        sys.exit(2)
    bad: list[str] = []

    print("shape ROOMY   24g/8  (reference counts)", flush=True)
    roomy = run_shape("24g", 8, RELATIONAL + DEDUP)
    print(f"  {roomy}", flush=True)
    for k, v in roomy.items():
        if not isinstance(v, int):
            bad.append(f"ROOMY {k}: {v}")

    print("shape LEAN     4g/8  (512 MB/core — all keys must match)", flush=True)
    lean = run_shape("4g", 8, RELATIONAL + DEDUP)
    print(f"  {lean}", flush=True)
    for k in RELATIONAL + DEDUP:
        if lean.get(k) != roomy.get(k):
            bad.append(f"LEAN {k}: {lean.get(k)} != roomy {roomy.get(k)}")

    print("shape STARVED  2g/32 (64 MB/core — relational set must match)", flush=True)
    starved = run_shape("2g", 32, RELATIONAL)
    print(f"  {starved}", flush=True)
    for k in RELATIONAL:
        if starved.get(k) != roomy.get(k):
            bad.append(f"STARVED {k}: {starved.get(k)} != roomy {roomy.get(k)}")

    print(f"memory-soak: {'CLEAN' if not bad else json.dumps(bad)}", flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
