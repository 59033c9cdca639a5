"""Registry-wide execution profile: construct + min-of-2 noop-write
execution time for every registered key at one scale factor.

The round-4 discipline, committed: run it at BOTH sf0.01 and sf0.1 and
compare — superlinear growth between the two scales (≫10× on 10× data)
is how the x50 exponential re-execution (40 s for a 100-node BFS) and
the x63 grid-window quadratic were caught; a single-scale run cannot
see them.  The noop sink executes the full physical plan without sink
I/O, so the number is plan cost, not disk.

    python tools/exec_profile.py /root/testdata/sf0.01
    python tools/exec_profile.py /root/testdata/sf0.1

Prints one line per key (construct_s, exec_s) sorted by exec desc,
then totals; exits 1 if any key errors.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)


def main() -> None:
    from big_data_fknn_spark.cache import release_query_caches
    from big_data_fknn_spark.queries import load_all
    from big_data_fknn_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="exec_profile")
    reg = load_all()
    rows: list[tuple[str, float, float]] = []
    errs: list[tuple[str, str]] = []
    for i, key in enumerate(sorted(reg)):
        release_query_caches()
        try:
            t0 = time.perf_counter()
            df = reg[key].fn(spark, sf_dir)
            construct = time.perf_counter() - t0
            execs = []
            for _ in range(2):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                execs.append(time.perf_counter() - t0)
            rows.append((key, round(construct, 3), round(min(execs), 3)))
        except Exception as ex:  # noqa: BLE001 — report, keep profiling
            errs.append((key, str(ex)[:150]))
        if (i + 1) % 50 == 0:
            print(f"  …{i + 1}/{len(reg)} profiled", flush=True)
    rows.sort(key=lambda r: -r[2])
    for key, c, e in rows[:20]:
        print(f"  {key:32s} construct {c:7.3f}  exec {e:7.3f}", flush=True)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "keys": len(rows),
                "errors": errs,
                "construct_total_s": round(sum(r[1] for r in rows), 1),
                "exec_total_s": round(sum(r[2] for r in rows), 1),
                "top5_exec": rows[:5],
            }
        ),
        flush=True,
    )
    sys.exit(1 if errs else 0)


if __name__ == "__main__":
    main()
