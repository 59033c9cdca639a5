"""Isolated per-key timing for optimization A/B runs.

Usage:
    python tools/key_timer.py KEY [KEY ...] [--reps N] [--conf K=V ...]

Times each key's construct (registry fn call) and exec (noop sink)
separately over N interleaved reps inside ONE session and prints the
min/median of each — the same clock split bench.py records, without
the other 13 headline keys.  Job descriptions are set per key (guide
§1.5) so a UI/eventlog reader can attribute stages.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    reps = 5
    confs = []
    keys = []
    it = iter(range(len(args)))
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif a == "--conf":
            confs.append(args[i + 1])
            i += 2
        else:
            keys.append(a)
            i += 1

    from big_data_fknn_spark.queries import load_all
    from big_data_fknn_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="key_timer")
    for kv in confs:
        k, v = kv.split("=", 1)
        spark.conf.set(k, v)
    reg = load_all()

    # warm codegen/JVM once with the first key
    reg[keys[0]].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    runs: dict[str, list[tuple[float, float]]] = {k: [] for k in keys}
    for _ in range(reps):
        for key in keys:
            spark.sparkContext.setJobDescription(f"key_timer:{key}")
            t0 = time.perf_counter()
            df = reg[key].fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            runs[key].append((t1 - t0, t2 - t1))
            spark.sparkContext.setJobDescription(None)
    for key in keys:
        cs = sorted(r[0] for r in runs[key])
        es = sorted(r[1] for r in runs[key])
        print(
            f"KEYTIMER {key} construct min={cs[0]:.3f} med={statistics.median(cs):.3f}"
            f" | exec min={es[0]:.3f} med={statistics.median(es):.3f}"
            f" | total_min={cs[0]+es[0]:.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
