"""Partition-invariance sweep: every value-oracled key must return an
IDENTICAL canonical result set when the physical partitioning changes.

Each key runs twice — ``spark.sql.shuffle.partitions`` = 3 then 32 —
and the two results are canonicalized (tests/oracle.df_canon: floats
rounded, columns sorted, rows sorted) and compared cell-for-cell.  Any
split means the query's answer depends on HOW the data was shuffled,
not just on the data: a partial-aggregation order dependence
(float-sum reassociation beyond the rounding tolerance), a window
missing a total order, a per-partition kernel leaking partition-local
state, or a ``first()``/``limit`` without a defining sort.  On a real
cluster the partition count is an ops knob that changes with executor
count and AQE decisions, so any such dependence is a silent
correctness bug at scale — this sweep is the committed, repeatable
version of the ad-hoc 3-vs-32 run from round 6 (SCALE.md checkpoint).

Helper caches are released and the session cache cleared between the
two runs, so the second run cannot silently reuse the first run's
materialized partitioning (which would mask a divergence).

Rows-only keys (engine RNG, sketch internals: j6, d3, d16, d19, …) are
excluded for the same reason they have no DuckDB oracle — their bytes
are legitimately partition-dependent; each is twinned with a
value-oracled variant that IS swept here.

    python tools/partition_invariance.py                  # sf0.001
    python tools/partition_invariance.py /root/testdata/sf0.01

Exit code 0 = all value-oracled keys hash-identical at both settings.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "tests"), os.path.join(REPO, "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)

PARTS = (3, 32)


def sweep(spark, sf_dir: str) -> list[tuple[str, str]]:
    from adversarial_parity import _EXPECTED_CONTRACT
    from big_data_fknn_spark.cache import release_query_caches
    from big_data_fknn_spark.queries import load_all
    from oracle import df_canon

    reg = load_all()
    keys = [k for k in sorted(reg) if reg[k].oracle is not None]
    original = spark.conf.get("spark.sql.shuffle.partitions")
    bad: list[tuple[str, str]] = []
    try:
        for i, key in enumerate(keys):
            results = []
            for parts in PARTS:
                spark.conf.set("spark.sql.shuffle.partitions", str(parts))
                release_query_caches()
                spark.catalog.clearCache()
                try:
                    results.append(("ok", df_canon(reg[key].fn(spark, sf_dir).toPandas())))
                except Exception as ex:  # noqa: BLE001 — report, keep sweeping
                    # keep the FULL text for the contract match (the
                    # expected message may sit past any truncation
                    # point behind streaming wrappers); truncate only
                    # when rendering
                    results.append(("err", str(ex)))
            # compare (status, payload) WITHOUT a parts tag: a key that
            # raises the same error at both settings is BROKEN, not
            # partition-dependent — tagging the strings 'ERR@3'/'ERR@32'
            # made them unequal by construction (round-7 advisor) and
            # diluted real invariance splits with plain breakage
            expected = _EXPECTED_CONTRACT.get(key, "\0")
            if all(r[0] == "err" and expected in r[1] for r in results):
                # the key's DOCUMENTED contract raised at both settings
                # (streaming error strings embed unique runIds, so even
                # textual equality can't certify this — match the
                # registered message instead): partition-independent.
                print(f"  {key}: CONTRACT (documented raise)", flush=True)
            elif results[0] != results[1]:
                errs = [
                    f"ERR@{p} {r[1][:150]}"
                    for p, r in zip(PARTS, results)
                    if r[0] == "err"
                ]
                detail = (
                    " | ".join(errs)
                    if errs
                    else f"HASH_SPLIT {PARTS[0]}-vs-{PARTS[1]}"
                )
                bad.append((key, detail))
            elif results[0][0] == "err":
                bad.append((key, f"BROKEN_BOTH_SETTINGS {results[0][1][:150]}"))
            if (i + 1) % 50 == 0:
                print(f"  …{i + 1}/{len(keys)} swept", flush=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
        release_query_caches()
        spark.catalog.clearCache()
    return bad


def main() -> None:
    from big_data_fknn_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="partition_invariance")
    try:
        bad = sweep(spark, sf_dir)
    finally:
        # a contract-raise aborted stream leaves non-daemon threads
        # that hang interpreter exit (adversarial_parity's teardown)
        for q in spark.streams.active:
            try:
                q.stop()
            except Exception:  # noqa: BLE001 — best-effort teardown
                pass
    print(
        f"partition-invariance {PARTS}: "
        f"{'CLEAN' if not bad else json.dumps(bad)}",
        flush=True,
    )
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
