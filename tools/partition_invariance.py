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

INPUT-SHARDING mode (``--shards N``, round-9 verdict): every testdata
table ships as ONE parquet file, so the shuffle-partition axis above
never varies the INPUT split count or file order — anything first-row-
or split-order-sensitive (kernel dim inference, streaming file-source
ordering) went untested.  The mode rewrites each table as an N-file
directory (round-robin rows, so file order ≠ key order), runs every
value-oracled key against BOTH layouts, and compares canonical
results Spark-vs-Spark; rows-only keys are count-smoked on the
sharded layout (the crash check that found the round-8 MLlib bugs).

    python tools/partition_invariance.py --shards 7

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


TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def build_shards(spark, src: str, dst: str, n_files: int) -> str:
    """Rewrite each single-file table as an N-part directory named
    ``{name}.parquet`` (spark.read.parquet treats the directory and
    the single file identically, so ``t()`` needs no change).
    ``repartition(n)`` round-robins rows, so part-file membership and
    order both differ from the writer-sorted original — exactly the
    layout variance a 1000-executor scan produces."""
    import shutil

    os.makedirs(dst, exist_ok=True)
    for name in TABLES:
        out = f"{dst}/{name}.parquet"
        shutil.rmtree(out, ignore_errors=True)
        (
            spark.read.parquet(f"{src}/{name}.parquet")
            .repartition(n_files)
            .write.mode("overwrite")
            .parquet(out)
        )
    return dst


def sweep_shards(spark, src: str, dst: str) -> list[tuple[str, str]]:
    """Run every key against the 1-file and N-file layouts; oracled
    keys must canonically match, rows-only keys must not crash."""
    from adversarial_parity import _EXPECTED_CONTRACT
    from big_data_fknn_spark.cache import release_query_caches
    from big_data_fknn_spark.queries import load_all
    from oracle import df_canon

    reg = load_all()
    bad: list[tuple[str, str]] = []
    for i, key in enumerate(sorted(reg)):
        expected = _EXPECTED_CONTRACT.get(key, "\0")
        if reg[key].oracle is None:
            try:  # rows-only: the sharded layout must not crash it
                reg[key].fn(spark, dst).count()
            except Exception as ex:  # noqa: BLE001 — report, keep going
                if expected not in str(ex):
                    bad.append((key, f"SHARDED_ERR {str(ex)[:150]}"))
            continue
        results = []
        for sf_dir in (src, dst):
            release_query_caches()
            spark.catalog.clearCache()
            try:
                results.append(
                    ("ok", df_canon(reg[key].fn(spark, sf_dir).toPandas()))
                )
            except Exception as ex:  # noqa: BLE001
                results.append(("err", str(ex)))
        if all(r[0] == "err" and expected in r[1] for r in results):
            print(f"  {key}: CONTRACT (documented raise)", flush=True)
        elif results[0] != results[1]:
            errs = [
                f"ERR@{tag} {r[1][:150]}"
                for tag, r in zip(("1file", "sharded"), results)
                if r[0] == "err"
            ]
            detail = " | ".join(errs) if errs else "HASH_SPLIT 1file-vs-sharded"
            bad.append((key, detail))
        elif results[0][0] == "err":
            bad.append((key, f"BROKEN_BOTH_LAYOUTS {results[0][1][:150]}"))
        if (i + 1) % 50 == 0:
            print(f"  …{i + 1}/{len(reg)} swept", flush=True)
    return bad


def main() -> None:
    from big_data_fknn_spark.session import get_spark

    args = sys.argv[1:]
    n_shards: int | None = None
    if "--shards" in args:
        i = args.index("--shards")
        n_shards = int(args[i + 1]) if len(args) > i + 1 else 7
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    spark = get_spark(app_name="partition_invariance")
    try:
        if n_shards is not None:
            dst = build_shards(
                spark, sf_dir, f"/tmp/sharded_{os.path.basename(sf_dir)}_n{n_shards}",
                n_shards,
            )
            bad = sweep_shards(spark, sf_dir, dst)
            label = f"input-sharding 1-vs-{n_shards} files"
        else:
            bad = sweep(spark, sf_dir)
            label = f"partition-invariance {PARTS}"
    finally:
        # a contract-raise aborted stream leaves non-daemon threads
        # that hang interpreter exit (adversarial_parity's teardown)
        for q in spark.streams.active:
            try:
                q.stop()
            except Exception:  # noqa: BLE001 — best-effort teardown
                pass
    print(
        f"{label}: {'CLEAN' if not bad else json.dumps(bad)}",
        flush=True,
    )
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
