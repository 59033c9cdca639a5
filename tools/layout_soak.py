"""Hostile-writer physical-layout soak (round 11).

At 100 TB nobody controls the writer: tables arrive as DIRECTORIES of
part files, with columns in whatever order the producing job's
projection emitted, carrying extra columns a consumer never asked
for, compressed with whatever codec the team standardized on, and cut
into row groups sized for the writer's memory — none of which may
change a single result.  The round-9 sharding sweep covered the
multi-part axis alone; this tool composes ALL of them into one
mutated copy of the sf0.01 tables and runs the full strict gate
replica (tools/driver_sim.py) against it:

- every table rewritten as ``<t>.parquet/`` with 3 part files
  (1 for tiny dims), splitting rows contiguously;
- column order SHUFFLED per table (seeded by the table name — stable
  across runs, different per table);
- one decoy column ``__layout_decoy`` appended (constant string):
  name-based projection must ignore it, and a query that exposes it
  via SELECT * exposes it to the DuckDB oracle too (same files), so
  hashes still must agree — what it actually catches is POSITIONAL
  column access anywhere in the engine;
- zstd compression, row groups of 512 rows (sf0.01 lineitem →
  ~120 row groups/file — pushdown and vectorized-reader batch
  boundaries get exercised, not just file boundaries).

Usage:

    python tools/layout_soak.py            # build + full 249-key drive
    python tools/layout_soak.py --rebuild  # force rebuild of /tmp copy
    python tools/layout_soak.py --json DRIVERSIM_r11_layout.json

Exit code = driver_sim's (0 only if every oracled key hash-matches).
"""

from __future__ import annotations

import os
import random
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SRC = "/root/testdata/sf0.01"
DST = "/tmp/layout_sf001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
PARTS = 3
ROW_GROUP = 512


def _fingerprint() -> str:
    """Source mtimes/sizes + the build constants: if either changes,
    the cached /tmp corpus is stale and must rebuild automatically —
    a bare existence marker silently revalidated old data when SRC
    was regenerated or PARTS/ROW_GROUP/decoy logic moved."""
    import hashlib

    h = hashlib.sha256()
    h.update(f"parts={PARTS};rg={ROW_GROUP};decoy=__layout_decoy;".encode())
    for name in TABLES:
        p = f"{SRC}/{name}.parquet"
        st = os.stat(p)
        h.update(f"{name}:{st.st_size}:{st.st_mtime_ns};".encode())
    return h.hexdigest()


def build(rebuild: bool) -> str:
    import pyarrow.parquet as pq

    marker = os.path.join(DST, "_LAYOUT_OK")
    fp = _fingerprint()
    if os.path.exists(marker) and not rebuild:
        if open(marker).read().strip() == fp:
            print(f"layout corpus present at {DST} (use --rebuild to force)")
            return DST
        print("layout corpus fingerprint mismatch — rebuilding")
    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST)
    import pyarrow as pa

    for name in TABLES:
        t = pq.read_table(f"{SRC}/{name}.parquet")
        cols = list(t.schema.names)
        rng = random.Random(f"layout:{name}")
        rng.shuffle(cols)
        t = t.select(cols)
        t = t.append_column(
            "__layout_decoy", pa.array([f"decoy:{name}"] * t.num_rows)
        )
        d = f"{DST}/{name}.parquet"
        os.makedirs(d)
        n = t.num_rows
        parts = PARTS if n >= PARTS else 1
        cut = [round(i * n / parts) for i in range(parts + 1)]
        for i in range(parts):
            pq.write_table(
                t.slice(cut[i], cut[i + 1] - cut[i]),
                f"{d}/part-{i:03d}.parquet",
                compression="zstd",
                row_group_size=ROW_GROUP,
                store_schema=False,
            )
        print(
            f"  {name:10s} {n:7d} rows -> {parts} parts, cols {cols[:3]}...",
            flush=True,
        )
    with open(marker, "w") as f:
        f.write(fp + "\n")
    return DST


def main() -> None:
    dst = build("--rebuild" in sys.argv)
    cmd = [
        sys.executable,
        os.path.join(REPO, "tools", "driver_sim.py"),
        "--sf-dir",
        dst,
    ]
    if "--json" in sys.argv:
        cmd += ["--json", sys.argv[sys.argv.index("--json") + 1]]
    if "--keys" in sys.argv:
        cmd += ["--keys", sys.argv[sys.argv.index("--keys") + 1]]
    rc = subprocess.run(cmd, cwd=REPO).returncode
    print(f"layout soak: {'CLEAN' if rc == 0 else f'FAILED rc={rc}'}")
    sys.exit(rc)


if __name__ == "__main__":
    main()
