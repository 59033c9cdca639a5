"""Render QUERIES.md: the full registry index.

    python -m big_data_fknn_spark.queries > QUERIES.md

One row per registered key: implementing module, oracle status, and
the first line of the query's docstring — the line-by-line coverage
companion to SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from big_data_fknn_spark.queries import load_all  # noqa: E402


def first_line(doc: str | None) -> str:
    if not doc:
        return ""
    for ln in doc.strip().splitlines():
        ln = ln.strip()
        if ln:
            return ln.rstrip(".")
    return ""


def main() -> None:
    defs = load_all()
    oracled = sum(1 for d in defs.values() if d.oracle is not None)
    print("# QUERIES — registry index (auto-generated)\n")
    print("Regenerate with `python -m big_data_fknn_spark.queries > QUERIES.md`.")
    print(
        f"{len(defs)} keys, {oracled} with full DuckDB value oracles; "
        "'rows-only' keys are engine-random, iterative-ML, or "
        "streaming-live (see SURVEY.md §2).\n"
    )
    print("| Key | Module | Oracle | What it proves |")
    print("| --- | --- | --- | --- |")
    for k in sorted(defs):
        d = defs[k]
        mod = d.fn.__module__.rsplit(".", 1)[-1]
        oracle = "value" if d.oracle is not None else "rows-only"
        print(f"| {k} | {mod} | {oracle} | {first_line(d.fn.__doc__)} |")


if __name__ == "__main__":
    main()
