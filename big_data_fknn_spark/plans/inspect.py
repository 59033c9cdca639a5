"""Helpers over ``df._jdf.queryExecution()`` (the stable-enough
private surface PySpark itself uses for ``df.explain``)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_INTERESTING = (
    "FileScan",
    "PushedFilters",
    "Exchange",
    "HashAggregate",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "WindowGroupLimit",
    "Window",
    "TakeOrderedAndProject",
    "MapInPandas",
    "Expand",
)


def executed_plan(df: DataFrame) -> str:
    """The physical plan as a string (post-planning, pre-AQE-finish).

    Scan metadata (PushedFilters/ReadSchema) is truncated to 100
    chars by default, which silently breaks any parsing of it —
    widen it for the render, then restore."""
    spark = df.sparkSession
    key = "spark.sql.maxMetadataStringLength"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "100000")
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(key, old)


def has_operator(df: DataFrame, name: str) -> bool:
    return name in executed_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters list in the plan's scans, flattened."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", executed_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def read_schema_width(df: DataFrame) -> list[int]:
    """Column count of each scan's ReadSchema — the column-pruning
    check (a scan reading 16 columns for a 3-column projection is a
    plan bug, not a correctness bug)."""
    widths = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", executed_plan(df)):
        body = m.group(1)
        widths.append(0 if not body.strip() else body.count(",") + 1)
    return widths


_TREE_MARK = re.compile(r"[+:]- ")


def _depth_and_name(line: str) -> tuple[int, str]:
    m = _TREE_MARK.search(line)
    if m is None:
        return 0, line.strip()
    return m.start() // 3 + 1, line[m.end():].strip()


def single_partition_window_feeds(
    plan: str, heads: tuple[str, ...] = ("Window", "Sort")
) -> list[str]:
    """Names of Window/Sort operators consuming an ``Exchange
    SinglePartition`` — the scale-killer shape where the WHOLE input
    funnels through one task to satisfy an unpartitioned
    ``Window.orderBy`` (or a forced one-partition sort).

    Walks the plan tree by print-indentation: for every
    ``Exchange SinglePartition`` node, climbs its ancestor chain and
    reports the first matching operator reached before any other
    exchange/broadcast/aggregate redistributes or collapses the data.
    Scalar final aggregates (which legitimately use SinglePartition)
    are not reported; global ORDER BY uses a rangepartitioning
    exchange, not SinglePartition, so parallel sorts never hit.
    tests/test_plans.py sweeps every registered query with this and
    fails non-whitelisted hits; operators/rank.py is the
    range-bucketed primitive that removes them."""
    parsed = [_depth_and_name(l) for l in plan.splitlines()]
    hits: list[str] = []
    for i, (d, name) in enumerate(parsed):
        if not name.startswith("Exchange SinglePartition"):
            continue
        want = d - 1
        for j in range(i - 1, -1, -1):
            dj, nj = parsed[j]
            if dj != want:
                continue
            want -= 1
            head = nj.split("(")[0].split("[")[0].strip()
            if head.startswith(heads):
                hits.append(head)
                break
            if head.startswith(("Exchange", "Broadcast", "HashAggregate", "SortAggregate", "ObjectHashAggregate")):
                break
            if want < 0:
                break
    return hits


_CODEGEN_PREFIX = re.compile(r"^\*\(\d+\) ")


def single_partition_consumers(plan: str) -> list[str]:
    """The DIRECT parent operator of every ``Exchange SinglePartition``
    in the plan.  At scale the only legitimate consumers are
    global-scalar aggregate finals (``keys=[]`` — one partial row per
    task crosses the exchange, the canonical two-phase global
    sum/avg/min) and the bounded final Sorts/Windows separately
    policed by :func:`single_partition_window_feeds` + its whitelist.
    tests/test_plans.py asserts registry-wide that nothing else ever
    consumes one (an SP exchange feeding a join, project chain, or
    keyed aggregate would funnel real data through one task)."""
    parsed = [_depth_and_name(l) for l in plan.splitlines()]
    out: list[str] = []
    for i, (d, name) in enumerate(parsed):
        if not name.startswith("Exchange SinglePartition"):
            continue
        for j in range(i - 1, -1, -1):
            dj, nj = parsed[j]
            if dj == d - 1:
                out.append(_CODEGEN_PREFIX.sub("", nj))
                break
    return out


def explain_summary(df: DataFrame) -> str:
    """One line per interesting operator — the 100 TB code-review view."""
    lines = []
    for raw in executed_plan(df).splitlines():
        if any(k in raw for k in _INTERESTING):
            lines.append(raw.strip()[:160])
    return "\n".join(lines)
