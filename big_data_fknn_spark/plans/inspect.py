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


def _agg_grouping_attrs(line: str) -> list[str]:
    """Attribute names in the grouping list of an ``Aggregate`` line
    from a logical-plan print.  ``Aggregate [out]`` (one top-level
    bracket group) is a global scalar aggregate → ``[]``;
    ``Aggregate [keys], [out]`` → the ``name#id`` attrs in keys."""
    body = line[len("Aggregate "):]
    groups, depth, start = [], 0, 0
    for k, ch in enumerate(body):
        if ch == "[":
            if depth == 0:
                start = k
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(body[start + 1 : k])
    if len(groups) < 2:
        return []
    return re.findall(r"(\w+)#\d+", groups[0])


def broadcast_hint_groupings(df: DataFrame) -> list:
    """One entry per broadcast-strategy ``ResolvedHint`` in the
    ANALYZED logical plan: the sorted union of grouping-attribute
    names over every ``Aggregate`` inside the hinted subtree
    (``[]`` = only scalar aggregates), or ``None`` when the subtree
    holds no Aggregate at all — a raw relation under a forced
    broadcast.

    Why this is the 100 TB contract: a broadcast HINT bypasses
    ``autoBroadcastJoinThreshold`` and Spark hard-fails any broadcast
    over 8 GB, so a hinted side that grows with the corpus doesn't
    get slow at 100× — it aborts the job.  Legitimate hints therefore
    must aggregate their input down to a bounded cardinality first:
    a scalar, or a grouping by an enum-bounded column (class label,
    language, source).  tests/test_plans.py sweeps the de-hinted
    dedup/vocab keys with this; the analyzed plan (not the physical
    one) is inspected so the assertion is about what the query FORCES,
    not what AQE happens to pick at test scale."""
    plan = df._jdf.queryExecution().analyzed().toString()
    parsed = [_depth_and_name(l) for l in plan.splitlines()]
    out = []
    for i, (d, name) in enumerate(parsed):
        if not name.startswith("ResolvedHint (strategy=broadcast"):
            continue
        # only the TOPMOST Aggregate on each branch bounds what is
        # broadcast — anything beneath it is already collapsed (e.g. a
        # scalar total over a vocab-grouped count broadcasts one row,
        # however large the inner grouping), so skip descendants of a
        # seen Aggregate
        groups = None
        skip_below = None
        for dj, nj in parsed[i + 1:]:
            if dj <= d:
                break
            if skip_below is not None:
                if dj > skip_below:
                    continue
                skip_below = None
            if nj.startswith("Aggregate ["):
                cols = _agg_grouping_attrs(nj)
                groups = sorted(set(cols) | set(groups or []))
                skip_below = dj
        out.append(groups)
    return out


def explain_summary(df: DataFrame) -> str:
    """One line per interesting operator — the 100 TB code-review view."""
    lines = []
    for raw in executed_plan(df).splitlines():
        if any(k in raw for k in _INTERESTING):
            lines.append(raw.strip()[:160])
    return "\n".join(lines)
