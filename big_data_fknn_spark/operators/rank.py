"""Range-partitioned exact global rank / ntile / running aggregates.

The scale-safe replacement for ``Window.orderBy(...)`` with no
``partitionBy`` — which Spark physically plans as ``Exchange
SinglePartition`` + one task sorting the WHOLE input (verified with
``explain`` on the round-2 operators this module now powers: RFM
quintiles, Gini ranks, Lorenz deciles, skylines, percent_rank).
Correct at sf0.1; a funnel at 10⁹ rows.

The primitive here is the classic distributed zipWithIndex / range-
rank pattern (the same shape Spark's own ``RangePartitioner`` uses
internally for ``ORDER BY``):

1. ONE pass computes ~equi-depth split points of the leading order
   key (``percentile_approx`` — a partial-combinable aggregate, so
   map-side combined, tiny shuffle).
2. Each row gets a bucket id as a PURE FUNCTION of its key value
   (count of split points below it).  Purity matters: every
   re-evaluation of the plan assigns identical buckets, so no
   exchange-reuse or checkpoint is needed for consistency —
   unlike ``spark_partition_id()`` after ``repartitionByRange``.
3. ONE pass counts rows per bucket (≤ num_buckets rows — collected
   to the driver exactly like RangePartitioner collects its sampled
   boundaries) → cumulative offsets as literal arrays.
4. Local ``row_number`` inside ``Window.partitionBy(bucket)`` — a
   hash shuffle over ~n/B-row groups, never a single partition —
   plus the broadcast offset = exact global rank.

ntile / percent_rank derive from the exact rank and the (driver-
known) total; a prefix-combine of any commutative aggregate (max,
sum) over "all preceding rows" works the same way: local running
value within the bucket ⊕ the literal prefix over earlier buckets.
``multi_global_rank`` amortizes the construct jobs across SEVERAL
orders of one input (one splits aggregate + one GROUPING SETS count
pass however many metrics), and the bucketing key is type-dispatched
(numeric/decimal/timestamp/date/boolean; anything else raises).

Caveats: the order must be a TOTAL order (append a unique key —
every caller here does, for cross-engine determinism anyway) and the
leading key must be non-null — CHECKED inside the per-bucket counts
job (zero extra passes), raising instead of silently misplacing
NULLs for descending orders.

Cost: two extra passes over the (already aggregated, entity-
cardinality) input at construct time.  Callers ranking a non-trivial
plan should ``localCheckpoint()`` first so the three jobs share one
materialization.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "GlobalRank",
    "global_rank",
    "multi_global_rank",
    "ntile_from_rank",
    "global_running_agg",
]

_BUCKET = "__gr_bucket"


def _resolve(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _num_buckets(df: DataFrame, num_buckets: int | None) -> int:
    if num_buckets is not None:
        return max(int(num_buckets), 1)
    return max(int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")), 1)


def _bucket_key(df: DataFrame, leading: Column, ascending: bool) -> Column:
    """Monotone numeric projection of the leading key for bucketing.

    Must be order-preserving (non-strict is fine: values that collide
    in the projection share a bucket and the in-bucket sort on the
    TRUE columns restores exact order).  A blind ``cast("double")``
    silently yields NULL for dates/timestamps/strings — collapsing
    everything into one bucket — so the projection is type-dispatched
    and unsupported types fail loudly instead."""
    from pyspark.sql import types as T

    dt = df.select(leading.alias("__k")).schema[0].dataType
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        key = F.unix_micros(leading).cast("double")
    elif isinstance(dt, T.DateType):
        key = F.datediff(leading, F.lit("1970-01-01").cast("date")).cast("double")
    elif isinstance(dt, T.BooleanType):
        key = leading.cast("int").cast("double")
    elif isinstance(dt, T.NumericType):
        key = leading.cast("double")
    else:
        raise TypeError(
            f"global rank bucketing needs a numeric/date/timestamp/boolean "
            f"leading key; got {dt.simpleString()} — project it to a "
            "monotone numeric first (e.g. a length, an epoch, a prefix code)"
        )
    return key if ascending else -key


def _splits_agg(key: Column, n: int, alias: str) -> Column:
    fracs = [i / n for i in range(1, n)]
    return F.percentile_approx(
        key, F.array(*[F.lit(f) for f in fracs]), F.lit(10000)
    ).alias(alias)


def _bucket_expr(raw_splits, key: Column) -> Column:
    """Bucket id from collected split points: count of splits strictly
    below the key — a pure function of the VALUE, so every plan
    re-evaluation assigns identical buckets."""
    splits = sorted(set(s for s in (raw_splits or []) if s is not None))
    if not splits:
        return F.lit(0)
    arr = F.array(*[F.lit(float(s)) for s in splits])
    return F.size(F.filter(arr, lambda s: s < key))


def _bucket_col(df: DataFrame, leading: Column, ascending: bool, n: int) -> Column:
    """Pure-function bucket id (0..<n) for the leading order key.

    Splits are ~equi-depth approximate percentiles of the key —
    accuracy only affects balance, never rank correctness, because
    exact order is re-established inside each bucket.  Ties on the
    split value all land in one bucket (strict ``<``), so bucket id
    is deterministic per VALUE, not per row placement.
    """
    key = _bucket_key(df, leading, ascending)
    if n <= 1:
        return F.lit(0)
    row = df.select(_splits_agg(key, n, "s")).first()
    return _bucket_expr(row["s"] if row is not None else None, key)


def _offsets(tagged: DataFrame, agg: Column, leading: Column | None = None) -> list:
    """Collect per-bucket aggregate (≤ num_buckets rows) to the driver.
    With ``leading`` set, piggybacks a NULL-key count on the same job
    and raises if any (see global_rank's contract)."""
    aggs = [agg.alias("v")]
    if leading is not None:
        aggs.append(F.sum(leading.isNull().cast("long")).alias("__nulls"))
    rows = tagged.groupBy(_BUCKET).agg(*aggs).collect()
    if leading is not None:
        n_null = sum(int(r["__nulls"] or 0) for r in rows)
        if n_null:
            raise ValueError(
                f"global running agg: leading order key has {n_null} NULL "
                "row(s) — range bucketing requires a non-null leading key"
            )
    by_bucket = {r[_BUCKET]: r["v"] for r in rows}
    n = (max(by_bucket) + 1) if by_bucket else 1
    return [by_bucket.get(b) for b in range(n)]


@dataclass(frozen=True)
class GlobalRank:
    df: DataFrame
    total: int  # total row count (driver-known, from the bucket counts)
    running_total: object = None  # grand total of ``running_sum``, if requested


def global_rank(
    df: DataFrame,
    order: list[tuple[Column | str, bool]],
    *,
    rank_col: str = "rank",
    num_buckets: int | None = None,
    running_sum: tuple[Column | str, str] | None = None,
    sum_type: str | None = None,
) -> GlobalRank:
    """Exact global row_number over ``order`` — without ever moving
    the data through one partition.

    ``order`` is ``[(column, ascending), ...]`` and MUST be a total
    order (unique tiebreaker last).  Returns the tagged DataFrame
    plus the driver-known total row count, which lets
    ntile/percent_rank be pure literal arithmetic on the rank.

    ``running_sum=(value_col, out_name)`` additionally emits the
    INCLUSIVE running sum of ``value_col`` in rank order — same
    bucketing, same window pass, one extra column in the tiny
    per-bucket aggregate (the vocabulary-coverage / Pareto-curve
    shape).  ``sum_type`` pins the accumulation type (e.g.
    ``"decimal(30,10)"``) so literal-prefix + window-sum promotion
    can't silently drop scale at the 38-precision cap.

    Plan shape: scan → [splits agg job] → scan+bucket → [counts agg
    job] → hash Exchange on bucket → per-bucket sort + Window →
    project.  No ``Exchange SinglePartition`` anywhere
    (tests/test_plans.py asserts this).
    """
    n = _num_buckets(df, num_buckets)
    leading, lead_asc = order[0]
    tagged = df.withColumn(_BUCKET, _bucket_col(df, _resolve(leading), lead_asc, n))
    sum_val = _resolve(running_sum[0]) if running_sum else None
    if sum_val is not None and sum_type:
        sum_val = sum_val.cast(sum_type)
    aggs = [
        F.count(F.lit(1)).alias("__cnt"),
        # the non-null contract checked for free inside the counts job:
        # a NULL leading key would silently land in bucket 0 — correct
        # only for ASC NULLS FIRST, wrong for DESC — so fail loudly
        F.sum(_resolve(leading).isNull().cast("long")).alias("__nulls"),
    ]
    if sum_val is not None:
        aggs.append(F.sum(sum_val).alias("__sum"))
    rows = tagged.groupBy(_BUCKET).agg(*aggs).collect()
    n_null = sum(int(r["__nulls"] or 0) for r in rows)
    if n_null:
        raise ValueError(
            f"global_rank: leading order key has {n_null} NULL row(s) — "
            "range bucketing requires a non-null leading key (filter or "
            "coalesce first)"
        )
    by_bucket = {r[_BUCKET]: r for r in rows}
    nb = (max(by_bucket) + 1) if by_bucket else 1
    counts = [int(by_bucket[b]["__cnt"]) if b in by_bucket else 0 for b in range(nb)]
    total = sum(counts)
    offsets, run = [], 0
    for c in counts:
        offsets.append(run)
        run += c
    off = F.element_at(
        F.array(*[F.lit(o) for o in offsets]), F.col(_BUCKET) + 1
    ).cast("long")
    sort_cols = [
        (_resolve(c).asc() if asc else _resolve(c).desc()) for c, asc in order
    ]
    w = Window.partitionBy(_BUCKET).orderBy(*sort_cols)
    out = tagged.withColumn(rank_col, (F.row_number().over(w).cast("long") + off))
    running_total = None
    if sum_val is not None:
        sums = [by_bucket[b]["__sum"] if b in by_bucket else None for b in range(nb)]
        prefix, acc = [], None
        for s in sums:
            prefix.append(acc)
            if s is not None:
                acc = s if acc is None else acc + s
        running_total = acc
        pre = F.element_at(
            F.array(*[F.lit(p) for p in prefix]), F.col(_BUCKET) + 1
        )
        local = F.sum(sum_val).over(w.rowsBetween(Window.unboundedPreceding, 0))
        if sum_type:
            pre = pre.cast(sum_type)
            local = local.cast(sum_type)
        out = out.withColumn(
            running_sum[1],
            F.when(pre.isNull(), local).otherwise(pre + local),
        )
    return GlobalRank(out.drop(_BUCKET), total, running_total)


def ntile_from_rank(rank: Column, total: int, k: int) -> Column:
    """Exact SQL ``ntile(k)`` from a total-order rank and driver-known
    row count: the first ``total mod k`` tiles get ``⌈total/k⌉`` rows
    — bit-identical to Spark's and DuckDB's ntile when the underlying
    order is total."""
    base, rem = divmod(int(total), k)
    cut = rem * (base + 1)
    big = F.floor((rank - F.lit(1)) / F.lit(base + 1)) + F.lit(1)
    small = (
        F.lit(rem) + F.floor((rank - F.lit(1 + cut)) / F.lit(max(base, 1))) + F.lit(1)
    )
    return F.when(F.lit(rem == 0), small).otherwise(
        F.when(rank <= F.lit(cut), big).otherwise(small)
    ).cast("int")


def global_running_agg(
    df: DataFrame,
    order: list[tuple[Column | str, bool]],
    value: Column | str,
    agg: str = "max",
    *,
    out_col: str = "running",
    exclusive: bool = True,
    num_buckets: int | None = None,
    sum_type: str | None = None,
) -> DataFrame:
    """Global running aggregate over ``order`` (default: exclusive
    running max — the 2-D skyline dominance test) with the same
    bucketed shape as :func:`global_rank`: the in-bucket running
    value combines with the literal prefix-aggregate of all EARLIER
    buckets, which is exact for any commutative/associative agg.
    Supported: ``max``, ``min``, ``sum``.  ``sum_type`` pins the
    accumulation type for sums (see :func:`global_rank`)."""
    fns = {"max": (F.max, F.greatest), "min": (F.min, F.least)}
    if agg not in ("sum", *fns):
        raise ValueError(
            f"global_running_agg supports agg in ('max', 'min', 'sum'); got {agg!r}"
        )
    n = _num_buckets(df, num_buckets)
    leading, lead_asc = order[0]
    val = _resolve(value)
    if agg == "sum" and sum_type:
        val = val.cast(sum_type)
    tagged = df.withColumn(_BUCKET, _bucket_col(df, _resolve(leading), lead_asc, n))
    sort_cols = [
        (_resolve(c).asc() if asc else _resolve(c).desc()) for c, asc in order
    ]
    frame_end = -1 if exclusive else 0
    w = (
        Window.partitionBy(_BUCKET)
        .orderBy(*sort_cols)
        .rowsBetween(Window.unboundedPreceding, frame_end)
    )
    if agg == "sum":
        per_bucket = _offsets(tagged, F.sum(val), _resolve(leading))
        prefix, run = [], None
        for v in per_bucket:
            prefix.append(run)
            if v is not None:
                run = v if run is None else run + v
        pre = F.element_at(F.array(*[F.lit(p) for p in prefix]), F.col(_BUCKET) + 1)
        local = F.sum(val).over(w)
        if sum_type:
            pre = pre.cast(sum_type)
            local = local.cast(sum_type)
        combined = (
            F.when(pre.isNull(), F.coalesce(local, F.lit(0)))
            .otherwise(pre + F.coalesce(local, F.lit(0)))
        )
        # exclusive sum over an empty frame is NULL both engines →
        # only null when no prefix either
        combined = F.when(pre.isNull() & local.isNull(), F.lit(None)).otherwise(combined)
    else:
        agg_fn, comb_fn = fns[agg]
        per_bucket = _offsets(tagged, agg_fn(val), _resolve(leading))
        prefix, run = [], None
        for v in per_bucket:
            prefix.append(run)
            if v is None:
                continue
            if run is None:
                run = v
            elif agg == "max":
                run = max(run, v)
            else:
                run = min(run, v)
        pre = F.element_at(F.array(*[F.lit(p) for p in prefix]), F.col(_BUCKET) + 1)
        local = agg_fn(val).over(w)
        combined = comb_fn(pre, local)  # greatest/least skip NULLs
    return tagged.withColumn(out_col, combined).drop(_BUCKET)


def multi_global_rank(
    df: DataFrame,
    specs: list[tuple[str, list[tuple[Column | str, bool]]]],
    *,
    num_buckets: int | None = None,
) -> tuple[DataFrame, int]:
    """Several exact global ranks over DIFFERENT orders of the same
    input, sharing the construct-time jobs — the multi-metric
    quantile shape (RFM's three quintile cuts).

    ``specs`` is ``[(rank_col, order), ...]`` with ``order`` as in
    :func:`global_rank`.  Cost collapses from 2·|specs| jobs to 2:
    ONE aggregate computes every metric's percentile splits, ONE
    GROUPING SETS aggregate (single scan + Expand) counts rows per
    (metric, bucket) — then each rank is a hash-partitioned window
    over its own bucket column on the SAME DataFrame, so callers
    need no join-back to combine the rank columns.

    Returns ``(df + one rank column per spec, total_rows)``.
    """
    n = _num_buckets(df, num_buckets)
    keys = []
    for name, order in specs:
        leading, asc = order[0]
        keys.append(_bucket_key(df, _resolve(leading), asc))
    # job 1: every spec's equi-depth splits in one aggregate
    if n > 1:
        row = df.select(
            *[_splits_agg(k, n, f"s{i}") for i, k in enumerate(keys)]
        ).first()
        bucket_exprs = [
            _bucket_expr(row[f"s{i}"] if row is not None else None, k)
            for i, k in enumerate(keys)
        ]
    else:
        bucket_exprs = [F.lit(0) for _ in keys]
    bcols = [f"{_BUCKET}_{i}" for i in range(len(specs))]
    tagged = df
    for c, e in zip(bcols, bucket_exprs):
        tagged = tagged.withColumn(c, e)
    # job 2: per-(spec, bucket) counts via GROUPING SETS — one scan,
    # one Expand; grouping_id tells the sets apart.  NULL leading
    # keys are counted in the same job and rejected (see global_rank).
    sets = [[c] for c in bcols]
    gagg = (
        tagged.groupingSets(sets, *bcols)
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.sum(
                sum(
                    (_resolve(order[0][0]).isNull().cast("long") for _, order in specs),
                    F.lit(0),
                )
            ).alias("__nulls"),
            F.grouping_id(*bcols).alias("__gid"),
        )
        .collect()
    )
    n_null = max((int(r["__nulls"] or 0) for r in gagg), default=0)
    if n_null:
        raise ValueError(
            f"multi_global_rank: a leading order key has NULL rows "
            f"(null-count sum {n_null}) — range bucketing requires "
            "non-null leading keys"
        )
    # grouping_id bit i (from the LEFT) is 0 when bcols[i] is grouped
    all_mask = (1 << len(bcols)) - 1
    total = None
    out = tagged
    for i, (name, order) in enumerate(specs):
        gid = all_mask & ~(1 << (len(bcols) - 1 - i))
        counts_i: dict[int, int] = {
            r[bcols[i]]: int(r["__cnt"]) for r in gagg if r["__gid"] == gid
        }
        nb = (max(counts_i) + 1) if counts_i else 1
        counts = [counts_i.get(b, 0) for b in range(nb)]
        t = sum(counts)
        if total is None:
            total = t
        offsets, run = [], 0
        for c in counts:
            offsets.append(run)
            run += c
        off = F.element_at(
            F.array(*[F.lit(o) for o in offsets]), F.col(bcols[i]) + 1
        ).cast("long")
        sort_cols = [
            (_resolve(c).asc() if asc else _resolve(c).desc()) for c, asc in order
        ]
        w = Window.partitionBy(bcols[i]).orderBy(*sort_cols)
        out = out.withColumn(name, F.row_number().over(w).cast("long") + off)
    return out.drop(*bcols), int(total or 0)
