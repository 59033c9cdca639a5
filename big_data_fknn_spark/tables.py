"""Parquet table loaders for the driver's testdata star schema.

Tables (TESTDATA.md / FIXTURES.md): region nation customer supplier
part orders lineitem events documents embeddings — one parquet file
per table under /root/testdata/sf{0.001,0.01,0.1}/.

At 100 TB these would be partitioned/bucketed parquet datasets; the
loaders stay the same (`spark.read.parquet` on a directory) — scans
get column pruning + predicate pushdown from Catalyst either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Session-scoped parquet FOOTER-SCHEMA memo, keyed by
#: (applicationId, path).  A bare ``spark.read.parquet`` runs a
#: schema-inference job against the file footers on EVERY call —
#: measured ~100 ms/read on this host vs ~16 ms with an explicit
#: schema — and query constructors re-read the same star-schema
#: tables constantly (x32 alone pays 8 reads ≈ 0.7 s of its 0.9 s
#: construct).  Memoizing the SCHEMA (never the DataFrame, never
#: data) keeps every semantic property of a fresh read: file listing
#: still happens per call (new/-rewritten part files are seen), every
#: action still scans parquet; only the footer re-inference of a
#: schema this session has already seen is skipped.  This is the
#: guide-§6 repeated-listing discipline applied to footers — at
#: 100 TB, re-inferring a partitioned dataset's schema per query is
#: a driver-side stall (guide §7.3).  The memo is cleared by
#: cache.release_query_caches() (the suite/tools' corpus boundary),
#: so a regenerated table under the same path is re-inferred there.
_SCHEMA_MEMO: dict[tuple[str, str], "StructType"] = {}


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet(path)`` with the footer schema memoized
    per (session, path) — identical relation, one inference job per
    session instead of one per call."""
    key = (spark.sparkContext.applicationId, path)
    sch = _SCHEMA_MEMO.get(key)
    if sch is None:
        df = spark.read.parquet(path)
        _SCHEMA_MEMO[key] = df.schema
        return df
    return spark.read.schema(sch).parquet(path)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame."""
    if name == "events":
        return events_t(spark, sf_dir)
    return read_table(spark, f"{sf_dir}/{name}.parquet")


def events_t(
    spark: SparkSession,
    sf_dir: str,
    ts_min: str | None = None,
    ts_max: str | None = None,
) -> DataFrame:
    """events with `ts` normalized to a session-TZ TIMESTAMP.

    The generator has shipped `ts` as both TIMESTAMP(NANOS) and
    TIMESTAMP(MICROS) parquet across regenerations, so handle either:

    - nanos: Spark 4 rejects them outright ([PARQUET_TYPE_ILLEGAL]);
      the legacy conf reads them as long nanos which we truncate to
      microseconds — bit-identical to DuckDB's ns→µs TIMESTAMP read.
    - micros: arrives as TIMESTAMP_NTZ; a plain cast relabels it as
      session-TZ TIMESTAMP (value-identical — session TZ is UTC,
      session.py) so every downstream window/oracle sees one type.

    Scale note: a cast on `ts` hides it from parquet predicate
    pushdown, so time-slice predicates must be applied to the RAW
    column before the cast — pass ``ts_min``/``ts_max`` (ISO-8601
    UTC strings, half-open [min, max)) and the filter is translated
    to the raw type (ns-long or TIMESTAMP_NTZ) where parquet
    row-group stats can prune it (plan-asserted in
    tests/test_plans.py).  At 100 TB the table would additionally be
    date-partitioned at rest so whole files prune first.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # read_table is conf-safe here: events is only ever read through
    # this function, so the memoized schema was always inferred with
    # nanosAsLong set (long for the legacy layout, NTZ otherwise).
    raw = read_table(spark, f"{sf_dir}/events.parquet")
    if isinstance(raw.schema["ts"].dataType, LongType):
        if ts_min is not None:
            raw = raw.where(F.col("ts") >= _iso_to_ns(ts_min))
        if ts_max is not None:
            raw = raw.where(F.col("ts") < _iso_to_ns(ts_max))
        # Build the column through the WALL clock (NTZ arithmetic on
        # the UTC-epoch micros), not F.timestamp_micros: the latter
        # makes an INSTANT whose NTZ reading is the SESSION-zone wall
        # clock, so under a deployment that never pinned UTC the
        # legacy-layout `ts` would disagree with the NTZ-parquet
        # branch below (and wall_micros would re-shift it) — the one
        # residue the round-10 non-UTC drives could not see because
        # the driven testdata ships the NTZ layout (round-10 advice).
        # wall_timestamp(µs) is UTC-wall NTZ under EVERY session zone;
        # the final cast relabels it session-TZ exactly like the NTZ
        # branch, so both layouts are value-identical in any zone.
        return raw.withColumn(
            "ts", wall_timestamp(F.expr("ts div 1000")).cast("timestamp")
        )
    if ts_min is not None:
        raw = raw.where(F.col("ts") >= F.lit(ts_min).cast("timestamp_ntz"))
    if ts_max is not None:
        raw = raw.where(F.col("ts") < F.lit(ts_max).cast("timestamp_ntz"))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def wall_micros(col) -> "F.Column":
    """Epoch microseconds of a timestamp's WALL-CLOCK reading,
    independent of the session time zone.

    ``F.unix_micros`` extracts the INSTANT, which for our
    parquet-NTZ-sourced ``ts`` embeds the session zone offset
    (events_t relabels wall time into a session-TZ TIMESTAMP): under a
    deployment that never pinned UTC, every absolute epoch — day
    buckets, exported ``ts_us`` longs — shifts by the zone offset
    while the DuckDB oracle's ``epoch_us`` stays wall-based.  The
    round-10 non-UTC drive caught exactly that in the five
    absolute-epoch keys (i8, i19, x66, x68, x71); difference/order
    uses of unix_micros cancel the offset and were unaffected.

    This recovers the wall clock by casting back to TIMESTAMP_NTZ
    (inverting the session-zone relabel) and differencing against the
    NTZ epoch — pure wall arithmetic, identical under any session
    zone.  Caveat: a wall time inside a DST spring-forward gap of the
    session zone has no exact instant, so the relabel round-trip can
    shift it; the canonical fix at ingest is date-partitioned NTZ
    storage, which this testdata (Jan 2024) never exercises."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        c.cast("timestamp_ntz"),
    )


def wall_timestamp(us_col) -> "F.Column":
    """Inverse of :func:`wall_micros`: wall-epoch microseconds → a
    TIMESTAMP_NTZ carrying that wall clock.  Rendered labels (day /
    hour bucket starts) must come back as NTZ, not as
    ``F.timestamp_micros`` instants: an instant renders through the
    session zone, so a UTC-midnight label prints as 19:00 of the
    previous day under America/New_York while the oracle's
    ``make_timestamp`` prints wall midnight.  NTZ renders the wall
    clock under every zone."""
    c = F.col(us_col) if isinstance(us_col, str) else us_col
    return F.timestamp_add(
        "MICROSECOND",
        c.cast("long"),
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
    )


def _iso_to_ns(iso: str) -> int:
    """ISO-8601 UTC wall-clock string → epoch nanoseconds (for the
    legacy nanos-as-long raw representation)."""
    from datetime import datetime, timezone

    dt = datetime.fromisoformat(iso).replace(tzinfo=timezone.utc)
    return int(dt.timestamp()) * 1_000_000_000 + dt.microsecond * 1_000


#: Fixed embedding dimensionality of the testdata corpus
#: (TESTDATA.md: embeddings.embedding is array<float> of 64).
EMB_DIM = 64

#: Vector admission contract (the ingest gate for every operator that
#: does distance/similarity math on `embeddings`): a vector
#: participates only if it (1) has exactly EMB_DIM elements, (2) every
#: element is finite, and (3) it is not the all-zero vector.  One
#: ragged / non-finite / zero-norm row in 100 TB of input must not
#: kill a kNN/FkNN/SemDeDup job (ragged rows crash fixed-dim BLAS
#: kernels; non-finite elements poison distance sums; zero vectors
#: have no direction, so cosine similarity divides by zero).  Dropping
#: them at the scan edge — mirrored verbatim in every DuckDB oracle —
#: is the same posture as j28's text-ingest gate.  No-op on clean
#: testdata (all vectors are 64-dim, finite, non-zero; verified in
#: tests/test_knn_kernel.py).
EMB_ADMIT_SQL = (
    "len(embedding) = 64"
    " AND list_aggregate(list_transform(embedding,"
    " x -> CASE WHEN isfinite(x) THEN 1 ELSE 0 END), 'min') = 1"
    " AND list_aggregate(list_transform(embedding, x -> abs(x)), 'max') > 0"
)


def _emb_admit() -> "F.Column":
    from pyspark.sql import Column  # noqa: F401 — typing only

    return (
        (F.size("embedding") == EMB_DIM)
        & F.expr(
            "forall(embedding, x -> NOT isnan(x)"
            " AND abs(x) < cast('Infinity' AS float))"
        )
        & F.expr("exists(embedding, x -> x <> 0.0)")
    )


def embeddings_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings with the float32 vector widened to array<double>,
    restricted to vectors passing the admission contract (EMB_ADMIT_SQL
    above — 64-dim, finite, non-zero).

    float→double widening is exact, so Spark and the DuckDB oracle
    (``embedding::DOUBLE[]``) see bit-identical values — a
    precondition for hash-matching distance math (SURVEY.md §7.1).
    """
    return (
        t(spark, sf_dir, "embeddings")
        .where(_emb_admit())
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("emb"),
            "label",
        )
    )


def train_test_split(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Deterministic 80/20 split of embeddings (FIXTURES.md §mapping).

    ``vec_id % 5 != 0`` → train, ``== 0`` → test.  Stands in for the
    reference's separate KEEL train/test files; reproducible in both
    engines (unlike randomSplit).

    Train keeps LABELED rows only: an unlabeled vector cannot vote or
    contribute class memberships, and letting NULL flow into the
    vote/membership math makes the argmax tiebreak engine-dependent
    (Spark sorts NULL first, DuckDB last).  Test rows keep their
    (possibly NULL) label — predictions are still produced for them;
    only label-consuming metrics (d17's AUC) additionally restrict to
    labeled ground truth.  No-op on the clean testdata (no NULLs).
    """
    emb = embeddings_d(spark, sf_dir)
    return (
        emb.where((F.col("vec_id") % 5 != 0) & F.col("label").isNotNull()),
        emb.where(F.col("vec_id") % 5 == 0),
    )
