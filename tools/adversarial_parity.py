"""Adversarial-data parity sweep: run every value-oracled key
Spark-vs-DuckDB on a mutated copy of the sf0.001 tables.

Two mutations, each a separate dataset + pass:

* ``ties``  — duplicate a slice of each fact table under FRESH primary
  keys (every non-key column becomes a perfect tie: adversarial for
  ORDER BY tiebreaks, top-k selection, rank refinement), plus
  empty/whitespace/one-token document texts.
* ``nulls`` — inject NULLs into every optional column (measures,
  labels, types, texts, props; keys and join columns stay non-null):
  adversarial for three-valued logic, NULL placement in ORDER BY
  (Spark NULLS FIRST asc vs DuckDB NULLS LAST), UNPIVOT NULL
  dropping, Python kernels seeing None.
* ``unicode`` — multibyte/emoji/RTL/combining-char texts, names and
  event types appended: adversarial for ASCII-only regex classes
  (Java's \\w), byte-vs-char length/substring semantics, case
  mappings, and single-row groups created by new language values
  (zero-variance OLS fits).
* ``empty`` — every table at zero rows (schema preserved):
  adversarial for driver-side .first() returning None, divisions by
  zero-count aggregates (ANSI constant-folds a literal 0 denominator
  into a plan-time DIVIDE_BY_ZERO even when no row would evaluate
  it), schema inference over file-less sinks, and Spark's
  rollup/cube emitting no grand-total row over empty input where
  standard SQL emits one.
* ``extremes`` — boundary values in every domain the other passes
  leave clean: ±Infinity and NaN doubles in summed/ranked measures
  (acctbal, value, quantity), the 5e-324 denormal, surrogate keys
  just above 2^53 (adjacent pairs that COLLIDE when cast to double —
  adversarial for any id→double projection), INT32 min/max in int
  columns (ANSI overflow on arithmetic), timestamps at far-past
  (1700) / far-future (2260) / a DST-gap instant / single-microsecond
  offsets, and zero-length, zero-norm, and ±Inf/NaN-element embedding
  vectors (ANSI element_at on empty arrays throws; zero norms divide
  by zero).  Deliberately EXCLUDED: finite magnitudes near 1e308 in
  summed columns — naive double summation is order-dependent at that
  magnitude in BOTH engines (1e308 + −1e308 + x depends on
  association), so a parity split there is partition-order noise, not
  signal.  Inf/NaN are order-safe under summation (any order gives
  Inf, or NaN once both infinities or a NaN appear), which is why
  they are the chosen extreme for measures.  Far-past/far-future
  events timestamps stay within ±100 days of the real range so
  hourly-grid densification queries (x10) stay bounded; the
  century-scale extremes ride on orders/lineitem dates, which no
  query densifies.

The clean-testdata parity suite cannot see divergences that need
these inputs; round 6's sweeps found one tie-class split (j42's
oracle missing the empty-text filter) and 31 NULL-class splits, all
since aligned.  Round 7's extremes pass found 68 splits, closed in
round 8 by three repo-wide admission contracts (each mirrored in the
DuckDB oracles, each a no-op on clean data):

* vectors: tables.EMB_ADMIT_SQL — 64-dim, all-finite, non-zero-norm
  embeddings only (ragged rows crash fixed-dim BLAS kernels; zero
  norms divide cosine by zero);
* measures: functions/numeric.py `finite`/`fin_sql` — summed/ranked
  measure columns drop ±Inf/NaN rows at the scan edge, keeping NULLs
  (the exact-DECIMAL sum device has no non-finite representation; the
  engines also DISAGREE on NaN in quantiles);
* renders: money totals are emitted as exact integer cents or exact
  DECIMAL (c3/e4/x44/x54/x69); decimal sums rendered as double go
  through the oracle-side ::VARCHAR::DOUBLE hop — DuckDB's direct
  DECIMAL::DOUBLE divides int_rep/10^scale in float and lands on the
  WRONG neighboring double for ~25% of values once int_rep > 2^53
  (measured round 9; Spark's BigDecimal.doubleValue is correctly
  rounded, strtod of the decimal's exact digits matches it at every
  magnitude).

Keys whose DOCUMENTED contract is to raise on out-of-domain input
(x55/i17: a single-long day bitmap cannot hold ±100-day offsets) are
listed in _EXPECTED_CONTRACT; a Spark error containing the key's
registered message is reported as CONTRACT, not a split — widening
x55 silently would trade a loud failure for silent divergence.

Run after any change to query/oracle pairs:

    python tools/adversarial_parity.py            # all passes, fixed draw
    python tools/adversarial_parity.py nulls      # one pass
    python tools/adversarial_parity.py --seed 9   # seed-randomized draws
                                                  # (new dataset dirs _s9)

Exit code 0 = every oracled key matches (or honors its documented
contract) on every dataset.
"""

from __future__ import annotations

import json
import os
import random
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)

SRC = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

def _ties(rng: "random.Random | None") -> dict[str, str]:
    """Duplicate-row mutation SQL; `rng` draws WHICH slice duplicates.

    The round-8 luck-dependent-exposure audit found 13 keys that
    passed extremes only because one fixed ``% 3 = 0`` draw missed
    their join keys / slice boundaries — found by hand, not by the
    tool.  Seeding the draw (modulus AND residue per table) makes
    that audit structural: two different seeds CLEAN is the round-9
    done criterion.  ``rng=None`` reproduces the legacy fixed draw
    bit-for-bit, so the CI regression pins stay stable."""

    def mr(dm: int, dr: int) -> tuple[int, int]:
        if rng is None:
            return dm, dr
        m = rng.choice((2, 3, 4, 5))
        return m, rng.randrange(m)

    cm, cr = mr(3, 0)
    pm, pr = mr(3, 0)
    om, orr = mr(3, 0)
    lm, lr = mr(3, 0)
    em, er = mr(3, 0)
    dm, dr = mr(4, 0)
    vm, vr = mr(5, 0)
    return {
        "customer": f"""SELECT * FROM t UNION ALL
        SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM t WHERE c_custkey % {cm} = {cr}""",
        "part": f"""SELECT * FROM t UNION ALL
        SELECT p_partkey + 1000000, p_name, p_brand, p_type, p_size, p_retailprice
        FROM t WHERE p_partkey % {pm} = {pr}""",
        "orders": f"""SELECT * FROM t UNION ALL
        SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM t WHERE o_orderkey % {om} = {orr}""",
        "lineitem": f"""SELECT * FROM t UNION ALL
        SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber + 100,
               l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM t WHERE (l_orderkey + l_linenumber) % {lm} = {lr}""",
        "events": f"""SELECT * FROM t UNION ALL
        SELECT event_id + 10000000, ts, user_id, event_type, value, props
        FROM t WHERE event_id % {em} = {er}""",
        "documents": f"""SELECT * FROM t UNION ALL
        SELECT doc_id + 1000000, text, lang, source, n_chars
        FROM t WHERE doc_id % {dm} = {dr}
        UNION ALL SELECT 9000001, '', 'en', 'adv', 0
        UNION ALL SELECT 9000002, ' ', 'en', 'adv', 1
        UNION ALL SELECT 9000003, 'a', 'de', 'adv', 1
        UNION ALL SELECT 9000004, 'the the the the the the', 'en', 'adv', 23""",
        "embeddings": f"""SELECT * FROM t UNION ALL
        SELECT vec_id + 1000000, embedding, label FROM t WHERE vec_id % {vm} = {vr}""",
    }


def _nulls(rng: "random.Random | None") -> dict[str, str]:
    """NULL-injection mutation SQL; `rng` draws WHICH residue class of
    each column goes NULL (moduli stay the pairwise-coprime primes so
    the per-column NULL patterns never fully overlap)."""

    def r(p: int) -> int:
        return 0 if rng is None else rng.randrange(p)

    return {
        "customer": f"""SELECT c_custkey, c_name, c_nationkey,
        CASE WHEN c_custkey % 7 = {r(7)} THEN NULL ELSE c_acctbal END AS c_acctbal,
        CASE WHEN c_custkey % 11 = {r(11)} THEN NULL ELSE c_mktsegment END AS c_mktsegment
        FROM t""",
        "supplier": f"""SELECT s_suppkey, s_name, s_nationkey,
        CASE WHEN s_suppkey % 3 = {r(3)} THEN NULL ELSE s_acctbal END AS s_acctbal FROM t""",
        "part": f"""SELECT p_partkey, p_name, p_brand,
        CASE WHEN p_partkey % 13 = {r(13)} THEN NULL ELSE p_type END AS p_type,
        CASE WHEN p_partkey % 17 = {r(17)} THEN NULL ELSE p_size END AS p_size,
        CASE WHEN p_partkey % 19 = {r(19)} THEN NULL ELSE p_retailprice END AS p_retailprice
        FROM t""",
        "orders": f"""SELECT o_orderkey, o_custkey,
        CASE WHEN o_orderkey % 23 = {r(23)} THEN NULL ELSE o_orderstatus END AS o_orderstatus,
        CASE WHEN o_orderkey % 29 = {r(29)} THEN NULL ELSE o_totalprice END AS o_totalprice,
        o_orderdate,
        CASE WHEN o_orderkey % 31 = {r(31)} THEN NULL ELSE o_orderpriority END AS o_orderpriority
        FROM t""",
        "lineitem": f"""SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
        CASE WHEN (l_orderkey + l_linenumber) % 37 = {r(37)} THEN NULL ELSE l_quantity END AS l_quantity,
        CASE WHEN (l_orderkey + l_linenumber) % 41 = {r(41)} THEN NULL ELSE l_extendedprice END AS l_extendedprice,
        CASE WHEN (l_orderkey + l_linenumber) % 43 = {r(43)} THEN NULL ELSE l_discount END AS l_discount,
        l_tax,
        CASE WHEN (l_orderkey + l_linenumber) % 47 = {r(47)} THEN NULL ELSE l_returnflag END AS l_returnflag,
        l_linestatus, l_shipdate FROM t""",
        "events": f"""SELECT event_id, ts, user_id,
        CASE WHEN event_id % 53 = {r(53)} THEN NULL ELSE event_type END AS event_type,
        CASE WHEN event_id % 59 = {r(59)} THEN NULL ELSE value END AS value,
        CASE WHEN event_id % 61 = {r(61)} THEN NULL ELSE props END AS props FROM t""",
        "documents": f"""SELECT doc_id,
        CASE WHEN doc_id % 67 = {r(67)} THEN NULL ELSE text END AS text,
        CASE WHEN doc_id % 71 = {r(71)} THEN NULL ELSE lang END AS lang,
        source, n_chars FROM t""",
        "embeddings": f"""SELECT vec_id, embedding,
        CASE WHEN vec_id % 73 = {r(73)} THEN NULL ELSE label END AS label FROM t""",
    }


_EMPTY = {name: "SELECT * FROM t LIMIT 0" for name in TABLES}

_P53 = 9007199254740993  # 2^53 + 1: adjacent longs collide as double


def _extremes(rng: "random.Random | None") -> dict[str, str]:
    """Boundary-value mutation SQL; `rng` draws WHERE the injected
    rows attach (anchor keys at a random quantile of the existing
    key distribution instead of always min/max — injected rows must
    be REACHABLE through every query's joins and slices, the exact
    luck axis of the round-8 audit) and the ≥1e12 money magnitude.

    New in round 9 (ADVICE): orders rows with ±Inf/NaN o_totalprice —
    previously the one summed money measure the pass never poisoned,
    which is how the silent NaN→0 / Inf→Long.MaxValue cents render
    went unexposed."""

    def q(col: str, default: str = "min") -> str:
        if rng is None:
            return f"(SELECT {default}({col}) FROM t)"
        qq = rng.choice((0.0, 0.25, 0.5, 0.75, 1.0))
        return f"(SELECT quantile_disc({col}, {qq}) FROM t)"

    # > 1e12 exercises the past-double-precision render class; ≤ 5e12
    # keeps cents (x·100) under 2^53 so round() itself stays exact
    big = 1.5e12 if rng is None else rng.uniform(1.1e12, 5e12)
    return {
        "customer": f"""SELECT * FROM t UNION ALL
        SELECT {_P53}, 'Customer#EXT1', {q("c_nationkey")},
               'inf'::DOUBLE, {q("c_mktsegment")}
        UNION ALL SELECT {_P53 + 1}, 'Customer#EXT2',
               {q("c_nationkey")}, '-inf'::DOUBLE,
               {q("c_mktsegment")}
        UNION ALL SELECT 9200001, 'Customer#EXT3',
               {q("c_nationkey", "max")}, 'nan'::DOUBLE,
               {q("c_mktsegment", "max")}
        UNION ALL SELECT 9200002, 'Customer#EXT4',
               {q("c_nationkey", "max")}, 5e-324,
               {q("c_mktsegment", "max")}""",
        "part": f"""SELECT * FROM t UNION ALL
        SELECT 9200001, 'extreme part max', {q("p_brand")},
               {q("p_type")}, 2147483647::INTEGER, 'nan'::DOUBLE
        UNION ALL SELECT 9200002, 'extreme part min',
               {q("p_brand")}, {q("p_type")},
               (-2147483647 - 1)::INTEGER, 'inf'::DOUBLE""",
        "orders": f"""SELECT * FROM t UNION ALL
        SELECT {_P53}, {q("o_custkey")},
               {q("o_orderstatus")}, {big!r},
               TIMESTAMP '1700-01-07 00:00:00',
               {q("o_orderpriority")}
        UNION ALL SELECT {_P53 + 1}, {q("o_custkey")},
               {q("o_orderstatus", "max")}, 5e-324,
               TIMESTAMP '2260-11-20 00:00:00',
               {q("o_orderpriority", "max")}
        UNION ALL SELECT 9200003, {q("o_custkey")},
               {q("o_orderstatus")}, 'inf'::DOUBLE,
               (SELECT max(o_orderdate) FROM t),
               {q("o_orderpriority")}
        UNION ALL SELECT 9200004, {q("o_custkey", "max")},
               {q("o_orderstatus", "max")}, '-inf'::DOUBLE,
               (SELECT min(o_orderdate) FROM t),
               {q("o_orderpriority", "max")}
        UNION ALL SELECT 9200005, {q("o_custkey")},
               {q("o_orderstatus")}, 'nan'::DOUBLE,
               (SELECT max(o_orderdate) FROM t),
               {q("o_orderpriority")}""",
        "lineitem": f"""SELECT * FROM t UNION ALL
        SELECT {_P53}, {q("l_partkey")},
               {q("l_suppkey")}, 1::INTEGER,
               'inf'::DOUBLE, 'inf'::DOUBLE, 0.0, 0.0,
               {q("l_returnflag")},
               {q("l_linestatus")},
               TIMESTAMP '1700-01-07 00:00:00'
        UNION ALL SELECT {_P53}, {q("l_partkey")},
               {q("l_suppkey")}, 2::INTEGER,
               '-inf'::DOUBLE, '-inf'::DOUBLE, 0.0, 0.0,
               {q("l_returnflag")},
               {q("l_linestatus")},
               TIMESTAMP '2260-11-20 00:00:00'
        UNION ALL SELECT {_P53}, {q("l_partkey")},
               {q("l_suppkey")}, 3::INTEGER,
               'nan'::DOUBLE, 'nan'::DOUBLE, 0.0, 0.0,
               {q("l_returnflag", "max")},
               {q("l_linestatus", "max")},
               (SELECT max(l_shipdate) FROM t) + INTERVAL 1 MICROSECOND""",
        "events": f"""SELECT * FROM t UNION ALL
        SELECT 9200001, (SELECT min(ts) FROM t) - INTERVAL 100 DAY, 3,
               'ext', 'inf'::DOUBLE, '{{"k": 1}}'
        UNION ALL SELECT 9200002, (SELECT max(ts) FROM t) + INTERVAL 100 DAY,
               3, 'ext', '-inf'::DOUBLE, '{{"k": 2}}'
        UNION ALL SELECT 9200003, TIMESTAMP '2024-03-31 02:30:00', 7,
               'ext', 'nan'::DOUBLE, '{{"k": 3}}'
        UNION ALL SELECT 9200004, TIMESTAMP '2024-01-15 12:00:00.000001', 7,
               'ext', 5e-324, '{{"k": 4}}'
        UNION ALL SELECT {_P53}, TIMESTAMP '2024-01-15 12:00:00', {_P53},
               'ext', 1.5, NULL""",
        "documents": f"""SELECT * FROM t UNION ALL
        SELECT {_P53}, 'extreme surrogate key document one', 'en', 'ext', 34
        UNION ALL SELECT {_P53 + 1},
               'extreme surrogate key document two', 'en', 'ext', 34""",
        "embeddings": f"""SELECT * FROM t UNION ALL
        SELECT {_P53}, (SELECT embedding FROM t WHERE vec_id = 0), 1::INTEGER
        UNION ALL SELECT {_P53 + 1},
               (SELECT embedding FROM t WHERE vec_id = 1), 2::INTEGER
        UNION ALL SELECT 9200001, []::FLOAT[], 1::INTEGER
        UNION ALL SELECT 9200002,
               [0.0::FLOAT for i in generate_series(1, 64)], 2::INTEGER
        UNION ALL SELECT 9200003,
               ['inf'::FLOAT] || (SELECT embedding[2:64] FROM t WHERE vec_id = 2),
               1::INTEGER
        UNION ALL SELECT 9200004,
               ['nan'::FLOAT] || (SELECT embedding[2:64] FROM t WHERE vec_id = 3),
               2::INTEGER""",
    }


_UNICODE = {
    "documents": """SELECT * FROM t UNION ALL
        SELECT 9100001, 'étoile Über straße 中文 分词 テスト', 'de', 'uni', 30
        UNION ALL SELECT 9100002, '🎉 emoji 🚀 test ẞ ß ſ', 'en', 'uni', 20
        UNION ALL SELECT 9100003, 'مرحبا بالعالم hello שלום', 'ar', 'uni', 24
        UNION ALL SELECT 9100004, 'étoile combining é', 'fr', 'uni', 20
        UNION ALL SELECT 9100005, 'ΣΙΣΥΦΟΣ σίσυφος ΊΩΤΑ', 'el', 'uni', 20""",
    "part": """SELECT * FROM t UNION ALL
        SELECT 9100001, 'émail Größe 中文', 'Bränd#42', 'TŸPE übr', 7, 123.45
        UNION ALL SELECT 9100002, '🎉rocket', 'ब्रांड#1', 'ΤΥΠΟΣ σ', 3, 67.89""",
    "customer": """SELECT * FROM t UNION ALL
        SELECT 9100001, 'Müller#青山', 7, 1234.56, 'BÜILDING'""",
    "events": """SELECT * FROM t UNION ALL
        SELECT 9100001, (SELECT min(ts) FROM t), 3, 'käuf', 1.5,
               '{"k": 7, "ünï": 1}'
        UNION ALL SELECT 9100002, (SELECT max(ts) FROM t), 3, '浏览', 2.5,
               '{"k": 8}'""",
}


def mutations(rng: "random.Random | None" = None) -> dict[str, dict[str, str]]:
    """The five mutation families, with the row-selection and
    magnitude draws taken from `rng` (None = the legacy fixed draw —
    what `MUTATIONS` pins for the CI regression tests).  unicode and
    empty are content-class mutations with no row-selection axis, so
    they do not vary with the seed."""
    return {
        "ties": _ties(rng),
        "nulls": _nulls(rng),
        "unicode": _UNICODE,
        "empty": _EMPTY,
        "extremes": _extremes(rng),
    }


MUTATIONS = mutations(None)

# The COMBO dataset composes four mutations in sequence (each one
# preserves its table's schema, so they chain): duplicate-key ties,
# then boundary extremes, then multibyte text, then NULL injection —
# NULLs go LAST so they also strike the injected tie/extreme/unicode
# rows.  Single-class passes cannot see interactions (a NULLed measure
# ON a 2^53-key row; a tie-duplicated ±Inf; a unicode doc whose lang
# was nulled); this one exists to catch exactly those.
_COMBO_CHAIN = ("ties", "extremes", "unicode", "nulls")

# key → substring of the error its DOCUMENTED contract raises on
# out-of-domain input.  A SPARK_ERR containing it counts as the
# contract holding (reported separately, not a split).
_EXPECTED_CONTRACT = {
    "x55_bitmap_days": "day offset outside [0,63]",
    "i17_stream_bitmap_live": "day offset outside [0,63]",
}


def build(kind: str, dst: str | None = None, seed: int | None = None) -> str:
    """Materialize the mutated dataset; `dst` override lets tests
    build into a private tmp_path instead of the shared /tmp copy.
    `seed` randomizes the row-selection/magnitude draws (None = the
    legacy fixed draw the CI pins reproduce)."""
    import duckdb

    muts = MUTATIONS if seed is None else mutations(random.Random(seed))
    suffix = "" if seed is None else f"_s{seed}"
    dst = dst or f"/tmp/adv_parity_{kind}{suffix}"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    chain = _COMBO_CHAIN if kind == "combo" else (kind,)
    for name in TABLES:
        con.sql(
            f"CREATE OR REPLACE TEMP TABLE t AS "
            f"SELECT * FROM read_parquet('{SRC}/{name}.parquet')"
        )
        for sub in chain:
            q = muts[sub].get(name)
            if q is None:
                continue
            con.sql(f"CREATE OR REPLACE TEMP TABLE t_next AS {q}")
            con.sql("DROP TABLE t")
            con.sql("ALTER TABLE t_next RENAME TO t")
        con.sql(f"COPY (SELECT * FROM t) TO '{dst}/{name}.parquet' (FORMAT PARQUET)")
    return dst


def sweep(spark, sf_dir: str) -> list[tuple[str, str]]:
    import duckdb

    from big_data_fknn_spark.queries import load_all
    from oracle import df_canon

    reg = load_all()
    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    bad: list[tuple[str, str]] = []
    for key in sorted(reg):
        try:
            df = reg[key].fn(spark, sf_dir)
            if reg[key].oracle is None:
                # rows-only key (engine RNG / sketch internals): no
                # value oracle exists, but it must still SURVIVE the
                # mutated inputs — a crash here is the same one-bad-row
                # job-killer class the oracled keys are swept for
                df.count()
                continue
            pdf = df.toPandas()
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            msg = str(ex)
            if _EXPECTED_CONTRACT.get(key, "\0") in msg:
                print(f"  {key}: CONTRACT (documented raise)", flush=True)
                continue
            bad.append((key, f"SPARK_ERR {msg[:150]}"))
            continue
        try:
            opdf = con.sql(reg[key].oracle).df()
        except Exception as ex:  # noqa: BLE001
            bad.append((key, f"ORACLE_ERR {str(ex)[:150]}"))
            continue
        scols, srows = df_canon(pdf)
        ocols, orows = df_canon(opdf)
        if scols != ocols or srows != orows:
            bad.append((key, f"MISMATCH {len(srows)}/{len(orows)}"))
    return bad


def main() -> None:
    from big_data_fknn_spark.session import get_spark

    args = sys.argv[1:]
    seed: int | None = None
    if "--seed" in args:
        i = args.index("--seed")
        seed = int(args[i + 1])
        del args[i : i + 2]
    kinds = args or [*MUTATIONS, "combo"]
    spark = get_spark(app_name="adversarial_parity")
    tag = "" if seed is None else f" [seed={seed}]"
    failed = {}
    try:
        for kind in kinds:
            sf_dir = build(kind, seed=seed)
            bad = sweep(spark, sf_dir)
            print(
                f"{kind}{tag}: {'CLEAN' if not bad else json.dumps(bad)}",
                flush=True,
            )
            if bad:
                failed[kind] = bad
    finally:
        # an aborted streaming key (e.g. a contract raise mid-batch)
        # leaves a live StreamingQuery with non-daemon threads that
        # hang interpreter exit — stop them so the exit code is usable
        for q in spark.streams.active:
            try:
                q.stop()
            except Exception:  # noqa: BLE001 — best-effort teardown
                pass
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
