"""SURVEY.md §2.K — the Python UDF/UDAF/UDTF surface.

The reference's "UDFs" are plain Scala closures inside its RDD maps;
on Spark the equivalents are declared functions the engine can
schedule and (for pandas variants) Arrow-vectorize.  Everything else
in this repo avoids Python in the hot path (SURVEY.md §7.7) — these
four queries exist to demonstrate the surface itself, each shape
noted with its cost model.
"""

from __future__ import annotations

from uuid import uuid4

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_fknn_spark.functions.numeric import fin_sql
from big_data_fknn_spark.queries import register
from big_data_fknn_spark.tables import EMB_ADMIT_SQL, embeddings_d, t


@register(
    "k1_py_udf",
    oracle="""
SELECT c_custkey,
       CASE WHEN NOT isnan(c_acctbal)
             AND abs(c_acctbal) < cast('Infinity' AS DOUBLE)
            THEN 'b' || (floor(c_acctbal / 1000.0)::INT)::VARCHAR
       END AS bal_band
FROM customer
""",
)
def k1_py_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — the SLOW path: one Python round
    trip per row, no codegen, opaque to Catalyst (blocks pushdown
    through it).  Exists to demo the API; h6's CASE WHEN is the
    right way to write this."""
    import math

    @F.udf("string")
    def bal_band(bal: float) -> str | None:
        # NULL-in-NULL-out, like the expression it demos — a Python
        # UDF sees None, not a propagated SQL NULL, so the guard is
        # the author's job.  Non-finite → NULL (no band exists;
        # math.floor(±inf/NaN) raises — one bad row must not kill the
        # job), mirrored by the oracle's CASE
        if bal is None or not math.isfinite(bal):
            return None
        return f"b{math.floor(bal / 1000.0)}"

    c = t(spark, sf_dir, "customer")
    return c.select("c_custkey", bal_band("c_acctbal").alias("bal_band"))


@register(
    "k2_pandas_udf",
    oracle=f"""
SELECT vec_id,
       round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS l2
FROM embeddings WHERE {EMB_ADMIT_SQL}
""",
)
def k2_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized (Arrow) pandas UDF: the whole partition arrives as
    numpy-backed batches — 10-100× the row-at-a-time UDF, the right
    escape hatch when an expression genuinely can't be built from
    pyspark.sql.functions.  (This one can — functions/distance.py
    l2_norm — which is what the engine uses elsewhere.)"""
    import numpy as np

    @F.pandas_udf("double")
    def l2(vecs: pd.Series) -> pd.Series:
        return vecs.map(lambda v: float(np.sqrt(np.dot(v, v))))

    e = embeddings_d(spark, sf_dir)
    return e.select("vec_id", F.round(l2("emb"), 6).alias("l2"))


@register(
    "k3_udaf",
    oracle=f"""
WITH e AS (SELECT label, sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n
           FROM embeddings WHERE {EMB_ADMIT_SQL})
SELECT label, round(avg(n), 6) AS mean_norm, count(*) AS n_vecs
FROM e GROUP BY label
""",
)
def k3_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (UDAF): each group's column
    arrives as one pandas Series.  NOTE the scale trap: a grouped-agg
    UDF materializes the whole group in one worker — fine for 10
    labels, wrong for high-cardinality keys (use applyInPandas with
    pre-aggregation, or a built-in)."""
    import numpy as np

    @F.pandas_udf("double")
    def mean_norm(norms: pd.Series) -> float:
        return float(np.mean(norms))

    # grouped-agg pandas UDFs can't share an agg with non-pandas
    # aggregates ([INVALID_PANDAS_UDF_PLACEMENT]) — count is one too
    @F.pandas_udf("long")
    def n_rows(norms: pd.Series) -> int:
        return len(norms)

    e = embeddings_d(spark, sf_dir)
    norms = e.select(
        "label",
        F.sqrt(
            F.aggregate(
                F.transform("emb", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
            )
        ).alias("n"),
    )
    return norms.groupBy("label").agg(
        F.round(mean_norm("n"), 6).alias("mean_norm"),
        n_rows("n").alias("n_vecs"),
    )


@register(
    "k4_udtf",
    oracle="""
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS pos FROM docs)
SELECT doc_id, pos, w[pos] || ' ' || w[pos + 1] AS bigram FROM idx
""",
)
def k4_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): one input row → many output rows, used
    LATERAL in SQL — here a word-bigram emitter over documents.
    Deterministic string splitting, so unlike most UDTF demos this
    one carries a full value oracle."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, bigram string")
    class BigramEmitter:
        def eval(self, doc_id: int, text: str):
            if text is None:  # no tokens → no rows (oracle: unnest(NULL))
                return
            w = text.split(" ")
            for i in range(len(w) - 1):
                yield doc_id, i + 1, f"{w[i]} {w[i + 1]}"

    # UDTF name stays FIXED: spark.udtf.register replaces the entry
    # and every caller registers the IDENTICAL class, so a concurrent
    # re-registration is a no-op by value (function registries have
    # no uuid-and-drop idiom).  The view is uuid'd + dropped after
    # the eager spark.sql analysis (x22's pattern) so concurrent
    # callers over different sf_dirs cannot swap each other's source.
    fn = "k4_bigrams_udtf"
    view = f"k4_docs_{uuid4().hex}"
    spark.udtf.register(fn, BigramEmitter)
    t(spark, sf_dir, "documents").createOrReplaceTempView(view)
    out = spark.sql(
        f"SELECT b.doc_id, b.pos, b.bigram FROM {view} d, LATERAL {fn}(d.doc_id, d.text) b"
    )
    spark.catalog.dropTempView(view)
    return out


@register(
    "k5_cogroup",
    oracle=f"""
WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_cust,
                  round(sum(CAST(c_acctbal AS DECIMAL(38,10))), 6)::VARCHAR::DOUBLE AS cust_bal
           FROM customer WHERE {fin_sql("c_acctbal")} GROUP BY 1),
s AS (SELECT s_nationkey AS nationkey, count(*) AS n_supp,
             round(sum(CAST(s_acctbal AS DECIMAL(38,10))), 6)::VARCHAR::DOUBLE AS supp_bal
      FROM supplier WHERE {fin_sql("s_acctbal")} GROUP BY 1)
SELECT coalesce(c.nationkey, s.nationkey)::BIGINT AS nationkey,
       coalesce(n_cust, 0) AS n_cust,
       coalesce(cust_bal, 0.0) AS cust_bal,
       coalesce(n_supp, 0) AS n_supp,
       coalesce(supp_bal, 0.0) AS supp_bal
FROM c FULL JOIN s ON c.nationkey = s.nationkey
""",
)
def k5_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped pandas UDF: both tables shuffle on the key, each
    key's two groups arrive as two pandas frames in ONE Python call —
    the escape hatch for custom merge logic no join expresses (as-of
    matching, per-key reconciliation).  This kernel does a full-outer
    aggregate merge so it carries a value oracle; sums accumulate in
    Decimal (exact, order-independent — functions/numeric.py
    rationale applies inside Python too).  Scale: one co-partitioned
    shuffle per side, then embarrassingly parallel per key; group
    pairs must fit one worker's memory.  Non-finite balances gate at
    the scan (round(Decimal('Inf')) raises in the kernel)."""
    from decimal import Decimal

    from big_data_fknn_spark.functions.numeric import finite

    cust = (
        t(spark, sf_dir, "customer")
        .where(finite("c_acctbal"))
        .select(F.col("c_nationkey").cast("bigint").alias("nationkey"), "c_acctbal")
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .where(finite("s_acctbal"))
        .select(F.col("s_nationkey").cast("bigint").alias("nationkey"), "s_acctbal")
    )

    def merge(key: tuple, c: pd.DataFrame, s: pd.DataFrame) -> pd.DataFrame:
        def dec_sum(vals) -> float:
            # skip NULLs like SQL SUM does — a NaN term would poison
            # the Decimal total while the oracle's sum() ignores it
            total = sum(
                (Decimal(repr(float(v))) for v in vals.dropna()), Decimal(0)
            )
            return float(round(total, 6))

        return pd.DataFrame(
            {
                "nationkey": [int(key[0])],
                "n_cust": [len(c)],
                "cust_bal": [dec_sum(c["c_acctbal"]) if len(c) else 0.0],
                "n_supp": [len(s)],
                "supp_bal": [dec_sum(s["s_acctbal"]) if len(s) else 0.0],
            }
        )

    return (
        cust.groupBy("nationkey")
        .cogroup(supp.groupBy("nationkey"))
        .applyInPandas(
            merge,
            "nationkey bigint, n_cust bigint, cust_bal double, "
            "n_supp bigint, supp_bal double",
        )
    )


@register(
    "k6_map_in_arrow",
    oracle="""
SELECT doc_id,
       length(text) AS n_chars,
       len(string_split(text, ' ')) AS n_tokens
FROM documents
""",
)
def k6_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: partitions stream through Python as raw Arrow
    RecordBatches — no pandas conversion at all, the cheapest Python
    hop Spark offers.  The kernel runs vectorized pyarrow.compute
    string ops (token counting here; the same shape the multimodal
    decode path j12b uses for binary payloads).  ASCII corpus, so
    utf8_length == DuckDB length(); tokens = space-count + 1 (docs
    have no leading/trailing/double spaces — same convention as
    j15)."""

    def count_batches(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            text = b.column(b.schema.get_field_index("text"))
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index("doc_id")),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(
                        pc.add(pc.count_substring(text, " "), 1), pa.int64()
                    ),
                ],
                ["doc_id", "n_chars", "n_tokens"],
            )

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(
        count_batches, "doc_id bigint, n_chars bigint, n_tokens bigint"
    )
