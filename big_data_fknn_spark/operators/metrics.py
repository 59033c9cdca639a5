"""Distributed evaluation metrics.

The reference's CLI mains report accuracy AND AUC (reconstructed
[R runFuzzyKNN.scala], via Spark's BinaryClassificationMetrics);
accuracy is a one-line aggregate, AUC is the tie-aware Mann-Whitney
statistic computed here — per class one-vs-rest plus a macro
average, entirely as window + aggregate plans (no driver collect,
no threshold sweep: under tied scores the ROC integral reduces to

    AUC_c = (Σ avg_rank(positives) − P(P+1)/2) / (P·N)

which is exactly what the threshold sweep integrates to).

Scale: one window per class over the score key, then a three-number
aggregate per class.  With integer scores (vote counts) every rank
is exact and both engines produce identical bits — the property
queries/aggregates.py d17_auc's oracle check rides on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ovr_auc(
    dense: DataFrame,
    label_col: str = "label",
    cls_col: str = "cls",
    score_col: str = "score",
    macro_cls: int = -1,
) -> DataFrame:
    """One-vs-rest tie-aware AUC from a DENSE score table.

    ``dense`` must hold one row per (example, class) with the
    example's true ``label`` and its ``score`` for that class —
    build it by left-joining sparse scores against the class dim and
    coalescing to 0 (see d17_auc).  Returns (cls, auc) per class
    plus a (``macro_cls``, macro-average) row.
    """
    w_rank = Window.partitionBy(cls_col).orderBy(score_col)
    w_tie = Window.partitionBy(cls_col, score_col)
    ranked = dense.select(
        cls_col,
        (F.col(label_col) == F.col(cls_col)).alias("pos"),
        (
            F.rank().over(w_rank)
            + (F.count(F.lit(1)).over(w_tie) - 1) / 2.0
        ).alias("avg_rank"),
    )
    stats = ranked.groupBy(cls_col).agg(
        F.sum(F.when(F.col("pos"), F.col("avg_rank")).otherwise(0.0)).alias("s_pos"),
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast("bigint").alias("n_pos"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1)).cast("bigint").alias("n_neg"),
    )
    per = stats.select(
        F.col(cls_col).cast("int").alias("cls"),
        F.round(
            (F.col("s_pos") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0)
            / (F.col("n_pos") * F.col("n_neg")),
            6,
        ).alias("auc"),
    )
    from big_data_fknn_spark.functions.numeric import DEC

    macro = per.agg(
        F.round(
            F.sum(F.col("auc").cast(DEC)).cast("double") / F.count(F.lit(1)), 6
        ).alias("auc")
    ).select(F.lit(macro_cls).cast("int").alias("cls"), "auc")
    return per.unionByName(macro)


def dense_vote_scores(votes: DataFrame, classes: DataFrame) -> DataFrame:
    """Expand sparse per-class vote counts (q, label, cls, cnt) to the
    dense (q, label, cls, score) table ``ovr_auc`` needs — missing
    (example, class) pairs score 0.  ``classes`` is the tiny class
    dim (one column ``cls``), broadcast onto the expansion."""
    tq = votes.select("q", "label").distinct()
    return (
        tq.crossJoin(F.broadcast(classes))
        .join(votes.select("q", "cls", "cnt"), ["q", "cls"], "left")
        .select("q", "label", "cls", F.coalesce("cnt", F.lit(0)).alias("score"))
    )
