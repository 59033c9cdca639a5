"""Connected components over an edge DataFrame.

The dedup pipeline's cluster-formation step (queries/llm.py
j8f_dedup_clusters) needs transitive closure over near-dup pairs.
The reference has no graph surface at all (SURVEY.md §2 — pure
batch classifier), so this is driver-mandated extension territory;
the algorithm is Pregel-style min-label propagation expressed as
plain DataFrame joins, the same scheme GraphX/GraphFrames use.

Scale contract: each round is one shuffle keyed on the node id plus
an O(|V|) convergence aggregate; rounds needed = max component
diameter.  Near-dup clusters are shallow (a handful of variants of
one document, not a social graph), so this converges in single-digit
rounds at any corpus size.  ``localCheckpoint`` truncates lineage so
the iterated plan never deepens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 16,
) -> DataFrame:
    """Label every node reachable through ``edges`` with the minimum
    node id of its component.

    ``edges`` is treated as DIRECTED input and symmetrized here, so
    callers may pass each undirected pair once.  Returns
    ``(node, component)``; isolated nodes (absent from ``edges``)
    don't appear — union them in as singletons if needed.
    """
    sym = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).unionByName(
        edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    )
    sym = sym.localCheckpoint()

    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lab", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        msgs = sym.join(labels.withColumnRenamed("node", "src"), "src").select(
            F.col("dst").alias("node"), "lab"
        )
        # One materialization per round: the min-label agg JOINED back
        # to the previous labels, so the convergence count below reads
        # checkpointed rows instead of re-running a second join job.
        # (msgs only mention nodes already labeled → inner join is
        # cardinality-preserving.)
        merged = (
            labels.withColumnRenamed("lab", "old")
            .join(
                labels.unionByName(msgs)
                .groupBy("node")
                .agg(F.min("lab").alias("lab")),
                "node",
            )
            .localCheckpoint()
        )
        changed = merged.where(F.col("lab") != F.col("old")).count()
        labels = merged.select("node", "lab")
        if changed == 0:
            break

    return labels.select("node", F.col("lab").alias("component"))
