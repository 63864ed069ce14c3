"""Distributed connected components via iterative min-label propagation
— the graph kernel behind duplicate clustering (text LSH pairs and
embedding near-dup pairs share it).

Each round: label(v) = min(label(v), min over neighbors' labels);
converges in O(log diameter) rounds — the "alternating algorithm" shape
used by large-scale CC systems. Every round joins on the node id and
hash-aggregates a min, so the shuffle structure is (edges ⋈ labels) on
node id — linear in |E| per round, no global structures.

localCheckpoint (not just persist) after every round: an iterative plan
that references its previous round TWICE doubles in size per iteration —
lineage must be CUT, not merely cached, or analysis alone goes
exponential (SURVEY §4.2). Checkpoint blocks pin executor memory for the
session, so every intermediate is released before returning; only the
final labels frame stays checkpointed (callers consume it lazily).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def min_label_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 12,
) -> DataFrame:
    """Connected components over an undirected pair list.

    Returns (node_id, cluster_id) for every node appearing in ≥1 pair;
    cluster_id is the component's minimum node id (the canonical
    representative — 'keep one per cluster' keeps cluster_id itself).
    ``max_rounds`` bounds the label-propagation rounds; duplicate
    clusters have tiny diameter, and min-label halves the frontier per
    round, so 12 covers any component this pipeline can produce.
    """
    retained: list[DataFrame] = []
    p = pairs.localCheckpoint()
    retained.append(p)
    edges = (
        p.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionAll(p.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .localCheckpoint()
    )
    retained.append(edges)
    labels_cp = (
        edges.select(F.col("src").alias("node_id"))
        .distinct()
        .withColumn("label", F.col("node_id"))
        .localCheckpoint()
    )
    labels = labels_cp
    for _ in range(max_rounds):
        neigh = (
            edges.join(labels, edges.src == labels.node_id)
            .groupBy(F.col("dst").alias("node_id"))
            .agg(F.min("label").alias("nl"))
        )
        new_cp = (
            labels.join(neigh, "node_id", "left")
            .select(
                "node_id",
                F.least(F.col("label"), F.coalesce("nl", "label")).alias("label"),
                (F.coalesce("nl", "label") < F.col("label")).alias("_chg"),
            )
            .localCheckpoint()  # eager: one job materializes round + flag
        )
        changed = new_cp.filter("_chg").limit(1).count()  # scan of cached rows
        retained.append(labels_cp)
        labels_cp = new_cp
        labels = new_cp.drop("_chg")
        if changed == 0:
            break
    for df in retained:
        df.unpersist()
    return labels.select("node_id", F.col("label").alias("cluster_id"))
