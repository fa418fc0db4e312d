"""Graph operators for dedup-cluster resolution.

Near-dup detection yields PAIRS; the curation decision needs CLUSTERS
(keep one doc per connected component of the similarity graph).  This is
the step between "minhash found 2M duplicate pairs" and "drop 1.3M docs".

:func:`connected_components` is iterative min-label propagation — the
Pregel pattern expressed as bounded DataFrame iterations:

* each iteration is one join (labels onto edges) + one aggregation
  (min label per node): all-distributed, shuffles only on node ids;
* iteration count is bounded by the graph DIAMETER, not its size — dup
  clusters are short chains/cliques, so a handful of rounds converge;
* every iteration persists its labels and unpersists the previous ones,
  and the loop checkpoints lineage by localCheckpoint every few rounds —
  without this the plan tree doubles per iteration and the optimizer
  chokes long before the data does (the classic iterative-Spark trap);
* convergence is detected with a count of changed labels — an aggregate
  action per round, nothing collected beyond one long.

At 100 TB scale the same loop runs unchanged; for billion-edge graphs
swap in GraphFrames/large-star-small-star if diameter grows beyond ~20.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "dup_clusters"]


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    id_col: str = "id",
    max_iter: int = 20,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Label every node with min(node id) of its connected component.

    ``edges`` is an undirected pair list; ``nodes`` the full node frame
    (isolated nodes keep their own id as label).  Returns
    ``(id_col, cluster_id)``.
    """
    sym = edges.selectExpr(f"{src} AS u", f"{dst} AS v").unionAll(
        edges.selectExpr(f"{dst} AS u", f"{src} AS v")
    )
    sym = sym.persist()
    labels = nodes.select(F.col(id_col).alias("u"), F.col(id_col).alias("lab"))
    labels = labels.persist()
    labels.count()  # materialize before the loop

    for it in range(max_iter):
        # neighbor minimum: for each node, the smallest label among its
        # neighbors; then fold with the node's own label
        nbr = (
            sym.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("lab").alias("nbr_lab"))
        )
        new_labels = (
            labels.join(nbr, "u", "left")
            .select("u", F.least("lab", F.coalesce("nbr_lab", "lab")).alias("lab"))
        )
        if (it + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=False)
        new_labels = new_labels.persist()
        changed = (
            new_labels.join(labels.withColumnRenamed("lab", "old"), "u")
            .where(F.col("lab") != F.col("old"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break

    sym.unpersist()
    return labels.select(F.col("u").alias(id_col), F.col("lab").alias("cluster_id"))


def dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Resolve near-dup pairs into clusters: every document labeled with
    the min doc id of its duplicate component (singletons label
    themselves).  Downstream keep-rule: ``where(doc_id == cluster_id)``.
    """
    nodes = docs.select(F.col(id_col).alias("id")).distinct()
    cc = connected_components(
        pairs, nodes, src=src, dst=dst, id_col="id", max_iter=max_iter
    )
    return cc.withColumnRenamed("id", id_col)
