"""Near-dup cluster resolution: verified pairs → connected components.

The dedup pipeline (exact → MinHash → LSH → Jaccard verify) ends with
*pairs* of near-duplicate documents; a training-data pipeline must then
resolve pairs into clusters and keep ONE document per cluster — the
reference's first-writer-wins SADD semantics (reference cache.py:91-97)
applied at the near-dup level instead of exact URLs.

:func:`dedup_clusters` computes connected components by iterative
min-label propagation, entirely with DataFrame ops:

- each node starts labeled with its own id;
- each iteration every node takes ``min(own label, neighbors' labels)``
  (one shuffle join + one aggregation);
- fixpoint when no label changed — the label is then the component's
  minimum id, a deterministic cluster id on any engine.

Scale notes (the 100-TB design point): near-dup graphs are dense
*within* a cluster (LSH candidates are near-cliques) and tiny *across*
— so the iteration count is the component diameter, typically 2-4, not
O(log n) worst-case chains. Each iteration is one partial-aggregated
shuffle on the node id; edge and label tables stay partitioned by the
same key across iterations. ``localCheckpoint`` truncates the lineage
each round so the plan does not grow with the iteration count. For
adversarial long-chain graphs, swap the step for the large-star /
small-star rule (same join shape, O(log n) rounds) — the driver loop
below is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _propagate(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One min-label step: each node takes min(own, neighbors')."""
    nbr_min = (
        edges.join(
            labels.select(
                F.col("doc_id").alias("src"),
                F.col("cluster_id").alias("src_label"),
            ),
            "src",
        )
        .groupBy("dst")
        .agg(F.min("src_label").alias("nbr_label"))
    )
    return labels.join(
        nbr_min.select(F.col("dst").alias("doc_id"), "nbr_label"),
        "doc_id",
        "left",
    ).select(
        "doc_id",
        *[c for c in labels.columns if c not in ("doc_id", "cluster_id")],
        F.least(
            F.col("cluster_id"), F.coalesce("nbr_label", "cluster_id")
        ).alias("cluster_id"),
    )


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 50,
    steps_per_action: int = 2,
) -> DataFrame:
    """(doc_id, cluster_id) for every doc appearing in ``pairs``, with
    ``cluster_id`` = the minimum doc id reachable through the pair graph
    (min-label propagation to fixpoint). Deterministic: the result is a
    pure function of the pair set.

    Job economy: ``steps_per_action`` propagation steps are chained into
    ONE plan between driver actions, so a diameter-d graph converges in
    ~d/steps jobs instead of d (labels only ever decrease, so "pair
    unchanged" ⇒ every step inside the pair was unchanged — the batched
    convergence check is exact). Raises if the fixpoint is not reached
    within ``max_iters × steps_per_action`` steps — a silently
    part-propagated labeling would let keep_per_cluster retain
    duplicates undetected."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    changed = None
    for _ in range(max_iters):
        stepped = labels.withColumn("_old", F.col("cluster_id"))
        for _ in range(steps_per_action):
            stepped = _propagate(edges, stepped)
        stepped = stepped.localCheckpoint(eager=True)  # truncate lineage
        changed = stepped.where(F.col("cluster_id") < F.col("_old")).count()
        labels = stepped.select("doc_id", "cluster_id")
        if changed == 0:
            break
    edges.unpersist()
    if changed:
        raise RuntimeError(
            f"dedup_clusters did not converge within "
            f"{max_iters * steps_per_action} propagation steps "
            f"({changed} labels still moving) — raise max_iters, or use "
            "large-star/small-star for adversarial long-chain graphs"
        )
    return labels


def keep_per_cluster(
    docs: DataFrame, clusters: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """One row per final cluster: (cluster_id, keep_doc_id,
    cluster_size). Docs absent from ``clusters`` (never paired) form
    singleton clusters of themselves — nothing is silently dropped."""
    labeled = docs.select(id_col).join(clusters, id_col, "left").withColumn(
        "cluster_id", F.coalesce("cluster_id", F.col(id_col))
    )
    return labeled.groupBy("cluster_id").agg(
        F.min(id_col).alias("keep_doc_id"),
        F.count(F.lit(1)).alias("cluster_size"),
    )
