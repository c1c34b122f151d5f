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
same key across iterations. Each round's label table is snapshotted to
a temp parquet dir (the superseded round's dir is deleted immediately),
which truncates the lineage like ``localCheckpoint`` without pinning
executor storage blocks — ``localCheckpoint`` persists its RDDs and the
ContextCleaner releases them only after Python GC, which left blocks
pinned (and the ``no_persist_leak`` test fixture tripping) for the rest
of a long-lived session. For
adversarial long-chain graphs, ``algorithm="star"`` switches to the
alternating large-star / small-star rule (:func:`_star_components`,
O(log n) rounds) — same output, pinned equal in tests.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, functions as F

_LIVE_DIRS: set[str] = set()


def _cleanup_live_dirs() -> None:
    for d in list(_LIVE_DIRS):
        shutil.rmtree(d, ignore_errors=True)


atexit.register(_cleanup_live_dirs)


def _materialize(df: DataFrame, prev_dir: str | None = None):
    """Eagerly write ``df`` to a temp parquet dir and read it back.

    Truncates lineage exactly like ``localCheckpoint(eager=True)`` but
    holds NO executor-pinned blocks afterwards: ``localCheckpoint``
    persists its RDDs and only the ContextCleaner releases them (after
    the Python object is GC'd, asynchronously), which left every
    iteration's label table pinned in storage for the rest of the
    session. ``prev_dir`` (the superseded iteration's dir) is deleted
    once the new snapshot is fully written — the new DataFrame reads
    only its own files, so nothing still references it."""
    out = tempfile.mkdtemp(prefix="sc_dedup_ck_")
    _LIVE_DIRS.add(out)
    df.write.mode("overwrite").parquet(out)
    if prev_dir is not None:
        shutil.rmtree(prev_dir, ignore_errors=True)
        _LIVE_DIRS.discard(prev_dir)
    return df.sparkSession.read.parquet(out), out


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


def _star_components(edges: DataFrame, max_iters: int) -> DataFrame:
    """Connected components by alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014 — public literature): O(log n) rounds on ANY graph,
    including the adversarial long chains that make plain min-label
    propagation take O(diameter) rounds.

    ``edges`` is the bidirectional (src, dst) edge set. Each round:

    - large-star: every node u connects its LARGER neighbors to
      m(u) = min(N(u) ∪ {u});
    - small-star: every node u connects its smaller-or-equal neighbors
      and itself to m(u).

    The edge set converges to stars whose centers are the component
    minima; fixpoint when a round leaves the canonical edge set
    unchanged (checked with one count — labels only ever decrease)."""
    cur, cur_dir = _materialize(edges)
    for _ in range(max_iters):
        # m(u) over the bidirectional edge list
        m = cur.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        with_m = cur.join(m, "src")
        # large-star: (v, m(u)) for v > u  — keep undirected, dedup'd
        ls = (
            with_m.where(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("a"), F.col("m").alias("b"))
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        ls_bidir = ls.select(
            F.col("a").alias("src"), F.col("b").alias("dst")
        ).unionByName(ls.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        m2 = ls_bidir.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        with_m2 = ls_bidir.join(m2, "src")
        # small-star: (v, m(u)) for v <= u, plus (u, m(u))
        ss = (
            with_m2.where(F.col("dst") <= F.col("src"))
            .select(F.col("dst").alias("a"), F.col("m").alias("b"))
            .unionByName(
                with_m2.select(F.col("src").alias("a"), F.col("m").alias("b"))
            )
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        stepped, stepped_dir = _materialize(
            ss.select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .unionByName(
                ss.select(F.col("b").alias("src"), F.col("a").alias("dst"))
            )
            .distinct()
        )
        # convergence: the per-node neighborhood minimum stopped moving
        prev_m = cur.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("pm")
        )
        new_m = stepped.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("nm")
        )
        changed = (
            new_m.join(prev_m, "src", "left")
            .where(
                F.col("pm").isNull() | (F.col("nm") != F.col("pm"))
            )
            .count()
        )
        # the convergence count above was the last reader of the
        # superseded snapshot — safe to drop its files now
        shutil.rmtree(cur_dir, ignore_errors=True)
        _LIVE_DIRS.discard(cur_dir)
        cur, cur_dir = stepped, stepped_dir
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"star components did not converge in {max_iters} rounds — "
            "O(log n) bound exceeded, graph construction is suspect"
        )
    # stars: every non-center node has exactly the center as a smaller
    # neighbor; centers label themselves
    labels = cur.groupBy("src").agg(F.min("dst").alias("nbr_min")).select(
        F.col("src").alias("doc_id"),
        F.least("src", "nbr_min").alias("cluster_id"),
    )
    return labels


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 50,
    steps_per_action: int = 2,
    algorithm: str = "label",
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
    duplicates undetected.

    ``algorithm``: "label" (default) is min-label propagation —
    O(diameter) rounds, one cheap shuffle each, the right choice for
    near-dup graphs (LSH components are near-cliques, diameter 2-4).
    "star" is alternating large-star/small-star (:func:`_star_components`)
    — O(log n) rounds of heavier steps, the choice for adversarial
    long-chain graphs where label propagation would exhaust its step
    budget. Identical results (pinned in tests against a union-find
    oracle and each other)."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        .persist()
    )
    if algorithm == "star":
        out = _star_components(edges, max_iters)
        edges.unpersist()
        return out
    if algorithm != "label":
        raise ValueError(f"unknown algorithm {algorithm!r}")
    labels, labels_dir = _materialize(
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
    )
    changed = None
    for _ in range(max_iters):
        stepped = labels.withColumn("_old", F.col("cluster_id"))
        for _ in range(steps_per_action):
            stepped = _propagate(edges, stepped)
        # truncate lineage; the superseded snapshot's files are dropped
        # as soon as the new one is fully written
        stepped, labels_dir = _materialize(stepped, labels_dir)
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
