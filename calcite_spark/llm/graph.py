"""Distributed connected components — dedup-cluster resolution.

An LLM-training-data op beyond the reference's surface: the near-dup
PAIR generators (llm/dedup.py MinHash/SimHash/cosine banding) emit an
edge list, but a pipeline needs duplicate GROUPS — "keep one document
per group" — and a group is exactly a connected component of the pair
graph. This module resolves components at Spark scale; the reference
has no distributed-graph tier at all (its dedup story stops at pairs).

Algorithm: iterative min-label propagation. Every vertex starts
labelled with its own id; each round it takes the min of its own label
and its neighbours' labels; at the fixpoint every vertex carries the
MINIMUM id of its component (so the label doubles as a canonical
representative id — `doc_id = cluster_id` selects one keeper per
group).

Scale shape (the 100 TB story):
  * per round: ONE shuffle join (edges ⋈ labels on the neighbour key)
    + ONE map-side-combinable groupBy-min — both hash-partitioned on
    the join key, AQE handles skewed hub vertices;
  * rounds = graph DIAMETER. Near-dup graphs have tiny components
    (transitive near-duplicates of one document), diameter ≲ 5, so
    min-propagation beats the O(log n) large-star/small-star scheme
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) which pays ~2 shuffles per round; that scheme is the
    documented upgrade path for adversarial long-chain graphs;
  * lineage is truncated per round with localCheckpoint (the same
    driver-loop pattern as ir.RepeatUnion / WITH RECURSIVE), so plans
    stay O(1) instead of O(rounds);
  * convergence detection is one 1-row scalar aggregate per round
    (labels are monotonically non-increasing, so an unchanged SUM is a
    fixpoint proof) — a bounded control-surface collect, not a data
    collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Undirected connected components of an edge list.

    Returns DataFrame(id, comp) where `comp` is the minimum vertex id
    of the component. Only vertices that appear in `edges` are emitted
    (isolated documents have no dup pair — left-join them back if a
    total labelling is needed). `max_iter` bounds runaway graphs; the
    loop exits early at the fixpoint (diameter rounds).
    """
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    rev = edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    sym = fwd.union(rev).where("u IS NOT NULL AND v IS NOT NULL")

    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    prev_sum = None
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels.select(F.col("id").alias("v"), "comp"), "v")
            .groupBy("u")
            .agg(F.min("comp").alias("nbr_comp"))
            .withColumnRenamed("u", "id")
        )
        labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("comp")).collect()[0][0]  # 1-row probe
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def dedup_clusters(
    pairs: DataFrame, id_a: str = "a", id_b: str = "b"
) -> DataFrame:
    """Near-dup pair list → (doc_id, cluster_id). cluster_id is the
    component's minimum doc_id, so it is stable under partitioning and
    directly usable as the canonical keeper id."""
    cc = connected_components(pairs, id_a, id_b)
    return cc.select(
        F.col("id").alias("doc_id"), F.col("comp").alias("cluster_id")
    )


def canonical_ids(clusters: DataFrame) -> DataFrame:
    """One keeper per duplicate group: the row whose doc_id IS the
    cluster minimum (no extra shuffle — a narrow filter)."""
    return clusters.where("doc_id = cluster_id")
