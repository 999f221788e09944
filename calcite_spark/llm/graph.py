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
    min-propagation beats the O(log²) large-star/small-star scheme
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) which pays ~2 shuffles per phase; that scheme IS
    implemented (algorithm="star") for adversarial long-chain graphs
    where diameter rounds would exhaust the iteration bound;
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
    algorithm: str = "propagation",
    stats: dict | None = None,
) -> DataFrame:
    """Undirected connected components of an edge list.

    Returns DataFrame(id, comp) where `comp` is the minimum vertex id
    of the component. Only vertices that appear in `edges` are emitted
    (isolated documents have no dup pair — left-join them back if a
    total labelling is needed). `max_iter` bounds runaway graphs; the
    loop exits early at the fixpoint.

    algorithm:
      * "propagation" (default) — min-label propagation, 1 join + 1
        groupBy-min shuffle per round, rounds = component DIAMETER.
        The right choice for dup graphs (diameter ≲ 5).
      * "star" — alternating large-star/small-star (Kiveris et al.,
        "Connected Components in MapReduce and Beyond", SoCC'14),
        ~2 shuffles per phase but O(log²) rounds worst-case: the
        upgrade path for adversarial long-chain graphs where
        propagation's diameter-bounded loop would exhaust max_iter
        and return a NON-fixpoint labelling.

    `stats`, if given, receives {"rounds": n, "converged": bool} so
    callers (and tests) can see which regime the graph was in.
    """
    if algorithm == "star":
        return _connected_components_star(edges, src, dst, max_iter, stats)
    if algorithm != "propagation":
        raise ValueError(f"unknown algorithm {algorithm!r}")
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    rev = edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    # checkpoint the symmetrized edge list ONCE: without this every
    # round's join re-executes the caller's whole edge-generation
    # pipeline (scan + self-joins + distinct) — r14 measured qx18
    # recomputing its two 40-char-window self-joins per round. Lazy:
    # the labels-init materialization below computes it in the same job.
    sym = (
        fwd.union(rev)
        .where("u IS NOT NULL AND v IS NOT NULL")
        .localCheckpoint(eager=False)
    )

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
            # lazy: the fixpoint probe below materializes the checkpoint
            # in the SAME job — one action per round instead of two
            .localCheckpoint(eager=False)
        )
        cur_sum = labels.agg(F.sum("comp")).collect()[0][0]  # 1-row probe
        if cur_sum == prev_sum:
            if stats is not None:
                stats["rounds"] = _ + 1
                stats["converged"] = True
            return labels
        prev_sum = cur_sum
    if stats is not None:
        stats["rounds"] = max_iter
        stats["converged"] = False
    return labels


def _connected_components_star(
    edges: DataFrame, src: str, dst: str, max_iter: int, stats: dict | None
) -> DataFrame:
    """Alternating large-star/small-star ≈ Kiveris et al. SoCC'14 §3.

    Per alternation the edge set contracts toward a forest of STARS
    whose centers are component minima:
      * large-star: every node hooks its strictly-LARGER neighbours to
        the minimum of its closed neighbourhood — long tails shortcut
        toward small ids without ever increasing edge count;
      * small-star: every node folds itself and its ≤-neighbours onto
        that minimum — the contraction step.
    Both phases are a groupBy-min plus an edge re-map (2 shuffles), all
    hash-partitioned on the node key; rounds are O(log²) in the worst
    case vs propagation's O(diameter). Fixpoint test: the (count,
    sum(u), sum(v)) checksum of the normalized edge set is invariant
    exactly at convergence (each phase only ever lowers labels)."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where("u IS NOT NULL AND v IS NOT NULL AND u != v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    all_nodes = (
        e.select(F.col("u").alias("id"))
        .union(e.select(F.col("v").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def large_star(ed):
        sym = ed.union(ed.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", F.col("u")).alias("m"))
        )
        return (
            sym.join(mins, "u")
            .where("v > u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def small_star(ed):
        norm = ed.select(
            F.greatest("u", "v").alias("hi"), F.least("u", "v").alias("lo")
        ).where("hi != lo")
        mins = norm.groupBy("hi").agg(F.min("lo").alias("m"))
        folded = (
            norm.join(mins, "hi")
            .where("lo != m")
            .select(F.col("lo").alias("u"), F.col("m").alias("v"))
        )
        centers = mins.select(F.col("hi").alias("u"), F.col("m").alias("v"))
        return folded.union(centers).distinct()

    prev_sig = None
    rounds = 0
    converged = False
    for rounds in range(1, max_iter + 1):
        # lazy checkpoint: the signature probe materializes it in the
        # same job (one action per alternation instead of two — r14)
        e = small_star(large_star(e)).localCheckpoint(eager=False)
        sig = tuple(
            e.select(
                F.count(F.lit(1)),
                F.sum(F.greatest("u", "v")),
                F.sum(F.least("u", "v")),
            ).collect()[0]
        )
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    # at the fixpoint e is a star forest: (node → component min) for
    # every non-center; centers label themselves via the left join
    labels = (
        all_nodes.join(e.select(F.col("u").alias("id"), "v"), "id", "left")
        .groupBy("id")
        .agg(F.min(F.coalesce("v", F.col("id"))).alias("comp"))
    )
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
