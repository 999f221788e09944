"""Connected components (llm/graph.py): hand-computed component
structure, multi-hop convergence past one propagation round, canonical
keeper selection, and the qx18 driver-entry parity vs its DuckDB
recursive-CTE oracle (also exercised by test_inventory)."""

from __future__ import annotations

from calcite_spark.llm.graph import (
    canonical_ids,
    connected_components,
    dedup_clusters,
)


def _cc_map(df):
    return {r.id: r.comp for r in df.collect()}


def test_chain_and_island(spark):
    # chain 1-2-3-4-5 (diameter 4: needs >1 round) + island pair 10-11
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "src INT, dst INT"
    )
    got = _cc_map(connected_components(edges))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_direction_irrelevant(spark):
    # edges pointing "backwards" give the same components
    edges = spark.createDataFrame([(5, 4), (4, 3), (3, 2), (2, 1)], "src INT, dst INT")
    got = _cc_map(connected_components(edges))
    assert set(got.values()) == {1} and len(got) == 5


def test_dedup_clusters_and_canonical(spark):
    pairs = spark.createDataFrame(
        [(7, 3), (3, 9), (20, 21)], "a BIGINT, b BIGINT"
    )
    clusters = dedup_clusters(pairs)
    rows = {(r.doc_id, r.cluster_id) for r in clusters.collect()}
    assert rows == {(3, 3), (7, 3), (9, 3), (20, 20), (21, 20)}
    keep = {r.doc_id for r in canonical_ids(clusters).collect()}
    assert keep == {3, 20}


def test_max_iter_bounds_runaway(spark):
    # a long chain with max_iter=2 must still RETURN (bounded), just
    # not fully converged — the documented contract
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "src INT, dst INT"
    )
    got = _cc_map(connected_components(edges, max_iter=2))
    assert len(got) == 12  # all vertices labelled
    full = _cc_map(connected_components(edges))
    assert set(full.values()) == {1}


def test_star_matches_propagation_on_random_graph(spark):
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    df = spark.createDataFrame(
        [e for e in edges if e[0] != e[1]], "src INT, dst INT"
    )
    prop = _cc_map(connected_components(df))
    star = _cc_map(connected_components(df, algorithm="star"))
    assert star == prop


def test_star_converges_on_long_chain_where_propagation_cannot(spark):
    """64-vertex chain, max_iter=12: propagation needs diameter (63)
    rounds and must report non-convergence; large-star/small-star
    converges in O(log^2) alternations and labels the whole chain with
    its minimum."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "src INT, dst INT"
    )
    pstats: dict = {}
    prop = _cc_map(connected_components(edges, max_iter=12, stats=pstats))
    assert pstats["converged"] is False
    assert set(prop.values()) != {0}  # honest: not a fixpoint

    sstats: dict = {}
    star = _cc_map(
        connected_components(edges, max_iter=12, algorithm="star", stats=sstats)
    )
    assert sstats["converged"] is True
    assert sstats["rounds"] <= 10
    assert set(star.values()) == {0} and len(star) == 64


def test_star_keeper_semantics(spark):
    """cluster_id is still the component minimum under the star path."""
    edges = spark.createDataFrame(
        [(9, 4), (4, 13), (40, 41)], "src INT, dst INT"
    )
    got = _cc_map(connected_components(edges, algorithm="star"))
    assert got == {9: 4, 4: 4, 13: 4, 40: 40, 41: 40}


def test_repeat_union_stable_over_roundrobin_input(spark):
    """r15 (VERDICT r14 item 7): RepeatUnion's per-iteration
    localCheckpoint(eager=False) is materialized partition-by-partition
    (the isEmpty probe may compute only a subset; the rest recomputes
    from lineage on the next action). With a round-robin-repartitioned
    input in the same lineage — the Exchange ROUND_ROBIN IR now shares
    a module with RepeatUnion — partial re-evaluation must still see
    the same ROWS across actions. Spark guarantees this via
    sortBeforeRepartition (SPARK-23207: rows are locally sorted before
    the round-robin assignment, so retries/recomputes reproduce the
    same row-to-partition map); this test pins that the combination
    stays deterministic across repeated full actions."""
    from calcite_spark.plans import ir

    class Ctx:
        def __init__(self, s):
            self.spark = s

        def register_all_views(self):
            pass

    seed = ir.Values(rows=[(0,), (1,), (2,), (3,)], schema="n int")

    def step(cur, ctx):
        # next delta THROUGH a round-robin repartition (nondeterministic
        # partitioning, deterministic rows): n -> n + 4 while n < 16
        return (
            cur.repartition(8)
            .selectExpr("n + 4 AS n")
            .filter("n < 16")
        )

    node = ir.RepeatUnion(seed=seed, step=step, all=True, max_iterations=10)
    df = node.to_df(Ctx(spark))
    runs = [tuple(sorted(r.n for r in df.collect())) for _ in range(3)]
    assert runs[0] == runs[1] == runs[2]
    assert runs[0] == tuple(sorted(range(16)))
