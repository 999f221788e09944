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
