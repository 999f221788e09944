"""Grid-cell spatial join (operators/spatial_join.py ≈ SpatialRules'
ST_DWithin-to-grid rewrite): result-set equality vs the brute-force
cross join on planted deterministic points, plus plan shape (equi-join,
no cartesian)."""

from __future__ import annotations

from pyspark.sql import functions as F

from calcite_spark.functions import spatial as S
from calcite_spark.operators.spatial_join import spatial_join


def _points(spark, n, salt, prefix):
    """n deterministic pseudo-random points in [0, 100)^2."""
    return spark.range(n).select(
        F.col("id").alias(f"{prefix}_id"),
        F.expr(
            S.make_point(
                f"CAST(pmod(id * 37 + {salt}, 1000) AS DOUBLE) / 10.0",
                f"CAST(pmod(id * 91 + {salt} * 3, 1000) AS DOUBLE) / 10.0",
            )
        ).alias(f"{prefix}_geom"),
    )


def test_dwithin_matches_bruteforce(spark):
    a = _points(spark, 300, 7, "a")
    b = _points(spark, 300, 11, "b")

    got = (
        spatial_join(a, b, "a_geom", "b_geom", cell_size=5.0, predicate="dwithin", distance=2.0)
        .select("a_id", "b_id")
        .collect()
    )
    expected = (
        a.crossJoin(b)
        .where(F.expr(S.st_dwithin("a_geom", "b_geom", "2.0")))
        .select("a_id", "b_id")
        .collect()
    )
    assert len(expected) > 10  # planted density sanity: non-trivial result
    assert sorted((r.a_id, r.b_id) for r in got) == sorted(
        (r.a_id, r.b_id) for r in expected
    )


def test_intersects_polygons_vs_points(spark):
    # 10x10 squares tiling a diagonal band; points from the generator
    polys = spark.range(20).select(
        F.col("id").alias("p_id"),
        F.expr(
            S.st_make_envelope(
                "CAST(id * 5 AS DOUBLE)",
                "CAST(id * 5 AS DOUBLE)",
                "CAST(id * 5 + 10 AS DOUBLE)",
                "CAST(id * 5 + 10 AS DOUBLE)",
            )
        ).alias("p_geom"),
    )
    pts = _points(spark, 200, 3, "q")
    got = (
        spatial_join(polys, pts, "p_geom", "q_geom", cell_size=10.0)
        .select("p_id", "q_id")
        .collect()
    )
    expected = (
        polys.crossJoin(pts)
        .where(F.expr(S.st_intersects("p_geom", "q_geom")))
        .select("p_id", "q_id")
        .collect()
    )
    assert len(expected) > 10
    assert sorted((r.p_id, r.q_id) for r in got) == sorted(
        (r.p_id, r.q_id) for r in expected
    )


def test_no_cartesian_in_plan(spark):
    a = _points(spark, 50, 1, "a")
    b = _points(spark, 50, 2, "b")
    j = spatial_join(a, b, "a_geom", "b_geom", cell_size=5.0, predicate="dwithin", distance=1.0)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
