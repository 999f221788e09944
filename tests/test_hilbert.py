"""Hilbert spatial indexing ≈ runtime/HilbertCurve2D.java +
rel/rules/SpatialRules.java FilterHilbertRule: index math (SQL fold ≡
Python reference), covering-range safety, the filter rewrite's
correctness (identical result set, never a lost row), and the scale
evidence — the range disjunction lands in the parquet PushedFilters."""

from __future__ import annotations

import pytest

from calcite_spark.catalog import Catalog
from calcite_spark.functions.hilbert import (
    covering_ranges,
    hilbert_index,
    hilbert_sql,
    ranges_predicate,
)
from calcite_spark.plans import ir
from calcite_spark.plans.builder import RelBuilder
from calcite_spark.plans.rewrite import default_program
from tests.conftest import SF_DIR

ORDER = 6
BOUNDS = (0.0, 64.0, 0.0, 64.0)


def test_hilbert_index_is_a_bijection_and_locality_holds():
    n = 1 << 4
    seen = {hilbert_index(4, x, y) for x in range(n) for y in range(n)}
    assert seen == set(range(n * n))  # bijection onto [0, 4^order)
    # curve property: consecutive indices are adjacent cells
    pos = {hilbert_index(4, x, y): (x, y) for x in range(n) for y in range(n)}
    for d in range(n * n - 1):
        (x0, y0), (x1, y1) = pos[d], pos[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1


def test_hilbert_sql_matches_python(spark):
    rows = [(float(x) + 0.5, float(y) + 0.5) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "x double, y double")
    expr = hilbert_sql("x", "y", 5, (0.0, 32.0, 0.0, 32.0))
    got = df.selectExpr("x", "y", f"{expr} AS h").collect()
    for r in got:
        assert r.h == hilbert_index(5, int(r.x), int(r.y)), (r.x, r.y)


def test_covering_ranges_are_safe_and_merged():
    rs = covering_ranges(ORDER, BOUNDS, 10, 20, 30, 40)
    # sorted, disjoint, merged
    for (a0, a1), (b0, b1) in zip(rs, rs[1:]):
        assert a1 + 1 < b0
    # SAFE: every cell inside the box lands in some range
    for xi in range(10, 21):
        for yi in range(30, 41):
            h = hilbert_index(ORDER, xi, yi)
            assert any(lo <= h <= hi for lo, hi in rs), (xi, yi)
    # box outside the bounds → no constraint at all
    assert covering_ranges(ORDER, BOUNDS, 100, 110, 100, 110) == []
    # budget respected via coarsening: full-extent box collapses to ONE range
    full = covering_ranges(ORDER, BOUNDS, 0, 64, 0, 64, max_cells=16)
    assert full == [(0, (1 << (2 * ORDER)) - 1)]


@pytest.fixture(scope="module")
def geo(spark, tmp_path_factory):
    """A parquet table of points with a Hilbert index column, SORTED by
    the index (the layout the rewrite exploits), plus the constraint."""
    import random

    rng = random.Random(42)
    rows = [
        (i, rng.uniform(0, 64), rng.uniform(0, 64)) for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "pid long, x double, y double")
    df = df.selectExpr(
        "pid", "x", "y", f"{hilbert_sql('x', 'y', ORDER, BOUNDS)} AS h"
    ).orderBy("h")
    path = str(tmp_path_factory.mktemp("hilbert") / "points.parquet")
    df.write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register("points", path)
    cat.register_hilbert_constraint("points", "h", "x", "y", ORDER, BOUNDS)
    return cat


def _dwithin_plan(cat, cx, cy, d):
    return (
        RelBuilder(cat)
        .scan("points")
        .filter(f"ST_DWITHIN(ST_MAKEPOINT({cx}, {cy}), ST_MAKEPOINT(x, y), {d})")
        .build()
    )


def test_filter_hilbert_rewrite_same_rows(spark, geo):
    """Rewritten plan returns EXACTLY the brute-force result set —
    the ranges admit false positives (removed by the kept exact
    predicate) and never false negatives."""
    cat = geo
    plan = _dwithin_plan(cat, 22.0, 37.0, 3.0)
    rewritten = default_program(cat).run(plan)
    assert "BETWEEN" in rewritten.condition and "h" in rewritten.condition
    got = {r.pid for r in rewritten.to_df(cat).collect()}
    want = {
        r.pid
        for r in cat.table("points")
        .selectExpr("pid", "sqrt(pow(x - 22.0, 2) + pow(y - 37.0, 2)) AS dist")
        .filter("dist <= 3.0")
        .collect()
    }
    assert got == want and got  # non-trivial result


def test_filter_hilbert_ranges_are_selective(geo):
    cat = geo
    plan = _dwithin_plan(cat, 22.0, 37.0, 3.0)
    rewritten = default_program(cat).run(plan)
    # the range disjunction covers a small fraction of the index space
    import re

    spans = [
        int(b) - int(a) + 1
        for a, b in re.findall(r"h BETWEEN (\d+) AND (\d+)", rewritten.condition)
    ]
    assert spans, rewritten.condition[:200]
    assert sum(spans) < (1 << (2 * ORDER)) * 0.1  # <10% of the curve


def test_filter_hilbert_negative_distance_folds_false(spark, geo):
    cat = geo
    plan = _dwithin_plan(cat, 22.0, 37.0, -1.0)
    rewritten = default_program(cat).run(plan)
    assert rewritten.condition.strip("() ") == "FALSE"
    assert rewritten.to_df(cat).count() == 0


def test_filter_hilbert_pushed_to_parquet_scan(spark, geo):
    """The whole point at 100 TB: the h ranges reach the parquet source
    as PushedFilters, so a curve-sorted table prunes row groups."""
    cat = geo
    plan = _dwithin_plan(cat, 22.0, 37.0, 3.0)
    rewritten = default_program(cat).run(plan)
    explained = rewritten.to_df(cat)._jdf.queryExecution().executedPlan().toString()
    import re

    # Spark truncates long filter lists with '...', so don't require the
    # closing bracket — just the h-range comparisons inside the pushed set
    pushed = re.search(r"PushedFilters: \[([^\n]*)", explained)
    assert pushed is not None, explained[:500]
    assert "GreaterThanOrEqual(h," in pushed.group(1)


def test_unrelated_predicates_untouched(geo):
    cat = geo
    plan = (
        RelBuilder(cat)
        .scan("points")
        .filter(
            "pid < 100 AND ST_DWITHIN(ST_MAKEPOINT(10.0, 10.0), "
            "ST_MAKEPOINT(x, y), 2.0)"
        )
        .build()
    )
    rewritten = default_program(cat).run(plan)
    assert "pid < 100" in rewritten.condition
    assert "BETWEEN" in rewritten.condition
    # swapped axes must NOT match the constraint (different point)
    swapped = (
        RelBuilder(cat)
        .scan("points")
        .filter("ST_DWITHIN(ST_MAKEPOINT(10.0, 10.0), ST_MAKEPOINT(y, x), 2.0)")
        .build()
    )
    rw2 = default_program(cat).run(swapped)
    assert "BETWEEN" not in rw2.condition  # macro expanded, no ranges


def test_expand_spatial_macros_rule(spark, geo):
    """Compact ST_ text in Project/Filter lowers to executable SQL even
    without any Hilbert constraint involved."""
    cat = geo
    plan = (
        RelBuilder(cat)
        .scan("points")
        .project("pid", "ST_X(ST_MAKEPOINT(x, y)) AS px")
        .build()
    )
    lowered = default_program(cat).run(plan)
    assert not any("ST_" in e for e in lowered.exprs)
    row = lowered.to_df(cat).orderBy("pid").first()
    assert row.px is not None


def test_ranges_predicate_forms():
    assert ranges_predicate("h", []) == "FALSE"
    assert (
        ranges_predicate("h", [(1, 5), (9, 12)])
        == "(h BETWEEN 1 AND 5 OR h BETWEEN 9 AND 12)"
    )


def test_duckdb_list_reduce_fold_is_avoided():
    """Documents WHY qx24's oracle unrolls the fold into nested
    subselects: DuckDB 1.0's list_reduce computes this
    struct-accumulator fold INCORRECTLY at a few hundred rows (a
    vectorization fault — identical expression is right on small
    inputs). If this test starts failing, the engine fixed it and the
    oracle may switch back to list_reduce."""
    import duckdb

    con = duckdb.connect()
    lam = (
        "(acc, lev) -> struct_pack("
        "d := acc.d + (1::BIGINT << lev.d) * (1::BIGINT << lev.d) * "
        "xor(3 * CAST((acc.x & (1::BIGINT << lev.d)) > 0 AS BIGINT), "
        "CAST((acc.y & (1::BIGINT << lev.d)) > 0 AS BIGINT)), "
        "x := CASE WHEN (acc.y & (1::BIGINT << lev.d)) > 0 THEN acc.x "
        "WHEN (acc.x & (1::BIGINT << lev.d)) > 0 "
        "THEN (1::BIGINT << lev.d) - 1 - acc.y ELSE acc.y END, "
        "y := CASE WHEN (acc.y & (1::BIGINT << lev.d)) > 0 THEN acc.y "
        "WHEN (acc.x & (1::BIGINT << lev.d)) > 0 "
        "THEN (1::BIGINT << lev.d) - 1 - acc.x ELSE acc.x END)"
    )
    gs = (
        "list_transform(generate_series(1, 4), i -> struct_pack("
        "d := CAST(4 - i AS BIGINT), x := 0::BIGINT, y := 0::BIGINT))"
    )
    e = (
        f"list_reduce(list_prepend(struct_pack(d := 0::BIGINT, "
        f"x := CAST(xi AS BIGINT), y := CAST(yi AS BIGINT)), {gs}), {lam}).d"
    )
    rows = con.execute(
        f"SELECT xi, yi, {e} AS h FROM (SELECT a xi, b yi "
        "FROM generate_series(0,15) s(a), generate_series(0,15) t(b))"
    ).fetchall()
    bad = sum(1 for xi, yi, h in rows if h != hilbert_index(4, xi, yi))
    single = con.execute(
        f"SELECT {e} FROM (SELECT 0 xi, 1 yi)"
    ).fetchone()[0]
    assert single == hilbert_index(4, 0, 1)  # correct on one row...
    assert bad > 0  # ...wrong at vector scale (the documented fault)
