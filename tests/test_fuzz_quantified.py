"""Property fuzz for the r6 SQL-surface lowerings.

1. Quantified comparisons: frontend._expand_quantified's 3-valued CASE
   vs DuckDB's NATIVE SOME/ANY/ALL on randomized small lists (NULLs,
   empty sets, NULL operands, every operator) — the strongest oracle
   available for the lowering's null semantics.
2. pack_sequences: the JVM fold vs a 10-line Python reference of the
   greedy first-fit contract (zero-token docs and oversized docs
   included — the ADVICE r5 divergence class).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from tests.conftest import SF_DIR

OPS = ["=", "<>", "<", "<=", ">", ">="]
QUANTS = ["SOME", "ANY", "ALL"]

VALS = st.lists(st.one_of(st.none(), st.integers(-3, 3)), min_size=0, max_size=5)


@pytest.fixture(scope="module")
def fe(spark):
    from calcite_spark.queries.inventory import catalog_for
    from calcite_spark.sql.frontend import SqlFrontend

    return SqlFrontend(catalog_for(spark, SF_DIR))


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def _subquery(vals):
    if not vals:
        return "SELECT x FROM (VALUES (1)) AS t(x) WHERE x > 99"
    rows = ", ".join(f"({'NULL' if v is None else v})" for v in vals)
    return f"SELECT x FROM (VALUES {rows}) AS t(x)"


@settings(max_examples=120, deadline=None)
@given(
    x=st.one_of(st.none(), st.integers(-3, 3)),
    op=st.sampled_from(OPS),
    quant=st.sampled_from(QUANTS),
    vals=VALS,
)
def test_quantified_matches_duckdb_native(fe, duck, x, op, quant, vals):
    lhs = "CAST(NULL AS INT)" if x is None else str(x)
    sql = f"SELECT ({lhs} {op} {quant} ({_subquery(vals)})) AS v"
    got = fe.sql(sql).collect()[0].v
    want = duck.execute(sql).fetchone()[0]
    assert got == want, f"{sql}: spark={got} duckdb={want}"


def _pack_reference(docs, budget):
    """The documented contract: walk in id order; join the current pack
    unless adding would overflow AND the pack already holds a doc."""
    out, pack, used, started = {}, 0, 0, False
    for doc_id, n in sorted(docs):
        if started and used + n > budget:
            pack, used = pack + 1, n
        else:
            used += n
        started = True
        out[doc_id] = pack
    return out


@settings(max_examples=25, deadline=None)
@given(
    ns=st.lists(st.integers(0, 12), min_size=1, max_size=10),
    budget=st.integers(1, 15),
)
def test_pack_sequences_matches_reference(spark, ns, budget):
    from calcite_spark.llm.chunking import pack_sequences

    docs = [(i, n) for i, n in enumerate(ns)]
    df = spark.createDataFrame(docs, "doc_id long, n long")
    got = {
        r.doc_id: r.pack
        for r in pack_sequences(df, budget_tokens=budget, buckets=1,
                                tokens_col="n").collect()
    }
    assert got == _pack_reference(docs, budget)


# -- UNSIGNED widening vs DuckDB's NATIVE unsigned types --------------

UTYPES = {
    "TINYINT": ("UTINYINT", 255),
    "SMALLINT": ("USMALLINT", 65535),
    "INT": ("UINTEGER", 4294967295),
    "BIGINT": ("UBIGINT", 18446744073709551615),
}


@settings(max_examples=60, deadline=None)
@given(
    ty=st.sampled_from(sorted(UTYPES)),
    v=st.one_of(
        st.integers(-300, 300),
        st.integers(65530, 65540),
        st.integers(4294967290, 4294967300),
    ),
)
def test_unsigned_widening_matches_duckdb_native(fe, duck, ty, v):
    """Our CAST(x AS T UNSIGNED) widening must agree VALUE-FOR-VALUE
    with DuckDB's native unsigned types — both the kept values and the
    out-of-range refusals (DuckDB: Conversion Error; ours: the
    reference's 'Value is out of range')."""
    dtype, mx = UTYPES[ty]
    spark_sql = f"SELECT CAST({v} AS {ty} UNSIGNED) AS u"
    duck_sql = f"SELECT CAST({v} AS {dtype}) AS u"
    in_range = 0 <= v <= mx
    if in_range:
        got = fe.sql(spark_sql).collect()[0].u
        want = duck.execute(duck_sql).fetchone()[0]
        assert int(got) == int(want), f"{v} AS {ty} UNSIGNED: {got} != {want}"
    else:
        with pytest.raises(ValueError, match="out of range"):
            fe.sql(spark_sql)
        with pytest.raises(Exception, match="(?i)conversion|out of range"):
            duck.execute(duck_sql)


# -- WITHIN DISTINCT vs a DuckDB two-level replay ---------------------

WD_AGGS = ["SUM", "COUNT", "MIN", "MAX"]


@settings(max_examples=40, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 4)),
        min_size=1, max_size=12,
    ),
    agg=st.sampled_from(WD_AGGS),
    mult=st.integers(1, 5),
)
def test_within_distinct_matches_duckdb_two_level(fe, duck, rows, agg, mult):
    """AGG(f(d)) WITHIN DISTINCT (d) grouped by g — with f(d) = d*mult
    the uniformity assertion holds by construction, and DuckDB replays
    the defining semantics directly (one value per distinct (g, d))."""
    vals = ", ".join(f"({g}, {d})" for g, d in rows)
    spark_sql = (
        f"SELECT g, {agg}(d * {mult}) WITHIN DISTINCT (d) AS a, "
        f"COUNT(*) WITHIN DISTINCT (d) AS c "
        f"FROM (VALUES {vals}) AS t(g, d) GROUP BY g ORDER BY g"
    )
    duck_sql = (
        f"SELECT g, {agg}(d * {mult}) AS a, COUNT(*) AS c "
        f"FROM (SELECT DISTINCT g, d FROM (VALUES {vals}) AS t(g, d)) "
        f"GROUP BY g ORDER BY g"
    )
    got = [(r.g, int(r.a), int(r.c)) for r in fe.sql(spark_sql).collect()]
    want = [(g, int(a), int(c)) for g, a, c in duck.execute(duck_sql).fetchall()]
    assert got == want, f"{spark_sql}: {got} != {want}"


@settings(max_examples=15, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 2)),
        min_size=1, max_size=8,
    ),
)
def test_within_distinct_uniformity_raises_or_matches(fe, rows):
    """x NOT functionally dependent on d: either every (g, d) group is
    accidentally uniform (query runs, per-d value well-defined) or the
    lowering MUST raise Calcite's THROW — never return a quiet
    arbitrary pick."""
    vals = ", ".join(f"({g}, {d}, {g * 10 + d + i % 2})" for i, (g, d) in enumerate(rows))
    groups = {}
    for i, (g, d) in enumerate(rows):
        groups.setdefault((g, d), set()).add(g * 10 + d + i % 2)
    uniform = all(len(v) == 1 for v in groups.values())
    sql = (
        f"SELECT g, SUM(x) WITHIN DISTINCT (d) AS a "
        f"FROM (VALUES {vals}) AS t(g, d, x) GROUP BY g ORDER BY g"
    )
    if uniform:
        assert fe.sql(sql).collect() is not None
    else:
        with pytest.raises(Exception, match="functionally dependent"):
            fe.sql(sql).collect()


# -- PG :: casts vs DuckDB's native :: --------------------------------


@settings(max_examples=40, deadline=None)
@given(
    v=st.one_of(
        st.integers(-1000, 1000),
        st.floats(-100, 100, allow_nan=False).map(lambda f: round(f, 3)),
    ),
    ty=st.sampled_from(["int", "bigint", "double", "decimal(10,3)", "string"]),
)
def test_pg_cast_shorthand_matches_duckdb(fe, duck, v, ty):
    """`expr::type` (babel tier) — DuckDB parses :: natively, so the
    identical text is a live cross-engine check of the rewrite.
    Exclusion (fuzz-found, documented in the frontend): float→int CAST
    itself diverges between the engines — Spark truncates toward zero
    (Hive lineage) while PostgreSQL/DuckDB round — so those pairs
    assert Spark's own truncation contract instead."""
    import math

    lit = repr(v) if not isinstance(v, str) else f"'{v}'"
    sql = f"SELECT ({lit})::{ty} AS v"
    got = fe.sql(sql).collect()[0].v
    if isinstance(v, float) and ty in ("int", "bigint"):
        assert got == math.trunc(v), f"{sql}: {got} != trunc({v})"
        return
    want = duck.execute(sql).fetchone()[0]
    if isinstance(got, float) or isinstance(want, float):
        assert abs(float(got) - float(want)) < 1e-9, sql
    else:
        assert str(got) == str(want), f"{sql}: {got!r} != {want!r}"


# -- ROW constructor grouping/equality vs DuckDB native ROW -----------


@settings(max_examples=30, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 2)),
            st.sampled_from(["a", "b", None]),
        ),
        min_size=1, max_size=10,
    ),
)
def test_row_constructor_grouping_matches_duckdb(fe, duck, rows):
    """ROW(x, y) lowers to struct(x, y); DuckDB runs ROW natively.
    Group-count and equality-count semantics must agree, NULL fields
    included (GROUP BY treats NULLs as equal; ROW equality does not)."""
    # CAST the columns: an all-NULL VALUES column types as VOID, and
    # Spark's struct comparison refuses VOID-vs-INT coercion (real
    # tables always carry concrete types)
    vals = ", ".join(
        f"(CAST({'NULL' if x is None else x} AS INT), "
        f"CAST({'NULL' if y is None else repr(y)} AS STRING))"
        for x, y in rows
    )
    base = f"(VALUES {vals}) AS t(x, y)"
    for sql in (
        f"SELECT COUNT(*) AS n FROM (SELECT ROW(x, y) AS r FROM {base} GROUP BY ROW(x, y))",
        f"SELECT COUNT(*) AS n FROM {base} WHERE ROW(x, y) = ROW(1, 'a')",
    ):
        got = fe.sql(sql).collect()[0].n
        want = duck.execute(sql).fetchone()[0]
        assert int(got) == int(want), f"{sql}: {got} != {want}"


# -- r7 babel batch 2: DISTINCT ON / @> <@ containment ----------------


@settings(max_examples=40, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(-3, 3)),
        min_size=1, max_size=12,
    ),
    desc=st.booleans(),
)
def test_distinct_on_matches_duckdb_native(fe, duck, rows, desc):
    """SELECT DISTINCT ON (g) ... ORDER BY g, v [DESC], id — DuckDB
    runs DISTINCT ON natively, so the identical text cross-checks the
    row_number lowering, ties broken deterministically by id."""
    vals = ", ".join(f"({g}, {v}, {i})" for i, (g, v) in enumerate(rows))
    sql = (
        f"SELECT DISTINCT ON (g) g, v AS vv, id AS i "
        f"FROM (VALUES {vals}) AS t(g, v, id) "
        f"ORDER BY g, v{' DESC' if desc else ''}, id"
    )
    got = [(r.g, r.vv, r.i) for r in fe.sql(sql).collect()]
    want = [tuple(r) for r in duck.execute(sql).fetchall()]
    assert got == want, f"{sql}: {got} != {want}"


ARR = st.lists(st.one_of(st.none(), st.integers(0, 3)), min_size=1, max_size=5)


@settings(max_examples=60, deadline=None)
@given(a=ARR, b=ARR, op=st.sampled_from(["@>", "<@"]))
def test_containment_matches_duckdb_native(fe, duck, a, b, op):
    """`a @> b` / `a <@ b` — DuckDB parses the operators natively
    (list_has_all), so the identical ARRAY[...] text cross-checks the
    forall/filter lowering including NULL-element handling (non-null
    needles only must match; a documented divergence from PostgreSQL,
    which never matches NULLs)."""
    def lit(vs):
        return "ARRAY[" + ", ".join(
            f"CAST({'NULL' if v is None else v} AS INT)" for v in vs
        ) + "]"

    sql = f"SELECT ({lit(a)} {op} {lit(b)}) AS v"
    got = fe.sql(sql).collect()[0].v
    want = duck.execute(sql).fetchone()[0]
    assert got == want, f"{sql}: spark={got} duckdb={want}"


# -- r7 AggregateJoinTranspose: transposed ≡ plain (property fuzz) ----

AJT_AGG_SETS = [
    # single-side push (args on one side)
    ["SUM(lx) AS s", "COUNT(*) AS n", "MIN(lx) AS mn", "AVG(lx) AS av"],
    # both-side push (args split across the join)
    ["SUM(lx) AS s", "SUM(ry) AS t", "COUNT(*) AS n"],
    ["AVG(lx) AS a1", "MAX(ry) AS m2", "COUNT(ry) AS c2"],
    # COUNT(*)-only (pushes to the larger side)
    ["COUNT(*) AS n"],
]


@settings(max_examples=10, deadline=None)
@given(
    lrows=st.lists(
        st.tuples(st.one_of(st.none(), st.integers(0, 1)),  # join key
                  st.integers(0, 1),                        # group key
                  st.one_of(st.none(), st.integers(-5, 5))),  # measure
        min_size=10, max_size=24,
    ),
    rrows=st.lists(
        st.tuples(st.one_of(st.none(), st.integers(0, 1)),
                  st.integers(0, 1),
                  st.one_of(st.none(), st.integers(-5, 5))),
        min_size=10, max_size=24,
    ),
    agg_i=st.integers(0, len(AJT_AGG_SETS) - 1),
    group_both=st.booleans(),
)
def test_agg_join_transpose_matches_plain(spark, lrows, rrows, agg_i, group_both):
    """The AggregateJoinTranspose rewrite must be value-identical to
    the single-level aggregate on randomized tiny tables — NULL join
    keys (drop), NULL measures (SUM/AVG skip, COUNT(col) skips,
    COUNT(*) keeps), duplicate keys (the duplication-restoration
    arithmetic), empty partial cells, single- AND both-side pushes."""
    from calcite_spark.catalog import Catalog
    from calcite_spark.plans.builder import RelBuilder
    from calcite_spark.plans.rewrite import _aggregate_join_transpose

    cat = Catalog(spark)
    cat.register_df("tl", spark.createDataFrame(
        [(a, b, c) for a, b, c in lrows], "lk int, lg int, lx int"))
    cat.register_df("tr", spark.createDataFrame(
        [(a, b, float(c) if c is not None else None) for a, b, c in rrows],
        "rk int, rg int, ry double"))
    # exact=True (r15): this test arms the transpose GATE, it does not
    # test the profiler — the rsd=0.01 sketch costs 2-5 s of >JIT-limit
    # codegen per column per example (237 s for 10 examples); exact
    # count(DISTINCT) over <=24 rows is instant and noise-free.
    cat.analyze("tl", exact=True)
    cat.analyze("tr", exact=True)
    group = ["lg", "rg"] if group_both else ["lg"]
    plan = (
        RelBuilder(cat).scan("tl").scan("tr").join("lk = rk")
        .aggregate(group, AJT_AGG_SETS[agg_i]).build()
    )
    out = _aggregate_join_transpose(plan, cat)
    assert out is not None, "gate must fire: 2x2 partial domain over >=10 rows"

    def canon(df):
        rows = []
        for r in df.collect():
            vals = []
            for c in sorted(df.columns):
                v = r[c]
                vals.append(round(v, 9) if isinstance(v, float) else v)
            rows.append(tuple(vals))
        return sorted(rows, key=repr)

    plain, trans = plan.to_df(cat), out.to_df(cat)
    assert dict(plain.dtypes) == dict(trans.dtypes)
    assert canon(plain) == canon(trans)


def test_within_distinct_operator_in_plan_assertion(spark):
    """The OPERATOR path's uniformity check is embedded in the plan
    (r14: the eager filter/count probe executed the input twice per
    run): uniform input aggregates one value per distinct key; a
    violating group raises Calcite's THROW at execution, wording
    preserved."""
    from calcite_spark.operators.within_distinct import (
        aggregate_within_distinct,
    )

    ok = spark.createDataFrame(
        [(1, 10, 5.0), (1, 10, 5.0), (1, 20, 7.0), (2, 10, 5.0)],
        "g int, d int, x double",
    )
    out = aggregate_within_distinct(
        ok, ["g"], [("SUM", "x", "d", "s")], assert_uniform=True
    )
    got = {(r.g, r.s) for r in out.collect()}
    assert got == {(1, 12.0), (2, 5.0)}

    bad = spark.createDataFrame(
        [(1, 10, 5.0), (1, 10, 6.0)], "g int, d int, x double"
    )
    out_bad = aggregate_within_distinct(
        bad, ["g"], [("SUM", "x", "d", "s")], assert_uniform=True
    )
    with pytest.raises(Exception, match="functionally dependent"):
        out_bad.collect()
