"""Expression fuzzing ≈ core/src/test/java/org/apache/calcite/test/
fuzzer/RexProgramFuzzyTest.java + RexFuzzer.java: random type-correct
expressions over a fixture row set, evaluated in Spark AND DuckDB —
engines must agree cell-for-cell (three-valued logic, NULL propagation,
CASE/COALESCE, comparison and arithmetic semantics).

Grammar restricted to shared-exact-semantics operators: small-int
arithmetic (no overflow), double arithmetic (same tree → same IEEE
result), string concat/length/case, boolean logic, CASE, COALESCE,
NULLIF, LEAST/GREATEST, ABS.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

# fixture rows: (id, i, j, d, s, b) with NULLs sprinkled
ROWS = [
    (0, 1, 7, 1.5, "abc", True),
    (1, -3, 2, -0.25, "", False),
    (2, 0, None, 3.75, "XyZ", None),
    (3, 42, -8, None, None, True),
    (4, None, 5, 2.0, "hello world", False),
    (5, 7, 7, -1.125, "déjà", None),
    (6, -100, 100, 0.0, "'quote'", True),
    (7, 13, None, None, "tab\tsep", False),
]

INT_COLS = ["i", "j"]
DBL_COLS = ["d"]
STR_COLS = ["s"]
BOOL_COLS = ["b"]


def _int_expr(depth):
    if depth <= 0:
        return st.one_of(
            st.sampled_from(INT_COLS),
            st.integers(min_value=-50, max_value=50).map(str),
        )
    sub = st.deferred(lambda: _int_expr(depth - 1))
    return st.one_of(
        st.sampled_from(INT_COLS),
        st.integers(min_value=-50, max_value=50).map(str),
        st.tuples(sub, st.sampled_from(["+", "-", "*"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        sub.map(lambda e: f"ABS({e})"),
        st.tuples(sub, sub).map(lambda t: f"LEAST({t[0]}, {t[1]})"),
        st.tuples(sub, sub).map(lambda t: f"GREATEST({t[0]}, {t[1]})"),
        st.tuples(sub, sub).map(lambda t: f"NULLIF({t[0]}, {t[1]})"),
        st.tuples(sub, sub).map(lambda t: f"COALESCE({t[0]}, {t[1]})"),
        st.tuples(st.deferred(lambda: _bool_expr(depth - 1)), sub, sub).map(
            lambda t: f"(CASE WHEN {t[0]} THEN {t[1]} ELSE {t[2]} END)"
        ),
    )


def _dbl_expr(depth):
    if depth <= 0:
        return st.sampled_from(DBL_COLS)
    sub = st.deferred(lambda: _dbl_expr(depth - 1))
    return st.one_of(
        st.sampled_from(DBL_COLS),
        st.sampled_from(["0.5", "-2.25", "10.0"]),
        st.tuples(sub, st.sampled_from(["+", "-", "*"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        sub.map(lambda e: f"ABS({e})"),
        st.tuples(sub, sub).map(lambda t: f"COALESCE({t[0]}, {t[1]})"),
    )


def _str_expr(depth):
    if depth <= 0:
        return st.sampled_from(STR_COLS)
    sub = st.deferred(lambda: _str_expr(depth - 1))
    return st.one_of(
        st.sampled_from(STR_COLS),
        st.sampled_from(["'lit'", "''"]),
        st.tuples(sub, sub).map(lambda t: f"({t[0]} || {t[1]})"),
        sub.map(lambda e: f"UPPER({e})"),
        sub.map(lambda e: f"LOWER({e})"),
        st.tuples(sub, sub).map(lambda t: f"COALESCE({t[0]}, {t[1]})"),
    )


def _bool_expr(depth):
    if depth <= 0:
        return st.sampled_from(BOOL_COLS)
    isub = st.deferred(lambda: _int_expr(depth - 1))
    ssub = st.deferred(lambda: _str_expr(depth - 1))
    bsub = st.deferred(lambda: _bool_expr(depth - 1))
    return st.one_of(
        st.sampled_from(BOOL_COLS),
        st.tuples(isub, st.sampled_from(["<", "<=", "=", "<>", ">", ">="]), isub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        st.tuples(ssub, st.sampled_from(["=", "<>", "<"]), ssub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        st.tuples(bsub, st.sampled_from(["AND", "OR"]), bsub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        bsub.map(lambda e: f"(NOT {e})"),
        isub.map(lambda e: f"({e} IS NULL)"),
        bsub.map(lambda e: f"({e} IS NOT TRUE)"),
    )


EXPR = st.one_of(_int_expr(3), _dbl_expr(3), _str_expr(3), _bool_expr(3))


@pytest.fixture(scope="module")
def fuzz_env(spark):
    df = spark.createDataFrame(
        ROWS, "id int, i int, j int, d double, s string, b boolean"
    )
    df.createOrReplaceTempView("fuzz_t")
    con = duckdb.connect()
    con.execute("CREATE TABLE fuzz_t (id INT, i INT, j INT, d DOUBLE, s VARCHAR, b BOOLEAN)")
    con.executemany("INSERT INTO fuzz_t VALUES (?, ?, ?, ?, ?, ?)", ROWS)
    return spark, con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


@settings(max_examples=2, deadline=None)
@given(exprs=st.lists(EXPR, min_size=25, max_size=25))
def test_expression_agrees_with_duckdb(fuzz_env, exprs):
    """Same 50-expression budget as before, but 25 expressions ride ONE
    projection per engine roundtrip (r15: 50 separate spark.sql collects
    cost 36 s of pure per-query overhead on an 8-row view; expressions
    are independent output columns, so batching cannot change any
    cell's value). On a batch mismatch, each expression is re-run alone
    so the failure names the guilty expr exactly as before."""
    spark, con = fuzz_env
    cols = ", ".join(f"{e} AS v{i}" for i, e in enumerate(exprs))
    sql = f"SELECT id, {cols} FROM fuzz_t ORDER BY id"
    got = spark.sql(sql).collect()
    want = con.sql(sql).fetchall()
    for i, e in enumerate(exprs):
        g = [_norm(r[i + 1]) for r in got]
        w = [_norm(r[i + 1]) for r in want]
        if g != w:
            solo = f"SELECT id, {e} AS v FROM fuzz_t ORDER BY id"
            sg = [_norm(r.v) for r in spark.sql(solo).collect()]
            sw = [_norm(r[1]) for r in con.sql(solo).fetchall()]
            assert sg == sw, f"expr {e}: spark={sg} duck={sw}"
            assert g == w, f"expr {e} (batched): spark={g} duck={w}"
