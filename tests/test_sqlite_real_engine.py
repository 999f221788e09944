"""SQLite dialect verified against the REAL engine (stdlib sqlite3,
SQLite 3.40) — the only dialect whose target engine ships in this
container, so unlike the DuckDB-proxy checks the emitted SQL executes
on the engine it was written for. Covers:

  * value-identity of every emittable IR shape: IR → SQLITE SQL →
    sqlite3 ≡ IR → Spark DataFrame;
  * the reference-mirrored structural forms (SqliteSqlDialect.java):
    LIMIT -1 OFFSET, VALUES → UNION ALL (supportsAliasedValues false),
    SUBSTRING → SUBSTR, bare compound-SELECT operands;
  * refusals where SQLite semantics genuinely diverge (integer
    division, ROLLUP/CUBE, ALL set ops, DECIMAL/BOOLEAN casts,
    stddev/md5/greatest);
  * federation: SQLiteEngine as a real external engine behind
    federate(), pushed SQL asserted and values matched.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import pytest

from calcite_spark.catalog import Catalog
from calcite_spark.plans.builder import RelBuilder
from calcite_spark.queries.inventory import catalog_for
from calcite_spark.sources.federation import (
    SQLiteEngine,
    execute_federated,
    register_external,
)
from calcite_spark.sql.rel2sql import (
    SQLITE,
    UnsupportedDialectExpression,
    to_sql,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def cat(spark):
    c = catalog_for(spark, SF_DIR)
    c.register_all_views()
    return c


@pytest.fixture(scope="module")
def lite():
    return SQLiteEngine.from_parquet_dir(
        SF_DIR,
        ("region", "nation", "customer", "orders", "supplier", "lineitem"),
    )


def _b(cat):
    return RelBuilder(cat)


def _norm(v):
    """Cross-engine value normalization: SQLite's answers are TEXT/
    INTEGER/REAL, Spark's are date/Decimal/typed — compare in the
    shared domain."""
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")  # the canonical TEXT form
    if isinstance(v, datetime.date):
        return f"{v} 00:00:00"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 4)
    return v


def _spark_rows(df):
    return sorted((tuple(_norm(v) for v in r) for r in df.collect()), key=str)


def _sqlite_rows(lite, sql):
    cur = lite.con.execute(sql)
    return sorted(
        (tuple(_norm(v) for v in r) for r in cur.fetchall()), key=str
    )


def _shapes(cat):
    """The executable-on-SQLite subset of the rel2sql shape corpus plus
    SQLite-specific forms (strftime rewrite, || concat, LIMIT -1
    OFFSET, guarded division)."""
    return {
        "q01_shape": (
            _b(cat)
            .scan("lineitem")
            .filter("l_shipdate <= DATE '1998-09-01'")
            .aggregate(
                ["l_returnflag", "l_linestatus"],
                ["SUM(l_quantity) AS sum_qty", "COUNT(*) AS n"],
            )
            .sort("l_returnflag", "l_linestatus")
            .build()
        ),
        "join_agg_topk": (
            _b(cat)
            .scan("customer")
            .scan("orders")
            .join("c_custkey = o_custkey")
            .aggregate(
                ["c_mktsegment"],
                ["COUNT(*) AS n", "SUM(o_totalprice) AS total"],
            )
            .sort_limit(["total DESC"], fetch=3)
            .build()
        ),
        "left_join_distribution": (
            _b(cat)
            .scan("customer")
            .scan("orders")
            .join("c_custkey = o_custkey", join_type="LEFT")
            .aggregate(["c_custkey"], ["COUNT(o_orderkey) AS c_count"])
            .aggregate(["c_count"], ["COUNT(*) AS custdist"])
            .sort("custdist DESC", "c_count DESC")
            .build()
        ),
        "semi_join": (
            _b(cat)
            .scan("nation")
            .scan("customer")
            .semi_join("n_nationkey = c_nationkey")
            .project("n_name")
            .sort("n_name")
            .build()
        ),
        "anti_join": (
            _b(cat)
            .scan("nation")
            .scan("supplier")
            .anti_join("n_nationkey = s_nationkey")
            .project("n_name")
            .sort("n_name")
            .build()
        ),
        "union_distinct": (
            _b(cat)
            .scan("orders")
            .filter("o_custkey <= 200")
            .project("o_orderstatus AS status")
            .scan("orders")
            .filter("o_custkey <= 100")
            .project("o_orderstatus AS status")
            .union()
            .sort("status")
            .build()
        ),
        "offset_fetch": (
            _b(cat)
            .scan("customer")
            .project("c_custkey", "c_name")
            .sort_limit(["c_custkey"], offset=5, fetch=10)
            .build()
        ),
        "offset_only": (
            _b(cat)
            .scan("region")
            .project("r_regionkey", "r_name")
            .sort_limit(["r_regionkey"], offset=2)
            .build()
        ),
        "values_join": (
            _b(cat)
            .scan("region")
            .values([(0, "amer"), (1, "emea")], "rk int, zone string")
            .join("r_regionkey = rk")
            .project("r_name", "zone")
            .sort("r_name")
            .build()
        ),
        "window": (
            _b(cat)
            .scan("supplier")
            .window(
                [
                    "row_number() OVER (PARTITION BY s_nationkey "
                    "ORDER BY s_acctbal DESC) AS rk"
                ],
                keep=("s_suppkey", "s_nationkey"),
            )
            .filter("rk <= 2")
            .sort("s_nationkey", "rk")
            .build()
        ),
        "strftime_units": (
            _b(cat)
            .scan("orders")
            .project(
                "year(o_orderdate) AS y",
                "quarter(o_orderdate) AS q",
                "month(o_orderdate) AS m",
            )
            .aggregate(["y", "q", "m"], ["COUNT(*) AS n"])
            .sort("y", "q", "m")
            .build()
        ),
        "concat_pipes": (
            _b(cat)
            .scan("nation")
            .project("concat(n_name, '#', CAST(n_nationkey AS STRING)) AS tag")
            .sort("tag")
            .build()
        ),
        "guarded_division": (
            _b(cat)
            .scan("lineitem")
            .filter("l_orderkey <= 100")
            .project(
                "l_orderkey",
                "CAST(l_quantity AS DOUBLE) / 2 AS half_qty",
            )
            .sort("l_orderkey", "half_qty")
            .build()
        ),
        "full_join": (
            _b(cat)
            .scan("nation")
            .scan("supplier")
            .join("n_nationkey = s_nationkey", join_type="FULL")
            .project("n_name", "s_name")
            .sort("n_name NULLS FIRST", "s_name NULLS FIRST")
            .build()
        ),
    }


def test_sqlite_shapes_execute_on_real_engine(spark, cat, lite):
    """IR → SQLITE SQL → real sqlite3 ≡ IR → Spark, for every shape."""
    for name, plan in _shapes(cat).items():
        sql = to_sql(plan, SQLITE)
        want = _spark_rows(plan.to_df(cat))
        got = _sqlite_rows(lite, sql)
        assert got == want, f"{name} diverged\nSQL: {sql}"


def test_sqlite_structural_forms(cat):
    shapes = _shapes(cat)
    # SqliteSqlDialect.unparseOffsetFetch: OFFSET-only → LIMIT -1
    assert "LIMIT -1 OFFSET 2" in to_sql(shapes["offset_only"], SQLITE)
    # supportsAliasedValues() false → UNION ALL emulation
    v = to_sql(shapes["values_join"], SQLITE)
    assert "UNION ALL" in v and "VALUES" not in v.upper()
    # compound-SELECT operands must NOT be parenthesized subqueries
    u = to_sql(shapes["union_distinct"], SQLITE)
    assert ") UNION (" not in u and "UNION" in u
    # unit shorthands → strftime
    s = to_sql(shapes["strftime_units"], SQLITE)
    assert "strftime('%Y'" in s and "+ 2) / 3" in s
    # concat → || pipes
    c = to_sql(shapes["concat_pipes"], SQLITE)
    assert "||" in c and "concat(" not in c.lower()
    # SEMI → EXISTS (no SEMI JOIN keyword)
    e = to_sql(shapes["semi_join"], SQLITE)
    assert "EXISTS" in e and "SEMI" not in e.upper()
    # DATE literal → canonical TEXT literal (19-char form)
    q = to_sql(shapes["q01_shape"], SQLITE)
    assert "DATE '" not in q and "'1998-09-01 00:00:00'" in q


def test_sqlite_substring_maps_to_substr(cat, lite):
    """SqliteSqlDialect.java:44-56: SUBSTRING lands as SUBSTR."""
    plan = (
        _b(cat)
        .scan("region")
        .project("substring(r_name, 1, 2) AS ab")
        .sort("ab")
        .build()
    )
    sql = to_sql(plan, SQLITE)
    assert "substr(" in sql and "substring(" not in sql
    assert _sqlite_rows(lite, sql) == _spark_rows(plan.to_df(cat))


def test_sqlite_integer_division_refused(cat):
    plan = (
        _b(cat).scan("lineitem").project("l_orderkey / 2 AS h").build()
    )
    with pytest.raises(UnsupportedDialectExpression, match="integer division"):
        to_sql(plan, SQLITE)


def test_sqlite_grouping_refusals(cat):
    for gt in ("ROLLUP", "CUBE"):
        plan = (
            _b(cat)
            .scan("orders")
            .aggregate(
                ["o_orderstatus", "o_orderpriority"],
                ["COUNT(*) AS n"],
                group_type=gt,
            )
            .build()
        )
        with pytest.raises(UnsupportedDialectExpression, match="sqlite has no"):
            to_sql(plan, SQLITE)


def test_sqlite_setop_all_refused(cat):
    plan = (
        _b(cat)
        .scan("orders")
        .project("o_orderstatus AS status")
        .scan("orders")
        .project("o_orderstatus AS status")
        .minus(all=True)
        .build()
    )
    with pytest.raises(UnsupportedDialectExpression, match="EXCEPT ALL"):
        to_sql(plan, SQLITE)


def test_sqlite_function_and_cast_refusals(cat):
    for expr_text, pat in [
        ("stddev(o_totalprice) AS s", "stddev"),
        ("md5(o_orderstatus) AS h", "md5"),
        ("greatest(o_custkey, o_orderkey) AS g", "greatest"),
        ("concat_ws(',', o_orderstatus, o_orderpriority) AS c", "concat_ws"),
    ]:
        plan = _b(cat).scan("orders").project(expr_text).build()
        with pytest.raises(UnsupportedDialectExpression, match=pat):
            to_sql(plan, SQLITE)
    # DECIMAL / BOOLEAN casts: NUMERIC affinity would mangle values
    for ty in ("DECIMAL(18,2)", "BOOLEAN"):
        plan = (
            _b(cat)
            .scan("orders")
            .project(f"CAST(o_totalprice AS {ty}) AS x")
            .build()
        )
        with pytest.raises(UnsupportedDialectExpression, match="CAST target"):
            to_sql(plan, SQLITE)


def test_sqlite_like_is_case_sensitive_via_pragma(cat, lite):
    """SQLite's default LIKE is ASCII-case-insensitive (the opposite of
    Spark); the engine's connect-time PRAGMA restores Spark semantics.
    'a%' must match NO all-caps region name on both engines."""
    plan = (
        _b(cat)
        .scan("region")
        .filter("r_name LIKE 'a%'")
        .project("r_name")
        .build()
    )
    sql = to_sql(plan, SQLITE)
    assert _sqlite_rows(lite, sql) == _spark_rows(plan.to_df(cat)) == []
    # and the positive case still matches
    plan2 = (
        _b(cat)
        .scan("region")
        .filter("r_name LIKE 'A%'")
        .project("r_name")
        .sort("r_name")
        .build()
    )
    sql2 = to_sql(plan2, SQLITE)
    got = _sqlite_rows(lite, sql2)
    assert got == _spark_rows(plan2.to_df(cat)) and got


# ---------------------------------------------------------------------------
# federation: SQLiteEngine as a real external engine


@pytest.fixture()
def fed(spark):
    cat = Catalog(spark).register_parquet_dir(
        SF_DIR, tables=("customer", "orders")
    )
    engine = SQLiteEngine.from_parquet_dir(SF_DIR, ("nation", "region"))
    register_external(cat, "nation", engine)
    register_external(cat, "region", engine)
    return cat, engine


def test_sqlite_whole_query_pushdown(spark, fed):
    """All-external subtree → ONE query executed by real sqlite3."""
    cat, engine = fed
    plan = (
        RelBuilder(cat)
        .scan("nation")
        .scan("region")
        .join("n_regionkey = r_regionkey")
        .filter("r_name = 'ASIA'")
        .aggregate(["r_name"], ["COUNT(*) AS n_nations"])
        .build()
    )
    df = execute_federated(plan, cat)
    rows = df.collect()
    assert len(engine.queries_executed) == 1
    assert "JOIN" in engine.queries_executed[0].upper()
    assert rows[0].r_name == "ASIA" and rows[0].n_nations == 5


def test_sqlite_partial_pushdown_values_match_local(spark, fed):
    """External nation dim joined against the LOCAL customer table:
    remote reduce on sqlite3, local join in Spark, values equal the
    all-local run."""
    cat, engine = fed
    plan = (
        RelBuilder(cat)
        .scan("customer")
        .scan("nation")
        .join("c_nationkey = n_nationkey")
        .aggregate(["n_name"], ["COUNT(*) AS n_customers"])
        .sort("n_name")
        .build()
    )
    got = _spark_rows(execute_federated(plan, cat))
    assert len(engine.queries_executed) == 1
    assert "nation" in engine.queries_executed[0]

    local = Catalog(cat.spark).register_parquet_dir(
        SF_DIR, tables=("customer", "nation")
    )
    want = _spark_rows(
        RelBuilder(local)
        .scan("customer")
        .scan("nation")
        .join("c_nationkey = n_nationkey")
        .aggregate(["n_name"], ["COUNT(*) AS n_customers"])
        .sort("n_name")
        .build()
        .to_df(local)
    )
    assert got == want


def test_sqlite_schema_of_is_metadata_probe(fed):
    cat, engine = fed
    cols = engine.schema_of("nation")
    assert "n_nationkey" in cols and "n_name" in cols
    assert engine.queries_executed == []  # probe, not a pushed query
    with pytest.raises(KeyError):
        engine.schema_of("no_such_table")


# -- federation WRITE-back ≈ JdbcTableModificationRule (r5 session 3) --


def test_sqlite_insert_pushdown_roundtrip(spark, cat):
    """insert_sql emits through the dialect pipeline and executes on the
    real engine; the inserted rows come back through a federated read."""
    from calcite_spark.plans import ir
    from calcite_spark.sql.rel2sql import insert_sql

    lite = SQLiteEngine.from_parquet_dir(SF_DIR, ["nation"])
    vals = ir.Values(
        [(901, "ATLANTIS", 0), (902, "LEMURIA", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    sql = insert_sql(
        "nation", vals, SQLITE, columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    # the SQLite dialect renders VALUES as UNION ALL selects
    assert "UNION ALL" in sql and sql.startswith("INSERT INTO nation ")
    assert lite.execute_modify(sql) == 2
    got = lite.execute_arrow(
        "SELECT n_name FROM nation WHERE n_nationkey >= 900 ORDER BY n_nationkey"
    )
    assert got.column("n_name").to_pylist() == ["ATLANTIS", "LEMURIA"]


def test_sqlite_insert_select_and_delete_update(spark, cat):
    from calcite_spark.sql.rel2sql import delete_sql, insert_sql, update_sql

    lite = SQLiteEngine.from_parquet_dir(SF_DIR, ["nation", "region"])
    base = lite.execute_arrow("SELECT COUNT(*) c FROM nation").column("c")[0].as_py()
    # INSERT ... SELECT: re-insert a filtered slice shifted by 1000
    plan = (
        RelBuilder(cat)
        .scan("nation")
        .filter("n_regionkey = 0")
        .project("n_nationkey + 1000 AS n_nationkey", "n_name", "n_regionkey")
        .build()
    )
    n_slice = lite.execute_modify(
        insert_sql("nation", plan, SQLITE,
                   columns=["n_nationkey", "n_name", "n_regionkey"])
    )
    assert n_slice > 0
    after = lite.execute_arrow("SELECT COUNT(*) c FROM nation").column("c")[0].as_py()
    assert after == base + n_slice
    # UPDATE through the dialect expression pipeline
    assert lite.execute_modify(
        update_sql("nation", {"n_name": "lower(n_name)"},
                   "n_nationkey >= 1000", SQLITE)
    ) == n_slice
    low = lite.execute_arrow(
        "SELECT n_name FROM nation WHERE n_nationkey >= 1000 LIMIT 1"
    ).column("n_name")[0].as_py()
    assert low == low.lower()
    # DELETE restores the original contents
    assert lite.execute_modify(
        delete_sql("nation", "n_nationkey >= 1000", SQLITE)
    ) == n_slice
    assert lite.execute_arrow("SELECT COUNT(*) c FROM nation").column("c")[0].as_py() == base


def test_sqlite_write_refuses_unreplayable_expressions(cat):
    """A wrong INSERT persists — the write path refuses exactly like the
    read path (md5 has no SQLite form)."""
    from calcite_spark.sql.rel2sql import delete_sql, update_sql

    with pytest.raises(UnsupportedDialectExpression, match="md5"):
        delete_sql("nation", "md5(n_name) = 'x'", SQLITE)
    with pytest.raises(UnsupportedDialectExpression):
        update_sql("nation", {"n_name": "greatest(n_name, 'a')"}, "1 = 1", SQLITE)
