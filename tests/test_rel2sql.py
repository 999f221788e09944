"""rel2sql round-trip tests ≈ RelToSqlConverterTest.java: for each IR
shape, emit Spark SQL and check spark.sql(emitted) is value-identical to
the direct DataFrame lowering; emit DuckDB SQL for dialect-neutral
shapes and check DuckDB returns the same values (the oracle-generation
use case — oracle and query from ONE plan, no drift).
"""

from __future__ import annotations

import re

import pytest

from calcite_spark.plans.builder import RelBuilder
from calcite_spark.queries.inventory import catalog_for
from calcite_spark.sql.rel2sql import (
    DUCKDB,
    SPARK,
    UnsupportedDialectExpression,
    to_sql,
)
from tests.conftest import SF_DIR, assert_matches_oracle


@pytest.fixture(scope="module")
def cat(spark):
    c = catalog_for(spark, SF_DIR)
    c.register_all_views()
    return c


def _b(cat):
    return RelBuilder(cat)


def _plans(cat):
    """IR shapes covering q01–q16: scan/filter/project/agg (all group
    types)/joins (incl. semi/anti/outer)/set-ops/sort-limit/values/
    window."""
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
            .aggregate(["c_mktsegment"], ["COUNT(*) AS n", "SUM(o_totalprice) AS total"])
            .sort_limit(["total DESC"], fetch=3)
            .build()
        ),
        "left_join": (
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
        "rollup": (
            _b(cat)
            .scan("orders")
            .aggregate(
                ["o_orderstatus", "o_orderpriority"],
                ["COUNT(*) AS n"],
                group_type="ROLLUP",
            )
            .sort("o_orderstatus NULLS FIRST", "o_orderpriority NULLS FIRST")
            .build()
        ),
        "grouping_sets": (
            _b(cat)
            .scan("orders")
            .aggregate(
                ["o_orderstatus", "o_orderpriority"],
                ["COUNT(*) AS n"],
                group_type="GROUPING_SETS",
                grouping_sets=[["o_orderstatus"], ["o_orderpriority"], []],
            )
            .sort("o_orderstatus NULLS FIRST", "o_orderpriority NULLS FIRST")
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
        "except_all": (
            _b(cat)
            .scan("orders")
            .filter("o_custkey <= 200")
            .project("o_orderstatus AS status")
            .scan("orders")
            .filter("o_custkey <= 100")
            .project("o_orderstatus AS status")
            .minus(all=True)
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
    }


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=str)


def test_spark_roundtrip(spark, cat):
    """IR → Spark SQL → spark.sql ≡ IR → DataFrame for every shape."""
    for name, plan in _plans(cat).items():
        sql = to_sql(plan, SPARK)
        direct = _rows(plan.to_df(cat))
        via_sql = _rows(spark.sql(sql))
        assert via_sql == direct, f"{name}: rel2sql round-trip diverged\nSQL: {sql}"


DUCK_SHAPES = [
    "q01_shape",
    "join_agg_topk",
    "left_join",
    "semi_join",
    "anti_join",
    "rollup",
    "grouping_sets",
    "union_distinct",
    "except_all",
    "offset_fetch",
    "values_join",
    "window",
]


def test_duckdb_oracle_generation(spark, cat, duck):
    """The DuckDB dialect emits a runnable oracle FROM the same IR —
    the anti-drift path for CORRECTNESS oracles."""
    plans = _plans(cat)
    for name in DUCK_SHAPES:
        plan = plans[name]
        duck_sql = to_sql(plan, DUCKDB)
        df = plan.to_df(cat)
        assert_matches_oracle(df, duck, duck_sql), name


def test_duckdb_dialect_refuses_unknown_functions(cat):
    """A wrong oracle is worse than no oracle: Spark-only functions must
    raise, not silently pass through."""
    plan = (
        _b(cat).scan("documents").project("xxhash64(text) AS h").build()
    )
    with pytest.raises(UnsupportedDialectExpression, match="xxhash64"):
        to_sql(plan, DUCKDB)


def test_unsupported_node_raises(cat):
    plan = _b(cat).scan("lineitem").sample(0.1, seed=42).build()
    with pytest.raises(NotImplementedError):
        to_sql(plan, SPARK)


# PostgreSQL dialect: no PG server in this environment, so coverage is
# (a) textual, the same method as RelToSqlConverterTest.java expected-
# string checks, and (b) EXECUTABLE through DuckDB for the emitted forms
# that are also valid DuckDB (its SQL surface is PG-flavored), which
# covers the EXISTS lowering and EXTRACT/CAST rewrites with real rows.
PG_EXECUTABLE_SHAPES = [
    "q01_shape",
    "join_agg_topk",
    "left_join",
    "semi_join",   # exercises the [NOT] EXISTS lowering
    "anti_join",
    "rollup",
    "grouping_sets",
    "union_distinct",
    "except_all",
    "offset_fetch",
    "window",
]


def test_postgres_semi_anti_lowered_to_exists(cat):
    from calcite_spark.sql.rel2sql import POSTGRES

    plans = _plans(cat)
    semi = to_sql(plans["semi_join"], POSTGRES)
    anti = to_sql(plans["anti_join"], POSTGRES)
    assert "EXISTS (SELECT 1 FROM" in semi and "SEMI" not in semi.upper()
    assert "NOT EXISTS (SELECT 1 FROM" in anti and "ANTI" not in anti.upper()


def test_postgres_sql_executes_with_same_values(spark, cat, duck):
    from calcite_spark.sql.rel2sql import POSTGRES

    plans = _plans(cat)
    for name in PG_EXECUTABLE_SHAPES:
        plan = plans[name]
        pg_sql = to_sql(plan, POSTGRES)
        df = plan.to_df(cat)
        assert_matches_oracle(df, duck, pg_sql), name


def test_postgres_extract_and_cast_rewrites(cat, duck):
    from calcite_spark.sql.rel2sql import POSTGRES

    plan = (
        _b(cat)
        .scan("orders")
        .project(
            "year(o_orderdate) AS y",
            "CAST(o_custkey AS STRING) AS ck",
            "month(o_orderdate) AS m",
        )
        .build()
    )
    sql = to_sql(plan, POSTGRES)
    assert "EXTRACT(YEAR FROM o_orderdate)" in sql
    assert "EXTRACT(MONTH FROM o_orderdate)" in sql
    assert "AS TEXT" in sql and "STRING" not in sql
    # nested: the rewrite recurses into arguments
    nested = POSTGRES.expr("year(date_trunc('month', o_orderdate)) + 1")
    assert nested == "EXTRACT(YEAR FROM date_trunc('month', o_orderdate)) + 1"
    # unit names inside string literals are untouched
    lit = POSTGRES.expr("concat('year(', 'x')")
    assert lit == "concat('year(', 'x')"


def test_postgres_fn_map_and_refusal(cat):
    from calcite_spark.sql.rel2sql import POSTGRES

    assert POSTGRES.expr("instr(c_name, 'x')") == "strpos(c_name, 'x')"
    plan = _b(cat).scan("documents").project("xxhash64(text) AS h").build()
    with pytest.raises(UnsupportedDialectExpression, match="xxhash64"):
        to_sql(plan, POSTGRES)


# MySQL dialect ≈ MysqlSqlDialect.java. Same coverage strategy as PG:
# DuckDB executes the emitted forms that are dialect-neutral (the EXISTS
# lowering, the VALUES→UNION ALL emulation, set ops, offset/fetch);
# MySQL-only surface (WITH ROLLUP, ISNULL null-direction emulation,
# closed CAST list) is checked textually against expected strings.
MYSQL_EXECUTABLE_SHAPES = [
    "q01_shape",
    "join_agg_topk",
    "left_join",
    "semi_join",
    "anti_join",
    "union_distinct",
    "except_all",
    "offset_fetch",
    "values_join",  # exercises the SELECT ... UNION ALL VALUES emulation
    "window",
]


def test_mysql_sql_executes_with_same_values(spark, cat, duck):
    from calcite_spark.sql.rel2sql import MYSQL

    plans = _plans(cat)
    for name in MYSQL_EXECUTABLE_SHAPES:
        plan = plans[name]
        my_sql = to_sql(plan, MYSQL)
        df = plan.to_df(cat)
        assert_matches_oracle(df, duck, my_sql), name


def test_mysql_rollup_and_null_direction(cat):
    from calcite_spark.sql.rel2sql import MYSQL

    plans = _plans(cat)
    sql = to_sql(plans["rollup"], MYSQL)
    assert "WITH ROLLUP" in sql and "ROLLUP (" not in sql
    # NULLS FIRST has no MySQL syntax: emulated with an ISNULL prefix key
    assert "ISNULL(o_orderstatus) DESC, o_orderstatus" in sql
    assert "NULLS" not in sql.upper()


def test_mysql_cube_and_grouping_sets_refused(cat):
    from calcite_spark.sql.rel2sql import MYSQL

    plans = _plans(cat)
    with pytest.raises(UnsupportedDialectExpression, match="GROUPING SETS"):
        to_sql(plans["grouping_sets"], MYSQL)
    cube = (
        _b(cat)
        .scan("orders")
        .aggregate(["o_orderstatus"], ["COUNT(*) AS n"], group_type="CUBE")
        .build()
    )
    with pytest.raises(UnsupportedDialectExpression, match="CUBE"):
        to_sql(cube, MYSQL)


def test_mysql_cast_types_and_refusals(cat):
    from calcite_spark.sql.rel2sql import MYSQL

    assert (
        MYSQL.expr("CAST(o_custkey AS STRING)") == "CAST(o_custkey AS CHAR)"
    )
    assert MYSQL.expr("CAST(x AS BIGINT)") == "CAST(x AS SIGNED)"
    # date_trunc has no MySQL form — refuse, never emit wrong SQL
    with pytest.raises(UnsupportedDialectExpression, match="date_trunc"):
        MYSQL.expr("date_trunc('month', o_orderdate)")
    with pytest.raises(UnsupportedDialectExpression, match="xxhash64"):
        MYSQL.expr("xxhash64(text)")


def test_mysql_semi_anti_lowered_to_exists(cat):
    from calcite_spark.sql.rel2sql import MYSQL

    plans = _plans(cat)
    semi = to_sql(plans["semi_join"], MYSQL)
    anti = to_sql(plans["anti_join"], MYSQL)
    assert "EXISTS (SELECT 1 FROM" in semi and "SEMI" not in semi.upper()
    assert "NOT EXISTS (SELECT 1 FROM" in anti


# BigQuery dialect ≈ BigQuerySqlDialect.java. GoogleSQL's set-op
# DISTINCT keyword and the VALUES emulation happen to be DuckDB-valid,
# so almost every shape value-verifies; TIMESTAMP_TRUNC and the type
# map are textual.
BQ_EXECUTABLE_SHAPES = [
    "q01_shape",
    "join_agg_topk",
    "left_join",
    "semi_join",
    "anti_join",
    "rollup",
    "grouping_sets",
    "union_distinct",  # emitted as UNION DISTINCT (bare UNION is invalid BQ)
    "offset_fetch",
    "values_join",
    "window",
]


def test_bigquery_sql_executes_with_same_values(spark, cat, duck):
    from calcite_spark.sql.rel2sql import BIGQUERY

    plans = _plans(cat)
    for name in BQ_EXECUTABLE_SHAPES:
        plan = plans[name]
        bq_sql = to_sql(plan, BIGQUERY)
        df = plan.to_df(cat)
        assert_matches_oracle(df, duck, bq_sql), name


def test_bigquery_setop_keywords(cat):
    from calcite_spark.sql.rel2sql import BIGQUERY

    plans = _plans(cat)
    sql = to_sql(plans["union_distinct"], BIGQUERY)
    assert "UNION DISTINCT" in sql
    with pytest.raises(UnsupportedDialectExpression, match="EXCEPT ALL"):
        to_sql(plans["except_all"], BIGQUERY)


def test_bigquery_rewrites_and_refusals(cat):
    from calcite_spark.sql.rel2sql import BIGQUERY

    assert (
        BIGQUERY.expr("date_trunc('month', o_orderdate)")
        == "TIMESTAMP_TRUNC(o_orderdate, MONTH)"
    )
    assert (
        BIGQUERY.expr("year(o_orderdate) + 1")
        == "EXTRACT(YEAR FROM o_orderdate) + 1"
    )
    assert (
        BIGQUERY.expr("CAST(o_custkey AS STRING)")
        == "CAST(o_custkey AS STRING)"
    )
    assert BIGQUERY.expr("CAST(x AS DOUBLE)") == "CAST(x AS FLOAT64)"
    assert BIGQUERY.expr("power(x, 2)") == "pow(x, 2)"
    # md5: BQ returns BYTES where Spark returns a hex STRING — silently
    # different values, so the contract refuses rather than translates
    with pytest.raises(UnsupportedDialectExpression, match="md5"):
        BIGQUERY.expr("md5(text)")
    with pytest.raises(UnsupportedDialectExpression, match="no unit"):
        BIGQUERY.expr("date_trunc('millennium', o_orderdate)")


def test_bigquery_values_emulated_as_union(cat):
    from calcite_spark.sql.rel2sql import BIGQUERY

    plans = _plans(cat)
    sql = to_sql(plans["values_join"], BIGQUERY)
    assert "VALUES" not in sql.upper()
    assert "SELECT 0 AS rk, 'amer' AS zone UNION ALL SELECT 1, 'emea'" in sql


# Oracle dialect ≈ OracleSqlDialect.java. The ANSI row-limiting clause
# (OFFSET ... ROWS FETCH NEXT ... ROWS ONLY) and the EXISTS lowering are
# DuckDB-valid, so most shapes value-verify; FROM DUAL, TRUNC and the
# NUMBER/VARCHAR2 type map are textual.
ORACLE_EXECUTABLE_SHAPES = [
    "q01_shape",
    "join_agg_topk",   # exercises FETCH NEXT n ROWS ONLY
    "left_join",
    "semi_join",
    "anti_join",
    "rollup",
    "grouping_sets",
    "union_distinct",
    "except_all",
    "offset_fetch",    # OFFSET n ROWS FETCH NEXT m ROWS ONLY
    "window",
]


def test_oracle_sql_executes_with_same_values(spark, cat, duck):
    from calcite_spark.sql.rel2sql import ORACLE

    plans = _plans(cat)
    for name in ORACLE_EXECUTABLE_SHAPES:
        plan = plans[name]
        ora_sql = to_sql(plan, ORACLE)
        df = plan.to_df(cat)
        assert_matches_oracle(df, duck, ora_sql), name


def test_oracle_fetch_and_dual(cat):
    from calcite_spark.sql.rel2sql import ORACLE

    plans = _plans(cat)
    sql = to_sql(plans["offset_fetch"], ORACLE)
    assert "OFFSET 5 ROWS FETCH NEXT 10 ROWS ONLY" in sql
    assert "LIMIT" not in sql.upper()
    vals = to_sql(plans["values_join"], ORACLE)
    assert "VALUES" not in vals.upper()
    assert "SELECT 0 AS rk, 'amer' AS zone FROM DUAL UNION ALL SELECT 1, 'emea' FROM DUAL" in vals


def test_oracle_rewrites_and_refusals(cat):
    from calcite_spark.sql.rel2sql import ORACLE

    assert (
        ORACLE.expr("year(o_orderdate) + 1")
        == "EXTRACT(YEAR FROM o_orderdate) + 1"
    )
    assert (
        ORACLE.expr("date_trunc('month', o_orderdate)")
        == "TRUNC(o_orderdate, 'MM')"
    )
    assert (
        ORACLE.expr("CAST(o_custkey AS STRING)")
        == "CAST(o_custkey AS VARCHAR2(4000))"
    )
    assert ORACLE.expr("CAST(x AS INT)") == "CAST(x AS NUMBER(10))"
    assert ORACLE.expr("substring(c_name, 1, 3)") == "SUBSTR(c_name, 1, 3)"
    # Oracle CONCAT/|| treat NULL as '' where Spark returns NULL —
    # silently different values, so refuse rather than translate
    with pytest.raises(UnsupportedDialectExpression, match="concat"):
        ORACLE.expr("concat(c_name, 'x')")
    # no boolean type in Oracle SQL: CAST must refuse, not pass through
    with pytest.raises(UnsupportedDialectExpression, match="no CAST target"):
        ORACLE.expr("CAST(x AS BOOLEAN)")
    with pytest.raises(UnsupportedDialectExpression, match="no format element"):
        ORACLE.expr("date_trunc('second', o_orderdate)")
    with pytest.raises(UnsupportedDialectExpression, match="xxhash64"):
        ORACLE.expr("xxhash64(text)")


def test_oracle_semi_anti_lowered_to_exists(cat):
    from calcite_spark.sql.rel2sql import ORACLE

    plans = _plans(cat)
    semi = to_sql(plans["semi_join"], ORACLE)
    assert "EXISTS (SELECT 1 FROM" in semi and "SEMI" not in semi.upper()


# MSSQL dialect ≈ MssqlSqlDialect.java. OFFSET/FETCH, the EXISTS
# lowering, the CASE WHEN null-direction emulation and the FROM-position
# VALUES constructor are all DuckDB-valid; TOP, LEN and the T-SQL type
# map are textual.
MSSQL_EXECUTABLE_SHAPES = [
    "q01_shape",
    "join_agg_topk",   # fetch+order → OFFSET 0 ROWS FETCH NEXT n ROWS ONLY
    "left_join",
    "semi_join",
    "anti_join",
    "rollup",          # NULLS FIRST keys → CASE WHEN ... IS NULL emulation
    "grouping_sets",
    "union_distinct",
    "offset_fetch",
    "values_join",
    "window",
]


def test_mssql_sql_executes_with_same_values(spark, cat, duck):
    from calcite_spark.sql.rel2sql import MSSQL

    plans = _plans(cat)
    for name in MSSQL_EXECUTABLE_SHAPES:
        plan = plans[name]
        ms_sql = to_sql(plan, MSSQL)
        df = plan.to_df(cat)
        assert_matches_oracle(df, duck, ms_sql), name


def test_mssql_top_and_offset_fetch(cat):
    from calcite_spark.sql.rel2sql import MSSQL

    plans = _plans(cat)
    # fetch + ORDER BY: T-SQL requires OFFSET before FETCH
    sql = to_sql(plans["join_agg_topk"], MSSQL)
    assert "OFFSET 0 ROWS FETCH NEXT 3 ROWS ONLY" in sql
    # fetch with NO order: SELECT TOP n wrap
    top = (
        _b(cat).scan("customer").project("c_custkey").sort_limit([], fetch=7).build()
    )
    top_sql = to_sql(top, MSSQL)
    assert top_sql.startswith("SELECT TOP 7 * FROM (")
    # offset with no order is a T-SQL error — refuse
    off = (
        _b(cat).scan("customer").project("c_custkey").sort_limit([], offset=3).build()
    )
    with pytest.raises(UnsupportedDialectExpression, match="ORDER BY"):
        to_sql(off, MSSQL)


def test_mssql_null_direction_emulation(cat):
    from calcite_spark.sql.rel2sql import MSSQL

    plans = _plans(cat)
    sql = to_sql(plans["rollup"], MSSQL)
    assert "CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END DESC, o_orderstatus" in sql
    assert "NULLS" not in sql.upper()


def test_mssql_rewrites_and_refusals(cat):
    from calcite_spark.sql.rel2sql import MSSQL

    assert MSSQL.expr("length(c_name)") == "LEN(c_name)"
    assert MSSQL.expr("hour(ts) + minute(ts)") == "DATEPART(HOUR, ts) + DATEPART(MINUTE, ts)"
    assert MSSQL.expr("round(x)") == "round(x, 0)"
    assert MSSQL.expr("round(x, 2)") == "round(x, 2)"
    assert MSSQL.expr("stddev(x)") == "STDEV(x)"
    assert MSSQL.expr("CAST(x AS STRING)") == "CAST(x AS VARCHAR(MAX))"
    assert MSSQL.expr("CAST(x AS BOOLEAN)") == "CAST(x AS BIT)"
    # T-SQL CONCAT treats NULL as '' where Spark returns NULL — refuse
    with pytest.raises(UnsupportedDialectExpression, match="concat"):
        MSSQL.expr("concat(a, b)")
    with pytest.raises(UnsupportedDialectExpression, match="mod"):
        MSSQL.expr("mod(a, b)")
    with pytest.raises(UnsupportedDialectExpression, match="extract"):
        MSSQL.expr("extract(YEAR FROM ts)")


def test_mssql_intersect_except_all_refused(cat):
    from calcite_spark.sql.rel2sql import MSSQL

    plans = _plans(cat)
    with pytest.raises(UnsupportedDialectExpression, match="EXCEPT ALL"):
        to_sql(plans["except_all"], MSSQL)


# Trino dialect ≈ PrestoSqlDialect.java — near-ANSI, so every shape is
# DuckDB-executable; the rename map and type spellings are textual.
TRINO_EXECUTABLE_SHAPES = DUCK_SHAPES  # all 12


def test_trino_sql_executes_with_same_values(spark, cat, duck):
    from calcite_spark.sql.rel2sql import TRINO

    plans = _plans(cat)
    for name in TRINO_EXECUTABLE_SHAPES:
        plan = plans[name]
        tr_sql = to_sql(plan, TRINO)
        df = plan.to_df(cat)
        assert_matches_oracle(df, duck, tr_sql), name


def test_trino_rewrites_and_refusals(cat):
    from calcite_spark.sql.rel2sql import TRINO

    assert TRINO.expr("instr(c_name, 'x')") == "strpos(c_name, 'x')"
    assert TRINO.expr("levenshtein(a, b)") == "levenshtein_distance(a, b)"
    assert TRINO.expr("size(arr)") == "cardinality(arr)"
    assert TRINO.expr("sort_array(arr)") == "array_sort(arr)"
    assert TRINO.expr("CAST(x AS STRING)") == "CAST(x AS VARCHAR)"
    assert TRINO.expr("date_trunc('month', ts)") == "date_trunc('month', ts)"
    # Trino repeat(elem, n) builds an ARRAY — different semantics, refuse
    with pytest.raises(UnsupportedDialectExpression, match="repeat"):
        TRINO.expr("repeat(c_name, 2)")
    # Trino md5 takes/returns VARBINARY where Spark returns hex STRING
    with pytest.raises(UnsupportedDialectExpression, match="md5"):
        TRINO.expr("md5(text)")


def test_trino_ansi_fetch(cat):
    from calcite_spark.sql.rel2sql import TRINO

    plans = _plans(cat)
    sql = to_sql(plans["offset_fetch"], TRINO)
    assert "OFFSET 5 ROWS FETCH NEXT 10 ROWS ONLY" in sql


# Hive dialect ≈ HiveSqlDialect.java. HiveQL is Spark SQL's ancestor:
# the EXISTS lowering, VALUES→UNION ALL emulation and set ops are
# DuckDB-valid; LEFT SEMI JOIN, TRUNC and the OFFSET refusal are
# textual.
HIVE_EXECUTABLE_SHAPES = [
    "q01_shape",
    "join_agg_topk",
    "left_join",
    "anti_join",       # NOT EXISTS lowering
    "rollup",
    "grouping_sets",
    "union_distinct",
    "except_all",
    "values_join",     # SELECT ... UNION ALL emulation
    "window",
]


def test_hive_sql_executes_with_same_values(spark, cat, duck):
    from calcite_spark.sql.rel2sql import HIVE

    plans = _plans(cat)
    for name in HIVE_EXECUTABLE_SHAPES:
        plan = plans[name]
        hv_sql = to_sql(plan, HIVE)
        df = plan.to_df(cat)
        assert_matches_oracle(df, duck, hv_sql), name


def test_hive_semi_native_offset_refused(cat):
    from calcite_spark.sql.rel2sql import HIVE

    plans = _plans(cat)
    semi = to_sql(plans["semi_join"], HIVE)
    assert "LEFT SEMI JOIN" in semi
    with pytest.raises(UnsupportedDialectExpression, match="OFFSET"):
        to_sql(plans["offset_fetch"], HIVE)


def test_hive_trunc_rewrite_and_refusals(cat):
    from calcite_spark.sql.rel2sql import HIVE

    assert (
        HIVE.expr("date_trunc('month', o_orderdate)")
        == "TRUNC(o_orderdate, 'MM')"
    )
    with pytest.raises(UnsupportedDialectExpression, match="year/quarter/month"):
        HIVE.expr("date_trunc('hour', o_orderdate)")
    with pytest.raises(UnsupportedDialectExpression, match="xxhash64"):
        HIVE.expr("xxhash64(text)")
    # md5 IS shared: both engines return the hex string form
    assert HIVE.expr("md5(text)") == "md5(text)"


# Snowflake dialect ≈ SnowflakeSqlDialect.java — near-ANSI, everything
# except the rename map is DuckDB-executable.
SNOWFLAKE_EXECUTABLE_SHAPES = [
    "q01_shape",
    "join_agg_topk",
    "left_join",
    "semi_join",
    "anti_join",
    "rollup",
    "grouping_sets",
    "union_distinct",
    "offset_fetch",
    "values_join",
    "window",
]


def test_snowflake_sql_executes_with_same_values(spark, cat, duck):
    from calcite_spark.sql.rel2sql import SNOWFLAKE

    plans = _plans(cat)
    for name in SNOWFLAKE_EXECUTABLE_SHAPES:
        plan = plans[name]
        sf_sql = to_sql(plan, SNOWFLAKE)
        df = plan.to_df(cat)
        assert_matches_oracle(df, duck, sf_sql), name


def test_snowflake_renames_and_refusals(cat):
    from calcite_spark.sql.rel2sql import SNOWFLAKE

    plans = _plans(cat)
    assert SNOWFLAKE.expr("if(a > 1, 'x', 'y')") == "IFF(a > 1, 'x', 'y')"
    assert SNOWFLAKE.expr("startswith(c_name, 'Cu')") == "STARTSWITH(c_name, 'Cu')"
    assert SNOWFLAKE.expr("size(arr)") == "ARRAY_SIZE(arr)"
    # concat_ws: Snowflake NULLs the whole result on any NULL argument
    # where Spark skips nulls — silently different, refuse
    with pytest.raises(UnsupportedDialectExpression, match="concat_ws"):
        SNOWFLAKE.expr("concat_ws(',', a, b)")
    with pytest.raises(UnsupportedDialectExpression, match="instr"):
        SNOWFLAKE.expr("instr(c_name, 'x')")
    with pytest.raises(UnsupportedDialectExpression, match="EXCEPT ALL"):
        to_sql(plans["except_all"], SNOWFLAKE)


# ClickHouse dialect ≈ ClickHouseSqlDialect.java. The emitted SQL is
# largely ClickHouse-only (toDate literals, LIMIT o, f; WITH ROLLUP),
# so coverage is split: the shapes whose emission happens to be valid
# DuckDB run with real rows, the ClickHouse-only forms are pinned
# textually (the RelToSqlConverterTest.java method).
CLICKHOUSE_EXECUTABLE_SHAPES = [
    "join_agg_topk",   # plain aggregates + LIMIT n
    "left_join",
    "grouping_sets",   # native GROUP BY GROUPING SETS
    "union_distinct",  # UNION DISTINCT is valid DuckDB too
    "values_join",     # SELECT ... UNION ALL emulation
]


def test_clickhouse_sql_executes_with_same_values(spark, cat, duck):
    from calcite_spark.sql.rel2sql import CLICKHOUSE

    plans = _plans(cat)
    for name in CLICKHOUSE_EXECUTABLE_SHAPES:
        plan = plans[name]
        ch_sql = to_sql(plan, CLICKHOUSE)
        df = plan.to_df(cat)
        assert_matches_oracle(df, duck, ch_sql), name


def test_clickhouse_dialect_forms(cat):
    from calcite_spark.sql.rel2sql import CLICKHOUSE

    plans = _plans(cat)
    # typed literals → to* constructors (unparseDateTimeLiteral)
    assert (
        CLICKHOUSE.expr("l_shipdate <= DATE '1998-09-01'")
        == "l_shipdate <= toDate('1998-09-01')"
    )
    assert (
        CLICKHOUSE.expr("ts < TIMESTAMP '2024-01-01 00:00:00'")
        == "ts < toDateTime('2024-01-01 00:00:00')"
    )
    # a literal inside a string stays a string
    assert CLICKHOUSE.expr("x = 'DATE ''1998'''") == "x = 'DATE ''1998'''"
    # getCastSpec closed list
    assert CLICKHOUSE.expr("CAST(x AS double)") == "CAST(x AS Float64)"
    assert CLICKHOUSE.expr("CAST(x AS string)") == "CAST(x AS String)"
    assert CLICKHOUSE.expr("CAST(x AS tinyint)") == "CAST(x AS Int8)"
    # camelCase statistical family + uniq
    assert (
        CLICKHOUSE.expr("stddev(x) + var_pop(y) + approx_count_distinct(z)")
        == "stddevSamp(x) + varPop(y) + uniq(z)"
    )
    # LIMIT offset, fetch (unparseOffsetFetch)
    sql = to_sql(plans["offset_fetch"], CLICKHOUSE)
    assert "LIMIT 5, 10" in sql
    # WITH ROLLUP / WITH CUBE group forms
    assert "WITH ROLLUP" in to_sql(plans["rollup"], CLICKHOUSE)
    # set-op spelling is ALWAYS explicit (CH INTERSECT/EXCEPT default
    # to bag semantics — the inverse of the standard)
    assert CLICKHOUSE.setop_kw("INTERSECT") == "INTERSECT DISTINCT"
    assert CLICKHOUSE.setop_kw("INTERSECT_ALL") == "INTERSECT"
    assert CLICKHOUSE.setop_kw("EXCEPT") == "EXCEPT DISTINCT"
    assert CLICKHOUSE.setop_kw("EXCEPT_ALL") == "EXCEPT"
    assert "UNION DISTINCT" in to_sql(plans["union_distinct"], CLICKHOUSE)
    # bool literal → condition form (unparseBoolLiteralToCondition)
    assert CLICKHOUSE.literal(True) == "1" and CLICKHOUSE.literal(False) == "0"


def test_clickhouse_refusals(cat):
    from calcite_spark.sql.rel2sql import CLICKHOUSE

    plans = _plans(cat)
    # supportsWindowFunctions() = false
    with pytest.raises(UnsupportedDialectExpression, match="window"):
        to_sql(plans["window"], CLICKHOUSE)
    # no SEMI keyword and no decorrelated EXISTS
    with pytest.raises(UnsupportedDialectExpression, match="SEMI"):
        to_sql(plans["semi_join"], CLICKHOUSE)
    # OFFSET requires a fetch count in the LIMIT o, f form
    with pytest.raises(UnsupportedDialectExpression, match="fetch"):
        CLICKHOUSE.fetch_clause(5, None, True)
    # BINARY has no ClickHouse cast target
    with pytest.raises(UnsupportedDialectExpression, match="binary"):
        CLICKHOUSE.expr("CAST(x AS binary)")
    # md5 returns bytes in CH, hex string in Spark — refuse
    with pytest.raises(UnsupportedDialectExpression, match="md5"):
        CLICKHOUSE.expr("md5(text)")


# Redshift dialect ≈ RedshiftSqlDialect.java — PostgreSQL-descended, so
# nearly everything lands on the DuckDB-executable surface.
REDSHIFT_EXECUTABLE_SHAPES = [
    "q01_shape",
    "join_agg_topk",
    "left_join",
    "semi_join",
    "anti_join",
    "rollup",
    "grouping_sets",
    "union_distinct",
    "offset_fetch",
    "values_join",
    "window",
]


def test_redshift_sql_executes_with_same_values(spark, cat, duck):
    from calcite_spark.sql.rel2sql import REDSHIFT

    plans = _plans(cat)
    for name in REDSHIFT_EXECUTABLE_SHAPES:
        plan = plans[name]
        rs_sql = to_sql(plan, REDSHIFT)
        df = plan.to_df(cat)
        assert_matches_oracle(df, duck, rs_sql), name


def test_redshift_forms_and_refusals(cat):
    from calcite_spark.sql.rel2sql import REDSHIFT

    plans = _plans(cat)
    # getCastSpec: the quoted-identifier-safe spellings
    assert REDSHIFT.expr("CAST(x AS tinyint)") == "CAST(x AS int2)"
    assert REDSHIFT.expr("CAST(x AS double)") == "CAST(x AS float8)"
    assert REDSHIFT.expr("CAST(x AS binary)") == "CAST(x AS VARBYTE)"
    assert REDSHIFT.expr("instr(a, 'b')") == "strpos(a, 'b')"
    assert REDSHIFT.expr("year(d)") == "EXTRACT(YEAR FROM d)"
    # no ARRAY type: the list machinery refuses instead of landing on
    # SUPER with different semantics
    with pytest.raises(UnsupportedDialectExpression, match="collect_list"):
        REDSHIFT.expr("collect_list(x)")
    # DISTINCT set ops only
    with pytest.raises(UnsupportedDialectExpression, match="EXCEPT ALL"):
        to_sql(plans["except_all"], REDSHIFT)
    # no FROM-position VALUES (supportsAliasedValues = false)
    assert "UNION ALL" in to_sql(plans["values_join"], REDSHIFT)
    assert "VALUES" not in to_sql(plans["values_join"], REDSHIFT)


def test_review_r5_regressions(cat):
    """Pins for the round-5 self-review findings."""
    from calcite_spark.sql.rel2sql import BIGQUERY, CLICKHOUSE, ORACLE

    plans = _plans(cat)
    # Oracle rejects AS before table aliases (ORA-00933): derived
    # tables and the VALUES emulation must emit bare "(...) t"
    ora = to_sql(plans["values_join"], ORACLE)
    # table aliases are now FRESH (t1, t2, ... — duplicate-alias fix)
    # but must still be the bare Oracle form, never "AS tN"
    assert not re.search(r"\bAS t\d+\b", ora), ora
    assert re.search(r"\) t\d+\b", ora), ora
    # Spark date_trunc('week') is Monday-anchored; bare BigQuery WEEK
    # is WEEK(SUNDAY) — the unit must be ISOWEEK
    assert (
        BIGQUERY.expr("date_trunc('week', ts)") == "TIMESTAMP_TRUNC(ts, ISOWEEK)"
    )
    # refused cast targets survive into nested CASTs
    with pytest.raises(UnsupportedDialectExpression, match="binary"):
        CLICKHOUSE.expr("CAST(CAST(x AS binary) AS string)")


# ---------------------------------------------------------------------------
# round-5 batch 2: Presto, Vertica, Teradata, Derby, StarRocks, Doris


PRESTO_EXECUTABLE_SHAPES = DUCK_SHAPES  # near-ANSI: all 12 run on DuckDB


def test_presto_sql_executes_with_same_values(spark, cat, duck):
    from calcite_spark.sql.rel2sql import PRESTO

    plans = _plans(cat)
    for name in PRESTO_EXECUTABLE_SHAPES:
        plan = plans[name]
        sql = to_sql(plan, PRESTO)
        assert_matches_oracle(plan.to_df(cat), duck, sql), name


def test_presto_forms_and_refusals(cat):
    from calcite_spark.sql.rel2sql import PRESTO

    plans = _plans(cat)
    # OFFSET n LIMIT m order (unparseUsingLimit), not ANSI OFFSET/FETCH
    sql = to_sql(plans["offset_fetch"], PRESTO)
    assert "OFFSET 5 LIMIT 10" in sql and "FETCH" not in sql
    # NullCollation.LAST: un-annotated ASC gets the IS NULL prefix so
    # Spark's nulls-first semantics survive; DESC (both nulls-last)
    # passes through bare
    assert PRESTO.sort_key("c_name") == "(c_name IS NULL) DESC, c_name"
    assert PRESTO.sort_key("c_name DESC") == "c_name DESC"
    assert (
        PRESTO.sort_key("c_name DESC NULLS FIRST")
        == "(c_name IS NULL) DESC, c_name DESC"
    )
    assert PRESTO.sort_key("c_name NULLS LAST") == "c_name"
    # supportsApproxCountDistinct
    assert (
        PRESTO.expr("approx_count_distinct(x)") == "approx_count_distinct(x)"
    )
    # restricted aggregate set: stddev family refuses (Trino allows it)
    with pytest.raises(UnsupportedDialectExpression, match="stddev"):
        PRESTO.expr("stddev(x)")
    with pytest.raises(UnsupportedDialectExpression, match="corr"):
        PRESTO.expr("corr(x, y)")


VERTICA_EXECUTABLE_SHAPES = [
    s for s in DUCK_SHAPES if s != "except_all"  # Vertica: DISTINCT set ops
]


def test_vertica_sql_executes_with_same_values(spark, cat, duck):
    from calcite_spark.sql.rel2sql import VERTICA

    plans = _plans(cat)
    for name in VERTICA_EXECUTABLE_SHAPES:
        plan = plans[name]
        sql = to_sql(plan, VERTICA)
        assert_matches_oracle(plan.to_df(cat), duck, sql), name


def test_vertica_forms(cat):
    from calcite_spark.sql.rel2sql import VERTICA

    plans = _plans(cat)
    # unparseFetchUsingLimit: LIMIT/OFFSET, not ANSI FETCH
    sql = to_sql(plans["offset_fetch"], VERTICA)
    assert "LIMIT 10 OFFSET 5" in sql
    # PG inheritance: EXISTS lowering + EXTRACT shorthand rewrite
    semi = to_sql(plans["semi_join"], VERTICA)
    assert "EXISTS" in semi
    assert VERTICA.expr("year(o_orderdate)") == "EXTRACT(YEAR FROM o_orderdate)"
    assert VERTICA.expr("CAST(x AS STRING)") == "CAST(x AS TEXT)"


def test_teradata_top_and_refusals(cat, duck, spark):
    from calcite_spark.sql.rel2sql import TERADATA

    plans = _plans(cat)
    # executable subset through DuckDB (EXISTS lowering, ROLLUP, VALUES
    # emulation are dialect-neutral)
    for name in ("q01_shape", "left_join", "semi_join", "anti_join",
                 "rollup", "grouping_sets", "union_distinct", "values_join",
                 "window"):
        plan = plans[name]
        sql = to_sql(plan, TERADATA)
        assert_matches_oracle(plan.to_df(cat), duck, sql), name
    # no OFFSET clause at all
    with pytest.raises(UnsupportedDialectExpression, match="OFFSET"):
        to_sql(plans["offset_fetch"], TERADATA)
    # ordered fetch would drop the ORDER BY under a TOP wrap → refuse
    with pytest.raises(UnsupportedDialectExpression, match="QUALIFY"):
        to_sql(plans["join_agg_topk"], TERADATA)
    # unordered fetch is SELECT TOP n
    from calcite_spark.plans.builder import RelBuilder

    plain = (
        RelBuilder(cat).scan("customer").project("c_custkey").build()
    )
    from calcite_spark.plans import ir as _ir

    top = _ir.Sort(keys=(), fetch=7, inputs=(plain,))
    assert "SELECT TOP 7" in to_sql(top, TERADATA)
    # stddev canonicalizes to the _SAMP spelling
    assert TERADATA.expr("stddev(x)") == "stddev_samp(x)"


DERBY_EXECUTABLE_SHAPES = [
    "q01_shape",
    "join_agg_topk",
    "left_join",
    "semi_join",
    "anti_join",
    "union_distinct",
    "except_all",
    "offset_fetch",
    "values_join",
    "window",
]


def test_derby_sql_executes_with_same_values(spark, cat, duck):
    from calcite_spark.sql.rel2sql import DERBY

    plans = _plans(cat)
    for name in DERBY_EXECUTABLE_SHAPES:
        plan = plans[name]
        sql = to_sql(plan, DERBY)
        assert_matches_oracle(plan.to_df(cat), duck, sql), name


def test_derby_forms_and_refusals(cat):
    from calcite_spark.sql.rel2sql import DERBY

    plans = _plans(cat)
    # ANSI OFFSET/FETCH row limiting
    sql = to_sql(plans["offset_fetch"], DERBY)
    assert "OFFSET 5 ROWS FETCH NEXT 10 ROWS ONLY" in sql
    # DerbySqlDialect.java's one rule: CHAR_LENGTH → LENGTH
    assert DERBY.expr("char_length(c_name)") == "length(c_name)"
    # tiny engine surface: only ROW_NUMBER among window functions
    with pytest.raises(UnsupportedDialectExpression, match="rank"):
        DERBY.expr("rank() OVER (ORDER BY x)")
    with pytest.raises(UnsupportedDialectExpression, match="regexp_replace"):
        DERBY.expr("regexp_replace(x, 'a', 'b')")
    with pytest.raises(UnsupportedDialectExpression, match="no ROLLUP"):
        to_sql(plans["rollup"], DERBY)


def test_starrocks_doris_mysql_family(cat, duck, spark):
    from calcite_spark.sql.rel2sql import DORIS, STARROCKS

    plans = _plans(cat)
    # inherit the MySQL executable surface
    for d in (STARROCKS, DORIS):
        for name in ("q01_shape", "semi_join", "union_distinct", "values_join"):
            plan = plans[name]
            sql = to_sql(plan, d)
            assert_matches_oracle(plan.to_df(cat), duck, sql), (d.name, name)
        # MySQL structural inheritance: WITH ROLLUP + VALUES emulation
        assert "WITH ROLLUP" in to_sql(plans["rollup"], d)
        with pytest.raises(UnsupportedDialectExpression):
            d.cube_clause(["a"])
        # StarRocks additions over MySQL: approx_count_distinct + date_trunc
        assert d.expr("approx_count_distinct(x)") == "approx_count_distinct(x)"
        assert d.expr("date_trunc('month', ts)") == "date_trunc('month', ts)"
    from calcite_spark.sql.rel2sql import MYSQL

    with pytest.raises(UnsupportedDialectExpression):
        MYSQL.expr("approx_count_distinct(x)")  # the MySQL base refuses


def test_review_r5_batch2_regressions(spark, cat, duck):
    """Pins for the second round-5 self-review batch."""
    from calcite_spark.plans import ir as _ir
    from calcite_spark.sql.rel2sql import MSSQL, MYSQL, ORACLE, POSTGRES

    # 1. explicit NULL placement on engines whose default diverges from
    #    Spark: an un-annotated ASC key must carry NULLS FIRST
    for d in (POSTGRES, ORACLE):
        assert d.sort_key("c_name").endswith("NULLS FIRST"), d.name
        assert d.sort_key("c_name DESC").endswith("NULLS LAST"), d.name
        assert d.sort_key("c_name DESC NULLS FIRST").endswith("NULLS FIRST")
    # ...and the emitted form VALUE-matches Spark through DuckDB on a
    # genuinely NULL-bearing sort column
    plan = (
        _b(cat)
        .scan("orders")
        .project("nullif(o_orderstatus, 'F') AS s", "o_orderkey")
        .sort("s", "o_orderkey")
        .build()
    )
    from calcite_spark.sql.rel2sql import DUCKDB

    assert_matches_oracle(plan.to_df(cat), duck, to_sql(plan, DUCKDB))

    # 2. nested 1-arg round() both get padded for T-SQL
    assert MSSQL.expr("round(round(o_totalprice))") == (
        "round(round(o_totalprice, 0), 0)"
    )

    # 3. two Values nodes in one FROM scope get DISTINCT aliases
    two_vals = _ir.Join(
        "a = c",
        "INNER",
        inputs=(
            _ir.Values([(1, 2)], "a int, b int"),
            _ir.Values([(1, 9)], "c int, d int"),
        ),
    )
    sql = to_sql(two_vals, MYSQL)
    import re as _re

    aliases = _re.findall(r"\bAS (t\d+)\b|\) (t\d+)\b", sql)
    flat = [a or b for a, b in aliases]
    assert len(flat) == len(set(flat)), sql


def test_asof_join_without_alias(spark, cat):
    """r5 review: the unaliased 't1 ASOF JOIN t2' form must not swallow
    the FROM keyword as the table name."""
    from calcite_spark.sql.frontend import SqlFrontend

    fe = SqlFrontend(cat)
    df = fe.sql(
        "SELECT user_id, event_type, o_orderkey "
        "FROM events ASOF JOIN orders "
        "MATCH_CONDITION o_orderdate <= ts ON user_id = o_custkey"
    )
    assert df.columns == ["user_id", "event_type", "o_orderkey"]
    assert df.count() > 0


# ---------------------------------------------------------------------------
# r5 batch 3: the ANSI family — remaining 20 reference dialects
# (sql/dialect/ parity 39/39)

ANSI_EXECUTABLE_SHAPES = [
    # every emitted form here is DuckDB-parseable: ANSI OFFSET/FETCH,
    # parenthesized VALUES, [NOT] EXISTS semi/anti lowering, explicit
    # NULLS FIRST/LAST sort keys
    "q01_shape",
    "join_agg_topk",
    "left_join",
    "semi_join",
    "anti_join",
    "rollup",
    "grouping_sets",
    "union_distinct",
    "except_all",
    "offset_fetch",
    "values_join",
    "window",
]


def test_ansi_sql_executes_with_same_values(spark, cat, duck):
    from calcite_spark.sql.rel2sql import ANSI

    plans = _plans(cat)
    for name in ANSI_EXECUTABLE_SHAPES:
        plan = plans[name]
        sql = to_sql(plan, ANSI)
        assert_matches_oracle(plan.to_df(cat), duck, sql), name


def test_pure_product_tag_dialects_inherit_ansi(cat):
    """Nine reference files are product tags with zero behavior
    overrides (Firebird/Ingres/Interbase/LucidDb/Neoview/Netezza/
    Paraccel/Calcite + Ansi itself) — their emission must be byte-equal
    to the ANSI base's."""
    from calcite_spark.sql.rel2sql import (
        ANSI, CALCITE, FIREBIRD, INGRES, INTERBASE, LUCIDDB, NEOVIEW,
        NETEZZA, PARACCEL,
    )

    plans = _plans(cat)
    for name in ("q01_shape", "offset_fetch", "values_join", "window"):
        base = to_sql(plans[name], ANSI)
        for d in (CALCITE, FIREBIRD, INGRES, INTERBASE, LUCIDDB,
                  NEOVIEW, NETEZZA, PARACCEL):
            assert to_sql(plans[name], d) == base, (d.name, name)


def test_access_infobright_refuse_windows(cat, duck):
    from calcite_spark.sql.rel2sql import ACCESS, INFOBRIGHT

    plans = _plans(cat)
    for d in (ACCESS, INFOBRIGHT):
        with pytest.raises(UnsupportedDialectExpression, match="window"):
            to_sql(plans["window"], d)
        # non-window surface identical to ANSI and executable
        sql = to_sql(plans["q01_shape"], d)
        assert_matches_oracle(plans["q01_shape"].to_df(cat), duck, sql), d.name


def test_db2_aliases_and_intervals(cat, duck):
    from calcite_spark.sql.rel2sql import DB2

    plans = _plans(cat)
    # hasImplicitTableAlias()=false: every scan carries an explicit alias
    sql = to_sql(plans["q01_shape"], DB2)
    assert "FROM lineitem AS lineitem" in sql
    assert_matches_oracle(plans["q01_shape"].to_df(cat), duck, sql)
    # labeled-duration rewrite (Db2SqlDialect.unparseSqlIntervalLiteral)
    assert DB2.expr("ts + INTERVAL '3' MONTH") == "ts + 3 MONTH"
    assert DB2.expr("ts - INTERVAL '-2' DAY") == "ts - -2 DAY"
    # compound qualifiers raise in the reference's unparse; refuse here
    with pytest.raises(UnsupportedDialectExpression, match="single-unit"):
        DB2.expr("ts + INTERVAL '1-2' YEAR TO MONTH")


def test_exasol_forms_and_refusals(cat, duck):
    from calcite_spark.sql.rel2sql import EXASOL

    plans = _plans(cat)
    sql = to_sql(plans["join_agg_topk"], EXASOL)
    assert "LIMIT 3" in sql  # unparseOffsetFetch → LIMIT form
    assert_matches_oracle(plans["join_agg_topk"].to_df(cat), duck, sql)
    assert EXASOL.expr("date_trunc('month', ts)") == "date_trunc('month', ts)"
    with pytest.raises(UnsupportedDialectExpression, match="corr"):
        EXASOL.expr("corr(a, b)")  # outside supportsAggregateFunction
    with pytest.raises(UnsupportedDialectExpression, match="FILTER"):
        EXASOL.expr("count(x) FILTER (WHERE x > 0)")


def test_firebolt_aggs_and_null_collation(cat, duck):
    from calcite_spark.sql.rel2sql import FIREBOLT

    plans = _plans(cat)
    sql = to_sql(plans["join_agg_topk"], FIREBOLT)
    assert "LIMIT 3" in sql
    # NullCollation.LOW == Spark's effective placement → bare keys
    assert FIREBOLT.sort_key("c_name") == "c_name"
    assert FIREBOLT.sort_key("c_name DESC") == "c_name DESC"
    with pytest.raises(UnsupportedDialectExpression, match="NULLS LAST"):
        FIREBOLT.sort_key("c_name ASC NULLS LAST")
    assert FIREBOLT.expr("any_value(x)") == "any_value(x)"
    with pytest.raises(UnsupportedDialectExpression, match="stddev_pop"):
        FIREBOLT.expr("stddev_pop(x)")
    # supportsAggregateFunctionFilter()=false (FireboltSqlDialect.java:167)
    with pytest.raises(UnsupportedDialectExpression, match="FILTER"):
        FIREBOLT.expr("count(x) FILTER (WHERE x > 0)")
    # getCastSpec (FireboltSqlDialect.java:129-164): TINYINT/SMALLINT →
    # INT, CHAR → VARCHAR, DECIMAL(p,s) → bare FLOAT, REAL → DOUBLE
    assert FIREBOLT.expr("CAST(x AS TINYINT)") == "CAST(x AS INT)"
    assert FIREBOLT.expr("CAST(x AS SMALLINT)") == "CAST(x AS INT)"
    assert FIREBOLT.expr("CAST(x AS DECIMAL(10,2))") == "CAST(x AS FLOAT)"
    assert FIREBOLT.expr("CAST(x AS CHAR(5))") == "CAST(x AS VARCHAR)"
    assert FIREBOLT.expr("CAST(x AS FLOAT)") == "CAST(x AS DOUBLE)"
    # string literals stay opaque
    assert FIREBOLT.expr("'CAST(x AS TINYINT)'") == "'CAST(x AS TINYINT)'"
    # DuckDB's bare-key default diverges from LOW, so value-verify via
    # a non-null sort column only
    assert_matches_oracle(plans["join_agg_topk"].to_df(cat), duck, sql)


def test_h2_refuses_full_join_and_windows(cat, duck):
    from calcite_spark.sql.rel2sql import H2

    plans = _plans(cat)
    full = (
        _b(cat).scan("customer").scan("orders")
        .join("c_custkey = o_custkey", "FULL").build()
    )
    with pytest.raises(UnsupportedDialectExpression, match="FULL"):
        to_sql(full, H2)
    with pytest.raises(UnsupportedDialectExpression, match="window"):
        to_sql(plans["window"], H2)
    sql = to_sql(plans["left_join"], H2)
    assert_matches_oracle(plans["left_join"].to_df(cat), duck, sql)


def test_hsqldb_trunc_and_refusals(cat, duck):
    from calcite_spark.sql.rel2sql import HSQLDB

    plans = _plans(cat)
    # convertTimeUnit element list, TRUNC spelling
    assert HSQLDB.expr("date_trunc('month', ts)") == "TRUNC(ts, 'MM')"
    assert HSQLDB.expr("date_trunc('hour', ts)") == "TRUNC(ts, 'HH24')"
    with pytest.raises(UnsupportedDialectExpression, match="quarter"):
        HSQLDB.expr("date_trunc('quarter', ts)")
    with pytest.raises(UnsupportedDialectExpression, match="window"):
        to_sql(plans["window"], HSQLDB)
    with pytest.raises(UnsupportedDialectExpression, match="FILTER"):
        HSQLDB.expr("count(x) FILTER (WHERE x > 0)")
    sql = to_sql(plans["join_agg_topk"], HSQLDB)
    assert "LIMIT 3" in sql
    assert_matches_oracle(plans["join_agg_topk"].to_df(cat), duck, sql)


def test_informix_values_emulated_as_union(cat, duck):
    from calcite_spark.sql.rel2sql import INFORMIX

    plans = _plans(cat)
    sql = to_sql(plans["values_join"], INFORMIX)
    assert "UNION ALL" in sql and "VALUES" not in sql.upper().replace(
        "UNION ALL", ""
    ).replace("SELECT", "")  # supportsAliasedValues()=false
    assert_matches_oracle(plans["values_join"].to_df(cat), duck, sql)


def test_jethrodata_sort_refusal_and_aggs(cat, duck):
    from calcite_spark.sql.rel2sql import JETHRODATA

    plans = _plans(cat)
    # emulateNullDirection is a no-op in the reference (silently wrong
    # order); we refuse any placement Jethro's HIGH default can't honor
    with pytest.raises(UnsupportedDialectExpression, match="NULLS FIRST"):
        JETHRODATA.sort_key("c_name")  # Spark-effective ASC NULLS FIRST
    assert JETHRODATA.sort_key("c_name ASC NULLS LAST") == "c_name ASC"
    assert JETHRODATA.sort_key("c_name DESC NULLS FIRST") == "c_name DESC"
    with pytest.raises(UnsupportedDialectExpression, match="corr"):
        JETHRODATA.expr("corr(a, b)")
    # sort-free shapes execute
    agg = (
        _b(cat).scan("orders")
        .aggregate(["o_orderstatus"], ["COUNT(*) AS n"]).build()
    )
    assert_matches_oracle(agg.to_df(cat), duck, to_sql(agg, JETHRODATA))


def test_phoenix_approx_and_cast(cat, duck):
    from calcite_spark.sql.rel2sql import PHOENIX

    plans = _plans(cat)
    assert PHOENIX.expr("approx_count_distinct(x)") == "approx_count_distinct(x)"
    # getCastSpec: REAL → FLOAT
    assert PHOENIX.expr("CAST(x AS REAL)") == "CAST(x AS FLOAT)"
    sql = to_sql(plans["q01_shape"], PHOENIX)
    assert_matches_oracle(plans["q01_shape"].to_df(cat), duck, sql)


def test_sybase_top_start_at(cat, duck):
    from calcite_spark.sql.rel2sql import SYBASE

    plans = _plans(cat)
    # unparseTopN: TOP in the same query block as its ORDER BY
    sql = to_sql(plans["join_agg_topk"], SYBASE)
    assert sql.startswith("SELECT TOP (3) ") and "ORDER BY" in sql
    # offset is 0-based in IR, 1-based in START AT (documented
    # divergence from the reference's literal unparse)
    sql = to_sql(plans["offset_fetch"], SYBASE)
    assert "TOP (10) START AT 6" in sql
    with pytest.raises(UnsupportedDialectExpression, match="START AT"):
        SYBASE.fetch_clause(5, None, True)
    # fetch-free shapes are plain ANSI and execute
    sql = to_sql(plans["q01_shape"], SYBASE)
    assert_matches_oracle(plans["q01_shape"].to_df(cat), duck, sql)
    # Sort under Sort: the child SELECT already carries TOP — the
    # splice must wrap in a derived table, never emit
    # 'SELECT TOP (m) TOP (n) ...' (ADVICE r5)
    nested = (
        _b(cat)
        .scan("customer")
        .project("c_custkey", "c_name")
        .sort_limit(["c_custkey"], fetch=20)
        .sort_limit(["c_name"], fetch=5)
        .build()
    )
    sql = to_sql(nested, SYBASE)
    assert "TOP (5) TOP" not in sql and "TOP (20) TOP" not in sql
    assert sql.startswith("SELECT TOP (5) * FROM (SELECT TOP (20) ")


def test_dialect_registry_covers_all_reference_dialects(cat):
    from calcite_spark.sql.rel2sql import DIALECTS

    assert len(DIALECTS) == 39  # == ls reference sql/dialect/*SqlDialect.java
    # one entry per reference sql/dialect/ file
    expected = {
        "spark", "duckdb", "postgres", "mysql", "bigquery", "oracle",
        "mssql", "trino", "hive", "snowflake", "clickhouse", "redshift",
        "sqlite", "presto", "vertica", "teradata", "derby", "starrocks",
        "doris", "ansi", "calcite", "firebird", "ingres", "interbase",
        "luciddb", "neoview", "netezza", "paraccel", "access",
        "infobright", "db2", "exasol", "firebolt", "h2", "hsqldb",
        "informix", "jethrodata", "phoenix", "sybase",
    }
    missing = expected - set(DIALECTS)
    assert not missing, missing


def test_to_sql_accepts_registry_names(cat):
    plans = _plans(cat)
    from calcite_spark.sql.rel2sql import MYSQL

    assert to_sql(plans["q01_shape"], "mysql") == to_sql(plans["q01_shape"], MYSQL)
    with pytest.raises(ValueError, match="unknown dialect"):
        to_sql(plans["q01_shape"], "mongo")
