"""UDF surface (§2.9), DDL executor (§2.10), and type mapping (§1.2)."""

from __future__ import annotations

import pandas as pd
import pytest

from calcite_spark import types as ct
from calcite_spark.catalog import Catalog
from calcite_spark.functions.udf import (
    register_scalar_udf,
    register_table_macro,
    register_udaf_grouped,
)
from calcite_spark.sql.ddl import DdlExecutor
from calcite_spark.sql.frontend import SqlFrontend
from tests.conftest import SF_DIR


@pytest.fixture()
def ddl(spark, tmp_path):
    cat = Catalog(spark).register_parquet_dir(SF_DIR)
    return DdlExecutor(SqlFrontend(cat), str(tmp_path / "wh"))


def test_scalar_pandas_udf(spark):
    # local closure → cloudpickle serializes by value (workers can't
    # import the tests package)
    def double_it(s: pd.Series) -> pd.Series:
        return s * 2

    register_scalar_udf(spark, "t_double_it", double_it, "double")
    got = spark.sql("SELECT t_double_it(21.0) AS v").collect()[0].v
    assert got == 42.0


def test_udaf_grouped(spark):
    df = spark.createDataFrame([("a", 1.0), ("a", 3.0), ("b", 5.0)], "k string, v double")

    def span(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": [pdf["k"].iloc[0]], "span": [pdf["v"].max() - pdf["v"].min()]})

    out = {r.k: r.span for r in register_udaf_grouped(df.groupBy("k"), span, "k string, span double").collect()}
    assert out == {"a": 2.0, "b": 0.0}


def test_python_udtf(spark):
    from pyspark.sql.functions import udtf

    @udtf(returnType="tok string, pos int")
    class Tokenize:
        def eval(self, text: str):
            for i, t in enumerate((text or "").split()):
                yield t, i

    from calcite_spark.functions.udf import register_table_function

    register_table_function(spark, "t_tokenize", Tokenize)
    rows = spark.sql("SELECT * FROM t_tokenize('a b c')").collect()
    assert [(r.tok, r.pos) for r in rows] == [("a", 0), ("b", 1), ("c", 2)]


def test_table_macro(spark, ddl):
    def top_balance(catalog, n):
        return catalog.table("customer").orderBy("c_acctbal", ascending=False).limit(n)

    macro = register_table_macro(ddl.catalog, "top_balance", top_balance)
    assert macro(3).count() == 3
    assert ddl.catalog.table_macros["top_balance"] is macro


def test_ddl_view_and_ctas(spark, ddl):
    ddl.execute("CREATE VIEW big_orders AS SELECT * FROM orders WHERE o_totalprice > 100000")
    assert ddl.catalog.table("big_orders").count() > 0
    ddl.execute("CREATE TABLE region_copy AS SELECT * FROM region")
    assert ddl.catalog.table("region_copy").count() == 5
    got = ddl.execute("DROP TABLE region_copy")
    assert got["dropped"] == "region_copy"
    with pytest.raises(ValueError):
        ddl.execute("DROP TABLE region_copy")


def test_ddl_materialized_view_rewrites(spark, ddl):
    ddl.execute(
        "CREATE MATERIALIZED VIEW mv_status AS "
        "SELECT o_orderstatus, COUNT(*) AS n_orders, SUM(o_totalprice) AS total "
        "FROM orders GROUP BY o_orderstatus"
    )
    from calcite_spark.plans.builder import RelBuilder

    df = (
        RelBuilder(ddl.catalog)
        .scan("orders")
        .aggregate(["o_orderstatus"], ["COUNT(*) AS n_orders"])
        .to_df()
    )
    assert all("mv_status" in f for f in df.inputFiles())


def test_ddl_create_function(spark, ddl):
    ddl.execute("CREATE FUNCTION ddl_double AS 'calcite_spark.functions.udf:sample_double' RETURNS double")
    assert spark.sql("SELECT ddl_double(4.0) AS v").collect()[0].v == 8.0


def test_type_mapping(spark):
    import pyspark.sql.types as T

    assert ct.to_spark_type("BIGINT") == T.LongType()
    assert ct.to_spark_type("UBIGINT") == T.DecimalType(20, 0)
    assert ct.to_spark_type("DECIMAL", 45, 2) == T.DecimalType(38, 2)
    assert ct.to_spark_type("TIMESTAMP") == T.TimestampNTZType()
    assert ct.to_spark_type("TIME") == T.LongType()
    assert ct.to_spark_type("INTERVAL_YEAR") == T.YearMonthIntervalType()
    assert ct.to_spark_type("INTERVAL_SECOND") == T.DayTimeIntervalType()
    with pytest.raises(TypeError):
        ct.to_spark_type("MEASURE")
    # TIME encoding round-trip
    expr = ct.time_to_nanos_expr("TIMESTAMP '2024-01-01 01:02:03.5'")
    v = spark.sql(f"SELECT {expr} AS v").collect()[0].v
    assert v == ((1 * 3600 + 2 * 60 + 3) * 1_000_000 + 500_000) * 1000


# -- CREATE TYPE / TABLE LIKE / FOREIGN SCHEMA (ServerDdlExecutor
#    :649 / :590 / :258) ------------------------------------------------


def test_create_type_alias_and_struct(ddl):
    r = ddl.execute("CREATE TYPE money AS DECIMAL(12, 2)")
    assert r["spark_type"] == "decimal(12, 2)"
    r = ddl.execute("CREATE TYPE addr AS (street VARCHAR, zip INTEGER)")
    assert r["spark_type"] == "struct<street: string, zip: int>"
    # usable in CAST through the frontend
    row = ddl.fe.sql(
        "SELECT CAST(12.345 AS money) AS m, CAST(named_struct('street', 'x', 'zip', 1) AS addr) AS a"
    ).collect()[0]
    assert str(row.m) == "12.35" or float(row.m) == 12.35
    assert row.a.street == "x" and row.a.zip == 1


def test_custom_type_alias_collision_not_rewritten(ddl):
    """ADVICE r2: _expand_custom_types must only touch CAST targets — a
    column alias that collides with a registered type name (and sits
    before a closing paren) must stay a plain alias."""
    ddl.execute("CREATE TYPE money AS DECIMAL(12, 2)")
    # struct field alias 'money' before ')': NOT a CAST target
    row = ddl.fe.sql("SELECT struct(1 AS money) AS s").collect()[0]
    assert row.s.money == 1
    # subquery tail alias: NOT a CAST target
    row = ddl.fe.sql("SELECT m FROM (SELECT 2 AS money) t(m)").collect()[0]
    assert row.m == 2
    # real CAST still expands, even nested and with the alias nearby
    row = ddl.fe.sql(
        "SELECT CAST(CAST(1.239 AS money) AS money) AS money"
    ).collect()[0]
    assert float(row.money) == 1.24
    # TRY_CAST also anchors
    row = ddl.fe.sql("SELECT TRY_CAST('1.5' AS money) AS v").collect()[0]
    assert float(row.v) == 1.5


def test_create_table_with_custom_type_column(ddl):
    ddl.execute("CREATE TYPE money AS DECIMAL(12, 2)")
    r = ddl.execute("CREATE TABLE wallets (w_id BIGINT, balance money)")
    assert "decimal" in r["schema"]
    df = ddl.catalog.table("wallets")
    assert df.count() == 0
    assert dict(df.dtypes)["balance"].startswith("decimal")


def test_create_table_like(ddl):
    r = ddl.execute("CREATE TABLE nation2 LIKE nation")
    assert r["like"] == "nation"
    src = ddl.catalog.table("nation")
    dst = ddl.catalog.table("nation2")
    assert dst.schema == src.schema
    assert dst.count() == 0
    with pytest.raises(ValueError, match="already exists"):
        ddl.execute("CREATE TABLE nation2 LIKE nation")
    assert ddl.execute("CREATE TABLE IF NOT EXISTS nation2 LIKE nation")["existed"]
    r = ddl.execute("CREATE TABLE nation3 LIKE nation INCLUDING ALL")
    assert r["options"] == ["INCLUDING", "ALL"]


def test_create_foreign_schema(ddl):
    r = ddl.execute(
        f"CREATE FOREIGN SCHEMA wh TYPE 'duckdb' "
        f"OPTIONS (path '{SF_DIR}', tables 'nation,region')"
    )
    assert r["tables"] == ["nation", "region"]
    # JdbcTableScan floor: whole-table fetch through Catalog.table
    df = ddl.catalog.table("wh.nation")
    assert df.count() == 25
    # and the federated path pushes a join down as one remote query
    from calcite_spark.plans.builder import RelBuilder
    from calcite_spark.sources.federation import execute_federated

    engine = ddl.catalog.foreign_schemas["wh"]["engine"]
    n0 = len(engine.queries_executed)
    plan = (
        RelBuilder(ddl.catalog)
        .scan("wh.nation")
        .scan("wh.region")
        .join("n_regionkey = r_regionkey")
        .aggregate(["r_name"], ["COUNT(*) AS n"])
        .build()
    )
    out = execute_federated(plan, ddl.catalog)
    assert len(engine.queries_executed) == n0 + 1
    assert {r.r_name for r in out.collect()} == {
        "AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"
    }


def test_create_foreign_schema_jdbc_gated(ddl):
    with pytest.raises(NotImplementedError, match="driver jar"):
        ddl.execute("CREATE FOREIGN SCHEMA j TYPE 'jdbc' OPTIONS (url 'x', tables 'y')")


# -- r8 second-wave review pins (column-modifier / schema tier) --------


def test_default_string_literal_not_substituted(ddl):
    """Column names inside a default's STRING LITERAL are data — the
    row-substitution must not rewrite them (review r8)."""
    ddl.execute("create table tlit (i int, s varchar default 'i is big')")
    ddl.execute("insert into tlit (i) values (7)")
    cat = ddl.catalog
    assert [tuple(r) for r in cat.table("tlit").collect()] == [(7, "i is big")]


def test_insert_into_mv_refused(ddl):
    """Appending rows to a materialization desynchronizes it from its
    defining query — refused for both substitutable and generic MVs
    (review r8)."""
    import pytest as _pt

    ddl.execute(
        "CREATE MATERIALIZED VIEW mvt AS SELECT n_regionkey, COUNT(*) AS n "
        "FROM nation GROUP BY n_regionkey"
    )
    with _pt.raises(ValueError, match="materialized view"):
        ddl.execute("insert into mvt values (99, 99)")
    ddl.execute(
        "CREATE MATERIALIZED VIEW mvg AS SELECT n_regionkey FROM nation "
        "GROUP BY n_regionkey"
    )
    with _pt.raises(ValueError, match="materialized view"):
        ddl.execute("insert into mvg values (99)")


def test_drop_then_recreate_same_name(ddl):
    """A dropped warehouse table must be re-creatable — the stale
    parquet dir used to block errorifexists (review r8)."""
    ddl.execute("create table trc as select 1 as a")
    ddl.execute("drop table trc")
    ddl.execute("create table trc as select 2 as a")
    assert [r.a for r in ddl.catalog.table("trc").collect()] == [2]


def test_insert_values_frontend_macros(ddl):
    """ARRAY[...] literals and :: casts inside INSERT VALUES expand
    exactly as the old native path did (review r8)."""
    ddl.execute("create table tmac (xs array<int>, k int)")
    ddl.execute("insert into tmac values (ARRAY[1, 2], '5'::int)")
    assert [tuple(r) for r in ddl.catalog.table("tmac").collect()] == [
        ([1, 2], 5)
    ]


def test_update_unknown_column_and_literal_where(ddl):
    """UPDATE validates assigned columns (review r8: unknown names were
    silent no-ops) and a 'where' inside a string literal never splits
    the statement."""
    import pytest as _pt

    ddl.execute("create table tu (i int, s varchar)")
    ddl.execute("insert into tu values (1, 'a')")
    with _pt.raises(ValueError, match="Unknown target column"):
        ddl.execute("update tu set nosuchcol = 99")
    ddl.execute("update tu set s = 'no where here' where i = 1")
    assert [tuple(r) for r in ddl.catalog.table("tu").collect()] == [
        (1, "no where here")
    ]
    ddl.execute("update tu set s = 'a,b' where i = 1")
    assert ddl.catalog.table("tu").collect()[0].s == "a,b"


def test_merge_modifier_enforcement(ddl):
    """MERGE's insert arm honors NOT NULL and DEFAULT like plain INSERT,
    validates its column list, and alias-qualified text inside string
    literals survives requalification (review r8)."""
    import pytest as _pt

    ddl.execute("create table tm (k int, v varchar not null, d int default 7)")
    ddl.execute("insert into tm (k, v) values (1, 'one')")
    ddl.execute("create table sm as select CAST(2 AS INT) AS k, CAST('two' AS STRING) AS v")
    with _pt.raises(ValueError, match="does not allow NULLs"):
        ddl.execute(
            "MERGE INTO tm USING sm AS s ON k = s.k "
            "WHEN NOT MATCHED THEN INSERT (k) VALUES (s.k)"
        )
    with _pt.raises(ValueError, match="Unknown target column"):
        ddl.execute(
            "MERGE INTO tm USING sm AS s ON k = s.k "
            "WHEN NOT MATCHED THEN INSERT (kk, v) VALUES (s.k, s.v)"
        )
    ddl.execute(
        "MERGE INTO tm USING sm AS s ON k = s.k "
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)"
    )
    row = ddl.catalog.table("tm").filter("k = 2").collect()[0]
    assert row.v == "two" and row.d == 7  # default applied in the arm
    # string literal mentioning the alias is data, not a reference
    ddl.execute(
        "MERGE INTO tm USING sm AS s ON k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = 'see s.k today'"
    )
    assert ddl.catalog.table("tm").filter("k = 2").collect()[0].v == "see s.k today"


def test_truncate_missing_table_reports_not_found(ddl):
    import pytest as _pt

    with _pt.raises(ValueError, match="not found"):
        ddl.execute("truncate table nosuch restart identity")


def test_update_not_null_generated_precheck(ddl):
    """A NOT NULL generated column recomputed in the UPDATE post pass
    (e.g. `a + b` after SET a = NULL) must pre-check like directly
    assigned NOT NULL columns — the old check only covered direct
    assignments and wrote the NULL without error (ADVICE r8)."""
    import pytest as _pt

    ddl.execute(
        "create table tg (a int, b int, g int as (a + b) virtual not null)"
    )
    ddl.execute("insert into tg (a, b) values (1, 2)")
    with _pt.raises(ValueError, match="does not allow NULLs"):
        ddl.execute("update tg set a = NULL where b = 2")
    # nothing was written by the refused statement
    assert [tuple(r) for r in ddl.catalog.table("tg").collect()] == [(1, 2, 3)]
    # a non-NULL reassignment recomputes and passes
    ddl.execute("update tg set a = 10 where b = 2")
    assert [tuple(r) for r in ddl.catalog.table("tg").collect()] == [(10, 2, 12)]
    # generated column NOT referencing the assigned column is untouched
    ddl.execute(
        "create table tg2 (a int, b int, g int as (b * 2) virtual not null)"
    )
    ddl.execute("insert into tg2 (a, b) values (1, 2)")
    ddl.execute("update tg2 set a = NULL")
    assert [tuple(r) for r in ddl.catalog.table("tg2").collect()] == [
        (None, 2, 4)
    ]
