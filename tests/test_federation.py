"""Federation / JDBC-pushdown analog (sources/federation.py):
whole-query and partial pushdown through the rel2sql DuckDB dialect,
with the remote engine's received SQL asserted — the JdbcRules
contract: reduce remotely, join locally.
"""

from __future__ import annotations

import pytest

from calcite_spark.catalog import Catalog
from calcite_spark.plans import ir
from calcite_spark.plans.builder import RelBuilder
from calcite_spark.sources.federation import (
    DuckDBEngine,
    execute_federated,
    federate,
    register_external,
)
from tests.conftest import SF_DIR


@pytest.fixture()
def fed_catalog(spark):
    """customer/orders local (the 'fact' side), nation/region external
    (the 'warehouse' dims)."""
    cat = Catalog(spark).register_parquet_dir(SF_DIR, tables=("customer", "orders"))
    engine = DuckDBEngine.from_parquet_dir(SF_DIR, ("nation", "region"))
    register_external(cat, "nation", engine)
    register_external(cat, "region", engine)
    return cat, engine


def test_whole_query_pushdown(spark, fed_catalog):
    """All scans external → ONE remote query, zero Spark-side joins."""
    cat, engine = fed_catalog
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


def test_partial_pushdown_mixed_join(spark, fed_catalog):
    """External dim subtree (filter+join of nation/region) pushed as one
    remote query; the join against the LOCAL customer table stays in
    Spark. Values equal the all-local execution."""
    cat, engine = fed_catalog
    plan = (
        RelBuilder(cat)
        .scan("customer")
        .scan("nation")
        .join("c_nationkey = n_nationkey")
        .aggregate(["n_name"], ["COUNT(*) AS n_customers"])
        .build()
    )
    fed = federate(plan, cat)
    # the nation scan was replaced by a remote-result scan
    scans = [n.table for n in _scans(fed)]
    assert "customer" in scans and "nation" not in scans
    assert any(t.startswith("__fed_") for t in scans)
    assert len(engine.queries_executed) == 1
    assert "nation" in engine.queries_executed[0]

    got = {(r.n_name, r.n_customers) for r in fed.to_df(cat).collect()}
    # all-local truth
    local = Catalog(cat.spark).register_parquet_dir(SF_DIR)
    want = {
        (r.n_name, r.n_customers)
        for r in RelBuilder(local)
        .scan("customer")
        .scan("nation")
        .join("c_nationkey = n_nationkey")
        .aggregate(["n_name"], ["COUNT(*) AS n_customers"])
        .to_df()
        .collect()
    }
    assert got == want and len(want) > 0


def test_pushdown_reduces_remotely(spark, fed_catalog):
    """The remote SQL carries the filter (reduce-at-source), not a bare
    table scan — the point of pushdown at 100 TB."""
    cat, engine = fed_catalog
    plan = (
        RelBuilder(cat)
        .scan("nation")
        .filter("n_regionkey = 2")
        .build()
    )
    execute_federated(plan, cat).collect()
    assert "n_regionkey = 2" in engine.queries_executed[-1]


def test_no_external_tables_is_identity(spark, fed_catalog):
    cat, engine = fed_catalog
    plan = RelBuilder(cat).scan("customer").filter("c_custkey < 10").build()
    assert federate(plan, cat) is plan
    assert engine.queries_executed == []


def _scans(node):
    stack = [node]
    while stack:
        n = stack.pop()
        if isinstance(n, ir.Scan):
            yield n
        stack.extend(n.inputs)


def test_jdbc_parallel_scan_option_contract(spark):
    """The parallel JDBC path (jar-gated in this container) is compiled
    and its option contract pinned via an injected stub reader: Spark's
    JDBC source needs partitionColumn/lowerBound/upperBound/numPartitions
    together to parallelize, and that is exactly what must be set."""
    from calcite_spark.sources.federation import jdbc_parallel_scan

    class StubReader:
        def __init__(self):
            self.fmt = None
            self.opts = {}

        def format(self, f):
            self.fmt = f
            return self

        def option(self, k, v):
            self.opts[k] = v
            return self

        def load(self):
            return ("loaded", self.fmt, dict(self.opts))

    stub = StubReader()
    out = jdbc_parallel_scan(
        spark,
        url="jdbc:postgresql://warehouse:5432/dw",
        table="public.orders",
        partition_column="o_orderkey",
        lower_bound=1,
        upper_bound=6_000_000,
        num_partitions=64,
        driver="org.postgresql.Driver",
        reader=stub,
    )
    tag, fmt, opts = out
    assert tag == "loaded" and fmt == "jdbc"
    assert opts["partitionColumn"] == "o_orderkey"
    assert (opts["lowerBound"], opts["upperBound"]) == ("1", "6000000")
    assert opts["numPartitions"] == "64"
    assert opts["driver"] == "org.postgresql.Driver"
    assert opts["fetchsize"] == "10000"
    with pytest.raises(ValueError, match="num_partitions"):
        jdbc_parallel_scan(
            spark, "u", "t", "c", 0, 1, num_partitions=0, reader=StubReader()
        )


def test_fetch_preserves_remote_types(spark):
    """r2 review: the Arrow ingest must keep decimal/timestamp/date/int
    fidelity — the fetched Spark schema is checked field-by-field against
    the remote Arrow schema."""
    import duckdb

    from calcite_spark.catalog import Catalog
    from calcite_spark.sources.federation import DuckDBEngine, _fetch

    cat = Catalog(spark)
    engine = DuckDBEngine(duckdb.connect())
    df = _fetch(
        cat,
        engine,
        "SELECT CAST(1.25 AS DECIMAL(12,2)) AS dec_c, "
        "TIMESTAMP '2020-06-01 12:00:00' AS ts_c, "
        "DATE '2020-06-01' AS d_c, "
        "CAST(7 AS BIGINT) AS i_c, CAST(7 AS INT) AS i32_c, "
        "'x' AS s_c, CAST(1.5 AS DOUBLE) AS f_c",
    )
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types["dec_c"] == "decimal(12,2)", types
    assert types["ts_c"].startswith("timestamp"), types
    assert types["d_c"] == "date", types
    assert types["i_c"] == "bigint" and types["i32_c"] == "int", types
    assert types["s_c"] == "string" and types["f_c"] == "double", types
    row = df.collect()[0]
    assert float(row.dec_c) == 1.25 and row.i_c == 7


def test_fetch_schema_gate_redlines_on_drift(spark):
    """A lossy ingest path must raise FederationTypeError, not proceed:
    simulate by handing the gate an engine whose Arrow answer cannot map
    losslessly through pandas (forced fallback via a monkeypatched
    createDataFrame that downcasts)."""
    import pyarrow as pa

    from calcite_spark.catalog import Catalog
    from calcite_spark.sources.federation import FederationTypeError, _fetch

    class FakeEngine:
        dialect = None
        queries_executed = []

        def execute_arrow(self, sql):
            return pa.table(
                {"v": pa.array([1], type=pa.decimal128(10, 2))}
            )

    cat = Catalog(spark)

    class LossyCatalog:
        """Wrapper whose spark.createDataFrame coerces decimals away."""

        class _S:
            def __init__(self, spark):
                self._spark = spark

            def createDataFrame(self, tbl, *a, **kw):
                import pandas as pd

                pdf = (tbl if isinstance(tbl, pd.DataFrame) else tbl.to_pandas())
                return self._spark.createDataFrame(pdf.astype({"v": "float64"}))

        def __init__(self, spark):
            self.spark = LossyCatalog._S(spark)

    with pytest.raises(FederationTypeError, match="decimal"):
        _fetch(LossyCatalog(spark), FakeEngine(), "SELECT ...")
    # and the honest path passes the same gate
    df = _fetch(cat, FakeEngine(), "SELECT ...")
    assert df.schema.fields[0].dataType.simpleString() == "decimal(10,2)"


def test_remote_column_pruning(spark):
    """≈ JdbcProjectRule: the pushed scan ships only the columns the
    rest of the plan references — n_name (output) and n_nationkey
    (join key) — never SELECT *."""
    cat = Catalog(spark).register_parquet_dir(SF_DIR, tables=("customer",))
    engine = DuckDBEngine.from_parquet_dir(SF_DIR, ("nation",))
    register_external(cat, "nation", engine)
    plan = (
        RelBuilder(cat)
        .scan("customer")
        .scan("nation")
        .join("c_nationkey = n_nationkey")
        .aggregate(["n_name"], ["COUNT(*) AS n_customers"])
        .build()
    )
    fed = federate(plan, cat)
    assert len(engine.queries_executed) == 1
    remote = engine.queries_executed[0]
    assert "*" not in remote
    assert "n_name" in remote and "n_nationkey" in remote
    assert "n_comment" not in remote and "n_regionkey" not in remote
    # values unchanged
    local = Catalog(cat.spark).register_parquet_dir(SF_DIR)
    want = {
        (r.n_name, r.n_customers)
        for r in RelBuilder(local)
        .scan("customer")
        .scan("nation")
        .join("c_nationkey = n_nationkey")
        .aggregate(["n_name"], ["COUNT(*) AS n_customers"])
        .build()
        .to_df(local)
        .collect()
    }
    got = {(r.n_name, r.n_customers) for r in fed.to_df(cat).collect()}
    assert got == want


def test_no_pruning_when_output_implicit(spark):
    """A plan whose root outputs ALL columns (bare join, no Project)
    must keep SELECT * — pruning there would drop output columns."""
    cat = Catalog(spark).register_parquet_dir(SF_DIR, tables=("customer",))
    engine = DuckDBEngine.from_parquet_dir(SF_DIR, ("nation",))
    register_external(cat, "nation", engine)
    plan = (
        RelBuilder(cat)
        .scan("customer")
        .scan("nation")
        .join("c_nationkey = n_nationkey")
        .build()
    )
    fed = federate(plan, cat)
    remote = engine.queries_executed[0]
    assert "SELECT * FROM nation" in remote
    assert len(fed.to_df(cat).columns) == len(plan.to_df(Catalog(cat.spark).register_parquet_dir(SF_DIR)).columns)


def test_duckdb_engine_execute_modify(tmp_path):
    """The write half of the engine protocol ≈ JdbcTableModify: INSERT
    emitted by rel2sql executes on the engine and reports the affected
    count."""
    import duckdb

    from calcite_spark.plans import ir
    from calcite_spark.sources.federation import DuckDBEngine
    from calcite_spark.sql.rel2sql import DUCKDB, insert_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE t (a INT, b VARCHAR)")
    eng = DuckDBEngine(con)
    vals = ir.Values([(1, "x"), (2, "y")], "a int, b string")
    n = eng.execute_modify(insert_sql("t", vals, DUCKDB, columns=["a", "b"]))
    assert n == 2
    assert eng.execute_arrow("SELECT COUNT(*) c FROM t").column("c")[0].as_py() == 2


# -- MERGE write-back (VERDICT r5 item 4) -----------------------------


def test_merge_sql_native_emission():
    """merge_sql ≈ RelToSqlConverter.java:1480 SqlMerge(target,
    condition, source, update, insert): one statement, WHEN clauses
    from update_set / insert_columns, expressions dialect-checked."""
    from calcite_spark.plans import ir
    from calcite_spark.sql.rel2sql import ORACLE, SPARK, merge_sql

    sql = merge_sql(
        "dim", "staging", "tgt.k = src.k",
        update_set={"v": "src.v"},
        insert_columns=["k", "v"], insert_values=["src.k", "src.v"],
        dialect=SPARK,
    )
    assert sql == (
        "MERGE INTO dim AS tgt USING staging AS src ON tgt.k = src.k "
        "WHEN MATCHED THEN UPDATE SET v = src.v "
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (src.k, src.v)"
    )
    # IR source goes through the ordinary SELECT emitter
    vals = ir.Values([(1, "x")], "k int, v string")
    sql = merge_sql("dim", vals, "tgt.k = src.k",
                    update_set={"v": "src.v"}, dialect=ORACLE)
    assert sql.startswith("MERGE INTO dim AS tgt USING (SELECT")
    assert "WHEN NOT MATCHED" not in sql  # update-only merge


def test_merge_sql_dialect_gating():
    """Engines without a native MERGE refuse instead of shipping SQL
    the remote rejects (DuckDB 1.0, SQLite, MySQL, ClickHouse)."""
    import pytest

    from calcite_spark.sql.rel2sql import (
        DIALECTS,
        UnsupportedDialectExpression,
        merge_sql,
    )

    for name in ("duckdb", "sqlite", "mysql", "clickhouse"):
        with pytest.raises(UnsupportedDialectExpression, match="MERGE"):
            merge_sql("t", "s", "tgt.a = src.a",
                      update_set={"b": "src.b"}, dialect=DIALECTS[name])
    # at least one WHEN clause is mandatory (ANSI)
    with pytest.raises(ValueError, match="WHEN"):
        merge_sql("t", "s", "tgt.a = src.a", dialect=DIALECTS["spark"])


def test_push_merge_duckdb_roundtrip():
    """push_merge on the DuckDB stand-in (no native MERGE): the
    transactional UPDATE-then-INSERT lowering upserts exactly like
    a WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT merge."""
    import duckdb

    from calcite_spark.sources.federation import DuckDBEngine, push_merge

    con = duckdb.connect()
    con.execute("CREATE TABLE dim (k INT, v VARCHAR)")
    con.execute("INSERT INTO dim VALUES (1, 'old'), (3, 'keep')")
    con.execute("CREATE TABLE staging (k INT, v VARCHAR)")
    con.execute("INSERT INTO staging VALUES (1, 'new'), (2, 'ins')")
    eng = DuckDBEngine(con)
    n = push_merge(
        eng, "dim", "staging", "tgt.k = src.k",
        update_set={"v": "src.v"},
        insert_columns=["k", "v"], insert_values=["src.k", "src.v"],
    )
    assert n == 2  # one update + one insert
    rows = con.execute("SELECT k, v FROM dim ORDER BY k").fetchall()
    assert rows == [(1, "new"), (2, "ins"), (3, "keep")]
    # the lowering ran inside one transaction, UPDATE before INSERT
    # (insert-first would re-match fresh rows into the update's scope)
    stmts = [q.split()[0] for q in eng.queries_executed]
    assert stmts == ["BEGIN", "UPDATE", "INSERT", "COMMIT"]


def test_push_merge_update_only_and_insert_only():
    import duckdb

    from calcite_spark.sources.federation import DuckDBEngine, push_merge

    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INT, v INT)")
    con.execute("INSERT INTO t VALUES (1, 0)")
    con.execute("CREATE TABLE s (k INT, v INT)")
    con.execute("INSERT INTO s VALUES (1, 7), (2, 8)")
    eng = DuckDBEngine(con)
    assert push_merge(eng, "t", "s", "tgt.k = src.k",
                      update_set={"v": "src.v"}) == 1
    assert con.execute("SELECT v FROM t WHERE k = 1").fetchone()[0] == 7
    assert push_merge(eng, "t", "s", "tgt.k = src.k",
                      insert_columns=["k", "v"],
                      insert_values=["src.k", "src.v"]) == 1
    assert con.execute("SELECT COUNT(*) FROM t").fetchone()[0] == 2


def test_push_merge_sqlite_refusal(tmp_path):
    """SQLiteEngine declares neither native MERGE nor the verified
    UPDATE...FROM capability → push_merge refuses (the posture: never
    emulate unverified upsert semantics on a real engine)."""
    import sqlite3

    import pytest

    from calcite_spark.sources.federation import SQLiteEngine, push_merge
    from calcite_spark.sql.rel2sql import UnsupportedDialectExpression

    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE t (k INT, v TEXT)")
    eng = SQLiteEngine(con)
    with pytest.raises(UnsupportedDialectExpression, match="MERGE"):
        push_merge(eng, "t", "s", "tgt.k = src.k",
                   update_set={"v": "src.v"})


def test_push_merge_refuses_key_updates():
    """Review r6: updating a join-key column would make updated rows
    re-match the NOT EXISTS probe and be inserted again — refuse."""
    import duckdb

    import pytest

    from calcite_spark.sources.federation import DuckDBEngine, push_merge
    from calcite_spark.sql.rel2sql import UnsupportedDialectExpression

    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INT, v INT)")
    con.execute("CREATE TABLE s (k INT, v INT)")
    eng = DuckDBEngine(con)
    with pytest.raises(UnsupportedDialectExpression, match="join-key"):
        push_merge(eng, "t", "s", "tgt.k = src.k", update_set={"k": "src.k + 1"})
    # unqualified condition reference resolves against either relation
    # — still refused (could be the target's column)
    with pytest.raises(UnsupportedDialectExpression, match="join-key"):
        push_merge(eng, "t", "s", "tgt.k = src.k AND v > 0",
                   update_set={"v": "src.v"})


def test_push_merge_allows_source_only_condition_columns():
    """ADVICE r6: the guard must read the condition's QUALIFIED
    references — `tgt.id = src.id AND src.flag = 1` touches `flag` only
    on the SOURCE side, so updating target.flag is safe and must not be
    refused. Values verified end-to-end."""
    import duckdb

    from calcite_spark.sources.federation import DuckDBEngine, push_merge

    con = duckdb.connect()
    con.execute("CREATE TABLE t (id INT, flag INT)")
    con.execute("CREATE TABLE s (id INT, flag INT)")
    con.execute("INSERT INTO t VALUES (1, 0), (2, 0)")
    con.execute("INSERT INTO s VALUES (1, 1), (2, 0), (3, 1)")
    eng = DuckDBEngine(con)
    n = push_merge(
        eng, "t", "s", "tgt.id = src.id AND src.flag = 1",
        update_set={"flag": "src.flag"},
        insert_columns=["id", "flag"], insert_values=["src.id", "src.flag"],
    )
    # update hits t(1,.) via s(1,1); inserts: s(3,1) is new, and s(2,0)
    # fails the src.flag=1 condition so it counts as NOT MATCHED and
    # inserts — exactly what native MERGE with this ON condition does
    assert n == 3
    rows = dict(con.execute("SELECT id, flag FROM t ORDER BY id").fetchall())
    assert rows[1] == 1 and rows[3] == 1


def test_merge_sql_arity_validation():
    import pytest

    from calcite_spark.sql.rel2sql import SPARK, merge_sql

    with pytest.raises(ValueError, match="arity"):
        merge_sql("t", "s", "tgt.k = src.k",
                  insert_columns=["a", "b"], insert_values=["1"], dialect=SPARK)
    with pytest.raises(ValueError, match="empty"):
        merge_sql("t", "s", "tgt.k = src.k", update_set={"v": "src.v"},
                  insert_columns=[], insert_values=[], dialect=SPARK)
