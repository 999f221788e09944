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
