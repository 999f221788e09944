"""JoinPushTransitivePredicates (plans/rewrite.py ≈ RelMdPredicates +
JoinPushTransitivePredicatesRule): a literal predicate on one equi-join
side is inferred onto the other side's key. IR-shape, value-equality,
null-extension direction rules, fixpoint idempotence, and the payoff
case Catalyst cannot reach — the inferred predicate landing in a
federated remote WHERE clause."""

from __future__ import annotations

import pytest

from calcite_spark.catalog import Catalog
from calcite_spark.plans import ir
from calcite_spark.plans.builder import RelBuilder
from calcite_spark.plans.rewrite import (
    HepProgram,
    Rule,
    _join_push_transitive_predicates,
)
from calcite_spark.sources.federation import (
    DuckDBEngine,
    federate,
    register_external,
)
from tests.conftest import SF_DIR

PROGRAM = HepProgram(
    [Rule("JoinPushTransitivePredicates", _join_push_transitive_predicates)]
)


@pytest.fixture(scope="module")
def cat(spark):
    return Catalog(spark).register_parquet_dir(SF_DIR)


def _filters(node):
    out = []

    def walk(n):
        if isinstance(n, ir.Filter):
            out.append(n.condition)
        for c in n.inputs:
            walk(c)

    walk(node)
    return out


def test_inner_join_infers_both_ways(spark, cat):
    plan = (
        RelBuilder(cat)
        .scan("customer")
        .filter("c_custkey < 100")
        .scan("orders")
        .join("c_custkey = o_custkey")
        .aggregate([], ["COUNT(*) AS n"])
        .build()
    )
    out = PROGRAM.run(plan, cat)
    assert "o_custkey < 100" in _filters(out)
    # values unchanged by the rewrite
    assert out.to_df(cat).collect() == plan.to_df(cat).collect()


def test_left_join_direction_rules(spark, cat):
    # left-side predicate DOES flow to the right input of a LEFT join
    left_pred = (
        RelBuilder(cat)
        .scan("customer")
        .filter("c_custkey <= 50")
        .scan("orders")
        .join("c_custkey = o_custkey", join_type="LEFT")
        .build()
    )
    out = PROGRAM.run(left_pred, cat)
    assert "o_custkey <= 50" in _filters(out)
    assert out.to_df(cat).count() == left_pred.to_df(cat).count()

    # right-side predicate must NOT flow to the left input (left rows
    # without a match survive null-extended and must not be filtered)
    right_pred = (
        RelBuilder(cat)
        .scan("customer")
        .scan("orders")
        .filter("o_custkey <= 50")
        .join("c_custkey = o_custkey", join_type="LEFT")
        .build()
    )
    out2 = PROGRAM.run(right_pred, cat)
    assert "c_custkey <= 50" not in _filters(out2)
    assert out2.to_df(cat).count() == right_pred.to_df(cat).count()


def test_in_list_and_fixpoint(spark, cat):
    plan = (
        RelBuilder(cat)
        .scan("customer")
        .filter("c_nationkey IN (1, 2, 3)")
        .scan("orders")
        .join("c_custkey = o_custkey")
        .build()
    )
    once = PROGRAM.run(plan, cat)
    # c_nationkey is not a join key: nothing to infer from it
    assert all("o_" not in f or "IN" not in f for f in _filters(once))

    keyed = (
        RelBuilder(cat)
        .scan("customer")
        .filter("c_custkey IN (7, 11)")
        .scan("orders")
        .join("c_custkey = o_custkey")
        .build()
    )
    out = PROGRAM.run(keyed, cat)
    assert "o_custkey IN (7, 11)" in _filters(out)
    # fixpoint: re-running adds nothing (no double-wrapping)
    again = PROGRAM.run(out, cat)
    assert _filters(again) == _filters(out)
    assert out.to_df(cat).collect() == keyed.to_df(cat).collect()


def test_inferred_predicate_reaches_remote_sql(spark):
    """The case Catalyst cannot do: nation is external, so Spark never
    sees its scan — only the IR rule can narrow the remote query."""
    cat = Catalog(spark).register_parquet_dir(SF_DIR, tables=("customer",))
    engine = DuckDBEngine.from_parquet_dir(SF_DIR, ("nation",))
    register_external(cat, "nation", engine)
    plan = (
        RelBuilder(cat)
        .scan("customer")
        .filter("c_nationkey IN (1, 2)")
        .scan("nation")
        .join("c_nationkey = n_nationkey")
        .aggregate(["n_name"], ["COUNT(*) AS n_customers"])
        .build()
    )
    inferred = PROGRAM.run(plan, cat)
    fed = federate(inferred, cat)
    assert len(engine.queries_executed) == 1
    remote = " ".join(engine.queries_executed[0].replace("(", " (").split())
    assert "n_nationkey IN (1, 2)" in remote
    # values equal the un-inferred, un-federated truth
    want = sorted(map(tuple, plan.to_df(cat).collect()))
    got = sorted(map(tuple, fed.to_df(cat).collect()))
    assert got == want


def test_inferred_predicate_reaches_parquet_scan(spark, cat):
    """Plan-quality check: after inference, Catalyst pushes the derived
    conjunct all the way into the ORDERS parquet scan (PushedFilters),
    so a 1000-executor cluster row-group-prunes the fact table instead
    of filtering post-scan."""
    plan = (
        RelBuilder(cat)
        .scan("customer")
        .filter("c_custkey < 100")
        .scan("orders")
        .join("c_custkey = o_custkey")
        .aggregate([], ["COUNT(*) AS n"])
        .build()
    )
    out = PROGRAM.run(plan, cat)
    explained = out.to_df(cat)._jdf.queryExecution().executedPlan().toString()
    import re as _re

    scans = [
        blk
        for blk in explained.split("FileScan parquet")
        if "orders" in blk.split("\n")[0]
    ]
    assert scans, explained
    assert any(
        _re.search(r"PushedFilters: \[[^\]]*LessThan\(o_custkey,100\)", blk)
        for blk in scans
    ), scans[0][:500]


def test_top_level_or_blocks_inference(spark, cat):
    """SQL precedence: "x AND y OR z" is "(x AND y) OR z", so no
    AND-split piece is individually guaranteed — the rule must not
    push "c_custkey < 100" across the join (review finding r5)."""
    plan = (
        RelBuilder(cat)
        .scan("customer")
        .filter("c_custkey < 100 AND c_mktsegment = 'BUILDING' OR c_custkey > 140")
        .scan("orders")
        .join("c_custkey = o_custkey")
        .aggregate([], ["COUNT(*) AS n"])
        .build()
    )
    out = PROGRAM.run(plan, cat)
    assert not any("o_custkey < 100" in f for f in _filters(out))
    assert out.to_df(cat).collect() == plan.to_df(cat).collect()
