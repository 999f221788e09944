"""Scale-mechanics tests: plan serde round-trip, salted skew join,
bucketed co-located joins (write-side bucketing eliminates the join
shuffle), IGNORE NULLS window modifier.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from calcite_spark.operators.skew import salted_join, skew_stats
from calcite_spark.plans import ir
from calcite_spark.plans.builder import RelBuilder
from calcite_spark.plans.serde import from_json, to_json
from calcite_spark.queries.inventory import catalog_for
from tests.conftest import SF_DIR


def test_plan_json_roundtrip(spark):
    cat = catalog_for(spark, SF_DIR)
    plan = (
        RelBuilder(cat)
        .scan("lineitem")
        .filter("l_quantity > 10")
        .scan("supplier")
        .join("l_suppkey = s_suppkey")
        .aggregate(["s_name"], ["COUNT(*) AS n"])
        .sort_limit(["n DESC", "s_name"], fetch=5)
        .build()
    )
    text = to_json(plan)
    restored = from_json(text)
    assert to_json(restored) == text
    a = sorted(tuple(r) for r in restored.to_df(cat).collect())
    b = sorted(tuple(r) for r in plan.to_df(cat).collect())
    assert a == b and len(a) == 5


def test_salted_join_matches_plain(spark):
    cat = catalog_for(spark, SF_DIR)
    li = cat.table("lineitem").select("l_suppkey", "l_quantity")
    sup = cat.table("supplier").select("s_suppkey", "s_name")
    plain = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("n"))
    )
    salted = (
        salted_join(li, sup, "l_suppkey", "s_suppkey", salt=4)
        .groupBy("s_name")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(tuple(r) for r in plain.collect()) == sorted(
        tuple(r) for r in salted.collect()
    )


def test_skew_stats(spark):
    cat = catalog_for(spark, SF_DIR)
    stats = skew_stats(cat.table("lineitem"), "l_returnflag")
    assert stats["n_keys"] == 3
    assert stats["skew_ratio"] >= 1.0
    assert len(stats["hot_keys"]) == 3


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Write both sides bucketed on the join key → the join plans with
    NO Exchange on either side (the 100 TB co-location pattern)."""
    from calcite_spark.exec import plan_report

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    cat = catalog_for(spark, SF_DIR)
    cat.table("orders").write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    cat.table("lineitem").selectExpr("l_orderkey", "l_quantity").write.bucketBy(
        8, "l_orderkey"
    ).sortBy("l_orderkey").saveAsTable("b_lineitem")
    joined = spark.table("b_lineitem").join(
        spark.table("b_orders"), F.expr("l_orderkey = o_orderkey")
    )
    rep = plan_report(joined)
    assert rep["exchanges"] == 0, rep["text"][:1500]
    assert joined.count() > 0
    spark.sql("DROP TABLE b_orders")
    spark.sql("DROP TABLE b_lineitem")


def test_ignore_nulls_window(spark, duck):
    """IGNORE NULLS (AggregateCall.ignoreNulls:66) on last_value/lag —
    gap-filling idiom; DuckDB supports the same modifier as oracle."""
    from tests.conftest import assert_matches_oracle

    cat = catalog_for(spark, SF_DIR)
    cat.register_all_views()
    # Spark puts IGNORE NULLS after the call, DuckDB inside the parens
    spark_sql = """
        SELECT o_custkey, o_orderkey,
               last_value(CASE WHEN o_totalprice > 150000 THEN o_orderkey END) IGNORE NULLS
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS last_big_order
        FROM orders WHERE o_custkey <= 80
        ORDER BY o_custkey, o_orderkey
    """
    duck_sql = """
        SELECT o_custkey, o_orderkey,
               last_value(CASE WHEN o_totalprice > 150000 THEN o_orderkey END IGNORE NULLS)
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS last_big_order
        FROM orders WHERE o_custkey <= 80
        ORDER BY o_custkey, o_orderkey
    """
    assert_matches_oracle(spark.sql(spark_sql), duck, duck_sql)


def test_salted_join_same_key_name(spark):
    """Regression: identical left/right key names must not degenerate to
    salt-only matching (the pre-fix condition resolved both sides to the
    left column and was trivially true)."""
    cat = catalog_for(spark, SF_DIR)
    li = cat.table("lineitem").select("l_suppkey", "l_quantity")
    sup = cat.table("supplier").selectExpr("s_suppkey AS l_suppkey", "s_name")
    plain = (
        li.join(sup.withColumnRenamed("l_suppkey", "sk"), F.col("l_suppkey") == F.col("sk"))
        .groupBy("s_name")
        .agg(F.count("*").alias("n"))
    )
    salted = (
        salted_join(li, sup, "l_suppkey", "l_suppkey", salt=4)
        .groupBy("s_name")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(tuple(r) for r in plain.collect()) == sorted(
        tuple(r) for r in salted.collect()
    )


def test_plan_dot_and_xml_writers(spark):
    """EXPLAIN formats ≈ RelDotWriter.java / RelXmlWriter.java: the same
    plan rendered as a Graphviz digraph and nested XML."""
    import xml.etree.ElementTree as ET

    from calcite_spark.plans.serde import to_dot, to_xml

    cat = catalog_for(spark, SF_DIR)
    plan = (
        RelBuilder(cat)
        .scan("orders")
        .filter("o_totalprice > 100")
        .aggregate(["o_orderstatus"], ["COUNT(*) AS n"])
        .build()
    )
    dot = to_dot(plan)
    assert dot.startswith("digraph plan {") and dot.rstrip().endswith("}")
    for rel in ("Scan", "Filter", "Aggregate"):
        assert rel in dot
    # child -> parent edges: scan feeds filter feeds aggregate
    assert dot.count("->") == 2

    xml = to_xml(plan)
    root = ET.fromstring(xml)  # well-formed
    assert root.get("type") == "Aggregate"
    child = root.find("RelNode")
    assert child is not None and child.get("type") == "Filter"
    grandchild = child.find("RelNode")
    assert grandchild is not None and grandchild.get("type") == "Scan"
    assert any(p.get("name") == "table" for p in grandchild.findall("Property"))


def test_plan_dot_escapes_hostile_labels(spark):
    """RelDotWriter-style escaping: conditions containing backslashes,
    quotes, or literal newlines must yield valid DOT (ADVICE r4)."""
    from calcite_spark.plans import ir
    from calcite_spark.plans.serde import to_dot

    cond = 'c_name LIKE \'a\\nb"c\' AND c_comment != \'x\ny\''
    plan = ir.Filter(cond, inputs=(ir.Scan("customer"),))
    dot = to_dot(plan)
    for line in dot.splitlines():
        assert "\n" not in line[1:-1] or not line.strip().startswith('n')
    # every label is a single quoted token with no raw quotes inside
    import re as _re
    for m in _re.finditer(r'label="([^"]*)"', dot):
        assert '"' not in m.group(1)
    assert "\\\\n" in dot or "\\n" in dot  # newline survived as escape


def test_explain_levels(spark):
    """explain() ≈ RelOptUtil.dumpPlan with SqlExplainLevel tiers; the
    ALL tier surfaces the same rowcount/bytes the broadcast and
    join-order rules consume."""
    from calcite_spark.catalog import Catalog
    from calcite_spark.plans.builder import RelBuilder
    from calcite_spark.plans.serde import explain
    from tests.conftest import SF_DIR

    cat = Catalog(spark).register_parquet_dir(SF_DIR)
    plan = (
        RelBuilder(cat)
        .scan("customer")
        .filter("c_mktsegment = 'BUILDING'")
        .aggregate(["c_nationkey"], ["COUNT(*) AS n"])
        .sort_limit(["n DESC"], fetch=3)
        .build()
    )
    none = explain(plan, level="none")
    assert "Sort\n" in none and "(" not in none
    default = explain(plan)
    assert "Filter(condition=[c_mktsegment = 'BUILDING'])" in default
    assert default.splitlines()[0].startswith("Sort(")
    # indentation mirrors tree depth
    assert default.splitlines()[3].startswith("      Scan")
    allattrs = explain(plan, level="all", catalog=cat)
    assert "rowcount = " in allattrs and "bytes = " in allattrs
    # Scan rowcount equals the cached base count
    scan_line = [l for l in allattrs.splitlines() if "Scan" in l][0]
    assert f"rowcount = {float(cat.row_count('customer')):.1f}" in scan_line
    import pytest as _pytest

    with _pytest.raises(ValueError):
        explain(plan, level="verbose")


def test_schema_column_names_parameterized_types():
    """Shared Values-schema splitter: commas inside decimal(p,s) and
    struct/map type parameters are not column separators (session-3
    review: the naive split mis-indexed size metadata and garbled
    emitted VALUES aliases)."""
    from calcite_spark.plans.ir import schema_column_names

    assert schema_column_names("a decimal(10,2), b string") == ["a", "b"]
    assert schema_column_names("m map<string, array<int>>, z double") == ["m", "z"]
    # and the three consumers agree end-to-end: emitted VALUES carries
    # exactly two aliases for a two-column decimal schema
    from calcite_spark.plans import ir
    from calcite_spark.sql.rel2sql import DUCKDB, to_sql

    vals = ir.Values([(1.5, "x")], "a decimal(10,2), b string")
    sql = to_sql(vals, DUCKDB)
    assert "(a, b)" in sql
