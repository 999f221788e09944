"""Core relational-operator queries (SURVEY.md §2.1/2.3/2.4/2.7) over the
TPC-H-ish testdata. Each query exercises one operator family and cites
the Calcite operator it covers; built through the RelBuilder IR
(≈ tools/RelBuilder.java) or Spark SQL (for subquery forms the way
SqlToRelConverter would produce them).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from calcite_spark.plans.builder import RelBuilder
from calcite_spark.queries.inventory import catalog_for, register


def _b(spark, sf_dir) -> RelBuilder:
    return RelBuilder(catalog_for(spark, sf_dir))


def _sql(spark, sf_dir, sql: str):
    catalog_for(spark, sf_dir).register_all_views()
    return spark.sql(sql)


# ---------------------------------------------------------------------
# Aggregate + Filter + Sort — rel/core/Aggregate.java:80, Filter.java:62,
# Sort.java:52 (TPC-H Q1 shape, the M0 vertical slice)
# ---------------------------------------------------------------------


@register(
    "z01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 3) AS sum_qty,
           ROUND(SUM(l_extendedprice), 3) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 3) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 3) AS sum_charge,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_extendedprice), 6) AS avg_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("aggregate", "filter", "sort"),
)
def z01_pricing_summary(spark, sf_dir):
    """Scan→Filter→Aggregate(8 calls)→Sort ≈ TpchTest Q1."""
    return (
        _b(spark, sf_dir)
        .scan("lineitem")
        .filter("l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'")
        .aggregate(
            ["l_returnflag", "l_linestatus"],
            [
                "ROUND(SUM(l_quantity), 3) AS sum_qty",
                "ROUND(SUM(l_extendedprice), 3) AS sum_base_price",
                "ROUND(SUM(l_extendedprice * (1 - l_discount)), 3) AS sum_disc_price",
                "ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 3) AS sum_charge",
                "ROUND(AVG(l_quantity), 6) AS avg_qty",
                "ROUND(AVG(l_extendedprice), 6) AS avg_price",
                "ROUND(AVG(l_discount), 6) AS avg_disc",
                "COUNT(*) AS count_order",
            ],
        )
        .sort("l_returnflag", "l_linestatus")
        .to_df()
    )


# ---------------------------------------------------------------------
# Join chain with broadcast dims — rel/core/Join.java:63 (INNER),
# Exchange/broadcast trait ≈ Exchange.java:45
# ---------------------------------------------------------------------


@register(
    "z02_revenue_by_nation",
    oracle="""
    SELECT r_name, n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 3) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
    """,
    tags=("join", "broadcast", "aggregate"),
)
def z02_revenue_by_nation(spark, sf_dir):
    """4-way join; nation/region broadcast by the BroadcastSmallDimensions
    rewrite rule (fact table never shuffles for dimension joins)."""
    return (
        _b(spark, sf_dir)
        .scan("lineitem")
        .scan("supplier")
        .join("l_suppkey = s_suppkey")
        .scan("nation")
        .join("s_nationkey = n_nationkey")
        .scan("region")
        .join("n_regionkey = r_regionkey")
        .aggregate(
            ["r_name", "n_name"],
            [
                "ROUND(SUM(l_extendedprice * (1 - l_discount)), 3) AS revenue",
                "COUNT(*) AS n_items",
            ],
        )
        .sort("r_name", "n_name")
        .to_df()
    )


# ---------------------------------------------------------------------
# Top-K (Sort with fetch → TakeOrderedAndProject) ≈ EnumerableLimitSort.java:43
# ---------------------------------------------------------------------


@register(
    "z03_topk_orders",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 3) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "sort", "limit", "topk"),
)
def z03_topk_orders(spark, sf_dir):
    """TPC-H Q3 shape: join+agg+top-K; Spark plans TakeOrderedAndProject
    (no global sort — each partition keeps 10, driver merges)."""
    return (
        _b(spark, sf_dir)
        .scan("customer")
        .filter("c_mktsegment = 'BUILDING'")
        .scan("orders")
        .join("c_custkey = o_custkey")
        .scan("lineitem")
        .join("l_orderkey = o_orderkey")
        .aggregate(
            ["l_orderkey", "o_orderdate"],
            ["ROUND(SUM(l_extendedprice * (1 - l_discount)), 3) AS revenue"],
        )
        .project("l_orderkey", "revenue", "o_orderdate")
        .sort_limit(["revenue DESC", "l_orderkey"], fetch=10)
        .to_df()
    )


# ---------------------------------------------------------------------
# Semi / anti join — JoinRelType.SEMI:59 / ANTI:73, SemiJoinRule.java
# ---------------------------------------------------------------------


# z04_semi_join retired from the registry in r13 (the r12 verdict's
# rotation arithmetic: 50 r10-green names + the owed qx59..qx63 rows =
# 55 claims on 50 slots — one of the five pre-receipted candidates at
# inventory.py's r13 window plan). Receipts, re-verified before
# removal: z05_anti_join remains the driver row for the semi/anti
# lowering family (same left_semi/left_anti builder path), the semi
# shape is load-bearing inside the driver-green TPC-H EXISTS rows
# (q67_tpch11, qx13_tpch4, qx06_tpch21 — all pass r12), the breadth
# corpus replays IN+EXISTS conjunction / NOT EXISTS / nested-EXISTS
# shapes vs DuckDB every round (tests/test_breadth_corpus.py shapes
# 7, 54, 76, 95), and the left-semi PLAN is pinned by
# tests/test_plan_quality.py::test_semi_join_stays_semi, which keeps
# calling this (now unregistered) function directly.
def z04_semi_join(spark, sf_dir):
    """EXISTS → left_semi join (what SubQueryRemoveRule+SemiJoinRule do)."""
    return (
        _b(spark, sf_dir)
        .scan("orders")
        .scan("lineitem")
        .filter("l_quantity > 45")
        .semi_join("o_orderkey = l_orderkey")
        .aggregate(["o_orderpriority"], ["COUNT(*) AS order_count"])
        .sort("o_orderpriority")
        .to_df()
    )


@register(
    "z05_anti_join",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers,
           ROUND(SUM(c_acctbal), 3) AS total_acctbal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("join", "anti"),
)
def z05_anti_join(spark, sf_dir):
    """NOT EXISTS → left_anti (≈ MinusToAntiJoinRule territory)."""
    return (
        _b(spark, sf_dir)
        .scan("customer")
        .scan("orders")
        .anti_join("c_custkey = o_custkey")
        .aggregate(
            ["c_mktsegment"],
            ["COUNT(*) AS n_customers", "ROUND(SUM(c_acctbal), 3) AS total_acctbal"],
        )
        .sort("c_mktsegment")
        .to_df()
    )


# ---------------------------------------------------------------------
# Selective filter + global agg — Filter pushdown to parquet scan
# ---------------------------------------------------------------------


@register(
    "z06_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 3) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("filter", "aggregate", "pushdown"),
)
def z06_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: every predicate reaches the parquet scan (PushedFilters)."""
    return (
        _b(spark, sf_dir)
        .scan("lineitem")
        .filter(
            "l_shipdate >= TIMESTAMP '1994-01-01 00:00:00' AND "
            "l_shipdate < TIMESTAMP '1995-01-01 00:00:00' AND "
            "l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
        )
        .aggregate(
            [],
            [
                "ROUND(SUM(l_extendedprice * l_discount), 3) AS revenue",
                "COUNT(*) AS n_rows",
            ],
        )
        .to_df()
    )


# ---------------------------------------------------------------------
# GROUPING SETS / ROLLUP / CUBE — Aggregate.groupSets (Aggregate.java:118),
# SqlStdOperatorTable CUBE:226 ROLLUP:231 GROUPING_SETS:236
# ---------------------------------------------------------------------


@register(
    "z07_rollup",
    oracle="""
    SELECT r_name, n_name,
           ROUND(SUM(s_acctbal), 3) AS total_bal,
           COUNT(*) AS n_suppliers,
           CAST(GROUPING(r_name) AS INT) AS g_region,
           CAST(GROUPING(n_name) AS INT) AS g_nation
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
    """,
    tags=("aggregate", "rollup", "grouping"),
)
def z07_rollup(spark, sf_dir):
    return (
        _b(spark, sf_dir)
        .scan("supplier")
        .scan("nation")
        .join("s_nationkey = n_nationkey")
        .scan("region")
        .join("n_regionkey = r_regionkey")
        .aggregate(
            ["r_name", "n_name"],
            [
                "ROUND(SUM(s_acctbal), 3) AS total_bal",
                "COUNT(*) AS n_suppliers",
                "CAST(GROUPING(r_name) AS INT) AS g_region",
                "CAST(GROUPING(n_name) AS INT) AS g_nation",
            ],
            group_type="ROLLUP",
        )
        .sort("r_name NULLS FIRST", "n_name NULLS FIRST")
        .to_df()
    )


@register(
    "z08_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 3) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("aggregate", "cube"),
)
def z08_cube(spark, sf_dir):
    return (
        _b(spark, sf_dir)
        .scan("lineitem")
        .aggregate(
            ["l_returnflag", "l_linestatus"],
            ["ROUND(SUM(l_quantity), 3) AS sum_qty", "COUNT(*) AS n_rows"],
            group_type="CUBE",
        )
        .sort("l_returnflag NULLS FIRST", "l_linestatus NULLS FIRST")
        .to_df()
    )


@register(
    "z09_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 3) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    tags=("aggregate", "grouping_sets"),
)
def z09_grouping_sets(spark, sf_dir):
    return (
        _b(spark, sf_dir)
        .scan("orders")
        .aggregate(
            ["o_orderstatus", "o_orderpriority"],
            ["COUNT(*) AS n_orders", "ROUND(SUM(o_totalprice), 3) AS total_price"],
            group_type="GROUPING_SETS",
            grouping_sets=[["o_orderstatus"], ["o_orderpriority"], []],
        )
        .sort("o_orderstatus NULLS FIRST", "o_orderpriority NULLS FIRST")
        .to_df()
    )


# ---------------------------------------------------------------------
# Distinct / filtered aggregates — AggregateCall.distinct:186, filterArg:74
# ---------------------------------------------------------------------


@register(
    "z10_distinct_filtered_agg",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
           ROUND(AVG(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 4) AS avg_urgent,
           CAST(COUNT(DISTINCT EXTRACT(YEAR FROM o_orderdate)) AS BIGINT) AS n_years
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("aggregate", "distinct", "filter_clause"),
)
def z10_distinct_filtered_agg(spark, sf_dir):
    """DISTINCT + FILTER(WHERE) aggregate modifiers
    (AggregateExpandDistinctAggregatesRule ≈ Spark RewriteDistinctAggregates)."""
    return (
        _b(spark, sf_dir)
        .scan("orders")
        .aggregate(
            ["o_orderstatus"],
            [
                "COUNT(DISTINCT o_custkey) AS n_customers",
                "COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big",
                "ROUND(AVG(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 4) AS avg_urgent",
                "CAST(COUNT(DISTINCT EXTRACT(YEAR FROM o_orderdate)) AS BIGINT) AS n_years",
            ],
        )
        .sort("o_orderstatus")
        .to_df()
    )


# ---------------------------------------------------------------------
# Set operations — Union.java:37 / Intersect.java:40 / Minus.java:43
# ---------------------------------------------------------------------


@register(
    "z11_union",
    oracle="""
    SELECT key_ AS custkey FROM (
      SELECT DISTINCT c_custkey AS key_ FROM customer WHERE c_acctbal > 9000
      UNION
      SELECT DISTINCT o_custkey AS key_ FROM orders WHERE o_totalprice > 300000
    ) ORDER BY custkey
    """,
    tags=("setop", "union"),
)
def z11_union(spark, sf_dir):
    return (
        _b(spark, sf_dir)
        .scan("customer")
        .filter("c_acctbal > 9000")
        .project("c_custkey AS custkey")
        .scan("orders")
        .filter("o_totalprice > 300000")
        .project("o_custkey AS custkey")
        .union()
        .sort("custkey")
        .to_df()
    )


# z12_intersect retired from the registry in r13 (same rotation
# arithmetic — pre-receipted candidate #1 at inventory.py's r13
# window plan). Receipts, re-verified before removal: the set-op trio
# was over-covered — z11_union and z13_except remain driver rows
# through the SAME IR SetOp lowering (ir.py Union/Intersect/Minus
# share one node), q96_intersect_all / q97_except_all (pass r12) pin
# the bag forms, set-op.iq replays the reference's INTERSECT fixtures
# every round, and the breadth corpus carries INTERSECT/EXCEPT shapes
# vs DuckDB.


@register(
    "z13_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    ORDER BY custkey
    """,
    tags=("setop", "except"),
)
def z13_except(spark, sf_dir):
    return (
        _b(spark, sf_dir)
        .scan("customer")
        .project("c_custkey AS custkey")
        .scan("orders")
        .project("o_custkey AS custkey")
        .minus()
        .sort("custkey")
        .to_df()
    )


# ---------------------------------------------------------------------
# CASE / conditional aggregation — AggregateCaseToFilterRule shape
# ---------------------------------------------------------------------


@register(
    "z14_case_agg",
    oracle="""
    SELECT EXTRACT(YEAR FROM o_orderdate) AS order_year,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count,
           ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END), 3) AS f_price
    FROM orders
    GROUP BY order_year
    ORDER BY order_year
    """,
    tags=("aggregate", "case"),
)
def z14_case_agg(spark, sf_dir):
    return (
        _b(spark, sf_dir)
        .scan("orders")
        .project(
            "EXTRACT(YEAR FROM o_orderdate) AS order_year",
            "o_orderpriority",
            "o_orderstatus",
            "o_totalprice",
        )
        .aggregate(
            ["order_year"],
            [
                "SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS high_count",
                "SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS low_count",
                "ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END), 3) AS f_price",
            ],
        )
        .sort("order_year")
        .to_df()
    )


# ---------------------------------------------------------------------
# Outer join + agg — Q13 shape (LEFT join preserving empty groups)
# ---------------------------------------------------------------------


@register(
    "z15_left_join_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "left", "aggregate"),
)
def z15_left_join_distribution(spark, sf_dir):
    return (
        _b(spark, sf_dir)
        .scan("customer")
        .scan("orders")
        .join("c_custkey = o_custkey", join_type="LEFT")
        .aggregate(["c_custkey"], ["COUNT(o_orderkey) AS c_count"])
        .aggregate(["c_count"], ["COUNT(*) AS custdist"])
        .sort("custdist DESC", "c_count DESC")
        .to_df()
    )


# ---------------------------------------------------------------------
# Values — rel/core/Values.java:51
# ---------------------------------------------------------------------


@register(
    "z16_values_join",
    oracle="""
    SELECT t.tier AS tier, COUNT(*) AS n, ROUND(SUM(c_acctbal), 3) AS bal
    FROM customer
    JOIN (VALUES ('AUTOMOBILE', 'retail'), ('BUILDING', 'construction'),
                 ('MACHINERY', 'industrial')) AS t(seg, tier)
      ON c_mktsegment = t.seg
    GROUP BY t.tier
    ORDER BY tier
    """,
    tags=("values", "join"),
)
def z16_values_join(spark, sf_dir):
    """Inline Values relation joined to a table (broadcast: literal side)."""
    return (
        _b(spark, sf_dir)
        .scan("customer")
        .values(
            [("AUTOMOBILE", "retail"), ("BUILDING", "construction"), ("MACHINERY", "industrial")],
            "seg string, tier string",
        )
        .join("c_mktsegment = seg", broadcast_right=True)
        .aggregate(["tier"], ["COUNT(*) AS n", "ROUND(SUM(c_acctbal), 3) AS bal"])
        .sort("tier")
        .to_df()
    )


# ---------------------------------------------------------------------
# Subqueries — SubQueryRemoveRule.java (IN / EXISTS / scalar), delegated
# to Spark SQL exactly as SqlToRelConverter hands them to the planner
# ---------------------------------------------------------------------


@register(
    "z17_scalar_subquery",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l_partkey)
    """,
    tags=("subquery", "scalar", "correlated"),
)
def z17_scalar_subquery(spark, sf_dir):
    """TPC-H Q17: correlated scalar subquery (RelDecorrelator ≈ Catalyst
    DecorrelateInnerQuery turns it into an agg+join)."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT ROUND(SUM(l_extendedprice) / 7.0, 4) AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < (
            SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = l_partkey)
        """,
    )


# z18_in_subquery retired from the registry in r13 (same rotation
# arithmetic — pre-receipted candidate #4 at inventory.py's r13
# window plan). Receipts, re-verified before removal:
# q72_not_in_null_aware (green r11) and q73_quantified_all (in the
# r13 window) remain the driver rows for IN-subquery semantics, the
# breadth corpus replays IN+EXISTS / HAVING-derived-table shapes vs
# DuckDB every round, qx00_tpch18_large_volume (pass r12) is the SAME
# TPC-H Q18 query family through the frontend, and the function stays
# a bench headline (bench.py imports it directly) so its wall-time is
# still recorded every round.
def z18_in_subquery(spark, sf_dir):
    """TPC-H Q18 shape (large-volume customers) with HAVING."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT c_name, o_orderkey, o_totalprice, total_qty
        FROM orders
        JOIN (SELECT l_orderkey, ROUND(SUM(l_quantity), 3) AS total_qty
              FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250) big
          ON o_orderkey = big.l_orderkey
        JOIN customer ON c_custkey = o_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        """,
    )


@register(
    "z19_correlated_exists",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_acctbal > 9900.0
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_suppkey = s_suppkey AND l_discount >= 0.09)
    ORDER BY s_name
    """,
    tags=("subquery", "exists"),
)
def z19_correlated_exists(spark, sf_dir):
    return _sql(
        spark,
        sf_dir,
        """
        SELECT s_name, s_acctbal
        FROM supplier
        WHERE s_acctbal > 9900.0
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_suppkey = s_suppkey AND l_discount >= 0.09)
        ORDER BY s_name
        """,
    )


# ---------------------------------------------------------------------
# Pivot / Unpivot — sql/SqlPivot.java:49 / SqlUnpivot.java:54
# ---------------------------------------------------------------------


@register(
    "z20_pivot",
    oracle="""
    SELECT l_returnflag,
           ROUND(COALESCE(SUM(l_quantity) FILTER (WHERE l_linestatus = 'F'), 0), 3) AS F,
           ROUND(COALESCE(SUM(l_quantity) FILTER (WHERE l_linestatus = 'O'), 0), 3) AS O
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("pivot",),
)
def z20_pivot(spark, sf_dir):
    """PIVOT ≈ SqlToRelConverter.convertPivot:3060 → groupBy().pivot()."""
    cat = catalog_for(spark, sf_dir)
    df = (
        cat.table("lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.coalesce(F.sum("l_quantity"), F.lit(0.0)), 3))
        .orderBy("l_returnflag")
    )
    return df


@register(
    "z21_unpivot",
    oracle="""
    SELECT p_partkey, metric, ROUND(val, 3) AS val
    FROM (
      SELECT p_partkey, 'retail' AS metric, p_retailprice AS val FROM part
      UNION ALL
      SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
    )
    WHERE p_partkey <= 50
    ORDER BY p_partkey, metric
    """,
    tags=("unpivot",),
)
def z21_unpivot(spark, sf_dir):
    """UNPIVOT ≈ SqlToRelConverter.convertUnpivot:3142 → df.unpivot."""
    cat = catalog_for(spark, sf_dir)
    df = (
        cat.table("part")
        .filter("p_partkey <= 50")
        .selectExpr("p_partkey", "p_retailprice AS retail", "CAST(p_size AS DOUBLE) AS size")
        .unpivot(["p_partkey"], ["retail", "size"], "metric", "val_raw")
        .selectExpr("p_partkey", "metric", "ROUND(val_raw, 3) AS val")
        .orderBy("p_partkey", "metric")
    )
    return df


# ---------------------------------------------------------------------
# Uncollect / UNNEST — rel/core/Uncollect.java:60 (+ ordinality)
# ---------------------------------------------------------------------


@register(
    "z22_unnest_ordinality",
    oracle="""
    SELECT p_partkey,
           unnest(string_split(p_type, ' ')) AS tok,
           CAST(unnest(generate_series(1, len(string_split(p_type, ' ')))) AS INT) AS ordinality
    FROM part
    WHERE p_partkey <= 30
    ORDER BY p_partkey, ordinality
    """,
    tags=("uncollect", "unnest"),
)
def z22_unnest_ordinality(spark, sf_dir):
    """UNNEST WITH ORDINALITY → posexplode + 1 (SQL-standard 1-based)."""
    return (
        _b(spark, sf_dir)
        .scan("part")
        .filter("p_partkey <= 30")
        .uncollect("split(p_type, ' ')", alias="tok", with_ordinality=True, keep=("p_partkey",))
        .project("p_partkey", "tok", "CAST(ordinality AS INT) AS ordinality")
        .sort("p_partkey", "ordinality")
        .to_df()
    )


# ---------------------------------------------------------------------
# Collect (nest into array) — rel/core/Collect.java:52
# ---------------------------------------------------------------------


@register(
    "z23_collect_array",
    oracle="""
    SELECT l_orderkey AS o_orderkey,
           array_to_string(list_sort(list(l_linenumber)), ',') AS line_numbers,
           CAST(len(list(l_linenumber)) AS INT) AS n_lines
    FROM lineitem
    WHERE l_orderkey <= 100
    GROUP BY l_orderkey
    ORDER BY o_orderkey
    """,
    tags=("collect", "array"),
)
def z23_collect_array(spark, sf_dir):
    cat = catalog_for(spark, sf_dir)
    return (
        cat.table("lineitem")
        .filter("l_orderkey <= 100")
        .selectExpr("l_orderkey AS o_orderkey", "l_linenumber")
        .groupBy("o_orderkey")
        .agg(
            # serialized to CSV: the driver canonicalizer (pandas sort_values)
            # cannot hash list-typed cells, so the Collect result is surfaced
            # as a deterministic string on both sides of the compare.
            F.expr("array_join(sort_array(collect_list(l_linenumber)), ',')").alias(
                "line_numbers"
            ),
            F.expr("CAST(size(collect_list(l_linenumber)) AS INT)").alias("n_lines"),
        )
        .orderBy("o_orderkey")
    )
