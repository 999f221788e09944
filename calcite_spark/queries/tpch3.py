"""Third TPC-H wave — completes the 22-query corpus ≈ plus/src/test/
java/org/apache/calcite/adapter/tpch/TpchTest.java. Waves 1-2 covered
Q1 Q3 Q5 Q6 Q7 Q8 Q10 Q19 Q22; this file adds the remaining shapes
(Q2 Q4 Q9 Q11 Q12 Q13 Q14 Q15 Q16 Q17 Q18 Q20 Q21), adapted to the
driver testdata surface (FIXTURES.md §A: no partsupp table, no
l_shipmode/l_commitdate/l_receiptdate — lineitem serves as the
part↔supplier bridge, ship-vs-order dates replace commit-vs-receipt,
and order priority replaces ship mode; every DECORRELATION/JOIN SHAPE
of the original is preserved, which is what the reference's planner
tests exercise).

Each query runs the same SQL through Spark AND DuckDB (the oracle), so
correctness is a true cross-engine check, not an echo. Floats ROUND()ed
on both sides; year() cast to BIGINT (engines disagree on EXTRACT's
width).
"""

from __future__ import annotations

from calcite_spark.queries.inventory import catalog_for, register


def _sql(spark, sf_dir, sql: str):
    catalog_for(spark, sf_dir).register_all_views()
    return spark.sql(sql)


_QX12 = """
    SELECT ROUND(s_acctbal, 3) AS s_acctbal, s_name, n_name, p_partkey, p_name
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
      AND s_acctbal = (
        SELECT MIN(s2.s_acctbal)
        FROM supplier s2
        JOIN lineitem l2 ON s2.s_suppkey = l2.l_suppkey
        JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
    GROUP BY s_acctbal, s_name, n_name, p_partkey, p_name
    ORDER BY s_acctbal, s_name, p_partkey
    LIMIT 100
"""


@register("qx12_tpch2_min_cost_supplier", oracle=_QX12, tags=("tpch", "correlated_scalar"))
def qx12_tpch2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: correlated scalar MIN subquery selecting the
    best supplier per part within a region (lineitem stands in for
    partsupp; min acctbal for min supplycost)."""
    return _sql(spark, sf_dir, _QX12)


_QX13 = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@register("qx13_tpch4_order_priority", oracle=_QX13, tags=("tpch", "exists"))
def qx13_tpch4_order_priority(spark, sf_dir):
    """TPC-H Q4: EXISTS semi join + priority rollup (late-shipment
    predicate substitutes commit-vs-receipt)."""
    return _sql(spark, sf_dir, _QX13)


_QX14 = """
    SELECT nation, o_year, ROUND(SUM(amount), 1) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.5 * p_retailprice * l_quantity AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
"""


@register("qx14_tpch9_product_profit", oracle=_QX14, tags=("tpch", "join5", "like"))
def qx14_tpch9_product_profit(spark, sf_dir):
    """TPC-H Q9: 5-way join + LIKE filter + profit expression
    (0.5*p_retailprice substitutes ps_supplycost)."""
    return _sql(spark, sf_dir, _QX14)


_QX15 = """
    SELECT l_partkey AS ps_partkey,
           ROUND(SUM(l_extendedprice * l_quantity), 2) AS value
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
    GROUP BY l_partkey
    HAVING SUM(l_extendedprice * l_quantity) > (
      SELECT SUM(l_extendedprice * l_quantity) * 0.001
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7')
    ORDER BY value DESC, ps_partkey
"""


@register("q67_tpch11_important_stock", oracle=_QX15, tags=("tpch", "having_subquery"))
def q67_tpch11_important_stock(spark, sf_dir):
    """TPC-H Q11: HAVING > scalar-subquery-fraction-of-total (lineitem
    value substitutes partsupp stock value)."""
    return _sql(spark, sf_dir, _QX15)


_QX16 = """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""


@register("q69_tpch12_shipmode_priority", oracle=_QX16, tags=("tpch", "conditional_agg"))
def q69_tpch12_shipmode_priority(spark, sf_dir):
    """TPC-H Q12: conditional priority counts per group (returnflag
    substitutes ship mode)."""
    return _sql(spark, sf_dir, _QX16)


_QX17 = """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""


@register("q70_tpch13_customer_distribution", oracle=_QX17, tags=("tpch", "double_agg"))
def q70_tpch13_customer_distribution(spark, sf_dir):
    """TPC-H Q13: LEFT JOIN with join-level filter, two-level aggregate
    (count-of-counts distribution)."""
    return _sql(spark, sf_dir, _QX17)


_QX18 = """
    SELECT ROUND(100.00 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
           / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
"""


@register("q71_tpch14_promo_revenue", oracle=_QX18, tags=("tpch", "ratio"))
def q71_tpch14_promo_revenue(spark, sf_dir):
    """TPC-H Q14: promo revenue share (p_type = 'PROMO' is a literal
    value in the synthetic dims)."""
    return _sql(spark, sf_dir, _QX18)


_QX19 = """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, ROUND(total_revenue, 3) AS total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
"""


@register("q76_tpch15_top_supplier", oracle=_QX19, tags=("tpch", "cte", "scalar_max"))
def q76_tpch15_top_supplier(spark, sf_dir):
    """TPC-H Q15: revenue CTE (the original's view) + scalar MAX
    selection of the top supplier."""
    return _sql(spark, sf_dir, _QX19)


_QX20 = """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register("q77_tpch16_parts_suppliers", oracle=_QX20, tags=("tpch", "not_in", "count_distinct"))
def q77_tpch16_parts_suppliers(spark, sf_dir):
    """TPC-H Q16: NOT IN exclusion subquery + COUNT(DISTINCT) rollup
    (negative-acctbal suppliers substitute the complaints filter)."""
    return _sql(spark, sf_dir, _QX20)


_QX21 = """
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 3) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23' AND p_type = 'MEDIUM'
      AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


@register("q78_tpch17_small_quantity", oracle=_QX21, tags=("tpch", "correlated_avg"))
def q78_tpch17_small_quantity(spark, sf_dir):
    """TPC-H Q17: correlated per-part AVG threshold (0.5× instead of
    0.2× so the synthetic uniform quantities keep rows at small SF)."""
    return _sql(spark, sf_dir, _QX21)


_QX22 = """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           ROUND(o_totalprice, 3) AS o_totalprice,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING SUM(l_quantity) > 140)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
"""


@register("qx00_tpch18_large_volume", oracle=_QX22, tags=("tpch", "in_groupby_having"))
def qx00_tpch18_large_volume(spark, sf_dir):
    """TPC-H Q18: IN over a GROUP BY ... HAVING subquery, top-100 by
    price."""
    return _sql(spark, sf_dir, _QX22)


_QX23 = """
    SELECT s_name, s_suppkey
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_3', 'NATION_4', 'NATION_5')
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING SUM(l_quantity) > 50)
    ORDER BY s_name, s_suppkey
"""


@register("qx01_tpch20_potential_promotion", oracle=_QX23, tags=("tpch", "nested_in"))
def qx01_tpch20_potential_promotion(spark, sf_dir):
    """TPC-H Q20: nested IN chains — suppliers of red parts with enough
    shipped volume (lineitem substitutes partsupp availability)."""
    return _sql(spark, sf_dir, _QX23)


_QX24 = """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
"""


@register("qx06_tpch21_waiting_supplier", oracle=_QX24, tags=("tpch", "exists", "not_exists"))
def qx06_tpch21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21: the decorrelation stress query — EXISTS + NOT EXISTS
    both correlated on the same fact table (late-shipping supplier is
    the only one in a multi-supplier order; ship-vs-order dates
    substitute receipt-vs-commit)."""
    return _sql(spark, sf_dir, _QX24)
