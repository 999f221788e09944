"""Second TPC-H wave ≈ plus/src/test/java/org/apache/calcite/adapter/
tpch/TpchTest.java (22-query corpus): the join-heavy / decorrelation-
heavy shapes (Q5 Q7 Q8 Q10 Q19 Q22), adapted to the driver testdata
columns (FIXTURES.md §B: no ps_*, no l_commitdate/receiptdate/
c_phone — predicates substituted with available columns, shapes kept).
"""

from __future__ import annotations

from calcite_spark.queries.inventory import catalog_for, register


def _sql(spark, sf_dir, sql: str):
    catalog_for(spark, sf_dir).register_all_views()
    return spark.sql(sql)


_Q84 = """
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 3) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
"""


@register("q84_tpch5_local_supplier", oracle=_Q84, tags=("tpch", "join6"))
def q84_tpch5_local_supplier(spark, sf_dir):
    """TPC-H Q5: 6-way join with a same-nation constraint
    (c_nationkey = s_nationkey) — the classic join-order stress test."""
    return _sql(spark, sf_dir, _Q84)


_Q85 = """
    SELECT supp_nation, cust_nation, l_year,
           ROUND(SUM(volume), 3) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(YEAR FROM l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1998-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
"""


@register("q85_tpch7_volume_shipping", oracle=_Q85, tags=("tpch", "self_join"))
def q85_tpch7_volume_shipping(spark, sf_dir):
    """TPC-H Q7: nation self-join (n1/n2) + disjunctive pair predicate."""
    return _sql(spark, sf_dir, _Q85)


_Q86 = """
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END) /
                 SUM(volume), 6) AS mkt_share
    FROM (
      SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA'
        AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
"""


@register("q86_tpch8_market_share", oracle=_Q86, tags=("tpch", "join8"))
def q86_tpch8_market_share(spark, sf_dir):
    """TPC-H Q8: 8-way join + conditional share aggregate."""
    return _sql(spark, sf_dir, _Q86)


_Q87 = """
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 3) AS revenue,
           ROUND(c_acctbal, 3) AS c_acctbal,
           n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""


@register("q87_tpch10_returned_items", oracle=_Q87, tags=("tpch", "topk"))
def q87_tpch10_returned_items(spark, sf_dir):
    """TPC-H Q10: returned-item revenue ranking, top-20."""
    return _sql(spark, sf_dir, _Q87)


_Q88 = """
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
"""


@register("q88_tpch19_disjunctive", oracle=_Q88, tags=("tpch", "disjunction"))
def q88_tpch19_disjunctive(spark, sf_dir):
    """TPC-H Q19: OR-of-ANDs across both join sides — tests that the
    common join key predicate is still extracted (join stays hash, the
    disjunction evaluates post-join)."""
    return _sql(spark, sf_dir, _Q88)


_Q89 = """
    SELECT cntrycode, COUNT(*) AS numcust, ROUND(SUM(c_acctbal), 3) AS totacctbal
    FROM (
      SELECT RIGHT(c_name, 2) AS cntrycode, c_acctbal
      FROM customer
      WHERE RIGHT(c_name, 2) IN ('01', '13', '17', '23', '29', '30', '31')
        AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.00)
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    ) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
"""


@register("q89_tpch22_global_sales", oracle=_Q89, tags=("tpch", "anti", "scalar_subquery"))
def q89_tpch22_global_sales(spark, sf_dir):
    """TPC-H Q22 shape: scalar subquery + NOT EXISTS anti join
    (c_phone country code substituted with the c_name suffix)."""
    return _sql(spark, sf_dir, _Q89)
