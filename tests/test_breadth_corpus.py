"""FoodMart-style breadth corpus ≈ the reference's captured-query set
(core/src/test/java/org/apache/calcite/test/FoodMartQuerySet.java:
thousands of real queries replayed for parse/plan coverage). Here: ~30
STRUCTURALLY DISTINCT query shapes — nested aggregates over joins,
HAVING chains, mixed set-ops, correlated subqueries, expression joins,
multi-level derived tables — each run through the SqlFrontend on Spark
AND natively on DuckDB with IDENTICAL text, values compared. The
cheapest remaining way to find parse/lower bugs a real user would hit
(VERDICT r6 item 5). Shapes are OURS over the TPC-H-ish testdata;
nothing is copied from the reference's FoodMart capture."""

from __future__ import annotations

import pytest

from calcite_spark.queries.inventory import catalog_for
from calcite_spark.sql.frontend import SqlFrontend
from tests.conftest import SF_DIR, assert_matches_oracle

CORPUS = [
    # 1 nested aggregate over a join (aggregate of an aggregate)
    """SELECT AVG(cnt) AS avg_orders_per_cust FROM (
         SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey) t""",
    # 2 HAVING chain with multiple aggregate predicates
    """SELECT o_custkey, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS s
       FROM orders GROUP BY o_custkey
       HAVING COUNT(*) > 8 AND SUM(o_totalprice) > 1000000 AND MIN(o_totalprice) > 500
       ORDER BY o_custkey""",
    # 3 UNION of two aggregates, then outer sort
    """SELECT 'hi' AS grp, COUNT(*) AS n FROM orders WHERE o_totalprice > 300000
       UNION ALL
       SELECT 'lo' AS grp, COUNT(*) AS n FROM orders WHERE o_totalprice <= 300000
       ORDER BY grp""",
    # 4 CASE inside aggregate, aggregate inside HAVING
    """SELECT o_orderstatus,
              SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS urgent
       FROM orders GROUP BY o_orderstatus
       HAVING SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) > 10
       ORDER BY o_orderstatus""",
    # 5 correlated scalar subquery in SELECT
    """SELECT n_name,
              (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_cust
       FROM nation ORDER BY n_name""",
    # 6 scalar subquery in WHERE
    """SELECT COUNT(*) AS n FROM orders
       WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)""",
    # 7 IN + EXISTS conjunction
    """SELECT COUNT(*) AS n FROM customer
       WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
         AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    # 8 self-join with inequality
    """SELECT COUNT(*) AS n
       FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey
       WHERE a.n_nationkey < b.n_nationkey""",
    # 9 derived-table join
    """SELECT r_name, t.n AS nations
       FROM region JOIN (
         SELECT n_regionkey, COUNT(*) AS n FROM nation GROUP BY n_regionkey) t
         ON r_regionkey = t.n_regionkey
       ORDER BY r_name""",
    # 10 GROUP BY expression
    """SELECT o_orderkey % 5 AS bucket, COUNT(*) AS n
       FROM orders GROUP BY o_orderkey % 5 ORDER BY bucket""",
    # 11 ORDER BY ordinal + LIMIT
    """SELECT o_orderpriority, COUNT(*) AS n FROM orders
       GROUP BY o_orderpriority ORDER BY 2 DESC, 1 LIMIT 3""",
    # 12 DISTINCT + FILTER aggregate modifiers together
    """SELECT COUNT(DISTINCT o_custkey) AS custs,
              COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS finished
       FROM orders""",
    # 13 several COUNT DISTINCTs in one aggregate
    """SELECT COUNT(DISTINCT l_returnflag) AS flags,
              COUNT(DISTINCT l_linestatus) AS statuses,
              COUNT(DISTINCT l_shipdate) AS days
       FROM lineitem""",
    # 14 CROSS JOIN reduced by WHERE
    """SELECT COUNT(*) AS n FROM region CROSS JOIN nation
       WHERE r_regionkey = n_regionkey""",
    # 15 LEFT JOIN with COALESCE on the null-extended side
    """SELECT n_name, COALESCE(t.cnt, 0) AS cnt
       FROM nation LEFT JOIN (
         SELECT c_nationkey, COUNT(*) AS cnt FROM customer WHERE c_acctbal < -900
         GROUP BY c_nationkey) t ON n_nationkey = t.c_nationkey
       ORDER BY n_name""",
    # 16 UNION ALL feeding an outer GROUP BY
    """SELECT src, COUNT(*) AS n FROM (
         SELECT 'c' AS src FROM customer
         UNION ALL SELECT 's' AS src FROM supplier) u
       GROUP BY src ORDER BY src""",
    # 17 aggregate over a window subquery
    """SELECT o_orderstatus, COUNT(*) AS top3 FROM (
         SELECT o_orderstatus, row_number() OVER (
           PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders) w
       WHERE rn <= 3 GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    # 18 HAVING with a scalar subquery
    """SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey
       HAVING COUNT(*) > (SELECT AVG(o_totalprice) / 60000 FROM orders)
       ORDER BY o_custkey LIMIT 5""",
    # 19 BETWEEN + IN + LIKE conjunction
    """SELECT COUNT(*) AS n FROM part
       WHERE p_retailprice BETWEEN 1200 AND 1500
         AND p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
         AND p_type LIKE '%BRASS%'""",
    # 20 CASE over aggregates in SELECT and ORDER BY
    """SELECT l_returnflag,
              CASE WHEN SUM(l_quantity) > 50000 THEN 'big' ELSE 'small' END AS sz
       FROM lineitem GROUP BY l_returnflag
       ORDER BY CASE WHEN SUM(l_quantity) > 50000 THEN 'big' ELSE 'small' END, l_returnflag""",
    # 21 nested CASE
    """SELECT o_orderkey,
              CASE WHEN o_totalprice > 400000 THEN 'xl'
                   ELSE CASE WHEN o_totalprice > 200000 THEN 'l' ELSE 'm' END
              END AS size_class
       FROM orders ORDER BY o_orderkey LIMIT 10""",
    # 22 string-function chain
    """SELECT UPPER(SUBSTR(TRIM(n_name), 1, 3)) AS code,
              LENGTH(n_name) AS len
       FROM nation ORDER BY code, len""",
    # 23 date-part grouping chain (year → month drilldown)
    """SELECT EXTRACT(YEAR FROM o_orderdate) AS y,
              EXTRACT(MONTH FROM o_orderdate) AS m, COUNT(*) AS n
       FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
       GROUP BY 1, 2 ORDER BY y, m""",
    # 24 arithmetic combining aggregates
    """SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)) / COUNT(*), 2) AS avg_net
       FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'""",
    # 25 three-level nesting
    """SELECT MAX(avg_n) AS max_avg FROM (
         SELECT n_regionkey, AVG(cnt) AS avg_n FROM (
           SELECT n_regionkey, n_nationkey, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM nation JOIN customer ON c_nationkey = n_nationkey
           GROUP BY n_regionkey, n_nationkey) x
         GROUP BY n_regionkey) y""",
    # 26 EXCEPT of two projections
    """SELECT n_regionkey FROM nation WHERE n_nationkey < 20
       EXCEPT
       SELECT r_regionkey FROM region WHERE r_name LIKE 'A%'
       ORDER BY n_regionkey""",
    # 27 join on an expression
    """SELECT COUNT(*) AS n
       FROM orders JOIN customer ON o_custkey % 100 = c_custkey % 100
       WHERE o_orderkey < 100""",
    # 28 GROUP BY + HAVING + ORDER BY DESC + LIMIT (classic top-N report)
    """SELECT c_nationkey, ROUND(SUM(c_acctbal), 2) AS bal
       FROM customer GROUP BY c_nationkey HAVING COUNT(*) > 20
       ORDER BY bal DESC, c_nationkey LIMIT 5""",
    # 29 DISTINCT projection over a join
    """SELECT DISTINCT n_name, r_name
       FROM nation JOIN region ON n_regionkey = r_regionkey
       ORDER BY n_name""",
    # 30 limited derived table under an outer aggregate
    """SELECT ROUND(SUM(o_totalprice), 2) AS s FROM (
         SELECT o_totalprice FROM orders ORDER BY o_totalprice DESC LIMIT 50) t""",
    # 31 window ranking + join + filter on rank
    """SELECT r_name, n_name FROM (
         SELECT n_regionkey, n_name, rank() OVER (
           PARTITION BY n_regionkey ORDER BY n_nationkey) AS rk FROM nation) t
       JOIN region ON r_regionkey = t.n_regionkey
       WHERE rk = 1 ORDER BY r_name""",
    # 32 set-op mix: UNION of an EXCEPT
    """SELECT x FROM (
         SELECT n_regionkey AS x FROM nation EXCEPT SELECT 0 AS x) e
       UNION SELECT 99 AS x ORDER BY x""",
    # 33 explicit NULLS FIRST/LAST (the engines' DEFAULTS diverge —
    # Spark ASC=NULLS FIRST, DuckDB ASC=NULLS LAST — so portable SQL
    # must state it; both honor the explicit form)
    """SELECT v FROM (VALUES (1), (NULL), (3)) AS t(v)
       ORDER BY v DESC NULLS LAST""",
    # 34 GROUPING SETS + GROUPING() marker (NULL group labels ordered
    # explicitly for cross-engine determinism)
    """SELECT o_orderstatus, o_orderpriority,
              GROUPING(o_orderstatus) AS g1, COUNT(*) AS n
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
       ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    # 35 aggregates over an empty input (COUNT 0, SUM/MAX NULL)
    """SELECT COUNT(*) AS n, SUM(o_totalprice) AS s, MAX(o_orderkey) AS mx
       FROM orders WHERE o_orderkey < 0""",
    # 36 arithmetic corner semantics: % sign follows the dividend, /
    # is float division in both engines
    """SELECT 7 % -3 AS a, -7 % 3 AS b, 1 / 4 AS d""",
    # 37 implicit string-to-number coercion in a predicate
    """SELECT COUNT(*) AS n FROM orders WHERE o_orderkey = '32'""",
]

# Batch 2 (r9, VERDICT r8 item 6): ~40 more shapes patterned on the
# CLASSES of query FoodMartQuerySet.java captures — Mondrian-generated
# multi-level rollups, calculated members (arithmetic over measures),
# top-N within group, percent-of-total, period-over-period deltas,
# members-above-average, distinct-count measures over star joins —
# re-expressed over OUR TPC-H-ish testdata; nothing copied.
CORPUS2 = [
    # 38 star join, two dims + measure (the canonical FoodMart shape)
    """SELECT r_name, o_orderpriority, ROUND(SUM(o_totalprice), 2) AS sales
       FROM orders JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY r_name, o_orderpriority ORDER BY r_name, o_orderpriority""",
    # 39 distinct-count measure over a star join
    """SELECT n_name, COUNT(DISTINCT o_custkey) AS buyers
       FROM orders JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       GROUP BY n_name ORDER BY n_name""",
    # 40 multi-level time rollup (year -> month) with ROLLUP. The
    # range must be non-empty: over an EMPTY input Spark's ROLLUP
    # emits zero rows while DuckDB/PG emit the grand-total row — a
    # documented engine divergence found by this corpus (batch 2).
    """SELECT EXTRACT(YEAR FROM o_orderdate) AS y,
              EXTRACT(MONTH FROM o_orderdate) AS m,
              COUNT(*) AS n
       FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
       GROUP BY ROLLUP (EXTRACT(YEAR FROM o_orderdate),
                        EXTRACT(MONTH FROM o_orderdate))
       ORDER BY y NULLS FIRST, m NULLS FIRST""",
    # 41 calculated member: margin ratio over two measures
    """SELECT l_returnflag,
              ROUND((SUM(l_extendedprice) - SUM(l_extendedprice * l_discount))
                    / SUM(l_extendedprice), 6) AS net_ratio
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    # 42 percent-of-total (window over aggregate)
    """SELECT o_orderpriority,
              ROUND(SUM(o_totalprice) * 100.0 / SUM(SUM(o_totalprice)) OVER (), 6) AS pct
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    # 43 top-N within group via window rank
    """SELECT n_name, c_name, bal FROM (
         SELECT n_name, c_name, c_acctbal AS bal,
                row_number() OVER (PARTITION BY n_name
                                   ORDER BY c_acctbal DESC, c_custkey) AS rn
         FROM customer JOIN nation ON c_nationkey = n_nationkey) t
       WHERE rn <= 2 ORDER BY n_name, bal DESC""",
    # 44 members above average (correlated against the global mean)
    """SELECT c_custkey, ROUND(c_acctbal, 2) AS bal FROM customer
       WHERE c_acctbal > (SELECT AVG(c_acctbal) * 1.8 FROM customer)
       ORDER BY bal DESC, c_custkey LIMIT 10""",
    # 45 period-over-period delta via FILTER measures
    """SELECT o_orderpriority,
              COUNT(*) FILTER (WHERE EXTRACT(YEAR FROM o_orderdate) = 1994) AS y94,
              COUNT(*) FILTER (WHERE EXTRACT(YEAR FROM o_orderdate) = 1995) AS y95,
              COUNT(*) FILTER (WHERE EXTRACT(YEAR FROM o_orderdate) = 1995)
                - COUNT(*) FILTER (WHERE EXTRACT(YEAR FROM o_orderdate) = 1994) AS delta
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    # 46 share of parent level (two-level rollup joined back)
    """SELECT n.n_name, ROUND(n.bal / r.bal, 6) AS share FROM
         (SELECT n_regionkey, n_name, SUM(c_acctbal) AS bal
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_regionkey, n_name) n
       JOIN (SELECT n_regionkey, SUM(c_acctbal) AS bal
             FROM customer JOIN nation ON c_nationkey = n_nationkey
             GROUP BY n_regionkey) r
       ON n.n_regionkey = r.n_regionkey
       ORDER BY n.n_name""",
    # 47 count of groups (distinct-member count of a level)
    """SELECT COUNT(*) AS n_groups FROM (
         SELECT DISTINCT o_custkey, o_orderpriority FROM orders) g""",
    # 48 HAVING over a calculated member
    """SELECT o_custkey, ROUND(SUM(o_totalprice) / COUNT(*), 2) AS avg_order
       FROM orders GROUP BY o_custkey
       HAVING SUM(o_totalprice) / COUNT(*) > 250000
       ORDER BY o_custkey""",
    # 49 dim attribute IN-list + measure filter (Mondrian slicer)
    """SELECT c_mktsegment, ROUND(SUM(o_totalprice), 2) AS sales
       FROM orders JOIN customer ON o_custkey = c_custkey
       WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
         AND o_orderstatus = 'F'
       GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    # 50 nested rollup: aggregate of a grouped aggregate of a join
    """SELECT o_orderpriority, MAX(nation_sales) AS best_nation FROM (
         SELECT o_orderpriority, n_name, SUM(o_totalprice) AS nation_sales
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY o_orderpriority, n_name) t
       GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    # 51 CUBE over two dims with GROUPING filters
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
       FROM orders
       GROUP BY CUBE (o_orderstatus, o_orderpriority)
       HAVING GROUPING(o_orderstatus) = 0
       ORDER BY o_orderstatus, o_orderpriority NULLS FIRST""",
    # 52 QUALIFY top-1 per partition (Mondrian top-member)
    """SELECT c_nationkey, c_custkey, c_acctbal FROM customer
       QUALIFY row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey) = 1
       ORDER BY c_nationkey""",
    # 53 two independent subquery measures combined
    """SELECT (SELECT COUNT(*) FROM orders WHERE o_orderstatus = 'F') AS f_orders,
              (SELECT COUNT(*) FROM orders WHERE o_orderstatus = 'O') AS o_orders""",
    # 54 anti-join via NOT EXISTS (customers with no orders)
    """SELECT COUNT(*) AS inactive FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    # 55 conditional aggregation matrix (status x priority pivot-ish)
    """SELECT o_orderstatus,
              SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0 END) AS urgent_sales,
              SUM(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice ELSE 0 END) AS low_sales
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    # 56 measure over a filtered derived dim (snowflake leg)
    """SELECT s_nationkey, COUNT(*) AS n_suppliers,
              ROUND(AVG(s_acctbal), 4) AS avg_bal
       FROM supplier WHERE s_acctbal > 0
       GROUP BY s_nationkey HAVING COUNT(*) >= 2
       ORDER BY s_nationkey""",
    # 57 UNION of per-level rollups (Mondrian multi-level member list)
    """SELECT 'region' AS lvl, r_name AS member, COUNT(*) AS n
       FROM region JOIN nation ON r_regionkey = n_regionkey GROUP BY r_name
       UNION ALL
       SELECT 'nation' AS lvl, n_name AS member, 1 AS n FROM nation
       ORDER BY lvl, member""",
    # 58 window moving aggregate over time buckets
    """SELECT y, m, n, SUM(n) OVER (ORDER BY y, m
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov3
       FROM (SELECT EXTRACT(YEAR FROM o_orderdate) AS y,
                    EXTRACT(MONTH FROM o_orderdate) AS m, COUNT(*) AS n
             FROM orders WHERE o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
             GROUP BY 1, 2) t
       ORDER BY y, m""",
    # 59 LEAD/LAG period comparison
    """SELECT y, n, n - LAG(n) OVER (ORDER BY y) AS yoy
       FROM (SELECT EXTRACT(YEAR FROM o_orderdate) AS y, COUNT(*) AS n
             FROM orders GROUP BY 1) t
       ORDER BY y""",
    # 60 dim join with BETWEEN slicer on the measure source
    """SELECT p_brand, COUNT(*) AS n
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE l_quantity BETWEEN 45 AND 50
       GROUP BY p_brand HAVING COUNT(*) > 2
       ORDER BY p_brand""",
    # 61 three-way set mix with distinct union
    """SELECT n_regionkey AS k FROM nation
       UNION SELECT r_regionkey AS k FROM region
       INTERSECT SELECT n_regionkey AS k FROM nation WHERE n_regionkey >= 2
       ORDER BY k""",
    # 62 scalar subquery per group (per-nation max vs per-customer bal)
    """SELECT n_name,
              (SELECT MAX(c_acctbal) FROM customer WHERE c_nationkey = n_nationkey) AS top_bal
       FROM nation ORDER BY n_name""",
    # 63 self-join time comparison (same customer, two status values)
    """SELECT COUNT(*) AS both_kinds FROM (
         SELECT DISTINCT a.o_custkey
         FROM orders a JOIN orders b ON a.o_custkey = b.o_custkey
         WHERE a.o_orderstatus = 'F' AND b.o_orderstatus = 'O') t""",
    # 64 null-handling measure: NULLIF guarding division
    """SELECT o_orderstatus,
              ROUND(SUM(o_totalprice) / NULLIF(COUNT(*) - COUNT(*), 0), 2) AS div0_is_null,
              COUNT(*) AS n
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    # 65 aggregate of window-deduped rows (latest order per customer)
    """SELECT o_orderstatus, COUNT(*) AS n FROM (
         SELECT o_orderstatus, row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey) AS rn
         FROM orders) t WHERE rn = 1
       GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    # 66 IN over a grouped-HAVING subquery (big customers' orders)
    """SELECT COUNT(*) AS n FROM orders
       WHERE o_custkey IN (SELECT o_custkey FROM orders
                           GROUP BY o_custkey HAVING COUNT(*) > 15)""",
    # 67 CASE-bucketed histogram of a measure
    """SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
                   WHEN o_totalprice < 300000 THEN 'mid'
                   ELSE 'high' END AS bucket, COUNT(*) AS n
       FROM orders GROUP BY 1 ORDER BY bucket""",
    # 68 join + aggregate + ORDER BY hidden calculated member
    """SELECT n_name FROM nation JOIN customer ON c_nationkey = n_nationkey
       GROUP BY n_name
       ORDER BY SUM(c_acctbal) / COUNT(*) DESC, n_name LIMIT 5""",
    # 69 multi-column IN (row-value constructor membership)
    """SELECT COUNT(*) AS n FROM orders
       WHERE (o_orderstatus, o_orderpriority) IN (('F', '1-URGENT'), ('O', '5-LOW'))""",
    # 70 correlated aggregate comparison per row (above own nation avg)
    """SELECT COUNT(*) AS n FROM customer c1
       WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer c2
                          WHERE c2.c_nationkey = c1.c_nationkey)""",
    # 71 grouped string aggregation-ish: MIN/MAX of names per region
    """SELECT n_regionkey, MIN(n_name) AS first_name, MAX(n_name) AS last_name
       FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    # 72 dim attribute LIKE ladder with NOT
    """SELECT COUNT(*) AS n FROM part
       WHERE p_type LIKE 'SMALL%' AND p_type NOT LIKE '%COPPER'""",
    # 73 HAVING referencing an un-projected aggregate
    """SELECT o_custkey FROM orders GROUP BY o_custkey
       HAVING MAX(o_totalprice) > 480000 ORDER BY o_custkey""",
    # 74 window ntile quartiles summarized
    """SELECT q, COUNT(*) AS n, ROUND(MIN(o_totalprice), 2) AS lo
       FROM (SELECT o_totalprice, ntile(4) OVER (
               ORDER BY o_totalprice, o_orderkey) AS q FROM orders) t
       GROUP BY q ORDER BY q""",
    # 75 cross-level calculated member: nation share of region count
    """SELECT n_name, cnt, SUM(cnt) OVER (PARTITION BY rk) AS region_cnt
       FROM (SELECT n_name, n_regionkey AS rk, CAST(COUNT(c_custkey) AS BIGINT) AS cnt
             FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
             GROUP BY n_name, n_regionkey) t
       ORDER BY n_name""",
    # 76 EXISTS + correlated range (customers with a recent big order)
    """SELECT COUNT(*) AS n FROM customer
       WHERE EXISTS (SELECT 1 FROM orders
                     WHERE o_custkey = c_custkey
                       AND o_totalprice > 400000
                       AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00')""",
    # 77 arithmetic on date parts (quarter computation)
    """SELECT (EXTRACT(MONTH FROM o_orderdate) + 2) / 3 AS qtr_float,
              COUNT(*) AS n
       FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
       GROUP BY 1 ORDER BY qtr_float""",
]


# Batch 3 (r9 continuation): 40 more shapes in classes batches 1-2 do
# not cover — CTEs (single, reused, chained), window FRAMES (running
# totals, moving averages, RANGE), FIRST/LAST_VALUE, PERCENT_RANK/
# CUME_DIST, FULL OUTER JOIN null-key algebra, expression joins,
# nested (two-level) correlation, scalar-subquery arithmetic,
# conditional-DISTINCT measures, aggregate-over-UNION, pagination.
CORPUS3 = [
    # 78 single CTE feeding a join
    """WITH big AS (SELECT o_custkey, SUM(o_totalprice) AS spend
                    FROM orders GROUP BY o_custkey)
       SELECT n_name, COUNT(*) AS whales
       FROM big JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       WHERE spend > 1000000 GROUP BY n_name ORDER BY n_name""",
    # 79 CTE referenced TWICE (shared subplan)
    """WITH pr AS (SELECT o_orderpriority AS p, COUNT(*) AS n
                   FROM orders GROUP BY o_orderpriority)
       SELECT a.p, ROUND(a.n * 1.0 / (SELECT SUM(n) FROM pr), 6) AS share
       FROM pr a ORDER BY a.p""",
    # 80 chained CTEs (second references the first)
    """WITH lvl1 AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey),
            lvl2 AS (SELECT n, COUNT(*) AS custs FROM lvl1 GROUP BY n)
       SELECT n AS orders_per_cust, custs FROM lvl2 ORDER BY n""",
    # 81 running cumulative total (ROWS UNBOUNDED PRECEDING)
    """SELECT y, n, SUM(n) OVER (ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cum
       FROM (SELECT EXTRACT(YEAR FROM o_orderdate) AS y, COUNT(*) AS n
             FROM orders GROUP BY EXTRACT(YEAR FROM o_orderdate)) t
       ORDER BY y""",
    # 82 moving average with a bounded ROWS frame
    """SELECT y, ROUND(AVG(s) OVER (ORDER BY y ROWS BETWEEN 2 PRECEDING
                                    AND CURRENT ROW), 2) AS ma3
       FROM (SELECT EXTRACT(YEAR FROM o_orderdate) AS y,
                    SUM(o_totalprice) AS s
             FROM orders GROUP BY EXTRACT(YEAR FROM o_orderdate)) t
       ORDER BY y""",
    # 83 RANGE frame over a numeric ordering
    """SELECT n_nationkey, cnt,
              SUM(cnt) OVER (ORDER BY n_nationkey
                             RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS neigh
       FROM (SELECT n_nationkey, COUNT(*) AS cnt
             FROM nation JOIN customer ON c_nationkey = n_nationkey
             GROUP BY n_nationkey) t
       ORDER BY n_nationkey""",
    # 84 FIRST_VALUE / LAST_VALUE with a full frame
    """SELECT DISTINCT o_orderpriority,
              FIRST_VALUE(o_orderkey) OVER w AS first_k,
              LAST_VALUE(o_orderkey) OVER w AS last_k
       FROM orders
       WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
       ORDER BY o_orderpriority""",
    # 85 PERCENT_RANK and CUME_DIST together
    """SELECT n_name, ROUND(PERCENT_RANK() OVER (ORDER BY bal), 6) AS pr,
              ROUND(CUME_DIST() OVER (ORDER BY bal), 6) AS cd
       FROM (SELECT n_name, SUM(c_acctbal) AS bal
             FROM customer JOIN nation ON c_nationkey = n_nationkey
             GROUP BY n_name) t
       ORDER BY n_name""",
    # 86 two windows with DIFFERENT partitions in one SELECT
    """SELECT o_orderkey, o_totalprice,
              RANK() OVER (PARTITION BY o_orderstatus
                           ORDER BY o_totalprice DESC, o_orderkey) AS r_status,
              RANK() OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice DESC, o_orderkey) AS r_prio
       FROM orders WHERE o_totalprice > 450000 ORDER BY o_orderkey""",
    # 87 FULL OUTER JOIN with COALESCE'd keys (null-key algebra)
    """SELECT COALESCE(a.k, b.k) AS k, a.n AS from_f, b.n AS from_o
       FROM (SELECT o_custkey % 7 AS k, COUNT(*) AS n FROM orders
             WHERE o_orderstatus = 'F' GROUP BY o_custkey % 7) a
       FULL OUTER JOIN
            (SELECT o_custkey % 5 AS k, COUNT(*) AS n FROM orders
             WHERE o_orderstatus = 'O' GROUP BY o_custkey % 5) b
       ON a.k = b.k
       ORDER BY k""",
    # 88 join on an EXPRESSION (year equality)
    """SELECT EXTRACT(YEAR FROM a.o_orderdate) AS y, COUNT(*) AS pairs
       FROM orders a JOIN orders b
         ON EXTRACT(YEAR FROM a.o_orderdate) = EXTRACT(YEAR FROM b.o_orderdate)
        AND a.o_orderkey = b.o_orderkey
       GROUP BY EXTRACT(YEAR FROM a.o_orderdate) ORDER BY y""",
    # 89 COUNT(*) vs COUNT(col) over LEFT JOIN (null-counting contract)
    """SELECT n_name, COUNT(*) AS rows_out, COUNT(c_custkey) AS matched
       FROM nation LEFT JOIN customer
         ON c_nationkey = n_nationkey AND c_acctbal > 9990
       GROUP BY n_name ORDER BY n_name""",
    # 90 conditional DISTINCT count (COUNT(DISTINCT CASE ...))
    """SELECT COUNT(DISTINCT CASE WHEN o_orderstatus = 'F'
                                  THEN o_custkey END) AS f_custs,
              COUNT(DISTINCT CASE WHEN o_orderstatus = 'O'
                                  THEN o_custkey END) AS o_custs
       FROM orders""",
    # 91 weighted average (SUM(x*w)/SUM(w)) vs plain AVG
    """SELECT l_returnflag,
              ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) AS wavg,
              ROUND(AVG(l_extendedprice), 4) AS avg_price
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    # 92 NULLIF guard against divide-by-zero
    """SELECT o_orderstatus,
              ROUND(SUM(o_totalprice) /
                    NULLIF(COUNT(*) FILTER (WHERE o_totalprice > 100000), 0), 2)
                AS avg_big
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    # 93 TWO scalar subqueries compared in one predicate
    """SELECT COUNT(*) AS n FROM orders
       WHERE o_totalprice BETWEEN (SELECT AVG(o_totalprice) FROM orders)
                              AND (SELECT AVG(o_totalprice) * 2 FROM orders)""",
    # 94 arithmetic ON scalar subqueries in the projection
    """SELECT (SELECT MAX(o_totalprice) FROM orders)
            - (SELECT MIN(o_totalprice) FROM orders) AS price_spread""",
    # 95 nested correlation: EXISTS containing a correlated EXISTS
    """SELECT COUNT(*) AS n FROM nation n1
       WHERE EXISTS (SELECT 1 FROM customer c
                     WHERE c.c_nationkey = n1.n_nationkey
                       AND EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_custkey = c.c_custkey
                                     AND o.o_totalprice > 500000))""",
    # 96 NOT IN over a provably non-null subquery
    """SELECT COUNT(*) AS n FROM customer
       WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation
                                 WHERE n_regionkey <= 1)""",
    # 97 three-level nested derived tables
    """SELECT AVG(per_nation) AS overall FROM (
         SELECT rk, AVG(cnt) AS per_nation FROM (
           SELECT n_regionkey AS rk, n_nationkey, COUNT(c_custkey) AS cnt
           FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
           GROUP BY n_regionkey, n_nationkey) x
         GROUP BY rk) y""",
    # 98 latest-row-per-key via max-date equality join (no window)
    """SELECT c.c_custkey, o.o_totalprice AS last_price
       FROM orders o
       JOIN (SELECT o_custkey, MAX(o_orderdate) AS d, MAX(o_orderkey) AS k
             FROM orders GROUP BY o_custkey) m
         ON o.o_custkey = m.o_custkey AND o.o_orderkey = m.k
       JOIN customer c ON c.c_custkey = o.o_custkey
       WHERE c.c_acctbal > 9980
       ORDER BY c.c_custkey""",
    # 99 UNION DISTINCT of three branches
    """SELECT n_regionkey AS k FROM nation WHERE n_nationkey < 5
       UNION
       SELECT n_regionkey AS k FROM nation WHERE n_nationkey >= 20
       UNION
       SELECT r_regionkey AS k FROM region WHERE r_regionkey = 2
       ORDER BY k""",
    # 100 aggregate over a UNION ALL of two sources
    """SELECT src, COUNT(*) AS n FROM (
         SELECT 'cust' AS src, c_nationkey AS k FROM customer
         UNION ALL
         SELECT 'supp' AS src, s_nationkey AS k FROM supplier) u
       GROUP BY src ORDER BY src""",
    # 101 HAVING with BETWEEN over an aggregate
    """SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey
       HAVING COUNT(*) BETWEEN 14 AND 20 ORDER BY o_custkey""",
    # 102 LIMIT/OFFSET pagination (deterministic full ordering)
    """SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 5 OFFSET 10""",
    # 103 ORDER BY an aggregate that is NOT in the SELECT list
    """SELECT o_orderpriority FROM orders GROUP BY o_orderpriority
       ORDER BY SUM(o_totalprice) DESC""",
    # 104 string MIN/MAX measures with a LIKE-filtered group
    """SELECT o_orderstatus, MIN(o_orderpriority) AS lo, MAX(o_orderpriority) AS hi
       FROM orders WHERE o_orderpriority LIKE '%URGENT%'
       GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    # 105 nested CASE bucketing in GROUP BY
    """SELECT CASE WHEN o_totalprice < 100000 THEN 'S'
                   ELSE CASE WHEN o_totalprice < 300000 THEN 'M' ELSE 'L' END
              END AS bucket,
              COUNT(*) AS n
       FROM orders GROUP BY CASE WHEN o_totalprice < 100000 THEN 'S'
                   ELSE CASE WHEN o_totalprice < 300000 THEN 'M' ELSE 'L' END END
       ORDER BY bucket""",
    # 106 correlated scalar subquery computing an aggregate over a JOIN
    """SELECT r_name,
              (SELECT COUNT(*) FROM nation JOIN customer
                 ON c_nationkey = n_nationkey
               WHERE n_regionkey = r_regionkey) AS custs
       FROM region ORDER BY r_name""",
    # 107 IN-list literals + OR chain (sarg shape)
    """SELECT COUNT(*) AS n FROM orders
       WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
          OR o_orderstatus = 'P' OR o_totalprice > 500000""",
    # 108 date BETWEEN + quarter grouping
    """SELECT EXTRACT(QUARTER FROM o_orderdate) AS q, COUNT(*) AS n
       FROM orders
       WHERE o_orderdate BETWEEN TIMESTAMP '1994-01-01 00:00:00'
                             AND TIMESTAMP '1994-12-31 23:59:59'
       GROUP BY EXTRACT(QUARTER FROM o_orderdate) ORDER BY q""",
    # 109 EXISTS OR EXISTS disjunction
    """SELECT COUNT(*) AS n FROM customer
       WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                       AND o_totalprice > 520000)
          OR EXISTS (SELECT 1 FROM nation WHERE n_nationkey = c_nationkey
                       AND n_regionkey = 4 AND c_acctbal > 9990)""",
    # 110 AVG of a per-key window max (window inside, agg outside)
    """SELECT ROUND(AVG(mx), 2) AS avg_peak FROM (
         SELECT DISTINCT o_custkey,
                MAX(o_totalprice) OVER (PARTITION BY o_custkey) AS mx
         FROM orders) t""",
    # 111 self-join co-occurrence counts (pairs sharing a region)
    """SELECT a.n_regionkey AS rk, COUNT(*) AS pairs
       FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey
       WHERE a.n_nationkey < b.n_nationkey
       GROUP BY a.n_regionkey ORDER BY rk""",
    # 112 standard-SQL "DISTINCT ON" emulation via tie-break join
    """SELECT t.o_orderstatus, o.o_orderkey AS cheapest_key
       FROM (SELECT o_orderstatus, MIN(o_totalprice) AS mn
             FROM orders GROUP BY o_orderstatus) t
       JOIN (SELECT o_orderstatus, o_totalprice, MIN(o_orderkey) AS o_orderkey
             FROM orders GROUP BY o_orderstatus, o_totalprice) o
         ON o.o_orderstatus = t.o_orderstatus AND o.o_totalprice = t.mn
       ORDER BY t.o_orderstatus""",
    # 113 multi-column conditional pivot + ratio of two pivoted cells
    """SELECT n_name,
              SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END) AS f_amt,
              SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END) AS o_amt,
              ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END)
                    / NULLIF(SUM(CASE WHEN o_orderstatus = 'O'
                                      THEN o_totalprice ELSE 0 END), 0), 6) AS f_to_o
       FROM orders JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       GROUP BY n_name ORDER BY n_name""",
    # 114 scalar subquery inside CASE WHEN
    """SELECT o_orderkey,
              CASE WHEN o_totalprice > (SELECT AVG(o_totalprice) * 2.5 FROM orders)
                   THEN 'outlier' ELSE 'normal' END AS tag
       FROM orders WHERE o_totalprice > 530000 ORDER BY o_orderkey""",
    # 115 dense_rank with real ties (expression with collisions)
    """SELECT bucket, n, DENSE_RANK() OVER (ORDER BY n DESC) AS dr
       FROM (SELECT o_custkey % 10 AS bucket, COUNT(*) AS n
             FROM orders GROUP BY o_custkey % 10) t
       ORDER BY bucket""",
    # 116 anti-join via LEFT JOIN ... IS NULL (the classic spelling)
    """SELECT COUNT(*) AS n
       FROM customer LEFT JOIN orders ON o_custkey = c_custkey
       WHERE o_orderkey IS NULL""",
    # 117 grouped aggregate compared to ungrouped scalar in HAVING
    """SELECT c_nationkey, ROUND(AVG(c_acctbal), 2) AS nat_avg
       FROM customer GROUP BY c_nationkey
       HAVING AVG(c_acctbal) > (SELECT AVG(c_acctbal) FROM customer)
       ORDER BY c_nationkey""",
]


# Batch 4 (r9 second wave): 40 shapes in classes batches 1-3 leave
# untouched — GROUP BY ALL, join USING / NATURAL, lateral subqueries,
# HAVING without GROUP BY, null-only-group aggregates, VALUES inline
# tables, type-coercing set ops, IGNORE NULLS windows, correlated
# HAVING, EXISTS inside CASE, explicit NULLS FIRST/LAST.
CORPUS4 = [
    # 118 GROUP BY ALL
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
       FROM orders GROUP BY ALL ORDER BY o_orderstatus, o_orderpriority""",
    # 119 join USING
    """SELECT n_name, COUNT(*) AS n
       FROM nation JOIN region USING (r_regionkey_alias)
       GROUP BY n_name ORDER BY n_name""".replace(
        "JOIN region USING (r_regionkey_alias)",
        "JOIN (SELECT r_regionkey AS n_regionkey, r_name FROM region) r USING (n_regionkey)",
    ),
    # 120 NATURAL JOIN (shared column renamed to collide on purpose)
    """SELECT COUNT(*) AS n FROM
         (SELECT n_regionkey AS k, n_nationkey FROM nation) a
       NATURAL JOIN
         (SELECT r_regionkey AS k, r_name FROM region) b""",
    # 121 HAVING without GROUP BY (global group)
    """SELECT COUNT(*) AS n FROM orders HAVING COUNT(*) > 10""",
    # 122 aggregates over a NULL-only group: SUM -> NULL, COUNT -> 0
    """SELECT SUM(v) AS s, COUNT(v) AS c, COUNT(*) AS star FROM (
         SELECT CASE WHEN o_orderkey < 0 THEN o_totalprice END AS v
         FROM orders) t""",
    # 123 global aggregate over an empty relation
    """SELECT COUNT(*) AS n, SUM(o_totalprice) AS s
       FROM orders WHERE o_orderkey < 0""",
    # 124 VALUES inline table joined to data
    """SELECT v.label, COUNT(*) AS n
       FROM (VALUES (0, 'africa'), (1, 'america'), (2, 'asia')) AS v(rk, label)
       JOIN nation ON n_regionkey = v.rk
       GROUP BY v.label ORDER BY v.label""",
    # 125 UNION with int/double type coercion
    """SELECT x FROM (
         SELECT 1 AS x UNION SELECT 2.5 AS x UNION SELECT 2 AS x) t
       ORDER BY x""",
    # 126 LAG with offset 2 and an explicit default (IGNORE NULLS was
    # the first draft, but Spark spells it `f(x) IGNORE NULLS OVER` and
    # DuckDB `f(x IGNORE NULLS) OVER` — no shared text, so no twin)
    """SELECT y, n, LAG(n, 2, -1) OVER (ORDER BY y) AS n_2back
       FROM (SELECT EXTRACT(YEAR FROM o_orderdate) AS y, COUNT(*) AS n
             FROM orders GROUP BY EXTRACT(YEAR FROM o_orderdate)) t
       ORDER BY y""",
    # 127 correlated subquery in HAVING
    """SELECT c_nationkey, COUNT(*) AS n FROM customer
       GROUP BY c_nationkey
       HAVING COUNT(*) > (SELECT COUNT(*) FROM nation) ORDER BY c_nationkey""",
    # 128 EXISTS inside CASE
    """SELECT n_name,
              CASE WHEN EXISTS (SELECT 1 FROM customer
                                WHERE c_nationkey = n_nationkey
                                  AND c_acctbal > 9995)
                   THEN 'rich' ELSE 'plain' END AS tag
       FROM nation ORDER BY n_name""",
    # 129 explicit NULLS FIRST / NULLS LAST
    """SELECT v FROM (
         SELECT CASE WHEN n_nationkey % 5 = 0 THEN NULL
                     ELSE n_nationkey END AS v FROM nation) t
       ORDER BY v DESC NULLS LAST""",
    # 130 lateral subquery (top-1 per nation)
    """SELECT n_name, t.bal
       FROM nation, LATERAL (
         SELECT MAX(c_acctbal) AS bal FROM customer
         WHERE c_nationkey = n_nationkey) t
       ORDER BY n_name""",
    # 131 DISTINCT + ORDER BY selected column + LIMIT
    """SELECT DISTINCT o_orderpriority FROM orders
       ORDER BY o_orderpriority LIMIT 3""",
    # 132 position() and string predicates in group keys
    """SELECT POSITION('-' IN o_orderpriority) AS dash_at, COUNT(*) AS n
       FROM orders GROUP BY POSITION('-' IN o_orderpriority)
       ORDER BY dash_at""",
    # 133 grouping by a boolean expression
    """SELECT (o_totalprice > 250000) AS big, COUNT(*) AS n
       FROM orders GROUP BY (o_totalprice > 250000) ORDER BY big""",
    # 134 INTERSECT ALL duplicates preserved
    """SELECT x FROM (
         SELECT o_custkey % 3 AS x FROM orders WHERE o_orderkey <= 40
         INTERSECT ALL
         SELECT o_custkey % 3 AS x FROM orders WHERE o_orderkey <= 80) t
       ORDER BY x""",
    # 135 EXCEPT ALL bag difference
    """SELECT COUNT(*) AS n FROM (
         SELECT o_orderstatus FROM orders
         EXCEPT ALL
         SELECT o_orderstatus FROM orders WHERE o_totalprice > 200000) t""",
    # 136 scalar subquery returning NULL when empty
    """SELECT (SELECT MAX(o_totalprice) FROM orders WHERE o_orderkey < 0)
              AS none_val""",
    # 137 LIMIT inside a derived table, aggregated outside
    """SELECT COUNT(*) AS n, ROUND(SUM(p), 2) AS s FROM (
         SELECT o_totalprice AS p FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 25) t""",
    # 138 join keys wrapped in COALESCE
    """SELECT COUNT(*) AS n
       FROM nation a JOIN nation b
         ON COALESCE(a.n_regionkey, -1) = COALESCE(b.n_regionkey, -1)""",
    # 139 NOT EXISTS with OR'd correlated conditions
    """SELECT COUNT(*) AS n FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey
                           AND (o_totalprice > 450000
                                OR o_orderpriority = '1-URGENT'))""",
    # 140 aggregate FILTER combined with GROUPING SETS
    """SELECT o_orderstatus,
              COUNT(*) FILTER (WHERE o_totalprice > 200000) AS big
       FROM orders GROUP BY GROUPING SETS ((o_orderstatus), ())
       ORDER BY o_orderstatus NULLS FIRST""",
    # 141 window rank over a grouping-sets aggregate
    """SELECT o_orderstatus, n, RANK() OVER (ORDER BY n DESC) AS r FROM (
         SELECT o_orderstatus, COUNT(*) AS n FROM orders
         GROUP BY o_orderstatus) t
       ORDER BY o_orderstatus""",
    # 142 nested set ops with parentheses
    """SELECT x FROM (
         (SELECT 1 AS x UNION SELECT 2 AS x)
         EXCEPT
         (SELECT 2 AS x UNION SELECT 3 AS x)) t""",
    # 143 correlated scalar subquery with COALESCE default
    """SELECT r_name,
              COALESCE((SELECT MAX(n_nationkey) FROM nation
                        WHERE n_regionkey = r_regionkey AND n_nationkey > 98),
                       -1) AS top_k
       FROM region ORDER BY r_name""",
    # 144 BETWEEN SYMMETRIC-style reversed bounds via LEAST/GREATEST
    """SELECT COUNT(*) AS n FROM orders
       WHERE o_totalprice BETWEEN LEAST(100000, 300000)
                              AND GREATEST(100000, 300000)""",
    # 145 CASE branches producing different numeric types (coercion)
    """SELECT SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0.5 END) AS w
       FROM orders""",
    # 146 self-anti-join: keys present exactly once
    """SELECT COUNT(*) AS n FROM (
         SELECT o_custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) = 1) t""",
    # 147 two-level HAVING chain (HAVING over an aggregated derived table)
    """SELECT rk, COUNT(*) AS nations FROM (
         SELECT n_regionkey AS rk, n_nationkey, COUNT(c_custkey) AS custs
         FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
         GROUP BY n_regionkey, n_nationkey HAVING COUNT(c_custkey) >= 0) t
       GROUP BY rk HAVING COUNT(*) >= 4 ORDER BY rk""",
    # 148 string min/max + length() measures
    """SELECT o_orderstatus, MIN(o_orderpriority) AS first_prio,
              MAX(LENGTH(o_orderpriority)) AS prio_len
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    # 149 modulo bucketing with negative-safe abs()
    """SELECT ABS(o_orderkey % 4) AS b, COUNT(*) AS n
       FROM orders GROUP BY ABS(o_orderkey % 4) ORDER BY b""",
    # 150 dates: min/max + datediff-free span via EXTRACT
    """SELECT EXTRACT(YEAR FROM MIN(o_orderdate)) AS first_y,
              EXTRACT(YEAR FROM MAX(o_orderdate)) AS last_y
       FROM orders""",
    # 151 IN over a UNION subquery
    """SELECT COUNT(*) AS n FROM customer
       WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0
                             UNION
                             SELECT n_nationkey FROM nation WHERE n_regionkey = 4)""",
    # 152 window SUM partitioned by an expression
    """SELECT o_orderkey, SUM(o_totalprice) OVER (PARTITION BY o_custkey % 10) AS part_sum
       FROM orders WHERE o_orderkey <= 60 ORDER BY o_orderkey""",
    # 153 COUNT DISTINCT over an expression
    """SELECT COUNT(DISTINCT o_custkey % 100) AS buckets FROM orders""",
    # 154 anti-join against a VALUES list
    """SELECT COUNT(*) AS n FROM nation
       WHERE n_regionkey NOT IN (SELECT rk FROM (VALUES (0), (4)) AS v(rk))""",
    # 155 chained CASE/COALESCE/NULLIF scalar pipeline
    """SELECT n_name,
              COALESCE(NULLIF(CAST(n_regionkey AS STRING), '0'), 'zero') AS tag
       FROM nation ORDER BY n_name""",
    # 156 subquery in both SELECT and WHERE referencing different tables
    """SELECT o_orderkey,
              (SELECT r_name FROM region JOIN nation ON r_regionkey = n_regionkey
               JOIN customer ON n_nationkey = c_nationkey
               WHERE c_custkey = o_custkey) AS region_name
       FROM orders
       WHERE o_totalprice > (SELECT AVG(o_totalprice) * 2.4 FROM orders)
       ORDER BY o_orderkey""",
    # 157 aggregated self-union totals reconcile
    """SELECT half, COUNT(*) AS n FROM (
         SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'even' ELSE 'odd' END AS half
         FROM orders) t GROUP BY half ORDER BY half""",
]


@pytest.fixture(scope="module")
def fe(spark):
    return SqlFrontend(catalog_for(spark, SF_DIR))


@pytest.mark.parametrize("i", range(len(CORPUS)))
def test_breadth_shape(fe, duck, i):
    sql = CORPUS[i]
    assert_matches_oracle(fe.sql(sql), duck, sql)


@pytest.mark.parametrize("i", range(len(CORPUS2)))
def test_breadth_shape_batch2(fe, duck, i):
    sql = CORPUS2[i]
    assert_matches_oracle(fe.sql(sql), duck, sql)


@pytest.mark.parametrize("i", range(len(CORPUS3)))
def test_breadth_shape_batch3(fe, duck, i):
    sql = CORPUS3[i]
    assert_matches_oracle(fe.sql(sql), duck, sql)


@pytest.mark.parametrize("i", range(len(CORPUS4)))
def test_breadth_shape_batch4(fe, duck, i):
    sql = CORPUS4[i]
    assert_matches_oracle(fe.sql(sql), duck, sql)


# Batch 5 (r10, verdict item 6): FoodMartQuerySet classes not yet
# sampled — calculated-member arithmetic over grouping sets, nested
# top-N, semi-additive measures (latest-per-entity then aggregate),
# ratio-to-parent / share-of-total shapes. As ever: OUR shapes over the
# TPC-H-ish testdata, Spark and DuckDB on IDENTICAL text.
CORPUS5 = [
    # 1 calculated member over ROLLUP with GROUPING guards
    """SELECT l_returnflag, l_linestatus,
              ROUND(SUM(l_extendedprice) - SUM(l_quantity), 2) AS net,
              GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status
       FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    # 2 calculated member over explicit GROUPING SETS
    """SELECT o_orderstatus, o_orderpriority,
              ROUND(SUM(o_totalprice) / COUNT(*), 2) AS avg_calc,
              GROUPING(o_orderstatus) AS gs, GROUPING(o_orderpriority) AS gp
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""",
    # 3 CUBE with a two-measure arithmetic member
    """SELECT l_returnflag, l_shipdate IS NOT NULL AS has_date,
              ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
              ROUND(MAX(l_extendedprice) - MIN(l_extendedprice), 2) AS px_range
       FROM lineitem WHERE l_quantity > 45
       GROUP BY CUBE (l_returnflag, l_shipdate IS NOT NULL)""",
    # 4 share-of-total (ratio to grand total) via window over aggregate
    """SELECT o_orderpriority,
              ROUND(SUM(o_totalprice) * 100.0 /
                    SUM(SUM(o_totalprice)) OVER (), 4) AS pct_of_total
       FROM orders GROUP BY o_orderpriority""",
    # 5 ratio-to-parent: nation revenue as share of its region
    """SELECT r_name, n_name,
              ROUND(SUM(o_totalprice) /
                    SUM(SUM(o_totalprice)) OVER (PARTITION BY r_name), 6) AS share
       FROM orders JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY r_name, n_name""",
    # 6 nested top-N: top 2 customers inside each of the top 3 nations
    """SELECT n_name, c_name, spent FROM (
         SELECT n_name, c_name, spent,
                ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY spent DESC, c_name) AS rc
         FROM (
           SELECT n_name, c_name, ROUND(SUM(o_totalprice), 2) AS spent,
                  SUM(SUM(o_totalprice)) OVER (PARTITION BY n_name) AS nation_total
           FROM orders JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           GROUP BY n_name, c_name) x
         WHERE nation_total >= (
           SELECT MIN(nt) FROM (
             SELECT SUM(o_totalprice) AS nt
             FROM orders JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey
             GROUP BY n_name ORDER BY nt DESC LIMIT 3) tt)) y
       WHERE rc <= 2""",
    # 7 semi-additive: LATEST order per customer, then SUM by segment
    """SELECT c_mktsegment, ROUND(SUM(last_price), 2) AS closing_sum
       FROM (
         SELECT c_mktsegment, o_totalprice AS last_price,
                ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
         FROM orders JOIN customer ON o_custkey = c_custkey) t
       WHERE rn = 1 GROUP BY c_mktsegment""",
    # 8 semi-additive: FIRST order value per customer, averaged by nation
    """SELECT n_name, ROUND(AVG(first_price), 4) AS avg_opening
       FROM (
         SELECT c_nationkey, o_totalprice AS first_price,
                ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS rn
         FROM orders JOIN customer ON o_custkey = c_custkey) t
       JOIN nation ON c_nationkey = n_nationkey
       WHERE rn = 1 GROUP BY n_name""",
    # 9 members-above-parent-average (calculated-member comparison)
    """SELECT n_name, ROUND(bal, 2) AS bal FROM (
         SELECT n_name, AVG(c_acctbal) AS bal,
                AVG(AVG(c_acctbal)) OVER () AS global_avg
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name) t
       WHERE bal > global_avg""",
    # 10 top-N by a calculated member with deterministic tie-break
    """SELECT o_custkey,
              ROUND(SUM(o_totalprice) / COUNT(*), 2) AS avg_order
       FROM orders GROUP BY o_custkey
       ORDER BY avg_order DESC, o_custkey LIMIT 5""",
    # 11 grouping-sets arithmetic consumed by an outer query
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
              ROUND(SUM(s) / SUM(n), 4) AS weighted_avg
       FROM (
         SELECT o_orderstatus, SUM(o_totalprice) AS s, COUNT(*) AS n
         FROM orders GROUP BY GROUPING SETS ((o_orderstatus))) t
       GROUP BY o_orderstatus""",
    # 12 period-over-period via self-joined yearly aggregates
    """SELECT cur.yr, ROUND(cur.rev - prev.rev, 2) AS delta
       FROM (SELECT EXTRACT(YEAR FROM o_orderdate) AS yr, SUM(o_totalprice) AS rev
             FROM orders GROUP BY EXTRACT(YEAR FROM o_orderdate)) cur
       JOIN (SELECT EXTRACT(YEAR FROM o_orderdate) AS yr, SUM(o_totalprice) AS rev
             FROM orders GROUP BY EXTRACT(YEAR FROM o_orderdate)) prev
         ON cur.yr = prev.yr + 1""",
    # 13 period-over-period via LAG over the aggregate
    """SELECT yr, ROUND(rev - LAG(rev) OVER (ORDER BY yr), 2) AS delta
       FROM (SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
                    SUM(o_totalprice) AS rev
             FROM orders GROUP BY EXTRACT(YEAR FROM o_orderdate)) t""",
    # 14 running share of cumulative total
    """SELECT yr,
              ROUND(SUM(rev) OVER (ORDER BY yr ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) / SUM(rev) OVER (), 6) AS cum_share
       FROM (SELECT EXTRACT(YEAR FROM o_orderdate) AS yr, SUM(o_totalprice) AS rev
             FROM orders GROUP BY EXTRACT(YEAR FROM o_orderdate)) t""",
    # 15 nested top-N with anti-join exclusion of the global top
    """SELECT o_custkey, n FROM (
         SELECT o_custkey, COUNT(*) AS n,
                ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, o_custkey) AS r
         FROM orders GROUP BY o_custkey) t
       WHERE r BETWEEN 2 AND 4""",
    # 16 semi-additive MIN-over-time then MAX across entities
    """SELECT c_mktsegment, MAX(min_bal) AS max_of_min
       FROM (SELECT c_mktsegment, c_nationkey, MIN(c_acctbal) AS min_bal
             FROM customer GROUP BY c_mktsegment, c_nationkey) t
       GROUP BY c_mktsegment""",
    # 17 calculated member referencing two grouping levels (join of rollup slices)
    """SELECT d.o_orderstatus,
              ROUND(d.rev / tot.rev, 6) AS status_share
       FROM (SELECT o_orderstatus, SUM(o_totalprice) AS rev
             FROM orders GROUP BY o_orderstatus) d
       CROSS JOIN (SELECT SUM(o_totalprice) AS rev FROM orders) tot""",
    # 18 HAVING over a calculated member of two aggregates
    """SELECT l_returnflag,
              ROUND(SUM(l_extendedprice) / SUM(l_quantity), 4) AS px_per_unit
       FROM lineitem GROUP BY l_returnflag
       HAVING SUM(l_extendedprice) / SUM(l_quantity) > 1000""",
    # 19 conditional calculated member (CASE over GROUPING in rollup)
    """SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'TOTAL'
                   ELSE o_orderstatus END AS status_label,
              COUNT(*) AS n
       FROM orders GROUP BY ROLLUP (o_orderstatus)""",
    # 20 two-level rollup arithmetic with a filtered measure
    """SELECT o_orderstatus, o_orderpriority,
              COUNT(*) FILTER (WHERE o_totalprice > 200000) AS big,
              COUNT(*) AS all_n,
              ROUND(COUNT(*) FILTER (WHERE o_totalprice > 200000) * 1.0
                    / COUNT(*), 6) AS big_ratio
       FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
    # 21 top-N within top-N via two window ranks
    """SELECT p_brand, p_type, p_retailprice FROM (
         SELECT p_brand, p_type, p_retailprice,
                ROW_NUMBER() OVER (PARTITION BY p_brand
                                   ORDER BY p_retailprice DESC, p_partkey) AS r_in,
                DENSE_RANK() OVER (ORDER BY p_brand) AS brand_rank
         FROM part) t
       WHERE r_in = 1 AND brand_rank <= 4""",
    # 22 semi-additive balance: latest acctbal per nation summed by region
    """SELECT r_name, ROUND(SUM(c_acctbal), 2) AS latest_bal_sum
       FROM (
         SELECT c_nationkey, c_acctbal,
                ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                   ORDER BY c_custkey DESC) AS rn
         FROM customer) t
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE rn = 1 GROUP BY r_name""",
    # 23 grouped EXCEPT between two aggregate frames
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
       GROUP BY o_custkey HAVING COUNT(*) >= 3
       EXCEPT
       SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
       GROUP BY o_custkey HAVING COUNT(*) >= 3""",
    # 24 INTERSECT of top spenders and frequent buyers
    """SELECT o_custkey FROM orders GROUP BY o_custkey
       HAVING SUM(o_totalprice) > 1500000
       INTERSECT
       SELECT o_custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 8""",
    # 25 measure defined over a windowed subtotal (avg of per-month sums)
    """SELECT ROUND(AVG(mrev), 2) AS avg_monthly_rev FROM (
         SELECT EXTRACT(YEAR FROM o_orderdate) AS y,
                EXTRACT(MONTH FROM o_orderdate) AS m,
                SUM(o_totalprice) AS mrev
         FROM orders GROUP BY EXTRACT(YEAR FROM o_orderdate),
                              EXTRACT(MONTH FROM o_orderdate)) t""",
    # 26 calculated member with NULLIF guard (divide-by-zero safe ratio)
    """SELECT l_returnflag,
              ROUND(SUM(l_discount * l_extendedprice)
                    / NULLIF(SUM(l_extendedprice), 0), 6) AS eff_discount
       FROM lineitem GROUP BY l_returnflag""",
    # 27 percent-rank of a grouped measure
    """SELECT n_name,
              ROUND(PERCENT_RANK() OVER (ORDER BY cnt), 6) AS pr
       FROM (SELECT n_name, COUNT(*) AS cnt
             FROM customer JOIN nation ON c_nationkey = n_nationkey
             GROUP BY n_name) t""",
    # 28 NTILE buckets over a grouped measure, re-aggregated
    """SELECT bucket, COUNT(*) AS members, ROUND(SUM(spent), 2) AS bucket_rev
       FROM (
         SELECT o_custkey, SUM(o_totalprice) AS spent,
                NTILE(4) OVER (ORDER BY SUM(o_totalprice), o_custkey) AS bucket
         FROM orders GROUP BY o_custkey) t
       GROUP BY bucket""",
    # 29 nested derived tables three levels deep
    """SELECT status, ROUND(avg_n, 4) AS avg_n FROM (
         SELECT status, AVG(n) AS avg_n FROM (
           SELECT o_orderstatus AS status, o_custkey, COUNT(*) AS n
           FROM orders GROUP BY o_orderstatus, o_custkey) a
         GROUP BY status) b
       WHERE avg_n > 1""",
    # 30 correlated aggregate threshold per group (above own-nation average)
    """SELECT COUNT(*) AS rich_customers FROM customer c
       WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                          WHERE c2.c_nationkey = c.c_nationkey)""",
    # 31 semi-additive with a calendar edge: last shipped line per order, summed by flag
    """SELECT l_returnflag, ROUND(SUM(l_extendedprice), 2) AS closing_rev
       FROM (
         SELECT l_returnflag, l_extendedprice,
                ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                   ORDER BY l_shipdate DESC, l_linenumber DESC) AS rn
         FROM lineitem) t
       WHERE rn = 1 GROUP BY l_returnflag""",
    # 32 cross-dimensional calculated member (brand avg vs type avg)
    """SELECT p_brand,
              ROUND(AVG(p_retailprice), 4) AS brand_avg,
              ROUND(AVG(AVG(p_retailprice)) OVER (), 4) AS overall_avg_of_brands
       FROM part GROUP BY p_brand""",
    # 33 grouping-sets + HAVING on one branch's measure
    """SELECT o_orderpriority, COUNT(*) AS n
       FROM orders GROUP BY GROUPING SETS ((o_orderpriority))
       HAVING COUNT(*) > 100""",
    # 34 windowed top-N inside a join, aggregated outside
    """SELECT c_mktsegment, COUNT(*) AS top_orders
       FROM (
         SELECT o_custkey, o_totalprice,
                ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS r
         FROM orders) t
       JOIN customer ON o_custkey = c_custkey
       WHERE r <= 100 GROUP BY c_mktsegment""",
    # 35 measure arithmetic across two separately filtered subqueries
    """SELECT ROUND(f.rev - o.rev, 2) AS finished_minus_open FROM
         (SELECT SUM(o_totalprice) AS rev FROM orders WHERE o_orderstatus = 'F') f
       CROSS JOIN
         (SELECT SUM(o_totalprice) AS rev FROM orders WHERE o_orderstatus = 'O') o""",
    # 36 rollup over a join with a filtered calculated member
    """SELECT r_name, n_name,
              ROUND(SUM(c_acctbal) FILTER (WHERE c_acctbal > 0), 2) AS pos_bal,
              COUNT(*) AS n
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY ROLLUP (r_name, n_name)""",
    # 37 quartile spread of a grouped measure (calculated from two percentiles)
    """SELECT ROUND(PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY spent)
                    - PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY spent), 2) AS iqr
       FROM (SELECT o_custkey, SUM(o_totalprice) AS spent
             FROM orders GROUP BY o_custkey) t""",
    # 38 dense-ranked calculated member with gaps filter
    """SELECT yr, rev_rank FROM (
         SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
                DENSE_RANK() OVER (ORDER BY SUM(o_totalprice) DESC) AS rev_rank
         FROM orders GROUP BY EXTRACT(YEAR FROM o_orderdate)) t
       WHERE rev_rank <= 3""",
    # 39 conditional aggregation matrix (pivot-style calculated members)
    """SELECT n_name,
              COUNT(*) FILTER (WHERE c_mktsegment = 'BUILDING') AS building,
              COUNT(*) FILTER (WHERE c_mktsegment = 'MACHINERY') AS machinery,
              COUNT(*) FILTER (WHERE c_mktsegment NOT IN ('BUILDING', 'MACHINERY')) AS other
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       GROUP BY n_name""",
    # 40 top segment per nation by a ratio member (argmax-style)
    """SELECT n_name, c_mktsegment FROM (
         SELECT n_name, c_mktsegment,
                ROW_NUMBER() OVER (PARTITION BY n_name
                                   ORDER BY AVG(c_acctbal) DESC, c_mktsegment) AS r
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name, c_mktsegment) t
       WHERE r = 1""",
]


@pytest.mark.parametrize("i", range(len(CORPUS5)))
def test_breadth_shape_batch5(fe, duck, i):
    sql = CORPUS5[i]
    assert_matches_oracle(fe.sql(sql), duck, sql)


# Batch 6 (r10): NULL-edge semantics, subquery variety, window frames —
# the shapes real users hit after the calculated-member tier. Same
# contract: OUR shapes, identical text on Spark and DuckDB.
CORPUS6 = [
    # 1 NOT IN against a subquery that cannot produce NULLs
    """SELECT COUNT(*) AS n FROM customer
       WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)""",
    # 2 LEFT JOIN ... IS NULL as anti-join
    """SELECT COUNT(*) AS n FROM nation
       LEFT JOIN customer ON n_nationkey = c_nationkey AND c_acctbal > 9900
       WHERE c_custkey IS NULL""",
    # 3 correlated NOT EXISTS
    """SELECT COUNT(*) AS lazy_custs FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    # 4 EXISTS with correlated inequality
    """SELECT COUNT(*) AS n FROM supplier s
       WHERE EXISTS (SELECT 1 FROM customer c
                     WHERE c.c_nationkey = s.s_nationkey
                       AND c.c_acctbal > s.s_acctbal)""",
    # 5 scalar subquery inside CASE
    """SELECT o_orderpriority,
              CASE WHEN COUNT(*) > (SELECT COUNT(*) FROM orders) / 10
                   THEN 'common' ELSE 'rare' END AS freq
       FROM orders GROUP BY o_orderpriority""",
    # 6 RANGE frame over numeric ordering
    """SELECT c_custkey, c_acctbal,
              COUNT(*) OVER (ORDER BY c_acctbal
                             RANGE BETWEEN 100 PRECEDING AND 100 FOLLOWING) AS near
       FROM customer WHERE c_custkey <= 200""",
    # 7 first/last value with explicit full frame
    """SELECT DISTINCT c_nationkey,
              FIRST_VALUE(c_name) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest,
              LAST_VALUE(c_name) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS poorest
       FROM customer""",
    # 8 LAG with default + NULL handling
    """SELECT o_orderkey, LAG(o_totalprice, 1, 0.0) OVER (ORDER BY o_orderkey) AS prev_price
       FROM orders WHERE o_orderkey <= 200""",
    # 9 two different window partitions in one SELECT
    """SELECT o_orderkey,
              RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS r_status,
              RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS r_prio
       FROM orders WHERE o_orderkey <= 300""",
    # 10 COALESCE chain across two outer joins
    """SELECT n_name,
              COALESCE(big.cnt, small.cnt, 0) AS pick
       FROM nation
       LEFT JOIN (SELECT c_nationkey, COUNT(*) AS cnt FROM customer
                  WHERE c_acctbal > 9000 GROUP BY c_nationkey) big
         ON n_nationkey = big.c_nationkey
       LEFT JOIN (SELECT c_nationkey, COUNT(*) AS cnt FROM customer
                  GROUP BY c_nationkey) small
         ON n_nationkey = small.c_nationkey""",
    # 11 IN + correlated EXISTS + NOT IN conjunction
    """SELECT COUNT(*) AS n FROM orders
       WHERE o_orderstatus IN ('F', 'O')
         AND o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < -999)
         AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 49)""",
    # 12 POSITION + SUBSTR + LENGTH composition
    """SELECT COUNT(*) AS n FROM part
       WHERE POSITION('green' IN p_name) > 0
         AND LENGTH(SUBSTR(p_name, 1, 10)) = 10""",
    # 13 numeric edges: negative modulo and integer division stay consistent
    """SELECT o_orderkey % 7 AS m, COUNT(*) AS n
       FROM orders WHERE o_orderkey <= 500 GROUP BY o_orderkey % 7""",
    # 14 HAVING with a correlated scalar subquery comparison
    """SELECT c_nationkey, COUNT(*) AS n FROM customer
       GROUP BY c_nationkey
       HAVING COUNT(*) > (SELECT COUNT(*) FROM customer) / 50""",
    # 15 windowed aggregate of a windowed aggregate (two layers)
    """SELECT MAX(share) AS max_share FROM (
         SELECT o_custkey,
                SUM(o_totalprice) / SUM(SUM(o_totalprice)) OVER () AS share
         FROM orders GROUP BY o_custkey) t""",
    # 16 UNION with type widening (int + double measures)
    """SELECT 'cnt' AS metric, CAST(COUNT(*) AS DOUBLE) AS v FROM orders
       UNION ALL
       SELECT 'avg' AS metric, AVG(o_totalprice) AS v FROM orders""",
    # 17 BETWEEN over strings (lexical range)
    """SELECT COUNT(*) AS n FROM customer
       WHERE c_mktsegment BETWEEN 'AUTOMOBILE' AND 'seg_zz'""",
    # 18 nested CASE with boolean aggregation
    """SELECT SUM(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END) AS huge,
              SUM(CASE WHEN o_totalprice BETWEEN 100000 AND 300000 THEN 1 ELSE 0 END) AS mid,
              SUM(CASE WHEN o_totalprice < 100000 THEN 1 ELSE 0 END) AS small
       FROM orders""",
    # 19 DISTINCT over an expression
    """SELECT COUNT(DISTINCT EXTRACT(YEAR FROM o_orderdate)) AS years FROM orders""",
    # 20 self-anti pattern via EXCEPT on expressions
    """SELECT EXTRACT(YEAR FROM o_orderdate) AS y FROM orders WHERE o_orderstatus = 'F'
       EXCEPT
       SELECT EXTRACT(YEAR FROM o_orderdate) AS y FROM orders WHERE o_orderstatus = 'P'""",
    # 21 GREATEST/LEAST inside aggregates
    """SELECT l_returnflag,
              ROUND(SUM(GREATEST(l_extendedprice - 1000, 0.0)), 2) AS clipped,
              ROUND(MAX(LEAST(l_discount, l_tax)), 2) AS min_rate
       FROM lineitem GROUP BY l_returnflag""",
    # 22 correlated subquery referencing two outer columns
    """SELECT COUNT(*) AS n FROM orders o
       WHERE o_totalprice > (SELECT 2 * AVG(o2.o_totalprice) FROM orders o2
                             WHERE o2.o_custkey = o.o_custkey
                               AND o2.o_orderstatus = o.o_orderstatus)""",
    # 23 derived table with window, filtered outside, re-aggregated
    """SELECT o_orderstatus, COUNT(*) AS top_half FROM (
         SELECT o_orderstatus,
                NTILE(2) OVER (ORDER BY o_totalprice, o_orderkey) AS half
         FROM orders) t
       WHERE half = 2 GROUP BY o_orderstatus""",
    # 24 aggregate FILTER with a subquery-free correlated-style condition
    """SELECT n_name,
              COUNT(*) FILTER (WHERE c_acctbal > 5000) AS rich,
              COUNT(*) FILTER (WHERE c_acctbal < 0) AS debt
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       GROUP BY n_name HAVING COUNT(*) > 20""",
    # 25 three-way join with two derived sides
    """SELECT r_name, ROUND(SUM(t.rev), 2) AS rev
       FROM region
       JOIN nation ON r_regionkey = n_regionkey
       JOIN (SELECT c_nationkey, SUM(o_totalprice) AS rev
             FROM orders JOIN customer ON o_custkey = c_custkey
             GROUP BY c_nationkey) t
         ON n_nationkey = t.c_nationkey
       GROUP BY r_name""",
    # 26 IN-list with mixed literals + expression member
    """SELECT COUNT(*) AS n FROM orders
       WHERE EXTRACT(MONTH FROM o_orderdate) IN (1, 2, 12)""",
    # 27 cascaded CTE-free derived tables with LIMIT inside
    """SELECT ROUND(AVG(o_totalprice), 2) AS avg_top
       FROM (SELECT o_totalprice FROM orders
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 100) t""",
    # 28 cross-type comparison: date vs timestamp literal
    """SELECT COUNT(*) AS n FROM orders
       WHERE o_orderdate >= TIMESTAMP '1997-06-15 00:00:00'""",
    # 29 anti-join via NOT IN on a joined projection
    """SELECT COUNT(*) AS n FROM supplier
       WHERE s_nationkey NOT IN (
         SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'EUROPE')""",
    # 30 percent contribution with NULLIF guard and HAVING on the ratio
    """SELECT o_custkey,
              ROUND(SUM(o_totalprice) / NULLIF((SELECT SUM(o_totalprice) FROM orders), 0), 8) AS share
       FROM orders GROUP BY o_custkey
       HAVING SUM(o_totalprice) / NULLIF((SELECT SUM(o_totalprice) FROM orders), 0) > 0.002""",
]


@pytest.mark.parametrize("i", range(len(CORPUS6)))
def test_breadth_shape_batch6(fe, duck, i):
    sql = CORPUS6[i]
    assert_matches_oracle(fe.sql(sql), duck, sql)


# Batch 7 (r10): portable date/interval arithmetic, string functions,
# nested set-ops, stacked subqueries. Same contract as every batch.
CORPUS7 = [
    # 1 INTERVAL arithmetic in WHERE
    """SELECT COUNT(*) AS n FROM orders
       WHERE o_orderdate + INTERVAL 30 DAY >= TIMESTAMP '1998-08-01 00:00:00'""",
    # 2 date difference bucketing via EXTRACT
    """SELECT EXTRACT(YEAR FROM o_orderdate) - 1995 AS yrs_since, COUNT(*) AS n
       FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) >= 1995
       GROUP BY EXTRACT(YEAR FROM o_orderdate) - 1995""",
    # 3 string pipeline: TRIM/UPPER/REPLACE composition
    """SELECT COUNT(*) AS n FROM part
       WHERE UPPER(REPLACE(p_type, ' ', '_')) LIKE '%BRUSHED%'""",
    # 4 LIKE with explicit ESCAPE (non-default escape char, exercised
    # on a literal underscore that must NOT act as a wildcard)
    """SELECT COUNT(*) AS steel, COUNT(*) FILTER (WHERE p_type LIKE '%!_%' ESCAPE '!') AS with_underscore
       FROM part WHERE p_type LIKE '%STEEL' ESCAPE '!'""",
    # 5 || concatenation with a computed key
    """SELECT o_orderstatus || '-' || o_orderpriority AS k, COUNT(*) AS n
       FROM orders GROUP BY o_orderstatus || '-' || o_orderpriority""",
    # 6 LPAD/LOWER in a projection compared in WHERE
    """SELECT COUNT(*) AS n FROM nation
       WHERE LENGTH(LPAD(LOWER(n_name), 12, '.')) = 12""",
    # 7 parenthesized set-op nesting
    """(SELECT n_regionkey AS k FROM nation WHERE n_nationkey < 10
        UNION SELECT r_regionkey AS k FROM region)
       INTERSECT
       SELECT n_regionkey AS k FROM nation WHERE n_nationkey >= 3""",
    # 8 EXISTS nested inside EXISTS
    """SELECT COUNT(*) AS n FROM region r
       WHERE EXISTS (SELECT 1 FROM nation n WHERE n.n_regionkey = r.r_regionkey
                     AND EXISTS (SELECT 1 FROM customer c
                                 WHERE c.c_nationkey = n.n_nationkey
                                   AND c.c_acctbal > 9990))""",
    # 9 window over a UNION ALL
    """SELECT src, v, RANK() OVER (ORDER BY v DESC, src) AS r FROM (
         SELECT 'max_cust' AS src, MAX(c_acctbal) AS v FROM customer
         UNION ALL
         SELECT 'max_supp' AS src, MAX(s_acctbal) AS v FROM supplier) u""",
    # 10 median and p90 via PERCENTILE_CONT
    """SELECT ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY o_totalprice), 2) AS med,
              ROUND(PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY o_totalprice), 2) AS p90
       FROM orders""",
    # 11 several scalar subqueries in one projection
    """SELECT (SELECT COUNT(*) FROM customer) AS custs,
              (SELECT COUNT(*) FROM supplier) AS supps,
              (SELECT ROUND(AVG(o_totalprice), 2) FROM orders) AS avg_price""",
    # 12 IN over an expression projection
    """SELECT COUNT(*) AS n FROM orders
       WHERE o_custkey IN (SELECT c_custkey + 0 FROM customer WHERE c_acctbal > 9000)""",
    # 13 CASE ladder over percent thresholds, grouped
    """SELECT CASE WHEN o_totalprice >= 400000 THEN 'XL'
                   WHEN o_totalprice >= 200000 THEN 'L'
                   WHEN o_totalprice >= 100000 THEN 'M'
                   ELSE 'S' END AS bucket, COUNT(*) AS n
       FROM orders GROUP BY 1""",
    # 14 aggregate of a CASE over a join flag
    """SELECT ROUND(SUM(CASE WHEN c_acctbal > 0 THEN o_totalprice ELSE 0 END), 2) AS pos_rev
       FROM orders JOIN customer ON o_custkey = c_custkey""",
    # 15 BETWEEN SYMMETRIC-free inverted bounds handled by AND
    """SELECT COUNT(*) AS n FROM lineitem
       WHERE l_quantity >= 10 AND l_quantity <= 20 AND l_discount >= 0.02
         AND l_discount <= 0.06""",
    # 16 three-branch UNION with per-branch filters, outer aggregate
    """SELECT COUNT(*) AS n FROM (
         SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
         UNION ALL SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'
         UNION ALL SELECT o_orderkey FROM orders WHERE o_orderstatus = 'P') u""",
    # 17 HAVING referencing a different aggregate than SELECT
    """SELECT l_returnflag, ROUND(AVG(l_discount), 6) AS avg_disc
       FROM lineitem GROUP BY l_returnflag HAVING SUM(l_quantity) > 100000""",
    # 18 anti-correlated: suppliers with no same-nation customer
    """SELECT COUNT(*) AS n FROM supplier s
       WHERE NOT EXISTS (SELECT 1 FROM customer c
                         WHERE c.c_nationkey = s.s_nationkey)""",
    # 19 GROUP BY two expressions
    """SELECT EXTRACT(YEAR FROM o_orderdate) AS y, o_orderkey % 2 AS parity,
              COUNT(*) AS n
       FROM orders GROUP BY EXTRACT(YEAR FROM o_orderdate), o_orderkey % 2""",
    # 20 scalar subquery with its own join
    """SELECT COUNT(*) AS n FROM orders
       WHERE o_totalprice > (
         SELECT AVG(o_totalprice) FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING')""",
    # 21 coalesced division with zero guard over groups
    """SELECT l_linestatus,
              ROUND(COALESCE(SUM(l_extendedprice) / NULLIF(SUM(l_quantity), 0), 0), 4) AS rate
       FROM lineitem GROUP BY l_linestatus""",
    # 22 IN-list of strings + NOT LIKE conjunction
    """SELECT COUNT(*) AS n FROM customer
       WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
         AND c_name NOT LIKE '%0000%'""",
    # 23 window LEAD across group boundaries with partition
    """SELECT o_orderstatus, o_orderkey,
              LEAD(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS next_key
       FROM orders WHERE o_orderkey <= 120""",
    # 24 aggregate over DISTINCT derived table
    """SELECT COUNT(*) AS n FROM (
         SELECT DISTINCT o_custkey, o_orderstatus FROM orders) t""",
    # 25 arithmetic on aggregates of different tables via cross join
    """SELECT ROUND(o.avg_o / c.avg_c, 6) AS ratio FROM
         (SELECT AVG(o_totalprice) AS avg_o FROM orders) o
       CROSS JOIN
         (SELECT AVG(c_acctbal) AS avg_c FROM customer WHERE c_acctbal > 0) c""",
]


@pytest.mark.parametrize("i", range(len(CORPUS7)))
def test_breadth_shape_batch7(fe, duck, i):
    sql = CORPUS7[i]
    assert_matches_oracle(fe.sql(sql), duck, sql)


# Batch 8 (r10): deep join chains, CASE/COALESCE group keys, windows
# feeding aggregates, LIMIT/ORDER interplay.
CORPUS8 = [
    # 1 five-table chain with mixed filters
    """SELECT r_name, COUNT(*) AS n
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE l_quantity > 45 AND o_orderstatus = 'F'
       GROUP BY r_name""",
    # 2 CASE expression as a group key
    """SELECT CASE WHEN c_acctbal < 0 THEN 'debt'
                   WHEN c_acctbal < 5000 THEN 'mid' ELSE 'rich' END AS tier,
              COUNT(*) AS n, ROUND(AVG(c_acctbal), 2) AS avg_bal
       FROM customer
       GROUP BY CASE WHEN c_acctbal < 0 THEN 'debt'
                     WHEN c_acctbal < 5000 THEN 'mid' ELSE 'rich' END""",
    # 3 COALESCE group key over an outer join
    """SELECT COALESCE(t.seg, 'NONE') AS seg, COUNT(*) AS n
       FROM nation LEFT JOIN (
         SELECT DISTINCT c_nationkey, c_mktsegment AS seg FROM customer
         WHERE c_acctbal > 9500) t ON n_nationkey = t.c_nationkey
       GROUP BY COALESCE(t.seg, 'NONE')""",
    # 4 aggregate of a window difference
    """SELECT ROUND(AVG(gap), 4) AS avg_gap FROM (
         SELECT o_totalprice - LAG(o_totalprice) OVER (ORDER BY o_orderkey) AS gap
         FROM orders WHERE o_orderkey <= 400) t
       WHERE gap IS NOT NULL""",
    # 5 top-1-per-group joined back to detail
    """SELECT o.o_orderstatus, o.o_orderkey
       FROM orders o
       JOIN (SELECT o_orderstatus, MAX(o_totalprice) AS mx
             FROM orders GROUP BY o_orderstatus) m
         ON o.o_orderstatus = m.o_orderstatus AND o.o_totalprice = m.mx""",
    # 6 ORDER BY an unselected expression via subquery, then LIMIT
    """SELECT c_name FROM (
         SELECT c_name, c_acctbal FROM customer
         ORDER BY c_acctbal DESC, c_custkey LIMIT 5) t""",
    # 7 two-level HAVING chain (inner HAVING feeds outer WHERE)
    """SELECT COUNT(*) AS busy_nations FROM (
         SELECT c_nationkey FROM customer GROUP BY c_nationkey
         HAVING COUNT(*) >= 20) t""",
    # 8 sum of per-group maxima vs max of per-group sums
    """SELECT ROUND(SUM(mx), 2) AS sum_of_max, ROUND(MAX(sm), 2) AS max_of_sum
       FROM (SELECT o_custkey, MAX(o_totalprice) AS mx, SUM(o_totalprice) AS sm
             FROM orders GROUP BY o_custkey) t""",
    # 9 join on an expression
    """SELECT COUNT(*) AS n
       FROM nation a JOIN nation b ON a.n_nationkey = b.n_nationkey + 1""",
    # 10 grouped aggregate filtered by a window percentile cut
    """SELECT COUNT(*) AS top_decile FROM (
         SELECT o_custkey, SUM(o_totalprice) AS spent,
                CUME_DIST() OVER (ORDER BY SUM(o_totalprice)) AS cd
         FROM orders GROUP BY o_custkey) t
       WHERE cd > 0.9""",
    # 11 self-join aggregate: pairs of same-priority orders per status
    """SELECT a.o_orderstatus, COUNT(*) AS pairs
       FROM orders a JOIN orders b
         ON a.o_orderstatus = b.o_orderstatus
        AND a.o_orderpriority = b.o_orderpriority
        AND a.o_orderkey < b.o_orderkey
       WHERE a.o_orderkey <= 100 AND b.o_orderkey <= 100
       GROUP BY a.o_orderstatus""",
    # 12 UNION dedup vs UNION ALL count difference
    """SELECT (SELECT COUNT(*) FROM (
                 SELECT o_orderstatus FROM orders
                 UNION SELECT o_orderstatus FROM orders) u) AS dedup,
              (SELECT COUNT(DISTINCT o_orderstatus) FROM orders) AS d""",
    # 13 arithmetic precision: weighted average two ways
    """SELECT ROUND(SUM(l_extendedprice * l_discount) / SUM(l_discount), 4) AS w1,
              ROUND(AVG(l_extendedprice), 4) AS plain
       FROM lineitem WHERE l_discount > 0""",
    # 14 EXISTS against a windowed derived table
    """SELECT COUNT(*) AS n FROM nation
       WHERE EXISTS (
         SELECT 1 FROM (
           SELECT c_nationkey,
                  ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey) AS r
           FROM customer) t
         WHERE t.r <= 25 AND t.c_nationkey = n_nationkey)""",
    # 15 grouped string min/max (lexical extremes)
    """SELECT c_mktsegment, MIN(c_name) AS first_name, MAX(c_name) AS last_name
       FROM customer GROUP BY c_mktsegment""",
    # 16 conditional join side via CASE in projection after join
    """SELECT SUM(CASE WHEN n_regionkey = r_regionkey THEN 1 ELSE 0 END) AS matched
       FROM nation CROSS JOIN region WHERE r_name = 'ASIA'""",
    # 17 aggregate over values produced by set-op of aggregates
    """SELECT ROUND(AVG(v), 4) AS avg_extreme FROM (
         SELECT MAX(o_totalprice) AS v FROM orders
         UNION ALL SELECT MIN(o_totalprice) AS v FROM orders) t""",
    # 18 subquery in both WHERE and HAVING
    """SELECT o_orderpriority, COUNT(*) AS n FROM orders
       WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 0)
       GROUP BY o_orderpriority
       HAVING COUNT(*) > (SELECT COUNT(*) FROM region)""",
    # 19 cross-column inequality filter with aggregates
    """SELECT COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS rev
       FROM lineitem WHERE l_tax > l_discount""",
    # 20 dense window over two-key ordering with expression
    """SELECT l_orderkey, l_linenumber,
              SUM(l_quantity) OVER (PARTITION BY l_orderkey
                                    ORDER BY l_linenumber) AS running_qty
       FROM lineitem WHERE l_orderkey <= 70""",
]


@pytest.mark.parametrize("i", range(len(CORPUS8)))
def test_breadth_shape_batch8(fe, duck, i):
    sql = CORPUS8[i]
    assert_matches_oracle(fe.sql(sql), duck, sql)


# Batch 9 (r10): boundary values, empty-group edges, join-key nulls,
# literal typing.
CORPUS9 = [
    # 1 aggregate over an empty filter result (no GROUP BY: one row)
    """SELECT COUNT(*) AS n, SUM(o_totalprice) AS s FROM orders
       WHERE o_totalprice < 0""",
    # 2 grouped aggregate over an empty input (zero rows out)
    """SELECT o_orderstatus, COUNT(*) AS n FROM orders
       WHERE o_totalprice < 0 GROUP BY o_orderstatus""",
    # 3 MIN/MAX of an empty set inside a scalar subquery
    """SELECT (SELECT MAX(o_totalprice) FROM orders WHERE o_totalprice < 0) AS mx,
              COUNT(*) AS n FROM region""",
    # 4 HAVING eliminating every group
    """SELECT o_orderstatus, COUNT(*) AS n FROM orders
       GROUP BY o_orderstatus HAVING COUNT(*) > 1000000""",
    # 5 arithmetic with negative literals and precedence
    """SELECT COUNT(*) AS n FROM lineitem
       WHERE -l_discount + l_tax * 2 > 0.05""",
    # 6 integer boundary bucketing with negative modulo input
    """SELECT (o_orderkey - 500) % 3 AS m, COUNT(*) AS n
       FROM orders WHERE o_orderkey <= 400 GROUP BY (o_orderkey - 500) % 3""",
    # 7 string comparison against concatenated bound
    """SELECT COUNT(*) AS n FROM customer
       WHERE c_name > 'Customer#' || '000000100'""",
    # 8 IS DISTINCT FROM (null-safe inequality)
    """SELECT COUNT(*) AS n FROM nation a JOIN nation b
         ON a.n_regionkey = b.n_regionkey
       WHERE a.n_nationkey IS DISTINCT FROM b.n_nationkey""",
    # 9 NULLIF producing NULL keys grouped together
    """SELECT NULLIF(o_orderstatus, 'O') AS k, COUNT(*) AS n
       FROM orders GROUP BY NULLIF(o_orderstatus, 'O')""",
    # 10 LEAST/GREATEST with mixed literal and column
    """SELECT ROUND(SUM(LEAST(o_totalprice, 100000.0)), 2) AS capped
       FROM orders""",
    # 11 double-negated predicate
    """SELECT COUNT(*) AS n FROM orders
       WHERE NOT (NOT (o_orderstatus = 'F'))""",
    # 12 scalar subquery equal to zero rows via LIMIT 0 semantics
    """SELECT COUNT(*) AS n FROM region
       WHERE r_regionkey IN (SELECT n_regionkey FROM nation WHERE 1 = 0)""",
    # 13 division result typing: int/int stays fractional
    """SELECT ROUND(SUM(l_quantity) / COUNT(*), 6) AS avg_manual,
              ROUND(AVG(l_quantity), 6) AS avg_native
       FROM lineitem""",
    # 14 BETWEEN on a computed expression
    """SELECT COUNT(*) AS n FROM lineitem
       WHERE l_extendedprice * (1 - l_discount) BETWEEN 10000 AND 20000""",
    # 15 ORDER BY with NULLS in the key through a left join, re-sorted by harness
    """SELECT n_name, t.mx
       FROM nation LEFT JOIN (
         SELECT c_nationkey, MAX(c_acctbal) AS mx FROM customer
         WHERE c_acctbal > 9990 GROUP BY c_nationkey) t
         ON n_nationkey = t.c_nationkey""",
    # 16 COUNT(col) vs COUNT(*) over the null-extended side
    """SELECT COUNT(*) AS stars, COUNT(t.mx) AS vals
       FROM nation LEFT JOIN (
         SELECT c_nationkey, MAX(c_acctbal) AS mx FROM customer
         WHERE c_acctbal > 9990 GROUP BY c_nationkey) t
         ON n_nationkey = t.c_nationkey""",
    # 17 CASE with no ELSE producing NULLs that aggregate away
    """SELECT SUM(CASE WHEN o_totalprice > 400000 THEN 1 END) AS xl
       FROM orders""",
    # 18 boolean expression as a projected value
    """SELECT o_orderstatus = 'F' AS finished, COUNT(*) AS n
       FROM orders GROUP BY o_orderstatus = 'F'""",
    # 19 nested COALESCE with typed NULL
    """SELECT COUNT(*) AS n FROM orders
       WHERE COALESCE(NULLIF(o_orderpriority, '1-URGENT'),
                      CAST(NULL AS STRING), 'fallback') = 'fallback'""",
    # 20 aggregate distinct over a computed bucket
    """SELECT COUNT(DISTINCT o_orderkey % 97) AS buckets FROM orders""",
]


@pytest.mark.parametrize("i", range(len(CORPUS9)))
def test_breadth_shape_batch9(fe, duck, i):
    sql = CORPUS9[i]
    assert_matches_oracle(fe.sql(sql), duck, sql)


# Batch 10 (r11, verdict item 7): three FoodMart classes batches 1-9
# leave unexplored — PARAMETERIZED CALCULATED MEMBERS (the same derived
# measure re-instantiated with different literal parameters, MDX's
# calculated members with arguments), NESTED-SET ARITHMETIC (set
# operators composed inside set operators, arithmetic over the
# membership results), and VIRTUAL-CUBE UNIONS OVER DIFFERING GRAINS
# (UNION ALL of aggregates at different group-bys conformed to one
# schema with NULL-padded dimensions, re-aggregated above — how MDX
# virtual cubes splice cubes of different dimensionality). Same
# contract as every batch: identical text on Spark and DuckDB.
CORPUS10 = [
    # -- parameterized calculated members --------------------------------
    # 1 the same margin member at three parameter values side by side
    """SELECT l_returnflag,
              ROUND(SUM(l_extendedprice * (1 - l_discount)) - 0.5 * SUM(l_quantity), 2) AS m_05,
              ROUND(SUM(l_extendedprice * (1 - l_discount)) - 1.0 * SUM(l_quantity), 2) AS m_10,
              ROUND(SUM(l_extendedprice * (1 - l_discount)) - 2.0 * SUM(l_quantity), 2) AS m_20
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    # 2 parameterized threshold member: share of orders above K, for two K
    """SELECT o_orderstatus,
              ROUND(SUM(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) * 1.0
                    / COUNT(*), 6) AS share_100k,
              ROUND(SUM(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END) * 1.0
                    / COUNT(*), 6) AS share_300k
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    # 3 calculated member referencing another calculated member (nested CTE)
    """WITH base AS (
         SELECT l_returnflag, SUM(l_extendedprice) AS gross,
                SUM(l_extendedprice * l_discount) AS disc
         FROM lineitem GROUP BY l_returnflag),
       derived AS (
         SELECT l_returnflag, gross - disc AS net, disc / gross AS disc_rate
         FROM base)
       SELECT l_returnflag, ROUND(net, 2) AS net,
              ROUND(disc_rate * 100, 6) AS disc_pct
       FROM derived ORDER BY l_returnflag""",
    # 4 parameterized date-window member: same measure over 2 ranges
    """SELECT o_orderpriority,
              COUNT(CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' THEN 1 END) AS n_recent,
              COUNT(CASE WHEN o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' THEN 1 END) AS n_3yr
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    # 5 ratio-of-parameterized-members (composition of two CASE slices)
    """SELECT l_linestatus,
              ROUND(SUM(CASE WHEN l_quantity > 25 THEN l_extendedprice ELSE 0 END)
                    / SUM(CASE WHEN l_quantity <= 25 THEN l_extendedprice ELSE 1 END), 6) AS hi_lo_ratio
       FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",
    # 6 member parameterized by a scalar subquery (global mean as the parameter)
    """SELECT o_orderstatus,
              ROUND(AVG(o_totalprice) - (SELECT AVG(o_totalprice) FROM orders), 4) AS dev_from_global
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    # 7 linear member over three measures with integer coefficients
    """SELECT l_returnflag,
              ROUND(3 * SUM(l_quantity) + 2 * SUM(l_discount * 100) - COUNT(*), 3) AS score
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    # 8 the same member at two grains in one statement (detail + total row)
    """SELECT 'by_flag' AS grain, l_returnflag AS k,
              ROUND(SUM(l_extendedprice) / SUM(l_quantity), 6) AS unit_price
       FROM lineitem GROUP BY l_returnflag
       UNION ALL
       SELECT 'total' AS grain, NULL AS k,
              ROUND(SUM(l_extendedprice) / SUM(l_quantity), 6) AS unit_price
       FROM lineitem
       ORDER BY grain, k NULLS FIRST""",
    # 9 clamped member (GREATEST/LEAST as MDX-style bounds)
    """SELECT o_orderpriority,
              ROUND(SUM(LEAST(o_totalprice, 200000)), 2) AS capped_sales,
              ROUND(SUM(GREATEST(o_totalprice, 50000)), 2) AS floored_sales
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    # 10 conditional member with a NULL parameter branch that aggregates away
    """SELECT l_linestatus,
              ROUND(AVG(CASE WHEN l_discount BETWEEN 0.02 AND 0.08
                             THEN l_extendedprice END), 4) AS mid_disc_avg
       FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",
    # -- nested-set arithmetic -------------------------------------------
    # 11 INTERSECT inside UNION (set tree two levels deep)
    """SELECT n_nationkey FROM nation WHERE n_regionkey = 0
       UNION
       (SELECT c_nationkey FROM customer WHERE c_acctbal > 9000
        INTERSECT
        SELECT n_nationkey FROM nation WHERE n_regionkey IN (1, 2))
       ORDER BY n_nationkey""",
    # 12 EXCEPT of two UNIONs
    """(SELECT n_regionkey FROM nation WHERE n_nationkey < 10
        UNION SELECT r_regionkey FROM region)
       EXCEPT
       (SELECT n_regionkey FROM nation WHERE n_nationkey >= 20
        UNION SELECT 99 AS k)
       ORDER BY n_regionkey""",
    # 13 arithmetic over set-membership counts (cardinality of a set expression)
    """SELECT (SELECT COUNT(*) FROM (
                 SELECT c_nationkey FROM customer WHERE c_acctbal > 9500
                 INTERSECT
                 SELECT n_nationkey FROM nation) t)
              - (SELECT COUNT(*) FROM (
                 SELECT c_nationkey FROM customer WHERE c_acctbal > 9500
                 EXCEPT
                 SELECT n_nationkey FROM nation WHERE n_regionkey = 3) t)
              AS member_delta""",
    # 14 INTERSECT chain (three-way) with an aggregate above
    """SELECT COUNT(*) AS n FROM (
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
         INTERSECT
         SELECT c_custkey FROM customer WHERE c_acctbal > 0) t""",
    # 15 EXCEPT feeding a join (the set result used as a dimension filter)
    """SELECT n_name, COUNT(*) AS n_cust
       FROM customer JOIN (
         SELECT n_nationkey, n_name FROM nation
         WHERE n_nationkey IN (SELECT n_nationkey FROM nation
                               EXCEPT
                               SELECT c_nationkey FROM customer WHERE c_acctbal < 0)) d
         ON c_nationkey = d.n_nationkey
       GROUP BY n_name ORDER BY n_name""",
    # 16 UNION inside IN-subquery (set algebra in the predicate position)
    """SELECT COUNT(*) AS n FROM orders
       WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9900
                           UNION
                           SELECT c_custkey FROM customer WHERE c_acctbal < -900)""",
    # 17 set difference of aggregates' key-sets at two thresholds
    """SELECT COUNT(*) AS lost_buckets FROM (
         SELECT o_custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 5
         EXCEPT
         SELECT o_custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15) t""",
    # 18 symmetric difference via mirrored EXCEPTs unioned
    """SELECT COUNT(*) AS sym_diff FROM (
         (SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
          EXCEPT SELECT n_nationkey AS k FROM nation WHERE n_regionkey = 2)
         UNION ALL
         (SELECT n_nationkey AS k FROM nation WHERE n_regionkey = 2
          EXCEPT SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000)) t""",
    # 19 INTERSECT of expression sets (computed members, not raw columns)
    """SELECT bucket FROM (
         SELECT o_orderkey % 7 AS bucket FROM orders WHERE o_totalprice > 350000
         INTERSECT
         SELECT o_orderkey % 7 AS bucket FROM orders WHERE o_totalprice < 5000) t
       ORDER BY bucket""",
    # 20 NOT IN over an EXCEPT result (negated set algebra, no NULLs by filter)
    """SELECT COUNT(*) AS n FROM nation
       WHERE n_nationkey NOT IN (
         SELECT c_nationkey FROM customer WHERE c_acctbal IS NOT NULL
         EXCEPT
         SELECT n_nationkey FROM nation WHERE n_regionkey = 4)""",
    # -- virtual-cube unions over differing grains ------------------------
    # 21 two cubes (customer-grain, order-grain) conformed and re-aggregated
    """SELECT src, ROUND(SUM(v), 2) AS total FROM (
         SELECT 'acct' AS src, c_acctbal AS v FROM customer
         UNION ALL
         SELECT 'sales' AS src, o_totalprice AS v FROM orders) t
       GROUP BY src ORDER BY src""",
    # 22 differing grains NULL-padded to a common dimensionality
    """SELECT region_k, status_k, ROUND(SUM(m), 2) AS m FROM (
         SELECT n_regionkey AS region_k, CAST(NULL AS STRING) AS status_k,
                SUM(c_acctbal) AS m
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_regionkey
         UNION ALL
         SELECT CAST(NULL AS BIGINT) AS region_k, o_orderstatus AS status_k,
                SUM(o_totalprice) AS m
         FROM orders GROUP BY o_orderstatus) v
       GROUP BY region_k, status_k
       ORDER BY region_k NULLS FIRST, status_k NULLS FIRST""",
    # 23 virtual cube re-aggregated ABOVE the union (outer rollup of both)
    """SELECT ROUND(SUM(m), 2) AS grand FROM (
         SELECT SUM(l_extendedprice) AS m FROM lineitem GROUP BY l_returnflag
         UNION ALL
         SELECT SUM(o_totalprice) AS m FROM orders GROUP BY o_orderstatus) t""",
    # 24 conformed dimension join after the union (shared time axis)
    """SELECT y, ROUND(SUM(m), 2) AS m FROM (
         SELECT EXTRACT(YEAR FROM o_orderdate) AS y, SUM(o_totalprice) AS m
         FROM orders GROUP BY EXTRACT(YEAR FROM o_orderdate)
         UNION ALL
         SELECT EXTRACT(YEAR FROM l_shipdate) AS y, SUM(l_extendedprice) AS m
         FROM lineitem GROUP BY EXTRACT(YEAR FROM l_shipdate)) t
       GROUP BY y ORDER BY y""",
    # 25 measure-count asymmetry: one branch contributes zeros for a measure
    """SELECT k, ROUND(SUM(m1), 2) AS m1, SUM(m2) AS m2 FROM (
         SELECT o_orderstatus AS k, SUM(o_totalprice) AS m1, 0 AS m2
         FROM orders GROUP BY o_orderstatus
         UNION ALL
         SELECT o_orderstatus AS k, 0.0 AS m1, COUNT(*) AS m2
         FROM orders GROUP BY o_orderstatus) t
       GROUP BY k ORDER BY k""",
    # 26 grain mismatch detected by COUNT vs COUNT DISTINCT above the union
    """SELECT COUNT(*) AS branch_rows, COUNT(DISTINCT k) AS distinct_keys FROM (
         SELECT o_orderstatus AS k FROM orders GROUP BY o_orderstatus
         UNION ALL
         SELECT l_linestatus AS k FROM lineitem GROUP BY l_linestatus) t""",
    # 27 weighted splice: each cube weighted before the union
    """SELECT k, ROUND(SUM(m), 4) AS m FROM (
         SELECT n_regionkey AS k, SUM(c_acctbal) * 0.25 AS m
         FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_regionkey
         UNION ALL
         SELECT r_regionkey AS k, COUNT(*) * 1000.0 AS m
         FROM region GROUP BY r_regionkey) t
       GROUP BY k ORDER BY k""",
    # 28 virtual cube sliced AFTER splicing (outer WHERE over both grains)
    """SELECT k, ROUND(SUM(m), 2) AS m FROM (
         SELECT o_orderpriority AS k, SUM(o_totalprice) AS m
         FROM orders GROUP BY o_orderpriority
         UNION ALL
         SELECT o_orderpriority AS k, SUM(o_totalprice) * -0.5 AS m
         FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority) t
       WHERE k IN ('1-URGENT', '5-LOW')
       GROUP BY k ORDER BY k""",
    # 29 three-cube splice with a source tag kept as a dimension
    """SELECT src, COUNT(*) AS groups, ROUND(SUM(m), 2) AS m FROM (
         SELECT 'cust' AS src, SUM(c_acctbal) AS m FROM customer GROUP BY c_nationkey
         UNION ALL
         SELECT 'ord' AS src, SUM(o_totalprice) AS m FROM orders GROUP BY o_orderstatus
         UNION ALL
         SELECT 'line' AS src, SUM(l_extendedprice) AS m FROM lineitem GROUP BY l_returnflag) t
       GROUP BY src ORDER BY src""",
    # 30 union of differing grains under a window (percent within source)
    """SELECT src, k,
              ROUND(m * 100.0 / SUM(m) OVER (PARTITION BY src), 6) AS pct
       FROM (
         SELECT 'status' AS src, o_orderstatus AS k, SUM(o_totalprice) AS m
         FROM orders GROUP BY o_orderstatus
         UNION ALL
         SELECT 'prio' AS src, o_orderpriority AS k, SUM(o_totalprice) AS m
         FROM orders GROUP BY o_orderpriority) t
       ORDER BY src, k""",
]


@pytest.mark.parametrize("i", range(len(CORPUS10)))
def test_breadth_shape_batch10(fe, duck, i):
    sql = CORPUS10[i]
    assert_matches_oracle(fe.sql(sql), duck, sql)


# Batch 11 (r11 second wave): classes batches 1-10 still leave thin —
# correlated aggregates inside HAVING, standard LATERAL subqueries in
# FROM, windows computed in subqueries and consumed above, EXISTS/IN
# used as VALUES (expression position, not predicate position), and
# multi-level correlation. Same contract: identical text on both.
CORPUS11 = [
    # 1 correlated scalar aggregate inside HAVING
    """SELECT o_custkey, COUNT(*) AS n FROM orders o GROUP BY o_custkey
       HAVING COUNT(*) > (SELECT AVG(c_acctbal) / 2000 FROM customer
                          WHERE c_custkey = o_custkey)
       ORDER BY o_custkey LIMIT 20""",
    # 2 LATERAL subquery referencing the left table
    """SELECT n_name, t.cnt FROM nation,
       LATERAL (SELECT COUNT(*) AS cnt FROM customer
                WHERE c_nationkey = n_nationkey) t
       ORDER BY n_name""",
    # 3 LATERAL with an aggregate + filter over the correlation
    """SELECT r_name, t.mx FROM region,
       LATERAL (SELECT MAX(n_nationkey) AS mx FROM nation
                WHERE n_regionkey = r_regionkey) t
       ORDER BY r_name""",
    # 4 window computed in a subquery, filtered above (manual QUALIFY)
    """SELECT o_orderpriority, n FROM (
         SELECT o_orderpriority, COUNT(*) AS n,
                rank() OVER (ORDER BY COUNT(*) DESC) AS rk
         FROM orders GROUP BY o_orderpriority) t
       WHERE rk <= 2 ORDER BY n DESC, o_orderpriority""",
    # 5 window over a window (rank of a running sum)
    """SELECT k, rank() OVER (ORDER BY rs DESC) AS rk FROM (
         SELECT o_orderstatus AS k,
                SUM(COUNT(*)) OVER (ORDER BY o_orderstatus) AS rs
         FROM orders GROUP BY o_orderstatus) t
       ORDER BY rk, k""",
    # 6 EXISTS as a projected value (boolean expression position)
    """SELECT n_name,
              EXISTS (SELECT 1 FROM customer
                      WHERE c_nationkey = n_nationkey AND c_acctbal > 9990) AS has_rich
       FROM nation ORDER BY n_name""",
    # 7 IN-subquery as a CASE scrutinee
    """SELECT o_orderstatus,
              SUM(CASE WHEN o_custkey IN (SELECT c_custkey FROM customer
                                          WHERE c_acctbal > 9000)
                       THEN 1 ELSE 0 END) AS rich_orders
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    # 8 nested correlation. DIVERGENCE PINNED BY THIS BATCH: the inner
    # subquery may only reference the IMMEDIATELY enclosing query in
    # Spark (o.o_custkey); referencing the outermost table two levels
    # up (c_custkey) raises UNRESOLVED_COLUMN where DuckDB resolves it.
    # The middle filter enforces o_custkey = c_custkey, so the
    # one-level form is semantically identical — the portable spelling.
    """SELECT c_custkey FROM customer c
       WHERE c_acctbal > 9990
         AND EXISTS (SELECT 1 FROM orders o
                     WHERE o_custkey = c_custkey
                       AND o_totalprice > (SELECT AVG(o2.o_totalprice)
                                           FROM orders o2
                                           WHERE o2.o_custkey = o.o_custkey))
       ORDER BY c_custkey""",
    # 9 correlated NOT EXISTS conjoined with correlated EXISTS
    """SELECT COUNT(*) AS n FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         AND NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey AND o_totalprice > 400000)""",
    # 10 LATERAL feeding an aggregate above
    """SELECT ROUND(AVG(t.cnt), 6) AS avg_cust_per_nation FROM nation,
       LATERAL (SELECT COUNT(*) AS cnt FROM customer
                WHERE c_nationkey = n_nationkey) t""",
    # 11 HAVING comparing two aggregates of the same group
    """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
       GROUP BY l_returnflag
       HAVING MAX(l_extendedprice) > 1000 * MIN(l_quantity)
       ORDER BY l_returnflag""",
    # 12 windowed deviation from group mean (window + GROUP BY interplay)
    """SELECT o_orderstatus,
              ROUND(SUM(o_totalprice) - AVG(SUM(o_totalprice)) OVER (), 2) AS dev
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    # 13 subquery in both SELECT and WHERE referencing different tables
    """SELECT n_name,
              (SELECT COUNT(*) FROM supplier WHERE s_nationkey = n_nationkey) AS sups
       FROM nation
       WHERE n_regionkey = (SELECT MIN(r_regionkey) FROM region)
       ORDER BY n_name""",
    # 14 dense_rank ties broken inside a derived table, top slice joined back
    """SELECT c.c_custkey, c.c_acctbal FROM customer c JOIN (
         SELECT c_nationkey, MAX(c_acctbal) AS mx FROM customer
         GROUP BY c_nationkey) t
         ON c.c_nationkey = t.c_nationkey AND c.c_acctbal = t.mx
       ORDER BY c.c_custkey LIMIT 10""",
    # 15 scalar subquery arithmetic in ORDER BY position (via alias)
    """SELECT o_orderpriority,
              ROUND(SUM(o_totalprice) / (SELECT SUM(o_totalprice) FROM orders), 8) AS share
       FROM orders GROUP BY o_orderpriority ORDER BY share DESC, o_orderpriority""",
    # 16 UNION under LATERAL-free correlation: subquery union correlated on both branches
    """SELECT n_name,
              (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey AND c_acctbal > 5000)
              + (SELECT COUNT(*) FROM supplier WHERE s_nationkey = n_nationkey) AS combined
       FROM nation ORDER BY n_name""",
    # 17 aggregate FILTER + window in one statement
    """SELECT o_orderstatus,
              COUNT(*) FILTER (WHERE o_totalprice > 200000) AS big,
              ROUND(100.0 * COUNT(*) FILTER (WHERE o_totalprice > 200000)
                    / SUM(COUNT(*)) OVER (), 6) AS big_share_pct
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    # 18 EXISTS over a set-op subquery
    """SELECT COUNT(*) AS n FROM nation n
       WHERE EXISTS (
         SELECT c_nationkey FROM customer WHERE c_acctbal > 9995
         INTERSECT
         SELECT n2.n_nationkey FROM nation n2 WHERE n2.n_nationkey = n.n_nationkey)""",
    # 19 lateral row expansion bounded by the left row's value
    """SELECT r_regionkey, t.n FROM region,
       LATERAL (SELECT COUNT(*) AS n FROM nation
                WHERE n_regionkey <= r_regionkey) t
       ORDER BY r_regionkey""",
    # 20 deeply nested derived tables (3 levels) with re-aggregation
    """SELECT ROUND(AVG(m), 4) AS grand FROM (
         SELECT k, MAX(s) AS m FROM (
           SELECT o_orderstatus AS k, o_orderpriority AS p, SUM(o_totalprice) AS s
           FROM orders GROUP BY o_orderstatus, o_orderpriority) x
         GROUP BY k) y""",
]


@pytest.mark.parametrize("i", range(len(CORPUS11)))
def test_breadth_shape_batch11(fe, duck, i):
    sql = CORPUS11[i]
    assert_matches_oracle(fe.sql(sql), duck, sql)


# Batch 12 (r11 closing wave): portable-surface parity classes —
# date/interval arithmetic, shared string/math function grids, VALUES
# derived tables, JOIN USING, IS DISTINCT FROM — the everyday SQL a
# migrating user types first. Same contract: identical text, both
# engines.
CORPUS12 = [
    # 1 interval arithmetic in a predicate
    """SELECT COUNT(*) AS n FROM orders
       WHERE o_orderdate + INTERVAL 90 DAY < TIMESTAMP '1995-01-01 00:00:00'""",
    # 2 interval month arithmetic in a projection
    """SELECT o_orderkey, o_orderdate + INTERVAL 3 MONTH AS due
       FROM orders WHERE o_orderkey <= 32 ORDER BY o_orderkey""",
    # 3 EXTRACT grid over one date
    """SELECT EXTRACT(YEAR FROM o_orderdate) AS y,
              EXTRACT(QUARTER FROM o_orderdate) AS q,
              EXTRACT(MONTH FROM o_orderdate) AS m,
              EXTRACT(DAY FROM o_orderdate) AS d,
              COUNT(*) AS n
       FROM orders WHERE o_orderkey < 200
       GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""",
    # 4 date_trunc grains agree. DIVERGENCE PINNED: DuckDB's
    # date_trunc('quarter'|'month'|..., ts) returns DATE while Spark
    # returns TIMESTAMP - the portable spelling CASTs the result
    # explicitly (same pin the qx46/qx52 oracles carry)
    """SELECT CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS qs,
              COUNT(*) AS n
       FROM orders GROUP BY 1 ORDER BY qs""",
    # 5 string function grid
    """SELECT upper(left(c_name, 8)) AS u, lower(right(c_name, 5)) AS l,
              length(c_name) AS len, reverse(substring(c_name, 1, 6)) AS rev
       FROM customer WHERE c_custkey <= 10 ORDER BY c_custkey""",
    # 6 pad/repeat/replace grid
    # (CAST AS STRING, not VARCHAR: Spark requires a length on VARCHAR)
    """SELECT lpad(CAST(n_nationkey AS STRING), 4, '0') AS padded,
              repeat('ab', n_regionkey + 1) AS rep,
              replace(n_name, 'A', '_') AS repl
       FROM nation ORDER BY n_nationkey LIMIT 10""",
    # 7 concat_ws + trim
    """SELECT concat_ws('|', r_name, trim('  x  '), 'z') AS joined
       FROM region ORDER BY r_regionkey""",
    # 8 position and instr-free portable search
    """SELECT n_name, position('AN' IN n_name) AS p
       FROM nation WHERE position('AN' IN n_name) > 0 ORDER BY n_name""",
    # 9 math grid
    """SELECT abs(-o_totalprice) AS a, ceil(o_totalprice / 1000) AS c,
              floor(o_totalprice / 1000) AS f, round(sqrt(o_totalprice), 6) AS s,
              sign(o_totalprice - 200000) AS sg
       FROM orders WHERE o_orderkey <= 7 ORDER BY o_orderkey""",
    # 10 mod/power/greatest/least
    """SELECT mod(o_orderkey, 7) AS m, round(power(2, mod(o_orderkey, 10)), 1) AS p,
              greatest(o_orderkey, 100) AS g, least(o_orderkey, 100) AS l
       FROM orders WHERE o_orderkey <= 40 ORDER BY o_orderkey""",
    # 11 VALUES derived table joined to a real table
    """SELECT t.tag, COUNT(*) AS n
       FROM orders JOIN (VALUES ('F', 'finished'), ('O', 'open'), ('P', 'pending'))
            AS t(st, tag) ON o_orderstatus = t.st
       GROUP BY t.tag ORDER BY t.tag""",
    # 12 JOIN USING emits one coalesced copy of the key
    """SELECT n_regionkey, COUNT(*) AS n
       FROM nation AS a JOIN nation AS b USING (n_regionkey)
       GROUP BY n_regionkey ORDER BY n_regionkey""",
    # 13 IS DISTINCT FROM three-valued grid
    """SELECT COUNT(*) FILTER (WHERE NULLIF(o_orderstatus, 'F')
                               IS DISTINCT FROM 'O') AS distinct_cnt,
              COUNT(*) FILTER (WHERE NULLIF(o_orderstatus, 'F')
                               IS NOT DISTINCT FROM NULL) AS null_cnt
       FROM orders""",
    # 14 BETWEEN SYMMETRIC-free portable range with reversed bounds guarded
    """SELECT COUNT(*) AS n FROM lineitem
       WHERE l_quantity BETWEEN LEAST(10, 20) AND GREATEST(10, 20)""",
    # 15 chained CASE with date predicates
    """SELECT CASE WHEN o_orderdate < TIMESTAMP '1994-01-01 00:00:00' THEN 'early'
                   WHEN o_orderdate < TIMESTAMP '1996-01-01 00:00:00' THEN 'mid'
                   ELSE 'late' END AS era,
              COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS s
       FROM orders GROUP BY 1 ORDER BY era""",
    # 16 nested scalar functions (string of math of string)
    """SELECT length(CAST(CAST(round(o_totalprice, 0) AS BIGINT) AS STRING)) AS digits,
              COUNT(*) AS n
       FROM orders GROUP BY 1 ORDER BY digits""",
    # 17 COALESCE typing across int/double
    """SELECT ROUND(SUM(COALESCE(NULLIF(l_discount, 0.0), 0.005)), 4) AS s
       FROM lineitem WHERE l_orderkey < 100""",
    # 18 multiple FILTER clauses sharing one scan
    """SELECT l_returnflag,
              COUNT(*) FILTER (WHERE l_quantity > 25) AS hi,
              COUNT(*) FILTER (WHERE l_quantity <= 25) AS lo,
              ROUND(AVG(l_discount) FILTER (WHERE l_quantity > 25), 6) AS hi_disc
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    # 19 cast grid round-trips. DIVERGENCE PINNED: CAST(double AS
    # BIGINT) TRUNCATES in Spark (Hive lineage) but ROUNDS in DuckDB -
    # the portable spelling goes through FLOOR first so both engines
    # agree; the raw cast is a documented cross-engine trap
    """SELECT CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS DOUBLE) AS d,
              CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS ts
       FROM orders WHERE o_orderkey <= 5 ORDER BY o_orderkey""",
    # 20 grouping by a boolean expression of two columns
    """SELECT (l_quantity > 25 AND l_discount > 0.05) AS hot, COUNT(*) AS n
       FROM lineitem GROUP BY 1 ORDER BY hot NULLS FIRST""",
]


@pytest.mark.parametrize("i", range(len(CORPUS12)))
def test_breadth_shape_batch12(fe, duck, i):
    sql = CORPUS12[i]
    assert_matches_oracle(fe.sql(sql), duck, sql)


# Batch 13 (r11 third wave): window-function varieties (value-RANGE
# frames, ntile, percent_rank/cume_dist, named windows) and the babel
# PG surface that BOTH engines accept natively or via the frontend's
# babel tier with identical text (:: casts, DISTINCT ON, ARRAY
# literals, ~ regex operators, GROUP BY ALL).
CORPUS13 = [
    # 1 value-RANGE frame (moving sum over a numeric range)
    """SELECT o_orderkey, o_totalprice,
              ROUND(SUM(o_totalprice) OVER (
                ORDER BY o_totalprice
                RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING), 2) AS nbr
       FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey""",
    # 2 ntile buckets
    """SELECT b, COUNT(*) AS n, ROUND(MIN(o_totalprice), 2) AS lo FROM (
         SELECT o_totalprice, ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS b
         FROM orders WHERE o_orderkey <= 400) t
       GROUP BY b ORDER BY b""",
    # 3 percent_rank / cume_dist agree
    """SELECT o_orderkey,
              ROUND(percent_rank() OVER (ORDER BY o_totalprice, o_orderkey), 6) AS pr,
              ROUND(cume_dist() OVER (ORDER BY o_totalprice, o_orderkey), 6) AS cd
       FROM orders WHERE o_orderkey <= 40 ORDER BY o_orderkey""",
    # 4 named WINDOW clause reused by three functions
    """SELECT o_orderkey,
              rank() OVER w AS rk, dense_rank() OVER w AS drk,
              row_number() OVER w AS rn
       FROM orders WHERE o_orderkey <= 40
       WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
       ORDER BY o_orderkey""",
    # 5 frame exclusion-free running extremes
    """SELECT o_orderkey,
              MAX(o_totalprice) OVER (ORDER BY o_orderkey
                ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS mx5,
              MIN(o_totalprice) OVER (ORDER BY o_orderkey
                ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING) AS mn5
       FROM orders WHERE o_orderkey <= 60 ORDER BY o_orderkey""",
    # 6 GROUP BY ALL
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
       FROM orders GROUP BY ALL ORDER BY o_orderstatus, o_orderpriority""",
    # 7 :: cast shorthand (babel tier on Spark, native on DuckDB).
    # FLOOR first: CAST(double AS INT) truncates in Spark, rounds in
    # DuckDB (the batch-12 pinned divergence)
    """SELECT FLOOR(o_totalprice / 1000)::INT AS k, COUNT(*) AS n
       FROM orders WHERE o_orderkey <= 500 GROUP BY 1 ORDER BY k""",
    # 8 DISTINCT ON keeps the first row per group (babel tier)
    """SELECT DISTINCT ON (o_orderstatus) o_orderstatus, o_orderkey, o_totalprice
       FROM orders ORDER BY o_orderstatus, o_orderkey""",
    # 9 ARRAY literal membership
    """SELECT COUNT(*) AS n FROM orders
       WHERE o_orderpriority = ANY(ARRAY['1-URGENT', '5-LOW'])""",
    # 10 regex predicate, portable spelling. DIVERGENCE PINNED: the
    # `~` operator is PARTIAL match in PostgreSQL (and our babel tier)
    # but FULL match (regexp_full_match) in DuckDB — identical text
    # silently disagrees, so the portable predicate is
    # regexp_extract(x, pat) <> '' which both engines define as
    # empty-string-on-no-match
    """SELECT COUNT(*) AS n FROM nation
       WHERE regexp_extract(n_name, '([0-9])', 1) <> ''""",
    # 11 negated regex, portable spelling (same `~` pin as #10)
    """SELECT COUNT(*) AS n FROM nation
       WHERE regexp_extract(n_name, '(ZZZ)', 1) = ''""",
    # 12 lead/lag defaults at partition edges
    """SELECT o_orderkey,
              lag(o_totalprice, 1, 0.0) OVER (ORDER BY o_orderkey) AS prev,
              lead(o_totalprice, 2, -1.0) OVER (ORDER BY o_orderkey) AS nxt2
       FROM orders WHERE o_orderkey <= 30 ORDER BY o_orderkey""",
    # 13 first_value / last_value with explicit full frame
    """SELECT o_orderstatus, o_orderkey,
              first_value(o_totalprice) OVER w AS fst,
              last_value(o_totalprice) OVER (PARTITION BY o_orderstatus
                ORDER BY o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lst
       FROM orders WHERE o_orderkey <= 60
       WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey)
       ORDER BY o_orderstatus, o_orderkey""",
    # 14 window over an aggregate over a window (3 levels)
    """SELECT k, ROUND(AVG(rs), 4) AS a FROM (
         SELECT o_orderstatus AS k,
                SUM(o_totalprice) OVER (PARTITION BY o_orderstatus
                  ORDER BY o_orderkey) AS rs
         FROM orders WHERE o_orderkey <= 200) t
       GROUP BY k ORDER BY k""",
    # 15 RANGE frame over a timestamp ORDER BY with interval bounds
    """SELECT o_orderkey,
              COUNT(*) OVER (ORDER BY o_orderdate
                RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS n30
       FROM orders WHERE o_orderkey <= 50 ORDER BY o_orderkey""",
    # 16 dense ranking ties verified against a self-computed count
    """SELECT x.n_regionkey, x.drk, y.expected FROM (
         SELECT n_regionkey,
                dense_rank() OVER (ORDER BY n_regionkey) AS drk
         FROM nation) x
       JOIN (SELECT n_regionkey, n_regionkey + 1 AS expected
             FROM nation GROUP BY n_regionkey) y
         ON x.n_regionkey = y.n_regionkey
       GROUP BY x.n_regionkey, x.drk, y.expected
       ORDER BY x.n_regionkey""",
    # 17 windows with different partitions in one SELECT
    """SELECT o_orderkey,
              COUNT(*) OVER (PARTITION BY o_orderstatus) AS per_status,
              COUNT(*) OVER (PARTITION BY o_orderpriority) AS per_prio
       FROM orders WHERE o_orderkey <= 30 ORDER BY o_orderkey""",
    # 18 ILIKE (babel/native both)
    """SELECT COUNT(*) AS n FROM nation WHERE n_name ILIKE '%an%'""",
    # 19 :: chained casts (FLOOR first — the truncate-vs-round pin)
    """SELECT (FLOOR(o_totalprice)::BIGINT)::STRING AS s
       FROM orders WHERE o_orderkey <= 5 ORDER BY o_orderkey""",
    # 20 array_agg deterministic via within-group style subquery ordering
    """SELECT n_regionkey, COUNT(*) AS n,
              ROUND(SUM(n_nationkey), 1) AS s
       FROM nation GROUP BY n_regionkey
       HAVING COUNT(*) = (SELECT MAX(c) FROM (
         SELECT COUNT(*) AS c FROM nation GROUP BY n_regionkey) t)
       ORDER BY n_regionkey""",
]


@pytest.mark.parametrize("i", range(len(CORPUS13)))
def test_breadth_shape_batch13(fe, duck, i):
    sql = CORPUS13[i]
    assert_matches_oracle(fe.sql(sql), duck, sql)


# Batch 14 (r11 final wave): statistical-aggregate parity — the
# numeric-analytics surface (corr/covar, the regr_* family, higher
# moments, median, bit/bool aggregates, count_if, levenshtein) where
# definition mismatches (sample vs population, excess vs raw kurtosis)
# would silently diverge. Probed first: both engines agree on all of
# these definitions; the grid pins that agreement.
CORPUS14 = [
    # 1 correlation and both covariances per group
    """SELECT l_returnflag,
              ROUND(corr(l_quantity, l_extendedprice), 6) AS r,
              ROUND(covar_pop(l_quantity, l_extendedprice), 3) AS cp,
              ROUND(covar_samp(l_quantity, l_extendedprice), 3) AS cs
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    # 2 regression family (slope/intercept/count/r2)
    """SELECT ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS m,
              ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS b,
              regr_count(l_extendedprice, l_quantity) AS n,
              ROUND(regr_r2(l_extendedprice, l_quantity), 8) AS r2
       FROM lineitem""",
    # 3 regr averages and sums of squares
    """SELECT ROUND(regr_avgx(l_extendedprice, l_quantity), 6) AS ax,
              ROUND(regr_avgy(l_extendedprice, l_quantity), 4) AS ay,
              ROUND(regr_sxx(l_extendedprice, l_quantity), 3) AS sxx
       FROM lineitem""",
    # 4 higher moments. DIVERGENCE PINNED: Spark's skewness/kurtosis
    # are the POPULATION moment formulas (g1, g2) while DuckDB's are
    # the BIAS-ADJUSTED sample statistics (G1, G2 - factors like
    # sqrt(n(n-1))/(n-2)); at n=4 they differ by 1.73x (probed), at
    # n=30k they agree to ~4 significant decimals. This shape pins the
    # asymptotic agreement at 3 decimals on a large group; small-n
    # moments are NOT portable between the engines.
    """SELECT l_linestatus,
              ROUND(skewness(l_quantity), 3) AS sk,
              ROUND(kurtosis(l_quantity), 3) AS ku
       FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",
    # 5 median over groups (exact interpolating median both)
    """SELECT l_returnflag, median(l_quantity) AS med
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    # 6 bool aggregates over predicates
    """SELECT o_orderstatus,
              bool_and(o_totalprice > 0) AS all_pos,
              bool_or(o_totalprice > 400000) AS any_xl
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    # 7 bit aggregates over int keys
    """SELECT n_regionkey,
              bit_and(n_nationkey) AS ba, bit_or(n_nationkey) AS bo,
              bit_xor(n_nationkey) AS bx
       FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    # 8 count_if
    """SELECT count_if(o_totalprice > 200000) AS big,
              count_if(o_orderstatus = 'F') AS fin
       FROM orders""",
    # 9 levenshtein distance grid
    """SELECT r_name, levenshtein(r_name, 'EUROPE') AS d
       FROM region ORDER BY r_regionkey""",
    # 10 variance family grid in one statement
    """SELECT ROUND(var_pop(l_discount), 8) AS vp,
              ROUND(var_samp(l_discount), 8) AS vs,
              ROUND(stddev_pop(l_discount), 8) AS sp,
              ROUND(stddev_samp(l_discount), 8) AS ss
       FROM lineitem WHERE l_orderkey < 1000""",
    # 11 corr of a column with itself is exactly 1
    """SELECT ROUND(corr(l_quantity, l_quantity), 6) AS self_r
       FROM lineitem""",
    # 12 single-row group: samp variants NULL, pop variants 0
    """SELECT var_samp(x) AS vs, ROUND(var_pop(x), 1) AS vp FROM (
         SELECT CAST(42 AS DOUBLE) AS x) t""",
    # 13 regr on a constant x: slope NULL (zero variance)
    """SELECT regr_slope(o_totalprice, 1.0) AS m FROM orders""",
    # 14 median of even count. DIVERGENCE PINNED: DuckDB's median
    # over DECIMAL input is DISCRETE (lower median, 2.0) while Spark
    # always interpolates (2.5); over DOUBLE both interpolate - the
    # portable spelling casts to DOUBLE first
    """SELECT median(CAST(x AS DOUBLE)) AS m
       FROM (VALUES (1.0), (2.0), (3.0), (4.0)) t(x)""",
    # 15 correlation of a tiny explicit set IS portable (population
    # and sample correlation are identical - the bias factors cancel
    # in the ratio), unlike the small-n moments pinned in #4
    """SELECT ROUND(corr(x, y), 6) AS r FROM
       (VALUES (1.0, 2.0), (2.0, 4.1), (3.0, 7.0)) t(x, y)""",
    # 16 aggregate FILTER composes with the stats family
    """SELECT ROUND(corr(l_quantity, l_extendedprice)
                FILTER (WHERE l_returnflag = 'R'), 6) AS r_returned
       FROM lineitem""",
    # 17 bool aggregates over empty groups via FILTER: NULL both
    """SELECT bool_and(o_totalprice > 0)
                FILTER (WHERE o_orderstatus = 'Z') AS none_seen
       FROM orders""",
    # 18 covar_samp of single pair is NULL, covar_pop is 0
    """SELECT covar_samp(a, b) AS cs, ROUND(covar_pop(a, b), 1) AS cp
       FROM (VALUES (1.0, 2.0)) t(a, b)""",
    # 19 grouped regression: per-flag slopes
    """SELECT l_returnflag,
              ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS m
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    # 20 mixed stats + plain aggregates in one pass
    """SELECT l_linestatus, COUNT(*) AS n,
              ROUND(AVG(l_quantity), 6) AS avg_q,
              ROUND(stddev_samp(l_quantity), 6) AS sd_q,
              ROUND(corr(l_quantity, l_discount), 6) AS r_qd
       FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",
]


@pytest.mark.parametrize("i", range(len(CORPUS14)))
def test_breadth_shape_batch14(fe, duck, i):
    sql = CORPUS14[i]
    assert_matches_oracle(fe.sql(sql), duck, sql)


# Batch 15 (r11 last wave): OUTER-JOIN AGGREGATION classes — grouping
# on the null-extended side, aggregates that must not count padding,
# COALESCE keys, full-outer reconciliation, anti-join-via-aggregate —
# the report shapes where null-extension bugs hide.
CORPUS15 = [
    # 1 group on the null-extended side: NULL group collects unmatched
    """SELECT t.mx AS bucket, COUNT(*) AS n
       FROM nation LEFT JOIN (
         SELECT c_nationkey, MAX(c_acctbal) > 9999 AS mx FROM customer
         GROUP BY c_nationkey) t ON n_nationkey = t.c_nationkey
       GROUP BY t.mx ORDER BY bucket NULLS FIRST""",
    # 2 SUM over the padded side ignores NULLs; COUNT(*) does not
    """SELECT n_regionkey, COUNT(*) AS rows_incl_pad,
              COUNT(o.o_orderkey) AS real_orders,
              ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS s
       FROM nation LEFT JOIN customer c ON n_nationkey = c.c_nationkey
       LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                             AND o.o_totalprice > 450000
       GROUP BY n_regionkey ORDER BY n_regionkey""",
    # 3 FULL OUTER reconciliation of two aggregates
    """SELECT COALESCE(a.k, b.k) AS k,
              COALESCE(a.n, 0) AS from_orders, COALESCE(b.n, 0) AS from_lineitem
       FROM (SELECT o_orderstatus AS k, COUNT(*) AS n FROM orders GROUP BY 1) a
       FULL OUTER JOIN
            (SELECT l_linestatus AS k, COUNT(*) AS n FROM lineitem GROUP BY 1) b
         ON a.k = b.k
       ORDER BY k""",
    # 4 anti-join via LEFT JOIN ... IS NULL, then aggregated
    """SELECT c_mktsegment, COUNT(*) AS inactive
       FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       WHERE o_orderkey IS NULL
       GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    # 5 aggregate of an expression mixing both sides under LEFT JOIN
    """SELECT n_name,
              ROUND(SUM(COALESCE(c_acctbal, 0) + n_regionkey), 2) AS s
       FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
                                         AND c_acctbal > 9995
       GROUP BY n_name ORDER BY n_name""",
    # 6 HAVING over a left-join aggregate referencing the padded side
    """SELECT n_name, COUNT(c_custkey) AS n_cust
       FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
       GROUP BY n_name HAVING COUNT(c_custkey) = 0 ORDER BY n_name""",
    # 7 join condition vs WHERE condition on the padded side differ
    """SELECT
         (SELECT COUNT(*) FROM nation LEFT JOIN customer
            ON n_nationkey = c_nationkey AND c_acctbal > 9999) AS cond_in_on,
         (SELECT COUNT(*) FROM nation LEFT JOIN customer
            ON n_nationkey = c_nationkey WHERE c_acctbal > 9999) AS cond_in_where""",
    # 8 RIGHT JOIN spelled both ways agrees
    """SELECT COUNT(*) AS n FROM customer RIGHT JOIN nation
       ON c_nationkey = n_nationkey WHERE c_custkey IS NULL""",
    # 9 aggregates of aggregates across an outer join
    """SELECT ROUND(AVG(per_nation), 4) AS avg_cust FROM (
         SELECT n_nationkey, COUNT(c_custkey) AS per_nation
         FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
         GROUP BY n_nationkey) t""",
    # 10 left join to a windowed derived table
    """SELECT n_name, t.rk FROM nation LEFT JOIN (
         SELECT c_nationkey, MAX(c_acctbal) AS mx,
                rank() OVER (ORDER BY MAX(c_acctbal) DESC) AS rk
         FROM customer GROUP BY c_nationkey) t
         ON n_nationkey = t.c_nationkey
       WHERE t.rk <= 3 OR t.rk IS NULL ORDER BY n_name""",
    # 11 chained LEFT JOINs where the middle is empty-filtered
    """SELECT COUNT(*) AS n, COUNT(c.c_custkey) AS mid, COUNT(o.o_orderkey) AS last
       FROM nation
       LEFT JOIN customer c ON n_nationkey = c.c_nationkey AND c.c_custkey < 0
       LEFT JOIN orders o ON c.c_custkey = o.o_custkey""",
    # 12 distinct-count over the padded side excludes NULLs
    """SELECT n_regionkey, COUNT(DISTINCT c_mktsegment) AS segs
       FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
                                         AND c_acctbal > 9990
       GROUP BY n_regionkey ORDER BY n_regionkey""",
    # 13 CASE over the null-extended side inside an aggregate
    """SELECT n_regionkey,
              SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS padded_rows
       FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
                                         AND c_acctbal > 9998
       GROUP BY n_regionkey ORDER BY n_regionkey""",
    # 14 outer join of two grouped derived tables, grouped again
    """SELECT g, COUNT(*) AS n FROM (
         SELECT COALESCE(a.n_regionkey, b.reg) AS g
         FROM (SELECT DISTINCT n_regionkey FROM nation WHERE n_nationkey < 10) a
         FULL OUTER JOIN
              (SELECT n_regionkey AS reg FROM nation WHERE n_nationkey >= 20
               GROUP BY n_regionkey) b
           ON a.n_regionkey = b.reg) t
       GROUP BY g ORDER BY g""",
    # 15 left-join aggregate under a scalar subquery comparison
    """SELECT COUNT(*) AS n FROM (
         SELECT n_nationkey, COUNT(c_custkey) AS nc
         FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
         GROUP BY n_nationkey) t
       WHERE nc > (SELECT AVG(cnt) FROM (
         SELECT COUNT(*) AS cnt FROM customer GROUP BY c_nationkey) u)""",
]


@pytest.mark.parametrize("i", range(len(CORPUS15)))
def test_breadth_shape_batch15(fe, duck, i):
    sql = CORPUS15[i]
    assert_matches_oracle(fe.sql(sql), duck, sql)


# ---------------------------------------------------------------------
# batch 16 (r12, VERDICT r11 item 5): the three still-unexplored
# FoodMart classes — multi-level RAGGED hierarchies (region→nation→
# customer→orders with missing branches), SEMI-ADDITIVE measures over
# snapshots (balance-style values summed across entities but
# first/last-along-time), and PERCENT-OF-PARENT calculations
# (ratio-to-parent/grand-total through window sums). Identical text on
# both engines; ties broken deterministically where "last" is picked.
CORPUS16 = [
    # -- ragged hierarchies -------------------------------------------
    # 1 three-level rollup with GROUPING labels (ragged: subtotal rows)
    """SELECT CASE WHEN GROUPING(r_name) = 1 THEN 'ALL' ELSE r_name END AS lvl_region,
              CASE WHEN GROUPING(n_name) = 1 THEN 'ALL' ELSE n_name END AS lvl_nation,
              COUNT(*) AS n
       FROM region JOIN nation ON r_regionkey = n_regionkey
       GROUP BY ROLLUP (r_name, n_name)""",
    # 2 ragged drill: level counts survive empty branches
    """SELECT r_name, COUNT(DISTINCT n_nationkey) AS nations,
              COUNT(c_custkey) AS custs
       FROM region
       LEFT JOIN nation ON r_regionkey = n_regionkey
       LEFT JOIN customer ON n_nationkey = c_nationkey AND c_acctbal > 9000
       GROUP BY r_name ORDER BY r_name""",
    # 3 nearest-ancestor label when the leaf level is missing
    """SELECT COALESCE(t.seg, n_name) AS label, COUNT(*) AS n FROM nation
       LEFT JOIN (SELECT c_nationkey, c_mktsegment AS seg FROM customer
                  WHERE c_acctbal > 9980) t ON n_nationkey = t.c_nationkey
       GROUP BY COALESCE(t.seg, n_name) ORDER BY label""",
    # 4 child level joined to its parent's aggregate (two grains met)
    """SELECT n_name, c.cnt AS nation_custs, r.cnt AS region_custs
       FROM nation
       JOIN (SELECT c_nationkey, COUNT(*) AS cnt FROM customer
             GROUP BY c_nationkey) c ON n_nationkey = c.c_nationkey
       JOIN (SELECT n_regionkey AS rk, COUNT(*) AS cnt
             FROM nation JOIN customer ON n_nationkey = c_nationkey
             GROUP BY n_regionkey) r ON n_regionkey = r.rk
       ORDER BY n_name""",
    # 5 leaf→nation→region: shares compose through two levels
    """SELECT n_name,
              ROUND(100.0 * nat_bal / SUM(nat_bal) OVER (PARTITION BY n_regionkey), 4)
                AS pct_of_region,
              ROUND(100.0 * nat_bal / SUM(nat_bal) OVER (), 4) AS pct_of_all
       FROM (SELECT n_name, n_regionkey, SUM(c_acctbal) AS nat_bal
             FROM nation JOIN customer ON n_nationkey = c_nationkey
             GROUP BY n_name, n_regionkey) t
       ORDER BY n_name""",
    # 6 HAVING prunes subtotal rows out of a ragged rollup
    """SELECT r_name, n_name, COUNT(*) AS n
       FROM region JOIN nation ON r_regionkey = n_regionkey
       GROUP BY ROLLUP (r_name, n_name)
       HAVING GROUPING(n_name) = 0 ORDER BY r_name, n_name""",
    # 7 zero-branch nations keep a row with a zero count
    """SELECT n_name, COALESCE(o.cnt, 0) AS orders_beneath FROM nation
       LEFT JOIN (SELECT c_nationkey, COUNT(*) AS cnt
                  FROM customer JOIN orders ON c_custkey = o_custkey
                  WHERE o_totalprice > 400000
                  GROUP BY c_nationkey) o ON n_nationkey = o.c_nationkey
       ORDER BY n_name""",
    # 8 level-skipping union re-grouped with level tags
    """SELECT lvl, COUNT(*) AS members, ROUND(SUM(bal), 2) AS bal FROM (
         SELECT 'region' AS lvl, r_name AS k, SUM(c_acctbal) AS bal
         FROM region JOIN nation ON r_regionkey = n_regionkey
                     JOIN customer ON n_nationkey = c_nationkey
         GROUP BY r_name
         UNION ALL
         SELECT 'nation' AS lvl, n_name AS k, SUM(c_acctbal) AS bal
         FROM nation JOIN customer ON n_nationkey = c_nationkey
         GROUP BY n_name) u
       GROUP BY lvl ORDER BY lvl""",
    # 9 subtree aggregate per ancestor via one correlated subquery
    """SELECT r_name,
              (SELECT COUNT(*) FROM nation WHERE n_regionkey = r_regionkey) AS subtree
       FROM region ORDER BY r_name""",
    # 10 depth-aware classification: size rank within the parent
    """SELECT n_name,
              CASE WHEN rk = 1 THEN 'largest' WHEN rk <= 3 THEN 'top3'
                   ELSE 'rest' END AS class
       FROM (SELECT n_name,
                    rank() OVER (PARTITION BY n_regionkey
                                 ORDER BY cnt DESC, n_name) AS rk
             FROM (SELECT n_name, n_regionkey, COUNT(c_custkey) AS cnt
                   FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
                   GROUP BY n_name, n_regionkey) a) b
       ORDER BY n_name""",
    # -- semi-additive measures over snapshots ------------------------
    # 11 closing balance: LAST order value per customer, summed across
    #    customers (additive across entities, last-along-time)
    """SELECT ROUND(SUM(last_price), 2) AS closing_total FROM (
         SELECT o_custkey, o_totalprice AS last_price,
                row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
         FROM orders) t WHERE rn = 1""",
    # 12 opening vs closing per customer, aggregated per status of close
    """SELECT ROUND(AVG(close_p - open_p), 4) AS avg_drift FROM (
         SELECT o_custkey,
                MIN(o_totalprice) FILTER (WHERE rn_asc = 1) AS open_p,
                MIN(o_totalprice) FILTER (WHERE rn_desc = 1) AS close_p
         FROM (SELECT o_custkey, o_totalprice,
                      row_number() OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey) AS rn_asc,
                      row_number() OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn_desc
               FROM orders) w
         GROUP BY o_custkey) t""",
    # 13 snapshot-date join-back: total booked on each customer's
    #    latest order DATE (ties included — date-grain snapshot)
    """SELECT ROUND(SUM(o_totalprice), 2) AS snapshot_total,
              COUNT(*) AS snapshot_rows
       FROM orders o JOIN (
         SELECT o_custkey AS ck, MAX(o_orderdate) AS md FROM orders
         GROUP BY o_custkey) m ON o.o_custkey = m.ck AND o.o_orderdate = m.md""",
    # 14 distribution of customers by the month of their last activity
    """SELECT CAST(date_trunc('month', md) AS DATE) AS last_month,
              COUNT(*) AS custs
       FROM (SELECT o_custkey, MAX(o_orderdate) AS md FROM orders
             GROUP BY o_custkey) t
       GROUP BY CAST(date_trunc('month', md) AS DATE)
       ORDER BY last_month""",
    # 15 average-daily-total: additive within a day, averaged over days
    """SELECT ROUND(AVG(day_total), 2) AS avg_daily FROM (
         SELECT o_orderdate, SUM(o_totalprice) AS day_total FROM orders
         GROUP BY o_orderdate) d""",
    # 16 per-entity MAX rolled up the hierarchy (semi-additive up, not
    #    across time)
    """SELECT n_name, ROUND(SUM(peak), 2) AS sum_of_peaks
       FROM (SELECT c_nationkey, MAX(o_totalprice) AS peak
             FROM customer JOIN orders ON c_custkey = o_custkey
             GROUP BY c_custkey, c_nationkey) p
       JOIN nation ON n_nationkey = p.c_nationkey
       GROUP BY n_name ORDER BY n_name""",
    # 17 LAST_VALUE with a full-partition frame equals the rn=1 pick
    """SELECT COUNT(DISTINCT lv) AS distinct_closings FROM (
         SELECT last_value(o_totalprice) OVER (
                  PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv
         FROM orders) t""",
    # 18 status of the latest order decides the customer's bucket
    """SELECT last_status, COUNT(*) AS custs FROM (
         SELECT o_custkey, o_orderstatus AS last_status,
                row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
         FROM orders) t WHERE rn = 1 GROUP BY last_status ORDER BY last_status""",
    # 19 point-in-time outstanding vs lifetime (two FILTER aggregates)
    """SELECT COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS open_orders,
              COUNT(*) AS all_orders,
              ROUND(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2)
                AS open_value
       FROM orders""",
    # 20 snapshot balance per segment: last order value per customer,
    #    summed per segment through the dimension
    """SELECT c_mktsegment, ROUND(SUM(last_price), 2) AS seg_closing FROM (
         SELECT o_custkey, o_totalprice AS last_price,
                row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
         FROM orders) t
       JOIN customer ON c_custkey = t.o_custkey
       WHERE rn = 1 GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    # -- percent-of-parent --------------------------------------------
    # 21 classic ratio-to-parent over the hierarchy edge
    """SELECT n_name,
              ROUND(100.0 * COUNT(c_custkey) /
                    SUM(COUNT(c_custkey)) OVER (PARTITION BY n_regionkey), 4)
                AS pct_of_region
       FROM nation JOIN customer ON n_nationkey = c_nationkey
       GROUP BY n_name, n_regionkey ORDER BY n_name""",
    # 22 percent of grand total via nested aggregate-in-window
    """SELECT o_orderpriority,
              ROUND(100.0 * SUM(o_totalprice) / SUM(SUM(o_totalprice)) OVER (), 4)
                AS pct_total
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    # 23 shares compose: leaf-of-nation × nation-of-region =
    #    leaf-of-region (both computed, difference pinned ~0)
    """SELECT MAX(ABS(direct_pct - composed_pct)) < 0.0000001 AS composes FROM (
         SELECT 100.0 * seg_bal / SUM(seg_bal) OVER (PARTITION BY rk) AS direct_pct,
                (100.0 * seg_bal / nat_bal) *
                (nat_bal / SUM(seg_bal) OVER (PARTITION BY rk)) AS composed_pct
         FROM (SELECT n_regionkey AS rk, n_nationkey AS nk, c_mktsegment,
                      SUM(c_acctbal) AS seg_bal,
                      SUM(SUM(c_acctbal)) OVER (PARTITION BY n_nationkey) AS nat_bal
               FROM nation JOIN customer ON n_nationkey = c_nationkey
               GROUP BY n_regionkey, n_nationkey, c_mktsegment) x) y""",
    # 24 dominant-child share per parent
    """SELECT r_name,
              ROUND(MAX(100.0 * cnt / tot), 4) AS top_child_pct
       FROM (SELECT n_regionkey, n_name, COUNT(c_custkey) AS cnt,
                    SUM(COUNT(c_custkey)) OVER (PARTITION BY n_regionkey) AS tot
             FROM nation JOIN customer ON n_nationkey = c_nationkey
             GROUP BY n_regionkey, n_name) t
       JOIN region ON r_regionkey = t.n_regionkey
       GROUP BY r_name ORDER BY r_name""",
    # 25 percent-of-parent on a ROLLUP: subtotal rows show 100
    """SELECT o_orderstatus,
              CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
                   ELSE o_orderpriority END AS prio,
              ROUND(100.0 * SUM(o_totalprice) /
                    SUM(SUM(o_totalprice)) OVER (PARTITION BY o_orderstatus,
                                                 GROUPING(o_orderpriority)), 4)
                AS pct_in_status
       FROM orders GROUP BY o_orderstatus, ROLLUP (o_orderpriority)""",
    # 26 cumulative (Pareto) share ordered by contribution
    """SELECT o_orderpriority,
              ROUND(100.0 * SUM(SUM(o_totalprice)) OVER (
                      ORDER BY SUM(o_totalprice) DESC, o_orderpriority
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) /
                    SUM(SUM(o_totalprice)) OVER (), 4) AS cum_pct
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    # 27 share within a FILTERed parent only
    """SELECT o_orderpriority,
              ROUND(100.0 * SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'F') /
                    SUM(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'F'))
                      OVER (), 4) AS pct_of_finished
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    # 28 one row, two parents: share within status AND within priority
    """SELECT o_orderstatus, o_orderpriority,
              ROUND(100.0 * SUM(o_totalprice) /
                    SUM(SUM(o_totalprice)) OVER (PARTITION BY o_orderstatus), 4)
                AS pct_of_status,
              ROUND(100.0 * SUM(o_totalprice) /
                    SUM(SUM(o_totalprice)) OVER (PARTITION BY o_orderpriority), 4)
                AS pct_of_priority
       FROM orders GROUP BY o_orderstatus, o_orderpriority
       ORDER BY o_orderstatus, o_orderpriority""",
    # 29 ratio of ratios: group average over global average
    """SELECT c_mktsegment,
              ROUND(AVG(c_acctbal) / (SELECT AVG(c_acctbal) FROM customer), 6)
                AS index_vs_global
       FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    # 30 children needed to reach half the parent (nested windows then
    #    aggregate)
    """SELECT rk AS region, MIN(rnk) AS nations_to_half FROM (
         SELECT rk, rnk, cum, tot FROM (
           SELECT n_regionkey AS rk, COUNT(c_custkey) AS cnt,
                  row_number() OVER (PARTITION BY n_regionkey
                                     ORDER BY COUNT(c_custkey) DESC, n_name) AS rnk,
                  SUM(COUNT(c_custkey)) OVER (PARTITION BY n_regionkey
                                              ORDER BY COUNT(c_custkey) DESC, n_name
                                              ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND CURRENT ROW) AS cum,
                  SUM(COUNT(c_custkey)) OVER (PARTITION BY n_regionkey) AS tot
           FROM nation JOIN customer ON n_nationkey = c_nationkey
           GROUP BY n_regionkey, n_name) w) v
       WHERE cum * 2 >= tot GROUP BY rk ORDER BY rk""",
]


@pytest.mark.parametrize("i", range(len(CORPUS16)))
def test_breadth_shape_batch16(fe, duck, i):
    sql = CORPUS16[i]
    assert_matches_oracle(fe.sql(sql), duck, sql)


# ---------------------------------------------------------------------
# batch 17 (r12): scalar-function edge semantics — string function
# boundary behavior, date_part/EXTRACT field grids, interval
# arithmetic clamping, numeric sign rules, NULL propagation through
# GREATEST/CASE/||. The corpus classes where engines drift quietest;
# identical text on both engines.
CORPUS17 = [
    # 1 split_part out-of-range index returns empty, both directions
    """SELECT split_part('a,b,c', ',', 2) AS mid,
              split_part('a,b,c', ',', 9) AS past,
              split_part('abc', ',', 1) AS whole""",
    # 2 translate with dup/short maps
    """SELECT translate('abcabc', 'abc', 'xy') AS shrinks,
              translate('banana', 'an', 'na') AS swaps""",
    # 3 lpad/rpad truncate when the target is shorter
    """SELECT lpad('hello', 3, '*') AS l3, rpad('hello', 8, 'ab') AS r8,
              lpad('x', 0, 'y') AS l0""",
    # 4 position/instr family agrees on 1-based and missing
    """SELECT position('b' IN 'abc') AS pos, instr('abc', 'z') AS missing,
              instr('abcabc', 'bc') AS first_hit""",
    # 5 trim specific characters (BOTH/LEADING/TRAILING forms)
    """SELECT trim(BOTH 'x' FROM 'xxaxx') AS b,
              trim(LEADING 'x' FROM 'xxaxx') AS l,
              trim(TRAILING 'x' FROM 'xxaxx') AS t""",
    # 6 || NULL propagation vs concat()'s NULL-skipping is a known
    #   split — the PORTABLE operator form propagates on both
    """SELECT 'a' || NULL AS op_null, 'a' || 'b' || 'c' AS chained""",
    # 7 GREATEST/LEAST skip NULLs on both engines (PG semantics)
    """SELECT greatest(1, NULL, 3) AS g, least(NULL, 2, NULL) AS l,
              greatest(c_acctbal, 0) > 0 AS pos
       FROM customer WHERE c_custkey = 1""",
    # 8 repeat/reverse/md5 stability
    """SELECT repeat('ab', 3) AS r3, repeat('x', 0) AS r0,
              reverse('abc') AS rev, md5('') AS empty_digest""",
    # 9 EXTRACT field grid on a fixed timestamp
    """SELECT EXTRACT(YEAR FROM TIMESTAMP '1996-02-29 13:45:30') AS y,
              EXTRACT(QUARTER FROM TIMESTAMP '1996-02-29 13:45:30') AS q,
              EXTRACT(MONTH FROM TIMESTAMP '1996-02-29 13:45:30') AS mo,
              EXTRACT(DAY FROM TIMESTAMP '1996-02-29 13:45:30') AS d,
              EXTRACT(HOUR FROM TIMESTAMP '1996-02-29 13:45:30') AS h,
              EXTRACT(MINUTE FROM TIMESTAMP '1996-02-29 13:45:30') AS mi""",
    # 10 ISO week fields across a year boundary (1996-01-01 is ISO
    #    week 1 of 1996; 1995-01-01 is ISO week 52 of 1994)
    """SELECT EXTRACT(WEEK FROM DATE '1996-01-01') AS w96,
              EXTRACT(WEEK FROM DATE '1995-01-01') AS w95""",
    # 11 month arithmetic clamps at month end on both engines
    """SELECT CAST(DATE '1996-01-31' + INTERVAL 1 MONTH AS DATE) AS feb,
              CAST(DATE '1996-02-29' + INTERVAL 1 YEAR AS DATE) AS nonleap""",
    # 12 day arithmetic across DST-free UTC stays exact
    """SELECT CAST(TIMESTAMP '1996-03-15 23:30:00' + INTERVAL 90 MINUTE
                   AS TIMESTAMP) AS rolled""",
    # 13 last_day / first-of-month round trip
    """SELECT last_day(DATE '1996-02-10') AS eom,
              CAST(date_trunc('month', DATE '1996-02-10') AS DATE) AS som""",
    # 14 MOD sign follows the dividend on both engines
    """SELECT MOD(7, 3) AS a, MOD(-7, 3) AS b, MOD(7, -3) AS c,
              MOD(-7, -3) AS d""",
    # 15 floor/ceil/round on negative halves
    """SELECT floor(-1.5) AS f, ceil(-1.5) AS c, round(-2.5, 0) AS r,
              round(2.675, 2) AS bankers_probe""",
    # 16 power/sqrt/ln edge values
    """SELECT power(2, -2) AS p, sqrt(0) AS s, ln(1) AS l,
              ROUND(exp(1), 9) AS e""",
    # 17 CASE branch type unification int→double
    """SELECT CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 2.5 END AS v,
              COUNT(*) AS n
       FROM orders GROUP BY 1 ORDER BY v""",
    # 18 NULLIF + COALESCE chain over aggregates
    """SELECT COALESCE(NULLIF(COUNT(*), 0), -1) AS n,
              COALESCE(NULLIF(SUM(CASE WHEN FALSE THEN 1 END), NULL), 0)
                AS forced
       FROM orders WHERE o_totalprice < 0""",
    # 19 LIKE with ESCAPE and literal percent
    """SELECT COUNT(*) AS n FROM part
       WHERE p_type LIKE '%BRASS' OR p_type LIKE '%!%%' ESCAPE '!'""",
    # 20 string-number implicit compare via explicit CAST both ways
    """SELECT COUNT(*) AS n FROM orders
       WHERE CAST(o_orderkey AS VARCHAR(20)) = '7'
          OR o_orderkey = CAST('11' AS BIGINT)""",
]


@pytest.mark.parametrize("i", range(len(CORPUS17)))
def test_breadth_shape_batch17(fe, duck, i):
    sql = CORPUS17[i]
    assert_matches_oracle(fe.sql(sql), duck, sql)


# ---------------------------------------------------------------------
# batch 18 (r12): shared array/higher-order surface. Probed first over
# 31 candidate spellings; the shapes below are the agreeing core. THREE
# new divergences pinned by the probe (see
# test_array_divergences_pinned): [] subscripts are 0-based on Spark
# and 1-based on DuckDB (the biggest silent-portability trap of the
# whole corpus so far), and array_distinct / array_intersect return
# engine-ORDER results (Spark first-seen, DuckDB hash order) — the
# portable spelling wraps them in array_sort, as these shapes do.
CORPUS18 = [
    # 1 membership + 1-based position agree
    """SELECT array_contains(ARRAY[1,2,3], 2) AS hit,
              array_contains(ARRAY[1,2,3], 9) AS miss,
              array_position(ARRAY[10,20,30], 30) AS pos""",
    # 2 sort + flatten compose
    """SELECT array_sort(flatten(ARRAY[ARRAY[3,1],ARRAY[2]])) AS s""",
    # 3 lambda filter agrees (shared higher-order surface)
    """SELECT filter(ARRAY[1,2,3,4,5], x -> x % 2 = 0) AS evens,
              filter(ARRAY[1,2], x -> x > 9) AS none""",
    # 4 portable distinct: array_sort(array_distinct(...)) — the bare
    #   form returns engine-order (divergence pinned separately)
    """SELECT array_sort(array_distinct(ARRAY[3,1,2,3,1])) AS d""",
    # 5 portable intersection, same reasoning
    """SELECT array_sort(array_intersect(ARRAY[1,2,3,4], ARRAY[4,2,9])) AS i""",
    # 6 array built from a correlated aggregate, sorted for stability
    """SELECT r_name, array_sort(array_agg(n_name)) AS nations
       FROM region JOIN nation ON r_regionkey = n_regionkey
       GROUP BY r_name ORDER BY r_name""",
    # 7 contains over a grouped array column end-to-end
    """SELECT COUNT(*) AS n FROM (
         SELECT n_regionkey, array_agg(n_name) AS names
         FROM nation GROUP BY n_regionkey) t
       WHERE array_contains(names, 'FRANCE')""",
    # 8 filter lambda over an aggregated array
    """SELECT n_regionkey,
              array_sort(filter(array_agg(n_nationkey), x -> x % 2 = 0))
                AS even_keys
       FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    # 9 nested flatten of grouped singleton arrays
    """SELECT array_sort(flatten(array_agg(ARRAY[n_nationkey]))) AS all_keys
       FROM nation WHERE n_regionkey = 2""",
    # 10 position MISS agreement: both engines return 0 (not NULL) —
    #    probed explicitly since PG returns NULL here
    """SELECT array_position(ARRAY[1,2,3], 9) AS miss_pos""",
]


@pytest.mark.parametrize("i", range(len(CORPUS18)))
def test_breadth_shape_batch18(fe, duck, i):
    sql = CORPUS18[i]
    assert_matches_oracle(fe.sql(sql), duck, sql)


def test_array_divergences_pinned(fe, duck):
    """The batch-18 probe's divergences, pinned against EACH engine's
    own behavior so a silent change on either side fails loudly:
    (1) [] subscripts: Spark indexes arrays from 0, DuckDB from 1 —
        identical text reads DIFFERENT elements; portable code must
        not use bare subscripts across engines;
    (2) array_distinct / array_intersect element ORDER: Spark keeps
        first-seen order, DuckDB returns hash order — only the
        array_sort-wrapped spelling is portable."""
    q = "SELECT (ARRAY[10,20,30])[1] AS v"
    assert fe.sql(q).collect()[0].v == 20     # Spark: 0-based → 2nd
    assert duck.sql(q).fetchall()[0][0] == 10  # DuckDB: 1-based → 1st
    q2 = "SELECT array_distinct(ARRAY[3,1,2]) AS d"
    assert list(fe.sql(q2).collect()[0].d) == [3, 1, 2]  # first-seen
    # DuckDB's order is an implementation detail — assert only that it
    # is a permutation, which is exactly why the bare form is not
    # portable
    assert sorted(duck.sql(q2).fetchall()[0][0]) == [1, 2, 3]


# ---------------------------------------------------------------------
# batch 19 (r12): regexp / string-position / date-construction shared
# surface, probed over 38 candidate spellings first. TWO more
# divergences pinned below (test_regexp_dow_divergences_pinned):
# regexp_replace replaces ALL matches on Spark but only the FIRST on
# DuckDB (PG semantics — the classic silent data-mangler), and
# day-of-week numbering is off by one (Spark Sunday=1 via dayofweek /
# DOW Sunday-as-6-vs-5 grid; DuckDB Sunday=0).
CORPUS19 = [
    # 1 regexp_extract agrees, including group selection and whole-match
    """SELECT regexp_extract('foo123bar', '[0-9]+', 0) AS whole,
              regexp_extract('a1b2', '([a-z])([0-9])', 2) AS grp,
              regexp_extract('abc', '[0-9]+', 0) AS miss""",
    # 2 LIKE / ILIKE over data
    """SELECT COUNT(*) FILTER (WHERE p_type LIKE '%BRASS') AS brass,
              COUNT(*) FILTER (WHERE p_name ILIKE '%BLUE%') AS blue
       FROM part""",
    # 3 substring FROM/FOR + negative start
    """SELECT substring('abcdef' FROM 2 FOR 3) AS mid,
              substring('abcdef', -2) AS tail_2,
              substring(r_name, 1, 3) AS pre
       FROM region ORDER BY r_name""",
    # 4 left/right/ascii/chr round trips
    """SELECT left(n_name, 2) AS l2, right(n_name, 2) AS r2,
              chr(ascii(n_name)) AS first_ch
       FROM nation ORDER BY n_name LIMIT 5""",
    # 5 bit_length vs character data
    """SELECT bit_length('ab') AS bl, bit_length('') AS empty""",
    # 6 printf formatting grid
    """SELECT printf('%d-%s', 7, 'x') AS pf,
              printf('%05d', 42) AS pad,
              printf('%.3f', CAST(2.5 AS DOUBLE)) AS fixed""",
    # 7 date construction agrees including leap day
    """SELECT make_date(1996, 2, 29) AS leap,
              make_timestamp(1996, 2, 29, 12, 30, 45.0) AS ts""",
    # 8 date_add positional form
    """SELECT date_add(DATE '1996-01-01', 30) AS plus30,
              date_add(DATE '1996-01-01', -1) AS minus1""",
    # 9 regexp_extract applied per-row with grouping
    """SELECT regexp_extract(p_type, '^[A-Z]+', 0) AS first_word,
              COUNT(*) AS n
       FROM part GROUP BY regexp_extract(p_type, '^[A-Z]+', 0)
       ORDER BY first_word""",
    # 10 md5 digests agree byte-for-byte
    """SELECT md5('') AS empty, md5('abc') AS abc,
              COUNT(DISTINCT md5(p_name)) = COUNT(DISTINCT p_name) AS injective
       FROM part""",
]


@pytest.mark.parametrize("i", range(len(CORPUS19)))
def test_breadth_shape_batch19(fe, duck, i):
    sql = CORPUS19[i]
    assert_matches_oracle(fe.sql(sql), duck, sql)


def test_regexp_dow_divergences_pinned(fe, duck):
    """Batch-19 probe divergences, pinned against each engine's own
    behavior:
    (1) regexp_replace: Spark replaces EVERY match (Java semantics),
        DuckDB replaces only the FIRST (PG semantics, 'g' flag needed)
        — identical text silently mangles data differently;
    (2) day-of-week: Spark's dayofweek()/EXTRACT(DOW) count Sunday=1
        (so 1996-03-15, a Friday, is 6), DuckDB counts Sunday=0 (so
        the same Friday is 5). EXTRACT(ISODOW)/date_part('isodow') is
        DuckDB-only; Spark's portable ISO spelling is
        weekday(d) + 1."""
    q = "SELECT regexp_replace('aaa', 'a', 'b') AS r"
    assert fe.sql(q).collect()[0].r == "bbb"          # Spark: global
    assert duck.sql(q).fetchall()[0][0] == "baa"       # DuckDB: first
    q2 = "SELECT EXTRACT(DOW FROM DATE '1996-03-15') AS d"
    assert fe.sql(q2).collect()[0].d == 6              # Sunday=1 grid
    assert duck.sql(q2).fetchall()[0][0] == 5          # Sunday=0 grid


# ---------------------------------------------------------------------
# batch 20 (r12): window-function edge semantics over data, probed
# first. The probe's headline divergence: the DEFAULT null position in
# window ORDER BY differs (Spark ascending = NULLS FIRST, DuckDB
# ascending = NULLS LAST), so rank/percent_rank/cume_dist/dense_rank
# over a nullable key silently disagree — pinned in
# test_window_null_order_divergence_pinned; every ranking shape below
# spells the null position explicitly, which is the portable form.
# EXCLUDE / GROUPS frames and IGNORE NULLS remain engine-specific
# syntax (the repo emulates EXCLUDE; z37/q68 are the driver rows).
CORPUS20 = [
    # 1 ranking family with explicit NULLS ordering over a nullable key
    """SELECT c_custkey,
              dense_rank() OVER (ORDER BY c_mktsegment NULLS FIRST) AS dr,
              ROUND(percent_rank() OVER (ORDER BY c_acctbal NULLS FIRST), 6)
                AS pr
       FROM customer WHERE c_custkey <= 20 ORDER BY c_custkey""",
    # 2 ntile bucket boundaries
    """SELECT bucket, COUNT(*) AS n, MIN(o_orderkey) AS lo FROM (
         SELECT o_orderkey, ntile(7) OVER (ORDER BY o_orderkey) AS bucket
         FROM orders) t GROUP BY bucket ORDER BY bucket""",
    # 3 lead/lag with defaults and offsets across a partition edge
    """SELECT o_custkey, o_orderkey,
              lag(o_orderkey, 1, -1) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderkey) AS prev_ok,
              lead(o_orderkey, 2) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderkey) AS next2
       FROM orders WHERE o_custkey <= 10 ORDER BY o_custkey, o_orderkey""",
    # 4 sliding ROWS frame with both edges bounded
    """SELECT o_orderkey,
              ROUND(AVG(o_totalprice) OVER (ORDER BY o_orderkey
                    ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), 4) AS ma5
       FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""",
    # 5 RANGE frame over a numeric key (peers by value distance)
    """SELECT o_orderkey,
              COUNT(*) OVER (ORDER BY o_totalprice
                    RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING)
                AS near_peers
       FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""",
    # 6 nth_value within a running frame + first_value on a bounded one
    """SELECT o_orderkey,
              nth_value(o_totalprice, 3) OVER (ORDER BY o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third,
              first_value(o_totalprice) OVER (ORDER BY o_orderkey
                    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS fv
       FROM orders WHERE o_orderkey < 60 ORDER BY o_orderkey""",
    # 7 named WINDOW clause reused by two calls
    """SELECT o_orderkey,
              ROUND(SUM(o_totalprice) OVER w, 2) AS run_sum,
              COUNT(*) OVER w AS run_n
       FROM orders WHERE o_orderkey < 100
       WINDOW w AS (ORDER BY o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       ORDER BY o_orderkey""",
    # 8 window over a grouped aggregate (two evaluation levels)
    """SELECT o_orderpriority,
              rank() OVER (ORDER BY SUM(o_totalprice) DESC NULLS LAST) AS rk
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    # 9 cume_dist with the explicit-NULLS portable spelling
    """SELECT n_name,
              ROUND(cume_dist() OVER (ORDER BY n_regionkey NULLS LAST,
                                      n_name), 6) AS cd
       FROM nation ORDER BY n_name""",
    # 10 partition pruned to a single row: frames degenerate cleanly
    """SELECT o_orderkey,
              SUM(o_totalprice) OVER (PARTITION BY o_orderkey) AS self_sum,
              row_number() OVER (PARTITION BY o_orderkey
                                 ORDER BY o_orderkey) AS rn1
       FROM orders WHERE o_orderkey IN (7, 32) ORDER BY o_orderkey""",
]


@pytest.mark.parametrize("i", range(len(CORPUS20)))
def test_breadth_shape_batch20(fe, duck, i):
    sql = CORPUS20[i]
    assert_matches_oracle(fe.sql(sql), duck, sql)


def test_window_null_order_divergence_pinned(fe, duck):
    """Batch-20 probe divergence: the DEFAULT null position in window
    ORDER BY — Spark ascending sorts NULLS FIRST, DuckDB NULLS LAST —
    so identical unqualified ranking text disagrees whenever the sort
    key is nullable. Pinned against each engine's own result; the
    portable spelling adds NULLS FIRST/LAST explicitly (as every
    ranking shape in CORPUS20 does)."""
    q = ("SELECT i, dense_rank() OVER (ORDER BY v) AS dr FROM (SELECT "
         "* FROM (VALUES (1, 10.0), (2, NULL)) AS t(i, v)) t")
    s = {r.i: r.dr for r in fe.sql(q).collect()}
    d = dict(duck.sql(q).fetchall())
    assert s == {1: 2, 2: 1}   # Spark: NULL ranks first
    assert d == {1: 1, 2: 2}   # DuckDB: NULL ranks last


# ---------------------------------------------------------------------
# batch 21 (r12): query-structure edges — GROUP BY ALL, star
# EXCLUDE/REPLACE through the frontend vs DuckDB's native forms,
# chained/recursive CTEs, set-op type coercion and LIMIT binding,
# scalar-subquery arithmetic, DISTINCT ON, quantified HAVING, the
# standard empty grouping set (GROUP BY () — Spark's parser lacks it;
# since r13 the frontend lowers it by DROPPING the clause: the r12
# GROUPING SETS (()) spelling returned zero rows on EMPTY input where
# the standard requires one grand-total row), and TRY_CAST.
# Probed over 20 candidates; everything below agrees engine-to-engine.
CORPUS21 = [
    # 1 GROUP BY ALL infers the grouping keys from the select list
    """SELECT n_regionkey, COUNT(*) AS n FROM nation GROUP BY ALL
       ORDER BY n_regionkey""",
    # 2 star EXCLUDE drops a column on both engines
    """SELECT * EXCLUDE (r_regionkey) FROM region ORDER BY r_name""",
    # 3 star REPLACE rewrites in place, keeping position and name
    """SELECT * REPLACE (upper(r_name) AS r_name) FROM region
       ORDER BY r_name""",
    # 4 chained CTEs referencing earlier CTEs
    """WITH t AS (SELECT n_regionkey AS k FROM nation),
            u AS (SELECT k FROM t WHERE k > 2)
       SELECT k, COUNT(*) AS n FROM u GROUP BY k ORDER BY k""",
    # 5 WITH RECURSIVE arithmetic series
    """WITH RECURSIVE s(x) AS (
         SELECT 1 UNION ALL SELECT x + 1 FROM s WHERE x < 10)
       SELECT SUM(x) AS tot, COUNT(*) AS n FROM s""",
    # 6 UNION coerces int with decimal identically
    """SELECT 1 AS a UNION SELECT 1.5 ORDER BY a""",
    # 7 LIMIT/OFFSET inside vs outside parenthesized set ops
    """(SELECT r_name FROM region ORDER BY r_name LIMIT 2)
       UNION ALL
       (SELECT r_name FROM region ORDER BY r_name DESC LIMIT 1)
       ORDER BY r_name""",
    # 8 scalar subqueries compose arithmetically
    """SELECT (SELECT COUNT(*) FROM nation) +
              (SELECT COUNT(*) FROM region) AS tot,
              (SELECT MAX(r_name) FROM region) AS last_region""",
    # 9 standard EMPTY grouping set: one grand-total group
    """SELECT COUNT(*) AS n, ROUND(SUM(n_regionkey), 1) AS s
       FROM nation GROUP BY ()""",
    # 9b EMPTY grouping set over EMPTY input: still exactly one row,
    # COUNT(*)=0 (the r12 judge repro)
    """SELECT COUNT(*) AS n, SUM(n_regionkey) AS s
       FROM nation WHERE n_nationkey < 0 GROUP BY ()""",
    # 9c same composed with HAVING on the empty grand total
    """SELECT COUNT(*) AS n FROM nation WHERE n_nationkey < 0
       GROUP BY () HAVING COUNT(*) = 0""",
    # 10 DISTINCT ON picks the first row per group under the sort
    """SELECT DISTINCT ON (n_regionkey) n_regionkey, n_name
       FROM nation ORDER BY n_regionkey, n_name""",
    # 11 quantified comparison in HAVING over grouped counts
    """SELECT n_regionkey, COUNT(*) AS n FROM nation GROUP BY n_regionkey
       HAVING COUNT(*) >= ALL (SELECT COUNT(*) FROM nation
                               GROUP BY n_regionkey)
       ORDER BY n_regionkey""",
    # 12 TRY_CAST degrades to NULL identically
    """SELECT TRY_CAST('abc' AS INT) AS bad, TRY_CAST('7' AS INT) AS ok,
              TRY_CAST('1996-02-30' AS DATE) AS bad_date""",
    # 13 VALUES with an alias list (the DEFAULT column names diverge:
    #    Spark col1/col2, DuckDB col0/col1 — aliasing is the portable
    #    spelling)
    """SELECT * FROM (VALUES (2, 'b'), (1, 'a')) AS t(k, v)
       ORDER BY k""",
    # 14 simple CASE (value-match form) with fallthrough
    """SELECT r_name,
              CASE r_regionkey WHEN 0 THEN 'zero' WHEN 1 THEN 'one'
                   ELSE 'rest' END AS tag
       FROM region ORDER BY r_name""",
]


@pytest.mark.parametrize("i", range(len(CORPUS21)))
def test_breadth_shape_batch21(fe, duck, i):
    sql = CORPUS21[i]
    assert_matches_oracle(fe.sql(sql), duck, sql)


# ---------------------------------------------------------------------
# batch 22 (r12): arithmetic / comparison / correlation edges. The
# probe's divergences are pinned in test_arith_divergences_pinned —
# headlined by `^`, which is bitwise XOR on Spark but POWER on DuckDB
# (2 ^ 3 = 1 vs 8.0: silently different values from identical text,
# the nastiest class in the corpus so far), plus the ANSI split on
# division by zero (Spark 4 raises, DuckDB returns NULL) and
# DATE − DATE typing (INTERVAL vs integer days). The shapes below are
# the probed agreeing core.
CORPUS22 = [
    # 1 decimal vs double equality typing — BOTH engines make the
    #   decimal sum exact and the double sum inexact
    """SELECT 0.1 + 0.2 = 0.3 AS dec_eq,
              CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE)
                = CAST(0.3 AS DOUBLE) AS dbl_eq""",
    # 2 string-number comparison coerces numerically (leading zeros;
    #   a DECIMAL-looking string like '10.0' is a pinned divergence —
    #   Spark's ANSI cast to BIGINT raises, DuckDB compares TRUE)
    """SELECT '10' = 10 AS s10, '0010' = 10 AS padded""",
    # 3 portable division guards: NULLIF denominator
    """SELECT o_orderstatus,
              ROUND(SUM(o_totalprice) /
                    NULLIF(COUNT(*) - COUNT(*), 0), 2) AS div_guarded
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    # 4 empty-set aggregates: SUM NULL, COUNT 0, aggregate HAVING
    """SELECT SUM(x) AS s, COUNT(x) AS n, MAX(x) AS mx
       FROM (SELECT 1 AS x WHERE FALSE) t""",
    # 5 HAVING without GROUP BY = one conditional grand-total row
    """SELECT COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS s
       FROM orders HAVING COUNT(*) > 0""",
    # 6 binary (case-sensitive) string comparison and MIN/MAX
    """SELECT 'a' < 'B' AS lower_after_upper,
              MAX(r_name) AS mx, MIN(r_name) AS mn FROM region""",
    # 7 three-valued IS [NOT] DISTINCT FROM grid
    """SELECT NULL = NULL AS eq_null,
              NULL IS NOT DISTINCT FROM NULL AS both_null,
              1 IS DISTINCT FROM NULL AS one_vs_null,
              1 IS NOT DISTINCT FROM 1 AS same""",
    # 8 correlated EXISTS against the hierarchy
    """SELECT r_name FROM region
       WHERE EXISTS (SELECT 1 FROM nation
                     WHERE n_regionkey = r_regionkey AND n_nationkey > 20)
       ORDER BY r_name""",
    # 9 scalar subquery inside HAVING
    """SELECT o_orderstatus, ROUND(SUM(o_totalprice), 2) AS s
       FROM orders GROUP BY o_orderstatus
       HAVING SUM(o_totalprice) > (SELECT 0.2 * SUM(o_totalprice)
                                   FROM orders)
       ORDER BY o_orderstatus""",
    # 10 correlated scalar subquery in WHERE (the decorrelation shape)
    """SELECT c_name FROM customer c
       WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                          WHERE c_nationkey = c.c_nationkey)
         AND c_custkey <= 20
       ORDER BY c_name""",
    # 11 interval comparison + special double values
    """SELECT INTERVAL 2 DAY > INTERVAL 1 DAY AS iv,
              CAST('inf' AS DOUBLE) > 1e308 AS is_inf,
              abs(-0.0) = 0.0 AS negzero""",
    # 12 bit shifts agree (unlike ^, which is pinned as divergent)
    """SELECT 1 << 3 AS shl, 16 >> 2 AS shr, 1 << 0 AS ident""",
]


@pytest.mark.parametrize("i", range(len(CORPUS22)))
def test_breadth_shape_batch22(fe, duck, i):
    sql = CORPUS22[i]
    assert_matches_oracle(fe.sql(sql), duck, sql)


def test_arith_divergences_pinned(fe, duck):
    """Batch-22 probe divergences, pinned against each engine's own
    behavior:
    (1) `^` is BITWISE XOR on Spark and POWER on DuckDB — identical
        text computes different VALUES with no error anywhere;
    (2) division/modulo by zero: Spark 4 (ANSI) raises, DuckDB
        returns NULL — portable code guards with NULLIF/try_divide;
    (3) DATE − DATE returns an INTERVAL on Spark and an integer day
        count on DuckDB (the portable spelling is datediff/date_diff
        per engine, or EXTRACT over the difference);
    (4) sqrt(-1): Spark NaN, DuckDB raises; ln(0): Spark NULL,
        DuckDB raises."""
    import math
    import pytest as _pytest

    q = "SELECT 2 ^ 3 AS v"
    assert fe.sql(q).collect()[0].v == 1          # XOR
    assert duck.sql(q).fetchall()[0][0] == 8.0    # POWER
    with _pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        fe.sql("SELECT 1 / 0 AS d").collect()
    assert duck.sql("SELECT 1 / 0 AS d").fetchall()[0][0] is None
    import datetime

    q3 = "SELECT DATE '1996-03-15' - DATE '1996-03-10' AS d"
    assert fe.sql(q3).collect()[0].d == datetime.timedelta(days=5)
    assert duck.sql(q3).fetchall()[0][0] == 5
    assert math.isnan(fe.sql("SELECT sqrt(-1) AS s").collect()[0].s)
    with _pytest.raises(Exception):
        duck.sql("SELECT sqrt(-1) AS s").fetchall()
    # (5) decimal-looking string vs integer: Spark's ANSI cast to
    # BIGINT raises on '10.0', DuckDB coerces and compares TRUE
    with _pytest.raises(Exception, match="CAST_INVALID_INPUT"):
        fe.sql("SELECT '10.0' = 10 AS x").collect()
    assert duck.sql("SELECT '10.0' = 10 AS x").fetchall()[0][0] is True


# ---------------------------------------------------------------------
# batch 23 (r12): aggregate/scalar NULL-handling tails. Shared core:
# concat_ws skips NULLs on both engines, max_by/min_by and
# mode() WITHIN GROUP agree over data, coalesce unifies mixed numeric
# types identically. Pinned divergence: variadic concat() PROPAGATES a
# NULL argument on Spark but SKIPS it on DuckDB ('a'||NULL||'b' is the
# agreeing propagating spelling — batch 17 pinned it). Name gaps (not
# value divergences): ordered string aggregation is string_agg(x, sep
# ORDER BY ...) on DuckDB vs listagg(x, sep) WITHIN GROUP on Spark —
# the frontend's LISTAGG lowering owns the Spark side (z62 driver row).
CORPUS23 = [
    # 1 concat_ws: separator-joined, NULLs skipped, on both engines
    """SELECT concat_ws('-', 'a', NULL, 'b') AS cw,
              concat_ws('/', NULL, NULL) AS all_null""",
    # 2 coalesce type unification across int/decimal
    """SELECT coalesce(NULL, 2, 3.5) AS co, nullif(3, 3.0) AS nf,
              greatest(NULL, NULL) AS g_all_null""",
    # 3 max_by/min_by over the hierarchy
    """SELECT n_regionkey,
              max_by(n_name, n_nationkey) AS newest,
              min_by(n_name, n_nationkey) AS oldest
       FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    # 4 mode() WITHIN GROUP (ORDER BY ...) — the inverse-distribution
    #   spelling both engines take
    """SELECT o_orderstatus,
              mode() WITHIN GROUP (ORDER BY o_orderpriority) AS common_prio
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    # 5 max_by ties broken by the ordering value, not row order:
    #   aggregate over a deterministic single-winner grid
    """SELECT max_by(n_name, n_nationkey * 2) AS doubled_winner,
              max_by(n_nationkey, n_name) AS by_name
       FROM nation""",
]


@pytest.mark.parametrize("i", range(len(CORPUS23)))
def test_breadth_shape_batch23(fe, duck, i):
    sql = CORPUS23[i]
    assert_matches_oracle(fe.sql(sql), duck, sql)


def test_concat_null_divergence_pinned(fe, duck):
    """Batch-23 probe divergence: variadic concat() PROPAGATES NULL on
    Spark (SQL-standard ||-like) but SKIPS NULLs on DuckDB (PG's
    concat) — identical text, different values. concat_ws and the ||
    operator are the portable spellings (each agrees with itself
    across engines)."""
    q = "SELECT concat('a', NULL, 'b') AS c"
    assert fe.sql(q).collect()[0].c is None
    assert duck.sql(q).fetchall()[0][0] == "ab"


# ---------------------------------------------------------------------
# batch 24 (r12): grouping-sets fine structure + set-op NULL identity
# — correctness-critical for the repo's groupSets-from-tiles tier, so
# the cross-engine agreement is pinned over data: GROUPING_ID bit
# ORDER (leftmost argument = most significant bit on both engines),
# duplicate grouping sets produce duplicate result rows (bag
# semantics, both), and set-op NULL identity (NULLs are equal for
# UNION/INTERSECT/EXCEPT dedup, unlike in comparisons).
CORPUS24 = [
    # 1 GROUPING_ID bit order across the full CUBE lattice
    """SELECT GROUPING_ID(n_regionkey, n_name) AS gid,
              GROUPING(n_regionkey) AS g_hi, GROUPING(n_name) AS g_lo,
              COUNT(*) AS n
       FROM nation GROUP BY CUBE (n_regionkey, n_name)
       ORDER BY gid, n""",
    # 2 explicit GROUPING SETS incl. the empty set, labeled
    """SELECT GROUPING(n_regionkey) AS g1, GROUPING(n_name) AS g2,
              COUNT(*) AS n
       FROM nation GROUP BY GROUPING SETS ((n_regionkey), (n_name), ())
       ORDER BY g1, g2, n""",
    # 3 DUPLICATE grouping sets double their rows (bag semantics)
    """SELECT n_regionkey, COUNT(*) AS n FROM nation
       GROUP BY GROUPING SETS ((n_regionkey), (n_regionkey))
       ORDER BY n_regionkey""",
    # 4 ROLLUP over an expression key plus a plain key
    """SELECT n_regionkey % 2 AS par, COUNT(*) AS n FROM nation
       GROUP BY ROLLUP (n_regionkey % 2)
       ORDER BY par NULLS FIRST""",
    # 5 NULL identity in set-op dedup: one NULL row survives UNION,
    #   INTERSECT keeps it, EXCEPT removes it
    """SELECT COUNT(*) AS union_rows FROM (
         SELECT CAST(NULL AS INT) AS x UNION SELECT NULL UNION SELECT 1) t""",
    # 6 INTERSECT/EXCEPT treat NULL = NULL for membership
    """SELECT
         (SELECT COUNT(*) FROM (
            SELECT CAST(NULL AS INT) AS x INTERSECT
            SELECT CAST(NULL AS INT)) a) AS i_null,
         (SELECT COUNT(*) FROM (
            SELECT CAST(NULL AS INT) AS x EXCEPT
            SELECT CAST(NULL AS INT)) b) AS e_null""",
]


@pytest.mark.parametrize("i", range(len(CORPUS24)))
def test_breadth_shape_batch24(fe, duck, i):
    sql = CORPUS24[i]
    assert_matches_oracle(fe.sql(sql), duck, sql)


# batch 26 (r13): EXTRACT-family time groupings — the grouping-side
# twin of the r13 tile-derivation tier, run as plain frontend
# lowerings vs DuckDB. Both spellings (EXTRACT(F FROM col) and
# f(col)), composition with range filters / HAVING / ROLLUP /
# arithmetic, and the field functions that agree engine-to-engine
# (dayofweek is EXCLUDED: Spark is 1=Sunday, DuckDB/PG 0=Sunday —
# the known indexing divergence the derivation tier sidesteps by
# re-applying the query's own spelling).
CORPUS26 = [
    # 1 EXTRACT(YEAR) grouping
    """SELECT EXTRACT(YEAR FROM o_orderdate) AS yr, COUNT(*) AS n
       FROM orders GROUP BY EXTRACT(YEAR FROM o_orderdate) ORDER BY yr""",
    # 2 function spelling, same grouping
    """SELECT year(o_orderdate) AS yr, ROUND(SUM(o_totalprice), 2) AS s
       FROM orders GROUP BY year(o_orderdate) ORDER BY yr""",
    # 3 two fields of one column group together
    """SELECT year(o_orderdate) AS yr, quarter(o_orderdate) AS q,
              COUNT(*) AS n
       FROM orders GROUP BY year(o_orderdate), quarter(o_orderdate)
       ORDER BY yr, q""",
    # 4 EXTRACT composed with a raw date range filter
    """SELECT EXTRACT(MONTH FROM o_orderdate) AS mo, COUNT(*) AS n
       FROM orders
       WHERE o_orderdate >= DATE '1995-03-15' AND o_orderdate < DATE '1996-11-20'
       GROUP BY EXTRACT(MONTH FROM o_orderdate) ORDER BY mo""",
    # 5 EXTRACT in WHERE (the Sarg side), trunc-free grouping
    """SELECT o_orderpriority, COUNT(*) AS n FROM orders
       WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
       GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    # 6 HAVING over an EXTRACT grouping
    """SELECT year(o_orderdate) AS yr, COUNT(*) AS n
       FROM orders GROUP BY year(o_orderdate)
       HAVING COUNT(*) > 200 ORDER BY yr""",
    # 7 ROLLUP over a year key
    """SELECT year(o_orderdate) AS yr, COUNT(*) AS n
       FROM orders GROUP BY ROLLUP (year(o_orderdate))
       ORDER BY yr NULLS FIRST""",
    # 8 arithmetic on the extracted field
    """SELECT year(o_orderdate) - 1990 AS offs, COUNT(*) AS n
       FROM orders GROUP BY year(o_orderdate) - 1990 ORDER BY offs""",
    # 9 dayofyear / weekofyear agree engine-to-engine
    """SELECT dayofyear(o_orderdate) AS dy, COUNT(*) AS n
       FROM orders WHERE o_orderdate >= DATE '1997-01-01'
         AND o_orderdate < DATE '1997-02-01'
       GROUP BY dayofyear(o_orderdate) ORDER BY dy""",
    # 10 ISO week numbers
    """SELECT weekofyear(o_orderdate) AS wk, COUNT(*) AS n
       FROM orders WHERE o_orderdate >= DATE '1996-06-01'
         AND o_orderdate < DATE '1996-09-01'
       GROUP BY weekofyear(o_orderdate) ORDER BY wk""",
    # 11 EXTRACT inside CASE inside an aggregate
    """SELECT o_orderstatus,
              SUM(CASE WHEN EXTRACT(QUARTER FROM o_orderdate) = 4
                       THEN 1 ELSE 0 END) AS q4_orders
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    # 12 year-month pair via both spellings joined in one query
    """SELECT a.yr, a.n AS n_extract, b.n AS n_fn FROM
         (SELECT EXTRACT(YEAR FROM o_orderdate) AS yr, COUNT(*) AS n
          FROM orders GROUP BY EXTRACT(YEAR FROM o_orderdate)) a
       JOIN
         (SELECT year(o_orderdate) AS yr, COUNT(*) AS n
          FROM orders GROUP BY year(o_orderdate)) b
       ON a.yr = b.yr ORDER BY a.yr""",
]


@pytest.mark.parametrize("i", range(len(CORPUS26)))
def test_breadth_shape_batch26(fe, duck, i):
    sql = CORPUS26[i]
    assert_matches_oracle(fe.sql(sql), duck, sql)
