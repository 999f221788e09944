"""Window-function queries (SURVEY.md §2.5) ≈ rel/core/Window.java:79 +
RexOver/RexWindowBound — ranking, analytic, ROWS/RANGE frames, lead/lag.
Every OVER clause orders by a unique key suffix so results are
deterministic (Calcite's SqlOperatorTest does the same for RANK tests).
"""

from __future__ import annotations

from calcite_spark.plans.builder import RelBuilder
from calcite_spark.queries.inventory import catalog_for, register


def _b(spark, sf_dir) -> RelBuilder:
    return RelBuilder(catalog_for(spark, sf_dir))


@register(
    "z30_window_rank_topn",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rk FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk
      FROM orders
    ) WHERE rk <= 3 AND c_custkey <= 200
    ORDER BY c_custkey, rk
    """,
    tags=("window", "rank", "topn"),
)
def z30_window_rank_topn(spark, sf_dir):
    """Top-N per group: row_number OVER partition — ProjectToWindowRule
    (RexOver → Window) then filter ≈ the classic top-K-per-key pattern."""
    # r14: rename BEFORE the window and partition by the alias — with the
    # rename inside the window projection the filter's c_custkey <= 200
    # was a different attribute than the window's o_custkey partition
    # key, so Catalyst could not push it below the Window and the rank
    # ran over ALL customers (before-plan: no custkey in PushedFilters);
    # partitioning on the alias itself lets the predicate reach the scan.
    return (
        _b(spark, sf_dir)
        .scan("orders")
        .project("o_custkey AS c_custkey", "o_orderkey", "o_totalprice")
        .window(
            [
                "CAST(row_number() OVER (PARTITION BY c_custkey "
                "ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk"
            ],
            keep=("c_custkey", "o_orderkey", "o_totalprice"),
        )
        .filter("rk <= 3 AND c_custkey <= 200")
        .sort("c_custkey", "rk")
        .to_df()
    )


@register(
    "z31_window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 3) AS running_total,
           CAST(COUNT(*) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_count
    FROM orders WHERE o_custkey <= 100
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "frame", "rows"),
)
def z31_window_running_sum(spark, sf_dir):
    """ROWS frame running aggregate (RexWindowBound UNBOUNDED→CURRENT)."""
    return (
        _b(spark, sf_dir)
        .scan("orders")
        .filter("o_custkey <= 100")
        .window(
            [
                "ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey "
                "ORDER BY o_orderdate, o_orderkey "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 3) AS running_total",
                "CAST(COUNT(*) OVER (PARTITION BY o_custkey "
                "ORDER BY o_orderdate, o_orderkey "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_count",
            ],
            keep=("o_custkey", "o_orderkey"),
        )
        .sort("o_custkey", "o_orderkey")
        .to_df()
    )


# z32_window_sliding_frame retired from the registry in r13 (the r12
# verdict's rotation arithmetic: 50 r10-green + owed qx59..qx63 = 55
# claims on 50 slots — pre-receipted candidate #2 at inventory.py's
# r13 window plan). Receipts, re-verified before removal:
# z31_window_running_sum (UNBOUNDED PRECEDING ROWS frame) and
# z33_window_range_frame (RANGE frame) remain driver rows in the r13
# window through the SAME .window() builder lowering, the bounded
# ROWS-frame grid (k PRECEDING .. CURRENT ROW and both-sides frames)
# is pinned in the frontend window tests (tests/test_sql_frontend.py)
# and replayed in winagg.iq and the breadth corpus's moving-average
# shapes vs DuckDB every round.


@register(
    "z33_window_range_frame",
    oracle="""
    SELECT s_suppkey, s_acctbal,
           CAST(COUNT(*) OVER (ORDER BY s_acctbal
                 RANGE BETWEEN 500.0 PRECEDING AND 500.0 FOLLOWING) AS BIGINT) AS peers_within_500
    FROM supplier
    ORDER BY s_suppkey
    """,
    tags=("window", "frame", "range"),
)
def z33_window_range_frame(spark, sf_dir):
    """RANGE frame with numeric offsets (value-based peers)."""
    return (
        _b(spark, sf_dir)
        .scan("supplier")
        .window(
            [
                "CAST(COUNT(*) OVER (ORDER BY s_acctbal "
                "RANGE BETWEEN 500.0 PRECEDING AND 500.0 FOLLOWING) AS BIGINT) AS peers_within_500",
            ],
            keep=("s_suppkey", "s_acctbal"),
        )
        .sort("s_suppkey")
        .to_df()
    )


@register(
    "z34_lead_lag",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(o_totalprice - COALESCE(lag(o_totalprice) OVER w, 0.0), 3) AS delta_prev,
           ROUND(COALESCE(lead(o_totalprice) OVER w, 0.0), 3) AS next_price
    FROM orders WHERE o_custkey <= 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "lead", "lag"),
)
def z34_lead_lag(spark, sf_dir):
    """LEAD :1192 / LAG :1198 (SqlStdOperatorTable)."""
    return (
        _b(spark, sf_dir)
        .scan("orders")
        .filter("o_custkey <= 100")
        .window(
            [
                "ROUND(o_totalprice - COALESCE(lag(o_totalprice) OVER (PARTITION BY o_custkey "
                "ORDER BY o_orderdate, o_orderkey), 0.0), 3) AS delta_prev",
                "ROUND(COALESCE(lead(o_totalprice) OVER (PARTITION BY o_custkey "
                "ORDER BY o_orderdate, o_orderkey), 0.0), 3) AS next_price",
            ],
            keep=("o_custkey", "o_orderkey"),
        )
        .sort("o_custkey", "o_orderkey")
        .to_df()
    )


@register(
    "z35_ranking_family",
    oracle="""
    SELECT s_suppkey,
           CAST(rank() OVER w AS INT) AS rnk,
           CAST(dense_rank() OVER w AS INT) AS drnk,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6) AS cdist
    FROM supplier
    WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey)
    ORDER BY s_suppkey
    """,
    tags=("window", "rank", "ntile"),
)
def z35_ranking_family(spark, sf_dir):
    """RANK/DENSE_RANK/NTILE/PERCENT_RANK/CUME_DIST (§2.5 full family)."""
    w = "OVER (ORDER BY s_acctbal DESC, s_suppkey)"
    return (
        _b(spark, sf_dir)
        .scan("supplier")
        .window(
            [
                f"CAST(rank() {w} AS INT) AS rnk",
                f"CAST(dense_rank() {w} AS INT) AS drnk",
                f"CAST(ntile(4) {w} AS INT) AS quartile",
                f"ROUND(percent_rank() {w}, 6) AS pct_rank",
                f"ROUND(cume_dist() {w}, 6) AS cdist",
            ],
            keep=("s_suppkey",),
        )
        .sort("s_suppkey")
        .to_df()
    )


@register(
    "z36_first_last_nth",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_ok,
           last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok,
           nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_ok
    FROM orders WHERE o_custkey <= 60
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "first_value", "nth_value"),
)
def z36_first_last_nth(spark, sf_dir):
    """FIRST_VALUE :1180 / LAST_VALUE :1168 / NTH_VALUE :1186."""
    full = (
        "OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
    )
    return (
        _b(spark, sf_dir)
        .scan("orders")
        .filter("o_custkey <= 60")
        .window(
            [
                "first_value(o_orderkey) OVER (PARTITION BY o_custkey "
                "ORDER BY o_orderdate, o_orderkey) AS first_ok",
                f"last_value(o_orderkey) {full} AS last_ok",
                f"nth_value(o_orderkey, 2) {full} AS second_ok",
            ],
            keep=("o_custkey", "o_orderkey"),
        )
        .sort("o_custkey", "o_orderkey")
        .to_df()
    )


@register(
    "z37_window_exclude_group_ties",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           ROUND(SUM(l_extendedprice) OVER (PARTITION BY l_suppkey ORDER BY l_quantity
                 RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                 EXCLUDE GROUP), 3) AS sum_excl_group,
           ROUND(SUM(l_extendedprice) OVER (PARTITION BY l_suppkey ORDER BY l_quantity
                 RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                 EXCLUDE TIES), 3) AS sum_excl_ties
    FROM lineitem WHERE l_suppkey <= 10
    ORDER BY l_suppkey, l_orderkey, l_linenumber
    """,
    tags=("window", "exclude_group", "exclude_ties"),
)
def z37_window_exclude_group_ties(spark, sf_dir):
    """EXCLUDE GROUP / EXCLUDE TIES (RexWindowExclusion) — Spark has no
    EXCLUDE clause; algebraic emulation over the full-partition frame:
      peers_sum = SUM(x) OVER (... RANGE CURRENT ROW..CURRENT ROW)
      EXCLUDE GROUP = total − peers_sum
      EXCLUDE TIES  = total − peers_sum + x
    DuckDB runs the native clause as the oracle."""
    total = (
        "SUM(l_extendedprice) OVER (PARTITION BY l_suppkey ORDER BY l_quantity "
        "RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
    )
    peers = (
        "SUM(l_extendedprice) OVER (PARTITION BY l_suppkey ORDER BY l_quantity "
        "RANGE BETWEEN CURRENT ROW AND CURRENT ROW)"
    )
    return (
        _b(spark, sf_dir)
        .scan("lineitem")
        .filter("l_suppkey <= 10")
        .window(
            [
                f"ROUND({total} - {peers}, 3) AS sum_excl_group",
                f"ROUND({total} - {peers} + l_extendedprice, 3) AS sum_excl_ties",
            ],
            keep=("l_suppkey", "l_orderkey", "l_linenumber"),
        )
        .sort("l_suppkey", "l_orderkey", "l_linenumber")
        .to_df()
    )
