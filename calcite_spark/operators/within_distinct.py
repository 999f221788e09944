"""WITHIN DISTINCT ≈ SqlStdOperatorTable.WITHIN_DISTINCT:221 expanded by
rel/rules/AggregateExpandWithinDistinctRule.java: `AGG(x) WITHIN
DISTINCT (d)` aggregates one value of x per distinct d (x must be
functionally dependent on d within the group — Calcite optionally
asserts uniformity; we expose the same check).

Expansion = the rule's two-level aggregate:
  inner: GROUP BY keys, d → any_value(x) [+ min/max uniformity check]
  outer: GROUP BY keys → AGG(inner_x)
Two map-side-combinable hash aggregates — the same shuffle count as a
plain distinct-aggregate at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def aggregate_within_distinct(
    df: DataFrame,
    group_keys: list[str],
    calls: list[tuple],  # (agg_fn, value_expr, distinct_key, alias)
    assert_uniform: bool = False,
) -> DataFrame:
    distinct_keys = sorted({c[2] for c in calls})
    inner_aggs = []
    for fn, val, dk, alias in calls:
        inner_aggs.append(F.expr(f"any_value({val})").alias(f"__wd_{alias}"))
        if assert_uniform:
            inner_aggs.append(
                F.expr(
                    f"CASE WHEN min({val}) <=> max({val}) THEN 0 ELSE 1 END"
                ).alias(f"__wd_bad_{alias}")
            )
    inner = df.groupBy(*group_keys, *distinct_keys).agg(*inner_aggs)
    outer_aggs = []
    for fn, val, dk, alias in calls:
        outer_aggs.append(F.expr(f"{fn}(__wd_{alias})").alias(alias))
        if assert_uniform:
            outer_aggs.append(F.expr(f"sum(__wd_bad_{alias})").alias(f"__viol_{alias}"))
    out = inner.groupBy(*group_keys).agg(*outer_aggs)
    if assert_uniform:
        # ≈ Calcite's THROW on non-functional dependence: fail fast
        viol_cols = [f"__viol_{alias}" for _, _, _, alias in calls]
        bad = out.filter(" OR ".join(f"{c} > 0" for c in viol_cols)).limit(1).count()
        if bad:
            raise ValueError(
                "WITHIN DISTINCT: aggregated value is not functionally "
                "dependent on the distinct key"
            )
        out = out.drop(*viol_cols)
    return out
