"""WITHIN DISTINCT ≈ SqlStdOperatorTable.WITHIN_DISTINCT:221 expanded by
rel/rules/AggregateExpandWithinDistinctRule.java: `AGG(x) WITHIN
DISTINCT (d)` aggregates one value of x per distinct d (x must be
functionally dependent on d within the group — Calcite optionally
asserts uniformity; we expose the same check).

Expansion = the rule's two-level aggregate:
  inner: GROUP BY keys, d → any_value(x)   [assert_uniform: min(x), max(x)]
  outer: GROUP BY keys → AGG(inner_x)      [assert_uniform:
                                            AGG(IF(mn <=> mx, mn, raise_error))]
Two map-side-combinable hash aggregates — the same shuffle count as a
plain distinct-aggregate at 100 TB. The uniformity assertion is part of
the SAME plan (Calcite's THROW lowered as raise_error, mirroring the SQL
frontend's expansion) — not a separate eager probe, which would execute
the input pipeline twice per run.
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
        if assert_uniform:
            # Calcite's THROW is embedded in the PLAN (same form the SQL
            # frontend's _expand_within_distinct emits): inner keeps
            # MIN/MAX per (keys, d), the outer aggregate raises on the
            # first non-uniform group it evaluates. r14: the previous
            # eager `.filter(viol).count()` probe executed the whole
            # join+aggregate pipeline a SECOND time per run just to
            # check uniformity — one full extra pass at any scale.
            inner_aggs.append(F.expr(f"min({val})").alias(f"__wd_mn_{alias}"))
            inner_aggs.append(F.expr(f"max({val})").alias(f"__wd_mx_{alias}"))
        else:
            inner_aggs.append(F.expr(f"any_value({val})").alias(f"__wd_{alias}"))
    inner = df.groupBy(*group_keys, *distinct_keys).agg(*inner_aggs)
    outer_aggs = []
    for fn, val, dk, alias in calls:
        if assert_uniform:
            outer_aggs.append(
                F.expr(
                    f"{fn}(IF(__wd_mn_{alias} <=> __wd_mx_{alias}, "
                    f"__wd_mn_{alias}, raise_error('WITHIN DISTINCT: "
                    "aggregated value is not functionally dependent on "
                    "the distinct key')))"
                ).alias(alias)
            )
        else:
            outer_aggs.append(F.expr(f"{fn}(__wd_{alias})").alias(alias))
    return inner.groupBy(*group_keys).agg(*outer_aggs)
