"""ConditionalCorrelate ≈ rel/core/ConditionalCorrelate.java:44 — a
LEFT_MARK correlate that RETAINS a condition which can be neither pulled
up nor pushed down (produced by FILTER_SUB_QUERY_TO_MARK_CORRELATE /
PROJECT_SUB_QUERY_TO_MARK_CORRELATE when de-subquerying SOME/IN).

Semantics: output = every left row + one boolean `mark` column with the
quantified-comparison three-valued logic over the correlated right rows:

    TRUE   — some right row satisfies the condition
    NULL   — none satisfies, but at least one comparison is UNKNOWN
             (or the condition can never be decided)
    FALSE  — no matching right rows at all, or all comparisons FALSE

Spark-first lowering (no per-row subquery execution): one left-outer
equi-join on the correlation key, then a per-left-row aggregate folding
the 3VL — `max(cond is true)` / `max(cond is null)` — so the whole
operator is one shuffle join + one map-side-combinable aggregation;
broadcast applies when the right side is small. This survives 100 TB the
same way any keyed join does; skew on the correlation key is handled by
AQE like every other join here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_ID = "__mark_row_id"


def conditional_mark_correlate(
    left: DataFrame,
    right: DataFrame,
    on: str,
    condition: str,
    mark_col: str = "mark",
) -> DataFrame:
    """left + `mark_col` per the LEFT_MARK 3VL above.

    `on`: correlation predicate joining left and right (typically the
    correlated equality the subquery carried); `condition`: the retained
    comparison over left+right columns (e.g. ``c_acctbal > amt``).
    Column names must be disjoint between the two sides (rename first —
    same contract as ir.Join).
    """
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"rename overlapping columns first: {sorted(overlap)}")

    lid = left.withColumn(_ID, F.monotonically_increasing_id())
    joined = lid.join(right, F.expr(on), "left")
    per_row = joined.groupBy(_ID, *[F.col(c) for c in left.columns]).agg(
        F.max(F.expr(f"({condition}) IS TRUE")).alias("__any_true"),
        F.max(F.expr(f"({condition}) IS NULL AND {_matched(right)}")).alias("__any_unknown"),
    )
    mark = (
        F.when(F.col("__any_true"), F.lit(True))
        .when(F.col("__any_unknown"), F.lit(None).cast("boolean"))
        .otherwise(F.lit(False))
    )
    return per_row.withColumn(mark_col, mark).select(*left.columns, mark_col)


def _matched(right: DataFrame) -> str:
    """Post-left-join 'right row present' test: any right column non-null
    is sufficient; an all-null right ROW is indistinguishable from a
    non-match (same limitation Spark's own null-aware joins document).
    Checks every right column so a single null field can't fake a miss."""
    return "(" + " OR ".join(f"{c} IS NOT NULL" for c in right.columns) + ")"
