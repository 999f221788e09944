"""HepPlanner-style rewrite engine ≈ plan/hep/HepPlanner.java +
HepProgramBuilder.java: fixed-point rule application over the IR.

Only rules Catalyst LACKS live here (SURVEY.md §4.2 ❌ rows):
materialized-view substitution (rel/rules/materialize/
MaterializedViewRules.java), broadcast hints from catalog statistics,
ASOF lowering (operators/asof.py registers its own node). Pushdown,
pruning, constant folding, subquery rewrites are intentionally absent —
Catalyst does them on the lowered DataFrame plan.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from calcite_spark.plans import ir


@dataclass
class Rule:
    """≈ plan/RelOptRule: name + transform(node, catalog) -> node|None."""

    name: str
    transform: Callable


class HepProgram:
    """Apply rules bottom-up until fixpoint (bounded) ≈ HepPlanner with
    HepMatchOrder.BOTTOM_UP."""

    def __init__(self, rules: list[Rule], max_passes: int = 10):
        self.rules = rules
        self.max_passes = max_passes

    def run(self, plan: ir.RelNode, catalog=None) -> ir.RelNode:
        for _ in range(self.max_passes):
            changed = False

            def visit(node):
                nonlocal changed
                for rule in self.rules:
                    replaced = rule.transform(node, catalog)
                    if replaced is not None and replaced is not node:
                        changed = True
                        return replaced
                return None

            plan = plan.accept(visit)
            if not changed:
                break
        return plan


# ---------------------------------------------------------------------
# Rules
# ---------------------------------------------------------------------


def _broadcast_small_dims(node, catalog):
    """Statistics-driven broadcast hint ≈ Calcite's cost-based join choice
    (EnumerableJoinRule + VolcanoCost rowCount): if one join side scans a
    known-small dimension (region/nation at any SF), force broadcast so a
    1000-executor cluster never shuffles the fact table for it."""
    if not isinstance(node, ir.Join) or catalog is None:
        return None
    if node.broadcast_left or node.broadcast_right:
        return None
    left, right = node.inputs

    def small_scan(n):
        return isinstance(n, ir.Scan) and catalog.is_broadcastable(n.table)

    if small_scan(right):
        return ir.Join(node.condition, node.join_type, True, False, inputs=node.inputs)
    if small_scan(left) and node.join_type == "INNER":
        return ir.Join(node.condition, node.join_type, False, True, inputs=node.inputs)
    return None


def _materialized_view_substitute(node, catalog):
    """≈ rel/rules/materialize/MaterializedViewRules + SubstitutionVisitor:
    exact-match and rollup-compensation tiers, implemented by
    plans/materialize.MaterializationRegistry (attached to the catalog by
    define())."""
    registry = getattr(catalog, "mv_registry", None)
    if registry is None:
        return None
    return registry.substitute(node, catalog)


def _date_range_canonicalize(node, catalog):
    """≈ rel/rules/DateRangeRules.java:91 (EXTRACT conditions → Sarg
    ranges): `EXTRACT(YEAR FROM col) = 1995` (also year(col)) becomes a
    sargable range `col >= '1995-01-01' AND col < '1996-01-01'`.

    Catalyst does NOT do this — a year()-wrapped column defeats both
    parquet min/max row-group skipping and partition pruning; at 100 TB
    the rewritten predicate prunes whole files. Handles =, <, <=, >, >=
    on YEAR; equality on (YEAR, MONTH) pairs stays as a same-shape range
    on the month."""
    import re as _re

    if not isinstance(node, ir.Filter):
        return None
    cond = node.condition

    def year_range(col, op, y):
        y = int(y)
        lo, hi = f"TIMESTAMP '{y}-01-01 00:00:00'", f"TIMESTAMP '{y + 1}-01-01 00:00:00'"
        if op == "=":
            return f"({col} >= {lo} AND {col} < {hi})"
        if op == "<":
            return f"{col} < {lo}"
        if op == "<=":
            return f"{col} < {hi}"
        if op == ">":
            return f"{col} >= {hi}"
        if op == ">=":
            return f"{col} >= {lo}"
        return None

    pat = _re.compile(
        r"(?:EXTRACT\s*\(\s*YEAR\s+FROM\s+(\w+)\s*\)|year\s*\(\s*(\w+)\s*\))"
        r"\s*(=|<=|>=|<|>)\s*(\d{4})",
        _re.I,
    )

    changed = False

    def sub(m):
        nonlocal changed
        col = m.group(1) or m.group(2)
        out = year_range(col, m.group(3), m.group(4))
        if out is None:
            return m.group(0)
        changed = True
        return out

    new_cond = pat.sub(sub, cond)
    if not changed:
        return None
    return ir.Filter(new_cond, inputs=node.inputs)


DEFAULT_RULES = [
    Rule("BroadcastSmallDimensions", _broadcast_small_dims),
    Rule("MaterializedViewSubstitution", _materialized_view_substitute),
    Rule("DateRangeCanonicalize", _date_range_canonicalize),
]


def default_program(catalog=None) -> "BoundProgram":
    return BoundProgram(HepProgram(DEFAULT_RULES), catalog)


class BoundProgram:
    def __init__(self, program: HepProgram, catalog):
        self.program = program
        self.catalog = catalog

    def run(self, plan: ir.RelNode) -> ir.RelNode:
        return self.program.run(plan, self.catalog)
