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


DEFAULT_RULES = [
    Rule("BroadcastSmallDimensions", _broadcast_small_dims),
    Rule("MaterializedViewSubstitution", _materialized_view_substitute),
]


def default_program(catalog=None) -> "BoundProgram":
    return BoundProgram(HepProgram(DEFAULT_RULES), catalog)


class BoundProgram:
    def __init__(self, program: HepProgram, catalog):
        self.program = program
        self.catalog = catalog

    def run(self, plan: ir.RelNode) -> ir.RelNode:
        return self.program.run(plan, self.catalog)
