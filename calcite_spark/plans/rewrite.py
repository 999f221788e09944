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
        return ir.Join(
            node.condition, node.join_type, True, False,
            inputs=node.inputs, _hint_from_rule=True,
        )
    if small_scan(left) and node.join_type == "INNER":
        return ir.Join(
            node.condition, node.join_type, False, True,
            inputs=node.inputs, _hint_from_rule=True,
        )
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


_YEARFN = r"(?:EXTRACT\s*\(\s*YEAR\s+FROM\s+(\w+)\s*\)|year\s*\(\s*(\w+)\s*\))"


def _partfn(part: str) -> str:
    return rf"(?:EXTRACT\s*\(\s*{part}\s+FROM\s+(\w+)\s*\)|{part.lower()}\s*\(\s*(\w+)\s*\))"


def _date_range_canonicalize(node, catalog):
    """≈ rel/rules/DateRangeRules.java:91 + util/Sarg.java:69 (EXTRACT
    conditions → Sarg range sets): year()-wrapped predicates become
    sargable timestamp ranges so they reach the parquet scan (min/max
    row-group skipping, partition pruning) — Catalyst leaves wrapped
    columns unpushable, and at 100 TB the rewritten form prunes whole
    files.

    Handled shapes (each a pure predicate equivalence, safe under any
    boolean context):
      * YEAR = / < / <= / > / >= literal        → single range
      * YEAR IN (y1, y2, ...)                   → RangeSet union with
        adjacent-year merging (plans/sarg.py ≈ Sarg's Guava RangeSet)
      * YEAR BETWEEN y1 AND y2                  → [y1-01-01, y2+1-01-01)
      * YEAR = y AND MONTH = m (same column)    → one month range
      * YEAR = y AND QUARTER = q (same column)  → one quarter range
    Standalone MONTH/QUARTER comparisons are left alone — the value
    repeats every year, so no contiguous range exists (same boundary
    Calcite's DateRangeRules draws)."""
    import re as _re

    from calcite_spark.plans.sarg import (
        RangeSet,
        month_range,
        quarter_range,
        render_ts,
        year_range,
    )

    if not isinstance(node, ir.Filter):
        return None
    cond = node.condition
    changed = False

    def mark(text):
        nonlocal changed
        changed = True
        return text

    def boundary_ok(text: str, start: int, allow_not: bool) -> bool:
        """The match must begin a predicate: preceded (after stripping
        whitespace) by nothing, '(', AND, OR — or NOT when the rewrite is
        a single-predicate equivalence (allow_not). This blocks the two
        hazards the advisor found: the conjunction shape grabbing across
        a NOT ('NOT year(d)=1996 AND month(d)=6' parses as
        (NOT year=1996) AND month=6), and year() embedded in arithmetic
        ('x - year(d) = 1996')."""
        prefix = text[:start].rstrip()
        if not prefix or prefix.endswith("("):
            return True
        m = _re.search(r"([A-Za-z_]\w*)$", prefix)
        word = m.group(1).upper() if m else None
        if word in ("AND", "OR"):
            return True
        if word == "NOT":
            return allow_not
        return False

    # 1) YEAR = y AND MONTH|QUARTER = k on the SAME column → finer range
    #    NOT a predicate equivalence across a NOT/arithmetic context —
    #    boundary-guarded (ADVICE r2).
    for part, rng in (("MONTH", month_range), ("QUARTER", quarter_range)):
        pat = _re.compile(
            _YEARFN
            + r"\s*=\s*(\d{4})(?!\d)\s+AND\s+"
            + _partfn(part)
            + r"\s*=\s*(\d{1,2})(?!\d)",
            _re.I,
        )

        def sub_combined(m, rng=rng):
            if not boundary_ok(cond, m.start(), allow_not=False):
                return m.group(0)
            ycol, y = m.group(1) or m.group(2), int(m.group(3))
            pcol, k = m.group(4) or m.group(5), int(m.group(6))
            if ycol != pcol:
                return m.group(0)
            return mark(RangeSet([rng(y, k)]).to_sql(ycol, render_ts))

        cond = pat.sub(sub_combined, cond)

    # 2) YEAR IN (y1, y2, ...) → merged range set
    pat_in = _re.compile(_YEARFN + r"\s+IN\s*\(\s*([\d\s,]+?)\s*\)", _re.I)

    def sub_in(m):
        if not boundary_ok(cond, m.start(), allow_not=True):
            return m.group(0)
        col = m.group(1) or m.group(2)
        years = [int(t) for t in _re.findall(r"\d{4}", m.group(3))]
        if not years:
            return m.group(0)
        rs = RangeSet(year_range(y) for y in years)
        return mark(rs.to_sql(col, render_ts))

    cond = pat_in.sub(sub_in, cond)

    # 3) YEAR BETWEEN y1 AND y2 → one closed-open range
    pat_bt = _re.compile(_YEARFN + r"\s+BETWEEN\s+(\d{4})\s+AND\s+(\d{4})", _re.I)

    def sub_between(m):
        if not boundary_ok(cond, m.start(), allow_not=True):
            return m.group(0)
        col = m.group(1) or m.group(2)
        y1, y2 = int(m.group(3)), int(m.group(4))
        rs = RangeSet(year_range(y) for y in range(y1, y2 + 1))
        return mark(rs.to_sql(col, render_ts))

    cond = pat_bt.sub(sub_between, cond)

    # 4) single YEAR comparisons
    def year_cmp(col, op, y):
        y = int(y)
        lo, hi = render_ts((y, 1)), render_ts((y + 1, 1))
        return {
            "=": f"({col} >= {lo} AND {col} < {hi})",
            "<": f"{col} < {lo}",
            "<=": f"{col} < {hi}",
            ">": f"{col} >= {hi}",
            ">=": f"{col} >= {lo}",
        }[op]

    pat_cmp = _re.compile(_YEARFN + r"\s*(=|<=|>=|<|>)\s*(\d{4})(?!\d)", _re.I)

    def sub_cmp(m):
        if not boundary_ok(cond, m.start(), allow_not=True):
            return m.group(0)
        col = m.group(1) or m.group(2)
        return mark(year_cmp(col, m.group(3), m.group(4)))

    cond = pat_cmp.sub(sub_cmp, cond)

    if not changed:
        return None
    return ir.Filter(cond, inputs=node.inputs)


def _split_conjuncts(cond: str) -> list[str]:
    """Split on TOP-LEVEL AND only (no parens nesting tracking needed
    beyond depth counting; our IR conditions are plain SQL strings)."""
    import re as _re

    parts, depth, cur = [], 0, []
    tokens = _re.split(r"(\(|\)|\bAND\b)", cond, flags=_re.I)
    for t in tokens:
        if t == "(":
            depth += 1
            cur.append(t)
        elif t == ")":
            depth -= 1
            cur.append(t)
        elif t.upper() == "AND" and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(t)
    if "".join(cur).strip():
        parts.append("".join(cur).strip())
    return [p for p in parts if p]


def _join_order_greedy(node, catalog):
    """≈ JoinToMultiJoinRule + LoptOptimizeJoinRule.java:77 (greedy
    tier; DPhyp intentionally skipped): flatten a chain of INNER equi-
    joins into a multi-join, then rebuild left-deep from catalog
    statistics — largest relation first (the fact side streams), each
    remaining relation added smallest-estimated-rows-first among those
    connected by a now-bound condition, with broadcast hints on
    catalog-known small dimensions.

    At 100 TB the win is structural: the fact table is never the build
    side, every dimension join is a broadcast (no fact shuffle), and
    intermediate sizes shrink monotonically. Estimates are
    Catalog.row_count × 0.25 per applied filter
    (≈ RelMdUtil.guessSelectivity:504's default).

    Bails (returns None) unless every leaf is Scan or Filter(Scan) with
    resolvable columns and the join graph is connected — a wrong
    reorder is worse than trusting the written order + AQE."""
    if not isinstance(node, ir.Join) or catalog is None:
        return None
    if node.join_type != "INNER" or node.condition is None:
        return None

    # flatten the INNER-join chain
    leaves: list = []
    conjuncts: list[str] = []

    def n_has_hint(n):
        return (n.broadcast_left or n.broadcast_right) and not n._hint_from_rule

    if n_has_hint(node):
        return None  # the root itself carries a caller hint — don't touch

    def flatten(n):
        caller_hint = (n_has_hint(n) if isinstance(n, ir.Join) else False)
        if (
            isinstance(n, ir.Join)
            and n.join_type == "INNER"
            and n.condition is not None
            # caller-set broadcast hints (either side) are intent — treat
            # as flattening boundaries so reordering can't drop them;
            # rule-derived hints are re-derivable and flatten through
            and not caller_hint
        ):
            flatten(n.inputs[0])
            flatten(n.inputs[1])
            conjuncts.extend(_split_conjuncts(n.condition))
        else:
            leaves.append(n)

    flatten(node)
    if len(leaves) < 3:
        return None

    # resolve each leaf's column set + row estimate
    import re as _re

    infos = []
    for leaf in leaves:
        base, selectivity = leaf, 1.0
        if isinstance(base, ir.Filter) and isinstance(base.inputs[0], ir.Scan):
            base, selectivity = base.inputs[0], 0.25
        if not isinstance(base, ir.Scan):
            return None
        try:
            cols = set(catalog.table(base.table).columns)
            rows = catalog.row_count(base.table) * selectivity
        except Exception:
            return None
        infos.append({"node": leaf, "table": base.table, "cols": cols, "rows": rows})

    # column names must be globally unique across leaves — otherwise
    # condition-to-leaf mapping is ambiguous (self-joins) and reordering
    # could silently rebind a predicate. Bail.
    seen: set = set()
    for info in infos:
        if info["cols"] & seen:
            return None
        seen |= info["cols"]

    # map each conjunct to the leaves it references
    all_cols = {c for i in infos for c in i["cols"]}
    cond_refs = []
    for c in conjuncts:
        idents = {t for t in _re.findall(r"[A-Za-z_]\w*", c) if t in all_cols}
        touched = [i for i, info in enumerate(infos) if idents & info["cols"]]
        if not idents or not touched:
            return None  # unmappable condition — don't reorder
        cond_refs.append((c, idents, set(touched)))

    # greedy rebuild: largest leaf streams, smallest connected leaf next
    order = sorted(range(len(infos)), key=lambda i: -infos[i]["rows"])
    bound = {order[0]}
    acc = infos[order[0]]["node"]
    used = [False] * len(cond_refs)
    remaining = set(range(len(infos))) - bound
    while remaining:
        candidates = [
            i
            for i in remaining
            if any(refs <= bound | {i} and i in refs for _, _, refs in cond_refs)
        ]
        if not candidates:
            return None  # disconnected graph — no cartesian products
        nxt = min(candidates, key=lambda i: infos[i]["rows"])
        bound.add(nxt)
        join_conds = []
        for k, (c, _, refs) in enumerate(cond_refs):
            if not used[k] and refs <= bound:
                used[k] = True
                join_conds.append(c)
        info = infos[nxt]
        small = catalog.is_broadcastable(info["table"]) or info["rows"] <= 100_000
        acc = ir.Join(
            " AND ".join(join_conds) if join_conds else None,
            "INNER" if join_conds else "CROSS",
            broadcast_right=small,
            inputs=(acc, info["node"]),
            _hint_from_rule=True,
        )
        remaining.discard(nxt)

    # explain_str recurses into inputs (repr does not) — comparing reprs
    # reported structurally different trees as unchanged and vice versa
    if acc.explain_str() == node.explain_str():
        return None  # already in greedy order — fixpoint
    return acc


DEFAULT_RULES = [
    Rule("JoinOrderGreedy", _join_order_greedy),
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
