"""Materialized views + lattice tiles ≈ Calcite's materialize/ package:
MaterializationService.java (registry), rel/rules/materialize/
MaterializedViewRules.java + plan/SubstitutionVisitor.java (rewrite),
Lattice.java / TileSuggester.java (star-schema pre-aggregation tiles).

Catalyst has NO materialized-view rewrite — this layer runs over our IR
before lowering (SURVEY §4.2 ❌ row). Two tiers, mirroring the reference
rules:

1. exact match (SubstitutionVisitor trivial unification): query
   signature == MV signature → scan the MV.
2. rollup compensation (MaterializedViewProjectAggregateRule / the
   AGGREGATE_STAR_TABLE tile path): the query groups by a SUBSET of the
   MV's keys and every aggregate re-aggregates (SUM→SUM, COUNT→SUM,
   MIN→MIN, MAX→MAX) → aggregate over the MV. A filter that references
   only MV group keys is compensated by filtering the MV.

100 TB: a tile is usually 3-6 orders of magnitude smaller than the fact
table; the rewrite turns a full-fact shuffle into a dimension-sized one.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import functions as _F

from calcite_spark.plans import ir

_AGG_RE = re.compile(r"^\s*(SUM|COUNT|MIN|MAX)\s*\(\s*(.*?)\s*\)\s+AS\s+(\w+)\s*$", re.I)

# re-aggregation function when rolling a tile up to coarser keys
_REAGG = {"SUM": "SUM", "COUNT": "SUM", "MIN": "MIN", "MAX": "MAX"}


@dataclass
class Materialization:
    """≈ materialize/MaterializationService.defineMaterialization entry."""

    name: str
    table: str  # base table the MV aggregates
    group_keys: tuple
    agg_calls: dict  # alias -> (FN, arg_expr)
    path: str = ""
    filter_condition: str | None = None  # None = unfiltered MV
    # file snapshot of the base table at (re)build time — the change-
    # detection anchor for incremental_refresh (≈ a lake format's
    # snapshot id; a deployment on Delta/Iceberg would persist this)
    base_files: tuple = ()


def parse_agg_call(call: str):
    m = _AGG_RE.match(call)
    if not m:
        return None
    return m.group(1).upper(), re.sub(r"\s+", " ", m.group(2)), m.group(3)


class MaterializationRegistry:
    def __init__(self):
        self.mvs: dict[str, Materialization] = {}

    def define(self, catalog, name: str, table: str, group_keys, agg_calls, path: str):
        """Compute + persist + register a materialization. agg_calls are
        "FN(expr) AS alias" strings (the IR Aggregate form). Also attaches
        this registry to the catalog so the rewrite rule finds it."""
        catalog.mv_registry = self
        parsed = {}
        for call in agg_calls:
            p = parse_agg_call(call)
            if p is None:
                raise ValueError(f"not a rewritable aggregate call: {call}")
            fn, arg, alias = p
            parsed[alias] = (fn, arg)
        df = (
            ir.Aggregate(tuple(group_keys), tuple(agg_calls), inputs=(ir.Scan(table),))
        ).to_df(catalog)
        df.write.mode("overwrite").parquet(path)
        catalog.register(name, path)
        try:
            snapshot = tuple(sorted(catalog.table(table).inputFiles()))
        except Exception:
            snapshot = ()  # non-file base: incremental_refresh will refuse
        mv = Materialization(
            name, table, tuple(group_keys), parsed, path, base_files=snapshot
        )
        self.mvs[name] = mv
        return mv

    def incremental_refresh(self, catalog, name: str) -> dict:
        """Refresh an MV over an APPEND-ONLY base table by aggregating
        only the files added since the last build and merging with the
        stored tile (≈ the incremental half of Calcite's
        MaterializationService: the reference rebuilds tiles; lake-era
        engines maintain them — SUM/COUNT merge by SUM, MIN/MIN,
        MAX/MAX).

        100 TB shape: the delta scan reads ONLY new files (file-list
        change detection, the Delta/Iceberg snapshot-diff analog) and
        the merge shuffles tile-sized data, not the fact table — a
        refresh costs O(new data + tile), not O(history).

        Refuses what cannot merge: DISTINCT aggregates (per-group
        distinct counts are not additive), non-identifier group keys
        (the merge re-groups by the tile's key COLUMNS), and non-file
        base tables (no change anchor). Row deletes/updates in the base
        are out of contract — append-only, like every log-structured
        ingest path.
        """
        mv = self.mvs[name]
        for alias, (fn, arg) in mv.agg_calls.items():
            if arg.upper().startswith("DISTINCT"):
                raise ValueError(
                    f"MV {name}: {fn}(DISTINCT ...) is not incrementally "
                    "maintainable — redefine with define() to rebuild"
                )
        if not all(re.fullmatch(r"[A-Za-z_]\w*", k) for k in mv.group_keys):
            raise ValueError(
                f"MV {name}: incremental refresh needs plain column group "
                f"keys, got {mv.group_keys}"
            )
        if not mv.base_files:
            raise ValueError(
                f"MV {name}: base table {mv.table} has no file listing — "
                "incremental refresh needs a file-backed base"
            )
        # the catalog memoizes DataFrames; a cached handle lists the
        # files as of ITS creation — drop it so the listing is current
        catalog._dfs.pop(mv.table, None)
        current = tuple(sorted(catalog.table(mv.table).inputFiles()))
        seen = set(mv.base_files)
        delta = [f for f in current if f not in seen]
        if not delta:
            return {"refreshed": False, "delta_files": 0}

        spark = catalog.spark
        delta_df = spark.read.parquet(*delta)
        calls = tuple(
            f"{fn}({arg}) AS {alias}" for alias, (fn, arg) in mv.agg_calls.items()
        )
        tmp = f"__mv_delta_{name}"
        catalog.register_df(tmp, delta_df)
        try:
            # same IR lowering as define() — identical naming/typing
            delta_agg = ir.Aggregate(
                mv.group_keys, calls, inputs=(ir.Scan(tmp),)
            ).to_df(catalog)
            merge_calls = [
                _F.expr(f"{_REAGG[fn]}({alias})").alias(alias)
                for alias, (fn, _) in mv.agg_calls.items()
            ]
            merged = (
                catalog.table(name)
                .unionByName(delta_agg)
                .groupBy(*mv.group_keys)
                .agg(*merge_calls)
            )
            # pin results BEFORE overwriting the parquet being read
            merged = merged.localCheckpoint(eager=True)
            merged.write.mode("overwrite").parquet(mv.path)
        finally:
            spark.catalog.dropTempView(tmp)
            catalog.tables.pop(tmp, None)
            catalog._dfs.pop(tmp, None)
        catalog.register(name, mv.path)
        self.mvs[name] = Materialization(
            mv.name,
            mv.table,
            mv.group_keys,
            mv.agg_calls,
            mv.path,
            mv.filter_condition,
            base_files=current,
        )
        return {"refreshed": True, "delta_files": len(delta)}

    # -- the rewrite rule (plugged into plans/rewrite.py) --------------

    def substitute(self, node, catalog):
        """Aggregate[, Filter](Scan(t)) → Aggregate[, Filter](Scan(mv))."""
        if not isinstance(node, ir.Aggregate) or node.group_type != "SIMPLE":
            return None
        child = node.inputs[0]
        filt = None
        if isinstance(child, ir.Filter) and isinstance(child.inputs[0], ir.Scan):
            filt, scan = child, child.inputs[0]
        elif isinstance(child, ir.Scan):
            scan = child
        else:
            return None
        for mv in self.mvs.values():
            if mv.table != scan.table:
                continue
            rewritten = self._try_rewrite(node, filt, mv)
            if rewritten is not None:
                return rewritten
        return None

    def _try_rewrite(self, agg: ir.Aggregate, filt, mv: Materialization):
        # group keys must be a subset of the tile's keys
        if not set(agg.group_keys) <= set(mv.group_keys):
            return None
        # filter may only reference tile group keys (identifier check)
        if filt is not None:
            cond_no_literals = re.sub(r"'[^']*'", "", filt.condition)
            idents = set(re.findall(r"[A-Za-z_]\w*", cond_no_literals))
            tokens_ok = {k for k in mv.group_keys}
            sql_words = {
                "AND", "OR", "NOT", "IN", "BETWEEN", "LIKE", "IS", "NULL",
                "TRUE", "FALSE", "TIMESTAMP", "DATE", "INTERVAL", "CAST",
                "AS", "INT", "BIGINT", "DOUBLE", "STRING",
            }
            if not all(i in tokens_ok or i.upper() in sql_words or i.isdigit() for i in idents):
                return None
        exact = tuple(agg.group_keys) == tuple(mv.group_keys) and filt is None
        new_calls = []
        for call in agg.agg_calls:
            p = parse_agg_call(call)
            if p is None:
                return None
            fn, arg, alias = p
            # DISTINCT aggregates are NOT summable across finer groups
            # (SUM of per-group distinct counts overcounts) — only the
            # exact-match tier may rewrite them.
            if arg.upper().startswith("DISTINCT") and not exact:
                return None
            # find the MV column computing this aggregate
            src = next(
                (
                    a
                    for a, (mfn, marg) in mv.agg_calls.items()
                    if mfn == fn and _norm(marg) == _norm(arg)
                ),
                None,
            )
            if src is None:
                return None
            if exact:
                new_calls.append(alias if src == alias else f"{src} AS {alias}")
            else:
                new_calls.append(f"{_REAGG[fn]}({src}) AS {alias}")
        scan = ir.Scan(mv.name)
        if exact:
            # identity projection over the tile
            return ir.Project(tuple(list(agg.group_keys) + new_calls), inputs=(scan,))
        base = ir.Filter(filt.condition, inputs=(scan,)) if filt is not None else scan
        return ir.Aggregate(tuple(agg.group_keys), tuple(new_calls), inputs=(base,))


def _norm(expr: str) -> str:
    return re.sub(r"\s+", "", expr).lower()


# ---------------------------------------------------------------------
# Lattice-lite ≈ materialize/Lattice.java + TileSuggester: given a fact
# table and dimension columns, build the tiles worth materializing.
# ---------------------------------------------------------------------


@dataclass
class _ShapeStat:
    """One observed aggregate query shape (table, keys, agg calls)."""

    table: str
    group_keys: tuple
    agg_calls: tuple
    count: int = 0


class LatticeSuggester:
    """Query-CORPUS lattice suggester ≈ materialize/LatticeSuggester.java
    + TileSuggester.java: instead of hand-declared lattices, record every
    substitutable aggregate shape that flows through the planner
    (BoundProgram.run observes when a suggester is attached to the
    catalog), then propose tiles from observation frequency — the union
    of observed group keys per table is the finest covering tile, so any
    recorded query (and any coarser rollup) is answerable from it via the
    rollup-compensation rewrite. auto_build() materializes proposals,
    making the MV layer self-tuning end-to-end.

    Scale note: the tile is aggregated once per build over the fact
    table; every subsequent matching query reads the tile (usually 3-6
    orders of magnitude smaller). Observation itself is plan-time only —
    zero executor cost."""

    def __init__(self):
        self.shapes: dict[tuple, _ShapeStat] = {}

    def attach(self, catalog) -> "LatticeSuggester":
        catalog.lattice_suggester = self
        return self

    # -- recording -----------------------------------------------------

    def observe(self, plan: ir.RelNode) -> None:
        stack = [plan]
        while stack:
            n = stack.pop()
            stack.extend(n.inputs)
            if not (isinstance(n, ir.Aggregate) and n.group_type == "SIMPLE"):
                continue
            child = n.inputs[0]
            if isinstance(child, ir.Filter):
                child = child.inputs[0]
            if not isinstance(child, ir.Scan):
                continue
            keys = tuple(sorted(n.group_keys))
            # plain-column keys only (an expression key would need the
            # expression materialized in the tile — out of scope, bail)
            if not all(re.fullmatch(r"[A-Za-z_]\w*", k) for k in keys):
                continue
            calls = tuple(sorted(c for c in n.agg_calls if parse_agg_call(c)))
            if not keys or not calls:
                continue
            key = (child.table, keys, calls)
            st = self.shapes.setdefault(key, _ShapeStat(child.table, keys, calls))
            st.count += 1

    # -- proposing -----------------------------------------------------

    def suggest(self, min_count: int = 2, max_tiles: int = 3) -> list[dict]:
        """Per-table proposals, most-observed tables first. group_keys =
        union of observed keys; agg_calls = union of observed aggregate
        (fn, arg) pairs with canonical aliases (the rewrite matches on
        (fn, normalized arg), not alias)."""
        by_table: dict[str, list[_ShapeStat]] = {}
        for st in self.shapes.values():
            by_table.setdefault(st.table, []).append(st)
        proposals = []
        for table, stats in by_table.items():
            total = sum(s.count for s in stats)
            if total < min_count:
                continue
            keys = sorted(set().union(*[set(s.group_keys) for s in stats]))
            seen_calls: dict[tuple, str] = {}
            for s in stats:
                for call in s.agg_calls:
                    fn, arg, _alias = parse_agg_call(call)
                    seen_calls.setdefault((fn, _norm(arg)), f"{fn}({arg})")
            calls = [
                f"{sql} AS m{i}" for i, sql in enumerate(sorted(seen_calls.values()))
            ]
            proposals.append(
                {
                    "table": table,
                    "group_keys": keys,
                    "agg_calls": calls,
                    "observations": total,
                }
            )
        proposals.sort(key=lambda p: -p["observations"])
        return proposals[:max_tiles]

    # -- building ------------------------------------------------------

    def auto_build(
        self,
        catalog,
        registry: MaterializationRegistry,
        warehouse: str,
        min_count: int = 2,
        max_tiles: int = 3,
    ) -> list[Materialization]:
        import os

        out = []
        for p in self.suggest(min_count=min_count, max_tiles=max_tiles):
            name = f"lattice_{p['table']}_{len(p['group_keys'])}d"
            if name in registry.mvs:
                continue
            out.append(
                registry.define(
                    catalog,
                    name,
                    p["table"],
                    p["group_keys"],
                    p["agg_calls"],
                    os.path.join(warehouse, name),
                )
            )
        return out


def suggest_tiles(catalog, table: str, dims: list[str], measures: list[str], max_tiles: int = 4):
    """TileSuggester-style heuristic: estimate each single-dim tile's
    cardinality with approx_count_distinct (≈ profile/ProfilerImpl), pick
    the lowest-cardinality dims first (biggest compression), plus the
    all-dims tile as the drill-down base."""
    df = catalog.table(table)
    cards = (
        df.selectExpr(*[f"approx_count_distinct({d}) AS {d}" for d in dims]).collect()[0].asDict()
    )
    ranked = sorted(dims, key=lambda d: cards[d])
    tiles = [tuple(ranked)]  # finest tile
    for d in ranked:
        if len(tiles) >= max_tiles:
            break
        if (d,) not in tiles:
            tiles.append((d,))
    return {"cardinalities": cards, "tiles": tiles, "measures": measures}


def build_lattice(
    catalog,
    registry: MaterializationRegistry,
    table: str,
    dims: list[str],
    measure_calls: list[str],
    warehouse: str,
    max_tiles: int = 3,
) -> list[Materialization]:
    """≈ Lattice.java + TileSuggester end-to-end: suggest tiles, then
    materialize each as an aggregate over the fact table. Queries
    grouping by any subset of a tile's dims are answered from the
    smallest matching tile via the rollup-compensation rewrite."""
    import os

    plan = suggest_tiles(catalog, table, dims, measure_calls, max_tiles=max_tiles)
    out = []
    for tile_dims in plan["tiles"]:
        name = f"tile_{table}_{'_'.join(c.split('_')[-1] for c in tile_dims)}"
        mv = registry.define(
            catalog,
            name,
            table,
            list(tile_dims),
            measure_calls,
            os.path.join(warehouse, name),
        )
        out.append(mv)
    return out
