"""Plan serialization ≈ rel/externalize/RelJson.java:114 +
RelJsonWriter/RelJsonReader: dump the logical IR to JSON and read it
back — used for plan diffing/golden tests (DiffRepository-style) and for
shipping plans between processes.
"""

from __future__ import annotations

import json
from dataclasses import fields, is_dataclass

from calcite_spark.plans import ir
from calcite_spark.operators.asof import AsofJoin

_NODE_TYPES = {
    cls.__name__: cls
    for cls in (
        ir.Scan,
        ir.Values,
        ir.Project,
        ir.Filter,
        ir.Aggregate,
        ir.Window,
        ir.Sort,
        ir.Sample,
        ir.Uncollect,
        ir.Collect,
        ir.Exchange,
        ir.Join,
        ir.SetOp,
        ir.Correlate,
        ir.Snapshot,
        ir.Spool,
        AsofJoin,
    )
}


def to_dict(node: ir.RelNode) -> dict:
    if not is_dataclass(node):
        raise TypeError(f"not serializable: {type(node).__name__} (callable fields?)")
    out = {"rel": type(node).__name__}
    for f in fields(node):
        if f.name == "inputs":
            continue
        v = getattr(node, f.name)
        if callable(v):
            raise TypeError(f"{type(node).__name__}.{f.name} is a callable — not serializable")
        out[f.name] = list(v) if isinstance(v, tuple) else v
    out["inputs"] = [to_dict(c) for c in node.inputs]
    return out


def from_dict(d: dict) -> ir.RelNode:
    cls = _NODE_TYPES[d["rel"]]
    inputs = tuple(from_dict(c) for c in d.get("inputs", []))
    kwargs = {}
    for f in fields(cls):
        if f.name == "inputs":
            continue
        if f.name in d:
            v = d[f.name]
            kwargs[f.name] = tuple(tuple(x) if isinstance(x, list) else x for x in v) if isinstance(v, list) else v
    node = cls(**kwargs)
    node.inputs = inputs
    return node


def to_json(node: ir.RelNode, indent: int | None = None) -> str:
    return json.dumps(to_dict(node), indent=indent)


def from_json(text: str) -> ir.RelNode:
    return from_dict(json.loads(text))


def _attr_items(d: dict) -> list[tuple[str, str]]:
    return [
        (k, str(v))
        for k, v in d.items()
        if k not in ("rel", "inputs") and v not in (None, (), [], "")
    ]


def to_dot(node: ir.RelNode) -> str:
    """EXPLAIN format: Graphviz digraph ≈ rel/externalize/RelDotWriter.java
    — one box per RelNode labeled with its type + key attributes, edges
    child → parent (data-flow direction, as RelDotWriter draws them)."""
    lines = ["digraph plan {", '  node [shape=box, fontname="monospace"];']
    counter = [0]

    def walk(d: dict) -> int:
        my = counter[0]
        counter[0] += 1
        # DOT label escaping (as RelDotWriter does): backslashes first,
        # then quotes and literal newlines — a filter condition containing
        # '\n' or '\\' must not produce invalid DOT. Content is escaped
        # BEFORE the intentional \n separator is added.
        def esc(s: str) -> str:
            return s.replace("\\", "\\\\").replace('"', "'").replace("\n", "\\n")

        attrs = ", ".join(f"{k}={v}" for k, v in _attr_items(d)[:3])
        label = esc(d["rel"]) + (f"\\n{esc(attrs)}" if attrs else "")
        lines.append(f'  n{my} [label="{label}"];')
        for child in d.get("inputs", []):
            lines.append(f"  n{walk(child)} -> n{my};")
        return my

    walk(to_dict(node))
    lines.append("}")
    return "\n".join(lines)


def to_xml(node: ir.RelNode) -> str:
    """EXPLAIN format: nested-element XML ≈ rel/externalize/RelXmlWriter.java
    (<RelNode type=...><Property name=...>value</Property>...)."""
    from xml.sax.saxutils import escape, quoteattr

    out: list[str] = []

    def walk(d: dict, depth: int) -> None:
        pad = "\t" * depth
        out.append(f"{pad}<RelNode type={quoteattr(d['rel'])}>")
        for k, v in _attr_items(d):
            out.append(f"{pad}\t<Property name={quoteattr(k)}>{escape(v)}</Property>")
        for child in d.get("inputs", []):
            walk(child, depth + 1)
        out.append(f"{pad}</RelNode>")

    walk(to_dict(node), 0)
    return "\n".join(out)


def explain(node: ir.RelNode, level: str = "exppln", catalog=None) -> str:
    """Text plan dump ≈ RelOptUtil.dumpPlan + RelWriterImpl.java:46
    with SqlExplainLevel.java's detail tiers:

      * ``"none"``   ≈ NO_ATTRIBUTES — node names only,
      * ``"exppln"`` ≈ EXPPLAN_ATTRIBUTES (default) — name(attr=value),
      * ``"all"``    ≈ ALL_ATTRIBUTES — adds per-node cost metadata
        (rowcount from the RelMdRowCount analog; bytes = rowcount x
        the RelMdSize-analog row width) when a catalog is supplied.

    The "all" tier is the EXPLAIN surface the metadata facade feeds —
    the same numbers the broadcast / join-order rules consume, shown
    where a user can audit them.
    """
    if level not in ("none", "exppln", "all"):
        raise ValueError(f"unknown explain level {level!r}")
    mq = None
    if level == "all" and catalog is not None:
        from calcite_spark.plans.metadata import MetadataQuery

        mq = MetadataQuery(catalog)

    lines: list[str] = []

    # serialize ONCE and walk node + dict in lockstep (to_dict is
    # recursive — calling it per visited node re-serializes each
    # subtree depth-many times, like to_dot/to_xml this avoids it;
    # the live node is still needed for the metadata queries)
    def walk(n: ir.RelNode, d: dict, depth: int) -> None:
        head = d["rel"]
        if level != "none":
            attrs = ", ".join(f"{k}=[{v}]" for k, v in _attr_items(d))
            if attrs:
                head += f"({attrs})"
        if mq is not None:
            rows = mq.row_count(n)
            width = mq.average_row_size(n)
            cost = []
            if rows is not None:
                cost.append(f"rowcount = {rows:.1f}")
                if width is not None:
                    cost.append(f"bytes = {rows * width:.0f}")
            if cost:
                head += ": " + ", ".join(cost)
        lines.append("  " * depth + head)
        for c, cd in zip(n.inputs, d["inputs"]):
            walk(c, cd, depth + 1)

    walk(node, to_dict(node), 0)
    return "\n".join(lines) + "\n"
