"""A/B measurement for EliminateRedundantExchange (VERDICT r6 item 6):
run the classic redundant-shuffle pipeline — repartition(k) stacked
over work that already hashed on k — WITH and WITHOUT the rule, and
report wall time, Exchange-node count, and shuffle bytes written (read
from the executed plan's SQL metrics). Catalyst keeps explicit
user repartitions (they are treated as intent), so without the IR rule
the second full shuffle really executes.

Usage: python scripts/exchange_ab.py [sf_dir]
Emits one JSON line per case; SCALE.md records the wave.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def shuffle_bytes_written(jdf) -> int:
    """Sum 'shuffle bytes written' across the executed plan's exchange
    nodes (py4j walk over the Spark plan tree + its SQL metrics)."""
    total = 0
    stack = [jdf.queryExecution().executedPlan()]
    seen = set()
    while stack:
        node = stack.pop()
        if id(node) in seen:
            continue
        seen.add(id(node))
        try:
            m = node.metrics()
            it = m.iterator()
            while it.hasNext():
                kv = it.next()
                if "byteswritten" in kv._1().lower():
                    total += kv._2().value()
        except Exception:
            pass
        try:
            ch = node.children()
            for i in range(ch.size()):
                stack.append(ch.apply(i))
        except Exception:
            pass
        # adaptive plans nest the real tree under executedPlan(); query
        # stages hold their exchange under plan()
        for attr in ("executedPlan", "plan"):
            try:
                stack.append(getattr(node, attr)())
            except Exception:
                pass
    return total


def run_case(cat, with_rule: bool):
    from calcite_spark.plans import ir
    from calcite_spark.plans.rewrite import default_program

    plan = ir.Exchange("hash", ("l_orderkey",), inputs=(ir.Scan("lineitem"),))
    plan = ir.Aggregate(
        ("l_orderkey",),
        ("SUM(l_quantity) AS q", "COUNT(*) AS n"),
        inputs=(plan,),
    )
    # the redundant shuffle: the aggregate's output is ALREADY hash-
    # distributed on l_orderkey; composed pipeline stages leave exactly
    # this shape behind
    plan = ir.Exchange("hash", ("l_orderkey",), inputs=(plan,))
    if with_rule:
        plan = default_program(cat).run(plan)
    df = plan.to_df(cat)
    jdf = df._jdf
    # execute THIS DataFrame's own QueryExecution (df.count() would
    # plan a different query whose metrics we cannot read back)
    t0 = time.perf_counter()
    rows = jdf.queryExecution().toRdd().count()
    wall = time.perf_counter() - t0
    # AQE toString prints Final AND Initial plans — count only the
    # final (executed) section
    plan_str = jdf.queryExecution().executedPlan().toString()
    plan_str = plan_str.split("== Initial Plan ==")[0]
    n_exchange = plan_str.count("Exchange hashpartitioning")
    return {
        "rule": with_rule,
        "rows": rows,
        "wall_sec": round(wall, 3),
        "exchanges": n_exchange,
        "shuffle_bytes_written": shuffle_bytes_written(jdf),
    }


def main():
    from calcite_spark.catalog import open_catalog
    from calcite_spark.session import get_spark

    spark = get_spark("exchange-ab")
    cat = open_catalog(spark, SF_DIR)
    # warm both paths once (JIT/codegen), then measure best-of-3
    for with_rule in (False, True):
        run_case(cat, with_rule)
    results = {}
    for with_rule in (False, True):
        best = None
        for _ in range(3):
            r = run_case(cat, with_rule)
            if best is None or r["wall_sec"] < best["wall_sec"]:
                best = r
        results["with_rule" if with_rule else "without_rule"] = best
        print(json.dumps({"sf_dir": SF_DIR, **best}))
    w, wo = results["with_rule"], results["without_rule"]
    print(json.dumps({
        "summary": "EliminateRedundantExchange A/B",
        "sf_dir": SF_DIR,
        "exchanges_without": wo["exchanges"],
        "exchanges_with": w["exchanges"],
        "shuffle_bytes_saved": wo["shuffle_bytes_written"] - w["shuffle_bytes_written"],
        "wall_delta_sec": round(wo["wall_sec"] - w["wall_sec"], 3),
    }))


if __name__ == "__main__":
    main()
