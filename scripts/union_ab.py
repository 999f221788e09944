"""A/B measurement for AggregateUnionTranspose (r8; the same
measure-before-claiming discipline as exchange_ab.py): run
Aggregate(UnionAll(filtered scan, filtered scan)) WITH and WITHOUT the
rule and compare wall time, exchange count, and shuffle bytes written.

Expectation going in (recorded either way in SCALE.md): Catalyst
already computes PARTIAL aggregates per partition of the union's
output before the exchange, so for plain scan branches the shuffled
volume should be similar — the rule's value in this engine is
COMPOSITION (per-branch MV substitution / join transpose after the
push), not raw shuffle savings. This script exists to keep that claim
measured, not assumed.

Usage: python scripts/union_ab.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

from exchange_ab import shuffle_bytes_written  # noqa: E402


def build(cat):
    from calcite_spark.plans import ir

    branches = tuple(
        ir.Filter(cond, inputs=(ir.Scan("lineitem"),))
        for cond in ("l_linenumber <= 3", "l_linenumber > 3")
    )
    return ir.Aggregate(
        ("l_returnflag", "l_shipdate"),
        ("COUNT(*) AS n", "SUM(l_quantity) AS q", "MIN(l_extendedprice) AS mn"),
        inputs=(ir.SetOp("UNION_ALL", inputs=branches),),
    )


def run_case(cat, with_rule: bool):
    from calcite_spark.plans.rewrite import _aggregate_union_transpose

    plan = build(cat)
    if with_rule:
        plan = _aggregate_union_transpose(plan, cat, gate=False)
        assert plan is not None, "rule did not fire"
    df = plan.to_df(cat)
    jdf = df._jdf
    t0 = time.perf_counter()
    rows = jdf.queryExecution().toRdd().count()
    wall = time.perf_counter() - t0
    plan_str = jdf.queryExecution().executedPlan().toString()
    plan_str = plan_str.split("== Initial Plan ==")[0]
    return {
        "rule": with_rule,
        "rows": rows,
        "wall_sec": round(wall, 3),
        "exchanges": plan_str.count("Exchange hashpartitioning"),
        "shuffle_bytes_written": shuffle_bytes_written(jdf),
    }


def main():
    from calcite_spark.catalog import open_catalog
    from calcite_spark.session import get_spark

    spark = get_spark("union-ab")
    cat = open_catalog(spark, SF_DIR)
    for with_rule in (False, True):
        run_case(cat, with_rule)  # warm
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
        "summary": "AggregateUnionTranspose A/B",
        "sf_dir": SF_DIR,
        "shuffle_bytes_without": wo["shuffle_bytes_written"],
        "shuffle_bytes_with": w["shuffle_bytes_written"],
        "wall_without": wo["wall_sec"],
        "wall_with": w["wall_sec"],
    }))


if __name__ == "__main__":
    main()
