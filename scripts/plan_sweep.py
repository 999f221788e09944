"""Full-registry plan sweep (r14 measure-first step, guide §1/§7.2):
build every registered query's DataFrame at $SPARK_GRAFT_SF_DIR and
grade the UNEXECUTED physical plan (AQE initial) for scale red flags:
Python eval nodes, CartesianProduct, sort-merge joins, exchange count,
scans with no pushed filters. Plan-build only — no execution — so the
sweep covers all ~154 queries in minutes.

Usage: python scripts/plan_sweep.py [out.json]
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plan_sweep.json"
    from calcite_spark.session import get_spark
    from calcite_spark.queries.inventory import queries

    spark = get_spark("calcite_spark_plan_sweep")
    qs = queries()
    rows = {}
    for name, fn in qs.items():
        try:
            df = fn(spark, SF_DIR)
            jdf = df._jdf
            jvm = spark._jvm
            mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            plan = jdf.queryExecution().explainString(mode)
            rows[name] = {
                "exchanges": len(re.findall(r"\bExchange\b", plan)),
                "bhj": plan.count("BroadcastHashJoin"),
                "smj": plan.count("SortMergeJoin"),
                "shj": plan.count("ShuffledHashJoin"),
                "bnlj": plan.count("BroadcastNestedLoopJoin"),
                "cartesian": plan.count("CartesianProduct"),
                "python": plan.count("BatchEvalPython")
                + plan.count("ArrowEvalPython")
                + plan.count("MapInArrow")
                + plan.count("FlatMapGroupsInPandas")
                + plan.count("MapInPandas"),
                "sorts": len(re.findall(r"\(\d+\) Sort\b", plan)),
                "windows": len(re.findall(r"\(\d+\) Window\b", plan)),
                "scans": plan.count("Scan parquet"),
                "rdd_scans": plan.count("Scan ExistingRDD"),
                "generate": plan.count("Generate"),
                "pushed_none": len(re.findall(r"PushedFilters: \[\]", plan)),
            }
        except Exception as e:  # noqa: BLE001 — sweep must not die on one query
            rows[name] = {"error": str(e)[:200]}
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1, sort_keys=True)
    # terse report: anything with a red flag
    for name, r in sorted(rows.items()):
        if "error" in r:
            print(f"{name}: ERROR {r['error'][:80]}")
            continue
        flags = []
        if r["python"]:
            flags.append(f"python={r['python']}")
        if r["cartesian"]:
            flags.append("CARTESIAN")
        if r["smj"]:
            flags.append(f"smj={r['smj']}")
        if r["rdd_scans"]:
            flags.append(f"rdd={r['rdd_scans']}")
        if r["exchanges"] >= 6:
            flags.append(f"exch={r['exchanges']}")
        if flags:
            print(f"{name}: {' '.join(flags)}")
    print(f"\nwrote {out_path} ({len(rows)} queries)")


if __name__ == "__main__":
    main()
