"""Per-query job-count + wall probe for the MV/lattice family (r15,
VERDICT item 1): which runs pay more Spark jobs / passes than the
declared computation needs? Job counts are load-independent evidence
(same discipline as r14 §14).

Usage: python scripts/mv_probe.py [name ...]   # default: the MV family
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

MV_FAMILY = [
    "qx36_mv_join", "qx37_agg_union_transpose", "qx39_mv_join_compensate",
    "qx40_mv_union_rewrite", "qx41_mv_spf", "qx44_mv_filtered_join",
    "qx45_mv_join_refresh", "qx46_mv_expr_key", "qx47_lattice_auto_join",
    "qx48_mv_union_multicol", "qx49_mv_groupsets", "qx50_mv_dim_append",
    "qx51_mv_approx_distinct", "qx52_lattice_expr_suggest",
    "qx53_mv_union_join_tile", "qx54_model_lattice",
    "qx55_having_groupsets_tile", "qx56_mv_percentile_sketch",
    "qx58_mv_grain_edge", "qx59_model_composite_lattice",
    "qx60_mv_grain_between", "qx61_hot_slice_suggest",
    "qx62_mv_percentile_array", "qx63_mv_grain_hierarchy",
    "qx64_mv_extract_grouping", "qx65_mv_sarg_tile",
    "qx66_week_grain_suggest",
]


def main() -> None:
    from calcite_spark.session import get_spark
    from calcite_spark.queries.inventory import catalog_for, queries

    names = sys.argv[1:] or MV_FAMILY
    spark = get_spark("mv_probe")
    qs = queries()
    cat = catalog_for(spark, SF_DIR)
    for t in ("lineitem", "orders", "customer"):
        cat.table(t).count()
    tracker = spark.sparkContext.statusTracker()

    rows = []
    for name in names:
        if name not in qs:
            print(f"SKIP unknown {name}")
            continue
        # warm once (codegen/session effects), measure second run
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        j0 = max(tracker.getJobIdsForGroup() or [0])
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        j1 = max(tracker.getJobIdsForGroup() or [j0])
        rows.append({
            "query": name,
            "build_s": round(t1 - t0, 3),
            "exec_s": round(t2 - t1, 3),
            "total_s": round(t2 - t0, 3),
            "jobs": j1 - j0,
        })
        print(json.dumps(rows[-1]))
    rows.sort(key=lambda r: -r["total_s"])
    print(json.dumps({
        "total_s": round(sum(r["total_s"] for r in rows), 2),
        "total_jobs": sum(r["jobs"] for r in rows),
        "loadavg": round(os.getloadavg()[0], 2),
        "top": rows[:8],
    }, indent=1))


if __name__ == "__main__":
    main()
