"""Capture .explain("formatted") + noop-sink timings for bench headline
queries (guide §1.1/§1.4): the measure-first step of the optimization
rounds.

Usage:
    python scripts/plan_capture.py <tag>          # e.g. before / after
    python scripts/plan_capture.py <tag> z55 z03  # subset (any registered
                                                  # query name, not just
                                                  # headliners)

Writes plans/$PLAN_ROUND/<query>_<tag>.txt (the formatted plan, executed,
so AQE final plans are visible) and plans/$PLAN_ROUND/noop_<tag>.json with
min-of-3 noop-sink wall times per query (PLAN_ROUND defaults to r15).
Runs on the same tuned session as bench.py so plan shapes match what the
driver measures.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(REPO, "plans", os.environ.get("PLAN_ROUND", "r15"))

HEADLINE = [
    "z01_pricing_summary",
    "z02_revenue_by_nation",
    "z03_topk_orders",
    "z06_forecast_revenue",
    "z08_cube",
    "z10_distinct_filtered_agg",
    "z15_left_join_distribution",
    "z17_scalar_subquery",
    "z18_in_subquery",
    "z30_window_rank_topn",
    "z40_tumble",
    "z42_session",
    "z43_asof_join",
    "z50_exact_dedup",
    "z51_text_stats",
    "z54_knn_bruteforce",
    "z55_minhash_lsh",
    "z60_stats_aggs",
    "q65_lateral_topn",
    "q75_range_join",
]


def formatted_plan(df) -> str:
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


def plan_stats(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "aqe_shuffle_reads": plan.count("AQEShuffleRead"),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "python": plan.count("BatchEvalPython") + plan.count("ArrowEvalPython"),
        "sorts": plan.count("+- Sort ") + plan.count("- Sort "),
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    subset = set(sys.argv[2:])
    os.makedirs(OUT_DIR, exist_ok=True)

    from calcite_spark.session import get_spark
    from calcite_spark.queries.inventory import catalog_for, queries

    spark = get_spark("calcite_spark_plan_capture")
    qs = queries()
    if "z18_in_subquery" not in qs:
        from calcite_spark.queries.tpch import z18_in_subquery

        qs["z18_in_subquery"] = z18_in_subquery

    if subset:
        # any registered query, headliner or not, in listed order
        names = [n for n in sys.argv[2:] if n in qs]
        missing = subset - set(names)
        if missing:
            print(f"UNKNOWN QUERIES skipped: {sorted(missing)}")
    else:
        names = list(HEADLINE)

    # warmup: footers + codegen (same posture as bench.py)
    cat = catalog_for(spark, SF_DIR)
    for t in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        cat.table(t).count()
    for name in names:
        try:
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        except Exception as e:
            print(f"WARMUP FAIL {name}: {e}")

    timings: dict[str, float] = {}
    stats: dict[str, dict] = {}
    for name in names:
        best = None
        plan = None
        for _ in range(3):
            df = qs[name](spark, SF_DIR)
            spark.sparkContext.setJobDescription(f"{tag}:{name}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            if best is None or dt < best:
                best = dt
                plan = formatted_plan(df)  # post-execution → AQE final plan
        timings[name] = round(best, 4)
        stats[name] = plan_stats(plan)
        with open(os.path.join(OUT_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"{name}: {best:.3f}s  {stats[name]}")

    with open(os.path.join(OUT_DIR, f"noop_{tag}.json"), "w") as f:
        json.dump(
            {
                "sf_dir": SF_DIR,
                "timings": timings,
                "total": round(sum(timings.values()), 4),
                "stats": stats,
                "loadavg": [round(x, 2) for x in os.getloadavg()],
            },
            f,
            indent=2,
        )
    print(f"TOTAL {sum(timings.values()):.3f}s  loadavg={os.getloadavg()[0]:.2f}")


if __name__ == "__main__":
    main()
