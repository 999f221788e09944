"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan build + execute + collect), the way
a user would experience it. A warmup pass loads the session + file
footers so we measure query time, not JVM startup.
"""

from __future__ import annotations

import json
import os
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

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

WARMUP_SF_DIR = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    from calcite_spark.session import get_spark
    from calcite_spark.queries.inventory import catalog_for, queries

    spark = get_spark("calcite_spark_bench")
    qs = queries()
    # z18 was retired from the driver registry in r13 (rotation
    # arithmetic; receipts at queries/tpch.py) but stays a bench
    # headline so its wall-time series is unbroken across rounds.
    if "z18_in_subquery" not in qs:
        from calcite_spark.queries.tpch import z18_in_subquery

        qs["z18_in_subquery"] = z18_in_subquery

    # warmup: session up, parquet footers read, catalog views registered
    cat = catalog_for(spark, SF_DIR)
    for t in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        cat.table(t).count()
    # JIT/codegen warmup: run each headline query once at the smallest SF
    # (identical plan shapes → whole-stage codegen classes and JIT-compiled
    # paths are hot when measurement starts; measures steady-state query
    # time, not first-compile)
    if WARMUP_SF_DIR and os.path.isdir(WARMUP_SF_DIR) and WARMUP_SF_DIR != SF_DIR:
        for name in HEADLINE:
            if name in qs:
                try:
                    qs[name](spark, WARMUP_SF_DIR).count()
                except Exception:
                    pass
    # Second warmup pass AT the bench SF: AQE replans and codegen are
    # partly size-dependent (broadcast thresholds, skew splits), so the
    # small-SF pass alone leaves first-run compilation in the measured
    # numbers (q03 measured 3.1s cold vs 1.2s warm at sf0.1). One
    # throwaway pass makes the timing steady-state.
    for name in HEADLINE:
        if name in qs:
            try:
                qs[name](spark, SF_DIR).count()
            except Exception:
                pass

    # timed sweep runs 3×, keep per-query min: first-run AQE replans,
    # stage-graph position and local[32] scheduling jitter made
    # single-pass numbers noisy (q55 read 2.22s in r2's sweep vs 1.2s
    # steady-state; whole-sweep totals vary ±15% run to run) — the
    # per-query min across passes is the reproducible steady-state cost
    # of the plan.
    # Per-query build/execute split (r4 verdict item 7): "build" is the
    # Python-side plan construction (the queries() callable returning a
    # DataFrame — catalog lookups, expression assembly), "exec" is
    # count() (Catalyst optimize + run). If totals drift with no
    # bench-query code change, the split shows whether the growing
    # registry is leaking into plan build or execution got slower.
    N_RUNS = 3
    timings: dict[str, float] = {}
    build_t: dict[str, float] = {}
    exec_t: dict[str, float] = {}
    for _ in range(N_RUNS):
        for name in HEADLINE:
            if name not in qs:
                continue
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            t1 = time.perf_counter()
            n = df.count() if df is not None else 0
            t2 = time.perf_counter()
            dt = round(t2 - t0, 4)
            if name not in timings or dt < timings[name]:
                timings[name] = dt
                build_t[name] = round(t1 - t0, 4)
                exec_t[name] = round(t2 - t1, 4)
    total = round(sum(timings.values()), 4)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "build_sec": build_t,
                "exec_sec": exec_t,
                "runs": N_RUNS,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                # machine load context (1/5/15 min) so cross-round
                # total drift can be adjudicated from data — r4-r6
                # totals moved ±20% with no code change on the bench
                # paths (VERDICT r6 item 8)
                "loadavg": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )


if __name__ == "__main__":
    main()
