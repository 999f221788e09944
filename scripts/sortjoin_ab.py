"""A/B probe for SortJoinTransposeRule (r8, VERDICT r7 item 7 —
measure BEFORE building, the r7 exchange-rule template): does Spark
already bound a top-K over a LEFT join, or does pushing sort+fetch
into the left input win?

Calcite's rule (rel/rules/SortJoinTransposeRule.java:76) pushes a COPY
of Sort(keys ⊆ left, fetch=K+offset) below a LEFT join's left input,
keeping the outer sort. Spark's LimitPushDown pushes BARE limits into
a LEFT join's left side but not sort+fetch; the unpushed plan is
TakeOrderedAndProject over the FULL join — both sides fully shuffled
before the top-K.

Case A: plain top-K over customer LEFT JOIN orders (keys from left).
Case B: the pushed shape — top-K customer subquery, then the join,
then the outer top-K. Identical results (each left row yields ≥1
output rows, so the top-K left rows dominate the output's top-K; the
outer sort is kept exactly like the reference's rule).

Usage: python scripts/sortjoin_ab.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

from exchange_ab import shuffle_bytes_written  # noqa: E402


def run_case(spark, pushed: bool, k: int = 10):
    inner = (
        "(SELECT * FROM customer ORDER BY c_acctbal DESC, c_custkey "
        f"LIMIT {k}) c"
        if pushed
        else "customer c"
    )
    sql = (
        "SELECT c.c_custkey, c.c_acctbal, o.o_orderkey, o.o_totalprice "
        f"FROM {inner} LEFT JOIN orders o ON c.c_custkey = o.o_custkey "
        f"ORDER BY c_acctbal DESC, c_custkey, o_orderkey LIMIT {k}"
    )
    df = spark.sql(sql)
    jdf = df._jdf
    t0 = time.perf_counter()
    rows = jdf.queryExecution().toRdd().count()
    wall = time.perf_counter() - t0
    return {
        "pushed": pushed,
        "rows": rows,
        "wall_sec": round(wall, 3),
        "shuffle_bytes_written": shuffle_bytes_written(jdf),
        "result": [tuple(r) for r in df.collect()],
    }


def main():
    from calcite_spark.catalog import open_catalog
    from calcite_spark.session import get_spark

    spark = get_spark("sortjoin-ab")
    open_catalog(spark, SF_DIR).register_all_views()
    if os.environ.get("SORTJOIN_AB_NO_BROADCAST"):
        # emulate the both-sides-big 100 TB shape: at sf0.1 orders fits
        # under the broadcast threshold, which hides the join's shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    for pushed in (False, True):
        run_case(spark, pushed)  # warm
    results = {}
    for pushed in (False, True):
        best = None
        for _ in range(3):
            r = run_case(spark, pushed)
            if best is None or r["wall_sec"] < best["wall_sec"]:
                best = r
        results[pushed] = best
        print(json.dumps({
            "sf_dir": SF_DIR,
            **{key: v for key, v in best.items() if key != "result"},
        }))
    same = results[False]["result"] == results[True]["result"]
    print(json.dumps({
        "summary": "SortJoinTranspose A/B",
        "sf_dir": SF_DIR,
        "results_identical": same,
        "wall_plain": results[False]["wall_sec"],
        "wall_pushed": results[True]["wall_sec"],
        "shuffle_plain": results[False]["shuffle_bytes_written"],
        "shuffle_pushed": results[True]["shuffle_bytes_written"],
    }))


if __name__ == "__main__":
    main()
