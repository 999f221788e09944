"""Empirical scale-up probe: replicate sf0.1 into a key-shifted 10x
dataset (sf1-equivalent, ~6M lineitem rows) and measure how the
headline queries scale.

Usage:  python scripts/scale_probe.py [--repl 10] [--out /tmp/scale10]

Why this exists: the engine is designed for a 1000-executor cluster at
100 TB, but every per-round number is measured at sf0.1. This probe is
the falsifiable middle step — if a plan's cost is linear in the data
(the claim made for every operator in COVERAGE.md), its wall time at
10x data on the same 32 cores should grow by at most ~10x (less where
per-query constant overhead dominates). A super-linear ratio is a scale
smell the plan audit missed (accidental cartesian, driver collect,
quadratic dup groups, broadcast side growing with the fact table).

Replication preserves join semantics instead of inflating them:
  * fact/entity keys get a per-replica stride offset (custkey, orderkey,
    partkey, suppkey, doc_id, vec_id, event_id, user_id), so each
    replica joins ONLY to its own replica — join fan-out stays constant
    and result sizes scale linearly, exactly like growing a real dataset;
  * fixed dimensions (region, nation) are NOT replicated — at any scale
    there are 25 nations, like production dims;
  * document text gets a per-replica suffix so content-dedup workloads
    (md5 groups, minhash bands) see 10x distinct content, not
    10x-duplicated content whose dup-pair count would grow
    quadratically by construction.

Written with pyarrow (not a Spark job) to preserve the driver
generator's exact physical types — int32 dim keys, TIMESTAMP(NANOS)
events.ts — so Catalog's nanos handling is exercised identically.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# per-replica key offsets, far above any base-key range at sf0.1
STRIDES = {
    "c_custkey": 10**7,
    "o_orderkey": 10**9,
    "o_custkey": 10**7,
    "l_orderkey": 10**9,
    "l_partkey": 10**7,
    "l_suppkey": 10**6,
    "s_suppkey": 10**6,
    "p_partkey": 10**7,
    "doc_id": 10**7,
    "vec_id": 10**7,
    "event_id": 10**9,
    "user_id": 10**7,
}

# r15 (VERDICT r14 item 5): coordinate-derived workloads (qx25/qx11
# build planar points with x = acctbal/1000, y = key % 100). Key strides
# are ≡ 0 mod 100, so replicas used to densify the SAME plane region and
# the spatial-join output grew quadratically BY CONSTRUCTION (SCALE.md
# r14 documents the artifact: 100× pairs at 10× points). Shifting the
# coordinate-feeding continuous column per replica (x moves by k*25 —
# far beyond the 5.0 grid cell and any dwithin radius) puts each replica
# in a disjoint band, so spatial pair counts scale linearly like a real
# growing dataset. Filters on acctbal elsewhere see mildly different
# selectivity per replica; work still scales linearly.
COORD_SHIFTS = {
    "s_acctbal": 25_000,
    "c_acctbal": 25_000,
}

REPLICATED = [
    "customer", "orders", "lineitem", "supplier", "part",
    "events", "documents", "embeddings",
]
FIXED_DIMS = ["region", "nation"]

ROW_GROUP = 131_072  # several row groups per file -> split-parallel scans


def _shift(table: pa.Table, k: int) -> pa.Table:
    if k == 0:
        return table
    for name in table.column_names:
        stride = STRIDES.get(name) or COORD_SHIFTS.get(name)
        if stride:
            i = table.column_names.index(name)
            col = table.column(i)
            table = table.set_column(
                i, name, pc.add(col, pa.scalar(k * stride, type=col.type))
            )
    if "text" in table.column_names:
        i = table.column_names.index("text")
        table = table.set_column(
            i, "text", pc.binary_join_element_wise(
                pc.cast(table.column(i), pa.string()), f" replica{k}", ""
            )
        )
    return table


def build(out_dir: str, repl: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in FIXED_DIMS:
        src = os.path.join(SRC, f"{t}.parquet")
        pq.write_table(pq.read_table(src), os.path.join(out_dir, f"{t}.parquet"))
    for t in REPLICATED:
        src = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        parts = [_shift(src, k) for k in range(repl)]
        big = pa.concat_tables(parts)
        pq.write_table(
            big, os.path.join(out_dir, f"{t}.parquet"), row_group_size=ROW_GROUP
        )
        print(f"  {t}: {src.num_rows} -> {big.num_rows} rows", file=sys.stderr)


def time_queries(spark, qs, names, sf_dir: str, runs: int = 2) -> dict[str, float]:
    timings: dict[str, float] = {}
    for name in names:  # warmup pass (codegen + AQE at this SF)
        qs[name](spark, sf_dir).count()
    for _ in range(runs):
        for name in names:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 4)
            timings[name] = min(timings.get(name, dt), dt)
    return timings


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repl", type=int, default=10)
    ap.add_argument("--out", default="/tmp/scale10")
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--flag-ratio", type=float, default=None,
                    help="flag queries whose ratio exceeds this (default repl*1.3)")
    ap.add_argument("--extra", nargs="*", default=[],
                    help="additional inventory query names to probe beyond bench.HEADLINE")
    ap.add_argument("--only", nargs="*", default=None,
                    help="probe EXACTLY these query names (skip the HEADLINE set) — "
                    "the r8 100x wave uses this to target the heaviest linear queries")
    args = ap.parse_args()
    flag_at = args.flag_ratio or args.repl * 1.3

    if not args.skip_build:
        print(f"building {args.repl}x replica of {SRC} at {args.out}", file=sys.stderr)
        build(args.out, args.repl)

    from calcite_spark.session import get_spark
    from calcite_spark.queries.inventory import queries
    from bench import HEADLINE

    spark = get_spark("calcite_spark_scale_probe")
    qs = queries()
    if args.only is not None:
        names = [n for n in args.only if n in qs]
    else:
        names = [n for n in HEADLINE if n in qs] + [n for n in args.extra if n in qs]

    base = time_queries(spark, qs, names, SRC)
    scaled = time_queries(spark, qs, names, args.out)

    rows = []
    for n in names:
        ratio = round(scaled[n] / base[n], 2) if base[n] > 0 else float("inf")
        rows.append({
            "query": n, "base_s": base[n], "scaled_s": scaled[n], "ratio": ratio,
            "flag": ratio > flag_at,
        })
    out = {
        "metric": "scale_probe",
        "repl": args.repl,
        "base_total_s": round(sum(base.values()), 4),
        "scaled_total_s": round(sum(scaled.values()), 4),
        "total_ratio": round(sum(scaled.values()) / sum(base.values()), 2),
        "flagged": [r["query"] for r in rows if r["flag"]],
        "rows": rows,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
