"""A/B/C: IVF centroid-argmax expression forms (qx17's assignment map).

A (current): aggregate over centroid structs, sim (= full cosine with
   both norm folds) textually evaluated TWICE per centroid (IF cond +
   result), row norm re-folded per evaluation, centroid norm re-folded
   per evaluation.
B: transform computes each centroid's sim ONCE (struct array), argmax
   fold compares precomputed sims; centroid norms inlined as Python
   literals (same left-fold over the same doubles + IEEE sqrt — bit
   identical); row norm still folded inside the per-centroid lambda.
C: B but the 16 per-centroid sims are an UNROLLED array literal over a
   pre-projected row norm column (__vn referenced 16x, which blocks
   CollapseProject from inlining the fold into the lambda).

Assignments must be IDENTICAL per row (asserted) across all forms.

Usage: python scripts/ivf_argmax_ab.py [n_reps]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from calcite_spark.catalog import open_catalog
from calcite_spark.llm.similarity import (
    _centroid_argmax_expr,
    _dot,
    _norm,
)
from calcite_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _c_structs(centroids, with_norm):
    cells = []
    for i, c in enumerate(centroids):
        v = ",".join(f"CAST({x} AS DOUBLE)" for x in c)
        if with_norm:
            n = math.sqrt(sum(float(x) * float(x) for x in c))
            cells.append(f"named_struct('i', {i}, 'v', array({v}), 'n', CAST({n!r} AS DOUBLE))")
        else:
            cells.append(f"named_struct('i', {i}, 'v', array({v}))")
    return "array(" + ",".join(cells) + ")"


def argmax_b(vec, centroids):
    arr = _c_structs(centroids, with_norm=True)
    sim = f"({_dot(vec, 'c.v')} / ({_norm(vec)} * c.n))"
    sims = f"transform({arr}, c -> named_struct('i', c.i, 's', {sim}))"
    return (
        f"aggregate({sims}, named_struct('i', -1, 's', CAST(-2.0 AS DOUBLE)), "
        f"(acc, c) -> IF(c.s > acc.s, c, acc)).i"
    )


def argmax_c_cells(vec, norm_col, centroids):
    cells = []
    for i, c in enumerate(centroids):
        v = "array(" + ",".join(f"CAST({x} AS DOUBLE)" for x in c) + ")"
        n = math.sqrt(sum(float(x) * float(x) for x in c))
        cells.append(
            f"named_struct('i', {i}, 's', ({_dot(vec, v)} / ({norm_col} * CAST({n!r} AS DOUBLE))))"
        )
    arr = "array(" + ",".join(cells) + ")"
    return (
        f"aggregate({arr}, named_struct('i', -1, 's', CAST(-2.0 AS DOUBLE)), "
        f"(acc, c) -> IF(c.s > acc.s, c, acc)).i"
    )


def form_a(emb, centroids):
    return emb.selectExpr(
        "vec_id", f"{_centroid_argmax_expr('embedding', centroids)} AS cluster"
    )


def form_b(emb, centroids):
    return emb.selectExpr("vec_id", f"{argmax_b('embedding', centroids)} AS cluster")


def form_c(emb, centroids):
    pre = emb.selectExpr("vec_id", "embedding", f"{_norm('embedding')} AS __vn")
    return pre.selectExpr(
        "vec_id", f"{argmax_c_cells('embedding', '__vn', centroids)} AS cluster"
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = get_spark("ivf_argmax_ab")
    cat = open_catalog(spark, SF_DIR)
    emb = cat.table("embeddings")
    seeds = emb.orderBy("vec_id").limit(16).collect()
    centroids = [list(map(float, r["embedding"])) for r in seeds]

    a = {r["vec_id"]: r["cluster"] for r in form_a(emb, centroids).collect()}
    b = {r["vec_id"]: r["cluster"] for r in form_b(emb, centroids).collect()}
    c = {r["vec_id"]: r["cluster"] for r in form_c(emb, centroids).collect()}
    assert a == b, f"B differs on {sum(1 for k in a if a[k] != b[k])} rows"
    assert a == c, f"C differs on {sum(1 for k in a if a[k] != c[k])} rows"
    print(f"assignment identity: {len(a)} rows identical across A/B/C", flush=True)

    # check C's plan: the norm fold must appear ONCE in the final project
    plan = form_c(emb, centroids)._jdf.queryExecution().optimizedPlan().toString()
    n_norm_folds = plan.count("sqrt(aggregate(")
    print(f"C optimized plan norm-fold count: {n_norm_folds}", flush=True)

    tA, tB, tC = [], [], []
    for _ in range(reps):
        t0 = time.perf_counter(); noop(form_a(emb, centroids)); tA.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); noop(form_b(emb, centroids)); tB.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); noop(form_c(emb, centroids)); tC.append(time.perf_counter() - t0)
    print(
        f"A min={min(tA):.3f}s  B min={min(tB):.3f}s  C min={min(tC):.3f}s  "
        f"loadavg={[round(x, 2) for x in os.getloadavg()]}"
    )


if __name__ == "__main__":
    main()
