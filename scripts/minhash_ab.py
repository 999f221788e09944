"""A/B the minhash signature expression forms (r15, VERDICT item 4).

Form A (r13/r14, current): one fold over the shingle hashes whose
accumulator is the K-element signature array — every fold step allocates
a fresh K-long array via the inner transform().

Form B (candidate): let-bind the shingle-hash array once per row
(transform-over-one-element trick so the array expression appears
exactly once), then K independent SCALAR folds — same number of
xxhash64/least evaluations, zero per-step array allocations.

Values must be bit-identical: min over the same multiset, computed with
least() either way. The script asserts equality on every row before
timing. Timings are min-of-N noop-sink walls on the signature projection
alone (the z55 join/groupBy downstream is unchanged by the rewrite).

Usage: python scripts/minhash_ab.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5

from calcite_spark.llm.dedup import DEFAULT_NUM_HASHES, normalize_text, shingles
from calcite_spark.llm.dedup import minhash_signature  # form A

LONG_MAX = 9223372036854775807


def minhash_signature_b(shingle_array_expr: str, num_hashes: int = DEFAULT_NUM_HASHES) -> str:
    hs = f"transform({shingle_array_expr}, s -> xxhash64(s))"
    folds = ", ".join(
        f"aggregate(hs, CAST({LONG_MAX} AS BIGINT), (m, h) -> least(m, xxhash64(h, {i})))"
        for i in range(num_hashes)
    )
    # let-bind hs: the shingle pipeline appears ONCE; transform-over-
    # one-element gives the binding without a second projection
    return f"transform(array({hs}), hs -> array({folds}))[0]"


def main() -> None:
    from calcite_spark.session import get_spark
    from calcite_spark.queries.inventory import catalog_for

    spark = get_spark("minhash_ab")
    cat = catalog_for(spark, SF_DIR)
    docs = cat.table("documents")
    norm = normalize_text("text")
    sh = shingles(norm, 5)

    a_expr = minhash_signature(sh)
    b_expr = minhash_signature_b(sh)

    a_df = docs.selectExpr("doc_id AS id", f"{a_expr} AS sig")
    b_df = docs.selectExpr("doc_id AS id", f"{b_expr} AS sig")

    # bit-identical check (every row, both directions)
    mism = (
        a_df.toDF("id", "sa").join(b_df.toDF("id", "sb"), "id")
        .filter("sa <> sb")
        .count()
    )
    n = a_df.count()
    print(f"rows={n} mismatches={mism}")
    assert mism == 0

    def bench(df, label):
        best = None
        for _ in range(REPS):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        print(f"{label}: min-of-{REPS} {best:.3f}s")
        return best

    # interleave to cancel drift
    bench(a_df, "warmup_a")
    bench(b_df, "warmup_b")
    ta = bench(a_df, "form_a")
    tb = bench(b_df, "form_b")
    ta2 = bench(a_df, "form_a_2")
    tb2 = bench(b_df, "form_b_2")
    print(
        f"A min {min(ta, ta2):.3f}s  B min {min(tb, tb2):.3f}s  "
        f"speedup {min(ta, ta2) / min(tb, tb2):.2f}x  loadavg={os.getloadavg()[0]:.2f}"
    )


if __name__ == "__main__":
    main()
