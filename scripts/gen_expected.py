"""Generate expected-result parquet oracles for queries whose semantics
are deterministic but not expressible in DuckDB SQL (engine-specific
hash families: xxhash64 minhash/simhash bands, hyperplane LSH planes,
the MATCH_RECOGNIZE NFA).

The driver's correctness gate runs at sf0.01, so expected results are
pinned at that SF; the oracle SQL becomes a DuckDB read_parquet() scan
of the checked-in file. Testdata is driver-generated with seed=42
(TESTDATA.md) and read-only, so these snapshots are stable across
rounds. Regenerate (and re-review) with:

    python scripts/gen_expected.py

Review = eyeball the printed sample + row count before committing; the
point is a reviewed snapshot, not a self-fulfilling echo: any later
engine regression shows up as a hash mismatch against this file.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = "/root/testdata/sf0.01"
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "expected")

# queries whose oracle is a checked-in snapshot (see inventory docstrings)
SNAPSHOT_QUERIES = [
    "z45_match_recognize",
    "z55_minhash_lsh",
    "q79_simhash_dedup",
    "q80_lsh_knn",
    "qx07_simhash_neardup",
    "qx08_cosine_dups",
    "z56_fingerprint",
    "qx17_ivf_ann",
    # r6: seeded sample + HLL/percentile sketches — deterministic per
    # engine, so a reviewed snapshot pins them (VERDICT r5 missing #1)
    "z65_sample",
    "z69_approx_aggs",
    "qx51_mv_approx_distinct",
]


def expected_path(name: str) -> str:
    """Repo-absolute path of the snapshot parquet for `name` (sf0.01)."""
    return os.path.abspath(os.path.join(OUT_DIR, f"{name}_sf0.01.parquet"))


def main():
    from pyspark.sql import SparkSession

    from calcite_spark.queries import inventory

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("gen-expected")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = inventory.queries()
    os.makedirs(OUT_DIR, exist_ok=True)
    targets = sys.argv[1:] or SNAPSHOT_QUERIES  # argv limits regen scope
    for name in targets:
        df = qs[name](spark, SF_DIR)
        pdf = df.toPandas()
        print(f"{name}: {len(pdf)} rows, cols={list(pdf.columns)}")
        print(pdf.head(5).to_string())
        tmp = expected_path(name) + ".tmpdir"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        shutil.move(os.path.join(tmp, part), expected_path(name))
        shutil.rmtree(tmp)
    print("done:", os.listdir(OUT_DIR))


if __name__ == "__main__":
    main()
