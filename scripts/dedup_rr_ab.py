"""A/B: exact_dedup (z50) and minhash/simhash staged maps WITH the RR
parallelize-insurance vs WITHOUT, at sf0.1 (single-file inputs, so the
guard fires). Values are partitioning-invariant (groupBy digests); this
only times the plans. Interleaved in one JVM, min-of-N.

Usage: python scripts/dedup_rr_ab.py [n_reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from calcite_spark.catalog import open_catalog
from calcite_spark.llm.dedup import (
    DEFAULT_BANDS,
    DEFAULT_NUM_HASHES,
    minhash_signature,
    normalize_text,
    shingles,
    simhash64,
)
from calcite_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def exact_dedup_form(docs, rr: bool):
    from calcite_spark.exec import parallelize_input

    base = parallelize_input(docs) if rr else docs
    digest = f"md5({normalize_text('text')})"
    return (
        base.selectExpr(f"{digest} AS content_hash", "doc_id")
        .groupBy("content_hash")
        .agg(
            F.expr("MIN(doc_id)").alias("keep_id"),
            F.expr("COUNT(*)").alias("n_copies"),
        )
        .orderBy("content_hash")
    )


def minhash_sig_form(docs, rr: bool):
    from calcite_spark.exec import parallelize_input

    base = parallelize_input(docs) if rr else docs
    norm = normalize_text("text")
    return base.selectExpr(
        "doc_id AS __id",
        f"{minhash_signature(shingles(norm, 5), DEFAULT_NUM_HASHES)} AS __sig",
    )


def simhash_form(docs, rr: bool):
    from calcite_spark.exec import parallelize_input

    base = parallelize_input(docs) if rr else docs
    return (
        base.selectExpr(f"{simhash64(normalize_text('text'))} AS simhash", "doc_id")
        .groupBy("simhash")
        .agg(
            F.expr("MIN(doc_id)").alias("keep_id"),
            F.expr("COUNT(*)").alias("n_copies"),
        )
        .filter("n_copies > 1")
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = get_spark("dedup_rr_ab")
    cat = open_catalog(spark, SF_DIR)
    docs = cat.table("documents")

    for name, form in (
        ("z50 exact_dedup", exact_dedup_form),
        ("minhash sig", minhash_sig_form),
        ("q79 simhash", simhash_form),
    ):
        # warmup both
        noop(form(docs, True))
        noop(form(docs, False))
        t_rr, t_no = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            noop(form(docs, True))
            t_rr.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            noop(form(docs, False))
            t_no.append(time.perf_counter() - t0)
        print(
            f"{name:16s} RR min={min(t_rr):.3f}s  noRR min={min(t_no):.3f}s  "
            f"(medians {sorted(t_rr)[len(t_rr)//2]:.3f}/{sorted(t_no)[len(t_no)//2]:.3f})",
            flush=True,
        )
    print("loadavg", [round(x, 2) for x in os.getloadavg()])


if __name__ == "__main__":
    main()
