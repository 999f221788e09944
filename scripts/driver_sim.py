"""Local simulation of the driver's correctness gate: run each
DRIVER_WINDOW query on Spark AND its DuckDB oracle at sf0.01, canonicalize
both (columns sorted by name, float rounding, pandas row sort — the exact
step that broke q83 in r4 on unhashable array cells), and compare row
count / schema / values. Usage:

    python scripts/driver_sim.py [query_name ...]   # default: all 50
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = os.environ.get("DRIVER_SIM_SF", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(pdf):
    import pandas as pd

    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == "float64":
            pdf[c] = pdf[c].round(6)
        # DTYPE-STRICT normalization (VERDICT r5 "what's wrong" #1): the
        # real driver hashes dtype-sensitively, so only NORMALIZE widths
        # within the integer family (int8/16/32 → int64, matching the
        # driver's canonicalizer), never paper over int-vs-float: a
        # DuckDB HUGEINT SUM surfaces as float64/object here and must
        # FAIL against Spark's int64 until the oracle CASTs to BIGINT.
        elif str(pdf[c].dtype) in ("int8", "int16", "int32"):
            pdf[c] = pdf[c].astype("int64")
        elif str(pdf[c].dtype) in ("uint8", "uint16", "uint32"):
            pdf[c] = pdf[c].astype("int64")
        elif str(pdf[c].dtype) == "uint64":
            # ADVICE r6: astype('int64') WRAPS for values >= 2^63
            # (numpy modular conversion) — convert only when every
            # value fits; otherwise keep uint64 so the strict compare
            # flags the column instead of coincidentally matching a
            # wrapped Spark value.
            import numpy as np

            if len(pdf) == 0 or (pdf[c] <= np.iinfo("int64").max).all():
                pdf[c] = pdf[c].astype("int64")
        elif str(pdf[c].dtype).startswith("datetime64"):
            # Spark toPandas yields ns, DuckDB fetchdf us — SAME logical
            # type; the real driver canonicalizes timestamps before
            # hashing (z40-z44 were green in r5 across this gap), so
            # normalize resolution rather than flag it.
            pdf[c] = pdf[c].astype("datetime64[us]")
        elif str(pdf[c].dtype) == "object":
            # DuckDB HUGEINT fetches as object(Decimal)/python-int —
            # keep as-is so the strict compare flags it.
            pass
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf


def main():
    import duckdb
    import pandas as pd

    from calcite_spark.queries import inventory
    from calcite_spark.session import get_spark

    spark = get_spark("driver-sim")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = inventory.queries()
    oracles = inventory.oracle_sql()
    targets = sys.argv[1:] or list(qs)[:50]
    n_pass = n_fail = 0
    for name in targets:
        try:
            spdf = _canon(qs[name](spark, SF_DIR).toPandas())
            if name not in oracles:
                print(f"{name}: rows-only, spark_rows={len(spdf)}")
                n_pass += 1
                continue
            odf = _canon(con.execute(oracles[name]).fetchdf())
            ok_rows = len(spdf) == len(odf)
            ok_schema = list(spdf.columns) == list(odf.columns)
            ok_vals = False
            if ok_rows and ok_schema:
                try:
                    pd.testing.assert_frame_equal(
                        spdf, odf, check_dtype=True, check_exact=False, atol=1e-4
                    )
                    ok_vals = True
                except AssertionError as e:
                    ok_vals = False
                    print(f"  diff: {str(e)[:200]}")
            status = "PASS" if (ok_rows and ok_schema and ok_vals) else "FAIL"
            if status == "PASS":
                n_pass += 1
            else:
                n_fail += 1
            print(
                f"{name}: {status} rows={len(spdf)}/{len(odf)} "
                f"schema={'ok' if ok_schema else f'{list(spdf.columns)} vs {list(odf.columns)}'}"
            )
        except Exception as e:
            n_fail += 1
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:300]}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
