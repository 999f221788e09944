"""Execution utilities ≈ Calcite's observability surface:

* explain / plan dump ≈ rel/externalize/RelJson.java:114 + EXPLAIN
  formats (RelWriter): our IR explain plus Spark's formatted physical
  plan, and a parsed `plan_report` used by plan-quality tests (is the
  filter pushed? did the dimension broadcast? how many shuffles?).
* profiler ≈ profile/Profiler.java / ProfilerImpl.java: per-column
  cardinality/null/min-max statistics in ONE aggregation pass —
  feeds tile suggestion and broadcast decisions.
* cancellation ≈ DataContext cancel flag → cancelJobGroup.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def plan_report(df: DataFrame) -> dict:
    """Parse the formatted physical plan into the facts that matter for
    scale: pushed filters, read schema, join strategies, shuffle count."""
    text = explain_str(df, "formatted")
    return {
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", text),
        "read_schemas": re.findall(r"ReadSchema: ([^\n]+)", text),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", text)),
        "sort_merge_joins": len(re.findall(r"SortMergeJoin", text)),
        "shuffled_hash_joins": len(re.findall(r"ShuffledHashJoin", text)),
        "nested_loop_joins": len(re.findall(r"BroadcastNestedLoopJoin|CartesianProduct", text)),
        "exchanges": len(re.findall(r"\bExchange\b|\(\d+\) Exchange", text)),
        "top_k": bool(re.search(r"TakeOrderedAndProject", text)),
        "whole_stage_codegen": len(re.findall(r"WholeStageCodegen", text)),
        "text": text,
    }


def profile(catalog, table: str, columns=None) -> dict:
    """One-pass column profile ≈ ProfilerImpl: count, ndv (approx),
    nulls, min/max per column. Single aggregation → single scan."""
    df = catalog.table(table)
    columns = columns or df.columns
    exprs = ["COUNT(*) AS __rows"]
    numeric = {
        c: t
        for c, t in df.dtypes
        if t in ("int", "bigint", "double", "float", "smallint", "date") or t.startswith("decimal")
    }
    for c in columns:
        exprs.append(f"approx_count_distinct({c}) AS __ndv_{c}")
        exprs.append(f"COUNT(*) - COUNT({c}) AS __nulls_{c}")
        if c in numeric:
            exprs.append(f"MIN({c}) AS __min_{c}")
            exprs.append(f"MAX({c}) AS __max_{c}")
    row = df.selectExpr(*exprs).collect()[0].asDict()
    out = {"table": table, "rows": row["__rows"], "columns": {}}
    for c in columns:
        col = {
            "ndv": row[f"__ndv_{c}"],
            "nulls": row[f"__nulls_{c}"],
        }
        if c in numeric:
            col["min"] = row[f"__min_{c}"]
            col["max"] = row[f"__max_{c}"]
        # functional-dependency hint à la Profiler: unique key candidate
        col["unique_candidate"] = row[f"__ndv_{c}"] >= 0.98 * max(row["__rows"], 1)
        out["columns"][c] = col
    return out


def cancel_all(spark, group: str | None = None) -> None:
    """≈ DataContext cancel flag / VolcanoTimeoutException."""
    sc = spark.sparkContext
    if group:
        sc.cancelJobGroup(group)
    else:
        sc.cancelAllJobs()
