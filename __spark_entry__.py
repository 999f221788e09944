"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query smoke check at sf0.001.
queries()    — name → (spark, sf_dir) -> DataFrame, one per implemented
               operator/capability from SURVEY.md §2 (+ LLM-pipeline ops).
oracle_sql() — matching DuckDB SQL per query (driver's correctness gate);
               omitted for non-SQL-expressible ops (rows-only check).

Implementation lives in calcite_spark/ (catalog, algebra IR + rewrites,
operators, streaming TVFs, LLM ops); the inventory registry is
calcite_spark/queries/inventory.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from calcite_spark.queries import inventory as _inv


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    return _inv.queries()["z01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _inv.queries()


def oracle_sql() -> dict[str, str]:
    return _inv.oracle_sql()
