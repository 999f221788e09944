"""UDF / UDAF / UDTF / table-macro surface ≈ SURVEY §2.9:

* scalar UDF   ≈ schema/impl/ScalarFunctionImpl.java:45 (create :116)
* UDAF         ≈ schema/impl/AggregateFunctionImpl.java (init/add/result)
* UDTF         ≈ schema/impl/TableFunctionImpl.java (cursor-returning)
* table macro  ≈ schema/impl/TableMacroImpl.java (expands to a relation
                 at plan time — a Python function returning a DataFrame)
* JSON model   ≈ model/JsonFunction.java via Catalog.load_model

Default path is the Arrow-vectorized pandas_udf (the slow-path rule:
UDFs only where built-ins can't express the op; when unavoidable,
vectorize)."""

from __future__ import annotations

import importlib

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F


def register_scalar_udf(spark: SparkSession, name: str, fn, return_type: str, vectorized: bool = True):
    """fn: for vectorized=True a pd.Series->pd.Series callable (Arrow
    batches, ~10-100x row-at-a-time); else a plain python callable."""
    if vectorized:
        udf = F.pandas_udf(fn, return_type)
    else:
        udf = F.udf(fn, return_type)
    spark.udf.register(name, udf)
    return udf


def register_udaf_grouped(df_grouped, fn, schema: str):
    """UDAF via applyInPandas: fn(pdf) -> one-row pdf (init/add/merge/
    result collapsed into a per-group pandas reduction)."""
    return df_grouped.applyInPandas(fn, schema)


def register_table_function(spark: SparkSession, name: str, udtf_class):
    """Python UDTF (Spark 3.5+): class with eval() yielding rows.
    Usable in SQL as name(...) in FROM — the TableFunctionScan path
    (rel/core/TableFunctionScan.java:57)."""
    from pyspark.sql.functions import udtf

    wrapped = udtf_class if hasattr(udtf_class, "returnType") else None
    if wrapped is None:
        raise ValueError("decorate the class with @udtf(returnType=...) first")
    spark.udtf.register(name, udtf_class)
    return udtf_class


class TableMacro:
    """≈ TableMacroImpl: expands to a relational expression at plan time."""

    def __init__(self, catalog, fn):
        self.catalog = catalog
        self.fn = fn

    def __call__(self, *args, **kwargs) -> DataFrame:
        return self.fn(self.catalog, *args, **kwargs)


def register_table_macro(catalog, name: str, fn) -> TableMacro:
    macro = TableMacro(catalog, fn)
    macros = getattr(catalog, "table_macros", None)
    if macros is None:
        macros = catalog.table_macros = {}
    macros[name] = macro
    return macro


def load_functions_from_model(catalog, model_functions: list[dict]) -> None:
    """JSON-model function entries ≈ ModelHandler: [{"name": ...,
    "callable": "pkg.module:attr", "returnType": "double",
    "kind": "scalar"|"macro"}]."""
    for f in model_functions:
        mod_name, attr = f["callable"].split(":")
        fn = getattr(importlib.import_module(mod_name), attr)
        if f.get("kind", "scalar") == "macro":
            register_table_macro(catalog, f["name"], fn)
        else:
            register_scalar_udf(
                catalog.spark, f["name"], fn, f.get("returnType", "string"),
                vectorized=f.get("vectorized", True),
            )


def sample_double(s: "pd.Series") -> "pd.Series":
    """Demo scalar UDF used by the DDL CREATE FUNCTION test/docs."""
    return s * 2
