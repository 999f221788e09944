"""Query inventory: one named entry per operator/capability from
SURVEY.md §2, each with a DuckDB oracle SQL (the driver's correctness
gate). Registration mirrors how Calcite's Quidem scripts
(core/src/test/resources/sql/*.iq) pair a SQL statement with an expected
result — here the "expected" side is DuckDB running the oracle SQL on
the same parquet.

Conventions (driver contract):
  * every computed column is aliased IDENTICALLY in Spark and oracle SQL;
  * double aggregates are ROUND()ed on both sides (sum-order float noise);
  * queries take (spark, sf_dir) and return a DataFrame, lazily.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from calcite_spark.catalog import Catalog, open_catalog


@dataclass
class QueryDef:
    name: str
    fn: Callable  # (spark, sf_dir) -> DataFrame
    oracle: str | None  # DuckDB SQL or None (rows-only check)
    tags: tuple = ()
    doc: str = ""


QUERIES: dict[str, QueryDef] = {}

_CATALOGS: dict[tuple, Catalog] = {}


def catalog_for(spark: SparkSession, sf_dir: str) -> Catalog:
    key = (id(spark), sf_dir)
    if key not in _CATALOGS:
        _CATALOGS[key] = open_catalog(spark, sf_dir)
    return _CATALOGS[key]


def register(name: str, oracle: str | None = None, tags=(), doc: str = ""):
    def deco(fn):
        QUERIES[name] = QueryDef(name, fn, oracle, tuple(tags), doc or (fn.__doc__ or ""))
        return fn

    return deco


# -- driver contract surface ------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}


_LOADED = False


def _load_all():
    """Import all query modules (they self-register)."""
    global _LOADED
    if _LOADED:
        return
    import calcite_spark.queries.tpch  # noqa: F401
    import calcite_spark.queries.windows  # noqa: F401
    import calcite_spark.queries.streaming  # noqa: F401
    import calcite_spark.queries.llm  # noqa: F401
    import calcite_spark.queries.functions  # noqa: F401
    import calcite_spark.queries.semantics  # noqa: F401
    import calcite_spark.queries.tpch2  # noqa: F401
    import calcite_spark.queries.infra  # noqa: F401

    _LOADED = True
