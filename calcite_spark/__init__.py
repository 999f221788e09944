"""calcite_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Apache Calcite (reference: apache/calcite
1.42.0).

Calcite is a SQL parser/validator/planner framework with a single-node
row-at-a-time runtime. This package reproduces its *capabilities* —
relational algebra surface (rel/core/*), function library
(SqlStdOperatorTable + SqlLibraryOperators), rewrite catalog (CoreRules),
materialized views, streaming SQL — on idiomatic PySpark: the logical plan
is declared with the DataFrame API, Catalyst+Tungsten pick the physical
strategy, and a small Python-side rewrite layer covers only what Catalyst
lacks (MV substitution, ASOF lowering, recursive CTE, MATCH_RECOGNIZE).
"""

from calcite_spark.session import get_spark
from calcite_spark.catalog import Catalog

__all__ = ["get_spark", "Catalog"]
__version__ = "0.1.0"
