from calcite_spark.functions.registry import (
    FUNCTIONS,
    FnDef,
    libraries,
    lookup,
    translate,
)

__all__ = ["FUNCTIONS", "FnDef", "libraries", "lookup", "translate"]
