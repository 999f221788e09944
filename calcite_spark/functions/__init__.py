from calcite_spark.functions.registry import (
    FUNCTIONS,
    FnDef,
    libraries,
    lookup,
    translate,
)

# self-registers the ST_ rows (SqlLibrary.SPATIAL analog) into FUNCTIONS
import calcite_spark.functions.spatial  # noqa: E402, F401

__all__ = ["FUNCTIONS", "FnDef", "libraries", "lookup", "translate"]
