from calcite_spark.plans.builder import RelBuilder
from calcite_spark.plans import ir

__all__ = ["RelBuilder", "ir"]
