from calcite_spark.sql.frontend import SqlFrontend, similar_to_regex

__all__ = ["SqlFrontend", "similar_to_regex"]
