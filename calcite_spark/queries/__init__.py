from calcite_spark.queries.inventory import QUERIES, queries, oracle_sql

__all__ = ["QUERIES", "queries", "oracle_sql"]
