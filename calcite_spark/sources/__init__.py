from calcite_spark.sources.modify import delete_where, insert_into, merge_into, update_set

__all__ = ["insert_into", "delete_where", "update_set", "merge_into"]
