from calcite_spark.streaming.tvf import tumble, hop, session

__all__ = ["tumble", "hop", "session"]
