"""Structured Streaming tests: the same TVF builders (streaming/tvf.py)
must run on `spark.readStream` inputs — Calcite's stream-table duality
(SELECT STREAM ≈ Delta wrap, rel/stream/Delta.java:38): identical query
text over a stream replay of the events table, driven to completion with
processAllAvailable and compared to the batch answer.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from calcite_spark.streaming.tvf import tumble, with_watermark
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_stream(spark):
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    schema = batch.schema
    # file-stream source needs a directory: stream the sf dir, glob to
    # the events file
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")
        .parquet(SF_DIR)
    )
    # same nanos→timestamp conversion the Catalog applies
    conv = "timestamp_micros(ts DIV 1000) AS ts" if dict(batch.dtypes)["ts"] == "bigint" else "ts"
    cols = [c for c in batch.columns if c != "ts"]
    return stream.selectExpr(*cols, conv), batch.selectExpr(*cols, conv)


def _tumble_agg(df):
    return (
        tumble(with_watermark(df, "ts", "1 hour"), "ts", "1 day")
        .groupBy("window_start", "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 3).alias("v"))
    )


def test_stream_tumble_matches_batch(spark, events_stream):
    stream_df, batch_df = events_stream
    assert stream_df.isStreaming
    agg = _tumble_agg(stream_df)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_stream_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.window_start, r.event_type): (r.n, r.v)
            for r in spark.sql("SELECT * FROM t_stream_out").collect()
        }
    finally:
        q.stop()
    want = {
        (r.window_start, r.event_type): (r.n, r.v) for r in _tumble_agg(batch_df).collect()
    }
    assert got == want
    assert len(want) > 0


def test_stream_filter_project_passthrough(spark, events_stream):
    """Delta pushes through Project/Filter (StreamRules.java:60-68) —
    in Spark this is just: the same narrow ops work on the stream."""
    stream_df, batch_df = events_stream
    out = stream_df.filter("value > 50").selectExpr("event_id", "value * 2 AS v2")
    q = out.writeStream.outputMode("append").format("memory").queryName("t_proj_out").start()
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT count(*) AS n, ROUND(SUM(v2), 3) AS s FROM t_proj_out").collect()[0]
    finally:
        q.stop()
    want = (
        batch_df.filter("value > 50")
        .selectExpr("count(*) AS n", "ROUND(SUM(value * 2), 3) AS s")
        .collect()[0]
    )
    assert (got.n, got.s) == (want.n, want.s)
