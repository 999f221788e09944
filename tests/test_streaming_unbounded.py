"""Unbounded-source streaming tests (streaming/sources.py ≈
KafkaStreamTable.java:54): TUMBLE/SESSION aggregation and stream-stream
join with watermarks on true unbounded / multi-micro-batch input, with
state-store metrics asserted — the behaviors a bounded file replay
cannot exercise (late-row DROPS require the watermark to advance in an
earlier micro-batch than the late row).
"""

from __future__ import annotations

import json
import time

import pytest

from pyspark.sql import functions as F

from calcite_spark.streaming.sources import (
    ControlledStreamSource,
    RateStreamTable,
    register_stream,
    stream_of,
)
from calcite_spark.streaming.tvf import session, tumble, tumble_grouped, with_watermark


def _progress(q) -> list[dict]:
    return [json.loads(p.json) if hasattr(p, "json") else p for p in q.recentProgress]


def _state_metric(q, key: str) -> int:
    total = 0
    for p in _progress(q):
        for op in p.get("stateOperators", []):
            total += int(op.get(key, 0) or 0)
    return total


def test_rate_source_unbounded_tumble(spark):
    """The rate stand-in for a Kafka topic: deterministic event schema,
    never-terminating query, windowed agg keeps producing updates."""
    src = RateStreamTable(rows_per_second=500)
    df = src.stream(spark)
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == ["ts", "event_id", "event_type", "value"]
    agg = (
        tumble(with_watermark(df, "ts", "5 seconds"), "ts", "2 seconds")
        .groupBy("window_start", "event_type")
        .agg(F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("t_rate_out")
        .start()
    )
    try:
        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) AS n FROM t_rate_out").collect()[0].n
            if n > 0:
                break
            time.sleep(0.5)
        assert n > 0, "rate source produced no windowed rows in 30s"
        assert q.isActive  # unbounded: still running, not finished
        types = {
            r.event_type for r in spark.sql("SELECT DISTINCT event_type FROM t_rate_out").collect()
        }
        assert types <= {"type_0", "type_1", "type_2", "type_3"}
    finally:
        q.stop()


def test_watermark_drops_late_rows(spark):
    """A row older than (max event time − delay − window) arriving in a
    LATER micro-batch must be dropped, visibly in both the answer and
    numRowsDroppedByWatermark."""
    src = ControlledStreamSource(spark, "ts timestamp, k string, v double")
    agg = (
        tumble_grouped(with_watermark(src.stream(), "ts", "1 hour"), "ts", "1 hour", ("k",))
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .select(F.col("window.start").alias("window_start"), "k", "n", "s")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_late_out")
        .start()
    )
    try:
        # batch 1: watermark after it = 11:59 - 1h = 10:59
        src.add_batch(
            [
                {"ts": "2024-01-01 10:00:00", "k": "a", "v": 1.0},
                {"ts": "2024-01-01 10:30:00", "k": "a", "v": 2.0},
                {"ts": "2024-01-01 11:59:00", "k": "b", "v": 4.0},
            ]
        )
        q.processAllAvailable()
        # batch 2: 09:00 window closed (end 10:00 < watermark 10:59) → DROP;
        # 11:30 is on time
        src.add_batch(
            [
                {"ts": "2024-01-01 09:00:00", "k": "a", "v": 100.0},
                {"ts": "2024-01-01 11:30:00", "k": "b", "v": 8.0},
            ]
        )
        q.processAllAvailable()
        # batch 3: flush — advance watermark far ahead so all windows emit
        src.add_batch([{"ts": "2024-01-02 12:00:00", "k": "z", "v": 0.0}])
        q.processAllAvailable()

        rows = {
            (str(r.window_start), r.k): (r.n, r.s)
            for r in spark.sql("SELECT * FROM t_late_out").collect()
        }
        # the late 09:00 row contributed nowhere
        assert ("2024-01-01 09:00:00", "a") not in rows
        assert all(s < 100.0 for _, s in rows.values())
        # on-time rows all arrived
        assert rows[("2024-01-01 10:00:00", "a")] == (2, 3.0)
        assert rows[("2024-01-01 11:00:00", "b")] == (2, 12.0)
        assert _state_metric(q, "numRowsDroppedByWatermark") >= 1
    finally:
        q.stop()
        src.close()


def test_stream_stream_join_with_watermark(spark):
    """Stream-stream inner join with event-time range condition: both
    sides watermarked, matches within the interval produced exactly
    once, state bounded by the range condition."""
    left = ControlledStreamSource(spark, "lts timestamp, k string, lv int")
    right = ControlledStreamSource(spark, "rts timestamp, k string, rv int")
    l = with_watermark(left.stream(), "lts", "30 minutes").withColumnRenamed("k", "lk")
    r = with_watermark(right.stream(), "rts", "30 minutes")
    joined = l.join(
        r,
        F.expr(
            "lk = k AND rts BETWEEN lts AND lts + INTERVAL 10 MINUTES"
        ),
        "inner",
    ).select("lk", "lv", "rv", "lts", "rts")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_ssj_out")
        .start()
    )
    try:
        left.add_batch(
            [
                {"lts": "2024-01-01 10:00:00", "k": "a", "lv": 1},
                {"lts": "2024-01-01 10:00:00", "k": "b", "lv": 2},
            ]
        )
        right.add_batch(
            [
                {"rts": "2024-01-01 10:05:00", "k": "a", "rv": 10},  # in range
                {"rts": "2024-01-01 10:20:00", "k": "b", "rv": 20},  # out of range
                {"rts": "2024-01-01 10:09:00", "k": "c", "rv": 30},  # no key match
            ]
        )
        q.processAllAvailable()
        got = {(r.lk, r.lv, r.rv) for r in spark.sql("SELECT * FROM t_ssj_out").collect()}
        assert got == {("a", 1, 10)}
    finally:
        q.stop()
        left.close()
        right.close()


def test_session_window_merges_across_batches(spark):
    """SESSION on a stream: state-store-backed gap merge — rows arriving
    in different micro-batches within the gap must fuse into ONE session."""
    src = ControlledStreamSource(spark, "ts timestamp, k string")
    grouped = session(
        with_watermark(src.stream(), "ts", "1 hour"), "ts", "10 minutes", ("k",)
    )
    agg = grouped.agg(F.count("*").alias("n"))
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_sess_out")
        .start()
    )
    try:
        src.add_batch(
            [
                {"ts": "2024-01-01 10:00:00", "k": "a"},
                {"ts": "2024-01-01 10:05:00", "k": "a"},
            ]
        )
        q.processAllAvailable()
        # second batch extends the same session (gap 8 min < 10 min)
        src.add_batch([{"ts": "2024-01-01 10:13:00", "k": "a"}])
        q.processAllAvailable()
        # flush: close the session by advancing the watermark
        src.add_batch([{"ts": "2024-01-01 20:00:00", "k": "z"}])
        q.processAllAvailable()
        rows = [
            (r.k, r.n, str(r.session_window.start), str(r.session_window.end))
            for r in spark.sql("SELECT * FROM t_sess_out WHERE k = 'a'").collect()
        ]
        assert rows == [("a", 3, "2024-01-01 10:00:00", "2024-01-01 10:23:00")]
    finally:
        q.stop()
        src.close()


def test_catalog_stream_registration(spark):
    """register_stream/stream_of ≈ mounting a Kafka table in the model:
    a registered rate table and a parquet fallback replay both yield
    streaming frames."""
    from calcite_spark.catalog import Catalog
    from tests.conftest import SF_DIR

    cat = Catalog(spark).register_parquet_dir(SF_DIR)
    register_stream(cat, "firehose", RateStreamTable(rows_per_second=10))
    assert stream_of(cat, "firehose").isStreaming
    # unregistered parquet table falls back to file replay
    assert stream_of(cat, "orders").isStreaming
    with pytest.raises(KeyError):
        stream_of(cat, "nope")


def test_streaming_match_recognize_across_batches(spark):
    """Streaming MATCH_RECOGNIZE spike (streaming/match_stream.py): a
    bounded pattern (A B+ WITHIN 60s) over the controlled rig. The match
    rows all arrive in batch 1 but emission happens in batch 2, when the
    key's event time passes start+WITHIN (deterministic finalization) —
    matches cross micro-batch boundaries, exactly once, with SKIP PAST
    sequencing."""
    from calcite_spark.streaming.match_stream import match_recognize_stream

    src = ControlledStreamSource(spark, "ts timestamp, k string, v double")
    out = match_recognize_stream(
        src.stream(),
        partition_by=["k"],
        ts_col="ts",
        pattern="A B+",
        define={"A": "v < 10", "B": "v >= 10"},
        measures={"n_rows": "COUNT(*)", "last_v": "LAST(v)", "start_ts": "FIRST(ts)"},
        within=60.0,
    )
    assert out.isStreaming
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_mr_out")
        .start()
    )
    try:
        # batch 1: a complete A B B run — but not yet finalizable
        src.add_batch(
            [
                {"ts": "2024-01-01 10:00:00", "k": "a", "v": 5.0},
                {"ts": "2024-01-01 10:00:10", "k": "a", "v": 15.0},
                {"ts": "2024-01-01 10:00:20", "k": "a", "v": 18.0},
            ]
        )
        q.processAllAvailable()
        assert spark.sql("SELECT count(*) AS n FROM t_mr_out").collect()[0].n == 0

        # batch 2: event at 10:05 pushes the watermark past the match
        # deadline (10:01). Emission happens once the WATERMARK passes —
        # either via the armed event-time timeout (often an extra
        # micro-batch inside this processAllAvailable) or in the next
        # data batch; both are watermark-correct, so accept 0 or 1 here.
        src.add_batch([{"ts": "2024-01-01 10:05:00", "k": "a", "v": 3.0}])
        q.processAllAvailable()
        assert spark.sql("SELECT count(*) AS n FROM t_mr_out").collect()[0].n <= 1

        # batch 3: watermark is definitely past 10:01:00 → match emitted
        src.add_batch([{"ts": "2024-01-01 10:10:00", "k": "a", "v": 60.0}])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM t_mr_out").collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.k, r.match_seq, r.n_rows, r.last_v) == ("a", 1, 3, 18.0)
        assert str(r.start_ts) == "2024-01-01 10:00:00"

        # batch 4: far-future event; the lone buffered A (10:05, v=3)
        # never grows a B within 60s -> no second match
        src.add_batch([{"ts": "2024-01-01 12:00:00", "k": "a", "v": 50.0}])
        q.processAllAvailable()
        assert spark.sql("SELECT count(*) AS n FROM t_mr_out").collect()[0].n == 1
        assert q.isActive
    finally:
        q.stop()
        src.close()


def test_streaming_match_recognize_quiet_key_drains(spark):
    """A key whose match completed but that then goes QUIET must still
    emit: the event-time timeout fires once the GLOBAL watermark (driven
    by other keys) passes the match deadline. Also exercises non-JSON
    column types (a date measure) through the typed state codec."""
    from calcite_spark.streaming.match_stream import match_recognize_stream

    src = ControlledStreamSource(spark, "ts timestamp, k string, v double, d date")
    out = match_recognize_stream(
        src.stream(),
        partition_by=["k"],
        ts_col="ts",
        pattern="A B+",
        define={"A": "v < 10", "B": "v >= 10"},
        measures={"n_rows": "COUNT(*)", "first_d": "FIRST(d)"},
        within=60.0,
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_mrq_out")
        .start()
    )
    try:
        # batch 1: key b completes A B B, then NEVER speaks again
        src.add_batch(
            [
                {"ts": "2024-01-01 10:00:00", "k": "b", "v": 5.0, "d": "2024-02-01"},
                {"ts": "2024-01-01 10:00:10", "k": "b", "v": 15.0, "d": "2024-02-02"},
                {"ts": "2024-01-01 10:00:20", "k": "b", "v": 18.0, "d": "2024-02-03"},
                {"ts": "2024-01-01 10:00:00", "k": "a", "v": 99.0, "d": "2024-02-04"},
            ]
        )
        q.processAllAvailable()
        # batches 2-3: ONLY key a advances the watermark past b's deadline
        src.add_batch([{"ts": "2024-01-01 10:05:00", "k": "a", "v": 99.0, "d": "2024-02-05"}])
        q.processAllAvailable()
        src.add_batch([{"ts": "2024-01-01 10:06:00", "k": "a", "v": 99.0, "d": "2024-02-06"}])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM t_mrq_out WHERE k = 'b'").collect()
        assert len(rows) == 1, rows
        assert rows[0].n_rows == 3
        assert str(rows[0].first_d) == "2024-02-01"
    finally:
        q.stop()
        src.close()


def test_streaming_match_recognize_guards(spark):
    """WITHIN is mandatory (unbounded patterns are undecidable on a
    stream) and PREV/NEXT are rejected in the spike surface."""
    from calcite_spark.streaming.match_stream import match_recognize_stream

    src = ControlledStreamSource(spark, "ts timestamp, k string, v double")
    try:
        with pytest.raises(ValueError, match="WITHIN"):
            match_recognize_stream(
                src.stream(), ["k"], "ts", "A+", {"A": "v > 0"}, {"n": "COUNT(*)"},
                within=None,
            )
        with pytest.raises(NotImplementedError, match="PREV"):
            match_recognize_stream(
                src.stream(), ["k"], "ts", "A+", {"A": "v > PREV(v)"},
                {"n": "COUNT(*)"}, within=60.0,
            )
    finally:
        src.close()


def test_streaming_match_recognize_decimal_key(spark):
    """Review regression: partition keys needing a JSON codec (decimal
    here) must be DECODED on emission — the buffered form is str, and an
    un-decoded key fails the pandas→Arrow cast for the output schema."""
    from pyspark.sql import functions as F

    from calcite_spark.streaming.match_stream import match_recognize_stream

    src = ControlledStreamSource(spark, "ts timestamp, k string, v double")
    stream = src.stream().withColumn("acct", F.expr("CAST(length(k) + 0.25 AS DECIMAL(10,2))"))
    out = match_recognize_stream(
        stream,
        partition_by=["acct"],
        ts_col="ts",
        pattern="A B+",
        define={"A": "v < 10", "B": "v >= 10"},
        measures={"n_rows": "COUNT(*)"},
        within=60.0,
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_mr_dec")
        .start()
    )
    try:
        src.add_batch(
            [
                {"ts": "2024-01-01 10:00:00", "k": "a", "v": 5.0},
                {"ts": "2024-01-01 10:00:10", "k": "a", "v": 15.0},
            ]
        )
        q.processAllAvailable()
        src.add_batch([{"ts": "2024-01-01 10:05:00", "k": "a", "v": 3.0}])
        q.processAllAvailable()
        src.add_batch([{"ts": "2024-01-01 10:10:00", "k": "a", "v": 60.0}])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM t_mr_dec").collect()
        assert len(rows) == 1
        import decimal

        assert rows[0].acct == decimal.Decimal("1.25")
        assert rows[0].n_rows == 2
    finally:
        q.stop()
        src.close()
