"""Stream-stream interval join (`streaming/join.py` ≈ stream.md:812
"Joining streams to streams"): batch/stream parity, watermark-bounded
state, outer-join null emission, and the validation surface."""

from __future__ import annotations

import uuid

import pytest

from calcite_spark.streaming.join import interval_join, stream_enrich
from calcite_spark.streaming.sources import ControlledStreamSource

ORDERS = "ts timestamp, order_id bigint, product string"
SHIPS = "ship_ts timestamp, order_id bigint, carrier string"


def _start(df, name=None):
    name = name or f"sj_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    return q, name


def _batch(spark, schema, rows):
    return spark.createDataFrame(
        spark.sparkContext.parallelize([]), schema
    ) if not rows else spark.createDataFrame(
        [tuple(r.values()) for r in rows],
        schema=schema.replace(" timestamp", " string"),
    ).selectExpr(
        *[
            f"CAST({c.split()[0]} AS timestamp) AS {c.split()[0]}"
            if "timestamp" in c
            else c.split()[0]
            for c in schema.split(", ")
        ]
    )


O_ROWS = [
    {"ts": "2024-01-01 10:17:00", "order_id": 5, "product": "cheese"},
    {"ts": "2024-01-01 10:17:05", "order_id": 6, "product": "beer"},
    {"ts": "2024-01-01 11:02:00", "order_id": 9, "product": "beer"},
    {"ts": "2024-01-01 11:24:11", "order_id": 12, "product": "wine"},
]
S_ROWS = [
    {"ship_ts": "2024-01-01 10:55:00", "order_id": 5, "carrier": "ups"},
    {"ship_ts": "2024-01-01 10:20:00", "order_id": 6, "carrier": "dhl"},
    {"ship_ts": "2024-01-01 11:58:00", "order_id": 9, "carrier": "ups"},
    {"ship_ts": "2024-01-01 11:44:00", "order_id": 12, "carrier": "dhl"},
    # ships 2h after order 5: outside BETWEEN ts AND ts + 1 hour
    {"ship_ts": "2024-01-01 12:30:00", "order_id": 5, "carrier": "fedex"},
    # no matching order at all
    {"ship_ts": "2024-01-01 10:00:00", "order_id": 99, "carrier": "dhl"},
]


def test_batch_matches_sql_between(spark):
    """The builder on BATCH inputs must equal the raw BETWEEN join —
    stream.md:819's exact query shape (ship within 1 hour of order)."""
    o = _batch(spark, ORDERS, O_ROWS)
    s = _batch(spark, SHIPS, S_ROWS)
    got = interval_join(
        o, s, on="order_id", left_ts="ts", right_ts="ship_ts", upper="1 hour"
    )
    o.createOrReplaceTempView("ij_orders")
    s.createOrReplaceTempView("ij_ships")
    want = spark.sql(
        """
        SELECT o.ts, o.order_id, o.product, s.ship_ts, s.carrier
        FROM ij_orders o JOIN ij_ships s
          ON o.order_id = s.order_id
         AND s.ship_ts BETWEEN o.ts AND o.ts + INTERVAL 1 HOUR
        """
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # the 2h-late shipment and the orphan shipment must not appear
    carriers = {r.carrier for r in got.collect()}
    assert "fedex" not in carriers
    assert {r.order_id for r in got.collect()} == {5, 6, 9, 12}


def test_stream_stream_inner(spark):
    osrc = ControlledStreamSource(spark, ORDERS)
    ssrc = ControlledStreamSource(spark, SHIPS)
    j = interval_join(
        osrc.stream(),
        ssrc.stream(),
        on="order_id",
        left_ts="ts",
        right_ts="ship_ts",
        upper="1 hour",
        left_watermark="2 hours",
        right_watermark="2 hours",
    )
    q, name = _start(j)
    try:
        osrc.add_batch(O_ROWS)
        ssrc.add_batch(S_ROWS)
        q.processAllAvailable()
        rows = spark.sql(f"SELECT * FROM {name}").collect()
        assert {(r.order_id, r.carrier) for r in rows} == {
            (5, "ups"),
            (6, "dhl"),
            (9, "ups"),
            (12, "dhl"),
        }
    finally:
        q.stop()
        osrc.close()
        ssrc.close()


def test_stream_state_evicts_late_match_dropped(spark):
    """A shipment arriving after the watermark has passed its order's
    interval is dropped — bounded state, the 100 TB/day posture."""
    osrc = ControlledStreamSource(spark, ORDERS)
    ssrc = ControlledStreamSource(spark, SHIPS)
    j = interval_join(
        osrc.stream(),
        ssrc.stream(),
        on="order_id",
        left_ts="ts",
        right_ts="ship_ts",
        upper="10 minutes",
        left_watermark="10 minutes",
        right_watermark="10 minutes",
    )
    q, name = _start(j)
    try:
        osrc.add_batch([{"ts": "2024-01-01 10:00:00", "order_id": 1, "product": "x"}])
        ssrc.add_batch([{"ship_ts": "2024-01-01 10:00:00", "order_id": 0, "carrier": "seed"}])
        q.processAllAvailable()
        # advance both watermarks far past order 1's join range
        osrc.add_batch([{"ts": "2024-01-01 12:00:00", "order_id": 2, "product": "y"}])
        ssrc.add_batch([{"ship_ts": "2024-01-01 12:00:00", "order_id": 3, "carrier": "adv"}])
        q.processAllAvailable()
        # in-range by event time, but the state for order 1 is evicted
        ssrc.add_batch([{"ship_ts": "2024-01-01 10:05:00", "order_id": 1, "carrier": "late"}])
        q.processAllAvailable()
        carriers = {r.carrier for r in spark.sql(f"SELECT * FROM {name}").collect()}
        assert "late" not in carriers
    finally:
        q.stop()
        osrc.close()
        ssrc.close()


def test_stream_left_outer_emits_null_after_horizon(spark):
    """LEFT join: an unmatched order emits null-extended once the
    watermark passes ts + upper (late, never wrong)."""
    osrc = ControlledStreamSource(spark, ORDERS)
    ssrc = ControlledStreamSource(spark, SHIPS)
    j = interval_join(
        osrc.stream(),
        ssrc.stream(),
        on="order_id",
        left_ts="ts",
        right_ts="ship_ts",
        upper="10 minutes",
        how="left",
        left_watermark="1 minute",
        right_watermark="1 minute",
    )
    q, name = _start(j)
    try:
        osrc.add_batch([{"ts": "2024-01-01 10:00:00", "order_id": 1, "product": "x"}])
        ssrc.add_batch([{"ship_ts": "2024-01-01 10:01:00", "order_id": 99, "carrier": "c"}])
        q.processAllAvailable()
        # push both watermarks far past 10:10 + delay
        osrc.add_batch([{"ts": "2024-01-01 13:00:00", "order_id": 2, "product": "y"}])
        ssrc.add_batch([{"ship_ts": "2024-01-01 13:00:00", "order_id": 98, "carrier": "c"}])
        q.processAllAvailable()
        rows = [r for r in spark.sql(f"SELECT * FROM {name}").collect() if r.order_id == 1]
        assert len(rows) == 1 and rows[0].carrier is None
    finally:
        q.stop()
        osrc.close()
        ssrc.close()


def test_streaming_requires_watermarks(spark):
    osrc = ControlledStreamSource(spark, ORDERS)
    ssrc = ControlledStreamSource(spark, SHIPS)
    try:
        with pytest.raises(ValueError, match="watermarks on BOTH"):
            interval_join(
                osrc.stream(),
                ssrc.stream(),
                on="order_id",
                left_ts="ts",
                right_ts="ship_ts",
                upper="1 hour",
            )
    finally:
        osrc.close()
        ssrc.close()


def test_validation_surface(spark):
    o = _batch(spark, ORDERS, O_ROWS)
    s = _batch(spark, SHIPS, S_ROWS)
    with pytest.raises(ValueError, match="exceeds upper"):
        interval_join(
            o, s, on="order_id", left_ts="ts", right_ts="ship_ts",
            lower="2 hours", upper="1 hour",
        )
    with pytest.raises(ValueError, match="interval"):
        interval_join(
            o, s, on="order_id", left_ts="ts", right_ts="ship_ts", upper="1 fortnight"
        )
    with pytest.raises(ValueError, match="at least one equi-key"):
        interval_join(o, s, on=[], left_ts="ts", right_ts="ship_ts", upper="1 hour")
    # non-key collision refused
    s2 = s.withColumnRenamed("carrier", "product")
    with pytest.raises(ValueError, match="both sides"):
        interval_join(
            o, s2, on="order_id", left_ts="ts", right_ts="ship_ts", upper="1 hour"
        )


def test_full_outer_batch_keys_coalesced(spark):
    """RIGHT/FULL joins null-extend the LEFT side: an unmatched right
    row must surface its own key, not NULL (review finding r5)."""
    o = _batch(spark, ORDERS, O_ROWS)
    s = _batch(spark, SHIPS, S_ROWS)
    got = interval_join(
        o, s, on="order_id", left_ts="ts", right_ts="ship_ts",
        upper="1 hour", how="full",
    )
    rows = got.collect()
    # the orphan shipment (order 99) keeps its key
    orphan = [r for r in rows if r.carrier == "dhl" and r.product is None]
    assert any(r.order_id == 99 for r in orphan)
    assert all(r.order_id is not None for r in rows)


def test_ts_collision_prefixes(spark):
    """Same timestamp column name on both sides → right side lands as
    right_<name>, no silent overwrite."""
    o = _batch(spark, ORDERS, O_ROWS)
    s = _batch(spark, SHIPS, S_ROWS).withColumnRenamed("ship_ts", "ts")
    got = interval_join(
        o, s, on="order_id", left_ts="ts", right_ts="ts", upper="1 hour"
    )
    assert "right_ts" in got.columns and got.columns.count("ts") == 1
    assert got.count() == 4


def test_stream_enrich_broadcasts(spark):
    """Dim side of a stream-table join must be broadcast (no per-batch
    dim shuffle)."""
    osrc = ControlledStreamSource(spark, ORDERS)
    dim = spark.createDataFrame(
        [(5, "dairy"), (6, "drinks")], "order_id bigint, category string"
    )
    j = stream_enrich(osrc.stream(), dim, on="order_id")
    q, name = _start(j)
    try:
        osrc.add_batch(O_ROWS[:2])
        q.processAllAvailable()
        rows = spark.sql(f"SELECT * FROM {name}").collect()
        assert {(r.order_id, r.category) for r in rows} == {(5, "dairy"), (6, "drinks")}
    finally:
        q.stop()
        osrc.close()
    # batch plan shape: broadcast hint visible
    b = stream_enrich(_batch(spark, ORDERS, O_ROWS), dim, on="order_id")
    assert "BroadcastHashJoin" in b._jdf.queryExecution().executedPlan().toString()
