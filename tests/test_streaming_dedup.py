"""Streaming exact dedup with watermark-bounded state
(`llm.dedup.streaming_dedup`): first occurrence passes, in-window
duplicates drop, state evicts after the watermark passes (so the same
content is re-admitted — bounded state is the 100 TB posture)."""

from __future__ import annotations

import uuid

import pytest

from calcite_spark.llm.dedup import streaming_dedup
from calcite_spark.streaming.sources import ControlledStreamSource

SCHEMA = "ts timestamp, doc_id bigint, text string"


def _run(spark, src, **kw):
    name = f"sdedup_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_dedup(src.stream(), **kw)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    return q, name


def test_in_window_duplicates_drop(spark):
    src = ControlledStreamSource(spark, SCHEMA)
    q, name = _run(spark, src, watermark="1 hour")
    try:
        src.add_batch(
            [
                {"ts": "2024-01-01 10:00:00", "doc_id": 1, "text": "the cat sat"},
                # same content after normalization (case + whitespace)
                {"ts": "2024-01-01 10:01:00", "doc_id": 2, "text": "  The  CAT sat "},
                {"ts": "2024-01-01 10:02:00", "doc_id": 3, "text": "something else"},
            ]
        )
        q.processAllAvailable()
        # a later batch inside the watermark window: still a duplicate
        src.add_batch(
            [{"ts": "2024-01-01 10:30:00", "doc_id": 4, "text": "the cat sat"}]
        )
        q.processAllAvailable()
        ids = {r.doc_id for r in spark.sql(f"SELECT * FROM {name}").collect()}
        assert 1 in ids and 3 in ids
        assert 2 not in ids and 4 not in ids
    finally:
        q.stop()
        src.close()


def test_state_evicts_after_watermark(spark):
    src = ControlledStreamSource(spark, SCHEMA)
    q, name = _run(spark, src, watermark="10 minutes")
    try:
        src.add_batch(
            [{"ts": "2024-01-01 10:00:00", "doc_id": 1, "text": "repeat me"}]
        )
        q.processAllAvailable()
        # advance the watermark FAR past the first doc's event time...
        src.add_batch(
            [{"ts": "2024-01-01 12:00:00", "doc_id": 2, "text": "filler"}]
        )
        q.processAllAvailable()
        # one more batch so eviction (watermark from batch 2) is applied
        src.add_batch(
            [{"ts": "2024-01-01 12:05:00", "doc_id": 3, "text": "more filler"}]
        )
        q.processAllAvailable()
        # ...the same content arrives again: state for its digest is gone,
        # so it is ADMITTED (bounded-state semantics, not global dedup)
        src.add_batch(
            [{"ts": "2024-01-01 12:06:00", "doc_id": 4, "text": "repeat me"}]
        )
        q.processAllAvailable()
        ids = {r.doc_id for r in spark.sql(f"SELECT * FROM {name}").collect()}
        assert {1, 2, 3, 4} <= ids
    finally:
        q.stop()
        src.close()


def test_global_dedup_variant_keeps_state(spark):
    src = ControlledStreamSource(spark, SCHEMA)
    q, name = _run(spark, src, watermark="10 minutes", within_watermark=False)
    try:
        src.add_batch(
            [{"ts": "2024-01-01 10:00:00", "doc_id": 1, "text": "repeat me"}]
        )
        q.processAllAvailable()
        src.add_batch(
            [{"ts": "2024-01-01 12:00:00", "doc_id": 2, "text": "filler"}]
        )
        q.processAllAvailable()
        # hours later, same content: global variant still drops it
        src.add_batch(
            [{"ts": "2024-01-01 12:06:00", "doc_id": 3, "text": "repeat me"}]
        )
        q.processAllAvailable()
        ids = {r.doc_id for r in spark.sql(f"SELECT * FROM {name}").collect()}
        assert ids == {1, 2}
    finally:
        q.stop()
        src.close()
