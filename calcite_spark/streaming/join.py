"""Stream-to-stream and stream-to-table joins ≈ Calcite's streaming
join surface (site/_docs/stream.md:745 "Joining streams to tables",
stream.md:812 "Joining streams to streams"; planner side
rel/stream/StreamRules.java DeltaJoinTransposeRule).

Calcite's contract for a stream-stream join: it "makes sense if the
join condition somehow forces them to remain a finite distance from
one another" — i.e. an equi-key plus a bounded event-time range
(stream.md's example: ``s.rowtime BETWEEN o.rowtime AND o.rowtime +
INTERVAL '1' HOUR``). That is exactly Spark's stream-stream interval
join: watermarks on both inputs bound the state store, and the
time-range conjunct tells Spark when buffered rows can never match
again and may be evicted.

Scale posture (100 TB/day): state per side is bounded by
(watermark delay + interval width) x input rate, independent of total
history. The join itself is a key-partitioned symmetric hash join —
both sides shuffle once on the equi-keys; no broadcast, no driver
materialization. The same builder runs unchanged on batch DataFrames
(withWatermark is a no-op there), which is how the batch driver query
qx21 oracle-checks the semantics.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

# "10 minutes", "-1 hour", "30 seconds" — the subset of Spark interval
# syntax we validate driver-side so a typo fails at plan time, not as an
# opaque AnalysisException mid-stream
_INTERVAL_RE = re.compile(
    r"^\s*(-?\d+)\s+(second|seconds|minute|minutes|hour|hours|day|days)\s*$",
    re.I,
)

_UNIT_SECONDS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
}


def _interval_seconds(text: str) -> int:
    m = _INTERVAL_RE.match(text)
    if not m:
        raise ValueError(
            f"interval {text!r} not of the form '<n> <unit>' "
            "(unit in seconds/minutes/hours/days)"
        )
    qty, unit = int(m.group(1)), m.group(2).lower().rstrip("s")
    return qty * _UNIT_SECONDS[unit]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on,
    left_ts: str,
    right_ts: str,
    upper: str,
    lower: str = "0 seconds",
    how: str = "inner",
    left_watermark: str | None = None,
    right_watermark: str | None = None,
) -> DataFrame:
    """Join rows whose equi-keys match and whose event times satisfy
    ``right_ts BETWEEN left_ts + lower AND left_ts + upper``
    (stream.md:819-823; lower defaults to 0 = "at or after the left
    event", the doc example's shape).

    Streaming inputs REQUIRE both watermarks — that is what bounds the
    state store; Spark would otherwise buffer both streams forever.
    Outer joins additionally emit their null-extended rows only once
    the watermark passes the interval's far edge (correct, just late).

    Output columns: all left columns, then right's non-key columns;
    ``right_ts`` is kept (renamed with a ``right_`` prefix if it
    collides). Non-key name collisions other than the timestamp are an
    error — rename before joining, the same rule rel2sql applies.
    """
    lo, hi = _interval_seconds(lower), _interval_seconds(upper)
    if lo > hi:
        raise ValueError(f"lower bound {lower!r} exceeds upper bound {upper!r}")
    how_l = how.lower().replace("outer", "").strip("_ ")
    if how_l not in ("inner", "left", "right", "full"):
        raise ValueError(f"unsupported join type {how!r}")

    keys = [on] if isinstance(on, str) else list(on)
    if not keys:
        raise ValueError("interval_join requires at least one equi-key ('on')")

    streaming = left.isStreaming or right.isStreaming
    if streaming:
        if left_watermark is None or right_watermark is None:
            raise ValueError(
                "stream-stream join requires watermarks on BOTH inputs "
                "(they bound the state store; Calcite's 'finite distance' "
                "condition, stream.md:814)"
            )
    # with_watermark handles the Spark-4.1 parquet NTZ surface
    # (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) the same way the TVF
    # builders do — one shared implementation, not a re-derivation
    from calcite_spark.streaming.tvf import with_watermark

    if left_watermark is not None:
        left = with_watermark(left, left_ts, left_watermark)
    if right_watermark is not None:
        right = with_watermark(right, right_ts, right_watermark)

    # collision policy: keys merge (left's copy wins), the right
    # timestamp is auto-prefixed, anything else is refused
    lcols, rcols = left.columns, right.columns
    out_right_ts = right_ts
    if right_ts in lcols:
        out_right_ts = f"right_{right_ts}"
    clash = [
        c
        for c in rcols
        if c in lcols and c not in keys and c != right_ts
    ]
    if clash:
        raise ValueError(
            f"non-key columns {clash} exist on both sides — rename before "
            "joining (refuse-over-guess, matching the rel2sql surface)"
        )

    l, r = left.alias("__l"), right.alias("__r")
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"__l.{k}") == F.col(f"__r.{k}"))
    # seconds arithmetic keeps the expression NTZ-safe (events parquet
    # is TIMESTAMP_NTZ on Spark 4.1 — the r4 TVF-macro lesson) while
    # remaining a raw event-time comparison Spark's streaming planner
    # recognizes for state eviction
    lt, rt = F.col(f"__l.{left_ts}"), F.col(f"__r.{right_ts}")
    cond = cond & (rt >= lt + F.expr(f"INTERVAL {lo} SECOND"))
    cond = cond & (rt <= lt + F.expr(f"INTERVAL {hi} SECOND"))

    joined = l.join(r, cond, how_l)
    # key columns: a RIGHT/FULL join null-extends the LEFT side, so an
    # unmatched right row's key only exists on __r — coalesce, or every
    # unmatched row lands in one NULL key group downstream
    def _out_left(c):
        if c in keys and how_l in ("right", "full"):
            return F.coalesce(F.col(f"__l.{c}"), F.col(f"__r.{c}")).alias(c)
        return F.col(f"__l.{c}").alias(c)

    out = [_out_left(c) for c in lcols]
    out.append(F.col(f"__r.{right_ts}").alias(out_right_ts))
    out.extend(
        F.col(f"__r.{c}").alias(c)
        for c in rcols
        if c not in keys and c != right_ts
    )
    return joined.select(*out)


def stream_enrich(
    stream: DataFrame,
    table: DataFrame,
    on,
    how: str = "inner",
    broadcast: bool = True,
) -> DataFrame:
    """Stream-to-table join (stream.md:745): enrich an unbounded stream
    with a bounded dimension. The dimension is broadcast by default —
    at 100 TB/day of stream the dimension re-shuffling every
    micro-batch is the classic scale killer; a broadcast dim joins
    map-side with zero stream shuffle. Set broadcast=False for
    dimensions too large to broadcast (Spark plans a per-batch
    shuffled hash join instead)."""
    keys = [on] if isinstance(on, str) else list(on)
    dim = F.broadcast(table) if broadcast else table
    return stream.join(dim, keys, how)
