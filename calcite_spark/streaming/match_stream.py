"""Streaming MATCH_RECOGNIZE over applyInPandasWithState — bounded
patterns (WITHIN required) on unbounded input.

≈ the reference's streaming Match story: Calcite models MATCH_RECOGNIZE
on streams as the same Match node under a Delta
(rel/stream/Delta.java:38 + Match.java:63); engines that execute it
(Flink CEP-style) keep a per-key NFA with event-time semantics. The
Spark-first mapping here:

  * DEFINE predicates are evaluated STATELESSLY as projected boolean
    columns before the shuffle (PREV/NEXT are rejected — they would need
    cross-row context inside the state function; bounded-lookback
    support is the documented next step);
  * per-key state (GroupState) holds the row buffer, the emitted match
    counter, and the per-key event-time high-water mark;
  * a match starting at t0 is FINAL once t0 + WITHIN is behind the
    GLOBAL stream watermark: every row that could belong to it
    ([t0, t0+WITHIN]) has either arrived or been dropped by the
    watermark (a key-local high-water mark would NOT be safe — late
    rows newer than the watermark are still delivered), so emission is
    deterministic for any watermark_delay and exactly-once per match
    (AFTER MATCH SKIP PAST LAST ROW sequencing preserved across
    micro-batches; match_seq restarts if a fully-drained key's state is
    evicted and the key later reappears);
  * keys that go QUIET still finalize: an event-time timeout is armed at
    (earliest buffered row + WITHIN), so when the global watermark
    passes it the state function fires with no input and drains the
    buffer — without this, a completed match on a one-off key would be
    withheld forever and its state never evicted;
  * rows the sequential scan has passed are evicted from state (fully
    drained keys call state.remove()) — state size is O(rows per key
    within the WITHIN horizon), the same bound a stream-stream join
    keeps.

Scale: the only shuffle is the groupBy(partition keys) — identical to
the batch operator's applyInPandas shape; the NFA is the documented
Python path (Arrow-batched, inherently custom logic).
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import DataFrame

_MEASURE_FNS = ("COUNT", "FIRST", "LAST")


def _encoder_for(dtype: str):
    """JSON-safe encode/decode pair for a Spark simpleString dtype —
    state rows round-trip through json.dumps, so every buffered column
    needs a total encoding (timestamps/dates → iso, decimal → str,
    binary → base64), not just the pd.Timestamp special case."""
    import base64
    import decimal

    if dtype.startswith("timestamp") or dtype == "date":
        return (
            lambda v: v.isoformat() if hasattr(v, "isoformat") else v,
            lambda v: v,  # output conversion handled per out_schema
        )
    if dtype.startswith("decimal"):
        return (lambda v: str(v), lambda v: decimal.Decimal(v))
    if dtype == "binary":
        return (
            lambda v: base64.b64encode(bytes(v)).decode("ascii"),
            lambda v: base64.b64decode(v),
        )
    return (lambda v: v, lambda v: v)


def match_recognize_stream(
    stream_df: DataFrame,
    partition_by: list[str],
    ts_col: str,
    pattern: str,
    define: dict[str, str],
    measures: dict[str, str],
    within: float,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Unbounded MATCH_RECOGNIZE with event-time finalization.

    measures: out_name -> 'COUNT(*)' | 'FIRST(col)' | 'LAST(col)'.
    within: seconds the whole match must fit in (WITHIN interval) —
    REQUIRED: it is what bounds state and makes emission decidable on an
    unbounded stream (an unbounded pattern never knows it has finished).
    """
    import re

    from pyspark.sql.streaming.state import GroupStateTimeout

    from calcite_spark.operators.match_recognize import (
        _PREV_RE,
        _longest_match,
        compile_pattern,
    )
    from calcite_spark.session import ensure_package_shipped

    ensure_package_shipped(stream_df.sparkSession)
    if within is None or within <= 0:
        raise ValueError("streaming MATCH_RECOGNIZE requires a positive WITHIN bound")
    for sym, cond in define.items():
        if _PREV_RE.search(cond):
            raise NotImplementedError(
                "PREV/NEXT in streaming DEFINE needs bounded-lookback state; "
                "not in the spike surface"
            )

    nfa, symbols = compile_pattern(pattern)
    define = {k.upper(): v for k, v in define.items()}
    for s in symbols:
        define.setdefault(s, "true")

    # stateless symbol projection + epoch ordering column (stream-safe)
    work = stream_df.withWatermark(ts_col, watermark_delay)
    keep_cols = [c for c, _ in stream_df.dtypes]
    proj = keep_cols + [f"CAST(unix_micros({ts_col}) AS DOUBLE) / 1e6 AS __epoch"]
    proj += [
        f"coalesce(CAST(({define[s]}) AS BOOLEAN), false) AS __sym_{s}" for s in symbols
    ]
    work = work.selectExpr(*proj)

    # measures: COUNT(*) | FIRST(col) | LAST(col)
    in_dtypes = dict(stream_df.dtypes)
    parsed = []
    out_fields = []
    for out_name, mexpr in measures.items():
        m = re.match(r"^(COUNT|FIRST|LAST)\s*\(\s*(\*|\w+)\s*\)$", mexpr.strip(), re.I)
        if not m:
            raise ValueError(f"unsupported streaming measure: {mexpr}")
        fn, col = m.group(1).upper(), m.group(2)
        parsed.append((out_name, fn, None if col == "*" else col))
        out_fields.append(
            f"{out_name} bigint" if fn == "COUNT" else f"{out_name} {in_dtypes[col]}"
        )
    out_schema = ", ".join(
        [f"{k} {in_dtypes[k]}" for k in partition_by]
        + ["match_seq bigint"]
        + out_fields
    )
    state_schema = "buf string, seq bigint, max_epoch double"
    # serialize ONLY the columns the output needs (keys + measure args) —
    # each with a total JSON encoding for its dtype
    data_cols = list(dict.fromkeys(list(partition_by) + [c for _, _, c in parsed if c]))
    codecs = {c: _encoder_for(in_dtypes[c]) for c in data_cols}

    def run(key, pdfs, state):
        if state.exists:
            buf_json, seq, max_epoch = state.get
            buf = json.loads(buf_json)
        else:
            buf, seq, max_epoch = [], 0, float("-inf")
        if not state.hasTimedOut:
            for pdf in pdfs:
                for _, row in pdf.iterrows():
                    rec = {"__epoch": float(row["__epoch"])}
                    for c in data_cols:
                        rec[c] = codecs[c][0](row[c])
                    rec["__syms"] = [s for s in symbols if bool(row[f"__sym_{s}"])]
                    buf.append(rec)
                    max_epoch = max(max_epoch, rec["__epoch"])
        buf.sort(key=lambda r: r["__epoch"])
        # finalization frontier: the GLOBAL watermark ONLY. The key-local
        # high-water mark is NOT safe — a late row newer than the
        # watermark but older than the key's max is still delivered by
        # Spark and may belong to a match; only rows behind the watermark
        # are guaranteed dropped, so only watermark-passed deadlines are
        # final (emission is then deterministic for any watermark_delay).
        wm_epoch = (state.getCurrentWatermarkMs() or 0) / 1000.0
        frontier = wm_epoch - within

        syms_per_row = [set(r["__syms"]) for r in buf]
        out_rows = []
        i, n = 0, len(buf)
        while i < n:
            t0 = buf[i]["__epoch"]
            if t0 >= frontier:
                break  # not finalizable yet — keep from here in state
            end_limit = n
            while end_limit > i and buf[end_limit - 1]["__epoch"] - t0 > within:
                end_limit -= 1
            hit = _longest_match(nfa, syms_per_row, i, end_limit)
            if hit is None or hit[0] == i:
                i += 1
                continue
            end, classifiers = hit
            seq += 1
            rows = buf[i:end]
            # decode key values like FIRST/LAST measures do — buffered
            # rows hold the JSON-safe encoding (decimal→str, binary→b64)
            rec = {k: codecs[k][1](rows[0][k]) for k in partition_by}
            rec["match_seq"] = seq
            for out_name, fn, col in parsed:
                if fn == "COUNT":
                    rec[out_name] = len(rows)
                elif fn == "FIRST":
                    rec[out_name] = codecs[col][1](rows[0][col])
                else:
                    rec[out_name] = codecs[col][1](rows[-1][col])
            out_rows.append(rec)
            i = end  # AFTER MATCH SKIP PAST LAST ROW

        buf = buf[i:]  # evict consumed/expired prefix
        if buf:
            state.update((json.dumps(buf), seq, max_epoch))
            # arm the drain trigger: fire when the global watermark passes
            # the earliest possible match deadline for this key
            deadline_ms = int((buf[0]["__epoch"] + within) * 1000) + 1
            state.setTimeoutTimestamp(max(deadline_ms, int(wm_epoch * 1000) + 1))
        elif state.exists:
            # fully drained: REMOVE the state row (a kept-but-empty entry
            # would never time out again and leak per key forever).
            # Trade-off, documented: if the key later reappears,
            # match_seq restarts at 1 for its new lifetime.
            state.remove()
        col_types = [tuple(c.split()) for c in out_schema.split(", ")]
        out = pd.DataFrame(out_rows, columns=[c for c, _ in col_types])
        if len(out):  # timestamps/dates were serialized as iso strings
            for c, t in col_types:
                if t.startswith("timestamp"):
                    out[c] = pd.to_datetime(out[c])
                elif t == "date":
                    out[c] = pd.to_datetime(out[c]).dt.date
        yield out

    return work.groupBy(*partition_by).applyInPandasWithState(
        run,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
