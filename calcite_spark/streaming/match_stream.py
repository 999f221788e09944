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
  * a match starting at t0 is FINAL once the key has seen an event past
    t0 + WITHIN: every row that could belong to it ([t0, t0+WITHIN]) has
    either arrived or been dropped by the stream watermark, so emission
    is deterministic and exactly-once per match (AFTER MATCH SKIP PAST
    LAST ROW | TO NEXT ROW sequencing preserved across micro-batches);
  * rows the sequential scan has passed are evicted from state — state
    size is O(rows per key within the WITHIN horizon), the same bound a
    stream-stream join keeps.

Scale: the only shuffle is the groupBy(partition keys) — identical to
the batch operator's applyInPandas shape; the NFA is the documented
Python path (Arrow-batched, inherently custom logic).
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import DataFrame

_MEASURE_FNS = ("COUNT", "FIRST", "LAST")


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
    data_cols = keep_cols  # serialized into state (JSON; timestamps → iso)

    def run(key, pdfs, state):
        if state.exists:
            buf_json, seq, max_epoch = state.get
            buf = json.loads(buf_json)
        else:
            buf, seq, max_epoch = [], 0, float("-inf")
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                rec = {"__epoch": float(row["__epoch"])}
                for c in data_cols:
                    v = row[c]
                    rec[c] = v.isoformat() if isinstance(v, pd.Timestamp) else v
                rec["__syms"] = [s for s in symbols if bool(row[f"__sym_{s}"])]
                buf.append(rec)
                max_epoch = max(max_epoch, rec["__epoch"])
        buf.sort(key=lambda r: r["__epoch"])
        frontier = max_epoch - within  # matches starting before this are final

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
            hit = _longest_match(nfa, syms_per_row[:end_limit], i)
            if hit is None or hit[0] == i:
                i += 1
                continue
            end, classifiers = hit
            seq += 1
            rows = buf[i:end]
            rec = {k: rows[0][k] for k in partition_by}
            rec["match_seq"] = seq
            for out_name, fn, col in parsed:
                if fn == "COUNT":
                    rec[out_name] = len(rows)
                elif fn == "FIRST":
                    rec[out_name] = rows[0][col]
                else:
                    rec[out_name] = rows[-1][col]
            out_rows.append(rec)
            i = end  # AFTER MATCH SKIP PAST LAST ROW

        buf = buf[i:]  # evict consumed/expired prefix
        state.update((json.dumps(buf), seq, max_epoch))
        col_types = [tuple(c.split()) for c in out_schema.split(", ")]
        out = pd.DataFrame(out_rows, columns=[c for c, _ in col_types])
        if len(out):  # timestamps were serialized as iso strings in state
            for c, t in col_types:
                if t.startswith("timestamp"):
                    out[c] = pd.to_datetime(out[c])
        yield out

    return work.groupBy(*partition_by).applyInPandasWithState(
        run,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
