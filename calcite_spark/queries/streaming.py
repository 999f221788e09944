"""Streaming-SQL surface queries (SURVEY.md §2.8) run in batch-TVF form —
exactly Calcite's model: TUMBLE/HOP/SESSION are *table functions*
(SqlStdOperatorTable TUMBLE:2606 HOP:2609 SESSION:2612) usable on any
relation; stream-ness (Delta/Chi, rel/stream/) is orthogonal. The same
builders run unchanged on `spark.readStream` inputs — see
calcite_spark/streaming/tvf.py and tests/test_streaming.py.

Also here: ASOF join (AsofJoin.java:34, spec core/src/test/resources/
sql/asof.iq — DuckDB has native ASOF JOIN for the oracle) and temporal
snapshot (Snapshot.java:53, FOR SYSTEM_TIME AS OF).
"""

from __future__ import annotations

from calcite_spark.plans.builder import RelBuilder
from calcite_spark.queries.inventory import catalog_for, register, snapshot_oracle
from calcite_spark.streaming.tvf import hop, session, tumble


def _b(spark, sf_dir) -> RelBuilder:
    return RelBuilder(catalog_for(spark, sf_dir))


@register(
    "z40_tumble",
    oracle="""
    SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
           time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day' AS window_end,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 3) AS total_value
    FROM events
    GROUP BY window_start, window_end, event_type
    ORDER BY window_start, event_type
    """,
    tags=("streaming", "tumble", "tvf"),
)
def z40_tumble(spark, sf_dir):
    """TUMBLE TVF → F.window(ts, size): one aligned window per row."""
    from pyspark.sql import functions as F

    cat = catalog_for(spark, sf_dir)
    return (
        tumble(cat.table("events"), "ts", "1 day")
        .groupBy("window_start", "window_end", "event_type")
        .agg(
            F.expr("COUNT(*)").alias("n_events"),
            F.expr("ROUND(SUM(value), 3)").alias("total_value"),
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "z41_hop",
    oracle="""
    SELECT ws AS window_start, ws + INTERVAL '2 days' AS window_end,
           COUNT(*) AS n_events, ROUND(SUM(value), 3) AS total_value
    FROM (
      SELECT time_bucket(INTERVAL '1 day', ts) - k * INTERVAL '1 day' AS ws, value
      FROM events, (VALUES (0), (1)) AS shifts(k)
    )
    GROUP BY ws
    ORDER BY window_start
    """,
    tags=("streaming", "hop", "tvf"),
)
def z41_hop(spark, sf_dir):
    """HOP TVF → F.window(ts, size, slide): size/slide windows per row
    (oracle expands the same windows via a shift cross join)."""
    from pyspark.sql import functions as F

    cat = catalog_for(spark, sf_dir)
    return (
        hop(cat.table("events"), "ts", size="2 days", slide="1 day")
        .groupBy("window_start", "window_end")
        .agg(
            F.expr("COUNT(*)").alias("n_events"),
            F.expr("ROUND(SUM(value), 3)").alias("total_value"),
        )
        .orderBy("window_start")
    )


@register(
    "z42_session",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked
    )
    SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS session_start, COUNT(*) AS n_events,
           ROUND(SUM(value), 3) AS total_value
    FROM numbered
    WHERE user_id <= 500
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    tags=("streaming", "session", "tvf"),
)
def z42_session(spark, sf_dir):
    """SESSION TVF → F.session_window(ts, gap): gap-merged sessions.
    Oracle reproduces gap semantics with the lag/cumsum idiom."""
    from pyspark.sql import functions as F

    cat = catalog_for(spark, sf_dir)
    df = cat.table("events").filter("user_id <= 500")
    return (
        session(df, "ts", gap="30 minutes", partition_keys=("user_id",))
        .agg(
            F.expr("MIN(ts)").alias("session_start"),
            F.expr("COUNT(*)").alias("n_events"),
            F.expr("ROUND(SUM(value), 3)").alias("total_value"),
        )
        .select("user_id", "session_start", "n_events", "total_value")
        .orderBy("user_id", "session_start")
    )


@register(
    "z43_asof_join",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                  ORDER BY o_orderkey DESC) AS rn
        FROM orders
      ) WHERE rn = 1
    )
    SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
           o.o_orderkey, o.o_totalprice
    FROM (SELECT * FROM events WHERE user_id <= 300) e
    ASOF LEFT JOIN o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    ORDER BY e.event_id
    """,
    tags=("asof", "join"),
)
def z43_asof_join(spark, sf_dir):
    """LEFT_ASOF join (JoinRelType.LEFT_ASOF:94): each event picks the
    latest order of the same user at-or-before the event time. Lowered to
    the union/last-value plan (ONE shuffle, no row explosion) —
    operators/asof.py. The right side is deduplicated to one order per
    (custkey, orderdate) on BOTH sides so tie-breaking is deterministic
    (DuckDB's native ASOF picks an arbitrary row among equal keys).
    """
    from calcite_spark.operators.asof import asof_join

    cat = catalog_for(spark, sf_dir)
    events = cat.table("events").filter("user_id <= 300")
    # r14 optimization, results unchanged (driver_sim-verified):
    #  * the (custkey, orderdate)-dedup-to-max-orderkey pre-pass is folded
    #    into the asof window via right_order — among equal-orderdate
    #    orders the carried row is the max-orderkey one, which IS the
    #    row_number()=1 row the pre-pass kept (saves one Exchange + two
    #    Sorts over the whole orders table, see plans/r14/z43_*):
    #  * the left side's user_id <= 300 filter transfers to the equi key
    #    o_custkey (JoinPushTransitivePredicates semantics, applied by
    #    hand — Spark cannot see through the union lowering), so the
    #    pruning reaches the orders parquet scan.
    orders = cat.table("orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    ).filter("o_custkey <= 300")
    return (
        asof_join(
            events,
            orders,
            on=[("user_id", "o_custkey")],
            left_ts="ts",
            right_ts="o_orderdate",
            direction="backward",
            strict=False,
            join_type="LEFT_ASOF",
            right_order=("o_orderkey",),
        )
        .selectExpr("event_id", "user_id", "ts", "o_orderkey", "o_totalprice")
        .orderBy("event_id")
    )


@register(
    "z44_snapshot",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate
    FROM (
      SELECT *, row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
      WHERE o_orderdate <= TIMESTAMP '1995-06-30 00:00:00'
    ) WHERE rn = 1 AND o_custkey <= 300
    ORDER BY o_custkey
    """,
    tags=("temporal", "snapshot"),
)
def z44_snapshot(spark, sf_dir):
    """FOR SYSTEM_TIME AS OF '1995-06-30' over orders-as-temporal-table
    (key = o_custkey, version = o_orderdate): latest visible version per
    key ≈ Snapshot.java:53 over TemporalTable.java:22."""
    return (
        _b(spark, sf_dir)
        .scan("orders")
        .snapshot(
            "TIMESTAMP '1995-06-30 00:00:00'",
            key="o_custkey",
            version_col="o_orderdate",
            tiebreaker="o_orderkey DESC",
        )
        .filter("o_custkey <= 300")
        .project("o_custkey", "o_orderkey", "o_totalprice", "o_orderdate")
        .sort("o_custkey")
        .to_df()
    )


@register(
    "z45_match_recognize",
    oracle=snapshot_oracle("z45_match_recognize"),  # NFA not SQL-expressible; reviewed snapshot
    tags=("match_recognize",),
)
def z45_match_recognize(spark, sf_dir):
    """MATCH_RECOGNIZE (rel/core/Match.java:62): per-user V-shape on
    event value (STRT DOWN+ UP+ over ts order) — symbol classification
    in JVM window exprs, NFA per user via applyInPandas
    (operators/match_recognize.py)."""
    from calcite_spark.operators.match_recognize import match_recognize

    cat = catalog_for(spark, sf_dir)
    events = cat.table("events").filter("user_id <= 200").selectExpr(
        "user_id", "event_id", "ts", "value"
    )
    out = match_recognize(
        events,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        pattern="STRT DOWN{2,} UP{2,}",
        define={
            "DOWN": "value < PREV(value)",
            "UP": "value > PREV(value)",
        },
        measures={
            "start_event": "FIRST(STRT.event_id)",
            "bottom_value": "LAST(DOWN.value)",
            "end_event": "LAST(UP.event_id)",
            "n_rows": "COUNT(*)",
        },
    )
    return out.orderBy("user_id", "match_seq")


# z46_match_all_rows / z47_match_skip_subset retired from the registry in
# r10 (verdict item 2 option (b)): snapshot-only MATCH_RECOGNIZE variants
# of z45 — ALL ROWS PER MATCH and SKIP TO LAST/SUBSET/WITHIN stay covered
# by tests/test_match_recognize.py; the window slots went to the r10 rows.


@register(
    "qx10_match_stream",
    oracle="""
    SELECT 'a' AS k, CAST(1 AS BIGINT) AS match_seq,
           CAST(3 AS BIGINT) AS n_rows, CAST(18.0 AS DOUBLE) AS last_v,
           TIMESTAMP '2024-01-01 10:00:00' AS start_ts
    """,
    tags=("streaming", "match_recognize", "stateful"),
)
def qx10_match_stream(spark, sf_dir):
    """STREAMING MATCH_RECOGNIZE (streaming/match_stream.py): bounded
    pattern A B+ WITHIN 60s over the controlled micro-batch rig — the
    match's rows arrive in batch 1, finalization (event time passing
    start+WITHIN) happens in batch 2, so the emitted row crosses a
    micro-batch boundary. The run is deterministic end-to-end, so the
    oracle is the literal expected match; a wrong NFA, wrong
    finalization frontier, or double emission all hash-mismatch."""
    import uuid

    from calcite_spark.streaming.match_stream import match_recognize_stream
    from calcite_spark.streaming.sources import ControlledStreamSource

    src = ControlledStreamSource(spark, "ts timestamp, k string, v double")
    sink = f"qx10_mr_{uuid.uuid4().hex[:8]}"
    out = match_recognize_stream(
        src.stream(),
        partition_by=["k"],
        ts_col="ts",
        pattern="A B+",
        define={"A": "v < 10", "B": "v >= 10"},
        measures={"n_rows": "COUNT(*)", "last_v": "LAST(v)", "start_ts": "FIRST(ts)"},
        within=60.0,
    )
    # r14: the rig feeds single-digit-row control batches, but every
    # stateful micro-batch pays one state-store task PER SHUFFLE
    # PARTITION — at the session's 32 that was ~3× the whole run's cost
    # (13 s → 5.4 s measured). r15: the pin is DERIVED from the control
    # feed's key cardinality (a production stream sizes state-store
    # parallelism to its key count, not to a local constant), bounded by
    # the cluster parallelism; the session value is restored in finally,
    # whose span now also covers the conf.set and start() (ADVICE r14:
    # a start() failure used to leak the pin into the session).
    batches = [
        [
            {"ts": "2024-01-01 10:00:00", "k": "a", "v": 5.0},
            {"ts": "2024-01-01 10:00:10", "k": "a", "v": 15.0},
            {"ts": "2024-01-01 10:00:20", "k": "a", "v": 18.0},
        ],
        # two more control batches: the finalization frontier is the
        # GLOBAL watermark, which lags one micro-batch behind event time
        [{"ts": "2024-01-01 10:05:00", "k": "a", "v": 3.0}],
        [{"ts": "2024-01-01 10:10:00", "k": "a", "v": 2.0}],
    ]
    n_keys = len({r["k"] for b in batches for r in b})
    parts = max(1, min(spark.sparkContext.defaultParallelism, n_keys))
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    q = None
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        q = out.writeStream.outputMode("append").format("memory").queryName(sink).start()
        for batch in batches:
            src.add_batch(batch)
            q.processAllAvailable()
        rows = [r.asDict() for r in spark.sql(f"SELECT * FROM {sink}").collect()]
    finally:
        if q is not None:
            q.stop()
        src.close()
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.createDataFrame(
        rows, "k string, match_seq bigint, n_rows bigint, last_v double, start_ts timestamp"
    )


@register(
    "qx21_interval_join",
    oracle="""
    SELECT v.user_id, v.event_id AS view_id, v.ts AS view_ts,
           p.event_id AS purchase_id, p.ts AS purchase_ts,
           ROUND(p.value, 3) AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND p.ts BETWEEN v.ts AND v.ts + INTERVAL 30 MINUTE
    ORDER BY v.user_id, view_id, purchase_id
    """,
    tags=("streaming", "interval_join", "stream_stream"),
)
def qx21_interval_join(spark, sf_dir):
    """Stream-stream interval join in its batch form (stream.md:812:
    the join is legal because the time-range conjunct keeps the streams
    a finite distance apart): view→purchase conversions within 30
    minutes per user. The identical builder runs on readStream inputs
    with watermark-bounded state — tests/test_stream_join.py."""
    from pyspark.sql import functions as F

    from calcite_spark.streaming.join import interval_join

    ev = catalog_for(spark, sf_dir).table("events")
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return (
        interval_join(
            views,
            purchases,
            on="user_id",
            left_ts="view_ts",
            right_ts="purchase_ts",
            upper="30 minutes",
        )
        .select(
            "user_id",
            "view_id",
            "view_ts",
            "purchase_id",
            "purchase_ts",
            F.round("purchase_value", 3).alias("purchase_value"),
        )
        .orderBy("user_id", "view_id", "purchase_id")
    )
