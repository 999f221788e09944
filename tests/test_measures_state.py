"""SQL measures (context-sensitive aggregates ≈ MeasureRules/measure.iq)
and stateful streaming (applyInPandasWithState ≈ the custom stateful
operator tier of SURVEY §2.8) + stream-static join."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from calcite_spark.plans.builder import RelBuilder
from calcite_spark.queries.inventory import catalog_for
from tests.conftest import SF_DIR


def test_measures_expand_per_grouping(spark):
    cat = catalog_for(spark, SF_DIR)
    b = RelBuilder(cat).define_measure(
        "avg_discount_rate", "SUM(l_extendedprice * l_discount) / SUM(l_extendedprice)"
    )
    by_flag = (
        b.scan("lineitem")
        .aggregate(["l_returnflag"], ["ROUND(AGGREGATE(avg_discount_rate), 6) AS rate"])
        .sort("l_returnflag")
        .to_df()
        .collect()
    )
    # same measure, different grouping context
    b2 = RelBuilder(cat)  # measures persisted on the catalog
    overall = (
        b2.scan("lineitem")
        .aggregate([], ["ROUND(AGGREGATE(avg_discount_rate), 6) AS rate"])
        .to_df()
        .collect()
    )
    direct = cat.table("lineitem").selectExpr(
        "ROUND(SUM(l_extendedprice * l_discount) / SUM(l_extendedprice), 6) AS rate"
    ).collect()
    assert overall[0].rate == direct[0].rate
    assert len(by_flag) == 3 and all(0 < r.rate < 0.2 for r in by_flag)


def test_unknown_measure_raises(spark):
    cat = catalog_for(spark, SF_DIR)
    with pytest.raises(KeyError):
        RelBuilder(cat).scan("orders").aggregate([], ["AGGREGATE(nope) AS x"]).to_df()


def test_stream_static_join(spark):
    """Temporal/stream-enrichment join (§2.8): streaming events joined to
    the static customer dimension — Spark broadcasts the static side per
    micro-batch."""
    cat = catalog_for(spark, SF_DIR)
    batch = cat.table("events")
    stream = (
        spark.readStream.schema(spark.read.parquet(f"{SF_DIR}/events.parquet").schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(SF_DIR)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    cust = cat.table("customer")
    enriched = stream.join(cust, stream.user_id == cust.c_custkey, "inner").select(
        "event_id", "c_mktsegment", "value"
    )
    q = enriched.writeStream.outputMode("append").format("memory").queryName("ss_join").start()
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT COUNT(*) AS n FROM ss_join").collect()[0].n
    finally:
        q.stop()
    want = batch.join(cust, batch.user_id == cust.c_custkey, "inner").count()
    assert got == want > 0


def test_apply_in_pandas_with_state(spark):
    """Custom stateful operator: running per-user event count via
    applyInPandasWithState (≈ flatMapGroupsWithState) on a bounded
    stream, verified against the batch groupBy."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(SF_DIR)
        .filter("user_id <= 50")
    )

    def count_per_user(key, pdfs, state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})

    out = stream.groupBy("user_id").applyInPandasWithState(
        count_per_user,
        outputStructType="user_id bigint, n_events bigint",
        stateStructType="n bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = out.writeStream.outputMode("update").format("memory").queryName("state_out").start()
    try:
        q.processAllAvailable()
        got = {
            r.user_id: r.n_events
            for r in spark.sql(
                "SELECT user_id, MAX(n_events) AS n_events FROM state_out GROUP BY user_id"
            ).collect()
        }
    finally:
        q.stop()
    cat = catalog_for(spark, SF_DIR)
    want = {
        r.user_id: r.n
        for r in cat.table("events")
        .filter("user_id <= 50")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want and len(want) > 0
