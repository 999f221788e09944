"""Unbounded stream sources ≈ Calcite's infinite stream tables
(kafka/src/main/java/org/apache/calcite/adapter/kafka/KafkaStreamTable.java:54
— a Table whose enumerable never ends; core models it as a plain table
wrapped in Delta, rel/stream/Delta.java:38).

Spark-first mapping: a StreamTable yields a `readStream` DataFrame; the
TVF builders (streaming/tvf.py) and watermarks then apply unchanged —
identical query text over batch and unbounded inputs.

Three sources:

* RateStreamTable — truly unbounded (Spark's `rate` source) with a
  deterministic synthetic event schema derived from the row ordinal:
  the stand-in for a Kafka topic in environments without a broker.
* FileReplayStreamTable — bounded replay of a parquet table as a
  stream (one file per micro-batch); what the existing duality tests
  use, promoted to a catalog-registrable source.
* ControlledStreamSource — a TEST RIG: a temp-dir file stream whose
  `add_batch(rows)` + `process()` lets a test author exact micro-batch
  boundaries and event times, which is how watermark late-row-drop
  semantics become assertable (Spark advances the watermark at
  micro-batch end, so late data must arrive in a LATER batch).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession


class RateStreamTable:
    """Unbounded synthetic event stream (≈ KafkaStreamTable with a
    deterministic generator instead of a broker).

    Columns: ts TIMESTAMP, event_id BIGINT, event_type STRING,
    value DOUBLE — all pure functions of the rate source's `value`
    ordinal, so two consumers of the same table see the same rows.
    """

    def __init__(self, rows_per_second: int = 100, n_types: int = 4):
        self.rows_per_second = rows_per_second
        self.n_types = n_types

    def stream(self, spark: SparkSession) -> DataFrame:
        raw = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", str(self.rows_per_second))
            .load()
        )
        return raw.selectExpr(
            "timestamp AS ts",
            "value AS event_id",
            f"concat('type_', CAST(value % {self.n_types} AS STRING)) AS event_type",
            "CAST(pmod(value * 2654435761, 1000) AS DOUBLE) / 10.0 AS value",
        )


class FileReplayStreamTable:
    """Replay a parquet table as a stream, one file per trigger."""

    def __init__(self, path: str):
        self.path = path

    def stream(self, spark: SparkSession) -> DataFrame:
        schema = spark.read.parquet(self.path).schema
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("pathGlobFilter", os.path.basename(self.path))
            .parquet(os.path.dirname(self.path))
        )


class ControlledStreamSource:
    """Deterministic micro-batch injection for streaming tests.

    Rows are appended as one JSON file per `add_batch` call into a temp
    dir read by a file stream with maxFilesPerTrigger=1; pairing each
    add_batch with StreamingQuery.processAllAvailable() pins exactly
    which rows share a micro-batch — the precondition for testing
    watermark semantics (late rows are only DROPPED once a prior batch
    has advanced the watermark past them).
    """

    def __init__(self, spark: SparkSession, schema: str):
        self.spark = spark
        self.schema = schema
        self.dir = os.path.join(
            tempfile.gettempdir(), f"cs_stream_{uuid.uuid4().hex[:12]}"
        )
        os.makedirs(self.dir)
        self._n = 0

    def add_batch(self, rows: list[dict]) -> None:
        tmp = os.path.join(self.dir, f".batch_{self._n:05d}.json.tmp")
        with open(tmp, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.replace(tmp, os.path.join(self.dir, f"batch_{self._n:05d}.json"))
        self._n += 1

    def stream(self) -> DataFrame:
        return (
            self.spark.readStream.schema(self.schema)
            .option("maxFilesPerTrigger", "1")
            .json(self.dir)
        )

    def close(self) -> None:
        shutil.rmtree(self.dir, ignore_errors=True)


def register_stream(catalog, name: str, source) -> None:
    """Mount a stream table in the catalog (≈ model-file kafka table
    entry). `catalog.stream(name)` returns the unbounded DataFrame."""
    streams = getattr(catalog, "stream_tables", None)
    if streams is None:
        streams = catalog.stream_tables = {}
    streams[name] = source


def stream_of(catalog, name: str) -> DataFrame:
    src = getattr(catalog, "stream_tables", {}).get(name)
    if src is None:
        entry = catalog.tables.get(name)
        if entry is not None and entry.fmt == "parquet":
            src = FileReplayStreamTable(entry.path)
        else:
            raise KeyError(f"no stream table {name!r}")
    if isinstance(src, ControlledStreamSource):
        return src.stream()
    return src.stream(catalog.spark)
