"""Quidem-analog script tests (`calcite_spark/testkit.py` ≈
QuidemTest.java/CoreQuidemTest.java running the 46 core `.iq` scripts):
every script under tests/iq/ runs against the SqlFrontend; `!oracle`
statements are value-compared Spark-vs-DuckDB, `!ok` against recorded
blocks, `!plan` against physical-plan fragments, `!error` against
refusal messages."""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

from calcite_spark.queries.inventory import catalog_for
from calcite_spark.sql.frontend import SqlFrontend
from calcite_spark.testkit import QuidemRunner

SF_DIR = "/root/testdata/sf0.001"
IQ_DIR = os.path.join(os.path.dirname(__file__), "iq")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def runner(spark):
    fe = SqlFrontend(catalog_for(spark, SF_DIR))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return QuidemRunner({"sf0.001": fe}, {"sf0.001": con})


@pytest.mark.parametrize(
    "path", sorted(glob.glob(os.path.join(IQ_DIR, "*.iq"))), ids=os.path.basename
)
def test_iq_script(runner, path):
    res = runner.run_file(path)
    assert res.passed > 0, f"{path}: no directives executed"
    msgs = "\n".join(f"  line {ln}: {m}" for ln, _, m in res.failed)
    assert res.ok, f"{path}: {len(res.failed)} failed\n{msgs}"
