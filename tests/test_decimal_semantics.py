"""Decimal edge semantics (SURVEY §7.4 risk register): Calcite's type
system derives result precision/scale per RelDataTypeSystem; Spark's
rules differ and are governed by spark.sql.decimalOperations.
allowPrecisionLoss. These tests PIN the engine's decimal behavior so a
config or version drift is caught, and verify value agreement with
DuckDB where both engines can represent the result exactly.
"""

from __future__ import annotations

from decimal import Decimal

import pytest


def test_decimal_division_precision(spark):
    df = spark.sql(
        "SELECT CAST(1 AS DECIMAL(20, 2)) / CAST(3 AS DECIMAL(20, 2)) AS q"
    )
    field = df.schema["q"]
    # Spark (allowPrecisionLoss=true, the default we rely on): division
    # result keeps at least 6 digits of scale
    assert field.dataType.typeName() == "decimal"
    assert field.dataType.scale >= 6
    v = df.collect()[0].q
    assert abs(v - Decimal("0.333333")) < Decimal("0.000001")


def test_decimal_sum_no_overflow_within_38(spark):
    df = spark.sql(
        "SELECT SUM(CAST(x AS DECIMAL(38, 2))) AS s FROM VALUES (1.25), (2.50), (3.25) t(x)"
    )
    assert df.collect()[0].s == Decimal("7.00")


def test_decimal_overflow_raises_like_calcite(spark):
    """Spark 4 runs ANSI mode by default: decimal overflow RAISES —
    exactly Calcite's checked-arithmetic semantics (ConvertToChecked);
    the opt-out path is try_multiply (NULL)."""
    import pytest as _pytest

    with _pytest.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE|Decimal"):
        spark.sql(
            "SELECT CAST(99999999999999999999999999999999999999 AS DECIMAL(38, 0)) * "
            "CAST(10 AS DECIMAL(38, 0)) AS v"
        ).collect()
    v = spark.sql(
        "SELECT try_multiply(CAST(99999999999999999999999999999999999999 AS DECIMAL(38, 0)), "
        "CAST(10 AS DECIMAL(38, 0))) AS v"
    ).collect()[0].v
    assert v is None


def test_decimal_agreement_with_duckdb(spark, duck):
    """Exactly-representable decimal arithmetic must agree cross-engine."""
    sql = (
        "SELECT CAST(12.345 AS DECIMAL(10, 3)) + CAST(0.655 AS DECIMAL(10, 3)) AS a, "
        "CAST(2.5 AS DECIMAL(10, 1)) * CAST(4 AS DECIMAL(10, 0)) AS m"
    )
    s = spark.sql(sql).collect()[0]
    d = duck.sql(sql).fetchall()[0]
    assert (Decimal(s.a), Decimal(s.m)) == (Decimal(d[0]), Decimal(d[1]))


def test_avg_double_vs_decimal_documented(spark):
    """avg over DOUBLE stays double (the testdata money columns are
    doubles, so inventory queries rely on this); note bare literals like
    1.0 are DECIMAL in Spark SQL — avg over them yields decimal."""
    df = spark.sql("SELECT AVG(CAST(x AS DOUBLE)) AS a FROM VALUES (1.0), (2.0) t(x)")
    assert df.schema["a"].dataType.typeName() == "double"
    lit = spark.sql("SELECT AVG(x) AS a FROM VALUES (1.0), (2.0) t(x)")
    assert lit.schema["a"].dataType.typeName() == "decimal"
