"""VARIANT type semantics vs the reference's variant.iq
(core/src/test/resources/sql/variant.iq) + TYPEOF/VARIANTNULL
(SqlStdOperatorTable.java:2057-2062), carried on Spark 4 VariantType.
"""

from __future__ import annotations

from calcite_spark.functions.registry import translate
from calcite_spark.types import to_spark_type


def _one(spark, expr):
    return spark.sql(f"SELECT {expr} AS c").collect()[0][0]


def test_variant_type_mapping():
    import pyspark.sql.types as T

    assert isinstance(to_spark_type("VARIANT"), T.VariantType)


def test_cast_roundtrip(spark):
    # variant.iq: SELECT CAST(CAST(1 AS VARIANT) AS INT) -> 1
    assert _one(spark, "cast(cast(1 as variant) as int)") == 1
    # array of variants back to typed array
    assert _one(spark, "cast(parse_json('[1,2,3]') as array<int>)") == [1, 2, 3]


def test_typeof(spark):
    # variant.iq: TYPEOF(CAST(1 AS VARIANT)) -> INTEGER class
    t = _one(spark, translate("TYPEOF", "cast(1 as variant)"))
    assert t == "BIGINT"  # Spark's single int64 class (disclosed divergence)
    t = _one(spark, translate("TYPEOF", "parse_json('{\"k\": 1}')"))
    assert t.startswith("OBJECT<")


def test_variantnull_is_not_sql_null(spark):
    # variant.iq: VARIANTNULL() is a variant null, not SQL NULL
    expr = translate("VARIANTNULL")
    assert _one(spark, f"is_variant_null({expr})") is True
    assert _one(spark, f"{expr} IS NULL") is False


def test_variant_get_typed_and_missing(spark):
    g = translate("VARIANT_GET", "parse_json('{\"k\": 87}')", "'$.k'", "'int'", library="SPARK")
    assert _one(spark, g) == 87
    # missing key behaves like variant.iq's MAP<VARIANT,..>[missing] -> null
    g = translate(
        "TRY_VARIANT_GET", "parse_json('{\"k\": 87}')", "'$.x'", "'int'", library="SPARK"
    )
    assert _one(spark, g) is None
    # default type (arity-2 call fills 'string')
    g = translate("VARIANT_GET", "parse_json('{\"k\": 87}')", "'$.k'", library="SPARK")
    assert _one(spark, g) == "87"
