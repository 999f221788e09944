"""r9 library batch: MSSQL / SNOWFLAKE / CLICKHOUSE / CALCITE tiers —
the four SqlLibrary enum members (SqlLibrary.java:72,85,91,66) the
registry did not cover — plus the re-gating fixes for entries whose lib
lists diverged from the reference's @LibraryOperator annotations (the
same defect class as the r8-verdict REGEXP_SUBSTR finding: DATEPART was
MYSQL, BOOLAND_AGG/BOOLOR_AGG were POSTGRESQL, BITAND_AGG/BITOR_AGG
were ORACLE, ENDS_WITH/STARTS_WITH/HYPOT/TRY_CAST lists were wrong).

No babel .iq corpus exists for these dialects, so evidence is unit
parity against the reference's documented semantics plus DuckDB native
twins where DuckDB shares the semantics. Reference citations are
SqlLibraryOperators.java lines.
"""

from __future__ import annotations

import math

import pytest

from calcite_spark.functions import registry
from calcite_spark.functions.registry import lookup, translate


def _run(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").collect()[0].v


# -- gating parity vs @LibraryOperator annotations --------------------


def test_regated_entries_match_reference_library_lists():
    # DATEPART is MSSQL-only (:237); MySQL has no DATEPART
    assert lookup("DATEPART", "MSSQL") is not None
    assert lookup("DATEPART", "MYSQL") is None
    # BOOLAND_AGG/BOOLOR_AGG are Snowflake's EVERY/SOME (:785,:791);
    # PG spells them BOOL_AND/BOOL_OR
    for n in ("BOOLAND_AGG", "BOOLOR_AGG"):
        assert lookup(n, "SNOWFLAKE") is not None
        assert lookup(n, "POSTGRESQL") is None
    assert lookup("BOOL_AND", "POSTGRESQL") is not None  # standard passthrough
    # BITAND_AGG/BITOR_AGG are SNOWFLAKE (:2772,:2778); Oracle spells
    # them BIT_AND_AGG/BIT_OR_AGG
    for n in ("BITAND_AGG", "BITOR_AGG"):
        assert lookup(n, "SNOWFLAKE") is not None
        assert lookup(n, "ORACLE") is None
    # TRY_CAST is MSSQL (:2729); BigQuery spells it SAFE_CAST
    assert lookup("TRY_CAST", "MSSQL") is not None
    assert lookup("TRY_CAST", "BIG_QUERY") is None
    assert lookup("TRY_CAST") is not None  # library-less lookups resolve
    assert lookup("SAFE_CAST", "BIG_QUERY") is not None
    # ENDS_WITH is BIG_QUERY (:422); STARTS_WITH is {BIG_QUERY,
    # POSTGRESQL} (:433); the SNOWFLAKE/SPARK/CLICKHOUSE spelling is
    # ENDSWITH/STARTSWITH (:428,:438)
    assert lookup("ENDS_WITH", "BIG_QUERY") is not None
    assert lookup("ENDS_WITH", "SPARK") is None
    assert lookup("STARTS_WITH", "POSTGRESQL") is not None
    for lib in ("SNOWFLAKE", "SPARK", "CLICKHOUSE"):
        assert lookup("ENDSWITH", lib) is not None
        assert lookup("STARTSWITH", lib) is not None
    assert lookup("ENDSWITH", "BIG_QUERY") is None
    # HYPOT is {SPARK, CLICKHOUSE} (:2588)
    assert lookup("HYPOT", "SPARK") is not None
    assert lookup("HYPOT", "CLICKHOUSE") is not None
    assert lookup("HYPOT", "BIG_QUERY") is None
    # LEN {REDSHIFT, SNOWFLAKE, SPARK} (:315); LENGTH adds SNOWFLAKE (:320)
    for lib in ("REDSHIFT", "SNOWFLAKE", "SPARK"):
        assert lookup("LEN", lib) is not None
    assert lookup("LEN", "POSTGRESQL") is None
    assert lookup("LENGTH", "SNOWFLAKE") is not None
    assert lookup("LENGTH", "MYSQL") is None  # MySQL LENGTH is BYTE length
    # standard charset CONVERT is unsupported — only the MSSQL variant
    assert lookup("CONVERT") is None
    assert lookup("CONVERT", "MSSQL") is not None


# -- MSSQL CONVERT (:187-215 transformConvert) ------------------------


def test_mssql_convert_is_cast_with_style_ignored(spark):
    assert translate("CONVERT", "INT", "'42'", library="MSSQL") == "CAST('42' AS INT)"
    assert _run(spark, translate("CONVERT", "INT", "'42'", library="MSSQL")) == 42
    # 3-arg: the style operand is ignored, per the reference javadoc
    got = _run(spark, translate("CONVERT", "DATE", "'2020-01-02'", "112", library="MSSQL"))
    assert str(got) == "2020-01-02"
    with pytest.raises(ValueError):
        translate("CONVERT", "INT", library="MSSQL")


# -- MSSQL/SNOWFLAKE DATEADD / DATEDIFF (:132,:166) -------------------


def test_dateadd_datediff_mssql_snowflake(spark, duck):
    for lib in ("MSSQL", "SNOWFLAKE"):
        got = _run(spark, translate("DATEADD", "day", "3", "DATE '2020-01-01'", library=lib))
        assert str(got).startswith("2020-01-04")
        got = _run(spark, translate("DATEADD", "'month'", "2", "DATE '2020-01-31'", library=lib))
        assert str(got).startswith("2020-03-31")
        # DATEDIFF counts boundary CROSSINGS, not full periods — the
        # semantics SQL Server and Snowflake document, and DuckDB's
        # datediff is the exact native twin
        for unit, a, b in [
            ("year", "2019-12-31 23:59:59", "2020-01-01 00:00:01"),
            ("month", "2020-01-31 10:00:00", "2020-02-01 09:00:00"),
            ("day", "2020-03-01 23:00:00", "2020-03-02 01:00:00"),
            ("hour", "2020-03-01 10:59:00", "2020-03-01 11:01:00"),
            ("minute", "2020-03-01 10:00:59", "2020-03-01 10:01:01"),
        ]:
            expr = translate(
                "DATEDIFF", f"'{unit}'", f"TIMESTAMP '{a}'", f"TIMESTAMP '{b}'",
                library=lib,
            )
            native = duck.execute(
                f"SELECT datediff('{unit}', TIMESTAMP '{a}', TIMESTAMP '{b}')"
            ).fetchone()[0]
            assert _run(spark, expr) == native, (lib, unit, a, b)


def test_dateadd_divergent_abbreviations_refuse():
    # T-SQL 'w' = weekday and 'y' = dayofyear (and DATEADD treats both
    # as DAY) — a Redshift-zoo remap would be a silent wrong value, so
    # the MSSQL/SNOWFLAKE variants accept canonical names only
    for bad in ("w", "y", "qq", "mi", "n", "dw"):
        with pytest.raises(ValueError, match="unsupported datepart"):
            translate("DATEADD", bad, "1", "DATE '2020-01-01'", library="MSSQL")
    # plurals of canonical names are fine
    assert "timestampadd(DAY" in translate("DATEADD", "days", "1", "x", library="SNOWFLAKE")


# -- CONCAT null-semantics variants (:1219,:1240,:1304,:1280) ---------


def test_concat_null_ignoring_mssql_postgresql(spark, duck):
    """CONCAT_FUNCTION_WITH_NULL: NULL args become '', result is never
    NULL. DuckDB's concat shares PG's semantics — native twin."""
    cases = [
        ["CAST(NULL AS STRING)", "'a'", "CAST(NULL AS STRING)"],
        ["CAST(NULL AS STRING)", "CAST(NULL AS STRING)"],
        ["'x'", "'y'", "'z'"],
    ]
    for lib in ("MSSQL", "POSTGRESQL"):
        for args in cases:
            got = _run(spark, translate("CONCAT", *args, library=lib))
            native = duck.execute(f"SELECT concat({', '.join(args)})").fetchone()[0]
            assert got == native, (lib, args, got, native)
    # the standard CONCAT stays NULL-propagating (Spark/std semantics)
    assert _run(spark, translate("CONCAT", "'a'", "CAST(NULL AS STRING)")) is None


def test_concat2_oracle_redshift(spark):
    """CONCAT2: NULL treated as '', but ALL-NULL returns NULL (:1240)."""
    for lib in ("ORACLE", "REDSHIFT"):
        assert _run(spark, translate("CONCAT", "'a'", "CAST(NULL AS STRING)", library=lib)) == "a"
        assert _run(spark, translate("CONCAT", "CAST(NULL AS STRING)", "'b'", library=lib)) == "b"
        assert (
            _run(
                spark,
                translate(
                    "CONCAT", "CAST(NULL AS STRING)", "CAST(NULL AS STRING)", library=lib
                ),
            )
            is None
        )
        # CONCAT2 is strictly binary
        with pytest.raises(ValueError):
            translate("CONCAT", "'a'", "'b'", "'c'", library=lib)


def test_concat_ws_mssql(spark):
    """CONCAT_WS_MSSQL: 3..254 args, NULL separator treated as '' —
    never returns NULL (:1304)."""
    t = lambda *a: _run(spark, translate("CONCAT_WS", *a, library="MSSQL"))
    assert t("','", "'a'", "'b'") == "a,b"
    assert t("CAST(NULL AS STRING)", "'a'", "'b'") == "ab"
    assert t("','", "CAST(NULL AS STRING)", "CAST(NULL AS STRING)") == ""
    assert t("CAST(NULL AS STRING)", "CAST(NULL AS STRING)", "CAST(NULL AS STRING)") == ""
    with pytest.raises(ValueError, match="between 3 and 254"):
        translate("CONCAT_WS", "','", "'a'", library="MSSQL")


def test_concat_ws_postgresql_any_type_args(spark, duck):
    """CONCAT_WS_POSTGRESQL: args may be ANY type (:1280); NULL
    separator still returns NULL, NULL args skipped."""
    expr = translate("CONCAT_WS", "','", "'a'", "DATE '1945-02-24'", library="POSTGRESQL")
    got = _run(spark, expr)
    native = duck.execute("SELECT concat_ws(',', 'a', DATE '1945-02-24')").fetchone()[0]
    assert got == native == "a,1945-02-24"
    assert (
        _run(spark, translate("CONCAT_WS", "CAST(NULL AS STRING)", "'a'", library="POSTGRESQL"))
        is None
    )
    assert (
        _run(
            spark,
            translate("CONCAT_WS", "','", "CAST(NULL AS DATE)", "'b'", library="POSTGRESQL"),
        )
        == "b"
    )


# -- SNOWFLAKE aggregates + string predicates --------------------------


def test_snowflake_bool_and_bit_aggs(spark, duck):
    spark.range(0, 6).createOrReplaceTempView("lt_nums")
    duck.execute("CREATE OR REPLACE TEMP TABLE lt_nums AS SELECT range AS id FROM range(0, 6)")
    for name, spark_arg, duck_expr in [
        ("BOOLAND_AGG", "id < 10", "bool_and(id < 10)"),
        ("BOOLOR_AGG", "id > 4", "bool_or(id > 4)"),
        ("BITAND_AGG", "id + 12", "bit_and(id + 12)"),
        ("BITOR_AGG", "id", "bit_or(id)"),
    ]:
        expr = translate(name, spark_arg, library="SNOWFLAKE")
        got = spark.sql(f"SELECT {expr} AS v FROM lt_nums").collect()[0].v
        native = duck.execute(f"SELECT {duck_expr} FROM lt_nums").fetchone()[0]
        assert got == native, (name, got, native)


def test_snowflake_clickhouse_startswith_endswith(spark):
    for lib in ("SNOWFLAKE", "CLICKHOUSE"):
        assert _run(spark, translate("STARTSWITH", "'spark'", "'sp'", library=lib)) is True
        assert _run(spark, translate("ENDSWITH", "'spark'", "'rk'", library=lib)) is True
        assert _run(spark, translate("LEN", "'héllo'", library="SNOWFLAKE")) == 5


# -- CLICKHOUSE/SPARK HYPOT (:2586 'without intermediate overflow') ---


def test_hypot_native_and_overflow_contract(spark):
    assert _run(spark, translate("HYPOT", "3", "4", library="CLICKHOUSE")) == 5.0
    got = _run(spark, translate("HYPOT", "1e200", "1e200", library="SPARK"))
    assert math.isfinite(got) and got == pytest.approx(math.hypot(1e200, 1e200))
    # the old sqrt(pow+pow) lowering overflowed to inf here
    assert _run(spark, "sqrt(pow(1e200, 2) + pow(1e200, 2))") == float("inf")


# -- CALCITE library: AGGREGATE(m) measure rollup (:101) --------------


def test_calcite_aggregate_is_measure_layer_territory():
    assert lookup("AGGREGATE", "CALCITE") is not None
    # the Spark higher-order aggregate(...) passthrough is a DIFFERENT
    # operator and must stay untouched by the CALCITE variant
    assert lookup("AGGREGATE").libraries == ("SPARK",)
    assert translate("AGGREGATE", "a", "0", "(x, y) -> x + y") == "aggregate(a, 0, (x, y) -> x + y)"
    with pytest.raises(ValueError, match="measure layer"):
        translate("AGGREGATE", "m", library="CALCITE")


def test_new_libraries_registered():
    libs = registry.libraries()
    for lib in ("MSSQL", "SNOWFLAKE", "CLICKHOUSE", "CALCITE"):
        assert lib in libs
