"""Babel corpus batch 28 (r14 second wave) — big-query.iq and
redshift.iq surface classes replayed with the reference's expected
values:

  * the generic registry fallback: any function call Spark lacks but
    the ~490-op registry knows expands with default library resolution
    (GETDATE-family, DATE_CMP, STRPOS, SIND, LOGICAL_AND, FORMAT_DATE,
    CHECKED_*, SAFE_*...); Spark-native names are never touched;
  * Redshift: variadic NVL, bare-alias DATEADD/DATEDIFF/DATE_PART
    units (m/qtr/hours/w), 2-arg regexp_replace (deletes ALL matches),
    bare niladic `pi` in FROM-less selects;
  * BigQuery: DATETIME literals (timestamp_ntz), double-quoted typed
    literals, DATE(y,m,d), 1-arg SPLIT, arr[OFFSET/ORDINAL/SAFE_*()],
    FROM UNNEST / correlated , UNNEST, EXTRACT(DAYOFYEAR|ISOWEEK),
    extended-arity regexp family + groupless-pattern REGEXP_EXTRACT.
"""

from __future__ import annotations

import pytest

from calcite_spark.queries.inventory import catalog_for
from calcite_spark.sql.frontend import SqlFrontend
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def fe(spark):
    return SqlFrontend(catalog_for(spark, SF_DIR))


def _one(fe, sql):
    return fe.sql(sql).collect()[0][0]


def test_registry_fallback_surface(fe):
    """Registry-only names resolve on the SQL surface; Spark builtins
    and unknown names are untouched (loud failure preserved)."""
    cases = [
        ("SELECT strpos('high', 'ig') AS x", 2),
        ("SELECT date_cmp(date '2008-01-04', date '2008-01-05') AS x", -1),
        ("SELECT date_part_year(date '2008-01-05') AS x", 2008),
        ("SELECT dlog10(100) AS x", 2.0),
        ("SELECT countif(n_regionkey = 1) AS x FROM nation", 5),
        ("SELECT logical_and(n_regionkey < 99) AS x FROM nation", True),
        ("SELECT starts_with('hello', 'he') AS x", True),
        ("SELECT array_length(array(1,2,3)) AS x", 3),
        ("SELECT format('%d th', 5) AS x", "5 th"),
        ("SELECT strcmp('b', 'a') AS x", 1),  # MySQL: arg1>arg2 -> 1
        ("SELECT checked_add(1, 2) AS x", 3),
        ("SELECT safe_divide(4, 2) AS x", 2.0),
        ("SELECT format_date('%Y-%m', DATE '2020-03-04') AS x", "2020-03"),
    ]
    for sql, want in cases:
        got = _one(fe, sql)
        if isinstance(want, float):
            assert abs(got - want) < 1e-9, sql
        else:
            assert got == want, sql
    assert abs(_one(fe, "SELECT sind(30) AS x") - 0.5) < 1e-9
    assert _one(fe, "SELECT timeofday() IS NOT NULL AS x") is True
    with pytest.raises(Exception):  # unknown names stay loud
        fe.sql("SELECT no_such_fn_xyz(1) AS x").collect()


def test_redshift_surface(fe):
    """redshift.iq executed classes: variadic NVL, bare unit aliases,
    2-arg regexp_replace (delete-ALL — redshift.iq:2233 'acac'), bare
    pi (FROM-less only)."""
    assert _one(fe, "SELECT nvl(1, 2, 3) AS x") == 1
    assert _one(fe, "SELECT nvl(NULL, NULL, 3) AS x") == 3
    assert _one(fe, "SELECT nvl(NULL, 2) AS x") == 2  # 2-arg native
    assert str(_one(
        fe, "SELECT dateadd(m, 18, date '2008-02-28') AS x"
    )) == "2009-08-28 00:00:00"
    assert _one(fe, "SELECT datediff(qtr, date '1998-07-01', "
                    "date '1999-07-01') AS x") == 4
    assert _one(fe, "SELECT date_part(w, timestamp "
                    "'2008-06-17 09:44:54') AS x") == 25
    assert _one(fe, "SELECT regexp_replace('abcabc', 'b') AS x") == "acac"
    assert _one(fe, "SELECT ceil(pi) AS x") == 4
    assert abs(_one(fe, "SELECT round(pi, 2) AS x") - 3.14) < 1e-9
    assert abs(_one(fe, "SELECT -abs(-pi) AS x") + 3.141592653589793) < 1e-12
    # alias position is never rewritten
    assert abs(_one(fe, "SELECT atan2(2,2) * 4 AS pi") - 3.141592653589793) < 1e-12


def test_bigquery_datetime_surface(fe):
    """DATETIME literal -> TIMESTAMP_NTZ; double-quoted typed
    literals; DATE(y,m,d); EXTRACT field aliases."""
    assert str(_one(
        fe, "SELECT DATETIME '2008-12-25 15:30:00' AS x"
    )) == "2008-12-25 15:30:00"
    assert _one(fe, "SELECT TIMESTAMP \"2008-12-25 15:30:00+00\" IS NOT NULL AS x") is True
    assert str(_one(fe, "SELECT DATE(2022, 11, 15) AS x")) == "2022-11-15"
    assert _one(fe, "SELECT EXTRACT(DAYOFYEAR FROM DATE '2008-12-25') AS x") == 360
    assert _one(fe, "SELECT EXTRACT(ISOWEEK FROM DATE '2017-11-05') AS x") == 44
    # 6-arg civil constructor through the registry fallback
    assert str(_one(
        fe, "SELECT datetime(2003, 5, 25, 12, 30, 59) AS x"
    )) == "2003-05-25 12:30:59"


def test_bigquery_split_subscripts_unnest(fe):
    """big-query.iq:3104-3190 — SPLIT defaults the delimiter to ',';
    OFFSET is 0-based, ORDINAL 1-based, SAFE_ forms NULL out of range
    (including negatives); UNNEST lowers to explode / LATERAL VIEW."""
    assert _one(fe, "SELECT SPLIT('h,e,l,l,o') AS x") == list("hello")
    assert _one(fe, "SELECT SPLIT('') AS x") == [""]
    assert _one(fe, "SELECT SPLIT('h,e,l,l,o')[OFFSET(2)] AS x") == "l"
    assert _one(fe, "SELECT SPLIT('h,e,l,l,o')[ORDINAL(2)] AS x") == "e"
    assert _one(fe, "SELECT SPLIT('h,e,l,l,o')[SAFE_OFFSET(-1)] AS x") is None
    assert _one(fe, "SELECT SPLIT('h,e,l,l,o')[SAFE_OFFSET(2)] AS x") == "l"
    assert _one(fe, "SELECT SPLIT('h,e,l,l,o')[SAFE_ORDINAL(7)] AS x") is None
    rows = fe.sql("SELECT x FROM UNNEST(ARRAY[1,2,3]) AS x").collect()
    assert [r.x for r in rows] == [1, 2, 3]
    rows = fe.sql(
        "SELECT email FROM (SELECT ARRAY['a@x.com','b@y.org'] AS "
        "addresses), UNNEST(addresses) AS email"
    ).collect()
    assert [r.email for r in rows] == ["a@x.com", "b@y.org"]


def test_bigquery_regexp_extended(fe):
    """Extended-arity regexp family + groupless-pattern extraction:
    only calls Spark itself cannot run are rerouted (extended arities
    and literal groupless patterns, which Spark rejects at runtime) —
    expected values are big-query.iq's."""
    assert _one(fe, "SELECT REGEXP_EXTRACT('abcadcabcaecghi', 'a.+c') "
                    "AS x") == "abcadcabcaec"
    assert _one(fe, "SELECT REGEXP_EXTRACT_ALL('abacadaeafa', 'a.a') "
                    "AS x") == ["aba", "ada", "afa"]
    assert _one(fe, "SELECT REGEXP_SUBSTR('abcadcabcaecghi', 'a.c', 1, 5) "
                    "AS x") is None
    assert _one(fe, "SELECT REGEXP_INSTR('a9cadca5c4aecghi', "
                    "'a[0-9]c', 1, 2, 1) AS x") == 10
    # Spark-runnable spellings keep Spark semantics (group 1)
    assert _one(fe, "SELECT regexp_extract('100-200', '(\\\\d+)-(\\\\d+)', 1) "
                    "AS x") == "100"


def test_std_collection_type_in_cast(fe):
    """spark.iq:34 (CALCITE-7347) — the SQL-standard `VARCHAR ARRAY`
    collection-type spelling in CAST position, nesting included;
    ARRAY[...] constructors are untouched."""
    assert _one(fe, "SELECT CAST(ARRAY['by'] AS VARCHAR ARRAY) AS x") \
        == ["by"]
    assert _one(fe, "SELECT REVERSE(cast(NULL as integer array)) AS x") \
        is None
    assert _one(fe, "SELECT CAST(ARRAY[ARRAY[1]] AS INT ARRAY ARRAY) "
                    "AS x") == [[1]]
    assert [str(v) for v in _one(
        fe, "SELECT CAST(ARRAY['1.5'] AS DECIMAL(5,2) ARRAY) AS x"
    )] == ["1.50"]
    row = fe.sql(
        "SELECT DISTINCT t.f1, t.f2, CAST(t.f3 AS VARCHAR ARRAY) AS f3,"
        " t.f4 FROM (VALUES ('a', 1, ARRAY['by'], true)) "
        "AS t(f1, f2, f3, f4)"
    ).collect()[0]
    assert (row.f1, row.f2, row.f3, row.f4) == ("a", 1, ["by"], True)


def test_timestamp_with_time_zone_literal(fe):
    """big-query.iq / redshift.iq — TIMESTAMP WITH TIME ZONE literals
    map to the same instant (named zones via to_utc_timestamp, numeric
    offsets via Spark's native cast); an unknown zone fails loudly."""
    assert _one(
        fe,
        "SELECT TIMESTAMP WITH TIME ZONE "
        "'2020-01-01 08:10:10 America/New_York' = TIMESTAMP WITH TIME "
        "ZONE '2020-01-01 13:10:10 UTC' AS x",
    ) is True
    assert _one(
        fe,
        "SELECT TIMESTAMP WITH TIME ZONE "
        "'2020-01-01 08:10:10 America/New_York' <> TIMESTAMP WITH TIME "
        "ZONE '2020-01-01 08:10:10 UTC' AS x",
    ) is True
    assert str(_one(
        fe,
        "SELECT CAST(TIMESTAMP WITH TIME ZONE "
        "'2020-01-01 00:00:00 America/New_York' AS STRING) AS x",
    )) == "2020-01-01 05:00:00"
    assert _one(
        fe,
        "SELECT TIMESTAMP WITH TIME ZONE '2001-02-16 20:38:40-05' "
        "IS NOT NULL AS x",
    ) is True


def test_contains_substr_struct_and_code_points_bytes(fe):
    """big-query.iq:2147-2287 — CONTAINS_SUBSTR over a tuple scans
    every field (found → TRUE; miss with a NULL field → NULL; miss →
    FALSE); CODE_POINTS_TO_BYTES frames bytes via hex (NULL element →
    NULL, out-of-byte-range errors)."""
    assert _one(fe, "SELECT CONTAINS_SUBSTR((23, 35, 41), '35') AS r") \
        is True
    assert _one(fe, "SELECT CONTAINS_SUBSTR((23, NULL, 41), '41') AS r") \
        is True
    assert _one(fe, "SELECT CONTAINS_SUBSTR((23, NULL, 41), '35') AS r") \
        is None
    assert _one(fe, "SELECT CONTAINS_SUBSTR((23, 35, 41), '50') AS r") \
        is False
    # column tuples work too (the Recipes fixture shape)
    row = fe.sql(
        "SELECT CONTAINS_SUBSTR((Lunch, Dinner), 'potato') AS r FROM "
        "(SELECT 'Egg salad' AS Lunch, 'Potato dumplings' AS Dinner)"
    ).collect()[0]
    assert row.r is True
    assert _one(fe, "SELECT hex(CODE_POINTS_TO_BYTES("
                    "array[65, 66, 67, 68])) AS r") == "41424344"
    assert _one(fe, "SELECT hex(CODE_POINTS_TO_BYTES("
                    "array[255, 254, 65, 64])) AS r") == "FFFE4140"
    assert _one(fe, "SELECT CODE_POINTS_TO_BYTES(array[65, null]) AS r") \
        is None
    with pytest.raises(Exception):
        fe.sql("SELECT CODE_POINTS_TO_BYTES(array[300]) AS r").collect()


def test_bq_datetime_arities(fe):
    """BQ DATETIME(ts) drops the zone, DATETIME(ts, tz) reads the
    instant's civil time in tz, DATETIME(y,m,d,h,mi,s) constructs."""
    assert str(_one(fe, "SELECT datetime(timestamp "
                        "'2008-01-01 01:03:05') AS r")) \
        == "2008-01-01 01:03:05"
    assert str(_one(fe, "SELECT datetime(TIMESTAMP "
                        "'2017-11-05 00:00:00+00', "
                        "'America/New_York') AS r")) \
        == "2017-11-04 20:00:00"


def test_bq_week_weekday_extract_and_parse_c(fe):
    """big-query.iq:515-531 — EXTRACT(WEEK(<weekday>)): weeks begin on
    the named weekday, days before the year's first such weekday are
    week 0 (2017-11-05 → Sunday-weeks 45, Monday-weeks 44); and
    big-query.iq:4756 — PARSE_TIMESTAMP('%c') parses the weekday-name
    composite through the pg_parse compiler (Java patterns reject
    weekday names on input)."""
    assert _one(fe, "SELECT EXTRACT(WEEK(SUNDAY) FROM "
                    "DATE '2017-11-05') AS r") == 45
    assert _one(fe, "SELECT EXTRACT(WEEK(MONDAY) FROM "
                    "DATE '2017-11-05') AS r") == 44
    assert _one(fe, "SELECT EXTRACT(WEEK(SUNDAY) FROM "
                    "DATE '2017-01-01') AS r") == 1
    assert _one(fe, "SELECT EXTRACT(WEEK(MONDAY) FROM "
                    "DATE '2017-01-01') AS r") == 0
    assert str(_one(
        fe,
        "SELECT PARSE_TIMESTAMP('%c', 'Thu Dec 25 07:30:00 2008') AS r"
    )) == "2008-12-25 07:30:00"


def test_at_time_zone(fe):
    """redshift.iq:1028-1038 — `x AT TIME ZONE z` both directions: a
    zoneless operand is civil time IN z (becomes that instant); a
    zoned operand converts to its civil time in z (PG's two readings
    of the operator). Values are the reference's instants."""
    assert str(_one(
        fe, "SELECT CAST(TIMESTAMP '2001-02-16 20:38:40' AT TIME ZONE "
            "'MST' AS STRING) AS r"
    )) == "2001-02-17 03:38:40"  # = 19:38:40-08, the PG row's instant
    assert str(_one(
        fe, "SELECT CAST(TIMESTAMP WITH TIME ZONE "
            "'2001-02-16 20:38:40-05' AT TIME ZONE 'MST' AS STRING) AS r"
    )) == "2001-02-16 18:38:40"
    assert str(_one(
        fe, "SELECT CAST(TIMESTAMP WITH TIME ZONE "
            "'2020-01-01 08:10:10 America/New_York' AT TIME ZONE 'UTC' "
            "AS STRING) AS r"
    )) == "2020-01-01 13:10:10"
