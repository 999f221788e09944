"""Function-registry tests ≈ Calcite's SqlOperatorTest (18,640 LoC,
testkit/.../SqlOperatorTest.java): every translated operator must parse
and evaluate in Spark; a cross-engine subset is value-checked against
DuckDB on the same literal arguments.
"""

from __future__ import annotations

import math

import pytest

from calcite_spark.functions import registry

# (calcite_name, args, duckdb_expr or None) — duckdb_expr None → Spark
# evaluation smoke only (semantics engine-specific or syntax differs).
CASES = [
    ("CHAR_LENGTH", ["'hello'"], "length('hello')"),
    ("POSITION", ["'ll'", "'hello'"], "position('ll' IN 'hello')"),
    ("OVERLAY", ["'abcdef'", "'XY'", "3", "2"], "'abXYef'"),
    ("STRPOS", ["'hello'", "'l'"], "strpos('hello', 'l')"),
    ("SPLIT_PART", ["'a,b,c'", "','", "2"], "split_part('a,b,c', ',', 2)"),
    ("ENDS_WITH", ["'hello'", "'lo'"], "ends_with('hello', 'lo')"),
    ("STARTS_WITH", ["'hello'", "'he'"], "starts_with('hello', 'he')"),
    ("FROM_BASE64", ["'aGk='"], "CAST(from_base64('aGk=') AS BLOB)"),
    ("TO_BASE64", ["CAST('hi' AS BINARY)"], "to_base64(CAST('hi' AS BLOB))"),
    ("TO_HEX", ["255"], None),
    ("MD5", ["'abc'"], "md5('abc')"),
    ("SHA256", ["'abc'"], "sha256('abc')"),
    ("REGEXP_REPLACE", ["'a1b2'", "'[0-9]'", "'#'"], "regexp_replace('a1b2', '[0-9]', '#', 'g')"),
    ("REGEXP_EXTRACT", ["'a1b22'", "'([0-9]+)'", "1"], None),
    ("REGEXP_CONTAINS", ["'a1'", "'[0-9]'"], "regexp_matches('a1', '[0-9]')"),
    ("TRANSLATE3", ["'abc'", "'ab'", "'xy'"], "translate('abc', 'ab', 'xy')"),
    ("REVERSE", ["'abc'"], "reverse('abc')"),
    ("LEVENSHTEIN", ["'kitten'", "'sitting'"], "levenshtein('kitten', 'sitting')"),
    ("DIVIDE_INTEGER", ["7", "2"], "7 // 2"),
    ("PERCENT_REMAINDER", ["7", "3"], "7 % 3"),
    ("CHECKED_DIVIDE", ["10", "2"], "10 / 2"),
    ("MOD", ["7", "3"], "mod(7, 3)"),
    ("POWER", ["2", "10"], "power(2, 10)"),
    ("SQRT", ["16.0"], "sqrt(16.0)"),
    ("LN", ["2.718281828459045"], "ln(2.718281828459045)"),
    ("LOG10", ["100.0"], "log10(100.0)"),
    ("ABS", ["-3"], "abs(-3)"),
    ("ATAN2", ["1.0", "1.0"], "atan2(1.0, 1.0)"),
    ("CBRT", ["27.0"], "cbrt(27.0)"),
    ("DEGREES", ["3.141592653589793"], "degrees(3.141592653589793)"),
    ("RADIANS", ["180.0"], "radians(180.0)"),
    ("EXP", ["1.0"], "exp(1.0)"),
    ("SIGN", ["-5.0"], "sign(-5.0)"),
    ("RAND_INTEGER", ["42", "10"], None),
    ("TIMESTAMPADD", ["DAY", "3", "TIMESTAMP '2024-01-01 00:00:00'"], None),
    ("TIMESTAMPDIFF", ["DAY", "TIMESTAMP '2024-01-01 00:00:00'", "TIMESTAMP '2024-01-11 00:00:00'"], None),
    ("DATE_ADD", ["DATE '2024-01-01'", "30"], "CAST(DATE '2024-01-01' + 30 AS DATE)"),
    ("DATEDIFF", ["DATE '2024-02-01'", "DATE '2024-01-01'"], "datediff('day', DATE '2024-01-01', DATE '2024-02-01')"),
    ("DATE_TRUNC", ["'month'", "TIMESTAMP '2024-03-15 10:30:00'"], "CAST(date_trunc('month', TIMESTAMP '2024-03-15 10:30:00') AS TIMESTAMP)"),
    ("MONTHNAME", ["DATE '2024-03-15'"], "monthname(DATE '2024-03-15')"),
    ("DAYNAME", ["DATE '2024-03-15'"], "dayname(DATE '2024-03-15')"),
    ("LAST_DAY", ["DATE '2024-02-05'"], "last_day(DATE '2024-02-05')"),
    ("UNIX_SECONDS", ["TIMESTAMP '2024-01-01 00:00:00'"], None),
    ("TIMESTAMP_SECONDS", ["1704067200"], None),
    ("FORMAT_DATE", ["'%Y-%m'", "DATE '2024-03-15'"], "strftime(DATE '2024-03-15', '%Y-%m')"),
    ("CARDINALITY", ["array(1, 2, 3)"], "len([1, 2, 3])"),
    ("ARRAY_LENGTH", ["array(1, 2)"], "array_length([1, 2])"),
    ("ARRAY_TO_STRING", ["array('a', 'b')", "','"], "array_to_string(['a', 'b'], ',')"),
    ("ITEM", ["array(10, 20)", "2"], "([10, 20])[2]"),
    ("OFFSET", ["array(10, 20)", "0"], "([10, 20])[1]"),
    ("SAFE_OFFSET", ["array(10, 20)", "9"], "NULL"),
    ("MEMBER OF", ["20", "array(10, 20)"], "list_contains([10, 20], 20)"),
    ("MULTISET_UNION", ["array(1, 2)", "array(2, 3)"], "list_concat([1, 2], [2, 3])"),
    ("MULTISET_EXCEPT", ["array(1, 2)", "array(2)"], "[1]"),
    ("ELEMENT", ["array(7)"], "7"),
    ("JSON_VALUE", ["'{\"a\": 5}'", "'$.a'"], "json_extract_string('{\"a\": 5}', '$.a')"),
    ("JSON_EXISTS", ["'{\"a\": 5}'", "'$.a'"], "TRUE"),
    ("JSON_LENGTH", ["'[1, 2, 3]'"], "json_array_length('[1, 2, 3]')"),
    ("SAFE_CAST", ["'xx'", "INT"], "try_cast('xx' AS INT)"),
    ("TRY_CAST", ["'12'", "INT"], "try_cast('12' AS INT)"),
    ("NULLIF", ["3", "3"], "nullif(3, 3)"),
    ("COALESCE", ["NULL", "7"], "coalesce(NULL, 7)"),
    ("GREATEST", ["1", "9", "4"], "greatest(1, 9, 4)"),
    ("LEAST", ["1", "9", "4"], "least(1, 9, 4)"),
    ("NVL", ["NULL", "5"], "coalesce(NULL, 5)"),
    ("IS DISTINCT FROM", ["NULL", "1"], "NULL IS DISTINCT FROM 1"),
    ("IS NOT DISTINCT FROM", ["NULL", "NULL"], "NULL IS NOT DISTINCT FROM NULL"),
    ("STRCMP", ["'a'", "'b'"], "-1"),
    ("INITCAP", ["'hello world'"], "'Hello World'"),
    ("SOUNDEX", ["'Robert'"], "'R163'"),
    ("LPAD", ["'5'", "3", "'0'"], "lpad('5', 3, '0')"),
    ("CONCAT_WS", ["'-'", "'a'", "'b'"], "concat_ws('-', 'a', 'b')"),
    ("CHR", ["65"], "chr(65)"),
    ("ASCII", ["'A'"], "ascii('A')"),
    ("REPEAT", ["'ab'", "3"], "repeat('ab', 3)"),
    ("TRUNCATE", ["CAST(7.9 AS DOUBLE)"], "CAST(7.0 AS DOUBLE)"),
    ("TRUNCATE", ["CAST(-2.718 AS DOUBLE)", "2"], "CAST(-2.71 AS DOUBLE)"),
    ("DATE_DIFF", ["DATE '2024-02-01'", "DATE '2024-01-01'", "DAY"], "31"),
    ("DATE_DIFF", ["DATE '2024-03-15'", "DATE '2024-01-10'", "MONTH"], "2"),
    # --- SqlOperatorTest edge-case batch (round 2) ---
    # sign of MOD follows the DIVIDEND (SQL standard; SqlOperatorTest
    # testModFunc): -7 % 3 = -1, 7 % -3 = 1
    ("MOD", ["-7", "3"], "mod(-7, 3)"),
    ("MOD", ["7", "-3"], "mod(7, -3)"),
    ("POWER", ["-8.0", "2.0"], "64.0"),
    ("LOG", ["8.0", "2.0"], "3.0"),  # BigQuery LOG(x, base): log2(8) = 3
    ("LOG", ["2.718281828459045"], "1.0"),  # 1-arg = ln
    ("LOG1P", ["0.0"], "0.0"),
    ("POW", ["3", "4"], "81.0"),
    ("FACTORIAL", ["5"], "120"),
    ("COT", ["1.0"], "1.0 / tan(1.0)"),
    ("BITAND", ["12", "10"], "8"),
    ("BITOR", ["12", "10"], "14"),
    ("BITXOR", ["12", "10"], "6"),
    ("BITNOT", ["0"], "-1"),
    ("BITCOUNT", ["255"], "8"),
    ("SAFE_ADD", ["9223372036854775807", "1"], "NULL"),  # bigint overflow
    ("SAFE_DIVIDE", ["1", "0"], "NULL"),
    ("SAFE_MULTIPLY", ["2", "3"], "6"),
    ("SAFE_NEGATE", ["5"], "-5"),
    # substring beyond end / zero-length / negative start (testSubstringFunction)
    ("SUBSTRING", ["'hello'", "7"], "''"),
    ("SUBSTRING", ["'hello'", "2", "0"], "''"),
    ("LEFT", ["'hello'", "99"], "'hello'"),
    ("RIGHT", ["'hello'", "2"], "'lo'"),
    ("SPACE", ["3"], "'   '"),
    ("BIT_LENGTH", ["'abc'"], "bit_length('abc')"),
    ("OCTET_LENGTH", ["CAST('abc' AS BINARY)"], "3"),
    ("HEX", ["'AB'"], "'4142'"),
    ("BIN", ["5"], "'101'"),
    ("WEEK", ["DATE '2024-01-04'"], "1"),
    ("DAYOFMONTH", ["DATE '2024-02-29'"], "29"),
    ("QUARTER", ["DATE '2024-08-13'"], "3"),
    ("DAYOFYEAR", ["DATE '2024-12-31'"], "366"),
    ("ADD_MONTHS", ["DATE '2024-01-31'", "1"], "DATE '2024-02-29'"),  # clamp to month end
    ("ARRAY_POSITION", ["array(10, 20, 30)", "20"], "list_position([10, 20, 30], 20)"),
    ("ARRAY_REMOVE", ["array(1, 2, 1)", "1"], "[2]"),
    ("ARRAY_DISTINCT", ["array(1, 2, 1)", ], "[1, 2]"),
    ("ARRAY_EXCEPT", ["array(1, 2, 3)", "array(2)"], "[1, 3]"),
    ("ARRAYS_OVERLAP", ["array(1, 2)", "array(2, 9)"], "TRUE"),
    ("SORT_ARRAY", ["array(3, 1, 2)"], "[1, 2, 3]"),
    ("SEQUENCE", ["1", "5"], "[1, 2, 3, 4, 5]"),
    ("STR_TO_MAP", ["'a:1,b:2'", "','", "':'"], None),
    ("IFNULL", ["NULL", "'x'"], "'x'"),
    ("NVL2", ["NULL", "'y'", "'n'"], "'n'"),
    ("DECODE", ["2", "1", "'one'", "2", "'two'", "'other'"], "'two'"),
    ("IF", ["1 > 2", "'t'", "'f'"], "'f'"),
    # r3 breadth batch (SqlLibraryOperators diff)
    ("SIND", ["30"], "sin(radians(30))"),
    ("COSD", ["60"], "cos(radians(60))"),
    ("TAND", ["45"], "tan(radians(45))"),
    ("ASIND", ["0.5"], "degrees(asin(0.5))"),
    ("ACOSD", ["0.5"], "degrees(acos(0.5))"),
    ("ATAND", ["1.0"], "degrees(atan(1.0))"),
    # DuckDB 1.0 lacks hyperbolics — literal expectations
    ("COTH", ["1.5"], "1.104791392982512"),
    ("SECH", ["1.5"], "0.4250960349422805"),
    ("CSCH", ["1.5"], "0.46964244059522464"),
    ("HYPOT", ["3", "4"], "5.0"),
    ("IS_NAN", ["sqrt(-1.0)"], "TRUE"),
    ("IS_INF", ["CAST('Infinity' AS DOUBLE)"], "TRUE"),
    ("TRUNC", ["-1.789", "1"], "-1.7"),
    ("LEN", ["'abc'"], "3"),
    ("LENGTH", ["'abcd'"], "4"),
    ("SUBSTR", ["'abcdef'", "3"], "'cdef'"),
    ("CHAR", ["65"], "'A'"),
    ("FIND_IN_SET", ["'b'", "'a,b,c'"], "2"),
    ("SUBSTRING_INDEX", ["'a.b.c'", "'.'", "2"], "'a.b'"),
    ("STRING_TO_ARRAY", ["'a,b'", "','"], "['a', 'b']"),
    # PG delimiters are literal: '.' must not act as regex any-char
    ("STRING_TO_ARRAY", ["'a.b'", "'.'"], "['a', 'b']"),
    ("TO_CODE_POINTS", ["'AB'"], "[65, 66]"),
    ("CODE_POINTS_TO_STRING", ["array(104, 105)"], "'hi'"),
    ("REGEXP", ["'a1'", "'[0-9]'"], "TRUE"),
    ("NOT_RLIKE", ["'abc'", "'[0-9]'"], "TRUE"),
    ("NULL_SAFE_EQUAL", ["NULL", "NULL"], "TRUE"),
    ("GETBIT", ["11", "1"], "1"),
    ("BIT_COUNT", ["11"], "3"),
    # unit is an identifier keyword for Spark's timestampadd/diff
    ("DATEADD", ["DAY", "3", "DATE '2020-01-30'"], "TIMESTAMP '2020-02-02'"),
    ("DATEPART", ["YEAR", "DATE '2020-06-01'"], "2020"),
    ("DATETIME_DIFF", ["TIMESTAMP '2020-01-03 00:00:00'", "TIMESTAMP '2020-01-01 00:00:00'", "DAY"], "2"),
    ("TIMESTAMP_TRUNC", ["TIMESTAMP '2020-06-15 13:45:00'", "MONTH"], "TIMESTAMP '2020-06-01'"),
    ("DATE_FROM_UNIX_DATE", ["3"], "DATE '1970-01-04'"),
    ("DATETIME", ["2020", "6", "1", "12", "30", "15"], "TIMESTAMP '2020-06-01 12:30:15'"),
    ("EXTRACT_VALUE", ["'<a><b>x</b></a>'", "'/a/b'"], "'x'"),
    ("EXISTS_NODE", ["'<a><b>x</b></a>'", "'/a/b'"], "1"),
]


def _norm(v):
    import decimal

    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        return round(v, 9) if not math.isnan(v) else "NaN"
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    import datetime

    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


@pytest.mark.parametrize("name,args,duck_expr", CASES, ids=[c[0] for c in CASES])
def test_function_translation(name, args, duck_expr, spark, duck):
    expr = registry.translate(name, *args)
    row = spark.sql(f"SELECT {expr} AS v").collect()
    assert len(row) == 1
    if duck_expr is not None:
        expected = duck.sql(f"SELECT {duck_expr} AS v").fetchall()[0][0]
        assert _norm(row[0][0]) == _norm(expected), f"{name}: spark={row[0][0]!r} duck={expected!r}"


def test_registry_coverage():
    """The registry must cover the headline operator groups of
    SqlStdOperatorTable + SqlLibraryOperators (SURVEY §2.4-2.6)."""
    assert len(registry.FUNCTIONS) >= 200
    libs = registry.libraries()
    for lib in ("STANDARD", "BIG_QUERY", "SPARK", "POSTGRESQL", "MYSQL", "ORACLE", "HIVE"):
        assert lib in libs
    # dialect gating: ILIKE is POSTGRESQL-only
    assert registry.lookup("ILIKE", "POSTGRESQL") is not None
    assert registry.lookup("ILIKE", "BIG_QUERY") is None
    # unknown name
    assert registry.lookup("NO_SUCH_FN") is None


def test_difference_exact_pg_semantics(spark):
    """DIFFERENCE = count of agreeing positions between the two soundex
    codes (PG fuzzystrmatch documented examples) — no longer the
    levenshtein approximation."""
    fn = registry.lookup("DIFFERENCE", "POSTGRESQL")
    assert fn.kind != "udf_todo"
    cases = [
        ("Robert", "Rupert", 4),   # R163 vs R163
        ("Anne", "Ann", 4),        # A500 vs A500
        ("Anne", "Andrew", 2),     # A500 vs A536: A=A, 5=5
        ("Anne", "Margaret", 0),   # A500 vs M626
    ]
    exprs = [
        registry.translate("DIFFERENCE", f"'{a}'", f"'{b}'", library="POSTGRESQL")
        + f" AS v{i}"
        for i, (a, b, _) in enumerate(cases)
    ]
    row = spark.sql("SELECT " + ", ".join(exprs)).collect()[0]
    for i, (a, b, want) in enumerate(cases):
        assert row[i] == want, (a, b, row[i])


def _parse_pg_interval(s: str):
    """'43 years 9 months 27 days 06:30:15' → (y, mo, d, 'HH:MM:SS')."""
    import re as _re

    y = mo = d = 0
    t = "00:00:00"
    for num, unit in _re.findall(r"(-?\d+)\s+(year|mon|month|day)s?", s):
        if unit == "year":
            y = int(num)
        elif unit in ("mon", "month"):
            mo = int(num)
        else:
            d = int(num)
    m = _re.search(r"(-?)(\d+):(\d+):(\d+)", s)
    if m:
        t = s[m.start() :]
    return y, mo, d, t


def test_age_matches_duckdb_lockstep(spark, duck):
    """AGE decomposition equals DuckDB/PG age() — including the borrow
    quirks (day underflow borrows the EARLIER month's length) — across
    hand-picked hard cases and a generated grid."""
    fn = registry.lookup("AGE", "POSTGRESQL")
    assert fn.kind != "udf_todo"
    cases = [
        ("2001-04-10 00:00:00", "1957-06-13 00:00:00"),  # PG doc: 43y 9m 27d
        ("2020-03-30 00:00:00", "2020-01-31 00:00:00"),  # 1 mon 30 days
        ("2012-03-01 00:00:00", "2012-02-28 00:00:00"),  # leap: 2 days
        ("2020-01-01 00:00:00", "2020-03-15 00:00:00"),  # negative
        ("2001-04-10 12:30:15", "1957-06-13 06:00:00"),  # time carry
        ("2020-03-01 00:00:00", "2020-01-31 23:59:59"),  # sec borrows day
        ("1999-12-31 23:59:59", "2000-01-01 00:00:00"),  # -1 second
    ] + [
        (f"20{y1:02d}-{m1:02d}-{d1:02d} 00:00:00", "2010-06-15 00:00:00")
        for y1 in (5, 15)
        for m1 in (1, 6, 12)
        for d1 in (1, 15, 28)
    ]
    # all cases ride ONE projection per engine (r15: a spark.sql collect
    # per case cost 13 s of per-query overhead; the comparison per case
    # is unchanged — same exprs, same canonical-string equality)
    sel = []
    wants = []
    for a, b in cases:
        want = duck.sql(
            f"SELECT CAST(age(TIMESTAMP '{a}', TIMESTAMP '{b}') AS VARCHAR)"
        ).fetchall()[0][0]
        wants.append(want)
        y, mo, d, t = _parse_pg_interval(want)
        neg = "-" in t
        hh, mm, ss = (abs(int(x)) for x in t.replace("-", "").split(":"))
        sign = -1 if neg else 1
        expr = registry.translate(
            "AGE", f"TIMESTAMP '{a}'", f"TIMESTAMP '{b}'", library="POSTGRESQL"
        )
        expected = (
            f"make_interval({y}, {mo}, 0, {d}, {sign * hh}, {sign * mm}, {sign * ss})"
        )
        i = len(sel)
        # CalendarInterval has no '=' in Spark — compare canonical strings
        sel.append(f"CAST(({expr}) AS STRING) AS s{i}")
        sel.append(f"CAST({expected} AS STRING) AS e{i}")
    row = spark.sql("SELECT " + ", ".join(sel)).collect()[0]
    for i, ((a, b), want) in enumerate(zip(cases, wants)):
        assert row[2 * i] == row[2 * i + 1], (
            f"age({a}, {b}): spark={row[2 * i]} duck={want} ({row[2 * i + 1]})"
        )


def test_log_dialect_arg_order(spark, duck):
    """ADVICE r2 (≈ SqlLibraryOperators.java:2658 LOG_MYSQL): MySQL/Hive/
    Spark LOG(b, x) puts the base FIRST; BigQuery LOG(x[, b]) puts it
    LAST. Both must translate to the right Spark log() and 1-arg = ln."""
    # MySQL: LOG(2, 8) = log2(8) = 3
    expr = registry.translate("LOG", "2", "8", library="MYSQL")
    assert spark.sql(f"SELECT {expr} AS v").collect()[0][0] == pytest.approx(3.0)
    # BigQuery: LOG(8, 2) = log2(8) = 3
    expr = registry.translate("LOG", "8", "2", library="BIG_QUERY")
    assert spark.sql(f"SELECT {expr} AS v").collect()[0][0] == pytest.approx(3.0)
    # 1-arg = natural log in both dialects
    for lib in ("MYSQL", "BIG_QUERY", "HIVE"):
        expr = registry.translate("LOG", "exp(2)", library=lib)
        assert spark.sql(f"SELECT {expr} AS v").collect()[0][0] == pytest.approx(2.0), lib


def test_udf_todo_list_is_empty():
    """r3: DIFFERENCE and AGE (the last two approximations) went exact —
    every registered operator is now a real implementation."""
    todos = [f.name for f in registry.FUNCTIONS.values() if f.kind == "udf_todo"]
    assert todos == [], f"UDF fallback list regressed: {todos}"


def test_no_arity_template_slot_mismatch():
    """Every allowed arity must fully fill its template's slots (via a
    per-arity dict, defaults, or matching slot count) — the r5 scan
    found PARSE_URL silently DROPPING its 3rd argument and 2-arg
    REGEXP_EXTRACT emitting a literal '{2}'. Mechanical gate so the
    class can't re-enter."""
    import re as _re

    bad = []
    for key, fn in registry.FUNCTIONS.items():
        if not fn.template or not fn.arity:
            continue
        templates = (
            fn.template.items()
            if isinstance(fn.template, dict)
            else [(k, fn.template) for k in fn.arity]
        )
        for k, tpl in templates:
            slots = {int(m) for m in _re.findall(r"\{(\d+)\}", tpl)}
            n_slots = (max(slots) + 1) if slots else 0
            filled = k + (len(fn.defaults) if not isinstance(fn.template, dict) else 0)
            if n_slots > filled:
                bad.append((key, k, "unfilled slots", tpl))
            # constant templates (ST_COORDDIM -> '2') legitimately ignore
            # args; flag only when SOME slots are used but not the last arg
            if slots and isinstance(fn.template, dict) and k > n_slots:
                bad.append((key, k, "args dropped", tpl))
    assert not bad, bad


def test_parse_url_three_arg_mode(spark):
    expr = registry.translate(
        "PARSE_URL", "'https://h/p?a=1&b=2'", "'QUERY'", "'b'", library="SPARK"
    )
    assert spark.sql(f"SELECT {expr} AS v").collect()[0][0] == "2"
    expr = registry.translate("PARSE_URL", "'https://h/p?a=1'", "'HOST'", library="SPARK")
    assert spark.sql(f"SELECT {expr} AS v").collect()[0][0] == "h"


def test_floor_ceil_datetime_units(spark):
    f = registry.translate("FLOOR", "TIMESTAMP '2012-05-10 12:34:56'", "'MONTH'")
    assert str(spark.sql(f"SELECT {f} AS v").collect()[0][0]) == "2012-05-01 00:00:00"
    c = registry.translate("CEIL", "TIMESTAMP '2012-05-10 12:34:56'", "'MONTH'")
    assert str(spark.sql(f"SELECT {c} AS v").collect()[0][0]) == "2012-06-01 00:00:00"
    # identity on a boundary (floor == input -> no bump)
    c = registry.translate("CEIL", "TIMESTAMP '2012-05-01 00:00:00'", "'MONTH'")
    assert str(spark.sql(f"SELECT {c} AS v").collect()[0][0]) == "2012-05-01 00:00:00"
    c = registry.translate("CEIL", "TIMESTAMP '2012-05-10 12:34:56'", "'HOUR'")
    assert str(spark.sql(f"SELECT {c} AS v").collect()[0][0]) == "2012-05-10 13:00:00"
    # numeric forms unchanged
    assert spark.sql(
        f"SELECT {registry.translate('CEIL', '1.2')} AS v"
    ).collect()[0][0] == 2


def test_array_to_string_null_text(spark):
    e = registry.translate(
        "ARRAY_TO_STRING", "array('a', NULL, 'c')", "'-'", "'?'", library="BIG_QUERY"
    )
    assert spark.sql(f"SELECT {e} AS v").collect()[0][0] == "a-?-c"
    e = registry.translate("ARRAY_TO_STRING", "array('a', NULL, 'c')", "'-'", library="BIG_QUERY")
    assert spark.sql(f"SELECT {e} AS v").collect()[0][0] == "a-c"


def test_listagg_default_separator(spark):
    e = registry.translate("LISTAGG", "x")
    out = spark.sql(f"SELECT {e} AS v FROM (SELECT explode(array('b','a')) AS x)")
    assert out.collect()[0][0] == "a,b"


def test_json_length_keys_path_mode(spark):
    e = registry.translate("JSON_LENGTH", "'{\"a\": [1,2,3]}'", "'$.a'")
    assert spark.sql(f"SELECT {e} AS v").collect()[0][0] == 3
    e = registry.translate("JSON_KEYS", "'{\"a\": {\"x\": 1, \"y\": 2}}'", "'$.a'")
    assert spark.sql(f"SELECT {e} AS v").collect()[0][0] == ["x", "y"]


def test_soundex_dialect_variant(spark):
    e = registry.translate("SOUNDEX", "'Robert'", library="ORACLE")
    assert spark.sql(f"SELECT {e} AS v").collect()[0][0] == "R163"


# -- r8: POSTGRESQL-library REGEXP_REPLACE (r7 verdict "wrong" #1) ----

def _sql_lit(s: str) -> str:
    """Calcite/standard-SQL string literal: '' doubling, backslash is a
    PLAIN character (what _parse_literal undoes)."""
    return "'" + s.replace("'", "''") + "'"


def _pg_rr(spark, s, pat, repl, flags=None):
    args = [_sql_lit(s), _sql_lit(pat), _sql_lit(repl)]
    if flags is not None:
        args.append(_sql_lit(flags))
    expr = registry.translate("REGEXP_REPLACE", *args, library="POSTGRESQL")
    return spark.sql(f"SELECT {expr} AS v").collect()[0].v


def test_pg_regexp_replace_babel_fixtures(spark):
    """Replays babel/src/test/resources/sql/postgresql.iq:1352-1370
    (reference ops REGEXP_REPLACE_PG_3/_PG_4, SqlFunctions.java:801-810):
    3-arg replaces only the FIRST match, 'g' replaces all, 'i' is
    case-insensitive, and replacement groups are backslash-indexed."""
    assert _pg_rr(spark, "abc def GHI", "[a-z]+", "X") == "X def GHI"
    assert _pg_rr(spark, "abc def GHI", "[a-z]+", "X", "g") == "X X GHI"
    assert _pg_rr(spark, "ABC def GHI", "[a-z]+", "X", "i") == "X def GHI"
    assert _pg_rr(spark, "ABC def GHI", "([a-z]+).*", "\\1", "i") == "ABC"


def test_pg_regexp_replace_semantics(spark, duck):
    """First-occurrence anchor rewrite details: group shift, literal $,
    empty-match patterns, backrefs inside the PATTERN, dotall prefix
    (first match beyond a newline), flag toggles — every case also
    cross-checked against DuckDB's NATIVE regexp_replace (first-match
    by default, backslash-indexed replacement: the exact PG twin)."""
    cases = [
        # (s, pat, repl, flags, expected)
        ("a1b2c3", "([0-9])", "<\\1>", None, "a<1>b2c3"),
        ("a1b2c3", "([0-9])", "<\\1>", "g", "a<1>b<2>c<3>"),
        ("abc", "x*", "-", None, "-abc"),          # empty first match
        ("price $5", "[0-9]", "$$", None, "price $$$"),  # literal $
        ("l1\nl2x", "l2(x)", "[\\1]", None, "l1\n[x]"),  # across newline
        ("AbAb", "a", "-", "gi", "-b-b"),
        ("AbAb", "a", "-", "ig", "-b-b"),
        ("AbAb", "a", "-", "ic", "AbAb"),           # c clears i; no match
        ("x.y", "\\.", "_", None, "x_y"),           # escaped metachar
        ("ab", "(a)(b)", "\\2\\1", None, "ba"),     # two groups swap
    ]
    for s, pat, repl, flags, want in cases:
        got = _pg_rr(spark, s, pat, repl, flags)
        assert got == want, (s, pat, repl, flags, got)
        native = duck.execute(
            "SELECT regexp_replace(?, ?, ?, ?)", [s, pat, repl, flags or ""]
        ).fetchone()[0]
        assert got == native, f"DuckDB twin diverges: {(s, pat, repl, flags)}"
    # parity-only cases (no DuckDB twin): RE2 has no backreferences in
    # PATTERNS, and the reference's replaceNonDollarIndexedString does
    # TWO backslash-unescape levels (\\\\ → \\ pre-step, then Java's
    # \\ → \) where PG/DuckDB do one — documented reference-vs-PG
    # divergences we replay faithfully
    assert _pg_rr(spark, "aa bb", "(a)\\1", "X") == "X bb"  # shifted to \2
    assert _pg_rr(spark, "aXb", "X", "\\\\\\\\", "g") == "a\\b"


def test_pg_regexp_replace_refusals(spark):
    """Refuse-over-wrong gates: non-literal args, unknown flags
    (reference throws invalidInputForRegexpReplace), 'm' without 'g'
    (breaks the single-^ anchor), \\0 whole-match without 'g', multi-
    digit pattern backrefs (ambiguous renumbering), invalid replacement
    escapes (reference invalidReplacePatternForRegexpReplace)."""
    with pytest.raises(ValueError, match="literal"):
        registry.translate(
            "REGEXP_REPLACE", "col_a", "pat_col", "'x'", library="POSTGRESQL"
        )
    with pytest.raises(ValueError, match="Invalid input"):
        _pg_rr(spark, "a", "a", "x", "q")
    with pytest.raises(ValueError, match="'m' flag"):
        _pg_rr(spark, "a", "a", "x", "m")
    with pytest.raises(ValueError, match="whole-match"):
        _pg_rr(spark, "a", "a", "\\0")
    with pytest.raises(ValueError, match="multi-digit|unambiguous"):
        _pg_rr(spark, "a", "(a)\\12", "x")
    with pytest.raises(ValueError, match="Invalid replacement"):
        _pg_rr(spark, "a", "a", "\\q")
    # 'm' WITH 'g' is supported (plain multiline replace-all)
    assert _pg_rr(spark, "a\nb", "^.", "-", "gm") == "-\n-"
    # other libraries keep replace-ALL 3-arg semantics (REGEXP_REPLACE_3)
    e = registry.translate(
        "REGEXP_REPLACE", "'abc def'", "'[a-z]+'", "'X'", library="ORACLE"
    )
    assert spark.sql(f"SELECT {e} AS v").collect()[0].v == "X X"


def test_pg_regexp_replace_fuzz_vs_duckdb(spark, duck):
    """Hypothesis fuzz vs the DuckDB native twin over a safe common
    regex subset (Java ⋂ RE2): random subject strings, a pattern pool
    with/without capture groups, replacements with group refs, all flag
    combos the lowering accepts."""
    from hypothesis import given, settings, strategies as st

    pats_repls = st.sampled_from([
        ("[a-z]+", "X"), ("[0-9]", "#"), ("a", "_"), ("b+", "(\\0)"),
        ("([a-z])([0-9])", "\\2\\1"), ("(a+)", "[\\1]"), ("\\s", "."),
        ("c?a", "$"), ("(x)|(a)", "<\\2>"),
    ])
    flags = st.sampled_from([None, "g", "i", "gi", "gc", "gs", "gn"])
    subjects = st.text(alphabet="ab1 2xc\nA.", min_size=0, max_size=12)

    @settings(max_examples=120, deadline=None)
    @given(subjects, pats_repls, flags)
    def check(s, pr, fl):
        pat, repl = pr
        if "\\0" in repl and (fl is None or "g" not in fl):
            return  # refused without 'g' (whole-match shift)
        got = _pg_rr(spark, s, pat, repl, fl)
        native = duck.execute(
            "SELECT regexp_replace(?, ?, ?, ?)", [s, pat, repl, fl or ""]
        ).fetchone()[0]
        assert got == native, (s, pat, repl, fl, got, native)

    check()
