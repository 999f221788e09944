"""Reference-fixture parity for the SqlLibraryOperators long tail
(VERDICT r5 item 5): PARSE_URL modes + key-quoting and the SOUNDEX
dialect variants, replayed against the reference's own operator-test
fixtures (testkit SqlOperatorTest.java:5246 parse_url,
:6258-6302 soundex / soundex_spark)."""

from __future__ import annotations

import pytest

from calcite_spark.functions.registry import translate


def _one(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").collect()[0].v


URL = "'http://calcite.apache.org/path1/p.php?k1=v1&k2=v2#Ref1'"

# (part, expected) — SqlOperatorTest.java:5252-5328
PARSE_URL_2ARG = [
    ("'HOST'", "calcite.apache.org"),
    ("'PATH'", "/path1/p.php"),
    ("'QUERY'", "k1=v1&k2=v2"),
    ("'REF'", "Ref1"),
    ("'PROTOCOL'", "http"),
    ("'FILE'", "/path1/p.php?k1=v1&k2=v2"),
    ("'AUTHORITY'", "calcite.apache.org"),
    ("'USERINFO'", None),
    ("'INVALID_PART_TO_EXTRACT'", None),
]


@pytest.mark.parametrize("part,expected", PARSE_URL_2ARG)
def test_parse_url_two_arg_modes(spark, part, expected):
    assert _one(spark, translate("PARSE_URL", URL, part, library="SPARK")) == expected


def test_parse_url_more_two_arg_fixtures(spark):
    # raw path keeps percent-escapes (:5260)
    assert _one(spark, translate(
        "PARSE_URL", "'http://calcite.apache.org/path1/%20p.php?x=1'",
        "'PATH'", library="SPARK")) == "/path1/%20p.php"
    # userinfo present (:5308)
    assert _one(spark, translate(
        "PARSE_URL", "'http://bob@calcite.apache.org/p.php'",
        "'USERINFO'", library="SPARK")) == "bob"
    # FILE without query (:5296)
    assert _one(spark, translate(
        "PARSE_URL", "'http://calcite.apache.org/path1/p.php'",
        "'FILE'", library="SPARK")) == "/path1/p.php"
    # invalid URLs -> NULL (:5326-5328)
    for url in ("'http:calcite.apache.org/path1/p.php'",
                "'calcite.apache.org/path1/p.php'",
                "'/path1/p.php?k1=v1'"):
        assert _one(spark, translate("PARSE_URL", url, "'HOST'", library="SPARK")) is None


def test_parse_url_query_key_is_literal_not_regex(spark):
    """The reference Pattern.quote()s the key (SqlFunctions.java:1895);
    bare Spark parse_url treats it as a regex. The registry wrapper
    restores literal semantics (:5272-5291)."""
    t = lambda *a: _one(spark, translate("PARSE_URL", *a, library="SPARK"))
    assert t(URL, "'QUERY'", "'k2'") == "v2"
    assert t(URL, "'QUERY'", "'k1'") == "v1"
    assert t(URL, "'QUERY'", "'k3'") is None
    # 'k.' must NOT match k1/k2 (regex would)
    assert t(URL, "'QUERY'", "'k.'") is None
    # a literal dotted key still matches itself, not its regex-cousins
    dotted = "'http://calcite.apache.org/p.php?a.b=v1&axb=v2#Ref1'"
    assert t(dotted, "'QUERY'", "'a.b'") == "v1"
    # regex metachars must not error (:5290 — bare Spark throws here)
    assert t(URL, "'QUERY'", "'('") is None
    # key on a non-QUERY part -> NULL (:5322)
    assert t(URL, "'HOST'", "'k1'") is None


# -- SOUNDEX variants (SqlOperatorTest.java:6258-6302) ----------------

STRICT_FIXTURES = [
    ("'TECH ON THE NET'", "T253"),
    ("'Miller'", "M460"),
    ("'miler'", "M460"),
    ("'myller'", "M460"),
    ("'muller'", "M460"),
    ("'m'", "M000"),
    ("'mu'", "M000"),
    ("'mile'", "M400"),
    ("CAST(NULL AS STRING)", None),
]


@pytest.mark.parametrize("arg,expected", STRICT_FIXTURES)
@pytest.mark.parametrize("lib", ["BIG_QUERY", "MYSQL", "POSTGRESQL", "ORACLE", "HIVE"])
def test_soundex_strict_fixtures(spark, lib, arg, expected):
    assert _one(spark, translate("SOUNDEX", arg, library=lib)) == expected


def test_soundex_strict_unmapped_letter_errors(spark):
    """commons-codec semantics: a letter outside A-Z throws 'The
    character is not mapped' (:6275) instead of passing through."""
    with pytest.raises(Exception, match="not mapped"):
        _one(spark, translate("SOUNDEX", "'字字'", library="ORACLE"))


def test_soundex_strict_clean_to_empty(spark):
    """digits-only input survives clean() as '' (PG fuzzystrmatch
    behavior), never the input itself."""
    assert _one(spark, translate("SOUNDEX", "'123'", library="MYSQL")) == ""


def test_soundex_spark_passthrough(spark):
    """SOUNDEX_SPARK (:6286-6299): unmappable input returns UNCHANGED."""
    t = lambda a: _one(spark, translate("SOUNDEX", a, library="SPARK"))
    assert t("'Miller'") == "M460"
    assert t("'字字'") == "字字"
    assert t("CAST(NULL AS STRING)") is None


# -- r7: PG TO_CHAR datetime templates (babel postgresql.iq tier) -----
# The reference converts PG templates with PostgresqlDateTimeFormatter
# (util/format/); Spark's date_format takes JAVA patterns, so the
# registry converts literal templates at plan time
# (functions/pg_format.py). Passing a PG template through verbatim is
# silently wrong: 'HH24' renders as Java HH + literal 24 = '1224'.

TO_CHAR_TS = "timestamp '2022-06-03 13:15:48.678'"
TO_CHAR_CASES = [
    ("'YYYY-MM-DD HH24:MI:SS.MS'", "2022-06-03 13:15:48.678"),
    ("'HH24'", "13"),
    ("'HH12'", "01"),
    ("'HH'", "01"),
    ("'MI'", "15"),
    ("'SS'", "48"),
    ("'MS'", "678"),
    ("'US'", "678000"),
    ("'FF1'", "6"),
    ("'FF3'", "678"),
    ("'Mon DD, YYYY'", "Jun 03, 2022"),
    ("'FMMonth FMDD, YYYY'", "June 3, 2022"),
    ("'Dy'", "Fri"),
    ("'AM'", "PM"),
    ("'PM'", "PM"),
    ("'Q'", "2"),
    ("'DDD'", "154"),
    ("'YY'", "22"),
    ('\'"year:" YYYY\'', "year: 2022"),
]


@pytest.mark.parametrize("tmpl,expected", TO_CHAR_CASES)
def test_to_char_pg_template(spark, tmpl, expected):
    expr = translate("TO_CHAR", TO_CHAR_TS, tmpl, library="POSTGRESQL")
    assert _one(spark, expr) == expected


def test_to_char_pg_template_refusals():
    """r9: tokens Java patterns cannot render (blank-padded Month/Day,
    lowercase meridians, locale week numbers, Julian dates, century)
    now COMPILE into composed JVM expressions (pg_format.
    pg_to_char_expr — corpus-verified in test_pg_to_char_corpus.py)
    instead of refusing; only session-zone tokens, ordinal suffixes,
    and non-literal templates still refuse."""
    for now_ok in ("'Month'", "'Day'", "'am'", "'MON'", "'WW'", "'IW'",
                   "'J'", "'CC'", "'D'"):
        expr = translate("TO_CHAR", TO_CHAR_TS, now_ok, library="POSTGRESQL")
        assert "date_format" in expr or "CAST" in expr or "rpad" in expr
    for bad in ("'TZ'", "'OF'"):
        with pytest.raises(ValueError):
            translate("TO_CHAR", TO_CHAR_TS, bad, library="POSTGRESQL")
    with pytest.raises(ValueError, match="literal"):
        translate("TO_CHAR", TO_CHAR_TS, "some_col", library="POSTGRESQL")


def test_to_date_to_timestamp_pg_template_parse(spark):
    """r9 (rebuilt r14): TO_DATE/TO_TIMESTAMP under PG/Oracle/Redshift/
    Hive compile the template at plan time. Since r14 the lowering is
    the pg_parse field-extraction compiler (regexp_extract →
    make_timestamp), which the postgresql.iq:529-1250 battery pins
    exactly: PG's 0001 defaults for missing fields, lenient digit
    widths, short-year completion, ISO week dates — semantics the
    previous Java-pattern conversion could not express (it defaulted
    to 1970 and required padded digits)."""
    for lib in ("POSTGRESQL", "ORACLE", "REDSHIFT", "HIVE"):
        expr = translate("TO_DATE", "'2022-06-03'", "'YYYY-MM-DD'", library=lib)
        got = spark.sql(f"SELECT {expr} AS v").collect()[0].v
        assert str(got) == "2022-06-03"
    expr = translate(
        "TO_TIMESTAMP", "'03/06/2022 13:15:48'", "'DD/MM/YYYY HH24:MI:SS'",
        library="POSTGRESQL",
    )
    got = spark.sql(f"SELECT {expr} AS v").collect()[0].v
    assert str(got) == "2022-06-03 13:15:48"
    # the raw passthrough these replace fails outright on PG templates
    # (Spark bans the 'Y' week-based-year pattern letter)
    with pytest.raises(Exception):
        spark.sql("SELECT to_date('2022-06-03', 'YYYY-MM-DD')").collect()
    # library-less calls keep Spark-native Java patterns
    assert (
        translate("TO_DATE", "x", "'yyyy-MM-dd'")
        == "to_date(x, 'yyyy-MM-dd')"
    )
    # non-literal template refuses (plan-time conversion contract)
    with pytest.raises(ValueError, match="literal"):
        translate("TO_DATE", "x", "fmt_col", library="POSTGRESQL")
    # malformed input RAISES (PG errors; the compiled parser emits
    # raise_error on the anchored-regex mismatch)
    expr = translate("TO_DATE", "'not-a-date'", "'YYYY-MM-DD'", library="POSTGRESQL")
    with pytest.raises(Exception, match="does not match template|not-a-date"):
        spark.sql(f"SELECT {expr} AS v").collect()
    # r14: Dy and Q now PARSE (PG accepts both on input — Dy matches a
    # day name it then ignores outside ISO mode, Q is consumed and
    # ignored); the r9 plan-time refusal applied to the retired
    # Java-pattern path, which had no lowering for them
    expr = translate("TO_DATE", "'Wed 17 2024'", "'Dy DD YYYY'", library="POSTGRESQL")
    assert str(spark.sql(f"SELECT {expr} AS v").collect()[0].v) == "2024-01-17"
    # genuinely unparseable tokens still refuse at plan time
    with pytest.raises(ValueError):
        translate("TO_DATE", "x", "'YYYY-MM-DDTZ'", library="POSTGRESQL")
    # r9 review: the 1-arg forms keep their pre-variant passthrough
    assert translate("TO_DATE", "ts_col", library="HIVE") == "to_date(ts_col)"
    assert (
        translate("TO_TIMESTAMP", "s_col", library="ORACLE")
        == "to_timestamp(s_col)"
    )
    # month-name parse is case-insensitive (the compiled CASE matches
    # on lower())
    expr = translate("TO_DATE", "'25 DEC 2008'", "'DD MON YYYY'", library="POSTGRESQL")
    assert str(spark.sql(f"SELECT {expr} AS v").collect()[0].v) == "2008-12-25"


# -- r7: PG string_to_array (babel postgresql.iq tier) ----------------
# Fixtures replay the reference's committed behavior: 3-arg nullstr
# maps matching elements to NULL, '' delimiter keeps the whole string,
# NULL delimiter splits per character, '' input yields the EMPTY array,
# and the delimiter is a LITERAL (never a regex).

STA_CASES = [
    (("'a,b,c'", "','", "'d'"), ["a", "b", "c"]),
    (("'a,b,,d'", "','", "'d'"), ["a", "b", "", None]),
    (("'a,b,,d'", "','", "NULL"), ["a", "b", "", "d"]),
    (("'abc'", "''"), ["abc"]),
    (("'abc'", "','", "'abc'"), [None]),
    (("'calcite apache org'", "' '", "'apache'"), ["calcite", None, "org"]),
    (("'calcite apache org'", "' '"), ["calcite", "apache", "org"]),
    (("'a*c'", "NULL", "'*'"), ["a", None, "c"]),
    (("NULL", "' '"), None),
    (("''", "''"), []),
    (("'a.b'", "'.'"), ["a", "b"]),  # literal dot — not regex any-char
    (("'a|b'", "'|'"), ["a", "b"]),
]


@pytest.mark.parametrize("args,expected", STA_CASES)
def test_string_to_array_pg_semantics(spark, args, expected):
    expr = translate("STRING_TO_ARRAY", *args, library="POSTGRESQL")
    assert _one(spark, f"({expr})") == expected
