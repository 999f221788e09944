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
