"""Replay of the reference's PG TO_CHAR corpus
(core/src/test/resources/pg_to_char_queries.sql — 68 queries the
reference validates against a live PostgreSQL via
to_char_generate_iq.py). Expected values here are derived from the
reference's own pinned formatter semantics
(core/src/test/java/org/apache/calcite/util/format/postgresql/
PostgresqlDateTimeFormatterTest.java, 810 assertions): MONTH/DAY
blank-pad to 9, DDD/IDDD zero-pad 3, IW/CC zero-pad 2, WW/W/D/Q/J/SSSS
unpadded, RM unpadded roman numerals, AM/PM render the actual meridiem,
BC/AD the actual era, J counts from the Julian epoch (J(2024-01-01) =
2460311 per testJ).

r9: TO_CHAR templates whose tokens Java patterns cannot render now
compile to composed JVM expressions (pg_format.pg_to_char_expr) instead
of refusing — this corpus is the acceptance gate for that tier.
"""

from __future__ import annotations

import pytest

from calcite_spark.functions.registry import translate

A = "TIMESTAMP '2022-06-03 12:15:48.678'"  # Friday, DOY 154, ISO wk 22
B = "TIMESTAMP '2022-06-03 13:15:48.678'"
C = "TIMESTAMP '2022-06-03 02:15:48.678'"
D = "TIMESTAMP '2023-01-01 12:15:48.678'"  # Sunday, ISO year 2022
E = "TIMESTAMP '0001-01-01 00:00:00'"      # proleptic Monday

# (input, template, expected) — one row per corpus query, same order
CORPUS = [
    (A, "YYYY-MM-DD HH24:MI:SS.MS", "2022-06-03 12:15:48.678"),
    (A, "HH", "12"),
    (B, "HH12", "01"),
    (B, "HH24", "13"),
    (B, "MI", "15"),
    (B, "SS", "48"),
    (B, "MS", "678"),
    (A, "US", "678000"),
    (A, "FF1", "6"),
    (A, "FF2", "67"),
    (A, "FF3", "678"),
    (A, "FF4", "6780"),
    (A, "FF5", "67800"),
    (A, "FF6", "678000"),
    (A, "SSSS", "44148"),
    (A, "SSSSS", "44148"),
    (A, "AM", "PM"),
    (A, "am", "pm"),
    (C, "PM", "AM"),
    (C, "pm", "am"),
    (A, "A.M.", "P.M."),
    (A, "a.m.", "p.m."),
    (C, "P.M.", "A.M."),
    (C, "p.m.", "a.m."),
    (A, "Y,YYY", "2,022"),
    (A, "YYYY", "2022"),
    (A, "YYY", "022"),
    (A, "YY", "22"),
    (A, "Y", "2"),
    (D, "IYYY", "2022"),
    (D, "IYY", "022"),
    (D, "IY", "22"),
    (D, "I", "2"),
    (A, "BC", "AD"),
    (A, "bc", "ad"),
    (A, "AD", "AD"),
    (A, "ad", "ad"),
    (A, "B.C.", "A.D."),
    (A, "b.c.", "a.d."),
    (A, "A.D.", "A.D."),
    (A, "a.d.", "a.d."),
    (A, "MONTH", "JUNE     "),
    (A, "Month", "June     "),
    (A, "month", "june     "),
    (A, "MON", "JUN"),
    (A, "Mon", "Jun"),
    (A, "mon", "jun"),
    (A, "DAY", "FRIDAY   "),
    (A, "Day", "Friday   "),
    (A, "day", "friday   "),
    (A, "DY", "FRI"),
    (E, "DY", "MON"),
    (A, "Dy", "Fri"),
    (A, "dy", "fri"),
    (A, "DDD", "154"),
    (A, "IDDD", "152"),
    (A, "DD", "03"),
    (A, "D", "6"),
    (A, "ID", "5"),
    (A, "W", "1"),
    (A, "WW", "22"),
    (B, "IW", "22"),
    (A, "CC", "21"),
    (A, "J", "2459734"),
    (B, "Q", "2"),
    (B, "RM", "VI"),
    (B, "rm", "vi"),
]


@pytest.mark.parametrize("i", range(len(CORPUS)))
def test_pg_to_char_corpus(spark, i):
    arg, template, expected = CORPUS[i]
    expr = translate("TO_CHAR", arg, f"'{template}'")
    got = spark.sql(f"SELECT {expr} AS v").collect()[0].v
    assert got == expected, (template, expr, got, expected)


def test_composed_template_mixing_tiers(spark):
    """A template mixing Java-renderable runs, expression tokens, and a
    quoted literal composes correctly."""
    expr = translate("TO_CHAR", A, "'\"week \"IW\" of \"YYYY (Q)'")
    got = spark.sql(f"SELECT {expr} AS v").collect()[0].v
    assert got == "week 22 of 2022 (2)"


def test_reference_formatter_pinned_edges(spark):
    """Extra edges pinned straight from PostgresqlDateTimeFormatterTest:
    Y,YYY zero-pads the post-comma group (year 100 -> 0,100), WW/W are
    UNpadded, CC zero-pads to 2, J matches testJ's epoch anchor."""
    cases = [
        ("TIMESTAMP '0100-06-01 00:00:00'", "Y,YYY", "0,100"),
        ("TIMESTAMP '2024-01-01 00:00:00'", "WW", "1"),
        ("TIMESTAMP '2024-01-01 00:00:00'", "W", "1"),
        ("TIMESTAMP '0001-06-01 00:00:00'", "CC", "01"),
        ("TIMESTAMP '2024-01-01 00:00:00'", "J", "2460311"),
        ("TIMESTAMP '2024-01-01 00:00:00'", "SSSS", "0"),
        ("TIMESTAMP '2024-01-01 23:59:59'", "SSSSS", "86399"),
        ("TIMESTAMP '2019-12-29 00:00:00'", "IYYY", "2019"),  # testIYYY date1
        ("TIMESTAMP '2019-12-30 00:00:00'", "IYYY", "2020"),  # testIYYY date2
        ("TIMESTAMP '2019-12-29 00:00:00'", "IDDD", "364"),   # testIDDD date1
        ("TIMESTAMP '2019-12-30 00:00:00'", "IDDD", "001"),   # testIDDD date2
        ("TIMESTAMP '2024-01-01 00:00:00'", "RM", "I"),
        ("TIMESTAMP '2024-08-01 00:00:00'", "RM", "VIII"),
        ("TIMESTAMP '2024-12-01 00:00:00'", "rm", "xii"),
    ]
    for arg, template, expected in cases:
        expr = translate("TO_CHAR", arg, f"'{template}'")
        got = spark.sql(f"SELECT {expr} AS v").collect()[0].v
        assert got == expected, (template, expr, got, expected)


def test_bracket_separators_render_literally(spark):
    """r9 review: '[' and ']' are java.time optional-section
    metacharacters — unquoted they silently VANISH from output. Both
    the fast path and the composed compiler must quote them."""
    expr = translate("TO_CHAR", A, "'DD[MM]'")
    got = spark.sql(f"SELECT {expr} AS v").collect()[0].v
    assert got == "03[06]"
    # composed path (expression token forces the compiler)
    expr = translate("TO_CHAR", A, "'J[DD]'")
    got = spark.sql(f"SELECT {expr} AS v").collect()[0].v
    assert got == "2459734[03]"


def test_reference_grid_pins(spark):
    """Further pins lifted from PostgresqlDateTimeFormatterTest's
    per-token grids: the Y,YYY comma form across year magnitudes
    (testYCommaYYY: 2,024 / 0,100 / 0,001 / 32,136), the IYYY grid
    around an ISO year boundary (testIYYY dates 1-5), zero-padded
    year-fragment forms, and the CC/W/WW/DDD grids."""
    cases = [
        # testYCommaYYY — year 32136 uses make_date (literal range)
        ("TIMESTAMP '2024-01-01 00:00:00'", "Y,YYY", "2,024"),
        ("TIMESTAMP '0100-01-01 00:00:00'", "Y,YYY", "0,100"),
        ("TIMESTAMP '0001-01-01 00:00:00'", "Y,YYY", "0,001"),
        # testYYYY zero-padding / wide years
        ("TIMESTAMP '0001-01-01 00:00:00'", "YYYY", "0001"),
        ("TIMESTAMP '0100-01-01 00:00:00'", "YYY", "100"),
        ("TIMESTAMP '0001-01-01 00:00:00'", "YY", "01"),
        ("TIMESTAMP '0100-01-01 00:00:00'", "Y", "0"),
        # testIYYY: 2019-12-28/29 belong to ISO 2019; 12-30/31 and
        # 2020-01-01 to ISO 2020
        ("TIMESTAMP '2019-12-28 00:00:00'", "IYYY", "2019"),
        ("TIMESTAMP '2019-12-29 00:00:00'", "IYYY", "2019"),
        ("TIMESTAMP '2019-12-30 00:00:00'", "IYYY", "2020"),
        ("TIMESTAMP '2019-12-31 00:00:00'", "IYYY", "2020"),
        ("TIMESTAMP '2020-01-01 00:00:00'", "IYYY", "2020"),
        ("TIMESTAMP '2019-12-29 00:00:00'", "I", "9"),
        ("TIMESTAMP '2019-12-30 00:00:00'", "IY", "20"),
        # testIW: Sunday 2019-12-29 is still 2019-W52
        ("TIMESTAMP '2019-12-29 00:00:00'", "IW", "52"),
        ("TIMESTAMP '2019-12-30 00:00:00'", "IW", "01"),
        # testCC grid (positive eras)
        ("TIMESTAMP '2024-01-01 00:00:00'", "CC", "21"),
        ("TIMESTAMP '2000-12-31 00:00:00'", "CC", "20"),
        ("TIMESTAMP '2001-01-01 00:00:00'", "CC", "21"),
        # testDDD zero-padding
        ("TIMESTAMP '2024-01-01 00:00:00'", "DDD", "001"),
        ("TIMESTAMP '2024-03-01 00:00:00'", "DDD", "061"),
        ("TIMESTAMP '2023-11-02 00:00:00'", "DDD", "306"),
        # testW / testWW (unpadded)
        ("TIMESTAMP '2024-01-01 00:00:00'", "W", "1"),
        ("TIMESTAMP '2024-03-01 00:00:00'", "WW", "9"),
        ("TIMESTAMP '2023-10-07 00:00:00'", "WW", "40"),
        ("TIMESTAMP '2024-01-15 00:00:00'", "W", "3"),
        ("TIMESTAMP '2024-01-29 00:00:00'", "W", "5"),
    ]
    exprs = [translate("TO_CHAR", arg, f"'{t}'") for arg, t, _ in cases]
    sql = "SELECT " + ", ".join(f"{e} AS c{i}" for i, e in enumerate(exprs))
    row = spark.sql(sql).collect()[0]
    for i, (arg, template, expected) in enumerate(cases):
        assert row[i] == expected, (arg, template, row[i], expected)


def test_ordinal_suffixes(spark):
    """TH/th ordinal suffixes (PostgresqlDateTimeFormatterTest
    testSSSSS block: '0TH', '1001ST', '86399TH', lowercase '1001st';
    suffix case follows the SUFFIX token's case)."""
    cases = [
        ("TIMESTAMP '2024-01-01 00:00:00'", "SSSSTH", "0TH"),
        ("TIMESTAMP '2024-01-01 00:16:41'", "SSSSTH", "1001ST"),
        ("TIMESTAMP '2024-01-01 23:59:59'", "SSSSth", "86399th"),
        ("TIMESTAMP '2024-01-01 00:16:41'", "SSSSSth", "1001st"),
        (A, "DDth Mon", "03rd Jun"),
        (A, "DDTH", "03RD"),
        (A, "YYYYth", "2022nd"),
        (A, "Jth", "2459734th"),
        ("TIMESTAMP '2024-01-11 00:00:00'", "DDTH", "11TH"),
        ("TIMESTAMP '2024-01-22 00:00:00'", "DDth", "22nd"),
        ("TIMESTAMP '2024-01-13 00:00:00'", "DDTH", "13TH"),
    ]
    for arg, template, expected in cases:
        expr = translate("TO_CHAR", arg, f"'{template}'")
        got = spark.sql(f"SELECT {expr} AS v").collect()[0].v
        assert got == expected, (template, expr, got, expected)
    # TH after a NAME token stays a loud refusal
    with pytest.raises(ValueError, match="numeric tokens"):
        translate("TO_CHAR", A, "'MonTH'")


def test_unsupported_tokens_still_refuse():
    for template in ("TZ", "OF"):
        with pytest.raises(ValueError):
            translate("TO_CHAR", A, f"'{template}'")
    # non-literal template still refuses (plan-time conversion contract)
    with pytest.raises(ValueError, match="string literal"):
        translate("TO_CHAR", A, "some_col")
