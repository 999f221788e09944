"""BigQuery FORMAT_*/PARSE_* %-element tier (r9) — fixture replays from
babel big-query.iq:4289-4490 plus a DuckDB strftime/strptime lockstep
grid (DuckDB shares the strftime %-vocabulary, so it is a native twin
for the overlapping codes).

The old registry templates fed the %-string to Spark's JAVA pattern
reader — '%m' formatted the MINUTE, '%Y' died on the banned
week-based-year letter. Conversion now happens at plan time
(functions/bq_format.py), mirroring the reference's BIG_QUERY format
model (util/format/FormatModels.java:100-170).
"""

from __future__ import annotations

import pytest

from calcite_spark.functions.registry import translate


def _run(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").collect()[0].v


def _fmt(spark, name, fmt, value):
    return _run(spark, translate(name, f"'{fmt}'", value, library="BIG_QUERY"))


# -- big-query.iq fixture replays (expected values from the corpus) ---


def test_format_date_fixtures(spark):
    d = "DATE '2008-12-25'"
    assert _fmt(spark, "FORMAT_DATE", "%x", d) == "12/25/08"          # :4300
    assert _fmt(spark, "FORMAT_DATE", "%b-%d-%Y", d) == "Dec-25-2008"  # :4310
    assert _fmt(spark, "FORMAT_DATE", "%b %Y", d) == "Dec 2008"        # :4320


def test_format_datetime_timestamp_fixtures(spark):
    ts = "TIMESTAMP '2008-12-25 15:30:00'"
    assert _fmt(spark, "FORMAT_DATETIME", "%c", ts) == "Thu Dec 25 15:30:00 2008"  # :4341
    assert _fmt(spark, "FORMAT_DATETIME", "%b-%d-%Y", ts) == "Dec-25-2008"  # :4353
    assert _fmt(spark, "FORMAT_DATETIME", "%b %Y", ts) == "Dec 2008"  # :4365
    assert _fmt(spark, "FORMAT_TIMESTAMP", "%c", ts) == "Thu Dec 25 15:30:00 2008"  # :4408
    # 3-arg form with the literal UTC zone (the session zone)
    expr = translate(
        "FORMAT_TIMESTAMP", "'%b-%d-%Y'", ts, "'UTC'", library="BIG_QUERY"
    )
    assert _run(spark, expr) == "Dec-25-2008"
    with pytest.raises(ValueError, match="UTC"):
        translate(
            "FORMAT_TIMESTAMP", "'%b'", ts, "'America/New_York'", library="BIG_QUERY"
        )


def test_parse_date_fixtures(spark):
    # :4453 uses "%A %b %e %Y" — Spark's formatter REJECTS weekday-name
    # letters on the parse side, so %A refuses at plan time (documented
    # divergence from the reference, which parses the name at runtime;
    # a loud refusal, never a silently mis-parsed date)
    with pytest.raises(ValueError, match="parse"):
        translate(
            "PARSE_DATE", "'%A %b %e %Y'", "'Thursday Dec 25 2008'",
            library="BIG_QUERY",
        )
    got = _fmt(spark, "PARSE_DATE", "%b %e %Y", "'Dec 25 2008'")
    assert str(got) == "2008-12-25"
    got = _fmt(spark, "PARSE_DATE", "%F", "'2000-12-30'")              # :4476
    assert str(got) == "2000-12-30"
    got = _fmt(spark, "PARSE_TIMESTAMP", "%Y-%m-%d %H:%M:%S", "'2008-12-25 07:30:00'")
    assert str(got) == "2008-12-25 07:30:00"
    got = _fmt(spark, "PARSE_DATETIME", "%T", "'15:30:55'")
    assert str(got).endswith("15:30:55")
    # mislocated elements fail to parse, as in the corpus error rows
    # (:4464 — ANSI session raises like BQ)
    with pytest.raises(Exception):
        spark.sql(
            "SELECT "
            + translate(
                "PARSE_DATE", "'%Y %A %b %e'", "'Thursday Dec 25 2008'",
                library="BIG_QUERY",
            )
        ).collect()


# -- DuckDB strftime lockstep over the shared %-vocabulary ------------


def test_format_lockstep_vs_duckdb_strftime(spark, duck):
    stamps = [
        "2008-12-25 15:30:00.123456",
        "2020-02-29 00:00:01.000001",
        "1999-01-03 23:59:59.999999",
        "2024-09-09 09:09:09.090909",
    ]
    # codes DuckDB strftime shares with BQ semantics
    codes = ["%A", "%a", "%B", "%b", "%d", "%H", "%I", "%j", "%M", "%m",
             "%p", "%S", "%Y", "%y", "%G", "%V", "%u", "%W"]
    for s in stamps:
        for code in codes:
            fmt = f"x{code}y"  # literal text on both sides of the code
            got = _fmt(spark, "FORMAT_TIMESTAMP", fmt, f"TIMESTAMP '{s}'")
            native = duck.execute(
                "SELECT strftime(CAST(? AS TIMESTAMP), ?)", [s, fmt]
            ).fetchone()[0]
            assert got == native, (s, code, got, native)


def test_parse_lockstep_vs_duckdb_strptime(spark, duck):
    cases = [
        ("%Y-%m-%d", "2019-07-04"),
        ("%d/%m/%Y", "25/12/2008"),
        ("%b %d %Y", "Jul 04 2019"),
        ("%Y-%m-%d %H:%M:%S", "2019-07-04 06:05:04"),
        ("%I %p %Y-%m-%d", "07 PM 2019-07-04"),
    ]
    for fmt, s in cases:
        got = _fmt(spark, "PARSE_TIMESTAMP", fmt, f"'{s}'")
        native = duck.execute(
            "SELECT strptime(?, ?)", [s, fmt]
        ).fetchone()[0]
        assert str(got) == str(native), (fmt, s, got, native)


def test_bracket_literals_and_parse_only_q(spark):
    """r9 review: '[' ']' are java.time metacharacters that silently
    vanish unless quoted; %Q maps to the parse-illegal letter Q."""
    got = _fmt(spark, "FORMAT_DATE", "[%m]", "DATE '2020-11-05'")
    assert got == "[11]"
    with pytest.raises(ValueError, match="parse"):
        translate("PARSE_DATE", "'%Y-%Q'", "'2020-3'", library="BIG_QUERY")


def test_refusals(spark):
    # unknown element refuses loudly
    with pytest.raises(ValueError, match="no\\s+Spark lowering|format model"):
        translate("FORMAT_DATE", "'%s'", "DATE '2020-01-01'", library="BIG_QUERY")
    # render-only elements refuse on the parse side
    with pytest.raises(ValueError, match="render-only|parse lowering"):
        translate("PARSE_DATE", "'%G-%V'", "'2020-01'", library="BIG_QUERY")
    # non-literal format string refuses
    with pytest.raises(ValueError, match="literal"):
        translate("FORMAT_DATE", "fmt_col", "d", library="BIG_QUERY")
    # TIME forms refuse (no TIME type — SURVEY §1.2)
    for name in ("FORMAT_TIME", "PARSE_TIME"):
        with pytest.raises(ValueError, match="TIME"):
            translate(name, "'%H'", "'10:00:00'", library="BIG_QUERY")


def test_e_s_fraction_family(spark):
    """%EnS renders SECONDS WITH n fractional digits ("12.345"), per
    the BigQuery docs — the reference's FormatElementEnum maps these to
    fraction-only FFn, a lossy mapping we deliberately do not follow
    (documented divergence in favor of the engine's real output)."""
    ts = "TIMESTAMP '2008-12-25 15:30:12.345678'"
    assert _fmt(spark, "FORMAT_TIMESTAMP", "%E3S", ts) == "12.345"
    assert _fmt(spark, "FORMAT_TIMESTAMP", "%E1S", ts) == "12.3"
    assert _fmt(spark, "FORMAT_TIMESTAMP", "%E*S", ts) == "12.345678"
    assert _fmt(spark, "FORMAT_TIMESTAMP", "%H:%M:%E2S", ts) == "15:30:12.34"


def test_literal_and_escape_elements(spark):
    assert _fmt(spark, "FORMAT_DATE", "%Y%%%m", "DATE '2020-03-01'") == "2020%03"
    got = _fmt(spark, "FORMAT_DATE", "%Y%n%m", "DATE '2020-03-01'")
    assert got == "2020\n03"
    # ISO-year family: 2019-12-30 belongs to ISO 2020-W01
    assert _fmt(spark, "FORMAT_DATE", "%G-W%V-%u", "DATE '2019-12-30'") == "2020-W01-1"
    # %W Monday-first week-of-year: Jan 1 on a Sunday is week 00
    assert _fmt(spark, "FORMAT_DATE", "%W", "DATE '2023-01-01'") == "00"
    assert _fmt(spark, "FORMAT_DATE", "%W", "DATE '2024-01-01'") == "01"
