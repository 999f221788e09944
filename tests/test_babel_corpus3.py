"""Babel corpus sampling, batch 3 (r8, VERDICT r7 item 6): the
executable subset of the reference's big-query.iq and redshift.iq
corpora, replayed through the library mechanism against the corpus'
own expected values and — where expressible — DuckDB native twins.
This is the sweep class that catches per-library occurrence/flags/
indexing divergences; it found THREE this round (BQ SPLIT literal
delimiter, BQ REGEXP_EXTRACT position-vs-group-index, BQ
REGEXP_REPLACE backslash indexing), each fixed below.

Fixture lines cite babel/src/test/resources/sql/{big-query,redshift}.iq.
"""

from __future__ import annotations

import pytest

from calcite_spark.functions import registry


def _bq(spark, name, *args):
    expr = registry.translate(name, *args, library="BIG_QUERY")
    return spark.sql(f"SELECT {expr} AS v").collect()[0].v


def _rs(spark, name, *args):
    expr = registry.translate(name, *args, library="REDSHIFT")
    return spark.sql(f"SELECT {expr} AS v").collect()[0].v


# -- BigQuery SPLIT (big-query.iq:1666-1695) --------------------------


def test_bq_split_literal_delimiter(spark, duck):
    """BQ SPLIT: literal delimiter (Spark's split is a REGEX — '.'
    would shred the string), ',' default, '' → [], trailing empties
    kept. DuckDB's string_split is the literal-delimiter twin."""
    cases = [
        (["'h,e,l,l,o'"], ["h", "e", "l", "l", "o"]),     # :1666
        (["''"], []),                                      # :1676
        (["'abc.de.'", "'.'"], ["abc", "de", ""]),         # :1687
        (["'a||b'", "'||'"], ["a", "b"]),
        (["'xx'", "','"], ["xx"]),
    ]
    for args, want in cases:
        got = _bq(spark, "SPLIT", *args)
        assert got == want, (args, got)
        if len(args) == 2:
            native = duck.execute(
            "SELECT string_split(?, ?)",
                [a.strip("'") for a in args],
            ).fetchone()[0]
            assert got == native, (args, got, native)
    # NULL input → NULL
    assert _bq(spark, "SPLIT", "CAST(NULL AS STRING)", "','") is None
    # '' delimiter → [value] (SqlFunctions.split:1023 "prevent
    # mischief"; review r8 — Spark's split would shred per character;
    # DuckDB string_split also shreds, so no twin for this case)
    assert _bq(spark, "SPLIT", "'abc'", "''") == ["abc"]
    # HIVE/SPARK keep the regex passthrough (their own semantics)
    e = registry.translate("SPLIT", "'a1b2c'", "'[0-9]'", library="SPARK")
    assert spark.sql(f"SELECT {e} AS v").collect()[0].v == ["a", "b", "c"]


# -- BigQuery REGEXP_EXTRACT / REGEXP_SUBSTR (big-query.iq:1202-1256) --


def test_bq_regexp_extract_position_occurrence(spark):
    """(value, regexp[, position[, occurrence]]) with the reference's
    exact NULL/error envelope — NOT Spark's group-index 3rd arg."""
    v = "'abcadcabcaecghi'"
    assert _bq(spark, "REGEXP_EXTRACT", v, "'a.+c'") == "abcadcabcaec"
    assert _bq(spark, "REGEXP_EXTRACT", v, "'abc(a.c)'", "4") == "aec"
    assert _bq(spark, "REGEXP_EXTRACT", v, "'a.c'", "25") is None
    assert _bq(spark, "REGEXP_EXTRACT", v, "'a.c'", "1", "5") is None
    assert _bq(spark, "REGEXP_EXTRACT", v, "'a.c'", "1", "3") == "abc"
    # no capturing group → whole match; no match → NULL (Spark's
    # builtin returns '' — the reference returns NULL)
    assert _bq(spark, "REGEXP_EXTRACT", "'abc'", "'z+'") is None
    # REGEXP_SUBSTR is the same operator under another name (:705)
    assert _bq(spark, "REGEXP_SUBSTR", v, "'abc(a.c)'", "4") == "aec"
    # errors replay the reference's messages (big-query.iq:1246-1256)
    with pytest.raises(ValueError, match="Multiple capturing groups"):
        _bq(spark, "REGEXP_EXTRACT", v, "'(abc)ax(a.c)'")
    with pytest.raises(ValueError, match="Invalid position"):
        _bq(spark, "REGEXP_EXTRACT", v, "'a.c'", "-4")
    with pytest.raises(ValueError, match="Invalid occurrence"):
        _bq(spark, "REGEXP_EXTRACT", v, "'a.c'", "3", "0")


def test_bq_regexp_extract_fuzz_vs_duckdb(spark, duck):
    """Position/occurrence emulation vs a DuckDB twin built from the
    same primitives (regexp_extract_all + list indexing) — RE2 and
    Java agree on this pattern subset."""
    from hypothesis import given, settings, strategies as st

    pats = st.sampled_from(["a.c", "[0-9]+", "b(c.)", "x?y", "(a+)"])
    subjects = st.text(alphabet="abcxy129 ", min_size=0, max_size=14)

    @settings(max_examples=80, deadline=None)
    @given(subjects, pats, st.integers(1, 12), st.integers(1, 4))
    def check(s, pat, pos, occ):
        got = _bq(
            spark, "REGEXP_EXTRACT", f"'{s}'", f"'{pat}'", str(pos), str(occ)
        )
        grp = 1 if "(" in pat else 0
        native = duck.execute(
            "SELECT list_extract(regexp_extract_all(CASE WHEN ? <= length(?) "
            "THEN substr(?, ?) ELSE '' END, ?, ?), ?)",
            [pos, s, s, pos, pat, grp, occ],
        ).fetchone()[0]
        native = native if native != "" else None
        # DuckDB list_extract gives NULL out of range; '' ambiguity:
        # an EMPTY MATCH and no-match both arrive as None on the
        # DuckDB side — skip the rare empty-match disagreement
        if got == "":
            return
        assert got == native, (s, pat, pos, occ, got, native)

    check()


# -- BigQuery REGEXP_REPLACE backslash indexing (big-query.iq:1509) ---


def test_bq_regexp_replace_backslash_indexed(spark):
    """REGEXP_REPLACE_BIG_QUERY_3 = replace-ALL with \\n group refs
    (regexpReplaceNonDollarIndexed, BuiltInMethod.java:696): the old
    passthrough rendered '<h1>\\1</h1>' as literal '<h1>1</h1>'."""
    assert _bq(spark, "REGEXP_REPLACE", "'qw1e1rt1y'", "'1'", "'X'") == "qwXeXrtXy"
    assert (
        _bq(
            spark, "REGEXP_REPLACE", "'# Heading'",
            "'^# ([a-zA-Z0-9\\\\s]+$)'", "'<h1>\\\\1</h1>'",
        )
        == "<h1>Heading</h1>"
    )
    # literal $ in the replacement stays literal (would be a group ref
    # if passed to Spark raw)
    assert _bq(spark, "REGEXP_REPLACE", "'abc'", "'b'", "'$9'") == "a$9c"


# -- REGEXP_SUBSTR library gating (r8 verdict finding) ----------------


def test_regexp_substr_null_on_no_match_and_gating(spark):
    """The reference gates REGEXP_SUBSTR to BIG_QUERY only and returns
    NULL on no match (SqlLibraryOperators.java:702-705); real MySQL 8
    and Oracle also return NULL. The old base registration served
    MYSQL/ORACLE via Spark's regexp_extract, which returns '' on no
    match — a silent wrong value. Pin: NULL envelope for BIG_QUERY and
    library-less calls, refusal (reference parity) for MYSQL/ORACLE."""
    # no match → NULL, not '' (the bug)
    assert _bq(spark, "REGEXP_SUBSTR", "'abc'", "'z'") is None
    # match still works, whole-match for group-less patterns
    assert _bq(spark, "REGEXP_SUBSTR", "'abc'", "'b.'") == "bc"
    # library-less call takes the same NULL-envelope lowering
    e = registry.translate("REGEXP_SUBSTR", "'abc'", "'z'")
    assert spark.sql(f"SELECT {e} AS v").collect()[0].v is None
    # MYSQL / ORACLE refuse at lookup — matches the reference's
    # BIG_QUERY-only operator gating
    for lib in ("MYSQL", "ORACLE"):
        assert registry.lookup("REGEXP_SUBSTR", lib) is None
        with pytest.raises(KeyError):
            registry.translate("REGEXP_SUBSTR", "'abc'", "'z'", library=lib)


# -- Redshift library tier (redshift.iq) ------------------------------


def test_redshift_datetime_functions(spark, duck):
    """DATEADD unit aliases + DATEDIFF boundary-crossing semantics
    (redshift.iq:dateadd/datediff blocks). DuckDB's datediff IS the
    boundary-crossing twin — identical primitives both sides."""
    # dateadd(month,18,'2008-02-28') — month alias 'm' too
    for unit in ("month", "m", "mon"):
        got = _rs(spark, "DATEADD", unit, "18", "DATE '2008-02-28'")
        assert str(got) == "2009-08-28 00:00:00"
    # leap-day + year: native Redshift returns the NON-clamped
    # 2017-03-01 (the corpus row carries that comment but is !if-gated
    # OFF in the reference's own run); the reference's runtime — and
    # Spark's timestampadd — clamp to month end. We match the
    # reference, divergence from native Redshift documented here.
    got = _rs(spark, "DATEADD", "year", "1", "DATE '2016-02-29'")
    assert str(got) == "2017-02-28 00:00:00"
    # datediff(week, 2009-01-01, 2009-12-31) = 52 (redshift docs value)
    assert _rs(
        spark, "DATEDIFF", "week", "DATE '2009-01-01'", "DATE '2009-12-31'"
    ) == 52
    # boundary crossing, NOT full periods: 23:00 → next 01:00 is 1 day
    assert _rs(
        spark, "DATEDIFF", "day",
        "TIMESTAMP '2020-01-01 23:00:00'", "TIMESTAMP '2020-01-02 01:00:00'",
    ) == 1
    assert _rs(
        spark, "DATEDIFF", "hours",
        "TIMESTAMP '2020-01-01 10:59:00'", "TIMESTAMP '2020-01-01 11:01:00'",
    ) == 1
    # lockstep vs DuckDB datediff across units on a date grid
    for unit in ("year", "quarter", "month", "week", "day", "hour", "minute"):
        for a, b in [
            ("2019-02-03 04:05:06", "2021-11-30 23:59:59"),
            ("2020-12-31 23:59:59", "2021-01-01 00:00:00"),
            ("2021-06-15 00:00:00", "2020-01-10 12:00:00"),  # negative
        ]:
            got = _rs(
                spark, "DATEDIFF", unit,
                f"TIMESTAMP '{a}'", f"TIMESTAMP '{b}'",
            )
            want = duck.execute(
                f"SELECT datediff('{unit}', TIMESTAMP '{a}', TIMESTAMP '{b}')"
            ).fetchone()[0]
            assert got == want, (unit, a, b, got, want)
    with pytest.raises(ValueError, match="datepart"):
        _rs(spark, "DATEDIFF", "fortnight", "DATE '2020-01-01'", "DATE '2020-02-01'")


def test_redshift_scalar_functions(spark, duck):
    # date_part with Redshift's bare 'w' alias (redshift.iq:date_part)
    assert _rs(spark, "DATE_PART", "w", "TIMESTAMP '2008-06-17 09:44:54'") == 25
    assert _rs(spark, "DATE_PART", "'minute'", "TIMESTAMP '2009-01-01 02:08:01'") == 8
    # comparison trios (redshift.iq:date_cmp blocks)
    assert _rs(spark, "DATE_CMP", "'2008-01-01'", "'2008-01-04'") == -1
    assert _rs(spark, "DATE_CMP", "DATE '2008-01-04'", "'2008-01-04'") == 0
    assert _rs(spark, "DATE_CMP", "DATE '2008-01-05'", "DATE '2008-01-04'") == 1
    assert _rs(
        spark, "DATE_CMP_TIMESTAMP", "DATE '2008-01-04'", "'2008-01-04 01:23:45'"
    ) == -1
    assert _rs(spark, "DATE_PART_YEAR", "'2008-01-05'") == 2008
    # months_between / next_day ride Spark's builtins
    assert _rs(spark, "MONTHS_BETWEEN", "'1969-01-18'", "'1969-03-18'") == -2.0
    assert str(_rs(spark, "NEXT_DAY", "'2014-08-20'", "'Tuesday'")) == "2014-08-26"
    assert str(_rs(spark, "NEXT_DAY", "'2014-08-20'", "'Tu'")) == "2014-08-26"
    # dexp/dlog1/dlog10 aliases
    assert _rs(spark, "DEXP", "0") == 1.0
    assert _rs(spark, "DLOG1", "1") == 0.0
    assert _rs(spark, "DLOG10", "100") == 2.0
    assert _rs(spark, "GETDATE") is not None
    # binary accessors: 'FF' = 0x46('F') 0x46; PG is the twin semantics
    assert _rs(spark, "GET_BYTE", "CAST('FF' AS BINARY)", "1") == 0x46
    # 0x46 = 0b01000110 — LSB-first: bit1=1, bit0=0, bit6=1
    assert _rs(spark, "GET_BIT", "CAST('FF' AS BINARY)", "1") == 1
    assert _rs(spark, "GET_BIT", "CAST('FF' AS BINARY)", "0") == 0
    assert _rs(spark, "GET_BIT", "CAST('FF' AS BINARY)", "14") == 1


def test_redshift_syntax_macros(spark):
    """APPROXIMATE prefix + RATIO_TO_REPORT window (redshift.iq) via
    the frontend macro tier."""
    from calcite_spark.queries.inventory import catalog_for
    from calcite_spark.sql.frontend import SqlFrontend
    from tests.conftest import SF_DIR

    fe = SqlFrontend(catalog_for(spark, SF_DIR))
    # approximate count(distinct) — exact on small data
    got = fe.sql(
        "SELECT APPROXIMATE COUNT(DISTINCT n_regionkey) AS n FROM nation"
    ).collect()[0].n
    assert got == 5
    t, _ = fe.parse(
        "SELECT APPROXIMATE PERCENTILE_DISC(0.5) WITHIN GROUP "
        "(ORDER BY o_totalprice) FROM orders"
    )
    assert "approx_percentile(o_totalprice, 0.5)" in t
    with pytest.raises(ValueError, match="APPROXIMATE"):
        fe.parse("SELECT APPROXIMATE SUM(x) FROM t")
    # a literal mention must not mask a later genuine call (review r8)
    got = fe.sql(
        "SELECT 'approximate count(distinct x)' AS doc, "
        "APPROXIMATE COUNT(DISTINCT n_regionkey) AS n FROM nation"
    ).collect()[0]
    assert got.n == 5 and got.doc == "approximate count(distinct x)"
    # ASC / NULLS suffixes strip instead of corrupting the argument
    t, _ = fe.parse(
        "SELECT APPROXIMATE PERCENTILE_DISC(0.5) WITHIN GROUP "
        "(ORDER BY o_totalprice ASC NULLS LAST) FROM orders"
    )
    assert "approx_percentile(o_totalprice, 0.5)" in t
    # ratio_to_report: per-partition share sums to 1
    rows = fe.sql(
        "SELECT n_regionkey, RATIO_TO_REPORT(n_nationkey + 1) "
        "OVER (PARTITION BY n_regionkey) AS share FROM nation"
    ).collect()
    by_region = {}
    for r in rows:
        by_region.setdefault(r.n_regionkey, []).append(r.share)
    for shares in by_region.values():
        assert abs(sum(shares) - 1.0) < 1e-9
    # 'RATIO_TO_REPORT(' inside a string literal is data
    got = fe.sql("SELECT 'use RATIO_TO_REPORT(x) here' AS h").collect()[0].h
    assert got == "use RATIO_TO_REPORT(x) here"
    with pytest.raises(ValueError, match="OVER"):
        fe.parse("SELECT RATIO_TO_REPORT(x) FROM t")


# -- std extended regexp tier (r8b): REGEXP_REPLACE 4-6 args,
#    REGEXP_INSTR 2-5 args, REGEXP_EXTRACT_ALL group convention -------


def test_regexp_instr_corpus_fixtures(spark):
    """big-query.iq:1402-1470 — position/occurrence/occurrence_position
    and the GROUP-position convention (the reference reports the
    capturing group's index, not the whole match's)."""
    v = "'abcadcabcaecghi'"
    assert _bq(spark, "REGEXP_INSTR", v, "'a.+c'") == 1
    assert _bq(spark, "REGEXP_INSTR", v, "'abc(a.c)'", "4") == 10
    assert _bq(spark, "REGEXP_INSTR", v, "'a.c'", "25") == 0
    assert _bq(spark, "REGEXP_INSTR", v, "'a.c'", "1", "5") == 0
    assert _bq(
        spark, "REGEXP_INSTR", "'a9cadca5c4aecghi'", "'a[0-9]c'",
        "1", "2", "1",
    ) == 10
    assert _bq(spark, "REGEXP_INSTR", "CAST(NULL AS STRING)", "'a'") is None
    with pytest.raises(ValueError, match="Multiple capturing groups"):
        _bq(spark, "REGEXP_INSTR", v, "'(^)a(.*)b($)'")
    with pytest.raises(ValueError, match="Invalid position"):
        _bq(spark, "REGEXP_INSTR", v, "'a.c'", "0")
    with pytest.raises(ValueError, match="Invalid occurrence"):
        _bq(spark, "REGEXP_INSTR", v, "'a.c'", "3", "-2")
    with pytest.raises(ValueError, match="occurrence_position"):
        _bq(spark, "REGEXP_INSTR", v, "'a.c'", "3", "2", "-2")


def _py_regexp_instr(value, pat, pos=1, occ=1, opos=0):
    """Python-re replay of SqlFunctions.regexpInstr (the runtime's
    exact matcher loop) — the test oracle."""
    import re as pyre

    if pat == "" or pos > len(value):
        return 0
    m = None
    it = pyre.compile(pat).finditer(value, pos - 1)
    for i, m in enumerate(it):
        if i == occ - 1:
            g = pyre.compile(pat).groups
            return (m.end(g) if opos else m.start(g)) + 1
    return 0


def test_regexp_instr_fuzz_vs_python_re(spark):
    from hypothesis import given, settings, strategies as st

    pats = st.sampled_from(["a.c", "[0-9]+", "b(c.)", "(a+)b", "xy"])
    subjects = st.text(alphabet="abcxy129 ", min_size=0, max_size=14)

    @settings(max_examples=60, deadline=None)
    @given(subjects, pats, st.integers(1, 10), st.integers(1, 3),
           st.integers(0, 1))
    def check(s, pat, pos, occ, opos):
        got = _bq(
            spark, "REGEXP_INSTR", f"'{s}'", f"'{pat}'",
            str(pos), str(occ), str(opos),
        )
        want = _py_regexp_instr(s, pat, pos, occ, opos)
        assert got == want, (s, pat, pos, occ, opos, got, want)

    check()


def _my(spark, name, *args):
    expr = registry.translate(name, *args, library="MYSQL")
    return spark.sql(f"SELECT {expr} AS v").collect()[0].v


def test_regexp_replace_position_occurrence_forms(spark):
    """REGEXP_REPLACE_4/5/6 (MYSQL/ORACLE/REDSHIFT tier): replace from
    a position, the Nth occurrence only, matchType flags — $-indexed
    Java replacement exactly like the reference's shared runtime."""
    # 4-arg: all matches from position 5 (prefix untouched)
    assert _my(spark, "REGEXP_REPLACE", "'a1b2c3'", "'[0-9]'", "'#'", "5") == "a1b2c#"
    # 5-arg occurrence: only the 2nd match
    assert _my(
        spark, "REGEXP_REPLACE", "'a1b2c3'", "'[0-9]'", "'#'", "1", "2"
    ) == "a1b#c3"
    # occurrence 0 = all
    assert _my(
        spark, "REGEXP_REPLACE", "'a1b2c3'", "'[0-9]'", "'#'", "1", "0"
    ) == "a#b#c#"
    # group reference in the Nth-occurrence form ($-indexed, shifted
    # past the repeated copies' groups at plan time)
    assert _my(
        spark, "REGEXP_REPLACE", "'ab ab ab'", "'a(b)'", "'[$1]'", "1", "2"
    ) == "ab [b] ab"
    # 5-arg matchType: case-insensitive all
    assert _my(
        spark, "REGEXP_REPLACE", "'AxBxC'", "'[abc]'", "'-'", "1", "'i'"
    ) == "-x-x-"
    # 6-arg: position + occurrence + flags
    assert _my(
        spark, "REGEXP_REPLACE", "'AxAxA'", "'a'", "'-'", "2", "1", "'i'"
    ) == "Ax-xA"
    # python-re replay across a grid (the runtime's loop semantics)
    import re as pyre

    for s, pat, rep, pos, occ in [
        ("aaa bbb aaa", "a+", "X", 1, 2),
        ("aaa bbb aaa", "a+", "X", 3, 1),
        ("1a2b3c", "[a-z]", "_", 2, 2),
        ("no match here", "zz", "X", 1, 1),
    ]:
        got = _my(
            spark, "REGEXP_REPLACE", f"'{s}'", f"'{pat}'", f"'{rep}'",
            str(pos), str(occ),
        )
        head, tail = s[: pos - 1], s[pos - 1 :]
        ms = list(pyre.finditer(pat, tail))
        if occ == 0:
            want = head + pyre.sub(pat, rep, tail)
        elif len(ms) >= occ:
            m = ms[occ - 1]
            want = head + tail[: m.start()] + rep + tail[m.end():]
        else:
            want = s
        assert got == want, (s, pat, pos, occ, got, want)
    # atomic-copy pin (fuzz-found): a greedy quantifier must not
    # backtrack across occurrence copies — '11' has ONE [0-9]+ match
    assert _my(
        spark, "REGEXP_REPLACE", "'11'", "'[0-9]+'", "'#'", "1", "2"
    ) == "11"
    assert _my(
        spark, "REGEXP_REPLACE", "'11 22 33'", "'[0-9]+'", "'#'", "1", "2"
    ) == "11 # 33"
    # refusals: backrefs inside a pattern embedded more than once
    with pytest.raises(ValueError, match="backreference"):
        _my(spark, "REGEXP_REPLACE", "'aab'", "'(a)\\1'", "'X'", "1", "2")


def test_regexp_extract_all_group_convention(spark):
    """SqlFunctions.regexpExtractAll: whole match for group-less
    patterns (Spark's default group 1 ERRORS there), group text for
    one-group patterns, ≤1 group enforced."""
    assert _bq(spark, "REGEXP_EXTRACT_ALL", "'a1b22c'", "'[0-9]+'") == ["1", "22"]
    assert _bq(spark, "REGEXP_EXTRACT_ALL", "'a1b22c'", "'([0-9])[0-9]*'") == ["1", "2"]
    assert _bq(spark, "REGEXP_EXTRACT_ALL", "'abc'", "'z'") == []
    with pytest.raises(ValueError, match="Multiple capturing groups"):
        _bq(spark, "REGEXP_EXTRACT_ALL", "'ab'", "'(a)(b)'")
