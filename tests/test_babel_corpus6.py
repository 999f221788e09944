"""Babel corpus batch 27 (r14, verdict item 4) — the remaining
statement classes of babel/src/test/resources/sql/{postgresql,spark,
select}.iq replayed against their reference expected values (DuckDB
cannot run several of these shapes natively, so expected values are
transcribed from the .iq files, which were validated on PG/Spark by
the reference project).

Classes mined this round and their outcomes:
  * postgresql.iq:1291 Posix-regex NULL operands — `x !~ NULL` CRASHED
    (the rewrite required a literal RHS); fixed, NULL propagates.
  * postgresql.iq:109 string_to_array — the registry lowering existed
    but the SQL surface crashed UNRESOLVED_ROUTINE; now expanded.
  * postgresql.iq:180 to_char PG datetime templates — the SQL surface
    hit Spark's native to_char (Java patterns) and crashed or silently
    rendered wrong fields; now routed through the PG template compiler
    when the call is provably datetime (unambiguous token or
    TIMESTAMP/DATE literal operand). Numeric templates stay native.
  * postgresql.iq:160 INSERT '{...}' string→array coercion — both the
    `int array` column-type spelling and the value coercion were
    missing; CREATE TABLE now maps the standard ARRAY suffix and
    INSERT casts brace-text (recursing into nested braces).
  * postgresql.iq:63 split_part — Spark's builtin is PG-exact
    (negative index, empty delimiter, NULL operands); pinned.
  * spark.iq RLIKE/REGEXP/REGEXP_LIKE/CONCAT_WS/REVERSE — Spark-native
    and exact (fixture literals transformed from Calcite backslash
    spelling to Spark escaped spelling); pinned, including the one
    type-derivation delta (decimal array unification) as documented.
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


def test_posix_regex_null_operands(fe):
    """postgresql.iq:1291 (CALCITE-5699): NULL on either side of
    ~ / ~* / !~ / !~* / ~~ propagates NULL — before r14 a NULL RHS
    left the operator unexpanded and crashed Spark's parser."""
    for sql in (
        "SELECT null !~ 'ab[cd]' AS x",
        "SELECT 'abcd' !~ null AS x",
        "SELECT null !~ null AS x",
        "SELECT null !~* 'ab[cd]' AS x",
        "SELECT 'abcd' !~* null AS x",
        "SELECT null !~* null AS x",
        "SELECT 'abcd' ~~ null AS x",
        "SELECT 'abcd' ~ null AS x",
    ):
        assert _one(fe, sql) is None, sql
    assert _one(fe, "SELECT 'abe' !~ 'ab[cd]' AS x") is True
    assert _one(fe, "SELECT 'abd' !~ 'ab[cd]' AS x") is False
    assert _one(fe, "SELECT 'abd' ~ 'ab[cd]' AS x") is True


def test_split_part_pg_edges(fe, duck):
    """postgresql.iq:63 — Spark's split_part matches PG on every edge
    the reference pins: negative index counts from the end, an empty
    delimiter returns the whole string at part 1 and '' past it, NULL
    anywhere is NULL. DuckDB replays the same text natively."""
    cases = [
        # (sql, want, duck_agrees) — DuckDB itself diverges from PG on
        # these edges (empty delimiter splits into characters; NULL
        # operands return '' instead of NULL), so the native
        # cross-check skips those rows; the reference's PG-validated
        # values are the authority and Spark matches them
        ("SELECT split_part('abc~@~def~@~ghi', '~@~', 2) AS x", "def", True),
        ("SELECT split_part('abc,def,ghi,jkl', ',', -2) AS x", "ghi", True),
        ("SELECT split_part('abc.def', '.', 1) AS x", "abc", True),
        ("SELECT split_part('abc.def', '', 1) AS x", "abc.def", False),
        ("SELECT split_part('abc.def', '', 2) AS x", "", False),
        ("SELECT split_part(NULL, '.', 1) AS x", None, False),
        ("SELECT split_part('abc.abc', '.', NULL) AS x", None, False),
        ("SELECT split_part('abc', NULL, 1) AS x", None, False),
    ]
    for sql, want, duck_agrees in cases:
        assert _one(fe, sql) == want, sql
        if duck_agrees:
            assert duck.execute(sql).fetchone()[0] == want, f"duck: {sql}"


def test_string_to_array_sql_surface(fe):
    """postgresql.iq:109 — string_to_array through fe.sql (r14: the
    plain SQL spelling crashed UNRESOLVED_ROUTINE; the registry's
    PG-semantics lowering is now expanded on the surface). Expected
    values are the reference's, PG-validated."""
    cases = [
        ("SELECT string_to_array('a,b,c', ',', 'd') AS x", ["a", "b", "c"]),
        ("SELECT string_to_array('a,b,,d', ',', 'd') AS x",
         ["a", "b", "", None]),
        ("SELECT string_to_array('a,b,,d', ',', null) AS x",
         ["a", "b", "", "d"]),
        ("SELECT string_to_array('abc', '') AS x", ["abc"]),
        ("SELECT string_to_array('abc', ',', 'abc') AS x", [None]),
        ("SELECT string_to_array('calcite apache org', ' ', 'apache') AS x",
         ["calcite", None, "org"]),
        ("SELECT string_to_array('calcite apache org', ' ') AS x",
         ["calcite", "apache", "org"]),
        ("SELECT string_to_array('a*c', NULL, '*') AS x", ["a", None, "c"]),
        ("SELECT string_to_array(NULL, ' ') AS x", None),
        ("SELECT string_to_array('', '') AS x", []),
    ]
    for sql, want in cases:
        assert _one(fe, sql) == want, sql


def test_to_char_pg_templates_sql_surface(fe):
    """postgresql.iq:180-1280 sample — PG datetime templates through
    fe.sql route to the PG template compiler (r14: they used to hit
    Spark's native to_char, which reads Java patterns — 'Mon' crashed,
    'MM' silently meant month where PG MI means minute). The full
    token battery lives in test_pg_to_char_corpus; this pins the SQL
    SURFACE dispatch, including the numeric-template fall-through."""
    ts = "timestamp '2022-06-03 12:15:48.678'"
    cases = [
        (f"'YYYY-MM-DD HH24:MI:SS.MS'", "2022-06-03 12:15:48.678"),
        ("'HH'", "12"),
        ("'MI'", "15"),          # operand is a TIMESTAMP literal
        ("'MS'", "678"),
        ("'US'", "678000"),
        ("'FF4'", "6780"),
        ("'SSSS'", "44148"),
        ("'am'", "pm"),
        ("'A.M.'", "P.M."),
        ("'Y,YYY'", "2,022"),
        ("'BC'", "AD"),
        ("'b.c.'", "a.d."),
        ("'FMMonth'", "June"),
        ("'Mon'", "Jun"),
        ("'mon'", "jun"),
    ]
    for tpl, want in cases:
        assert _one(fe, f"SELECT to_char({ts}, {tpl}) AS x") == want, tpl
    # ISO-year family on a week-1 boundary date
    ts2 = "timestamp '2023-01-01 12:15:48.678'"
    for tpl, want in [("'IYYY'", "2022"), ("'IYY'", "022"),
                      ("'IY'", "22"), ("'I'", "2")]:
        assert _one(fe, f"SELECT to_char({ts2}, {tpl}) AS x") == want, tpl
    # numeric templates stay on Spark's native to_char
    assert _one(fe, "SELECT to_char(454, '999') AS x") == "454"


def test_insert_string_to_array_coercion(fe, spark, tmp_path):
    """postgresql.iq:160 — INSERT VALUES coerces '{...}' string
    literals to the declared array column types, including one level
    of nesting; the standard `int array` / `varchar array array`
    column-type spellings parse (r14)."""
    from calcite_spark.sql.ddl import DdlExecutor

    ddl = DdlExecutor(fe, str(tmp_path / "wh"))
    ddl.execute(
        "CREATE TABLE sal_emp (name varchar, pay_by_quarter int array, "
        "schedule varchar array array)"
    )
    ddl.execute(
        "INSERT INTO sal_emp VALUES ('Bill', "
        "'{10000, 10000, 10000, 10000}', "
        "'{{\"meeting\", \"lunch\"}, {\"training\", \"presentation\"}}')"
    )
    row = fe.sql("SELECT * FROM sal_emp").collect()[0]
    assert row.name == "Bill"
    assert row.pay_by_quarter == [10000, 10000, 10000, 10000]
    assert row.schedule == [["meeting", "lunch"],
                            ["training", "presentation"]]
    # nested '{...}'::T[][] casts parse too (the r13 refusal upgraded)
    assert _one(fe, "SELECT '{{1,2},{3}}'::int[][] AS v") == [[1, 2], [3]]


def test_spark_iq_rlike_regexp_family(fe):
    """spark.iq:25-258 — RLIKE / REGEXP / REGEXP_LIKE are partial-match
    and NULL-propagating. Fixture literals are transformed from
    Calcite's raw-backslash spelling to Spark's escaped spelling (the
    engine's literal contract is Spark's); expected values are the
    reference's."""
    for fn in ("RLIKE",):
        assert _one(fe, f"SELECT NULL {fn} 'abc*' AS x") is None
        assert _one(fe, f"SELECT 'abc' {fn} NULL AS x") is None
        assert _one(fe, f"SELECT 'abc' {fn} '' AS x") is True
        assert _one(fe, f"SELECT 'abc def ghi' {fn} 'abc' AS x") is True
        assert _one(fe, f"SELECT 'abc def ghi' {fn} 'abcd' AS x") is False
        assert _one(fe, f"SELECT 'abc' {fn} '^abc$' AS x") is True
        assert _one(fe, f"SELECT 'abc' {fn} 'abz*' AS x") is True
        # backslash fixtures (spark.iq:52-99), Spark-escaped spelling
        assert _one(fe, rf"SELECT 'abc' {fn} '^\\abc$' AS x") is False
        assert _one(fe, rf"SELECT '\\abc' {fn} '\\abc$' AS x") is False
        assert _one(fe, rf"SELECT '\\abc' {fn} '^\\\\abc$' AS x") is True
    for fn in ("REGEXP", "REGEXP_LIKE"):
        assert _one(fe, f"SELECT {fn}(NULL, 'abc*') AS x") is None
        assert _one(fe, f"SELECT {fn}('abc', NULL) AS x") is None
        assert _one(fe, f"SELECT {fn}('abc', '') AS x") is True
        assert _one(fe, f"SELECT {fn}('abc def ghi', 'abc') AS x") is True
        assert _one(fe, f"SELECT {fn}('abc def ghi', 'abcd') AS x") is False
        assert _one(fe, rf"SELECT {fn}('\\abc', '^\\\\abc$') AS x") is True


def test_spark_iq_concat_ws(fe):
    """spark.iq:260-373 — CONCAT_WS skips NULLs, flattens array
    arguments, coerces numerics, and returns NULL on a NULL separator.
    Spark-native; every reference fixture replays exactly."""
    cases = [
        ("SELECT concat_ws('s') AS x", ""),
        ("SELECT concat_ws(',', null) AS x", ""),
        ("SELECT concat_ws(',', null, null) AS x", ""),
        ("SELECT concat_ws(',', null, 'a') AS x", "a"),
        ("SELECT concat_ws(',', 'a', 'b') AS x", "a,b"),
        ("SELECT concat_ws(',', 'a', null, 'b') AS x", "a,b"),
        ("SELECT concat_ws(null, 'a', 'b') AS x", None),
        ("SELECT concat_ws(',', 'a', 100, 'b') AS x", "a,100,b"),
        ("SELECT concat_ws(',', 'a', 100.0, 'b') AS x", "a,100.0,b"),
        ("SELECT concat_ws(',', array('a', 'b', 'c')) AS x", "a,b,c"),
        ("SELECT concat_ws(',', array('a', null, 'c')) AS x", "a,c"),
        ("SELECT concat_ws(null, array('a')) AS x", None),
        ("SELECT concat_ws(',', array('a'), array('b'), array('c')) AS x",
         "a,b,c"),
        ("SELECT concat_ws(',', 'a1', 'b1', 'c1', array('a'), array('b'), "
         "array('c')) AS x", "a1,b1,c1,a,b,c"),
        ("SELECT concat_ws(',', null, 'a1', 'b1', null, 'c1', array('a'), "
         "array('b'), array('c', null, 'd')) AS x", "a1,b1,c1,a,b,c,d"),
        ("SELECT concat_ws(',', 100, 'b', array('c')) AS x", "100,b,c"),
        ("SELECT concat_ws(',', array(null, null)) AS x", ""),
    ]
    for sql, want in cases:
        assert _one(fe, sql) == want, sql


def test_spark_iq_reverse(fe):
    """spark.iq:375-466 — REVERSE over strings, numerics (stringified)
    and arrays, NULL-propagating. One documented delta: Calcite
    unifies array(decimal(17), 2.1111...19) to DECIMAL(17,2) and
    renders [2.11, 2.00]; Spark derives a wider decimal and keeps full
    precision — Spark's answer loses nothing and matching Calcite's
    narrowing would discard data. Pinned so a silent change shows."""
    assert _one(fe, "SELECT reverse('Spark SQL') AS x") == "LQS krapS"
    assert _one(fe, "SELECT reverse('#c@b!a') AS x") == "a!b@c#"
    assert _one(fe, "SELECT reverse(5) AS x") == "5"
    assert _one(fe, "SELECT reverse(array(2, 1, 4, 3)) AS x") == [3, 4, 1, 2]
    assert _one(fe, "SELECT reverse(NULL) AS x") is None
    assert _one(fe, "SELECT reverse(array(NULL)) AS x") == [None]
    assert _one(fe, "SELECT reverse('') AS x") == ""
    assert [float(v) for v in _one(fe, "SELECT reverse(array(2.1, 2.2)) AS x")] \
        == [pytest.approx(2.2), pytest.approx(2.1)]
    got = _one(
        fe,
        "SELECT reverse(array(CAST(2.1 as decimal(17)), "
        "2.1111111111111119)) AS x",
    )
    # documented delta: full precision kept (Calcite: [2.11, 2.00])
    assert [float(v) for v in got] == [
        pytest.approx(2.1111111111111119), pytest.approx(2.0)
    ]


def test_select_iq_semi_anti_and_remainder(fe, duck):
    """select.iq — LEFT SEMI / LEFT ANTI JOIN SQL syntax (Hive/Spark
    dialect; Spark-native) and the DECIMAL % remainder
    (CALCITE-5410). greatest/least from postgresql.iq:1340."""
    semi = _one(fe, "SELECT COUNT(*) FROM orders LEFT SEMI JOIN customer "
                    "ON o_custkey = c_custkey")
    want = duck.execute(
        "SELECT COUNT(*) FROM orders WHERE o_custkey IN "
        "(SELECT c_custkey FROM customer)"
    ).fetchone()[0]
    assert semi == want
    anti = _one(fe, "SELECT COUNT(*) FROM customer LEFT ANTI JOIN orders "
                    "ON c_custkey = o_custkey")
    want = duck.execute(
        "SELECT COUNT(*) FROM customer WHERE c_custkey NOT IN "
        "(SELECT o_custkey FROM orders)"
    ).fetchone()[0]
    assert anti == want
    assert float(_one(fe, "SELECT 1.0 % 2 AS x")) == 1.0
    assert _one(fe, "SELECT greatest(1, 2, 3) AS x") == 3
    assert _one(fe, "SELECT greatest(1, null, 3) AS x") == 3
    assert _one(fe, "SELECT least(1, 2, 3) AS x") == 1


def test_date_part_pg_fields(fe):
    """postgresql.iq:1254-1284 — date_part with the PG/Calcite field
    zoo: Spark natively lacks MICROSECOND / MILLISECOND / EPOCH /
    ISODOW / CENTURY / DECADE / MILLENNIUM and reads Calcite's BARE
    unit identifier as a column; both now expand (r14). MICROSECOND is
    the reference's seconds-within-minute scaling (48678000); DOW is
    Calcite's 1-based Friday=6 (the reference fixture — PG itself is
    0-based, Calcite is the authority here); 'foo' stays a loud
    error, matching the reference's !error."""
    ts = "timestamp '2022-06-03 12:15:48.678'"
    cases = [
        ("date_part('microsecond', %s)" % ts, 48678000),
        ("date_part(MICROSECOND, %s)" % ts, 48678000),
        ("date_part('minute', %s)" % ts, 15),
        ("date_part(MINUTE, %s)" % ts, 15),
        ("date_part('dow', %s)" % ts, 6),
        ("date_part(DOW, %s)" % ts, 6),
        ("date_part('millisecond', %s)" % ts, 48678),
        ("date_part('epoch', %s)" % ts, 1654258548.678),
        ("date_part('isodow', %s)" % ts, 5),
        ("date_part('isoyear', %s)" % ts, 2022),
        ("date_part('century', %s)" % ts, 21),
        ("date_part('decade', %s)" % ts, 202),
        ("date_part('millennium', %s)" % ts, 3),
        ("EXTRACT(EPOCH FROM %s)" % ts, 1654258548.678),
        ("EXTRACT(MICROSECOND FROM %s)" % ts, 48678000),
        ("EXTRACT(ISODOW FROM %s)" % ts, 5),
        ("EXTRACT(CENTURY FROM %s)" % ts, 21),
    ]
    for expr, want in cases:
        got = _one(fe, f"SELECT {expr} AS x")
        assert abs(float(got) - float(want)) < 1e-6, (expr, got, want)
    with pytest.raises(Exception):
        fe.sql(f"SELECT date_part('foo', {ts}) AS x").collect()


def test_spark_iq_complex_multiset_battery(fe, spark, tmp_path):
    """spark.iq:470-635 (CALCITE-6680 COMPLEX fixture) — the full
    MULTISET surface replayed: `INT MULTISET` / `MAP<VARCHAR,INT>`
    column types, multiset[...] / MAP[...] constructors in INSERT
    VALUES, infix MULTISET UNION [DISTINCT] / INTERSECT / EXCEPT,
    SUBMULTISET OF, IS A SET, IS EMPTY, ARRAY_INSERT. Column names are
    bare (the reference double-quotes them only because Calcite
    reserves list/map/set; this engine follows Spark's identifier
    rules). Expected values are the reference's: IS A SET over NULL is
    FALSE (not UNKNOWN); SUBMULTISET OF and the set-ops stay strict;
    ARRAY_INSERT is 1-based with NULL propagation."""
    from calcite_spark.sql.ddl import DdlExecutor

    ddl = DdlExecutor(fe, str(tmp_path / "wh"))
    ddl.execute(
        "CREATE TABLE complex_ms (key INT, list INT ARRAY, lng BIGINT, "
        "mp MAP<VARCHAR, INT>, mset INT MULTISET)"
    )
    ddl.execute(
        "INSERT INTO complex_ms (VALUES"
        " (0, NULL, 5, NULL, NULL),"
        " (1, array(), 4, NULL, multiset[1] MULTISET EXCEPT multiset[1]),"
        " (2, ARRAY[0], 3, MAP(), multiset[0]),"
        " (3, ARRAY[0, 1], 2, MAP['zero', 0], multiset[0, 1]),"
        " (4, ARRAY[0, 1, 2], 1, MAP['zero', 0, 'one', 1],"
        "  multiset[0, 1, 2]),"
        " (5, ARRAY[0, 1, 2, 3], 0,"
        "  MAP['zero', 0, 'one', 1, 'two', 2], multiset[0, 1, 2, 3]))"
    )
    def rows(sql):
        return [tuple(r) for r in fe.sql(sql).collect()]

    assert rows(
        "SELECT key FROM complex_ms WHERE list IS EMPTY ORDER BY key"
    ) == [(1,)]
    assert rows(
        "SELECT key FROM complex_ms WHERE mset IS EMPTY ORDER BY key"
    ) == [(1,)]
    assert rows(
        "SELECT key FROM complex_ms WHERE mp IS EMPTY ORDER BY key"
    ) == [(2,)]
    got = rows("SELECT ARRAY_INSERT(list, 1, 2) AS l FROM complex_ms "
               "ORDER BY key")
    assert got == [(None,), ([2],), ([2, 0],), ([2, 0, 1],),
                   ([2, 0, 1, 2],), ([2, 0, 1, 2, 3],)]
    got = rows("SELECT mset MULTISET UNION mset AS u FROM complex_ms "
               "ORDER BY key")
    assert got == [(None,), ([],), ([0, 0],), ([0, 1, 0, 1],),
                   ([0, 1, 2, 0, 1, 2],), ([0, 1, 2, 3, 0, 1, 2, 3],)]
    got = rows("SELECT mset MULTISET UNION DISTINCT mset AS u "
               "FROM complex_ms ORDER BY key")
    assert got == [(None,), ([],), ([0],), ([0, 1],), ([0, 1, 2],),
                   ([0, 1, 2, 3],)]
    got = rows("SELECT mset MULTISET INTERSECT mset AS u "
               "FROM complex_ms ORDER BY key")
    assert got == [(None,), ([],), ([0],), ([0, 1],), ([0, 1, 2],),
                   ([0, 1, 2, 3],)]
    got = rows("SELECT mset MULTISET INTERSECT DISTINCT mset AS u "
               "FROM complex_ms ORDER BY key")
    assert got == [(None,), ([],), ([0],), ([0, 1],), ([0, 1, 2],),
                   ([0, 1, 2, 3],)]
    got = rows("SELECT mset MULTISET EXCEPT mset AS u FROM complex_ms "
               "ORDER BY key")
    assert got == [(None,), ([],), ([],), ([],), ([],), ([],)]
    # IS A SET: NULL input is FALSE (reference row KEY=0), duplicates
    # FALSE, everything else TRUE
    got = rows("SELECT mset IS A SET AS u FROM complex_ms ORDER BY key")
    assert got == [(False,), (True,), (True,), (True,), (True,), (True,)]
    got = rows("SELECT (multiset[3] SUBMULTISET OF mset) AS x "
               "FROM complex_ms ORDER BY key")
    assert got == [(None,), (False,), (False,), (False,), (False,),
                   (True,)]
    got = rows("SELECT key, list IS NULL AS n FROM complex_ms "
               "ORDER BY key")
    assert [n for _, n in got] == [True, False, False, False, False,
                                   False]


def test_select_by_clause(fe):
    """select.iq:162-235 — the SELECT ... BY clause
    (SqlByRewriter.java:38): `SELECT a, b BY k` prepends k, groups and
    orders by it, and wraps plain columns in ANY_VALUE (the
    validator's non-strict path, SqlValidatorImpl.java:516). The
    reference fixtures' picked values are ANY_VALUE-nondeterministic,
    so value checks here use singleton groups and aggregates; the
    column ORDER (keys first), ordering direction, alias handling, and
    the refuse-with-GROUP BY/ORDER BY contract are the pinned
    behaviors."""
    df = fe.sql("SELECT n_name, n_nationkey BY n_regionkey FROM nation")
    assert df.columns == ["n_regionkey", "n_name", "n_nationkey"]
    assert [r.n_regionkey for r in df.collect()] == [0, 1, 2, 3, 4]
    # DESC modifier + AS alias (stripped from grouping, kept on order)
    df = fe.sql("SELECT n_name BY n_regionkey AS rk DESC FROM nation")
    assert df.columns == ["rk", "n_name"]
    assert [r.rk for r in df.collect()] == [4, 3, 2, 1, 0]
    # singleton groups: ANY_VALUE is deterministic, replayable exactly
    df = fe.sql(
        "SELECT n_regionkey BY n_name FROM nation WHERE n_name IN "
        "('NATION_0', 'NATION_12')"
    )
    rows = [(r.n_name, r.n_regionkey) for r in df.collect()]
    assert rows == [("NATION_0", 0), ("NATION_12", 2)]
    # aggregates pass through unwrapped
    df = fe.sql("SELECT COUNT(*) AS n BY n_regionkey FROM nation")
    assert sorted((r.n_regionkey, r.n) for r in df.collect()) == [
        (0, 5), (1, 5), (2, 5), (3, 5), (4, 5)]
    # multi-key BY, qualified keys, join, WHERE — the select.iq:222
    # proposal shape
    df = fe.sql(
        "SELECT c.c_custkey BY n.n_name AS nation DESC, "
        "c.c_mktsegment AS seg FROM customer c "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey"
    )
    assert df.columns == ["nation", "seg", "c_custkey"]
    nations = [r.nation for r in df.collect()]
    assert nations == sorted(nations, reverse=True)
    # aggregate-CONTAINING items pass through unwrapped (r14 probe:
    # CAST(COUNT(*) AS BIGINT) used to refuse)
    df = fe.sql(
        "SELECT CAST(COUNT(*) AS BIGINT) AS n BY n_regionkey FROM nation"
    )
    assert sorted((r.n_regionkey, r.n) for r in df.collect()) == [
        (0, 5), (1, 5), (2, 5), (3, 5), (4, 5)]
    # Calcite refuses BY alongside explicit GROUP BY / ORDER BY
    for bad in (
        "SELECT n_name BY n_regionkey FROM nation GROUP BY n_name",
        "SELECT n_name BY n_regionkey FROM nation ORDER BY n_name",
    ):
        with pytest.raises(ValueError):
            fe.sql(bad)


def test_select_star_except_alias(fe):
    """select.iq:237-290 (CALCITE-7331) — `* EXCEPT(cols)` as the
    EXCLUDE alias; Spark supports the star form natively, and the
    set-op reading of `EXCEPT (SELECT ...)` is preserved."""
    df = fe.sql("SELECT * EXCEPT (n_regionkey) FROM nation LIMIT 1")
    assert df.columns == ["n_nationkey", "n_name"]
    df = fe.sql(
        "SELECT n.* EXCEPT (n.n_regionkey, n.n_name) FROM nation n"
    )
    assert df.columns == ["n_nationkey"]
    # EXCEPT followed by a query stays a set operation
    df = fe.sql(
        "SELECT n_nationkey FROM nation EXCEPT "
        "(SELECT n_nationkey FROM nation WHERE n_nationkey > 2)"
    )
    assert sorted(r.n_nationkey for r in df.collect()) == [0, 1, 2]


def test_date_part_canonicalization(fe, duck):
    """date_part('year'/'month'/..., x) canonicalizes to the named
    functions (year(x)/month(x)) the Sarg/tile tiers recognize — the
    THIRD universal BI spelling after EXTRACT and year() (r14).
    Values replay exactly against DuckDB's native date_part on real
    rows; SECOND is deliberately NOT canonicalized (Spark's
    date_part('SECOND') keeps the fraction, second(x) truncates)."""
    fields = ["year", "quarter", "month", "week", "day", "doy",
              "hour", "minute", "isodow", "century", "decade",
              "millennium", "isoyear", "microsecond", "millisecond"]
    for f in fields:
        sql = (f"SELECT o_orderkey, date_part('{f}', o_orderdate) AS v "
               "FROM orders ORDER BY o_orderkey LIMIT 50")
        got = [(r.o_orderkey, float(r.v)) for r in fe.sql(sql).collect()]
        want = [(k, float(v)) for k, v in duck.execute(sql).fetchall()]
        assert got == want, f
    # fraction-preserving SECOND stays on Spark's native date_part
    r = fe.sql("SELECT date_part('second', timestamp "
               "'2022-06-03 12:15:48.678') AS v").collect()[0][0]
    assert abs(float(r) - 48.678) < 1e-9
