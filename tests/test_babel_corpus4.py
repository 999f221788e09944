"""Babel corpus sampling, batch 4 (r8): the executable subset of the
reference's spark.iq corpus — the dialect we ARE — replayed through the
library mechanism against the corpus' own expected values.

Because the corpus models Spark, most rows check that our passthrough
choices are faithful (RLIKE, CONCAT_WS, REVERSE, GREATEST/LEAST); the
sweep still found two LIBRARY-LIST gaps (REGEXP was registered for
MYSQL only where the reference has {SPARK, HIVE}; REGEXP_LIKE lacked
POSTGRESQL and the optional 3-arg matchType form) and drove the
multiset tier from set-approximations to the reference's exact bag
algebra (MULTISET INTERSECT/EXCEPT ALL order-preserving occurrence
counting, IS EMPTY / IS A SET / SUBMULTISET OF predicates).

Fixture lines cite babel/src/test/resources/sql/spark.iq.
"""

from __future__ import annotations

import pytest

from calcite_spark.functions import registry


def _sp(spark, name, *args):
    expr = registry.translate(name, *args, library="SPARK")
    return spark.sql(f"SELECT {expr} AS v").collect()[0].v


@pytest.fixture()
def raw_literals(spark):
    """The reference processes SQL string literals per the standard —
    backslashes are RAW. Spark's default parser treats them as escapes;
    spark.sql.parser.escapedStringLiterals=true restores standard
    behavior so corpus text replays verbatim."""
    key = "spark.sql.parser.escapedStringLiterals"
    old = spark.conf.get(key, "false")
    spark.conf.set(key, "true")
    yield spark
    spark.conf.set(key, old)


# -- RLIKE / REGEXP / REGEXP_LIKE (spark.iq:49-255) --------------------


RLIKE_CASES = [
    # (value_sql, pattern_sql, expected)      # spark.iq line
    ("NULL", "'abc*'", None),                 # :49
    ("'abc'", "NULL", None),                  # :54
    ("'abc'", "''", True),                    # :59
    ("'abc def ghi'", "'abc'", True),         # :64
    ("'abc def ghi'", "'abcd'", False),       # :69
    (r"'abc'", r"'^\abc$'", False),           # :74  (\a = BEL in Java)
    (r"'\abc'", r"'\abc$'", False),           # :79
    (r"'\abc'", r"'^\abc$'", False),          # :84
    (r"'\abc'", r"'^\\abc$'", True),          # :89
    ("'abc'", "'^abc$'", True),               # :94
    ("'abc'", "'abz*'", True),                # :99
    (r"'%SystemDrive%\\Users\\John'", r"'%SystemDrive%\\\\Users.*'", True),  # :104
    (r"'%SystemDrive%\Users\John'", r"'%SystemDrive%\\Users.*'", True),      # :109
]


def test_rlike_regexp_family_corpus(raw_literals):
    """The three names are one operator in the reference (RLIKE kind);
    all must agree with the corpus under SPARK, and REGEXP must also
    resolve under HIVE (SqlLibraryOperators.java:707-711 — it was
    registered for MYSQL only before this sweep)."""
    spark = raw_literals
    for name in ("RLIKE", "REGEXP", "REGEXP_LIKE"):
        for v, p, want in RLIKE_CASES:
            got = _sp(spark, name, v, p)
            assert got == want, (name, v, p, got)
    expr = registry.translate("REGEXP", "'abc'", "'^abc$'", library="HIVE")
    assert spark.sql(f"SELECT {expr} AS v").collect()[0].v is True


def test_regexp_like_match_type(spark, duck):
    """REGEXP_LIKE's optional 3rd matchType arg ≈ SqlFunctions.java:
    621-628 (Matcher.find under makeRegexpFlags). DuckDB's
    regexp_matches(v, p, options) is the native twin for i/s/m."""
    cases = [
        ("'ABC'", "'abc'", "'i'", True),
        ("'ABC'", "'abc'", "'c'", False),
        ("'ABC'", "'abc'", "'ic'", False),   # left-to-right: c cancels i
        ("'ABC'", "'abc'", "'ci'", True),
        ("'a\\nb'", "'a.b'", "'n'", True),   # n = DOTALL in the reference
        ("'a\\nb'", "'a.b'", "'ns'", False),  # s cancels DOTALL (PG relax)
        ("'a\\nb'", "'^b'", "'m'", True),
        ("'abc'", "'abc'", "'g'", True),     # g accepted, ignored
    ]
    # no 'm' twin: DuckDB's RE2 options don't enable line anchors the
    # way Java's Pattern.MULTILINE does (probed: '^b' never matches at
    # a line start under m/n/p); Java and Spark agree on (?m) natively
    duck_flags = {"i": "i", "c": "", "ic": "", "ci": "i", "n": "s"}
    for v, p, f, want in cases:
        for lib in ("POSTGRESQL", "ORACLE", "SPARK"):
            expr = registry.translate("REGEXP_LIKE", v, p, f, library=lib)
            got = spark.sql(f"SELECT {expr} AS v").collect()[0].v
            assert got == want, (v, p, f, lib, got)
        dk = duck_flags.get(f.strip("'"))
        if dk is not None:
            # Spark's default parser turns \n in the literal into a real
            # newline — hand DuckDB the same decoded value
            vd = v.strip("'").replace("\\n", "\n")
            pd = p.strip("'").replace("\\n", "\n")
            native = duck.execute(
                "SELECT CASE WHEN ? = '' THEN regexp_matches(?, ?) "
                "ELSE regexp_matches(?, ?, ?) END",
                [dk, vd, pd, vd, pd, dk],
            ).fetchone()[0]
            assert got == native, (v, p, f, got, native)
    with pytest.raises(ValueError, match="flags"):
        registry.translate("REGEXP_LIKE", "'a'", "'a'", "'x'", library="SPARK")


# -- CONCAT_WS, Spark variant (spark.iq:269-369) -----------------------


def test_concat_ws_spark_corpus(spark):
    """CONCAT_WS_SPARK (SqlLibraryOperators.java:1316-1332): flattens
    array args, skips NULLs, NULL separator → NULL — Spark's native
    builtin IS the model, so the passthrough must replay the corpus
    verbatim."""
    cases = [
        (["'s'"], ""),                                          # :269
        (["','", "null"], ""),                                  # :274
        (["','", "null", "null"], ""),                          # :279
        (["','", "null", "'a'"], "a"),                          # :284
        (["','", "'a'", "'b'"], "a,b"),                         # :289
        (["','", "'a'", "null", "'b'"], "a,b"),                 # :294
        (["null", "'a'", "'b'"], None),                         # :299
        (["','", "'a'", "100", "'b'"], "a,100,b"),              # :304
        (["','", "'a'", "100.0", "'b'"], "a,100.0,b"),          # :309
        (["''", "cast('a' as varchar(2))", "cast('b' as varchar(1))"], "ab"),
        (["','", "array('a', 'b', 'c')"], "a,b,c"),             # :319
        (["','", "array('a', null, 'c')"], "a,c"),              # :324
        (["','", "array('a')"], "a"),                           # :329
        (["null", "array('a')"], None),                         # :334
        (["','", "array('a')", "array('b')", "array('c')"], "a,b,c"),
        (["','", "'a1'", "'b1'", "'c1'", "array('a')", "array('b')", "array('c')"],
         "a1,b1,c1,a,b,c"),                                     # :349
        (["','", "null", "'a1'", "'b1'", "null", "'c1'", "array('a')",
          "array('b')", "array('c', null, 'd')"], "a1,b1,c1,a,b,c,d"),
        (["','", "100", "'b'", "array('c')"], "100,b,c"),       # :364
        (["','", "array(null, null)"], ""),                     # :369
    ]
    for args, want in cases:
        got = _sp(spark, "CONCAT_WS", *args)
        assert got == want, (args, got)


# -- REVERSE (spark.iq:383-470) ----------------------------------------


def test_reverse_corpus(spark):
    cases = [
        (["'Spark SQL'"], "LQS krapS"),
        (["'#c@b!a'"], "a!b@c#"),
        (["5"], "5"),                         # implicit int→string
        (["array(2, 1, 4, 3)"], [3, 4, 1, 2]),
        (["NULL"], None),
        (["cast(NULL as tinyint)"], None),
        (["array(NULL)"], [None]),
        (["cast(NULL as array<int>)"], None),
        (["''"], ""),
        (["array(cast(1 as tinyint), 2)"], [2, 1]),
        (["array(2.1, NULL)"], [None, 2.1]),
        (["array(2, CAST(2.2 AS double))"], [2.2, 2.0]),
    ]
    for args, want in cases:
        got = _sp(spark, "REVERSE", *args)
        if isinstance(want, list):
            got = [float(x) if x is not None and isinstance(want[0] or want[-1], float) else x for x in got]
        assert got == want, (args, got)
    # NOT replayed: REVERSE(array(CAST(2.1 as decimal(17)), 2.1111...))
    # — the corpus expects [2.11, 2.00] via Calcite's least-restrictive
    # decimal coercion; Spark widens to decimal(21,19) instead. A type-
    # coercion divergence of the literal lattice, not of REVERSE.


# -- GREATEST / LEAST null-skipping (spark.iq:687-711) -----------------


def test_greatest_least_spark_corpus(spark):
    """The SPARK library's GREATEST/LEAST skip NULLs (Spark native);
    only all-NULL yields NULL — unlike the STANDARD pair."""
    assert _sp(spark, "GREATEST", "1", "null", "3") == 3   # :687
    assert _sp(spark, "LEAST", "1", "2", "null", "3") == 1  # :696
    assert _sp(spark, "GREATEST", "null", "null") is None   # :705


# -- multiset tier (spark.iq:470-625) ----------------------------------

# the corpus' COMPLEX."set" values, keyed as in the INSERT
_SETS = {
    0: "cast(NULL as array<int>)",
    1: "array()",
    2: "array(0)",
    3: "array(0, 1)",
    4: "array(0, 1, 2)",
    5: "array(0, 1, 2, 3)",
}


def test_multiset_union_all_corpus(spark):
    want = {0: None, 1: [], 2: [0, 0], 3: [0, 1, 0, 1],
            4: [0, 1, 2, 0, 1, 2], 5: [0, 1, 2, 3, 0, 1, 2, 3]}
    for k, s in _SETS.items():
        assert _sp(spark, "MULTISET_UNION", s, s) == want[k], k


def test_multiset_union_distinct_corpus(spark):
    want = {0: None, 1: [], 2: [0], 3: [0, 1], 4: [0, 1, 2], 5: [0, 1, 2, 3]}
    for k, s in _SETS.items():
        assert _sp(spark, "MULTISET_UNION_DISTINCT", s, s) == want[k], k


def test_multiset_intersect_corpus(spark):
    """Self-intersect (ALL and DISTINCT agree on duplicate-free input —
    the corpus' rows), plus bag-count cases the corpus cannot show:
    multisetIntersectAll keeps c1's first min(n1,n2) occurrences."""
    want = {0: None, 1: [], 2: [0], 3: [0, 1], 4: [0, 1, 2], 5: [0, 1, 2, 3]}
    for k, s in _SETS.items():
        assert _sp(spark, "MULTISET_INTERSECT", s, s) == want[k], k
        assert _sp(spark, "MULTISET_INTERSECT_DISTINCT", s, s) == want[k], k
    assert _sp(spark, "MULTISET_INTERSECT", "array(0,1,0)", "array(0)") == [0]
    assert _sp(
        spark, "MULTISET_INTERSECT", "array(1,2,1,1)", "array(1,1,3)"
    ) == [1, 1]
    # order preserved from the FIRST operand (LinkedList loop order)
    assert _sp(
        spark, "MULTISET_INTERSECT", "array(0,1,0)", "array(0,1,0)"
    ) == [0, 1, 0]
    # STRICT null
    assert _sp(spark, "MULTISET_INTERSECT", "array(1)", _SETS[0]) is None


def test_multiset_except_corpus(spark):
    """multisetExceptAll removes c2's count of the EARLIEST occurrences
    (SqlFunctions.java:7486-7494's result.remove(e) loop)."""
    for k, s in _SETS.items():
        want = None if k == 0 else []
        assert _sp(spark, "MULTISET_EXCEPT", s, s) == want, k
    assert _sp(
        spark, "MULTISET_EXCEPT", "array(1,2,1,1)", "array(1,1)"
    ) == [2, 1]
    assert _sp(spark, "MULTISET_EXCEPT_DISTINCT", "array(1,2,1)", "array(1)") == [2]
    assert _sp(spark, "MULTISET_EXCEPT", "array(1)", _SETS[0]) is None


def test_multiset_predicates_corpus(spark):
    """IS EMPTY / IS A SET / SUBMULTISET OF with the corpus' exact
    NULL behavior: the IS_* family prints FALSE for the NULL row
    (spark.iq:234-249's one false + five true), SUBMULTISET is
    strict-null (blank row)."""
    empty_want = {0: False, 1: True, 2: False, 3: False, 4: False, 5: False}
    set_want = {0: False, 1: True, 2: True, 3: True, 4: True, 5: True}
    sub3_want = {0: None, 1: False, 2: False, 3: False, 4: False, 5: True}
    for k, s in _SETS.items():
        assert _sp(spark, "IS_EMPTY", s) == empty_want[k], k
        assert _sp(spark, "IS_NOT_EMPTY", s) == (not empty_want[k]), k
        assert _sp(spark, "IS_A_SET", s) == set_want[k], k
        assert _sp(spark, "IS_NOT_A_SET", s) == (not set_want[k]), k
        assert _sp(spark, "SUBMULTISET_OF", "array(3)", s) == sub3_want[k], k
        if sub3_want[k] is not None:
            assert _sp(
                spark, "NOT_SUBMULTISET_OF", "array(3)", s
            ) == (not sub3_want[k]), k
    # duplicates: IS A SET false; bag containment counts occurrences
    assert _sp(spark, "IS_A_SET", "array(0, 0)") is False
    assert _sp(spark, "SUBMULTISET_OF", "array(1, 1)", "array(1)") is False
    assert _sp(spark, "SUBMULTISET_OF", "array(1, 1)", "array(1, 2, 1)") is True
    assert _sp(spark, "SUBMULTISET_OF", "array()", "array(1)") is True
    # IS EMPTY also serves maps (OperandTypes.COLLECTION_OR_MAP)
    assert _sp(spark, "IS_EMPTY", "map()") is True
    assert _sp(spark, "IS_EMPTY", "map('zero', 0)") is False


def test_submultiset_strict_null_empty_corner(spark):
    """forall over an empty array returns TRUE without evaluating the
    lambda — the strict-null guard must still propagate a NULL second
    operand (review r8)."""
    assert _sp(spark, "SUBMULTISET_OF", "array()",
               "cast(NULL as array<int>)") is None
    assert _sp(spark, "NOT_SUBMULTISET_OF", "array()",
               "cast(NULL as array<int>)") is None


# -- PG SPLIT_PART (postgresql.iq:69-104) ------------------------------


def test_pg_split_part_literal_delimiter(spark, duck):
    """PG split_part takes a LITERAL delimiter — the old Spark-split
    passthrough treated '.' as a regex and returned '' (review r8,
    corpus sweep). Negative index counts from the end (PG 14); ''
    delimiter → whole string as field 1/-1 and '' otherwise;
    out-of-range → ''; NULL operands → NULL."""
    def _pg(*args):
        expr = registry.translate("SPLIT_PART", *args, library="POSTGRESQL")
        return spark.sql(f"SELECT {expr} AS v").collect()[0].v

    cases = [
        (("'abc,def,ghi,jkl'", "','", "-2"), "ghi"),   # :69
        (("'abc.def'", "'.'", "1"), "abc"),            # :74
        (("'abc.def'", "''", "1"), "abc.def"),         # :79
        (("'abc.def'", "''", "2"), ""),                # :84
        (("NULL", "'.'", "1"), None),                  # :89
        (("'abc.abc'", "'.'", "CAST(NULL AS INT)"), None),  # :99
        (("'abc'", "NULL", "1"), None),                # :104
        (("'a.b'", "'.'", "5"), ""),                   # out-of-range → ''
        (("'a|b|c'", "'|'", "2"), "b"),                # regex metachar
    ]
    for args, want in cases:
        assert _pg(*args) == want, (args, _pg(*args))
    # DuckDB native twin on the overlapping semantics (literal
    # delimiter, negative index, metachars — NOT the ''-delimiter or
    # NULL envelope, where DuckDB diverges from PG)
    for v, d, i in [("abc,def", ",", 2), ("a.b.c", ".", -1), ("a|b", "|", 1)]:
        got = _pg(f"'{v}'", f"'{d}'", str(i))
        native = duck.execute(
            "SELECT split_part(?, ?, ?)", [v, d, i]
        ).fetchone()[0]
        assert got == native, (v, d, i, got, native)
