"""SQL/JSON path engine (functions/json_path.py): strict vs lax modes,
ON EMPTY/ON ERROR defaults, wildcards, MySQL JSON utilities — value-
checked against hand-derived SQL:2016 expectations and cross-checked
with DuckDB's json functions where the two semantics coincide.

Reference spec: SqlStdOperatorTable.java:1653-1694 (JSON_EXISTS ..
JSON_REPLACE), SqlLibraryOperators JSON_DEPTH/PRETTY/REMOVE/TYPE.
"""

from __future__ import annotations

import json

import pytest

from calcite_spark.functions import registry
from calcite_spark.functions.json_path import (
    JsonPathError,
    eval_path,
    json_depth_one,
    json_exists_one,
    json_pretty_one,
    json_query_one,
    json_remove_one,
    json_type_one,
    json_value_one,
)

DOC = '{"a": {"b": [1, 2, 3]}, "s": "x", "n": 2.5, "t": true, "z": null}'
NESTED = json.loads(DOC)


# -- path evaluation ---------------------------------------------------


def test_lax_member_and_index():
    assert eval_path(NESTED, "$.a.b[0]") == [1]
    assert eval_path(NESTED, "lax $.a.b[2]") == [3]
    assert eval_path(NESTED, "$.a.b[last]") == [3]
    assert eval_path(NESTED, "$.a.b[*]") == [1, 2, 3]


def test_lax_structural_miss_is_empty():
    assert eval_path(NESTED, "$.missing") == []
    assert eval_path(NESTED, "$.a.b[9]") == []
    assert eval_path(NESTED, "$.s.inner") == []


def test_strict_structural_miss_raises():
    with pytest.raises(JsonPathError):
        eval_path(NESTED, "strict $.missing")
    with pytest.raises(JsonPathError):
        eval_path(NESTED, "strict $.a.b[9]")
    with pytest.raises(JsonPathError):
        eval_path(NESTED, "strict $.s.inner")  # member access on scalar


def test_lax_auto_wrap_and_unwrap():
    # lax: scalar treated as singleton array for [0]
    assert eval_path(NESTED, "$.s[0]") == ["x"]
    with pytest.raises(JsonPathError):
        eval_path(NESTED, "strict $.s[0]")
    # lax: member access auto-unwraps arrays
    arr = json.loads('{"rows": [{"v": 1}, {"v": 2}]}')
    assert eval_path(arr, "$.rows.v") == [1, 2]
    with pytest.raises(JsonPathError):
        eval_path(arr, "strict $.rows.v")


def test_wildcard_member():
    doc = json.loads('{"a": 1, "b": 2}')
    assert sorted(eval_path(doc, "$.*")) == [1, 2]


def test_parse_path_is_total():
    """Hypothesis: parse_path either succeeds or raises JsonPathError —
    never any other exception (the ADVICE r2 crash class), for ANY
    input string."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from calcite_spark.functions.json_path import parse_path

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=40))
    def run(s):
        try:
            parse_path(s)
        except JsonPathError:
            pass

    run()


def test_malformed_path_is_json_path_error():
    """ADVICE r2: int('b'), unterminated quote/bracket used to raise raw
    ValueError past the ON ERROR handlers and crash the Spark task —
    every parse failure must be a JsonPathError so NULL/FALSE ON ERROR
    applies."""
    for bad in ('$.a[b]', '$."unterminated', "$.a[1", "$.a[1.5]"):
        with pytest.raises(JsonPathError):
            eval_path(NESTED, bad)
    # and the ON ERROR defaults hold end-to-end
    assert json_value_one(DOC, "$.a[b]") is None
    assert json_query_one(DOC, "$.a[b]") is None
    assert json_exists_one(DOC, "$.a[b]") is False
    assert json_remove_one(DOC, "$.a[b]") is None


# -- JSON_VALUE / JSON_QUERY / JSON_EXISTS defaults --------------------


def test_json_value_defaults():
    assert json_value_one(DOC, "$.s") == "x"
    assert json_value_one(DOC, "$.n") == "2.5"
    assert json_value_one(DOC, "$.t") == "true"
    assert json_value_one(DOC, "$.a.b[1]") == "2"
    assert json_value_one(DOC, "$.z") is None  # JSON null → SQL NULL
    assert json_value_one(DOC, "$.missing") is None  # NULL ON EMPTY
    assert json_value_one(DOC, "strict $.missing") is None  # NULL ON ERROR
    assert json_value_one(DOC, "$.a") is None  # non-scalar → error → NULL
    assert json_value_one("not json", "$.a") is None
    assert json_value_one(None, "$.a") is None


def test_json_query_defaults():
    assert json_query_one(DOC, "$.a") == '{"b":[1,2,3]}'
    assert json_query_one(DOC, "$.a.b") == "[1,2,3]"
    assert json_query_one(DOC, "$.s") is None  # scalar w/o wrapper → NULL
    assert json_query_one(DOC, "$.s", wrapper="always") == '["x"]'
    assert json_query_one(DOC, "$.s", wrapper="cond") == '["x"]'
    assert json_query_one(DOC, "$.a", wrapper="cond") == '{"b":[1,2,3]}'
    assert json_query_one(DOC, "$.a.b[*]", wrapper="always") == "[1,2,3]"
    assert json_query_one(DOC, "$.missing") is None


def test_json_exists_defaults():
    assert json_exists_one(DOC, "$.a.b") is True
    assert json_exists_one(DOC, "$.z") is True  # null-valued member exists
    assert json_exists_one(DOC, "$.missing") is False
    assert json_exists_one(DOC, "strict $.missing") is False  # FALSE ON ERROR
    assert json_exists_one(None, "$.a") is None


# -- MySQL utilities ---------------------------------------------------


def test_json_type():
    assert json_type_one("{}") == "OBJECT"
    assert json_type_one("[1]") == "ARRAY"
    assert json_type_one("true") == "BOOLEAN"
    assert json_type_one("null") == "NULL"
    assert json_type_one("3") == "INTEGER"
    assert json_type_one("3.5") == "DOUBLE"
    assert json_type_one('"s"') == "STRING"
    assert json_type_one(None) is None


def test_json_depth():
    assert json_depth_one("3") == 1
    assert json_depth_one("{}") == 1
    assert json_depth_one("[]") == 1
    assert json_depth_one('{"a": 1}') == 2
    assert json_depth_one('{"a": {"b": [1]}}') == 4
    assert json_depth_one(None) is None


def test_json_pretty_roundtrip():
    out = json_pretty_one('{"a":[1,2]}')
    assert json.loads(out) == {"a": [1, 2]}
    assert "\n" in out and "  " in out


def test_json_remove():
    assert json_remove_one('{"a": 1, "b": 2}', "$.b") == '{"a":1}'
    assert json_remove_one("[1, 2, 3]", "$[1]") == "[1,3]"
    assert json_remove_one("[1, 2, 3]", "$[last]") == "[1,2]"
    assert (
        json_remove_one('{"a": {"b": 1, "c": 2}}', "$.a.b") == '{"a":{"c":2}}'
    )
    # sequential application: indexes shift left-to-right (MySQL behavior)
    assert json_remove_one("[1, 2, 3]", "$[0]", "$[0]") == "[3]"
    assert json_remove_one('{"a": 1}', "$") is None  # root removal = error
    assert json_remove_one('{"a": 1}', "$.a[*]") is None  # wildcard = error


# -- DuckDB cross-check (where semantics coincide) ---------------------


def test_scalar_extraction_matches_duckdb(duck):
    docs = [DOC, '{"a": {"b": []}}', "[4,5]", '{"s": 7}']
    for d in docs:
        for p in ("$.s", "$.a.b[0]", "$.n"):
            ours = json_value_one(d, p)
            theirs = duck.execute(
                "SELECT json_extract_string(?::json, ?)", [d, p]
            ).fetchone()[0]
            # DuckDB returns fragments for non-scalars; SQL/JSON says NULL —
            # compare only when DuckDB's answer is scalar-shaped
            if theirs is not None and not theirs.startswith(("[", "{")):
                assert ours == theirs, (d, p, ours, theirs)


def test_type_matches_duckdb_modulo_names(duck):
    mapping = {
        "OBJECT": "OBJECT",
        "ARRAY": "ARRAY",
        "BOOLEAN": "BOOLEAN",
        "NULL": "NULL",
        "UBIGINT": "INTEGER",
        "BIGINT": "INTEGER",
        "DOUBLE": "DOUBLE",
        "VARCHAR": "STRING",
    }
    for d in ("{}", "[1]", "true", "null", "3", "-3", "3.5", '"s"'):
        theirs = duck.execute("SELECT json_type(?::json)", [d]).fetchone()[0]
        assert json_type_one(d) == mapping[theirs], d


# -- Spark integration: registration + registry dispatch ---------------


def test_registry_dispatch():
    t = registry.translate("JSON_VALUE", "doc", "'$.a'")
    assert t == "get_json_object(doc, '$.a')"  # plain lax → JVM builtin
    t = registry.translate("JSON_VALUE", "doc", "'strict $.a'")
    assert t == "cs_json_value(doc, 'strict $.a')"
    t = registry.translate("JSON_VALUE", "doc", "'$.a[*]'")
    assert t == "cs_json_value(doc, '$.a[*]')"
    t = registry.translate("JSON_EXISTS", "doc", "'strict $.a'")
    assert t == "cs_json_exists(doc, 'strict $.a')"
    t = registry.translate("JSON_QUERY", "doc", "'$.a'")
    assert t == "cs_json_query(doc, '$.a')"  # always the path engine
    assert registry.translate("JSON_DEPTH", "doc") == "cs_json_depth(doc)"


def test_spark_udfs_registered(spark):
    from calcite_spark.catalog import Catalog

    Catalog(spark)  # registers cs_json_* idempotently
    row = spark.sql(
        f"""SELECT cs_json_value('{DOC}', 'strict $.a.b[1]') AS v,
                   cs_json_query('{DOC}', '$.a.b') AS q,
                   cs_json_exists('{DOC}', 'strict $.missing') AS e,
                   cs_json_type('{DOC}') AS t,
                   cs_json_depth('{DOC}') AS d,
                   cs_json_remove('[1,2,3]', '$[0]') AS r"""
    ).collect()[0]
    assert row.v == "2"
    assert row.q == "[1,2,3]"
    assert row.e is False
    assert row.t == "OBJECT"
    assert row.d == 4
    assert row.r == "[2,3]"
