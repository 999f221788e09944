"""BigQuery-library REGEXP_EXTRACT / REGEXP_SUBSTR → Spark lowering.

The reference models these as ONE operator family
(sql/fun/SqlLibraryOperators.java:588-592, REGEXP_SUBSTR = withName
alias at :705) with runtime SqlFunctions.regexpExtract
(runtime/SqlFunctions.java:632-673):

* signature (value, regexp[, position[, occurrence]]), both defaulting
  to 1; matching starts at `position` (matcher.region) and returns the
  `occurrence`-th match;
* AT MOST ONE capturing group (checkMultipleCapturingGroupsInRegex —
  more is an error); with one group the GROUP is returned, with zero
  the whole match (matcher.group(groupCount()));
* NULL when there is no match or position/occurrence exceed the input;
  an ERROR when position/occurrence < 1.

Spark's builtin regexp_extract differs on every axis: its 3rd argument
is a GROUP INDEX (a silent wrong-value trap for BigQuery's position —
the same lib-variant class as the r8 PG REGEXP_REPLACE fix), it errors
on group-less patterns at the default index, and it returns '' (not
NULL) on no match. The lowering here replays the reference exactly and
stays JVM-side:

    try_element_at(regexp_extract_all(substr(value, POS), PAT, g), OCC)

substr starts the region, regexp_extract_all(.., g) returns every
match (group g = 1 with one capturing group, 0 with none — decided at
plan time from the literal pattern), try_element_at yields NULL beyond
range, and an empty match list yields NULL — the reference's NULL
semantics for free. Pattern must be a string LITERAL (the group count
gates the lowering); position/occurrence must be integer literals ≥ 1
(the reference throws on < 1 — we refuse at plan time).
"""

from __future__ import annotations

import re

from calcite_spark.functions.pg_regex import _parse_literal, _sql_str

_INT_LIT_RE = re.compile(r"^\s*(-?\d+)\s*$")


def bq_regexp_replace(args) -> str:
    """BigQuery 3-arg REGEXP_REPLACE = replace-ALL with BACKSLASH group
    indexing: the reference binds REGEXP_REPLACE_BIG_QUERY_3 to
    regexpReplaceNonDollarIndexed with occurrence=0
    (util/BuiltInMethod.java:696, runtime SqlFunctions.java:814-816) —
    NOT the plain $-indexed runtime the MYSQL/ORACLE/HIVE 3-arg form
    uses. A passthrough to Spark renders '<h1>\\1</h1>' as the literal
    '<h1>1</h1>' (Java treats \\1 as an escaped '1') — found by the r8
    big-query.iq corpus sweep (big-query.iq:1509). Replacement must be
    a literal (plan-time \\n → $n translation); the pattern passes
    through untouched (no rewrite needed for replace-all)."""
    from calcite_spark.functions.pg_regex import _translate_replacement

    repl = _parse_literal(args[2], "replacement")
    return (
        f"regexp_replace({args[0]}, {args[1]}, "
        f"{_sql_str(_translate_replacement(repl, 0))})"
    )


def count_capturing_groups(pat: str) -> int:
    """Capturing groups in a Java regex literal: linear scan with
    backslash escapes consumed, character classes opaque, `(?` forms
    (non-capturing, lookaround, flags, named groups count in Java but
    BigQuery/RE2 `(?P<name>` is refused upstream by Pattern.compile —
    named `(?<name>` DOES capture, counted here)."""
    n, i, in_class = 0, 0, False
    while i < len(pat):
        ch = pat[i]
        if ch == "\\":
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
        elif ch == "[":
            in_class = True
        elif ch == "(":
            if pat[i + 1 : i + 2] != "?" or pat[i + 1 : i + 3] == "?<" and pat[
                i + 1 : i + 4
            ] not in ("?<=", "?<!"):
                n += 1
        i += 1
    return n


def _int_literal(arg: str, what: str, fn: str) -> int:
    m = _INT_LIT_RE.match(arg)
    if m is None:
        raise ValueError(
            f"{fn} (BIG_QUERY): {what} must be an integer literal — the "
            "plan-time lowering validates the reference's range rules "
            "(SqlFunctions.validatePosOccurrenceParamValues)"
        )
    v = int(m.group(1))
    if v < 1:
        raise ValueError(
            f"Invalid {what} '{v}' for {fn}: must be a positive integer"
        )
    return v


def bq_regexp_extract(args, fn_name: str = "REGEXP_EXTRACT") -> str:
    """(value, regexp[, position[, occurrence]]) → Spark expression."""
    if len(args) not in (2, 3, 4):
        raise ValueError(f"{fn_name}: arity {len(args)} not in (2, 3, 4)")
    value = args[0]
    pat = _parse_literal(args[1], "pattern")
    groups = count_capturing_groups(pat)
    if groups > 1:
        raise ValueError(
            f"Multiple capturing groups (count={groups}) not allowed in "
            f"regex input for {fn_name} "
            "(SqlFunctions.checkMultipleCapturingGroupsInRegex)"
        )
    pos = _int_literal(args[2], "position", fn_name) if len(args) >= 3 else 1
    occ = _int_literal(args[3], "occurrence", fn_name) if len(args) == 4 else 1
    # position beyond the value is NULL regardless of the pattern
    # (validatePosOccurrenceParamValues: position > value.length() →
    # NULL — even position 1 on '') — a bare substr would hand '' to
    # the regex, which an empty-matching pattern would then match
    src = f"CASE WHEN {pos} <= length({value}) THEN substr({value}, {pos}) END"
    return (
        f"try_element_at(regexp_extract_all({src}, {_sql_str(pat)}, "
        f"{groups}), {occ})"
    )
