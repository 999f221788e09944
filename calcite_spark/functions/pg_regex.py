"""PostgreSQL-library REGEXP_REPLACE → Spark lowering.

The reference keeps TWO distinct operators under the one SQL name
(sql/fun/SqlLibraryOperators.java:690-700):

* REGEXP_REPLACE_PG_3 — runtime SqlFunctions.regexpReplacePg(s, re, rep)
  (runtime/SqlFunctions.java:801-803): occurrence=1 — PostgreSQL
  replaces only the FIRST match — with BACKSLASH group indexing in the
  replacement (`\\1`, not Java's `$1`), translated by
  replaceNonDollarIndexedString (SqlFunctions.java:586-612).
* REGEXP_REPLACE_PG_4 — regexpReplacePg(s, re, rep, matchType)
  (SqlFunctions.java:806-810): flags string; 'g' → occurrence=0 (all),
  the rest feed makeRegexpFlags (SqlFunctions.java:838-869: i/c case
  toggles, n → DOTALL, m → MULTILINE, s → clear DOTALL, unknown →
  "Invalid input ... REGEXP_REPLACE").

Spark's builtin regexp_replace replaces ALL matches and has no
occurrence argument, so the first-occurrence tier is lowered by the
lazy-prefix anchor trick — entirely JVM-side, no UDF:

    regexp_replace(s, '^((?s:.*?))(?:PAT)', '$1REPL')

The anchored `^` can match only once (no MULTILINE), `(?s:.*?)` is a
SCOPED dotall lazy prefix (finds the leftmost occurrence across
newlines without changing `.` semantics inside PAT), and the extra
capturing group shifts every group index in PAT and REPL by one —
applied at plan time, which is why pattern/replacement/flags must be
string LITERALS (a column-valued pattern would need per-row
translation: refused, never silently wrong).

Fixtures replay babel/src/test/resources/sql/postgresql.iq:1352-1370;
the DuckDB native twin (regexp_replace is first-match by default, 'g'
for global) backs the hypothesis fuzz in tests/test_functions.py.
"""

from __future__ import annotations

import re

_LIT_RE = re.compile(r"^\s*'((?:[^']|'')*)'\s*$", re.S)


def _parse_literal(arg: str, what: str) -> str:
    """SQL string literal → content ('' doubling collapsed); refuse
    non-literals (plan-time translation cannot see runtime values)."""
    m = _LIT_RE.match(arg)
    if m is None:
        raise ValueError(
            f"REGEXP_REPLACE (POSTGRESQL): the {what} must be a string "
            "literal — PG first-occurrence semantics and backslash group "
            "indexing are translated at plan time, which a column-valued "
            f"{what} cannot be"
        )
    return m.group(1).replace("''", "'")


def _sql_str(s: str) -> str:
    """Emit a Spark SQL string literal (backslash IS an escape there)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _translate_replacement(repl: str, shift: int) -> str:
    """Replay replaceNonDollarIndexedString (SqlFunctions.java:586-612)
    with a group-index shift: `\\\\` → `\\`, literal `$` → `\\$`, `\\n`
    → `$(n+shift)` (single digit, exactly like the reference's
    replaceFirst("\\\\(\\d)", ...)), any other escape → error."""
    s = repl.replace("\\\\", "\\").replace("$", "\\$")
    out, i = [], 0
    while i < len(s):
        ch = s[i]
        if ch != "\\":
            out.append(ch)
            i += 1
            continue
        if i + 1 >= len(s):
            # the reference's scan leaves a trailing lone backslash in
            # place and Java's Matcher then throws at RUNTIME ("character
            # to be escaped is missing") — refuse at plan time instead
            raise ValueError(
                f"Invalid replacement pattern for REGEXP_REPLACE: {repl!r}"
                " (trailing lone backslash; write \\\\\\\\ for a literal"
                " backslash)"
            )
        nxt = s[i + 1]
        if nxt.isdigit():
            if nxt == "0" and shift:
                # \0 = the whole match ($0); under the first-occurrence
                # anchor rewrite $0 would include the lazy prefix
                raise ValueError(
                    "REGEXP_REPLACE (POSTGRESQL): \\0 (whole-match) in "
                    "the replacement is not supported without the 'g' "
                    "flag — wrap the whole pattern in (...) and use \\1"
                )
            out.append(f"${int(nxt) + shift}")
        elif nxt in ("\\", "$"):
            out.append(ch)
            out.append(nxt)
        else:
            raise ValueError(
                f"Invalid replacement pattern for REGEXP_REPLACE: {repl!r}"
                " (only \\\\n group references, \\\\\\\\ and \\\\$ escapes"
                " are valid — SqlFunctions.replaceNonDollarIndexedString)"
            )
        i += 2
    return "".join(out)


def _shift_pattern_backrefs(pat: str) -> str:
    """Renumber `\\n` backreferences inside the PATTERN itself (+1 for
    the injected prefix group). Linear scan: a backslash consumes the
    next char, character classes are tracked (inside `[...]` a \\digit
    is an octal escape, not a backref — left untouched). Two digits
    after a backslash are ambiguous once shifted (`\\10` → group 10 vs
    group 1 then '0') — refused."""
    out, i, in_class = [], 0, False
    while i < len(pat):
        ch = pat[i]
        if ch == "\\" and i + 1 < len(pat):
            nxt = pat[i + 1]
            if nxt.isdigit() and not in_class and nxt != "0":
                if i + 2 < len(pat) and pat[i + 2].isdigit():
                    raise ValueError(
                        "REGEXP_REPLACE (POSTGRESQL): multi-digit "
                        f"backreference \\{nxt}{pat[i + 2]} in the pattern "
                        "cannot be renumbered unambiguously for the "
                        "first-occurrence rewrite — use (?:...) to keep "
                        "groups below 10, or add the 'g' flag"
                    )
                out.append(f"\\{int(nxt) + 1}")
            else:
                out.append(ch)
                out.append(nxt)
            i += 2
            continue
        if ch == "[" and not in_class:
            in_class = True
        elif ch == "]" and in_class:
            in_class = False
        out.append(ch)
        i += 1
    return "".join(out)


def _parse_flags(flags: str):
    """makeRegexpFlags replay (SqlFunctions.java:838-869), processed
    left to right; returns (global, case_insensitive, dotall, multiline)."""
    g = ci = dotall = multiline = False
    for ch in flags:
        if ch == "g":
            g = True
        elif ch == "i":
            ci = True
        elif ch == "c":
            ci = False
        elif ch == "n":
            dotall = True
        elif ch == "s":
            dotall = False
        elif ch == "m":
            multiline = True
        else:
            raise ValueError(
                f"Invalid input for REGEXP_REPLACE: flags {flags!r} — "
                "supported: g i c n m s (SqlFunctions.makeRegexpFlags)"
            )
    return g, ci, dotall, multiline


def pg_regexp_replace(args) -> str:
    """REGEXP_REPLACE_PG_3 / _PG_4 → one Spark regexp_replace call."""
    if len(args) not in (3, 4):
        raise ValueError(
            f"REGEXP_REPLACE (POSTGRESQL): arity {len(args)} not in (3, 4)"
        )
    src = args[0]
    pat = _parse_literal(args[1], "pattern")
    repl = _parse_literal(args[2], "replacement")
    g, ci, dotall, multiline = (
        _parse_flags(_parse_literal(args[3], "flags")) if len(args) == 4
        else (False, False, False, False)
    )
    prefix = ("(?i)" if ci else "") + ("(?s)" if dotall else "")
    if g:
        # occurrence=0 — Spark's builtin replace-all IS the semantics
        if multiline:
            prefix += "(?m)"
        return (
            f"regexp_replace({src}, {_sql_str(prefix + pat)}, "
            f"{_sql_str(_translate_replacement(repl, 0))})"
        )
    if multiline:
        # the anchor trick relies on `^` matching only once; under
        # MULTILINE it matches at every line start and would replace
        # once per line — refuse rather than silently diverge
        raise ValueError(
            "REGEXP_REPLACE (POSTGRESQL): the 'm' flag without 'g' "
            "(first occurrence under multiline matching) is not "
            "supported by the anchor-rewrite lowering — add 'g' or "
            "drop 'm'"
        )
    wrapped = f"{prefix}^((?s:.*?))(?:{_shift_pattern_backrefs(pat)})"
    return (
        f"regexp_replace({src}, {_sql_str(wrapped)}, "
        f"{_sql_str('$1' + _translate_replacement(repl, 1))})"
    )
