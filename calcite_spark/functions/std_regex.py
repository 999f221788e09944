"""Standard-family extended regexp forms → Spark lowerings.

Covers the reference's position/occurrence/matchType tiers that Spark's
builtins lack, entirely JVM-side (no UDF):

* REGEXP_REPLACE_4/5/6 (sql/fun/SqlLibraryOperators.java:629-676,
  libraries MYSQL/ORACLE/REDSHIFT; runtime SqlFunctions.regexpReplace →
  Unsafe.regexpReplace): (value, regexp, rep, pos[, occurrence |
  matchType[, matchType]]). Replacement is Java $-indexed (RAW — unlike
  the PG/BQ backslash tiers). occurrence 0 = all matches from pos,
  N ≥ 1 = only the Nth.
* REGEXP_INSTR 2-5 args (SqlLibraryOperators.java:605; runtime
  SqlFunctions.regexpInstr): returns the 1-based position of the
  occurrence-th match's GROUP (the whole match when the pattern has no
  capturing group — at most ONE is allowed), start when
  occurrence_position=0, end+1 when 1; 0 on no match / out of range.

Technique: the same lazy-prefix anchor family as pg_regex, generalized
to the Nth occurrence —

    ^((?s:(?:.*?(?:PAT)){N-1}.*?))(?:PAT)

the brace-quantified non-capturing copy consumes matches 1..N-1
exactly like Matcher.find() advancing from each match's end, and the
final PAT is the Nth. For REGEXP_INSTR the pattern is split at its
capturing group (A(B)C) so the prefix group ends exactly at the
GROUP's start. Plan-time-literal pattern/position/occurrence are
required (refuse-over-wrong); patterns with internal backreferences
refuse when embedded more than once (each textual copy would renumber
its groups).
"""

from __future__ import annotations

import re

from calcite_spark.functions.bq_regex import (
    _int_literal,
    count_capturing_groups,
)
from calcite_spark.functions.pg_regex import (
    _parse_flags,
    _parse_literal,
    _sql_str,
)

_HAS_BACKREF_RE = re.compile(r"\\[1-9]")


def _check_no_backref(pat: str, fn: str) -> None:
    # linear scan: a backslash consumes the next char
    i = 0
    while i < len(pat):
        if pat[i] == "\\" and i + 1 < len(pat):
            if pat[i + 1].isdigit() and pat[i + 1] != "0":
                raise ValueError(
                    f"{fn}: pattern backreferences (\\{pat[i + 1]}) cannot "
                    "be embedded in the Nth-occurrence rewrite (each "
                    "textual copy of the pattern renumbers its groups) — "
                    "use occurrence 0/1 or a backreference-free pattern"
                )
            i += 2
            continue
        i += 1


def _shift_replacement_dollars(repl: str, shift: int, fn: str) -> str:
    """Java $-indexed replacement with every group index shifted
    (single digit, like the reference's own scans); `\\$` and `\\\\`
    escapes pass through, `$<name>` named refs refuse."""
    out, i = [], 0
    while i < len(repl):
        ch = repl[i]
        if ch == "\\" and i + 1 < len(repl):
            out.append(repl[i : i + 2])
            i += 2
            continue
        if ch == "$":
            nxt = repl[i + 1 : i + 2]
            if nxt.isdigit():
                out.append(f"${int(nxt) + shift}")
                i += 2
                continue
            raise ValueError(
                f"{fn}: replacement {repl!r} has a non-numeric $ "
                "reference — escape a literal dollar as \\$"
            )
        out.append(ch)
        i += 1
    return "".join(out)


def _nth_prefix_pattern(pat: str, n: int) -> str:
    """`^((?s:(?:.*?(?>PAT)){n-1}.*?))` + the caller-appended Nth PAT.

    The repeated copies are ATOMIC groups `(?>PAT)`: Matcher.find()
    never backtracks across iterations, but a plain `(?:PAT)` copy
    would — for '11' ~ '[0-9]+' the greedy first copy backtracks from
    '11' to '1' so a phantom second occurrence appears, where find()
    consumes '11' whole and reports ONE occurrence (fuzz-found r8).
    An atomic copy matches exactly what a standalone find() would at
    that position; the lazy `.*?` between copies replays find()'s
    start-position scan."""
    if n == 1:
        return "^((?s:.*?))"
    return f"^((?s:(?:.*?(?>{pat})){{{n - 1}}}.*?))"


def std_regexp_replace(args, fn_name: str = "REGEXP_REPLACE") -> str:
    """REGEXP_REPLACE_4/5/6: (value, regexp, rep, pos[, occurrence |
    matchType[, matchType]]).

    Documented divergence: the reference THROWS at runtime when
    position > length(value)+1 (invalidInputForRegexpReplace); the
    substr-based lowering cannot see the value at plan time and
    returns the input unchanged instead — graceful where the reference
    errors, never a different non-error value."""
    value, rx, rep = args[0], args[1], args[2]
    pos = _int_literal(args[3], "position", fn_name)
    occ, flags = 0, ""
    if len(args) >= 5:
        if re.match(r"^\s*'", args[4]):
            flags = _parse_literal(args[4], "matchType")
        else:
            occ = _int_literal_or_zero(args[4], "occurrence", fn_name)
    if len(args) == 6:
        flags = _parse_literal(args[5], "matchType")
    g, ci, dotall, multiline = _parse_flags(flags)
    if g:
        occ = 0  # PG-compat flag accepted by makeRegexpFlags
    prefix = ("(?i)" if ci else "") + ("(?s)" if dotall else "") + (
        "(?m)" if multiline else ""
    )
    src = value if pos == 1 else f"substr({value}, {pos})"
    head = "" if pos == 1 else f"substr({value}, 1, {pos - 1}), "
    if occ == 0:
        pat = _parse_literal(rx, "pattern") if prefix else None
        rx_expr = _sql_str(prefix + pat) if pat is not None else rx
        body = f"regexp_replace({src}, {rx_expr}, {rep})"
    else:
        if multiline:
            raise ValueError(
                f"{fn_name}: the multiline flag with a positive "
                "occurrence is not supported by the anchor rewrite — "
                "use occurrence 0"
            )
        pat = _parse_literal(rx, "pattern")
        rep_lit = _parse_literal(rep, "replacement")
        _check_no_backref(pat, fn_name) if occ > 1 else None
        groups = count_capturing_groups(pat)
        # groups inside the repeated copies come first, then the final
        # occurrence's own groups — replacement $n refs point at the
        # final copy
        shift = 1 + (occ - 1) * groups
        wrapped = f"{prefix}{_nth_prefix_pattern(pat, occ)}(?:{pat})"
        body = (
            f"regexp_replace({src}, {_sql_str(wrapped)}, "
            f"{_sql_str('$1' + _shift_replacement_dollars(rep_lit, shift, fn_name))})"
        )
    if not head:
        return body
    return f"concat({head}{body})"


def _int_literal_or_zero(arg: str, what: str, fn: str) -> int:
    m = re.match(r"^\s*(-?\d+)\s*$", arg)
    if m is None or int(m.group(1)) < 0:
        raise ValueError(
            f"Invalid {what} {arg!r} for {fn}: must be a non-negative "
            "integer literal (0 = all occurrences)"
        )
    return int(m.group(1))


def _split_at_group(pat: str):
    """A(B)C split of a ≤1-capturing-group pattern: (A, B, C) with B
    the group's CONTENT, or (None, pat, None) when no group exists."""
    i, in_class = 0, False
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
        elif ch == "(" and pat[i + 1 : i + 2] != "?":
            depth, j = 1, i + 1
            cls = False
            while j < len(pat) and depth:
                cj = pat[j]
                if cj == "\\":
                    j += 2
                    continue
                if cls:
                    cls = cj != "]"
                elif cj == "[":
                    cls = True
                elif cj == "(":
                    depth += 1
                elif cj == ")":
                    depth -= 1
                j += 1
            return pat[:i], pat[i + 1 : j - 1], pat[j:]
        i += 1
    return None, pat, None


def regexp_instr(args, fn_name: str = "REGEXP_INSTR") -> str:
    """(value, regexp[, position[, occurrence[, occurrence_position]]])
    → 1-based index of the occurrence-th match's group (0 = no match)."""
    if len(args) not in (2, 3, 4, 5):
        raise ValueError(f"{fn_name}: arity {len(args)} not in (2, 3, 4, 5)")
    value = args[0]
    pat = _parse_literal(args[1], "pattern")
    if pat == "":
        return "0"  # reference: empty regex → 0
    groups = count_capturing_groups(pat)
    if groups > 1:
        raise ValueError(
            f"Multiple capturing groups (count={groups}) not allowed in "
            f"regex input for {fn_name} "
            "(SqlFunctions.checkMultipleCapturingGroupsInRegex)"
        )
    pos = _int_literal(args[2], "position", fn_name) if len(args) >= 3 else 1
    occ = _int_literal(args[3], "occurrence", fn_name) if len(args) >= 4 else 1
    opos = 0
    if len(args) == 5:
        opos = _int_literal_or_zero(args[4], "occurrence_position", fn_name)
        if opos not in (0, 1):
            raise ValueError(
                f"Invalid occurrence_position '{opos}' for {fn_name}: "
                "0 (start) or 1 (end)"
            )
    if occ > 1:
        _check_no_backref(pat, fn_name)
    a, b, c = _split_at_group(pat)
    if a is None:
        a, b, c = "", pat, ""
    # group 1 = the prefix running up to the GROUP's start in the Nth
    # match; the explicit (B) is the group's own match — its index
    # shifts past the capturing groups inside the n-1 repeated copies
    # (Java numbers groups by textual '(' order); the (?:C) tail keeps
    # the whole pattern required at that spot
    # (matcher.start/end(groupCount()))
    wrapped = f"{_nth_prefix_pattern(pat, occ)[:-1]}{a})({b})(?:{c})"
    bidx = 2 + (occ - 1) * groups
    src = f"CASE WHEN {pos} <= length({value}) THEN substr({value}, {pos}) END"
    base = f"length(regexp_extract({src}, {_sql_str(wrapped)}, 1))"
    if opos == 1:
        base = (
            f"({base} + "
            f"length(regexp_extract({src}, {_sql_str(wrapped)}, {bidx})))"
        )
    # NULL value propagates (ReturnTypes.INTEGER_NULLABLE); a
    # no-match / out-of-range position is 0
    return (
        f"CASE WHEN {value} IS NULL THEN CAST(NULL AS INT) "
        f"WHEN {src} RLIKE {_sql_str(wrapped)} "
        f"THEN CAST({base} + {pos} AS INT) ELSE 0 END"
    )


def regexp_like(args, fn_name: str = "REGEXP_LIKE") -> str:
    """REGEXP_LIKE(value, regexp, matchType) ≈ SqlFunctions.regexpLike
    (runtime/SqlFunctions.java:621-628): Matcher.find() under
    makeRegexpFlags — lowered to Spark's RLIKE (also a find()) with an
    inline-flag prefix. Flags process left-to-right with 'c'/'s'
    canceling earlier 'i'/'n', exactly as makeRegexpFlags does; 'g' is
    accepted and ignored (it is occurrence, meaningless for a
    predicate). The matchType must be a literal — the prefix is built
    at plan time."""
    value, rx = args[0], args[1]
    flags = _parse_literal(args[2], "matchType")
    _g, ci, dotall, multiline = _parse_flags(flags)
    prefix = ("(?i)" if ci else "") + ("(?s)" if dotall else "") + (
        "(?m)" if multiline else ""
    )
    if not prefix:
        return f"({value} RLIKE {rx})"
    if re.match(r"^\s*'", rx):
        pat = _parse_literal(rx, "pattern")
        return f"({value} RLIKE {_sql_str(prefix + pat)})"
    # non-literal pattern: prepend the flag prefix at runtime
    return f"({value} RLIKE concat({_sql_str(prefix)}, {rx}))"
