"""PostgreSQL TO_CHAR datetime template → Spark (DateTimeFormatter)
pattern conversion ≈ the reference's PostgresqlDateTimeFormatter
(util/format/ — babel postgresql.iq replays to_char heavily).

Why this exists: Spark's `date_format` uses Java patterns, so passing a
PG template through verbatim is SILENTLY WRONG — 'HH24' parses as Java
pattern HH followed by literal 24 and renders "1224". Conversion
happens at plan-build time on LITERAL templates only.

Refuse-over-wrong scope: tokens whose Java rendering matches PG exactly
convert; tokens Java cannot reproduce (lowercase meridians, PG's
blank-padded 'Month'/'Day', locale week numbers WW/IW, Julian dates,
century) raise with the closest supported alternative named. PG's FM
(fill mode) prefix maps to the unpadded Java letters.
"""

from __future__ import annotations

# ordered longest-first; case-sensitive (PG 'Mon' renders "Jan" = Java
# MMM, while 'MON' renders "JAN" which Java cannot produce)
_TOKENS = [
    ("FMMonth", "MMMM"),
    ("FMMONTH", None),
    ("FMmonth", None),
    ("FMDay", "EEEE"),
    ("FMDAY", None),
    ("FMday", None),
    ("FMYYYY", "y"),
    ("FMHH24", "H"),
    ("FMHH12", "h"),
    ("FMHH", "h"),
    ("FMMM", "M"),
    ("FMDD", "d"),
    ("FMMI", "m"),
    ("FMSS", "s"),
    ("YYYY", "yyyy"),
    ("Y,YYY", None),
    ("YYY", None),
    ("YY", "yy"),
    ("HH24", "HH"),
    ("HH12", "hh"),
    ("HH", "hh"),
    ("MI", "mm"),
    ("SSSS", None),  # seconds past midnight — no Java letter
    ("SS", "ss"),
    ("MS", "SSS"),
    ("US", "SSSSSS"),
    ("FF6", "SSSSSS"),
    ("FF5", "SSSSS"),
    ("FF4", "SSSS"),
    ("FF3", "SSS"),
    ("FF2", "SS"),
    ("FF1", "S"),
    ("Month", None),  # PG blank-pads to 9 chars; use FMMonth
    ("MONTH", None),
    ("month", None),
    ("Mon", "MMM"),
    ("MON", None),
    ("mon", None),
    ("MM", "MM"),
    ("DDD", "DDD"),
    ("DD", "dd"),
    ("Day", None),  # PG blank-pads; use FMDay
    ("DAY", None),
    ("day", None),
    ("Dy", "E"),
    ("DY", None),
    ("dy", None),
    ("A.M.", None),
    ("P.M.", None),
    ("AM", "a"),
    ("PM", "a"),
    ("am", None),  # Java 'a' is uppercase; PG lowercase token
    ("pm", None),
    ("Q", "Q"),
    ("WW", None),  # PG week-of-year counts from Jan 1; Java w is locale
    ("IW", None),
    ("W", None),
    ("D", None),  # PG 1=Sunday; Java u is 1=Monday
    ("J", None),  # Julian day
    ("CC", None),
    ("TZ", None),
    ("tz", None),
    ("OF", None),
]

_SEPARATORS = set(" -/,.:;()[]")


# parse-direction overrides: Spark's PARSER is case-insensitive for
# names and meridians, so the case-variant tokens that REFUSE on the
# render side (PG renders 'MON' uppercase, which Java cannot) all map
# to the same parse pattern
_PARSE_OVERRIDES = [
    ("MONTH", "MMMM"), ("Month", "MMMM"), ("month", "MMMM"),
    ("MON", "MMM"), ("Mon", "MMM"), ("mon", "MMM"),
    ("AM", "a"), ("PM", "a"), ("am", "a"), ("pm", "a"),
]


def pg_datetime_format_to_spark(pattern: str, parse: bool = False) -> str:
    """Convert a PG TO_CHAR datetime template to a Spark date_format
    pattern, or raise ValueError for tokens Java cannot reproduce.
    parse=True applies the parse-direction name/meridian overrides
    (Spark parses names case-insensitively)."""
    out = []
    i, n = 0, len(pattern)
    while i < n:
        ch = pattern[i]
        if ch == '"':  # PG double-quoted literal → Java single-quoted
            j = pattern.find('"', i + 1)
            if j < 0:
                raise ValueError("TO_CHAR template: unterminated quoted literal")
            lit = pattern[i + 1 : j].replace("'", "''")
            out.append(f"'{lit}'")
            i = j + 1
            continue
        matched = False
        if parse:
            for tok, java in _PARSE_OVERRIDES:
                if pattern.startswith(tok, i):
                    out.append(java)
                    i += len(tok)
                    matched = True
                    break
            if matched:
                continue
        for tok, java in _TOKENS:
            if pattern.startswith(tok, i):
                if java is None:
                    raise ValueError(
                        f"TO_CHAR template token {tok!r} has no exact "
                        "Spark/Java rendering (PG padding, case, or "
                        "locale-week semantics differ) — supported "
                        "tokens: YYYY YY MM DD DDD HH24 HH12 HH MI SS "
                        "MS US FF1-FF6 AM PM Mon Dy Q, FM-prefixed "
                        "unpadded forms, and FMMonth/FMDay for the "
                        "unpadded names"
                    )
                out.append(java)
                i += len(tok)
                matched = True
                break
        if matched:
            continue
        if ch in _SEPARATORS:
            # '[' and ']' are java.time optional-section metacharacters
            # and silently vanish unless quoted (r9 review finding)
            out.append(java_quote(ch) if ch in "[]" else ch)
            i += 1
            continue
        if ch == "'":
            out.append("''")
            i += 1
            continue
        raise ValueError(
            f"TO_CHAR template: unsupported character {ch!r} at "
            f"position {i} (wrap literal text in double quotes)"
        )
    return "".join(out)


# ---------------------------------------------------------------------
# r9: full-corpus TO_CHAR compiler. The reference runs TO_CHAR through
# a runtime per-token formatter (util/format/postgresql/
# PostgresqlDateTimeFormatter.java, semantics pinned by
# PostgresqlDateTimeFormatterTest.java's 810 assertions; the corpus is
# core/src/test/resources/pg_to_char_queries.sql). Tokens Java patterns
# cannot render (blank-padded names, PG week numbers, Julian day,
# century, ISO-year family, roman months, lowercase meridians) compile
# here into composed JVM expressions; templates that ARE pure-Java
# still take the single date_format fast path in the registry dispatch.
# ---------------------------------------------------------------------

# ISO day-of-week / week-year formulas and the Java-literal quoting
# rules are shared across the three datetime-format compilers
from calcite_spark.functions.dt_compile import (  # noqa: E402
    ISO_DOW as _IDOW,
    ISO_YEAR as _ISOY,
    RenderComposer,
    java_quote,
)

_ROMAN = "'I','II','III','IV','V','VI','VII','VIII','IX','X','XI','XII'"

# token → Spark SQL expression template ({x} = input). Semantics and
# padding follow PostgresqlDateTimeFormatterTest exactly: MONTH/DAY
# blank-pad to 9; DDD/IDDD zero-pad 3; IW/CC zero-pad 2; WW/W/D/Q/J/
# SSSS unpadded; RM unpadded; AD/BC render the era of the actual year.
_EXPR_TOKENS: dict[str, str] = {
    "Y,YYY": (
        "concat(CAST(year({x}) DIV 1000 AS STRING), ',', "
        "lpad(CAST(year({x}) % 1000 AS STRING), 3, '0'))"
    ),
    "YYY": "lpad(CAST(year({x}) % 1000 AS STRING), 3, '0')",
    "Y": "CAST(year({x}) % 10 AS STRING)",
    "IYYY": f"lpad(CAST({_ISOY} AS STRING), 4, '0')",
    "IYY": f"lpad(CAST({_ISOY} % 1000 AS STRING), 3, '0')",
    "IY": f"lpad(CAST({_ISOY} % 100 AS STRING), 2, '0')",
    "IDDD": f"lpad(CAST((weekofyear({{x}}) - 1) * 7 + {_IDOW} AS STRING), 3, '0')",
    "ID": f"CAST({_IDOW} AS STRING)",
    "IW": "lpad(CAST(weekofyear({x}) AS STRING), 2, '0')",
    "I": f"CAST({_ISOY} % 10 AS STRING)",
    "MONTH": "rpad(upper(date_format({x}, 'MMMM')), 9, ' ')",
    "Month": "rpad(date_format({x}, 'MMMM'), 9, ' ')",
    "month": "rpad(lower(date_format({x}, 'MMMM')), 9, ' ')",
    "MON": "upper(date_format({x}, 'MMM'))",
    "mon": "lower(date_format({x}, 'MMM'))",
    "DAY": "rpad(upper(date_format({x}, 'EEEE')), 9, ' ')",
    "Day": "rpad(date_format({x}, 'EEEE'), 9, ' ')",
    "day": "rpad(lower(date_format({x}, 'EEEE')), 9, ' ')",
    "DY": "upper(date_format({x}, 'E'))",
    "dy": "lower(date_format({x}, 'E'))",
    "am": "lower(date_format({x}, 'a'))",
    "pm": "lower(date_format({x}, 'a'))",
    "A.M.": "IF(hour({x}) < 12, 'A.M.', 'P.M.')",
    "P.M.": "IF(hour({x}) < 12, 'A.M.', 'P.M.')",
    "a.m.": "IF(hour({x}) < 12, 'a.m.', 'p.m.')",
    "p.m.": "IF(hour({x}) < 12, 'a.m.', 'p.m.')",
    "AD": "IF(year({x}) >= 1, 'AD', 'BC')",
    "BC": "IF(year({x}) >= 1, 'AD', 'BC')",
    "ad": "IF(year({x}) >= 1, 'ad', 'bc')",
    "bc": "IF(year({x}) >= 1, 'ad', 'bc')",
    "A.D.": "IF(year({x}) >= 1, 'A.D.', 'B.C.')",
    "B.C.": "IF(year({x}) >= 1, 'A.D.', 'B.C.')",
    "a.d.": "IF(year({x}) >= 1, 'a.d.', 'b.c.')",
    "b.c.": "IF(year({x}) >= 1, 'a.d.', 'b.c.')",
    "SSSSS": "CAST(hour({x}) * 3600 + minute({x}) * 60 + second({x}) AS STRING)",
    "SSSS": "CAST(hour({x}) * 3600 + minute({x}) * 60 + second({x}) AS STRING)",
    "WW": "CAST((dayofyear({x}) - 1) DIV 7 + 1 AS STRING)",
    "W": "CAST((day({x}) - 1) DIV 7 + 1 AS STRING)",
    "D": "CAST(dayofweek(CAST({x} AS DATE)) AS STRING)",
    "CC": "lpad(CAST((year({x}) + 99) DIV 100 AS STRING), 2, '0')",
    "J": "CAST(datediff(CAST({x} AS DATE), DATE '2000-01-01') + 2451545 AS STRING)",
    "Q": "CAST(quarter({x}) AS STRING)",
    "RM": f"element_at(array({_ROMAN}), month({{x}}))",
    "rm": f"lower(element_at(array({_ROMAN}), month({{x}})))",
    # FM (no-fill) variants of the padded name/number tokens
    "FMMONTH": "upper(date_format({x}, 'MMMM'))",
    "FMmonth": "lower(date_format({x}, 'MMMM'))",
    "FMDAY": "upper(date_format({x}, 'EEEE'))",
    "FMday": "lower(date_format({x}, 'EEEE'))",
}

# longest-first over BOTH tables so e.g. IDDD wins over ID over I, and
# MONTH over MON over MM
_ALL_TOKENS = sorted(
    {t for t in _EXPR_TOKENS} | {t for t, j in _TOKENS if j is not None},
    key=len,
    reverse=True,
)
_JAVA = {t: j for t, j in _TOKENS if j is not None}

# numeric value of each token, for the TH/th ordinal suffix
# (PostgresqlDateTimeFormatterTest: '1001ST', '86399TH', '0TH' — the
# suffix derives from the RENDERED number, so YY uses year % 100)
_US_IN_SECOND = "(unix_micros(CAST({x} AS TIMESTAMP)) % 1000000)"
_NUMERIC_OF: dict[str, str] = {
    "YYYY": "year({x})",
    "YYY": "(year({x}) % 1000)",
    "YY": "(year({x}) % 100)",
    "Y": "(year({x}) % 10)",
    "IYYY": _ISOY,
    "IYY": f"({_ISOY} % 1000)",
    "IY": f"({_ISOY} % 100)",
    "I": f"({_ISOY} % 10)",
    "IW": "weekofyear({x})",
    "IDDD": f"((weekofyear({{x}}) - 1) * 7 + {_IDOW})",
    "ID": _IDOW,
    "MM": "month({x})",
    "DDD": "dayofyear({x})",
    "DD": "day({x})",
    "D": "dayofweek(CAST({x} AS DATE))",
    "HH24": "hour({x})",
    "HH12": "((hour({x}) + 11) % 12 + 1)",
    "HH": "((hour({x}) + 11) % 12 + 1)",
    "MI": "minute({x})",
    "SSSSS": "(hour({x}) * 3600 + minute({x}) * 60 + second({x}))",
    "SSSS": "(hour({x}) * 3600 + minute({x}) * 60 + second({x}))",
    "SS": "second({x})",
    "MS": f"({_US_IN_SECOND} DIV 1000)",
    "US": _US_IN_SECOND,
    "FF1": f"({_US_IN_SECOND} DIV 100000)",
    "FF2": f"({_US_IN_SECOND} DIV 10000)",
    "FF3": f"({_US_IN_SECOND} DIV 1000)",
    "FF4": f"({_US_IN_SECOND} DIV 100)",
    "FF5": f"({_US_IN_SECOND} DIV 10)",
    "FF6": _US_IN_SECOND,
    "W": "((day({x}) - 1) DIV 7 + 1)",
    "WW": "((dayofyear({x}) - 1) DIV 7 + 1)",
    "CC": "((year({x}) + 99) DIV 100)",
    "J": "(datediff(CAST({x} AS DATE), DATE '2000-01-01') + 2451545)",
    "Q": "quarter({x})",
}


def _ordinal_suffix(numeric: str, upper: bool) -> str:
    th, st, nd, rd = (
        ("'TH'", "'ST'", "'ND'", "'RD'") if upper else ("'th'", "'st'", "'nd'", "'rd'")
    )
    n = numeric
    return (
        f"CASE WHEN ({n}) % 100 BETWEEN 11 AND 13 THEN {th} "
        f"WHEN ({n}) % 10 = 1 THEN {st} "
        f"WHEN ({n}) % 10 = 2 THEN {nd} "
        f"WHEN ({n}) % 10 = 3 THEN {rd} ELSE {th} END"
    )


def pg_to_char_expr(x: str, template: str) -> str:
    """Compile a PG TO_CHAR datetime template into a composed Spark SQL
    expression: consecutive Java-renderable tokens/separators batch into
    date_format runs; the rest become per-token JVM expressions, all
    concat()ed. Raises ValueError for genuinely unsupported tokens
    (TZ/OF session-zone rendering, TH/th ordinal suffixes)."""
    comp = RenderComposer(x)
    started = False

    i, n = 0, len(template)
    while i < n:
        ch = template[i]
        if ch == '"':
            j = template.find('"', i + 1)
            if j < 0:
                raise ValueError("TO_CHAR template: unterminated quoted literal")
            comp.literal(template[i + 1 : j])
            started = True
            i = j + 1
            continue
        matched = False
        for tok in _ALL_TOKENS:
            if template.startswith(tok, i):
                if tok in _EXPR_TOKENS:
                    comp.expr(_EXPR_TOKENS[tok])
                else:
                    comp.java(_JAVA[tok])
                started = True
                i += len(tok)
                # TH/th ordinal suffix: computed from the token's
                # RENDERED numeric value ('1001ST', '0TH' — suffix
                # case follows the SUFFIX token's case, per the
                # reference formatter's pinned expectations)
                if template.startswith(("TH", "th"), i):
                    if tok not in _NUMERIC_OF:
                        raise ValueError(
                            f"TO_CHAR template: TH/th after {tok!r} — "
                            "ordinal suffixes apply to numeric tokens only"
                        )
                    comp.expr(
                        _ordinal_suffix(
                            _NUMERIC_OF[tok], template[i : i + 2] == "TH"
                        )
                    )
                    i += 2
                matched = True
                break
        if matched:
            continue
        if ch in _SEPARATORS:
            comp.literal(ch)
            started = True
            i += 1
            continue
        if ch == "'":
            comp.java("''")
            started = True
            i += 1
            continue
        raise ValueError(
            f"TO_CHAR template: unsupported token at position {i} "
            f"({template[i:i + 4]!r}) — session-zone tokens (TZ/OF) and "
            "ordinal suffixes (TH/th) have no plan-time lowering"
        )
    return comp.result()
