"""BigQuery %-style format elements → Spark lowering for
FORMAT_DATE / FORMAT_DATETIME / FORMAT_TIMESTAMP and PARSE_DATE /
PARSE_DATETIME / PARSE_TIMESTAMP ≈ the reference's BIG_QUERY format
model (util/format/FormatModels.java:100-170 maps each %-code to a
FormatElementEnum; babel big-query.iq:4289-4490 pins values).

Why this exists: the old registry templates passed the BQ format
string straight to Spark's date_format/to_date, which read JAVA
pattern letters — '%m' would format the MINUTE ('m') prefixed by a
literal '%', and '%Y' would die on Spark's banned week-based-year
letter. Same silent-wrong-value class as the PG TO_CHAR/TO_DATE
templates, fixed the same way: plan-time conversion of LITERAL format
strings, loud refusal otherwise.

Format path: %-codes that Java patterns render batch into date_format
runs; ISO-year/week codes Java cannot render (%G %g %u %V %W) compile
into composed JVM expressions (same technique as pg_format.
pg_to_char_expr). Parse path: only Java-parseable codes are accepted —
an expression cannot run backwards, so %G-family parsing refuses.

Documented divergences: weekday-name parsing (%A/%a) refuses — Spark's
parser rejects the E pattern letters outright (month names parse fine,
and case-insensitively, matching BQ); %Z renders the session zone
name. %s (epoch seconds) and %C are session-zone/century edge codes
the reference's model also omits — refused.
"""

from __future__ import annotations

# %-code → Java date pattern (safe for BOTH format and parse directions
# unless listed in _FORMAT_ONLY_JAVA). Mirrors FormatModels.java's
# BIG_QUERY map through each element's Java rendering.
_JAVA_CODES: dict[str, str] = {
    "%A": "EEEE",  # full weekday name (Day)
    "%a": "EEE",  # abbreviated weekday name (Dy)
    "%B": "MMMM",  # full month name (Month)
    "%b": "MMM",  # abbreviated month name (Mon)
    "%c": "EEE MMM dd HH:mm:ss yyyy",  # composite (Dy Mon DD HH24:MI:SS YYYY)
    "%d": "dd",
    "%e": "d",  # day of month, no padding (E)
    "%E1S": "ss.S",
    "%E2S": "ss.SS",
    "%E3S": "ss.SSS",
    "%E4S": "ss.SSSS",
    "%E5S": "ss.SSSSS",
    "%E*S": "ss.SSSSSS",
    "%F": "yyyy-MM-dd",  # composite (YYYY-MM-DD)
    "%H": "HH",
    "%I": "hh",
    "%j": "DDD",  # day of year
    "%M": "mm",  # MINUTE (BQ %M) — the exact code the old passthrough inverted
    "%m": "MM",  # month
    "%p": "a",
    "%Q": "Q",  # quarter
    "%R": "HH:mm",
    "%S": "ss",
    "%T": "HH:mm:ss",
    "%x": "MM/dd/yy",  # US date representation
    "%X": "HH:mm:ss",  # time representation (BQ docs; model omits it)
    "%Y": "yyyy",
    "%y": "yy",
    "%Z": "z",  # time zone name — format-only
}
# format-only Java codes: Spark's parser rejects weekday-name letters
# (E*) and quarter 'Q' outright — the reference PARSES "%A Thursday";
# we refuse loudly rather than emit a pattern Spark will reject at
# runtime — and %Z zone names are render-only
_FORMAT_ONLY_JAVA = {"%Z", "%A", "%a", "%c", "%Q"}

# format-only composed expressions ({x} = input) — ISO-year family and
# week numbers Spark's Java patterns cannot render ('Y'/'w'/'u' banned)
from calcite_spark.functions.dt_compile import (  # noqa: E402
    ISO_DOW as _IDOW,
    ISO_YEAR as _ISOY,
    RenderComposer,
    check_parse_pattern,
    java_quote as _java_quote,
)
_EXPR_CODES: dict[str, str] = {
    "%G": f"lpad(CAST({_ISOY} AS STRING), 4, '0')",
    "%g": f"lpad(CAST({_ISOY} % 100 AS STRING), 2, '0')",
    "%u": f"CAST({_IDOW} AS STRING)",
    "%V": "lpad(CAST(weekofyear({x}) AS STRING), 2, '0')",
    # %W: Monday-first week of year 00-53 (strftime/BQ semantics; the
    # first Monday starts week 01, days before it are week 00)
    "%W": f"lpad(CAST((dayofyear({{x}}) - {_IDOW} + 7) DIV 7 AS STRING), 2, '0')",
}

# literal escapes
_LITERAL_CODES = {"%n": "\n", "%t": "\t", "%%": "%"}

# longest-first matching so %E3S wins over %E... and %% over %
_ALL_CODES = sorted(
    [*(_JAVA_CODES), *(_EXPR_CODES), *(_LITERAL_CODES)], key=len, reverse=True
)


def _tokenize(fmt: str):
    """Yield ('java', pattern) / ('expr', template) / ('lit', text)."""
    i, n = 0, len(fmt)
    while i < n:
        if fmt[i] == "%":
            for code in _ALL_CODES:
                if fmt.startswith(code, i):
                    if code in _LITERAL_CODES:
                        yield ("lit", _LITERAL_CODES[code])
                    elif code in _EXPR_CODES:
                        yield ("expr", _EXPR_CODES[code])
                    else:
                        yield ("java", _JAVA_CODES[code], code)
                    i += len(code)
                    break
            else:
                raise ValueError(
                    f"BigQuery format element {fmt[i:i + 4]!r} has no "
                    "Spark lowering (the reference's BIG_QUERY format "
                    "model, FormatModels.java:100-170, defines the "
                    "supported set; %s/%C/%U are also outside it)"
                )
        else:
            j = i
            while j < n and fmt[j] != "%":
                j += 1
            yield ("lit", fmt[i:j])
            i = j
            continue


def bq_format_expr(x: str, fmt: str) -> str:
    """FORMAT_DATE/DATETIME/TIMESTAMP: compile the %-format into a
    Spark expression (date_format runs + composed fragments)."""
    comp = RenderComposer(x)
    for tok in _tokenize(fmt):
        if tok[0] == "java":
            comp.java(tok[1])
        elif tok[0] == "lit":
            comp.literal(tok[1])
        else:
            comp.expr(tok[1])
    return comp.result()


def bq_parse_pattern(fmt: str) -> str:
    """PARSE_DATE/DATETIME/TIMESTAMP: convert the %-format to a Java
    PARSE pattern, refusing codes that only exist as rendering
    expressions (an expression cannot run backwards)."""
    out: list[str] = []
    for tok in _tokenize(fmt):
        if tok[0] == "expr" or (tok[0] == "java" and tok[2] in _FORMAT_ONLY_JAVA):
            raise ValueError(
                "BigQuery parse format: element has no Spark parse "
                f"lowering in {fmt!r} (ISO-year/week codes %G %g %u %V "
                "%W are render-only expressions; weekday names %A %a %c "
                "and zone-name %Z are unparseable by Spark's formatter)"
            )
        out.append(tok[1] if tok[0] == "java" else _java_quote(tok[1]))
    # defense in depth: no format-only pattern letter may survive into
    # a parse pattern (quoted literal sections are exempt)
    return check_parse_pattern("".join(out), "BigQuery parse format")
