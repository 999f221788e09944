"""SQL:2016 CAST ... FORMAT clause ≈ the reference's format-element
engine (sql/fun/SqlCastFunction + util/format/FormatElementEnum.java,
semantics spec core/src/test/resources/sql/cast-with-format.iq).

Spark has no FORMAT clause; the frontend lowers
  CAST(x AS TIMESTAMP FORMAT 'DD-YYYY-MM') -> to_timestamp(x, 'dd-yyyy-MM')
  CAST(ts AS VARCHAR  FORMAT 'YYYY/MM/DD') -> date_format(ts, 'yyyy/MM/dd')
by translating SQL/Oracle format elements into java.time patterns.

r9 upgrade (cast-with-format.iq parity):
  * NAME elements are CASE-SENSITIVE and each case renders its own way
    — 'DAY Day day DY Dy dy' renders "WEDNESDAY Wednesday wednesday
    WED Wed wed" (iq:1195-1224, unpadded, unlike PG TO_CHAR's 9-char
    blank pad). The old case-insensitive matcher rendered "Wednesday"
    for all six — a silent wrong value.
  * Render-direction tokens Java patterns cannot produce (upper/lower
    names, SSSSS seconds-past-midnight, dotted meridians, D, YYY,
    ISO-week family) compile into composed JVM expressions, same
    technique as pg_format.pg_to_char_expr.
  * Month-name PARSE is case-insensitive in the reference (iq:413-465
    parses 'APRIL', 'march') — and Spark's parser is built with
    parseCaseInsensitive, so MMMM/MMM match any case natively; no
    input rewriting is needed (verified in the r9 review).
  * FX (exact matching) is a no-op — java.time is already strict; FM
    maps the NEXT numeric element to its unpadded single-letter form.

Refuse-over-wrong still holds for the rest: weekday-name PARSE (Spark
rejects E letters in parse), TZH/TZM split offsets, RR century
inference, W/WW (the reference's own iq keeps their scenarios behind
the disabled CALCITE-6375 flag and the Sunday-first semantics are
unpinned), and lowercase-meridian parse all raise instead of
approximating.
"""

from __future__ import annotations


class UnsupportedFormatElement(Exception):
    """A FORMAT element with no exact java.time equivalent."""


from calcite_spark.functions.dt_compile import (  # noqa: E402
    ISO_DOW as _IDOW,
    ISO_YEAR as _ISOY,
    RenderComposer,
)

# CASE-SENSITIVE name/meridian elements, matched before the numeric
# table. Each entry: (java_render, java_parse, expr_render) — java_*
# None means that direction needs expr_render (render) or is refused
# (parse). Names render UNPADDED (FormatElementEnum semantics;
# iq:1195-1224) — PG TO_CHAR's 9-char blank pad does NOT apply here.
_NAME_ELEMENTS: dict[str, tuple] = {
    "MONTH": (None, "MMMM", "upper(date_format({x}, 'MMMM'))"),
    "Month": ("MMMM", "MMMM", None),
    "month": (None, "MMMM", "lower(date_format({x}, 'MMMM'))"),
    "MON": (None, "MMM", "upper(date_format({x}, 'MMM'))"),
    "Mon": ("MMM", "MMM", None),
    "mon": (None, "MMM", "lower(date_format({x}, 'MMM'))"),
    "DAY": (None, None, "upper(date_format({x}, 'EEEE'))"),
    "Day": ("EEEE", None, None),
    "day": (None, None, "lower(date_format({x}, 'EEEE'))"),
    "DY": (None, None, "upper(date_format({x}, 'E'))"),
    "Dy": ("E", None, None),
    "dy": (None, None, "lower(date_format({x}, 'E'))"),
    "A.M.": (None, None, "IF(hour({x}) < 12, 'A.M.', 'P.M.')"),
    "P.M.": (None, None, "IF(hour({x}) < 12, 'A.M.', 'P.M.')"),
    "a.m.": (None, None, "IF(hour({x}) < 12, 'a.m.', 'p.m.')"),
    "p.m.": (None, None, "IF(hour({x}) < 12, 'a.m.', 'p.m.')"),
    "AM": ("a", "a", None),
    "PM": ("a", "a", None),
    "am": (None, None, "lower(date_format({x}, 'a'))"),
    "pm": (None, None, "lower(date_format({x}, 'a'))"),
}
# case-INSENSITIVE elements (matched on the uppercased template —
# 'yyyy-mm-dd sssss' is valid in the iq). Entries as above; FM column
# is the unpadded java form the FM modifier switches to.
_ELEMENTS: list[tuple] = [
    # el, java_render, java_parse, expr_render, fm_java
    ("YYYY", "yyyy", "yyyy", None, "y"),
    ("YYY", None, None, "lpad(CAST(year({x}) % 1000 AS STRING), 3, '0')", None),
    ("YY", "yy", "yy", None, None),
    ("Y", None, None, "CAST(year({x}) % 10 AS STRING)", None),
    ("RRRR", "yyyy", "yyyy", None, None),
    ("RR", "yy", None, None, None),  # parse = Oracle century inference
    ("IYYY", None, None, f"lpad(CAST({_ISOY} AS STRING), 4, '0')", None),
    ("IYY", None, None, f"lpad(CAST({_ISOY} % 1000 AS STRING), 3, '0')", None),
    ("IY", None, None, f"lpad(CAST({_ISOY} % 100 AS STRING), 2, '0')", None),
    ("IW", None, None, "lpad(CAST(weekofyear({x}) AS STRING), 2, '0')", None),
    # ID zero-pads to 2 here (iq:2081-2084 pins '0001/01/01'); the PG
    # model's ID is a single digit — correctly divergent per model
    ("ID", None, None, f"lpad(CAST({_IDOW} AS STRING), 2, '0')", None),
    ("I", None, None, f"CAST({_ISOY} % 10 AS STRING)", None),
    ("MM", "MM", "MM", None, "M"),
    ("DDD", "DDD", "DDD", None, None),
    ("DD", "dd", "dd", None, "d"),
    ("D", None, None, "CAST(dayofweek(CAST({x} AS DATE)) AS STRING)", None),
    ("HH24", "HH", "HH", None, "H"),
    ("HH12", "hh", "hh", None, "h"),
    ("HH", "hh", "hh", None, "h"),
    ("MI", "mm", "mm", None, "m"),
    ("SSSSS", None, None,
     "CAST(hour({x}) * 3600 + minute({x}) * 60 + second({x}) AS STRING)", None),
    ("SS", "ss", "ss", None, "s"),
    ("FF1", "S", "S", None, None),
    ("FF2", "SS", "SS", None, None),
    ("FF3", "SSS", "SSS", None, None),
    ("FF4", "SSSS", "SSSS", None, None),
    ("FF5", "SSSSS", "SSSSS", None, None),
    ("FF6", "SSSSSS", "SSSSSS", None, None),
    ("FF7", "SSSSSSS", "SSSSSSS", None, None),
    ("FF8", "SSSSSSSS", "SSSSSSSS", None, None),
    ("FF9", "SSSSSSSSS", "SSSSSSSSS", None, None),
    ("FF", "SSSSSS", "SSSSSS", None, None),
    ("TZH", None, None, None, None),  # split zone offsets: refused
    ("TZM", None, None, None, None),
    ("TZD", None, None, None, None),
    # Q parses nowhere: Spark rejects the letter in parse patterns
    ("Q", "Q", None, None, None),
    ("WW", None, None, None, None),  # Sunday-first semantics unpinned
    ("W", None, None, None, None),   # (reference iq keeps both disabled)
]

_SEPARATORS = set("-/.,;: ")


def _tokenize(fmt: str):
    """Yield ('el', name_or_upper_element, fm_active) and
    ('lit', text) tokens. FX is dropped (java.time is already exact);
    FM arms the next element."""
    i, n = 0, len(fmt)
    fm = False
    while i < n:
        ch = fmt[i]
        if ch in _SEPARATORS:
            yield ("lit", ch)
            i += 1
            continue
        if ch == '"':
            j = fmt.find('"', i + 1)
            if j < 0:
                raise UnsupportedFormatElement(f"unterminated quote in {fmt!r}")
            yield ("lit", fmt[i + 1 : j])
            i = j + 1
            continue
        matched = False
        for el in _NAME_ELEMENTS:
            if fmt.startswith(el, i):
                yield ("el", el, fm)
                fm = False
                i += len(el)
                matched = True
                break
        if matched:
            continue
        up = fmt.upper()
        if up.startswith("FX", i):
            i += 2
            continue
        if up.startswith("FM", i):
            fm = True
            i += 2
            continue
        for el, *_ in _ELEMENTS:
            if up.startswith(el, i):
                yield ("el", el, fm)
                fm = False
                i += len(el)
                matched = True
                break
        if matched:
            continue
        if ch in ("T", "Z"):
            # common ISO-8601 literals (cast-with-format.iq:212)
            yield ("lit", ch)
            i += 1
            continue
        raise UnsupportedFormatElement(f"unrecognized FORMAT element at {fmt[i:]!r}")


_CI = {el: (jr, jp, er, fmj) for el, jr, jp, er, fmj in _ELEMENTS}


def _lookup(el: str):
    """-> (java_render, java_parse, expr_render, fm_java)."""
    if el in _NAME_ELEMENTS:
        jr, jp, er = _NAME_ELEMENTS[el]
        return jr, jp, er, None
    return _CI[el]


def _java_lit(text: str) -> str:
    # always pattern-quoted (even pure separators arrive here only from
    # quoted "literal" spans or the T/Z shorthand, where quoting is
    # both safe and bracket-proof)
    return "'" + text.replace("'", "''") + "'" if text else ""


def sql_format_to_spark(fmt: str) -> str:
    """Translate a FORMAT clause string into a single Spark datetime
    PARSE pattern (the string→datetime direction). Raises
    UnsupportedFormatElement for elements Spark cannot parse."""
    out = []
    for tok in _tokenize(fmt):
        if tok[0] == "lit":
            out.append(tok[1] if tok[1] in _SEPARATORS else _java_lit(tok[1]))
            continue
        _, el, fm = tok
        jr, jp, er, fmj = _lookup(el)
        if jp is None:
            raise UnsupportedFormatElement(
                f"FORMAT element {el!r} has no exact Spark parse pattern "
                "(refused rather than approximated)"
            )
        out.append(fmj if fm and fmj else jp)
    return "".join(out)


_TO_STRING_TYPES = {"VARCHAR", "CHAR", "STRING", "TEXT"}
_TO_DATETIME = {"TIMESTAMP": "to_timestamp", "DATE": "to_date"}


def _render_expr(expr: str, fmt: str) -> str:
    """datetime→string: compose date_format runs + expression tokens."""
    comp = RenderComposer(expr)
    for tok in _tokenize(fmt):
        if tok[0] == "lit":
            comp.literal(tok[1])
            continue
        _, el, fm = tok
        jr, jp, er, fmj = _lookup(el)
        if fm and fmj:
            comp.java(fmj)
        elif jr is not None:
            comp.java(jr)
        elif er is not None:
            comp.expr(er)
        else:
            raise UnsupportedFormatElement(
                f"FORMAT element {el!r} has no exact Spark rendering "
                "(refused rather than approximated)"
            )
    return comp.result()


def lower_cast_format(expr: str, target_type: str, fmt: str) -> str:
    """CAST(expr AS target FORMAT fmt) -> Spark SQL. Datetime targets
    parse strings (Spark's parser is natively case-insensitive for
    month names, matching the reference's month_name scenarios);
    string targets render datetimes; anything else (numeric format
    models '999V99' etc.) is refused."""
    t = target_type.strip().upper().split("(")[0]
    if t in _TO_DATETIME:
        pattern = sql_format_to_spark(fmt)
        lit = pattern.replace("'", "''")
        return f"{_TO_DATETIME[t]}({expr}, '{lit}')"
    if t in _TO_STRING_TYPES:
        return _render_expr(expr, fmt)
    raise UnsupportedFormatElement(
        f"CAST FORMAT to {target_type!r} not supported (datetime/string only)"
    )
