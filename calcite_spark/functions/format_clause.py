"""SQL:2016 CAST ... FORMAT clause ≈ the reference's format-element
engine (sql/fun/SqlCastFunction + util/format/FormatElementEnum.java,
semantics spec core/src/test/resources/sql/cast-with-format.iq).

Spark has no FORMAT clause; the frontend lowers
  CAST(x AS TIMESTAMP FORMAT 'DD-YYYY-MM') -> to_timestamp(x, 'dd-yyyy-MM')
  CAST(ts AS VARCHAR  FORMAT 'YYYY/MM/DD') -> date_format(ts, 'yyyy/MM/dd')
by translating SQL/Oracle format elements into java.time patterns —
pure JVM datetime functions, no Python anywhere.

Refuse-over-wrong: elements whose semantics Spark's pattern language
cannot reproduce exactly (FX, TZH/TZM offsets split across the string,
RR 2-digit century inference, spelled-out numbers) raise instead of
emitting an approximation. The iq's separator-insensitive parse
("--2017----05-01-" vs '-YYYY--MM---DD---') is Oracle leniency that
java.time does not offer; strict-separator inputs behave identically.
"""

from __future__ import annotations


class UnsupportedFormatElement(Exception):
    """A FORMAT element with no exact java.time equivalent."""


# SQL/Oracle element -> java.time pattern. Ordered longest-first so the
# greedy tokenizer matches MONTH before MON before MM.
_ELEMENTS = [
    ("YYYY", "yyyy"),
    ("YYY", None),  # 3-digit year: no java.time form
    ("YY", "yy"),
    ("RRRR", "yyyy"),
    ("RR", None),  # Oracle century-inference rules differ from yy
    ("MONTH", "MMMM"),
    ("MON", "MMM"),
    ("MM", "MM"),
    ("DDD", "DDD"),
    ("DD", "dd"),
    ("DY", "EEE"),
    ("DAY", "EEEE"),
    ("D", None),  # Oracle day-of-week 1-7 locale-dependent
    ("HH24", "HH"),
    ("HH12", "hh"),
    ("HH", "hh"),
    ("MI", "mm"),
    ("SSSSS", None),  # seconds-past-midnight: no single pattern letter
    ("SS", "ss"),
    ("FF1", "S"),
    ("FF2", "SS"),
    ("FF3", "SSS"),
    ("FF4", "SSSS"),
    ("FF5", "SSSSS"),
    ("FF6", "SSSSSS"),
    ("FF7", "SSSSSSS"),
    ("FF8", "SSSSSSSS"),
    ("FF9", "SSSSSSSSS"),
    ("FF", "SSSSSS"),
    ("A.M.", None),  # dotted meridian renders 'A.M.' — no pattern form
    ("P.M.", None),
    ("AM", "a"),
    ("PM", "a"),
    ("TZH", None),  # offset split into separate H/M elements
    ("TZM", None),
    ("TZD", None),
    ("FX", None),  # exact-match modifier — java.time is already strict
    ("Q", "Q"),
    ("WW", None),  # Oracle week-of-year (1st day anchored) != 'ww'
    ("W", None),
]

_SEPARATORS = set("-/.,;: ")


def sql_format_to_spark(fmt: str) -> str:
    """Translate a FORMAT clause string into a Spark datetime pattern.
    Raises UnsupportedFormatElement on anything outside the supported
    element set (including bare literal letters, which Oracle would
    require double-quoting anyway)."""
    out = []
    i = 0
    n = len(fmt)
    while i < n:
        ch = fmt[i]
        if ch in _SEPARATORS:
            out.append(ch)
            i += 1
            continue
        if ch == '"':  # quoted literal text -> java.time 'literal'
            j = fmt.find('"', i + 1)
            if j < 0:
                raise UnsupportedFormatElement(f"unterminated quote in {fmt!r}")
            lit = fmt[i + 1 : j].replace("'", "''")
            out.append(f"'{lit}'")
            i = j + 1
            continue
        for el, repl in _ELEMENTS:
            if fmt.upper().startswith(el, i):
                if repl is None:
                    raise UnsupportedFormatElement(
                        f"FORMAT element {el!r} has no exact Spark pattern "
                        f"(refused rather than approximated)"
                    )
                out.append(repl)
                i += len(el)
                break
        else:
            if ch == "T" or ch == "Z":
                # common ISO-8601 literals (cast-with-format.iq:212)
                out.append(f"'{ch}'")
                i += 1
            else:
                raise UnsupportedFormatElement(
                    f"unrecognized FORMAT element at {fmt[i:]!r}"
                )
    return "".join(out)


_TO_STRING_TYPES = {"VARCHAR", "CHAR", "STRING", "TEXT"}
_TO_DATETIME = {"TIMESTAMP": "to_timestamp", "DATE": "to_date"}


def lower_cast_format(expr: str, target_type: str, fmt: str) -> str:
    """CAST(expr AS target FORMAT fmt) -> Spark SQL. Datetime targets
    parse strings; string targets render datetimes; anything else
    (numeric format models '999V99' etc.) is refused."""
    t = target_type.strip().upper().split("(")[0]
    pattern = sql_format_to_spark(fmt)
    # the pattern itself becomes a SQL string literal: embedded quotes
    # (java.time 'literal' text) must double for the SQL parser
    lit = pattern.replace("'", "''")
    if t in _TO_DATETIME:
        return f"{_TO_DATETIME[t]}({expr}, '{lit}')"
    if t in _TO_STRING_TYPES:
        return f"date_format({expr}, '{lit}')"
    raise UnsupportedFormatElement(
        f"CAST FORMAT to {target_type!r} not supported (datetime/string only)"
    )
