"""Shared machinery for the plan-time datetime-format compilers
(pg_format.py TO_CHAR, bq_format.py %-elements, format_clause.py CAST
FORMAT): the ISO-week expression formulas, Java-pattern literal
quoting, parse-pattern legality, and the render composer that batches
consecutive Java-renderable fragments into date_format runs.

Factored out in the r9 review — the three modules had drifted into
triplicated copies of _IDOW/_ISOY and the flush/concat loop, and a
bracket-quoting bug (see java_quote) had to be fixed in one place.
"""

from __future__ import annotations

# ISO day-of-week (Mon=1..Sun=7) and ISO week-year (the year of the
# week's Thursday) over Spark's dayofweek (Sun=1..Sat=7); {x} = input
ISO_DOW = "((dayofweek(CAST({x} AS DATE)) + 5) % 7 + 1)"
ISO_YEAR = (
    "year(date_add(CAST({x} AS DATE), "
    "4 - ((dayofweek(CAST({x} AS DATE)) + 5) % 7 + 1)))"
)

# java.time pattern metacharacters beyond letters: '[' ']' start/end
# optional sections, '{' '}' '#' are reserved, ' escapes. Passing any
# of them raw into a pattern silently drops them ([]) or throws at
# runtime (#) — they must be quoted like alphabetic literal text.
_JAVA_RESERVED = set("[]{}#'")


def java_quote(text: str) -> str:
    """Quote literal text for inclusion in a Java datetime pattern.
    Pure separators pass through; anything alphabetic or reserved is
    wrapped in pattern quotes."""
    if not text:
        return ""
    if any(c.isalpha() or c in _JAVA_RESERVED for c in text):
        return "'" + text.replace("'", "''") + "'"
    return text


# pattern letters Spark accepts when FORMATTING but rejects when
# PARSING (weekday-name E, quarter Q, zone-name z, era G): emitting
# them in a parse pattern trades the promised plan-time refusal for an
# opaque runtime DATETIME_PATTERN_RECOGNITION error
PARSE_BANNED_LETTERS = set("EQzG")


def check_parse_pattern(pattern: str, origin: str) -> str:
    """Raise ValueError if a converted Java pattern contains letters
    Spark's parser rejects (quoted literal sections are exempt)."""
    in_quote = False
    for ch in pattern:
        if ch == "'":
            in_quote = not in_quote
        elif not in_quote and ch in PARSE_BANNED_LETTERS:
            raise ValueError(
                f"{origin}: element mapping to Java pattern letter "
                f"{ch!r} is format-only — Spark rejects it in parse "
                "patterns (weekday names, quarters, zone names)"
            )
    return pattern


class RenderComposer:
    """Accumulates Java-pattern fragments and composed SQL expressions,
    emitting date_format runs for consecutive Java content and a final
    concat() when expressions interleave."""

    def __init__(self, x: str):
        self.x = x
        self.frags: list[str] = []
        self.buf: list[str] = []

    def java(self, pattern_fragment: str) -> None:
        self.buf.append(pattern_fragment)

    def literal(self, text: str) -> None:
        self.buf.append(java_quote(text))

    def expr(self, sql_template: str) -> None:
        self._flush()
        self.frags.append(sql_template.replace("{x}", self.x))

    def _flush(self) -> None:
        if self.buf:
            pat = "".join(self.buf).replace("'", "''")
            self.frags.append(f"date_format({self.x}, '{pat}')")
            self.buf.clear()

    def result(self) -> str:
        self._flush()
        if not self.frags:
            return "''"
        if len(self.frags) == 1:
            return self.frags[0]
        return f"concat({', '.join(self.frags)})"
