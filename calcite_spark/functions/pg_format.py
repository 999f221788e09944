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


def pg_datetime_format_to_spark(pattern: str) -> str:
    """Convert a PG TO_CHAR datetime template to a Spark date_format
    pattern, or raise ValueError for tokens Java cannot reproduce."""
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
            out.append(ch)
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
