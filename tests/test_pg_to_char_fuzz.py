"""Property fuzz for the r9 TO_CHAR compiler (pg_format.
pg_to_char_expr): random token sequences over random timestamps,
compared against an INDEPENDENT Python twin built on datetime/
isocalendar (a different substrate than the compiler's SQL formulas —
the ISO-year family, Julian day, and week numbers are re-derived here
from first principles, so a shared-formula bug cannot hide).

Timestamps are drawn to stress the known boundary zones: ISO year-end
(Dec 28 - Jan 4), century starts, leap days, midnight/noon meridian
flips. Deterministic seed — no wall-clock dependence.
"""

from __future__ import annotations

import datetime as dt
import random

from calcite_spark.functions.registry import translate

_MONTHS = [
    "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December",
]
_DAYS = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday"]
_ROMAN = ["I", "II", "III", "IV", "V", "VI", "VII", "VIII", "IX", "X", "XI", "XII"]


def _twin(token: str, t: dt.datetime) -> str:
    """PG TO_CHAR semantics per token, implemented from datetime."""
    iso = t.isocalendar()  # (ISO year, ISO week, ISO weekday)
    if token == "YYYY":
        return str(t.year).zfill(4)
    if token == "Y,YYY":
        return f"{t.year // 1000},{t.year % 1000:03d}"
    if token == "YYY":
        return f"{t.year % 1000:03d}"
    if token == "YY":
        return f"{t.year % 100:02d}"
    if token == "Y":
        return str(t.year % 10)
    if token == "IYYY":
        return str(iso[0]).zfill(4)
    if token == "IYY":
        return f"{iso[0] % 1000:03d}"
    if token == "IY":
        return f"{iso[0] % 100:02d}"
    if token == "I":
        return str(iso[0] % 10)
    if token == "IW":
        return f"{iso[1]:02d}"
    if token == "IDDD":
        return f"{(iso[1] - 1) * 7 + iso[2]:03d}"
    if token == "ID":
        return str(iso[2])
    if token == "MM":
        return f"{t.month:02d}"
    if token == "MONTH":
        return _MONTHS[t.month - 1].upper().ljust(9)
    if token == "Month":
        return _MONTHS[t.month - 1].ljust(9)
    if token == "month":
        return _MONTHS[t.month - 1].lower().ljust(9)
    if token == "MON":
        return _MONTHS[t.month - 1][:3].upper()
    if token == "Mon":
        return _MONTHS[t.month - 1][:3]
    if token == "mon":
        return _MONTHS[t.month - 1][:3].lower()
    if token == "DAY":
        return _DAYS[t.weekday()].upper().ljust(9)
    if token == "Day":
        return _DAYS[t.weekday()].ljust(9)
    if token == "day":
        return _DAYS[t.weekday()].lower().ljust(9)
    if token == "DY":
        return _DAYS[t.weekday()][:3].upper()
    if token == "Dy":
        return _DAYS[t.weekday()][:3]
    if token == "dy":
        return _DAYS[t.weekday()][:3].lower()
    if token == "DDD":
        return f"{t.timetuple().tm_yday:03d}"
    if token == "DD":
        return f"{t.day:02d}"
    if token == "D":  # PG: Sunday=1 .. Saturday=7
        return str(t.weekday() % 7 + 2 if t.weekday() < 6 else 1)
    if token == "W":
        return str((t.day - 1) // 7 + 1)
    if token == "WW":
        return str((t.timetuple().tm_yday - 1) // 7 + 1)
    if token == "CC":
        return f"{(t.year + 99) // 100:02d}"
    if token == "J":  # Julian day: days since the Julian epoch
        return str(t.toordinal() + 1721425)
    if token == "Q":
        return str((t.month - 1) // 3 + 1)
    if token == "RM":
        return _ROMAN[t.month - 1]
    if token == "rm":
        return _ROMAN[t.month - 1].lower()
    if token == "HH24":
        return f"{t.hour:02d}"
    if token in ("HH12", "HH"):
        return f"{(t.hour - 1) % 12 + 1:02d}"
    if token == "MI":
        return f"{t.minute:02d}"
    if token == "SS":
        return f"{t.second:02d}"
    if token in ("SSSS", "SSSSS"):
        return str(t.hour * 3600 + t.minute * 60 + t.second)
    if token == "MS":
        return f"{t.microsecond // 1000:03d}"
    if token == "US":
        return f"{t.microsecond:06d}"
    if token in ("AM", "PM"):
        return "AM" if t.hour < 12 else "PM"
    if token in ("am", "pm"):
        return "am" if t.hour < 12 else "pm"
    if token in ("A.M.", "P.M."):
        return "A.M." if t.hour < 12 else "P.M."
    if token in ("a.m.", "p.m."):
        return "a.m." if t.hour < 12 else "p.m."
    if token in ("AD", "BC"):
        return "AD"
    if token in ("ad", "bc"):
        return "ad"
    raise AssertionError(token)


_TOKENS = [
    "YYYY", "Y,YYY", "YYY", "YY", "Y", "IYYY", "IYY", "IY", "I", "IW",
    "IDDD", "ID", "MM", "MONTH", "Month", "month", "MON", "Mon", "mon",
    "DAY", "Day", "day", "DY", "Dy", "dy", "DDD", "DD", "D", "W", "WW",
    "CC", "J", "Q", "RM", "rm", "HH24", "HH12", "MI", "SS", "SSSS",
    "MS", "US", "AM", "pm", "A.M.", "a.m.", "AD", "bc",
]

# boundary-zone timestamps + uniform random fill
_BOUNDARY = [
    dt.datetime(2019, 12, 28, 23, 59, 59, 999000),
    dt.datetime(2019, 12, 29, 0, 0, 0, 0),
    dt.datetime(2019, 12, 30, 12, 0, 0, 500000),
    dt.datetime(2020, 1, 1, 0, 0, 1, 1000),
    dt.datetime(2020, 1, 4, 11, 59, 59, 0),
    dt.datetime(2021, 1, 3, 12, 0, 0, 0),   # ISO 2020-W53
    dt.datetime(2020, 2, 29, 6, 30, 15, 250000),  # leap day
    dt.datetime(2000, 1, 1, 0, 0, 0, 0),    # century + J anchor zone
    dt.datetime(2100, 12, 31, 23, 0, 0, 0),
    dt.datetime(1, 1, 1, 0, 0, 0, 0),       # proleptic minimum
    dt.datetime(1999, 12, 31, 12, 0, 0, 0),
    dt.datetime(2024, 9, 30, 23, 59, 0, 0), # September (9-char month)
]


def test_to_char_fuzz_vs_python_twin(spark):
    rng = random.Random(20260815)
    stamps = list(_BOUNDARY)
    for _ in range(18):
        stamps.append(
            dt.datetime(
                rng.randint(1900, 2199), rng.randint(1, 12), rng.randint(1, 28),
                rng.randint(0, 23), rng.randint(0, 59), rng.randint(0, 59),
                rng.choice([0, 1000, 987000, 500500]),
            )
        )
    exprs, wants = [], []
    for t in stamps:
        toks = rng.sample(_TOKENS, rng.randint(1, 4))
        template = " ".join(toks)
        want = " ".join(_twin(tok, t) for tok in toks)
        lit = (
            f"TIMESTAMP '{t.year:04d}-{t.month:02d}-{t.day:02d} "
            f"{t.hour:02d}:{t.minute:02d}:{t.second:02d}.{t.microsecond:06d}'"
        )
        exprs.append(translate("TO_CHAR", lit, f"'{template}'"))
        wants.append((template, t, want))
    sql = "SELECT " + ", ".join(f"{e} AS c{i}" for i, e in enumerate(exprs))
    row = spark.sql(sql).collect()[0]
    for i, (template, t, want) in enumerate(wants):
        assert row[i] == want, (template, t, row[i], want)
