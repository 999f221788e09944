"""PG TO_TIMESTAMP/TO_DATE parse-template compiler (r14).

≈ the parse direction of Calcite's PostgresqlDateTimeFormatter
(util/format/PostgresqlDateTimeFormatter.java) as pinned by
babel/src/test/resources/sql/postgresql.iq:529-1250 — the reference's
own expected values are the contract implemented here:

  * missing date fields default to 0001-01-01 (NOT Spark's 1970 epoch;
    year 0 clamps to 1 — '0000-01-01' parses to 0001-01-01);
  * short year forms complete toward the present: YY/Y: <70 -> 2000+v,
    else 1900+v; YYY: <520 -> 2000+v, else 1000+v (both equal the
    "nearest to 2020" rule); CC alone -> (cc-1)*100+1; CC + YY ->
    (cc-1)*100 + yy;
  * ISO fields (IYYY/IW/ID/IDDD, day NAMES with DAY/DY) build the date
    from the ISO week calendar: Monday of week 1 is the week of Jan 4;
  * W is week-of-month (day=(w-1)*7+1), WW week-of-year
    (doy=(ww-1)*7+1), DDD day-of-year, J Julian day, RM Roman month;
  * all digit fields parse leniently (1..n digits, PG's non-FX mode);
  * a non-matching input RAISES at runtime (PG errors too); NULL input
    is NULL.

Everything compiles to one anchored regex + JVM-side arithmetic
(regexp_extract / make_timestamp / date_add) — zero Python at run time.
Tokens with no parse semantics here (TZ, OF, TH suffixes, FX...)
raise ValueError at plan time so the caller can refuse loudly.
"""

from __future__ import annotations

import re

# parse-relevant tokens, longest first. Each: (regex fragment, field)
_TOKENS = [
    ("SSSSS", r"(\d{1,5})", "ssss"),
    ("SSSS", r"(\d{1,5})", "ssss"),
    ("IYYY", r"(\d{1,4})", "y4"),
    ("YYYY", r"(\d{1,4})", "y4"),
    ("Y,YYY", r"(\d{1,2},\d{3})", "ycomma"),
    ("IDDD", r"(\d{1,3})", "iddd"),
    ("DDD", r"(\d{1,3})", "ddd"),
    ("IYY", r"(\d{1,3})", "y3"),
    ("YYY", r"(\d{1,3})", "y3"),
    ("MONTH", r"([A-Za-z]{3,9})", "monname"),
    ("MON", r"([A-Za-z]{3})", "monname"),
    ("DAY", r"([A-Za-z]{3,9})", "dayname"),
    ("HH24", r"(\d{1,2})", "h24"),
    ("HH12", r"(\d{1,2})", "h12"),
    ("A.M.", r"([AaPp]\.?[Mm]\.?)", "ampm"),
    ("P.M.", r"([AaPp]\.?[Mm]\.?)", "ampm"),
    ("FF1", r"(\d)", "ff1"),
    ("FF2", r"(\d{1,2})", "ff2"),
    ("FF3", r"(\d{1,3})", "ff3"),
    ("FF4", r"(\d{1,4})", "ff4"),
    ("FF5", r"(\d{1,5})", "ff5"),
    ("FF6", r"(\d{1,6})", "ff6"),
    ("IW", r"(\d{1,2})", "iw"),
    ("IY", r"(\d{1,2})", "y2"),
    ("YY", r"(\d{1,2})", "y2"),
    ("DY", r"([A-Za-z]{3})", "dayname"),
    ("DD", r"(\d{1,2})", "dd"),
    ("ID", r"(\d)", "isodow"),
    ("CC", r"(\d{1,2})", "cc"),
    ("MM", r"(\d{1,2})", "mm"),
    ("MI", r"(\d{1,2})", "mi"),
    ("MS", r"(\d{1,3})", "ms"),
    ("US", r"(\d{1,6})", "us"),
    ("SS", r"(\d{1,2})", "ss"),
    ("HH", r"(\d{1,2})", "h12"),
    ("RM", r"([IVXivx]{1,4})", "rm"),
    ("AM", r"([AaPp][Mm])", "ampm"),
    ("PM", r"([AaPp][Mm])", "ampm"),
    ("WW", r"(\d{1,2})", "ww"),
    ("J", r"(\d{1,7})", "j"),
    ("W", r"(\d)", "w"),
    ("Q", r"(\d)", "q"),  # PG ignores Q on input
    ("I", r"(\d)", "y1"),
    ("Y", r"(\d)", "y1"),
]

_REFUSED = ("TZM", "TZH", "TZ", "OF", "TH")


def _tokenize(template: str):
    """template -> list of ('tok', field, regex) | ('lit', text)."""
    out, i, up = [], 0, template.upper()
    while i < len(up):
        if up.startswith("FM", i) or up.startswith("FX", i):
            i += 2  # fill/format modifiers: no parse effect here
            continue
        for bad in _REFUSED:
            if up.startswith(bad, i):
                raise ValueError(
                    f"to_timestamp template token {bad!r} has no parse "
                    "lowering"
                )
        for tok, frag, field in _TOKENS:
            if up.startswith(tok, i):
                out.append(("tok", field, frag))
                i += len(tok)
                break
        else:
            out.append(("lit", up[i] if False else template[i]))
            i += 1
    return out


def compile_pg_parse(value: str, template: str, to_date: bool) -> str:
    """Build the Spark SQL expression parsing `value` by `template`."""
    parts = _tokenize(template)
    rx, groups, gi = [], {}, 0
    for p in parts:
        if p[0] == "lit":
            ch = p[1]
            rx.append(r"\s+" if ch.isspace() else re.escape(ch))
            continue
        _, field, frag = p
        gi += 1
        if field in groups:
            raise ValueError(
                f"to_timestamp template repeats the {field!r} field"
            )
        groups[field] = gi
        rx.append(frag)
    anchored = "^" + "".join(rx) + "$"
    lit = anchored.replace("\\", "\\\\").replace("'", "''")

    def g(field, cast="INT"):
        idx = groups[field]
        return (
            f"CAST(nullif(regexp_extract({value}, '{lit}', {idx}), '') "
            f"AS {cast})"
        )

    def has(*fields):
        return any(f in groups for f in fields)

    # ---- year ----
    iso = has("iw", "isodow", "iddd") or (
        "I" in template.upper()
        and any(t in template.upper() for t in ("IYYY", "IYY", "IY"))
    )
    if has("y4"):
        year = f"greatest({g('y4')}, 1)"
    elif has("ycomma"):
        year = f"greatest(CAST(replace({_re_g(groups, value, lit, 'ycomma')}, ',', '') AS INT), 1)"
    elif has("y3"):
        v = g("y3")
        year = f"(CASE WHEN {v} < 520 THEN 2000 + {v} ELSE 1000 + {v} END)"
    elif has("y2") and has("cc"):
        year = f"(({g('cc')} - 1) * 100 + {g('y2')})"
    elif has("y2"):
        v = g("y2")
        year = f"(CASE WHEN {v} < 70 THEN 2000 + {v} ELSE 1900 + {v} END)"
    elif has("y1"):
        year = f"(2000 + {g('y1')})"
    elif has("cc"):
        year = f"(({g('cc')} - 1) * 100 + 1)"
    else:
        year = "1"

    # ---- month / day name helpers ----
    month = "1"
    if has("mm"):
        month = g("mm")
    elif has("monname"):
        n = f"lower(substr({_re_g(groups, value, lit, 'monname')}, 1, 3))"
        month = (
            f"(CASE {n} WHEN 'jan' THEN 1 WHEN 'feb' THEN 2 WHEN 'mar' "
            "THEN 3 WHEN 'apr' THEN 4 WHEN 'may' THEN 5 WHEN 'jun' THEN 6 "
            "WHEN 'jul' THEN 7 WHEN 'aug' THEN 8 WHEN 'sep' THEN 9 WHEN "
            "'oct' THEN 10 WHEN 'nov' THEN 11 WHEN 'dec' THEN 12 END)"
        )
    elif has("rm"):
        n = f"lower({_re_g(groups, value, lit, 'rm')})"
        month = (
            f"(CASE {n} WHEN 'i' THEN 1 WHEN 'ii' THEN 2 WHEN 'iii' THEN 3 "
            "WHEN 'iv' THEN 4 WHEN 'v' THEN 5 WHEN 'vi' THEN 6 WHEN 'vii' "
            "THEN 7 WHEN 'viii' THEN 8 WHEN 'ix' THEN 9 WHEN 'x' THEN 10 "
            "WHEN 'xi' THEN 11 WHEN 'xii' THEN 12 END)"
        )

    day = g("dd") if has("dd") else "1"
    if has("w"):
        day = f"(({g('w')} - 1) * 7 + 1)"

    # ---- the date part ----
    if has("j"):
        date = f"date_add(DATE '2000-01-01', {g('j')} - 2451545)"
    elif iso and has("iw", "isodow", "iddd"):
        start = (
            f"date_trunc('week', make_date({year}, 1, 4))"
        )
        if has("iddd"):
            off = f"({g('iddd')} - 1)"
        else:
            if has("isodow"):
                dow = g("isodow")
            elif has("dayname"):
                n = f"lower(substr({_re_g(groups, value, lit, 'dayname')}, 1, 3))"
                dow = (
                    f"(CASE {n} WHEN 'mon' THEN 1 WHEN 'tue' THEN 2 WHEN "
                    "'wed' THEN 3 WHEN 'thu' THEN 4 WHEN 'fri' THEN 5 "
                    "WHEN 'sat' THEN 6 WHEN 'sun' THEN 7 END)"
                )
            else:
                dow = "1"
            iw = g("iw") if has("iw") else "1"
            off = f"(({iw} - 1) * 7 + {dow} - 1)"
        date = f"date_add(CAST({start} AS DATE), {off})"
    elif has("ddd"):
        date = f"date_add(make_date({year}, 1, 1), {g('ddd')} - 1)"
    elif has("ww"):
        date = (
            f"date_add(make_date({year}, 1, 1), ({g('ww')} - 1) * 7)"
        )
    else:
        date = f"make_date({year}, {month}, {day})"

    # ---- the time part ----
    if has("ssss"):
        h = f"(CAST({g('ssss')} AS INT) DIV 3600)"
        mi = f"((CAST({g('ssss')} AS INT) % 3600) DIV 60)"
        sec = f"CAST(CAST({g('ssss')} AS INT) % 60 AS DECIMAL(16, 6))"
    else:
        if has("h24"):
            h = g("h24")
        elif has("h12") and has("ampm"):
            a = f"lower(substr({_re_g(groups, value, lit, 'ampm')}, 1, 1))"
            h = (
                f"(({g('h12')} % 12) + (CASE WHEN {a} = 'p' THEN 12 "
                "ELSE 0 END))"
            )
        elif has("h12"):
            h = g("h12")
        else:
            h = "0"
        mi = g("mi") if has("mi") else "0"
        frac = "0"
        for f_, scale in (
            ("ms", 1000), ("us", 1000000), ("ff1", 10), ("ff2", 100),
            ("ff3", 1000), ("ff4", 10000), ("ff5", 100000),
            ("ff6", 1000000),
        ):
            if has(f_):
                frac = f"(CAST({g(f_)} AS DECIMAL(16, 6)) / {scale})"
                break
        sec = g("ss") if has("ss") else "0"
        sec = f"(CAST({sec} AS DECIMAL(16, 6)) + {frac})"

    ts = f"make_timestamp({date_year_args(date)}, {h}, {mi}, {sec})"
    # make_timestamp takes (y, m, d, ...); when the date came from
    # day-offset arithmetic, decompose it back
    if not ts_is_simple(date):
        ts = (
            f"make_timestamp(year({date}), month({date}), day({date}), "
            f"{h}, {mi}, {sec})"
        )
    out = ts if not to_date else f"CAST({date} AS DATE)"
    err = (
        f"raise_error(concat('to_timestamp: input \\'' , {value}, "
        f"'\\' does not match template {template_sql(template)}'))"
    )
    return (
        f"(CASE WHEN {value} IS NULL THEN NULL "
        f"WHEN {value} RLIKE '{lit}' THEN {out} "
        f"ELSE CAST({err} AS {'DATE' if to_date else 'TIMESTAMP'}) END)"
    )


def _re_g(groups, value, lit, field):
    idx = groups[field]
    return f"nullif(regexp_extract({value}, '{lit}', {idx}), '')"


def ts_is_simple(date: str) -> bool:
    return date.startswith("make_date(")


def date_year_args(date: str) -> str:
    # make_date(Y, M, D) -> "Y, M, D" for splicing into make_timestamp
    return date[len("make_date(") : -1] if ts_is_simple(date) else ""


def template_sql(template: str) -> str:
    return template.replace("\\", "\\\\").replace("'", "\\'")
