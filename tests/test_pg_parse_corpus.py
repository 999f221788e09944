"""PG TO_TIMESTAMP/TO_DATE parse-template battery (r14) — the FULL
babel postgresql.iq:529-1250 corpus transcribed with the reference's
own expected values (PG-validated upstream). Exercises the pg_parse
field-extraction compiler end-to-end through the SQL surface: 0001
defaults, lenient digit widths, short-year completion (YY<70 -> 2000s,
YYY<520 -> 2000s), CC century composition, ISO week dates
(IYYY/IW/ID/IDDD + day names), W/WW week arithmetic, Julian days,
Roman months, meridiem markers, and fractional-second fields.

Values compare as strings: timestamps below 1677 AD overflow pyspark's
Python datetime conversion on collect, so CAST AS STRING is the
faithful channel (the JVM value is exact either way).
"""

from __future__ import annotations

import re

import pytest

from calcite_spark.queries.inventory import catalog_for
from calcite_spark.sql.frontend import SqlFrontend
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def fe(spark):
    return SqlFrontend(catalog_for(spark, SF_DIR))


CASES = [
    ('to_timestamp', '01', 'HH', '0001-01-01 01:00:00'),
    ('to_timestamp', '1', 'HH', '0001-01-01 01:00:00'),
    ('to_timestamp', '11', 'HH', '0001-01-01 11:00:00'),
    ('to_timestamp', '01', 'HH12', '0001-01-01 01:00:00'),
    ('to_timestamp', '1', 'HH12', '0001-01-01 01:00:00'),
    ('to_timestamp', '11', 'HH12', '0001-01-01 11:00:00'),
    ('to_timestamp', '01', 'HH24', '0001-01-01 01:00:00'),
    ('to_timestamp', '1', 'HH24', '0001-01-01 01:00:00'),
    ('to_timestamp', '18', 'HH24', '0001-01-01 18:00:00'),
    ('to_timestamp', '01', 'MI', '0001-01-01 00:01:00'),
    ('to_timestamp', '1', 'MI', '0001-01-01 00:01:00'),
    ('to_timestamp', '57', 'MI', '0001-01-01 00:57:00'),
    ('to_timestamp', '01', 'SS', '0001-01-01 00:00:01'),
    ('to_timestamp', '1', 'SS', '0001-01-01 00:00:01'),
    ('to_timestamp', '57', 'SS', '0001-01-01 00:00:57'),
    ('to_timestamp', '03AM', 'HH12AM', '0001-01-01 03:00:00'),
    ('to_timestamp', '03AM', 'HH12PM', '0001-01-01 03:00:00'),
    ('to_timestamp', '03PM', 'HH12AM', '0001-01-01 15:00:00'),
    ('to_timestamp', '03PM', 'HH12PM', '0001-01-01 15:00:00'),
    ('to_timestamp', '03A.M.', 'HH12A.M.', '0001-01-01 03:00:00'),
    ('to_timestamp', '03A.M.', 'HH12P.M.', '0001-01-01 03:00:00'),
    ('to_timestamp', '03P.M.', 'HH12A.M.', '0001-01-01 15:00:00'),
    ('to_timestamp', '03P.M.', 'HH12P.M.', '0001-01-01 15:00:00'),
    ('to_timestamp', '03am', 'HH12am', '0001-01-01 03:00:00'),
    ('to_timestamp', '03am', 'HH12pm', '0001-01-01 03:00:00'),
    ('to_timestamp', '03pm', 'HH12am', '0001-01-01 15:00:00'),
    ('to_timestamp', '03pm', 'HH12pm', '0001-01-01 15:00:00'),
    ('to_timestamp', '03a.m.', 'HH12a.m.', '0001-01-01 03:00:00'),
    ('to_timestamp', '03a.m.', 'HH12p.m.', '0001-01-01 03:00:00'),
    ('to_timestamp', '03p.m.', 'HH12a.m.', '0001-01-01 15:00:00'),
    ('to_timestamp', '03p.m.', 'HH12p.m.', '0001-01-01 15:00:00'),
    ('to_timestamp', '0,001', 'Y,YYY', '0001-01-01 00:00:00'),
    ('to_timestamp', '2,024', 'Y,YYY', '2024-01-01 00:00:00'),
    ('to_timestamp', '0001', 'YYYY', '0001-01-01 00:00:00'),
    ('to_timestamp', '1', 'YYYY', '0001-01-01 00:00:00'),
    ('to_timestamp', '2024', 'YYYY', '2024-01-01 00:00:00'),
    ('to_timestamp', '001', 'YYY', '2001-01-01 00:00:00'),
    ('to_timestamp', '1', 'YYY', '2001-01-01 00:00:00'),
    ('to_timestamp', '987', 'YYY', '1987-01-01 00:00:00'),
    ('to_timestamp', '01', 'YY', '2001-01-01 00:00:00'),
    ('to_timestamp', '1', 'YY', '2001-01-01 00:00:00'),
    ('to_timestamp', '24', 'YY', '2024-01-01 00:00:00'),
    ('to_timestamp', '1', 'Y', '2001-01-01 00:00:00'),
    ('to_timestamp', '4', 'YY', '2004-01-01 00:00:00'),
    ('to_timestamp', '0001', 'IYYY', '0001-01-01 00:00:00'),
    ('to_timestamp', '1', 'IYYY', '0001-01-01 00:00:00'),
    ('to_timestamp', '2024', 'IYYY', '2024-01-01 00:00:00'),
    ('to_timestamp', '001', 'IYY', '2001-01-01 00:00:00'),
    ('to_timestamp', '1', 'IYY', '2001-01-01 00:00:00'),
    ('to_timestamp', '987', 'IYY', '1987-01-01 00:00:00'),
    ('to_timestamp', '01', 'IY', '2001-01-01 00:00:00'),
    ('to_timestamp', '1', 'IY', '2001-01-01 00:00:00'),
    ('to_timestamp', '24', 'IY', '2024-01-01 00:00:00'),
    ('to_timestamp', '1', 'I', '2001-01-01 00:00:00'),
    ('to_timestamp', '4', 'I', '2004-01-01 00:00:00'),
    ('to_timestamp', 'JANUARY', 'MONTH', '0001-01-01 00:00:00'),
    ('to_timestamp', 'MARCH', 'MONTH', '0001-03-01 00:00:00'),
    ('to_timestamp', 'NOVEMBER', 'MONTH', '0001-11-01 00:00:00'),
    ('to_timestamp', 'January', 'Month', '0001-01-01 00:00:00'),
    ('to_timestamp', 'March', 'Month', '0001-03-01 00:00:00'),
    ('to_timestamp', 'November', 'Month', '0001-11-01 00:00:00'),
    ('to_timestamp', 'january', 'month', '0001-01-01 00:00:00'),
    ('to_timestamp', 'march', 'month', '0001-03-01 00:00:00'),
    ('to_timestamp', 'november', 'month', '0001-11-01 00:00:00'),
    ('to_timestamp', 'JAN', 'MON', '0001-01-01 00:00:00'),
    ('to_timestamp', 'MAR', 'MON', '0001-03-01 00:00:00'),
    ('to_timestamp', 'NOV', 'MON', '0001-11-01 00:00:00'),
    ('to_timestamp', 'Jan', 'Mon', '0001-01-01 00:00:00'),
    ('to_timestamp', 'Mar', 'Mon', '0001-03-01 00:00:00'),
    ('to_timestamp', 'Nov', 'Mon', '0001-11-01 00:00:00'),
    ('to_timestamp', 'jan', 'mon', '0001-01-01 00:00:00'),
    ('to_timestamp', 'mar', 'mon', '0001-03-01 00:00:00'),
    ('to_timestamp', 'nov', 'mon', '0001-11-01 00:00:00'),
    ('to_timestamp', '01', 'MM', '0001-01-01 00:00:00'),
    ('to_timestamp', '1', 'MM', '0001-01-01 00:00:00'),
    ('to_timestamp', '11', 'MM', '0001-11-01 00:00:00'),
    ('to_timestamp', '1982 23 MONDAY', 'IYYY IW DAY', '1982-06-07 00:00:00'),
    ('to_timestamp', '1982 23 THURSDAY', 'IYYY IW DAY', '1982-06-10 00:00:00'),
    ('to_timestamp', '1982 23 FRIDAY', 'IYYY IW DAY', '1982-06-11 00:00:00'),
    ('to_timestamp', '1982 23 Monday', 'IYYY IW Day', '1982-06-07 00:00:00'),
    ('to_timestamp', '1982 23 Thursday', 'IYYY IW Day', '1982-06-10 00:00:00'),
    ('to_timestamp', '1982 23 Friday', 'IYYY IW Day', '1982-06-11 00:00:00'),
    ('to_timestamp', '1982 23 monday', 'IYYY IW day', '1982-06-07 00:00:00'),
    ('to_timestamp', '1982 23 thursday', 'IYYY IW day', '1982-06-10 00:00:00'),
    ('to_timestamp', '1982 23 friday', 'IYYY IW day', '1982-06-11 00:00:00'),
    ('to_timestamp', '1982 23 MON', 'IYYY IW DY', '1982-06-07 00:00:00'),
    ('to_timestamp', '1982 23 THU', 'IYYY IW DY', '1982-06-10 00:00:00'),
    ('to_timestamp', '1982 23 FRI', 'IYYY IW DY', '1982-06-11 00:00:00'),
    ('to_timestamp', '1982 23 Mon', 'IYYY IW Dy', '1982-06-07 00:00:00'),
    ('to_timestamp', '1982 23 Thu', 'IYYY IW Dy', '1982-06-10 00:00:00'),
    ('to_timestamp', '1982 23 Fri', 'IYYY IW Dy', '1982-06-11 00:00:00'),
    ('to_timestamp', '1982 23 mon', 'IYYY IW dy', '1982-06-07 00:00:00'),
    ('to_timestamp', '1982 23 thu', 'IYYY IW dy', '1982-06-10 00:00:00'),
    ('to_timestamp', '1982 23 fri', 'IYYY IW dy', '1982-06-11 00:00:00'),
    ('to_timestamp', '2024 001', 'YYYY DDD', '2024-01-01 00:00:00'),
    ('to_timestamp', '2024 1', 'YYYY DDD', '2024-01-01 00:00:00'),
    ('to_timestamp', '2024 137', 'YYYY DDD', '2024-05-16 00:00:00'),
    ('to_timestamp', '01', 'DD', '0001-01-01 00:00:00'),
    ('to_timestamp', '1', 'DD', '0001-01-01 00:00:00'),
    ('to_timestamp', '23', 'DD', '0001-01-23 00:00:00'),
    ('to_timestamp', '2020 001', 'IYYY IDDD', '2019-12-30 00:00:00'),
    ('to_timestamp', '2020 1', 'IYYY IDDD', '2019-12-30 00:00:00'),
    ('to_timestamp', '2020 137', 'IYYY IDDD', '2020-05-14 00:00:00'),
    ('to_timestamp', '1982 23 1', 'IYYY IW ID', '1982-06-07 00:00:00'),
    ('to_timestamp', '1982 23 4', 'IYYY IW ID', '1982-06-10 00:00:00'),
    ('to_timestamp', '1982 23 5', 'IYYY IW ID', '1982-06-11 00:00:00'),
    ('to_timestamp', '2024 1 1', 'YYYY MM W', '2024-01-01 00:00:00'),
    ('to_timestamp', '2024 4 2', 'YYYY MM W', '2024-04-08 00:00:00'),
    ('to_timestamp', '2024 11 4', 'YYYY MM W', '2024-11-22 00:00:00'),
    ('to_timestamp', '2024 01', 'YYYY WW', '2024-01-01 00:00:00'),
    ('to_timestamp', '2024 1', 'YYYY WW', '2024-01-01 00:00:00'),
    ('to_timestamp', '2024 51', 'YYYY WW', '2024-12-16 00:00:00'),
    ('to_timestamp', '2020 01', 'IYYY IW', '2019-12-30 00:00:00'),
    ('to_timestamp', '2020 1', 'IYYY IW', '2019-12-30 00:00:00'),
    ('to_timestamp', '2020 51', 'IYYY IW', '2020-12-14 00:00:00'),
    ('to_timestamp', '21', 'CC', '2001-01-01 00:00:00'),
    ('to_timestamp', '16', 'CC', '1501-01-01 00:00:00'),
    ('to_timestamp', '1', 'CC', '0001-01-01 00:00:00'),
    ('to_timestamp', '2460311', 'J', '2024-01-01 00:00:00'),
    ('to_timestamp', '2445897', 'J', '1984-07-15 00:00:00'),
    ('to_timestamp', '1806606', 'J', '0234-03-21 00:00:00'),
    ('to_timestamp', 'I', 'RM', '0001-01-01 00:00:00'),
    ('to_timestamp', 'IV', 'RM', '0001-04-01 00:00:00'),
    ('to_timestamp', 'IX', 'RM', '0001-09-01 00:00:00'),
    ('to_timestamp', 'i', 'rm', '0001-01-01 00:00:00'),
    ('to_timestamp', 'iv', 'rm', '0001-04-01 00:00:00'),
    ('to_timestamp', 'ix', 'rm', '0001-09-01 00:00:00'),
    ('to_date', '2022-06-03', 'YYYY-MM-DD', '2022-06-03'),
    ('to_date', '2,024-04-17', 'Y,YYY-MM-DD', '2024-04-17'),
    ('to_date', '24-04-17', 'YYY-MM-DD', '2024-04-17'),
    ('to_date', '24-04-17', 'YY-MM-DD', '2024-04-17'),
    ('to_date', '2124-04-17', 'CCYY-MM-DD', '2024-04-17'),
    ('to_date', '20240417', 'YYYYMMDD', '2024-04-17'),
    ('to_date', '2,0240417', 'Y,YYYMMDD', '2024-04-17'),
    ('to_date', '2024-16-3', 'IYYY-IW-ID', '2024-04-17'),
    ('to_date', '2024-16 Wednesday', 'IYYY-IW Day', '2024-04-17'),
    ('to_date', '2024-108', 'IYYY-IDDD', '2024-04-17'),
    ('to_date', 'April 17, 2024', 'Month DD, YYYY', '2024-04-17'),
    ('to_date', 'IV 17, 2024', 'RM DD, YYYY', '2024-04-17'),
    ('to_date', 'APR 17, 2024', 'MON DD, YYYY', '2024-04-17'),
    ('to_date', '2024-16', 'YYYY-WW', '2024-04-15'),
    ('to_date', '2024-108', 'YYYY-DDD', '2024-04-17'),
    ('to_date', '0000-01-01', 'YYYY-MM-DD', '0001-01-01'),
    ('to_timestamp', '18:46:32 2022-06-03', 'HH24:MI:SS YYYY-MM-DD', '2022-06-03 18:46:32'),
    ('to_timestamp', '18:46:32 Jun 03, 2022', 'HH24:MI:SS Mon DD, YYYY', '2022-06-03 18:46:32'),
]


def test_pg_parse_battery(fe):
    bad = []
    for fn, val, tpl, want in CASES:
        sql = f"SELECT CAST({fn}('{val}', '{tpl}') AS STRING) AS x"
        got = fe.sql(sql).collect()[0][0]
        norm = re.sub(r"\.0+$", "", str(got))
        if norm != re.sub(r"\.0+$", "", want):
            bad.append((fn, val, tpl, want, got))
    assert not bad, bad[:10]


def test_pg_parse_mismatch_raises(fe):
    """PG errors on input that does not match the template; the
    compiled parser raises at runtime (NULL input stays NULL)."""
    with pytest.raises(Exception, match="does not match template"):
        fe.sql(
            "SELECT to_timestamp('nonsense', 'YYYY-MM-DD') AS x"
        ).collect()
    assert fe.sql(
        "SELECT to_timestamp(CAST(NULL AS STRING), 'YYYY-MM-DD') AS x"
    ).collect()[0][0] is None
