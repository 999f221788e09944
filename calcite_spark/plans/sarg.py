"""Range-set algebra ≈ util/Sarg.java:69 (search arguments over a
RangeSet): normalized, merged half-open ranges with SQL emission.

Calcite canonicalizes predicates like `EXTRACT(YEAR FROM d) IN (1994,
1995, 1997)` into a Sarg literal whose range set is
[1994-01-01..1996-01-01) ∪ [1997-01-01..1998-01-01) — adjacent years
merge, and the resulting ranges are sargable (parquet min/max row-group
skipping, partition pruning). This module is the value-level half;
plans/rewrite.py::DateRangeCanonicalize is the rule half
(≈ rel/rules/DateRangeRules.java:91).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Range:
    """Half-open [lo, hi) over an ordered domain; None = unbounded."""

    lo: object = None
    hi: object = None

    def overlaps_or_adjacent(self, other: "Range") -> bool:
        lo1, hi1, lo2, hi2 = self.lo, self.hi, other.lo, other.hi
        if hi1 is not None and lo2 is not None and hi1 < lo2:
            return False
        if hi2 is not None and lo1 is not None and hi2 < lo1:
            return False
        return True

    def union(self, other: "Range") -> "Range":
        lo = None if self.lo is None or other.lo is None else min(self.lo, other.lo)
        hi = None if self.hi is None or other.hi is None else max(self.hi, other.hi)
        return Range(lo, hi)


class RangeSet:
    """Normalized union of disjoint half-open ranges ≈ Guava RangeSet as
    used by Sarg.java."""

    def __init__(self, ranges=()):
        self.ranges: list[Range] = []
        for r in ranges:
            self.add(r)

    def add(self, r: Range) -> "RangeSet":
        merged = r
        rest = []
        for existing in self.ranges:
            if merged.overlaps_or_adjacent(existing):
                merged = merged.union(existing)
            else:
                rest.append(existing)
        rest.append(merged)
        self.ranges = sorted(
            rest, key=lambda x: (x.lo is not None, x.lo)
        )
        return self

    def is_empty(self) -> bool:
        return not self.ranges

    def to_sql(self, col: str, render=None) -> str:
        """Emit the range set as a sargable SQL predicate on `col`."""
        render = render or (lambda v: repr(v))
        parts = []
        for r in self.ranges:
            sub = []
            if r.lo is not None:
                sub.append(f"{col} >= {render(r.lo)}")
            if r.hi is not None:
                sub.append(f"{col} < {render(r.hi)}")
            parts.append("(" + " AND ".join(sub) + ")" if len(sub) > 1 else sub[0])
        if len(parts) == 1:
            return parts[0]
        return "(" + " OR ".join(parts) + ")"


# -- datetime helpers for the DateRange rule ---------------------------


def year_range(y: int) -> Range:
    return Range((y, 1), (y + 1, 1))


def month_range(y: int, m: int) -> Range:
    nxt = (y + 1, 1) if m == 12 else (y, m + 1)
    return Range((y, m), nxt)


def quarter_range(y: int, q: int) -> Range:
    m = 3 * q - 2
    return month_range(y, m).union(month_range(y, m + 1)).union(month_range(y, m + 2))


def render_ts(v: tuple) -> str:
    y, m = v
    return f"TIMESTAMP '{y}-{m:02d}-01 00:00:00'"
