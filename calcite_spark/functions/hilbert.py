"""Hilbert space-filling-curve indexing for spatial data
≈ runtime/HilbertCurve2D.java + the FilterHilbertRule half of
rel/rules/SpatialRules.java:1 (the rule itself lives in
plans/rewrite.py).

Why this matters at 100 TB: a table sorted (or partitioned) by a
Hilbert index column keeps spatially-near points in the same parquet
row groups, so a spatial predicate rewritten to Hilbert index RANGES
(plain `h BETWEEN a AND b OR ...` SQL) pushes into the parquet scan as
PushedFilters and prunes row groups/partitions — the scan reads a few
curve segments instead of the whole table, with the exact spatial
predicate still evaluated afterwards (the ranges are a safe
approximation: false positives possible, false negatives never).

The index math is the public xy2d algorithm (Hilbert 1891; iterative
formulation as published in Wikipedia's "Hilbert curve" article — the
same quadrant-rotation recurrence HilbertCurve2D delegates to). Two
implementations that must agree bit-for-bit:
  * `hilbert_index` — driver-side Python, used to compute covering
    ranges at PLAN time (a few hundred cells, never data-sized);
  * `hilbert_sql` — a pure Spark-SQL higher-order fold (aggregate over
    bit levels, struct accumulator), used to POPULATE the index column
    at scan speed: JVM codegen, zero Python, zero shuffle.
"""

from __future__ import annotations


def _scale(v: float, lo: float, hi: float, n: int) -> int:
    """Continuous coordinate → integer cell in [0, n-1] (clamped)."""
    if hi <= lo:
        raise ValueError("empty coordinate range")
    cell = int((v - lo) / (hi - lo) * n)
    return min(max(cell, 0), n - 1)


def hilbert_index(order: int, xi: int, yi: int) -> int:
    """Hilbert distance of integer cell (xi, yi) on a 2^order grid —
    the public iterative xy2d: walk bit planes high→low, accumulate
    s²·((3·rx) XOR ry), rotate/reflect the lower quadrant."""
    x, y, d = xi, yi, 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        # rotate
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def hilbert_sql(
    x_expr: str,
    y_expr: str,
    order: int,
    bounds: tuple[float, float, float, float],
) -> str:
    """Spark-SQL expression computing EXACTLY hilbert_index over the
    scaled coordinates — one `aggregate` fold over the bit levels with
    a struct accumulator (d, x, y), whole-stage codegen, no UDF.
    `bounds` = (xmin, xmax, ymin, ymax); cells clamp at the edges the
    same way _scale does (LEAST with n-1, GREATEST with 0)."""
    xmin, xmax, ymin, ymax = bounds
    n = 1 << order
    xi = (
        f"LEAST(GREATEST(CAST((({x_expr}) - {xmin}d) / {xmax - xmin}d "
        f"* {n} AS BIGINT), 0L), {n - 1}L)"
    )
    yi = (
        f"LEAST(GREATEST(CAST((({y_expr}) - {ymin}d) / {ymax - ymin}d "
        f"* {n} AS BIGINT), 0L), {n - 1}L)"
    )
    # fold high bit → low bit; acc = (d, x, y)
    return (
        f"aggregate(sequence({order - 1}, 0, -1), "
        f"named_struct('d', 0L, 'x', {xi}, 'y', {yi}), "
        "(acc, i) -> "
        "named_struct("
        "'d', acc.d + shiftleft(1L, i) * shiftleft(1L, i) * "
        "CAST((3 * CAST((acc.x & shiftleft(1L, i)) > 0 AS INT)) ^ "
        "CAST((acc.y & shiftleft(1L, i)) > 0 AS INT) AS BIGINT), "
        # rotate: ry=0 → swap (with reflection when rx=1)
        "'x', CASE WHEN (acc.y & shiftleft(1L, i)) > 0 THEN acc.x "
        "WHEN (acc.x & shiftleft(1L, i)) > 0 "
        "THEN shiftleft(1L, i) - 1 - acc.y ELSE acc.y END, "
        "'y', CASE WHEN (acc.y & shiftleft(1L, i)) > 0 THEN acc.y "
        "WHEN (acc.x & shiftleft(1L, i)) > 0 "
        "THEN shiftleft(1L, i) - 1 - acc.x ELSE acc.x END), "
        "acc -> acc.d)"
    )


def covering_ranges(
    order: int,
    bounds: tuple[float, float, float, float],
    xmin: float,
    xmax: float,
    ymin: float,
    ymax: float,
    max_cells: int = 1024,
) -> list[tuple[int, int]]:
    """Merged, sorted index ranges covering the query box — the
    `hilbertPredicate` half of FilterHilbertRule (its BETWEEN list).

    Level choice: a level-k quadrant holds ONE contiguous index range
    of length 4^(order-k) (the curve is hierarchical), so we pick the
    finest level whose intersecting cell count stays under `max_cells`,
    compute each cell's range, then merge adjacent/overlapping ranges.
    Plan-time cost is O(max_cells); the ranges are a SAFE cover — every
    point inside the box lands in some range (cells clamp exactly like
    _scale, so edge points agree), points outside may too (the exact
    predicate stays in the plan)."""
    bx0, bx1, by0, by1 = bounds
    n = 1 << order
    # The constraint declares data lies WITHIN bounds (hilbert_sql
    # clamps stragglers to edge cells, but the CHECK contract is the
    # caller's). A query box disjoint from the bounds therefore can
    # contain no data → empty range list (ranges_predicate → FALSE).
    # Test disjointness on the CONTINUOUS box — scaling clamps, so a
    # far-outside box would otherwise alias onto the edge cells.
    if max(xmin, bx0) > min(xmax, bx1) or max(ymin, by0) > min(ymax, by1):
        return []
    c_lo_x = _scale(max(xmin, bx0), bx0, bx1, n)
    c_hi_x = _scale(min(xmax, bx1), bx0, bx1, n)
    c_lo_y = _scale(max(ymin, by0), by0, by1, n)
    c_hi_y = _scale(min(ymax, by1), by0, by1, n)

    # coarsen until the cell count fits the budget
    level = order
    while level > 0:
        shift = order - level
        cells = ((c_hi_x >> shift) - (c_lo_x >> shift) + 1) * (
            (c_hi_y >> shift) - (c_lo_y >> shift) + 1
        )
        if cells <= max_cells:
            break
        level -= 1
    shift = order - level
    span = 1 << (2 * shift)  # 4^(order-level) indices per level cell

    ranges = []
    for cx in range(c_lo_x >> shift, (c_hi_x >> shift) + 1):
        for cy in range(c_lo_y >> shift, (c_hi_y >> shift) + 1):
            base = hilbert_index(level, cx, cy) * span
            ranges.append((base, base + span - 1))
    ranges.sort()
    merged = [ranges[0]]
    for lo, hi in ranges[1:]:
        if lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    return merged


def ranges_predicate(h_col: str, ranges: list[tuple[int, int]]) -> str:
    """`h BETWEEN a AND b OR ...` — plain SQL, so Catalyst pushes it
    into the parquet scan (PushedFilters) and prunes row groups when
    the table is sorted/partitioned by the index column."""
    if not ranges:
        return "FALSE"
    parts = [f"{h_col} BETWEEN {lo} AND {hi}" for lo, hi in ranges]
    return "(" + " OR ".join(parts) + ")"
