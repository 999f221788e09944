"""ASOF join ≈ rel/core/AsofJoin.java:34 + EnumerableAsofJoin.java:55
(algorithm: linq4j/EnumerableDefaults.asofJoin:881; spec tests:
core/src/test/resources/sql/asof.iq).

Semantics: for each left row, join the single right row that (a) matches
the equi keys and (b) is the *closest* under the match condition
(e.g. right.ts <= left.ts picks the latest right row not after left.ts).
ASOF = inner (drop left rows with no match), LEFT_ASOF keeps them.

Spark-first lowering — the union/last-value trick, NOT a join:
  1. union left and right rows into one frame tagged by side,
  2. one hash shuffle on the equi keys,
  3. `last(right_payload, ignorenulls=true)` over a window ordered by
     (ts, side-tiebreak) carries the latest eligible right row forward,
  4. keep left rows.
Cost: ONE shuffle + one in-partition sort — same shape as a sort-merge
join, no row explosion however many right rows precede each left row.
At 100 TB this beats the naive theta-join + row_number (quadratic per
key) and keeps skew manageable via AQE (the window key is the equi key).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from calcite_spark.plans.ir import RelNode


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | list[tuple[str, str]],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",  # backward: right_ts <= left_ts; forward: >=
    strict: bool = False,  # True → strict inequality
    join_type: str = "ASOF",  # ASOF (inner) | LEFT_ASOF
    right_prefix: str = "",
    right_order: tuple = (),
) -> DataFrame:
    """DataFrame-level ASOF join (see module docstring for the plan shape).

    Plan-BUILD cost note: the select lists are assembled as SQL strings
    and shipped through a handful of selectExpr calls — the earlier
    per-column ``F.col``/``F.lit().cast()`` construction cost ~950 py4j
    round-trips per build (~0.15 s of the bench's plan-build split,
    BENCH_r05's one outlier); strings are parsed JVM-side in one hop."""
    pairs = [(k, k) if isinstance(k, str) else tuple(k) for k in on]
    lkeys = [p[0] for p in pairs]
    rkeys = [p[1] for p in pairs]

    left_cols = left.columns
    right_payload = [c for c in right.columns if c not in rkeys]
    out_names = {}
    for c in right_payload:
        name = right_prefix + c
        if name in left_cols:
            name = f"{right_prefix}{c}_r" if not right_prefix else name
        out_names[c] = name

    KEY = [f"__k{i}" for i in range(len(pairs))]
    TS, SIDE = "__ts", "__side"

    # side ordering at equal ts: eligible right rows must sort BEFORE the
    # left row for non-strict, AFTER for strict — that is exactly the
    # tie rule of EnumerableDefaults.asofJoin (<=/>= include ties).
    right_side_rank = 0 if not strict else 2

    # one schema fetch per side (cached by PySpark afterwards); DDL
    # simpleString round-trips through CAST(NULL AS <type>) exactly
    ltype = {f.name: f.dataType.simpleString() for f in left.schema.fields}
    rtype = {f.name: f.dataType.simpleString() for f in right.schema.fields}

    def q(c: str) -> str:
        return f"`{c}`"

    lsel = (
        [f"{q(k)} AS {kk}" for k, kk in zip(lkeys, KEY)]
        + [f"{q(left_ts)} AS {TS}", f"1 AS {SIDE}"]
        + [q(c) for c in left_cols]
        + [
            f"CAST(NULL AS {rtype[c]}) AS {q(out_names[c])}"
            for c in right_payload
        ]
    )
    rsel = (
        [f"{q(k)} AS {kk}" for k, kk in zip(rkeys, KEY)]
        + [f"{q(right_ts)} AS {TS}", f"{right_side_rank} AS {SIDE}"]
        + [f"CAST(NULL AS {ltype[c]}) AS {q(c)}" for c in left_cols]
        + [f"{q(c)} AS {q(out_names[c])}" for c in right_payload]
    )
    unioned = left.selectExpr(*lsel).unionByName(right.selectExpr(*rsel))

    ts_dir = "DESC" if direction == "forward" else "ASC"
    # right_order: right-side payload columns appended to the window sort
    # (after the side tiebreak) so that among EQUAL-ts right rows the one
    # sorting LAST (ascending) is the row `last(...)` carries — i.e. a
    # "keep the max-X right row per (key, ts)" dedup folded into the one
    # asof window pass instead of a separate row_number()=1 pre-pass
    # (which costs its own Exchange + two Sorts on the full right side;
    # r14 before-plan plans/r14/z43_asof_join_before.txt). Left rows hold
    # NULL in these columns, but they only tie among themselves (the side
    # rank differs from every right row), where order is irrelevant.
    tie = "".join(
        f", {q(out_names[c])} ASC" for c in right_order
    )
    win = (
        f"PARTITION BY {', '.join(KEY)} ORDER BY {TS} {ts_dir}, {SIDE} ASC{tie} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    marker = "__matched"
    if right_payload:
        # Carry ALL right payload columns as ONE struct (ADVICE r14):
        # per-column last(col, ignorenulls=true) could stitch values from
        # DIFFERENT right rows when several equal-ts right rows are
        # retained and the selected (max-right_order) row holds a NULL in
        # one payload column — the struct is NULL only on left rows, so
        # the carried values always come from a single right row. The
        # struct's nullness doubles as the match marker, so this is also
        # one window expression instead of len(payload)+1.
        payload_struct = "struct(" + ", ".join(
            f"{q(out_names[c])}" for c in right_payload
        ) + ")"
        carried = [
            f"last(IF({SIDE} <> 1, {payload_struct}, NULL), true) "
            f"OVER ({win}) AS {marker}"
        ]
        unpack = [
            f"{marker}.{q(out_names[c])} AS {q(out_names[c])}"
            for c in right_payload
        ]
    else:
        carried = [
            f"last(IF({SIDE} <> 1, 1, CAST(NULL AS INT)), true) "
            f"OVER ({win}) AS {marker}"
        ]
        unpack = []
    result = unioned.selectExpr(
        *KEY, TS, SIDE, *[q(c) for c in left_cols], *carried
    ).filter(F.col(SIDE) == 1)
    if join_type == "ASOF":
        # inner ASOF: require a match (null-safe marker, not a payload col)
        result = result.filter(F.col(marker).isNotNull())
    return result.selectExpr(
        *[q(c) for c in left_cols], *unpack
    )


@dataclass(repr=False)
class AsofJoin(RelNode):
    """IR node form; equi_keys = [(lcol, rcol)...], match_condition =
    (left_ts, op, right_ts) with op ∈ {'>=', '>', '<=', '<'}
    ≈ AsofJoin.matchCondition (AsofJoin.java:38-56)."""

    equi_keys: tuple
    match_condition: tuple
    join_type: str = "ASOF"
    inputs: tuple = ()

    def to_df(self, ctx) -> DataFrame:
        left = self.inputs[0].to_df(ctx)
        right = self.inputs[1].to_df(ctx)
        lts, op, rts = self.match_condition
        direction = "backward" if op in (">=", ">") else "forward"
        strict = op in (">", "<")
        return asof_join(
            left,
            right,
            on=list(self.equi_keys),
            left_ts=lts,
            right_ts=rts,
            direction=direction,
            strict=strict,
            join_type=self.join_type,
        )
