"""MATCH_RECOGNIZE unit tests with hand-verified expected matches
(≈ the match.iq scripted cases, on inline fixtures — SURVEY §5 "post"
fixture style).
"""

from __future__ import annotations

import pytest

from calcite_spark.operators.match_recognize import (
    compile_pattern,
    match_recognize,
    _longest_match,
)


# -- pattern compiler unit tests (pure Python, no Spark) ---------------


def _match_len(pattern, rows):
    nfa, _ = compile_pattern(pattern)
    hit = _longest_match(nfa, rows, 0)
    return None if hit is None else hit[0]


def test_nfa_basics():
    A, B, C = {"A"}, {"B"}, {"C"}
    assert _match_len("A B", [A, B, C]) == 2
    assert _match_len("A B+", [A, B, B, C]) == 3
    assert _match_len("A B*", [A, C]) == 1
    assert _match_len("A (B | C)", [A, C]) == 2
    assert _match_len("A B?", [A, B]) == 2
    assert _match_len("A{2,3}", [A, A, A, A]) == 3
    assert _match_len("A{2}", [A, A, A]) == 2
    assert _match_len("A{2,}", [A, A, A, A]) == 4
    assert _match_len("A B", [B, A]) is None
    assert _match_len("(A B)+ C", [A, B, A, B, C]) == 5


def test_nfa_classifier():
    nfa, _ = compile_pattern("A B+ C")
    end, cls = _longest_match(nfa, [{"A"}, {"B"}, {"B"}, {"C"}], 0)
    assert end == 4
    assert cls == ["A", "B", "B", "C"]


# -- end-to-end over Spark ---------------------------------------------


@pytest.fixture(scope="module")
def price_df(spark):
    # V-shape: down-down-up within each ticker (classic STRT DOWN+ UP+)
    rows = [
        ("X", 1, 10.0), ("X", 2, 8.0), ("X", 3, 6.0), ("X", 4, 9.0),
        ("X", 5, 11.0), ("X", 6, 11.0),
        ("Y", 1, 5.0), ("Y", 2, 6.0), ("Y", 3, 4.0), ("Y", 4, 7.0),
    ]
    return spark.createDataFrame(rows, "ticker string, t int, price double")


def test_match_recognize_v_shape(spark, price_df):
    out = match_recognize(
        price_df,
        partition_by=["ticker"],
        order_by=["t"],
        pattern="STRT DOWN+ UP+",
        define={
            "DOWN": "price < PREV(price)",
            "UP": "price > PREV(price)",
        },
        measures={
            "start_t": "FIRST(STRT.t)",
            "bottom_price": "LAST(DOWN.price)",
            "end_t": "LAST(UP.t)",
            "n_down": "COUNT(DOWN.*)",
            "n_rows": "COUNT(*)",
        },
    )
    rows = {(r.ticker, r.match_seq): r for r in out.collect()}
    assert set(rows) == {("X", 1), ("Y", 1)}
    x = rows[("X", 1)]
    # X: strt@1 down@2,3 up@4,5 (6 is flat, not >prev)
    assert (x.start_t, x.bottom_price, x.end_t, x.n_down, x.n_rows) == (1, 6.0, 5, 2, 5)
    y = rows[("Y", 1)]
    # Y: strt@2 down@3 up@4 (row1→2 is up, STRT anchors at 2)... greedy
    # from row 1: STRT@1, DOWN needs price<prev: row2 (6>5) no → match
    # starts at 2: STRT@2, DOWN@3 (4<6), UP@4 (7>4)
    assert (y.start_t, y.bottom_price, y.end_t, y.n_down, y.n_rows) == (2, 4.0, 4, 1, 3)


def test_match_recognize_skip_to_next(spark, price_df):
    out = match_recognize(
        price_df.filter("ticker = 'X'"),
        partition_by=["ticker"],
        order_by=["t"],
        pattern="DOWN DOWN",
        define={"DOWN": "price < PREV(price)"},
        measures={"first_t": "FIRST(DOWN.t)", "last_t": "LAST(DOWN.t)"},
        after_match="SKIP TO NEXT ROW",
    )
    got = sorted((r.first_t, r.last_t) for r in out.collect())
    # rows 2,3 are the only consecutive DOWNs; SKIP TO NEXT ROW re-scans
    # from row 3 but row 4 is UP → single match
    assert got == [(2, 3)]


def test_match_recognize_alternation(spark):
    rows = [("g", i, v) for i, v in enumerate([1.0, 9.0, 2.0, 9.0, 9.0, 1.0])]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    out = match_recognize(
        df,
        partition_by=["g"],
        order_by=["t"],
        pattern="(HI | LO)+",
        define={"HI": "v >= 9", "LO": "v <= 1"},
        measures={"n": "COUNT(*)", "first_v": "FIRST(v)"},
    )
    got = sorted((r.match_seq, r.n, r.first_v) for r in out.collect())
    # rows: LO HI LO? v=2 matches neither → matches [0,1], [3,4,5]
    assert got == [(1, 2, 1.0), (2, 3, 9.0)]
