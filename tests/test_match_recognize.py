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


def test_all_rows_per_match(spark, price_df):
    """ALL ROWS PER MATCH (Match.java:69): one output row per matched
    input row, running measures, CLASSIFIER()/MATCH_NUMBER()."""
    out = match_recognize(
        price_df,
        partition_by=["ticker"],
        order_by=["t"],
        pattern="STRT DOWN+ UP+",
        define={"DOWN": "price < PREV(price)", "UP": "price > PREV(price)"},
        measures={
            "cls": "CLASSIFIER()",
            "mno": "MATCH_NUMBER()",
            "run_downs": "COUNT(DOWN.*)",
            "run_last": "LAST(DOWN.price)",
        },
        all_rows=True,
    ).orderBy("ticker", "t")
    rows = {(r.ticker, r.t): r for r in out.collect()}
    # X: rows 1..5 matched (10, 8, 6, 9, 11); row 6 (flat) outside
    assert set(k for k in rows if k[0] == "X") == {("X", i) for i in range(1, 6)}
    assert rows[("X", 1)].cls == "STRT" and rows[("X", 1)].run_downs == 0
    assert rows[("X", 3)].cls == "DOWN" and rows[("X", 3)].run_downs == 2
    assert rows[("X", 3)].run_last == 6.0
    assert rows[("X", 5)].cls == "UP" and rows[("X", 5)].run_downs == 2
    # Y: V at rows 2..4 (6, 4, 7)
    assert set(k for k in rows if k[0] == "Y") == {("Y", 2), ("Y", 3), ("Y", 4)}
    assert all(r.mno == 1 for r in rows.values())
    # every input column passes through in ALL ROWS mode
    assert {"ticker", "t", "price"} <= set(out.columns)


def test_subset_measures(spark, price_df):
    """SUBSET U = (DOWN, UP) (Match.java:74): union symbol in measures."""
    out = match_recognize(
        price_df,
        partition_by=["ticker"],
        order_by=["t"],
        pattern="STRT DOWN+ UP+",
        define={"DOWN": "price < PREV(price)", "UP": "price > PREV(price)"},
        measures={"n_moves": "COUNT(MOVE.*)", "last_move": "LAST(MOVE.price)"},
        subsets={"MOVE": ("DOWN", "UP")},
    ).orderBy("ticker")
    rows = {r.ticker: r for r in out.collect()}
    # X: DOWN 8,6 + UP 9,11 → 4 moves, last 11; Y: DOWN 4 + UP 7 → 2
    assert rows["X"].n_moves == 4 and rows["X"].last_move == 11.0
    assert rows["Y"].n_moves == 2 and rows["Y"].last_move == 7.0


def test_skip_to_last_symbol(spark):
    """AFTER MATCH SKIP TO LAST sym resumes AT that row — overlapping
    matches the PAST-LAST-ROW mode cannot produce."""
    rows = [("X", i, v) for i, v in enumerate([10.0, 8.0, 9.0, 7.0, 8.5, 6.0, 9.5])]
    df = spark.createDataFrame(rows, "ticker string, t int, price double")
    out = match_recognize(
        df,
        partition_by=["ticker"],
        order_by=["t"],
        pattern="STRT DOWN+ UP+",
        define={"DOWN": "price < PREV(price)", "UP": "price > PREV(price)"},
        measures={"s": "FIRST(STRT.price)", "e": "LAST(UP.price)"},
        after_match="SKIP TO LAST UP",
    ).orderBy("match_seq")
    got = [(r.s, r.e) for r in out.collect()]
    # V1: 10,8,9 → resume at 9; V2: 9,7,8.5 → resume at 8.5; V3: 8.5,6,9.5
    assert got == [(10.0, 9.0), (9.0, 8.5), (8.5, 9.5)]


def test_skip_to_first_infinite_loop_raises(spark, price_df):
    """SKIP TO FIRST STRT would resume at the match start — the standard
    makes this an error, not a hang."""
    out = match_recognize(
        price_df,
        partition_by=["ticker"],
        order_by=["t"],
        pattern="STRT DOWN+ UP+",
        define={"DOWN": "price < PREV(price)", "UP": "price > PREV(price)"},
        measures={"n": "COUNT(*)"},
        after_match="SKIP TO FIRST STRT",
    )
    with pytest.raises(Exception, match="infinite loop"):
        out.collect()


def test_within_duration(spark):
    """WITHIN (Match.java:77): the match span over the time column must
    fit the interval — the long-gap V must NOT match."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    mk = lambda m: base + datetime.timedelta(minutes=m)
    rows = [
        ("X", mk(0), 10.0), ("X", mk(1), 8.0), ("X", mk(2), 9.0),   # tight V
        ("X", mk(100), 7.0), ("X", mk(200), 5.0), ("X", mk(300), 11.0),  # slow V
    ]
    df = spark.createDataFrame(rows, "ticker string, ts timestamp, price double")
    kw = dict(
        partition_by=["ticker"],
        order_by=["ts"],
        pattern="STRT DOWN+ UP+",
        define={"DOWN": "price < PREV(price)", "UP": "price > PREV(price)"},
        measures={"n": "COUNT(*)"},
    )
    unbounded = match_recognize(df, **kw).count()
    bounded = match_recognize(df, **kw, within=600).count()  # 10 minutes
    assert unbounded == 2
    assert bounded == 1


def test_nfa_permute():
    A, B, C = {"A"}, {"B"}, {"C"}
    # PERMUTE(A, B) ≡ (A B | B A)
    assert _match_len("PERMUTE(A, B)", [A, B]) == 2
    assert _match_len("PERMUTE(A, B)", [B, A]) == 2
    assert _match_len("PERMUTE(A, B)", [A, A]) is None
    # three elements, any order
    assert _match_len("PERMUTE(A, B, C)", [C, A, B]) == 3
    assert _match_len("PERMUTE(A, B, C)", [B, C, A]) == 3
    assert _match_len("PERMUTE(A, B, C)", [A, B, B]) is None
    # elements may be sub-patterns
    assert _match_len("PERMUTE(A B, C)", [C, A, B]) == 3
    assert _match_len("PERMUTE(A B, C)", [A, B, C]) == 3
    # composes with quantifiers and concatenation
    assert _match_len("PERMUTE(A, B) C", [B, A, C]) == 3
    # symbol list excludes the operator token
    _, syms = compile_pattern("PERMUTE(A, B)")
    assert syms == ["A", "B"]
    # refusal bound: 7! expansion
    with pytest.raises(ValueError, match="PERMUTE"):
        compile_pattern("PERMUTE(A, B, C, D, E, F, G)")
    # a comma outside PERMUTE is a parse error, not silently dropped
    with pytest.raises(ValueError):
        compile_pattern("A, B")


def test_match_recognize_permute(spark):
    rows = [("g", 1, "b"), ("g", 2, "a"), ("g", 3, "c")]
    df = spark.createDataFrame(rows, "grp string, t int, tag string")
    out = match_recognize(
        df,
        partition_by=["grp"],
        order_by=["t"],
        pattern="PERMUTE(A, B) C",
        define={"A": "tag = 'a'", "B": "tag = 'b'", "C": "tag = 'c'"},
        measures={"first_t": "FIRST(A.t)", "n": "COUNT(*)"},
    )
    got = [(r.grp, r.n) for r in out.collect()]
    assert got == [("g", 3)]


# -- r14 optimization internals ----------------------------------------


def test_longest_match_end_param_equals_slice():
    """_longest_match(nfa, rows, i, end) must equal the historical
    _longest_match(nfa, rows[:end], i) for every (i, end) — the WITHIN
    path switched from per-start slicing to the explicit bound (r14)."""
    nfa, _ = compile_pattern("A B+ C?")
    rows = [{"A"}, {"B"}, {"B"}, {"C"}, {"A"}, {"B"}, set(), {"A"}]
    for start in range(len(rows)):
        for end in range(start, len(rows) + 1):
            assert _longest_match(nfa, rows, start, end) == _longest_match(
                nfa, rows[:end], start
            )


def test_match_recognize_single_file_input_parallelizes(spark, tmp_path):
    """A single-file input must NOT collapse the NFA stage to one task:
    the keyed repartition (exec.parallelize_grouped_input) pins the
    group shuffle at defaultParallelism and AQE may not coalesce it
    (r14: z45 ran every post-shuffle stage 0+1/1 before this)."""
    rows = [(u, t, float((u * 7 + t * 3) % 11)) for u in range(40) for t in range(20)]
    p = str(tmp_path / "one_file.parquet")
    spark.createDataFrame(
        rows, "ticker int, t int, price double"
    ).coalesce(1).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    assert len(df.inputFiles()) == 1
    out = match_recognize(
        df,
        partition_by=["ticker"],
        order_by=["t"],
        pattern="STRT DOWN+ UP+",
        define={"DOWN": "price < PREV(price)", "UP": "price > PREV(price)"},
        measures={"n_rows": "COUNT(*)"},
    )
    from calcite_spark.exec import explain_str

    plan = explain_str(out)
    assert "REPARTITION_BY_NUM" in plan, plan
