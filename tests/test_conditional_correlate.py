"""ConditionalCorrelate 3VL unit tests (operators/correlate.py ≈
ConditionalCorrelate.java:44): quantified-comparison mark semantics on
hand-built frames where every branch is pinned.
"""

from __future__ import annotations

import pytest

from calcite_spark.operators.correlate import conditional_mark_correlate


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, 100.0), (2, 100.0), (3, 100.0), (4, None), (5, 100.0)],
        "lk int, lval double",
    )
    right = spark.createDataFrame(
        [
            (1, 50.0),  # lk=1: 100 > 50 → TRUE
            (2, 200.0),  # lk=2: 100 > 200 FALSE...
            (2, None),  # ...and one UNKNOWN → NULL mark
            (3, 200.0),  # lk=3: all FALSE → FALSE
            (4, 50.0),  # lk=4: left NULL vs 50 → UNKNOWN → NULL mark
            # lk=5: no right rows → FALSE
        ],
        "rk int, rval double",
    )
    return left, right


def test_mark_3vl(spark, frames):
    left, right = frames
    out = conditional_mark_correlate(left, right, on="lk = rk", condition="lval > rval")
    got = {r.lk: r.mark for r in out.collect()}
    assert got == {1: True, 2: None, 3: False, 4: None, 5: False}


def test_left_rows_preserved_exactly_once(spark, frames):
    left, right = frames
    out = conditional_mark_correlate(left, right, on="lk = rk", condition="lval > rval")
    assert out.count() == left.count()
    assert out.columns == ["lk", "lval", "mark"]


def test_overlapping_columns_rejected(spark):
    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="rename"):
        conditional_mark_correlate(df, df, on="k = k", condition="true")
