"""Arrow IPC/Feather adapter: projection + filter pushdown, driver and
distributed tiers, residual-predicate split (≈ arrow/ArrowTable.java,
ArrowRules.java, ArrowTranslator.java)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.feather as feather
import pytest

from calcite_spark.sources.arrow import (
    read_arrow,
    register_arrow,
    translate_condition,
)


@pytest.fixture(scope="module")
def arrow_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("arrowdata")
    # two files so the distributed tier has >1 slice
    for i, lo in enumerate((0, 50)):
        t = pa.table(
            {
                "id": pa.array(range(lo, lo + 50), pa.int64()),
                "grp": pa.array([f"g{j % 3}" for j in range(lo, lo + 50)]),
                "val": pa.array([float(j) * 1.5 for j in range(lo, lo + 50)]),
            }
        )
        feather.write_feather(t, str(d / f"part{i}.arrow"))
    return str(d)


def test_driver_tier_scan(spark, arrow_dir):
    df = read_arrow(spark, arrow_dir)
    assert df.count() == 100
    assert set(df.columns) == {"id", "grp", "val"}


def test_projection_and_filter_pushdown(spark, arrow_dir):
    df = read_arrow(
        spark, arrow_dir, columns=["id", "val"], condition="id >= 90"
    )
    rows = df.collect()
    assert len(rows) == 10
    assert set(df.columns) == {"id", "val"}
    assert {r.id for r in rows} == set(range(90, 100))


def test_residual_predicate_split():
    expr, residual = translate_condition(
        "id >= 10 AND grp = 'g1' AND val + 1.0 > 3", {"id", "grp", "val"}
    )
    assert expr is not None  # two pushable conjuncts
    assert residual == "val + 1.0 > 3"  # arithmetic stays Spark-side
    # OR trees are never pushed (ArrowTranslator surface)
    expr2, residual2 = translate_condition("id = 1 OR id = 2", {"id"})
    assert expr2 is None and residual2 == "id = 1 OR id = 2"


def test_null_check_pushdown(spark, tmp_path):
    t = pa.table({"a": pa.array([1, None, 3], pa.int64())})
    p = str(tmp_path / "n.arrow")
    feather.write_feather(t, p)
    assert read_arrow(spark, p, condition="a IS NOT NULL").count() == 2
    assert read_arrow(spark, p, condition="a IS NULL").count() == 1


def test_distributed_tier_matches_driver_tier(spark, arrow_dir):
    kw = dict(columns=["id", "grp"], condition="id < 75 AND grp = 'g0'")
    drv = read_arrow(spark, arrow_dir, distributed=False, **kw)
    dist = read_arrow(spark, arrow_dir, distributed=True, **kw)
    assert drv.schema == dist.schema
    assert sorted(map(tuple, drv.collect())) == sorted(
        map(tuple, dist.collect())
    )
    # distributed plan must not be a driver-side localtable: it reads the
    # file-list DataFrame through mapInArrow (ArrowToEnumerableConverter
    # analog is executor-side)
    plan = dist._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan


def test_distributed_residual_filter(spark, arrow_dir):
    df = read_arrow(
        spark, arrow_dir, condition="id >= 10 AND id + id < 60",
        distributed=True,
    )
    assert {r.id for r in df.collect()} == set(range(10, 30))


def test_register_arrow_catalog_hook(spark, arrow_dir):
    from calcite_spark.catalog import Catalog

    cat = Catalog(spark)
    register_arrow(cat, "arrow_t", arrow_dir)
    assert cat.table("arrow_t").count() == 100
    assert spark.sql("SELECT count(*) c FROM arrow_t").collect()[0].c == 100


def test_missing_column_raises(spark, arrow_dir):
    with pytest.raises(KeyError):
        read_arrow(spark, arrow_dir, columns=["nope"])
    with pytest.raises(FileNotFoundError):
        read_arrow(spark, os.path.join(arrow_dir, "missing", "*.arrow"))


def test_or_predicate_never_pushed_as_mangled_literal(spark, tmp_path):
    # review regression: "name = 'a' OR city = 'b'" must NOT parse the
    # rhs as one string literal "a' OR city = 'b" and push a wrong
    # equality — OR conjuncts stay residual (Spark-side), values correct
    t = pa.table(
        {
            "name": pa.array(["a", "x", "y"]),
            "city": pa.array(["q", "b", "q"]),
        }
    )
    p = str(tmp_path / "o.arrow")
    feather.write_feather(t, p)
    expr, residual = translate_condition(
        "name = 'a' OR city = 'b'", {"name", "city"}
    )
    assert expr is None and residual == "name = 'a' OR city = 'b'"
    df = read_arrow(spark, p, condition="name = 'a' OR city = 'b'")
    assert {(r.name, r.city) for r in df.collect()} == {("a", "q"), ("x", "b")}


def test_literal_containing_and_survives_split(spark, tmp_path):
    # review regression: a string literal containing the word AND must
    # not be corrupted by conjunct splitting/rejoining
    t = pa.table({"msg": pa.array(["AND", "other"]), "x": pa.array([1, 1])})
    p = str(tmp_path / "a.arrow")
    feather.write_feather(t, p)
    expr, residual = translate_condition("msg = 'AND' AND x = 1", {"msg", "x"})
    assert residual is None  # both conjuncts pushable, literal intact
    df = read_arrow(spark, p, condition="msg = 'AND' AND x = 1")
    assert [r.msg for r in df.collect()] == ["AND"]


def test_empty_filter_result_keeps_schema(spark, arrow_dir):
    # review regression: a filter matching zero rows must return an
    # empty DataFrame with the real schema, not crash schema inference
    df = read_arrow(spark, arrow_dir, condition="id > 100000")
    assert df.count() == 0
    assert set(df.columns) == {"id", "grp", "val"}
