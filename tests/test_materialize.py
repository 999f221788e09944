"""Materialized-view rewrite tests ≈ MaterializationTest.java +
MaterializedViewSubstitutionVisitorTest: define a tile over lineitem,
then check (a) queries answered from the MV are value-identical to
direct computation, (b) the physical plan actually scans the MV parquet
(df.inputFiles pointing at the tile, not the fact table).
"""

from __future__ import annotations

import tempfile

import pytest

from pyspark.sql import functions as F

from calcite_spark.catalog import Catalog
from calcite_spark.plans import ir
from calcite_spark.plans.builder import RelBuilder
from calcite_spark.plans.materialize import MaterializationRegistry, suggest_tiles
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def mv_catalog(spark):
    cat = Catalog(spark).register_parquet_dir(SF_DIR)
    reg = MaterializationRegistry()
    tmp = tempfile.mkdtemp(prefix="mv_")
    reg.define(
        cat,
        name="mv_flag_status",
        table="lineitem",
        group_keys=["l_returnflag", "l_linestatus"],
        agg_calls=[
            "SUM(l_quantity) AS sum_qty",
            "SUM(l_extendedprice) AS sum_price",
            "COUNT(*) AS n_rows",
            "MAX(l_discount) AS max_disc",
        ],
        path=f"{tmp}/mv_flag_status",
    )
    return cat, reg


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_exact_match_scans_mv(spark, mv_catalog):
    cat, reg = mv_catalog
    b = RelBuilder(cat).scan("lineitem").aggregate(
        ["l_returnflag", "l_linestatus"],
        ["SUM(l_quantity) AS sum_qty", "COUNT(*) AS n_rows"],
    )
    df = b.to_df()
    files = df.inputFiles()
    assert files and all("mv_flag_status" in f for f in files), files
    direct = (
        cat.table("lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg({"l_quantity": "sum", "*": "count"})
    )
    assert len(_rows(df)) == direct.count()


def test_rollup_compensation(spark, mv_catalog):
    cat, reg = mv_catalog
    df = (
        RelBuilder(cat)
        .scan("lineitem")
        .aggregate(["l_returnflag"], ["SUM(l_quantity) AS sum_qty", "COUNT(*) AS n_rows"])
        .to_df()
    )
    assert all("mv_flag_status" in f for f in df.inputFiles())
    direct = (
        cat.table("lineitem")
        .groupBy("l_returnflag")
        .agg({"l_quantity": "sum", "*": "count"})
        .selectExpr("l_returnflag", "`sum(l_quantity)` AS sum_qty", "`count(1)` AS n_rows")
    )
    assert _rows(df) == _rows(direct)


def test_filter_compensation(spark, mv_catalog):
    cat, reg = mv_catalog
    df = (
        RelBuilder(cat)
        .scan("lineitem")
        .filter("l_returnflag = 'R'")
        .aggregate(["l_linestatus"], ["SUM(l_extendedprice) AS sum_price"])
        .to_df()
    )
    assert all("mv_flag_status" in f for f in df.inputFiles())
    direct = (
        cat.table("lineitem")
        .filter("l_returnflag = 'R'")
        .groupBy("l_linestatus")
        .agg({"l_extendedprice": "sum"})
    )
    assert [round(r[1], 4) for r in _rows(df)] == [round(r[1], 4) for r in _rows(direct)]


def test_no_rewrite_when_not_derivable(spark, mv_catalog):
    cat, reg = mv_catalog
    # AVG is not in the tile and not derivable (v1) → must hit the fact table
    df = (
        RelBuilder(cat)
        .scan("lineitem")
        .aggregate(["l_returnflag"], ["AVG(l_quantity) AS avg_qty"])
        .to_df()
    )
    assert any("lineitem" in f for f in df.inputFiles())
    # filter on a non-tile column → no rewrite either
    df2 = (
        RelBuilder(cat)
        .scan("lineitem")
        .filter("l_quantity > 10")
        .aggregate(["l_returnflag"], ["COUNT(*) AS n_rows"])
        .to_df()
    )
    assert any("lineitem" in f for f in df2.inputFiles())


def test_tile_suggester(spark, mv_catalog):
    cat, _ = mv_catalog
    out = suggest_tiles(
        cat,
        "lineitem",
        dims=["l_returnflag", "l_linestatus", "l_suppkey"],
        measures=["SUM(l_quantity)"],
    )
    # low-cardinality dims first; the finest tile is always included
    assert out["tiles"][0] == ("l_returnflag", "l_linestatus", "l_suppkey") or len(
        out["tiles"][0]
    ) == 3
    assert out["cardinalities"]["l_returnflag"] <= 5
    assert out["cardinalities"]["l_suppkey"] > 5


def test_build_lattice_end_to_end(spark, tmp_path):
    cat = Catalog(spark).register_parquet_dir(SF_DIR)
    reg = MaterializationRegistry()
    from calcite_spark.plans.materialize import build_lattice

    tiles = build_lattice(
        cat,
        reg,
        "orders",
        dims=["o_orderstatus", "o_orderpriority"],
        measure_calls=["COUNT(*) AS n", "SUM(o_totalprice) AS total"],
        warehouse=str(tmp_path),
    )
    assert len(tiles) >= 2
    # single-dim query answered from a tile, value-identical to direct
    df = (
        RelBuilder(cat)
        .scan("orders")
        .aggregate(["o_orderstatus"], ["COUNT(*) AS n"])
        .to_df()
    )
    assert all("tile_orders" in f for f in df.inputFiles())
    direct = cat.table("orders").groupBy("o_orderstatus").count()
    assert sorted(tuple(r) for r in df.collect()) == sorted(tuple(r) for r in direct.collect())


def test_json_model_loader(spark, tmp_path):
    """Catalog.load_model ≈ model/ModelHandler.java: mount tables and
    materializations from a JSON model file."""
    import json

    model = {
        "tables": [
            {"name": "m_nation", "path": f"{SF_DIR}/nation.parquet"},
            {"name": "m_region", "path": f"{SF_DIR}/region.parquet"},
        ],
    }
    mpath = tmp_path / "model.json"
    mpath.write_text(json.dumps(model))
    cat = Catalog(spark).load_model(str(mpath))
    assert cat.table("m_nation").count() == 25
    assert cat.table("m_region").count() == 5


def test_distinct_agg_not_rolled_up(spark, mv_catalog):
    """COUNT(DISTINCT x) is not summable across finer groups — the
    rollup-compensation tier must refuse it (exact match still allowed)."""
    cat, reg = mv_catalog
    import tempfile

    tmp = tempfile.mkdtemp(prefix="mv_distinct_")
    reg.define(
        cat,
        name="mv_distinct_supp",
        table="lineitem",
        group_keys=["l_returnflag", "l_linestatus"],
        agg_calls=["COUNT(DISTINCT l_suppkey) AS nd_supp"],
        path=f"{tmp}/mv_distinct_supp",
    )
    # subset-of-keys rollup: must NOT be answered from the MV
    df = (
        RelBuilder(cat)
        .scan("lineitem")
        .aggregate(["l_returnflag"], ["COUNT(DISTINCT l_suppkey) AS nd_supp"])
        .to_df()
    )
    assert not any("mv_distinct_supp" in f for f in df.inputFiles())
    direct = (
        cat.table("lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_suppkey").alias("nd_supp"))
    )
    assert len(_rows(df)) == direct.count()
    # exact keys: MV answer is fine
    exact = (
        RelBuilder(cat)
        .scan("lineitem")
        .aggregate(
            ["l_returnflag", "l_linestatus"], ["COUNT(DISTINCT l_suppkey) AS nd_supp"]
        )
        .to_df()
    )
    assert all("mv_distinct_supp" in f for f in exact.inputFiles())
    del reg.mvs["mv_distinct_supp"]


def test_lattice_suggester_corpus_to_mv(spark, tmp_path):
    """≈ LatticeSuggester.java end-to-end: replay a workload of
    aggregate queries (observation happens inside default_program — no
    manual recording), the suggester proposes a covering tile from the
    corpus, auto_build materializes it, and the NEXT query is answered
    from the tile (inputFiles shows the lattice parquet) with values
    identical to direct computation."""
    from calcite_spark.plans.materialize import LatticeSuggester

    cat = Catalog(spark).register_parquet_dir(SF_DIR)
    sug = LatticeSuggester().attach(cat)

    # the replayed workload: three shapes over orders, overlapping keys
    workload = [
        (["o_orderstatus"], ["COUNT(*) AS n"]),
        (["o_orderpriority"], ["SUM(o_totalprice) AS s"]),
        (["o_orderpriority", "o_orderstatus"], ["COUNT(*) AS n"]),
    ]
    for keys, calls in workload:
        RelBuilder(cat).scan("orders").aggregate(keys, calls).to_df().collect()

    props = sug.suggest(min_count=3)
    assert len(props) == 1
    p = props[0]
    assert p["table"] == "orders" and p["observations"] == 3
    assert p["group_keys"] == ["o_orderpriority", "o_orderstatus"]
    # union of (fn, arg) pairs with canonical aliases
    assert any("COUNT(*)" in c for c in p["agg_calls"])
    assert any("SUM(o_totalprice)" in c for c in p["agg_calls"])

    reg = MaterializationRegistry()
    built = sug.auto_build(cat, reg, str(tmp_path), min_count=3)
    assert len(built) == 1 and built[0].name == "lattice_orders_2d"

    # a coarser rollup (not even in the workload) now reads the tile
    df = (
        RelBuilder(cat)
        .scan("orders")
        .aggregate(["o_orderstatus"], ["SUM(o_totalprice) AS s", "COUNT(*) AS n"])
        .to_df()
    )
    assert all("lattice_orders_2d" in f for f in df.inputFiles()), df.inputFiles()
    direct = (
        cat.table("orders")
        .groupBy("o_orderstatus")
        .agg(F.sum("o_totalprice").alias("s"), F.count("*").alias("n"))
    )
    got = {(r.o_orderstatus, round(float(r.s), 4), r.n) for r in df.collect()}
    want = {(r.o_orderstatus, round(float(r.s), 4), r.n) for r in direct.collect()}
    assert got == want


def test_lattice_suggester_below_threshold_silent(spark, tmp_path):
    """One observation < min_count: no proposals, no builds."""
    from calcite_spark.plans.materialize import LatticeSuggester

    cat = Catalog(spark).register_parquet_dir(SF_DIR)
    sug = LatticeSuggester().attach(cat)
    RelBuilder(cat).scan("orders").aggregate(["o_orderstatus"], ["COUNT(*) AS n"]).to_df()
    assert sug.suggest(min_count=2) == []
    assert sug.auto_build(cat, MaterializationRegistry(), str(tmp_path), min_count=2) == []


def _copy_parquet_subset(spark, src_table_df, dest, frac_filter):
    src_table_df.filter(frac_filter).write.mode("append").parquet(dest)


def test_incremental_refresh_matches_full_rebuild(spark, tmp_path):
    """Append-only base: refresh aggregates ONLY the new files and the
    merged tile equals a from-scratch rebuild."""
    base_dir = str(tmp_path / "orders_base")
    full = Catalog(spark).register_parquet_dir(SF_DIR).table("orders")
    _copy_parquet_subset(spark, full, base_dir, "o_orderkey % 3 = 0")

    cat = Catalog(spark)
    cat.register("orders_inc", base_dir)
    reg = MaterializationRegistry()
    mv = reg.define(
        cat,
        name="mv_inc",
        table="orders_inc",
        group_keys=["o_orderstatus"],
        agg_calls=[
            "SUM(o_totalprice) AS sum_price",
            "COUNT(*) AS n",
            "MIN(o_orderdate) AS first_d",
            "MAX(o_totalprice) AS max_price",
        ],
        path=str(tmp_path / "mv_inc"),
    )
    assert len(mv.base_files) >= 1

    # no new files → no-op
    assert reg.incremental_refresh(cat, "mv_inc") == {
        "refreshed": False,
        "delta_files": 0,
    }

    # append a second slice of rows as new files
    _copy_parquet_subset(spark, full, base_dir, "o_orderkey % 3 = 1")
    stats = reg.incremental_refresh(cat, "mv_inc")
    assert stats["refreshed"] and stats["delta_files"] >= 1

    refreshed = _rows(cat.table("mv_inc"))
    expected = _rows(
        cat.table("orders_inc")
        .groupBy("o_orderstatus")
        .agg(
            F.expr("SUM(o_totalprice)").alias("sum_price"),
            F.expr("COUNT(*)").alias("n"),
            F.expr("MIN(o_orderdate)").alias("first_d"),
            F.expr("MAX(o_totalprice)").alias("max_price"),
        )
        .select("o_orderstatus", "sum_price", "n", "first_d", "max_price")
    )
    assert refreshed == expected

    # second refresh with nothing new: no-op again (snapshot advanced)
    assert reg.incremental_refresh(cat, "mv_inc")["refreshed"] is False

    # and the MV rewrite still fires over the refreshed tile
    plan = (
        RelBuilder(cat)
        .scan("orders_inc")
        .aggregate(["o_orderstatus"], ["COUNT(*) AS n"])
        .build()
    )
    sub = reg.substitute(plan, cat)
    assert sub is not None
    got = {(r.o_orderstatus, r.n) for r in sub.to_df(cat).collect()}
    want = {(r.o_orderstatus, r.n) for r in cat.table("orders_inc").groupBy("o_orderstatus").agg(F.expr("COUNT(*)").alias("n")).collect()}
    assert got == want


def test_incremental_refresh_refuses_distinct(spark, tmp_path):
    base_dir = str(tmp_path / "base2")
    full = Catalog(spark).register_parquet_dir(SF_DIR).table("orders")
    _copy_parquet_subset(spark, full, base_dir, "o_orderkey % 5 = 0")
    cat = Catalog(spark)
    cat.register("orders_inc2", base_dir)
    reg = MaterializationRegistry()
    reg.define(
        cat,
        name="mv_inc2",
        table="orders_inc2",
        group_keys=["o_orderstatus"],
        agg_calls=["COUNT(DISTINCT o_custkey) AS n_cust"],
        path=str(tmp_path / "mv_inc2"),
    )
    with pytest.raises(ValueError, match="not incrementally"):
        reg.incremental_refresh(cat, "mv_inc2")
