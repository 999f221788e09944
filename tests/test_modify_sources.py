"""TableModify (INSERT/UPDATE/DELETE/MERGE) and source-adapter tests on a
scratch copy of the testdata — ≈ JdbcAdapterTest's modify cases +
ScannableTableTest's pushdown contracts, without touching /root/testdata.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from calcite_spark.catalog import Catalog
from calcite_spark.sources.modify import (
    clone_in_memory,
    delete_where,
    insert_into,
    merge_into,
    register_csv,
    register_json,
    update_set,
)
from tests.conftest import SF_DIR


@pytest.fixture()
def scratch(spark, tmp_path):
    cat = Catalog(spark)
    src = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    path = str(tmp_path / "nation")
    src.write.parquet(path)
    cat.register("nation", path)
    return cat


def test_insert_into(spark, scratch):
    n0 = scratch.table("nation").count()
    new_rows = spark.createDataFrame(
        [(90, "ATLANTIS", 0)], "n_nationkey int, n_name string, n_regionkey int"
    )
    insert_into(scratch, "nation", new_rows)
    assert scratch.table("nation").count() == n0 + 1
    assert scratch.table("nation").filter("n_name = 'ATLANTIS'").count() == 1


def test_delete_where(spark, scratch):
    n0 = scratch.table("nation").count()
    deleted = delete_where(scratch, "nation", "n_regionkey = 0")
    assert deleted > 0
    assert scratch.table("nation").count() == n0 - deleted
    assert scratch.table("nation").filter("n_regionkey = 0").count() == 0


def test_update_set(spark, scratch):
    n = update_set(
        scratch, "nation", {"n_name": "lower(n_name)"}, "n_regionkey = 1"
    )
    assert n > 0
    got = scratch.table("nation").filter("n_regionkey = 1").select("n_name").collect()
    assert all(r.n_name == r.n_name.lower() for r in got)
    other = scratch.table("nation").filter("n_regionkey <> 1").select("n_name").collect()
    assert all(r.n_name == r.n_name.upper() for r in other)


def test_merge_into_upsert(spark, scratch):
    source = spark.createDataFrame(
        [(0, "RENAMED#0", 9), (91, "NEWLAND", 9)],
        "src_key int, src_name string, src_region int",
    )
    stats = merge_into(
        scratch,
        "nation",
        source,
        on="n_nationkey = src_key",
        when_matched_update={"n_name": "src_name", "n_regionkey": "src_region"},
    )
    assert stats == {"matched": 1, "inserted": 1, "rows_modified": 2}
    t = scratch.table("nation")
    assert t.filter("n_nationkey = 0 AND n_name = 'RENAMED#0' AND n_regionkey = 9").count() == 1
    # inserted row carries nulls for target-only columns not in source
    assert t.filter("n_name IS NULL AND n_nationkey IS NULL").count() == 1


def test_merge_duplicate_source_keys_raises(spark, scratch):
    dup = spark.createDataFrame(
        [(1, "A", 1), (1, "B", 1)], "src_key int, src_name string, src_region int"
    )
    with pytest.raises(ValueError, match="multiple source rows"):
        merge_into(scratch, "nation", dup, on="n_nationkey = src_key",
                   when_matched_update={"n_name": "src_name"})


def test_merge_delete(spark, scratch):
    n0 = scratch.table("nation").count()
    source = spark.createDataFrame([(3,)], "src_key int")
    merge_into(
        scratch,
        "nation",
        source,
        on="n_nationkey = src_key",
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    assert scratch.table("nation").count() == n0 - 1
    assert scratch.table("nation").filter("n_nationkey = 3").count() == 0


def test_csv_json_adapters(spark, scratch, tmp_path):
    df = scratch.table("nation")
    df.write.option("header", "true").csv(str(tmp_path / "n_csv"))
    df.write.json(str(tmp_path / "n_json"))
    register_csv(scratch, "nation_csv", str(tmp_path / "n_csv"))
    register_json(scratch, "nation_json", str(tmp_path / "n_json"))
    assert scratch.table("nation_csv").count() == df.count()
    assert scratch.table("nation_json").count() == df.count()
    # CSV scan honors projection pushdown: only requested col in schema
    got = scratch.table("nation_csv").select("n_name").limit(1).collect()
    assert got[0].n_name


def test_clone_in_memory(spark, scratch):
    clone = clone_in_memory(scratch, "nation")
    assert clone.storageLevel.useMemory
    assert scratch.table("nation_clone").count() == scratch.table("nation").count()


def test_update_simultaneous_semantics(spark, scratch):
    """SQL UPDATE is simultaneous: every RHS evaluates against the
    ORIGINAL row — `SET a = b, b = a` swaps (review r8: the chained
    withColumn let later assignments see updated values); the condition
    is likewise pinned to the original row even when an assignment
    falsifies it."""
    t = scratch.table("nation")
    row = t.filter("n_nationkey = 1").collect()[0]
    update_set(
        scratch, "nation",
        {"n_nationkey": "n_regionkey", "n_regionkey": "n_nationkey"},
        "n_nationkey = 1",
    )
    got = scratch.table("nation").filter(
        f"n_nationkey = {row.n_regionkey} AND n_regionkey = 1"
    )
    assert got.count() >= 1
    # condition pinned: an assignment that falsifies the predicate
    # still applies to every originally-matching row
    n = update_set(
        scratch, "nation", {"n_regionkey": "n_regionkey + 100"},
        "n_regionkey = 1",
    )
    assert n == scratch.table("nation").filter("n_regionkey = 101").count()


def test_update_post_assignments_see_updated_row(spark, scratch):
    """post_assignments (the generated-column recompute hook) run in a
    second pass over the POST-update row."""
    update_set(
        scratch, "nation", {"n_regionkey": "n_regionkey + 1"},
        "n_nationkey = 2",
        post_assignments={"n_name": "concat('R', CAST(n_regionkey AS STRING))"},
    )
    t = scratch.table("nation")
    r = t.filter("n_nationkey = 2").collect()[0]
    assert r.n_name == f"R{r.n_regionkey}"


def test_merge_compound_and_reversed_on(spark, scratch):
    """The ON condition is handled condition-agnostically: compound
    conjunctions and reversed operand order both match correctly
    (review r8: the on.split('=') key extraction silently updated
    nothing while reporting matched>0)."""
    source = spark.createDataFrame(
        [(0, 0, "X")], "sk int, sr int, sname string"
    )
    stats = merge_into(
        scratch, "nation", source,
        on="n_nationkey = sk AND n_regionkey = sr",
        when_matched_update={"n_name": "sname"},
        when_not_matched_insert=False,
    )
    assert stats["matched"] == 1
    assert scratch.table("nation").filter(
        "n_nationkey = 0 AND n_name = 'X'"
    ).count() == 1
    # reversed operands
    source2 = spark.createDataFrame([(1, "Y")], "sk int, sname string")
    merge_into(
        scratch, "nation", source2, on="sk = n_nationkey",
        when_matched_update={"n_name": "sname"},
        when_not_matched_insert=False,
    )
    assert scratch.table("nation").filter(
        "n_nationkey = 1 AND n_name = 'Y'"
    ).count() == 1


def test_merge_insert_only_rows_modified(spark, scratch):
    """Matched-but-untouched rows are not modifications (review r8)."""
    source = spark.createDataFrame(
        [(0, "dup"), (90, "new")], "sk int, sname string"
    )
    stats = merge_into(
        scratch, "nation", source, on="n_nationkey = sk",
        when_matched_update=None, when_not_matched_insert=True,
        insert_values={"n_nationkey": "sk", "n_name": "sname"},
    )
    assert stats["rows_modified"] == 1 and stats["inserted"] == 1


def test_merge_probe_is_one_action(spark, scratch, monkeypatch):
    """r15: merge_into's matched/pairs/inserted counts ride ONE collect
    (the semi/inner/anti arms unioned with a tag column) instead of
    three separate .count() actions — and the stats are unchanged."""
    source = spark.createDataFrame(
        [(0, "RENAMED#0", 9), (91, "NEWLAND", 9)],
        "src_key int, src_name string, src_region int",
    )
    DataFrame = type(scratch.table("nation"))
    calls = {"collect": 0, "count": 0}
    real_collect, real_count = DataFrame.collect, DataFrame.count
    monkeypatch.setattr(
        DataFrame, "collect",
        lambda self: calls.__setitem__("collect", calls["collect"] + 1)
        or real_collect(self),
    )
    monkeypatch.setattr(
        DataFrame, "count",
        lambda self: calls.__setitem__("count", calls["count"] + 1)
        or real_count(self),
    )
    stats = merge_into(
        scratch,
        "nation",
        source,
        on="n_nationkey = src_key",
        when_matched_update={"n_name": "src_name", "n_regionkey": "src_region"},
    )
    assert calls["collect"] == 1, calls
    assert calls["count"] == 0, calls
    assert stats == {"matched": 1, "inserted": 1, "rows_modified": 2}


def test_delete_where_is_one_count(spark, scratch, monkeypatch):
    """r15: DELETE's #deleted is one filtered count over the original
    table (the exact complement of the kept set), not count-before plus
    a re-read of the just-written table."""
    DataFrame = type(scratch.table("nation"))
    calls = {"count": 0}
    real_count = DataFrame.count
    monkeypatch.setattr(
        DataFrame, "count",
        lambda self: calls.__setitem__("count", calls["count"] + 1)
        or real_count(self),
    )
    deleted = delete_where(scratch, "nation", "n_regionkey = 0")
    assert calls["count"] == 1, calls
    assert deleted == 5
    assert scratch.table("nation").filter("n_regionkey = 0").count() == 0


def test_repeated_dml_path_bounded(spark, scratch, tmp_path):
    """Copy-on-write siblings alternate between two fixed paths and the
    superseded one is deleted — repeated DML must not grow the path
    (`x.new.new.new…`, r8 verdict) or orphan a directory per statement."""
    import os

    orig = scratch.tables["nation"].path
    for i in range(5):
        update_set(
            scratch, "nation",
            {"n_name": f"'pass {i}'"}, "n_regionkey = 1",
        )
    p = scratch.tables["nation"].path
    assert p in (orig + ".cow-a", orig + ".cow-b")
    # the other sibling (and nothing else) may linger only as the
    # CURRENT one; the superseded sibling is gone
    other = orig + (".cow-b" if p.endswith(".cow-a") else ".cow-a")
    assert not os.path.exists(other)
    assert os.path.exists(p)
    # values survived all five rewrites
    got = scratch.table("nation").filter("n_regionkey = 1").select("n_name").collect()
    assert all(r.n_name == "pass 4" for r in got)
