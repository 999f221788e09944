"""Data profiler ≈ profile/Profiler.java + ProfilerImpl.java: per-column
statistics, pair cardinalities, functional dependencies, unique keys.
Reference test analog: core/src/test/java/org/apache/calcite/profile/
ProfilerTest.java (FDs and keys over known data).
"""

from __future__ import annotations

from calcite_spark.exec import profile, profile_deep, profile_relation
from calcite_spark.queries.inventory import catalog_for
from tests.conftest import SF_DIR


def test_profile_singles_exact(spark, duck):
    cat = catalog_for(spark, SF_DIR)
    prof = profile(cat, "nation", exact=True)
    n = duck.sql("SELECT COUNT(*) FROM nation").fetchone()[0]
    assert prof["rows"] == n
    assert prof["columns"]["n_nationkey"]["ndv"] == n
    assert prof["columns"]["n_regionkey"]["ndv"] == 5
    assert prof["columns"]["n_nationkey"]["unique_candidate"]
    assert not prof["columns"]["n_regionkey"]["unique_candidate"]
    assert prof["columns"]["n_name"]["nulls"] == 0


def test_profile_relation_is_single_aggregate(spark):
    """One scan, one aggregate — the scale contract (no per-column jobs)."""
    cat = catalog_for(spark, SF_DIR)
    wide = profile_relation(cat, "orders", ["o_orderstatus", "o_custkey"])
    plan = wide._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") == 1
    assert len(wide.collect()) == 1


def test_functional_dependencies_nation(spark):
    """n_nationkey -> n_name and n_nationkey -> n_regionkey hold;
    n_regionkey determines nothing (5 regions fan out to 25 nations)."""
    cat = catalog_for(spark, SF_DIR)
    prof = profile_deep(
        cat, "nation", ["n_nationkey", "n_name", "n_regionkey"], exact=True, fd_tolerance=0.0
    )
    fds = {(f["determinant"], f["dependent"]) for f in prof["functional_dependencies"]}
    assert ("n_nationkey", "n_name") in fds
    assert ("n_nationkey", "n_regionkey") in fds
    assert ("n_regionkey", "n_name") not in fds
    assert ("n_regionkey", "n_nationkey") not in fds
    assert ("n_nationkey",) in prof["unique_keys"]


def test_composite_unique_key(spark):
    """Planted composite key: neither column alone is unique; the pair
    is — depth-2 discovery must find exactly the pair."""
    from calcite_spark.catalog import Catalog

    cat = Catalog(spark)
    rows = [(d, h, f"v{d}_{h}") for d in range(10) for h in range(24)]
    cat.register_df("fact", spark.createDataFrame(rows, "day int, hour int, v string"))
    prof = profile_deep(cat, "fact", ["day", "hour", "v"], exact=True)
    assert ("day",) not in prof["unique_keys"]
    assert ("hour",) not in prof["unique_keys"]
    assert ("day", "hour") in prof["unique_keys"]
    # v is also unique on its own (singleton key found in pass 1)
    assert ("v",) in prof["unique_keys"]


def test_approx_tracks_exact(spark):
    """HLL sketch mode (the 100 TB path) stays within ~5% of exact."""
    cat = catalog_for(spark, SF_DIR)
    exact = profile(cat, "orders", ["o_custkey"], exact=True)
    approx = profile(cat, "orders", ["o_custkey"], exact=False)
    e, a = exact["columns"]["o_custkey"]["ndv"], approx["columns"]["o_custkey"]["ndv"]
    assert abs(a - e) <= 0.05 * e


def test_max_pairs_budget(spark):
    """ProfilerImpl bounds its exploration by a budget; max_pairs caps
    the pair sketch count."""
    cat = catalog_for(spark, SF_DIR)
    prof = profile_deep(cat, "nation", ["n_nationkey", "n_name", "n_regionkey"], max_pairs=1)
    assert len(prof["pair_ndv"]) == 1
