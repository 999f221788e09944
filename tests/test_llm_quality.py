"""Quality bounds for approximate operators: approximation is only
useful if its error is bounded — these tests pin recall/error envelopes
on the driver testdata (deterministic hash families → stable numbers).
"""

from __future__ import annotations

import pytest

from calcite_spark.llm.dedup import jaccard_ngram_sim, minhash_lsh_dups
from calcite_spark.llm.similarity import brute_force_topk, lsh_bucketed_topk
from calcite_spark.queries.inventory import catalog_for
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def cat(spark):
    return catalog_for(spark, SF_DIR)


def test_lsh_knn_recall_vs_bruteforce(spark, cat):
    emb = cat.table("embeddings").select("vec_id", "embedding")
    queries = emb.filter("vec_id < 10").selectExpr("vec_id AS q_id", "embedding AS q_vec")
    dim = len(emb.select("embedding").first()[0])
    exact = {
        (r.q_id, r.vec_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.q_id, r.vec_id)
        for r in lsh_bucketed_topk(emb, queries, k=5, n_planes=4, dim=dim).collect()
    }
    # the query vector itself (cos=1) must always be found: it shares its
    # own bucket by construction
    self_hits = {(q, q) for q in range(10)}
    assert self_hits <= approx
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"LSH recall collapsed: {recall}"


def test_approx_count_distinct_error(spark, cat):
    orders = cat.table("orders")
    got = orders.selectExpr(
        "approx_count_distinct(o_custkey) AS approx",
        "COUNT(DISTINCT o_custkey) AS exact",
    ).collect()[0]
    assert abs(got.approx - got.exact) / got.exact < 0.05


def test_minhash_candidates_are_actually_similar(spark, cat):
    docs = cat.table("documents")
    pairs = minhash_lsh_dups(docs)
    verified = jaccard_ngram_sim(docs, pairs)
    rows = verified.collect()
    if not rows:
        pytest.skip("no near-dup candidates at this SF")
    sims = [r.jaccard for r in rows]
    # banding with 4 bands of 4 hashes targets ~J>0.7 pairs; candidates
    # must skew high-similarity (precision, not an exact threshold)
    frac_good = sum(s >= 0.5 for s in sims) / len(sims)
    assert frac_good >= 0.8, f"minhash candidate precision too low: {frac_good}"


def test_exact_dedup_finds_planted_dups(spark, cat):
    """documents contains driver-planted duplicates: exact dedup must
    report fewer hashes than docs, and every multi-copy group verifies
    as byte-identical normalized text."""
    from calcite_spark.llm.dedup import exact_dedup, normalize_text

    docs = cat.table("documents")
    groups = exact_dedup(docs)
    n_docs = docs.count()
    n_groups = groups.count()
    assert n_groups <= n_docs
    dups = groups.filter("n_copies > 1")
    if dups.count() == 0:
        pytest.skip("no planted dups at this SF")
    # verify one group end-to-end
    h = dups.first().content_hash
    texts = (
        docs.selectExpr(f"{normalize_text()} AS t", f"md5({normalize_text()}) AS h")
        .filter(f"h = '{h}'")
        .select("t")
        .collect()
    )
    assert len({r.t for r in texts}) == 1


def test_ivf_topk_recall(spark, cat):
    from calcite_spark.llm.similarity import brute_force_topk, ivf_build, ivf_topk

    emb = cat.table("embeddings").select("vec_id", "embedding")
    queries = emb.filter("vec_id < 10").selectExpr("vec_id AS q_id", "embedding AS q_vec")
    assigned, centroids = ivf_build(emb, n_clusters=8)
    exact = {(r.q_id, r.vec_id) for r in brute_force_topk(emb, queries, k=5).collect()}
    approx = {
        (r.q_id, r.vec_id)
        for r in ivf_topk(assigned, centroids, queries, k=5, n_probe=4).collect()
    }
    # probing half the lists must recover most true neighbors, and the
    # query vector itself (its own list is always the nearest centroid)
    assert {(q, q) for q in range(10)} <= approx
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall too low: {recall}"
