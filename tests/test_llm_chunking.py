"""Chunking / packing / deterministic-sampling tests (llm/chunking.py,
llm/sampling.py). Properties over real sf0.001 documents plus exact
Python-hashlib replays of the md5 selection predicate.
"""

from __future__ import annotations

import hashlib

import pytest

from calcite_spark.llm.chunking import chunk_documents, pack_sequences
from calcite_spark.llm.sampling import (
    hash_threshold,
    sample_stratified,
    train_test_split,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


# -- chunking ---------------------------------------------------------


def test_chunk_no_overlap_reconstructs_token_stream(spark, docs):
    """overlap=0 chunks concatenate back to the exact token stream."""
    chunks = chunk_documents(docs, max_tokens=32, overlap=0)
    rebuilt = spark.sql(
        """
        SELECT c.doc_id,
               concat_ws(' ', array_compact(transform(
                 array_sort(collect_list(named_struct('i', c.chunk_id, 't', c.chunk_text))),
                 x -> nullif(x.t, '')))) AS rebuilt
        FROM {c} c GROUP BY c.doc_id
        """,
        c=chunks,
    )
    orig = docs.selectExpr(
        "doc_id",
        "array_join(filter(split(trim(text), '\\\\s+'), w -> w != ''), ' ') AS expect",
    )
    bad = rebuilt.join(orig, "doc_id").where("rebuilt <> expect")
    assert bad.count() == 0


def test_chunk_bounds_and_fullness(docs):
    """Every chunk ≤ max_tokens; every non-final chunk is exactly full;
    every doc yields ≥ 1 chunk."""
    chunks = chunk_documents(docs, max_tokens=64, overlap=16).cache()
    assert chunks.where("n_tokens > 64").count() == 0
    non_final_short = (
        chunks.selectExpr(
            "doc_id", "chunk_id", "n_tokens",
            "MAX(chunk_id) OVER (PARTITION BY doc_id) AS last_id",
        )
        .where("chunk_id < last_id AND n_tokens <> 64")
    )
    assert non_final_short.count() == 0
    assert chunks.select("doc_id").distinct().count() == docs.count()


def test_chunk_overlap_tokens_shared(spark, docs):
    """Consecutive chunks share exactly `overlap` tokens when the
    earlier chunk is full: tail(chunk i) == head(chunk i+1)."""
    chunks = chunk_documents(docs, max_tokens=32, overlap=8)
    pairs = spark.sql(
        """
        SELECT a.doc_id, a.chunk_id,
               array_join(slice(split(a.chunk_text, ' '), 32 - 8 + 1, 8), ' ') AS tail_a,
               array_join(slice(split(b.chunk_text, ' '), 1, 8), ' ') AS head_b
        FROM {c} a JOIN {c} b
          ON a.doc_id = b.doc_id AND b.chunk_id = a.chunk_id + 1
        WHERE a.n_tokens = 32
        """,
        c=chunks,
    )
    assert pairs.count() > 0
    assert pairs.where("tail_a <> head_b").count() == 0


def test_chunk_empty_doc_single_empty_chunk(spark):
    df = spark.createDataFrame([(1, ""), (2, "   "), (3, "one two")], "doc_id long, text string")
    out = chunk_documents(df, max_tokens=4, overlap=1).orderBy("doc_id").collect()
    assert [(r.doc_id, r.chunk_id, r.n_tokens) for r in out] == [
        (1, 0, 0), (2, 0, 0), (3, 0, 2)
    ]
    assert out[0].chunk_text == ""


def test_chunk_overlap_validation(docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=8, overlap=8)


# -- packing ----------------------------------------------------------


def test_pack_budget_and_partition(spark, docs):
    packed = pack_sequences(docs, budget_tokens=500, buckets=8).cache()
    # every doc exactly once
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()
    # no multi-doc pack exceeds the budget; singleton packs may (an
    # oversized doc gets its own pack rather than being dropped)
    over = spark.sql(
        """
        SELECT bucket, pack, COUNT(*) AS n_docs, SUM(n_tokens) AS toks
        FROM {p} GROUP BY bucket, pack
        HAVING SUM(n_tokens) > 500 AND COUNT(*) > 1
        """,
        p=packed,
    )
    assert over.count() == 0
    # pack ids contiguous from 0 within each bucket
    gaps = spark.sql(
        """
        SELECT bucket FROM {p} GROUP BY bucket
        HAVING MIN(pack) <> 0 OR MAX(pack) + 1 <> COUNT(DISTINCT pack)
        """,
        p=packed,
    )
    assert gaps.count() == 0


def test_pack_deterministic_under_repartition(docs):
    a = pack_sequences(docs, budget_tokens=500, buckets=8)
    b = pack_sequences(docs.repartition(13), budget_tokens=500, buckets=8)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_pack_greedy_semantics_tiny(spark):
    """Hand-computed: budget 10, one bucket — [4,4,4] → packs [0,0,1];
    an oversized doc (12) always gets its own pack."""
    df = spark.createDataFrame(
        [(0, 4), (8, 4), (16, 4), (24, 12), (32, 3)],
        "doc_id long, n long",
    )
    out = {
        r.doc_id: r.pack
        for r in pack_sequences(
            df, budget_tokens=10, buckets=1, tokens_col="n"
        ).collect()
    }
    assert out == {0: 0, 8: 0, 16: 1, 24: 2, 32: 3}


def test_pack_zero_token_prefix_then_oversized(spark):
    """A prefix of zero-token (empty) docs leaves used=0 but the pack
    OCCUPIED: an oversized doc arriving then opens a NEW pack — the
    same branch the qx28 recursive-CTE oracle takes (ADVICE r5). Only
    a doc at true bucket start shares its pack with nobody by default."""
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 12), (3, 4)],
        "doc_id long, n long",
    )
    out = {
        r.doc_id: r.pack
        for r in pack_sequences(
            df, budget_tokens=10, buckets=1, tokens_col="n"
        ).collect()
    }
    # empty docs hold pack 0; oversized doc 2 gets pack 1 of its own;
    # doc 3 overflows pack 1 (12+4>10) -> pack 2
    assert out == {0: 0, 1: 0, 2: 1, 3: 2}


def test_pack_oversized_at_true_bucket_start(spark):
    """An oversized FIRST doc occupies pack 0 alone (never split, never
    dropped); the next doc overflows and moves to pack 1."""
    df = spark.createDataFrame([(0, 12), (1, 4)], "doc_id long, n long")
    out = {
        r.doc_id: r.pack
        for r in pack_sequences(
            df, budget_tokens=10, buckets=1, tokens_col="n"
        ).collect()
    }
    assert out == {0: 0, 1: 1}


# -- sampling ---------------------------------------------------------


def _md5_prefix(key, seed):
    return hashlib.md5(f"{key}:{seed}".encode()).hexdigest()[:8]


def test_stratified_sample_exact_python_replay(docs):
    fr = {"en": 0.5, "de": 0.25, "fr": 0.1}
    kept = {
        r.doc_id
        for r in sample_stratified(docs, "lang", fr, seed="s1").select("doc_id").collect()
    }
    rows = docs.selectExpr("doc_id", "lang").collect()
    expect = {
        r.doc_id
        for r in rows
        if r.lang in fr and _md5_prefix(r.doc_id, "s1") < hash_threshold(fr[r.lang])
    }
    assert kept == expect
    assert kept  # non-degenerate


def test_sample_seed_and_fraction_behavior(docs):
    a = {r.doc_id for r in sample_stratified(docs, "lang", {"en": 0.5}, seed="a").collect()}
    b = {r.doc_id for r in sample_stratified(docs, "lang", {"en": 0.5}, seed="b").collect()}
    assert a != b  # different seeds, different samples
    all_en = sample_stratified(docs, "lang", {"en": 1.0}, seed="a")
    assert all_en.count() == docs.where("lang = 'en'").count()  # f=1 keeps all
    none = sample_stratified(docs, "lang", {"en": 0.0}, seed="a")
    assert none.count() == 0
    # nesting property of a shared seed: a 0.1 sample ⊂ the 0.5 sample
    small = {r.doc_id for r in sample_stratified(docs, "lang", {"en": 0.1}, seed="a").collect()}
    big = {r.doc_id for r in sample_stratified(docs, "lang", {"en": 0.5}, seed="a").collect()}
    assert small <= big


def test_train_test_split_partition_and_replay(docs):
    out = train_test_split(docs, 0.25, seed="sp").cache()
    assert out.count() == docs.count()
    assert set(r.split for r in out.select("split").distinct().collect()) == {
        "train", "test"
    }
    thr = hash_threshold(0.25)
    bad = [
        r
        for r in out.selectExpr("doc_id", "split").collect()
        if (_md5_prefix(r.doc_id, "sp") < thr) != (r.split == "test")
    ]
    assert not bad


def test_null_text_handled(spark):
    """NULL text == empty doc (size(NULL) = -1 must not poison the
    chunk count or the pack budget arithmetic)."""
    df = spark.createDataFrame(
        [(1, None), (2, "a b c")], "doc_id long, text string"
    )
    out = chunk_documents(df, max_tokens=4).orderBy("doc_id", "chunk_id").collect()
    assert [(r.doc_id, r.chunk_id, r.n_tokens, r.chunk_text) for r in out] == [
        (1, 0, 0, ""), (2, 0, 3, "a b c")
    ]
    packed = {r.doc_id: r.n_tokens for r in pack_sequences(df, 10, buckets=1).collect()}
    assert packed == {1: 0, 2: 3}


def test_stratum_quote_rejected(spark, docs):
    with pytest.raises(ValueError, match="quote"):
        sample_stratified(docs, "lang", {"e'n": 0.5})


def test_mix_corpora_deterministic_weighted_union(spark, docs):
    from calcite_spark.llm.sampling import mix_corpora

    web = docs.where("source = 'src1'")
    books = docs.where("source = 'src2'")
    mixed = mix_corpora(
        {"web": (web, 0.5), "books": (books, 1.0)}, seed="m1"
    ).cache()
    # provenance tags partition the output
    by_tag = {
        r.mix_source: r.n
        for r in mixed.groupBy("mix_source").count().withColumnRenamed("count", "n").collect()
    }
    assert by_tag.get("books") == books.count()  # weight 1.0 keeps all
    assert 0 < by_tag.get("web", 0) < web.count()
    # exact python replay of the web side (salted with the corpus name)
    thr = hash_threshold(0.5)
    expect = {
        r.doc_id for r in web.select("doc_id").collect()
        if _md5_prefix(r.doc_id, "m1:web") < thr
    }
    got = {r.doc_id for r in mixed.where("mix_source = 'web'").select("doc_id").collect()}
    assert got == expect
    # rerun reproduces the mixture exactly
    again = mix_corpora({"web": (web, 0.5), "books": (books, 1.0)}, seed="m1")
    assert again.count() == mixed.count()
    with pytest.raises(ValueError, match="at least one"):
        mix_corpora({})
