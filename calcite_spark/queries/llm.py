"""LLM-data-pipeline query inventory entries (dedup, text analysis,
similarity search) over the `documents` and `embeddings` tables.
These are first-class operators alongside SURVEY.md §2 — each has a
DuckDB oracle where the computation is SQL-expressible in both engines
(md5 digests, regexp token stats, list_cosine_similarity).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from calcite_spark.llm.dedup import exact_dedup, minhash_lsh_dups
from calcite_spark.llm.similarity import brute_force_topk
from calcite_spark.llm.textstats import lang_id, quality_score, text_stats
from calcite_spark.queries.inventory import catalog_for, register


@register(
    "q50_exact_dedup",
    oracle="""
    SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_hash,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY content_hash
    ORDER BY content_hash
    """,
    tags=("llm", "dedup", "exact"),
)
def q50_exact_dedup(spark, sf_dir):
    """Exact dedup: md5(normalized text) groupBy — llm/dedup.py."""
    cat = catalog_for(spark, sf_dir)
    return exact_dedup(cat.table("documents")).orderBy("content_hash")


@register(
    "q51_text_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(AVG(length(text)), 4) AS avg_chars,
           CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS total_tokens_ws,
           ROUND(AVG(length(regexp_replace(text, '[a-zA-Z ]', '', 'g')) /
                     GREATEST(length(text), 1)), 6) AS avg_non_alpha_ratio
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("llm", "textstats"),
)
def q51_text_stats(spark, sf_dir):
    """Token counting + char stats rollup per language — llm/textstats.py."""
    cat = catalog_for(spark, sf_dir)
    stats = text_stats(cat.table("documents"))
    return (
        stats.groupBy("lang")
        .agg(
            F.expr("COUNT(*)").alias("n_docs"),
            F.expr("ROUND(AVG(n_chars_actual), 4)").alias("avg_chars"),
            F.expr("CAST(SUM(n_tokens_ws) AS BIGINT)").alias("total_tokens_ws"),
            F.expr("ROUND(AVG(non_alpha_ratio), 6)").alias("avg_non_alpha_ratio"),
        )
        .orderBy("lang")
    )


@register(
    "q52_quality_score",
    oracle="""
    SELECT lang,
           ROUND(AVG(LEAST(1.0, length(text) / 500.0) *
                 (1.0 - LEAST(1.0, 2.0 * length(regexp_replace(text, '[^!?#*=<>{}|\\\\]', '', 'g')) /
                  GREATEST(length(text), 1)))), 6) AS avg_quality,
           COUNT(*) FILTER (WHERE length(text) < 100) AS n_short
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("llm", "quality"),
)
def q52_quality_score(spark, sf_dir):
    """Rule-based quality scoring rollup — llm/textstats.quality_score."""
    cat = catalog_for(spark, sf_dir)
    docs = cat.table("documents")
    q = quality_score(docs).join(docs.select("doc_id", F.length("text").alias("n_len")), "doc_id")
    return (
        q.groupBy("lang")
        .agg(
            F.expr("ROUND(AVG(quality), 6)").alias("avg_quality"),
            F.expr("COUNT(*) FILTER (WHERE n_len < 100)").alias("n_short"),
        )
        .orderBy("lang")
    )


@register(
    "q53_lang_id",
    oracle=None,  # heuristic argmax over stopword votes — rows-only check
    tags=("llm", "langid"),
)
def q53_lang_id(spark, sf_dir):
    """Stopword-vote language ID accuracy rollup (no SQL oracle: the
    argmax tie rule is engine-specific; driver does rows-only)."""
    cat = catalog_for(spark, sf_dir)
    pred = lang_id(cat.table("documents"))
    return (
        pred.groupBy("lang_true", "lang_pred")
        .agg(F.expr("COUNT(*)").alias("n"))
        .orderBy("lang_true", "lang_pred")
    )


@register(
    "q54_knn_bruteforce",
    oracle="""
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.q_id, e.vec_id,
             ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          CAST(q.q_vec AS DOUBLE[])), 6) AS cosine_sim
      FROM embeddings e CROSS JOIN q
    ),
    ranked AS (
      SELECT q_id, vec_id, cosine_sim,
             CAST(row_number() OVER (PARTITION BY q_id
                  ORDER BY cosine_sim DESC, vec_id) AS INT) AS rk
      FROM scored
    )
    SELECT q_id, vec_id, cosine_sim, rk FROM ranked WHERE rk <= 5
    ORDER BY q_id, rk
    """,
    tags=("llm", "similarity", "knn"),
)
def q54_knn_bruteforce(spark, sf_dir):
    """Exact cosine top-5 for 5 query vectors — llm/similarity.py
    (broadcast queries, JVM higher-order-fn dot products, window top-k)."""
    cat = catalog_for(spark, sf_dir)
    emb = cat.table("embeddings")
    queries = emb.filter("vec_id < 5").selectExpr("vec_id AS q_id", "embedding AS q_vec")
    out = brute_force_topk(emb.select("vec_id", "embedding"), queries, k=5)
    return out.selectExpr("q_id", "vec_id", "cosine_sim", "CAST(rk AS INT) AS rk").orderBy(
        "q_id", "rk"
    )


@register(
    "q55_minhash_lsh",
    oracle=None,  # LSH banding is defined by our hash family — rows-only
    tags=("llm", "dedup", "minhash"),
)
def q55_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup candidate pairs — llm/dedup.minhash_lsh_dups
    (shingle → 16 xxhash64 minhashes → 4 bands → band-bucket self-join)."""
    cat = catalog_for(spark, sf_dir)
    return minhash_lsh_dups(cat.table("documents")).orderBy("a_id", "b_id")
