"""Deduplication operators for large-scale training-data pipelines.

No Calcite counterpart (Calcite stops at DISTINCT); designed from public
dedup literature (MinHash/LSH à la Broder; SimHash à la Charikar) as
Spark-first plans:

* exact_dedup       — hash-groupBy on a content digest (one shuffle).
* minhash_lsh_dups  — shingle → K minhashes → B bands → self-join on
                      (band, band-signature). The ONLY join is on band
                      buckets, so candidate generation is linear-ish, not
                      the quadratic all-pairs: the classic scale path.
* simhash_dups      — 64-bit SimHash; near-dups share the full hash here
                      (bit-flip banding is a TODO; exact-hash match is the
                      deterministic, oracle-checkable core).

All hashing is built on Spark SQL's built-in `md5`/`crc32`/`xxhash64`
(JVM-side, codegen'd — no Python in the hot path). Determinism matters:
md5 gives identical digests in DuckDB, making the dedup queries
oracle-checkable, which a seeded-random minhash would not be.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Fixed salts make the K hash functions h_i(x) = md5(i || x) deterministic
# and reproducible in any engine with md5 (DuckDB oracle included).
DEFAULT_NUM_HASHES = 16
DEFAULT_BANDS = 4


def _parallelize(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the cluster's parallelism before a
    CPU-heavy narrow stage. Small inputs often arrive as ONE file → ONE
    partition, serializing the expensive map (at 100 TB the scan gives
    natural parallelism, but a salvaged single-file dimension wouldn't).
    Cheap insurance: only fires when the input has fewer partitions than
    the session's default parallelism."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def normalize_text(col: str = "text"):
    """Canonical form for content hashing: lowercase, collapse whitespace."""
    return f"regexp_replace(lower(trim({col})), '\\\\s+', ' ')"


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: md5(normalized text) → keep min id per digest.
    One hash-shuffle on the digest; at 100 TB the digest groupBy is the
    canonical map-side-combinable pattern (partial min per partition)."""
    digest = f"md5({normalize_text(text_col)})"
    return (
        _parallelize(docs).selectExpr(f"{digest} AS content_hash", id_col)
        .groupBy("content_hash")
        .agg(
            F.expr(f"MIN({id_col})").alias("keep_id"),
            F.expr("COUNT(*)").alias("n_copies"),
        )
    )


def shingles(text_expr: str, n: int = 5) -> str:
    """Word n-gram shingle array (SQL expression, JVM-side):
    sliding window of n tokens joined by space."""
    toks = f"split({text_expr}, ' ')"
    return (
        f"CASE WHEN size({toks}) < {n} THEN array(concat_ws(' ', {toks})) "
        f"ELSE transform(sequence(0, size({toks}) - {n}), "
        f"i -> concat_ws(' ', slice({toks}, i + 1, {n}))) END"
    )


def minhash_signature(shingle_array_expr: str, num_hashes: int = DEFAULT_NUM_HASHES) -> str:
    """K deterministic minhashes as ONE fold over the shingles.

    Expression-shape matters: the shingle array appears exactly ONCE, so
    even after Catalyst's CollapseProject inlines stacked projections the
    tokenize/shingle pipeline is evaluated once per row — a nested
    `transform(sequence(0,K), i -> ...shingles...)` form re-evaluates it
    K times (measured 16× slower). Inner loop is zip_with over a
    K-element accumulator: h_i = xxhash64(xxhash64(shingle), i), i.e. one
    string hash per shingle + K cheap long hashes."""
    long_max = 9223372036854775807
    return (
        f"aggregate(transform({shingle_array_expr}, s -> xxhash64(s)), "
        f"array_repeat(CAST({long_max} AS BIGINT), {num_hashes}), "
        f"(acc, h) -> transform(acc, (m, i) -> least(m, xxhash64(h, i))))"
    )


def minhash_lsh_dups(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 5,
) -> DataFrame:
    """Near-dup candidate pairs via MinHash + LSH banding.

    Plan shape (100 TB): signature computation is a narrow map; the
    explode to (doc, band) multiplies rows by `bands` (small constant);
    the self-join shuffles on (band_id, band_sig) — only docs agreeing on
    a full band collide, so the shuffle is keyed by high-selectivity
    buckets. Output: (a_id < b_id) candidate pairs with band vote count.
    """
    rows_per_band = num_hashes // bands
    norm = normalize_text(text_col)
    staged = _parallelize(docs).selectExpr(
        f"{id_col} AS __id",
        f"{minhash_signature(shingles(norm, shingle_n), num_hashes)} AS __sig",
    )
    banded = staged.selectExpr(
        "__id",
        f"posexplode(transform(sequence(0, {bands - 1}), "
        f"b -> concat_ws(',', slice(__sig, b * {rows_per_band} + 1, {rows_per_band})))) "
        "AS (band_id, band_sig)",
    )
    # shuffle on the bucket key BEFORE the self-join: both join sides read
    # the SAME exchange (Spark ReuseExchange), so signatures are computed
    # once, not twice — and the join itself is then co-partitioned.
    banded = banded.repartition("band_id", "band_sig")
    a = banded.toDF("a_id", "band_id", "band_sig")
    b = banded.toDF("b_id", "band_id", "band_sig")
    return (
        a.join(b, on=["band_id", "band_sig"])
        .filter("a_id < b_id")
        .groupBy("a_id", "b_id")
        .agg(F.expr("COUNT(*)").alias("n_bands_agree"))
    )


def jaccard_ngram_sim(docs_a: DataFrame, pairs: DataFrame, text_col="text") -> DataFrame:
    """Verify candidate pairs with exact n-gram Jaccard (array_intersect /
    array_union over shingle sets) — the rerank step after LSH."""
    norm = normalize_text(text_col)
    sh = docs_a.selectExpr("doc_id", f"array_distinct({shingles(norm)}) AS sh")
    j = (
        pairs.join(sh.toDF("a_id", "sh_a"), on="a_id")
        .join(sh.toDF("b_id", "sh_b"), on="b_id")
        .selectExpr(
            "a_id",
            "b_id",
            "ROUND(size(array_intersect(sh_a, sh_b)) / "
            "CAST(size(array_union(sh_a, sh_b)) AS DOUBLE), 6) AS jaccard",
        )
    )
    return j


def simhash64(text_expr: str, ngram: int = 3) -> str:
    """64-bit SimHash over word n-grams, pure SQL: per bit, sum +1/-1
    votes of each shingle's xxhash64 bit, take sign. Single fold over the
    shingles (the shingle expr appears once — see minhash_signature note
    on CollapseProject), accumulating 64 vote counters via zip_with, then
    one final pass folds the sign bits into a long."""
    sh = shingles(text_expr, ngram)
    votes = (
        f"aggregate(transform({sh}, s -> xxhash64(s)), "
        "array_repeat(CAST(0 AS BIGINT), 64), "
        "(acc, h) -> zip_with(acc, sequence(0, 63), "
        "(v, b) -> v + CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1 ELSE -1 END))"
    )
    return (
        f"aggregate(zip_with({votes}, sequence(0, 63), "
        "(v, b) -> CASE WHEN v > 0 THEN shiftleft(CAST(1 AS BIGINT), b) "
        "ELSE CAST(0 AS BIGINT) END), CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )


def simhash_dups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Documents sharing an identical 64-bit SimHash (strong near-dup
    signal for short docs). GroupBy on the hash — one shuffle."""
    return (
        _parallelize(docs)
        .selectExpr(f"{simhash64(normalize_text(text_col))} AS simhash", id_col)
        .groupBy("simhash")
        .agg(
            F.expr(f"MIN({id_col})").alias("keep_id"),
            F.expr("COUNT(*)").alias("n_copies"),
        )
        .filter("n_copies > 1")
    )
