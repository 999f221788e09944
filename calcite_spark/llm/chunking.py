"""Document chunking and sequence packing for training-data pipelines.

Two operators every pretraining data pipeline needs between "clean
documents" and "token batches":

* ``chunk_documents`` — token-aware sliding-window chunking with
  overlap (context-window preparation). Pure Spark SQL higher-order
  functions: one narrow map + one ``explode`` per input row, zero
  shuffle, zero Python — scan speed at 100 TB, and every formula is
  DuckDB-replayable (qx27's full value oracle).

* ``pack_sequences`` — greedy first-fit sequence packing: assign
  documents to fixed token-budget packs so short documents share a
  context window instead of wasting pad tokens. Packing is inherently
  sequential, so it is done independently per hash bucket: ONE
  groupBy(bucket) shuffle, then a JVM ``aggregate`` fold over the
  bucket's (doc_id, n_tokens) list. At 100 TB you size ``buckets`` so
  each holds a bounded document count (buckets ∝ input size); packs
  never cross buckets, which is exactly how shard-local packing works
  in production loaders. The fold is deterministic (docs ordered by
  id), so a DuckDB recursive CTE replays the whole assignment
  (qx28's oracle).

Beyond the reference's surface (Calcite has no pretraining loader);
kept in the LLM tier with the dedup/ANN/textstats operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# whitespace tokens with empties dropped — the same token model the
# decontamination and repetition operators use (textstats.py). NULL
# text coalesces to '' (otherwise size(NULL) = -1 poisons the chunk
# count / token budget arithmetic).
_TOKS = "filter(split(trim(coalesce({col}, '')), '\\\\s+'), w -> w != '')"


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 128,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into whitespace-token windows of
    ``max_tokens`` advancing by ``max_tokens - overlap``; the last
    window may be short. Every document yields at least one chunk
    (an empty document yields one empty chunk), so no data is silently
    dropped. Output: (id, chunk_id, chunk_text, n_tokens).
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    toks = _TOKS.format(col=text_col)
    return (
        docs.selectExpr(id_col, f"{toks} AS _toks")
        .selectExpr(
            id_col,
            "_toks",
            # chunks = 1 + ceil(max(n - max_tokens, 0) / stride)
            f"explode(sequence(0, CAST(CEIL(GREATEST(size(_toks) - {max_tokens}, 0) "
            f"/ CAST({stride} AS DOUBLE)) AS INT))) AS chunk_id",
        )
        .selectExpr(
            id_col,
            "chunk_id",
            f"array_join(slice(_toks, chunk_id * {stride} + 1, {max_tokens}), ' ') AS chunk_text",
            f"CAST(size(slice(_toks, chunk_id * {stride} + 1, {max_tokens})) AS INT) AS n_tokens",
        )
    )


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int = 2048,
    buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """Greedy sequential packing: within each hash bucket, walk
    documents in id order accumulating token counts; start a new pack
    when the budget would overflow. A document larger than the budget
    gets a pack of its own (never split, never dropped). Output one
    row per document: (id, bucket, pack, n_tokens); ``pack`` is
    0-based and contiguous within its bucket.

    The per-bucket ``collect_list`` array (an executor-side groupBy
    aggregation — no driver collect anywhere) is bounded by bucket
    sizing, not data volume — callers scale ``buckets`` with the
    corpus so each bucket's array stays small (the fold itself is a
    JVM higher-order function; no Python).
    """
    from pyspark.sql import functions as F

    n_expr = (
        tokens_col
        if tokens_col
        else f"size({_TOKS.format(col=text_col)})"
    )
    # Bucket start is "no doc emitted yet" (size(a.out) = 0), NOT
    # used = 0: a prefix of zero-token docs leaves used at 0 while the
    # pack is occupied, and an oversized doc arriving then must open a
    # NEW pack — same branch the qx28 recursive-CTE oracle takes
    # (CASE WHEN used + n <= budget), keeping Spark and DuckDB
    # row-identical on corpora containing empty documents (ADVICE r5).
    fold = f"""
    inline(aggregate(
      arr,
      named_struct('pack', 0, 'used', CAST(0 AS BIGINT),
                   'out', CAST(array() AS
                     ARRAY<STRUCT<{id_col}: BIGINT, pack: INT, n_tokens: BIGINT>>)),
      (a, x) -> IF(size(a.out) > 0 AND a.used + x.n > {budget_tokens},
          named_struct('pack', a.pack + 1, 'used', x.n,
                       'out', array_append(a.out,
                         named_struct('{id_col}', x.id, 'pack', a.pack + 1,
                                      'n_tokens', x.n))),
          named_struct('pack', a.pack, 'used', a.used + x.n,
                       'out', array_append(a.out,
                         named_struct('{id_col}', x.id, 'pack', a.pack,
                                      'n_tokens', x.n)))),
      a -> a.out))
    """
    return (
        docs.selectExpr(
            f"pmod({id_col}, {buckets}) AS bucket",
            f"CAST({id_col} AS BIGINT) AS _id",
            f"CAST({n_expr} AS BIGINT) AS _n",
        )
        .groupBy("bucket")
        # array_sort on structs orders by the leading field (= doc id),
        # making the fold order — and thus the packing — deterministic
        # regardless of partitioning
        .agg(
            F.expr(
                "array_sort(collect_list(named_struct('id', _id, 'n', _n)))"
            ).alias("arr")
        )
        .selectExpr("bucket", fold)
    )
