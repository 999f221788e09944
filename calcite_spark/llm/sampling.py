"""Deterministic hash-based sampling and splitting for training-data
pipelines: stratified corpus sampling (per-language / per-source mix
weights) and train/eval splits.

The selection predicate is a pure string comparison on an md5 prefix:

    substr(md5(key || ':' || seed), 1, 8)  <  hex(floor(frac * 16^8))

which makes every operator here

* **deterministic & seed-stable** — the same (key, seed) always lands
  on the same side, across runs, partitionings, AND engines (md5 is
  md5 everywhere), so a re-run of a 100 TB pipeline reproduces the
  exact sample and downstream joins stay consistent;
* **a zero-shuffle narrow map** — no sort, no sample() RNG state, no
  per-partition seeds to coordinate; predicate-pushdown friendly;
* **exactly oracle-replayable** — DuckDB evaluates the identical
  predicate (qx29's full value oracle), unlike engine-specific RNG
  (cf. z65_sample, which is rows-only for exactly that reason).

Spark's own df.sample/sampleBy are per-partition RNG: not stable under
repartitioning and not replayable cross-engine — the standard lakehouse
practice for reproducible splits is key-hash bucketing, which is what
this module implements.

Beyond the reference's surface; LLM tier (see chunking.py, dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_HEX_SPACE = 16 ** 8  # 8 hex digits of the md5 prefix


def hash_threshold(fraction: float) -> str:
    """8-hex-digit upper bound selecting ~``fraction`` of uniform md5
    prefixes (floor semantics; both engines compare against the SAME
    literal, so replay is exact regardless of rounding)."""
    f = min(max(fraction, 0.0), 1.0)
    if f >= 1.0:
        # 'g' sorts after every hex digit in both engines → keeps all
        # rows ('100000000' would NOT: lexicographic, not numeric)
        return "g"
    return format(int(f * _HEX_SPACE), "08x")


def hash_bucket_expr(key_col: str, seed: str = "") -> str:
    """The uniform-[0,1)-equivalent hex prefix for a row key."""
    if "'" in seed:
        raise ValueError("seed must not contain quotes")
    return f"substr(md5(CAST({key_col} AS STRING) || ':{seed}'), 1, 8)"


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    seed: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's probability, decided by the
    row's key hash (NOT an RNG): the corpus-mixing primitive — e.g.
    ``{'en': 0.5, 'de': 0.25}`` downsamples English to half and German
    to a quarter. Strata absent from ``fractions`` get
    ``default_fraction`` (0.0 = dropped, the explicit-allowlist
    posture)."""
    for s in fractions:
        if "'" in s:
            raise ValueError(f"stratum value must not contain quotes: {s!r}")
    arms = " ".join(
        f"WHEN '{s}' THEN '{hash_threshold(f)}'" for s, f in sorted(fractions.items())
    )
    case = (
        f"CASE {strata_col} {arms} "
        f"ELSE '{hash_threshold(default_fraction)}' END"
    )
    return df.where(f"{hash_bucket_expr(key_col, seed)} < {case}")


def train_test_split(
    df: DataFrame,
    test_fraction: float,
    key_col: str = "doc_id",
    seed: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Tag every row 'test' or 'train' by key hash — a partition of the
    input (each row lands in exactly one side, stable across runs and
    engines)."""
    thr = hash_threshold(test_fraction)
    return df.selectExpr(
        "*",
        f"IF({hash_bucket_expr(key_col, seed)} < '{thr}', 'test', 'train') "
        f"AS {split_col}",
    )


def mix_corpora(
    corpora: "dict[str, tuple[DataFrame, float]]",
    key_col: str = "doc_id",
    seed: str = "",
    tag_col: str = "mix_source",
) -> DataFrame:
    """Weighted corpus mixing — the data-mix recipe step (e.g. web 0.5,
    code 0.3, books 0.2): each named corpus is hash-sampled at its rate
    (salted with the corpus name, so the same key in two corpora draws
    independently) and the parts union with a provenance tag.
    Deterministic per (key, seed): re-running a 100 TB mix rebuilds the
    exact same mixture, and unioning sampled scans keeps every input a
    zero-shuffle narrow map."""
    if not corpora:
        raise ValueError("mix_corpora needs at least one corpus")
    parts = []
    for name, (df, frac) in sorted(corpora.items()):
        if "'" in name:
            raise ValueError(f"corpus name must not contain quotes: {name!r}")
        thr = hash_threshold(frac)
        kept = df.where(
            f"{hash_bucket_expr(key_col, f'{seed}:{name}')} < '{thr}'"
        )
        parts.append(kept.selectExpr("*", f"'{name}' AS {tag_col}"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
