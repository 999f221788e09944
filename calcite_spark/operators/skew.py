"""Skew-aware join: key salting ≈ the classic hot-key mitigation (AQE's
skew-join splits post-shuffle partitions; salting fixes it at plan level
when a single KEY — not partition — is hot, which AQE cannot split for
a hash aggregate or when the skew is extreme).

salted_join(left, right, key, salt):
  * left rows get a uniform random salt in [0, salt)
  * right rows are replicated salt times (one per salt value)
  * join on (key, salt) → the hot key's rows spread over `salt` tasks.
Cost: right side grows ×salt — use when right is the smaller side and
the skew is on the left (fact) side; deterministic output, random only
in placement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    lsalted = left.withColumn("__salt", (F.rand(seed=7) * salt).cast("int"))
    # When both sides use the same key name, rename the right key to a
    # unique temp name BEFORE building the condition — otherwise both
    # F.col() refs resolve to the left column and the predicate is
    # trivially true (join degenerates to salt-only matching).
    rkey, renamed = right_key, False
    if left_key == right_key:
        rkey, renamed = f"__rk_{right_key}", True
        right = right.withColumnRenamed(right_key, rkey)
    rsalted = right.crossJoin(
        F.broadcast(right.sparkSession.range(salt).selectExpr("CAST(id AS INT) AS __salt"))
    )
    cond = (lsalted[left_key] == rsalted[rkey]) & (lsalted["__salt"] == rsalted["__salt"])
    out = lsalted.join(rsalted, on=cond, how=how)
    out = out.drop(lsalted["__salt"]).drop(rsalted["__salt"])
    return out.drop(rkey) if renamed else out


def skew_stats(df: DataFrame, key: str, top: int = 5):
    """Identify hot keys: top-N key frequencies + skew ratio (max/avg) —
    feed this to decide salting factor (≈ RelMdDistinctRowCount's role in
    Calcite's cost decisions)."""
    freq = df.groupBy(key).count()
    stats = freq.selectExpr(
        "MAX(count) AS max_n", "AVG(count) AS avg_n", "COUNT(*) AS n_keys"
    ).collect()[0]
    hot = freq.orderBy(F.desc("count")).limit(top).collect()
    return {
        "skew_ratio": (stats.max_n / stats.avg_n) if stats.avg_n else 0.0,
        "n_keys": stats.n_keys,
        "hot_keys": [(r[key], r["count"]) for r in hot],
    }
