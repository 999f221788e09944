"""TableModify ≈ rel/core/TableModify.java:74 (INSERT / UPDATE / DELETE /
MERGE) + schema/ModifiableTable.java:39.

Spark's native writers cover INSERT; UPDATE/DELETE/MERGE on plain
parquet have no transactional engine in this environment (Delta/Iceberg
jars absent — gated), so they are implemented as the standard
copy-on-write emulation: read → transform → write-new → swap. That is
exactly what Delta does under the hood minus the transaction log; the
API mirrors MERGE INTO semantics so a Delta-backed implementation can
slot in behind the same signatures.

100 TB: copy-on-write over a whole table is the worst case; partition
the table (writer `partition_by`) so modify ops rewrite only touched
partitions (dynamic partition overwrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _rewrite(catalog, table: str, df: DataFrame) -> None:
    """Copy-on-write swap: write to a sibling path, re-register, and
    delete the PREVIOUS sibling. Siblings alternate between two fixed
    names derived from the original path (`.cow-a` / `.cow-b`), so
    repeated DML neither grows the path unboundedly nor orphans a
    directory per statement (r8 verdict: the old `.new` suffix
    accumulated as `x.new.new.new…`). The ORIGINAL path is never
    deleted — we may not own it (a mounted dataset); only the cow
    siblings this function created are cleaned up."""
    import shutil

    entry = catalog.tables[table]
    old_path = entry.path.rstrip("/")
    # ownership is tracked EXPLICITLY, not inferred from the suffix: a
    # user-registered path that happens to end in .cow-a must never be
    # written over OR rmtree'd (review r9 — suffix inference deleted
    # the user's source data, and suffix ALTERNATION would have written
    # into it one swap later). Only a sibling THIS function created
    # alternates and gets cleaned; an unowned path — whatever its name
    # — is treated as the user's original and only ever read. The set
    # is session-local; at worst one sibling directory survives a
    # restart.
    owned = getattr(catalog, "_cow_owned", None)
    if owned is None:
        owned = catalog._cow_owned = set()
    if old_path in owned and old_path.endswith(".cow-a"):
        new_path = old_path[: -len(".cow-a")] + ".cow-b"
    elif old_path in owned and old_path.endswith(".cow-b"):
        new_path = old_path[: -len(".cow-b")] + ".cow-a"
    else:
        new_path = old_path + ".cow-a"
    # the write below EXECUTES the read of old_path (eager action), so
    # after it returns the previous sibling is dead weight
    df.write.mode("overwrite").parquet(new_path)
    # register with the schema just written — the next table() call
    # skips the parquet schema-inference job (same write-site pattern
    # as the MV tile registrations)
    catalog.register(table, new_path, schema=df.schema)
    owned.add(new_path)
    if old_path != new_path and old_path in owned:
        shutil.rmtree(old_path, ignore_errors=True)
        owned.discard(old_path)


def insert_into(
    catalog,
    table: str,
    rows: DataFrame,
    partition_by: tuple = (),
    dynamic_overwrite: bool = False,
) -> None:
    """INSERT INTO (append) — df.write.insertInto semantics; with
    partition columns + dynamic_overwrite, INSERT OVERWRITE PARTITION."""
    entry = catalog.tables[table]
    writer = rows.write
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if dynamic_overwrite:
        rows.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        writer.mode("overwrite").parquet(entry.path)
    else:
        writer.mode("append").parquet(entry.path)
    catalog.register(table, entry.path)  # refresh cached df


def delete_where(catalog, table: str, condition: str) -> int:
    """DELETE FROM t WHERE cond → keep the complement. Returns #deleted.

    One count action: #deleted = #rows where cond IS TRUE, the exact
    complement of the kept set (NOT cond OR cond IS NULL), so the old
    count-before + re-read-the-new-table-and-count-after pair (two
    actions, one of them re-reading the just-written files) collapses
    into a single filtered count over the original table."""
    df = catalog.table(table)
    kept = df.filter(f"NOT ({condition}) OR ({condition}) IS NULL")
    n_deleted = df.filter(condition).count()
    _rewrite(catalog, table, kept)
    return n_deleted


def update_set(
    catalog,
    table: str,
    assignments: dict[str, str],
    condition: str,
    post_assignments: "dict[str, str] | None" = None,
) -> int:
    """UPDATE t SET col = expr WHERE cond (copy-on-write).

    SQL's UPDATE is SIMULTANEOUS: every RHS and the condition evaluate
    against the ORIGINAL row (so `SET a = b, b = a` swaps) — one select
    over the original columns, never a chained withColumn (which would
    let later assignments and the re-evaluated condition see already-
    updated values; found by the generated-column recompute, r8).
    `post_assignments` run in a SECOND pass whose RHS see the
    post-update row — the generated-column recompute hook (applied to
    every row; generator expressions are deterministic, so recomputing
    unchanged rows is a no-op)."""
    df = catalog.table(table)
    cond = F.expr(condition)
    out = df.select(
        *[
            F.when(cond, F.expr(assignments[c])).otherwise(F.col(c)).alias(c)
            if c in assignments
            else F.col(c)
            for c in df.columns
        ]
    )
    if post_assignments:
        out = out.select(
            *[
                F.expr(post_assignments[c]).alias(c)
                if c in post_assignments
                else F.col(c)
                for c in out.columns
            ]
        )
    n = df.filter(condition).count()
    _rewrite(catalog, table, out)
    return n


def merge_into(
    catalog,
    target: str,
    source: DataFrame,
    on: str,
    when_matched_update: dict[str, str] | None = None,
    when_not_matched_insert: bool = True,
    when_matched_delete: bool = False,
    insert_values: dict[str, str] | None = None,
) -> dict:
    """MERGE INTO target USING source ON cond — the Delta-style upsert as
    a single FULL-outer-shaped plan:

      matched+update → target rows joined to source get the assignments
      matched+delete → drop matched target rows
      not-matched    → insert source rows with no target match

    Implemented as target⟕source (left) for the update/delete arm plus
    source-anti-target for inserts — two hash joins on the merge key, no
    row explosion (caller guarantees source has unique keys, as MERGE
    requires; duplicate source keys raise like Delta does).
    """
    tdf = catalog.table(target)
    cond = F.expr(on)

    # Every count the statement needs rides ONE probe action (guide
    # §1.2, fewer passes — was three separate .count() actions): the
    # semi / inner / anti arms are unioned with a tag column and
    # aggregated in a single pass. The arms are the SAME joins the old
    # counts ran, so every value is unchanged.
    #   matched  — target rows with >=1 source match (left_semi)
    #   pairs    — (target, source) match pairs (inner), for the MERGE
    #              precondition below; only when an update/delete arm
    #              makes it observable
    #   inserted — source rows with no target match (left_anti)
    arms = [tdf.join(source, cond, "left_semi").select(F.lit("matched").alias("__arm__"))]
    if when_matched_update or when_matched_delete:
        arms.append(
            tdf.join(source, cond, "inner").select(F.lit("pairs").alias("__arm__"))
        )
    if when_not_matched_insert:
        arms.append(
            source.join(tdf, cond, "left_anti").select(F.lit("inserted").alias("__arm__"))
        )
    probe = arms[0]
    for arm in arms[1:]:
        probe = probe.unionAll(arm)
    counts = {
        r["__arm__"]: r["n"]
        for r in probe.groupBy("__arm__").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_matched = counts.get("matched", 0)
    # MERGE precondition: no target row may match MULTIPLE source rows
    # (Delta throws DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET). The
    # pair-count vs matched-target-count comparison is CONDITION-
    # AGNOSTIC — the old on.split('=') key extraction silently broke on
    # compound or reversed-operand conditions (review r8: matched>0
    # reported while nothing updated).
    if when_matched_update or when_matched_delete:
        if counts.get("pairs", 0) > n_matched:
            raise ValueError(
                "MERGE: multiple source rows match the same key"
            )

    updated = tdf
    if when_matched_delete:
        updated = tdf.join(source, cond, "left_anti")
    elif when_matched_update:
        # literal marker column: src_marker must not depend on parsing
        # the condition (review r8) — a NULL marker after the LEFT join
        # means "no source match" for ANY condition shape
        marked = source.withColumn("__merge_src__", F.lit(True))
        joined = tdf.join(marked, cond, "left")
        out_cols = []
        src_marker = F.col("__merge_src__").isNotNull()
        for c in tdf.columns:
            if c in when_matched_update:
                out_cols.append(
                    F.when(src_marker, F.expr(when_matched_update[c]))
                    .otherwise(F.col(c))
                    .alias(c)
                )
            else:
                out_cols.append(F.col(c))
        updated = joined.select(*out_cols)

    n_inserted = 0
    if when_not_matched_insert:
        # WHEN NOT MATCHED THEN INSERT (cols) VALUES (exprs): explicit
        # mapping target-col -> source expr; unmapped target cols default
        # to same-name source col or NULL
        mapping = insert_values or {}
        inserts = source.join(tdf, cond, "left_anti").select(
            *[
                F.expr(mapping[c]).alias(c)
                if c in mapping
                else (F.col(c) if c in source.columns else F.lit(None).alias(c))
                for c in tdf.columns
            ]
        )
        n_inserted = counts.get("inserted", 0)
        updated = updated.unionByName(inserts)

    _rewrite(catalog, target, updated)
    return {
        "matched": n_matched,
        "inserted": n_inserted,
        # matched-but-untouched rows are NOT modifications: an
        # insert-only MERGE must not count its matches (review r8)
        "rows_modified": (
            n_matched if (when_matched_update or when_matched_delete) else 0
        )
        + n_inserted,
    }


def register_csv(catalog, name: str, path: str, **options) -> None:
    """CSV adapter ≈ file/CsvTranslatableTable.java:48 — spark.read.csv
    does projection+filter pushdown natively (CsvProjectTableScanRule)."""
    catalog.register(name, path, fmt="csv", header="true", inferSchema="true", **options)


def register_json(catalog, name: str, path: str, **options) -> None:
    """JSON adapter ≈ file/JsonScannableTable.java."""
    catalog.register(name, path, fmt="json", **options)


def clone_in_memory(catalog, name: str, as_name: str | None = None):
    """In-memory clone adapter ≈ adapter/clone/ArrayTable.java:62: cache a
    snapshot (Spark columnar cache is the ArrayTable analog)."""
    df = catalog.table(name).cache()
    df.count()  # materialize
    catalog.register_df(as_name or f"{name}_clone", df)
    return df
