"""Arrow IPC / Feather source adapter.

Reference parity: the Arrow adapter module — `arrow/.../ArrowTable.java:67`
(scan with integer field projection), `ArrowTranslator.java:59` (filter
condition compiled to a Gandiva predicate evaluated during the scan),
`ArrowFilter.java:36` / `ArrowProject.java` / `ArrowRules.java` (push
filter + project from the plan into the scan).  Here the same pushdown
lands in `pyarrow.dataset` scanners: `columns=` is the ArrowProject
analog, `filter=` (a `pyarrow.compute.Expression`) is the Gandiva analog.

Spark-first scale design — Arrow IPC is not a Spark-native file format,
so the scan has two tiers:

* **driver tier** (small data, default < 256 MiB on disk):
  `pyarrow.dataset` -> one Arrow table -> `spark.createDataFrame`, which
  uses the Arrow-optimized converter (zero row-at-a-time work).  Bounded
  by an explicit size contract, same shape as the federation fetch.
* **distributed tier** (any size): the FILE LIST becomes a DataFrame
  (one row per file), repartitioned across the cluster, and
  `mapInArrow` opens each file executor-locally with pyarrow, applying
  the pushed projection + filter inside the scanner.  No driver
  materialization, no shuffle of data rows; reading scales with the
  number of files exactly like a parquet scan on a 1000-executor
  cluster.  Skew control: files are distributed round-robin by
  repartition on the path list.

Filter pushdown mirrors `ArrowTranslator`'s supported surface (binary
comparisons with literals, IS [NOT] NULL, AND of those).  Conjuncts the
translator cannot express in `pyarrow.compute` stay as a residual
Spark-side `.filter(...)` — same contract as Calcite keeping the
untranslatable remainder of a Filter above the ArrowTableScan
(`ArrowRules.java` only pushes what `ConditionToken` covers).
"""

from __future__ import annotations

import glob as _glob
import os
import re

from pyspark.sql import DataFrame, SparkSession

DRIVER_TIER_MAX_BYTES = 256 * 1024 * 1024

_CMP = re.compile(
    r"^\s*([A-Za-z_][A-Za-z_0-9]*)\s*(=|==|!=|<>|<=|>=|<|>)\s*(.+?)\s*$"
)
_NULLCHECK = re.compile(
    r"^\s*([A-Za-z_][A-Za-z_0-9]*)\s+IS\s+(NOT\s+)?NULL\s*$", re.I
)


def _parse_literal(text: str):
    """Literal forms ArrowTranslator.java:104-131 accepts: numerics,
    strings, booleans (dates handled there as epoch-millis; we keep the
    ISO string and let pyarrow cast)."""
    t = text.strip()
    if re.fullmatch(r"-?\d+", t):
        return int(t)
    if re.fullmatch(r"-?\d*\.\d+([eE][+-]?\d+)?|-?\d+[eE][+-]?\d+", t):
        return float(t)
    # a string literal must be ONE fully-quoted token ('' = escaped quote);
    # a prefix match like "'a' OR x = 'b'" is NOT a literal — treating it
    # as one would silently push a wrong predicate
    if re.fullmatch(r"'(?:[^']|'')*'", t):
        return t[1:-1].replace("''", "'")
    if t.upper() in ("TRUE", "FALSE"):
        return t.upper() == "TRUE"
    return None  # not a literal we translate — conjunct stays Spark-side


def translate_condition(cond: str | None, schema_names: set[str]):
    """Split a SQL condition into (pyarrow.compute expression | None,
    residual SQL string | None).  Top-level AND conjuncts of the shapes
    `col <cmp> literal` / `col IS [NOT] NULL` are pushed; everything
    else (OR trees, arithmetic, functions, col-col compares) is residual
    — the exact split ArrowRules makes between pushable ConditionTokens
    and the remaining Filter."""
    if not cond or not cond.strip():
        return None, None
    import pyarrow.compute as pc
    import pyarrow.dataset as ds

    from ..plans.rewrite import _split_conjuncts

    pushed = []
    residual = []
    for conj in _split_conjuncts(cond):
        c = conj.strip()
        while c.startswith("(") and c.endswith(")"):
            inner = c[1:-1].strip()
            # only strip if still balanced
            depth = 0
            ok = True
            for ch in inner:
                depth += ch == "("
                depth -= ch == ")"
                if depth < 0:
                    ok = False
                    break
            if ok and depth == 0:
                c = inner
            else:
                break
        m = _NULLCHECK.match(c)
        if m and m.group(1) in schema_names:
            f = ds.field(m.group(1))
            pushed.append(f.is_valid() if m.group(2) else ~f.is_valid())
            continue
        m = _CMP.match(c)
        if m and m.group(1) in schema_names:
            col, op, rhs = m.groups()
            lit = _parse_literal(rhs)
            if lit is not None:
                f = ds.field(col)
                expr = {
                    "=": lambda: f == lit,
                    "==": lambda: f == lit,
                    "!=": lambda: f != lit,
                    "<>": lambda: f != lit,
                    "<": lambda: f < lit,
                    "<=": lambda: f <= lit,
                    ">": lambda: f > lit,
                    ">=": lambda: f >= lit,
                }[op]()
                pushed.append(expr)
                continue
        residual.append(conj)

    pa_expr = None
    for e in pushed:
        pa_expr = e if pa_expr is None else pa_expr & e
    return pa_expr, (" AND ".join(residual) if residual else None)


def _expand_paths(path: str) -> list[str]:
    if os.path.isdir(path):
        out = sorted(
            p
            for p in _glob.glob(os.path.join(path, "*"))
            if p.endswith((".arrow", ".feather", ".ipc"))
        )
    elif any(ch in path for ch in "*?["):
        out = sorted(_glob.glob(path))
    else:
        out = [path]
    if not out:
        raise FileNotFoundError(f"no Arrow IPC files at {path}")
    return out


def _open_dataset(paths: list[str]):
    import pyarrow.dataset as ds

    # Feather v2 == Arrow IPC file format; pyarrow.dataset's "feather"
    # reader handles both (and memory-maps, so projection avoids I/O for
    # unread columns — the point of ArrowProject pushdown).
    return ds.dataset(paths, format="feather")


def read_arrow(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    condition: str | None = None,
    distributed: bool | None = None,
) -> DataFrame:
    """Scan Arrow IPC/Feather files into a DataFrame with projection and
    filter pushed into the pyarrow scanner (≈ ArrowTableScan with
    ArrowProject + ArrowFilter applied, arrow/ArrowRules.java).

    `distributed=None` auto-selects: driver tier below
    DRIVER_TIER_MAX_BYTES total file size, distributed `mapInArrow`
    above.  Residual (untranslatable) predicates are applied as a
    Spark-side filter on the result either way.
    """
    from pyspark.sql.pandas.types import from_arrow_schema

    paths = _expand_paths(path)
    dataset = _open_dataset(paths)
    schema_names = set(dataset.schema.names)
    if columns:
        missing = [c for c in columns if c not in schema_names]
        if missing:
            raise KeyError(f"columns not in Arrow schema: {missing}")
    pa_filter, residual = translate_condition(condition, schema_names)

    if distributed is None:
        total = sum(os.path.getsize(p) for p in paths)
        distributed = total > DRIVER_TIER_MAX_BYTES

    if not distributed:
        table = dataset.to_table(columns=columns, filter=pa_filter)
        # explicit schema: an empty filter result must not crash on
        # schema inference, and Arrow types must not drift through pandas
        df = spark.createDataFrame(
            table.to_pandas(), schema=from_arrow_schema(table.schema)
        )
    else:
        import pyarrow as pa

        from ..session import ensure_package_shipped

        # the scan closure references translate_condition by module ref;
        # workers must be able to import calcite_spark from any cwd
        ensure_package_shipped(spark)

        out_schema = dataset.schema
        if columns:
            out_schema = pa.schema([out_schema.field(c) for c in columns])
        spark_schema = from_arrow_schema(out_schema)
        cols = list(columns) if columns else None
        # ship only what the task function needs (strings/exprs pickle;
        # the dataset handle does not)
        filter_sql = condition

        def scan(batches):
            import pyarrow.dataset as ds_w

            for b in batches:
                for p in b.column(0).to_pylist():
                    d = ds_w.dataset([p], format="feather")
                    f_expr, _ = translate_condition(
                        filter_sql, set(d.schema.names)
                    )
                    for rb in d.to_batches(columns=cols, filter=f_expr):
                        if rb.num_rows:
                            yield rb.cast(out_schema)

        n_slices = min(
            len(paths), spark.sparkContext.defaultParallelism
        )
        files_df = spark.createDataFrame(
            [(p,) for p in paths], "path string"
        ).repartition(n_slices)
        df = files_df.mapInArrow(scan, spark_schema)

    if residual:
        df = df.filter(residual)
    return df


def register_arrow(catalog, name: str, path: str, **kwargs) -> None:
    """Arrow adapter catalog hook ≈ arrow/ArrowSchemaFactory.java /
    ArrowSchema.java (directory of .arrow files -> tables)."""
    df = read_arrow(catalog.spark, path, **kwargs)
    catalog.register_df(name, df)
