"""Interactive SQL shell ≈ the reference's sqlline front end
(`sqlline`, `sqlline.bat` at the repo root; Calcite ships its CLI as a
sqlline wrapper over a CalciteConnection).

    python -m calcite_spark [--sf-dir DIR] [-e "SQL"] [--max-rows N]

Statements route through the full front end (SIMILAR TO, FOR
SYSTEM_TIME AS OF, TUMBLE/HOP/SESSION TVFs, custom types) and the DDL
executor (CREATE VIEW / TABLE AS / MATERIALIZED VIEW / TYPE /
FUNCTION). sqlline-style bang commands:

    !tables            list registered tables
    !describe <t>      schema of a table
    !explain <sql>     formatted physical plan
    !quit              exit
"""

from __future__ import annotations

import argparse
import os
import sys


def _fmt_table(cols: list[str], rows: list[tuple], max_rows: int) -> str:
    shown = rows[:max_rows]
    cells = [[("NULL" if v is None else str(v)) for v in r] for r in shown]
    widths = [
        max(len(c), *(len(row[i]) for row in cells)) if cells else len(c)
        for i, c in enumerate(cols)
    ]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [sep, "|" + "|".join(f" {c:<{w}} " for c, w in zip(cols, widths)) + "|", sep]
    for row in cells:
        out.append("|" + "|".join(f" {v:<{w}} " for v, w in zip(row, widths)) + "|")
    out.append(sep)
    tail = f"{len(rows)} row(s)"
    if len(rows) > max_rows:
        tail += f" ({len(rows) - max_rows} not shown)"
    out.append(tail)
    return "\n".join(out)


def _run_statement(fe, ddl, text: str, max_rows: int) -> str:
    head = text.lstrip().split(None, 1)[0].upper() if text.strip() else ""
    if head in ("CREATE", "DROP", "INSERT", "UPDATE", "DELETE", "MERGE", "ANALYZE"):
        return str(ddl.execute(text))
    df = fe.sql(text)
    if df.isStreaming:
        return "(streaming query — attach a writeStream sink to consume)"
    rows = [tuple(r) for r in df.collect()]
    return _fmt_table(list(df.columns), rows, max_rows)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m calcite_spark")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="parquet table directory to mount",
    )
    ap.add_argument("-e", "--execute", action="append", default=None,
                    help="run statement(s) and exit (repeatable)")
    ap.add_argument("--max-rows", type=int, default=50)
    args = ap.parse_args(argv)

    from calcite_spark.catalog import open_catalog
    from calcite_spark.session import get_spark
    from calcite_spark.sql.ddl import DdlExecutor
    from calcite_spark.sql.frontend import SqlFrontend

    spark = get_spark("calcite_spark_shell")
    spark.sparkContext.setLogLevel("ERROR")
    cat = open_catalog(spark, args.sf_dir)
    cat.register_all_views()
    fe = SqlFrontend(cat)
    ddl = DdlExecutor(fe, os.path.join(os.getcwd(), "spark-warehouse"))

    def dispatch(line: str) -> str | None:
        line = line.strip().rstrip(";")
        if not line:
            return None
        if line in ("!quit", "!exit"):
            raise EOFError
        if line == "!tables":
            return "\n".join(sorted(cat.tables))
        if line.startswith("!describe"):
            t = line.split(None, 1)[1]
            return "\n".join(f"{f.name}\t{f.dataType.simpleString()}"
                             for f in cat.table(t).schema.fields)
        if line.startswith("!explain"):
            from calcite_spark.exec import explain_str

            return explain_str(fe.sql(line.split(None, 1)[1]))
        return _run_statement(fe, ddl, line, args.max_rows)

    if args.execute:
        for stmt in args.execute:
            out = dispatch(stmt)
            if out is not None:
                print(out)
        return 0

    print(f"calcite_spark shell — tables from {args.sf_dir}; !quit to exit")
    while True:
        try:
            line = input("sql> ")
        except (EOFError, KeyboardInterrupt):
            print()
            return 0
        try:
            out = dispatch(line)
        except EOFError:
            return 0
        except Exception as e:  # shell survives bad statements
            out = f"ERROR: {type(e).__name__}: {e}"
        if out is not None:
            print(out)


if __name__ == "__main__":
    sys.exit(main())
