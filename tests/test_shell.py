"""SQL shell (`python -m calcite_spark` ≈ the reference's sqlline
wrapper): statement routing (query vs DDL), bang commands, table
rendering. Runs the dispatch pieces in-session — the subprocess
entrypoint itself is exercised by the module smoke path."""

from __future__ import annotations

from calcite_spark.__main__ import _fmt_table, _run_statement


def test_fmt_table_alignment_and_truncation():
    out = _fmt_table(["a", "long_col"], [(1, "x"), (22, None), (3, "zzz")], 2)
    lines = out.splitlines()
    assert lines[1] == "| a  | long_col |"
    assert "| 22 | NULL     |" in lines
    assert out.endswith("3 row(s) (1 not shown)")
    # header wider than every cell
    empty = _fmt_table(["only_header"], [], 5)
    assert empty.endswith("0 row(s)")


def test_run_statement_routes_query_and_ddl(spark, tmp_path):
    from calcite_spark.catalog import Catalog
    from calcite_spark.sql.ddl import DdlExecutor
    from calcite_spark.sql.frontend import SqlFrontend
    from tests.conftest import SF_DIR

    cat = Catalog(spark).register_parquet_dir(SF_DIR)
    cat.register_all_views()
    fe = SqlFrontend(cat)
    ddl = DdlExecutor(fe, str(tmp_path / "wh"))

    out = _run_statement(fe, ddl, "SELECT count(*) AS n FROM region", 10)
    assert "| n " in out or "| n" in out
    assert "| 5 " in out

    out = _run_statement(
        ddl=ddl, fe=fe, max_rows=10,
        text="CREATE VIEW shell_v AS SELECT r_name FROM region",
    )
    assert "shell_v" in out
    out = _run_statement(fe, ddl, "SELECT count(*) AS n FROM shell_v", 10)
    assert "| 5 " in out
