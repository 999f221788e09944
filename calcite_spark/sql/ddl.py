"""DDL executor ≈ server/src/main/java/org/apache/calcite/server/
ServerDdlExecutor.java:116 (grammar: server parserImpls.ftl):
CREATE/DROP TABLE (AS), VIEW, MATERIALIZED VIEW, FUNCTION — executed
against our Catalog. Spark SQL has native DDL for its own catalog;
this executor exists for the pieces Spark lacks (MATERIALIZED VIEW →
MaterializationRegistry; CTAS into plain parquet paths; FUNCTION from a
Python callable path).
"""

from __future__ import annotations

import os
import re

from calcite_spark.plans.materialize import MaterializationRegistry

_CREATE_VIEW = re.compile(r"^\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+(\w+)\s+AS\s+(.*)$", re.I | re.S)
_CREATE_TABLE_AS = re.compile(r"^\s*CREATE\s+TABLE\s+(\w+)\s+AS\s+(.*)$", re.I | re.S)
_CREATE_MV = re.compile(
    r"^\s*CREATE\s+MATERIALIZED\s+VIEW\s+(\w+)\s+AS\s+"
    r"SELECT\s+(.*?)\s+FROM\s+(\w+)\s+GROUP\s+BY\s+(.*?)\s*$",
    re.I | re.S,
)
_DROP = re.compile(r"^\s*DROP\s+(TABLE|VIEW|MATERIALIZED\s+VIEW)\s+(IF\s+EXISTS\s+)?(\w+)\s*$", re.I)
_CREATE_FUNCTION = re.compile(
    r"^\s*CREATE\s+FUNCTION\s+(\w+)\s+AS\s+'([^']+)'(?:\s+RETURNS\s+(\w+))?\s*$", re.I
)


class DdlExecutor:
    """execute(sql) routes each statement kind ≈ ServerDdlExecutor's
    per-SqlNode execute() overloads (:60-66)."""

    def __init__(self, frontend, warehouse_dir: str):
        self.fe = frontend
        self.catalog = frontend.catalog
        self.warehouse = warehouse_dir
        os.makedirs(warehouse_dir, exist_ok=True)
        if not hasattr(self.catalog, "mv_registry"):
            self.catalog.mv_registry = MaterializationRegistry()

    def execute(self, sql: str):
        sql = sql.strip().rstrip(";")
        m = _CREATE_MV.match(sql)
        if m:
            return self._create_mv(m.group(1), m.group(2), m.group(3), m.group(4))
        m = _CREATE_VIEW.match(sql)
        if m:
            df = self.fe.sql(m.group(3))
            self.catalog.register_df(m.group(2), df)
            return {"view": m.group(2)}
        m = _CREATE_TABLE_AS.match(sql)
        if m:
            name, query = m.group(1), m.group(2)
            path = os.path.join(self.warehouse, name)
            self.fe.sql(query).write.mode("errorifexists").parquet(path)
            self.catalog.register(name, path)
            return {"table": name, "path": path}
        m = _DROP.match(sql)
        if m:
            name = m.group(3)
            existed = name in self.catalog.tables
            if not existed and not m.group(2):
                raise ValueError(f"{name} does not exist")
            self.catalog.tables.pop(name, None)
            self.catalog._dfs.pop(name, None)
            if hasattr(self.catalog, "mv_registry"):
                self.catalog.mv_registry.mvs.pop(name, None)
            self.catalog.spark.catalog.dropTempView(name)
            return {"dropped": name, "existed": existed}
        m = _CREATE_FUNCTION.match(sql)
        if m:
            from calcite_spark.functions.udf import load_functions_from_model

            load_functions_from_model(
                self.catalog,
                [{"name": m.group(1), "callable": m.group(2),
                  "returnType": (m.group(3) or "string").lower()}],
            )
            return {"function": m.group(1)}
        raise ValueError(f"unsupported DDL: {sql[:80]}")

    def _create_mv(self, name: str, select_list: str, table: str, group_by: str):
        """CREATE MATERIALIZED VIEW mv AS SELECT k1, k2, FN(x) AS a...
        FROM t GROUP BY k1, k2 — the exact shape MaterializationRegistry
        rewrites (ServerDdlExecutor materialized-view branch)."""
        keys = [k.strip() for k in group_by.split(",")]
        calls = []
        for item in _split_top_level(select_list):
            item = item.strip()
            if item in keys:
                continue
            calls.append(item)
        path = os.path.join(self.warehouse, name)
        mv = self.catalog.mv_registry.define(self.catalog, name, table, keys, calls, path)
        return {"materialized_view": name, "keys": keys, "aggs": list(mv.agg_calls)}


def _split_top_level(text: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in text:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out
