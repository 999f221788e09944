"""Mechanical library-gating audit: every registry entry's lib list is
checked against the reference's @LibraryOperator annotations
(sql/fun/SqlLibraryOperators.java), the defect class behind the
r8-verdict REGEXP_SUBSTR finding and the r9 re-gates (DATEPART,
BOOLAND/BITAND_AGG, ENDS_WITH, HYPOT, TRY_CAST, BASE64 family,
URL_ENCODE, CONVERT_TIMEZONE, DATEADD, the BQ/HIVE collection-function
blanket). A lib in our list but not the reference's is an
over-acceptance UNLESS the target engine genuinely has the function
with our semantics — those deliberate extensions live in ALLOWED_EXTRA
with their rationale, so any NEW drift fails this test.
"""

from __future__ import annotations

import re

import pytest

from calcite_spark.functions import registry

REF = "/root/reference/core/src/main/java/org/apache/calcite/sql/fun/SqlLibraryOperators.java"

# (base name, frozenset of extra libs) -> why the extension is kept.
# "engine-true" = the real engine has the function with the semantics
# our template emits (verified against the engine's docs/behavior).
ALLOWED_EXTRA = {
    # Spark's higher-order aggregate(arr, init, merge) — a different
    # operator from the reference's CALCITE-lib AGGREGATE(measure)
    "AGGREGATE": {"SPARK"},
    # engine-true: MySQL has BIN/CRC32/FIND_IN_SET/HEX/SUBSTRING_INDEX
    # and the REGEXP operator natively
    "BIN": {"MYSQL"},
    "CRC32": {"MYSQL"},
    "FIND_IN_SET": {"MYSQL"},
    "HEX": {"MYSQL"},
    "REGEXP": {"MYSQL"},
    "SUBSTRING_INDEX": {"MYSQL"},
    # engine-true 2-arg DATEDIFF(a, b) = whole days (Spark/Hive/MySQL
    # all have it); the reference registers only the 3-arg
    # {MSSQL, REDSHIFT, SNOWFLAKE} form, which our variants carry
    "DATEDIFF": {"HIVE", "MYSQL", "SPARK"},
    # engine-true int-days date_add/date_sub (Spark/Hive); the
    # reference's DATE_ADD is BigQuery's (date, INTERVAL) form
    "DATE_ADD": {"HIVE", "SPARK"},
    "DATE_SUB": {"HIVE", "SPARK"},
    # engine-true: PG has date_trunc/substr; Oracle and PG have
    # numeric trunc()
    "DATE_TRUNC": {"POSTGRESQL"},
    "SUBSTR": {"POSTGRESQL"},
    "TRUNC": {"ORACLE", "POSTGRESQL"},
    # engine-true: Spark/Hive regexp_extract, Spark regexp_extract_all
    # and regexp_replace; Oracle REGEXP_INSTR — the reference gates
    # these narrower than the engines' real surfaces
    "REGEXP_EXTRACT": {"HIVE", "SPARK"},
    "REGEXP_EXTRACT_ALL": {"SPARK"},
    "REGEXP_INSTR": {"ORACLE"},
    "REGEXP_REPLACE": {"SPARK", "POSTGRESQL"},  # PG: the reference's
    # REGEXP_REPLACE_PG_3/_PG_4 are PG-gated; the audit's regex misses
    # their field-name indirection
    # deliberately engineered LOG family (base-order per dialect,
    # COVERAGE §2.6 notes; the reference keeps LOG/LOG_MYSQL separate)
    "LOG": {"HIVE", "MYSQL", "SPARK"},
    # corpus-pinned: Redshift has SYSDATE (redshift.iq tier); BigQuery
    # has TO_BASE64 (the reference gates only MYSQL)
    "SYSDATE": {"REDSHIFT"},
    "TO_BASE64": {"BIG_QUERY"},
}

STD = {"STANDARD", "ALL"}


def _reference_lib_map() -> dict[str, set]:
    src = open(REF).read()
    pat = re.compile(
        r"@LibraryOperator\(libraries\s*=\s*\{([^}]*)\}"
        r"(?:,\s*exceptLibraries\s*=\s*\{([^}]*)\})?\)\s*"
        r"public static final \w+ (\w+)\s*=",
        re.S,
    )
    ref: dict[str, set] = {}
    for m in pat.finditer(src):
        libs = [x.strip() for x in m.group(1).split(",") if x.strip()]
        exc = [x.strip() for x in (m.group(2) or "").split(",") if x.strip()]
        tail = src[m.end() : m.end() + 400]
        nm = re.search(r'(?:create|withName)\(\s*"([A-Z_0-9.]+)"', tail)
        name = (nm.group(1) if nm else m.group(3)).upper()
        bucket = ref.setdefault(name, set())
        bucket.update(l for l in libs if l not in ("ALL", "SPATIAL"))
        # SqlLibrary.REDSHIFT inherits POSTGRESQL unless excepted
        if "POSTGRESQL" in libs and "REDSHIFT" not in exc:
            bucket.add("REDSHIFT")
    return ref


def test_lib_lists_match_reference_annotations():
    ref = _reference_lib_map()
    assert len(ref) > 200, "reference parse regressed"
    violations = []
    for key, fn in registry.FUNCTIONS.items():
        base = fn.name.upper()
        if base not in ref:
            continue  # names outside the reference's library tables
        ours = set(fn.libraries) - STD
        extra = ours - ref[base] - ALLOWED_EXTRA.get(base, set())
        if extra:
            violations.append((key, sorted(extra), sorted(ref[base])))
    assert not violations, (
        "lib lists exceed the reference's @LibraryOperator annotations "
        f"(add to ALLOWED_EXTRA only with engine-true rationale): {violations}"
    )


def test_regated_nonexistent_names_refuse():
    """The r9 audit's fix class: lookups under engines that do NOT have
    the function must miss (the pre-audit blanket granted them)."""
    cases = [
        ("ARRAY_CONTAINS", "BIG_QUERY"),   # BQ arrays use OFFSET/IN UNNEST
        ("MAP_KEYS", "BIG_QUERY"),
        ("MAP_KEYS", "HIVE"),              # Hive: map_keys exists! see below
        ("SORT_ARRAY", "BIG_QUERY"),
        ("CRC32", "BIG_QUERY"),
        ("SHA2", "BIG_QUERY"),             # BQ spells it SHA256
        ("BASE64", "MYSQL"),               # MySQL spells it TO_BASE64
        ("FROM_BASE64", "HIVE"),           # Hive spells it unbase64
        ("URL_ENCODE", "BIG_QUERY"),
        ("CONVERT_TIMEZONE", "POSTGRESQL"),  # PG uses AT TIME ZONE
        ("DATEADD", "MYSQL"),
        ("DATEADD", "ORACLE"),
        ("ARRAY_SLICE", "BIG_QUERY"),
    ]
    for name, lib in cases:
        if (name, lib) == ("MAP_KEYS", "HIVE"):
            continue  # documented: Hive has map_keys, but the
            # reference gates the operator {SPARK}; we follow the
            # reference (library-less lookups still resolve)
        assert registry.lookup(name, lib) is None, (name, lib)
    # library-less lookups keep resolving (the engine's own surface)
    for name in ("ARRAY_CONTAINS", "SORT_ARRAY", "MAP_KEYS", "DATEADD"):
        assert registry.lookup(name) is not None, name
