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
    # corpus-pinned: redshift.iq:1004-1023 exercises ADD_MONTHS with
    # the month-end snap (native Redshift has it; the reference gates
    # the operator ORACLE+SPARK only) — the r13 snap variant carries
    # REDSHIFT so the redshift corpus gets the snap semantics too
    "ADD_MONTHS": {"REDSHIFT"},
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


# (name, lib) pairs the parser attributes to an operator because a
# NEIGHBORING declaration's withName(...) falls inside its lookahead
# window — each verified against the actual annotation and documented:
# ENDSWITH/STARTSWITH pick up the BQ ENDS_WITH/STARTS_WITH neighbors,
# MONTHNAME {MYSQL} only (:1081), PARSE_URL {HIVE, SPARK} (:479),
# REGEXP_CONTAINS {BIG_QUERY} (:582), DIFFERENCE {POSTGRESQL} (:1140),
# BIT_COUNT_BIG_QUERY {BIG_QUERY, SPARK} (:1168)
_PARSER_NOISE = {
    ("ENDSWITH", "BIG_QUERY"),
    ("STARTSWITH", "BIG_QUERY"),
    ("STARTSWITH", "POSTGRESQL"),
    ("MONTHNAME", "BIG_QUERY"),
    ("PARSE_URL", "POSTGRESQL"),
    ("PARSE_URL", "REDSHIFT"),
    ("REGEXP_CONTAINS", "MYSQL"),
    ("DIFFERENCE", "SPARK"),
    ("BIT_COUNT", "HIVE"),
}


def test_no_under_acceptance_vs_reference():
    """The inverse direction: a lib the reference grants that we refuse
    is an under-acceptance (a dialect user hits a refusal where the
    reference would accept). The r9 sweep granted 20+ of these
    (REDSHIFT's PG inheritance, the Spark-native UNIX_*/TIMESTAMP_*
    converters, BQ interval DATE_ADD/DATE_SUB variants, the PG
    log10-for-1-arg LOG variant, MariaDB TO_CHAR, ...)."""
    ref = _reference_lib_map()
    ours_by_name: dict[str, set] = {}
    for fn in registry.FUNCTIONS.values():
        bucket = ours_by_name.setdefault(fn.name.upper(), set())
        bucket.update(set(fn.libraries) - STD)
        if "STANDARD" in fn.libraries:
            bucket.add("*")
    missing = []
    for name, rlibs in ref.items():
        ours = ours_by_name.get(name)
        if ours is None or "*" in ours:
            continue
        lack = {l for l in rlibs - ours if (name, l) not in _PARSER_NOISE}
        if lack:
            missing.append((name, sorted(lack)))
    assert not missing, f"reference grants libs we refuse: {sorted(missing)}"


def test_pg_log_and_bq_date_add_variants(spark):
    """Semantic spot checks for the two grants that needed VARIANTS
    rather than a lib-list edit: PG's 1-arg LOG is base-10 (not ln),
    and BigQuery's DATE_ADD takes an INTERVAL."""
    e = registry.translate("LOG", "100", library="POSTGRESQL")
    assert spark.sql(f"SELECT {e} AS v").collect()[0].v == 2.0
    e = registry.translate("LOG", "2", "8", library="POSTGRESQL")
    assert spark.sql(f"SELECT {e} AS v").collect()[0].v == 3.0
    e = registry.translate(
        "DATE_ADD", "DATE '2020-01-31'", "INTERVAL '1' MONTH", library="BIG_QUERY"
    )
    assert str(spark.sql(f"SELECT {e} AS v").collect()[0].v) == "2020-02-29"
    # the Spark/Hive int-days base form is untouched
    e = registry.translate("DATE_ADD", "DATE '2020-01-01'", "30", library="SPARK")
    assert str(spark.sql(f"SELECT {e} AS v").collect()[0].v) == "2020-01-31"


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
