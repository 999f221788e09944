"""MATCH_RECOGNIZE ≈ rel/core/Match.java:62 + EnumerableMatch.java:68
(pattern :66, patternDefinitions :71, measures :65, after :70,
partitionKeys :75, orderKeys :76; spec tests core/src/test/resources/
sql/match.iq).

Spark has no row-pattern matching, so this is the §7.4 "custom" tier:

1. **Symbol classification stays in Spark (JVM)**: each DEFINE
   condition becomes a boolean column; `PREV(col, n)` / `NEXT(col, n)`
   references are rewritten to `lag/lead(col, n)` window columns over
   (PARTITION BY keys ORDER BY order keys). 100 TB note: this is one
   window shuffle — the same cost class as any windowed aggregate.
2. **The NFA runs per partition-key group in `applyInPandas`**: the
   pandas worker sees only (order keys, measure inputs, k boolean
   symbol columns), walks a Thompson NFA with greedy quantifiers, and
   emits one row per match (ONE ROW PER MATCH). State is bounded by the
   pattern, rows stream in order — memory per group is O(longest
   match), not O(group).

Supported surface: concatenation, alternation `|`, grouping
`(...)`, quantifiers `* + ? {m} {m,} {m,n}` (greedy); DEFINE with
PREV/NEXT; AFTER MATCH SKIP PAST LAST ROW / TO NEXT ROW / TO [FIRST|
LAST] symbol (Match.java:70); ONE ROW PER MATCH and ALL ROWS PER MATCH
(Match.java:69 `allRows`, running-measure semantics); SUBSET union
symbols (Match.java:74 `subsets`); WITHIN duration (Match.java:77
`interval`); measures FIRST(S.col) LAST(S.col) COUNT(S.*) COUNT(*),
bare S.col (≡ LAST), CLASSIFIER(), MATCH_NUMBER(). Unbounded streaming
patterns are out of scope (SURVEY §7.4).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd

from pyspark.sql import DataFrame, functions as F

# ---------------------------------------------------------------------
# Pattern → NFA (Thompson construction)
# ---------------------------------------------------------------------


@dataclass
class _NFA:
    # transitions: state -> list[(symbol|None, next_state)]; None = epsilon
    transitions: dict = field(default_factory=dict)
    start: int = 0
    accept: int = 1


def _tokenize(pattern: str):
    # the comma token exists only for PERMUTE(...) element lists; a
    # bare comma anywhere else is a parse error (it used to be dropped
    # silently, which would mis-parse PERMUTE(A, B) as symbol + group)
    return re.findall(r"[A-Za-z_][A-Za-z_0-9]*|\{\d*,?\d*\}|[()|*+?,]", pattern)


class _PatternParser:
    """Recursive-descent: alt := seq ('|' seq)*; seq := rep+;
    rep := atom ('*'|'+'|'?'|'{m,n}')?; atom := SYMBOL | '(' alt ')'."""

    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0
        self.n_states = 0
        self.trans: dict[int, list] = {}

    def _state(self):
        s = self.n_states
        self.n_states += 1
        self.trans[s] = []
        return s

    def _edge(self, a, b, sym=None):
        self.trans[a].append((sym, b))

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def eat(self, tok=None):
        t = self.peek()
        if tok and t != tok:
            raise ValueError(f"pattern: expected {tok}, got {t}")
        self.i += 1
        return t

    def parse(self):
        s, e = self.alt()
        if self.peek() is not None:
            raise ValueError(f"pattern: trailing {self.peek()}")
        nfa = _NFA(self.trans, s, e)
        return nfa

    def alt(self):
        frags = [self.seq()]
        while self.peek() == "|":
            self.eat("|")
            frags.append(self.seq())
        if len(frags) == 1:
            return frags[0]
        s, e = self._state(), self._state()
        for fs, fe in frags:
            self._edge(s, fs)
            self._edge(fe, e)
        return s, e

    def seq(self):
        frags = []
        while self.peek() is not None and self.peek() not in (")", "|", ","):
            frags.append(self.rep())
        if not frags:
            s = self._state()
            return s, s
        for (a_s, a_e), (b_s, b_e) in zip(frags, frags[1:]):
            self._edge(a_e, b_s)
        return frags[0][0], frags[-1][1]

    def rep(self):
        frag = self.atom()
        t = self.peek()
        if t in ("*", "+", "?"):
            self.eat()
            s, e = self._state(), self._state()
            fs, fe = frag
            self._edge(s, fs)
            self._edge(fe, e)
            if t in ("*", "?"):
                self._edge(s, e)
            if t in ("*", "+"):
                self._edge(fe, fs)
            return s, e
        if t and t.startswith("{"):
            self.eat()
            m = re.match(r"\{(\d*)(,)?(\d*)\}", t)
            lo = int(m.group(1) or 0)
            hi = int(m.group(3)) if m.group(3) else (lo if not m.group(2) else None)
            return self._repeat(frag, lo, hi)
        return frag

    def _clone(self, frag):
        (fs, fe) = frag
        mapping = {}

        def get(s):
            if s not in mapping:
                mapping[s] = self._state()
            return mapping[s]

        stack, seen = [fs], set()
        while stack:
            s = stack.pop()
            if s in seen:
                continue
            seen.add(s)
            for sym, nxt in list(self.trans[s]):
                self._edge(get(s), get(nxt), sym)
                stack.append(nxt)
        return get(fs), get(fe)

    def _repeat(self, frag, lo, hi):
        s = self._state()
        cur = s
        for _ in range(lo):
            fs, fe = self._clone(frag)
            self._edge(cur, fs)
            cur = fe
        e = self._state()
        if hi is None:  # {m,} — loop on last clone
            fs, fe = self._clone(frag)
            self._edge(cur, fs)
            self._edge(fe, fs)
            self._edge(fe, e)
            self._edge(cur, e)
        else:
            self._edge(cur, e)
            for _ in range(hi - lo):
                fs, fe = self._clone(frag)
                self._edge(cur, fs)
                cur = fe
                self._edge(cur, e)
        return s, e

    def atom(self):
        t = self.peek()
        if t == "(":
            self.eat("(")
            frag = self.alt()
            self.eat(")")
            return frag
        if (
            t
            and t.upper() == "PERMUTE"
            and self.i + 1 < len(self.toks)
            and self.toks[self.i + 1] == "("
        ):
            return self.permute()
        if t and re.match(r"^[A-Za-z_]", t):
            self.eat()
            s, e = self._state(), self._state()
            self._edge(s, e, t.upper())
            return s, e
        raise ValueError(f"pattern: unexpected {t}")

    def permute(self):
        """PERMUTE(p1, ..., pn) ≈ SqlMatchRecognize's PERMUTE (the SQL
        standard expands it to the alternation of all n! orderings,
        preferred in lexicographic order of the element list — the same
        order itertools.permutations yields). Elements may be full
        sub-patterns, not just symbols. n > 6 refuses: a 5040-way
        alternation is a pattern smell, not a use case."""
        import itertools

        self.eat()  # PERMUTE
        self.eat("(")
        items = [self.alt()]
        while self.peek() == ",":
            self.eat(",")
            items.append(self.alt())
        self.eat(")")
        if len(items) > 6:
            raise ValueError(
                f"PERMUTE with {len(items)} elements refused (n! expansion)"
            )
        s, e = self._state(), self._state()
        for perm in itertools.permutations(range(len(items))):
            cur = s
            for idx in perm:
                fs, fe = self._clone(items[idx])
                self._edge(cur, fs)
                cur = fe
            self._edge(cur, e)
        return s, e


def compile_pattern(pattern: str) -> tuple[_NFA, list[str]]:
    toks = _tokenize(pattern)
    nfa = _PatternParser(toks).parse()
    # symbols from the built NFA's edges, not the raw token list — the
    # PERMUTE operator token is not a symbol
    symbols = sorted(
        {sym for edges in nfa.transitions.values() for sym, _ in edges if sym}
    )
    return nfa, symbols


# ---------------------------------------------------------------------
# Greedy longest-match walk over a boolean symbol matrix
# ---------------------------------------------------------------------


def _eps_closure(nfa: _NFA, states: set) -> set:
    out = set(states)
    stack = list(states)
    while stack:
        s = stack.pop()
        for sym, nxt in nfa.transitions.get(s, ()):
            if sym is None and nxt not in out:
                out.add(nxt)
                stack.append(nxt)
    return out


def _state_closures(nfa: _NFA) -> dict:
    """Per-state epsilon closures, memoized on the NFA (a compiled pattern
    is immutable after construction; the walk below hits closures once per
    transition per row, so computing them once per pattern instead is a
    pure-Python hot-loop saving — guide §4)."""
    cl = getattr(nfa, "_closures", None)
    if cl is None:
        cl = {s: tuple(_eps_closure(nfa, {s})) for s in nfa.transitions}
        nfa._closures = cl
    return cl


def _longest_match(nfa: _NFA, rows_syms, start: int, end: int | None = None):
    """Greedy: longest match starting at `start`, scanning rows
    [start, end) (end=None ⇒ len(rows_syms) — the explicit bound lets
    WITHIN callers avoid re-slicing the row list per start position);
    returns (end_exclusive, classifier list) or None.
    rows_syms[i] = set of symbols true on row i."""
    closures = _state_closures(nfa)
    states = set(closures[nfa.start])
    best = None
    # track per-state the classifier path (first-come wins — adequate for
    # deterministic DEFINE predicates)
    state_paths = {s: [] for s in states}
    if nfa.accept in states and best is None:
        best = (start, [])
    i = start
    n = len(rows_syms) if end is None else end
    trans = nfa.transitions
    while i < n and states:
        row = rows_syms[i]
        nxt_paths: dict[int, list] = {}
        for s in states:
            for sym, nxt in trans.get(s, ()):
                if sym is not None and sym in row:
                    cand = state_paths[s] + [sym]
                    for t in closures[nxt]:
                        if t not in nxt_paths:
                            nxt_paths[t] = cand
        states = set(nxt_paths)
        state_paths = nxt_paths
        i += 1
        if nfa.accept in states:
            best = (i, state_paths[nfa.accept])
    return best


# ---------------------------------------------------------------------
# Public operator
# ---------------------------------------------------------------------

_PREV_RE = re.compile(r"(PREV|NEXT)\s*\(\s*(?:[A-Za-z_]\w*\.)?(\w+)\s*(?:,\s*(\d+))?\s*\)", re.I)
_MEASURE_RE = re.compile(
    r"^(?:(FIRST|LAST|COUNT)\s*\(\s*)?(?:([A-Za-z_]\w*)\.)?(\w+|\*)\s*\)?\s*$", re.I
)


def match_recognize(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    pattern: str,
    define: dict[str, str],
    measures: dict[str, str],
    after_match: str = "SKIP PAST LAST ROW",
    schema_hints: dict[str, str] | None = None,
    all_rows: bool = False,
    subsets: dict[str, tuple] | None = None,
    within: float | str | None = None,
) -> DataFrame:
    """measures: out_name -> measure expr (FIRST/LAST/COUNT over symbol
    columns, bare col, CLASSIFIER(), MATCH_NUMBER()). DEFINE exprs are
    Spark SQL over the row, PREV(col[, n]) / NEXT(col[, n]) allowed.

    all_rows=True ≈ ALL ROWS PER MATCH (Match.java:69): one output row
    per matched input row, all input columns passed through, measures
    RUNNING (evaluated over the match prefix up to the current row) per
    the SQL standard's default inside ALL ROWS PER MATCH.
    subsets ≈ SUBSET U = (A, B): union symbols usable in measures and
    AFTER MATCH SKIP TO. within ≈ WITHIN interval: seconds (number) or
    a pandas Timedelta string; the match's span over the first ORDER BY
    column must fit inside it."""
    from calcite_spark.session import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    nfa, symbols = compile_pattern(pattern)
    subsets = {k.upper(): tuple(s.upper() for s in v) for k, v in (subsets or {}).items()}
    for s in symbols:
        if s not in {k.upper() for k in define}:
            define = {**define, s: "true"}  # undefined symbol matches any row

    # 1) rewrite PREV/NEXT to lag/lead helper columns, classify in Spark
    over = (
        f"OVER (PARTITION BY {', '.join(partition_by)} ORDER BY {', '.join(order_by)})"
        if partition_by
        else f"OVER (ORDER BY {', '.join(order_by)})"
    )
    helper_cols: dict[str, str] = {}

    def rewrite(cond: str) -> str:
        def sub(m):
            fn, col, off = m.group(1).lower(), m.group(2), m.group(3) or "1"
            fn = "lag" if fn == "prev" else "lead"
            name = f"__{fn}_{col}_{off}"
            helper_cols[name] = f"{fn}({col}, {off}) {over}"
            return name

        return _PREV_RE.sub(sub, cond)

    sym_exprs = {s.upper(): rewrite(c) for s, c in define.items()}
    work = df
    if partition_by:
        # single-file inputs collapse the window/apply shuffle to ONE
        # AQE-coalesced task (bytes are tiny, the Python NFA is not);
        # hash-repartitioning on the partition keys feeds BOTH the
        # helper-column window and the groupBy below without any extra
        # exchange, and no-ops at scale (exec.parallelize_grouped_input)
        from calcite_spark.exec import parallelize_grouped_input

        work = parallelize_grouped_input(work, partition_by)
    for name, expr in helper_cols.items():
        work = work.selectExpr("*", f"{expr} AS {name}")
    for s in symbols:
        work = work.selectExpr("*", f"coalesce(CAST(({sym_exprs[s]}) AS BOOLEAN), false) AS __sym_{s}")

    # 2) parse measures
    parsed = []
    in_dtypes = dict(df.dtypes)
    out_fields = []
    for out_name, mexpr in measures.items():
        stripped = mexpr.strip().upper().replace(" ", "")
        if stripped == "CLASSIFIER()":
            parsed.append((out_name, "CLASSIFIER", None, None))
            out_fields.append(f"{out_name} string")
            continue
        if stripped == "MATCH_NUMBER()":
            parsed.append((out_name, "MATCH_NUMBER", None, None))
            out_fields.append(f"{out_name} bigint")
            continue
        m = _MEASURE_RE.match(mexpr.strip())
        if not m:
            raise ValueError(f"unsupported measure: {mexpr}")
        fn = (m.group(1) or "LAST").upper()
        sym = m.group(2).upper() if m.group(2) else None
        col = m.group(3)
        parsed.append((out_name, fn, sym, col))
        if fn == "COUNT":
            out_fields.append(f"{out_name} bigint")
        else:
            out_fields.append(f"{out_name} {in_dtypes[col]}")
    if all_rows:
        # ALL ROWS PER MATCH: every input column passes through
        passthrough = list(in_dtypes)
        base_fields = ", ".join(f"{c} {in_dtypes[c]}" for c in passthrough)
    else:
        passthrough = list(partition_by)
        base_fields = ", ".join(f"{k} {in_dtypes[k]}" for k in partition_by)
    out_schema = (base_fields + ", " if base_fields else "") + ", ".join(
        ["match_seq bigint"] + out_fields
    )

    # AFTER MATCH SKIP ... (Match.java:70 Match.AfterOption)
    am = after_match.upper()
    skip_to_m = re.match(r"SKIP\s+TO\s+(?:(FIRST|LAST)\s+)?([A-Za-z_]\w*)$", am)
    if "PAST" in am:
        skip = ("PAST", None, None)
    elif "NEXT ROW" in am:
        skip = ("NEXT", None, None)
    elif skip_to_m and skip_to_m.group(2) != "ROW":
        skip = ("TO", (skip_to_m.group(1) or "LAST").upper(), skip_to_m.group(2).upper())
    else:
        raise ValueError(f"unsupported AFTER MATCH clause: {after_match}")

    order_cols = [o.split()[0] for o in order_by]
    within_td = None
    if within is not None:
        within_td = (
            pd.Timedelta(seconds=within)
            if isinstance(within, (int, float))
            else pd.Timedelta(within)
        )
    time_col = order_cols[0]

    def expand_sym(sym):
        """SUBSET-aware symbol set (Match.java:74)."""
        return set(subsets.get(sym, (sym,)))

    # columns whose VALUES the output needs (measure args + passthrough +
    # the WITHIN time column) — materialized once per group as numpy
    # arrays; per-row pandas .iloc/.iterrows access dominated the walk
    # (guide §4: shrink the per-row Python work, not just the boundary)
    value_cols = set(passthrough)
    for _out_name, _fn, _sym, _col in parsed:
        if _col and _col != "*":
            value_cols.add(_col)
    if within is not None:
        value_cols.add(time_col)

    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        col_arr = {c: pdf[c].to_numpy() for c in value_cols}
        sym_masks = [pdf[f"__sym_{s}"].to_numpy() for s in symbols]
        syms_per_row = [
            {s for s, flag in zip(symbols, flags) if flag}
            for flags in zip(*sym_masks)
        ]
        time_vals = col_arr[time_col] if within_td is not None else None
        within_np = (
            within_td.to_timedelta64() if within_td is not None else None
        )

        def measure_value(fn, sym, col, start, classifiers, upto, seq):
            """Evaluate one measure over match rows [0, upto) (absolute row
            start+j); RUNNING semantics when upto < match length (ALL ROWS
            PER MATCH default)."""
            if fn == "CLASSIFIER":
                return classifiers[upto - 1]
            if fn == "MATCH_NUMBER":
                return seq
            members = expand_sym(sym) if sym else None
            idxs = [
                j
                for j in range(upto)
                if members is None or classifiers[j] in members
            ]
            if fn == "COUNT":
                return len(idxs)
            if not idxs:
                return None
            if fn == "FIRST":
                return col_arr[col][start + idxs[0]]
            return col_arr[col][start + idxs[-1]]  # LAST / bare

        out_rows = []
        i, seq = 0, 0
        while i < n:
            end_limit = n
            if within_td is not None:
                # rows are sorted by (time_col, ...) so the WITHIN horizon
                # is a binary search, not a per-start backward scan; the
                # bound is inclusive (orig: trim while diff > within)
                end_limit = int(
                    time_vals.searchsorted(time_vals[i] + within_np, side="right")
                )
            hit = _longest_match(nfa, syms_per_row, i, end_limit)
            if hit is None or hit[0] == i:  # no/empty match here
                i += 1
                continue
            end, classifiers = hit
            seq += 1
            match_len = end - i
            if all_rows:
                for j in range(match_len):
                    rec = {c: col_arr[c][i + j] for c in passthrough}
                    rec["match_seq"] = seq
                    for out_name, fn, sym, col in parsed:
                        rec[out_name] = measure_value(
                            fn, sym, col, i, classifiers, j + 1, seq
                        )
                    out_rows.append(rec)
            else:
                rec = {k: col_arr[k][i] for k in passthrough}
                rec["match_seq"] = seq
                for out_name, fn, sym, col in parsed:
                    rec[out_name] = measure_value(
                        fn, sym, col, i, classifiers, match_len, seq
                    )
                out_rows.append(rec)
            # resume position (Match.java:70)
            if skip[0] == "PAST":
                i = end
            elif skip[0] == "NEXT":
                i += 1
            else:  # SKIP TO [FIRST|LAST] symbol
                which, target = skip[1], expand_sym(skip[2])
                idxs = [j for j, c in enumerate(classifiers) if c in target]
                if not idxs:
                    raise ValueError(
                        f"AFTER MATCH SKIP TO {skip[2]}: no row of the match "
                        f"is classified as {skip[2]} (standard: runtime error)"
                    )
                resume = i + (idxs[0] if which == "FIRST" else idxs[-1])
                if resume == i:
                    raise ValueError(
                        f"AFTER MATCH SKIP TO {skip[2]} resumes at the first "
                        f"row of the match — infinite loop (standard: error)"
                    )
                i = resume
        cols = [c.split()[0] for c in out_schema.split(", ")]
        return pd.DataFrame(out_rows, columns=cols)

    grouped = work.groupBy(*partition_by) if partition_by else work.groupBy(F.lit(1))
    return grouped.applyInPandas(run_group, schema=out_schema)
