"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, fingerprinting. All pure Spark
SQL expressions (JVM-side, whole-stage codegen — no Python UDFs), so
they run at scan speed on 100 TB and are DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from calcite_spark.exec import parallelize_input

# Whitespace tokens + a BPE-ish heuristic: ~chars/4 is the common rule of
# thumb for subword token counts over English-like text.
TOKENS = "size(split(trim(text), '\\\\s+'))"
WORDS_PER_DOC = TOKENS


def text_stats(docs: DataFrame) -> DataFrame:
    """Per-document stats projection (narrow map, no shuffle).

    No parallelize_input here: the map is pure cheap built-ins
    (size/split/length/regexp_replace on short docs), so the RR
    insurance exchange costs more than the CPU it spreads — r14's
    driver bench clocked z51 at 0.59× with the guard and the plan
    pair showed the added Exchange (VERDICT r14 item 3)."""
    return docs.selectExpr(
        "doc_id",
        "lang",
        "source",
        "length(text) AS n_chars_actual",
        f"CAST({TOKENS} AS INT) AS n_tokens_ws",
        "CAST(CEIL(length(text) / 4.0) AS BIGINT) AS n_tokens_bpe_est",
        "CAST(length(regexp_replace(text, '[^.!?]', '')) AS INT) AS n_sentences_approx",
        "ROUND(length(regexp_replace(text, '[a-zA-Z ]', '')) / "
        "CAST(GREATEST(length(text), 1) AS DOUBLE), 6) AS non_alpha_ratio",
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality score in [0,1]: penalize very short docs, high
    punctuation/symbol density, low mean word length (public-rule-based
    filtering in the Gopher/C4 style, SQL-only)."""
    toks = "split(trim(text), '\\\\s+')"
    # Same trivial-map argument as text_stats: no RR insurance.
    return docs.selectExpr(
        "doc_id",
        "lang",
        f"CAST(size({toks}) AS INT) AS n_words",
        f"ROUND(length(text) / CAST(GREATEST(size({toks}), 1) AS DOUBLE), 4) AS mean_word_len",
        "ROUND(LEAST(1.0, length(text) / 500.0) * "
        "(1.0 - LEAST(1.0, 2.0 * length(regexp_replace(text, '[^!?#*=<>{}|\\\\\\\\]', '')) / "
        "CAST(GREATEST(length(text), 1) AS DOUBLE))), 6) AS quality",
    )


# Tiny deterministic stopword lists → language-ID votes (n-gram/stopword
# heuristic; real pipelines plug fasttext via pandas_udf — see
# llm/multimodal.py for the gated-UDF pattern).
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "una", "por"],
}


def lang_votes_expr() -> dict[str, str]:
    exprs = {}
    for lang, words in _LANG_MARKERS.items():
        votes = " + ".join(
            f"CASE WHEN array_contains(__toks, '{w}') THEN 1 ELSE 0 END" for w in words
        )
        exprs[lang] = votes
    return exprs


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-vote language ID: tokenize once, count marker hits per
    language, argmax (ties → 'und'). Narrow map only."""
    votes = lang_votes_expr()
    vote_cols = [f"({v}) AS votes_{lang}" for lang, v in votes.items()]
    langs = list(votes)
    arr = "array(" + ", ".join(f"votes_{lang}" for lang in langs) + ")"
    names = "array(" + ", ".join(f"'{lang}'" for lang in langs) + ")"
    return (
        parallelize_input(docs).selectExpr("doc_id", "lang AS lang_true", "split(lower(text), '[^a-z]+') AS __toks")
        .selectExpr("doc_id", "lang_true", *vote_cols)
        .selectExpr(
            "doc_id",
            "lang_true",
            f"CASE WHEN array_max({arr}) = 0 THEN 'und' "
            f"ELSE element_at({names}, CAST(array_position({arr}, array_max({arr})) AS INT)) "
            "END AS lang_pred",
        )
    )


def fingerprint(docs: DataFrame, window: int = 8) -> DataFrame:
    """Winnowing-style document fingerprint: min rolling-hash over word
    windows (public winnowing scheme, SQL-only via higher-order fns)."""
    toks = "split(lower(trim(text)), '\\\\s+')"
    grams = (
        f"CASE WHEN size({toks}) < {window} THEN array(concat_ws(' ', {toks})) "
        f"ELSE transform(sequence(0, size({toks}) - {window}), "
        f"i -> concat_ws(' ', slice({toks}, i + 1, {window}))) END"
    )
    return parallelize_input(docs).selectExpr(
        "doc_id",
        f"array_min(transform({grams}, g -> xxhash64(g))) AS fp_min",
        f"array_max(transform({grams}, g -> xxhash64(g))) AS fp_max",
    )


# Redaction patterns deliberately restricted to syntax RE2 (DuckDB) and
# java.util.regex (Spark) evaluate IDENTICALLY — no lookarounds, no
# backreferences, and NO BACKSLASHES: Spark SQL string literals process
# Hive-style escapes ('\+' silently becomes '+', breaking the regex)
# where DuckDB passes the backslash through — character classes like
# [.] and [+] sidestep the divergence entirely.
# Order matters (URLs can contain '@'): url, then email, then phone.
PII_PATTERNS = (
    ("url", "https?://[A-Za-z0-9./?=&%_#:~-]+"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"),
    ("phone", "[+]?[0-9][0-9 ()-]{7,}[0-9]"),
)


def repetition_stats(docs: DataFrame, ngram: int = 2) -> DataFrame:
    """Gopher-style intra-document repetition signals (public rules from
    Rae et al. 2021 'Scaling Language Models', Table A1; also the
    RefinedWeb line-dedup filters) — the standard pre-training filters
    for boilerplate and degenerate repetition:

      * dup_line_frac       — fraction of non-empty lines that repeat an
                              earlier line;
      * dup_line_char_frac  — characters in those repeat occurrences
                              (each occurrence beyond a line's first) /
                              total line characters;
      * top_ngram_char_frac — characters covered by the MOST frequent
                              word n-gram / total characters;
      * dup_ngram_frac      — fraction of n-gram occurrences that are
                              repeats of an earlier n-gram.

    Pure SQL higher-order functions (whole-stage codegen, zero Python,
    zero shuffle — a narrow map at scan speed on 100 TB). The
    per-distinct-value counting is O(k²) in the per-DOC line/n-gram
    count — bounded by document length, never by corpus size, so it
    does not change the scale story. Delimiters are chr(10)-literal
    (not regex) so the DuckDB oracle's string_split matches exactly."""
    lines = "filter(split(text, chr(10)), x -> length(trim(x)) > 0)"
    words = "filter(split(lower(trim(text)), '\\\\s+'), w -> w != '')"
    grams = (
        f"CASE WHEN size({words}) < {ngram} THEN array() "
        f"ELSE transform(sequence(0, size({words}) - {ngram}), "
        f"i -> concat_ws(' ', slice({words}, i + 1, {ngram}))) END"
    )

    def _dup_char_sum(arr: str) -> str:
        # sum over distinct values of (occurrences - 1) * length
        return (
            f"aggregate(transform(array_distinct({arr}), "
            f"d -> (size(filter({arr}, x -> x = d)) - 1) * length(d)), "
            f"CAST(0 AS BIGINT), (a, x) -> a + x)"
        )

    def _char_sum(arr: str) -> str:
        return (
            f"aggregate(transform({arr}, l -> CAST(length(l) AS BIGINT)), "
            f"CAST(0 AS BIGINT), (a, x) -> a + x)"
        )

    top_gram_chars = (
        f"CASE WHEN size({grams}) = 0 THEN CAST(0 AS BIGINT) ELSE "
        f"array_max(transform(array_distinct({grams}), "
        f"d -> CAST(size(filter({grams}, x -> x = d)) * length(d) AS BIGINT))) END"
    )
    return parallelize_input(docs).selectExpr(
        "doc_id",
        f"CAST(size({lines}) AS INT) AS n_lines",
        f"ROUND((size({lines}) - size(array_distinct({lines}))) / "
        f"CAST(GREATEST(size({lines}), 1) AS DOUBLE), 6) AS dup_line_frac",
        f"ROUND({_dup_char_sum(lines)} / "
        f"CAST(GREATEST({_char_sum(lines)}, 1) AS DOUBLE), 6) AS dup_line_char_frac",
        f"ROUND({top_gram_chars} / "
        f"CAST(GREATEST(length(text), 1) AS DOUBLE), 6) AS top_ngram_char_frac",
        f"ROUND((size({grams}) - size(array_distinct({grams}))) / "
        f"CAST(GREATEST(size({grams}), 1) AS DOUBLE), 6) AS dup_ngram_frac",
    )


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails/URLs/phone-shaped spans to <kind> tokens — the
    standard pre-training scrub pass. Pure chained regexp_replace: a
    narrow map in whole-stage codegen, zero Python, zero shuffle —
    at 100 TB this runs at scan speed. Adds has_<kind> detection flags
    (computed BEFORE scrubbing) and the redacted text column."""
    out = parallelize_input(docs)
    for kind, pat in PII_PATTERNS:
        out = out.withColumn(
            f"has_{kind}", F.expr(f"{text_col} RLIKE '{pat}'")
        )
    scrubbed = text_col
    for kind, pat in PII_PATTERNS:
        scrubbed = f"regexp_replace({scrubbed}, '{pat}', '<{kind}>')"
    return out.withColumn("scrubbed", F.expr(scrubbed))
