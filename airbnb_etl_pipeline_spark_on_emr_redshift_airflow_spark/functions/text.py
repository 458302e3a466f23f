"""Deterministic text operators: language ID, sentiment, quality,
tokens, fingerprints.

The reference's only black-box compute is two Spark-NLP pretrained
pipelines (``apps/process_reviews.py:125-127,133-140`` — language
detection and English sentiment). What matters for parity is the
*operator shape* — a pure row-wise string→label function applied
selectively and re-unioned (SURVEY.md §2.9) — not model accuracy
(the reference itself disclaims it, ``README.md:255``).

Our classifiers are therefore **deterministic marker-count heuristics
expressed as portable SQL**: the same generated expression string runs
under Spark SQL (via ``F.expr``) and DuckDB (as the oracle), built
only from ``lower/length/replace/regexp_replace/CASE`` which the two
engines implement identically. Marker counting uses the
replace-delta trick ``(len(s) - len(replace(s, m, ''))) / len(m)``
— left-to-right non-overlapping scan in both engines, hence exactly
equal counts.

Everything here is a pure column expression: JVM-side, codegen'd, no
Python UDFs on the hot path — at 100 TB these run inside the scan
stage with zero extra shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker words per language. Tiny on purpose: the operator contract is
# "deterministic row-wise classifier", not linguistic accuracy.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "is", "of", "with"),
    "fr": ("le", "la", "et", "les", "une"),
    "de": ("der", "die", "und", "das", "nicht"),
    "es": ("el", "los", "que", "una", "para"),
}
# Priority order for deterministic argmax tie-breaking.
LANG_PRIORITY = ("en", "fr", "de", "es")

POS_WORDS = ("good", "great", "love", "excellent", "nice", "best", "fast")
NEG_WORDS = ("bad", "poor", "hate", "terrible", "awful", "worst", "slow")

STOPWORDS = ("the", "a", "and", "is", "of", "to", "in", "it", "that", "with")


def _norm(col_sql: str) -> str:
    """Lowercase, non-letters→single space, padded with spaces so every
    word has space delimiters on both sides."""
    return f"(' ' || regexp_replace(lower({col_sql}), '[^a-z]+', ' ') || ' ')"


def lang_detect_scores_sql(norm_sql: str) -> str:
    """Classifier body over an ALREADY-normalized string expression —
    lets the Spark side materialize the normalization once per row
    (see :func:`with_language`) while the oracle inlines it."""
    scores = {lang: _score(norm_sql, LANG_MARKERS[lang]) for lang in LANG_PRIORITY}
    branches = []
    for i, lang in enumerate(LANG_PRIORITY):
        rest = LANG_PRIORITY[i + 1 :]
        conds = [f"{scores[lang]} > 0"]
        conds += [f"{scores[lang]} >= {scores[o]}" for o in rest]
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return f"(CASE {' '.join(branches)} ELSE 'und' END)"


def sentiment_scores_sql(norm_sql: str) -> str:
    """Sentiment body over a pre-normalized string expression."""
    diff = f"({_score(norm_sql, POS_WORDS)} - {_score(norm_sql, NEG_WORDS)})"
    return (
        f"(CASE WHEN {diff} > 0 THEN 'pos' "
        f"WHEN {diff} < 0 THEN 'neg' ELSE 'n/a' END)"
    )


def _occurrences(s: str, word: str) -> str:
    """Count of ``' word '`` in pre-normalized ``s`` via replace-delta."""
    m = f" {word} "
    return f"((length({s}) - length(replace({s}, '{m}', ''))) / {len(m)})"


def _score(s: str, words: tuple[str, ...]) -> str:
    return "(" + " + ".join(_occurrences(s, w) for w in words) + ")"


def lang_detect_sql(col_sql: str) -> str:
    """Portable SQL: ISO-ish language code for a text column.

    Deterministic argmax over per-language marker scores with
    priority-order tie-breaking; 'und' when no marker hits. Mirrors the
    operator shape of reference N1 (``apps/process_reviews.py:125-127``).
    """
    return lang_detect_scores_sql(_norm(col_sql))


def sentiment_sql(col_sql: str) -> str:
    """Portable SQL: {'pos','neg','n/a'} lexicon sentiment — positive
    minus negative marker counts (reference N2 domain,
    ``apps/process_reviews.py:133-140``)."""
    return sentiment_scores_sql(_norm(col_sql))


def token_count_sql(col_sql: str) -> str:
    """Portable SQL: whitespace token count (space-delta + 1 on a
    whitespace-collapsed string; 0 for blank/empty)."""
    s = f"regexp_replace(trim({col_sql}), '\\s+', ' ')"
    return (
        f"(CASE WHEN length(trim({col_sql})) = 0 THEN 0 "
        f"ELSE length({s}) - length(replace({s}, ' ', '')) + 1 END)"
    )


def stopword_ratio_sql(col_sql: str) -> str:
    """Portable SQL: stopword tokens / total tokens (0.0 for empty)."""
    s = _norm(col_sql)
    stop = _score(s, STOPWORDS)
    total = token_count_sql(col_sql)
    return (
        f"(CASE WHEN {total} = 0 THEN 0.0 "
        f"ELSE CAST({stop} AS DOUBLE) / {total} END)"
    )


def quality_score_sql(col_sql: str) -> str:
    """Portable SQL: [0,1] document-quality heuristic — mean of three
    signals a pretraining pipeline would gate on: length in a healthy
    band, stopword ratio in a natural-language band, low
    non-alphanumeric density."""
    n = f"length({col_sql})"
    len_ok = f"(CASE WHEN {n} BETWEEN 50 AND 5000 THEN 1.0 ELSE 0.0 END)"
    stop = stopword_ratio_sql(col_sql)
    stop_ok = f"(CASE WHEN {stop} BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.0 END)"
    alpha = f"length(regexp_replace(lower({col_sql}), '[^a-z0-9 ]+', ''))"
    punct_ok = (
        f"(CASE WHEN {n} = 0 THEN 0.0 "
        f"WHEN CAST({alpha} AS DOUBLE) / {n} >= 0.8 THEN 1.0 ELSE 0.0 END)"
    )
    # CAST + integer divisor: a `/ 3.0` literal would be DOUBLE in
    # DuckDB but DECIMAL in Spark SQL (scale-6 division) — divergent.
    return f"(CAST(({len_ok} + {stop_ok} + {punct_ok}) AS DOUBLE) / 3)"


def fingerprint_sql(col_sql: str) -> str:
    """Portable SQL: md5 hex of the case/whitespace-normalized text —
    the exact-duplicate document fingerprint."""
    s = f"trim(regexp_replace(lower({col_sql}), '\\s+', ' '))"
    return f"md5({s})"


# PII redaction (training-data extension): (name, pattern, token),
# applied IN ORDER — emails first (their local parts contain dots and
# digits), then dotted-quad IPs, then phone-ish digit runs (which
# would otherwise swallow IPs). Patterns stick to the syntax subset
# Java regex (Spark) and RE2 (DuckDB) implement identically: classes,
# bounded/greedy quantifiers, \\b word boundaries — no lookaround, no
# backrefs.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}(\.\d{1,3}){3}\b", "<IP>"),
    ("phone", r"\+?\d[\d()\s.-]{6,}\d", "<PHONE>"),
)


def redact_pii_sql(col_sql: str, dialect: str = "spark") -> str:
    """Portable-by-construction SQL: replace emails, IPv4s, and
    phone-number-shaped digit runs with typed tokens — the standard
    PII scrub before a corpus ships to training.

    One dialect knob, because the engines disagree on scope defaults:
    Spark's ``regexp_replace`` is always global, DuckDB's replaces the
    FIRST match unless passed the ``'g'`` option — so the oracle text
    appends the flag while the Spark text cannot (Spark's optional 4th
    argument is a start position, not options). Both sides compile
    from the same ``PII_PATTERNS`` table in the same order, so parity
    stays structural. Works under
    ``spark.sql.parser.escapedStringLiterals=true`` (session policy):
    backslashes in the pattern reach the regex engine literally, same
    as DuckDB's standard string literals."""
    if dialect not in ("spark", "duckdb"):
        raise ValueError(f"unknown dialect: {dialect}")
    flag = ", 'g'" if dialect == "duckdb" else ""
    expr = col_sql
    for _, pattern, token in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pattern}', '{token}'{flag})"
    return expr


# ---- Spark Column wrappers (same generated SQL via F.expr) ----------


def lang_detect(col: str) -> Column:
    return F.expr(lang_detect_sql(col))


def sentiment(col: str) -> Column:
    return F.expr(sentiment_sql(col))


# ---- Two-phase DataFrame operators (the hot-path form) --------------
#
# The single-expression wrappers above re-derive the normalized string
# inside every marker count (fine for the DuckDB oracle, which CSEs
# it). On the Spark hot path we materialize the normalization ONCE per
# row in its own projection — Catalyst keeps multi-referenced
# expensive projections separate (CollapseProject does not inline
# attributes referenced more than once), so each row pays one
# lower+regexp_replace instead of ~40.


def with_language(
    df, text_col: str = "text", out: str = "comment_language"
):
    """Project the language label in two phases: normalize once, score
    markers against the materialized string."""
    normed = df.withColumn("__norm", F.expr(_norm(text_col)))
    return normed.withColumn(out, F.expr(lang_detect_scores_sql("__norm"))).drop(
        "__norm"
    )


def with_language_sentiment(
    df,
    text_col: str = "text",
    lang_out: str = "comment_language",
    sent_out: str = "sentiment",
):
    """N1+N2 fused single-pass: language tag plus selectively-applied
    sentiment (scored only where the detected language is 'en',
    'n/a' otherwise — exactly the reference's split/score/re-union
    semantics, ``apps/process_reviews.py:133-140``, collapsed into one
    scan instead of three)."""
    normed = df.withColumn("__norm", F.expr(_norm(text_col)))
    tagged = normed.withColumn(
        lang_out, F.expr(lang_detect_scores_sql("__norm"))
    )
    scored = tagged.withColumn(
        sent_out,
        F.when(
            F.col(lang_out) == "en", F.expr(sentiment_scores_sql("__norm"))
        ).otherwise(F.lit("n/a")),
    )
    return scored.drop("__norm")


def token_count(col: str) -> Column:
    return F.expr(token_count_sql(col)).cast("bigint")


def stopword_ratio(col: str) -> Column:
    return F.expr(stopword_ratio_sql(col))


def quality_score(col: str) -> Column:
    return F.expr(quality_score_sql(col))


def fingerprint(col: str) -> Column:
    return F.expr(fingerprint_sql(col))


def redact_pii(col: str) -> Column:
    return F.expr(redact_pii_sql(col))


def dup_token_frac_sql(col_sql: str) -> str:
    """Spark SQL (NOT oracle-portable — array functions are
    ``size``/``array_distinct`` here vs DuckDB's
    ``len``/``list_distinct``; the cataloged ``t_repetition_profile``
    carries the DuckDB construction): duplicate-token fraction
    (1 - distinct/total over normalized words; 0.0 for empty) — the
    Gopher-rule repetition signal as one expression, for composition
    into gates."""
    toks = f"split(trim(regexp_replace(lower({col_sql}), '[^a-z]+', ' ')), ' ')"
    return (
        f"(CASE WHEN size({toks}) = 0 THEN 0.0 "
        f"ELSE 1.0 - CAST(size(array_distinct({toks})) AS DOUBLE)"
        f" / size({toks}) END)"
    )


def dup_token_frac(col: str) -> Column:
    return F.expr(dup_token_frac_sql(col))
