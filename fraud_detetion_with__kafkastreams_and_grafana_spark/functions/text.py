"""Text-analysis column expressions for LLM-data-pipeline use
(language-ID heuristic, quality scoring, token counting) — all built-in
`pyspark.sql.functions` (JVM-side, whole-stage codegen); no Python UDFs in
the hot path. Every function here has an exact DuckDB-SQL equivalent so
the oracle harness can check it (plans/llmops.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small fixed English stopword list (shared with the SQL oracles — keep in
# sync with llmops._STOPWORDS_SQL).
STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "by", "at", "from",
]

# Language marker words for the rule-based language-ID heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "es"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
}

# BPE-ish tokenization: words, single digits, single punctuation marks.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (trimmed, multi-space safe)."""
    return F.split(F.trim(text), r"\s+")


POLYHASH_MOD = 1_000_000_007


def polyhash(token: Column) -> Column:
    """Polynomial rolling hash of a token: fold h = (h*31 + codepoint) mod
    1e9+7 over its characters. Unlike xxhash64 this has an EXACT DuckDB
    twin (list_reduce over ord()), so fingerprints built from it are
    value-checkable by the oracle harness; arithmetic stays in int64
    (31 * (1e9+7) + cp < 2^35) and runs JVM-side via higher-order array
    functions — no Python."""
    return F.aggregate(
        F.split(token, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % POLYHASH_MOD,
    )


def whitespace_token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


def bpe_ish_token_count(text: Column | str) -> Column:
    """Count of BPE-ish atoms: alpha runs, single digits, punctuation."""
    return F.regexp_count(F.col(text) if isinstance(text, str) else text,
                          F.lit(BPE_ISH_PATTERN)).cast("long")


def punct_ratio(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(F.regexp_replace(col, r"[^.,;:!?]", ""))
    return n_punct / F.greatest(F.length(col), F.lit(1))


def digit_ratio(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    n_digit = F.length(F.regexp_replace(col, r"[^0-9]", ""))
    return n_digit / F.greatest(F.length(col), F.lit(1))


def stopword_ratio(text: Column | str) -> Column:
    toks = tokens(text)
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, F.lower(t))))
    return n_stop / F.greatest(F.size(toks), F.lit(1))


def avg_word_len(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column | str) -> Column:
    """Heuristic document quality in [0,1]: rewards moderate length and
    stopword presence (natural prose), penalizes digit/punct floods.
    Deterministic closed form — mirrored exactly in the SQL oracle."""
    col = F.col(text) if isinstance(text, str) else text
    length_term = F.least(F.length(col) / F.lit(500.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(col) * 4, F.lit(1.0))
    noise_term = F.greatest(
        F.lit(1.0) - (digit_ratio(col) + punct_ratio(col)) * 2, F.lit(0.0)
    )
    return F.round((length_term + stop_term + noise_term) / 3, 6)


def _marker_count(toks: Column, markers: list[str]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, F.lower(t))))


def lang_id(text: Column | str) -> Column:
    """Rule-based language ID: argmax of per-language marker-word counts,
    'und' when no marker matches. Fixed priority order (en, es, de, fr)
    breaks ties deterministically."""
    toks = tokens(text)
    counts = {lang: _marker_count(toks, m) for lang, m in LANG_MARKERS.items()}
    best = F.greatest(*counts.values())
    out = F.lit("und")
    # reversed so earlier languages win ties (last when() checked first wins
    # -> build from lowest priority to highest)
    for lang in reversed(list(LANG_MARKERS)):
        out = F.when(counts[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best == 0, F.lit("und")).otherwise(out)
