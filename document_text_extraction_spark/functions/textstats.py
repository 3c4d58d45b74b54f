"""Text-analysis column expressions for training-data pipelines.

All JVM-side (``pyspark.sql.functions`` only — no UDFs): token counting,
quality scoring (length/stopword ratios), n-gram-heuristic language ID and
document fingerprinting. Each has an exact ANSI-SQL analogue used by the
DuckDB cross-check in ``__spark_entry__``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# stopword lists per language for the n-gram/stopword language heuristic;
# deterministic tie-break = list order below
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "en", "un", "est"],
}

STOPWORDS_EN = LANG_STOPWORDS["en"]


def tokens_col(text: Column) -> Column:
    return F.split(text, " ")


def token_count_col(text: Column) -> Column:
    """Whitespace token count (BPE-ish subword counting is ~chars/4;
    exposed as bpe_token_estimate_col)."""
    return F.size(tokens_col(text))


def bpe_token_estimate_col(text: Column) -> Column:
    return F.ceil(F.length(text) / F.lit(4)).cast("long")


def avg_token_len_col(text: Column) -> Column:
    toks = token_count_col(text)
    chars = F.length(F.replace(text, F.lit(" "), F.lit("")))
    return chars / F.greatest(toks, F.lit(1))


def stopword_ratio_col(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS_EN)])
    toks = tokens_col(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_score_col(text: Column) -> Column:
    """Composite [0,1] quality score: length saturation + token-length
    plausibility + stopword presence (family of the reference's
    substantial-block filters, O10/O12)."""
    toks = token_count_col(text).cast("double")
    length_part = F.least(toks / F.lit(100.0), F.lit(1.0))
    avg_len = avg_token_len_col(text)
    shape_part = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.abs(avg_len - F.lit(5.0)) / F.lit(5.0)
    )
    sw_part = F.least(stopword_ratio_col(text) * F.lit(5.0), F.lit(1.0))
    # raw double — callers floor-scale for cross-engine comparison
    return (F.lit(0.4) * length_part + F.lit(0.3) * shape_part
            + F.lit(0.3) * sw_part)


def lang_id_col(text: Column) -> Column:
    """Stopword-vote language ID; deterministic first-max tie-break in
    LANG_STOPWORDS order."""
    toks = tokens_col(F.lower(text))
    scores = []
    for lang, words in LANG_STOPWORDS.items():
        sw = F.array(*[F.lit(s) for s in words])
        scores.append(
            (lang, F.size(F.filter(toks, lambda t: F.array_contains(sw, t))))
        )
    best_lang = F.lit("und")
    best_score = F.lit(-1)
    for lang, score in reversed(scores):  # earlier entries win ties
        cond = score >= best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, score).otherwise(best_score)
    return F.when(best_score <= 0, F.lit("und")).otherwise(best_lang)


def fingerprint_col(text: Column) -> Column:
    """Exact-dup fingerprint: 64-bit hash of the raw text (O30 analogue —
    dataset-level distinct key)."""
    return F.xxhash64(text)


def md5_fingerprint_col(text: Column) -> Column:
    """Portable fingerprint (md5 hex) — identical function exists in
    DuckDB, so this one is oracle-checkable."""
    return F.md5(F.encode(text, "UTF-8"))
