"""JVM-side (codegen'd) column-expression form of the regex field library.

The Arrow-batch kernel (``kernels._fields_batch``) is the hot path used
inside extraction; these expressions are the *dataset-level* form for SQL
analytics over already-extracted text — they never leave the JVM, so no
Python cost at all. Regex semantics follow the reference
(``/root/reference/new_approaches/final.py:199-222``,
``approach4_v1.py:44-109``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# kept RE2/Java-compatible (no lookaround) so the same pattern strings run
# in Spark and in the DuckDB oracle SQL
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+?\d{1,3}[-. ]?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}"
URL_PATTERN = r"https?://[^\s\"'<>]+"

# the reference's fixed skills vocabulary family (final.py:225-265) —
# substring matched case-insensitively
DEFAULT_VOCAB = [
    "spark", "python", "sql", "java", "scala", "hash", "join", "sort",
    "merge", "stream", "batch", "window", "filter", "query",
]


def emails_col(text: Column) -> Column:
    return F.array_sort(
        F.array_distinct(F.regexp_extract_all(text, F.lit(EMAIL_PATTERN)))
    )


def phones_col(text: Column) -> Column:
    """Extract candidates, strip non-digits (keep +), keep len>=10."""
    cleaned = F.transform(
        F.regexp_extract_all(text, F.lit(PHONE_PATTERN)),
        lambda m: F.regexp_replace(m, r"[^\d+]", ""),
    )
    return F.array_sort(
        F.array_distinct(F.filter(cleaned, lambda c: F.length(c) >= 10))
    )


def links_col(text: Column) -> Column:
    return F.array_sort(
        F.array_distinct(F.regexp_extract_all(text, F.lit(URL_PATTERN)))
    )


def skills_col(text: Column, vocab: list[str] | None = None) -> Column:
    """Vocabulary keyword match (O49): JVM-side, no UDF."""
    v = F.array(*[F.lit(s) for s in (vocab or DEFAULT_VOCAB)])
    low = F.lower(text)
    return F.filter(v, lambda s: low.contains(s))
