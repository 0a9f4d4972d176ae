"""PII redaction column expressions — the scrubbing pass a training-
data pipeline runs before any text leaves the corpus.

Pure ``pyspark.sql.functions`` compositions (JVM-side, codegen'd, no
UDFs): cost-per-row is one regexp pass per category. Regex discipline
matches ``functions/text.py``: only constructs with identical
semantics in Java regex (Spark) and RE2 (DuckDB) — character classes,
bounded quantifiers, ``\\b`` word boundaries — so every function stays
oracle-checkable.

Categories (deliberately conservative patterns — a production corpus
pass tunes these per-source):

- email:  ``local@domain.tld``
- ipv4:   dotted quad with word boundaries
- phone:  international-ish ``+`` or digit runs with separators
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (category, pattern, replacement) in application order. Email runs
#: before phone so the digits inside a local part are already masked;
#: ipv4 runs before phone so dotted quads don't half-match as phones.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
    ("phone", r"\+[0-9][0-9 ()-]{6,}[0-9]", "[PHONE]"),
)


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its category tag. NULL-safe (NULL
    text -> empty string, mirroring ``functions.text.tokens``)."""
    out = F.coalesce(text, F.lit(""))
    for _, pattern, replacement in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, replacement)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category match counts (int columns, NULL-safe). Counts are
    computed on the same progressively-redacted text the replacements
    see, so categories never double-count one span."""
    counts: dict[str, Column] = {}
    current = F.coalesce(text, F.lit(""))
    for category, pattern, replacement in PII_PATTERNS:
        counts[category] = F.regexp_count(current, F.lit(pattern)).cast("int")
        current = F.regexp_replace(current, pattern, replacement)
    return counts
