"""PII redaction for training-data curation (SURVEY §2.9 north-star
scope — no reference counterpart).

Large-scale corpus preparation scrubs personally-identifying spans
before anything downstream sees the text. The operator is pure
JVM-side regex (whole-stage codegen; no UDF): each pattern is applied
in declared order with a typed placeholder, and per-pattern match
counts are emitted so the curation pipeline can audit redaction rates
per source/language.

Patterns use the regex subset that behaves identically under Java
regex (Spark) and RE2 (DuckDB, for the oracle twin): character
classes, bounded repetition, word boundaries — no backreferences or
lookaround.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (name, pattern, placeholder) in application order. Longer/more
#: specific patterns go first so a span is claimed once (an SSN-shaped
#: token must not be half-eaten by the phone rule).
DEFAULT_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
)


def redact(
    df: DataFrame,
    text_col: str = "text",
    rules: tuple[tuple[str, str, str], ...] = DEFAULT_RULES,
    out_col: str = "redacted",
) -> DataFrame:
    """Append ``out_col`` (scrubbed text) and ``n_<name>`` match counts
    per rule. Counts are taken BEFORE any replacement so overlapping
    rules report what they each matched in the original text order of
    application."""
    cur: Column = F.col(text_col)
    counts = []
    for name, pattern, _ in rules:
        # Column-typed pattern (F.lit) keeps the backslashes out of the
        # SQL string-literal parser ('\b' in a SQL literal is backspace)
        counts.append(
            F.size(
                F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0))
            ).alias(f"n_{name}")
        )
    # counts come off the original column; replacements chain in order
    for name, pattern, placeholder in rules:
        cur = F.regexp_replace(cur, pattern, placeholder)
    return df.select("*", *counts, cur.alias(out_col))
