"""PII detection and redaction for training-data pipelines.

Large-scale corpus preparation scrubs personally-identifiable information
before training (the C4 / Dolma / CCNet pipelines all carry a regex-PII
pass). This module provides the standard shape: per-document detector
COUNTS (auditable — what would be removed, how much) plus a REDACTED text
column with each match replaced by a typed placeholder token, so the drop
/ keep / scrub decision stays a downstream filter instead of an
irreversible mutation.

Patterns are deliberately written in the common subset of Java regex
(Spark) and RE2 (DuckDB) — no backrefs, no lookaround — so the DuckDB
oracle states the SAME pattern strings verbatim. They are passed through
the PySpark column API (`F.regexp_*`), never spliced into SQL literals,
so Spark's SQL-literal backslash escaping (the CLAUDE.md gotcha) never
applies. DuckDB's regexp_replace needs the 'g' flag to match Spark's
replace-all semantics — contract.py's oracle carries it.

Scale shape: a pure per-row codegen'd projection — zero shuffles, zero
Python; regex evaluation is JVM-side inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Ordered (name, pattern, placeholder): redaction applies in this order,
# counts are measured on the ORIGINAL text. Order matters only if a later
# pattern could match a placeholder or a partial earlier match — these
# three are mutually exclusive by shape.
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "phone",
        # NNN-NNN-NNNN with -, . or space separators, optional +country
        r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}",
        "<PHONE>",
    ),
    (
        "ipv4",
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "<IP>",
    ),
]


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_phones, n_ipv4s, redacted): per-document PII
    match counts (on the original text) plus the text with every match
    replaced by its typed placeholder. Filter `n_* > 0` for audit
    sampling; select `redacted` as the training text."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(f"n_{name}s")
        for name, pat, _ in PII_PATTERNS
    ]
    red = F.col(text_col)
    for _, pat, tok in PII_PATTERNS:
        red = F.regexp_replace(red, pat, tok)
    return docs.select("doc_id", *counts, red.alias("redacted"))
