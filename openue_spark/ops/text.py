"""Text-analysis operators for training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring (length / punctuation /
stopword ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting (normalized-text hash). All pure built-in column expressions
(whole-stage codegen, no Python), each with a DuckDB oracle in contract.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "in", "and", "to", "is", "was", "for", "on"]
# NOTE: this string is spliced into a Spark SQL literal, whose parser
# escape-processes backslashes — hence the doubled \\s.
BPE_ISH_RE = r"[a-z]+|[0-9]+|[^a-z0-9\\s]"


def with_token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    return docs.select(
        "doc_id",
        F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim(F.col("text")), r"\s+")))
        .alias("ws_tokens"),
        F.size(F.expr(f"regexp_extract_all(lower(text), '{BPE_ISH_RE}', 0)")).alias(
            "bpe_tokens"
        ),
    )


def with_quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality features + a composite score.

    - len_score: 1 if 50 <= n_chars <= 5000 else 0
    - punct_ratio: punctuation chars / chars
    - stopword_ratio: stopword tokens / tokens
    - quality_score = len_score * (1 - punct_ratio) * least(1, 4 * stopword_ratio)
    All ratios rounded to 4 decimals (oracle-compare hygiene).
    """
    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    tokens = r"split(trim(lower(text)), '\\s+')"
    n_tok = f"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE size({tokens}) END"
    n_sw = (
        f"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE"
        f" size(filter({tokens}, t -> array_contains(array({sw}), t))) END"
    )
    punct = "length(text) - length(regexp_replace(text, '[.,;:!?]', ''))"
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.expr(n_tok).alias("n_tokens"),
        F.expr(
            f"round(CASE WHEN length(text) = 0 THEN 0.0"
            f" ELSE ({punct}) / cast(length(text) as double) END, 4)"
        ).alias("punct_ratio"),
        F.expr(
            f"round(CASE WHEN {n_tok} = 0 THEN 0.0"
            f" ELSE ({n_sw}) / cast({n_tok} as double) END, 4)"
        ).alias("stopword_ratio"),
        F.expr(
            f"round((CASE WHEN length(text) BETWEEN 50 AND 5000 THEN 1.0 ELSE 0.0 END)"
            f" * (1.0 - CASE WHEN length(text) = 0 THEN 0.0"
            f"          ELSE ({punct}) / cast(length(text) as double) END)"
            f" * least(1.0, 4.0 * CASE WHEN {n_tok} = 0 THEN 0.0"
            f"          ELSE ({n_sw}) / cast({n_tok} as double) END), 4)"
        ).alias("quality_score"),
    )


def with_fingerprint(docs: DataFrame) -> DataFrame:
    """Normalized-text fingerprint: md5 of whitespace-collapsed lowercase
    text — catches near-exact duplicates that differ only in spacing/case."""
    return docs.select(
        "doc_id",
        F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))).alias(
            "fingerprint"
        ),
    )
