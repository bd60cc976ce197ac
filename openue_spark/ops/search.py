"""Ranked keyword retrieval over a document corpus (BM25 top-k).

The training-data use case is eval-set decontamination and corpus
exploration: given a (small) table of queries, return the k highest-BM25
documents per query. Complements the embedding-side ANN operators in
ops/similarity.py with the lexical retrieval path.

Scoring is the BM25 family with a RATIONAL idf,

    idf(t)  = (N - df_t + 0.5) / (df_t + 0.5)
    s(q, d) = sum over t in q of
              qtf_t * idf(t) * tf_td * (k1 + 1)
                            / (tf_td + k1 * (1 - b + b * dl_d / avgdl))

i.e. classic Okapi BM25 with the log around the idf term dropped. The
log is monotone, so per-term ranking is unchanged; multi-term sums can
differ from ln-idf BM25, but every arithmetic op left is IEEE +,-,*,/
on identically-derived doubles — bit-identical between Spark and DuckDB
— whereas ln() is implementation-defined in the last ulp and would make
the oracle hash a coin flip at rounding boundaries. Each per-term score
is then floored into integer MICRO-units (1e6) and summed as BIGINTs,
so the aggregation is order-independent (the repo-wide rule: never
hash-compare order-dependent float sums). Deployments that want ln-idf
swap one line; the plumbing (df cap, posting join, top-k window) is the
part that has a scale shape.

Scale shape:
- tokenize -> explode -> groupBy(doc_id, token) for tf: one shuffle,
  partial-aggregated map-side.
- df from the tf table: one groupBy(token), again partial-aggregated.
- `max_df` caps the posting lists BEFORE the query join — a stopword
  matching 10^9 documents would otherwise dominate the join output for
  every query containing it (the inverted-index scale-killer; dropping
  ultra-common terms is also standard relevance practice).
- query side: tiny by construction (an eval set), joined on token —
  AQE broadcasts it from runtime sizes; no explicit hint (the query
  table is user input and the repo rule is never to hint a table that
  can grow with the corpus).
- top-k per query: row_number window partitioned by query_id — one
  shuffle over (query, candidate-doc) rows, which the df cap already
  bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_micro_expr(k1: float = 1.2, b: float = 0.75) -> str:
    """The per-(query-term, doc) integer micro-score as ONE SQL expression
    string, valid verbatim in BOTH Spark SQL and DuckDB (shared so the
    operator and its oracle cannot drift). Expects columns n_docs,
    sum_dl (corpus stats), df, tf, dl, qtf in scope. Literals are
    repr()'d Python floats — both parsers bind them to the same double.
    """
    k1p1 = repr(k1 + 1.0)
    one_minus_b = repr(1.0 - b)
    return (
        "CAST(floor("
        "(((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE)) + 0.5)"
        " / (CAST(df AS DOUBLE) + 0.5))"
        f" * ((CAST(tf AS DOUBLE) * {k1p1})"
        f" / (CAST(tf AS DOUBLE) + {repr(k1)} * ({one_minus_b}"
        f" + {repr(b)} * (CAST(dl AS DOUBLE)"
        " / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))"
        " * CAST(qtf AS DOUBLE) * 1000000.0"
        ") AS BIGINT)"
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_df: int = 10000,
) -> DataFrame:
    """(query_id, doc_id, score_micro, rank): the k highest-scoring
    documents per query under rational-idf BM25 (module docstring).

    `docs` is (doc_id, text) or pre-tokenized (doc_id, tokens);
    `queries` is (query_id, query_text). Ties break on ascending doc_id,
    so the output is fully deterministic.
    """
    from .dedup import _corpus

    toked = _corpus(docs).select(
        "doc_id", "tokens", F.size("tokens").cast("long").alias("dl")
    )
    tf = (
        toked.select("doc_id", "dl", F.explode("tokens").alias("token"))
        .groupBy("doc_id", "dl", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfq = (
        tf.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .where(F.col("df") <= max_df)
    )
    stats = toked.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    qt = (
        queries.select(
            "query_id",
            F.explode(F.split(F.trim(F.lower(F.col("query_text"))), r"\s+")).alias(
                "token"
            ),
        )
        .groupBy("query_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("qtf"))
    )
    scored = (
        qt.join(dfq, "token")
        .join(tf, "token")
        .crossJoin(F.broadcast(stats))  # 1 row, safe to hint
        .select(
            "query_id",
            "doc_id",
            F.expr(bm25_micro_expr(k1, b)).alias("micro"),
        )
    )
    agg = scored.groupBy("query_id", "doc_id").agg(
        F.sum("micro").cast("long").alias("score_micro")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc()
    )
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score_micro", "rank")
    )


def tfidf_topk_keywords(
    docs: DataFrame, k: int = 5, max_df: int = 10000
) -> DataFrame:
    """(doc_id, token, tf, df, score_micro, rank): the k most
    characteristic tokens per document under rational TF-IDF — the
    keyword-extraction / topic-surfacing pass of corpus exploration
    (BM25 above ranks documents for queries; this ranks tokens within
    documents).

    Scoring is tf * (N / df) in integer MICRO-units computed entirely in
    BIGINT arithmetic: score_micro = (tf * n_docs * 1000000) div df.
    No doubles anywhere, so Spark `div` and DuckDB `//` agree bit-for-bit
    (the ln of classic idf is monotone per-token — ranking is unchanged
    by dropping it, same argument as the BM25 rational idf). Headroom:
    tf * n_docs * 1e6 must stay under 2^63 — fine through ~1e9 docs with
    tf <= ~9e3; a larger corpus drops the multiplier to 1e3.

    Scale shape: tf groupBy (partial-aggregated map-side), df groupBy
    over the tf table, `max_df` drops stopword-grade tokens BEFORE the
    join (they are non-keywords by definition and the posting-list
    scale-killer otherwise), one broadcast of the 1-row corpus stat, and
    a row_number window partitioned by doc_id. Ties break on ascending
    token — fully deterministic output.
    """
    from .dedup import _corpus

    toked = _corpus(docs)
    tf = (
        toked.select("doc_id", F.explode("tokens").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfq = (
        tf.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .where(F.col("df") <= max_df)
    )
    n_docs = toked.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    scored = (
        tf.join(dfq, "token")
        .crossJoin(F.broadcast(n_docs))  # 1 row, safe to hint
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.expr("(tf * n_docs * 1000000) div df")
            .cast("long")
            .alias("score_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_micro").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("doc_id", "token", "tf", "df", "score_micro", "rank")
    )
