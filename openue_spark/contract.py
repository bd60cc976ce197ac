"""Driver-contract queries and DuckDB oracles (SURVEY.md §2 [SQL-oracle] tags).

Each `queries()` entry is a Spark DataFrame program over the driver's
/root/testdata/sf* parquet tables; `oracle_sql()` holds the ANSI-SQL
equivalent DuckDB runs on the same tables. Column names/aliases match
exactly on both sides (the driver's compare hashes values after sorting
columns by name).

The extraction stages that are relational in nature (threshold predicate,
argmax fallback, fan-out join, cartesian assembly, multi-hot agg, marker
splice, micro-P/R counts, stable ordering, dedup) are exercised here over
the `events`/`documents` corpora as stand-ins; the full two-stage pipeline
itself (mock model forwards — not SQL-expressible) is registered as a
rows-only query over deterministically synthesized transcripts.

Float hygiene: aggregates avoid order-dependent float sums (min/max/count
only); per-row float outputs are rounded identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .fixtures import SF_TURNS, transcripts_spark


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _sf_turns(sf_dir: str) -> int:
    for key, n in SF_TURNS.items():
        if sf_dir.rstrip("/").endswith(f"sf{key}"):
            return n
    return 6_000


# --- P1: lowercase projection (reference utils.py:383-385) ---


def q_p1_lowercase(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "documents").select(
        "doc_id", F.lower("text").alias("text_lc")
    )


# --- W2: stable ordering (reference utils.py:320-331) ---


def q_w2_stable_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.row_number().over(w).alias("rn")
    )


# --- P5: sigmoid threshold predicate (reference model.py:227) ---


def q_p5_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .where(F.col("value") > 150.0)
        .select("event_id", "user_id", "value")
    )


# --- P6/W1: zero-selected argmax fallback (reference model.py:230-233) ---


def q_p6_argmax_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    sel = events.where(F.col("value") > 190.0).select("user_id", "event_id")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    top1 = (
        events.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id")
    )
    have = sel.select("user_id").distinct()
    fallback = top1.join(have, "user_id", "left_anti")
    return sel.unionByName(fallback)


# --- J1: relation-conditioned fan-out as a broadcast dim join
#         (reference model.py:236-264) ---


def q_j1_fanout_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    dim = (
        events.select("event_type")
        .distinct()
        .withColumn(
            "rel_id",
            F.dense_rank().over(Window.orderBy("event_type")) - 1,
        )
    )
    return events.join(F.broadcast(dim), "event_type").select(
        "event_id", "event_type", "rel_id"
    )


# --- J3: subject x object cartesian within a group (reference model.py:358-387) ---


def q_j3_cartesian(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    subs = events.where(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("subj_id")
    )
    objs = events.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("obj_id")
    )
    return subs.join(objs, "user_id").select("user_id", "subj_id", "obj_id")


# --- A1: multi-hot label aggregation (reference utils.py:365-373) ---


def q_a1_multihot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.countDistinct("event_type").alias("n_types"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# --- A2: group-triples-by-relation (reference utils.py:431-443) ---


def q_a2_group_by_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 3).alias("min_value"),
            F.round(F.max("value"), 3).alias("max_value"),
        )
    )


# --- A4: micro P/R counting joins (reference transformer.py:183-215) ---


def q_a4_micro_prf_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single-pass formulation: one shuffle on (user_id, event_type) computing
    # membership flags for both the predicted and gold sets, then a global
    # reduce — instead of three separate distinct+count jobs.
    events = _t(spark, sf_dir, "events")
    flags = events.groupBy("user_id", "event_type").agg(
        F.max(F.when(F.col("value") > 100.0, 1).otherwise(0)).alias("p"),
        F.max(F.when(F.col("value") > 120.0, 1).otherwise(0)).alias("g"),
    )
    return flags.agg(
        F.sum("p").cast("long").alias("pre_cnt"),
        F.sum("g").cast("long").alias("true_cnt"),
        F.sum(F.col("p") * F.col("g")).cast("long").alias("cor_cnt"),
    )


# --- U4: marker splice as pure array ops (reference model.py:276-304) ---


def q_u4_marker_splice(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.expr(
                "concat_ws(' ', concat(slice(split(text, ' '), 1, 6),"
                " array('[relation3]', '[SEP]')))"
            ).alias("spliced_text"),
        )
    )


# --- dedup: exact duplicate detection (training-data op) ---


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "documents")
        .groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


# --- text analysis: token count ---


def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim(F.col("text")), r"\s+")))
        .alias("token_cnt"),
    )


# --- text analysis: language-ID heuristic ---


def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    lc = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            lc.contains(" the ") | lc.contains(" and ") | lc.contains(" of "),
            F.lit("en"),
        )
        .otherwise(F.lit("other"))
        .alias("lang_pred"),
    )


# --- similarity search: brute-force cosine top-k (baseline ANN) ---


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    pairs = emb.crossJoin(F.broadcast(queries)).where(F.col("vec_id") != F.col("query_id"))
    dot = F.expr(
        "aggregate(zip_with(embedding, qvec, (a, b) -> a * b), 0D, (acc, x) -> acc + x)"
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.expr(f"aggregate(transform({c}, a -> a * a), 0D, (acc, x) -> acc + x)")
    )
    scored = pairs.withColumn("cos_sim", dot / (norm("embedding") * norm("qvec")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("cos_sim", 4).alias("cos_sim_r"),
        )
    )


# --- full extraction pipeline (mock forwards — rows-only check) ---


def q_extract_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline import extract_triples

    turns = transcripts_spark(spark, _sf_turns(sf_dir))
    return extract_triples(turns)


# --- entity linking + canonicalization (LSH/CC — rows-only check; runs the
#     full stage at a reduced, documented turn count to keep verify fast) ---


def q_link_canonical_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline import extract_triples
    from .pipeline.linking import canonical_triples, link_entities

    turns = transcripts_spark(spark, max(2_000, _sf_turns(sf_dir) // 30))
    raw = extract_triples(turns).persist()
    mapping = link_entities(raw)
    return canonical_triples(raw, mapping)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "p1_lowercase": q_p1_lowercase,
        "w2_stable_ordering": q_w2_stable_ordering,
        "p5_threshold": q_p5_threshold,
        "p6_argmax_fallback": q_p6_argmax_fallback,
        "j1_fanout_join": q_j1_fanout_join,
        "j3_cartesian": q_j3_cartesian,
        "a1_multihot": q_a1_multihot,
        "a2_group_by_relation": q_a2_group_by_relation,
        "a4_micro_prf_counts": q_a4_micro_prf_counts,
        "u4_marker_splice": q_u4_marker_splice,
        "dedup_exact": q_dedup_exact,
        "text_token_count": q_text_token_count,
        "text_lang_id": q_text_lang_id,
        "ann_cosine_topk": q_ann_cosine_topk,
        "extract_triples": q_extract_triples,
        "link_canonical_triples": q_link_canonical_triples,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "p1_lowercase": "SELECT doc_id, lower(text) AS text_lc FROM documents",
        "w2_stable_ordering": (
            "SELECT user_id, event_id,"
            " row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn"
            " FROM events"
        ),
        "p5_threshold": (
            "SELECT event_id, user_id, value FROM events WHERE value > 150.0"
        ),
        "p6_argmax_fallback": (
            "WITH sel AS (SELECT user_id, event_id FROM events WHERE value > 190.0),"
            " ranked AS (SELECT user_id, event_id, row_number() OVER"
            "   (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn FROM events)"
            " SELECT user_id, event_id FROM sel"
            " UNION ALL"
            " SELECT user_id, event_id FROM ranked"
            " WHERE rn = 1 AND user_id NOT IN (SELECT user_id FROM sel)"
        ),
        "j1_fanout_join": (
            "WITH dim AS (SELECT event_type,"
            " dense_rank() OVER (ORDER BY event_type) - 1 AS rel_id"
            " FROM (SELECT DISTINCT event_type FROM events))"
            " SELECT e.event_id, e.event_type, d.rel_id"
            " FROM events e JOIN dim d USING (event_type)"
        ),
        "j3_cartesian": (
            "SELECT a.user_id, a.event_id AS subj_id, b.event_id AS obj_id"
            " FROM events a JOIN events b ON a.user_id = b.user_id"
            " WHERE a.event_type = 'signup' AND b.event_type = 'purchase'"
        ),
        "a1_multihot": (
            "SELECT user_id, count(DISTINCT event_type) AS n_types,"
            " count(*) AS n_events FROM events GROUP BY user_id"
        ),
        "a2_group_by_relation": (
            "SELECT user_id, event_type, count(*) AS n,"
            " round(min(value), 3) AS min_value, round(max(value), 3) AS max_value"
            " FROM events GROUP BY user_id, event_type"
        ),
        "a4_micro_prf_counts": (
            "WITH pred AS (SELECT DISTINCT user_id, event_type FROM events WHERE value > 100.0),"
            " gold AS (SELECT DISTINCT user_id, event_type FROM events WHERE value > 120.0)"
            " SELECT (SELECT count(*) FROM pred) AS pre_cnt,"
            " (SELECT count(*) FROM gold) AS true_cnt,"
            " (SELECT count(*) FROM pred JOIN gold USING (user_id, event_type)) AS cor_cnt"
        ),
        "u4_marker_splice": (
            "SELECT doc_id, array_to_string("
            " list_concat(string_split(text, ' ')[1:6], ['[relation3]', '[SEP]']), ' ')"
            " AS spliced_text FROM documents"
        ),
        "dedup_exact": (
            "SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id,"
            " count(*) AS dup_count FROM documents GROUP BY md5(text)"
        ),
        "text_token_count": (
            "SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN 0"
            " ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS token_cnt"
            " FROM documents"
        ),
        "text_lang_id": (
            "SELECT doc_id, CASE WHEN"
            " (' ' || lower(text) || ' ') LIKE '% the %'"
            " OR (' ' || lower(text) || ' ') LIKE '% and %'"
            " OR (' ' || lower(text) || ' ') LIKE '% of %'"
            " THEN 'en' ELSE 'other' END AS lang_pred FROM documents"
        ),
        "ann_cosine_topk": (
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings"
            "  WHERE vec_id < 3),"
            " scored AS (SELECT q.query_id, e.vec_id AS neighbor_id,"
            "  list_cosine_similarity(e.embedding::DOUBLE[], q.qvec::DOUBLE[]) AS cos_sim"
            "  FROM embeddings e, q WHERE e.vec_id <> q.query_id),"
            " ranked AS (SELECT query_id, neighbor_id, cos_sim,"
            "  row_number() OVER (PARTITION BY query_id"
            "   ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM scored)"
            " SELECT query_id, neighbor_id, rank, round(cos_sim, 4) AS cos_sim_r"
            " FROM ranked WHERE rank <= 10"
        ),
        # extract_triples: no oracle (mock model forwards are not
        # SQL-expressible) -> driver records rows-only check.
    }
