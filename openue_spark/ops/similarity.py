"""Similarity search over embedding columns.

- brute-force cosine top-k: the exact baseline (and recall oracle)
- IVF top-k: the scale path — coarse-quantize vectors to the nearest of C
  deterministic centroids (broadcast), search only the query's nprobe
  closest buckets. At 100 TB this turns an all-pairs cross join into
  (n/C * nprobe) candidate comparisons per query with a broadcastable
  centroid table; bucket assignment is a narrow map.

Dot products use built-in array expressions (zip_with/aggregate — JVM-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
_NORM = "sqrt(aggregate(transform({a}, x -> x * x), 0D, (acc, v) -> acc + v))"


def _cosine(a: str, b: str):
    return F.expr(f"{_DOT.format(a=a, b=b)} / ({_NORM.format(a=a)} * {_NORM.format(a=b)})")


def brute_force_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10) -> DataFrame:
    """Exact top-k by cosine. queries: (query_id, qvec)."""
    e = embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    pairs = e.crossJoin(F.broadcast(queries)).where(F.col("vec_id") != F.col("query_id"))
    scored = pairs.withColumn("cos_sim", _cosine("emb", "qvec"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank",
                F.round("cos_sim", 4).alias("cos_sim_r"))
    )


def assign_ivf_buckets(embeddings: DataFrame, n_centroids: int = 16) -> DataFrame:
    """Coarse quantization: centroids = the first n_centroids vectors by
    vec_id (deterministic seeds); every vector joins its nearest centroid.
    Centroid table is tiny -> broadcast; assignment is one narrow pass."""
    e = embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    centroids = e.where(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("emb").alias("cvec")
    )
    scored = e.crossJoin(F.broadcast(centroids)).withColumn(
        "c_sim", _cosine("emb", "cvec")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("c_sim"), F.asc("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "emb", "centroid_id")
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """Approximate top-k: search only the nprobe buckets whose centroids are
    closest to the query. queries: (query_id, qvec)."""
    e = embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    centroids = e.where(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("emb").alias("cvec")
    )
    bucketed = assign_ivf_buckets(embeddings, n_centroids)

    qc = queries.crossJoin(F.broadcast(centroids)).withColumn(
        "c_sim", _cosine("qvec", "cvec")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("c_sim"), F.asc("centroid_id"))
    probes = (
        qc.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select("query_id", "qvec", "centroid_id")
    )

    cands = bucketed.join(probes, "centroid_id").where(F.col("vec_id") != F.col("query_id"))
    scored = cands.withColumn("cos_sim", _cosine("emb", "qvec"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank",
                F.round("cos_sim", 4).alias("cos_sim_r"))
    )


def recall_at_k(approx: DataFrame, exact: DataFrame) -> float:
    """Fraction of exact top-k pairs recovered by the approximate search."""
    hit = approx.select("query_id", "neighbor_id").intersect(
        exact.select("query_id", "neighbor_id")
    )
    total = exact.count()
    return hit.count() / total if total else 1.0
