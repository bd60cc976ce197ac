"""Similarity search over embedding columns.

- brute-force cosine top-k: the exact baseline (and recall oracle)
- IVF top-k: the scale path — coarse-quantize vectors to the nearest of C
  DATA-AWARE centroids (broadcast), search only the query's nprobe closest
  buckets. At 100 TB this turns an all-pairs cross join into
  (n/C * nprobe) candidate comparisons per query with a broadcastable
  centroid table; bucket assignment is a narrow map.

Centroids come from `kmeans_centroids`: a deterministic hash-ordered sample
(bounded rows to the driver) refined by spherical k-means in numpy with
seeded init — data-aware bucket boundaries instead of the first-N vectors,
reproducible across runs/partitionings because both the sample membership
and the init depend only on vec_id hashes, never on partition order.

Dot products use built-in array expressions (zip_with/aggregate — JVM-side).
"""

from __future__ import annotations

import numpy as np
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


def kmeans_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    sample_cap: int = 4096,
    iters: int = 8,
) -> DataFrame:
    """Data-aware IVF centroids: spherical k-means over a deterministic
    sample, returned as a tiny (centroid_id, cvec) DataFrame to broadcast.

    - Sample = the sample_cap rows with the smallest xxhash64(vec_id) —
      membership depends only on ids, so it is identical across runs,
      partitionings, and executors (a distributed top-k, one shuffle of
      sample_cap rows per partition).
    - Lloyd iterations run in numpy on the driver (sample_cap x dim floats,
      bounded memory); init = the first n_centroids sample rows in hash
      order (pseudo-random spread, no RNG state). Cosine assignment +
      renormalized means = spherical k-means, matching the cosine metric
      used for bucket assignment and probing.
    - Empty clusters are re-seeded deterministically from the sample tail.
    """
    e = embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    sample = (
        e.withColumn("h", F.xxhash64("vec_id"))
        .orderBy("h", "vec_id")
        .limit(sample_cap)
        .collect()
    )
    if not sample:  # empty input -> empty centroid table, empty buckets
        return embeddings.sparkSession.createDataFrame(
            [], "centroid_id int, cvec array<double>"
        )
    mat = np.array([r.emb for r in sample], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = mat / norms
    c = min(n_centroids, len(unit))
    cent = unit[:c].copy()
    for _ in range(iters):
        sims = unit @ cent.T
        assign = np.argmax(sims, axis=1)
        # deterministic re-seed pool for empty clusters: points worst-served
        # by their current centroid, each used at most once per iteration
        # (a shared argmin would hand every empty cluster the SAME point ->
        # duplicate centroids -> permanently dead buckets)
        reseed = iter(np.argsort(np.max(sims, axis=1)))
        for j in range(c):
            members = unit[assign == j]
            if len(members) == 0:
                cent[j] = unit[int(next(reseed))]
                continue
            m = members.mean(axis=0)
            n = np.linalg.norm(m)
            cent[j] = m / n if n > 0 else m
    rows = [(j, [float(x) for x in cent[j]]) for j in range(c)]
    return embeddings.sparkSession.createDataFrame(
        rows, "centroid_id int, cvec array<double>"
    )


def assign_ivf_buckets(
    embeddings: DataFrame, n_centroids: int = 16, centroids: DataFrame | None = None
) -> DataFrame:
    """Coarse quantization: every vector joins its nearest centroid (cosine).
    Centroid table is tiny -> broadcast; assignment is one narrow pass.
    Centroids default to data-aware k-means (kmeans_centroids); pass a
    precomputed (centroid_id, cvec) frame to share one fit across stages."""
    e = embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    if centroids is None:
        centroids = kmeans_centroids(embeddings, n_centroids)
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
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: search only the nprobe buckets whose centroids are
    closest to the query. queries: (query_id, qvec). One centroid fit is
    shared by bucket assignment and query probing."""
    if centroids is None:
        centroids = kmeans_centroids(embeddings, n_centroids)
    # no persist: the centroid frame is a <=n_centroids-row local relation
    # (createDataFrame over collected rows) consumed via broadcast — caching
    # it would leak a block-manager entry per call and mutate the storage
    # level of caller-supplied frames
    bucketed = assign_ivf_buckets(embeddings, n_centroids, centroids=centroids)

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
