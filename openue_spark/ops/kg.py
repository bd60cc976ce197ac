"""KG-embedding training-data ops over the triple table.

The reference stops at emitting triples; a production KG pipeline feeds
them onward into embedding training (TransE-style), which needs NEGATIVE
samples: per positive (s, p, o), k corrupted triples (s, p, o') with o'
drawn uniformly from the entity vocabulary, excluding corruptions that are
themselves true triples ("filtered" sampling — scoring a true triple as a
negative poisons the loss).

Scale design — no dense entity ids, no driver-side vocabulary:

- The classic formulation samples o' by random index into an entity array,
  which needs either a dense-id table (global row_number = single-partition
  sort) or a driver-collected vocab (doesn't fit). Instead entities are
  hashed into B string-keyed buckets (md5 prefix — uniform by
  construction); WITHIN each bucket members get a local dense rank
  (row_number over a TARGET-sized partition — parallel, never a global
  sort). Each corruption deterministically targets bucket md5(s|p|o|i)
  and picks the member at rank hash(ckey) % bucket_size: one equi-join to
  the per-bucket size, one exact equi-join on (bucket, rank). Every
  corruption matches exactly ONE vocab row, so per-corruption work is
  O(1) at any |E| — no skew surface, no expansion, fully deterministic:
  resume/backfill emits byte-identical samples WITHIN one sampler version
  (SAMPLER_VERSION below). The round-3 rank-mod redesign changed which
  negatives identical inputs draw vs the round-2 rendezvous sampler, so a
  backfill spanning versions would mix two sampling regimes in one table;
  stamp persisted outputs with F.lit(SAMPLER_VERSION) so a mixed table is
  detectable. An earlier rendezvous
  variant (arg-min of md5(entity @ ckey) over bucket MEMBERS) cost
  |pos| * k * |E|/B intermediate rows — 2M rows and 3x wall-clock on the
  sf0.1 bench, and unboundedly worse as |E| grows.
- Per-corruption uniformity: bucket choice is uniform over B, the 60-bit
  hash mod bucket_size is uniform within the bucket (mod bias ~ sz/2^60),
  so entity selection is uniform up to bucket-size variation
  (multinomial; negligible for |E| >> B).
- "Filtered": corruptions colliding with a TRUE triple are dropped by an
  anti-join against the positive set (left_anti on (subj, pred, obj) —
  the standard Bordes-et-al. protocol), as are no-op corruptions o' = o.
  A corruption landing in an empty bucket emits nothing (at |E| >> B every
  bucket is populated; the contract oracle mirrors the same drop).

Everything is md5-based specifically so a DuckDB oracle can mirror the
sampling bit-for-bit (xxhash64 exists only on the Spark side; the 60-bit
rank hash is conv(md5-prefix, 16, 10) here and ('0x' || prefix)::BIGINT
there, verified bit-identical).

Bucket-width auto-sizing: `auto_bucket_hex` picks the smallest W with
mean bucket size <= TARGET_BUCKET_ENTITIES (64). The width no longer
drives join cost (the rank join is expansion-free); it bounds the
row_number window partitions and the per-bucket size table, and keeps
buckets populated enough that empty-bucket drops stay rare (mean
occupancy lands in (4, 64]; P(empty) <= e^-4 ~ 2% at the low edge, and
those drops are deterministic and oracle-mirrored). The width derives
from an EXACT distinct count — approx_count_distinct would be cheaper
but could disagree with the DuckDB oracle's exact count at a threshold
boundary and silently flip every bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BUCKET_HEX = 2  # legacy fixed width (16^2 = 256 buckets); None -> auto
TARGET_BUCKET_ENTITIES = 64  # auto-size target mean bucket occupancy
# Sampling-regime version: bumped whenever the deterministic pick rule or
# its defaults change (1 = rendezvous arg-min, fixed bucket_hex=2, rounds
# 1-2; 2 = rank-mod pick, auto-sized buckets, round 3+). Byte-identical
# resume/backfill holds only within one version — stamp persisted
# negative-sample tables with this so cross-version backfills are
# detectable rather than silent.
SAMPLER_VERSION = 2
MAX_BUCKET_HEX = 8


def auto_bucket_hex(
    n_entities: int,
    target: int = TARGET_BUCKET_ENTITIES,
    max_hex: int = MAX_BUCKET_HEX,
) -> int:
    """Smallest md5-prefix width W (1..max_hex) with |E| / 16^W <= target.
    Pure integer compares so the DuckDB oracle's CASE chain
    (contract._duck_kg_width_case) derives the identical W from the same
    exact count."""
    w = 1
    while w < max_hex and n_entities > target * (16 ** w):
        w += 1
    return w


def _vocab_and_width(
    triples: DataFrame, bucket_hex: int | None
) -> tuple[DataFrame, int]:
    ents = (
        triples.select(F.col("subj").alias("entity"))
        .unionByName(triples.select(F.col("obj").alias("entity")))
        .where(F.length("entity") > 0)
        .distinct()
    )
    if bucket_hex is None:
        ents = ents.localCheckpoint(eager=True)
        bucket_hex = auto_bucket_hex(ents.count())
    return (
        ents.withColumn("bucket", F.substring(F.md5("entity"), 1, bucket_hex)),
        bucket_hex,
    )


def entity_vocab(triples: DataFrame, bucket_hex: int | None = None) -> DataFrame:
    """(entity, bucket): distinct subj/obj surface forms, bucketed by md5
    prefix (string-keyed — uniform, engine-portable). `bucket_hex` sets the
    prefix width (16^bucket_hex buckets); None (default) auto-sizes it from
    an exact distinct count so mean bucket occupancy stays ~TARGET
    regardless of vocabulary size (see module docstring cost model). The
    distinct vocabulary is localCheckpointed when auto-sizing: the count
    action and the downstream rendezvous join then share one shuffle
    instead of recomputing the distinct, and the blocks are reclaimed by
    the ContextCleaner once the plan is dereferenced."""
    return _vocab_and_width(triples, bucket_hex)[0]


def negative_samples(
    triples: DataFrame,
    k: int = 2,
    entities: DataFrame | None = None,
    bucket_hex: int | None = None,
) -> DataFrame:
    """k filtered tail-corruption negatives per distinct positive triple.

    Returns (subj, pred, obj, neg_idx, neg_obj): the positive triple, the
    corruption index 1..k, and the sampled replacement tail. Fewer than k
    rows come back for a positive when a corruption is filtered (true
    triple, o' = o, or empty bucket).

    `bucket_hex` None (default) auto-sizes the bucket count from the
    vocabulary's exact distinct count (module docstring cost model).
    `entities` overrides the corpus-derived vocabulary (e.g. a persisted
    entity dim covering the full KG when sampling for one partition); a
    prebuilt vocabulary already carries its bucket keys, so the matching
    width MUST be passed explicitly — a mismatched corruption-side prefix
    would silently sample from the wrong (or no) bucket.
    """
    if entities is not None:
        if bucket_hex is None:
            raise ValueError(
                "negative_samples: pass the bucket_hex the prebuilt"
                " `entities` vocabulary was built with"
            )
        vocab = entities
    else:
        vocab, bucket_hex = _vocab_and_width(triples, bucket_hex)
    # the distinct positive set feeds THREE consumers (corruption fan-out,
    # true-triple filter, and — via the caller — often the vocab too);
    # checkpoint it once instead of re-running the upstream plan per branch
    pos = triples.select("subj", "pred", "obj").distinct().localCheckpoint(
        eager=False
    )
    # one row per (positive, corruption index), each targeting its bucket
    cand = pos.select(
        "subj",
        "pred",
        "obj",
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("neg_idx"),
    ).withColumn(
        "ckey", F.md5(F.concat_ws("|", "subj", "pred", "obj", "neg_idx"))
    ).withColumn("bucket", F.substring("ckey", 1, bucket_hex))
    # rank-mod pick: number the bucket members 0..sz-1 (row_number over the
    # bucket — partitions are TARGET-sized, so the window never sees a big
    # partition), then each corruption selects rank = hash(ckey) % sz.
    # Unlike a rendezvous pick over bucket members, the join matches
    # EXACTLY ONE vocab row per corruption — no |E|/B-row expansion before
    # an arg-min, so per-corruption work is O(1) at any vocabulary size
    # (the old rendezvous form cost |pos|*k*|E|/B intermediate rows;
    # measured 3x on the sf0.1 bench). hash = the first 15 hex chars of
    # ckey as a 60-bit int — conv() here, ('0x'||...)::BIGINT in the
    # DuckDB oracle, verified bit-identical; mod bias over <= 2^12-sized
    # buckets is ~sz/2^60, immaterial.
    wb = Window.partitionBy("bucket").orderBy("entity")
    ranked = vocab.select(
        "bucket", "entity", (F.row_number().over(wb) - 1).alias("rnk")
    )
    sizes = vocab.groupBy("bucket").agg(F.count(F.lit(1)).alias("bsz"))
    targeted = cand.join(sizes, "bucket").withColumn(
        "rnk",
        F.expr("cast(conv(substring(ckey, 1, 15), 16, 10) as bigint)")
        % F.col("bsz"),
    )
    picked = (
        targeted.join(ranked.select("bucket", "rnk", "entity"), ["bucket", "rnk"])
        .select(
            "subj", "pred", "obj", "neg_idx", F.col("entity").alias("neg_obj")
        )
        .where(F.col("neg_obj") != F.col("obj"))
    )
    # filtered protocol: a corruption that IS a true triple is dropped
    truth = pos.select(
        F.col("subj"), F.col("pred"), F.col("obj").alias("neg_obj")
    )
    return picked.join(truth, ["subj", "pred", "neg_obj"], "left_anti").select(
        "subj", "pred", "obj", "neg_idx", "neg_obj"
    )
