"""Entity linking / canonicalization stage tests (SURVEY.md §2.10)."""

import pytest
from pyspark.sql import functions as F

from openue_spark.pipeline.linking import (
    candidate_pairs,
    canonical_triples,
    canonicalize,
    connected_components,
    embed_mentions,
    link_entities,
    mention_table,
    rerank_cosine,
)


@pytest.fixture(scope="module")
def triples_df(spark):
    rows = [
        # cluster: 'acme corp' variants (near-dup surface forms)
        ("c0", 0, "acme corp", 0, "works_at", "alice smith"),
        ("c0", 1, "acme corp.", 0, "works_at", "alice smith"),
        ("c1", 0, "acme corporation", 0, "works_at", "bob jones"),
        # unrelated mentions
        ("c1", 1, "zebra industries", 2, "located_in", "paris"),
        ("c2", 0, "alice smith", 5, "spouse_of", "bob jones"),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, subj string, rel_id int, pred string, obj string"
    )


def test_mention_table_distinct_and_stable(spark, triples_df):
    m = mention_table(triples_df)
    names = {r.mention for r in m.collect()}
    assert names == {
        "acme corp", "acme corp.", "acme corporation",
        "alice smith", "bob jones", "zebra industries", "paris",
    }
    ids1 = dict(m.collect())
    ids2 = {r.mention: r.mention_id for r in mention_table(triples_df).collect()}
    assert {r.mention: r.mention_id for r in m.collect()} == ids2
    assert len(set(ids2.values())) == len(ids2)
    del ids1


def test_embeddings_normalized(spark, triples_df):
    emb = embed_mentions(mention_table(triples_df))
    norms = emb.select(
        F.expr("aggregate(transform(embedding, x -> x * x), 0D, (a, v) -> a + v)").alias("n2")
    ).collect()
    assert all(abs(r.n2 - 1.0) < 1e-9 for r in norms)


def test_lsh_blocks_near_duplicates(spark, triples_df):
    mentions = mention_table(triples_df)
    pairs = candidate_pairs(mentions, jaccard_distance=0.6)
    by_name = {r.mention: r.mention_id for r in mentions.collect()}
    got = {(min(r.a_id, r.b_id), max(r.a_id, r.b_id)) for r in pairs.collect()}
    a, b = by_name["acme corp"], by_name["acme corp."]
    assert (min(a, b), max(a, b)) in got
    # unrelated strings must not pair with acme
    z = by_name["zebra industries"]
    assert not any(z in p and (a in p or b in p) for p in got)


def test_connected_components_transitive(spark):
    mentions = spark.createDataFrame(
        [(i, f"m{i}") for i in range(6)], "mention_id long, mention string"
    ).select("mention", "mention_id")
    # chain 0-1-2, pair 3-4, singleton 5
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "a_id long, b_id long"
    )
    labels = {r.mention_id: r.label for r in connected_components(mentions, edges).collect()}
    assert labels[0] == labels[1] == labels[2] == 0
    assert labels[3] == labels[4] == 3
    assert labels[5] == 5


def test_end_to_end_linking_and_rewrite(spark, triples_df):
    mapping = link_entities(triples_df, jaccard_distance=0.6, min_cosine=0.5)
    canon = {r.mention: r.canonical for r in mapping.collect()}
    # the three acme variants canonicalize to one representative: the
    # shortest-then-lex member of the component
    assert canon["acme corp"] == canon["acme corp."] == canon["acme corporation"] == "acme corp"
    assert canon["zebra industries"] == "zebra industries"

    rewritten = canonical_triples(triples_df, mapping)
    subs = {r.subj for r in rewritten.collect()}
    assert "acme corp." not in subs and "acme corporation" not in subs
    assert "acme corp" in subs
    # row count preserved (linking rewrites, never drops)
    assert rewritten.count() == triples_df.count()


def test_rerank_filters_low_cosine(spark, triples_df):
    mentions = mention_table(triples_df)
    embedded = embed_mentions(mentions)
    pairs = candidate_pairs(mentions, jaccard_distance=0.95)  # very permissive
    kept = rerank_cosine(pairs, embedded, min_cosine=0.99).collect()
    # at 0.99 only truly-identical-shingle pairs could survive; acme corp vs
    # acme corporation share most trigrams but differ -> below 0.99
    for r in kept:
        assert r.cosine >= 0.99


def test_banded_blocking_matches_ml_lsh_on_clusters(spark, triples_df):
    """Both blockers must surface the acme-variant near-dup pairs; the
    banded path additionally guarantees exact-Jaccard-verified candidates."""
    from openue_spark.pipeline.linking import candidate_pairs_banded

    mentions = mention_table(triples_df)
    by_name = {r.mention: r.mention_id for r in mentions.collect()}
    got = {
        (min(r.a_id, r.b_id), max(r.a_id, r.b_id))
        for r in candidate_pairs_banded(mentions, jaccard_distance=0.6).collect()
    }
    acme = [by_name["acme corp"], by_name["acme corp."], by_name["acme corporation"]]
    assert (min(acme[0], acme[1]), max(acme[0], acme[1])) in got
    # no candidate pairs across obviously-unrelated surface forms
    far = (min(by_name["paris"], by_name["zebra industries"]),
           max(by_name["paris"], by_name["zebra industries"]))
    assert far not in got


def test_link_entities_banded_and_ml_agree_on_canonical_groups(spark, triples_df):
    groups = {}
    for blocker in ("banded", "ml"):
        mapping = link_entities(triples_df, blocker=blocker)
        groups[blocker] = {
            r.mention: r.canonical for r in mapping.collect()
        }
    assert groups["banded"] == groups["ml"]
    assert groups["banded"]["acme corp."] == groups["banded"]["acme corp"]


def test_connected_components_strict_raises_on_deep_chain(spark):
    """strict mode fails loudly when a component's diameter exceeds the
    iteration cap (the silent alternative diverges from the exact-closure
    oracle); a generous cap converges and labels the chain minimally."""
    import pytest
    from pyspark.sql import functions as F

    from openue_spark.pipeline.linking import connected_components

    n = 18
    mentions = spark.createDataFrame([(f"m{i:02d}",) for i in range(n)], "mention_id string")
    edges = spark.createDataFrame(
        [(f"m{i:02d}", f"m{i + 1:02d}") for i in range(n - 1)], "a_id string, b_id string"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(mentions, edges, max_iterations=3, strict=True)
    labels = connected_components(mentions, edges, max_iterations=50, strict=True)
    assert labels.where(F.col("label") != "m00").count() == 0


def test_candidate_edges_hot_bucket_cap(spark):
    """candidate_edges == (blocking -> verify -> rerank) conjunction on a
    small corpus, and the hot-bucket cap bounds candidate volume: with a
    cap below a degenerate bucket's size its pairs are dropped, while
    small-bucket corpora are unaffected by the default cap."""
    from pyspark.sql import functions as F

    from openue_spark.pipeline.linking import (
        candidate_edges,
        candidate_pairs_banded,
        embed_mentions,
        rerank_cosine,
    )

    rows = [(f"ent{i:03d} corp", ) for i in range(20)] + [("unrelated zebra",)]
    mentions = spark.createDataFrame(rows, "mention string").withColumn(
        "mention_id", F.xxhash64("mention")
    ).persist()
    emb = embed_mentions(mentions).persist()

    fused = {
        (r.a_id, r.b_id)
        for r in candidate_edges(mentions, emb, 0.6, 0.85, max_bucket=None).collect()
    }
    classic = {
        (r.a_id, r.b_id)
        for r in rerank_cosine(
            candidate_pairs_banded(mentions, 0.6), emb, 0.85
        ).collect()
    }
    assert fused == classic and len(fused) > 0  # reordered conjunction, same set

    # default cap leaves this small corpus untouched; a tiny cap drops the
    # shared-vocabulary bucket's pairs entirely
    dflt = {
        (r.a_id, r.b_id)
        for r in candidate_edges(mentions, emb, 0.6, 0.85).collect()
    }
    assert dflt == fused
    capped = candidate_edges(mentions, emb, 0.6, 0.85, max_bucket=2).count()
    assert capped < len(fused)
