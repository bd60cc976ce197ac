"""Graph analytics over the constructed KG (and co-occurrence graphs).

The reference pipeline stops at emitting (subj, pred, obj) triples
(/root/reference/src/openue/models/model.py:333-376 materializes them as a
Python list); the first questions a consumer asks of the *constructed*
graph are graph-shaped: "what is within two hops of this entity?"
(neighborhood expansion for context retrieval / negative-sample locality)
and "how clustered is this graph?" (triangle/wedge census — the standard
KG-quality and community-structure signal), plus "which entities matter?"
(deterministic integer PageRank) and "what belongs together?" (weakly
connected components, the graph-API face of the linking engine's
production CC). Every op takes a plain (src, dst) edge DataFrame —
canonical triples projected to subj/obj, or any co-occurrence
construction — and is exact, integer-valued, and mirrored
construct-for-construct by a DuckDB oracle in contract.py.

Scale design:

- ``two_hop_reach``: one self-join on the mid column + count(distinct).
  The intermediate is sum over mids of deg_in(m) * deg_out(m) — hub mids
  dominate. Two mitigations ride the same code path: ``max_mid_degree``
  deterministically truncates each mid's neighbor list (sorted-first-N, so
  resume/backfill reproduce the same truncation and an oracle can mirror
  it), and ``approx=True`` swaps the exact distinct-count for
  approx_count_distinct (HyperLogLog++ partial-aggregates map-side, so the
  shuffle carries fixed-size sketches instead of every (a, b) pair).
  The contract query runs the exact/uncapped form — it IS the oracle.

- ``triangle_stats``: degree orientation (Suri & Vassilvitskii's
  MapReduce triangle counting; Schank-Wagner ordering): orient every
  undirected edge from its (degree, id)-smaller endpoint to the larger.
  Each triangle a<b<c (in that total order) then materializes exactly once
  — as the wedge (a->b, a->c) closed by the oriented edge (b->c) — and the
  wedge count is sum over v of C(outdeg(v), 2) with outdeg bounded by the
  orientation (O(sqrt(|E|)) per node for any graph), i.e. O(|E|^1.5)
  total work instead of sum of C(deg, 2) which a hub makes quadratic.
  Everything is joins + groupBys on the edge keys: partial-aggregatable,
  AQE-splittable, no driver state, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def symmetrize(edges: DataFrame) -> DataFrame:
    """Distinct undirected adjacency (a, b) — both directions of every
    edge, self-loops dropped. Input columns: (src, dst)."""
    e = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    rev = edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    return e.unionByName(rev).where(F.col("a") != F.col("b")).distinct()


def two_hop_reach(
    edges: DataFrame,
    max_mid_degree: int | None = None,
    approx: bool = False,
) -> DataFrame:
    """(entity, n_two_hop): for every node, the number of distinct nodes
    reachable by a path of length exactly 2 over the UNDIRECTED graph
    (self excluded; 1-hop neighbors count when they are also 2-hop
    reachable — "friends of friends" semantics).

    ``max_mid_degree`` caps ONLY the hop2 (mid) side: any mid whose degree
    exceeds N contributes just its deterministically-first N neighbors
    (ordered by neighbor id) — the hub cap for the 10^8-node regime. The
    source side stays exact, so a low-degree entity adjacent to a hub
    still counts 2-hop targets through ALL its own edges. The truncation
    is bucketed (keep the N smallest per (mid, hash-bucket), then the N
    smallest of those survivors) so no single task ever holds a mega-hub's
    full adjacency — the window key is (mid, bucket) in stage 1 and a
    <= N_BUCKETS*N row group in stage 2. ``approx`` uses
    approx_count_distinct so the final aggregation ships HLL sketches,
    not pairs. Defaults are exact (the oracle form).
    """
    sym = symmetrize(edges)
    if max_mid_degree is None and not approx:
        return _two_hop_reach_exact(sym)
    hop1 = sym.select(F.col("a"), F.col("b").alias("m"))
    mids = sym
    if max_mid_degree is not None:
        n_buckets = 32
        w1 = Window.partitionBy("a", "_bkt").orderBy("b")
        pre = (
            sym.withColumn("_bkt", F.pmod(F.xxhash64("b"), F.lit(n_buckets)))
            .withColumn("_rn", F.row_number().over(w1))
            .where(F.col("_rn") <= max_mid_degree)
            .drop("_rn", "_bkt")
        )
        w2 = Window.partitionBy("a").orderBy("b")
        mids = (
            pre.withColumn("_rn", F.row_number().over(w2))
            .where(F.col("_rn") <= max_mid_degree)
            .drop("_rn")
        )
    hop2 = mids.select(F.col("a").alias("m"), F.col("b"))
    paths = hop1.join(hop2, "m").where(F.col("a") != F.col("b"))
    counter = F.approx_count_distinct("b") if approx else F.count_distinct("b")
    return paths.groupBy(F.col("a").alias("entity")).agg(
        counter.cast("long").alias("n_two_hop")
    )


def _two_hop_reach_exact(sym: DataFrame) -> DataFrame:
    """Exact two-hop reach with the hub-wedge blowup factored out.

    The naive self-join materializes sum over mids of deg(m)^2 wedge rows
    — quadratic in hub degree (measured 22 s at driver sf1.0: 25 hub mids
    of degree ~6400 produced ~1.0B wedges). But a source with exactly ONE
    distinct neighbor m has 2-hop set N(m) \\ {a} by definition, so its
    count is the CLOSED FORM deg(m) - 1 — no wedge rows at all. Only
    multi-neighbor sources (the hubs themselves and their connectors —
    a vanishing fraction in hub-shaped graphs, and never worse than the
    naive join otherwise) run the wedge enumeration, whose cost is then
    sum over THEIR mids' degrees, not squares. Same output contract as
    the naive form, verified by the frozen DuckDB oracle: sources with
    zero 2-hop targets stay ABSENT (the deg(m) - 1 = 0 case is filtered,
    matching the empty groupBy group), counts are exact distincts."""
    nb = (
        sym.groupBy("a")
        .agg(F.count(F.lit(1)).alias("deg"), F.max("b").alias("m1"))
        .localCheckpoint(eager=False)  # three consumers below
    )
    deg_of = nb.select(F.col("a").alias("m1"), F.col("deg").alias("mdeg"))
    singles = (
        nb.where(F.col("deg") == 1)
        .join(deg_of, "m1")
        .where(F.col("mdeg") > 1)  # deg(m)-1 = 0 -> absent, like the naive form
        .select(
            F.col("a").alias("entity"),
            (F.col("mdeg") - 1).cast("long").alias("n_two_hop"),
        )
    )
    multi_src = nb.where(F.col("deg") > 1).select("a")
    hop1 = sym.join(multi_src, "a", "left_semi").select(
        F.col("a"), F.col("b").alias("m")
    )
    hop2 = sym.select(F.col("a").alias("m"), F.col("b"))
    paths = hop1.join(hop2, "m").where(F.col("a") != F.col("b"))
    multis = paths.groupBy(F.col("a").alias("entity")).agg(
        F.count_distinct("b").cast("long").alias("n_two_hop")
    )
    return singles.unionByName(multis)


def pagerank_int(
    edges: DataFrame,
    iterations: int = 3,
    scale: int | None = 10**12,
    damping_pct: int = 85,
    node_count: int | None = None,
) -> DataFrame:
    """(node, rank): `iterations` rounds of DETERMINISTIC integer PageRank
    over the directed simple graph (distinct edges, self-loops dropped).

    Every arithmetic step is bigint with floor division — rank starts at
    `scale`, each round a node keeps base = (100-damping_pct)*scale div
    100 plus damping_pct per cent of the floor-divided contributions of
    its in-neighbors (contrib(u) = rank(u) div outdeg(u)). Integer sums
    are order-independent and floor division is engine-portable (Spark
    `div` == DuckDB `//`, probed truncation-identical), so the result is
    EXACT and oracle-checkable cross-engine — unlike float PageRank,
    whose sum order perturbs the low bits per partition plan. Dangling
    nodes (outdeg 0) simply leak their mass, the classic uncorrected
    variant; relative ranking is what consumers use.

    Scale safety: each round is one edges->ranks equi-join + one groupBy
    on dst (partial-aggregatable bigint sums); per-round lineage is cut
    with a lazy localCheckpoint (the iterative-loop discipline — without
    it round T re-runs rounds 1..T-1).

    Overflow guard: total rank mass stays <= n*scale (base contracts it),
    and a star graph can funnel ALL of it into one node, so the worst
    intermediate is damping_pct * n * scale — that must fit in int64.
    At the default scale 10^12 that caps n at ~1.08 * 10^5 nodes, so the
    function VALIDATES: n is `node_count` if given, else one cheap
    `nodes.count()` (which just prepays the lazy checkpoint the first
    iteration would materialize anyway). An explicit over-limit `scale`
    raises ValueError; `scale=None` auto-picks the largest power of 10
    that is safe (capped at 10^12) — e.g. 10^10 at 10^7 nodes, 10^7 at
    10^10 nodes. Rank values are only comparable across runs that used
    the same scale, so persisted outputs should record it.
    """
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = node_count if node_count is not None else nodes.count()
    safe_scale = (2**63 - 1) // max(n, 1) // damping_pct
    if scale is None:
        scale = 1
        while scale * 10 <= min(safe_scale, 10**12):
            scale *= 10
    elif scale > safe_scale:
        raise ValueError(
            f"pagerank_int: scale={scale} can overflow int64 at n={n}"
            f" nodes (worst intermediate damping_pct*n*scale); pass"
            f" scale<={safe_scale} or scale=None to auto-size"
        )
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    base = (100 - damping_pct) * scale // 100
    ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
    for _ in range(iterations):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div outdeg").alias("c"),
            )
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("c"))
        ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"(CAST({damping_pct} AS BIGINT)"
                        " * coalesce(c, CAST(0 AS BIGINT))) div 100"
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def label_propagation(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """(node, label): `iterations` rounds of SYNCHRONOUS label propagation
    over the undirected simple graph — deterministic community detection.
    Every node starts as its own label; each round it adopts the most
    frequent label among its neighbors, ties broken by MINIMUM label.

    Classic async LPA is run-order-dependent (its results are not even
    reproducible run-to-run); this synchronous variant with an ordered
    tie-break is a PURE FUNCTION of the edge set — exact integer vote
    counts plus a (count desc, label asc) argmax — so the result is
    hash-checkable cross-engine and the DuckDB oracle unrolls the same
    rounds as CTEs (the pagerank_int pattern). Fixed `iterations` bounds
    the work; labels after k rounds reflect k-hop majority structure,
    which is what the dense-community use case reads.

    Scale shape: per round ONE equi-join (adjacency x labels) + one
    partial-aggregatable groupBy((node, label)) + one per-node window
    argmax over the (node, label) vote rows — no label-set explosion
    beyond the live vote counts; per-round lineage is cut with a lazy
    localCheckpoint (the iterative-loop discipline)."""
    adj = symmetrize(edges).localCheckpoint(eager=False)
    nodes = adj.select(F.col("a").alias("node")).distinct().localCheckpoint(
        eager=False
    )
    labels = nodes.select("node", F.col("node").alias("label"))
    w = Window.partitionBy("node").orderBy(
        F.col("c").desc(), F.col("label").asc()
    )
    for _ in range(iterations):
        votes = (
            adj.join(labels.withColumnRenamed("node", "a"), "a")
            .groupBy(F.col("b").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        picked = (
            votes.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("node", F.col("label").alias("_new"))
        )
        labels = (
            nodes.join(picked, "node", "left")
            .select(
                "node", F.coalesce(F.col("_new"), F.col("node")).alias("label")
            )
            .localCheckpoint(eager=False)
        )
    return labels


def connected_components(edges: DataFrame) -> DataFrame:
    """(node, component): min-label weakly-connected components of the
    (src, dst) edge list — the graph-API face of the linking engine's
    production CC (pipeline/linking.py): contraction-interleaved
    label propagation, per-round localCheckpoint lineage cuts, and the
    gated exact driver finish for small/contracted edge sets. Hash-checked
    against a DuckDB transitive-closure oracle via the driver row
    `link_connected_components`; this wrapper only renames the schema.
    Isolated nodes (no edges) do not appear — callers can left-join
    their node table and coalesce(component, node)."""
    from ..pipeline.linking import connected_components as _cc

    e = (
        edges.select(F.col("src").alias("a_id"), F.col("dst").alias("b_id"))
        .where(F.col("a_id") != F.col("b_id"))
        .distinct()
    )
    nodes = (
        e.select(F.col("a_id").alias("mention_id"))
        .unionByName(e.select(F.col("b_id").alias("mention_id")))
        .distinct()
    )
    return _cc(nodes, e, strict=True).select(
        F.col("mention_id").alias("node"), F.col("label").alias("component")
    )


# closure-side broadcast gate for triangle_stats: below this edge count
# the hashed closure relation is a few dozen MB and the wedge stream
# probes it shuffle-free; above it the relation build + fused-stage
# serialization LOSES to a shuffled-hash join (measured at 12M edges)
TRIANGLE_BROADCAST_MAX_EDGES = 1_000_000


def triangle_stats(edges: DataFrame) -> DataFrame:
    """One row: (n_nodes, n_edges, n_wedges, n_triangles) of the
    undirected simple graph induced by the (src, dst) edge list.

    n_wedges is the ORIENTED wedge count (candidate triangles under the
    degree orientation — exactly the set of pairs the closure join
    probes), so n_triangles / n_wedges is the closure rate the plan
    actually pays for. All four counts are exact BIGINTs.
    """
    # und and oriented each feed MULTIPLE count subtrees below; without
    # barriers the upstream edge construction (for the co-occurrence
    # contract row: a 6M-row lineitem self-join) re-ran once per subtree
    # (measured 62.5 s at driver sf1.0 -> 9.5 s with the barriers + the
    # analytic wedge count).
    und = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient u--v from the (degree, id)-smaller endpoint; carry the head's
    # degree so the wedge join can order its two heads by the same total
    # order without re-joining degrees
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
            F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dt"),
        )
        .localCheckpoint(eager=False)
    )
    o1 = oriented.select("s", F.col("t").alias("b"), F.col("dt").alias("db"))
    o2 = oriented.select("s", F.col("t").alias("c"), F.col("dt").alias("dc"))
    wedges = o1.join(o2, "s").where(
        (F.col("db") < F.col("dc"))
        | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
    ).select("b", "c")  # project before the closure exchange: s/db/dc are
    # dead past the head-order filter, and the wedge stream is the 400M+
    # row side of the next shuffle (guide §2.3 — shuffle fewer bytes)
    closures = oriented.select(F.col("s").alias("b"), F.col("t").alias("c"))
    # The closure probe is |wedges| >> |edges| (413M wedges vs 12M edges
    # at driver sf1.0), and sorting the whole wedge stream is the wall.
    # Measured A/B on that graph: sort-merge 75.6 s, broadcast of the
    # 12M-edge closure side 48.0 s (the single fused probe stage loses
    # its parallelism headroom and pays the 300 MB relation build),
    # shuffled-hash 16.7 s. At SMALL edge counts the ordering inverts —
    # a tiny closure side broadcast-joins for free while a forced SHJ
    # still shuffles every wedge — so the strategy is GATED on the edge
    # count (read off the already-checkpointed frame; the n_edges
    # aggregate pays this job anyway), the same bounded-broadcast rule as
    # linking.BROADCAST_MAX_MENTIONS. The edge side is the provably
    # smaller side (|E| <= |wedges| when any node has outdeg >= 2), so
    # shuffled-hash is safe at any scale; wedge-join variants (SHJ,
    # numbered repartition) measured within noise of plain SMJ.
    if und.count() <= TRIANGLE_BROADCAST_MAX_EDGES:
        tri = wedges.join(F.broadcast(closures), ["b", "c"])
    else:
        tri = wedges.join(closures.hint("shuffle_hash"), ["b", "c"])
    # n_wedges analytically: under the head total order exactly C(d, 2)
    # ordered head pairs survive per source of oriented outdegree d —
    # identical to counting the enumerated wedge rows, without running
    # the wedge join twice (once for its count, once under the closure).
    n_wedges = (
        oriented.groupBy("s")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(
            F.sum(F.expr("d * (d - 1) div 2")).cast("long").alias("n_wedges")
        )
        .select(F.coalesce(F.col("n_wedges"), F.lit(0).cast("long")).alias("n_wedges"))
    )
    return (
        deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .crossJoin(und.agg(F.count(F.lit(1)).cast("long").alias("n_edges")))
        .crossJoin(n_wedges)
        .crossJoin(tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles")))
    )
