"""spark-submit entry point: transcripts -> knowledge graph.

Usage (sandbox-scale example):

  zip -r /tmp/openue_spark.zip openue_spark
  spark-submit --master local[32] --driver-memory 8g \\
      --py-files /tmp/openue_spark.zip \\
      openue_spark/job.py --synthesize 60000 --out /tmp/kg_out --shards 16

NOTE --driver-memory matters in local mode: the driver JVM IS the executor,
and spark-submit's 1g default OOMs the linking stage around ~100k turns.
It cannot be raised from inside this script — spark-submit has already
started the JVM by the time Python runs (the job warns when it detects a
small heap).

or over an existing transcripts table:

  spark-submit --py-files /tmp/openue_spark.zip openue_spark/job.py \\
      --input /path/to/transcripts_parquet --out /tmp/kg_out

and fold a NEW batch into an existing KG without re-linking the corpus
(incremental maintenance; see pipeline/linking.py + PLANS.md §13):

  spark-submit --py-files /tmp/openue_spark.zip openue_spark/job.py \\
      --input /path/to/new_batch_parquet --out /tmp/kg_out --increment

Stages: sharded checkpoint-resumable extraction (manifest lineage) ->
entity linking/canonicalization (mapping persisted to mapping/) ->
deduplicated triple table partitioned by predicate. Re-submitting after a
failure resumes from the manifest; --increment re-links only the
components the batch touches and re-points only changed graph rows.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# self-locate when run as `spark-submit openue_spark/job.py` without
# --py-files (the zip path adds the package to every executor anyway)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None, spark=None) -> int:
    """CLI entry. `spark` is injectable for in-process tests; when provided
    the session is left running (the caller owns its lifecycle)."""
    parser = argparse.ArgumentParser(description="OpenUE-on-Spark KG construction job")
    src = parser.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="transcripts source (conv_id, turn_idx, role, text, tool, ts): a parquet dir, or with --format table an Iceberg/catalog table name")
    src.add_argument("--synthesize", type=int, help="synthesize N deterministic transcript turns")
    parser.add_argument(
        "--synthesize-offset", type=int, default=0,
        help="start --synthesize at this global turn index (disjoint batches"
        " for incremental runs; turns are a pure function of the index)",
    )
    parser.add_argument("--out", required=True, help="output dir (triples/, graph/, manifest/, mapping/)")
    parser.add_argument("--shards", type=int, default=16, help="conv_id-hash shards for resumability")
    parser.add_argument("--no-link", action="store_true", help="skip entity linking/canonicalization")
    parser.add_argument("--salt-buckets", type=int, default=1, help="dedup salt buckets (1 = plain one-shuffle agg; >1 = explicit two-phase salting, only pays for non-algebraic buffers — PLANS.md \u00a724)")
    parser.add_argument(
        "--increment", action="store_true",
        help="treat --input/--synthesize as a NEW batch folded into the"
        " existing KG at --out (requires a prior linked run's mapping/ and"
        " graph/); re-links only components the batch touches and re-points"
        " only graph rows whose canonical changed",
    )
    parser.add_argument(
        "--max-bucket", default="256",
        help="LSH hot-bucket cap for linking; 'none' disables it (the"
        " increment-equals-full-recompute exactness regime)",
    )
    parser.add_argument(
        "--format", default="parquet",
        help="--input format: 'parquet' (path scan, default), 'table' (a"
        " catalog table name — the Iceberg path, with the runtime jar +"
        " catalog conf supplied via spark-submit --packages/--conf), or any"
        " spark read format",
    )
    parser.add_argument(
        "--subword-piece-len", type=int, default=None, metavar="N",
        help="extract with the shipped WordPiece-shaped SubwordTokenizer(N)"
        " broadcast through the tokenizer seam instead of the default"
        " word-level tokenizer (the seam accepts any encode(text,"
        " max_length) -> (ids, words) object programmatically; this flag"
        " exposes the shipped instance). The extraction manifest keys"
        " resume lineage by (weights, tokenizer), so switching tokenizers"
        " never reuses shards extracted under another one",
    )
    parser.add_argument(
        "--vocab-file", default=None, metavar="PATH",
        help="extract with a real WordPiece tokenizer loaded from this"
        " vocab file (one piece per line, '##' continuations — the format"
        " of released bert-* vocab.txt files; greedy longest-match"
        " inference) broadcast through the same tokenizer seam. Mutually"
        " exclusive with --subword-piece-len. A fixture vocab built by"
        " scripts/make_vocab.py ships at openue_spark/golden/"
        "vocab_wordpiece.txt",
    )
    parser.add_argument(
        "--graph-stats", action="store_true",
        help="after materializing the graph, run the degree-oriented"
        " triangle/wedge census over the canonical entity graph"
        " (ops/graph.py — O(|E|^1.5) bounded, no hub blowup), write the"
        " one-row result to graph_stats/ and the top-100 hub entities by"
        " 3-round integer PageRank (overflow-safe auto scale) to"
        " graph_hubs/, logging both latencies to the manifest: the"
        " standard KG-quality / clustering / centrality signals",
    )
    parser.add_argument(
        "--sample-fraction", type=float, default=None, metavar="F",
        help="run on a deterministic sample of WHOLE conversations: keep a"
        " conv_id iff its stable hash falls under F (ops/sampling.py) —"
        " the same subset every run/partitioning, turn ordering intact."
        " Like --input, the sampled corpus is part of the run's identity:"
        " don't change F across resumes of one --out dir",
    )
    parser.add_argument(
        "--corpus-stats", action="store_true",
        help="before extraction, roll up THIS RUN's input corpus with the"
        " agent-transcript analytics (ops/transcripts.py): per-conversation"
        " role/tool/duration/token stats to corpus_stats/ and the per-tool"
        " usage audit to tool_usage/, latencies logged to the manifest —"
        " the corpus-triage pass an operator runs before committing a"
        " 100 TB extraction",
    )
    parser.add_argument(
        "--weights-from",
        help="load the best (metric, step) weights checkpoint from this dir's"
        " checkpoints/ table and broadcast it to the extraction UDFs"
        " (default: built-in weights)",
    )
    args = parser.parse_args(argv)
    if args.increment and args.no_link:
        parser.error("--increment folds into a LINKED graph; drop --no-link")
    max_bucket = (
        None if str(args.max_bucket).lower() == "none" else int(args.max_bucket)
    )

    owns_session = spark is None
    if owns_session:
        from pyspark import SparkConf
        from pyspark.sql import SparkSession

        from openue_spark.session import tuning_conf

        submitted = dict(SparkConf().getAll())  # conf from spark-submit --conf
        builder = SparkSession.builder.appName("openue_kg_job")
        for k, v in tuning_conf().items():
            if k not in submitted:  # engine defaults; explicit --conf wins
                builder = builder.config(k, v)
        spark = builder.getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        master = spark.sparkContext.master
        heap = int(spark._jvm.java.lang.Runtime.getRuntime().maxMemory())
        if master.startswith("local") and heap < 4 << 30:
            print(
                f"[job] WARNING: local-mode driver heap is only "
                f"{heap / (1 << 30):.1f} GiB — the driver JVM is also the "
                "executor here; pass `spark-submit --driver-memory 8g` or "
                "the linking stage may OOM at ~100k+ turns",
                file=sys.stderr,
            )

    from openue_spark.fixtures import transcripts_spark
    from openue_spark.mock_models import MockWeights
    from openue_spark.pipeline.artifacts import (
        read_best_checkpoint,
        write_checkpoint,
        write_run_config,
    )
    from openue_spark.pipeline.linking import canonical_triples, link_entities
    from openue_spark.pipeline.materialize import (
        log_stage_metric,
        run_extraction_resumable,
        write_triple_table,
    )

    t0 = time.time()
    # S6: every run records its resolved args + effective Spark conf first —
    # reproducibility before any data moves (reference main.py:76-84).
    run_id = __import__("uuid").uuid4().hex[:12]
    write_run_config(spark, args.out, vars(args), run_id)
    # S5: resolve the weights bundle (best persisted checkpoint when
    # --weights-from is given — the reference's best-ckpt load,
    # main.py:101-109) and record the exact bundle this run extracts with.
    if args.weights_from:
        weights, ck = read_best_checkpoint(spark, args.weights_from)
        print(f"[job] loaded checkpoint {ck.checkpoint_id} (metric={ck.metric})")
    else:
        weights = MockWeights.default()
    write_checkpoint(
        spark, args.out, weights, metric=None, step=0,
        checkpoint_id=f"{run_id}-deployed",
    )
    weights_bc = spark.sparkContext.broadcast(weights)
    tokenizer_bc = None
    if args.subword_piece_len is not None and args.vocab_file is not None:
        raise SystemExit("--subword-piece-len and --vocab-file are exclusive")
    if args.subword_piece_len is not None:
        from openue_spark.tokenizer import SubwordTokenizer

        tokenizer_bc = spark.sparkContext.broadcast(
            SubwordTokenizer(args.subword_piece_len)
        )
        print(f"[job] extracting with SubwordTokenizer({args.subword_piece_len})")
    elif args.vocab_file is not None:
        from openue_spark.tokenizer import VocabWordPieceTokenizer

        tok = VocabWordPieceTokenizer.from_file(args.vocab_file)
        tokenizer_bc = spark.sparkContext.broadcast(tok)
        print(
            f"[job] extracting with VocabWordPieceTokenizer"
            f"({len(tok.index)} pieces from {args.vocab_file})"
        )
    if args.input:
        from openue_spark.sources import read_transcripts

        transcripts = read_transcripts(spark, args.input, fmt=args.format)
    else:
        transcripts = transcripts_spark(
            spark, args.synthesize, offset=args.synthesize_offset
        )
    if args.sample_fraction is not None:
        from openue_spark.ops.sampling import deterministic_sample

        transcripts = deterministic_sample(
            transcripts, args.sample_fraction, "conv_id", salt="corpus-sample"
        )
        print(
            f"[job] sampling {args.sample_fraction:g} of conversations"
            " (stable hash of conv_id — whole conversations, same subset"
            " every run)"
        )

    if args.corpus_stats:
        _corpus_stats_phase(spark, transcripts, args.out, run_id)

    # an increment's extraction manifest lives under its own subdir: the
    # batch shares shard ids with the base corpus, so reusing the base
    # manifest would wrongly skip "completed" shards. The subdir key is a
    # DETERMINISTIC function of the batch source (not this run's uuid), so
    # re-submitting a failed increment lands in the same dir and resumes
    # its completed shards from the manifest.
    if args.increment:
        if args.input:
            import hashlib

            batch_key = "in_" + hashlib.md5(
                os.path.abspath(args.input).encode()
            ).hexdigest()[:12]
        else:
            batch_key = f"syn_{args.synthesize_offset}_{args.synthesize}"
        extract_dir = f"{args.out}/increments/{batch_key}"
    else:
        extract_dir = args.out
    from openue_spark.session import job_phase

    with job_phase(spark, "extract"):
        # n_raw rides the write-side shard counts — no readback-count scan
        raw, n_raw = run_extraction_resumable(
            spark, transcripts, extract_dir, n_shards=args.shards,
            weights_bc=weights_bc, tokenizer_bc=tokenizer_bc,
            return_count=True,
        )
    print(f"[job] extraction complete: {n_raw} raw triples ({time.time() - t0:.1f}s)")

    if args.increment:
        from openue_spark.pipeline.incremental import fold_batch_into_kg, kg_exists

        if not kg_exists(args.out):
            raise SystemExit(
                f"--increment needs an existing linked KG at {args.out}"
                " (missing mapping/ or graph/); run a full job there first"
            )
        t1 = time.time()
        stats = fold_batch_into_kg(
            raw, args.out, salt_buckets=args.salt_buckets, max_bucket=max_bucket
        )
        print(
            f"[job] incremental fold: {stats['n_changed']} mentions "
            f"re-canonicalized; graph refreshed to {stats['n_graph']} canonical "
            f"triples after folding {stats['n_raw']} new raw triples "
            f"({time.time() - t1:.1f}s); total {time.time() - t0:.1f}s"
        )
        log_stage_metric(
            spark, args.out, run_id, "fold",
            wall_ms=int((time.time() - t1) * 1000),
            row_count=stats["n_changed"], triple_count=stats["n_graph"],
        )
        if args.graph_stats:
            _graph_stats_phase(spark, args.out, run_id)
        if owns_session:
            spark.stop()
        return 0

    if not args.no_link:
        from openue_spark.pipeline.linking import mention_state, mention_table

        t1 = time.time()
        # ONE per-mention feature pass: the state table is both what
        # link_entities blocks from AND what --increment runs fold into
        # (state makes the fold Θ(batch) instead of Θ(corpus))
        with job_phase(spark, "mention-state"):
            state = mention_state(mention_table(raw)).localCheckpoint(eager=True)
            state.write.mode("overwrite").parquet(f"{args.out}/link_state")
        with job_phase(spark, "linking"):
            mapping = link_entities(raw, max_bucket=max_bucket, state=state)
            mapping.write.mode("overwrite").parquet(f"{args.out}/mapping")
        final = canonical_triples(raw, mapping)
        print(f"[job] linking complete ({time.time() - t1:.1f}s)")
        # north-rule metrics: stage latency + counts ride the same manifest
        # table as the per-shard extraction lineage (mapping is
        # checkpointed, so the count reads materialized blocks)
        log_stage_metric(
            spark, args.out, run_id, "link",
            wall_ms=int((time.time() - t1) * 1000),
            row_count=mapping.count(), triple_count=n_raw,
        )
    else:
        final = raw

    t2 = time.time()
    with job_phase(spark, "graph-write"):
        write_triple_table(final, f"{args.out}/graph", salt_buckets=args.salt_buckets)
        n_graph = spark.read.parquet(f"{args.out}/graph").count()
    print(
        f"[job] graph materialized: {n_graph} canonical (subj, pred, obj) triples "
        f"({time.time() - t2:.1f}s); total {time.time() - t0:.1f}s; "
        f"throughput {n_raw / (time.time() - t0):.0f} triples/s"
    )
    log_stage_metric(
        spark, args.out, run_id, "graph",
        wall_ms=int((time.time() - t2) * 1000),
        row_count=n_graph, triple_count=n_graph,
    )
    if args.graph_stats:
        _graph_stats_phase(spark, args.out, run_id)
    if owns_session:
        spark.stop()
    return 0


def _corpus_stats_phase(spark, transcripts, out: str, run_id: str) -> None:
    """The --corpus-stats phase: per-conversation rollups to corpus_stats/
    and the per-tool usage audit to tool_usage/ over THIS RUN's input
    (post --sample-fraction, so the stats describe the corpus actually
    extracted). Plain partial-aggregatable groupBys — at 100 TB this is
    one shuffle each, the cheapest look an operator gets before paying
    for extraction."""
    from openue_spark.ops.transcripts import conversation_stats, tool_usage
    from openue_spark.pipeline.materialize import log_stage_metric
    from openue_spark.session import job_phase

    t = time.time()
    with job_phase(spark, "corpus-stats"):
        conversation_stats(transcripts).write.mode("overwrite").parquet(
            f"{out}/corpus_stats"
        )
        n_convs = spark.read.parquet(f"{out}/corpus_stats").count()
        tool_usage(transcripts).write.mode("overwrite").parquet(
            f"{out}/tool_usage"
        )
        n_tools = spark.read.parquet(f"{out}/tool_usage").count()
    print(
        f"[job] corpus stats: {n_convs} conversations, {n_tools} distinct"
        f" tools ({time.time() - t:.1f}s)"
    )
    log_stage_metric(
        spark, out, run_id, "corpus-stats",
        wall_ms=int((time.time() - t) * 1000),
        row_count=n_convs, triple_count=n_tools,
    )


def _graph_stats_phase(spark, out: str, run_id: str) -> None:
    """The --graph-stats phase: triangle/wedge census to graph_stats/ and
    the top-100 PageRank hub report to graph_hubs/, both over the CURRENT
    materialized graph (runs after a full build AND after an incremental
    fold — the folded graph is the one whose stats a consumer wants)."""
    from pyspark.sql import functions as F

    from openue_spark.ops.graph import pagerank_int, triangle_stats
    from openue_spark.pipeline.materialize import log_stage_metric
    from openue_spark.session import job_phase

    t3 = time.time()
    with job_phase(spark, "graph-stats"):
        edges = spark.read.parquet(f"{out}/graph").select(
            F.col("subj").alias("src"), F.col("obj").alias("dst")
        )
        triangle_stats(edges).write.mode("overwrite").parquet(
            f"{out}/graph_stats"
        )
        srow = spark.read.parquet(f"{out}/graph_stats").collect()[0]
    print(
        f"[job] graph stats: {srow.n_nodes} entities, {srow.n_edges} "
        f"undirected edges, {srow.n_triangles} triangles "
        f"({srow.n_wedges} oriented wedges probed; "
        f"{time.time() - t3:.1f}s)"
    )
    log_stage_metric(
        spark, out, run_id, "graph-stats",
        wall_ms=int((time.time() - t3) * 1000),
        row_count=srow.n_triangles, triple_count=srow.n_edges,
    )
    t4 = time.time()
    with job_phase(spark, "graph-hubs"):
        # hub entities: 3-round deterministic integer PageRank, scale
        # auto-sized from srow.n_nodes so no graph size can overflow;
        # (rank desc, node) makes the top-100 cut reproducible
        hubs = (
            pagerank_int(edges, iterations=3, scale=None,
                         node_count=srow.n_nodes)
            .orderBy(F.col("rank").desc(), F.col("node"))
            .limit(100)
        )
        hubs.write.mode("overwrite").parquet(f"{out}/graph_hubs")
        n_hubs = spark.read.parquet(f"{out}/graph_hubs").count()
    print(f"[job] graph hubs: top {n_hubs} entities by 3-round integer"
          f" PageRank ({time.time() - t4:.1f}s)")
    log_stage_metric(
        spark, out, run_id, "graph-hubs",
        wall_ms=int((time.time() - t4) * 1000),
        row_count=n_hubs, triple_count=srow.n_nodes,
    )


if __name__ == "__main__":
    sys.exit(main())
