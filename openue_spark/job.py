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

Stages: sharded checkpoint-resumable extraction (manifest lineage) ->
entity linking/canonicalization -> deduplicated triple table partitioned by
predicate. Re-submitting after a failure resumes from the manifest.
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
    src.add_argument("--input", help="parquet dir of transcripts (conv_id, turn_idx, role, text, tool, ts)")
    src.add_argument("--synthesize", type=int, help="synthesize N deterministic transcript turns")
    parser.add_argument("--out", required=True, help="output dir (triples/, graph/, manifest/)")
    parser.add_argument("--shards", type=int, default=16, help="conv_id-hash shards for resumability")
    parser.add_argument("--no-link", action="store_true", help="skip entity linking/canonicalization")
    parser.add_argument("--salt-buckets", type=int, default=16, help="dedup skew-salt buckets")
    parser.add_argument(
        "--weights-from",
        help="load the best (metric, step) weights checkpoint from this dir's"
        " checkpoints/ table and broadcast it to the extraction UDFs"
        " (default: built-in weights)",
    )
    args = parser.parse_args(argv)

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
    from openue_spark.pipeline.materialize import run_extraction_resumable, write_triple_table

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
    if args.input:
        transcripts = spark.read.parquet(args.input)
    else:
        transcripts = transcripts_spark(spark, args.synthesize)

    raw = run_extraction_resumable(
        spark, transcripts, args.out, n_shards=args.shards, weights_bc=weights_bc
    )
    n_raw = raw.count()
    print(f"[job] extraction complete: {n_raw} raw triples ({time.time() - t0:.1f}s)")

    if not args.no_link:
        t1 = time.time()
        mapping = link_entities(raw)
        final = canonical_triples(raw, mapping)
        print(f"[job] linking complete ({time.time() - t1:.1f}s)")
    else:
        final = raw

    t2 = time.time()
    write_triple_table(final, f"{args.out}/graph", salt_buckets=args.salt_buckets)
    n_graph = spark.read.parquet(f"{args.out}/graph").count()
    print(
        f"[job] graph materialized: {n_graph} canonical (subj, pred, obj) triples "
        f"({time.time() - t2:.1f}s); total {time.time() - t0:.1f}s; "
        f"throughput {n_raw / (time.time() - t0):.0f} triples/s"
    )
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
