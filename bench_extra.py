"""Round-6 optimization measurement harness (guide §1: measure first).

NOT the driver bench — bench.py is frozen for measurement. This file
exists so the optimization work can (a) time each benched query in
isolation with the same best-of-N `.count()` methodology bench.py uses,
(b) time the pure computation via the noop sink (guide §1.4), and
(c) dump `.explain("formatted")` for the plan evidence in plans/r06/.

Usage:
  python bench_extra.py [--sf DIR] [--passes N] [--only a,b] [--noop]
                        [--explain-dir plans/r06 --suffix before]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from openue_spark import contract  # noqa: E402
from openue_spark.pipeline import extract_triples, triple_table  # noqa: E402
from openue_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.abspath(__file__))


def bench_queries(spark, sf_dir: str, transcripts):
    """The exact query set bench.py times, same builders, same order."""
    return {
        "extract_pipeline": lambda: extract_triples(transcripts),
        "triple_table": lambda: triple_table(extract_triples(transcripts)),
        "ann_cosine_topk": lambda: contract.q_ann_cosine_topk(spark, sf_dir),
        "dedup_exact": lambda: contract.q_dedup_exact(spark, sf_dir),
        "w2_stable_ordering": lambda: contract.q_w2_stable_ordering(spark, sf_dir),
        "a4_micro_prf_counts": lambda: contract.q_a4_micro_prf_counts(spark, sf_dir),
        "minhash_verified_pairs": lambda: contract.q_minhash_verified_pairs(spark, sf_dir),
        "simhash_near_dup": lambda: contract.q_simhash_near_dup(spark, sf_dir),
        "p4_gold_alignment": lambda: contract.q_p4_gold_alignment(spark, sf_dir),
        "embedding_near_dup_bucketed": lambda: contract.q_embedding_near_dup_bucketed(spark, sf_dir),
        "kg_negative_samples": lambda: contract.q_kg_negative_samples(spark, sf_dir),
        "asof_last_error": lambda: contract.q_asof_last_error(spark, sf_dir),
        "range_pair_stats": lambda: contract.q_range_pair_stats(spark, sf_dir),
        "session_windows": lambda: contract.q_session_windows(spark, sf_dir),
        "streaming_event_rates": lambda: contract.q_streaming_event_rates(spark, sf_dir),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--passes", type=int, default=int(os.environ.get("SPARK_GRAFT_PASSES", "3")))
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--noop", action="store_true", help="time via noop sink instead of count()")
    ap.add_argument("--explain-dir", default=None, help="dump explain('formatted') per query here")
    ap.add_argument("--suffix", default="before", help="explain file suffix (before/after)")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="openue_bench_extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # same transcripts cache as bench.py (fixture setup, not timed)
    from bench import ensure_transcripts

    tpath, _ = ensure_transcripts(spark, args.sf)
    transcripts = spark.read.parquet(tpath)
    # same warm-up as bench.py
    extract_triples(transcripts.limit(2048).repartition(int(cpus))).count()

    qs = bench_queries(spark, args.sf, transcripts)
    # any contract query (the 70 non-benched tail entries) can be timed too
    for name, fn in contract.queries().items():
        qs.setdefault(name, (lambda f=fn: (lambda: f(spark, args.sf)))())
    if args.only == "all-contract":
        names = list(contract.queries())
    elif args.only:
        names = [n.strip() for n in args.only.split(",")]
    else:
        names = list(bench_queries(spark, args.sf, transcripts))

    if args.explain_dir:
        os.makedirs(args.explain_dir, exist_ok=True)
        for name in names:
            if name == "streaming_event_rates":
                continue  # a started streaming query, not a plannable DataFrame
            df = qs[name]()
            p = os.path.join(args.explain_dir, f"{name}_{args.suffix}.txt")
            with open(p, "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            print(f"wrote {p}", file=sys.stderr)
        spark.stop()
        return 0

    timings: dict[str, float] = {}
    for name in names:
        build = qs[name]
        best = None
        for _ in range(args.passes):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = build()
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
        print(f"{name}: {timings[name]}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(json.dumps({"sf": args.sf, "mode": "noop" if args.noop else "count",
                      "passes": args.passes, "value": total, "queries": timings}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
