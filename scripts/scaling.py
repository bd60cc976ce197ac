"""Scaling-efficiency evidence: same job, N vs 4N parallelism (north rule).

No real cluster exists in this sandbox, so "N vs 4N executors" is evidenced
by running the identical extraction job at two local[] parallelism levels on
the same input and reporting throughput at both plus efficiency
(= (thr_4N / thr_N) / 4).

Methodology (why each point is CPU-PINNED with taskset):
- "N executors vs 4N executors" is a HARDWARE boundary: 4N executors bring
  4x the cores/LLC/memory bandwidth. A bare local[K] run does not emulate
  that boundary faithfully, because Spark's task-slot count does not bound
  CPU use — Python workers plus JVM threads exceed K. (Under the original
  STAGED extraction this was extreme: two chained mapInPandas runners per
  task drove ~2K Python workers — local[2] burned ~5 cores, local[8] ~14,
  local[32] oversubscribed ~2x. The round-3 FUSED plan runs one runner per
  task, halving that pressure — and the pinned per-point throughput
  roughly doubled when it landed — but JVM+worker still exceeds K.)
  Slot-count ratios therefore under- or over-state true hardware scaling.
- Fix: pin each measurement point to EXACTLY its core budget
  (`taskset -c 0..N-1` around the whole JVM+workers tree), i.e. "one
  executor with N cores" vs "4x the cores". Any intra-point
  oversubscription then applies identically at both points.
- Each point runs in a FRESH pinned JVM (subprocess), does one full untimed
  pass (spawns + warms every Python worker, fills the page cache), then
  times `iters` full passes and keeps the best throughput.

Usage: python scripts/scaling.py [--n 2] [--turns 2400000] [--iters 2]
Prints one JSON line; also echoes per-point results as they land.

`--job` measures the FULL job (extraction -> linking/canonicalization ->
partitioned graph write, i.e. what `spark-submit openue_spark/job.py`
runs) instead of the extraction plan alone — the north rule's scaling
criterion is phrased over the whole job. Full-job passes are much heavier
(the 2-core point runs minutes per pass), so --job defaults to fewer
turns; each pass writes to a fresh output dir so the resume manifest
cannot short-circuit the work being measured. The first pass doubles as
the warm-up (fresh JVM: codegen + Python-worker spawn) — best-of over
`iters >= 2` passes discards it.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_POINT_SRC = r"""
import sys, time
sys.path.insert(0, {repo!r})
from openue_spark.session import get_spark
from openue_spark.pipeline import extract_triples

cores = {cores}
spark = get_spark(
    app_name=f"scaling_{{cores}}",
    master=f"local[{{cores}}]",
    extra_conf={{"spark.ui.showConsoleProgress": "false"}},
)
spark.sparkContext.setLogLevel("ERROR")
# repartition + persist OUTSIDE the timed region: the timed passes measure
# the narrow extraction plan itself, not a per-pass input shuffle; persist
# also guarantees perfectly balanced in-memory partitions at every N.
df = spark.read.parquet({path!r}).repartition(4 * cores).persist()
n_turns = df.count()
extract_triples(df).count()  # untimed full pass: warm workers + JIT
best = None
for _ in range({iters}):
    t0 = time.time()
    n_triples = extract_triples(df).count()
    dt = time.time() - t0
    if best is None or dt < best[0]:
        best = (dt, n_triples)
print(f"POINT {{cores}} {{best[0]:.3f}} {{best[1]}} {{n_turns}}", flush=True)
spark.stop()
"""


_JOB_POINT_SRC = r"""
import shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from openue_spark.session import get_spark
from openue_spark.job import main as job_main

cores = {cores}
spark = get_spark(
    app_name=f"scaling_job_{{cores}}",
    master=f"local[{{cores}}]",
    extra_conf={{"spark.ui.showConsoleProgress": "false"}},
)
spark.sparkContext.setLogLevel("ERROR")
n_turns = spark.read.parquet({path!r}).count()
best = None
for _ in range({iters}):
    out = tempfile.mkdtemp(prefix=f"scaling_job_{{cores}}_")
    t0 = time.time()
    rc = job_main(["--input", {path!r}, "--out", out, "--shards", "8"], spark=spark)
    dt = time.time() - t0
    assert rc == 0
    n_graph = spark.read.parquet(out + "/graph").count()
    shutil.rmtree(out, ignore_errors=True)
    if best is None or dt < best[0]:
        best = (dt, n_graph)
print(f"POINT {{cores}} {{best[0]:.3f}} {{best[1]}} {{n_turns}}", flush=True)
spark.stop()
"""


_LINK_POINT_SRC = r"""
import sys, time
sys.path.insert(0, {repo!r})
from openue_spark.session import get_spark
from openue_spark.pipeline.linking import candidate_edges_from_state

cores = {cores}
spark = get_spark(
    app_name=f"scaling_link_{{cores}}",
    master=f"local[{{cores}}]",
    extra_conf={{"spark.ui.showConsoleProgress": "false"}},
)
spark.sparkContext.setLogLevel("ERROR")
state = spark.read.parquet({path!r}).repartition(4 * cores).persist()
n_mentions = state.count()
candidate_edges_from_state(state, n_mentions=n_mentions).count()  # untimed warm pass
best = None
for _ in range({iters}):
    t0 = time.time()
    n_edges = candidate_edges_from_state(state, n_mentions=n_mentions).count()
    dt = time.time() - t0
    if best is None or dt < best[0]:
        best = (dt, n_edges)
print(f"POINT {{cores}} {{best[0]:.3f}} {{best[1]}} {{n_mentions}}", flush=True)
spark.stop()
"""


_DEDUP_POINT_SRC = r"""
import sys, time
sys.path.insert(0, {repo!r})
from openue_spark.session import get_spark
from openue_spark.ops.dedup import minhash_verified_pairs

cores = {cores}
spark = get_spark(
    app_name=f"scaling_dedup_{{cores}}",
    master=f"local[{{cores}}]",
    extra_conf={{"spark.ui.showConsoleProgress": "false"}},
)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet({path!r}).repartition(4 * cores).persist()
n_docs = docs.count()
minhash_verified_pairs(docs).count()  # untimed warm pass
best = None
for _ in range({iters}):
    t0 = time.time()
    n_pairs = minhash_verified_pairs(docs).count()
    dt = time.time() - t0
    if best is None or dt < best[0]:
        best = (dt, n_pairs)
print(f"POINT {{cores}} {{best[0]:.3f}} {{best[1]}} {{n_docs}}", flush=True)
spark.stop()
"""


def ensure_dedup_input(n_docs: int) -> str:
    """Document corpus for the --dedup tier: the transcript fixture's turn
    texts re-keyed as (doc_id, text) plus the planted_docs near-dup copies
    (80% prefixes of every 5th doc) — so the banded join has real matches
    to verify, like a crawl shard would."""
    if n_docs > 80_000_000:
        raise ValueError("dedup tier caps at 80M docs (plant-id offset 1e8)")
    path = os.path.join(REPO, ".cache", f"dedup_docs_{n_docs}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from pyspark.sql import functions as F

        from openue_spark.fixtures import planted_docs, transcripts_spark
        from openue_spark.ops.dedup import with_tokens
        from openue_spark.session import get_spark

        spark = get_spark(app_name="scaling_dedup_gen", master="local[32]")
        spark.sparkContext.setLogLevel("ERROR")
        # doc_id = the GLOBAL turn index (conv serial * 8 + turn_idx) — a
        # pure function of the row and unique at every tier size
        docs = transcripts_spark(spark, n_docs).select(
            (
                F.substring("conv_id", 6, 8).cast("long") * 8 + F.col("turn_idx")
            ).alias("doc_id"),
            "text",
        )
        if n_docs <= 1_000_000:
            # the shared fixture (copy ids +1e6 — safe below 1M docs)
            planted = planted_docs(docs)
        else:
            # same 80%-prefix plants, copy-id offset 1e8 for the big tiers
            base = with_tokens(docs.select("doc_id", "text")).select(
                "doc_id", "tokens"
            )
            plants = base.where(F.col("doc_id") % 5 == 0).select(
                (F.col("doc_id") + 100_000_000).alias("doc_id"),
                F.expr(
                    "slice(tokens, 1,"
                    " greatest(1, cast(floor(size(tokens) * 0.8) as int)))"
                ).alias("tokens"),
            )
            planted = base.unionByName(plants)
        planted.write.mode("overwrite").parquet(path)
        spark.stop()
    return path


def ensure_input(n_turns: int) -> str:
    path = os.path.join(REPO, ".cache", f"transcripts_scaling_{n_turns}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from openue_spark.fixtures import transcripts_spark
        from openue_spark.session import get_spark

        spark = get_spark(app_name="scaling_gen", master="local[32]")
        spark.sparkContext.setLogLevel("ERROR")
        transcripts_spark(spark, n_turns).write.mode("overwrite").parquet(path)
        spark.stop()
    return path


def ensure_link_state(n_turns: int) -> str:
    """Mention-state table (features for the linking verify stage) for the
    --link mode, derived once from the scaling transcript corpus."""
    path = os.path.join(REPO, ".cache", f"link_state_{n_turns}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from openue_spark.pipeline import extract_triples
        from openue_spark.pipeline.linking import mention_state, mention_table
        from openue_spark.session import get_spark

        spark = get_spark(app_name="scaling_link_gen", master="local[32]")
        spark.sparkContext.setLogLevel("ERROR")
        raw = extract_triples(spark.read.parquet(ensure_input(n_turns)))
        mention_state(mention_table(raw)).write.mode("overwrite").parquet(path)
        spark.stop()
    return path


def run_point(cores: int, path: str, iters: int, mode: str = "extract") -> dict:
    tmpl = {"extract": _POINT_SRC, "job": _JOB_POINT_SRC,
            "link": _LINK_POINT_SRC, "dedup": _DEDUP_POINT_SRC}[mode]
    src = tmpl.format(repo=REPO, cores=cores, path=path, iters=iters)
    cmd = [sys.executable, "-c", src]
    if shutil.which("taskset"):
        # Pin to the TOP of the core range: OS housekeeping and the calling
        # process gravitate to low core ids, which perturbs small-N points.
        total = os.cpu_count() or cores
        start = max(0, total - cores)
        cmd = ["taskset", "-c", f"{start}-{start + cores - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("POINT")][0]
    _, c, wall, n_triples, n_turns = line.split()
    wall = float(wall)
    return {
        "cores": int(c),
        "wall_sec": wall,
        # in --job mode this is the CANONICAL graph-triple count (the job's
        # output), in extraction mode the raw-triple count — both are a
        # pure function of the input, so the per-second rates stay
        # comparable across points within one mode
        "triples": int(n_triples),
        "turns": int(n_turns),
        "triples_per_sec": round(int(n_triples) / wall, 1),
        "turns_per_sec": round(int(n_turns) / wall, 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2, help="N; the other point is 4N")
    ap.add_argument("--turns", type=int, default=None,
                    help="input turns (default 2.4M extraction / 600k --job|--link)")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--job", action="store_true",
                    help="measure the full extract->link->materialize job")
    ap.add_argument("--link", action="store_true",
                    help="measure the linking verify stage (LSH band join ->"
                    " cosine -> Jaccard) from a stored mention_state table")
    ap.add_argument("--dedup", action="store_true",
                    help="measure the training-data dedup tier"
                    " (minhash_verified_pairs: shingle -> 8x md5 minhash ->"
                    " banded self-join -> exact-Jaccard verify) over a"
                    " planted document corpus; --turns = document count")
    args = ap.parse_args()
    mode = ("job" if args.job else
            ("link" if args.link else ("dedup" if args.dedup else "extract")))
    turns = args.turns or {"job": 600_000, "link": 600_000,
                           "dedup": 60_000, "extract": 2_400_000}[mode]

    sys.path.insert(0, REPO)
    path = {"link": ensure_link_state, "dedup": ensure_dedup_input}.get(
        mode, ensure_input
    )(turns)
    points = []
    for cores in (args.n, 4 * args.n):
        pt = run_point(cores, path, args.iters, mode=mode)
        points.append(pt)
        print(f"local[{pt['cores']}]: {pt['wall_sec']}s "
              f"{pt['triples_per_sec']} triples/s", file=sys.stderr)

    eff = round((points[1]["triples_per_sec"] / points[0]["triples_per_sec"]) / 4, 3)
    what = {
        "job": "full job (extract+link+materialize)",
        "link": "linking verify stage (band join -> cosine -> jaccard; edges/s)",
        "dedup": "minhash near-dup detection (docs/s via turns_per_sec)",
        "extract": "extraction",
    }[mode]
    print(json.dumps({
        "metric": f"{what} throughput scaling N->4N (taskset-pinned cores, executor proxy)",
        "n_cores": args.n,
        "turns": turns,
        "points": points,
        "scaling_efficiency": eff,
        "pass_threshold_0.8": eff >= 0.8,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
