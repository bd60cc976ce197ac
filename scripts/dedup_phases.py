"""Phase-decomposed 2-vs-8-core attribution for the minhash dedup tier.

`scripts/scaling.py --dedup` times minhash_verified_pairs end-to-end; this
script splits that wall into its three sequential phases and measures each
at BOTH pinned core budgets, so a weak composite pair can be attributed to
the phase that actually fails to scale (the round-4g/round-5 question:
after de-stringing the shingle stage, is the tier still bandwidth-bound?):

  P1 features    tokenize + int64 k-gram shingle hashes (with_shingle_hashes),
                 forced via sum(size(sh)) — pure per-row string->bigint work
  P2 candidates  P1 + minhash signatures + band self-join -> distinct pairs
  P3 verified    the full operator (P2 + exact-Jaccard verify)

Marginal walls (P2-P1, P3-P2) attribute the added cost of each stage at
each core count; per-phase efficiency uses the same (wall@2 / 4) / wall@8
formula as scaling.py. Every phase rebuilds its DataFrame per draw (the
shuffle-reuse timing trap, CLAUDE.md) and runs in its own pinned fresh
process like scaling.py's points.

Usage: python scripts/dedup_phases.py [--docs 720000] [--iters 3]
Prints one JSON line with the phase matrix.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_SRC = r"""
import sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from openue_spark.session import get_spark
from openue_spark.ops.dedup import (
    _corpus, _minhash_candidates_from, minhash_verified_pairs,
    with_shingle_hashes,
)

cores = {cores}
spark = get_spark(
    app_name=f"dedup_phases_{{cores}}",
    master=f"local[{{cores}}]",
    extra_conf={{"spark.ui.showConsoleProgress": "false"}},
)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet({path!r}).repartition(4 * cores).persist()
docs.count()

def p1():
    return with_shingle_hashes(_corpus(docs)).agg(
        F.sum(F.size("sh"))).collect()[0][0]

def p2():
    return _minhash_candidates_from(
        with_shingle_hashes(_corpus(docs)).select("doc_id", "sh")).count()

def p3():
    return minhash_verified_pairs(docs).count()

out = {{}}
for name, fn in (("p1", p1), ("p2", p2), ("p3", p3)):
    fn()  # warm (codegen + python workers)
    best = None
    for _ in range({iters}):
        t0 = time.time()
        n = fn()
        dt = time.time() - t0
        if best is None or dt < best[0]:
            best = (dt, n)
    out[name] = best
print("PHASES", cores, " ".join(f"{{k}}={{v[0]:.3f}}:{{v[1]}}" for k, v in out.items()), flush=True)
spark.stop()
"""


def run_point(cores: int, path: str, iters: int) -> dict:
    src = _SRC.format(repo=REPO, cores=cores, path=path, iters=iters)
    cmd = [sys.executable, "-c", src]
    if shutil.which("taskset"):
        total = os.cpu_count() or cores
        start = max(0, total - cores)
        cmd = ["taskset", "-c", f"{start}-{start + cores - 1}"] + cmd
    proc = subprocess.run(cmd, text=True, capture_output=True)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-2000:])
        raise SystemExit(1)
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("PHASES")][-1]
    parts = line.split()
    out = {}
    for kv in parts[2:]:
        k, v = kv.split("=")
        wall, n = v.split(":")
        out[k] = {"wall_sec": float(wall), "rows": int(n)}
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=720_000)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--n", type=int, default=2, help="N cores; other point is 4N")
    args = ap.parse_args()
    from scripts.scaling import ensure_dedup_input

    path = ensure_dedup_input(args.docs)
    pts = {c: run_point(c, path, args.iters) for c in (args.n, 4 * args.n)}
    lo, hi = args.n, 4 * args.n
    result = {"metric": "dedup-tier phase decomposition", "docs": args.docs,
              "points": pts, "phase_eff": {}}
    prev_lo = prev_hi = 0.0
    for ph in ("p1", "p2", "p3"):
        w_lo, w_hi = pts[lo][ph]["wall_sec"], pts[hi][ph]["wall_sec"]
        m_lo, m_hi = w_lo - prev_lo, w_hi - prev_hi
        result["phase_eff"][ph] = {
            "cum_eff": round((w_lo / 4) / w_hi, 3),
            "marginal_wall_lo": round(m_lo, 3),
            "marginal_wall_hi": round(m_hi, 3),
            "marginal_eff": round((m_lo / 4) / m_hi, 3) if m_hi > 0 else None,
        }
        prev_lo, prev_hi = w_lo, w_hi
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
