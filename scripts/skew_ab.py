"""A/B: dedup_triples_salted vs a plain one-shuffle groupBy on a planted
hot-key corpus (VERDICT r4 item 7 — pin the salted dedup's win, or its
cost, with event-log task evidence).

Corpus: 20M triple rows, ONE (subj, pred, obj) carrying 25% of all rows
(the hot predicate), the rest spread over ~1M keys. Protocol per
CLAUDE.md: fresh process per variant, warm-up action, best-of-2 rebuilt
DataFrames, taskset-pinned 8 cores, A/B/A/B order to expose contention
pollution. Event logs give per-stage task counts / max / mean — the skew
signal is max task time of the biggest stage.

Usage: python scripts/skew_ab.py [--rows 20000000]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SRC = """
import sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from openue_spark.session import get_spark
from openue_spark.pipeline.materialize import dedup_triples_salted

spark = get_spark(app_name="skew_{variant}", master="local[8]",
    extra_conf={{"spark.ui.showConsoleProgress": "false",
                 "spark.eventLog.enabled": "true",
                 "spark.eventLog.dir": {evdir!r}}})
spark.sparkContext.setLogLevel("ERROR")

N = {rows}

def build():
    return spark.range(N).select(
        F.concat(F.lit("conv_"), (F.col("id") % 500000).cast("string")).alias("conv_id"),
        (F.col("id") % 8).cast("int").alias("turn_idx"),
        F.when(F.col("id") % 4 == 0, F.lit("hot_subj")).otherwise(
            F.concat(F.lit("s"), (F.col("id") % 1000000).cast("string"))).alias("subj"),
        F.when(F.col("id") % 4 == 0, F.lit("works_at")).otherwise(F.lit("based_in")).alias("pred"),
        F.when(F.col("id") % 4 == 0, F.lit("hot_obj")).otherwise(
            F.concat(F.lit("o"), ((F.col("id") * 7) % 900000).cast("string"))).alias("obj"),
    )

def plain(df):
    return df.groupBy("subj", "pred", "obj").agg(
        F.count(F.lit(1)).alias("support"), F.min("conv_id").alias("first_conv"))

fn = dedup_triples_salted if "{variant}" == "salted" else plain
fn(build()).count()  # warm: codegen + Python worker spawn
best, n = None, 0
for _ in range(2):
    df = build()  # rebuilt per pass: never time a reused shuffle output
    t0 = time.time()
    n = fn(df).count()
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
print("VARIANT {variant} best=%.3f rows=%d" % (best, n), flush=True)
spark.stop()
"""


def run(variant: str, rows: int) -> None:
    evdir = f"/tmp/skew_ev_{variant}"
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir)
    src = _SRC.format(repo=REPO, evdir=evdir, variant=variant, rows=rows)
    cmd = ["taskset", "-c", "24-31", sys.executable, "-c", src]
    p = subprocess.run(cmd, text=True, capture_output=True)
    out = [ln for ln in p.stdout.splitlines() if ln.startswith("VARIANT")]
    print(out[-1] if out else p.stderr[-1500:])
    logs = sorted(glob.glob(os.path.join(evdir, "*")), key=os.path.getmtime)
    if not logs:
        return
    path = logs[-1]
    if os.path.isdir(path):
        path = sorted(glob.glob(os.path.join(path, "events_*")))[-1]
    if path.endswith(".zstd"):
        lines = (
            subprocess.run(["zstd", "-dc", path], capture_output=True, check=True)
            .stdout.decode()
            .splitlines()
        )
    else:
        lines = open(path).read().splitlines()
    stages: dict[int, list[float]] = {}
    for line in lines:
        ev = json.loads(line)
        if ev["Event"] == "SparkListenerTaskEnd":
            info = ev["Task Info"]
            stages.setdefault(ev["Stage ID"], []).append(
                (info["Finish Time"] - info["Launch Time"]) / 1e3
            )
    for sid, ts in sorted(stages.items(), key=lambda kv: -sum(kv[1]))[:4]:
        print(
            f"  stage {sid}: n={len(ts)} sum={sum(ts):.1f}"
            f" max={max(ts):.2f} mean={sum(ts) / len(ts):.2f}"
        )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    args = ap.parse_args()
    for v in ("plain", "salted", "plain", "salted"):
        run(v, args.rows)
