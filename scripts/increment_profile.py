"""Reproduce the PLANS.md §13 incremental-linking measurements.

Protocol (see CLAUDE.md gotcha): each timed variant runs in its OWN fresh
subprocess with a warm-up action — within one session the first
link_entities call pays codegen + Python-worker warm-up and comparisons
are order-biased up to 4x.

Usage: python scripts/increment_profile.py [--base 200000] [--batch 50000]
       [--workdir /tmp/incprof]

Prints one line per measurement:
  FULL  <sec>  — link_entities over the union corpus
  INC   <sec>  — state-fed link_entities_increment folding the batch
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PREP = """
import sys
sys.path.insert(0, {repo!r})
from openue_spark.session import get_spark
from openue_spark.fixtures import transcripts_spark
from openue_spark.pipeline.extract import extract_triples
from openue_spark.pipeline.linking import link_entities, mention_state, mention_table

spark = get_spark(app_name="inc_prep")
spark.sparkContext.setLogLevel("ERROR")
extract_triples(transcripts_spark(spark, {base})).write.mode("overwrite").parquet({wd!r} + "/raw_base")
extract_triples(transcripts_spark(spark, {batch}, offset={base})).write.mode("overwrite").parquet({wd!r} + "/raw_batch")
raw = spark.read.parquet({wd!r} + "/raw_base")
state = mention_state(mention_table(raw)).localCheckpoint(eager=True)
state.write.mode("overwrite").parquet({wd!r} + "/link_state")
link_entities(raw, min_cosine=0.97, max_bucket=64, state=state).write.mode("overwrite").parquet({wd!r} + "/prior_mapping")
print("prep done")
spark.stop()
"""

_FULL = """
import sys, time
sys.path.insert(0, {repo!r})
from openue_spark.session import get_spark
from openue_spark.pipeline.linking import link_entities

spark = get_spark(app_name="inc_full")
spark.sparkContext.setLogLevel("ERROR")
raw = spark.read.parquet({wd!r} + "/raw_base").unionByName(
    spark.read.parquet({wd!r} + "/raw_batch"))
raw.count()  # warm workers + page cache
t0 = time.time()
n = link_entities(raw, min_cosine=0.97, max_bucket=64).count()
print(f"FULL {{time.time()-t0:.1f}} mentions={{n}}")
spark.stop()
"""

_INC = """
import sys, time
sys.path.insert(0, {repo!r})
from openue_spark.session import get_spark
from openue_spark.pipeline.linking import link_entities_increment

spark = get_spark(app_name="inc_fold")
spark.sparkContext.setLogLevel("ERROR")
raw2 = spark.read.parquet({wd!r} + "/raw_batch")
prior = spark.read.parquet({wd!r} + "/prior_mapping")
state = spark.read.parquet({wd!r} + "/link_state")
raw2.count(); prior.count(); state.count()  # warm
t0 = time.time()
n = link_entities_increment(prior, raw2, min_cosine=0.97, max_bucket=64,
                            prior_state=state).count()
print(f"INC {{time.time()-t0:.1f}} mentions={{n}}")
spark.stop()
"""


def _run(src: str) -> None:
    out = subprocess.run(
        [sys.executable, "-c", src], capture_output=True, text=True, check=True
    )
    for ln in out.stdout.splitlines():
        if ln.startswith(("FULL", "INC", "prep")):
            print(ln, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=200_000)
    ap.add_argument("--batch", type=int, default=50_000)
    ap.add_argument("--workdir", default="/tmp/incprof")
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    fmt = dict(repo=REPO, wd=args.workdir, base=args.base, batch=args.batch)
    _run(_PREP.format(**fmt))
    for _ in range(args.iters):
        _run(_FULL.format(**fmt))
        _run(_INC.format(**fmt))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
