"""Materialize the numpy reference oracle's triples as a parquet fixture.

The end-to-end extraction (mock model forwards) is not SQL-expressible, so
the driver could only rows-only-check it. This script freezes the oracle's
output for a FIXED turn window [0, GOLDEN_TURNS) into a checked-in parquet;
the contract query `extract_diff_vs_golden` then diffs the live Spark
extraction against this golden multiset and emits per-predicate
extra/missing/matched counts (all-zero diffs expected), which DuckDB can
mirror trivially by reading the same parquet — turning the headline
pipeline into a hash-checked green row.

Regenerate (only needed if oracle semantics or the fixture lexicon change):
    python scripts/make_golden.py
The parity suite (tests/test_parity.py) independently asserts pipeline ==
oracle, and test_parity.py::test_golden_fixture_is_current asserts the
checked-in parquet matches the live oracle, so a stale golden cannot pass
silently.
"""

from __future__ import annotations

import os
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN_TURNS = 2_000
OUT = os.path.join(REPO, "openue_spark", "golden", f"golden_triples_{GOLDEN_TURNS}.parquet")


def main() -> int:
    from openue_spark.fixtures import transcripts_pandas
    from openue_spark.oracle import extract_corpus

    turns = transcripts_pandas(GOLDEN_TURNS)
    rows = list(zip(turns["conv_id"], turns["turn_idx"], turns["text"]))
    triples = extract_corpus(rows)
    pdf = pd.DataFrame(
        {
            "conv_id": [t.conv_id for t in triples],
            "turn_idx": pd.array([t.turn_idx for t in triples], dtype="int32"),
            "subj": [t.subj for t in triples],
            "rel_id": pd.array([t.rel_id for t in triples], dtype="int32"),
            "pred": [t.pred for t in triples],
            "obj": [t.obj for t in triples],
        }
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pdf.to_parquet(OUT, index=False)
    print(f"wrote {len(pdf)} golden triples -> {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
