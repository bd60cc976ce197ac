"""Deterministic synthetic transcript fixtures (FIXTURES.md F1).

The north rule's input is an Iceberg/parquet table of multi-turn conversation
transcripts with columns (conv_id, turn_idx, role, text, tool, ts)
(BASELINE.json input_hint). No external data is allowed, so this module
synthesizes that table deterministically: every column is a pure function of
the global turn index via splitmix64 hashing — independent of partitioning,
parallelism, or platform, and identical between the pandas path (tests /
oracle input) and the Spark path (bench / scale runs).

Scale tiers mirror /root/repo/TESTDATA.md: sf0.001 ~ 6k turns,
sf0.01 ~ 60k, sf0.1 ~ 600k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .hashing import mix64

_U64 = np.uint64

TURNS_PER_CONV = 8
ROLES = ["user", "assistant", "assistant", "tool"]  # tool turns ~25%
TOOLS = ["search", "calculator", "browser", "db_query"]
_BASE_TS = np.datetime64("2024-01-01T00:00:00", "us")

# Fixed lexicon: entity-ish tokens, connective words, relation keywords,
# punctuation. Content is inert (the mock scorers hash token ids), but a
# mixed lexicon produces realistic span/mention surface forms for the
# entity-linking stage.
_ENTITIES = [f"ent{i:03d}" for i in range(160)]
_WORDS = [
    "the", "a", "of", "in", "and", "to", "was", "is", "by", "with",
    "said", "met", "visited", "joined", "founded", "works", "at", "from",
    "reported", "announced", "during", "after", "before", "near", "about",
] + [f"word{i:02d}" for i in range(60)]
_PUNCT = [".", ",", ";"]
_LEX = _ENTITIES + _WORDS + _PUNCT
_LEX_ARR = np.array(_LEX)
_N_LEX = len(_LEX)

SF_TURNS = {"0.001": 6_000, "0.01": 60_000, "0.1": 600_000}

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _turn_text(idx: int) -> str:
    """Deterministic 5..30-token sentence for global turn index `idx`."""
    h = mix64(_U64(idx) * _U64(0x9E3779B97F4A7C15) + _U64(0x42))
    n = 5 + int(h % _U64(26))
    ks = np.arange(n, dtype=np.uint64)
    picks = mix64(_U64(idx) ^ (ks * _U64(0xC2B2AE3D27D4EB4F) + _U64(0x7F))) % _U64(_N_LEX)
    return " ".join(_LEX_ARR[picks.astype(np.int64)])


def transcripts_pandas(n_turns: int, start: int = 0) -> pd.DataFrame:
    """Rows [start, start+n_turns) of the canonical transcript table."""
    return transcripts_from_idx(np.arange(start, start + n_turns, dtype=np.int64))


def transcripts_from_idx(idx: np.ndarray) -> pd.DataFrame:
    """Canonical transcript rows for arbitrary global turn indices."""
    idx = np.asarray(idx, dtype=np.int64)
    conv = idx // TURNS_PER_CONV
    turn_idx = (idx % TURNS_PER_CONV).astype(np.int32)
    role_pick = (mix64(idx.astype(np.uint64) * _U64(0x165667B19E3779F9)) % _U64(4)).astype(np.int64)
    roles = np.array(ROLES)[role_pick]
    tool_pick = (mix64(idx.astype(np.uint64) + _U64(0x1234)) % _U64(len(TOOLS))).astype(np.int64)
    tools = np.where(roles == "tool", np.array(TOOLS)[tool_pick], None)
    ts = _BASE_TS + (idx * 1_000_000).astype("timedelta64[us]")
    return pd.DataFrame(
        {
            "conv_id": np.char.add("conv-", np.char.zfill(conv.astype(str), 8)),
            "turn_idx": turn_idx,
            "role": roles,
            "text": [_turn_text(int(i)) for i in idx],
            "tool": tools,
            "ts": ts,
        }
    )


def transcripts_spark(
    spark, n_turns: int, partitions: int | None = None, offset: int = 0
):
    """Distributed synthesis: spark.range -> mapInPandas, each batch derived
    from the global index — no driver-side materialization, scales linearly.
    `offset` starts the index window at a later turn: every turn is a pure
    function of its global index, so [0, n) followed by [n, n+m) is
    bit-identical to one [0, n+m) corpus — the incremental-job fixture.
    """
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), False),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids) == 0:
                continue
            yield transcripts_from_idx(ids)

    rng = spark.range(
        offset, offset + n_turns, 1, partitions or spark.sparkContext.defaultParallelism
    )
    return rng.mapInPandas(gen, schema=schema)


def planted_docs(docs):
    """Near-duplicate TEST FIXTURE (not an operator): the corpus plus a
    truncated copy of every doc_id % 5 == 0 document (id + 1_000_000, first
    80% of tokens). The dedup operators in ops.dedup take a corpus verbatim;
    contract queries and tests wrap their input with this to guarantee
    near-duplicates exist at every scale factor. Returns (doc_id, tokens).
    """
    from pyspark.sql import functions as F

    from .ops.dedup import with_tokens

    base = with_tokens(docs.select("doc_id", "text")).select("doc_id", "tokens")
    plants = base.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.expr(
            "slice(tokens, 1, greatest(1, cast(floor(size(tokens) * 0.8) as int)))"
        ).alias("tokens"),
    )
    return base.unionByName(plants)


def pii_planted_docs(docs):
    """PII TEST FIXTURE (not an operator): the documents corpus with
    deterministic PII appended — an email on every doc_id % 5 == 0 doc, a
    phone on % 7 == 1, an IPv4 on % 11 == 2 (some docs get several) — so
    ops.pii.pii_scrub has true positives at every scale factor and clean
    docs stay untouched. The DuckDB oracle states the same printf-built
    suffixes verbatim. Returns (doc_id, text)."""
    from pyspark.sql import functions as F

    d = F.col("doc_id")
    email = F.when(
        d % 5 == 0,
        F.format_string(" reach me at user%d@example.com ok", d),
    ).otherwise(F.lit(""))
    phone = F.when(
        d % 7 == 1,
        F.format_string(" call 555-2%02d-4%03d soon", d % 100, d % 1000),
    ).otherwise(F.lit(""))
    ip = F.when(
        d % 11 == 2,
        F.format_string(" from 10.%d.%d.25 logged", d % 256, (d * 7) % 256),
    ).otherwise(F.lit(""))
    return docs.select(
        "doc_id", F.concat(F.col("text"), email, phone, ip).alias("text")
    )


def contaminated_eval_docs(docs):
    """Eval-set TEST FIXTURE (not an operator): the first 60% of tokens of
    every doc_id % 7 == 0 document, re-keyed +2_000_000 — an eval set that
    is contaminated by construction (each item is embedded verbatim in its
    source training document). ops.dedup.winnow_decontaminate takes train
    and eval corpora verbatim; contract queries and tests wrap the
    documents table with this so true contamination exists at every scale
    factor. Returns (doc_id, tokens).
    """
    from pyspark.sql import functions as F

    from .ops.dedup import with_tokens

    base = with_tokens(docs.select("doc_id", "text")).select("doc_id", "tokens")
    return base.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.expr(
            "slice(tokens, 1, greatest(1, cast(floor(size(tokens) * 0.6) as int)))"
        ).alias("tokens"),
    )
