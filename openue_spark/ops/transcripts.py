"""Agent-transcript analytics over the north-rule input table.

The input is a table of multi-turn conversation / agent transcripts with
columns (conv_id, turn_idx, role, text, tool, ts) — BASELINE.json's
input_hint. The KG pipeline consumes (conv_id, turn_idx, text); this
module gives the remaining columns a first-class analytics face: the
per-conversation rollups and tool-usage audits an operator of an agent
fleet runs over the same table before/alongside extraction (corpus
triage, cost attribution, tool-mix drift).

Scale shape: plain groupBy aggregations — every measure partial-
aggregates map-side (counts, conditional sums, min/max ts) except the
distinct-tool count, whose (conv, tool) partials dedup map-side before
the shuffle; parallelism is the groupBy's hash partitioning on conv_id /
tool, exactly the shuffle a 100 TB rollup pays anyway. No Python, no
windows, no joins.

Timestamps cross engines as epoch micros via ops.temporal.epoch_us (the
Spark-4 TIMESTAMP_NTZ gotcha); fractional columns are rounded to 4
decimals (oracle-compare hygiene).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .temporal import epoch_us


def conversation_stats(turns: DataFrame) -> DataFrame:
    """(conv_id, n_turns, n_user, n_assistant, n_tool, n_tools_distinct,
    duration_s, avg_turn_tokens): per-conversation rollup of an agent
    transcript — turn mix by role, distinct tools touched, wall-clock
    span (first to last ts, seconds), mean whitespace tokens per turn."""
    ep = epoch_us(turns, "ts")
    n_tok = F.when(
        F.length(F.trim(F.col("text"))) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.trim(F.col("text")), r"\s+")))
    role_n = lambda r: (  # noqa: E731 - three identical conditional sums
        F.sum(F.when(F.col("role") == r, 1).otherwise(0))
        .cast("long")
        .alias(f"n_{r}")
    )
    return turns.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        role_n("user"),
        role_n("assistant"),
        role_n("tool"),
        F.count_distinct("tool").cast("long").alias("n_tools_distinct"),
        F.round((F.max(ep) - F.min(ep)) / F.lit(1_000_000.0), 4).alias(
            "duration_s"
        ),
        F.round(F.avg(n_tok), 4).alias("avg_turn_tokens"),
    )


def tool_usage(turns: DataFrame) -> DataFrame:
    """(tool, n_calls, n_convs, first_call_us, last_call_us): per-tool
    usage audit over the transcript — call volume, conversation spread,
    and the active window as epoch micros. Null-tool turns (non-tool
    roles) are excluded."""
    ep = epoch_us(turns, "ts")
    return (
        turns.where(F.col("tool").isNotNull())
        .groupBy("tool")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_calls"),
            F.count_distinct("conv_id").cast("long").alias("n_convs"),
            F.min(ep).cast("long").alias("first_call_us"),
            F.max(ep).cast("long").alias("last_call_us"),
        )
    )
