"""Agent-transcript analytics (ops/transcripts.py): brute-force equality
against the canonical pandas fixture — transcripts_pandas IS the Spark
input by construction (fixture equality is pinned in test_sources), so a
pandas replay is a full oracle here."""

import numpy as np

from openue_spark.fixtures import transcripts_pandas


def _r4(x: float) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP))


def test_conversation_stats_brute_force(spark):
    from openue_spark.ops.transcripts import conversation_stats

    pdf = transcripts_pandas(256)
    exp = {}
    for conv, g in pdf.groupby("conv_id"):
        ep = g["ts"].astype("datetime64[us]").astype(np.int64)
        toks = g["text"].str.strip().map(lambda t: len(t.split()) if t else 0)
        exp[conv] = (
            len(g),
            int((g["role"] == "user").sum()),
            int((g["role"] == "assistant").sum()),
            int((g["role"] == "tool").sum()),
            g["tool"].dropna().nunique(),
            _r4((ep.max() - ep.min()) / 1_000_000.0),
            _r4(float(toks.mean())),
        )
    got = {
        r.conv_id: (
            r.n_turns,
            r.n_user,
            r.n_assistant,
            r.n_tool,
            r.n_tools_distinct,
            r.duration_s,
            r.avg_turn_tokens,
        )
        for r in conversation_stats(
            spark.createDataFrame(pdf).repartition(7)
        ).collect()
    }
    assert got == exp
    assert any(v[3] > 0 for v in exp.values())  # tool turns exist
    assert any(v[4] >= 2 for v in exp.values())  # multi-tool convs exist


def test_tool_usage_brute_force(spark):
    from openue_spark.ops.transcripts import tool_usage

    pdf = transcripts_pandas(512)
    used = pdf[pdf["tool"].notna()]
    exp = {}
    for tool, g in used.groupby("tool"):
        ep = g["ts"].astype("datetime64[us]").astype(np.int64)
        exp[tool] = (len(g), g["conv_id"].nunique(), int(ep.min()), int(ep.max()))
    got = {
        r.tool: (r.n_calls, r.n_convs, r.first_call_us, r.last_call_us)
        for r in tool_usage(spark.createDataFrame(pdf).repartition(5)).collect()
    }
    assert got == exp
    assert set(exp) == {"search", "calculator", "browser", "db_query"}


def test_conversation_stats_single_turn_conv(spark):
    """A one-turn conversation has duration 0 and a well-defined mix."""
    from openue_spark.ops.transcripts import conversation_stats

    pdf = transcripts_pandas(1)
    r = conversation_stats(spark.createDataFrame(pdf)).collect()[0]
    assert r.n_turns == 1 and r.duration_s == 0.0
    assert r.n_user + r.n_assistant + r.n_tool == 1
