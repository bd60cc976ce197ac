"""Temporal operators: as-of join, bucketed range join, sessionization.

Each Spark operator is checked against a brute-force Python transcription of
its definition on small hand-built + randomized event sets, including the
edge cases the efficient formulations are most likely to get wrong:
equal-timestamp ties, bucket-boundary gaps (gap == window exactly), and
right rows exactly at the left timestamp (as-of is inclusive).
"""

import datetime as dt
import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from openue_spark.ops.temporal import (
    asof_join,
    range_pair_join,
    session_summary,
    sessionize,
)

EPOCH = dt.datetime(2024, 1, 1)


def _us(ts):
    return (ts - EPOCH) // dt.timedelta(microseconds=1)


def _ev(eid, user, kind, sec, value=1.0):
    return Row(
        event_id=eid,
        user_id=user,
        event_type=kind,
        ts=EPOCH + dt.timedelta(seconds=sec),
        value=value,
    )


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    )


def _random_events(seed, n, users, max_sec):
    rng = random.Random(seed)
    return [
        _ev(
            i,
            rng.randrange(users),
            rng.choice(["click", "error", "view"]),
            rng.randrange(max_sec) + rng.random(),
            round(rng.uniform(0, 100), 2),
        )
        for i in range(n)
    ]


# --- as-of join -------------------------------------------------------------


def _brute_asof(left_rows, right_rows):
    """most recent right with ts <= left.ts, same user; max event_id on ties"""
    out = {}
    for l in left_rows:
        best = None
        for r in right_rows:
            if r.user_id != l.user_id or r.ts > l.ts:
                continue
            if best is None or (r.ts, r.event_id) > (best.ts, best.event_id):
                best = r
        out[l.event_id] = None if best is None else (best.ts, best.value)
    return out


def _run_asof(spark, rows):
    df = _events_df(spark, rows)
    left = df.where(F.col("event_type") != "error")
    right = df.where(F.col("event_type") == "error")
    got = asof_join(
        left,
        right,
        keys=["user_id"],
        ts_col="ts",
        attach={"error_ts": "ts", "error_value": "value"},
        right_seq_col="event_id",
    ).collect()
    want = _brute_asof(
        [r for r in rows if r.event_type != "error"],
        [r for r in rows if r.event_type == "error"],
    )
    assert len(got) == len(want)
    for row in got:
        exp = want[row.event_id]
        if exp is None:
            assert row.error_ts is None and row.error_value is None, row
        else:
            assert (row.error_ts, row.error_value) == exp, (row, exp)


def test_asof_basic_and_inclusive_tie(spark):
    rows = [
        _ev(0, 1, "error", 10.0, 5.0),
        _ev(1, 1, "click", 10.0),  # error at the SAME instant: inclusive
        _ev(2, 1, "click", 20.0),
        _ev(3, 1, "error", 30.0, 7.0),
        _ev(4, 1, "click", 25.0),  # before second error
        _ev(5, 2, "click", 50.0),  # user with no errors at all
        _ev(6, 1, "click", 31.0),
    ]
    _run_asof(spark, rows)


def test_asof_duplicate_right_ts_highest_seq_wins(spark):
    rows = [
        _ev(0, 1, "error", 10.0, 5.0),
        _ev(1, 1, "error", 10.0, 9.0),  # same user+ts, higher event_id wins
        _ev(2, 1, "click", 15.0),
    ]
    df = _events_df(spark, rows)
    got = asof_join(
        df.where(F.col("event_type") == "click"),
        df.where(F.col("event_type") == "error"),
        keys=["user_id"],
        ts_col="ts",
        attach={"error_value": "value"},
        right_seq_col="event_id",
    ).collect()
    assert len(got) == 1 and got[0].error_value == 9.0


def test_asof_null_attach_value_stays_null(spark):
    """A NULL attach value in the WINNING right row must come through as
    NULL — not be backfilled from an older right row (attach columns are
    picked atomically from one row, not per-column last(ignorenulls))."""
    rows = [
        _ev(0, 1, "error", 10.0, 5.0),
        Row(event_id=1, user_id=1, event_type="error",
            ts=EPOCH + dt.timedelta(seconds=20.0), value=None),
        _ev(2, 1, "click", 25.0),
    ]
    df = _events_df(spark, rows)
    got = asof_join(
        df.where(F.col("event_type") == "click"),
        df.where(F.col("event_type") == "error"),
        keys=["user_id"],
        ts_col="ts",
        attach={"error_ts": "ts", "error_value": "value"},
        right_seq_col="event_id",
    ).collect()
    assert len(got) == 1
    assert got[0].error_ts == EPOCH + dt.timedelta(seconds=20.0)
    assert got[0].error_value is None  # NOT 5.0 from the older row


def test_asof_randomized(spark):
    rows = _random_events(seed=7, n=300, users=5, max_sec=3600)
    _run_asof(spark, rows)


# --- range pair join --------------------------------------------------------


def _brute_pairs(rows, window_seconds):
    win_us = window_seconds * 1_000_000
    out = set()
    for a in rows:
        for b in rows:
            if a.user_id != b.user_id:
                continue
            a_us = _us(a.ts)
            b_us = _us(b.ts)
            if 0 < b_us - a_us <= win_us:
                out.add((a.user_id, a.event_id, b.event_id))
    return out


@pytest.mark.parametrize("window_seconds", [60, 300])
def test_range_pairs_match_bruteforce(spark, window_seconds):
    rows = _random_events(seed=11, n=200, users=4, max_sec=1800)
    got = range_pair_join(
        _events_df(spark, rows), "user_id", "ts", "event_id", window_seconds
    ).collect()
    got_set = {(r.user_id, r.a_seq, r.b_seq) for r in got}
    assert len(got) == len(got_set), "duplicate pairs emitted"
    assert got_set == _brute_pairs(rows, window_seconds)


def test_range_pairs_boundary_gaps(spark):
    # gap exactly == window (include), window + 1us (exclude), equal ts (exclude)
    rows = [
        _ev(0, 1, "click", 0.0),
        _ev(1, 1, "click", 60.0),          # exactly 60s after 0: include
        _ev(2, 1, "click", 120.000001),    # 60.000001s after 1: exclude
        _ev(3, 1, "click", 0.0),           # equal ts with 0: exclude
    ]
    got = {
        (r.a_seq, r.b_seq)
        for r in range_pair_join(
            _events_df(spark, rows), "user_id", "ts", "event_id", 60
        ).collect()
    }
    want = {(a, b) for (_, a, b) in _brute_pairs(rows, 60)}
    assert got == want
    assert (0, 1) in got           # gap exactly == window: included
    assert (1, 2) not in got       # window + 1us: excluded
    assert (3, 0) not in got and (0, 3) not in got  # equal ts: excluded


# --- sessionization ---------------------------------------------------------


def _brute_sessions(rows, gap_seconds):
    gap_us = gap_seconds * 1_000_000
    by_user = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.ts, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r)
    out = {}
    for user, evs in by_user.items():
        idx, prev_us = 0, None
        for r in evs:
            us = _us(r.ts)
            if prev_us is not None and us - prev_us > gap_us:
                idx += 1
            out[r.event_id] = idx
            prev_us = us
    return out


def test_sessionize_gap_boundary(spark):
    # gap exactly == threshold does NOT split; threshold + 1us does
    rows = [
        _ev(0, 1, "click", 0.0),
        _ev(1, 1, "click", 30.0),        # 30s gap == threshold: same session
        _ev(2, 1, "click", 60.000001),   # 30.000001s: new session
    ]
    got = {
        r.event_id: r.session_idx
        for r in sessionize(_events_df(spark, rows), "user_id", "ts", "event_id", 30).collect()
    }
    assert got == {0: 0, 1: 0, 2: 1}


def test_sessionize_randomized(spark):
    rows = _random_events(seed=3, n=250, users=6, max_sec=7200)
    got = {
        r.event_id: r.session_idx
        for r in sessionize(
            _events_df(spark, rows), "user_id", "ts", "event_id", 120
        ).collect()
    }
    assert got == _brute_sessions(rows, 120)


def test_session_summary_counts_and_decimal_sum(spark):
    rows = _random_events(seed=5, n=200, users=4, max_sec=7200)
    got = session_summary(
        _events_df(spark, rows), "user_id", "ts", "event_id", 120, value_col="value"
    ).collect()
    sess = _brute_sessions(rows, 120)
    n_sessions = len({(r.user_id, sess[r.event_id]) for r in rows})
    assert len(got) == n_sessions
    assert sum(r.n_events for r in got) == len(rows)
    for g in got:
        members = [r for r in rows if r.user_id == g.user_id and sess[r.event_id] == g.session_idx]
        assert g.n_events == len(members)
        assert abs(g.total_value - round(sum(m.value for m in members), 2)) < 1e-9
        # start/end are true epoch micros; check span (base-independent)
        rel = [_us(m.ts) for m in members]
        assert g.end_us - g.start_us == max(rel) - min(rel)
