"""Streaming surface: same-plan parity with batch + watermarked windows.

The extraction plan is stateless/narrow, so the streaming result must be
exactly the batch result on the same input (multiset equality). The
windowed aggregation is checked against the equivalent batch groupBy for
every window the stream emitted (append mode withholds windows the
watermark has not yet closed — at availableNow drain that is at most the
final window).
"""

import os

import pytest

from openue_spark.fixtures import transcripts_spark


@pytest.fixture(scope="module")
def turn_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream") / "turns")
    transcripts_spark(spark, 1_000, partitions=4).write.parquet(path)
    return path


def test_stream_extract_matches_batch(spark, turn_dir, tmp_path):
    from openue_spark.pipeline import extract_triples
    from openue_spark.streaming import (
        read_turn_stream,
        stream_extract_triples,
        stream_triple_sink,
    )

    out = str(tmp_path / "triples")
    ckpt = str(tmp_path / "ckpt")
    q = stream_triple_sink(
        stream_extract_triples(read_turn_stream(spark, turn_dir)), out, ckpt
    )
    assert q.awaitTermination(300), "stream did not drain in time"

    got = spark.read.parquet(out)
    want = extract_triples(spark.read.parquet(turn_dir))
    key = ["conv_id", "turn_idx", "subj", "pred", "obj"]
    g = {tuple(r) for r in got.groupBy(key).count().collect()}
    w = {tuple(r) for r in want.groupBy(key).count().collect()}
    assert g == w and len(g) > 0


def test_stream_resume_is_exactly_once(spark, turn_dir, tmp_path):
    """Re-running with the same checkpoint must not duplicate output."""
    from openue_spark.streaming import (
        read_turn_stream,
        stream_extract_triples,
        stream_triple_sink,
    )

    out = str(tmp_path / "triples")
    ckpt = str(tmp_path / "ckpt")
    for _ in range(2):
        q = stream_triple_sink(
            stream_extract_triples(read_turn_stream(spark, turn_dir)), out, ckpt
        )
        assert q.awaitTermination(300)
    n = spark.read.parquet(out).count()
    from openue_spark.pipeline import extract_triples

    assert n == extract_triples(spark.read.parquet(turn_dir)).count()


def test_windowed_turn_rates_match_batch(spark, turn_dir, tmp_path):
    from pyspark.sql import functions as F

    from openue_spark.streaming import read_turn_stream, windowed_turn_rates

    q = (
        windowed_turn_rates(read_turn_stream(spark, turn_dir))
        .writeStream.format("memory")
        .queryName("turn_rates")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    emitted = spark.table("turn_rates").collect()

    batch = (
        spark.read.parquet(turn_dir)
        .groupBy(F.window("ts", "5 minutes").alias("win"), "role")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "role",
            "n_turns",
        )
        .collect()
    )
    batch_map = {(r.win_start, r.win_end, r.role): r.n_turns for r in batch}
    assert len(emitted) > 0
    for r in emitted:
        assert batch_map[(r.win_start, r.win_end, r.role)] == r.n_turns


def test_stateful_triple_dedup_accumulates_across_microbatches(spark, tmp_path):
    """Multiple micro-batches (maxFilesPerTrigger=1 over several files) must
    accumulate per-key state; the final update per key equals the batch
    dedup support."""
    from pyspark.sql import functions as F

    from openue_spark.fixtures import transcripts_spark
    from openue_spark.pipeline import extract_triples
    from openue_spark.streaming import (
        read_turn_stream,
        stateful_triple_dedup,
        stream_extract_triples,
    )

    turn_dir = str(tmp_path / "turns")
    # the SAME turns land twice as separate files => with maxFilesPerTrigger=1
    # every key is seen again in a later micro-batch, exercising state reuse
    turns = transcripts_spark(spark, 600, partitions=1).coalesce(1)
    turns.write.parquet(turn_dir)
    turns.write.mode("append").parquet(turn_dir)

    q = (
        stateful_triple_dedup(
            stream_extract_triples(read_turn_stream(spark, turn_dir, max_files_per_trigger=1))
        )
        .writeStream.format("memory")
        .queryName("dedup_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)

    # last emitted update per key == cumulative support
    updates = spark.table("dedup_state")
    final = (
        updates.groupBy("subj", "pred", "obj")
        .agg(F.max("support").alias("support"), F.sum("new_in_batch").alias("total_new"))
    )
    got = {(r.subj, r.pred, r.obj): (r.support, r.total_new) for r in final.collect()}

    want = {
        (r.subj, r.pred, r.obj): r.support
        for r in extract_triples(spark.read.parquet(turn_dir))
        .groupBy("subj", "pred", "obj")
        .agg(F.count(F.lit(1)).alias("support"))
        .collect()
    }
    assert len(got) == len(want) > 0
    for k, (support, total_new) in got.items():
        assert want[k] == support == total_new
    # statefulness actually exercised: some key was updated in more than one
    # micro-batch (maxFilesPerTrigger=1 over 3 files => 3 batches)
    assert updates.count() > final.count()


def test_streaming_windowed_rates_equal_batch(spark, tmp_path):
    """The generic windowed_rates op gives the same answer executed as a
    Structured Streaming query (availableNow -> memory sink, complete mode)
    and as a plain batch aggregation — one declaration, two engines."""
    from openue_spark.fixtures import transcripts_spark
    from openue_spark.streaming import windowed_rates

    turn_dir = str(tmp_path / "turns")
    transcripts_spark(spark, 500, partitions=2).write.parquet(turn_dir)

    batch_df = spark.read.parquet(turn_dir)
    stream_df = spark.readStream.schema(batch_df.schema).parquet(turn_dir)

    q = (
        windowed_rates(stream_df, "ts", "role", window="10 minutes", watermark=None)
        .writeStream.format("memory")
        .queryName("win_rates_eq")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)

    got = {
        (r.win_start, r.role): r.n_rows
        for r in spark.table("win_rates_eq").collect()
    }
    want = {
        (r.win_start, r.role): r.n_rows
        for r in windowed_rates(
            batch_df, "ts", "role", window="10 minutes", watermark=None
        ).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_append_watermark_emits_exactly_closed_windows(
    spark, tmp_path
):
    """Watermarked APPEND mode == the batch aggregation restricted to
    CLOSED windows: availableNow's trailing no-data micro-batch advances
    the watermark to floor_ms(max event ts) - delay and flushes every
    window whose end the watermark passed — nothing more (the open tail
    stays withheld, by spec) and nothing less. This is the stream==batch
    pin behind the driver's streaming_event_rates_append oracle row."""
    from openue_spark.fixtures import transcripts_spark
    from openue_spark.ops.temporal import epoch_us
    from openue_spark.streaming import windowed_rates
    from pyspark.sql import functions as F

    turn_dir = str(tmp_path / "turns")
    # fixture turns tick 1s apart: 2000 turns ≈ 33 min — several fully
    # closed 10-minute windows plus an open tail the watermark withholds
    transcripts_spark(spark, 2_000, partitions=2).write.parquet(turn_dir)
    batch_df = spark.read.parquet(turn_dir)
    stream_df = spark.readStream.schema(batch_df.schema).parquet(turn_dir)

    def instant(df):
        # ts reads back as TIMESTAMP_NTZ; withWatermark needs an instant
        return df.withColumn("ts_i", F.timestamp_micros(epoch_us(df, "ts")))

    q = (
        windowed_rates(
            instant(stream_df), "ts_i", "role",
            window="10 minutes", watermark="10 minutes",
        )
        .writeStream.format("memory")
        .queryName("win_rates_append")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = {
        (r.win_start, r.role): r.n_rows
        for r in spark.table("win_rates_append").collect()
    }

    b = instant(batch_df)
    max_us = b.agg(F.max(F.unix_micros("ts_i"))).collect()[0][0]
    wm_us = (max_us // 1000) * 1000 - 600_000_000
    closed = windowed_rates(
        b, "ts_i", "role", window="10 minutes", watermark=None
    ).where(F.unix_micros("win_end") <= F.lit(wm_us))
    want = {(r.win_start, r.role): r.n_rows for r in closed.collect()}
    all_windows = windowed_rates(
        b, "ts_i", "role", window="10 minutes", watermark=None
    ).count()
    assert got == want and len(got) > 0
    assert len(got) < all_windows  # the open tail really was withheld


@pytest.mark.slow
def test_stream_fold_sink_continuous_kg_maintenance(spark, tmp_path):
    """Micro-batches folded into a persisted KG must reproduce the graph a
    single full batch run builds over the union corpus, and replayed
    epochs (same batch ids, fresh checkpoint) must fold nothing twice."""
    from openue_spark.job import main
    from openue_spark.streaming import read_turn_stream, stream_fold_sink

    kg = str(tmp_path / "kg")
    base = ["--shards", "2", "--max-bucket", "none"]
    assert main(["--synthesize", "2000", "--out", kg] + base, spark=spark) == 0

    stream_src = str(tmp_path / "batch_turns")
    transcripts_spark(spark, 800, partitions=3, offset=2000).write.parquet(stream_src)

    def run_fold(ckpt):
        q = stream_fold_sink(
            read_turn_stream(spark, stream_src, max_files_per_trigger=1),
            kg,
            str(tmp_path / ckpt),
            available_now=True,
            max_bucket=None,
        )
        q.awaitTermination(300)

    run_fold("ck1")

    def graph_rows(out):
        return {
            tuple(r)
            for r in spark.read.parquet(f"{out}/graph")
            .select("subj", "pred", "obj", "support", "first_conv")
            .collect()
        }

    folded = graph_rows(kg)
    full = str(tmp_path / "kg_full")
    assert main(["--synthesize", "2800", "--out", full] + base, spark=spark) == 0
    assert folded == graph_rows(full)

    # replay: a fresh checkpoint re-delivers the same epochs with the same
    # batch ids; the fold manifest must skip every one (graph unchanged)
    run_fold("ck2")
    assert graph_rows(kg) == folded


@pytest.mark.slow
def test_stream_fold_new_data_under_recycled_batch_ids(spark, tmp_path):
    """Epoch ids restart at 0 under a new checkpoint; a batch carrying NEW
    turns must still fold (the manifest keys on content fingerprint too,
    not the bare id) — and a fold against a dir with no KG must fail
    without blacklisting the epoch."""
    import pytest

    from openue_spark.job import main
    from openue_spark.streaming import read_turn_stream, stream_fold_sink

    kg = str(tmp_path / "kg")
    base = ["--shards", "2", "--max-bucket", "none"]

    # precondition failure BEFORE any KG exists: the stream errors and
    # writes no manifest row (nothing gets blacklisted)
    src1 = str(tmp_path / "turns1")
    transcripts_spark(spark, 400, partitions=1, offset=3000).write.parquet(src1)
    q = stream_fold_sink(
        read_turn_stream(spark, src1), kg, str(tmp_path / "ck0"),
        available_now=True, max_bucket=None,
    )
    with pytest.raises(Exception):
        q.awaitTermination(300)
        q.processAllAvailable()
    assert not os.path.isdir(f"{kg}/fold_manifest")

    assert main(["--synthesize", "3000", "--out", kg] + base, spark=spark) == 0
    q = stream_fold_sink(
        read_turn_stream(spark, src1), kg, str(tmp_path / "ck1"),
        available_now=True, max_bucket=None,
    )
    q.awaitTermination(300)
    n1 = spark.read.parquet(f"{kg}/graph").count()

    # second source, DIFFERENT turns, fresh checkpoint -> same epoch ids;
    # the fingerprint differs so the fold must apply, growing the graph
    src2 = str(tmp_path / "turns2")
    transcripts_spark(spark, 400, partitions=1, offset=3400).write.parquet(src2)
    q = stream_fold_sink(
        read_turn_stream(spark, src2), kg, str(tmp_path / "ck2"),
        available_now=True, max_bucket=None,
    )
    q.awaitTermination(300)
    n2 = spark.read.parquet(f"{kg}/graph").count()
    assert n2 > n1
    ids = [
        (r.batch_id, r.fingerprint)
        for r in spark.read.parquet(f"{kg}/fold_manifest").collect()
    ]
    assert len(ids) == 2 and ids[0][0] == ids[1][0] == 0  # recycled id, distinct fp
    assert ids[0][1] != ids[1][1]
