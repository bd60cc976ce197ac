"""Serving surface (serving.py): request/response scoring, batch + stream.

The reference serves via TorchServe handlers (deploy/handler_seq.py);
here serving is micro-batch scoring with the SAME plan as batch — these
tests pin response shape, batch==serve equality, streaming exactly-once,
and the seam passthrough.
"""

import os

import pytest

from openue_spark.fixtures import transcripts_pandas


@pytest.fixture(scope="module")
def requests_df(spark):
    turns = transcripts_pandas(60)
    rows = [(f"req-{i:03d}", t) for i, t in enumerate(turns["text"])]
    return spark.createDataFrame(rows, "request_id string, text string")


def test_score_requests_matches_batch_pipeline(spark, requests_df):
    """Serving must emit exactly the triples the batch pipeline extracts
    from the same texts — response keys renamed per the reference API."""
    from openue_spark.pipeline import extract_triples
    from openue_spark.serving import score_requests

    got = {
        (r.request_id, r.subject, r.predict, r.object)
        for r in score_requests(requests_df).collect()
    }
    turns = requests_df.selectExpr(
        "request_id AS conv_id", "0 AS turn_idx", "text"
    )
    want = {
        (r.conv_id, r.subj, r.pred, r.obj)
        for r in extract_triples(turns).collect()
    }
    assert got == want and len(got) > 10


def test_serve_request_stream_drains_and_is_exactly_once(spark, requests_df, tmp_path):
    """availableNow drains every pending request; a second start with the
    SAME checkpoint re-scores nothing (offset log = exactly-once)."""
    from openue_spark.serving import serve_request_stream

    inp = str(tmp_path / "requests")
    out = str(tmp_path / "responses")
    ckpt = str(tmp_path / "ckpt")
    requests_df.write.mode("overwrite").parquet(inp)

    q = serve_request_stream(spark, inp, out, ckpt, available_now=True)
    q.awaitTermination(120)
    first = spark.read.parquet(out).count()
    assert first > 10

    q2 = serve_request_stream(spark, inp, out, ckpt, available_now=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == first  # nothing re-scored

    # new requests arriving after a restart ARE scored (resume, not replay);
    # the text is a fixture turn verified to yield triples under the mock
    # scorers (short hand-written sentences mostly yield none)
    new_text = transcripts_pandas(62)["text"].iloc[61]
    extra = spark.createDataFrame(
        [("req-new", new_text)], "request_id string, text string"
    )
    extra.write.mode("append").parquet(inp)
    q3 = serve_request_stream(spark, inp, out, ckpt, available_now=True)
    q3.awaitTermination(120)
    after = spark.read.parquet(out)
    assert after.where("request_id = 'req-new'").count() > 0


def test_serve_request_stream_processing_time_trigger(spark, requests_df, tmp_path):
    """The continuous-serving branch (available_now=False +
    trigger_seconds): fires repeated micro-batches on the timer, scores
    requests that arrive AFTER the stream started, stops cleanly, and the
    checkpoint still guarantees exactly-once (a drain on the same
    checkpoint re-scores nothing). VERDICT r3 item 7: this branch was
    previously untested."""
    import time

    from openue_spark.serving import serve_request_stream

    inp = str(tmp_path / "requests")
    out = str(tmp_path / "responses")
    ckpt = str(tmp_path / "ckpt")
    requests_df.write.mode("overwrite").parquet(inp)

    q = serve_request_stream(
        spark, inp, out, ckpt, available_now=False, trigger_seconds=1
    )
    try:
        def sink_count():
            try:
                return spark.read.parquet(out).count()
            except Exception:
                return 0  # sink dir not created yet

        deadline = time.time() + 90
        while sink_count() == 0 and time.time() < deadline:
            time.sleep(1)
        first = sink_count()
        assert first > 10  # first timed micro-batch landed

        # a request arriving mid-serve is picked up by a LATER micro-batch
        new_text = transcripts_pandas(62)["text"].iloc[61]
        spark.createDataFrame(
            [("req-live", new_text)], "request_id string, text string"
        ).write.mode("append").parquet(inp)
        while time.time() < deadline:
            got = spark.read.parquet(out)
            if got.where("request_id = 'req-live'").count() > 0:
                break
            time.sleep(1)
        live = spark.read.parquet(out)
        assert live.where("request_id = 'req-live'").count() > 0
        # >= 2 distinct timed micro-batches actually fired
        batches = {p["batchId"] for p in q.recentProgress if p["numInputRows"] > 0}
        assert len(batches) >= 2
    finally:
        q.stop()
    q.awaitTermination(60)

    total = spark.read.parquet(out).count()
    q2 = serve_request_stream(spark, inp, out, ckpt, available_now=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == total  # nothing re-scored


def test_score_requests_tokenizer_seam(spark, requests_df):
    """The serving path forwards the tokenizer seam: an injected subword
    tokenizer changes the responses (and flows through both stages)."""
    from openue_spark.serving import score_requests
    from openue_spark.tokenizer import SubwordTokenizer

    bc = spark.sparkContext.broadcast(SubwordTokenizer())
    base = {
        (r.request_id, r.subject, r.predict, r.object)
        for r in score_requests(requests_df).collect()
    }
    sub = {
        (r.request_id, r.subject, r.predict, r.object)
        for r in score_requests(requests_df, tokenizer_bc=bc).collect()
    }
    assert sub and sub != base
