"""Serving surface: request/response scoring (SURVEY.md §2.1 S7).

The reference ships TorchServe handlers (deploy/handler_seq.py:103-158):
each request carries a text payload, `preprocess` batches the tokenized
inputs, `inference` runs the model forward over the batch, `postprocess`
maps tensors back to one response per request. The Spark-native equivalent
is micro-batch scoring — the SAME narrow extraction plan applied to a
(request_id, text) frame, batch or streaming:

- ``score_requests``: (request_id, text) -> one row per extracted triple
  with the handler's response key names (subject / predict / object,
  lit_models/transformer.py:217-226). Dynamic batching = the Arrow batch;
  model weights and tokenizer ride the same broadcast seams as the batch
  pipeline, so a served deployment and a backfill can never disagree.
- ``serve_request_stream``: continuous serving — a file-source request
  stream scored into an append sink with checkpointed offsets
  (exactly-once per request). At production scale the file source becomes
  Kafka/Iceberg CDC; `trigger_seconds` bounds added latency.

A request whose text yields NO triples emits no rows (exactly the
reference handler's empty-prediction response); join responses back to a
request log on request_id when per-request acks are needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .pipeline import extract_triples

REQUEST_SCHEMA = T.StructType(
    [
        T.StructField("request_id", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)


def score_requests(
    requests: DataFrame, weights_bc=None, tokenizer_bc=None
) -> DataFrame:
    """(request_id, text) -> (request_id, subject, predict, object).

    One row per extracted triple, key names matching the reference text
    API / serving response. The request frame is mapped onto the pipeline's
    (conv_id, turn_idx) key space as (request_id, 0) — requests are
    single-turn by definition — so every downstream stage (dedup, linking,
    metrics) can also consume served output unchanged.
    """
    turns = requests.select(
        F.col("request_id").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        "text",
    )
    triples = extract_triples(turns, weights_bc, tokenizer_bc)
    return triples.select(
        F.col("conv_id").alias("request_id"),
        F.col("subj").alias("subject"),
        F.col("pred").alias("predict"),
        F.col("obj").alias("object"),
    )


def serve_request_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    trigger_seconds: int | None = None,
    weights_bc=None,
    tokenizer_bc=None,
):
    """Score a request stream into a parquet response sink.

    ``available_now=True`` drains pending requests then stops (tests /
    backfill); ``False`` serves continuously, firing every
    ``trigger_seconds`` (None = as fast as micro-batches complete). The
    checkpoint carries source offsets: a killed server resumes without
    double-scoring (exactly-once per request into the sink).
    """
    req = spark.readStream.schema(REQUEST_SCHEMA).parquet(input_path)
    scored = score_requests(req, weights_bc, tokenizer_bc)
    writer = (
        scored.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
