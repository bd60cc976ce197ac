"""Sources: JSONL corpus scan (S1), relation dim (S2), transcript scan."""

import json
import os

from pyspark.sql import functions as F


def _write_jsonl(path, records):
    with open(path, "w", encoding="utf-8") as f:
        for r in records:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")


def test_read_jsonl_corpus_stable_ids_and_gold(spark, tmp_path):
    from openue_spark.sources import nonempty_gold, read_jsonl_corpus

    records = [
        {"text": "alpha beta", "spo_list": [
            {"subject": "alpha", "predicate": "works_at", "object": "beta"}]},
        {"text": "no gold here", "spo_list": []},
        {"text": "gamma", "spo_list": [
            {"subject": "g", "predicate": "born_in", "object": "x"},
            {"subject": "g2", "predicate": "born_in", "object": "y"}]},
    ]
    p = str(tmp_path / "train.json")
    _write_jsonl(p, records)

    corpus = read_jsonl_corpus(spark, p)
    rows = corpus.orderBy("text_id").collect()
    assert [r.text_id for r in rows] == [0, 1, 2]
    assert {r.text for r in rows} == {r["text"] for r in records}
    by_text = {r.text: r for r in rows}
    assert len(by_text["gamma"].gold) == 2
    assert by_text["gamma"].gold[0].predicate == "born_in"
    assert len(by_text["no gold here"].gold) == 0

    kept = nonempty_gold(corpus)
    assert kept.count() == 2
    assert {r.text for r in kept.collect()} == {"alpha beta", "gamma"}


def test_read_jsonl_corpus_lenient_accepts_single_quoted_records(
    spark, tmp_path
):
    """The reference reads its SKE files with eval(line) (utils.py:323),
    so the actual on-disk records are Python dict literals — single
    quotes (which Spark's JSON reader happens to tolerate) but also
    None/True literals, which no JSON parser accepts. lenient=True must
    load the whole file — Python-literal lines mixed with strict-JSON
    lines and blank lines — identically to the strict reader loading the
    JSON rendering of the same records; default strict mode mangles the
    Python-only lines (PERMISSIVE null-out), keeping the divergence
    visible."""
    from openue_spark.sources import read_jsonl_corpus

    records = [
        {"text": "it's quoted", "spo_list": [
            {"subject": "it", "predicate": "born_in", "object": "x"}]},
        {"text": "none case", "spo_list": None},  # Python literal `None`
        {"text": "strict line", "spo_list": [
            {"subject": "s", "predicate": "works_at", "object": "o"}]},
    ]
    p_mixed = str(tmp_path / "ske.json")
    with open(p_mixed, "w", encoding="utf-8") as f:
        f.write(repr(records[0]) + "\n")   # single-quoted, apostrophe inside
        f.write(repr(records[1]) + "\n")   # contains `None` — not JSON
        f.write("\n")                      # blank line skipped
        f.write(json.dumps(records[2]) + "\n")  # strict JSON fast path

    p_strict = str(tmp_path / "train.json")
    _write_jsonl(p_strict, records)

    got = read_jsonl_corpus(spark, p_mixed, lenient=True)
    want = read_jsonl_corpus(spark, p_strict)
    as_set = lambda df: {  # noqa: E731
        (r.text, tuple((g.subject, g.predicate, g.object) for g in r.gold))
        for r in df.collect()
    }
    assert as_set(got) == as_set(want)
    assert sorted(r.text_id for r in got.collect()) == [0, 1, 2]

    # default strict mode cannot round-trip the `None` line: the record
    # comes back mangled (nulled by PERMISSIVE mode), not silently equal
    strict_rows = read_jsonl_corpus(spark, p_mixed).collect()
    assert "none case" not in {r.text for r in strict_rows}


def test_relations_dim_and_rel2id_roundtrip(spark, tmp_path):
    from openue_spark.config import NUM_RELATIONS, PREDICATES
    from openue_spark.sources import (
        broadcast_rel2id,
        read_rel2id_json,
        relations_dim,
        write_rel2id_json,
    )

    dim = relations_dim(spark)
    assert dim.count() == NUM_RELATIONS
    assert dim.where(F.col("rel_id") == 0).collect()[0].pred == PREDICATES[0]

    p = str(tmp_path / "rel2id.json")
    write_rel2id_json(p)
    back = read_rel2id_json(spark, p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, dim.collect()))

    b = broadcast_rel2id(spark)
    assert b.value[PREDICATES[3]] == 3


def test_read_transcripts_schema_and_stable_order(spark, tmp_path):
    from openue_spark.fixtures import transcripts_spark
    from openue_spark.sources import read_transcripts, with_stable_text_id

    path = str(tmp_path / "turns")
    transcripts_spark(spark, 500, partitions=3).write.parquet(path)
    t = read_transcripts(spark, path)
    assert [f.name for f in t.schema] == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

    ordered = with_stable_text_id(t).orderBy("text_id").collect()
    keys = [(r.conv_id, r.turn_idx) for r in ordered]
    assert keys == sorted(keys)
    assert [r.text_id for r in ordered] == list(range(len(ordered)))


def test_read_transcripts_table_format(spark, tmp_path):
    """The Iceberg/catalog seam: fmt='table' resolves a table name through
    the session catalog (an Iceberg table once the runtime jar + catalog
    conf are on spark-submit; a temp view here — spark.read.table resolves
    both) and normalizes columns to the contract schema."""
    from openue_spark.fixtures import transcripts_spark
    from openue_spark.sources import read_transcripts

    path = str(tmp_path / "turns")
    transcripts_spark(spark, 200, partitions=2).write.parquet(path)
    # extra column + shuffled column order: the seam must project+normalize
    raw = spark.read.parquet(path)
    raw.selectExpr("ts", "tool", "text", "role", "turn_idx", "conv_id", "1 as junk") \
        .createOrReplaceTempView("transcripts_v")
    t = read_transcripts(spark, "transcripts_v", fmt="table")
    assert [f.name for f in t.schema] == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    base = read_transcripts(spark, path)
    assert sorted(map(tuple, t.collect())) == sorted(map(tuple, base.collect()))
