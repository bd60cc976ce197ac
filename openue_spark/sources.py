"""Sources: corpus scans and the relation-schema dimension (SURVEY.md §2.1).

Reference surface re-expressed Spark-first:

- S1 JSONL corpus scan (reference utils.py:311-332): the reference reads
  `{train,dev,test}.json` one `eval(line)` at a time into
  `InputExample(text_id, words, triples)`. Here: `spark.read.json` (strict
  JSON by default — SURVEY.md §1.4; `lenient=True` opts into the
  reference's eval()-style Python-literal records via a safe
  ast.literal_eval fallback so OpenUE's actual SKE files load) plus a
  stable `text_id`
  assigned by file order via row_number, never
  monotonically_increasing_id().
- S2 relation-schema scan (reference utils.py:221-222, 620-625):
  `rel2id.json` -> both a broadcast dict and a `relations(pred, rel_id)`
  dimension DataFrame small enough to broadcast-join everywhere.
- Transcript-table scan per BASELINE.json input_hint: schema-enforced
  parquet (same layout as an Iceberg table partitioned by
  bucket(conv_id), sorted by turn_idx).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from .config import PREDICATES, REL2ID

# SKE-style record: {"text": ..., "spo_list": [{"subject","predicate","object"}...]}
CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType(), False),
        T.StructField(
            "spo_list",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("subject", T.StringType()),
                        T.StructField("predicate", T.StringType()),
                        T.StructField("object", T.StringType()),
                    ]
                )
            ),
            True,
        ),
    ]
)

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)


def read_jsonl_corpus(
    spark: SparkSession, path: str, lenient: bool = False
) -> DataFrame:
    """S1: JSONL corpus -> (text_id, text, gold) with a stable text_id.

    The reference numbers examples in read order (utils.py:320-331). A
    distributed reader has no cheap notion of "read order", so text_id here
    is assigned in deterministic CONTENT order — lexicographic over
    (input file, text, spo_list) — which is stable across runs and
    partitionings but matches the reference's line numbers only for files
    whose lines happen to be sorted. Nothing downstream keys on text_id
    density or reference-identical numbering (the pipeline keys on
    (conv_id, turn_idx)); if reference-matching ids ever matter, store the
    line number as a column at ingest. Fixture-scale reader: the global
    row_number is a single-partition sort by construction.

    ``lenient=True`` additionally accepts the reference's actual on-disk
    quirk: `eval(line)`-style single-quoted pseudo-JSON records
    (reference utils.py:323 literally evals each line, so OpenUE's SKE
    files are Python dict literals, not JSON). The fallback parses each
    non-JSON line with `ast.literal_eval` (safe — literals only, never
    code) inside an Arrow-batched mapInPandas; strict-JSON lines take the
    json.loads fast path within the same parser. Default stays strict
    (SURVEY.md §1.4): malformed records should fail loudly unless the
    caller opts into reference-file tolerance.
    """
    if lenient:
        raw = _read_jsonl_lenient(spark, path)
    else:
        raw = (
            spark.read.schema(CORPUS_SCHEMA)
            .json(path)
            .withColumn("_file", F.input_file_name())
        )
    w = Window.orderBy("_file", "text", "spo_list")
    return (
        raw.withColumn("text_id", F.row_number().over(w) - 1)
        .select(
            "text_id",
            "text",
            F.coalesce("spo_list", F.array()).alias("gold"),
        )
    )


def _read_jsonl_lenient(spark: SparkSession, path: str) -> DataFrame:
    """Line scan tolerating the reference's single-quoted records: text
    source -> per-line parse (json.loads, ast.literal_eval fallback) ->
    CORPUS_SCHEMA columns + _file. Blank lines are skipped like the
    reference's reader skips nothing it can't eval — a line that parses
    as neither JSON nor a Python literal raises, keeping ingest loud."""
    out_fields = T.StructType(
        CORPUS_SCHEMA.fields + [T.StructField("_file", T.StringType())]
    )
    lines = spark.read.text(path).withColumn("_file", F.input_file_name())

    def parse(batches):
        import ast
        import json as _json

        import pandas as pd

        for pdf in batches:
            texts, spos, files = [], [], []
            for line, fname in zip(pdf["value"], pdf["_file"]):
                s = (line or "").strip()
                if not s:
                    continue
                try:
                    d = _json.loads(s)
                except ValueError:
                    d = ast.literal_eval(s)
                spo = d.get("spo_list")
                texts.append(d.get("text"))
                spos.append(
                    None
                    if spo is None
                    else [
                        {
                            "subject": t.get("subject"),
                            "predicate": t.get("predicate"),
                            "object": t.get("object"),
                        }
                        for t in spo
                    ]
                )
                files.append(fname)
            yield pd.DataFrame(
                {"text": texts, "spo_list": spos, "_file": files}
            )

    return lines.mapInPandas(parse, out_fields)


def nonempty_gold(corpus: DataFrame) -> DataFrame:
    """P3: drop examples whose gold triple list is empty
    (reference utils.py:368-369)."""
    return corpus.where(F.size("gold") > 0)


def relations_dim(spark: SparkSession) -> DataFrame:
    """S2: the relation schema as a (pred, rel_id) dimension table."""
    return spark.createDataFrame(
        [(p, i) for i, p in enumerate(PREDICATES)], "pred string, rel_id int"
    )


def broadcast_rel2id(spark: SparkSession):
    """S2: rel2id as a broadcast dict (reference loads it once per run)."""
    return spark.sparkContext.broadcast(dict(REL2ID))


def write_rel2id_json(path: str) -> None:
    """Persist the schema in the reference's rel2id.json shape."""
    with open(path, "w", encoding="utf-8") as f:
        json.dump(REL2ID, f, ensure_ascii=False, sort_keys=True)


def read_rel2id_json(spark: SparkSession, path: str) -> DataFrame:
    """Load a rel2id.json into the dim-table shape (driver-side read —
    the file is tiny by construction, like the reference's)."""
    with open(path, encoding="utf-8") as f:
        rel2id = json.load(f)
    return spark.createDataFrame(
        sorted(rel2id.items(), key=lambda kv: kv[1]), "pred string, rel_id int"
    )


def read_transcripts(
    spark: SparkSession, source: str, fmt: str = "parquet"
) -> DataFrame:
    """Schema-enforced transcript-table scan (BASELINE.json input_hint).

    `fmt` is the table-format seam: the north rule's corpus lives in an
    Iceberg table, but the sandbox ships no Iceberg runtime jar, so parquet
    paths are the default and the Iceberg path is the catalog-table branch
    (tests exercise it through a temp view — `spark.read.table` resolves
    both):

    - ``"parquet"``: path scan with the contract schema enforced at the
      reader (column pruning + predicate pushdown reach the scan).
    - ``"table"``: `source` is a catalog table/view name — e.g. an Iceberg
      table `catalog.db.transcripts` once spark-submit ships
      ``--packages org.apache.iceberg:iceberg-spark-runtime-*`` and the
      catalog conf. Iceberg's partition pruning/metadata filtering applies
      below this reader; columns are selected and cast to the contract
      schema so everything downstream is format-agnostic.
    - anything else: ``spark.read.format(fmt).load(source)`` (delta, orc...).

    The ``ts`` column is deliberately NOT cast: parquet written by this
    driver reads back as TIMESTAMP_NTZ under Spark 4 and a cast to TZ would
    shift wall-clock values; `ops.temporal.epoch_us` handles both flavors.
    """
    if fmt == "parquet":
        return spark.read.schema(TRANSCRIPT_SCHEMA).parquet(source)
    df = (
        spark.read.table(source)
        if fmt == "table"
        else spark.read.format(fmt).load(source)
    )
    cols = [
        F.col(f.name).alias(f.name)
        if f.name == "ts"
        else F.col(f.name).cast(f.dataType).alias(f.name)
        for f in TRANSCRIPT_SCHEMA.fields
    ]
    return df.select(*cols)


def with_stable_text_id(transcripts: DataFrame) -> DataFrame:
    """W2: global stable ordering key over (conv_id, turn_idx).

    A global row_number is a single-partition sort at 10^12 rows — only for
    fixture-scale parity checks. At scale, (conv_id, turn_idx) IS the key;
    every pipeline stage carries it instead of a dense id.
    """
    w = Window.orderBy("conv_id", "turn_idx")
    return transcripts.withColumn("text_id", F.row_number().over(w) - 1)
