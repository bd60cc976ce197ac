"""Spark-native two-stage interaction extraction pipeline.

Re-expresses the reference's `Inference.forward`
(/root/reference/src/openue/models/model.py:199-393) as a declarative
DataFrame plan. Two equivalent physical forms, pinned bit-identical by
tests/test_parity.py::test_fused_equals_staged:

- FUSED (default, `extract_triples(...)`): the whole chain in ONE
  mapInPandas pass — one Python runner per task, one Arrow round-trip,
  tokenization shared across both model stages. Measured 3x the staged
  wall-clock at sf0.1 (same session, same data).
- STAGED (`fused=False`): the relational decomposition below, whose
  intermediate stages are individually DuckDB-oracle-checked by the
  driver contract (P5/P6/J1/U4 queries).

Staged stage mapping (SURVEY.md §2):

  P1/P2  lowercase + tokenize      -> mapInPandas (Arrow batches)
  U1     SEQ relation scoring      -> same mapInPandas pass (one Arrow trip)
  P5/P6  threshold + argmax fallback -> pure array expressions (no shuffle,
         no window): filter(transform(probs, ...)) with a first-argmax
         fallback via array_position(probs, array_max(probs))
  J1     relation-conditioned fan-out -> explode(selected) — the dense
         expand-then-masked_select GPU idiom (model.py:236-264) is
         deliberately NOT copied; filter-before-explode is the relational
         phrasing and Catalyst keeps it narrow
  U4     marker splice             -> concat(ids, array(REL_BASE+rel_id, SEP))
         pure column ops (model.py:276-304)
  U2/A7/W4/W3  NER forward + argmax + suffix slice + BIO decode
                                   -> second mapInPandas pass
  J3     subject x object cartesian -> two explodes (cross within the row)
  A3     per-sentence regroup      -> unnecessary: conv_id/turn_idx are
         carried through the fan-out (the reference's prefix-sum slicing,
         model.py:337-346, is a batch-tensor artifact)

Scale notes (100 TB / 10^12 turns):
- The entire extraction plan is NARROW — zero shuffles from scan to the raw
  triple stream. Parallelism = input partitions; no skew surface.
- Model "weights" here are the deterministic mock scorers (module-level
  constants, imported once per Python worker). With real weights, swap in a
  broadcast blob + module-global lazy init inside the same two mapInPandas
  generators; the plan shape does not change.
- The only shuffles in the full job are the final dedup/groupBys in
  materialize.py, where skew salting + AQE apply.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import (
    MAX_SEQ_LENGTH,
    NER_LABELS,
    NUM_RELATIONS,
    PREDICATES,
    REL_TOKEN_BASE,
    SEP_ID,
    SIGMOID_THRESHOLD,
)
from ..hashing import poly_hash_batch
from ..mock_models import ner_tags_batch, seq_probs_batch
from ..oracle import span_text
from ..tokenizer import encode, tokenize_words

_SCORED_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("ids", T.ArrayType(T.IntegerType())),
        T.StructField("text", T.StringType()),
        T.StructField("probs", T.ArrayType(T.DoubleType())),
    ]
)

_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("rel_id", T.IntegerType()),
        T.StructField("subjects", T.ArrayType(T.StringType())),
        T.StructField("objects", T.ArrayType(T.StringType())),
    ]
)


def _forwards(weights):
    """Resolve the (seq, ner) batch forwards for a broadcast weights object.

    Duck-typed model seam (the production drop-in point for real
    transformers): an object exposing ``seq_probs_batch(padded_ids) ->
    (n, R) float probs`` and ``ner_tags_batch(padded_ids, rel_ids) ->
    (n, L) int tags`` IS the model — e.g. hf_models.HFTransformerWeights
    wrapping a real HF BERT state_dict (reference models/model.py:10-128);
    zero-padded uint64 id matrices are the batch contract either way. A
    plain MockWeights bundle (or None) routes to the built-in
    deterministic scorers parameterized by it, keeping every existing
    result bit-identical.
    """
    seq_fwd = getattr(weights, "seq_probs_batch", None)
    ner_fwd = getattr(weights, "ner_tags_batch", None)
    if seq_fwd is None:
        def seq_fwd(padded):
            return seq_probs_batch(poly_hash_batch(padded), weights=weights)
    if ner_fwd is None:
        def ner_fwd(padded, rels):
            return ner_tags_batch(padded, rels, weights=weights)
    return seq_fwd, ner_fwd


def _tokenize_and_score_fn(weights_bc=None, tokenizer_bc=None):
    """P1+P2+U1 in one Arrow pass: text -> (ids, words, per-relation probs).

    Iterator form so per-worker init happens once, not per batch: the
    optional `weights_bc` is an ``sc.broadcast(MockWeights)`` fetched via
    `.value` inside the generator — one deserialize per Python worker
    process (pyspark Broadcast caches the value), exactly the seam real
    BERT weights would use. `tokenizer_bc` is the matching tokenizer seam
    (an object with ``encode(text, max_length) -> (ids, words)``, e.g.
    tokenizer.SubwordTokenizer; None uses the built-in word-level encode —
    the reference's real subword vocab would ride this broadcast,
    data_module.py:25-35). The model forward is batched across the whole
    Arrow batch (seq_probs_batch over zero-padded ids) — per-row numpy
    calls cost ~30us/turn in call overhead alone, the batched matrix form
    ~1us/turn; pad-to-batch-max is the dynamic-batching policy.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = weights_bc.value if weights_bc is not None else None
        seq_fwd, _ner_fwd = _forwards(weights)
        enc = tokenizer_bc.value.encode if tokenizer_bc is not None else encode
        max_len = MAX_SEQ_LENGTH - 2  # interactive tokenize bound (utils.py:579-584)
        for pdf in batches:
            n = len(pdf)
            ids_col: list[list[int]] = []
            max_l = 0
            texts = pdf["text"].to_numpy()
            for text in texts:
                ids, _words = enc(text, max_len)
                ids_col.append(ids)
                if len(ids) > max_l:
                    max_l = len(ids)
            padded = np.zeros((n, max_l), dtype=np.uint64)
            for i, ids in enumerate(ids_col):
                padded[i, : len(ids)] = ids
            probs = seq_fwd(padded)
            # `text` (ONE string) flows downstream instead of the words
            # array<string>: the fan-out multiplies every carried byte, and
            # Arrow-serializing ~25 small strings per row both ways was a
            # measurable share of memory bandwidth; stage 2 re-tokenizes.
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"].to_numpy(),
                    "turn_idx": pdf["turn_idx"].to_numpy(),
                    "ids": ids_col,
                    "text": texts,
                    "probs": list(probs),
                }
            )

    return gen


def _ner_decode_fn(weights_bc=None, tokenizer_bc=None):
    """U2+A7+W4+W3 in one Arrow pass over the fanned-out (turn, relation) rows.

    Consumes the *spliced* sequence built by column ops upstream, so any
    splice defect changes every mock tag (poly_hash of the full sequence)
    and breaks parity — deliberate test power. `weights_bc` /
    `tokenizer_bc` as in `_tokenize_and_score_fn` (the decode stage
    re-tokenizes to rebuild span surface words, so it needs the SAME
    tokenizer the scoring stage used).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = weights_bc.value if weights_bc is not None else None
        tok = tokenizer_bc.value if tokenizer_bc is not None else None
        yield from _ner_decode_batches(batches, weights, tok)

    return gen


_TAG_O = NER_LABELS.index("O")
_TAG_BSUB = NER_LABELS.index("B-SUB")
_TAG_BOBJ = NER_LABELS.index("B-OBJ")


def _decode_spans_batch(tags_mat: np.ndarray, lengths: np.ndarray):
    """Vectorized W3 decode over a whole batch of tag rows.

    Equivalent reformulation of the reference scan (model.py:395-421,
    mirrored per-row in oracle.bio_decode_spans; property-tested against
    it): split each row's first `length` tags into maximal O-free segments
    (the O delimiters close spans); within a segment only the FIRST
    B-SUB/B-OBJ opens, the span runs to the closing O, and a segment that
    reaches the slice end without an O is dropped.

    Returns (rows, starts, ends, types) flat arrays in scan order.
    """
    n, length = tags_mat.shape
    if n == 0 or length == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z, z
    pos = np.arange(length, dtype=np.int64)[None, :]
    valid = pos < lengths[:, None]
    is_o = (tags_mat == _TAG_O) & valid
    seg = np.cumsum(is_o, axis=1) - is_o  # O-count strictly before each pos
    # the O at position p closes segment seg[p]; unique per (row, segment)
    close = np.full((n, length + 1), -1, dtype=np.int64)
    oi, op = np.nonzero(is_o)
    close[oi, seg[oi, op]] = op
    # first B-* per (row, segment)
    is_b = ((tags_mat == _TAG_BSUB) | (tags_mat == _TAG_BOBJ)) & valid
    first = np.full((n, length + 1), length + 1, dtype=np.int64)
    bi, bp = np.nonzero(is_b)
    np.minimum.at(first, (bi, seg[bi, bp]), bp)
    rows, segs = np.nonzero((first <= length) & (close >= 0))
    starts = first[rows, segs]
    ends = close[rows, segs]
    return rows, starts, ends, tags_mat[rows, starts]


def _ner_decode_batches(
    batches: Iterator[pd.DataFrame], weights, tok=None
) -> Iterator[pd.DataFrame]:
    _seq_fwd, ner_fwd = _forwards(weights)
    for pdf in batches:
        spliced_arr = pdf["spliced"].to_numpy()
        text_arr = pdf["text"].to_numpy()
        rel_arr = pdf["rel_id"].to_numpy()
        # rebuild the kept words exactly as the scoring-stage encode did
        # (same tokenizer, same truncation bound) — cheaper than shipping
        # array<string> through the fan-out
        word_bound = max(0, (MAX_SEQ_LENGTH - 2) - 2)
        words_cache: dict[int, list[str]] = {}
        n = len(pdf)
        max_l = max((len(s) for s in spliced_arr), default=0)
        padded = np.zeros((n, max_l), dtype=np.uint64)
        lengths = np.zeros(n, dtype=np.int64)
        for i in range(n):
            row = spliced_arr[i]
            padded[i, : len(row)] = row
            # W4 slice bound: keep positions 0..rel_pos-2 (rel_pos = true
            # token count before the [relK][SEP] splice = len - 2)
            lengths[i] = max(len(row) - 3, 0)
        # U2+A7 batched across the Arrow batch (one matrix forward); padding
        # tags are garbage but _decode_spans_batch masks beyond each row's
        # W4 bound.
        tags_mat = ner_fwd(padded, rel_arr)
        rows, starts, ends, types = _decode_spans_batch(tags_mat, lengths)
        subj_col = [[] for _ in range(n)]
        obj_col = [[] for _ in range(n)]
        for r, s, e, t in zip(rows, starts, ends, types):
            words = words_cache.get(r)
            if words is None:
                if tok is not None:
                    words = tok.encode(text_arr[r], MAX_SEQ_LENGTH - 2)[1]
                else:
                    words = tokenize_words(text_arr[r])[:word_bound]
                words_cache[r] = words
            (subj_col if t == _TAG_BSUB else obj_col)[r].append(span_text((s, e), words))
        yield pd.DataFrame(
            {
                "conv_id": pdf["conv_id"].to_numpy(),
                "turn_idx": pdf["turn_idx"].to_numpy(),
                "rel_id": rel_arr,
                "subjects": subj_col,
                "objects": obj_col,
            }
        )


_TRIPLE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("subj", T.StringType()),
        T.StructField("rel_id", T.IntegerType()),
        T.StructField("pred", T.StringType()),
        T.StructField("obj", T.StringType()),
    ]
)


def _fused_extract_fn(weights_bc=None, tokenizer_bc=None):
    """The ENTIRE two-stage interaction pipeline in ONE Arrow pass:
    tokenize -> SEQ forward -> threshold/fallback select (P5/P6) ->
    fan-out (J1) -> splice (U4) -> NER forward -> slice/decode (W4/W3) ->
    cartesian assemble (J3), emitting final triple rows.

    Why fuse (vs the staged plan kept in `extract_triples_staged`):
    - one Python runner per task instead of two chained ones — local[K]
      stops driving ~2K Python workers (the oversubscription documented in
      scripts/scaling.py), and a real cluster halves its Python-worker
      memory footprint;
    - one Arrow round-trip instead of two — the staged path re-serializes
      ids+text+probs out and spliced+text back in across the JVM boundary
      for every fanned-out row;
    - stage 2 reuses stage 1's in-memory ids/words — the staged decode
      must RE-TOKENIZE every fanned-out row's text to rebuild span words.

    Semantics are pinned bit-identical to the staged plan by
    tests/test_parity.py (fused == staged == numpy oracle on the same
    corpus) and by the driver's extract_diff_vs_golden row. The staged
    stages remain the oracle-checked relational decomposition (P5/P6/J1/U4
    each have standalone DuckDB-checked contract queries over the driver
    tables, independent of this fusion).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = weights_bc.value if weights_bc is not None else None
        seq_fwd, ner_fwd = _forwards(weights)
        enc = tokenizer_bc.value.encode if tokenizer_bc is not None else encode
        max_len = MAX_SEQ_LENGTH - 2
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame(
                    {
                        "conv_id": pd.Series(dtype=object),
                        "turn_idx": pd.array([], dtype="int32"),
                        "subj": pd.Series(dtype=object),
                        "rel_id": pd.array([], dtype="int32"),
                        "pred": pd.Series(dtype=object),
                        "obj": pd.Series(dtype=object),
                    }
                )
                continue
            texts = pdf["text"].to_numpy()
            conv_arr = pdf["conv_id"].to_numpy()
            turn_arr = pdf["turn_idx"].to_numpy()
            # P1/P2/U1: tokenize once, score the whole batch
            ids_col: list[list[int]] = []
            words_col: list[list[str]] = []
            max_l = 0
            for text in texts:
                ids, words = enc(text, max_len)
                ids_col.append(ids)
                words_col.append(words)
                if len(ids) > max_l:
                    max_l = len(ids)
            padded = np.zeros((n, max_l), dtype=np.uint64)
            for i, ids in enumerate(ids_col):
                padded[i, : len(ids)] = ids
            probs = seq_fwd(padded)
            # P5 strict threshold + P6 FIRST-argmax fallback (model.py:227-233)
            selected = probs > SIGMOID_THRESHOLD
            none_sel = ~selected.any(axis=1)
            if none_sel.any():
                selected[none_sel, np.argmax(probs[none_sel], axis=1)] = True
            # J1 fan-out in ascending rel order (np.nonzero is row-major)
            rows, rels = np.nonzero(selected)
            m = len(rows)
            # U4 splice: ids + [relationK, SEP]; W4 bound = len(ids) - 1
            sp_max = max_l + 2
            sp = np.zeros((m, sp_max), dtype=np.uint64)
            lengths = np.zeros(m, dtype=np.int64)
            for j in range(m):
                ids = ids_col[rows[j]]
                li = len(ids)
                sp[j, :li] = ids
                sp[j, li] = REL_TOKEN_BASE + rels[j]
                sp[j, li + 1] = SEP_ID
                lengths[j] = li - 1
            # U2/A7 + W3 over the fan-out
            tags_mat = ner_fwd(sp, rels)
            frow, starts, ends, types = _decode_spans_batch(tags_mat, lengths)
            subj_spans: list[list[str]] = [[] for _ in range(m)]
            obj_spans: list[list[str]] = [[] for _ in range(m)]
            for r, s, e, t in zip(frow, starts, ends, types):
                words = words_col[rows[r]]
                (subj_spans if t == _TAG_BSUB else obj_spans)[r].append(
                    span_text((s, e), words)
                )
            # J3 cartesian per fan-out row, only when both sides non-empty
            out_conv: list = []
            out_turn: list = []
            out_subj: list = []
            out_rel: list = []
            out_pred: list = []
            out_obj: list = []
            for j in range(m):
                subs, objs = subj_spans[j], obj_spans[j]
                if not subs or not objs:
                    continue
                i = rows[j]
                k = int(rels[j])
                pred = PREDICATES[k]
                for s_txt in subs:
                    for o_txt in objs:
                        out_conv.append(conv_arr[i])
                        out_turn.append(turn_arr[i])
                        out_subj.append(s_txt)
                        out_rel.append(k)
                        out_pred.append(pred)
                        out_obj.append(o_txt)
            yield pd.DataFrame(
                {
                    "conv_id": out_conv,
                    "turn_idx": pd.array(out_turn, dtype="int32"),
                    "subj": out_subj,
                    "rel_id": pd.array(out_rel, dtype="int32"),
                    "pred": out_pred,
                    "obj": out_obj,
                }
            )

    return gen


def score_relations(
    transcripts: DataFrame, weights_bc=None, tokenizer_bc=None
) -> DataFrame:
    """transcripts(conv_id, turn_idx, text, ...) -> + ids, words, probs."""
    cols = [c for c in ("conv_id", "turn_idx", "text") if c in transcripts.columns]
    return transcripts.select(*cols).mapInPandas(
        _tokenize_and_score_fn(weights_bc, tokenizer_bc), schema=_SCORED_SCHEMA
    )


def select_relations(scored: DataFrame) -> DataFrame:
    """P5 threshold + P6 first-argmax fallback + J1 fan-out, shuffle-free.

    Reference: model.py:227-264. `array_position(probs, array_max(probs))`
    returns the FIRST maximal index, matching torch.max tie-breaking.
    """
    pairs = (
        f"filter(transform(probs, (p, i) -> named_struct('rel_id', i, 'prob', p)),"
        f" x -> x.prob > {SIGMOID_THRESHOLD})"
    )
    fallback = (
        "array(named_struct('rel_id', int(array_position(probs, array_max(probs)) - 1),"
        " 'prob', array_max(probs)))"
    )
    return (
        scored.withColumn("cand", F.expr(pairs))
        .withColumn("sel", F.expr(f"CASE WHEN size(cand) > 0 THEN cand ELSE {fallback} END"))
        .select("conv_id", "turn_idx", "ids", "text", F.explode("sel").alias("s"))
        .select(
            "conv_id",
            "turn_idx",
            "ids",
            "text",
            F.col("s.rel_id").alias("rel_id"),
            F.col("s.prob").alias("prob"),
        )
    )


def splice_marker(fanout: DataFrame) -> DataFrame:
    """U4: append [relationK], [SEP] after the sentence (model.py:276-304).

    With ragged (unpadded) sequences the reference's one-hot position
    scatter at rel_pos/rel_pos+1 reduces to a concat — pure column ops.
    """
    return fanout.withColumn(
        "spliced",
        F.expr(f"concat(ids, array({REL_TOKEN_BASE} + rel_id, {SEP_ID}))"),
    )


def decode_spans(spliced: DataFrame, weights_bc=None, tokenizer_bc=None) -> DataFrame:
    """U2+A7+W4+W3: spliced ids -> subject/object surface strings."""
    return spliced.select("conv_id", "turn_idx", "rel_id", "text", "spliced").mapInPandas(
        _ner_decode_fn(weights_bc, tokenizer_bc), schema=_DECODED_SCHEMA
    )


def assemble_triples(decoded: DataFrame) -> DataFrame:
    """J3: subject x object cartesian per (turn, relation) (model.py:358-387).

    Emits only when both sides are non-empty, like the reference's
    `if h and t`. Duplicates preserved (dedup is a downstream stage).
    """
    pred_map = F.create_map(
        *[x for i, p in enumerate(PREDICATES) for x in (F.lit(i), F.lit(p))]
    )
    return (
        decoded.where((F.size("subjects") > 0) & (F.size("objects") > 0))
        .select("conv_id", "turn_idx", "rel_id", F.explode("subjects").alias("subj"), "objects")
        .select("conv_id", "turn_idx", "rel_id", "subj", F.explode("objects").alias("obj"))
        .select(
            "conv_id",
            "turn_idx",
            "subj",
            "rel_id",
            pred_map[F.col("rel_id")].alias("pred"),
            "obj",
        )
    )


def extract_triples(
    transcripts: DataFrame, weights_bc=None, tokenizer_bc=None, fused: bool = True
) -> DataFrame:
    """Full pipeline: transcripts -> raw triple stream (with duplicates).

    Narrow end-to-end and zero-shuffle either way; parallelism = input
    partitions. ``fused=True`` (default, the production path) runs the
    whole chain in ONE mapInPandas pass (see `_fused_extract_fn` for why:
    one Python runner per task, one Arrow round-trip, tokenization reused
    across stages); ``fused=False`` composes the staged relational plan
    (scan -> mapInPandas -> project/explode -> mapInPandas -> explode x2)
    whose intermediate stages are individually oracle-checked. The two
    paths are pinned bit-identical by tests/test_parity.py.

    `weights_bc`: optional ``sc.broadcast(MockWeights)`` — the broadcast
    model-weights seam (None uses the built-in defaults, identical output).
    `tokenizer_bc`: optional ``sc.broadcast(tokenizer)`` where the object
    exposes ``encode(text, max_length) -> (ids, words)`` — the tokenizer
    seam (None uses the built-in word-level tokenizer; a real deployment
    broadcasts its subword vocab here, reference data_module.py:25-35).
    Both stages consume the SAME broadcast, so scoring-time truncation and
    decode-time span rendering can never disagree.
    """
    if fused:
        cols = [c for c in ("conv_id", "turn_idx", "text") if c in transcripts.columns]
        return transcripts.select(*cols).mapInPandas(
            _fused_extract_fn(weights_bc, tokenizer_bc), schema=_TRIPLE_SCHEMA
        )
    return assemble_triples(
        decode_spans(
            splice_marker(
                select_relations(
                    score_relations(transcripts, weights_bc, tokenizer_bc)
                )
            ),
            weights_bc,
            tokenizer_bc,
        )
    )


def inference_text(spark, text: str) -> list[dict]:
    """U5: the reference's single-sentence text API
    (lit_models/transformer.py:217-226, demo main.py:132-134) — run the
    full pipeline on a 1-row DataFrame and return
    ``[{"subject": ..., "predict": ..., "object": ...}, ...]`` dicts with
    the reference's key names. Driver convenience only — batch jobs go
    through `extract_triples`.
    """
    df = spark.createDataFrame(
        [("inference", 0, text)], "conv_id string, turn_idx int, text string"
    )
    return [
        {"subject": r.subj, "predict": r.pred, "object": r.obj}
        for r in extract_triples(df).collect()
    ]


def triple_table(raw_triples: DataFrame) -> DataFrame:
    """Deduplicated (subj, pred, obj) triple table with support counts.

    The groupBy is the pipeline's first shuffle; at 10^12-turn scale hot
    predicates skew it — materialize.write_triple_table handles salting/AQE.
    """
    return raw_triples.groupBy("subj", "pred", "obj").agg(
        F.count(F.lit(1)).alias("support"),
        F.countDistinct("conv_id").alias("n_convs"),
    )
