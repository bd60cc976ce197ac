"""Deterministic mock model forwards (stand-ins for the BERT forwards).

The reference's two model forwards are:
- U1 `BertForRelationClassification.forward`: sentence -> sigmoid prob per
  relation (reference models/model.py:10-57)
- U2 `BertForNER.forward` + argmax decode: spliced sequence -> one of 8 BIO
  tags per token (reference models/model.py:64-128, argmax :319-321)

Real BERT weights cannot be downloaded in this sandbox, and the parity target
(BASELINE.md) is *dataflow fidelity*: the single-process reference oracle and
the Spark pipeline share these exact deterministic scorers, so any P/R < 1.0
indicates a pipeline-semantics bug, not a model difference.

Both scorers are pure functions of (token ids, relation id) via splitmix64
hashing — no state, no randomness, identical on driver/executors.

Distribution tuning (so the pipeline exercises every path):
- SEQ: P(prob > 0.5) = 4% per relation -> with 24 relations ~1 relation
  selected per sentence on average and ~37% of sentences selecting none,
  which exercises the argmax fallback (model.py:230-233) heavily.
- NER: tag distribution O:72%, B-SUB:7%, I-SUB:5%, B-OBJ:7%, I-OBJ:5%,
  Relation:2%, CLS:1%, SEP:1% -> a few subject/object spans per
  (sentence, relation), exercising the close-on-O-only decode, spans open at
  slice end, and I-without-B quirks (model.py:395-421).
"""

from __future__ import annotations

import numpy as np

from .config import NUM_RELATIONS
from .hashing import mix64, poly_hash

_U64 = np.uint64
_K_REL = _U64(0x9E3779B97F4A7C15)
_K_TOK = _U64(0xC2B2AE3D27D4EB4F)
_K_POS = _U64(0x165667B19E3779F9)
_K_CTX = _U64(0x27D4EB2F165667C5)

# SEQ selection: prob > 0.5  <=>  z > _SEQ_CUT, z uniform in [0,1).
_SEQ_CUT = 0.96
_SEQ_SCALE = 8.0

# NER tag thresholds over u ~ Uniform{0..999}:
# tag ids follow config.NER_LABELS order: O,B-SUB,I-SUB,B-OBJ,I-OBJ,Relation,CLS,SEP
_NER_CUTS = np.array([720, 790, 840, 910, 960, 980, 990, 1000], dtype=np.int64)


class MockWeights:
    """The deterministic scorer's parameter bundle — the stand-in for real
    model weights, shipped to executors via ``sc.broadcast`` exactly the way
    a real BERT state_dict would be (north rule: broadcast model weights).

    Plain ndarray/scalars so pickling is cheap; `default()` reproduces the
    module constants, keeping every existing result bit-identical.
    """

    def __init__(self, seq_cut: float, seq_scale: float, ner_cuts: np.ndarray):
        self.seq_cut = float(seq_cut)
        self.seq_scale = float(seq_scale)
        self.ner_cuts = np.asarray(ner_cuts, dtype=np.int64)

    @staticmethod
    def default() -> "MockWeights":
        return MockWeights(_SEQ_CUT, _SEQ_SCALE, _NER_CUTS)


def seq_probs(input_ids: np.ndarray, num_relations: int = NUM_RELATIONS) -> np.ndarray:
    """Mock U1: sentence token ids -> per-relation sigmoid probability.

    Deterministic: z_k = uniform hash of (poly_hash(ids), k); prob passes the
    0.5 threshold iff z_k > 0.96.
    """
    h = poly_hash(input_ids)
    ks = np.arange(num_relations, dtype=np.uint64)
    z = (mix64(h ^ (ks * _K_REL + _U64(0x51))) >> _U64(40)).astype(np.float64)
    z /= float(1 << 24)
    logits = (z - _SEQ_CUT) * _SEQ_SCALE
    return 1.0 / (1.0 + np.exp(-logits))


def seq_probs_batch(
    hashes: np.ndarray,
    num_relations: int = NUM_RELATIONS,
    weights: MockWeights | None = None,
) -> np.ndarray:
    """Vectorized U1 over a whole Arrow batch: per-row sequence hashes
    (poly_hash / poly_hash_batch output) -> (n, num_relations) probability
    matrix. Bit-identical to stacking `seq_probs` row by row — the per-row
    formula is reproduced with a broadcast instead of a loop (the per-row
    numpy-call overhead was ~30us/turn, the hot half of the SEQ stage).
    """
    w = weights or MockWeights.default()
    h = np.asarray(hashes, dtype=np.uint64)
    ks = np.arange(num_relations, dtype=np.uint64)
    z = (mix64(h[:, None] ^ (ks[None, :] * _K_REL + _U64(0x51))) >> _U64(40)).astype(
        np.float64
    )
    z /= float(1 << 24)
    return 1.0 / (1.0 + np.exp(-(z - w.seq_cut) * w.seq_scale))


def ner_tags_batch(
    padded_ids: np.ndarray,
    rel_ids: np.ndarray,
    weights: MockWeights | None = None,
) -> np.ndarray:
    """Vectorized U2 + argmax over a zero-padded (n, L) id matrix.

    Rows beyond their true length get garbage tags — callers slice each row
    to its W4 bound before decoding, exactly as the per-row path does.
    Bit-identical to `ner_tags` on the unpadded rows (same integer ops; the
    per-row sequence hash uses poly_hash_batch, exact under zero padding).
    """
    from .hashing import poly_hash_batch

    w = weights or MockWeights.default()
    mat = np.asarray(padded_ids, dtype=np.uint64)
    n, length = mat.shape
    h = poly_hash_batch(mat)
    pos = np.arange(length, dtype=np.uint64)[None, :]
    rel = np.asarray(rel_ids, dtype=np.uint64)[:, None]
    u = mix64(mat * _K_TOK ^ (pos * _K_POS) ^ (rel * _K_REL) ^ (h[:, None] * _K_CTX))
    u = (u >> _U64(40)).astype(np.int64) % 1000
    return np.searchsorted(w.ner_cuts, u, side="right").astype(np.int64)


def ner_tags(spliced_ids: np.ndarray, rel_id: int) -> np.ndarray:
    """Mock U2 + argmax (model.py:319-321): spliced ids -> tag id per token.

    Depends on the *whole spliced sequence* (poly_hash) so that any error in
    the marker splice (U4) changes every tag and breaks parity — this gives
    the splice real test power. Per-position tag is a hash of
    (token_id, position, rel_id, sequence hash) bucketed by _NER_CUTS.
    """
    ids = np.asarray(spliced_ids, dtype=np.uint64)
    h = poly_hash(ids)
    pos = np.arange(ids.size, dtype=np.uint64)
    u = mix64(ids * _K_TOK ^ (pos * _K_POS) ^ (_U64(rel_id) * _K_REL) ^ (h * _K_CTX))
    u = (u >> _U64(40)).astype(np.int64) % 1000
    return np.searchsorted(_NER_CUTS, u, side="right").astype(np.int64)


def mention_embedding(text: str, dim: int = 32) -> np.ndarray:
    """Mock pooled [CLS] embedding for a mention string (U1 cls_output,
    model.py:48): an L2-normalized character-trigram hashing vector, so that
    near-duplicate surface forms genuinely have high cosine similarity —
    used by the entity-linking rerank stage (SURVEY.md §2.10).
    """
    s = " " + text.lower() + " "
    vec = np.zeros(dim, dtype=np.float64)
    for i in range(len(s) - 2):
        g = s[i : i + 3]
        hv = int(mix64(np.uint64(sum((j + 1) * ord(c) for j, c in enumerate(g)))))
        vec[hv % dim] += 1.0 if (hv >> 8) % 2 == 0 else -1.0
    n = np.linalg.norm(vec)
    return vec / n if n > 0 else vec
