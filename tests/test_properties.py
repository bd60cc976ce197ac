"""Hypothesis property tests over the pure kernels (no Spark session).

These guard the fidelity-critical quirks (SURVEY.md §1.4, §2.5) across the
whole input space, not just the golden cases:

- W3 decode: close-on-O-only; I-* without B-* never opens; spans still open
  at slice end are dropped.
- P2 tokenize: truncation bound includes specials; CLS/SEP framing.
- Batched mock forwards are bit-identical to per-row for arbitrary shapes.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from openue_spark.config import MAX_SEQ_LENGTH, NER_LABELS
from openue_spark.hashing import poly_hash, poly_hash_batch
from openue_spark.mock_models import ner_tags, ner_tags_batch, seq_probs, seq_probs_batch
from openue_spark.oracle import bio_decode_spans
from openue_spark.tokenizer import encode

tags_strategy = st.lists(st.sampled_from(NER_LABELS), max_size=40)


@given(tags_strategy)
def test_bio_decode_reference_quirks(tags):
    subjects, objects = bio_decode_spans(tags)
    for kind, spans in (("B-SUB", subjects), ("B-OBJ", objects)):
        for s, e in spans:
            assert tags[s] == kind  # every span opens at its B tag
            assert e <= len(tags) and tags[e - 1] != "O"
            # the span closed ON an O (close-on-O-only quirk)
            assert e < len(tags) and tags[e] == "O"
    # spans never overlap and appear in order within each list
    for spans in (subjects, objects):
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 <= s2


@given(tags_strategy)
def test_bio_decode_open_span_at_end_is_dropped(tags):
    # append a B with no closing O: must add nothing new
    base_s, base_o = bio_decode_spans(tags + ["O"])
    more_s, more_o = bio_decode_spans(tags + ["O", "B-SUB", "I-SUB"])
    assert base_s == more_s and base_o == more_o


@given(st.text(max_size=3000), st.integers(min_value=3, max_value=MAX_SEQ_LENGTH))
def test_encode_truncation_and_framing(text, max_length):
    ids, words = encode(text, max_length)
    assert len(ids) == len(words) + 2 <= max_length
    from openue_spark.config import CLS_ID, SEP_ID

    assert ids[0] == CLS_ID and ids[-1] == SEP_ID


@settings(deadline=None, max_examples=25)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**31 - 1), max_size=80),
        min_size=1,
        max_size=20,
    ),
    st.integers(min_value=0, max_value=23),
)
def test_batched_forwards_match_per_row(rows_ids, rel):
    rows = [np.asarray(r, dtype=np.uint64) for r in rows_ids]
    max_l = max((r.size for r in rows), default=0)
    padded = np.zeros((len(rows), max_l), dtype=np.uint64)
    for i, r in enumerate(rows):
        padded[i, : r.size] = r

    hb = poly_hash_batch(padded)
    pb = seq_probs_batch(hb)
    rels = np.full(len(rows), rel)
    tb = ner_tags_batch(padded, rels) if max_l else None
    for i, r in enumerate(rows):
        assert hb[i] == poly_hash(r)
        assert np.array_equal(pb[i], seq_probs(r))
        if r.size:
            assert np.array_equal(tb[i, : r.size], ner_tags(r, rel))


@settings(deadline=None, max_examples=60)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=7), max_size=30),
        min_size=1,
        max_size=12,
    )
)
def test_vectorized_span_decode_matches_reference_scan(tag_rows):
    """pipeline._decode_spans_batch must agree with oracle.bio_decode_spans
    on arbitrary tag matrices (the W3 quirks are load-bearing)."""
    from openue_spark.pipeline.extract import _TAG_BSUB, _decode_spans_batch

    lengths = np.array([len(r) for r in tag_rows], dtype=np.int64)
    max_l = max((len(r) for r in tag_rows), default=0)
    mat = np.zeros((len(tag_rows), max_l), dtype=np.int64)
    for i, r in enumerate(tag_rows):
        mat[i, : len(r)] = r

    rows, starts, ends, types = _decode_spans_batch(mat, lengths)
    got_s = [[] for _ in tag_rows]
    got_o = [[] for _ in tag_rows]
    for r, s, e, t in zip(rows, starts, ends, types):
        (got_s if t == _TAG_BSUB else got_o)[r].append((int(s), int(e)))

    for i, r in enumerate(tag_rows):
        want_s, want_o = bio_decode_spans([NER_LABELS[t] for t in r])
        assert got_s[i] == want_s and got_o[i] == want_o
