"""Randomized cross-check: the three feature builders vs direct Python
transcriptions of the reference loops (utils.py:335-379, 387-546, 550-613).

The DuckDB oracles check the synthesized driver gold shapes; this fuzz
covers arbitrary gold: multi-subject groups, overlapping spans, duplicate
predicates, unlocatable entities, empty golds, entities at every boundary.
Word-level transcription mirrors the engine's documented decisions
(regex tokens, word-space matching, crc32 ids).
"""

import re

import numpy as np
import pytest

from openue_spark.config import MAX_SEQ_LENGTH

TOKEN_RE = re.compile(r"[a-z0-9_]+|[^a-z0-9_\s]")
MAX_WORDS = MAX_SEQ_LENGTH - 4

CORPUS_SCHEMA = (
    "text_id long, text string,"
    " gold array<struct<subject string, predicate string, object string>>"
)


def _toks(s):
    return TOKEN_RE.findall(s.lower())


def _ner_find(needle, hay):
    L = len(needle)
    for i in range(len(hay)):
        if i + L >= len(hay):
            return None
        if hay[i : i + L] == needle:
            return i
    return None


def _interactive_find(needle, hay):
    L = len(needle)
    for i in range(len(hay)):
        if i + L <= len(hay) and hay[i : i + L] == needle:
            return i
    return None


def _py_ner_features(text_id, text, gold):
    """Transcription of convert_examples_to_ner_features label flow."""
    out = {}
    if not gold:
        return out
    toks = _toks(text)[:MAX_WORDS]
    by_rel = {}
    for s, p, o in gold:
        by_rel.setdefault(p, []).append((s, o))
    for pred, pairs in by_rel.items():
        hay = ["[CLS]"] + toks + ["[SEP]", f"[{pred}]", "[SEP]"]
        labels = ["O"] * len(hay)
        bad = False
        for s, _ in pairs:
            sid = _toks(s)
            st = _ner_find(sid, hay)
            if st is None:
                bad = True
                break
            labels[st : st + len(sid)] = ["I-SUB"] * len(sid)
            labels[st] = "B-SUB"
        if bad:
            continue
        for _, o in pairs:
            oid = _toks(o)
            st = _ner_find(oid, hay)
            if st is None:
                bad = True
                break
            labels[st : st + len(oid)] = ["I-OBJ"] * len(oid)
            labels[st] = "B-OBJ"
        if bad:
            continue
        labels[0] = "CLS"
        labels[-1] = "SEP"
        labels[-2] = "Relation"
        labels[-3] = "SEP"
        out[(text_id, pred)] = labels
    return out


def _py_seq_features(text_id, text, gold, preds):
    if not gold:
        return None
    toks = _toks(text)[: MAX_SEQ_LENGTH - 2]
    label = [1 if any(g[1] == p for g in gold) else 0 for p in preds]
    return (len(toks) + 2, label)


def _py_interactive(text_id, text, gold, preds):
    toks = _toks(text)[:MAX_WORDS]
    hay = ["[CLS]"] + toks + ["[SEP]"]
    rel2id = {p: i for i, p in enumerate(preds)}
    rows = []
    for s, p, o in gold:
        sid, oid = _toks(s), _toks(o)
        hs = _interactive_find(sid, hay)
        ts = _interactive_find(oid, hay)
        rows.append((
            hs, None if hs is None else hs + len(sid),
            ts, None if ts is None else ts + len(oid),
            rel2id.get(p),
        ))
    return rows


def _random_corpus(n=250, seed=1234):
    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(12)] + [".", ",", "x1", "longtoken99"]
    preds = ["works_at", "born_in", "located_in"]
    rows = []
    for i in range(n):
        nt = rng.randint(1, 14)
        toks = [vocab[j] for j in rng.randint(0, len(vocab), size=nt)]
        text = " ".join(toks)
        gold = []
        for _ in range(rng.randint(0, 5)):
            def ent():
                if rng.rand() < 0.6 and nt > 0:  # span from the text
                    s = rng.randint(0, nt)
                    return " ".join(toks[s : s + rng.randint(1, 4)])
                if rng.rand() < 0.5:
                    return vocab[rng.randint(0, len(vocab))]
                return "absent" + str(rng.randint(0, 3))  # often unlocatable
            gold.append((ent(), preds[rng.randint(0, len(preds))], ent()))
        rows.append((i, text, gold))
    return rows, preds


@pytest.fixture(scope="module")
def fuzz_corpus():
    return _random_corpus()


def test_fuzz_ner_builder_matches_transcription(spark, fuzz_corpus):
    from openue_spark.pipeline.features import build_gold_ner_features

    rows, _ = fuzz_corpus
    df = spark.createDataFrame(rows, CORPUS_SCHEMA)
    got = {
        (r.text_id, r.pred): list(r.labels)
        for r in build_gold_ner_features(df).collect()
    }
    want = {}
    for tid, text, gold in rows:
        want.update(_py_ner_features(tid, text, gold))
    assert got == want
    assert len(want) > 100  # the fuzz really produced surviving groups


def test_fuzz_seq_builder_matches_transcription(spark, fuzz_corpus):
    from openue_spark.pipeline.features import build_seq_features

    rows, preds = fuzz_corpus
    df = spark.createDataFrame(rows, CORPUS_SCHEMA)
    got = {
        r.text_id: (len(r.input_ids), list(r.label_ids))
        for r in build_seq_features(df, predicates=preds).collect()
    }
    want = {}
    for tid, text, gold in rows:
        w = _py_seq_features(tid, text, gold, preds)
        if w is not None:
            want[tid] = w
    assert got == want and len(want) > 100


def test_fuzz_interactive_builder_matches_transcription(spark, fuzz_corpus):
    from openue_spark.pipeline.features import build_interactive_features

    rows, preds = fuzz_corpus
    df = spark.createDataFrame(rows, CORPUS_SCHEMA)
    got = {
        r.text_id: [tuple(t) for t in r.triples]
        for r in build_interactive_features(df, predicates=preds).collect()
    }
    n_tuples = 0
    for tid, text, gold in rows:
        want = _py_interactive(tid, text, gold, preds)
        assert got[tid] == want, (tid, text, gold, got[tid], want)
        n_tuples += len(want)
    assert n_tuples > 200
