"""P4 gold-feature builder: BIO alignment, locate variants, drops.

Golden cases pin the reference semantics of
convert_examples_to_ner_features (reference utils.py:387-546), including
the NER-variant find_word_in_texts off-by-one (utils.py:414-419).
"""

import pytest
from pyspark.sql import functions as F

CORPUS_SCHEMA = (
    "text_id long, text string,"
    " gold array<struct<subject string, predicate string, object string>>"
)


def _build(spark, rows):
    from openue_spark.pipeline.features import build_gold_ner_features

    df = spark.createDataFrame(rows, CORPUS_SCHEMA)
    return {
        (r.text_id, r.pred): r for r in build_gold_ner_features(df).collect()
    }


def test_locate_variants_flush_with_end(spark):
    """NER variant breaks at i+len >= len(hay) (utils.py:417) so a match
    flush with the haystack end is missed; the interactive variant
    (utils.py:564-569) finds it."""
    from openue_spark.pipeline.features import locate_expr

    t = spark.createDataFrame(
        [(["a", "b", "c"], ["b", "c"]), (["a", "b", "c"], ["a", "b"]),
         (["a", "b", "c"], ["z"])],
        "hay array<string>, ndl array<string>",
    )
    got = t.select(
        F.expr(locate_expr("hay", "ndl", "ner")).alias("ner"),
        F.expr(locate_expr("hay", "ndl", "interactive")).alias("inter"),
    ).collect()
    assert (got[0].ner, got[0].inter) == (None, 2)  # flush with end
    assert (got[1].ner, got[1].inter) == (1, 1)
    assert (got[2].ner, got[2].inter) == (None, None)


def test_golden_bio_alignment(spark):
    rows = [(0, "alpha beta gamma delta", [("beta", "works_at", "gamma delta")])]
    out = _build(spark, rows)
    r = out[(0, "works_at")]
    # hay = [CLS] alpha beta gamma delta [SEP] [works_at] [SEP]
    assert r.hay == ["[CLS]", "alpha", "beta", "gamma", "delta", "[SEP]", "[works_at]", "[SEP]"]
    assert r.labels == ["CLS", "O", "B-SUB", "B-OBJ", "I-OBJ", "SEP", "Relation", "SEP"]


def test_entity_at_text_end_is_still_located(spark):
    """The off-by-one is latent inside the builder: the appended
    [SEP] marker [SEP] tail keeps a text-final entity off the haystack end
    (reference extends input_ids BEFORE labeling, utils.py:469-473)."""
    rows = [(0, "alpha beta gamma", [("alpha", "works_at", "beta gamma")])]
    r = _build(spark, rows)[(0, "works_at")]
    assert r.labels == ["CLS", "B-SUB", "B-OBJ", "I-OBJ", "SEP", "Relation", "SEP"]


def test_object_overwrites_subject_on_overlap(spark):
    """Subjects are labeled first, objects second — an overlapping object
    span overwrites subject labels (utils.py:484-508)."""
    rows = [(0, "alpha beta gamma delta", [("beta gamma", "works_at", "gamma delta")])]
    r = _build(spark, rows)[(0, "works_at")]
    assert r.labels == ["CLS", "O", "B-SUB", "B-OBJ", "I-OBJ", "SEP", "Relation", "SEP"]


def test_later_subject_overwrites_earlier(spark):
    """Two subjects for the same relation, overlapping: the later write
    wins position-by-position (list order = gold order)."""
    rows = [(0, "alpha beta gamma delta", [
        ("alpha beta gamma", "works_at", "delta"),
        ("beta", "works_at", "delta"),
    ])]
    r = _build(spark, rows)[(0, "works_at")]
    # S1 labels alpha..gamma B,I,I; S2 then stamps B-SUB at beta
    assert r.labels == ["CLS", "B-SUB", "B-SUB", "I-SUB", "B-OBJ", "SEP", "Relation", "SEP"]


def test_unlocatable_group_dropped_and_others_kept(spark):
    rows = [(0, "alpha beta gamma delta", [
        ("beta", "works_at", "delta"),
        ("zzz", "born_in", "alpha"),  # unlocatable subject -> drop group
    ])]
    out = _build(spark, rows)
    assert (0, "works_at") in out
    assert (0, "born_in") not in out


def test_empty_gold_sentence_contributes_nothing(spark):
    rows = [(0, "alpha beta", []), (1, "alpha beta", [("alpha", "works_at", "beta")])]
    out = _build(spark, rows)
    assert set(out) == {(1, "works_at")}


def test_input_ids_match_tokenizer(spark):
    """JVM crc32 word ids must equal tokenizer.word_id; specials and the
    relation marker follow config."""
    from openue_spark.config import CLS_ID, REL2ID, REL_TOKEN_BASE, SEP_ID
    from openue_spark.tokenizer import word_id

    rows = [(0, "alpha beta gamma", [("alpha", "works_at", "gamma")])]
    r = _build(spark, rows)[(0, "works_at")]
    expect = (
        [CLS_ID]
        + [word_id(w) for w in ["alpha", "beta", "gamma"]]
        + [SEP_ID, REL_TOKEN_BASE + REL2ID["works_at"], SEP_ID]
    )
    assert r.input_ids == expect
    from openue_spark.config import NER_LABEL_TO_ID

    assert r.label_ids == [NER_LABEL_TO_ID[label] for label in r.labels]


def test_multi_relation_fanout(spark):
    rows = [(0, "alpha beta gamma delta", [
        ("beta", "works_at", "delta"),
        ("alpha", "born_in", "gamma"),
    ])]
    out = _build(spark, rows)
    assert set(out) == {(0, "works_at"), (0, "born_in")}
    assert out[(0, "works_at")].hay[-2] == "[works_at]"
    assert out[(0, "born_in")].hay[-2] == "[born_in]"


def _ref_ner_find(needle, hay):
    """Transcription of reference find_word_in_texts (utils.py:414-419):
    break BEFORE comparing once i + len(needle) >= len(hay). 1-based."""
    L = len(needle)
    for i in range(len(hay)):
        if i + L >= len(hay):
            return None
        if hay[i : i + L] == needle:
            return i + 1
    return None


def _ref_interactive_find(needle, hay):
    """Transcription of the interactive variant (utils.py:564-569):
    inclusive bound, whole haystack searchable. 1-based."""
    L = len(needle)
    for i in range(len(hay)):
        if i + L <= len(hay) and hay[i : i + L] == needle:
            return i + 1
    return None


def test_locate_property_vs_reference_transcription(spark):
    """Randomized sweep (seeded): locate_expr must agree with direct
    Python transcriptions of BOTH reference variants on hundreds of
    (hay, needle) pairs over a tiny alphabet (forcing frequent matches,
    repeats, and boundary hits). Haystacks are non-empty, as in the
    builder (specials always present)."""
    import numpy as np

    from openue_spark.pipeline.features import locate_expr

    rng = np.random.RandomState(42)
    alpha = ["a", "b", "c"]
    cases = []
    for _ in range(400):
        hay = [alpha[i] for i in rng.randint(0, 3, size=rng.randint(1, 9))]
        if rng.rand() < 0.5 and len(hay) > 1:
            s = rng.randint(0, len(hay))
            needle = hay[s : s + rng.randint(1, 4)]
        else:
            needle = [alpha[i] for i in rng.randint(0, 3, size=rng.randint(0, 4))]
        cases.append((hay, needle))
    df = spark.createDataFrame(cases, "hay array<string>, ndl array<string>")
    got = df.select(
        "hay",
        "ndl",
        F.expr(locate_expr("hay", "ndl", "ner")).alias("ner"),
        F.expr(locate_expr("hay", "ndl", "interactive")).alias("inter"),
    ).collect()
    assert len(got) == 400
    for r in got:
        hay, ndl = list(r.hay), list(r.ndl)
        assert r.ner == _ref_ner_find(ndl, hay), (hay, ndl, r.ner)
        assert r.inter == _ref_interactive_find(ndl, hay), (hay, ndl, r.inter)


def test_extraction_adversarial_parity(spark):
    """Adversarial texts through the full pipeline vs the reference-
    semantics oracle: empty/whitespace, unicode/CJK/cyrillic, 10k-char
    token, huge token count, marker-injection strings, NUL byte."""
    from openue_spark.oracle import extract_corpus
    from openue_spark.pipeline import extract_triples

    texts = [
        "", "   ", "\t\n", "hello", "😀 emoji 漢字 test 漢字 text",
        "x" * 10000, ("tok " * 5000).strip(), "ent001 works at ent002 . " * 40,
        "MiXeD CaSe ENT001 Visited ent002", "punct!!! ??? ;;; ,,, ...",
        "a", "ent001", "[relation3] [SEP] injection attempt [CLS]",
        "null \x00 byte?", "ünïcödé äccents ß", "ент001 кириллица",
    ]
    rows = [("advc", i, t) for i, t in enumerate(texts)]
    sdf = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = sorted(
        (r.conv_id, r.turn_idx, r.subj, int(r.rel_id), r.pred, r.obj)
        for r in extract_triples(sdf).collect()
    )
    want = sorted(
        (t.conv_id, int(t.turn_idx), t.subj, int(t.rel_id), t.pred, t.obj)
        for t in extract_corpus(rows)
    )
    assert got == want and len(got) > 100


def test_gold_beyond_truncation_window_is_dropped_consistently(spark):
    """A document longer than MAX_WORDS: entities drawn from beyond the
    truncated haystack must be unlocatable -> group dropped (and gold
    synthesized FROM the truncated list, as the contract query does, must
    survive). Guards the truncation-parity bug found in review."""
    from openue_spark.pipeline.features import MAX_WORDS

    n = MAX_WORDS + 48
    words = [f"w{i}" for i in range(n)]
    text = " ".join(words)
    beyond = f"{words[-2]} {words[-1]}"      # outside the truncated window
    inside = f"{words[10]} {words[11]}"      # inside it
    rows = [(0, text, [
        ("w2", "works_at", beyond),          # object unlocatable -> drop
        ("w2", "born_in", inside),           # fully inside -> kept
    ])]
    out = _build(spark, rows)
    assert (0, "born_in") in out
    assert (0, "works_at") not in out
    assert len(out[(0, "born_in")].hay) == MAX_WORDS + 4  # truncated + specials


def test_pretokenized_corpus_skips_retokenize(spark):
    """A `toks` column is honored verbatim (contract passes the token
    array through so the corpus is tokenized once)."""
    from openue_spark.pipeline.features import build_gold_ner_features

    df = spark.createDataFrame(
        [(0, ["alpha", "beta", "gamma"], [("beta", "works_at", "gamma")])],
        "text_id long, toks array<string>,"
        " gold array<struct<subject string, predicate string, object string>>",
    )
    r = {(x.text_id, x.pred): x for x in build_gold_ner_features(df).collect()}
    assert r[(0, "works_at")].labels == [
        "CLS", "O", "B-SUB", "B-OBJ", "SEP", "Relation", "SEP"
    ]


def test_empty_tokenizing_entity_is_located_and_harmless(spark):
    """An entity whose surface tokenizes to NOTHING (whitespace-only): the
    reference locates [] at position 0, writes a B tag there, and the tail
    CLS stamp overwrites it — net effect: group kept, no entity labels.
    Same here (zero-length spans cover no positions; pos 1 is CLS)."""
    rows = [(0, "alpha beta", [("   ", "works_at", "beta")])]
    r = _build(spark, rows)[(0, "works_at")]
    assert r.labels == ["CLS", "O", "B-OBJ", "SEP", "Relation", "SEP"]


def test_seq_features_multihot_clamp_and_drop(spark):
    """SEQ builder (utils.py:335-379): duplicate relations clamp to 1,
    out-of-schema predicates are ignored, empty-gold sentences drop, ids
    match tokenizer.encode at the SEQ budget (max_length = MAX_SEQ_LENGTH)."""
    from openue_spark.config import MAX_SEQ_LENGTH
    from openue_spark.pipeline.features import build_seq_features
    from openue_spark.tokenizer import encode

    rows = [
        (0, "alpha beta gamma", [
            ("alpha", "works_at", "beta"),
            ("beta", "works_at", "gamma"),   # duplicate predicate -> still 1
            ("alpha", "born_in", "gamma"),
            ("alpha", "not_a_relation", "beta"),  # out of schema -> ignored
        ]),
        (1, "delta", []),                    # empty gold -> dropped
    ]
    df = spark.createDataFrame(rows, CORPUS_SCHEMA)
    preds = ["works_at", "born_in", "located_in"]
    out = {r.text_id: r for r in build_seq_features(df, predicates=preds).collect()}
    assert set(out) == {0}
    r = out[0]
    assert r.label_ids == [1, 1, 0]
    assert r.n_schema_triples == 3
    ids, _ = encode("alpha beta gamma", max_length=MAX_SEQ_LENGTH)
    assert r.input_ids == ids
    assert r.attention_mask == [1] * len(ids)


def test_seq_features_truncation_budget(spark):
    """SEQ keeps MAX_SEQ_LENGTH - 2 words (full budget minus specials) —
    two MORE than the NER variant's haystack words."""
    from openue_spark.config import MAX_SEQ_LENGTH
    from openue_spark.pipeline.features import build_seq_features

    n = MAX_SEQ_LENGTH + 50
    text = " ".join(f"w{i}" for i in range(n))
    df = spark.createDataFrame([(0, text, [("w1", "works_at", "w2")])], CORPUS_SCHEMA)
    r = build_seq_features(df).collect()[0]
    assert len(r.input_ids) == MAX_SEQ_LENGTH
    assert len(r.attention_mask) == MAX_SEQ_LENGTH


def test_interactive_features_offsets_and_dead_drop_quirk(spark):
    """Interactive builder (utils.py:550-613): 0-based (start, end-exclusive)
    offsets against [CLS] text [SEP]; one tuple per gold triple IN ORDER;
    the reference's unlocatable drop is DEAD CODE, so a missing span yields
    NULL offsets and the row is KEPT; out-of-schema predicates yield NULL r."""
    from openue_spark.pipeline.features import build_interactive_features
    from openue_spark.tokenizer import word_id

    rows = [(0, "alpha beta gamma delta", [
        ("beta", "works_at", "gamma delta"),
        ("zzz", "works_at", "alpha"),          # unlocatable subject -> NULLs, kept
        ("alpha", "mystery_rel", "delta"),     # out-of-schema -> r NULL
    ])]
    df = spark.createDataFrame(rows, CORPUS_SCHEMA)
    out = build_interactive_features(df, predicates=["works_at", "born_in"]).collect()
    assert len(out) == 1
    r = out[0]
    # hay = [CLS](0) alpha(1) beta(2) gamma(3) delta(4) [SEP](5)
    t0, t1, t2 = (tuple(t) for t in r.triples)
    assert t0 == (2, 3, 3, 5, 0)
    assert t1 == (None, None, 1, 2, 0)         # dead check: row survives
    assert t2 == (1, 2, 4, 5, None)            # unknown predicate -> NULL r
    from openue_spark.config import CLS_ID, SEP_ID

    assert r.input_ids == [CLS_ID] + [word_id(w) for w in
                                      ["alpha", "beta", "gamma", "delta"]] + [SEP_ID]
    assert r.attention_mask == [1] * 6


def test_interactive_locate_is_inclusive_at_text_end(spark):
    """An object that is the FINAL text token pair locates fine (interactive
    variant searches the whole haystack; the trailing [SEP] additionally
    keeps text spans off the very end)."""
    from openue_spark.pipeline.features import build_interactive_features

    rows = [(0, "alpha beta", [("alpha", "works_at", "alpha beta")])]
    df = spark.createDataFrame(rows, CORPUS_SCHEMA)
    t = tuple(build_interactive_features(df).collect()[0].triples[0])
    assert t[:4] == (1, 2, 1, 3)


# --- injectable tokenizer seam through the TRAINING builders (VERDICT r3
#     item 2: the reference registers ONE tokenizer for all stages,
#     data_module.py:25-35 — extraction, serving, and these builders must
#     all honor the same injected object) ---


def _rows_sorted(df):
    return sorted(
        [tuple(str(v) for v in r) for r in df.collect()]
    )


def test_tokenizer_seam_word_tokenizer_is_bit_identical(spark):
    """Injecting the default WordTokenizer through every builder must equal
    the column-algebra path exactly (crc32 ids and the token regex agree by
    construction) — the seam cannot fork semantics when the vocab is the
    built-in one."""
    from openue_spark.pipeline.features import (
        build_gold_ner_features,
        build_interactive_features,
        build_seq_features,
    )
    from openue_spark.tokenizer import WordTokenizer

    rows = [
        (0, "alpha beta gamma delta", [("beta", "works_at", "gamma delta")]),
        (1, "x " * 300, [("x", "works_at", "x x")]),  # truncation boundary
        (2, "no gold here", []),
        (3, "Unicode ÉMOJI 🎉 text", [("émoji", "born_in", "text")]),
    ]
    df = spark.createDataFrame(rows, CORPUS_SCHEMA)
    bc = spark.sparkContext.broadcast(WordTokenizer())
    for builder in (
        build_gold_ner_features,
        build_interactive_features,
        build_seq_features,
    ):
        default = builder(df)
        seam = builder(df, tokenizer_bc=bc)
        assert default.columns == seam.columns
        assert _rows_sorted(default) == _rows_sorted(seam), builder.__name__


def test_tokenizer_seam_subword_ner_golden(spark):
    """SubwordTokenizer(3) through the NER builder: the haystack is PIECES,
    spans align to piece boundaries, ids are the tokenizer's own — a
    real-vocab deployment gets gold features on its vocabulary, not the
    word-level one."""
    from openue_spark.config import CLS_ID, REL_TOKEN_BASE, SEP_ID, PREDICATES
    from openue_spark.pipeline.features import build_gold_ner_features
    from openue_spark.tokenizer import SubwordTokenizer, word_id

    tok = SubwordTokenizer(3)
    bc = spark.sparkContext.broadcast(tok)
    rows = [(0, "alphabet beta", [("alphabet", "works_at", "beta")])]
    df = spark.createDataFrame(rows, CORPUS_SCHEMA)
    out = build_gold_ner_features(df, tokenizer_bc=bc).collect()
    assert len(out) == 1
    r = out[0]
    assert r.hay == [
        "[CLS]", "alp", "##hab", "##et", "bet", "##a",
        "[SEP]", "[works_at]", "[SEP]",
    ]
    assert r.labels == [
        "CLS", "B-SUB", "I-SUB", "I-SUB", "B-OBJ", "I-OBJ",
        "SEP", "Relation", "SEP",
    ]
    k = list(PREDICATES).index("works_at")
    assert r.input_ids == (
        [CLS_ID]
        + [word_id(p) for p in ["alp", "##hab", "##et", "bet", "##a"]]
        + [SEP_ID, REL_TOKEN_BASE + k, SEP_ID]
    )


def test_tokenizer_seam_seq_ids_are_tokenizer_encode(spark):
    """SEQ features under an injected tokenizer carry encode()'s ids
    verbatim at the FULL MAX_SEQ_LENGTH budget; labels stay gold-derived."""
    from openue_spark.config import MAX_SEQ_LENGTH
    from openue_spark.pipeline.features import build_seq_features
    from openue_spark.tokenizer import SubwordTokenizer

    tok = SubwordTokenizer(3)
    bc = spark.sparkContext.broadcast(tok)
    text = "alphabet beta gamma"
    rows = [(0, text, [("alphabet", "works_at", "beta"),
                       ("beta", "works_at", "gamma")])]
    df = spark.createDataFrame(rows, CORPUS_SCHEMA)
    r = build_seq_features(df, tokenizer_bc=bc).collect()[0]
    ids, _ = tok.encode(text, MAX_SEQ_LENGTH)
    assert r.input_ids == ids
    assert r.attention_mask == [1] * len(ids)
    assert sum(r.label_ids) == 1 and r.n_schema_triples == 2


def test_tokenizer_seam_matches_extraction_tokenizer(spark):
    """One broadcast tokenizer registered across stages (the reference's
    data_module contract): the NER builder's non-special input_ids must be
    a prefix-consistent view of what extraction's scorer tokenizes for the
    same text — both call the SAME broadcast object's encode."""
    from openue_spark.config import MAX_SEQ_LENGTH
    from openue_spark.pipeline.features import build_gold_ner_features
    from openue_spark.tokenizer import SubwordTokenizer

    tok = SubwordTokenizer(4)
    bc = spark.sparkContext.broadcast(tok)
    text = "delta epsilon zeta"
    rows = [(0, text, [("delta", "works_at", "zeta")])]
    df = spark.createDataFrame(rows, CORPUS_SCHEMA)
    r = build_gold_ner_features(df, tokenizer_bc=bc).collect()[0]
    ids, words = tok.encode(text, MAX_SEQ_LENGTH - 2)
    # hay strips to: [CLS] words... [SEP] marker [SEP]; ids align 1:1
    assert r.hay[1:-3] == words
    assert r.input_ids[1:-3] == ids[1:-1]
