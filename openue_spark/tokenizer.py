"""Deterministic word-level tokenizer.

Stands in for the reference's HF BERT tokenizer (which downloads
bert-base-chinese — unavailable offline; reference data_module.py:42-50).
Semantics preserved from the reference feature builders:

- lowercase preprocessing before every tokenize (reference utils.py:383-385)
- add_special_tokens=True -> [CLS] ... [SEP] (reference utils.py:358-364)
- truncation to max_length tokens *including* specials
  ("longest_first" degenerates to head-truncate for single segments)
- the NER/interactive variants reserve 2 positions for the relation-marker
  splice: max_length = max_seq_length - 2 (reference utils.py:579-584)

Word ids are stable CRC32 hashes into [VOCAB_BASE, VOCAB_BASE+VOCAB_HASH_SIZE);
collisions are harmless because the oracle and the Spark pipeline share this
exact function.
"""

from __future__ import annotations

import re

from .config import CLS_ID, MAX_SEQ_LENGTH, SEP_ID, VOCAB_BASE, VOCAB_HASH_SIZE
from .hashing import crc32_id

# one token per word or single punctuation mark (text is lowercased first)
_TOKEN_RE = re.compile(r"[a-z0-9_]+|[^a-z0-9_\s]")


def preprocess(text: str) -> str:
    """Reference `preprocess`: lowercase (utils.py:383-385)."""
    return text.lower()


def tokenize_words(text: str) -> list[str]:
    """Lowercase + split into word/punctuation tokens."""
    return _TOKEN_RE.findall(preprocess(text))


# Bounded memo for word_id: natural-language vocabularies are Zipfian, so
# the hit rate is high and the dict stays small; cleared (not LRU-evicted)
# at the cap to keep the fast path branch-free. Pure function — caching
# cannot change results.
_WORD_ID_CACHE: dict[str, int] = {}
_WORD_ID_CACHE_MAX = 1 << 16


def word_id(token: str) -> int:
    v = _WORD_ID_CACHE.get(token)
    if v is None:
        v = VOCAB_BASE + crc32_id(token) % VOCAB_HASH_SIZE
        if len(_WORD_ID_CACHE) >= _WORD_ID_CACHE_MAX:
            _WORD_ID_CACHE.clear()
        _WORD_ID_CACHE[token] = v
    return v


def encode(text: str, max_length: int = MAX_SEQ_LENGTH - 2) -> tuple[list[int], list[str]]:
    """text -> ([CLS] w1..wn [SEP] ids, kept words).

    max_length bounds the total token count including the two specials,
    matching the reference interactive tokenize (utils.py:579-584).
    """
    words = tokenize_words(text)[: max(0, max_length - 2)]
    ids = [CLS_ID] + [word_id(w) for w in words] + [SEP_ID]
    return ids, words


def encode_entity(text: str) -> list[int]:
    """Entity tokenize with add_special_tokens=False (utils.py:590-593)."""
    return [word_id(w) for w in tokenize_words(text)]


# --- injectable tokenizer seam -------------------------------------------
#
# The reference registers a REAL subword tokenizer (HF bert-base-chinese
# with [relationK] special tokens, data_module.py:25-35); this sandbox has
# no network, so the word-level functions above are the default. The
# pipeline and the numpy oracle both accept an injected tokenizer object
# exposing ``encode(text, max_length) -> (ids, words)`` (broadcast to
# executors via ``sc.broadcast`` on the Spark side, mirroring the
# model-weights seam), so a real-vocab deployment swaps tokenizers by
# passing one in — no edits here. Contract the `words` list carries: it is
# the POSITION-ALIGNED surface form of ids[1:-1] (position p in a decoded
# span renders as words[p-1]); any tokenizer honoring that renders spans
# consistently in both engines.


class WordTokenizer:
    """The default word-level tokenizer as an injectable object (identical
    output to the module-level ``encode``)."""

    def encode(
        self, text: str, max_length: int = MAX_SEQ_LENGTH - 2
    ) -> tuple[list[int], list[str]]:
        return encode(text, max_length)


class VocabWordPieceTokenizer:
    """Real WordPiece inference over a vocab FILE — the deployment shape of
    the seam (the reference loads one vocab for every stage,
    data_module.py:25-35; its tokenizer is HF WordPiece).

    The encode algorithm is the standard BERT WordPiece matcher: per
    pre-tokenized word, repeatedly take the LONGEST prefix present in the
    vocab (continuation pieces carry the '##' prefix); a word with any
    unmatchable tail becomes [UNK] whole. File format is one piece per
    line, like every published bert-*/vocab.txt — a user can point this at
    a real released vocab file unchanged. Ids are VOCAB_BASE + line index,
    except [CLS]/[SEP] which map to the pipeline's CLS_ID/SEP_ID so
    special-token handling stays uniform across tokenizers. The `words`
    half of encode() returns the pieces (position-aligned with ids[1:-1]),
    honoring the seam contract above.

    scripts/make_vocab.py builds the checked-in
    openue_spark/golden/vocab_wordpiece.txt deterministically from the
    fixture corpus (offline stand-in for a released vocab: frequent words
    whole, rare words split into char/subword pieces, zero [UNK] on
    fixture text by charset closure); tests/test_parity.py proves
    pipeline == oracle under it.
    """

    _MAX_WORD_CHARS = 100  # HF WordPiece's max_input_chars_per_word

    def __init__(self, vocab: list[str]):
        self.index: dict[str, int] = {}
        for i, piece in enumerate(vocab):
            # first occurrence wins, like HF's OrderedDict load
            self.index.setdefault(piece, i)
        if "[UNK]" not in self.index:
            raise ValueError("vocab must contain [UNK]")

    @classmethod
    def from_file(cls, path: str) -> "VocabWordPieceTokenizer":
        with open(path, encoding="utf-8") as f:
            return cls([ln.rstrip("\n") for ln in f if ln.strip()])

    def wordpiece(self, word: str) -> list[str]:
        """Greedy longest-match-first split of one word into vocab pieces."""
        if len(word) > self._MAX_WORD_CHARS:
            return ["[UNK]"]
        pieces: list[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.index:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return ["[UNK]"]
            pieces.append(cur)
            start = end
        return pieces

    def pieces(self, text: str) -> list[str]:
        out: list[str] = []
        for w in tokenize_words(text):
            out.extend(self.wordpiece(w))
        return out

    def _id(self, piece: str) -> int:
        return VOCAB_BASE + self.index[piece]

    def encode(
        self, text: str, max_length: int = MAX_SEQ_LENGTH - 2
    ) -> tuple[list[int], list[str]]:
        ps = self.pieces(text)[: max(0, max_length - 2)]
        return [CLS_ID] + [self._id(p) for p in ps] + [SEP_ID], ps


class SubwordTokenizer:
    """Deterministic WordPiece-shaped tokenizer for exercising the seam
    without network access: words split into fixed-width pieces, piece 2+
    prefixed '##' (so piece boundaries are visible in span surface forms,
    like real WordPiece), ids hashed into the same [VOCAB_BASE, ...) space.
    Non-trivial on purpose — it changes sequence lengths, truncation
    points, and span renderings, so a pipeline/oracle mismatch anywhere in
    the tokenize -> splice -> decode chain breaks parity loudly."""

    def __init__(self, piece_len: int = 3):
        if piece_len < 1:
            raise ValueError("piece_len must be >= 1")
        self.piece_len = piece_len

    def pieces(self, text: str) -> list[str]:
        out: list[str] = []
        for w in tokenize_words(text):
            for j in range(0, len(w), self.piece_len):
                p = w[j : j + self.piece_len]
                out.append(p if j == 0 else "##" + p)
        return out

    def encode(
        self, text: str, max_length: int = MAX_SEQ_LENGTH - 2
    ) -> tuple[list[int], list[str]]:
        ps = self.pieces(text)[: max(0, max_length - 2)]
        return [CLS_ID] + [word_id(p) for p in ps] + [SEP_ID], ps
