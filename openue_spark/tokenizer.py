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
