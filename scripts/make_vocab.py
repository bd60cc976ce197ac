"""Regenerate openue_spark/golden/vocab_wordpiece.txt deterministically.

Offline stand-in for a released WordPiece vocab file (the reference loads
bert-base-chinese's vocab for every stage, data_module.py:25-35 — no
network here). Built like a frequency-truncated trained vocab over the
fixture corpus:

- the 4 BERT specials, then
- every character of the corpus charset, in both initial and '##'
  continuation form (charset closure => zero [UNK] on fixture text; real
  vocabs do the same for their training charset), then
- the most frequent whole words (frequent words stay unsplit), then
- the most frequent 2..4-char sub-pieces (initial prefixes and '##'
  continuations), so rare words split into multi-piece sequences exactly
  like real WordPiece output.

Ordering inside each block is (-frequency, piece) — fully deterministic.
Run ONLY after deliberately changing the vocab recipe; the checked-in file
is pinned by tests/test_parity.py::test_vocab_file_is_current.
"""

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from openue_spark.fixtures import transcripts_pandas  # noqa: E402
from openue_spark.tokenizer import tokenize_words  # noqa: E402

N_TURNS = 2_000  # same corpus window the golden parquet freezes
TOP_WORDS = 150
TOP_PIECES = 200

OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..",
    "openue_spark",
    "golden",
    "vocab_wordpiece.txt",
)


def build_vocab() -> list[str]:
    word_freq: Counter[str] = Counter()
    for text in transcripts_pandas(N_TURNS)["text"]:
        word_freq.update(tokenize_words(text))

    by_freq = sorted(word_freq.items(), key=lambda kv: (-kv[1], kv[0]))
    charset = sorted({c for w in word_freq for c in w})

    vocab: list[str] = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
    vocab += charset + ["##" + c for c in charset]
    vocab += [w for w, _ in by_freq if len(w) > 1][:TOP_WORDS]

    piece_freq: Counter[str] = Counter()
    in_vocab = set(vocab)
    for w, n in word_freq.items():
        if w in in_vocab:
            continue  # whole-word entries never need their sub-pieces
        for ln in (2, 3, 4):
            for j in range(0, max(1, len(w) - ln + 1)):
                p = w[j : j + ln]
                if len(p) < 2:
                    continue
                piece_freq[("##" + p) if j else p] += n
    pieces = sorted(piece_freq.items(), key=lambda kv: (-kv[1], kv[0]))
    vocab += [p for p, _ in pieces if p not in in_vocab][:TOP_PIECES]
    return vocab


if __name__ == "__main__":
    vocab = build_vocab()
    with open(OUT, "w", encoding="utf-8") as f:
        f.write("\n".join(vocab) + "\n")
    print(f"wrote {len(vocab)} pieces -> {OUT}")
