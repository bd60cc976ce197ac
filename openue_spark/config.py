"""Fixed schema constants mirroring the reference's code-declared schema.

Reference evidence:
- NER label set: /root/reference/src/openue/data/utils.py:617-618
- SEP id hard-coded 102: /root/reference/src/openue/models/model.py:245
- threshold 0.5: /root/reference/src/openue/models/model.py:227
- max_seq_length 256 default: /root/reference/scripts/run_seq.sh
- relation markers [relation0..K-1] appended to vocab:
  /root/reference/src/openue/data/data_module.py:25-35
"""

from __future__ import annotations

# BIO label schema (fixed, 8 labels) — utils.py:617-618
NER_LABELS = ["O", "B-SUB", "I-SUB", "B-OBJ", "I-OBJ", "Relation", "CLS", "SEP"]
NER_LABEL_TO_ID = {label: i for i, label in enumerate(NER_LABELS)}

# Special token ids. PAD/CLS/SEP match bert-base conventions; SEP=102 is
# hard-coded in the reference splice (model.py:245).
PAD_ID = 0
CLS_ID = 101
SEP_ID = 102

# Deterministic word-level vocabulary: hashed word ids live in
# [VOCAB_BASE, VOCAB_BASE + VOCAB_HASH_SIZE); relation marker tokens
# [relationK] live at REL_TOKEN_BASE + k (analogue of the reference's
# tokenizer.add_special_tokens block, data_module.py:25-35).
VOCAB_BASE = 1000
VOCAB_HASH_SIZE = 20000
REL_TOKEN_BASE = 30000

# Pipeline hyperparameters (reference defaults).
MAX_SEQ_LENGTH = 256  # SEQ tokenize bound; NER/interactive use MAX_SEQ_LENGTH-2
SIGMOID_THRESHOLD = 0.5  # strict '>' — model.py:227

# Fixture relation schema: 24 predicates (reference SKE has ~50; rel2id.json).
PREDICATES = [
    "works_at", "born_in", "located_in", "founded_by", "ceo_of",
    "spouse_of", "child_of", "author_of", "directed_by", "acted_in",
    "capital_of", "member_of", "educated_at", "owns", "produces",
    "part_of", "adjacent_to", "succeeded_by", "named_after", "invented_by",
    "plays_for", "composed_by", "discovered_by", "headquartered_in",
]
NUM_RELATIONS = len(PREDICATES)
REL2ID = {p: i for i, p in enumerate(PREDICATES)}
ID2REL = {i: p for i, p in enumerate(PREDICATES)}
