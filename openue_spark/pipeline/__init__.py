from .evaluate import micro_prf, per_predicate_prf  # noqa: F401
from .extract import extract_triples, inference_text, triple_table  # noqa: F401
