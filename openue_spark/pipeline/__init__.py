from .evaluate import micro_prf, per_predicate_prf  # noqa: F401
from .extract import extract_triples, triple_table  # noqa: F401
