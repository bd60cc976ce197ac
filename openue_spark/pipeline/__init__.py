from .extract import extract_triples, triple_table  # noqa: F401
